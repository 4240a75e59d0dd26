package graft.core

/** Bounded per-key memo for session-scoped built artifacts (landed temp
  * dirs, checkpointed index frames, corpus statistics).
  *
  * Three properties the previous `Collections.synchronizedMap` +
  * `computeIfAbsent` pattern lacked:
  *
  *  1. '''Builds run outside the shared lock.''' `computeIfAbsent` on a
  *     synchronized map holds the ONE map lock for the whole build — a
  *     multi-second land/dedup/checkpoint — serializing unrelated
  *     sessions' first access behind each other. Here the map lock only
  *     guards holder insertion (microseconds); the build itself runs
  *     under the holder's own lazy-val monitor, so two different keys
  *     build concurrently while two racing calls for the SAME key still
  *     compute exactly once.
  *  2. '''Eviction reclaims the artifact — outside the lock.''' When
  *     insertion pushes the map past `capacity`, the eldest entry is
  *     unlinked under the monitor but its `onEvict` runs AFTER the
  *     monitor is released (via a pending queue drained by the inserting
  *     caller), so a slow cleanup — a recursive temp-dir delete, an
  *     unpersist that talks to the block manager — never blocks other
  *     sessions' lookups. A long-lived JVM hosting many sessions thus
  *     reclaims aged-out artifacts as it goes instead of accumulating
  *     them until the exit hook. An entry evicted while its build is
  *     still in flight is skipped (never force a build just to destroy
  *     it) — that rare race degrades to the old behavior: cleanup at JVM
  *     exit via the builder's own shutdown hook.
  *  3. '''`onEvict` sees the key, so call sites can check liveness.'''
  *     An aged-out key is NOT proof its session is retired — a 5th
  *     concurrent session evicts the 1st's entry while the 1st may still
  *     be executing plans over the artifact. Destroying it then (deleting
  *     a landed dir a returned DataFrame still scans, unpersisting a
  *     live session's `localCheckpoint` blocks — which ARE its lineage)
  *     fails those plans with FileNotFound / missing-block. Call sites
  *     whose artifacts outlive the map entry must gate destruction on
  *     `key.sparkContext.isStopped` and lean on their JVM-exit backstop
  *     for live-session evictions (see `Listings.landedRun`,
  *     `TextCatalog.minhashIndex`). MemoSpec proves the 5-session case.
  */
final class BoundedMemo[K, V](capacity: Int)(onEvict: (K, V) => Unit) {
  private final class Holder(val key: K, thunk: () => V) {
    @volatile private var built = false
    lazy val value: V = { val v = thunk(); built = true; v }
    def cleanup(): Unit =
      if (built) try onEvict(key, value) catch { case scala.util.control.NonFatal(_) => () }
  }

  // entries unlinked by removeEldestEntry (which LinkedHashMap invokes
  // inside put, i.e. under the map monitor) park here; the inserting
  // caller drains them after releasing the monitor
  private val pendingEvict = new java.util.concurrent.ConcurrentLinkedQueue[Holder]

  private val map = new java.util.LinkedHashMap[K, Holder](8, 0.75f, false) {
    override def removeEldestEntry(e: java.util.Map.Entry[K, Holder]): Boolean = {
      val evict = size > capacity
      if (evict) pendingEvict.add(e.getValue)
      evict
    }
  }

  def get(key: K)(build: => V): V = {
    val holder = map.synchronized {
      val existing = map.get(key)
      if (existing != null) existing
      else { val h = new Holder(key, () => build); map.put(key, h); h }
    }
    var evicted = pendingEvict.poll()
    while (evicted != null) { evicted.cleanup(); evicted = pendingEvict.poll() }
    holder.value
  }
}
