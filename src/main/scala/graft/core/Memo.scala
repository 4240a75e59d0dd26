package graft.core

/** Bounded per-key memo for session-scoped built artifacts (landed temp
  * dirs, checkpointed index frames, corpus statistics).
  *
  * Two properties the previous `Collections.synchronizedMap` +
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
  *  2. '''Eviction reclaims the artifact.''' Insertion-order eviction at
  *     `capacity` invokes `onEvict` on the built value, so a long-lived
  *     JVM hosting many sessions deletes aged-out landed dirs and
  *     unpersists checkpointed frames as it goes instead of accumulating
  *     them until the exit hook. An entry evicted while its build is
  *     still in flight is skipped (never force a build just to destroy
  *     it) — that rare race degrades to the old behavior: cleanup at JVM
  *     exit via the builder's own shutdown hook.
  *
  * Eviction assumes the aged-out key's session is retired (the same
  * assumption the bounded map always made — a re-landed dir after
  * eviction is a different path, so a still-running old plan would
  * already be reading a stale artifact).
  */
final class BoundedMemo[K, V](capacity: Int)(onEvict: V => Unit) {
  private final class Holder(thunk: () => V) {
    @volatile private var built = false
    lazy val value: V = { val v = thunk(); built = true; v }
    def cleanup(): Unit =
      if (built) try onEvict(value) catch { case scala.util.control.NonFatal(_) => () }
  }

  private val map = new java.util.LinkedHashMap[K, Holder](8, 0.75f, false) {
    override def removeEldestEntry(e: java.util.Map.Entry[K, Holder]): Boolean = {
      val evict = size > capacity
      if (evict) e.getValue.cleanup()
      evict
    }
  }

  def get(key: K)(build: => V): V = {
    val holder = map.synchronized {
      val existing = map.get(key)
      if (existing != null) existing
      else { val h = new Holder(() => build); map.put(key, h); h }
    }
    holder.value
  }
}
