package graft

import java.util.concurrent.{CountDownLatch, TimeUnit}
import scala.collection.mutable

import graft.core.{BoundedMemo, Listings}
import graft.queries.TextCatalog

/** BoundedMemo eviction semantics: the key reaches onEvict (so call
  * sites can gate destruction on session liveness), cleanup runs outside
  * the map monitor (a slow delete must not block unrelated lookups), and
  * — end-to-end — a 5th concurrent session aging out the 1st session's
  * entry must NOT destroy artifacts the 1st session's already-returned
  * DataFrames still depend on. */
class MemoSpec extends SparkSpec {

  test("eviction passes the evicted KEY to onEvict, eldest-first") {
    val evicted = mutable.Buffer[(Int, String)]()
    val memo = new BoundedMemo[Int, String](2)((k, v) => evicted.synchronized {
      evicted += ((k, v)): Unit
    })
    (1 to 4).foreach(k => memo.get(k)(s"v$k"))
    assert(evicted.toList == List((1, "v1"), (2, "v2")))
    // survivors still served from the memo (build not re-run)
    var rebuilt = false
    assert(memo.get(4) { rebuilt = true; "other" } == "v4")
    assert(!rebuilt)
  }

  test("a slow onEvict does not block other sessions' lookups") {
    val gate = new CountDownLatch(1)
    val entered = new CountDownLatch(1)
    val memo = new BoundedMemo[Int, String](1)((_, _) => {
      entered.countDown()
      gate.await(30, TimeUnit.SECONDS): Unit
    })
    memo.get(1)("v1")
    val evictor = new Thread(() => memo.get(2)("v2"): Unit)
    evictor.start()
    assert(entered.await(10, TimeUnit.SECONDS), "eviction cleanup never started")
    // while the evictor is parked inside onEvict, a lookup for the live
    // key must proceed — before the fix onEvict ran inside the map
    // monitor and this get deadlocked until the delete finished
    val lookup = new Thread(() => memo.get(2)("other"): Unit)
    lookup.start()
    lookup.join(10000)
    val blocked = lookup.isAlive
    gate.countDown()
    evictor.join(10000)
    lookup.join(10000)
    assert(!blocked, "get() blocked behind an in-flight eviction cleanup")
  }

  test("an entry evicted while its build is in flight is never force-built") {
    val evicted = mutable.Buffer[Int]()
    val memo = new BoundedMemo[Int, String](1)((k, _) => evicted.synchronized {
      evicted += k: Unit
    })
    val buildStarted = new CountDownLatch(1)
    val buildGate = new CountDownLatch(1)
    val builder = new Thread(() => memo.get(1) {
      buildStarted.countDown()
      buildGate.await(30, TimeUnit.SECONDS)
      "v1"
    }: Unit)
    builder.start()
    assert(buildStarted.await(10, TimeUnit.SECONDS))
    memo.get(2)("v2") // evicts key 1 whose build is still parked
    assert(evicted.isEmpty, "onEvict ran on a value that was never built")
    buildGate.countDown()
    builder.join(10000)
  }

  test("5 concurrent sessions: the 1st session's landed listings frame still executes") {
    // landedRun has capacity 4; five distinct session keys evict the
    // first — which is LIVE (all newSession()s share one SparkContext).
    // Before the liveness guard the eviction deleted the 1st session's
    // landed parquet dir and this re-execution failed with FileNotFound.
    val sessions = (1 to 5).map(_ => spark.newSession())
    val first = Listings.normalized(sessions.head)
    val n = first.count()
    assert(n > 0)
    sessions.tail.foreach(s => assert(Listings.normalized(s).count() == n))
    assert(first.count() == n)
  }

  test("5 concurrent sessions: the 1st session's minhash index frames still execute") {
    // minhashIndex has capacity 4 and its frames are localCheckpoint'd —
    // their blocks ARE their lineage. Before the liveness guard the 5th
    // session's build unpersisted the 1st's blocks and this re-execution
    // failed with missing-block.
    val sessions = (1 to 5).map(_ => spark.newSession())
    val first = TextCatalog.minhashPairs(sessions.head, sf0001)
    val n = first.count()
    sessions.tail.foreach(s => assert(TextCatalog.minhashPairs(s, sf0001).count() == n))
    assert(first.count() == n)
  }
}
