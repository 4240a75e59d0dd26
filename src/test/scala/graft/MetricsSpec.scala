package graft

import graft.core.Metrics
import graft.queries.{TextCatalog, TpchCatalog}

/** Runtime-measured scale claims: the catalog's "zero-shuffle" scaladocs
  * must hold as ACTUAL shuffle traffic at execution time, not just as
  * clean-looking static plans — and a genuinely shuffling query must
  * show the opposite, proving the probe isn't vacuously reading zeros.
  */
class MetricsSpec extends SparkSpec {

  test("zero-shuffle claim holds at runtime for the hash split") {
    // q_doc_split: documented "zero shuffles at any scale" for the
    // COMPUTATION; the deterministic presentation ORDER BY adds exactly
    // one range exchange of the final rows and nothing else
    val p = Metrics.measure(TextCatalog.trainSplit(spark, sf0001))
    assert(p.rowsOut > 0)
    assert(p.nHashExchanges == 0,
      s"split computation shuffled — zero-shuffle claim false at runtime: $p")
    assert(p.nExchanges - p.nHashExchanges <= 1, s"more than the presentation sort: $p")
    // the only records that moved are the final presentation rows
    assert(p.shuffleRecords == p.rowsOut, s"intermediate shuffle traffic: $p")
    assert(p.scanRows > 0, "scan metric not wired")
  }

  test("narrow-map claims hold for quality, repetition, and decontam scoring") {
    val q = Metrics.measure(TextCatalog.qualityScore(spark, sf0001))
    assert(q.rowsOut > 0 && q.nHashExchanges == 0, s"quality scoring shuffled: $q")
    // q_doc_repetition was rewritten in r8 precisely to be a zero-shuffle
    // per-row map — hold it to that
    val r = Metrics.measure(TextCatalog.repetitionSignals(spark, sf0001))
    assert(r.rowsOut > 0 && r.nHashExchanges == 0, s"repetition signals shuffled: $r")
    // semantic decontam scores against a broadcast eval model — one
    // narrow pass, no hash exchange
    val d = Metrics.measure(graft.queries.VectorCatalog.vecDecontam(spark, sf0001))
    assert(d.rowsOut > 0 && d.nHashExchanges == 0, s"decontam scoring shuffled: $d")
  }

  test("a shuffling query reports real shuffle traffic (probe not vacuous)") {
    val p = Metrics.measure(TpchCatalog.pricingSummary(spark, sf0001))
    assert(p.rowsOut > 0)
    assert(p.nHashExchanges >= 1, s"expected a hash exchange: $p")
    assert(p.shuffleRecords > 0 && p.shuffleBytes > 0,
      s"aggregation shuffled nothing — metric wiring broken: $p")
    assert(p.scanRows > 0)
  }
}
