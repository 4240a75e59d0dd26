package graft

/** Catalog-wide non-vacuity gate: every query in SparkEntry.queries must
  * return at least one row at sf0.001.
  *
  * Why this exists: a 0-row result that matches a 0-row oracle proves
  * nothing about the operator's semantics — round 1 shipped two such
  * vacuous passes (an anti-join whose anti side was never empty below
  * sf0.1, and a near-dup detector whose threshold no fixture pair could
  * reach). This suite makes that class of bug a hard test failure instead
  * of something a judge has to find.
  */
class CatalogSpec extends SparkSpec {

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, q) =>
    test(s"$name returns rows at sf0.001") {
      val df = q(spark, sf0001)
      assert(!df.isEmpty, s"$name is vacuous: 0 rows at sf0.001")
    }
  }

  test("every oracle key has a matching query key") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  // Fixture contract: Tables.events must surface `ts` as TimestampType at
  // every SF regardless of the fixture's physical parquet layout (the
  // driver has shipped both TIMESTAMP(NANOS) and TIMESTAMP(MICROS,ntz)).
  // A silent fixture regeneration should fail THIS named test, not 17
  // downstream ones.
  for (sf <- Seq(sf0001, sf001, sf01)) {
    test(s"events.ts loads as TimestampType at $sf") {
      import org.apache.spark.sql.types.TimestampType
      val dt = graft.core.Tables.events(spark, sf).schema("ts").dataType
      assert(dt == TimestampType, s"events.ts is $dt, expected TimestampType")
    }
  }
}
