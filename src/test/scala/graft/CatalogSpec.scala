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

  // Full post-load schema contract for every driver table — the r9
  // events breakage came from a silent fixture regeneration, and names/
  // types are the whole surface a regeneration can move. One named test
  // per table beats 100 mysterious downstream failures.
  {
    import graft.core.Tables
    val expected: Seq[(String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame, Map[String, String])] = Seq(
      ("region", Tables.region _, Map(
        "r_regionkey" -> "int", "r_name" -> "string")),
      ("nation", Tables.nation _, Map(
        "n_nationkey" -> "int", "n_name" -> "string", "n_regionkey" -> "int")),
      ("customer", Tables.customer _, Map(
        "c_custkey" -> "bigint", "c_name" -> "string", "c_nationkey" -> "int",
        "c_acctbal" -> "double", "c_mktsegment" -> "string")),
      ("supplier", Tables.supplier _, Map(
        "s_suppkey" -> "bigint", "s_name" -> "string", "s_nationkey" -> "int",
        "s_acctbal" -> "double")),
      ("part", Tables.part _, Map(
        "p_partkey" -> "bigint", "p_name" -> "string", "p_brand" -> "string",
        "p_type" -> "string", "p_size" -> "int", "p_retailprice" -> "double")),
      ("orders", Tables.orders _, Map(
        "o_orderkey" -> "bigint", "o_custkey" -> "bigint", "o_orderstatus" -> "string",
        "o_totalprice" -> "double", "o_orderdate" -> "timestamp_ntz",
        "o_orderpriority" -> "string")),
      ("lineitem", Tables.lineitem _, Map(
        "l_orderkey" -> "bigint", "l_partkey" -> "bigint", "l_suppkey" -> "bigint",
        "l_linenumber" -> "int", "l_quantity" -> "double", "l_extendedprice" -> "double",
        "l_discount" -> "double", "l_tax" -> "double", "l_returnflag" -> "string",
        "l_linestatus" -> "string", "l_shipdate" -> "timestamp_ntz")),
      ("events", Tables.events _, Map(
        "event_id" -> "bigint", "ts" -> "timestamp", "user_id" -> "bigint",
        "event_type" -> "string", "value" -> "double", "props" -> "string")),
      ("documents", Tables.documents _, Map(
        "doc_id" -> "bigint", "text" -> "string", "lang" -> "string",
        "source" -> "string", "n_chars" -> "bigint")),
      ("embeddings", Tables.embeddings _, Map(
        "vec_id" -> "bigint", "embedding" -> "array<float>", "label" -> "int")))
    for ((name, load, cols) <- expected) {
      test(s"fixture contract: $name schema at sf0.001") {
        val got = load(spark, sf0001).schema.fields
          .map(f => f.name -> f.dataType.simpleString).toMap
        assert(got == cols,
          s"$name drifted: unexpected=${got.toSet -- cols.toSet}, missing=${cols.toSet -- got.toSet}")
      }
    }
  }
}
