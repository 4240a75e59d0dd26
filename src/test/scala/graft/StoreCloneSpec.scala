package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Tables
import graft.queries.MiscCatalog

/** The clone-per-run fixture discipline ([[MiscCatalog.clonedWh]]):
  * mutating store queries land a master warehouse once and mutate a
  * filesystem CLONE per invocation — sound only if a copied tree IS the
  * store (manifest entries, sidecars, DV journal targets all
  * path-relative). Pinned here: a full DML lifecycle (DELETE / UPDATE /
  * INSERT / compact / read-back) over a CLONE answers byte-identically
  * to the same lifecycle over a freshly-built store, and two clones of
  * one master are mutation-isolated from each other and from the
  * master. */
class StoreCloneSpec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def buildDocs(root: String): Unit = {
    val docs = Tables.documents(spark, sf)
      .filter(col("lang").isNotNull)
      .select(col("doc_id"), col("n_chars").cast("long").as("n_chars"),
        col("lang"))
    graft.sources.EpochStore.write(docs.filter(col("doc_id") % 2 === 0),
      root, 0L, partitionColumn = "lang", statsColumns = Seq("doc_id"))
    graft.sources.EpochStore.write(docs.filter(col("doc_id") % 2 =!= 0),
      root, 1L, partitionColumn = "lang", statsColumns = Seq("doc_id"))
  }

  private var n = 0
  private def lifecycle(wh: String): Seq[String] = {
    n += 1
    val s2 = spark.newSession()
    val c = s"graftclone$n"
    s2.conf.set(s"spark.sql.catalog.$c",
      classOf[graft.sources.EpochStoreCatalog].getName)
    s2.conf.set(s"spark.sql.catalog.$c.warehouse", wh)
    s2.sql(s"DELETE FROM $c.docs WHERE lang = 'en'")
    s2.sql(s"UPDATE $c.docs SET n_chars = -7 WHERE doc_id % 50 = 0")
    s2.sql(s"INSERT INTO $c.docs VALUES (9000001, 11, 'zz')")
    s2.sql(s"CALL $c.system.compact('docs')").collect()
    s2.sql(
      s"""SELECT lang, COUNT(*) AS n, SUM(n_chars) AS chars,
         |  MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
         |FROM $c.docs GROUP BY lang ORDER BY lang""".stripMargin)
      .collect().map(_.toString).toSeq
  }

  test("a cloned store answers a full DML lifecycle identically to a fresh build") {
    val fresh = java.nio.file.Files.createTempDirectory("clone_fresh").toString
    buildDocs(s"$fresh/docs")
    val cloned = MiscCatalog.clonedWh(spark, s"clone_spec:$sf", "clone_master") {
      wh => buildDocs(s"$wh/docs")
    }
    assert(lifecycle(cloned) === lifecycle(fresh))
  }

  test("two clones of one master are mutation-isolated from each other and the master") {
    val c1 = MiscCatalog.clonedWh(spark, s"clone_spec:$sf", "clone_master") {
      wh => buildDocs(s"$wh/docs")
    }
    val c2 = MiscCatalog.clonedWh(spark, s"clone_spec:$sf", "clone_master") {
      wh => buildDocs(s"$wh/docs")
    }
    assert(c1 !== c2)
    val before = lifecycle(c1) // mutates c1 only
    // c2 still serves the pristine fixture: same lifecycle produces the
    // same answer as a fresh clone (c1's mutations never leaked through
    // the shared master)
    assert(lifecycle(c2) === before)
  }
}
