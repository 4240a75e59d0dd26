package graft

import graft.core.EpochManifest
import graft.sources.{EpochStore, EpochStoreDv}

/** Randomized position-delete/position-delta STORM (X94/X99): a seeded
  * op sequence — appends, DV DELETEs, DV UPDATEs, MERGEs, compactions
  * — runs against an in-memory truth model, with the store's full
  * contents compared after EVERY op. Positions are the most
  * order-sensitive state in the engine (file ordinals bound to
  * immutable files across composed journals); a resurrection, a lost
  * update, a double-applied journal, or a mis-keyed rel would diverge
  * from the model within an op or two. */
class DvFuzzSpec extends SparkSpec {

  private def tmp() =
    java.nio.file.Files.createTempDirectory("graft_dvfz").toString

  test("a 40-op seeded DV delete/update/append/compact storm matches " +
      "the in-memory truth after every op") {
    import spark.implicits._
    val wh = tmp()
    spark.conf.set("spark.sql.catalog.dvfz",
      classOf[graft.sources.EpochStoreCatalog].getName)
    spark.conf.set("spark.sql.catalog.dvfz.warehouse", wh)
    val root = s"$wh/t"
    val rnd = new scala.util.Random(20260816L)

    // truth: id -> n (ids unique by construction; updates rewrite n)
    val truth = scala.collection.mutable.LinkedHashMap[Long, Long]()
    var nextId = 0L
    var epoch = 0L

    def append(k: Int): Unit = {
      val rows = (0 until k).map { _ =>
        val id = nextId; nextId += 1
        id -> rnd.nextLong(1000L)
      }
      rows.foreach { case (id, n) => truth(id) = n }
      EpochStore.write(rows.toDF("id", "n"), root, epoch)
      epoch += 1
    }

    def dvOn[A](body: => A): A = {
      spark.conf.set(EpochStoreDv.EnabledConf, "true")
      try body finally spark.conf.unset(EpochStoreDv.EnabledConf)
    }

    def check(tag: String): Unit = {
      val got = spark.sql("SELECT id, n FROM dvfz.t").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = truth.toSet
      assert(got == want,
        s"$tag diverged: missing=${(want -- got).take(5)} " +
          s"extra=${(got -- want).take(5)} " +
          s"(sizes got=${got.size} want=${want.size})")
    }

    append(rnd.between(50, 150))
    var compacts = 0
    (0 until 40).foreach { op =>
      val hi = if (nextId == 0) 1L else nextId
      rnd.nextInt(10) match {
        case 0 | 1 =>
          append(rnd.between(20, 80))
        case 2 | 3 | 4 =>
          // range DV DELETE (possibly matching nothing or everything
          // in range; AllDead entries drop metadata-only)
          val a = rnd.nextLong(hi)
          val b = math.min(hi, a + rnd.between(1L, hi / 2 + 1))
          dvOn { spark.sql(
            s"DELETE FROM dvfz.t WHERE id >= $a AND id < $b") }
          (a until b).foreach(truth.remove)
          epoch = EpochManifest.entries(spark, root)
            .map(_.epoch).max + 1
        case 5 | 6 | 7 =>
          // position-delta UPDATE over a range + value predicate
          val a = rnd.nextLong(hi)
          val b = math.min(hi, a + rnd.between(1L, hi / 3 + 1))
          val m = rnd.between(2L, 5L)
          dvOn { spark.sql(
            s"UPDATE dvfz.t SET n = n * 10 + 1 " +
              s"WHERE id >= $a AND id < $b AND n % $m = 0") }
          (a until b).foreach(id => truth.get(id).foreach { n =>
            if (n % m == 0) truth(id) = n * 10 + 1
          })
          epoch = EpochManifest.entries(spark, root)
            .map(_.epoch).maxOption.getOrElse(-1L) + 1
        case 8 =>
          // MERGE: update half the probe keys, insert fresh ones
          val keys = (0 until 10).map(_ => rnd.nextLong(hi + 5)).distinct
          val src = keys.map(k => (k, rnd.nextLong(1000L)))
          src.toDF("id", "n").createOrReplaceTempView("dvfz_src")
          dvOn { spark.sql(
            """MERGE INTO dvfz.t t USING dvfz_src s ON t.id = s.id
              |WHEN MATCHED THEN UPDATE SET n = s.n
              |WHEN NOT MATCHED THEN INSERT (id, n)
              |  VALUES (s.id, s.n)""".stripMargin) }
          src.foreach { case (id, n) =>
            if (truth.contains(id)) truth(id) = n
            else { truth(id) = n; nextId = math.max(nextId, id + 1) }
          }
          epoch = EpochManifest.entries(spark, root)
            .map(_.epoch).maxOption.getOrElse(-1L) + 1
        case 9 =>
          spark.sql("CALL dvfz.system.compact('t')").collect()
          compacts += 1
          epoch = EpochManifest.entries(spark, root)
            .map(_.epoch).maxOption.getOrElse(-1L) + 1
      }
      check(s"op $op")
    }
    // end state: compact once more and re-check — everything folds
    spark.sql("CALL dvfz.system.compact('t')").collect()
    check("final compact")
    val fs = new org.apache.hadoop.fs.Path(root).getFileSystem(
      spark.sessionState.newHadoopConf())
    assert(EpochManifest.entries(spark, root).forall(e =>
      EpochStoreDv.dvFiles(fs, root, e.dir).isEmpty),
      "the final fold must shed every journal")
    assert(compacts + 1 > 0)
  }

  test("a 30-op storm over a PARTITIONED store: partition-aligned " +
      "metadata drops, cross-dir position-delta updates, and range " +
      "deletes compose against the truth") {
    import spark.implicits._
    val wh = tmp()
    spark.conf.set("spark.sql.catalog.dvfz2",
      classOf[graft.sources.EpochStoreCatalog].getName)
    spark.conf.set("spark.sql.catalog.dvfz2.warehouse", wh)
    val root = s"$wh/t"
    val rnd = new scala.util.Random(424242L)
    val langs = IndexedSeq("en", "de", "fr")

    // truth: id -> (n, lang)
    val truth = scala.collection.mutable.LinkedHashMap[Long, (Long, String)]()
    var nextId = 0L
    var epoch = 0L

    def append(k: Int): Unit = {
      val rows = (0 until k).map { _ =>
        val id = nextId; nextId += 1
        (id, rnd.nextLong(1000L), langs(rnd.nextInt(3)))
      }
      rows.foreach { case (id, n, l) => truth(id) = (n, l) }
      EpochStore.write(rows.toDF("id", "n", "lang"), root, epoch,
        partitionColumn = "lang")
      epoch += 1
    }

    def dvOn[A](body: => A): A = {
      spark.conf.set(EpochStoreDv.EnabledConf, "true")
      try body finally spark.conf.unset(EpochStoreDv.EnabledConf)
    }

    def check(tag: String): Unit = {
      val got = spark.sql("SELECT id, n, lang FROM dvfz2.t").collect()
        .map(r => (r.getLong(0), (r.getLong(1), r.getString(2)))).toMap
      assert(got == truth.toMap,
        s"$tag diverged: sizes got=${got.size} want=${truth.size} " +
          s"missing=${(truth.keySet -- got.keySet).take(5)} " +
          s"extra=${(got.keySet -- truth.keySet).take(5)} " +
          s"valueDiff=${truth.collect { case (k, v)
            if got.get(k).exists(_ != v) => (k, v, got(k)) }.take(5)}")
    }

    append(rnd.between(60, 120))
    def bumpEpoch(): Unit =
      epoch = EpochManifest.entries(spark, root)
        .map(_.epoch).maxOption.getOrElse(-1L) + 1
    (0 until 30).foreach { op =>
      val hi = if (nextId == 0) 1L else nextId
      rnd.nextInt(10) match {
        case 0 | 1 =>
          append(rnd.between(20, 60))
        case 2 | 3 =>
          // id-range delete: MIXED entries journal, whole-dead drop
          val a = rnd.nextLong(hi)
          val b = math.min(hi, a + rnd.between(1L, hi / 2 + 1))
          dvOn { spark.sql(
            s"DELETE FROM dvfz2.t WHERE id >= $a AND id < $b") }
          (a until b).foreach(truth.remove)
          bumpEpoch()
        case 4 =>
          // partition-aligned delete: all-dead leafs drop metadata-only
          val l = langs(rnd.nextInt(3))
          dvOn { spark.sql(s"DELETE FROM dvfz2.t WHERE lang = '$l'") }
          truth.filterInPlace { case (_, (_, tl)) => tl != l }
          bumpEpoch()
        case 5 | 6 | 7 =>
          // cross-dir position-delta UPDATE: matched rows change lang
          val a = rnd.nextLong(hi)
          val b = math.min(hi, a + rnd.between(1L, hi / 3 + 1))
          val to = langs(rnd.nextInt(3))
          dvOn { spark.sql(
            s"UPDATE dvfz2.t SET lang = '$to', n = n + 7 " +
              s"WHERE id >= $a AND id < $b") }
          (a until b).foreach(id => truth.get(id).foreach {
            case (n, _) => truth(id) = (n + 7, to)
          })
          bumpEpoch()
        case 8 | 9 =>
          spark.sql("CALL dvfz2.system.compact('t')").collect()
          bumpEpoch()
      }
      check(s"op $op")
    }
    spark.sql("CALL dvfz2.system.compact('t')").collect()
    check("final compact")
  }
}
