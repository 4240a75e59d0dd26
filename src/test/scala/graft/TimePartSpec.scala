package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation
import org.apache.spark.sql.functions._
import graft.core.EpochManifest
import graft.sources.EpochStore

/** X93 — time-unit / truncate partition transforms: `PARTITIONED BY
  * (days(ts))` / `months` / `hours` / `years` / `truncate(w, col)` lay
  * rows under `<col>_<kind>=<unit>` dirs (the column kept in the
  * files, like the bucket level); range predicates on the column prune
  * whole unit dirs at PLANNING time, inclusive-boundary exact; the
  * level composes with identity partitioning (outer) and one bucket
  * level (inner); dynamic INSERT OVERWRITE replaces exactly the
  * written units. */
class TimePartSpec extends SparkSpec {

  private def tmp() =
    java.nio.file.Files.createTempDirectory("graft_tp").toString

  private def cat(name: String, wh: String): Unit = {
    spark.conf.set(s"spark.sql.catalog.$name",
      classOf[graft.sources.EpochStoreCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.warehouse", wh)
  }

  private def scanOf(df: org.apache.spark.sql.DataFrame)
      : graft.sources.EpochStoreScan =
    df.queryExecution.optimizedPlan.collect {
      case r: DataSourceV2ScanRelation => r.scan
    }.collectFirst { case s: graft.sources.EpochStoreScan => s }.get

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("days(ts): rows land under ts_day dirs, a ts-range probe prunes " +
      "to exactly the covered days, boundaries inclusive-exact") {
    import spark.implicits._
    val wh = tmp()
    cat("tp1", wh)
    val root = s"$wh/t"
    // 8 days x 6 rows, hourly spread
    val rows = for (d <- 0 until 8; h <- 0 until 6)
      yield (d * 6L + h, ts(f"2024-03-${10 + d}%02d ${h * 4}%02d:30:00"))
    rows.toDF("id", "ts")
      .write.format("epochstore").mode("append")
      .option("path", root).option("epoch", "0")
      .option("transform", "days(ts)").save()

    val fs = new org.apache.hadoop.fs.Path(root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val e0 = EpochManifest.entries(spark, root).head
    val dirs = fs.listStatus(
      new org.apache.hadoop.fs.Path(s"$root/${e0.dir}"))
      .filter(s => s.isDirectory && !s.getPath.getName.startsWith("_"))
      .map(_.getPath.getName).toSeq.sorted
    assert(dirs == (10 until 18).map(d => f"ts_day=2024-03-$d%02d"),
      s"one dir per day: $dirs")

    // full read exact — ts survives in the files
    assert(spark.sql("SELECT count(*) FROM tp1.t").head.getLong(0) == 48L)
    val all = spark.sql("SELECT id, ts FROM tp1.t ORDER BY id").collect()
    assert(all.map(_.getLong(0)).toSeq == rows.map(_._1))
    assert(all.map(_.getTimestamp(1)).toSeq == rows.map(_._2))

    // a two-day range prunes to 2-of-8 dirs
    val range = spark.sql("SELECT id FROM tp1.t WHERE " +
      "ts >= TIMESTAMP '2024-03-12 00:00:00' AND " +
      "ts < TIMESTAMP '2024-03-14 00:00:00'")
    assert(range.collect().map(_.getLong(0)).sorted.toSeq ==
      (12L until 24L))
    assert(scanOf(range).selectedPartitionDirs == (2, 8),
      s"audit: ${scanOf(range).selectedPartitionDirs}")

    // inclusive upper boundary keeps the boundary day
    val upTo = spark.sql("SELECT count(*) AS n FROM tp1.t WHERE " +
      "ts <= TIMESTAMP '2024-03-12 00:30:00'")
    assert(upTo.head.getLong(0) == 13L) // days 10,11 full + day 12 first row
    assert(scanOf(upTo).selectedPartitionDirs == (3, 8))

    // equality probe: one day
    val eq = spark.sql("SELECT count(*) AS n FROM tp1.t WHERE " +
      "ts = TIMESTAMP '2024-03-15 08:30:00'")
    assert(eq.head.getLong(0) == 1L)
    assert(scanOf(eq).selectedPartitionDirs == (1, 8))

    // a range matching NO day prunes everything
    val none = spark.sql("SELECT count(*) AS n FROM tp1.t WHERE " +
      "ts > TIMESTAMP '2024-05-01 00:00:00'")
    assert(none.head.getLong(0) == 0L)
    assert(scanOf(none).selectedPartitionDirs == (0, 8))
  }

  test("nulls land in the hive null dir; IsNull/IsNotNull prune it " +
      "exactly") {
    import spark.implicits._
    val wh = tmp()
    cat("tp2", wh)
    val root = s"$wh/t"
    val rows = Seq(
      (1L, ts("2024-01-01 05:00:00")), (2L, null), (3L, null),
      (4L, ts("2024-01-02 07:00:00")))
    rows.toDF("id", "ts")
      .write.format("epochstore").mode("append")
      .option("path", root).option("epoch", "0")
      .option("transform", "days(ts)").save()
    val isNull = spark.sql("SELECT id FROM tp2.t WHERE ts IS NULL")
    assert(isNull.collect().map(_.getLong(0)).sorted.toSeq == Seq(2L, 3L))
    assert(scanOf(isNull).selectedPartitionDirs == (1, 3))
    val notNull = spark.sql("SELECT id FROM tp2.t WHERE ts IS NOT NULL")
    assert(notNull.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 4L))
    assert(scanOf(notNull).selectedPartitionDirs == (2, 3))
    // a value probe never touches the null dir
    val v = spark.sql("SELECT id FROM tp2.t WHERE " +
      "ts = TIMESTAMP '2024-01-01 05:00:00'")
    assert(v.head.getLong(0) == 1L)
    assert(scanOf(v).selectedPartitionDirs == (1, 3))
  }

  test("SQL CREATE TABLE PARTITIONED BY (days(ts), bucket(4, id)): both " +
      "levels prune independently and compose") {
    val wh = tmp()
    cat("tp3", wh)
    spark.sql("CREATE TABLE tp3.t (id BIGINT, ts TIMESTAMP, v STRING) " +
      "PARTITIONED BY (days(ts), bucket(4, id))")
    spark.sql("INSERT INTO tp3.t VALUES " +
      (0 until 24).map(i =>
        s"($i, TIMESTAMP '2024-06-${10 + i % 3} 0${i % 10}:00:00', 'v$i')")
        .mkString(", "))
    assert(spark.sql("SELECT count(*) FROM tp3.t").head.getLong(0) == 24L)
    // day probe: 1-of-3 days, all 4 buckets under it
    val day = spark.sql("SELECT count(*) AS n FROM tp3.t WHERE " +
      "ts >= TIMESTAMP '2024-06-11 00:00:00' AND " +
      "ts < TIMESTAMP '2024-06-12 00:00:00'")
    assert(day.head.getLong(0) == 8L)
    val (sel, tot) = scanOf(day).selectedPartitionDirs
    assert(tot > sel && sel <= 1 + 4, s"audit: ($sel, $tot)")
    // composite probe: one day AND one id -> one day dir, one bucket
    val both = spark.sql("SELECT v FROM tp3.t WHERE id = 4 AND " +
      "ts >= TIMESTAMP '2024-06-11 00:00:00' AND " +
      "ts < TIMESTAMP '2024-06-12 00:00:00'")
    assert(both.head.getString(0) == "v4")
    val (sel2, tot2) = scanOf(both).selectedPartitionDirs
    assert(sel2 == 2 && tot2 >= 3 + 4, s"audit: ($sel2, $tot2)")
  }

  test("months/hours/years units and truncate(w) over ints and strings " +
      "round-trip and prune") {
    import spark.implicits._
    val wh = tmp()
    cat("tp4", wh)
    // months over DATE column
    val rootM = s"$wh/m"
    (1 to 12).map(m => (m.toLong, java.sql.Date.valueOf(f"2023-$m%02d-15")))
      .toDF("id", "d")
      .write.format("epochstore").mode("append")
      .option("path", rootM).option("epoch", "0")
      .option("transform", "months(d)").save()
    val feb = spark.sql("SELECT id FROM tp4.m WHERE " +
      "d >= DATE '2023-02-01' AND d < DATE '2023-04-01'")
    assert(feb.collect().map(_.getLong(0)).sorted.toSeq == Seq(2L, 3L))
    assert(scanOf(feb).selectedPartitionDirs == (2, 12))

    // hours over TIMESTAMP
    val rootH = s"$wh/h"
    (0 until 12).map(h => (h.toLong, ts(f"2024-01-01 $h%02d:30:00")))
      .toDF("id", "ts")
      .write.format("epochstore").mode("append")
      .option("path", rootH).option("epoch", "0")
      .option("transform", "hours(ts)").save()
    val h3 = spark.sql("SELECT id FROM tp4.h WHERE " +
      "ts >= TIMESTAMP '2024-01-01 03:00:00' AND " +
      "ts <= TIMESTAMP '2024-01-01 04:30:00'")
    assert(h3.collect().map(_.getLong(0)).sorted.toSeq == Seq(3L, 4L))
    assert(scanOf(h3).selectedPartitionDirs == (2, 12))

    // years over TIMESTAMP
    val rootY = s"$wh/y"
    (2019 to 2024).map(y => (y.toLong, ts(s"$y-07-01 12:00:00")))
      .toDF("id", "ts")
      .write.format("epochstore").mode("append")
      .option("path", rootY).option("epoch", "0")
      .option("transform", "years(ts)").save()
    val y2 = spark.sql("SELECT id FROM tp4.y WHERE " +
      "ts > TIMESTAMP '2022-12-31 23:59:59'")
    assert(y2.collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(2023L, 2024L))
    // 3 dirs: a row at 23:59:59.5 would satisfy the strict >, so the
    // 2022 dir must stay — sub-second boundaries are never over-pruned
    assert(scanOf(y2).selectedPartitionDirs == (3, 6))
    val y3 = spark.sql("SELECT id FROM tp4.y WHERE " +
      "ts >= TIMESTAMP '2023-01-01 00:00:00'")
    assert(y3.collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(2023L, 2024L))
    assert(scanOf(y3).selectedPartitionDirs == (2, 6))

    // truncate over BIGINT: width-100 ranges
    val rootT = s"$wh/t"
    (0 until 50).map(i => (i.toLong, i * 17L)).toDF("id", "v")
      .write.format("epochstore").mode("append")
      .option("path", rootT).option("epoch", "0")
      .option("transform", "truncate(100, v)").save()
    val t1 = spark.sql(
      "SELECT count(*) AS n FROM tp4.t WHERE v >= 300 AND v < 500")
    assert(t1.head.getLong(0) ==
      (0 until 50).count(i => i * 17 >= 300 && i * 17 < 500))
    val (selT, totT) = scanOf(t1).selectedPartitionDirs
    assert(selT == 2 && totT == 9, s"audit: ($selT, $totT)")

    // truncate over STRING: prefix dirs, equality + LIKE-prefix prune
    val rootS = s"$wh/s"
    Seq("apple", "apricot", "banana", "blueberry", "cherry", "avocado")
      .zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("id", "w")
      .write.format("epochstore").mode("append")
      .option("path", rootS).option("epoch", "0")
      .option("transform", "truncate(2, w)").save()
    val ap = spark.sql("SELECT w FROM tp4.s WHERE w = 'apricot'")
    assert(ap.head.getString(0) == "apricot")
    // five prefix dirs: ap, av, ba, bl, ch — equality opens only ap
    assert(scanOf(ap).selectedPartitionDirs == (1, 5))
    val pre = spark.sql("SELECT count(*) AS n FROM tp4.s WHERE w LIKE 'b%'")
    assert(pre.head.getLong(0) == 2L)
    assert(scanOf(pre).selectedPartitionDirs == (2, 5))
  }

  test("dynamic INSERT OVERWRITE replaces exactly the written day units " +
      "(composed with the bucket level), never the whole table") {
    val wh = tmp()
    cat("tp5", wh)
    spark.sql("CREATE TABLE tp5.t (id BIGINT, ts TIMESTAMP, v STRING) " +
      "PARTITIONED BY (days(ts), bucket(2, id))")
    spark.sql("INSERT INTO tp5.t VALUES " +
      (0 until 12).map(i =>
        s"($i, TIMESTAMP '2024-06-${10 + i % 3} 06:00:00', 'old$i')")
        .mkString(", "))
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      // overwrite rows of ONE day and ONE bucket: ids 0 and 6 both hit
      // day 2024-06-10; their (day, bucket) pairs are replaced, every
      // other pair survives
      spark.sql("INSERT OVERWRITE tp5.t VALUES " +
        "(0, TIMESTAMP '2024-06-10 09:00:00', 'new0')")
      val got = spark.sql("SELECT id, v FROM tp5.t").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(got(0L) == "new0")
      import org.apache.spark.sql.types.LongType
      val b0 = EpochStore.bucketIdOf(0L, LongType, 2)
      val replacedPair = (0 until 12).filter(i =>
        i % 3 == 0 && EpochStore.bucketIdOf(i.toLong, LongType, 2) == b0)
      replacedPair.filter(_ != 0).foreach(i =>
        assert(!got.contains(i.toLong),
          s"row $i shared the written (day, bucket) pair — replaced"))
      (0 until 12).filterNot(replacedPair.contains).foreach(i =>
        assert(got.get(i.toLong).contains(s"old$i"),
          s"row $i is on an unwritten pair — must survive: $got"))
    } finally
      spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
  }

  test("a transform entry mixed with a transform-less entry reads " +
      "exactly (unpruned degrade) and the streaming tail flows") {
    import spark.implicits._
    val wh = tmp()
    cat("tp6", wh)
    val root = s"$wh/t"
    (0 until 6).map(i => (i.toLong, ts(f"2024-02-0${1 + i % 3}%d 10:00:00")))
      .toDF("id", "ts")
      .write.format("epochstore").mode("append")
      .option("path", root).option("epoch", "0")
      .option("transform", "days(ts)").save()
    // epoch 1 lands WITHOUT the transform (stale options)
    Seq((100L, ts("2024-02-01 11:00:00")), (101L, ts("2024-02-09 11:00:00")))
      .toDF("id", "ts")
      .write.format("epochstore").mode("append")
      .option("path", root).option("epoch", "1").save()
    // mixed sidecars: the catalog serves NO transform -> unpruned exact
    val q = spark.sql("SELECT id FROM tp6.t WHERE " +
      "ts >= TIMESTAMP '2024-02-01 00:00:00' AND " +
      "ts < TIMESTAMP '2024-02-02 00:00:00'")
    assert(q.collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(0L, 3L, 100L))
    // a path read DECLARING the transform still prunes epoch 0's dirs
    // and serves the transform-less entry whole
    val pruned = spark.read.format("epochstore")
      .schema(spark.table("tp6.t").schema)
      .option("path", root).option("transform", "days(ts)").load()
      .filter(col("ts") >= lit(ts("2024-02-01 00:00:00")) &&
        col("ts") < lit(ts("2024-02-02 00:00:00")))
    assert(pruned.collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(0L, 3L, 100L))
    assert(scanOf(pruned).selectedPartitionDirs == (1, 3),
      s"audit: ${scanOf(pruned).selectedPartitionDirs}")

    // the tail delivers both epochs
    val q2 = spark.readStream.format("epochstore")
      .schema(spark.table("tp6.t").schema)
      .option("path", root).load()
      .writeStream.format("memory").queryName("tp6_tail")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q2.awaitTermination(60000)
    assert(spark.table("tp6_tail").count() == 8L)
  }

  test("a truncate-width MISMATCH between probe and entry degrades to " +
      "unpruned, never to dropped rows; matching entries still prune") {
    import spark.implicits._
    val wh = tmp()
    cat("tp6w", wh)
    val root = s"$wh/t"
    // epoch 0: width-8 units (v_trunc=0,8,16,24) — the dir names carry
    // NO width, so a width-4 probe binding [0,4) against v_trunc=0
    // would provably-false-drop rows 4..7 living in [4,8)
    (0 until 32).map(i => (i.toLong, i.toLong)).toDF("id", "v")
      .write.format("epochstore").mode("append")
      .option("path", root).option("epoch", "0")
      .option("transform", "truncate(8, v)").save()
    // epoch 1: width-4 units — matches the probe, prunes normally
    (100 until 132).map(i => (i.toLong, (i - 100).toLong)).toDF("id", "v")
      .write.format("epochstore").mode("append")
      .option("path", root).option("epoch", "1")
      .option("transform", "truncate(4, v)").save()
    val probe = spark.read.format("epochstore")
      .schema(spark.table("tp6w.t").schema)
      .option("path", root).option("transform", "truncate(4, v)").load()
      .filter(col("v") >= 4L && col("v") < 8L)
    assert(probe.collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(4L, 5L, 6L, 7L, 104L, 105L, 106L, 107L),
      "width-mismatched entries must serve their rows")
    // epoch 0's 4 dirs all kept (mismatch -> unpruned); epoch 1 prunes
    // to 1 of its 8 width-4 dirs
    assert(scanOf(probe).selectedPartitionDirs == (5, 12),
      s"audit: ${scanOf(probe).selectedPartitionDirs}")
  }

  test("guards: wrong types refuse; transform writes COMPOSE with a " +
      "layout log (the X92 mixed-spec posture: exact, per-entry)") {
    import spark.implicits._
    val wh = tmp()
    cat("tp7", wh)
    val root = s"$wh/t"
    (0 until 4).map(i => (i.toLong, s"v$i")).toDF("id", "v")
      .write.format("epochstore").mode("append")
      .option("path", root).option("epoch", "0")
      .option("bucketColumn", "id").option("bucketCount", "2").save()
    spark.sql("CALL tp7.system.evolve_layout('t', " +
      "bucket_column => 'id', bucket_count => 4)").collect()
    // a transform write on the layout-log store lands as one more
    // mixed-spec entry; reads stay exact across all three specs
    Seq((9L, "xx")).toDF("id", "v")
      .write.format("epochstore").mode("append")
      .option("path", root).option("epoch", "1")
      .option("transform", "truncate(2, v)").save()
    assert(spark.sql("SELECT id FROM tp7.t").collect()
      .map(_.getLong(0)).toSet == (0L until 4L).toSet + 9L)
    // hours over a DATE column refuses
    val e2 = intercept[Exception] {
      Seq((1L, java.sql.Date.valueOf("2024-01-01"))).toDF("id", "d")
        .write.format("epochstore").mode("append")
        .option("path", s"$wh/t2").option("epoch", "0")
        .option("transform", "hours(d)").save()
    }
    val m2 = Iterator.iterate(e2: Throwable)(_.getCause)
      .takeWhile(_ != null).map(String.valueOf).mkString("\n")
    assert(m2.contains("TIMESTAMP"), m2)
    // evolve_layout on a transform store: composes (the transform
    // entries keep serving, unpruned under the new identity layout)
    cat("tp7b", wh)
    (0 until 4).map(i => (i.toLong, ts("2024-01-01 05:00:00")))
      .toDF("id", "ts")
      .write.format("epochstore").mode("append")
      .option("path", s"$wh/t3").option("epoch", "0")
      .option("transform", "days(ts)").save()
    spark.sql("CALL tp7b.system.evolve_layout('t3', " +
      "partition_columns => '')").collect()
    assert(spark.sql("SELECT count(*) FROM tp7b.t3").head.getLong(0) == 4L)
    // ...and an evolve TO a transform validates its column/type
    val e3 = intercept[Exception] {
      spark.sql("CALL tp7b.system.evolve_layout('t3', " +
        "transform => 'days(id)')").collect()
    }
    val m3 = Iterator.iterate(e3: Throwable)(_.getCause)
      .takeWhile(_ != null).map(String.valueOf).mkString("\n")
    assert(m3.contains("TIMESTAMP") || m3.contains("DATE"), m3)
  }

  test("CALL compact PRESERVES the transform layout: the fold lands the " +
      "same unit dirs (bucket composed), pruning and the catalog-served " +
      "transform survive") {
    val wh = tmp()
    cat("tp8", wh)
    spark.sql("CREATE TABLE tp8.t (id BIGINT, ts TIMESTAMP, v STRING) " +
      "PARTITIONED BY (days(ts), bucket(2, id))")
    spark.sql("INSERT INTO tp8.t VALUES " +
      (0 until 12).map(i =>
        s"($i, TIMESTAMP '2024-06-${10 + i % 3} 06:00:00', 'a$i')")
        .mkString(", "))
    spark.sql("INSERT INTO tp8.t VALUES " +
      (100 until 112).map(i =>
        s"($i, TIMESTAMP '2024-06-${13 + i % 2} 06:00:00', 'b$i')")
        .mkString(", "))
    spark.sql("CALL tp8.system.compact('t')").collect()
    val root = s"$wh/t"
    val es = graft.core.EpochManifest.entries(spark, root)
    assert(es.size == 1, s"one fold: ${es.map(_.dir)}")
    val fs = new org.apache.hadoop.fs.Path(root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val dirs = fs.listStatus(
      new org.apache.hadoop.fs.Path(s"$root/${es.head.dir}"))
      .filter(s => s.isDirectory && !s.getPath.getName.startsWith("_"))
      .map(_.getPath.getName).toSeq.sorted
    assert(dirs == Seq("ts_day=2024-06-10", "ts_day=2024-06-11",
      "ts_day=2024-06-12", "ts_day=2024-06-13", "ts_day=2024-06-14"),
      s"the fold must land the SAME unit dirs appends do: $dirs")
    // everything exact, and a day+id probe prunes both levels through
    // the fold
    assert(spark.sql("SELECT count(*) FROM tp8.t").head.getLong(0) == 24L)
    val probe = spark.sql("SELECT v FROM tp8.t WHERE id = 4 AND " +
      "ts >= TIMESTAMP '2024-06-11 00:00:00' AND " +
      "ts < TIMESTAMP '2024-06-12 00:00:00'")
    assert(probe.head.getString(0) == "a4")
    val (sel, tot) = scanOf(probe).selectedPartitionDirs
    assert(sel == 2 && tot == 5 + 2, s"audit: ($sel, $tot)")
  }

  test("CALL compact preserves a STRING-truncate layout when every " +
      "prefix is dir-safe; an exotic prefix degrades transform-less " +
      "but stays exact") {
    import spark.implicits._
    val wh = tmp()
    cat("tp8s", wh)
    // safe alphabet: fold keeps the unit dirs, pruning survives
    val rootS = s"$wh/s"
    def write(root: String, epoch: Int, words: Seq[String]): Unit =
      words.zipWithIndex.map { case (w, i) =>
        ((epoch * 100 + i).toLong, w) }.toDF("id", "w")
        .write.format("epochstore").mode("append")
        .option("path", root).option("epoch", epoch.toString)
        .option("transform", "truncate(2, w)").save()
    write(rootS, 0, Seq("apple", "apricot", "banana"))
    write(rootS, 1, Seq("blueberry", "cherry", "avocado"))
    spark.sql("CALL tp8s.system.compact('s')").collect()
    val fs = new org.apache.hadoop.fs.Path(rootS).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val es = graft.core.EpochManifest.entries(spark, rootS)
    assert(es.size == 1)
    val dirs = fs.listStatus(
      new org.apache.hadoop.fs.Path(s"$rootS/${es.head.dir}"))
      .filter(s => s.isDirectory && !s.getPath.getName.startsWith("_"))
      .map(_.getPath.getName).toSeq.sorted
    assert(dirs == Seq("w_trunc=ap", "w_trunc=av", "w_trunc=ba",
      "w_trunc=bl", "w_trunc=ch"),
      s"safe-prefix fold must keep the unit dirs: $dirs")
    val ap = spark.sql("SELECT w FROM tp8s.s WHERE w = 'apricot'")
    assert(ap.head.getString(0) == "apricot")
    assert(scanOf(ap).selectedPartitionDirs == (1, 5),
      s"audit: ${scanOf(ap).selectedPartitionDirs}")
    // exotic prefixes (space — hive and %XX escaping disagree): the
    // fold lands transform-less, every row still served exactly
    val rootX = s"$wh/x"
    write(rootX, 0, Seq("a b", "a c", "zz top"))
    write(rootX, 1, Seq("npm pkg", "plain"))
    spark.sql("CALL tp8s.system.compact('x')").collect()
    val esX = graft.core.EpochManifest.entries(spark, rootX)
    assert(esX.size == 1)
    val allX = spark.sql("SELECT w FROM tp8s.x ORDER BY w")
    assert(scanOf(allX).transform.isEmpty,
      "exotic prefixes must degrade the fold to transform-less")
    assert(allX.collect()
      .map(_.getString(0)).toSeq ==
      Seq("a b", "a c", "npm pkg", "plain", "zz top"))
    assert(spark.sql("SELECT count(*) FROM tp8s.x WHERE w = 'a b'")
      .head.getLong(0) == 1L)
  }

  test("CALL migrate_layout(transform => 'days(ts)') ADOPTS the unit " +
      "layout on an existing store: unit dirs land, probes prune, the " +
      "catalog serves the transform, answers exact") {
    import spark.implicits._
    val wh = tmp()
    cat("tp9", wh)
    val root = s"$wh/t"
    // an ordinary unpartitioned history
    (0 until 30).map(i => (i.toLong, ts(f"2024-02-${1 + i % 5}%02d 08:00:00")))
      .toDF("id", "ts")
      .write.format("epochstore").mode("append")
      .option("path", root).option("epoch", "0").save()
    val res = spark.sql("CALL tp9.system.migrate_layout('t', " +
      "bucket_column => 'id', bucket_count => 2, " +
      "transform => 'days(ts)')").collect()
    assert(res.head.getInt(1) == 1, s"one fold: ${res.head}")
    val fs = new org.apache.hadoop.fs.Path(root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val e = graft.core.EpochManifest.entries(spark, root).head
    val dirs = fs.listStatus(
      new org.apache.hadoop.fs.Path(s"$root/${e.dir}"))
      .filter(s => s.isDirectory && !s.getPath.getName.startsWith("_"))
      .map(_.getPath.getName).toSeq.sorted
    assert(dirs == (1 to 5).map(d => f"ts_day=2024-02-$d%02d"),
      s"migrated unit dirs: $dirs")
    assert(spark.sql("SELECT count(*) FROM tp9.t").head.getLong(0) == 30L)
    val probe = spark.sql("SELECT count(*) AS n FROM tp9.t WHERE " +
      "ts >= TIMESTAMP '2024-02-02 00:00:00' AND " +
      "ts < TIMESTAMP '2024-02-03 00:00:00'")
    assert(probe.head.getLong(0) == 6L)
    val (sel, tot) = scanOf(probe).selectedPartitionDirs
    assert(sel <= 1 + 2 && tot == 5 + 2 * 1,
      s"audit: ($sel, $tot)") // 5 day dirs + 2 buckets under the kept day
  }

  test("randomized boundary sweep: every predicate over every unit kind " +
      "answers exactly like the in-memory truth (pruning can only ever " +
      "drop provably-dead dirs) — pre-1970 values included") {
    import spark.implicits._
    val wh = tmp()
    val rnd = new scala.util.Random(20260816L)
    // timestamps clustered AT unit boundaries on purpose, spanning
    // pre-epoch (negative micros) to post-2024
    val anchors = Seq(
      "1969-12-31 23:59:59", "1970-01-01 00:00:00", "1970-01-01 00:00:01",
      "2023-12-31 23:59:59", "2024-01-01 00:00:00", "2024-02-29 12:00:00",
      "2024-03-01 00:00:00", "2024-06-15 06:30:30")
    val tss: IndexedSeq[Timestamp] = (0 until 160).map { i =>
      val base = ts(anchors(i % anchors.length)).getTime
      new Timestamp(base + (rnd.nextInt(7) - 3) * 1000L +
        rnd.nextInt(1000))
    }
    val rows = tss.zipWithIndex.map { case (t, i) =>
      (i.toLong, if (i % 19 == 0) null else t)
    }
    for ((kind, name) <- Seq(("days(ts)", "d"), ("hours(ts)", "h"),
      ("months(ts)", "mo"), ("years(ts)", "y"))) {
      val root = s"$wh/$name"
      rows.toDF("id", "ts")
        .write.format("epochstore").mode("append")
        .option("path", root).option("epoch", "0")
        .option("transform", kind).save()
      val sch = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("ts",
          org.apache.spark.sql.types.TimestampType)))
      def readT = spark.read.format("epochstore").schema(sch)
        .option("path", root).option("transform", kind).load()
      // 40 random predicates per kind: boundary-anchored probes of
      // every comparison shape
      (0 until 40).foreach { k =>
        val v = new Timestamp(
          ts(anchors(rnd.nextInt(anchors.length))).getTime +
            (rnd.nextInt(5) - 2) * 1000L)
        val hi = new Timestamp(v.getTime + 90L * 3600 * 1000)
        // (spark predicate, in-memory truth on a NON-NULL value, label)
        val (p, f, label): (org.apache.spark.sql.Column,
            Timestamp => Boolean, String) = rnd.nextInt(7) match {
          case 0 => (col("ts") === lit(v), (_: Timestamp) == v, s"= $v")
          case 1 => (col("ts") > lit(v),
            (t: Timestamp) => t.getTime > v.getTime, s"> $v")
          case 2 => (col("ts") >= lit(v),
            (t: Timestamp) => t.getTime >= v.getTime, s">= $v")
          case 3 => (col("ts") < lit(v),
            (t: Timestamp) => t.getTime < v.getTime, s"< $v")
          case 4 => (col("ts") <= lit(v),
            (t: Timestamp) => t.getTime <= v.getTime, s"<= $v")
          case 5 => (col("ts").isNull, (_: Timestamp) => false, "IS NULL")
          case 6 => (col("ts") >= lit(v) && col("ts") < lit(hi),
            (t: Timestamp) => t.getTime >= v.getTime &&
              t.getTime < hi.getTime, s"[$v, $hi)")
        }
        val got = readT.filter(p).select("id").collect()
          .map(_.getLong(0)).toSet
        val want = rows.filter { case (_, t) =>
          if (t == null) label == "IS NULL" else f(t)
        }.map(_._1).toSet
        assert(got == want,
          s"$kind diverged on $label: missing=${want -- got} " +
            s"extra=${got -- want}")
      }
    }
    // truncate over negative and positive longs, boundary probes
    val rootT = s"$wh/tr"
    val vals = (0 until 120).map(i =>
      (i.toLong, (rnd.nextInt(2001) - 1000).toLong))
    vals.toDF("id", "v")
      .write.format("epochstore").mode("append")
      .option("path", rootT).option("epoch", "0")
      .option("transform", "truncate(100, v)").save()
    val schT = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.LongType)))
    def readTr = spark.read.format("epochstore").schema(schT)
      .option("path", rootT).option("transform", "truncate(100, v)").load()
    (0 until 40).foreach { _ =>
      val b = (rnd.nextInt(21) - 10) * 100L + (rnd.nextInt(3) - 1)
      val (p, f): (org.apache.spark.sql.Column, Long => Boolean) =
        rnd.nextInt(5) match {
          case 0 => (col("v") === b, (_: Long) == b)
          case 1 => (col("v") > b, (_: Long) > b)
          case 2 => (col("v") >= b, (_: Long) >= b)
          case 3 => (col("v") < b, (_: Long) < b)
          case 4 => (col("v") <= b, (_: Long) <= b)
        }
      val got = readTr.filter(p).select("id").collect()
        .map(_.getLong(0)).toSet
      val want = vals.filter(t => f(t._2)).map(_._1).toSet
      assert(got == want, s"truncate diverged on $b: " +
        s"missing=${want -- got} extra=${got -- want}")
    }
  }
}
