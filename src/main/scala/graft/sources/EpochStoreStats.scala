package graft.sources

import java.nio.charset.StandardCharsets
import java.util.Base64

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.sources
import org.apache.spark.sql.sources.Filter

/** Per-file statistics sidecars on the epochstore — the manifest-carried
  * data-skipping layer (Delta's `stats` in the log / Iceberg's manifest
  * metrics, at this engine's scale):
  *
  *  - every committed epoch publishes ONE `_skip/stats.json` in its entry
  *    dir, written by the DRIVER at commit from the task commit messages
  *    (no post-hoc footer scans — the tasks already saw every row), with
  *    a row count per data file and, for the write's declared
  *    `statsColumns`, per-column min / max / null counts;
  *  - the scan consults them at PLANNING: a conjunctive range / equality
  *    / IN / null-ness / prefix predicate over a stats column drops every
  *    file whose [min, max] + null counts PROVE no row can match — IO is
  *    one tiny JSON per (already dir-pruned) entry, not the data;
  *  - row counts alone (recorded for every file, option or not) power
  *    LIMIT truncation, metadata row-count statistics
  *    ([[EpochStoreScan.estimateStatistics]]), and the sorted store's
  *    ORDER-BY-LIMIT file bound ([[EpochStoreScan]]'s TopN push).
  *
  * Skipping is EXACT by construction: min/max/null counts are computed
  * from the written rows with the same comparison the probe uses
  * (numeric promotion to BigDecimal, UTF-8 BINARY ordering for strings
  * — the order Spark's own string comparisons use, see [[utf8Cmp]] —
  * NOT parquet's possibly-truncated binary stats), a file
  * without a sidecar or without the probed column is always kept, and
  * the residual filter still runs on every surviving row. Supported
  * stats column types: integral widths, float/double, string.
  *
  * Format (one line per data file, base64 for anything string-ish so the
  * fixed-shape parser never meets an escaping edge):
  * `{"file":"<b64 rel>","rows":N,"cols":[{"c":"<b64 name>","t":"l|d|S",
  * "nulls":N[,"min":v,"max":v]}]}` — min/max absent = every value null.
  * Kind `S` = string bounds under UTF-8 binary order (r13+ writers);
  * legacy kind `s` (pre-r13, UTF-16 `String.compareTo` order) still
  * parses but contributes only null-count proofs — its bounds prove
  * nothing under the UTF-8 probe until a compaction re-derives them.
  */
object EpochStoreStats {

  /** One column's accumulated stats: `min`/`max` are Long, Double, or
    * String (None = all values null). `ndv` = the column's per-file HLL
    * register vector ([[Ndv]], 2^9 bytes) — registers MERGE across any
    * file subset by per-register max, so the scan folds the PLANNED
    * files' sketches into one distinct-count estimate for CBO
    * ([[EpochStoreScan.estimateStatistics]]); absent on pre-NDV
    * sidecars (distinctCount is then simply not reported). */
  final case class ColStats(kind: Char, nulls: Long,
                            min: Option[Any], max: Option[Any],
                            ndv: Option[Array[Byte]] = None)
      extends Serializable

  /** The sidecar NDV sketch: a fixed p=9 (512-register) HyperLogLog
    * over xxHash64 of the column's accumulated representation (long for
    * integral widths, double for floats, UTF-8 bytes for strings — the
    * same representations the skip tiers compare). ~4.6% standard
    * error; 512 B raw / ~684 B base64 per (file, column) — manifest-
    * index-sized, never data-sized. The WRITER accumulates per row
    * (one xxHash64 per value — a bucket-hash-level cost, not md5), rewrites
    * re-derive via [[NdvRegistersAgg]] with the identical hash, and
    * the fold is exact under per-register max regardless of how files
    * are grouped. */
  object Ndv {
    val P = 9
    val M: Int = 1 << P
    private val Seed = 9001L

    import org.apache.spark.sql.catalyst.expressions.XxHash64Function
    import org.apache.spark.sql.types.{DoubleType, LongType, StringType}

    /** Hash of one ACCUMULATED value (java.lang.Long / java.lang.Double
      * / UTF8String — exactly what the writer's stats loop produced).
      * xxHash64, NOT murmur3: Spark's murmur3 is 32-bit (sign-extended
      * into the Long), which would collapse the top-bit register index
      * to two registers. */
    def hashOf(v: Any): Long = v match {
      case l: java.lang.Long => XxHash64Function.hash(l, LongType, Seed)
      case d: java.lang.Double =>
        XxHash64Function.hash(d, DoubleType, Seed)
      case u: org.apache.spark.unsafe.types.UTF8String =>
        XxHash64Function.hash(u, StringType, Seed)
      case s: String => XxHash64Function.hash(
        org.apache.spark.unsafe.types.UTF8String.fromString(s),
        StringType, Seed)
      case other => throw new IllegalStateException(
        s"ndv sketch over unsupported accumulated value $other")
    }

    def add(regs: Array[Byte], h: Long): Unit = {
      val reg = (h >>> (64 - P)).toInt
      val w = h << P
      val rank =
        if (w == 0L) (64 - P + 1)
        else java.lang.Long.numberOfLeadingZeros(w) + 1
      if (rank > regs(reg)) regs(reg) = rank.toByte
    }

    /** Per-register max — the lossless HLL union. */
    def mergeInto(into: Array[Byte], from: Array[Byte]): Unit = {
      var i = 0
      while (i < M) { if (from(i) > into(i)) into(i) = from(i); i += 1 }
    }

    /** Bias-corrected estimate (the [[graft.plans.HllRegistersAgg]]
      * formula, shared). */
    def estimate(regs: Array[Byte]): Long =
      math.round(graft.plans.HllRegistersAgg.estimate(regs.map(_.toInt)))
  }

  /** One data file's stats: total row count + per-column stats keyed by
    * column name. `len`/`mtime` (bytes, epoch millis; len = -1 on
    * pre-r14 sidecars) make the sidecar a FILE-LEVEL MANIFEST INDEX:
    * an entry whose every file records a length is planned straight
    * from this sidecar — partition values parsed from the recorded
    * relative paths, splits sized from `len` — with ZERO `listStatus`
    * below the entry root ([[EpochStore.listEntryFiles]]), the
    * Delta/Iceberg metadata-in-the-log property that keeps planning
    * O(manifest) instead of O(files-on-disk). */
  final case class FileStats(rows: Long, cols: Map[String, ColStats],
                             len: Long = -1L, mtime: Long = 0L)
      extends Serializable

  private def b64(s: String): String =
    Base64.getEncoder.encodeToString(s.getBytes(StandardCharsets.UTF_8))
  private def unb64(s: String): String =
    new String(Base64.getDecoder.decode(s), StandardCharsets.UTF_8)

  /** Serialize one (relFile -> stats) map as the sidecar body. */
  def render(stats: Seq[(String, FileStats)]): String =
    stats.map { case (rel, fsr) =>
      val cols = fsr.cols.toSeq.sortBy(_._1).map { case (c, cs) =>
        val mm = (cs.min, cs.max) match {
          case (Some(mn), Some(mx)) =>
            val (a, b) = cs.kind match {
              case 's' | 'S' => (s""""${b64(mn.toString)}"""",
                s""""${b64(mx.toString)}"""")
              case _ => (mn.toString, mx.toString)
            }
            s""","min":$a,"max":$b"""
          case _ => ""
        }
        // per-file NDV registers do NOT serialize: the sidecar carries
        // ONE merged sketch per column for the whole entry instead
        // ([[writeEntryNdv]]) — at 10k files × 8 columns the per-file
        // form is ~40 MB of planning-time sidecar, the entry form ~5 KB
        s"""{"c":"${b64(c)}","t":"${cs.kind}","nulls":${cs.nulls}$mm}"""
      }.mkString("[", ",", "]")
      val ix = if (fsr.len >= 0L) s""","len":${fsr.len},"mt":${fsr.mtime}"""
        else ""
      s"""{"file":"${b64(rel)}","rows":${fsr.rows}$ix,"cols":$cols}"""
    }.mkString("", "\n", "\n")

  private val fileRe =
    (""""file":"([^"]*)","rows":(\d+)""" +
      """(?:,"len":(\d+),"mt":(\d+))?""").r.unanchored
  private val colRe =
    (""""c":"([^"]*)","t":"(.)","nulls":(\d+)""" +
      """(?:,"min":("[^"]*"|[^,}\]]+),"max":("[^"]*"|[^,}\]]+))?""" +
      """(?:,"ndv":"([^"]*)")?""").r

  /** Parse a sidecar body back to (relFile -> stats). The writer's fixed
    * shape + base64 values make this regex split exact. */
  def parse(body: String): Map[String, FileStats] =
    body.linesIterator.filter(_.nonEmpty).map { line =>
      val m = fileRe.findFirstMatchIn(line).getOrElse(
        throw new IllegalStateException(s"bad stats line: $line"))
      val cols = colRe.findAllMatchIn(line).map { cm =>
        val kind = cm.group(2).charAt(0)
        def v(g: String): Option[Any] = Option(g).map { raw =>
          kind match {
            case 's' | 'S' => unb64(raw.stripPrefix("\"").stripSuffix("\""))
            case 'd' => raw.toDouble
            case _ => raw.toLong
          }
        }
        unb64(cm.group(1)) ->
          ColStats(kind, cm.group(3).toLong, v(cm.group(4)), v(cm.group(5)),
            Option(cm.group(6)).map(Base64.getDecoder.decode))
      }.toMap
      unb64(m.group(1)) -> FileStats(m.group(2).toLong, cols,
        len = Option(m.group(3)).map(_.toLong).getOrElse(-1L),
        mtime = Option(m.group(4)).map(_.toLong).getOrElse(0L))
    }.toMap

  /** Sidecar path inside one committed entry dir. */
  def sidecarPath(root: String, entryDir: String): Path =
    new Path(s"$root/$entryDir/_skip/stats.json")

  /** Driver-side publish at commit: one sidecar for the whole entry.
    * An EMPTY stats list still writes (a zero-byte sidecar) — it is the
    * index record that lets [[readIndexed]] distinguish an indexed
    * empty epoch (plan: no files, no listing) from a pre-index entry
    * (fall back to listing). Per-file NDV registers fold into ONE
    * entry-level sketch per column here ([[writeEntryNdv]] — register
    * max is associative, so the commit-time fold is lossless) and never
    * serialize per file. */
  def write(fs: FileSystem, root: String, entryDir: String,
            stats: Seq[(String, FileStats)]): Unit = {
    val p = sidecarPath(root, entryDir)
    fs.mkdirs(p.getParent)
    val out = fs.create(p, true)
    try out.write(render(stats).getBytes(StandardCharsets.UTF_8))
    finally out.close()
    writeEntryNdv(fs, root, entryDir, stats)
  }

  /** Entry-level NDV sidecar path. */
  def ndvPath(root: String, entryDir: String): Path =
    new Path(s"$root/$entryDir/_skip/ndv.json")

  /** Fold the per-file register vectors into one sketch per column and
    * publish — a column reports only when EVERY file holding it carries
    * a sketch (a partial union proves nothing). Absent/empty = the
    * entry serves no distinct-count statistic. */
  private def writeEntryNdv(fs: FileSystem, root: String, entryDir: String,
                            stats: Seq[(String, FileStats)]): Unit = {
    val colKinds = stats.flatMap(_._2.cols.toSeq.map { case (c, cs) =>
      (c, cs.kind) }).distinct
    val merged = colKinds.flatMap { case (c, kind) =>
      val per = stats.flatMap(_._2.cols.get(c)).filter(_.kind == kind)
      if (per.isEmpty || per.exists(_.ndv.isEmpty)) None
      else {
        val acc = new Array[Byte](Ndv.M)
        per.foreach(cs => Ndv.mergeInto(acc, cs.ndv.get))
        Some((c, kind, acc))
      }
    }
    val p = ndvPath(root, entryDir)
    if (merged.isEmpty) { if (fs.exists(p)) { fs.delete(p, false); () } }
    else {
      val body = merged.sortBy(_._1).map { case (c, kind, regs) =>
        s"""{"c":"${b64(c)}","t":"$kind","ndv":"${
          Base64.getEncoder.encodeToString(regs)}"}"""
      }.mkString("", "\n", "\n")
      val out = fs.create(p, true)
      try out.write(body.getBytes(StandardCharsets.UTF_8))
      finally out.close()
    }
  }

  private val ndvRe =
    (""""c":"([^"]*)","t":"(.)","ndv":"([^"]*)"""").r

  /** One entry's merged NDV sketches: column → (kind, registers).
    * Empty for entries without one (pre-NDV epochs, sliced copies). */
  def readEntryNdv(fs: FileSystem, root: String, entryDir: String)
      : Map[String, (Char, Array[Byte])] = {
    val p = ndvPath(root, entryDir)
    if (!fs.exists(p)) return Map.empty
    val in = fs.open(p)
    val body = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
    body.linesIterator.filter(_.nonEmpty).flatMap { line =>
      ndvRe.findFirstMatchIn(line).map(m =>
        unb64(m.group(1)) ->
          (m.group(2).charAt(0), Base64.getDecoder.decode(m.group(3))))
    }.toMap
  }

  /** Load one entry's sidecar (empty when the epoch predates stats). */
  def read(fs: FileSystem, root: String, entryDir: String)
      : Map[String, FileStats] = readIndexed(fs, root, entryDir)
    .getOrElse(Map.empty)

  /** [[read]], distinguishing a MISSING sidecar (None — a pre-index
    * entry, scan planning must list the dirs) from a present one (the
    * authoritative file-level index, possibly empty). */
  def readIndexed(fs: FileSystem, root: String, entryDir: String)
      : Option[Map[String, FileStats]] = {
    val p = sidecarPath(root, entryDir)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val body = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
      Some(parse(body))
    }
  }

  /** UTF-8 binary string ordering — the order Spark evaluates string
    * `<`/`>` under (`UTF8String.compareTo` compares the encoded bytes
    * unsigned). Java's `String.compareTo` (UTF-16 code units) DISAGREES
    * for supplementary characters: surrogates (0xD800-0xDFFF) sort
    * below U+E000..U+FFFF in UTF-16 but a supplementary code point's
    * UTF-8 bytes (0xF0..) sort above every BMP character's — so a
    * min/max recorded under one order and probed under the other can
    * wrongly skip a file. Every stats accumulation AND probe in this
    * store compares strings through here. */
  def utf8Cmp(a: String, b: String): Int =
    java.util.Arrays.compareUnsigned(
      a.getBytes(StandardCharsets.UTF_8), b.getBytes(StandardCharsets.UTF_8))

  /** Numeric/string comparison shared by the skip evaluation and the
    * TopN file bound — the SAME ordering the writer accumulated min/max
    * under (and, for strings, the UTF-8 binary order Spark's row-level
    * comparisons use), so a skip can never be optimistic. Returns None
    * for incomparable pairs (type confusion = keep the file). */
  def cmp(a: Any, b: Any): Option[Int] = (a, b) match {
    case (x: String, y: String) => Some(utf8Cmp(x, y))
    case (x: Number, y: Number) =>
      Some(new java.math.BigDecimal(x.toString)
        .compareTo(new java.math.BigDecimal(y.toString)))
    case _ => None
  }

  /** Can ANY row of a file with stats `fsr` satisfy `f`? Three-valued:
    * Some(false) = provably no row matches (SKIP the file), anything
    * else keeps it. Sound under conjunction/disjunction: And skips when
    * either side proves impossible, Or only when both do; Not is kept
    * conservative (existence of a non-matching row is not provable from
    * min/max alone). */
  def canMatch(f: Filter, fsr: FileStats): Option[Boolean] = {
    def col(n: String): Option[ColStats] = fsr.cols.get(n)
    def nonNull(cs: ColStats): Long = fsr.rows - cs.nulls
    // comparisons against a column with NO non-null value never match
    def range(n: String)(p: (Any, Any) => Option[Boolean]): Option[Boolean] =
      col(n).flatMap { cs =>
        if (nonNull(cs) <= 0L) Some(false)
        // LEGACY kind 's': bounds were accumulated under UTF-16
        // String.compareTo order (pre-r13 writers) — order/range/prefix
        // proofs under the UTF-8 probe would be unsound, so the file is
        // always kept until a compaction re-derives its stats as 'S'.
        // (null-count proofs above stay valid — counts have no order.)
        else if (cs.kind == 's') None
        else (cs.min, cs.max) match {
          case (Some(mn), Some(mx)) => p(mn, mx)
          case _ => Some(false) // no recorded min/max = all null
        }
      }
    f match {
      case sources.EqualTo(a, v) if v != null =>
        range(a)((mn, mx) => for {
          c1 <- cmp(v, mn); c2 <- cmp(v, mx)
        } yield c1 >= 0 && c2 <= 0)
      case sources.EqualNullSafe(a, v) =>
        if (v == null) col(a).map(_.nulls > 0L)
        else canMatch(sources.EqualTo(a, v), fsr)
      case sources.In(a, vs) =>
        val nonNullVs = vs.filter(_ != null)
        val nullable = vs.length != nonNullVs.length
        // IN (… , null) matches nothing extra (three-valued SQL), so
        // only the non-null probes decide; an all-null probe list
        // matches nothing
        if (nonNullVs.isEmpty && !nullable) Some(false)
        else if (nonNullVs.isEmpty) Some(false)
        else {
          val hits = nonNullVs.map(v => canMatch(sources.EqualTo(a, v), fsr))
          if (hits.exists(_.contains(true))) Some(true)
          else if (hits.forall(_.contains(false))) Some(false)
          else None
        }
      case sources.GreaterThan(a, v) if v != null =>
        range(a)((_, mx) => cmp(mx, v).map(_ > 0))
      case sources.GreaterThanOrEqual(a, v) if v != null =>
        range(a)((_, mx) => cmp(mx, v).map(_ >= 0))
      case sources.LessThan(a, v) if v != null =>
        range(a)((mn, _) => cmp(mn, v).map(_ < 0))
      case sources.LessThanOrEqual(a, v) if v != null =>
        range(a)((mn, _) => cmp(mn, v).map(_ <= 0))
      case sources.IsNull(a) => col(a).map(_.nulls > 0L)
      case sources.IsNotNull(a) => col(a).map(nonNull(_) > 0L)
      case sources.StringStartsWith(a, prefix) if prefix != null =>
        // in UTF-8 byte order every match is ≥ prefix and its first
        // prefix-BYTE-length bytes equal the prefix's — skip when max <
        // prefix or min's byte-truncated head already exceeds it (byte
        // truncation is monotone under byte-lexicographic order, so
        // mnHead bounds every value's head from below; char-level
        // take() would split surrogate pairs and break that)
        range(a) {
          case (mn: String, mx: String) =>
            val p = prefix.getBytes(StandardCharsets.UTF_8)
            val mnB = mn.getBytes(StandardCharsets.UTF_8)
            val mnHead = java.util.Arrays.copyOf(mnB, math.min(p.length, mnB.length))
            Some(utf8Cmp(mx, prefix) >= 0 &&
              java.util.Arrays.compareUnsigned(mnHead, p) <= 0)
          case _ => None
        }
      case sources.And(l, r) =>
        (canMatch(l, fsr), canMatch(r, fsr)) match {
          case (Some(false), _) | (_, Some(false)) => Some(false)
          case (Some(true), Some(true)) => Some(true)
          case _ => None
        }
      case sources.Or(l, r) =>
        (canMatch(l, fsr), canMatch(r, fsr)) match {
          case (Some(true), _) | (_, Some(true)) => Some(true)
          case (Some(false), Some(false)) => Some(false)
          case _ => None
        }
      case _ => None
    }
  }
}

/** Per-file NDV re-derivation for rewrites and compaction folds
  * ([[graft.sources.EpochStore.rederiveStats]]): the SAME xxHash64 hash
  * and 512-register shape [[EpochStoreStats.Ndv]] accumulates on the
  * write path, as a catalyst typed aggregate — a rewritten entry's
  * sidecar sketches stay mergeable with original-write sketches. */
private[sources] case class NdvRegistersAgg(
    child: org.apache.spark.sql.catalyst.expressions.Expression,
    kind: Char,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends org.apache.spark.sql.catalyst.expressions.aggregate
    .TypedImperativeAggregate[Array[Byte]] {

  override def children
      : Seq[org.apache.spark.sql.catalyst.expressions.Expression] =
    Seq(child)
  override def nullable: Boolean = false
  override def dataType: org.apache.spark.sql.types.DataType =
    org.apache.spark.sql.types.BinaryType
  override def prettyName: String = "ndv_registers"

  override def createAggregationBuffer(): Array[Byte] =
    new Array[Byte](EpochStoreStats.Ndv.M)

  override def update(buf: Array[Byte],
                      input: org.apache.spark.sql.catalyst.InternalRow)
      : Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val acc: Any = kind match {
        case 'S' => v // UTF8String
        case 'd' => java.lang.Double.valueOf(
          v.asInstanceOf[Number].doubleValue())
        case _ => java.lang.Long.valueOf(
          v.asInstanceOf[Number].longValue())
      }
      EpochStoreStats.Ndv.add(buf, EpochStoreStats.Ndv.hashOf(acc))
    }
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    EpochStoreStats.Ndv.mergeInto(a, b); a
  }

  override def eval(buf: Array[Byte]): Any = buf

  override def serialize(buf: Array[Byte]): Array[Byte] = buf.clone()
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes.clone()

  override def withNewMutableAggBufferOffset(o: Int): NdvRegistersAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): NdvRegistersAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[org.apache.spark.sql.catalyst.expressions.Expression])
      : org.apache.spark.sql.catalyst.expressions.Expression =
    copy(child = c(0))
}
