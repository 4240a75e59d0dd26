package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.{col, lit, shiftleft, shiftright}

/** Multi-dimensional data layout: Z-order (Morton) clustering so that
  * range predicates on EITHER of two columns prune files/row-groups —
  * the storage-side scale lever a single-column sort can't give.
  *
  * Why this matters at 100 TB: parquet skips a row group when the
  * predicate falls outside the group's column min/max. A table sorted by
  * one key has tight stats on that key only — a filter on any other
  * column reads everything. Interleaving the bits of two keys
  * (x₀y₀x₁y₁…) makes file order follow a space-filling curve, so each
  * file covers a small RECTANGLE of (x, y) space and a 2-D (or either
  * 1-D) range predicate touches only the files whose rectangle
  * intersects it. Same mechanism as Delta/Iceberg `OPTIMIZE ZORDER BY`;
  * here it is a pure-column expression (codegen'd shifts and ORs — no
  * UDF) plus a range-repartitioned sorted write, so it composes with
  * every engine source/sink. LayoutSpec MEASURES the claim: the same
  * box predicate reads strictly fewer rows (`Metrics.scanRows`) from
  * the z-ordered copy than from a linearly-sorted one.
  *
  * The curve quality depends on the two columns sharing a comparable
  * bit range; callers should pre-scale values into [0, 2^bits). With
  * `bits` ≤ 31 the interleave stays within a positive long (2·bits ≤ 62
  * bits), so ordering semantics are plain BIGINT ascending on both
  * engines.
  */
object Layout {

  /** Morton z-value of the low `bits` bits of `x` and `y` — bit i of x
    * lands at 2i, bit i of y at 2i+1. Pure column arithmetic: the whole
    * interleave is one codegen'd expression tree. */
  def zvalue(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    val xl = x.cast("long")
    val yl = y.cast("long")
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(xl, i).bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(shiftleft(shiftright(yl, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
  }

  /** Exact inverse of [[zvalue]] (JVM-side; for debugging a curve
    * position back into its (x, y) cell — e.g. reading a file's min/max
    * z-stats as the rectangle it covers). LayoutSpec round-trips random
    * points through interleave→deinterleave. */
  def deinterleave(z: Long, bits: Int = 16): (Long, Long) = {
    var x = 0L; var y = 0L; var i = 0
    while (i < bits) {
      x |= ((z >>> (2 * i)) & 1L) << i
      y |= ((z >>> (2 * i + 1)) & 1L) << i
      i += 1
    }
    (x, y)
  }

  /** The DuckDB spelling of [[zvalue]] over column expressions `x` and
    * `y` — the identical 2·bits-term OR of masked shifts, so oracle SQL
    * replays the curve bit-exactly. */
  def zvalueSql(x: String, y: String, bits: Int = 16): String =
    (0 until bits).flatMap { i =>
      Seq(s"(((CAST($x AS BIGINT) >> $i) & 1) << ${2 * i})",
          s"(((CAST($y AS BIGINT) >> $i) & 1) << ${2 * i + 1})")
    }.mkString(" | ")

  /** Write `df` z-ordered by (`x`, `y`): range-repartition on the
    * z-value (each output task owns a contiguous curve segment — at
    * cluster scale `parts` spreads the sort across executors), sort
    * within partitions, and bound rows per file so parquet stats stay
    * tight per file. The helper column is dropped before the write;
    * the CLUSTERING survives as physical row order + per-file min/max
    * stats, which is all pruning needs. */
  def writeZOrdered(df: DataFrame, out: String, x: Column, y: Column,
                    bits: Int = 16, parts: Int = 8,
                    maxRecordsPerFile: Long = 0L): Unit = {
    // fail fast rather than silently overwrite-and-drop a caller column
    require(!df.columns.contains("__z"),
      "writeZOrdered: input already has a '__z' column — rename it first")
    df.withColumn("__z", zvalue(x, y, bits))
      .repartitionByRange(parts, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .parquet(out)
  }
}
