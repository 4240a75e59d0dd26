package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Helpers that make floating-point aggregates hash-identical between Spark
  * and the DuckDB oracle.
  *
  * Problem: `SUM(double)` is order-dependent (both engines may add partitions
  * in different orders), so the last ULPs — and therefore the driver's value
  * hash — can differ. Fix: cast each element to a fixed-scale DECIMAL first.
  * Decimal addition is exact and associative, so any summation order yields
  * the same result; casting the final exact decimal back to DOUBLE is a
  * single deterministic conversion both engines perform identically.
  *
  * Oracle-side mirror of `dsum(x)`:
  *   CAST(SUM(CAST(x AS DECIMAL(18,4))) AS DOUBLE)
  * and of `davg(x)`:
  *   CAST(SUM(CAST(x AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*)
  */
object Parity {
  val Dec: DecimalType = DecimalType(18, 4)

  /** Order-independent sum of a double column, emitted as double. */
  def dsum(c: Column): Column = sum(c.cast(Dec)).cast(DoubleType)

  /** Order-independent mean of a double column, emitted as double. */
  def davg(c: Column): Column = sum(c.cast(Dec)).cast(DoubleType) / count(lit(1))

  /** Factor type for [[dsumProd]]: small multipliers like (1 - discount). */
  val Fac: DecimalType = DecimalType(8, 4)

  /** Order-independent sum of a product of double factors. Each factor is
    * cast to decimal BEFORE multiplying: a double product rounded to decimal
    * can land on a rounding tie that Spark (HALF_UP) and DuckDB resolve
    * differently, while per-factor casts of the raw stored values are
    * tie-free and the decimal multiply itself is exact in both engines
    * (18+8(+8) digits stays under precision 38, no loss).
    */
  def dsumProd(first: Column, rest: Column*): Column =
    sum(rest.foldLeft(first.cast(Dec))((acc, c) => acc * c.cast(Fac)))
      // squeeze the exact scale-8/12 sum back to scale 4 BEFORE the double
      // conversion: above ~15 significant digits DuckDB's decimal→double
      // isn't correctly rounded, so the last ulp can differ. Rounding the
      // single final value is tie-safe in practice (unlike per-row casts).
      .cast(DecimalType(38, 4))
      .cast(DoubleType)

  /** Oracle SQL fragment mirroring [[dsumProd]]. */
  def sqlSumProd(first: String, rest: String*): String = {
    val factors = s"CAST($first AS DECIMAL(18,4))" +: rest.map(r => s"CAST($r AS DECIMAL(8,4))")
    // ROUND, not CAST-to-decimal(38,4): DuckDB's decimal downscale cast
    // truncates, while ROUND is half-away — matching Spark's HALF_UP cast
    s"CAST(ROUND(SUM(${factors.mkString(" * ")}), 4) AS DOUBLE)"
  }

  /** Oracle SQL fragment mirroring [[dsum]]. */
  def sqlSum(expr: String): String =
    s"CAST(SUM(CAST($expr AS DECIMAL(18,4))) AS DOUBLE)"

  /** Oracle SQL fragment mirroring [[davg]]. */
  def sqlAvg(expr: String): String =
    s"CAST(SUM(CAST($expr AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*)"
}
