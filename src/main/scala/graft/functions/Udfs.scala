package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import java.math.RoundingMode

/** The reference declares a "UDFs" stage (`/root/reference/README.md:22`)
  * without implementing any. This module provides the engine's UDF surface
  * (F8) and a custom UDAF (A6) — plus, per the functions-over-UDFs rule, a
  * pure-Catalyst twin of the UDF so the hot path can stay inside
  * whole-stage codegen.
  */
object Udfs {

  // ------------------------------------------------- Vietnamese price parse

  /** First `<number> tỷ|triệu` occurrence in a listing title, e.g.
    * "Bán căn ... chỉ 3.65 tỷ VHOCP" → 3 650 000 000 VND. Decimal comma
    * accepted ("3,65 tỷ"). The shape mirrors what the reference's own
    * crawled titles carry (e.g. house_106702460_*.json). */
  private val PricePattern = """([0-9]+(?:[.,][0-9]+)?)\s*(tỷ|triệu)""".r

  /** Scala implementation — unit-testable without Spark. */
  def parsePriceVnd(s: String): java.lang.Long =
    if (s == null) null
    else PricePattern.findFirstMatchIn(s.toLowerCase) match {
      case Some(m) =>
        val num = m.group(1).replace(',', '.').toDouble
        val mult = if (m.group(2) == "tỷ") 1e9 else 1e6
        java.lang.Long.valueOf(math.round(num * mult))
      case None => null
    }

  /** F8: the UDF form (black box to Catalyst — breaks codegen, kept as the
    * API-surface demonstration). */
  val priceVndUdf = udf(parsePriceVnd _)

  /** The Catalyst-native twin: same semantics via built-in regexp_extract /
    * lower / when — fully codegen'd, pushdown-friendly. Preferred in
    * engine paths; the UDF exists to prove the extension surface. */
  def priceVndNative(title: Column): Column = {
    val lt = lower(title)
    val num = regexp_extract(lt, PricePattern.regex, 1)
    val unit = regexp_extract(lt, PricePattern.regex, 2)
    when(num =!= "",
      round(translate(num, ",", ".").cast("double") *
        when(unit === "tỷ", lit(1e9)).otherwise(lit(1e6))).cast("long"))
      .otherwise(lit(null).cast("long"))
  }

  // ------------------------------------------------------ weighted-mean UDAF

  /** A6: custom typed UDAF via `Aggregator` — exact weighted mean. Sums run
    * in BigDecimal (scale-4 per input, mirroring Parity's decimal casts) so
    * the result is partition-order-independent and matches the oracle's
    * CAST(SUM(CAST(x AS DECIMAL(18,4)) * CAST(w AS DECIMAL(18,4))) AS
    * DOUBLE) / CAST(SUM(CAST(w AS DECIMAL(18,4))) AS DOUBLE) bit-for-bit.
    *
    * Spark merges partial buffers in arbitrary order at the exchange —
    * decimal addition is associative+commutative, so that's safe; the
    * single final toDouble conversion is deterministic.
    */
  object WeightedMean
      extends Aggregator[(Double, Double), (java.math.BigDecimal, java.math.BigDecimal), Double] {
    private type B = (java.math.BigDecimal, java.math.BigDecimal)
    // Mirrors Spark's double→decimal cast (BigDecimal.valueOf = shortest
    // decimal repr, then HALF_UP to scale 4).
    private def dec4(d: Double): java.math.BigDecimal =
      java.math.BigDecimal.valueOf(d).setScale(4, RoundingMode.HALF_UP)

    def zero: B = (java.math.BigDecimal.ZERO, java.math.BigDecimal.ZERO)
    def reduce(b: B, in: (Double, Double)): B =
      (b._1.add(dec4(in._1).multiply(dec4(in._2))), b._2.add(dec4(in._2)))
    def merge(a: B, b: B): B = (a._1.add(b._1), a._2.add(b._2))
    def finish(b: B): Double =
      if (b._2.signum == 0) Double.NaN else b._1.doubleValue / b._2.doubleValue
    def bufferEncoder: Encoder[B] = Encoders.tuple(Encoders.DECIMAL, Encoders.DECIMAL)
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Column-API handle: `weightedMean(col("x"), col("w"))`. */
  val weightedMean = udaf(WeightedMean, Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble))
}
