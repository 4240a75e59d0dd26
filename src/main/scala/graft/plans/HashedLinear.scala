package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, ExpectsInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.sql.{Column, GraftBridge}

/** Fused hashed-linear scorer — the hot loop of the fastText/CCNet-style
  * model-based quality filter (`q_doc_ml_quality`,
  * [[graft.queries.TextCatalog.mlQuality]]).
  *
  * Input is the tokenized document (`array<string>`); the expression
  * walks unigrams and word bigrams in ONE pass, hashes each gram with
  * the engine's cross-engine bucket contract
  * (md5-u64(gram ++ salt) mod D — the same little-endian-u64 spelling
  * as [[graft.functions.TextOps.md5ModCol]] / DuckDB
  * `md5_number_upper(gram || salt) % D`), looks the bucket up in the
  * plan-shipped integer weight vector, and returns the integer
  * centi-logit sum. Bit-exact by construction: the hash is the shared
  * md5-u64 contract and the accumulator is a long — no float ever
  * enters, so the DuckDB oracle replays it verbatim.
  *
  * Why a custom Expression (SURVEY.md §7.2 preference order): the
  * declarative form — `aggregate(transform(grams, g -> element_at(wt,
  * md5ModCol(g))))` over a `concat(ws, transform(sequence(...)))` gram
  * array — materializes the gram array per row, walks it through
  * interpreted higher-order lambdas, and pays md5ModCol's hex-string →
  * 8×substring → conv(16,10) → Decimal-mod chain PER GRAM (r11 micro:
  * 6.3 s at sf0.1, the catalog's slowest query by 3×). This expression
  * is one primitive loop per row — digest bytes straight to u64, no hex
  * round-trip, no Decimal, no intermediate arrays — and whole-stage
  * codegen inlines it into the scan stage. Same number, ~10× less CPU;
  * TextSpec pins equality against the declarative derivation.
  *
  * Scale shape is unchanged: a narrow map, zero shuffle, model = D×4
  * bytes in the plan (broadcast with the task binary — the standard
  * shipped-model deployment; swap [[graft.queries.TextCatalog.mlQuality]]'s
  * derived weights for trained ones and nothing else changes).
  */
case class HashedLinearLogit(child: Expression, salt: String, weights: Seq[Int])
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def prettyName: String = "hashed_linear_logit"
  // a null TOKEN nulls the whole score (the declarative twin's
  // null-propagation: one null gram nulled its aggregate fold), so the
  // result is nullable even over a non-null array column
  override def nullable: Boolean = true

  @transient private lazy val w: Array[Int] = weights.toArray
  @transient private lazy val saltBytes =
    salt.getBytes(java.nio.charset.StandardCharsets.UTF_8)
  @transient private lazy val md5Local =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

  /** md5-u64(gram ++ salt) mod D → weight; gram given as raw UTF-8. */
  private def contrib(d: java.security.MessageDigest, gram: Array[Byte]): Long = {
    d.reset()
    d.update(gram)
    d.update(saltBytes)
    val b = d.digest()
    var u = 0L
    var i = 7
    while (i >= 0) { u = (u << 8) | (b(i) & 0xffL); i -= 1 }
    w(java.lang.Long.remainderUnsigned(u, w.length.toLong).toInt).toLong
  }

  /** One pass over the token array: unigrams, then each adjacent bigram
    * as `ws[i-1] ++ " " ++ ws[i]` (byte-concat — UTF-8 concat of the
    * parts IS the UTF-8 of the joined string, so no String round-trip).
    * Returns null (boxed) when any token is null — matching the
    * declarative twin's null propagation instead of crashing. Public
    * for the generated code's reference-object call. */
  def score(a: ArrayData): java.lang.Long = {
    val d = md5Local.get()
    val n = a.numElements()
    var lm = 0L
    var prev: Array[Byte] = null
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      val cur = a.getUTF8String(i).getBytes
      lm += contrib(d, cur)
      if (prev != null) {
        val bg = new Array[Byte](prev.length + 1 + cur.length)
        System.arraycopy(prev, 0, bg, 0, prev.length)
        bg(prev.length) = ' '
        System.arraycopy(cur, 0, bg, prev.length + 1, cur.length)
        lm += contrib(d, bg)
      }
      prev = cur
      i += 1
    }
    lm
  }

  override def nullSafeEval(input: Any): Any = score(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("hashedLinear", this, classOf[HashedLinearLogit].getName)
    nullSafeCodeGen(ctx, ev, a => {
      val r = ctx.freshName("hll")
      s"""
         |java.lang.Long $r = $ref.score($a);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r.longValue(); }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object HashedLinearLogit {
  /** Column-API handle: integer centi-logit of the hashed-linear model
    * over a tokenized document. */
  def hashedLinearLogit(ws: Column, salt: String, weights: Array[Int]): Column =
    GraftBridge.column(HashedLinearLogit(
      GraftBridge.expression(ws), salt, weights.toSeq))
}
