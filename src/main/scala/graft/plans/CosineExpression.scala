package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}
import org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes
import org.apache.spark.sql.{Column, GraftBridge, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier

/** Codegen'd fused cosine similarity over two `array<float>` columns.
  *
  * Why a custom Expression (SURVEY.md §7.2 preference order): the
  * higher-order-function form ([[graft.functions.VectorOps.cosine]]) walks
  * each array three times through interpreted lambdas with boxed
  * elements; this expression is ONE primitive float loop that whole-stage
  * codegen inlines into the surrounding stage. The HOF form stays the
  * default for oracle-checked queries (its decimal chain is
  * cross-engine-exact); this one is for similarity-search hot paths where
  * throughput matters and last-ulp parity doesn't (ANN candidate
  * verification, index builds).
  *
  * Float products are exact in double; the sequential double sum is the
  * standard numeric contract for dot products.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  // inferred Seq[ArrayType] — AbstractDataType itself is private[sql]
  override def inputTypes = Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"
  // mismatched dimensions yield NULL even for non-null inputs
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    // fail loudly (null, not a prefix similarity): truncating to the common
    // prefix would mask an upstream dimension bug with a plausible score
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi; nx += xi * xi; ny += yi * yi
      i += 1
    }
    if (nx == 0.0 || ny == 0.0) 0.0 else dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $xi = (double) $a.getFloat($i);
         |    double $yi = (double) $b.getFloat($i);
         |    $dot += $xi * $yi; $nx += $xi * $xi; $ny += $yi * $yi;
         |  }
         |  ${ev.value} = ($nx == 0.0 || $ny == 0.0) ? 0.0
         |    : $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object CosineSimilarity {
  /** Column-API handle. */
  def cosineSim(a: Column, b: Column): Column =
    GraftBridge.column(CosineSimilarity(
      GraftBridge.expression(a), GraftBridge.expression(b)))

  /** SQL registration: `SELECT cosine_sim(a, b)`. Call per-session or via
    * [[GraftExtensions]] in `spark.sql.extensions`. */
  def register(spark: SparkSession): Unit =
    GraftBridge.registerFunction(spark, "cosine_sim",
      children => CosineSimilarity(children(0), children(1)))
}

/** `--conf spark.sql.extensions=graft.plans.GraftExtensions` injects the
  * engine's custom expressions into every session of a deployment:
  * `cosine_sim(a, b)` (codegen'd fused cosine), `top_k(ord, id, k)`
  * (bounded-heap grouped top-k aggregate),
  * `reservoir_sample(x, k[, seed])` (bounded uniform group sample),
  * `heavy_hitters(item, m)` (SpaceSaving frequent items),
  * `count_min(item, depth, width)` (Count-Min frequency sketch),
  * `hll_registers(item, p)` (HyperLogLog, oracle-checkable registers),
  * and `kmv_sketch(item, k)` (KMV k-minimum set-operation sketch);
  * plus the plan-level operator stack: [[AsOfJoinStrategy]] (native
  * sort-merge as-of join) and [[PushLeftFiltersThroughAsOfJoin]]
  * (operator-batch predicate pushdown through the custom node, composing
  * with Catalyst's own rules down to the source scan). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectPlannerStrategy(_ => AsOfJoinStrategy)
    ext.injectOptimizerRule(_ => PushLeftFiltersThroughAsOfJoin)
    ext.injectOptimizerRule(_ => PruneAsOfJoinColumns)
    // no-ops until a view / join profile is registered (registries start
    // empty)
    ext.injectOptimizerRule(_ => MaterializedAgg.RewriteToMaterializedAgg)
    ext.injectOptimizerRule(_ => graft.core.JoinAdvisor.AdvisedJoinRewrite)
    ext.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (children: Seq[Expression]) => CosineSimilarity(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("top_k"),
      new ExpressionInfo(classOf[TopKAgg].getName, "top_k"),
      (children: Seq[Expression]) => TopKAgg.fromSql(children)))
    ext.injectFunction((
      FunctionIdentifier("reservoir_sample"),
      new ExpressionInfo(classOf[ReservoirSampleAgg].getName, "reservoir_sample"),
      (children: Seq[Expression]) => ReservoirSampleAgg.fromSql(children)))
    ext.injectFunction((
      FunctionIdentifier("heavy_hitters"),
      new ExpressionInfo(classOf[HeavyHittersAgg].getName, "heavy_hitters"),
      (children: Seq[Expression]) => HeavyHittersAgg.fromSql(children)))
    ext.injectFunction((
      FunctionIdentifier("count_min"),
      new ExpressionInfo(classOf[CountMinAgg].getName, "count_min"),
      (children: Seq[Expression]) => CountMinAgg.fromSql(children)))
    ext.injectFunction((
      FunctionIdentifier("hll_registers"),
      new ExpressionInfo(classOf[HllRegistersAgg].getName, "hll_registers"),
      (children: Seq[Expression]) => HllRegistersAgg.fromSql(children)))
    ext.injectFunction((
      FunctionIdentifier("kmv_sketch"),
      new ExpressionInfo(classOf[KmvSketchAgg].getName, "kmv_sketch"),
      (children: Seq[Expression]) => KmvSketchAgg.fromSql(children)))
  }
}
