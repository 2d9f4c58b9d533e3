package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression: cosine similarity of two `array<float>`
  * embedding columns, in double precision, in ONE pass (dot product and both
  * norms in the same loop).
  *
  * Why a custom expression instead of `zip_with` + `aggregate`: Spark's
  * higher-order array functions evaluate their lambda interpreted, per
  * element, per row; this expression participates in whole-stage codegen
  * (`doGenCode` emits a tight primitive loop over the two `ArrayData`),
  * which is the preferred extension order for hot scalar math
  * (builtin > native Expression > UDF). Summation is sequential
  * left-to-right — identical order to the `aggregate`-fold form, so results
  * are bit-for-bit the same.
  *
  * Null semantics: null if either array is null (`nullIntolerant`); arrays of
  * different lengths raise, matching `zip_with`'s strictness on shape bugs.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_sim expects (array<float>, array<float>), " +
        s"got (${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    require(y.numElements() == n,
      s"cosine_sim: array length mismatch ($n vs ${y.numElements()})")
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      val xv = x.getFloat(i).toDouble
      val yv = y.getFloat(i).toDouble
      dot += xv * yv; nx += xv * xv; ny += yv * yv
      i += 1
    }
    dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |final int $n = $x.numElements();
         |if ($y.numElements() != $n) {
         |  throw new IllegalArgumentException(
         |    "cosine_sim: array length mismatch (" + $n + " vs " + $y.numElements() + ")");
         |}
         |double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  final double $xv = (double) $x.getFloat($i);
         |  final double $yv = (double) $y.getFloat($i);
         |  $dot += $xv * $yv; $nx += $xv * $xv; $ny += $yv * $yv;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

/** Registration + Column-API access for graft's native expressions. */
object GraftFunctions {

  /** Column-API form: `cosineSim(col("a"), col("b"))`. */
  def cosineSim(a: Column, b: Column): Column =
    GraftSqlBridge.column(
      CosineSimilarity(GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  /** `struct(maxabs, qmin, qmax, rmse)` int8-quantization stats of an
    * `array<float>` column, one fused codegen loop (see [[QuantizeStats]]). */
  def quantizeStats(vec: Column): Column =
    GraftSqlBridge.column(QuantizeStats(GraftSqlBridge.expression(vec)))

  /** Random-hyperplane LSH bucket id with the fixed-seed plane family
    * (see [[LshBucket]]); bucket ∈ [0, 2^nPlanes). */
  def lshBucket(vec: Column, nPlanes: Int, dims: Int = 64): Column =
    GraftSqlBridge.column(
      LshBucket(GraftSqlBridge.expression(vec), LshBucket.planeMatrix(nPlanes, dims)))

  /** [[lshBucket]] with an explicit plane matrix — for banded schemes that
    * slice one shared plane family into independent bands. */
  def lshBucketWithPlanes(vec: Column, planes: Seq[Seq[Double]]): Column =
    GraftSqlBridge.column(LshBucket(GraftSqlBridge.expression(vec), planes))

  private val registry: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (children: Seq[Expression]) => CosineSimilarity(children(0), children(1))),
    (new FunctionIdentifier("quantize_stats"),
      new ExpressionInfo(classOf[QuantizeStats].getName, "quantize_stats"),
      (children: Seq[Expression]) => QuantizeStats(children(0))))

  /** Register SQL names on an existing session (idempotent) so
    * `spark.sql("SELECT cosine_sim(a, b) ...")` works. */
  def registerAll(spark: SparkSession): Unit =
    registry.foreach { case (ident, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(ident.funcName, builder, "built-in")
    }
}

/** `SparkSessionExtensions` hook: add to
  * `spark.sql.extensions=graft.functions.GraftExtensions` so every session —
  * including executors' SQL contexts on a real cluster — gets graft's native
  * functions without code changes. */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    ext.injectFunction(
      (new FunctionIdentifier("cosine_sim"),
        new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
        (children: Seq[Expression]) => CosineSimilarity(children(0), children(1))))
    ext.injectFunction(
      (new FunctionIdentifier("quantize_stats"),
        new ExpressionInfo(classOf[QuantizeStats].getName, "quantize_stats"),
        (children: Seq[Expression]) => QuantizeStats(children(0))))
  }
}
