package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression: per-vector max-abs int8 quantization stats of
  * an `array<float>` embedding column — `struct(maxabs, qmin, qmax, rmse)` in
  * ONE fused loop per row (two passes over the array: max-abs, then
  * quantize + error accumulation).
  *
  * Why: the higher-order-function formulation
  * (`transform`/`zip_with`/`aggregate`, see [[graft.ext.Similarity.quantizeInt8]])
  * evaluates its lambdas interpreted per array element, and the four output
  * columns each re-derived the scale and re-quantized the vector — measured
  * at 13.1 s for 500k×64 floats at sf0.1 (22% of the whole bench) for a
  * linear operation. This expression participates in whole-stage codegen and
  * computes all four stats in one evaluation; Spark's subexpression
  * elimination shares that one evaluation across the four `GetStructField`
  * projections.
  *
  * Numeric parity (required — the DuckDB oracle hashes exact values):
  *  - quantized value = `round(v * scale)` with Spark `round` semantics,
  *    i.e. `java.math.BigDecimal.valueOf(x).setScale(0, HALF_UP)` — NOT
  *    `Math.round`, which differs on negative ties and on doubles like
  *    0.49999999999999994;
  *  - reconstruction divides by `scale = 127.0 / maxabs` (not multiply by
  *    the reciprocal — last-ulp difference);
  *  - sums fold left-to-right in element order, matching the HOF
  *    `aggregate` fold and the oracle's `list_sum`.
  *
  * All-zero vectors (maxabs = 0): scale would be +Inf and `0 * Inf = NaN`,
  * which under ANSI mode kills the whole job on one bad row — instead the
  * quantized vector is defined as all zeros: (0.0, 0, 0, 0.0). Mirrored in
  * the HOF form and the DuckDB oracle. Empty arrays yield null.
  */
case class QuantizeStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"quantize_stats expects array<float>, got ${other.simpleString}")
  }

  override def dataType: DataType = QuantizeStats.schema
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "quantize_stats"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    var maxabs = 0.0
    var i = 0
    while (i < n) {
      val a = math.abs(arr.getFloat(i).toDouble)
      if (a > maxabs) maxabs = a
      i += 1
    }
    if (maxabs == 0.0) {
      new GenericInternalRow(Array[Any](0.0, 0, 0, 0.0))
    } else {
      val scale = 127.0 / maxabs
      var qmin = Int.MaxValue
      var qmax = Int.MinValue
      var errSq = 0.0
      i = 0
      while (i < n) {
        val v = arr.getFloat(i).toDouble
        val q = java.math.BigDecimal.valueOf(v * scale)
          .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue().toInt
        if (q < qmin) qmin = q
        if (q > qmax) qmax = q
        val e = v - q / scale
        errSq += e * e
        i += 1
      }
      new GenericInternalRow(Array[Any](maxabs, qmin, qmax, math.sqrt(errSq / n)))
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val maxabs = ctx.freshName("maxabs")
      val a = ctx.freshName("a")
      val scale = ctx.freshName("scale")
      val qmin = ctx.freshName("qmin")
      val qmax = ctx.freshName("qmax")
      val errSq = ctx.freshName("errSq")
      val v = ctx.freshName("v")
      val q = ctx.freshName("q")
      val e = ctx.freshName("e")
      s"""
         |final int $n = $arr.numElements();
         |if ($n == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $maxabs = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    final double $a = java.lang.Math.abs((double) $arr.getFloat($i));
         |    if ($a > $maxabs) $maxabs = $a;
         |  }
         |  if ($maxabs == 0.0) {
         |    ${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |      new Object[]{java.lang.Double.valueOf(0.0), java.lang.Integer.valueOf(0),
         |                   java.lang.Integer.valueOf(0), java.lang.Double.valueOf(0.0)});
         |  } else {
         |    final double $scale = 127.0 / $maxabs;
         |    int $qmin = java.lang.Integer.MAX_VALUE;
         |    int $qmax = java.lang.Integer.MIN_VALUE;
         |    double $errSq = 0.0;
         |    for (int $i = 0; $i < $n; $i++) {
         |      final double $v = (double) $arr.getFloat($i);
         |      final int $q = (int) java.math.BigDecimal.valueOf($v * $scale)
         |        .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue();
         |      if ($q < $qmin) $qmin = $q;
         |      if ($q > $qmax) $qmax = $q;
         |      final double $e = $v - $q / $scale;
         |      $errSq += $e * $e;
         |    }
         |    ${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |      new Object[]{java.lang.Double.valueOf($maxabs), java.lang.Integer.valueOf($qmin),
         |                   java.lang.Integer.valueOf($qmax),
         |                   java.lang.Double.valueOf(java.lang.Math.sqrt($errSq / $n))});
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): QuantizeStats =
    copy(child = newChild)
}

object QuantizeStats {
  val schema: StructType = StructType(Seq(
    StructField("maxabs", DoubleType, nullable = false),
    StructField("qmin", IntegerType, nullable = false),
    StructField("qmax", IntegerType, nullable = false),
    StructField("rmse", DoubleType, nullable = false)))
}
