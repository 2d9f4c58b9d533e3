package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression: random-hyperplane LSH bucket id of an
  * `array<float>` vector — all `nPlanes` dot products in one codegen loop.
  *
  * The plane matrix is baked into the expression at plan time (a plan-time
  * constant shipped with the serialized plan — zero per-row coefficient
  * work, zero driver state to broadcast, identical on every executor). The
  * interpreted predecessor built each projection as an
  * `aggregate(zip_with(vec, literal_array, ...))` fold — per-element lambda
  * interpretation × nPlanes × (corpus + probes); see
  * [[graft.ext.Similarity.lshBucketHof]], kept as the parity reference.
  *
  * Bit p of the bucket is `sign(v · plane_p)` (strictly-positive ⇒ 1), bits
  * fold MSB-first — identical to the HOF form, so bucket ids are stable
  * across the migration. Summation order within a projection is
  * left-to-right, matching the `aggregate` fold.
  */
case class LshBucket(child: Expression, planes: Seq[Seq[Double]])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"lsh_bucket expects array<float>, got ${other.simpleString}")
  }

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "lsh_bucket"

  @transient private lazy val matrix: Array[Array[Double]] =
    planes.map(_.toArray).toArray

  private def dims: Int = planes.head.length

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    require(n == dims, s"lsh_bucket: vector length $n != plane dims $dims")
    var bucket = 0
    var p = 0
    while (p < matrix.length) {
      val plane = matrix(p)
      var proj = 0.0
      var i = 0
      while (i < n) {
        proj += arr.getFloat(i).toDouble * plane(i)
        i += 1
      }
      bucket = bucket * 2 + (if (proj > 0) 1 else 0)
      p += 1
    }
    bucket
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val planesRef = ctx.addReferenceObj("lshPlanes", matrix, "double[][]")
      val n = ctx.freshName("n")
      val p = ctx.freshName("p")
      val i = ctx.freshName("i")
      val bucket = ctx.freshName("bucket")
      val proj = ctx.freshName("proj")
      val plane = ctx.freshName("plane")
      s"""
         |final int $n = $arr.numElements();
         |if ($n != $planesRef[0].length) {
         |  throw new IllegalArgumentException(
         |    "lsh_bucket: vector length " + $n + " != plane dims " + $planesRef[0].length);
         |}
         |int $bucket = 0;
         |for (int $p = 0; $p < $planesRef.length; $p++) {
         |  final double[] $plane = $planesRef[$p];
         |  double $proj = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $proj += ((double) $arr.getFloat($i)) * $plane[$i];
         |  }
         |  $bucket = $bucket * 2 + ($proj > 0 ? 1 : 0);
         |}
         |${ev.value} = $bucket;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): LshBucket =
    copy(child = newChild)
}

object LshBucket {
  /** The fixed-seed plane matrix shared by the native expression and the HOF
    * reference form — `plane(p)(i) = Random(0x5EED0000 + p).nextDouble*2-1`,
    * the exact coefficients round 1 shipped. */
  def planeMatrix(nPlanes: Int, dims: Int): Seq[Seq[Double]] =
    (0 until nPlanes).map { p =>
      val rng = new scala.util.Random(0x5EED0000L + p)
      Seq.fill(dims)(rng.nextDouble() * 2 - 1)
    }
}
