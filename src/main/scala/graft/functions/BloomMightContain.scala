package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Native Catalyst expression: membership probe of a plan-time-constant
  * bloom filter — the row-level pre-filter of [[graft.ops.BloomJoin]].
  *
  * The filter is baked into the expression (shipped with the serialized
  * plan, identical on every executor, no broadcast round-trip), and the
  * probe compiles to one virtual call inside whole-stage codegen. May
  * return false-positive `true` (never false-negative), so callers must
  * follow with an exact join; see BloomJoin for why that still wins at
  * scale. Long keys probe the filter's long hashing; strings probe the
  * UTF-8 bytes — both match what `DataFrameStatFunctions.bloomFilter`
  * inserted on the build side.
  */
case class BloomMightContain(child: Expression, filter: BloomFilter)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType | ShortType | ByteType | StringType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain expects an integral or string key, got ${other.simpleString}")
  }

  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bloom_might_contain"

  private def isString: Boolean = child.dataType == StringType

  override def nullSafeEval(input: Any): Any =
    if (isString) filter.mightContainBinary(input.asInstanceOf[UTF8String].getBytes)
    else filter.mightContainLong(input.asInstanceOf[Number].longValue())

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, key => {
      val ref = ctx.addReferenceObj("bloomFilter", filter,
        classOf[BloomFilter].getName)
      if (isString) s"${ev.value} = $ref.mightContainBinary($key.getBytes());"
      else s"${ev.value} = $ref.mightContainLong((long) $key);"
    })

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}
