package graft.functions

import graft.ops.RoaringLookup
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Deletion-vector membership probe (SURVEY §2B B135 read side): true
  * iff `(file key, row position)` is set in the table's deletion
  * vector. This is the JOIN-FREE spelling of vector subtraction the
  * round-10 verdict asked for: instead of expanding bitmaps to
  * `(file, row_index)` rows and anti-joining (which silently degrades
  * to a full sort-merge shuffle of the scan once the expanded vector
  * outgrows `autoBroadcastJoinThreshold`), the whole vector rides the
  * plan as ONE [[RoaringLookup]] reference object — compressed bitmaps,
  * shipped with the stage's task binary (Spark broadcasts that once),
  * parsed lazily per JVM — and each scanned row pays one hash lookup +
  * container probe inside whole-stage codegen. No join, no Exchange,
  * no broadcast threshold to fall off (DvSpec plan-asserts the
  * subtracted read is Exchange-free even with auto-broadcast disabled).
  *
  * Filter as `!DvProbe(key, pos)`; scan-metadata inputs are never null
  * (the null-propagating default is fine).
  */
case class DvProbe(left: Expression, right: Expression, lookup: RoaringLookup)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (string, bigint), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def dataType: DataType = BooleanType
  override def prettyName: String = "dv_probe"

  override def nullSafeEval(k: Any, p: Any): Any =
    lookup.contains(k.asInstanceOf[UTF8String], p.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("dvLookup", lookup, classOf[RoaringLookup].getName)
    nullSafeCodeGen(ctx, ev, (k, p) => s"${ev.value} = $ref.contains($k, $p);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DvProbe =
    copy(left = newLeft, right = newRight)
}
