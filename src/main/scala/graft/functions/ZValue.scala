package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Morton (Z-order) interleave of two non-negative dimension values — the
  * clustering key behind multi-dimensional file skipping: range-partition +
  * sort on z and every output file covers a LOCALIZED rectangle in
  * (a, b) space, so parquet min/max stats prune point/range predicates on
  * EITHER dimension to few files (a single-column sort localizes only its
  * own dimension). The standard lakehouse layout trick (Delta/Iceberg
  * `OPTIMIZE ZORDER BY`), here as a plain codegen'd expression usable with
  * `repartitionByRange`.
  *
  * Interleaves the low 31 bits of each input (callers rank/bucket wider
  * domains first): bit i of `a` lands at z-bit 2i, bit i of `b` at 2i+1.
  * 31 bits per dimension keeps the 62-bit result clear of the long's sign
  * bit, so signed ordering of z IS Morton ordering — a 32-bit interleave
  * would flip the sort for points in the upper half of either domain.
  */
case class ZValue(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (bigint, bigint), got (${l.simpleString}, ${r.simpleString})")
  }
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any =
    ZValue.interleave(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.ZValue.interleave($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): ZValue =
    copy(left = l, right = r)

  override def prettyName: String = "z_value"
}

object ZValue {

  /** Spread the low 31 bits of x to the even bit positions (the classic
    * magic-mask Morton spread). */
  def spread(x0: Long): Long = {
    var x = x0 & 0x7fffffffL
    x = (x | (x << 16)) & 0x0000ffff0000ffffL
    x = (x | (x << 8)) & 0x00ff00ff00ff00ffL
    x = (x | (x << 4)) & 0x0f0f0f0f0f0f0f0fL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  /** z = a's bits at even positions, b's at odd. Called from generated
    * code — keep the signature stable. */
  def interleave(a: Long, b: Long): Long = spread(a) | (spread(b) << 1)

  def zValue(a: Column, b: Column): Column =
    ColumnBridge.column(ZValue(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
