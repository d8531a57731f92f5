package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Bit test over a variable-width BINARY update mask — the scale companion
  * of the LongType fast path in [[graft.cdc.ChangelogBuilder.maskBitSet]].
  *
  * ≙ `fn_cdc_is_bit_set(ordinal, __$update_mask)` over the reference's
  * `VARBINARY` mask (usp_cdc_populate_changelog.sql:305), which has NO
  * width limit — a table with more than 64 payload columns cannot encode
  * its mask in a long. The byte array is interpreted as a BIG-ENDIAN
  * unsigned integer (byte 0 is the most significant), so an 8-byte mask
  * holding the same value as a long agrees with the long path bit-for-bit
  * on every ordinal 0..63 — BinaryMaskSpec pins that property. Bit
  * `ordinal` lives in byte `length-1 - ordinal/8` at in-byte position
  * `ordinal % 8`; an ordinal beyond the mask's width reads as unset
  * (matching a long mask's implicit zero-extension).
  *
  * Plain primitive byte/shift work with a `doGenCode` — stays inside
  * whole-stage codegen in the mask-gate projection's hot path.
  */
case class BinaryMaskBit(child: Expression, ordinal: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType if ordinal >= 0 => TypeCheckResult.TypeCheckSuccess
    case BinaryType => TypeCheckResult.TypeCheckFailure(s"negative mask ordinal $ordinal")
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a binary mask input, got ${t.simpleString}")
  }
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(mask: Any): Any = {
    val bytes = mask.asInstanceOf[Array[Byte]]
    val idx = bytes.length - 1 - (ordinal >> 3)
    idx >= 0 && ((bytes(idx) >> (ordinal & 7)) & 1) == 1
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, m => {
      val idx = ctx.freshName("idx")
      s"""
         |final int $idx = $m.length - 1 - ${ordinal >> 3};
         |${ev.value} = $idx >= 0 && (($m[$idx] >> ${ordinal & 7}) & 1) == 1;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): BinaryMaskBit =
    copy(child = newChild)

  override def prettyName: String = "binary_mask_bit"
}

object BinaryMaskBit {
  /** Column-API entry point: true iff bit `ordinal` of the big-endian
    * binary `mask` is set. */
  def binaryMaskBit(mask: Column, ordinal: Int): Column =
    ColumnBridge.column(BinaryMaskBit(ColumnBridge.expression(mask), ordinal))
}
