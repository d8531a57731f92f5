package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The MinHash hash-family evaluated as ONE native pass: lane `h` of the
  * result is the NUMERIC value of
  * `substr(md5(concat(h div 4, ':', s)), (h mod 4) * 8 + 1, 8)` — the
  * composable formulation's hex lane parsed as an unsigned 32-bit int.
  * For fixed-width lowercase hex, lexicographic string order equals
  * numeric order, so `min` over these longs equals the oracle's `min`
  * over hex strings EXACTLY — and long mins run in a HashAggregate
  * (mutable fixed-size buffer) where string mins forced a SortAggregate
  * over the whole shingle multiset. Format back with
  * `format_string("%08x", v)` after aggregating to recover the identical
  * hex representation.
  */
case class Md5Lanes(child: Expression, numLanes: Int)
  extends UnaryExpression {

  require(numLanes >= 1, s"md5_lanes needs a positive lane count, got $numLanes")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(s: Any): Any =
    Md5Lanes.compute(s.asInstanceOf[UTF8String], numLanes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.Md5Lanes$$.MODULE$$.compute($c, $numLanes)")

  override protected def withNewChildInternal(newChild: Expression): Md5Lanes =
    copy(child = newChild)

  override def prettyName: String = "md5_lanes"
}

object Md5Lanes {

  // per-row JCA lookups and prefix re-encoding would sit in the exact hot
  // loop this expression exists to remove
  private val LocalMd = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))
  private val GroupPrefix: Array[Array[Byte]] =
    Array.tabulate(64)(g => s"$g:".getBytes("UTF-8"))

  /** All `n` lanes for `s` as unsigned-32-bit longs (big-endian digest
    * bytes, matching the hex string's lexicographic order). Called from
    * generated code. */
  def compute(s: UTF8String, n: Int): ArrayData = {
    val md = LocalMd.get()
    val payload = s.getBytes
    val out = new Array[Any](n)
    var g = 0
    while (g * 4 < n) {
      md.reset()
      md.update(if (g < GroupPrefix.length) GroupPrefix(g) else s"$g:".getBytes("UTF-8"))
      md.update(payload)
      val digest = md.digest() // 16 bytes -> 4 lanes of 4 bytes
      var o = 0
      while (o < 4 && g * 4 + o < n) {
        var v = 0L
        var i = 0
        while (i < 4) {
          v = (v << 8) | (digest(o * 4 + i) & 0xffL)
          i += 1
        }
        out(g * 4 + o) = v
        o += 1
      }
      g += 1
    }
    new GenericArrayData(out)
  }

  def md5Lanes(s: Column, numLanes: Int): Column =
    ColumnBridge.column(Md5Lanes(ColumnBridge.expression(s), numLanes))
}
