package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Word `n`-gram shingles of a space-separated text column as a native
  * Catalyst expression returning `array<string>`.
  *
  * The composable formulation —
  * `transform(sequence(0, size(toks) - n), i => concat_ws(" ", element_at(toks, i+1), ...))`
  * — is semantically identical but evaluates the lambda per shingle through
  * interpreted higher-order-function machinery (HOFs don't participate in
  * whole-stage codegen), which made shingling the dominant cost of the
  * MinHash dedup pipeline (~6 s of a 17 s cold run at sf0.1 for only 343 k
  * shingles). This builds all shingles for a row in one compiled pass.
  *
  * Semantics match the HOF formulation exactly: tokens are `split(text, " ")`
  * (regex split, limit -1 — consecutive separators yield empty tokens, same
  * as the DuckDB oracle's `string_split`), a document with fewer than `n`
  * tokens yields an EMPTY array (so `explode` drops it, mirroring the old
  * `where(size(toks) >= n)` guard), and a NULL text yields NULL.
  */
case class WordShingles(child: Expression, n: Int)
  extends UnaryExpression {

  require(n >= 1, s"word_shingles n must be >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(s: Any): Any =
    WordShingles.compute(s.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // Whole-stage-codegen friendly: the generated code stays a single
    // static-style call, so the surrounding operators keep their span; the
    // per-row loop runs in compiled Scala rather than interpreted Catalyst.
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.WordShingles$$.MODULE$$.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)

  override def prettyName: String = "word_shingles"
}

object WordShingles {

  private val Space = UTF8String.fromString(" ")

  /** All word n-grams of `s` in order; empty array when there are fewer
    * than `n` tokens. Called from generated code — keep the signature
    * Java-friendly. */
  def compute(s: UTF8String, n: Int): ArrayData = {
    val toks = s.split(Space, -1)
    val m = toks.length - n + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](m)
    var i = 0
    while (i < m) {
      out(i) = UTF8String.concatWs(Space, java.util.Arrays.copyOfRange(toks, i, i + n): _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Column-API entry point. */
  def wordShingles(text: Column, n: Int): Column =
    ColumnBridge.column(WordShingles(ColumnBridge.expression(text), n))
}
