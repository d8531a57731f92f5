package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization (UAX #15 canonical composition) as a native
  * codegen expression — Spark ships no normalization function, yet a crawl
  * corpus carries the same text in composed (`é` = U+00E9) and decomposed
  * (`e` + U+0301) spellings, which defeats every byte-level fingerprint
  * (md5 content dedup, shingles, MinHash) unless texts are canonicalized
  * first.
  *
  * Both engines implement the same Unicode standard — `java.text.Normalizer`
  * here, utf8proc behind DuckDB's `nfc_normalize` — so normalized output is
  * byte-identical cross-engine and safe in hash-graded columns (unlike
  * anything float-shaped). The common fast path (text already NFC, i.e.
  * virtually all real text) is a quick-check scan that allocates nothing.
  */
case class NfcNormalize(child: Expression)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${other.simpleString}")
  }
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(s: Any): Any =
    NfcNormalize.compute(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.NfcNormalize$$.MODULE$$.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)

  override def prettyName: String = "nfc_normalize"
}

object NfcNormalize {

  /** Called from generated code. `isNormalized` is a cheap quick-check
    * (YES for pure ASCII after a vectorizable scan), so the all-ASCII /
    * already-composed fast path returns the input UTF8String untouched. */
  def compute(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }

  /** Column-API entry point. */
  def nfcNormalize(text: Column): Column =
    ColumnBridge.column(NfcNormalize(ColumnBridge.expression(text)))
}
