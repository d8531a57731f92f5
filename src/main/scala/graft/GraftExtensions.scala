package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.{DoubleType, LongType}

import graft.functions.{FloatVectorDot, TopKByScore, WordShingles}

/** SparkSessionExtensions entry point: registers the library's custom
  * Catalyst functions with the session's function registry so they're
  * usable from plain SQL as well as the Column API.
  *
  * {{{
  * SparkSession.builder()
  *   .config("spark.sql.extensions", "graft.GraftExtensions")
  *   ...
  * // then:
  * spark.sql("SELECT float_vector_dot(a.embedding, b.embedding) ...")
  * spark.sql("SELECT query_id, top_k_by_score(cos, neighbor_id, 5) ...")
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("float_vector_dot"),
      new ExpressionInfo(classOf[FloatVectorDot].getName, "float_vector_dot"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "float_vector_dot(a, b) takes two array<float> args")
        FloatVectorDot(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("top_k_by_score"),
      new ExpressionInfo(classOf[TopKByScore].getName, "top_k_by_score"),
      (children: Seq[Expression]) => {
        require(children.size == 3, "top_k_by_score(score, id, k) takes three args")
        val k = children(2) match {
          case Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"top_k_by_score k must be an integer literal, got $other")
        }
        // same input widening the Column API applies — without it a FLOAT
        // score or INT id column would ClassCastException inside update()
        TopKByScore(
          Cast(children.head, DoubleType),
          Cast(children(1), LongType), k).toAggregateExpression()
      }))
    ext.injectFunction((
      new FunctionIdentifier("word_shingles"),
      new ExpressionInfo(classOf[WordShingles].getName, "word_shingles"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "word_shingles(text, n) takes two args")
        val n = children(1) match {
          case Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"word_shingles n must be an integer literal, got $other")
        }
        WordShingles(children.head, n)
      }))
  }
}
