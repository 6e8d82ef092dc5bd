package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Word n-gram shingling as a native expression.
  *
  * The composable form (`transform(sequence(...), i -> array_join(slice(...)))`)
  * pays Spark's interpreted higher-order-lambda cost per element plus a slice
  * allocation per shingle — measured ~1ms/doc. This expression does the whole
  * doc in one JVM call (split, filter empties, join windows); semantics are
  * identical to [[TextFunctions.shingles]]: lowercase, split on \s+, drop
  * empties, docs shorter than n yield one whole-doc shingle.
  */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[UTF8String].toLowerCase.toString
      .split("\\s+").filter(_.nonEmpty)
    val out =
      if (toks.length >= n)
        Array.tabulate(toks.length - n + 1) { i =>
          val sb = new java.lang.StringBuilder(toks(i))
          var j = i + 1
          while (j < i + n) { sb.append(' ').append(toks(j)); j += 1 }
          UTF8String.fromString(sb.toString)
        }
      else Array(UTF8String.fromString(toks.mkString(" ")))
    new GenericArrayData(out.asInstanceOf[Array[Any]])
  }

  override protected def withNewChildInternal(c: Expression): WordShingles = copy(child = c)
}

object TextExpressions {
  /** Register `word_shingles(text, n)` for SQL + call_function use. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "word_shingles",
      es => WordShingles(es.head, es(1).asInstanceOf[Literal].value.toString.toInt),
      "built-in")

  /** Column API (register per session first). */
  def wordShingles(c: Column, n: Int): Column =
    org.apache.spark.sql.functions.call_function("word_shingles", c,
      org.apache.spark.sql.functions.lit(n))
}
