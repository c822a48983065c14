package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-grams of a text column in ONE fused pass — the
  * shingling kernel shared by the n-gram dedup operators (bigrams for
  * MinHash-LSH d02/d07, trigrams for windowed Jaccard d05).
  *
  * The built-in chain is three interpreted passes with two intermediate
  * arrays per row: `split(text, ' ')`, `transform(sequence(1, size-k),
  * i -> concat(...))`, `array_distinct(...)` — each a CodegenFallback
  * HOF at the head of the dedup pack's hottest subtree. This expression
  * tokenizes, joins, and dedups in a single scan.
  *
  * Exact chain compatibility (the DuckDB oracles mirror the built-in
  * formulation, so results must be identical string-for-string):
  *  - tokenization matches Spark's `split(text, " ")` (regex limit -1):
  *    split on EVERY space, keeping empty tokens, including leading and
  *    trailing ones;
  *  - n-grams are the space-joined windows `tokens[i..i+n)` — identical
  *    to `concat(w_i, ' ', w_{i+1})` / `concat_ws(' ', ...)` over
  *    non-null tokens;
  *  - dedup keeps FIRST occurrence order, like `array_distinct`;
  *  - fewer than n tokens yields an empty array (callers filter
  *    `size >= 1`, replacing the old pre-split `size(ws) >= n` guard —
  *    the same document set survives).
  */
case class WordNgrams(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(n >= 1, s"n must be positive, got $n")

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = s"word_${n}grams"

  override protected def nullSafeEval(input: Any): Any =
    WordNgrams.compute(input.asInstanceOf[UTF8String], n)

  // The string work dominates; codegen's job is keeping the projection in
  // whole-stage codegen, so the generated code calls the eval kernel.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.WordNgrams.compute($a, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordNgrams {
  /** Split on every single space, keeping empty tokens (Spark's
    * `split(text, " ")` semantics with its -1 limit) — the one
    * tokenization contract shared by every n-gram kernel (this
    * expression and [[PosNgramExplode]]), so their outputs always
    * chain-match the built-in `split` the DuckDB oracles mirror. */
  private[functions] def tokenize(s: String): mutable.ArrayBuffer[String] = {
    val tokens = mutable.ArrayBuffer.empty[String]
    var start  = 0
    var i      = 0
    while (i < s.length) {
      if (s.charAt(i) == ' ') { tokens += s.substring(start, i); start = i + 1 }
      i += 1
    }
    tokens += s.substring(start)
    tokens
  }

  def compute(text: UTF8String, n: Int): GenericArrayData = {
    val tokens = tokenize(text.toString)
    val m      = tokens.length - n + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Any])
    val seen = mutable.LinkedHashSet.empty[String]
    var j = 0
    while (j < m) {
      val sb = new java.lang.StringBuilder(tokens(j))
      var k = 1
      while (k < n) { sb.append(' ').append(tokens(j + k)); k += 1 }
      seen += sb.toString
      j += 1
    }
    new GenericArrayData(
      seen.iterator.map(g => UTF8String.fromString(g): Any).toArray)
  }
}
