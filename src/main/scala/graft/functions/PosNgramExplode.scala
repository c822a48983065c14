package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Row-generating positional word n-grams — the UDTF tier of the
  * extension surface (SURVEY §2.2: UDF / UDAF / UDTF; siblings:
  * the codegen `Expression` kernels in this package, the
  * [[BitmapDistinct]] `Aggregator`, and the whole-operator
  * [[graft.plans.TopKPerGroup]] plan). A custom Catalyst `Generator`
  * plugs into the same `GenerateExec` operator that runs the built-in
  * explode family, so LATERAL VIEW over it distributes exactly like
  * `explode` — per-input-partition row emission, no shuffle, no
  * driver involvement.
  *
  * Emits one (pos, gram) row per n-gram WINDOW (0-based position, all
  * occurrences — unlike [[WordNgrams]], which returns the distinct
  * set), fused into a single pass: the built-in formulation is
  * `posexplode(transform(sequence(...), i -> concat_ws(...)))` over a
  * prior `split` — three interpreted HOF passes and two intermediate
  * arrays per row, and the biggest array (the gram list) is
  * materialized only to be immediately exploded. Here the windows
  * stream straight out of the tokenizer.
  *
  * Mirrors the reference's decode-then-emit loop — one transport frame
  * fanning out to many downstream records (subscribe_to_shard.ex:
  * 343-354) — as a row-generating relational operator.
  *
  * Tokenization is [[WordNgrams.tokenize]]: split on EVERY space,
  * empty tokens kept, so chains stay compatible with `split(text, " ")`
  * and with the DuckDB oracle's `string_split`. Null text or a negative
  * fixture yields no rows (explode semantics, not a null row). The
  * width must be a foldable positive integer — it parameterizes the
  * operator, it is not data.
  */
case class PosNgramExplode(text: Expression, n: Expression)
    extends Generator with CodegenFallback {

  override def children: Seq[Expression] = Seq(text, n)
  override def prettyName: String        = "pos_ngrams"

  override def elementSchema: StructType = StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("gram", StringType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult =
    if (text.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a STRING text argument, got ${text.dataType.sql}")
    else if (n.dataType != IntegerType || !n.foldable)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a foldable INT n-gram width, got ${n.sql}")
    else TypeCheckResult.TypeCheckSuccess

  private lazy val width: Int = {
    val w = n.eval().asInstanceOf[Int]
    require(w >= 1, s"$prettyName width must be positive, got $w")
    w
  }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val t = text.eval(input)
    if (t == null) Nil
    else {
      val tokens = WordNgrams.tokenize(t.asInstanceOf[UTF8String].toString)
      val m      = tokens.length - width + 1
      if (m <= 0) Nil
      else new Iterator[InternalRow] {
        private var j = 0
        override def hasNext: Boolean = j < m
        override def next(): InternalRow = {
          val sb = new java.lang.StringBuilder(tokens(j))
          var k  = 1
          while (k < width) { sb.append(' ').append(tokens(j + k)); k += 1 }
          val row = InternalRow(j, UTF8String.fromString(sb.toString))
          j += 1
          row
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(text = newChildren(0), n = newChildren(1))
}
