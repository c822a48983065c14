package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties}

import graft.SparkSpec

/** The fused word-n-gram kernel must reproduce the built-in
  * split → transform(concat) → array_distinct chains string-for-string
  * (the DuckDB dedup oracles mirror those chains), including the empty
  * tokens Spark's split keeps around repeated/leading/trailing spaces. */
object WordNgramsProps extends Properties("WordNgrams") {

  private lazy val spark = SparkSpec.session

  override def overrideParameters(
      p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(20)

  // Word salad with occasional doubled/leading/trailing spaces and
  // repeated words (to exercise empty tokens and the distinct pass).
  private val textGen: Gen[String] = for {
    n     <- Gen.chooseNum(0, 30)
    words <- Gen.listOfN(n, Gen.oneOf("the", "fast", "key", "sort", "a", "bb"))
    sep   <- Gen.listOfN(math.max(n - 1, 0), Gen.oneOf(" ", "  "))
    lead  <- Gen.oneOf("", " ")
    trail <- Gen.oneOf("", " ")
  } yield lead + words.zipAll(sep, "", "").map { case (w, s) => w + s }.mkString + trail

  private def chainMatches(text: String, n: Int): Boolean = {
    import spark.implicits._
    val guard = col("size") >= n
    val gram = n match {
      case 2 =>
        "transform(sequence(1, size(ws)-1), " +
          "i -> concat(element_at(ws, i), ' ', element_at(ws, i+1)))"
      case 3 =>
        "transform(sequence(1, size(ws)-2), i -> concat_ws(' ', " +
          "element_at(ws, i), element_at(ws, i+1), element_at(ws, i+2)))"
    }
    val row = Seq(Tuple1(text)).toDF("text")
      .withColumn("ws", split(col("text"), " "))
      .withColumn("size", size(col("ws")))
      .withColumn("fused", GraftFunctions.wordNgrams(spark, col("text"), n))
      .withColumn(
        "chain",
        when(guard, array_distinct(expr(gram)))
          .otherwise(array().cast("array<string>")))
      .select(col("fused") === col("chain"))
      .collect()(0)
    row.getBoolean(0)
  }

  property("bigrams string-identical to the HOF chain") =
    Prop.forAllNoShrink(textGen)(t => chainMatches(t, 2))

  property("trigrams string-identical to the HOF chain") =
    Prop.forAllNoShrink(textGen)(t => chainMatches(t, 3))
}

class WordNgramsSpec extends SparkSpec {
  test("fewer tokens than n yields an empty array") {
    import spark.implicits._
    val r = Seq(Tuple1("oneword")).toDF("t")
      .select(GraftFunctions.wordNgrams(spark, col("t"), 2))
      .collect()(0)
    assert(r.getSeq[String](0).isEmpty)
  }
}
