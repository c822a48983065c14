package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties}

import graft.SparkSpec

/** The fused minhash8 kernel must reproduce the built-in
  * transform(md5('seed:'||x)) + substring + array_min chain exactly —
  * string-for-string — since the DuckDB oracle mirrors that chain and
  * hash-compares the banded-LSH results riding on it. */
object MinHash8Props extends Properties("MinHash8") {

  private lazy val spark = SparkSpec.session

  override def overrideParameters(
      p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(20)

  private val shingleGen: Gen[List[String]] =
    Gen.chooseNum(1, 40).flatMap(n =>
      Gen.listOfN(
        n,
        Gen.chooseNum(1, 12).flatMap(len =>
          Gen.listOfN(len, Gen.alphaNumChar).map(_.mkString))))

  property("string-identical to the transform+md5+substring+array_min chain") =
    Prop.forAllNoShrink(shingleGen) { sh =>
      import spark.implicits._
      val df = Seq(Tuple1(sh)).toDF("sh")
        .withColumn("mh", GraftFunctions.minHash8(spark, col("sh")))
        .withColumn("ha", expr("transform(sh, x -> md5('a:' || x))"))
        .withColumn("hb", expr("transform(sh, x -> md5('b:' || x))"))
      val checks = (0 until 8).map { i =>
        val src = if (i < 4) "ha" else "hb"
        val off = (i % 4) * 8 + 1
        (element_at(col("mh"), i + 1) ===
          array_min(transform(col(src), x => substring(x, off, 8))))
          .as(s"ok$i")
      }
      val row = df.select(checks: _*).collect()(0)
      (0 until 8).forall(row.getBoolean)
    }
}

class MinHash8Spec extends SparkSpec {

  test("empty shingle array yields null (matching array_min of empty)") {
    import spark.implicits._
    val v = Seq(Tuple1(Seq.empty[String])).toDF("sh")
      .select(GraftFunctions.minHash8(spark, col("sh")))
      .collect()(0)
    assert(v.isNullAt(0))
  }

  test("null shingle element fails loudly") {
    import spark.implicits._
    // The expected task failure is logged by the executor with a full
    // stack trace, which reads as a suite failure in the sbt test log;
    // mute Spark logging for just this intercept.
    spark.sparkContext.setLogLevel("OFF")
    try {
      val ex = intercept[Exception] {
        Seq(Tuple1(Seq("a", null, "b"))).toDF("sh")
          .select(GraftFunctions.minHash8(spark, col("sh")))
          .collect()
      }
      assert(ex.getMessage != null)
    } finally spark.sparkContext.setLogLevel("WARN")
  }
}
