package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties}

import graft.SparkSpec

/** The fused simhash60 kernel must reproduce the per-bit ±1 vote
  * definition exactly (bit i set iff strictly more elements carry bit i
  * than not) — the DuckDB oracle mirrors the equivalent HOF chain, so a
  * single differing bit would break d03/d04's hash compare. Checked
  * against an independent plain-Scala reimplementation, plus the
  * documented edge cases and the order-independence the operator relies
  * on when signatures are computed over shuffled shingle arrays. */
object SimHash60Props extends Properties("SimHash60") {

  private lazy val spark = SparkSpec.session

  override def overrideParameters(
      p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(30)

  private def reference(xs: Seq[Long]): Long = {
    var sig = 0L
    for (b <- 0 until 60) {
      val votes = xs.map(v => if (((v >>> b) & 1L) == 1L) 1 else -1).sum
      if (votes > 0) sig |= (1L << b)
    }
    sig
  }

  private val hashesGen: Gen[List[Long]] =
    Gen.chooseNum(0, 50).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(0L, (1L << 60) - 1)))

  private def sparkSimhash(xs: Seq[Long]): Long = {
    import spark.implicits._
    Seq(Tuple1(xs)).toDF("h")
      .select(GraftFunctions.simHash60(spark, col("h")).as("sig"))
      .collect()(0).getLong(0)
  }

  property("matches the independent per-bit vote reimplementation") =
    Prop.forAllNoShrink(hashesGen) { xs =>
      sparkSimhash(xs) == reference(xs)
    }

  property("order-independent (reversal and rotation)") =
    Prop.forAllNoShrink(hashesGen) { xs =>
      val rotated = if (xs.isEmpty) xs else xs.tail :+ xs.head
      sparkSimhash(xs) == sparkSimhash(xs.reverse) &&
      sparkSimhash(xs) == sparkSimhash(rotated)
    }

  property("empty array votes all bits to zero") =
    Prop(sparkSimhash(Nil) == 0L)
}
