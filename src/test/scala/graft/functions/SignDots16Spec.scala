package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties}

import graft.SparkSpec

/** The fused sign_dots16 kernel must reproduce the 16 ±1-hyperplane dot
  * products exactly — left-to-right double accumulation over the
  * md5("p:i")-derived plane matrix — because the DuckDB oracle bakes the
  * same matrix as literals and d06/s04's band hashes ride the rounded
  * signs. Checked against an independent plain-Scala fold. */
object SignDots16Props extends Properties("SignDots16") {

  private lazy val spark = SparkSpec.session

  override def overrideParameters(
      p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(20)

  private val Dim = 64

  private def reference(v: Seq[Float]): Seq[Double] =
    (0 until SignDots16.NumPlanes).map { p =>
      var acc = 0.0
      var i   = 0
      while (i < Dim) {
        val s = if (SignDots16.planeSign(p, i)) 1.0 else -1.0
        acc += v(i).toDouble * s
        i += 1
      }
      acc
    }

  private val vecGen: Gen[List[Float]] =
    Gen.listOfN(Dim, Gen.chooseNum(-4.0f, 4.0f))

  property("bit-identical to the independent left-to-right fold") =
    Prop.forAllNoShrink(vecGen) { v =>
      import spark.implicits._
      val got = Seq(Tuple1(v)).toDF("embedding")
        .select(GraftFunctions.signDots16(spark, col("embedding")).as("d"))
        .collect()(0).getSeq[Double](0)
      got == reference(v)
    }
}
