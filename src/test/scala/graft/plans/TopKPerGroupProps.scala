package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties}

import graft.SparkSpec

/** Generative equivalence for the custom bounded-heap physical operator:
  * TopK.perGroup must return EXACTLY the window row_number formulation's
  * rows on random distributions the fixed-fixture spec never exercises —
  * arbitrary group skew (one group holding most rows: the operator's
  * reason to exist), NULLs in the sort key under every null-ordering
  * variant (the heap's comparator comes from Catalyst GenerateOrdering
  * on the same SortOrder specs WindowExec sorts by — this pins that they
  * can never diverge), duplicate sort values disambiguated by a unique
  * tie-break (both formulations need a total order to be deterministic),
  * and k at/around the group sizes. */
object TopKPerGroupProps extends Properties("TopKPerGroup") {

  override def overrideParameters(
      p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = SparkSpec.session

  private val orderings: Seq[(String, Column => Seq[Column])] = Seq(
    "asc"              -> (v => Seq(v.asc)),
    "desc"             -> (v => Seq(v.desc)),
    "asc_nulls_last"   -> (v => Seq(v.asc_nulls_last)),
    "desc_nulls_first" -> (v => Seq(v.desc_nulls_first)))

  property("equals the window row_number formulation on any skew, null " +
    "rate, null-ordering variant, and k") =
    Prop.forAll(Gen.choose(0L, Long.MaxValue)) { seed =>
      val rnd = new scala.util.Random(seed ^ 0x70b4e57L)
      val nGroups = 1 + rnd.nextInt(8)
      val hotPct  = rnd.nextInt(100)
      val nullPct = rnd.nextInt(40)
      val k       = 1 + rnd.nextInt(25)
      val (ordName, mkOrder) = orderings(rnd.nextInt(orderings.length))
      val rows = (0 until 2000 + rnd.nextInt(2000)).map { i =>
        val g = if (rnd.nextInt(100) < hotPct) "hot"
                else s"cold${rnd.nextInt(nGroups)}"
        val v: java.lang.Long =
          if (rnd.nextInt(100) < nullPct) null
          else java.lang.Long.valueOf(rnd.nextInt(50).toLong)
        (g, i.toLong, v)
      } ++ Seq(("one", 900001L, java.lang.Long.valueOf(5L)),
        ("allnull", 900002L, null), ("allnull", 900003L, null))
      val sqlc = spark
      import sqlc.implicits._
      val df = rows.toDF("g", "id", "v")

      val order = mkOrder(col("v")) :+ col("id").asc
      val got = TopK.perGroup(spark, df, Seq(col("g")), order, k)
        .select(col("g"), col("id"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      val w = Window.partitionBy(col("g")).orderBy(order: _*)
      val exp = df
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= k)
        .select(col("g"), col("id"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      Prop(got == exp) :|
        s"k=$k order=$ordName nulls=$nullPct% hot=$hotPct%: " +
          s"heap-only=${(got -- exp).take(3)} window-only=${(exp -- got).take(3)}"
    }
}
