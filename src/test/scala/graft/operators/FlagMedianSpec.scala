package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** r19: q31/q40's exact median moved from an in-aggregate
  * `percentile(l_extendedprice, 0.5)` (ObjectHashAggregate, every value
  * buffered) to [[Relational.flagPriceMedian]]'s rankSelect pair. This
  * pins the replacement BIT-IDENTICAL to the built-in on the fixture —
  * interpolation included (the fixture's flag groups cover both odd and
  * even n) — so a drift in the rank pair, the band expression, or the
  * (lo+hi)/2 interpolation fails here, not at the oracle gate. */
class FlagMedianSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("flagPriceMedian ≡ round(percentile(price, 0.5), 4) per flag, " +
    "on the fixture and on planted odd/even groups") {
    val got = Relational.flagPriceMedian(spark, sf)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val want = graft.Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag"))
      .agg(round(expr("percentile(l_extendedprice, 0.5)"), 4).as("m"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got == want, s"fixture medians diverged: $got vs $want")

    // Planted groups: odd n (exact middle), even n (interpolated pair),
    // including values that straddle a 128-unit band boundary.
    import spark.implicits._
    val rows = Seq(
      ("ODD", 1.25), ("ODD", 127.99), ("ODD", 128.01),
      ("EVN", 10.0), ("EVN", 127.5), ("EVN", 128.5), ("EVN", 4000.0))
      .zipWithIndex
      .map { case ((f, v), i) => (f, v, i.toLong, i) }
      .toDF("l_returnflag", "l_extendedprice", "l_orderkey",
        "l_linenumber")
    val sel = DistributedScan.rankSelect(
        rows, "l_returnflag",
        expr("CAST(floor(l_extendedprice) AS BIGINT) div 128"),
        Seq(col("l_extendedprice"), col("l_orderkey"),
          col("l_linenumber")),
        col("l_extendedprice"),
        Seq("lov" -> "(n + 1) div 2", "hiv" -> "n div 2 + 1"))
      .select(col("l_returnflag"),
        round((col("lov") + col("hiv")) / 2.0, 4).as("m"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val ref = rows.groupBy(col("l_returnflag"))
      .agg(round(expr("percentile(l_extendedprice, 0.5)"), 4).as("m"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(sel == ref, s"planted medians diverged: $sel vs $ref")
    assert(sel("ODD") == 127.99 && sel("EVN") == (127.5 + 128.5) / 2.0)
  }
}
