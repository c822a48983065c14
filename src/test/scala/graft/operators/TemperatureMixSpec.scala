package graft.operators

import graft.{SparkEntry, SparkSpec}

/** p12 (temperature-based source mixture) checked against a driver-side
  * recomputation of the α=0.3 multinomial sampling weights, plus the
  * distribution properties the mixture exists to provide: probabilities
  * sum to one, the boost is monotone decreasing in natural share, and a
  * planted lopsided corpus up-weights the small source past 1. */
class TemperatureMixSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("p12 matches a driver-side recomputation of share, tempered " +
    "probability, and boost for every source") {
    val toks = spark.read.parquet(s"$sf/documents.parquet")
      .select("source", "text").collect()
      .map(r => r.getString(0) -> r.getString(1).split(" ", -1).length.toLong)
      .groupBy(_._1).map { case (s, g) =>
        s -> (g.length.toLong, g.map(_._2).sum) }
    val total = toks.valuesIterator.map(_._2).sum.toDouble
    val z = toks.valuesIterator
      .map(t => math.pow(t._2 / total, 0.3)).sum

    val got = SparkEntry.queries("p12_temperature_mix")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))

    assert(got.length === toks.size)
    got.foreach { case (src, nDocs, nToks, share, p, boost) =>
      val (en, et) = toks(src)
      assert(nDocs === en && nToks === et, s"source $src counts")
      val eShare = et / total
      val eP = math.pow(eShare, 0.3) / z
      assert(math.abs(share - eShare) < 1e-6, s"$src share")
      assert(math.abs(p - eP) < 1e-6, s"$src p_a03")
      assert(math.abs(boost - eP / eShare) < 1e-4, s"$src boost")
    }
  }

  test("probabilities and shares each sum to one; boost is monotone " +
    "decreasing in token share (temperature < 1 compresses the mix)") {
    val got = SparkEntry.queries("p12_temperature_mix")(spark, sf)
      .collect()
      .map(r => (r.getLong(2), r.getDouble(3), r.getDouble(4),
        r.getDouble(5)))
    assert(math.abs(got.map(_._2).sum - 1.0) < 1e-4, "shares sum to 1")
    assert(math.abs(got.map(_._3).sum - 1.0) < 1e-4, "p_a03 sums to 1")
    got.sortBy(_._1).sliding(2).foreach {
      case Array((t1, _, _, b1), (t2, _, _, b2)) =>
        if (t1 < t2)
          assert(b1 >= b2 - 1e-9,
            s"boost must not increase with share: $t1->$b1 vs $t2->$b2")
      case _ =>
    }
  }

  test("planted lopsided corpus: the small source's boost exceeds 1, " +
    "the large source's sits below 1") {
    import spark.implicits._
    def doc(id: Long, src: String) = {
      val text = (1 to 32).map(i => s"w${i % 8}").mkString(" ")
      (id, text, "en", src, text.length.toLong)
    }
    val dir = java.nio.file.Files
      .createTempDirectory("graft_tmix_").toString
    (Seq.tabulate(2)(i => doc(i.toLong, "a")) ++
      Seq.tabulate(20)(i => doc(100L + i, "b")))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val boosts = SparkEntry.queries("p12_temperature_mix")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getDouble(5)).toMap
    assert(boosts("a") > 1.0, s"small source boost ${boosts("a")}")
    assert(boosts("b") < 1.0, s"large source boost ${boosts("b")}")
  }
}
