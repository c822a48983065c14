package graft.operators

import graft.{SparkEntry, SparkSpec}

/** t21 (source saturation curve) checked against a full Scala-side
  * recomputation — global first-occurrence novelty in doc_id ingestion
  * order, ntile(5) bucketing within source — plus the order-sensitivity
  * property that separates it from t19's static overlap matrix: the
  * corpus-wide novelty mass must DECLINE across ingestion buckets
  * (every gram is novel exactly once, so later slices can only lose). */
class SourceSaturationSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def bigrams(t: String): Seq[String] = {
    val w = t.split(" ", -1)
    (0 until w.length - 1).map(i => s"${w(i)} ${w(i + 1)}").distinct
  }

  test("t21 matches a driver-side recomputation of global novelty and " +
    "ntile bucketing (every source, every bucket)") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .filter(d => d._3.split(" ", -1).length >= 2)
      .sortBy(_._1)

    // Global first-occurrence: a gram is novel only in the FIRST doc
    // (by doc_id) that contains it, across all sources.
    val firstSeen = scala.collection.mutable.Map.empty[String, Long]
    for ((id, _, t) <- docs; g <- bigrams(t))
      if (!firstSeen.contains(g)) firstSeen(g) = id

    // ntile(5) within source by doc_id: first (n mod 5) buckets get the
    // extra element.
    def buckets(n: Int): Seq[Int] = {
      val base  = n / 5
      val extra = n % 5
      (1 to 5).flatMap(b =>
        Seq.fill(base + (if (b <= extra) 1 else 0))(b))
    }
    val expected = docs.groupBy(_._2).toSeq.sortBy(_._1).flatMap {
      case (src, ds) =>
        val sorted = ds.sortBy(_._1)
        val bkt    = buckets(sorted.length)
        sorted.zip(bkt).groupBy(_._2).toSeq.sortBy(_._1).map {
          case (b, slice) =>
            val grams  = slice.flatMap { case ((id, _, t), _) =>
              bigrams(t).map(g => (id, g))
            }
            val novel  = grams.count { case (id, g) => firstSeen(g) == id }
            (src, b.toLong, slice.map(_._1._1).distinct.size.toLong,
              grams.size.toLong, novel.toLong,
              1000000L * novel / grams.size)
        }
    }

    val got = SparkEntry.queries("t21_source_saturation")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))

    assert(got.toSeq === expected)
  }

  test("novelty mass declines across ingestion buckets corpus-wide — " +
    "the order-sensitive signal a static overlap matrix cannot show") {
    val rows = SparkEntry.queries("t21_source_saturation")(spark, sf)
      .collect()
      .map(r => (r.getLong(1), r.getLong(3), r.getLong(4)))
    val byBucket = rows.groupBy(_._1).toSeq.sortBy(_._1).map {
      case (b, rs) =>
        b -> (rs.map(_._3).sum.toDouble / rs.map(_._2).sum)
    }
    assert(byBucket.length === 5)
    // First slice of a fresh corpus is maximally novel; the tail must
    // sit strictly below it (repeats accumulate monotonically in mass
    // even if individual sources wobble).
    assert(byBucket.head._2 > byBucket.last._2,
      s"novelty did not decline: $byBucket")
    assert(rows.forall(r => r._3 <= r._2), "novel > grams somewhere")
  }
}
