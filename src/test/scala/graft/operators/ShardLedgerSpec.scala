package graft.operators

import graft.{SparkEntry, SparkSpec}

/** p11 (training-data ledger) checked against a sequential replay of the
  * per-shard counts, character mass, and 48-bit XOR checksum — plus the
  * property the XOR primitive exists for: the ledger is identical no
  * matter how the corpus is partitioned (commutative/associative
  * combine), proven operationally by recomputing over a scrambled
  * repartition.
  */
class ShardLedgerSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("p11 ledger matches a sequential replay and is partition-order " +
    "invariant") {
    val docs = graft.Tables.documents(spark, sf)
      .selectExpr("doc_id", "text", "n_chars")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))

    val expected = docs.map { case (id, text, nc) =>
      val shard = Integer.parseInt(md5hex(id.toString).substring(0, 1), 16)
      val h48 = java.lang.Long.parseLong(md5hex(text).substring(0, 12), 16)
      (shard.toLong, nc, h48)
    }.groupBy(_._1).toSeq.sortBy(_._1).map { case (shard, g) =>
      (shard, g.length.toLong, g.map(_._2).sum,
        g.map(_._3).reduce(_ ^ _))
    }

    val got = SparkEntry.queries("p11_shard_ledger")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))

    assert(got.toSeq === expected)
    assert(expected.forall(e => e._4 >= 0 && e._4 < (1L << 48)))

    // Partition-order invariance: the same ledger from a scrambled
    // 7-way repartition of the corpus (different partials, different
    // combine order) — the reason the primitive is XOR, not concat-hash.
    import org.apache.spark.sql.functions._
    val scrambled = graft.Tables.documents(spark, sf)
      .repartition(7, expr("doc_id % 7"))
      .select(
        expr("""CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 1),
                     16, 10) AS BIGINT)""").as("shard"),
        col("n_chars"),
        expr("CAST(conv(substr(md5(text), 1, 12), 16, 10) AS BIGINT)")
          .as("h48"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("n_chars"),
        expr("bit_xor(h48)").as("checksum48"))
      .orderBy(col("shard"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(scrambled.toSeq === expected)
  }
}
