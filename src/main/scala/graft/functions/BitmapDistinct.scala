package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Exact distinct-count via bitmap union — the custom typed AGGREGATE
  * tier of the extension surface (SURVEY §2.2 UDF/UDAF row), alongside
  * the scalar codegen Expressions ([[FloatVectorDot]] family) and the
  * whole-operator plan ([[graft.plans.TopKPerGroup]]).
  *
  * Why a bitmap: `count(DISTINCT x)` shuffles every distinct VALUE to
  * the reducer (Spark expands it to a two-phase distinct aggregate),
  * while a bitmap aggregate ORs fixed-size partial bitmaps map-side —
  * merge is associative and commutative, so one small buffer per group
  * crosses the wire no matter how many rows each partition holds. This
  * is the OLAP engines' standard exact-distinct-at-scale pattern
  * (ClickHouse groupBitmap, Doris BITMAP_UNION); the sketch sibling is
  * q26's HLL when approximation is acceptable.
  *
  * The buffer is a dense Long-word bitmap because the fixture id domain
  * is small and non-negative (user_id < 1 500 at every SF); a roaring
  * bitmap drops into the same three methods for sparse 64-bit domains.
  * The reference has no aggregation at all (SURVEY §2.2 "absent"); this
  * is north-star engine surface.
  */
object BitmapDistinct extends Aggregator[Long, Array[Long], Long] {

  override def zero: Array[Long] = Array.emptyLongArray

  override def reduce(buf: Array[Long], id: Long): Array[Long] = {
    require(id >= 0, s"bitmap_distinct requires non-negative ids, got $id")
    val word = (id >>> 6).toInt
    val b =
      if (word < buf.length) buf
      else java.util.Arrays.copyOf(buf, word + 1)
    b(word) |= 1L << (id & 63)
    b
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    val (big, small) = if (a.length >= b.length) (a, b) else (b, a)
    var i = 0
    while (i < small.length) { big(i) |= small(i); i += 1 }
    big
  }

  override def finish(buf: Array[Long]): Long = {
    var n = 0L
    var i = 0
    while (i < buf.length) { n += java.lang.Long.bitCount(buf(i)); i += 1 }
    n
  }

  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()

  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}
