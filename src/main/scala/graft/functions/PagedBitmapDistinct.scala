package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Exact distinct-count over ARBITRARY 64-bit ids via a paged (roaring-
  * style) bitmap — the sparse-domain sibling [[BitmapDistinct]]'s
  * scaladoc promises. The id space is split into 2^16-wide pages keyed
  * by the high 48 bits; each page holds either
  *
  *  - an ARRAY container (sorted low-16 values, one per Long) while the
  *    page is sparse, or
  *  - a BITMAP container (1024 words = 2^16 bits) once the page crosses
  *    the break-even population (1024 entries, where the sorted array
  *    would outgrow the bitmap) — the same two-container adaptive rule
  *    roaring bitmaps use (RoaringBitmap, Lemire et al.; theirs packs
  *    16-bit entries so its threshold is 4096).
  *
  * An isolated id therefore costs 8 bytes + its page key, not the
  * id/64 words the dense bitmap would allocate (an OOM at 64-bit ids),
  * while merge stays an associative page-wise union — so the
  * map-side-combine contract that makes bitmap aggregation beat
  * `count(DISTINCT)`'s value shuffle holds for user-id-sized, hash-
  * sized, or composite-key domains. Container kind is tagged by length
  * alone (bitmap == 1024 words exactly; arrays convert AT 1024, so an
  * array container is always shorter). Fixture-scale simplicity over
  * raw speed: containers are immutable snapshots (copy-on-insert) and
  * entries ride full Longs; a production drop-in mutates buffers and
  * packs 16-bit entries, changing no semantics. */
object PagedBitmapDistinct
    extends Aggregator[Long, Map[Long, Array[Long]], Long] {

  /** Words in a bitmap container (2^16 bits), and the array-container
    * population at which the bitmap becomes the smaller encoding. */
  val BitmapWords = 1024

  private def pageKey(id: Long): Long = id >>> 16
  private def low(id: Long): Long = id & 0xffffL

  private def isBitmap(c: Array[Long]): Boolean = c.length == BitmapWords

  private def toBitmap(sorted: Array[Long]): Array[Long] = {
    val bm = new Array[Long](BitmapWords)
    var i = 0
    while (i < sorted.length) {
      val v = sorted(i)
      bm((v >>> 6).toInt) |= 1L << (v & 63)
      i += 1
    }
    bm
  }

  private def insert(c: Array[Long], v: Long): Array[Long] =
    if (isBitmap(c)) {
      c((v >>> 6).toInt) |= 1L << (v & 63) // in place: buffers are engine-owned
      c
    } else {
      val at = java.util.Arrays.binarySearch(c, v)
      if (at >= 0) c
      else {
        val ins = -(at + 1)
        val out = new Array[Long](c.length + 1)
        System.arraycopy(c, 0, out, 0, ins)
        out(ins) = v
        System.arraycopy(c, ins, out, ins + 1, c.length - ins)
        if (out.length == BitmapWords) toBitmap(out) else out
      }
    }

  private def union(a: Array[Long], b: Array[Long]): Array[Long] =
    (isBitmap(a), isBitmap(b)) match {
      case (true, true) =>
        var i = 0
        while (i < BitmapWords) { a(i) |= b(i); i += 1 }
        a
      case (true, false)  => b.foldLeft(a)(insert)
      case (false, true)  => a.foldLeft(b)(insert)
      case (false, false) => b.foldLeft(a)(insert)
    }

  override def zero: Map[Long, Array[Long]] = Map.empty

  override def reduce(
      buf: Map[Long, Array[Long]], id: Long): Map[Long, Array[Long]] = {
    val k = pageKey(id)
    val v = low(id)
    buf.updated(k, buf.get(k) match {
      case Some(c) => insert(c, v)
      case None    => Array(v)
    })
  }

  override def merge(
      a: Map[Long, Array[Long]],
      b: Map[Long, Array[Long]]): Map[Long, Array[Long]] = {
    val (big, small) = if (a.size >= b.size) (a, b) else (b, a)
    small.foldLeft(big) { case (acc, (k, c)) =>
      acc.updated(k, acc.get(k) match {
        case Some(c0) => union(c0, c)
        case None     => c
      })
    }
  }

  override def finish(buf: Map[Long, Array[Long]]): Long =
    buf.valuesIterator.map { c =>
      if (isBitmap(c)) {
        var n = 0L
        var i = 0
        while (i < BitmapWords) { n += java.lang.Long.bitCount(c(i)); i += 1 }
        n
      } else c.length.toLong
    }.sum

  override def bufferEncoder: Encoder[Map[Long, Array[Long]]] =
    ExpressionEncoder[Map[Long, Array[Long]]]()

  override def outputEncoder: Encoder[Long] =
    org.apache.spark.sql.Encoders.scalaLong
}
