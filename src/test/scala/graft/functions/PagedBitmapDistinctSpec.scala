package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Container algebra of the paged bitmap: array containers stay sorted
  * and deduplicated, upgrade to a bitmap exactly at the break-even
  * population, and every cross-kind merge yields the same distinct
  * count as a reference Set — including across page boundaries and for
  * negative ids (whose unsigned page keys must not collide with the
  * positive space). */
class PagedBitmapDistinctSpec extends AnyFunSuite {

  private val A = PagedBitmapDistinct

  private def count(ids: Seq[Long]): Long =
    A.finish(ids.foldLeft(A.zero)(A.reduce))

  test("array container: duplicates collapse, count exact") {
    val ids = Seq(5L, 1L, 5L, 99999L, 1L, -7L, -7L, Long.MaxValue)
    assert(count(ids) == 5)
  }

  test("array upgrades to bitmap at break-even and stays exact") {
    // 2000 distinct lows in ONE page (page key 0): crosses the
    // 1024-entry upgrade point.
    val ids = (0L until 2000L)
    val buf = ids.foldLeft(A.zero)(A.reduce)
    assert(buf.size == 1)
    assert(buf.head._2.length == A.BitmapWords) // bitmap container now
    assert(A.finish(buf) == 2000)
    // Re-adding existing ids changes nothing.
    assert(A.finish(Seq(0L, 1999L).foldLeft(buf)(A.reduce)) == 2000)
  }

  test("merge agrees with a reference Set across container kinds") {
    val rnd = new scala.util.Random(7)
    // Partition a mixed workload (one hot page + scattered pages,
    // negatives included) into 4 "map tasks", merge pairwise.
    val ids = Seq.tabulate(6000)(i =>
      if (i % 3 == 0) rnd.nextInt(3000).toLong          // hot page(s)
      else if (i % 3 == 1) rnd.nextLong()               // scattered
      else -1L - rnd.nextInt(5000).toLong)              // negative space
    val parts = ids.grouped(1500).toSeq
      .map(_.foldLeft(A.zero)(A.reduce))
    val merged = parts.reduce(A.merge)
    assert(A.finish(merged) == ids.distinct.size.toLong)
  }
}
