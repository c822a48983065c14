package graft.functions

import org.scalacheck.{Gen, Prop, Properties}

/** The bitmap aggregator must equal the exact distinct count under ANY
  * partitioning of the input — reduce/merge are exercised directly over
  * random slicings, which is precisely the contract Spark relies on when
  * it ORs map-side partial bitmaps in arbitrary order. */
object BitmapDistinctProps extends Properties("BitmapDistinct") {

  override def overrideParameters(
      p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(100)

  private val idsGen: Gen[List[Long]] =
    Gen.chooseNum(0, 200).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(0L, 2000L)))

  private val slicedGen: Gen[(List[Long], List[Int])] = for {
    ids    <- idsGen
    cuts   <- Gen.listOfN(3, Gen.chooseNum(0, math.max(ids.length, 1)))
  } yield (ids, cuts.sorted)

  property("equals the exact distinct count under arbitrary slicing") =
    Prop.forAllNoShrink(slicedGen) { case (ids, cuts) =>
      // Split ids into up to 4 "partitions" at the random cut points,
      // reduce each independently, merge in a shuffled order.
      val bounds = (0 +: cuts :+ ids.length).distinct.sorted
      val slices = bounds.zip(bounds.tail).map { case (a, b) =>
        ids.slice(a, b)
      }
      val partials = slices.map(sl =>
        sl.foldLeft(BitmapDistinct.zero)(BitmapDistinct.reduce))
      val merged = partials.reverse // merge order must not matter
        .foldLeft(BitmapDistinct.zero)(BitmapDistinct.merge)
      BitmapDistinct.finish(merged) == ids.distinct.length.toLong
    }

  property("rejects negative ids loudly rather than corrupting the bitmap") =
    Prop.forAll(Gen.chooseNum(Long.MinValue, -1L)) { bad =>
      Prop.throws(classOf[IllegalArgumentException])(
        BitmapDistinct.reduce(BitmapDistinct.zero, bad))
    }

  property("rejects out-of-domain large ids loudly rather than aliasing " +
    "words (>= 2^37) or allocating id/64 longs") =
    Prop.forAll(Gen.chooseNum(BitmapDistinct.MaxId, Long.MaxValue)) { bad =>
      Prop.throws(classOf[IllegalArgumentException])(
        BitmapDistinct.reduce(BitmapDistinct.zero, bad))
    }
}
