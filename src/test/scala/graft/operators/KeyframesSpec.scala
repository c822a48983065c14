package graft.operators

import graft.{SparkEntry, SparkSpec}

/** m11 (keyframe selection) cross-checked against m10's scene report on
  * the same derivation — the two queries must agree on every per-doc
  * total — plus the keyframe invariants: one keyframe per scene, first
  * keyframe at frame 0, keyframe indices strictly increasing with
  * scene_id, and each scene's keyframe is its minimum frame index.
  */
class KeyframesSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("m11 agrees with m10 per doc and keyframes are the scene-first " +
    "frames") {
    val kf = SparkEntry.queries("m11_keyframes")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    val scenes = SparkEntry.queries("m10_scene_detect")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap

    val byDoc = kf.groupBy(_._1)
    assert(byDoc.keySet === scenes.keySet)
    for ((doc, rows) <- byDoc) {
      val (nFrames, nScenes, longest) = scenes(doc)
      assert(rows.map(_._5).sum === nFrames,
        s"doc $doc: scene lengths don't cover the frames")
      assert(rows.length.toLong === nScenes,
        s"doc $doc: one keyframe per scene violated")
      assert(rows.map(_._5).max === longest)
      val ordered = rows.sortBy(_._2)
      assert(ordered.head._3 === 0L, s"doc $doc: first keyframe not frame 0")
      // Strictly increasing keyframe indices; scene_ids contiguous from 0.
      val idxs = ordered.map(_._3).toSeq
      assert(idxs.zip(idxs.tail).forall { case (a, b) => a < b })
      assert(ordered.map(_._2).toSeq === (0L until nScenes).toSeq)
    }
    // The selection actually compresses: fewer keyframes than frames.
    assert(kf.length < kf.map(_._5).sum)
  }
}
