package graft.ext

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq((1L, "hello world"), (2L, "x")).toDF("doc_id", "text")

  test("binary attach + batched decode plumbing (stubbed decode)") {
    val decoded = Multimodal.decode(Multimodal.attachBinary(docs, "text", "doc_id"))
      .collect().map(d => d.doc_id -> d).toMap
    assert(decoded(1L).byte_len == 11)
    assert(decoded(1L).width == 1 + 11 % 64 && decoded(1L).height == 1 + 11 % 48)
    assert(decoded(2L).byte_len == 1 && decoded(2L).n_frames == 2)
  }

  test("audio features: hand-computed energy and zero crossings, window split") {
    // "a a a" → bytes 97,32,97,32,97 → samples (−64) 33,−32,33,−32,33:
    // energy = 3·33² + 2·32² = 5315; sign changes = 4
    val d = Seq((1L, "a a a")).toDF("doc_id", "text")
    val one = Multimodal.audioFeatures(
      Multimodal.attachBinary(d, "text", "doc_id")).collect()
    assert(one.length == 1)
    assert(one(0).n_samples == 5 && one(0).energy == 5315L &&
      one(0).zero_crossings == 4L)
    // window split: 70 bytes at win=64 → windows of 64 and 6; crossings
    // do NOT span the window boundary (each window is scored alone)
    val long = Seq((2L, "a " * 35)).toDF("doc_id", "text")
    val ws = Multimodal.audioFeatures(
      Multimodal.attachBinary(long, "text", "doc_id"), win = 64).collect()
      .sortBy(_.window_idx)
    assert(ws.map(_.n_samples).sameElements(Array(64, 6)))
    assert(ws(0).zero_crossings == 63L && ws(1).zero_crossings == 5L)
  }

  test("scene cuts: identical frames score 0, a byte jump crosses the threshold") {
    // 8 'a's then 8 'z's with frameBytes=8: frame 0 = "aaaaaaaa",
    // frame 1 = "zzzzzzzz" → per-position diff 25, sum 200 > 4·8
    val d = Seq((1L, "a" * 8 + "z" * 8 + "a" * 8)).toDF("doc_id", "text")
    val cuts = Multimodal.sceneCuts(
      Multimodal.attachBinary(d, "text", "doc_id"), frameBytes = 8, threshold = 4L)
      .collect().sortBy(_.frame_idx)
    assert(cuts.length == 2)
    assert(cuts(0).diff == 200L && cuts(0).is_cut)
    assert(cuts(1).diff == 200L && cuts(1).is_cut)
    val flat = Multimodal.sceneCuts(
      Multimodal.attachBinary(Seq((2L, "a" * 24)).toDF("doc_id", "text"),
        "text", "doc_id"), frameBytes = 8, threshold = 4L).collect()
    assert(flat.forall(c => c.diff == 0L && !c.is_cut))
  }

  test("frame sampling slices byte windows") {
    val frames = Multimodal.frameSample(
      Multimodal.attachBinary(docs, "text", "doc_id"), frames = 3, frameBytes = 4)
      .collect()
    val doc1 = frames.filter(_.getLong(0) == 1L)
    assert(doc1.map(_.getInt(1)).sameElements(Array(0, 1, 2)))
    assert(doc1.map(_.getInt(2)).sameElements(Array(4, 4, 3))) // 11 bytes → 4,4,3
    val doc2 = frames.filter(_.getLong(0) == 2L)
    assert(doc2.length == 1) // 1 byte → only frame 0 non-empty
  }
}
