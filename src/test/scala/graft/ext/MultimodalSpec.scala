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
