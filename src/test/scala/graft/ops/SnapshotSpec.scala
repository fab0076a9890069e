package graft.ops

import graft.SparkSpec

class SnapshotSpec extends SparkSpec {
  import spark.implicits._

  test("diff: classifies added / removed / changed / unchanged by id") {
    val oldV = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "text")
    val newV = Seq((2L, "b"), (3L, "C!"), (4L, "d")).toDF("id", "text")
    val got = Snapshot.diff(oldV, newV, "id", Seq("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "removed", 2L -> "unchanged", 3L -> "changed", 4L -> "added"))
  }

  test("diff: null payload cells compare null-safely") {
    val oldV = Seq((1L, Option.empty[String]), (2L, Some("x"))).toDF("id", "text")
    val newV = Seq((1L, Option.empty[String]), (2L, Option.empty[String])).toDF("id", "text")
    val got = Snapshot.diff(oldV, newV, "id", Seq("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "unchanged", 2L -> "changed"))
  }

  test("diffSummary: rolls the classes up to counts") {
    val oldV = Seq((1L, "a"), (2L, "b")).toDF("id", "text")
    val newV = Seq((2L, "b2"), (3L, "c")).toDF("id", "text")
    val got = Snapshot.diffSummary(oldV, newV, "id", Seq("text")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("added" -> 1L, "changed" -> 1L, "removed" -> 1L))
  }
}
