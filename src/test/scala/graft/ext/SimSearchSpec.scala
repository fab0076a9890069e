package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SimSearchSpec extends SparkSpec {
  import spark.implicits._

  private def vec(xs: Double*): Array[Float] = xs.map(_.toFloat).toArray

  private lazy val emb = Seq(
    (0L, vec(1, 0, 0, 0)),
    (1L, vec(0.9, 0.1, 0, 0)),   // closest to 0
    (2L, vec(0, 1, 0, 0)),       // orthogonal to 0
    (3L, vec(-1, 0, 0, 0)),      // opposite of 0
    (4L, vec(0.7, 0.7, 0, 0))
  ).toDF("vec_id", "embedding")

  test("cosine topk ranks by similarity with deterministic ties") {
    val out = SimSearch.cosineTopK(emb.filter(col("vec_id") === 0), emb, 4, dim = 4)
      .collect()
    assert(out.map(_.getLong(2)).take(2).sameElements(Array(1L, 4L)))
    assert(out.last.getLong(2) == 3L) // opposite vector ranks last
    assert(math.abs(out(0).getDouble(3) - 0.9 / math.sqrt(0.82)) < 1e-6) // inputs are float32
  }

  test("cosine handles self-exclusion") {
    val out = SimSearch.cosineTopK(emb.filter(col("vec_id") === 0), emb, 10, dim = 4).collect()
    assert(!out.map(_.getLong(2)).contains(0L))
  }

  test("LSH topk top-1 agrees with brute force on real embeddings") {
    val e = graft.Tables.embeddings(spark, Sf)
    val q = e.filter(col("vec_id") < 5)
    val exact = SimSearch.cosineTopK(q, e, 1).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val approx = SimSearch.lshTopK(q, e, 1).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val agree = exact.keys.count(k => approx.get(k).contains(exact(k)))
    assert(agree >= 4) // allow one LSH miss out of 5
  }

  test("near-dup pairs threshold filter keeps only the close pair") {
    // cos(0,1) = 0.9/√0.82 ≈ 0.9939; every other pair is far below 0.99
    val pairs = SimSearch.cosineNearDupPairs(emb, 0.99, dim = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.sameElements(Array((0L, 1L))))
  }
}
