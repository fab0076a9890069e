package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IvfSpec extends SparkSpec {

  test("IVF topk: high recall vs brute force on real embeddings") {
    val e = graft.Tables.embeddings(spark, Sf)
    val q = e.filter(col("vec_id") < 8)
    val exact = SimSearch.cosineTopK(q, e, 5).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val ivf = SimSearch.ivfTopK(q, e, 5).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (exact & ivf).size.toDouble / exact.size
    assert(recall >= 0.6, s"recall $recall") // nprobe=4/16 lists on 500 vecs
  }

  test("IVF topk scores are exact cosines (re-ranked with vec_dot)") {
    val e = graft.Tables.embeddings(spark, Sf)
    val q = e.filter(col("vec_id") === 0)
    val exactScores = SimSearch.cosineTopK(q, e, 5).collect()
      .map(r => r.getLong(2) -> r.getDouble(3)).toMap
    SimSearch.ivfTopK(q, e, 5).collect().foreach { r =>
      val cid = r.getLong(2)
      exactScores.get(cid).foreach(s => assert(s == r.getDouble(3)))
    }
  }
}
