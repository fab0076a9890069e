package graft

import org.apache.spark.sql.functions._
import graft.ext.SimSearch

/** Dev-only: measure recall@5 of the three approximate ANN paths against
  * brute force at the x_ann_recall_audit operating points, so the audit
  * floors in [[ExtCatalog]] are backed by measurement, not guesses.
  * Usage: runMain graft.DevAnnRecall <sfDir>
  */
object DevAnnRecall {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = Sessions.local(appName = "graft-dev-annrecall")
    val e = Tables.embeddings(spark, dir)
    val q = e.filter(col("vec_id") < 10)
    val k = 5
    val brute = SimSearch.cosineTopK(q, e, k).select(col("qid"), col("cid"))
    val nb = brute.count().toDouble
    def rec(name: String, res: org.apache.spark.sql.DataFrame): Unit = {
      val hits = res.select(col("qid"), col("cid"))
        .join(brute, Seq("qid", "cid")).count()
      println(f"[annrecall] $name%-4s recall@$k = $hits/${nb.toLong} = ${hits / nb}%.3f")
    }
    rec("ivf", SimSearch.ivfTopK(q, e, k))
    rec("lsh", SimSearch.lshTopK(q, e, k))
    rec("pq", SimSearch.pqTopK(q, e, k, m = 16, ksub = 32))
    spark.stop()
  }
}
