package graft

/** Dev-only: calibrate the dedupClustersAuto dispatch ceiling — print the
  * optimizer size/row estimate of the near-dup PAIR frame (the edge set a
  * driver union-find would collect) against its true size at each fixture.
  * Usage: runMain graft.DevClusterStats <sfDir> [sfDir...] */
object DevClusterStats {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(appName = "graft-devclusterstats")
    args.foreach { sfDir =>
      val docs = Tables.documents(spark, sfDir)
      val pairs = graft.ext.Dedup.nearDupPairsAuto(docs, "text", "doc_id", 3, 0.6)
      val st = pairs.queryExecution.optimizedPlan.stats
      val t0 = System.nanoTime()
      val n = pairs.count()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[clusterstats] $sfDir estBytes=${st.sizeInBytes} " +
        f"estRows=${st.rowCount} actualEdges=$n detect=$secs%.2f s")
    }
    spark.stop()
  }
}
