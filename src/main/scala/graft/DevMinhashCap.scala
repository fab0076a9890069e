package graft

import org.apache.spark.sql.functions._
import graft.ext.Dedup

/** Dev-only: measure the minhash banded self-join at several bucket caps
  * on an sf directory (intended: the x16 fixture), so the
  * [[Dedup.MinhashBucketCapDefault]] operating point is chosen by
  * measurement — time AND surviving pair count (recall proxy).
  * Usage: runMain graft.DevMinhashCap <sfDir> [caps...]
  */
object DevMinhashCap {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_scaleup_x16")
    val caps = if (args.length > 1) args.tail.map(_.toInt).toSeq else Seq(0, 64, 32, 16)
    val spark = Sessions.local(appName = "graft-dev-minhashcap")
    val docs = Tables.documents(spark, dir)
    caps.foreach { cap =>
      // warm once per cap (plans differ), then time
      val mk = () => Dedup.minhashLshPairs(docs, "text", "doc_id", 3, 32, 8, 0.6,
        bucketCap = cap)
      Bench.materialize(mk())
      System.gc()
      val t0 = System.nanoTime()
      val n = mk().count()
      val t = (System.nanoTime() - t0) / 1e9
      println(f"[minhashcap] cap=$cap%-4d time=$t%6.2f s pairs=$n")
    }
    spark.stop()
  }
}
