package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only: materialize a ~4× copy of an sf directory (key-offset unions)
  * and time headline queries on it — empirical evidence that the catalog's
  * plans scale near-linearly rather than super-linearly.
  * Usage: runMain graft.DevScaleUp [srcSfDir] [copies] */
object DevScaleUp {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val copies = args.lift(1).map(_.toInt).getOrElse(4)
    val dst = s"/tmp/graft_scaleup_x$copies"
    val spark = Sessions.local(appName = "graft-scaleup")

    def replicate(name: String, offsets: Map[String, Long => org.apache.spark.sql.Column]): Unit = {
      val base = Tables.load(spark, src, name)
      val parts = (0 until copies).map { i =>
        offsets.foldLeft(base) { case (df, (c, f)) => df.withColumn(c, f(i.toLong)) }
      }
      parts.reduce(_ union _).write.mode("overwrite").parquet(s"$dst/$name.parquet")
    }

    val big = 100000000L
    replicate("lineitem", Map("l_orderkey" -> (i => col("l_orderkey") + lit(i * big))))
    replicate("orders", Map("o_orderkey" -> (i => col("o_orderkey") + lit(i * big))))
    // texts get a per-copy suffix token: otherwise every doc has
    // copies-1 byte-identical clones and the dedup family measures a
    // pathological workload instead of a larger one
    replicate("documents", Map(
      "doc_id" -> (i => col("doc_id") + lit(i * big)),
      "text" -> (i => concat(col("text"), lit(s" v"), lit(i)))))
    replicate("embeddings", Map("vec_id" -> (i => col("vec_id") + lit(i * big))))
    replicate("events", Map("event_id" -> (i => col("event_id") + lit(i * big))))
    Seq("region", "nation", "customer", "supplier", "part").foreach { t =>
      Tables.load(spark, src, t).write.mode("overwrite").parquet(s"$dst/$t.parquet")
    }

    val headline = Seq("q1_pricing_summary", "q5_local_supplier_volume", "a1_profile_lineitem",
      "d3_drift_all", "v2_generalize", "v4_synthetic", "v5_smart_suggest",
      "x_minhash_lsh", "x_corpus_clean", "s_sessionize", "q_asof_join")
    // warm at the original scale, then time both scales
    headline.foreach(n => try SparkEntry.queries(n)(spark, src).count() catch { case _: Throwable => () })
    Seq(src -> "1x", dst -> s"${copies}x").foreach { case (dir, tag) =>
      val t0 = System.nanoTime()
      headline.foreach(n => SparkEntry.queries(n)(spark, dir).count())
      println(f"[scaleup] $tag total=${(System.nanoTime() - t0) / 1e9}%.2f s over ${headline.size} queries")
    }
    spark.stop()
  }
}
