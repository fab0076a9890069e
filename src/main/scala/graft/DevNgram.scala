package graft

import org.apache.spark.sql.functions._
import graft.ext.Dedup

/** Dev-only: stage costs of the prefix-filtered jaccard. */
object DevNgram {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(appName = "graft-devngram")
    val df = Tables.documents(spark, args.headOption.getOrElse("/root/testdata/sf0.1"))
    def time[A](l: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[devngram] $l ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    df.count()
    (1 to 2).foreach { round =>
      val withSh = df.select(col("doc_id").as("id"),
        sort_array(Dedup.shingleHashArray(df, "text", 3)).as("sh"))
        .filter(size(col("sh")) > 0)
      time(s"r$round shingle arrays only") { withSh.count() }
      val prefLen = (size(col("sh")).cast("double") * 0.4 + 1e-9).cast("int") + 1
      val prefix = withSh.select(col("id"), size(col("sh")).as("sz"),
        explode(slice(col("sh"), lit(1), prefLen)).as("s"))
      time(s"r$round prefix explode") { prefix.count() }
      val cand = prefix.alias("a").join(prefix.alias("b"),
          col("a.s") === col("b.s") && col("a.id") < col("b.id") &&
            col("a.sz").cast("double") >= col("b.sz") * 0.6 &&
            col("b.sz").cast("double") >= col("a.sz") * 0.6)
        .select(col("a.id").as("ida"), col("b.id").as("idb")).distinct()
      val nc = time(s"r$round candidates") { cand.count() }
      println(s"[devngram] candidate pairs = $nc")
      time(s"r$round full pipeline") {
        Dedup.ngramJaccardPairs(df, "text", "doc_id", 3, 0.6).count()
      }
    }
    spark.stop()
  }
}
