package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ext.Dedup

/** Dev-only (r15): stage decomposition of the REAL ngramJaccardPairs
  * (rarity-ordered AllPairs prefix filter) at bench scale.
  * Usage: runMain graft.DevR15Ngram <sfDir> */
object DevR15Ngram {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.local(appName = "graft-devr15n")
    graft.functions.GraftFunctions.ensureRegistered(spark)
    def time[A](l: String)(f: => A): A = {
      System.gc()
      val t0 = System.nanoTime(); val r = f
      println(f"[r15ngram] $l%-44s ${(System.nanoTime() - t0) / 1e9}%6.2f s"); r
    }
    val docs = Tables.documents(spark, sfDir)
    Bench.materialize(docs)
    println(s"[r15ngram] n_docs=${docs.count()}")
    val threshold = 0.6
    def withShF() = docs.select(col("doc_id").as("id"),
        sort_array(Dedup.shingleHashArray(docs, "text", 3)).as("sh"))
      .filter(size(col("sh")) > 0)
    def fullIdxF() = withShF().select(col("id"), size(col("sh")).as("sz"),
      explode(col("sh")).as("s"))
    def prefixF(): DataFrame = {
      val fullIdx = fullIdxF()
      val dfreq = fullIdx.groupBy("s").agg(count(lit(1)).as("df"))
      val wDoc = Window.partitionBy("id").orderBy("df", "s")
      fullIdx.join(broadcast(dfreq), "s")
        .withColumn("rk", row_number().over(wDoc))
        .filter(col("rk") <=
          (col("sz").cast("double") * (1.0 - threshold) + 1e-9).cast("int") + 1)
        .select(col("id"), col("sz"), col("s"))
    }
    def candF(): DataFrame = {
      val prefix = prefixF()
      prefix.alias("a").join(prefix.alias("b"),
          col("a.s") === col("b.s") && col("a.id") < col("b.id") &&
            col("a.sz").cast("double") >= col("b.sz") * threshold &&
            col("b.sz").cast("double") >= col("a.sz") * threshold)
        .select(col("a.id").as("ida"), col("b.id").as("idb"))
        .distinct()
    }
    (1 to 2).foreach { round =>
      time(s"r$round withSh sorted")(Bench.materialize(withShF()))
      time(s"r$round fullIdx explode")(Bench.materialize(fullIdxF()))
      time(s"r$round dfreq")(Bench.materialize(
        fullIdxF().groupBy("s").agg(count(lit(1)).as("df"))))
      time(s"r$round prefix (dfreq join + window)")(Bench.materialize(prefixF()))
      val nc = time(s"r$round candidates")(Bench.materialize(candF()))
      println(s"[r15ngram] rarity candidates = $nc")
      time(s"r$round verify only (cand→join→jaccard)") {
        val full = withShF().select(col("id"), col("sh"))
        Bench.materialize(candF()
          .join(full.select(col("id").as("ida"), col("sh").as("sha")), "ida")
          .join(full.select(col("id").as("idb"), col("sh").as("shb")), "idb")
          .withColumn("shared", size(array_intersect(col("sha"), col("shb"))))
          .withColumn("jaccard", col("shared").cast("double") /
            (size(col("sha")) + size(col("shb")) - col("shared")))
          .filter(col("jaccard") >= threshold)
          .select(col("ida"), col("idb"), col("jaccard")))
      }
      val np = time(s"r$round FULL ngramJaccardPairs")(Bench.materialize(
        Dedup.ngramJaccardPairs(docs, "text", "doc_id", 3, threshold)))
      println(s"[r15ngram] verified pairs = $np")
    }
    spark.stop()
  }
}
