package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ext.Dedup

/** Dev-only (r15): rarity-order (dfreq join + window) vs hash-order
  * (posexplode of the sorted array, no dfreq pass) prefixes for the
  * AllPairs candidate join, BOTH with the positional filter — collision
  * volume and wall, at any sf dir. Output of either form is identical
  * (lossless prefix under any shared total order + exact verify); the
  * question is the collision count each order admits.
  * Usage: runMain graft.DevR15Order <sfDir> */
object DevR15Order {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.local(appName = "graft-devr15o")
    graft.functions.GraftFunctions.ensureRegistered(spark)
    def time[A](l: String)(f: => A): A = {
      System.gc()
      val t0 = System.nanoTime(); val r = f
      println(f"[r15order] $l%-46s ${(System.nanoTime() - t0) / 1e9}%6.2f s"); r
    }
    val docs = Tables.documents(spark, sfDir)
    Bench.materialize(docs)
    val t = 0.6
    def withShF() = docs.select(col("doc_id").as("id"),
        sort_array(Dedup.shingleHashArray(docs, "text", 3)).as("sh"))
      .filter(size(col("sh")) > 0)
    def prefixLen(sz: org.apache.spark.sql.Column) =
      (sz.cast("double") * (1.0 - t) + 1e-9).cast("int") + 1

    // hash-order prefix with rank from posexplode
    def hashPrefix() = withShF()
      .select(col("id"), size(col("sh")).as("sz"),
        posexplode(slice(col("sh"), lit(1), prefixLen(size(col("sh"))))))
      .select(col("id"), col("sz"), (col("pos") + 1).as("rk"), col("col").as("s"))

    // rarity-order prefix (current production shape)
    def rarityPrefix() = {
      val fullIdx = withShF().select(col("id"), size(col("sh")).as("sz"),
        explode(col("sh")).as("s"))
      val dfreq = fullIdx.groupBy("s").agg(count(lit(1)).as("df"))
      val wDoc = Window.partitionBy("id").orderBy("df", "s")
      fullIdx.join(broadcast(dfreq), "s")
        .withColumn("rk", row_number().over(wDoc))
        .filter(col("rk") <= prefixLen(col("sz")))
        .select(col("id"), col("sz"), col("rk"), col("s"))
    }

    def collisions(prefix: DataFrame, posFilter: Boolean): DataFrame = {
      val base = col("a.s") === col("b.s") && col("a.id") < col("b.id") &&
        col("a.sz").cast("double") >= col("b.sz") * t &&
        col("b.sz").cast("double") >= col("a.sz") * t
      val cond = if (!posFilter) base else base &&
        (lit(1) + least(col("a.sz") - col("a.rk"), col("b.sz") - col("b.rk")))
          .cast("double") >=
          (col("a.sz") + col("b.sz")).cast("double") * (t / (1.0 + t)) - 1e-9
      prefix.alias("a").join(prefix.alias("b"), cond)
        .select(col("a.id").as("ida"), col("b.id").as("idb"))
    }

    (1 to 2).foreach { round =>
      val ch = time(s"r$round hash-order collisions+pos")(
        collisions(hashPrefix(), posFilter = true).count())
      val chd = time(s"r$round hash-order distinct cand+pos")(
        collisions(hashPrefix(), posFilter = true).distinct().count())
      val cr = time(s"r$round rarity collisions+pos")(
        collisions(rarityPrefix(), posFilter = true).count())
      val crd = time(s"r$round rarity distinct cand+pos")(
        collisions(rarityPrefix(), posFilter = true).distinct().count())
      val cr0 = time(s"r$round rarity collisions no-pos")(
        collisions(rarityPrefix(), posFilter = false).count())
      println(s"[r15order] hash+pos=$ch (cand $chd)  rarity+pos=$cr (cand $crd)  rarity-no-pos=$cr0")
      // end-to-end: hash-order full pipeline (prefix → verify), vs prod
      time(s"r$round FULL hash-order pipeline") {
        val ws = withShF()
        val cand = collisions(hashPrefix(), posFilter = true).distinct()
        Bench.materialize(cand
          .join(ws.select(col("id").as("ida"), col("sh").as("sha")), "ida")
          .join(ws.select(col("id").as("idb"), col("sh").as("shb")), "idb")
          .withColumn("shared", size(array_intersect(col("sha"), col("shb"))))
          .withColumn("jaccard", col("shared").cast("double") /
            (size(col("sha")) + size(col("shb")) - col("shared")))
          .filter(col("jaccard") >= t)
          .select(col("ida"), col("idb"), col("jaccard"))
          .orderBy(col("ida"), col("idb")))
      }
      time(s"r$round FULL prod ngramJaccardPairs")(Bench.materialize(
        Dedup.ngramJaccardPairs(docs, "text", "doc_id", 3, t)))
    }
    spark.stop()
  }
}
