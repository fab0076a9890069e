package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ext.Dedup

/** Dev-only (r15 optimization round): stage decomposition of the banded
  * minhash pairs pipeline at bench scale — where do ~2.5 s/query go on a
  * 584 KB corpus, and how much of it is the SAME subtree re-executed
  * (banded self-join sides, verify joins re-deriving shingle arrays from
  * text)? Also prototypes the materialize-once variant so the win is
  * measured before the operator changes.
  * Usage: runMain graft.DevR15Probe <sfDir> */
object DevR15Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.local(appName = "graft-devr15")
    graft.functions.GraftFunctions.ensureRegistered(spark)
    def time[A](l: String)(f: => A): A = {
      System.gc()
      val t0 = System.nanoTime(); val r = f
      println(f"[r15probe] $l%-42s ${(System.nanoTime() - t0) / 1e9}%6.2f s"); r
    }
    val docs = Tables.documents(spark, sfDir)
    Bench.materialize(docs)
    val (numPerms, bands) = (48, 16) // bandingFor(0.6)
    val r = numPerms / bands

    def withShF() = docs
      .select(col("doc_id").as("id"),
        call_function("shingle_hashes", col("text"), lit(3)).as("sh"))
      .filter(size(col("sh")) > 0)
    def bandedF(src: DataFrame) = src
      .withColumn("sig", call_function("minhash_sig", col("sh"), lit(numPerms)))
      .select(col("id"), explode(array((0 until bands).map { j =>
        struct(lit(j).as("band"),
          concat_ws("-", transform(slice(col("sig"), j * r + 1, r),
            x => x.cast("string"))).as("bsig"))
      }: _*)).as("bs"))
      .select(col("id"), col("bs.band"), col("bs.bsig"))

    (1 to 2).foreach { round =>
      time(s"r$round scan only")(Bench.materialize(docs.select("doc_id", "text")))
      time(s"r$round shingle arrays")(Bench.materialize(withShF()))
      time(s"r$round shingle+sig")(Bench.materialize(
        withShF().withColumn("sig", call_function("minhash_sig", col("sh"), lit(numPerms)))
          .select("id", "sig")))
      time(s"r$round banded frame")(Bench.materialize(bandedF(withShF())))
      val banded = bandedF(withShF())
      val cand = banded.alias("a").join(banded.alias("b"),
          col("a.band") === col("b.band") && col("a.bsig") === col("b.bsig") &&
            col("a.id") < col("b.id"))
        .select(col("a.id").as("ida"), col("b.id").as("idb")).distinct()
      time(s"r$round candidates")(Bench.materialize(cand))
      time(s"r$round full minhashLshPairs")(Bench.materialize(
        Dedup.minhashLshPairs(docs, "text", "doc_id", 3, numPerms, bands, 0.6)))
      time(s"r$round full nearDupPairsAuto")(Bench.materialize(
        Dedup.nearDupPairsAuto(docs, "text", "doc_id", 3, 0.6)))
      // prototype: shingle table materialized once (localCheckpoint),
      // banding + both verify joins read the checkpoint
      time(s"r$round PROTO pairs, withSh checkpointed") {
        val ws = withShF().localCheckpoint()
        val banded2 = bandedF(ws)
        val cand2 = banded2.alias("a").join(banded2.alias("b"),
            col("a.band") === col("b.band") && col("a.bsig") === col("b.bsig") &&
              col("a.id") < col("b.id"))
          .select(col("a.id").as("ida"), col("b.id").as("idb")).distinct()
        val out = cand2
          .join(ws.select(col("id").as("ida"), col("sh").as("sha")), "ida")
          .join(ws.select(col("id").as("idb"), col("sh").as("shb")), "idb")
          .withColumn("shared", size(array_intersect(col("sha"), col("shb"))))
          .withColumn("jaccard", col("shared").cast("double") /
            (size(col("sha")) + size(col("shb")) - col("shared")))
          .filter(col("jaccard") >= 0.6)
          .select(col("ida"), col("idb"), col("jaccard"))
          .orderBy(col("ida"), col("idb"))
        Bench.materialize(out)
      }
      // cluster tail: persist+count+collect machinery on top of pairs
      time(s"r$round clustersAuto on pairs")(Bench.materialize(
        Dedup.dedupClustersAuto(
          Dedup.nearDupPairsAuto(docs, "text", "doc_id", 3, 0.6))))
    }
    spark.stop()
  }
}
