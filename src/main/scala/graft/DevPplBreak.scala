package graft

import org.apache.spark.sql.functions._

/** Dev-only: A/B decomposition of x_ppl_buckets' LM pipeline at a given
  * fixture dir — which term owns the x64 wall. Components:
  *   lm_pairs     explode-only pair frame count (scan + regexp cost)
  *   lm_counts    unigram + bigram count tables (vocab-sized aggregates)
  *   lm_full      bigramLogProb materialized (joins + window + sort)
  *   q_full       the whole catalog query (fit + bucket + output sort)
  * Plus the dispatch facts: input plan-stats bytes vs the broadcast
  * ceiling, doc count vs the driver-fit ceiling, and the vocab sizes.
  * Usage: runMain graft.DevPplBreak <dir> [reps]
  */
object DevPplBreak {
  def main(args: Array[String]): Unit = {
    val dir = args.head
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = Sessions.local(appName = "graft-devppl")
    import graft.ext.{Dedup, TextStats}

    val docs = Tables.documents(spark, dir)
    // context only — the r12 dispatch read this proxy; the live dispatch
    // (below) reads the materialized term-table row count
    val statsBytes = docs.queryExecution.optimizedPlan.stats.sizeInBytes
    println(s"[pplbreak] dir=$dir inputBytes=$statsBytes " +
      s"(legacy context; dfreq ceiling=${Dedup.DfreqBroadcastMaxInputBytes})")
    val nDocs = docs.count()
    println(s"[pplbreak] nDocs=$nDocs driverFitMaxRows=${graft.ops.Exact.DriverFitMaxRows}")

    val toks = regexp_extract_all(lower(col("text")), lit(TextStats.BpeTokenPattern), lit(0))
    val base = docs.select(col("doc_id"), toks.as("ts"))
    val pairs = base.filter(size(col("ts")) >= 2)
      .select(col("doc_id"), explode(transform(sequence(lit(1), size(col("ts")) - 1),
        i => struct(i.as("pos"), element_at(col("ts"), i).as("a"),
          element_at(col("ts"), i + 1).as("b")))).as("p"))
      .select(col("doc_id"), col("p.pos").as("pos"), col("p.a").as("a"), col("p.b").as("b"))
    val uni = base.select(explode(col("ts")).as("a")).groupBy("a").agg(count(lit(1)).as("ca"))
    val bi = pairs.groupBy("a", "b").agg(count(lit(1)).as("cab"))

    def t(label: String)(fn: => Long): Unit = {
      (0 until reps).foreach { r =>
        System.gc()
        val t0 = System.nanoTime()
        val n = fn
        println(f"[pplbreak] $label rep$r n=$n ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }

    t("lm_pairs") { pairs.select(count(lit(1))).head().getLong(0) }
    t("lm_counts") {
      uni.select(count(lit(1))).head().getLong(0) +
        bi.select(count(lit(1))).head().getLong(0)
    }
    // the LIVE broadcast dispatch: bigramLogProb materializes the
    // pre-combined (a, b) → term table and broadcasts on its TRUE row
    // count vs BigramBroadcastMaxTermRows (r13 fix); the bigram count
    // below IS that table's cardinality
    val biCount = bi.count()
    println(s"[pplbreak] vocab uni=${uni.count()} bi=$biCount — live dispatch: " +
      s"termRows=$biCount vs BigramBroadcastMaxTermRows=${TextStats.BigramBroadcastMaxTermRows} " +
      s"→ ${if (biCount <= TextStats.BigramBroadcastMaxTermRows) "broadcast" else "shuffle"}")
    t("lm_full") { Bench.materialize(TextStats.bigramLogProb(docs, "text", "doc_id")) }
    t("q_full") { Bench.materialize(SparkEntry.queries("x_ppl_buckets")(spark, dir)) }
    spark.stop()
  }
}
