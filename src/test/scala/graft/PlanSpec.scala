package graft

import org.apache.spark.sql.functions._

/** Physical-plan regression guards: the scale properties the engine
  * promises (pushdown, pruning, broadcast, codegen) must be visible in
  * the executed plan, not just intended. */
class PlanSpec extends SparkSpec {

  private def formatted(name: String): String = {
    val df = SparkEntry.queries(name)(spark, Sf)
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
  }

  test("filter pushdown reaches the parquet scan (x_embed_topk query side)") {
    val plan = formatted("x_embed_topk")
    assert(plan.contains("PushedFilters: [IsNotNull(vec_id), LessThan(vec_id,10)"),
      s"expected vec_id pushdown in:\n$plan")
  }

  test("column pruning: q1 reads only the 7 needed lineitem columns") {
    val plan = formatted("q1_pricing_summary")
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("l_returnflag") && readSchema.contains("l_quantity"))
    assert(!readSchema.contains("l_shipdate") && !readSchema.contains("l_orderkey"),
      s"unneeded columns not pruned: $readSchema")
  }

  test("q5 broadcasts the tiny dimensions, never the fact side") {
    val plan = formatted("q5_local_supplier_volume")
    assert(plan.contains("BroadcastHashJoin"), "nation/region should broadcast")
  }

  test("whole-stage codegen covers the v2 label pass") {
    val edges = (0 to 10).map(_ * 10000.0)
    val labeled = Tables.lineitem(spark, Sf)
      .withColumn("l_extendedprice",
        graft.ops.Privacy.labelExpr(col("l_extendedprice"), edges))
      .select(col("l_orderkey"), col("l_extendedprice"))
    // "*(n)" prefixes mark operators inside a WholeStageCodegen stage
    val plan = labeled.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), s"label pass fell out of codegen:\n$plan")
  }

  test("vec_dot participates in whole-stage codegen (no CodegenFallback)") {
    val e = Tables.embeddings(spark, Sf)
    val df = e.select(call_function("vec_dot", col("embedding"), col("embedding")).as("n2"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [vec_dot"), s"vec_dot not codegen'd:\n$plan")
  }

  test("empirical_sample participates in whole-stage codegen (v4 is UDF-free)") {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val df = spark.range(100).select(
      call_function("empirical_sample",
        rand(1), typedlit(Array(1.0, 2.0, 3.0)), typedlit(Array(0.3, 0.6, 1.0))).as("x"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), s"empirical_sample fell out of codegen:\n$plan")
    // the synthesizer's generation plan must contain no ScalaUDF anywhere
    val v4 = graft.ops.Privacy.syntheticSample(
      Tables.lineitem(spark, Sf), Seq("l_quantity", "l_returnflag"), n = 100)
    assert(!v4.queryExecution.executedPlan.toString.contains("ScalaUDF"),
      "v4 generation should be UDF-free")
  }

  test("D1 KS cumulative window is range-partitioned, never a single task") {
    import org.apache.spark.sql.execution.window.WindowExec
    val li = Tables.lineitem(spark, Sf)
    val counts = graft.ops.Drift.ksCountsFrame(
      li.select(col("l_extendedprice")), li.select(col("l_extendedprice")),
      Seq("l_extendedprice"))
    val df = graft.ops.Drift.ksFromCounts(counts, buckets = 32, roundTo = None)
    val bigSingleTaskWindows = physicalPlan(df).collect {
      // every Window in the CDF plan must carry a partition spec — the
      // tiny offsets frame partitions by ci, the cumulative pass by
      // (bucket, ci); an empty spec would serialize |distinct| rows
      // through one task
      case w: WindowExec if w.partitionSpec.isEmpty => w
    }
    assert(bigSingleTaskWindows.isEmpty,
      s"unpartitioned window over the distinct-values frame:\n${df.queryExecution.executedPlan}")
  }

  test("catalog-wide sweep: no CartesianProduct in any of the 192 query plans") {
    // CartesianProductExec is the non-broadcast cross join — the one
    // join shape that is NEVER right at 100 TB (a broadcast cross of a
    // 1-row fit frame plans as BroadcastNestedLoopJoin and is fine).
    // Allowlist = the documented bounded exceptions; anything new that
    // plans a cartesian fails here before it can ship.
    val allow: Set[String] = Set(
      // V6 exact linkage: the guarded small-N cross join (dispatch sends
      // big inputs to the LSH path; `Linkage.scala` documents the ceiling)
      "v6_linkage_risk",
      // bounded-id brute-force near-dup: documented O(subset²) tool
      "x_embed_neardup")
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try {
          val plan = fn(spark, Sf).queryExecution.executedPlan.toString
          if (plan.contains("CartesianProduct") && !allow(name)) Some(name)
          else None
        } catch {
          case e: Throwable => Some(s"$name [plan construction failed: ${e.getMessage}]")
        }
    }
    assert(offenders.isEmpty,
      s"cartesian products (or plan failures) in: ${offenders.mkString("; ")}")
  }

  test("contamination broadcasts the probe index; the corpus never self-joins") {
    val plan = formatted("x_contamination")
    assert(plan.contains("BroadcastHashJoin"),
      s"probe index should broadcast-join the corpus scan:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"no shuffle join should appear in the containment plan:\n$plan")
  }

  test("sdcSuppressBroadcast never shuffles the fact table") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val df = graft.ops.Privacy.sdcSuppressBroadcast(
      Tables.supplier(spark, Sf).select(col("s_suppkey"), col("s_name")), Seq("s_name"), 5)
    val shuffles = physicalPlan(df).collect {
      case s: ShuffleExchangeExec => s
    }
    // the only exchange feeds the tiny rare-set aggregate, never the fact scan
    assert(shuffles.size <= 1, s"unexpected shuffles: ${shuffles.size}")
  }

  test("mix rebalance broadcasts the group counts; the corpus never sort-merge-joins") {
    val plan = formatted("x_mix_rebalance")
    assert(plan.contains("BroadcastHashJoin"),
      s"group-count table should broadcast onto the corpus scan:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"rebalance must not shuffle the corpus:\n$plan")
  }

  test("keyword search runs as partial top-k, not a global sort") {
    val plan = formatted("x_keyword_search")
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k should be per-partition partial + k-row merge:\n$plan")
  }

  test("bloom contamination broadcasts the bit set; the corpus never sort-merge-joins") {
    val plan = formatted("x_bloom_contamination")
    assert(plan.contains("BroadcastHashJoin"),
      s"probe bitmap should broadcast onto the corpus scan:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"the corpus must not shuffle for the bloom probe:\n$plan")
  }

  private def simplePlan(name: String): String =
    SparkEntry.queries(name)(spark, Sf)
      .queryExecution.executedPlan.toString

  test("window suite shares ONE partitioned sort across all seven functions") {
    val plan = simplePlan("q_window_suite")
    val hashExchanges = plan.linesIterator
      .count(_.contains("Exchange hashpartitioning"))
    assert(hashExchanges == 1,
      s"lag/lead/rank/ntile/... must share one window exchange, got $hashExchanges:\n$plan")
    assert(plan.linesIterator.count(_.trim.startsWith("+- Window")) +
      plan.linesIterator.count(_.trim.startsWith("Window")) >= 1)
  }

  test("passage dedup combines first-occurrences map-side; no skewable window") {
    val plan = simplePlan("x_passage_dedup")
    // a hot passage must partial-aggregate per map partition, not funnel
    // through one task of a ptext-partitioned window
    assert(!plan.contains("Window"),
      s"first-occurrence must be an aggregate, not a window:\n$plan")
    assert(plan.contains("partial_min"),
      s"expected map-side-combinable min(struct) on the passage key:\n$plan")
  }

  test("embed top-k reduces candidates map-side, never a per-query window") {
    val plan = simplePlan("x_embed_topk")
    assert(!plan.contains("Window"),
      s"top-k must be a bounded aggregate, not a qid window:\n$plan")
    // partial + final ObjectHashAggregate pair = map-side combine of the
    // TopKByScore buffers before the qid shuffle
    val objAggs = plan.linesIterator.count(_.contains("ObjectHashAggregate"))
    assert(objAggs >= 2, s"expected partial+final TopKByScore pair:\n$plan")
  }

  test("per-source cap is a partial-combining bounded aggregate, not a window sort") {
    val plan = formatted("x_source_cap")
    assert(!plan.contains("Window"),
      s"cap must not sort the full table through a window exchange:\n$plan")
    assert(plan.contains("ObjectHashAggregate"),
      s"expected the typed MinKIds aggregate:\n$plan")
    // partial aggregation before the exchange = map-side combine is on
    val objAggs = plan.linesIterator.count(_.contains("ObjectHashAggregate"))
    assert(objAggs >= 2, s"expected partial+final aggregate pair:\n$plan")
  }

  test("vocab top-k is a partial top-k over a map-side-combined count, not a global sort") {
    val plan = simplePlan("x_vocab_topk")
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k must merge per-partition heaps, not globally sort the vocabulary:\n$plan")
    assert(plan.contains("partial_count"),
      s"token counts must combine map-side before the vocab shuffle:\n$plan")
  }

  test("snapshot diff is exactly one id-keyed join, no extra shuffles") {
    val plan = simplePlan("x_snapshot_diff")
    val joins = plan.linesIterator.count(l =>
      l.contains("SortMergeJoin") || l.contains("ShuffledHashJoin"))
    assert(joins == 1, s"diff must be ONE full-outer id join, got $joins:\n$plan")
    assert(plan.contains("FullOuter"), s"expected a full-outer join:\n$plan")
  }

  test("embed centroids partial-combine before the (label, dim) shuffle; no window") {
    val plan = simplePlan("x_embed_centroid")
    assert(!plan.contains("Window"),
      s"centroid means must not serialize through a window:\n$plan")
    assert(plan.contains("partial_sum"),
      s"decimal sums must combine map-side:\n$plan")
  }

  test("PSI bins shuffle bounded bin counts, never the data rows") {
    // the public forms collect the driver-sized result, so assert on the
    // distributed (ci, psi) frame they execute
    val li = Tables.lineitem(spark, Sf)
    val plan = graft.ops.Drift.psiFrame(
      li.filter(col("l_orderkey") % 2 === 0),
      li.filter(col("l_orderkey") % 2 === 1),
      Seq("l_quantity", "l_extendedprice"), 10, 1e-6, 6)
      .queryExecution.executedPlan.toString
    // both sides must aggregate on the literal bin chain BEFORE any
    // exchange — the only post-scan shuffles carry ≤ Σ(bins+1) rows
    assert(plan.contains("partial_count"),
      s"bin counts must combine map-side inside the scan stage:\n$plan")
    // the term-sum window must be partitioned by ci (parallel per column)
    assert(!plan.contains("Exchange SinglePartition, "),
      s"no data-path stage may collapse to a single partition:\n$plan")
  }

  test("bpe pairs: map-side-combined pair counts, partial top-k, no window") {
    val plan = simplePlan("x_bpe_pairs")
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k must merge per-partition heaps:\n$plan")
    assert(plan.contains("partial_count"),
      s"pair counts must combine map-side before the shuffle:\n$plan")
    assert(!plan.contains("Window"), s"no window in the pair path:\n$plan")
  }

  test("semdedup joins on the bucket code — never an unbucketed self cross join") {
    val plan = simplePlan("x_semdedup")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"pair generation must be an equi-join on the bucket:\n$plan")
  }

  test("per-source best-k is a partial-combining bounded aggregate, not a window sort") {
    val plan = simplePlan("x_source_best")
    assert(!plan.contains("Window"),
      s"best-k must not sort whole domains through a window exchange:\n$plan")
    val objAggs = plan.linesIterator.count(_.contains("ObjectHashAggregate"))
    assert(objAggs >= 2, s"expected partial+final TopKByScore pair:\n$plan")
  }

  test("shard assign is one map-side-combined aggregate, no window, no join") {
    val plan = simplePlan("x_shard_assign")
    assert(plan.contains("partial_count"),
      s"shard stats must combine map-side:\n$plan")
    assert(!plan.contains("Window") && !plan.contains("Join"),
      s"shard assignment is a pure projection + aggregate:\n$plan")
  }

  test("winsorize transform folds or broadcasts the tiny fit, never shuffles data") {
    val plan = simplePlan("p_winsorize")
    // two acceptable shapes: the driver-fit path literal-folds the clip
    // bounds into the projection (no join at all — `least(greatest(c, lo),
    // hi)` over the scan), the distributed path broadcasts the 1-row fit
    val literalFolded = !plan.contains("Join") &&
      plan.contains("least(greatest(")
    val broadcastFit = plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastHashJoin")
    assert(literalFolded || broadcastFit,
      s"the fit must fold to literals or broadcast onto the scan:\n$plan")
    // either way the DATA side must not shuffle before the clip projection
    assert(!plan.contains("Exchange hashpartitioning"),
      s"winsorize must not hash-shuffle the data side:\n$plan")
  }

  test("approx profile spreads its sketch aggregate past a narrow scan") {
    val plan = simplePlan("a1_profile_approx")
    // behind a few-split scan the per-row HLL/quantile updates would run
    // 1-core; Par.widen must interpose a round-robin exchange (it no-ops
    // once the scan has real splits, so this guards the narrow case only)
    assert(plan.contains("RoundRobinPartitioning") ||
      !plan.contains("ObjectHashAggregate"),
      s"narrow scan must widen before the sketch aggregate:\n$plan")
  }

  test("delta near-dup indexes only the sorted-prefix slice of each doc") {
    val plan = simplePlan("x_neardup_delta")
    assert(plan.contains("slice("),
      s"candidate generation must explode the AllPairs prefix, not every shingle:\n$plan")
  }

  test("leakage-safe split broadcasts the representative map onto one scan") {
    val plan = simplePlan("x_leakage_split")
    assert(plan.contains("BroadcastHashJoin"),
      s"the small rep map must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"no corpus-sized shuffle join in the split path:\n$plan")
  }

  test("mutual info windows run over the grouped cell frame, post-aggregate") {
    val plan = simplePlan("a_mutual_info")
    // the count aggregate must partial-combine BEFORE any window sees rows
    assert(plan.contains("partial_count"),
      s"cell counts must combine map-side:\n$plan")
  }

  test("bigram logprob: equi-joins only, per-doc windows partition by doc") {
    val plan = simplePlan("t_bigram_logprob")
    assert(!plan.contains("CartesianProduct"),
      s"count-table joins must be keyed:\n$plan")
    // the only single-partition exchange allowed is the 1-row V fit; the
    // term-sum window itself must partition by doc_id
    assert(plan.contains("windowspecdefinition(doc_id"),
      s"per-doc windows must partition by doc_id:\n$plan")
  }

  test("bigram logprob: term table broadcasts below the row bound, shuffles above") {
    val docs = Tables.documents(spark, Sf)
    val small = graft.ext.TextStats.bigramLogProb(docs, "text", "doc_id")
      .queryExecution.executedPlan.toString
    // below the bound the single pre-combined (a, b) → term table rides a
    // broadcast — the pair frame never shuffles on its token keys
    assert(small.contains("BroadcastHashJoin"),
      s"term table should broadcast on a small vocab:\n$small")
    assert(!small.contains("SortMergeJoin"),
      s"no token-keyed shuffle join expected below the bound:\n$small")
    // past the bound the scoring join falls back to a shuffle (vocab
    // grows with the corpus) — still equi-keyed, never nested-loop.
    // Auto-broadcast is disabled here to emulate the large-corpus size
    // estimates that make Catalyst choose shuffle joins on its own.
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val large = graft.ext.TextStats.bigramLogProb(docs, "text", "doc_id",
          maxBroadcastTermRows = 0L)
        .queryExecution.executedPlan.toString
      assert(large.contains("SortMergeJoin") || large.contains("ShuffledHashJoin"),
        s"forced-zero bound should shuffle the scoring join:\n$large")
      assert(!large.contains("CartesianProduct"), s"joins must stay keyed:\n$large")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("minhash delta: candidates come from a banded equi-join, never cross") {
    val plan = simplePlan("x_minhash_delta")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"band collision join must be equi-keyed:\n$plan")
    assert(plan.contains("partial_count") || plan.contains("ObjectHashAggregate") ||
      plan.contains("HashAggregate"), s"expected aggregates in:\n$plan")
  }

  test("nearest event: equi-join on user with residual band, min-struct winner") {
    val plan = simplePlan("q_nearest_event")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"pair space must be an equi-join on user:\n$plan")
    assert(!plan.contains("Window"),
      s"per-click winner must be an aggregate, not a rank window:\n$plan")
  }

  test("funnel: the chained windows share ONE user sort") {
    val plan = simplePlan("s_funnel")
    val sorts = plan.linesIterator.count(l =>
      l.trim.startsWith("Sort ") || l.contains("*Sort "))
    val exchanges = plan.linesIterator.count(_.contains("Exchange hashpartitioning(user_id"))
    assert(exchanges <= 1, s"chained q windows must reuse one user shuffle:\n$plan")
    assert(sorts <= 2, s"chained q windows must share the (user, ts) sort " +
      s"(one in-exchange sort + at most the final output order), saw $sorts:\n$plan")
  }

  test("bm25: one broadcast stats row, partial top-k, no corpus shuffle") {
    val plan = simplePlan("x_bm25_search")
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k must be partial per-partition + k-row merge:\n$plan")
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastHashJoin"),
      s"the 1-row corpus-stats aggregate must broadcast:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning"),
      s"nothing corpus-sized may shuffle in bm25:\n$plan")
    assert(plan.contains("partial_count"),
      s"corpus stats must combine map-side:\n$plan")
  }

  test("zorder stats: broadcast extremes, map-side slice combine") {
    val plan = simplePlan("x_zorder_stats")
    assert(plan.contains("partial_min") && plan.contains("partial_count"),
      s"slice rollup must partial-combine before the exchange:\n$plan")
    val hashEx = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(hashEx == 1, s"one slice-keyed exchange only, saw $hashEx:\n$plan")
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastHashJoin"),
      s"key extremes must broadcast onto the scan:\n$plan")
  }

  test("capped minhash: cap filter rides the (band,bsig) key, no cross join") {
    val plan = simplePlan("x_minhash_capped")
    assert(!plan.contains("CartesianProduct"),
      s"bucket joins must stay keyed:\n$plan")
    val bandEx = plan.linesIterator.count(_.contains("Exchange hashpartitioning(band"))
    assert(bandEx <= 2, s"the cap adds at most ONE extra (band,bsig) exchange " +
      s"of the banded frame, saw $bandEx:\n$plan")
  }
}
