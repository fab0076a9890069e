package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale-up fixture: materialize an N× copy of an sf directory by
  * key-offset unions, so scaling CURVATURE (not just absolute time) is
  * measurable — a plan that is accidentally quadratic or single-task
  * shows a >N× total. Texts get a per-copy suffix token so the dedup
  * family sees a larger corpus, not `copies−1` byte-identical clones of
  * every document (which would measure a pathological workload). */
object ScaleUp {

  /** Queries timed at both scales: the most expensive §2 rows plus one
    * representative per family (join, dedup, text, stream-batch, ANN). */
  val Headline: Seq[String] = Seq(
    "q1_pricing_summary", "q5_local_supplier_volume", "a1_profile_lineitem",
    "d1_ks_statistic", "d3_drift_all", "v2_generalize", "v4_synthetic",
    "v5_smart_suggest", "x_minhash_lsh", "x_ngram_jaccard", "x_corpus_clean",
    "s_sessionize", "q_asof_join",
    // r4 additions: curvature of the new drift/audit/sketch paths
    "d_psi", "x_vocab_topk", "x_snapshot_diff", "x_embed_centroid",
    "x_distinct_sketch", "q_salted_agg",
    // late-r4: the moment matrix, fused drift, pair counting, funnel
    "a_corr_matrix", "d_drift_extended", "x_bpe_pairs", "s_funnel",
    // r5: cluster-consuming split (exercises the detector auto-dispatch
    // at N×) and the prefix-filtered bipartite delta
    "x_leakage_split", "x_neardup_delta",
    // r7: the restored events pipeline — the band-join's candidate growth
    // is the untested scale risk now that the NTZ regression is fixed —
    // plus the dispatch-closed near-dup delta (banded side engages at Nx)
    "q_nearest_event", "s_attribution", "x_neardup_delta_auto",
    // late-r7: the two new ops with a join/fit in the plan (the pure-scan
    // gopher/spectrum ops have no curvature risk worth a slot)
    "x_source_overlap", "x_ppl_buckets",
    // r7 relational widening: the agg-before-join survivor shape (q18)
    // and the events×dimension enrichment join — both join-shaped, so
    // their curvature belongs in the record; q10/q14/q19 share q5's
    // already-measured broadcast-join shape
    "q18_large_orders", "q_enrich_events",
    // late-r7: the 6-way join (deepest in the catalog) — two fact-side
    // shuffle joins + two aliased dimension broadcasts in one plan
    "q7_volume_shipping",
    // late-r7 curation ops with a domain-keyed join in the plan: novelty
    // joins the shingle-dfreq domain back to docs; the card joins the
    // normalized-text domain — both must stay key-domain-sized at N×
    "x_doc_novelty", "x_source_card",
    // r8: the capped-banding dispatch — at Nx the bucket cap engages, so
    // its curvature (vs the pinned raw x_minhash_lsh) is the record that
    // the skew guard actually bounds the mega-bucket fan-out — and the
    // whole-corpus pair-source dispatch (exact below the ceiling, banded
    // above), the twin record for the raw x_ngram_jaccard tail
    "x_minhash_lsh_auto", "x_neardup_auto",
    // r10: the cluster dispatch forced onto its distributed branch — the
    // label-propagation rounds' curvature (one join + min-agg per round,
    // rounds bounded by component diameter) is the at-scale record for
    // the above-ceiling regime every cluster consumer rides past 2²⁴
    // edges; first measured ratio becomes the recorded ceiling
    "x_dedup_clusters_auto_dist",
    // r12: the vector-grouped V6 LSH — the r12 x16 correctness sweep
    // measured the UN-grouped form at 28 min in one bucket-join stage
    // (low-cardinality quasi tuples defeat bucket selectivity), so its
    // curvature now rides the gate; first measured ratio is the record
    "v6_linkage_risk_lsh")

  /** Per-query (base wall, x16 wall) RECORD in seconds — the measured
    * scaling evidence each headline plan actually has. [[ceilingFor]]
    * derives the regression GATE from it. A breach fails DevScaleUp
    * loudly, the way a correctness regression already fails Verify.
    * Ratio rows above 8 are the deliberately-raw exact tools kept beside
    * their dispatched twins (their quadratic candidate growth is the
    * documented record, not a defect).
    *
    * PROVENANCE: every pair below is the r14 definitive pin run —
    * `SCALE_r14_repin_source.json`, r14's first full min-of-2 pass on
    * its final tree (the confirmation re-run against these pins is
    * `SCALE_r14.json`). The r8/r12/r13 ratio pins had drifted 0.5×–1.6×
    * in BOTH directions after six rounds of base-side improvements;
    * re-pinning the whole set to one named artifact restored gate
    * sensitivity and made record↔artifact provenance auditable. */
  val RecordedWalls: Map[String, (Double, Double)] = Map(
    "q1_pricing_summary" -> (1.46, 1.90), "q5_local_supplier_volume" -> (0.46, 0.96),
    "a1_profile_lineitem" -> (1.40, 8.25), "d1_ks_statistic" -> (0.25, 1.19),
    // d3/d_drift_extended re-pinned r16 (SCALE_r16_repin_source.json,
    // min-of-2 x16 gate run on the r16 tree): the driver-twin tails cut
    // the BASE walls ~2x, which inflated the measured ratio past the r14
    // ratio ceiling with NO x16-wall regression (d3 x16 10.06 -> 9.82 s
    // vs the r15 gate run; dx 4.79 -> 5.38, within one-run noise on the
    // byte-identical above-ceiling plan path). Same move as the r14
    // whole-set re-pin: base-side improvements stale the ratio records.
    "d3_drift_all" -> (0.88, 9.82), "v2_generalize" -> (0.25, 1.49),
    "v4_synthetic" -> (0.18, 3.32), "v5_smart_suggest" -> (0.06, 0.42),
    "x_minhash_lsh" -> (0.66, 3.24), "x_ngram_jaccard" -> (2.55, 23.58),
    "x_corpus_clean" -> (0.54, 1.38), "s_sessionize" -> (0.52, 1.03),
    "q_asof_join" -> (0.44, 1.12), "d_psi" -> (0.52, 0.81),
    "x_vocab_topk" -> (0.17, 0.99), "x_snapshot_diff" -> (0.21, 0.91),
    "x_embed_centroid" -> (0.29, 0.74), "x_distinct_sketch" -> (0.18, 0.42),
    "q_salted_agg" -> (0.37, 0.63), "a_corr_matrix" -> (2.20, 9.12),
    "d_drift_extended" -> (0.95, 5.38), "x_bpe_pairs" -> (0.33, 1.69),
    "s_funnel" -> (0.36, 0.76), "x_leakage_split" -> (2.88, 5.07),
    "x_neardup_delta" -> (2.75, 10.35), "q_nearest_event" -> (0.30, 1.00),
    "s_attribution" -> (0.30, 0.88), "x_neardup_delta_auto" -> (2.78, 2.59),
    "x_source_overlap" -> (0.91, 1.53), "x_ppl_buckets" -> (0.59, 2.03),
    "q18_large_orders" -> (0.75, 1.11), "q_enrich_events" -> (0.23, 0.23),
    "q7_volume_shipping" -> (0.48, 1.75), "x_doc_novelty" -> (0.45, 1.83),
    "x_source_card" -> (0.49, 1.01), "x_minhash_lsh_auto" -> (0.73, 2.63),
    "x_neardup_auto" -> (2.48, 5.08), "x_dedup_clusters_auto_dist" -> (4.08, 7.43),
    "v6_linkage_risk_lsh" -> (1.04, 1.78))

  val CeilingSlack = 2.0
  val CeilingFloor = 4.0         // ratio-rule floor (sub-2× ratios are job-floor constant)
  val WallRuleBaseCutoffSec = 1.0
  val WallCeilingFloorSec = 2.0  // wall-rule floor: sub-2 s x16 walls are scheduler noise

  /** The gate rule per headline row (r15, the r14 verdict/envelope ask):
    * a row whose RECORDED base wall is under [[WallRuleBaseCutoffSec]]
    * gates on its x16 WALL (recorded x16 wall × slack, floored at
    * [[WallCeilingFloorSec]]) — a ratio against a 0.06–0.9 s base
    * measures base-side speedups, not scaling (three rounds of base
    * improvements inflated a1's ratio record 5.87→8.89 at a FLAT x16
    * wall, and forced the v4/v5 18.12/7.25 re-pins for the same
    * mechanical reason). Rows with a ≥1 s base keep the ratio rule
    * (recorded ratio × slack, floored at [[CeilingFloor]]): there the
    * ratio is genuine curvature signal and survives base drift.
    * Returns (kind, ceiling) with kind ∈ {"wall","ratio"}. */
  def ceilingFor(q: String): Option[(String, Double)] =
    RecordedWalls.get(q).map { case (base, x16) =>
      if (base < WallRuleBaseCutoffSec)
        ("wall", math.max(x16 * CeilingSlack, WallCeilingFloorSec))
      else
        ("ratio", math.max((x16 / base) * CeilingSlack, CeilingFloor))
    }

  /** One-line statement of the active rule, recorded verbatim in the
    * gate artifact's `ceiling_rule` so a reader can audit ceilings
    * without the source. */
  val CeilingRule: String =
    s"base < ${WallRuleBaseCutoffSec}s (recorded): x16 WALL ceiling = recorded x16 wall x $CeilingSlack, floor ${WallCeilingFloorSec}s; " +
      s"else RATIO ceiling = recorded ratio x $CeilingSlack, floor $CeilingFloor; records = SCALE_r14_repin_source.json; breach = nonzero exit"

  /** Materialize (or reuse) the N× directory; returns its path. A marker
    * file keyed on (src, copies) makes repeated bench runs reuse the
    * fixture instead of rewriting ~4× the data each round. */
  def ensure(spark: SparkSession, src: String, copies: Int): String = {
    val dst = s"/tmp/graft_scaleup_x$copies"
    val marker = java.nio.file.Paths.get(s"$dst/_DONE")
    val key = s"$src x$copies docmark-v5" // bump on fixture-shape changes
    if (java.nio.file.Files.exists(marker) &&
        new String(java.nio.file.Files.readAllBytes(marker)) == key)
      return dst

    def replicate(name: String, offsets: Map[String, Long => org.apache.spark.sql.Column]): Unit = {
      val base = Tables.load(spark, src, name)
      val parts = (0 until copies).map { i =>
        offsets.foldLeft(base) { case (df, (c, f)) => df.withColumn(c, f(i.toLong)) }
      }
      parts.reduce(_ union _).write.mode("overwrite").parquet(s"$dst/$name.parquet")
    }
    val big = 100000000L
    // per-copy CENT offsets on the money columns: clones otherwise repeat
    // the value domain `copies`-fold, so the domain-shuffling paths
    // (cents-histogram quantiles, distinct counts) measured a domain 64×
    // SMALLER than a real corpus of that size would carry
    // the cent offset is added in DECIMAL space and cast back: a double
    // `+ i/100.0` is INEXACT (0.15 has no double), breaking the
    // ≤2-decimal round-trip that keeps these columns on the scale-safe
    // cents-histogram quantile path — the first x16 run measured a1 at
    // 120 s in the percentile-buffer fallback before this was fixed
    def centOffset(c: String, i: Long) =
      (col(c).cast(org.apache.spark.sql.types.DecimalType(18, 2)) +
        lit(new java.math.BigDecimal(java.math.BigInteger.valueOf(i), 2)))
        .cast("double")
    replicate("lineitem", Map(
      "l_orderkey" -> (i => col("l_orderkey") + lit(i * big)),
      "l_extendedprice" -> (i => centOffset("l_extendedprice", i))))
    replicate("orders", Map(
      "o_orderkey" -> (i => col("o_orderkey") + lit(i * big)),
      "o_totalprice" -> (i => centOffset("o_totalprice", i))))
    // docmark-v5 (r11): SEEDED TOKEN MUTATION, not a marker insert. Every
    // copy i replaces the tokens at positions ≡ i (mod 3) with a
    // copy-unique token ("z{i}z"). Any window of 3 consecutive positions
    // contains a mutated position of EVERY residue class, and two
    // distinct copies either mutate different positions (different
    // class) or the same positions with different tokens (same class) —
    // so two copies of the same document share ZERO 3-gram shingles, and
    // the shingle-bucketed candidate generation of the raw dedup tools
    // (ngram_jaccard / minhash_lsh / neardup_delta) scales ~copies×
    // instead of copies² (the v3 marker fixture still shared ~2/3 of its
    // shingles across copies → 64² candidate fan-out → the r10 x64 OOM
    // skips). Near-dup pairs WITHIN a copy survive: both members get the
    // same position-keyed substitutions. Exact dedup is still defeated
    // (texts differ per copy), and the mutated token's weak hash is
    // unique per copy (first-3-chars 'z'+digits + length disambiguate
    // all i ≤ 999).
    replicate("documents", Map(
      "doc_id" -> (i => col("doc_id") + lit(i * big)),
      "text" -> (i => concat_ws(" ",
        transform(split(col("text"), " "),
          (t, p) => when(pmod(p, lit(3)) === lit((i % 3).toInt), lit(s"z${i}z"))
            .otherwise(t))))))
    replicate("embeddings", Map("vec_id" -> (i => col("vec_id") + lit(i * big))))
    // user_id offsets too: copies must be DISJOINT user populations, or
    // every per-user operator (sessionize, funnel, attribution, nearest-
    // event) sees 16 coincident clones of each event and its per-user
    // join/window candidate set grows copies² — a pathological workload,
    // not the plan's curvature. Offset users keep per-user density fixed.
    replicate("events", Map(
      "event_id" -> (i => col("event_id") + lit(i * big)),
      "user_id" -> (i => col("user_id") + lit(i * big)),
      "value" -> (i => centOffset("value", i))))
    Seq("region", "nation", "customer", "supplier", "part").foreach { t =>
      Tables.load(spark, src, t).write.mode("overwrite").parquet(s"$dst/$t.parquet")
    }
    java.nio.file.Files.write(marker, key.getBytes)
    dst
  }

  /** Per-query wall seconds for the headline set at `dir` — fully
    * materialized behind a GC barrier, MIN OF 2 back-to-back runs (the
    * [[Bench]] rationale: single-shot numbers on this box carry large
    * run-to-run noise — r8 measured d3's x16 shot spanning 5–20 s across
    * rehearsals from spill/GC pressure on the persisted counts frame —
    * and the minimum estimates the plan's intrinsic cost). */
  def timeHeadline(spark: SparkSession, dir: String,
                   skip: Set[String] = Set.empty): Seq[(String, Double)] =
    Headline.filterNot(skip).map { n =>
      // announce BEFORE running so a mid-query crash (spill-full disk,
      // result-size kill) attributes to its query in the log
      println(s"[scaleup] running $n @ $dir"); Console.flush()
      // min-of-2, extended while a HEAVY row is still visibly warming:
      // a >5 s query whose second run is ≥10% under the first is mid
      // JIT/GC descent (r12 measured a1 inside the sweep at 15.6 s
      // min-of-2 vs 9.3 s isolated steady state — reps 1–2 of a fresh
      // plan), and a ratio gate fed a warming-phase wall fails on noise,
      // not scaling. Up to 2 extra reps, only while each rep keeps
      // descending ≥10% — light rows and already-steady rows pay
      // nothing. The descent seed uses the INDIVIDUAL first two times
      // (t2 ≥10% under t1), not just their min: a heavy row that is
      // already steady at rep 2 takes no probe rep (the r12 form seeded
      // on `min > 5 s` alone, so every >5 s row paid one extra rep —
      // the r12 ADVICE catch).
      val t1 = Bench.timed(SparkEntry.queries(n)(spark, dir))
      val t2 = Bench.timed(SparkEntry.queries(n)(spark, dir))
      var times = List(t1, t2)
      var prev = math.min(t1, t2)
      var extra = 0
      var descending = prev > 5.0 && t2 < t1 * 0.9
      while (descending && extra < 2) {
        val t = Bench.timed(SparkEntry.queries(n)(spark, dir))
        times ::= t
        descending = t < prev * 0.9
        prev = t
        extra += 1
      }
      n -> times.min
    }
}
