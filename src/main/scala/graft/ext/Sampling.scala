package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Deterministic sampling operators for a training-data pipeline:
  * hash-gated row selection instead of RNG draws, so a sample is
  * reproducible across engines, partitionings, retries, and reruns — the
  * property that matters when a 100 TB corpus is downsampled once and the
  * selection must be re-derivable forever. Pure codegen filters: no
  * shuffle, no state, trivially scale-parallel, and expressible verbatim
  * in any SQL dialect (oracle-EXACT, unlike seeded `rand()` which no two
  * engines implement alike).
  *
  * The gate hash is an explicit integer polynomial over the row id:
  * `((id mod 2³¹−1) · 2654435761) mod (10⁹+7)` — the inner mod bounds the
  * product below 2⁶³ so the arithmetic is overflow-free exact in both
  * Spark and DuckDB at any id scale. Ids are assumed non-negative (the
  * engine's surrogate-key convention); `pmod` makes negatives safe anyway.
  */
object Sampling {

  private val P31 = 2147483647L     // 2^31 − 1
  private val Knuth = 2654435761L   // Knuth multiplicative constant
  private val M = 1000000007L

  /** The sampling gate in [0, M): uniform enough for rate control (the
    * slight mod-M bias at the last bucket is ≪ 1e-7 of the rate). */
  def gate(id: Column): Column =
    pmod(pmod(id.cast("long"), lit(P31)) * Knuth, lit(M))

  /** SQL mirror of [[gate]] (DuckDB/ANSI): same ops, same order. */
  def gateSql(idExpr: String): String =
    s"(((($idExpr) % $P31) * $Knuth) % $M)"

  /** Keep ~num/den of rows, deterministically: the row survives iff
    * gate(id) mod den < num. Same rows selected at any parallelism. */
  def hashSample(df: DataFrame, idCol: String, num: Int, den: Int): DataFrame = {
    require(num >= 0 && den > 0 && num <= den, s"bad rate $num/$den")
    df.filter(pmod(gate(col(idCol)), lit(den.toLong)) < num)
  }

  /** Stratified deterministic sampling: a per-stratum rate map (strata
    * missing from the map are dropped, mirroring `sampleBy`). One codegen
    * when-chain — no per-stratum scans, no shuffle. */
  def stratifiedHashSample(df: DataFrame, idCol: String, stratumCol: String,
                           rates: Map[String, (Int, Int)]): DataFrame = {
    val g = gate(col(idCol))
    val keep = rates.toSeq.sortBy(_._1).foldLeft(lit(false)) {
      case (acc, (stratum, (num, den))) =>
        require(num >= 0 && den > 0 && num <= den, s"bad rate $num/$den for $stratum")
        when(col(stratumCol) === stratum, pmod(g, lit(den.toLong)) < num).otherwise(acc)
    }
    df.filter(keep)
  }

  /** Corpus mix rebalancing — the data-mixing step of a training
    * pipeline: downsample over-represented groups (language, source,
    * domain) to a uniform target so no group dominates the corpus. The
    * target is the smallest group's count, optionally overridden per
    * group via `targets` (capped at the group's actual count — a target
    * can only downsample). Selection is the deterministic [[gate]], so
    * the rebalanced corpus is re-derivable at any parallelism.
    *
    * Scale shape: one map-side-combinable count aggregate over the group
    * domain (tiny), broadcast back onto a single corpus scan — no
    * shuffle of the data rows, no RNG. The smallest group (or any group
    * at/below its target) is kept in full via the explicit
    * `cnt <= target` disjunct.
    *
    * Rate form: keep iff gate < ⌊M·target/cnt⌋ — a RATE comparison on
    * the gate's own [0, M) codomain. The earlier `gate mod cnt < target`
    * spelling silently distorts once cnt is a sizable fraction of M
    * (mod-M non-uniformity over-retains ~20% at cnt ≈ 0.6M) and is
    * outright wrong past cnt > M (the mod becomes the identity) — and
    * the DOMINANT group is exactly the one this operator exists to
    * downsample. The double product M·target rounds at 2⁻⁵³ relative,
    * shifting the integer threshold by ≪ 1, and both engines evaluate
    * the identical expression — deterministic and oracle-mirrored. */
  def mixRebalance(df: DataFrame, idCol: String, groupCol: String,
                   targets: Map[String, Long] = Map.empty): DataFrame = {
    // Null-safe join key: a NULL group is a real stratum (the aggregate
    // below counts it as one), so a plain equi-join would silently drop
    // those rows. EqualNullSafe is still a hash-join key — the counts
    // side stays broadcast.
    val counts = df.groupBy(col(groupCol)).agg(count(lit(1)).as("grp_cnt"))
      .withColumnRenamed(groupCol, "__grp")
    val floor = counts.agg(min(col("grp_cnt")).as("uniform_target"))
    val targetExpr =
      if (targets.isEmpty) col("uniform_target")
      else targets.toSeq.sortBy(_._1).foldLeft(col("uniform_target")) {
        case (acc, (g, n)) => when(col(groupCol) === g, lit(n)).otherwise(acc)
      }
    val tEff = least(targetExpr, col("grp_cnt"))
    val thr = org.apache.spark.sql.functions.floor(
      lit(M.toDouble) * tEff.cast("double") / col("grp_cnt").cast("double"))
    df.join(broadcast(counts), col(groupCol) <=> col("__grp"))
      .crossJoin(broadcast(floor))
      .filter(col("grp_cnt") <= tEff || gate(col(idCol)) < thr)
      .drop("__grp", "grp_cnt", "uniform_target")
  }

  /** Temperature-based mix reweighting — the multilingual-corpus
    * sampling math (the α-exponentiated source weights of mBERT/XLM-R):
    * w_s ∝ c_s^α flattens the source distribution toward uniform while
    * keeping big sources bigger; each source then keeps
    * rate_s = w_s·T/c_s of its rows through the deterministic gate.
    * α is FIXED at ½ because sqrt is IEEE-correctly-rounded in every
    * engine while pow(x, 0.3) is not — the one exponent that keeps the
    * operator hash-reproducible cross-engine (documented tradeoff).
    *
    * Determinism: Σ√c runs as an ordered cumulative window over the
    * (tiny) per-source count frame, each source does one fixed-order
    * double chain ending in floor → integer threshold, and row selection
    * is the integer gate — no RNG, identical rows at any parallelism.
    * Plan: one grouped count, thresholds broadcast onto one corpus
    * scan — the mixRebalance shape. */
  def temperatureRebalance(df: DataFrame, idCol: String, groupCol: String): DataFrame = {
    val counts = df.groupBy(col(groupCol).as("__g")).agg(count(lit(1)).as("__c"))
    val wCum = Window.orderBy("__g")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy()
    val thr = floor(sqrt(col("__c").cast("double")) / col("__S") *
      col("__T").cast("double") / col("__c").cast("double") * lit(1000000.0))
      .cast("long")
    val thresholds = counts
      .withColumn("__cum", sum(sqrt(col("__c").cast("double"))).over(wCum))
      .withColumn("__S", max("__cum").over(wAll))
      .withColumn("__T", sum("__c").over(wAll))
      .select(col("__g"), thr.as("__thr"))
    df.join(broadcast(thresholds), col(groupCol) <=> col("__g"))
      .filter(pmod(gate(col(idCol)), lit(1000000L)) < least(col("__thr"), lit(1000000L)))
      .drop("__g", "__thr")
  }

  /** Per-key row cap — "keep at most k docs per source/domain", the
    * anti-hoarding curation step of a crawl pipeline (one hot domain must
    * not dominate the corpus). Survivors are the k SMALLEST ids per key,
    * so selection is deterministic and re-derivable.
    *
    * Scale shape: a bounded [[graft.functions.MinKIds]] typed aggregate —
    * partial states of ≤ k longs combine map-side, so the exchange
    * carries k ids per (partition, key), never the data rows; a
    * `row_number` window would instead sort the full table through one
    * per-key exchange. The id list explodes back to rows after the
    * aggregate. Hot keys cost O(k) state like any other key — skew-immune
    * by construction. */
  def perKeyCap(df: DataFrame, idCol: String, keyCol: String, k: Int): DataFrame = {
    val minK = org.apache.spark.sql.functions.udaf(new graft.functions.MinKIds(k))
    df.groupBy(col(keyCol))
      .agg(minK(col(idCol).cast("long")).as("__kept"))
      .select(col(keyCol), explode(col("__kept")).as(idCol))
  }

  /** Deterministic corpus shuffle: a reproducible pseudo-random training
    * order as a PURE FUNCTION of row ids — shuffle_pos is the dense
    * 0-based position under the (gate(id), id) total order. Sequential
    * corpus order carries crawl/source correlation a training run must
    * not see; seeded `rand()` orders differ per engine and per retry,
    * while this order is re-derivable forever.
    *
    * Scale shape: two-pass rank with VALUE-derived buckets — the gate's
    * codomain [0, M) splits into `buckets` equal ranges, so there is no
    * sampling pass and no global-window single task; per-bucket
    * `row_number` plus broadcast bucket offsets is bitwise-equal to the
    * global ordered window. */
  def corpusShuffle(df: DataFrame, idCol: String, buckets: Int = 32): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
    val parts = df.select(col(idCol).cast("long").as("doc_id"))
      .withColumn("g", gate(col("doc_id")))
      .withColumn("bucket", expr(s"(g * $buckets) div $M").cast("int"))
    val wPre = w.orderBy("bucket").rowsBetween(w.unboundedPreceding, -1)
    val offsets = parts.groupBy("bucket").agg(count(lit(1)).as("bn"))
      .withColumn("off", coalesce(sum("bn").over(wPre), lit(0L)))
      .select("bucket", "off")
    val wRk = w.partitionBy("bucket").orderBy(col("g"), col("doc_id"))
    parts.withColumn("brk", row_number().over(wRk).cast("long"))
      .join(broadcast(offsets), Seq("bucket"))
      .select(col("doc_id"), (col("brk") + col("off") - 1).as("shuffle_pos"))
      .orderBy(col("shuffle_pos"))
  }

  /** Quality-band upsampling (data mixing by repetition): each document
    * appears `1 + Σ(q ≥ bandᵢ)` times — high-quality text gets more
    * training epochs, deterministically (no weighted RNG draw, so the
    * epoch multiset is reproducible and oracle-EXACT). Emits one row per
    * copy with `epoch_idx` so a downstream [[corpusShuffle]] can spread
    * copies across the order.
    *
    * Scale shape: stateless projection + `explode(sequence(...))` — one
    * codegen scan, output size = Σ multiplicity, no shuffle. */
  def qualityUpsample(df: DataFrame, textCol: String, idCol: String,
                      bands: Seq[Double] = Seq(0.6, 0.8)): DataFrame = {
    require(bands.nonEmpty && bands == bands.sorted, "bands must ascend")
    val q = TextStats.qualityScore(col(textCol))
    val copies = bands.map(b => when(q >= b, 1).otherwise(0))
      .foldLeft(lit(1))(_ + _)
    df.select(col(idCol).as("doc_id"), q.as("quality_score"),
        copies.as("n_epochs"))
      .select(col("doc_id"), col("quality_score"), col("n_epochs"),
        explode(sequence(lit(0), col("n_epochs") - 1)).as("epoch_idx"))
      .orderBy(col("doc_id"), col("epoch_idx"))
  }

  /** Per-source token budget: within each source, keep documents in id
    * order while the running token total stays ≤ `budget` — the
    * crawl-quota primitive when caps are measured in tokens, not
    * documents (cf. [[perKeyCap]]). The boundary document that would
    * cross the budget is dropped whole (kept documents are never
    * truncated).
    *
    * Scale shape: one shuffle on the source key; the cumulative window
    * runs per source, so parallelism = source cardinality (domains —
    * plentiful). A pathological mega-source serializes only its own
    * partition; callers capping such sources by document count first
    * ([[perKeyCap]]) bound that partition too. */
  def perSourceTokenBudget(df: DataFrame, textCol: String, idCol: String,
                           sourceCol: String, budget: Long): DataFrame = {
    require(budget > 0, "budget must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(sourceCol).orderBy(idCol)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    df.select(col(sourceCol).as("source"), col(idCol).as("doc_id"),
        size(split(col(textCol), " ")).cast("long").as("n_tokens"))
      .withColumn("cum_tokens", sum("n_tokens").over(w))
      .filter(col("cum_tokens") <= budget)
      .orderBy(col("source"), col("doc_id"))
  }

  /** Curriculum staging: rank documents by quality score within each
    * language and cut the ranking into `stages` equal-frequency stages
    * (stage 0 = lowest quality), reporting per-(lang, stage) counts and
    * quality bounds — the schedule view a curriculum-training pipeline
    * samples from. Stage = ⌊(rank−1)·stages / langCount⌋, all-Long math.
    *
    * Scale shape: the within-language rank does NOT use a
    * lang-partitioned window (a dominant language would serialize on one
    * task); it uses the two-pass plan — per-bucket `row_number` over
    * (lang, quality-bucket) partitions plus broadcast per-(lang, bucket)
    * prefix offsets — so ranking a skewed language still spreads over all
    * cores and the result is bitwise-identical to a global ordered
    * window. Buckets derive from the VALUE (quality is in [0,1] by
    * construction: ⌊q·buckets⌋), not from `repartitionByRange` — the
    * range sampler would execute the scoring scan a second time just to
    * pick split points the score's codomain already provides. Language
    * totals ride the same offsets aggregate. */
  def curriculumStages(df: DataFrame, textCol: String, idCol: String,
                       langCol: String = "lang", stages: Int = 5,
                       buckets: Int = 32): DataFrame = {
    require(stages > 0, "stages must be positive")
    val w = org.apache.spark.sql.expressions.Window
    val parts = df
      .select(col(langCol).as("lang"), col(idCol).cast("long").as("doc_id"),
        TextStats.qualityScore(col(textCol)).as("q"))
      .withColumn("bucket",
        // clamping is order-preserving, so out-of-[0,1] scores (a custom
        // scorer's) still rank correctly — they just share edge buckets.
        // NULL quality (empty/null text) must land in bucket 0, the
        // LOWEST stage: Spark's least/greatest SKIP nulls, so without
        // the coalesce a null floated through the clamp as buckets-1 and
        // an unscorable doc ranked "highest quality" — inverted against
        // qualityUpsample's treatment of the same row.
        greatest(least(coalesce(floor(col("q") * buckets).cast("int"), lit(0)),
          lit(buckets - 1)), lit(0)))
    val wPre = w.partitionBy("lang").orderBy("bucket")
      .rowsBetween(w.unboundedPreceding, -1)
    val wLang = w.partitionBy("lang")
    val offsets = parts.groupBy("bucket", "lang")
      .agg(count(lit(1)).as("bn"))
      .withColumn("off", coalesce(sum("bn").over(wPre), lit(0L)))
      .withColumn("cnt", sum("bn").over(wLang))
      .select("bucket", "lang", "off", "cnt")
    val wRk = w.partitionBy("bucket", "lang").orderBy(col("q"), col("doc_id"))
    parts
      .withColumn("brk", row_number().over(wRk).cast("long"))
      // EqualNullSafe on lang: a NULL language is a real curriculum group
      // (the windows above partition it as one) — the name-list equi-join
      // dropped every null-lang doc at exactly this seam, found by the
      // r10 curation fuzz (seed 22). bucket is coalesced, never null.
      .join(broadcast(offsets.withColumnsRenamed(
          Map("bucket" -> "__bucket", "lang" -> "__lang"))),
        col("bucket") === col("__bucket") && col("lang") <=> col("__lang"))
      .drop("__bucket", "__lang")
      .withColumn("stage",
        expr(s"((brk + off - 1) * $stages) div cnt").cast("int"))
      .groupBy("lang", "stage")
      .agg(count(lit(1)).as("n_docs"),
        min("q").as("min_quality"), max("q").as("max_quality"))
      .orderBy("lang", "stage")
  }

  /** Best-k documents per source BY QUALITY — the "keep each domain's
    * best pages" curation selector. A `TopKByScore` typed aggregate
    * keeps ≤k (score, id) pairs per (map partition, source) and merges
    * partials, so candidates reduce BEFORE the shuffle and a massive
    * domain never funnels through one sorting task (the window-rank
    * formulation would). Ties break on the LOWEST id (score desc,
    * id asc — the ANN top-k convention). */
  def perSourceBest(df: DataFrame, textCol: String, idCol: String,
                    keyCol: String, k: Int): DataFrame = {
    val topk = udaf(new graft.functions.TopKByScore(k))
    df.select(col(keyCol).as("source"),
        graft.ext.TextStats.qualityScore(col(textCol)).as("q"),
        col(idCol).cast("long").as("id"))
      .groupBy("source")
      .agg(topk(col("q"), col("id")).as("top"))
      .select(col("source"), posexplode(col("top")))
      .select(col("source"), (col("pos") + 1).cast("int").as("rk"),
        col("col._2").as("doc_id"), col("col._1").as("quality_score"))
      .orderBy(col("source"), col("rk"))
  }

  /** Deterministic output sharding + balance audit: each row lands in
    * shard `gate(id) mod n`, and the result is the per-shard (doc count,
    * token total) — what a corpus writer checks before emitting training
    * shards. Hash assignment is the scalable form of "balanced shards":
    * greedy bin packing is inherently sequential, while the gate is a
    * pure codegen projection and the law of large numbers evens out
    * per-shard token mass at corpus scale. One map-side-combined
    * aggregate; shuffle carries n rows. */
  def shardAssign(df: DataFrame, idCol: String, textCol: String,
                  nShards: Int): DataFrame = {
    require(nShards > 0, s"bad shard count $nShards")
    df.select(pmod(gate(col(idCol)), lit(nShards.toLong)).as("shard"),
        size(split(col(textCol), " ")).cast("long").as("n_tokens"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("tokens"))
      .orderBy("shard")
  }

  /** Deterministic train/validation/test assignment as a label column:
    * thresholds are cumulative per-mille cut points over gate(id) mod
    * 1000 (e.g. 800/900 → 80/10/10). The split is a pure projection —
    * joins/filters downstream prune on it like any column. */
  def splitColumn(id: Column, trainPerMille: Int, validPerMille: Int): Column = {
    require(trainPerMille >= 0 && validPerMille >= 0 &&
      trainPerMille + validPerMille <= 1000, "per-mille cut points must fit in [0,1000]")
    val g = pmod(gate(id), lit(1000L))
    when(g < trainPerMille, "train")
      .when(g < trainPerMille + validPerMille, "valid")
      .otherwise("test")
  }

  /** Leakage-safe train/valid/test split: every near-dup CLUSTER lands
    * whole on one side. A plain per-doc hash split puts two near-copies
    * of the same document in train and test ~2·p·(1−p) of the time —
    * eval contamination that inflates benchmark scores at exactly the
    * rate dedup was meant to prevent. Here each document is gated by its
    * cluster REPRESENTATIVE (the dedup survivor; itself when unclustered),
    * so co-assignment is structural, not probabilistic. Output: per-split
    * (n_docs, n_groups = distinct representatives, n_dup_docs = docs
    * riding a representative other than themselves).
    *
    * Scale shape: the doc→representative map comes from
    * [[graft.ext.Dedup.dedupClustersAuto]] (driver union-find below the
    * measured edge ceiling, distributed label propagation above), and it
    * joins onto the one corpus scan BROADCAST only while its optimizer
    * estimate fits the [[graft.ext.Dedup.DfreqBroadcastMaxInputBytes]]
    * gate — cluster membership scales with duplicate MASS, so at a
    * crawl-like dup rate the rep map is corpus-order and a forced
    * broadcast hint would OOM executors where the planner's shuffle
    * join is the right call. The gate itself stays a pure codegen
    * projection; nothing here adds a corpus-sized shuffle beyond the
    * final 3-row aggregate. */
  def leakageSafeSplit(docs: DataFrame, pairs: DataFrame, idCol: String,
                       trainPerMille: Int, validPerMille: Int,
                       maxBcBytes: Long = Dedup.DfreqBroadcastMaxInputBytes): DataFrame = {
    val reps = Dedup.dedupClustersAuto(pairs)
      .select(col("doc_id"), col("survivor_id").as("rep"))
    val withRep = docs.select(col(idCol).cast("long").as("doc_id"))
      .join(Dedup.maybeBroadcast(reps, maxBcBytes), Seq("doc_id"), "left")
      .withColumn("rep", coalesce(col("rep"), col("doc_id")))
    withRep
      .withColumn("split", splitColumn(col("rep"), trainPerMille, validPerMille))
      .groupBy("split")
      .agg(count(lit(1)).as("n_docs"),
        count_distinct(col("rep")).as("n_groups"),
        sum(when(col("rep") =!= col("doc_id"), 1L).otherwise(0L)).as("n_dup_docs"))
      .orderBy("split")
  }
}
