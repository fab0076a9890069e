package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (ArrayType(FloatType)) —
  * BASELINE.json extension scope.
  *
  *  - [[cosineTopK]]: brute-force exact top-k. The join is
  *    queries × corpus; with a bounded query set this is a broadcast of
  *    the queries against a single corpus scan — the right baseline, and
  *    embarrassingly parallel at any corpus size.
  *  - [[lshTopK]]: BucketedRandomProjectionLSH bucketed variant — the
  *    scale path when the query set is itself huge (corpus self-join).
  *
  * Dot products fold LEFT-TO-RIGHT over double-cast elements (Spark
  * `aggregate` is a sequential fold), matching a left-associated SQL sum
  * term-for-term, so scores are bit-stable and oracle-mirrorable.
  */
object SimSearch {

  /** Left-associated dot product via the native [[graft.functions.VecDot]]
    * expression: a codegen'd loop over the full vectors. The earlier flat
    * 64-term `element_at` chain had the same values but cost seconds of
    * janino compilation per plan (and the `aggregate` HOF runs
    * interpreted). The sequential `s += a[i]*b[i]` fold matches a
    * left-associated SQL sum term-for-term, so scores stay bit-stable and
    * oracle-mirrorable. Pass `dim` to score only a PREFIX of wider
    * vectors (adds a slice; omit for whole-vector scoring). */
  def dot(a: Column, b: Column, dim: Int = -1): Column =
    if (dim > 0) call_function("vec_dot", slice(a, 1, dim), slice(b, 1, dim))
    else call_function("vec_dot", a, b)

  /** Squared norm = vec_dot(v, v). */
  def norm2(a: Column, dim: Int = -1): Column =
    if (dim > 0) dot(a, a, dim) else call_function("vec_dot", a, a)

  /** Cosine similarity; NULL when either vector has zero norm (an
    * all-zero embedding — failed encoder rows exist in any real corpus).
    * The unguarded division would abort the whole job under ANSI
    * (Spark 4 default); null instead drops the pair from every
    * threshold filter and top-k downstream, which is the only sensible
    * semantics for an undefined angle. */
  def cosine(a: Column, b: Column, dim: Int = -1): Column = {
    val den = sqrt(norm2(a, dim)) * sqrt(norm2(b, dim))
    when(den > 0, dot(a, b, dim) / den)
  }

  /** Unit-normalize an embedding into an MLlib dense vector (zero-norm
    * → zero vector) — the ONE normalization every MLlib-backed path
    * (LSH, IVF, clustering) must share: two drifting copies of this UDF
    * would silently diverge bucket/assignment semantics. */
  private lazy val toUnitVec = {
    import org.apache.spark.ml.linalg.Vectors
    udf { (arr: Seq[Float]) =>
      val n = math.sqrt(arr.map(x => x.toDouble * x).sum)
      Vectors.dense(arr.map(x => if (n == 0) 0.0 else x / n).toArray)
    }
  }

  /** Sign-bit hyperplane code over the first `bits` dimensions — the
    * shared bucket function of [[semDedup]] / [[semDedupDelta]].
    * Dimensions beyond the vector's actual length contribute bit 0 (the
    * size guard short-circuits, so a `bits` larger than the embedding
    * width degrades to fewer distinct buckets instead of an ANSI
    * out-of-bounds abort). */
  private def signBitCode(vecCol: String, bits: Int): Column =
    (0 until bits).foldLeft(lit(0)) { (acc, j) =>
      acc + when(size(col(vecCol)) > j && element_at(col(vecCol), j + 1) > 0f,
        lit(1 << j)).otherwise(lit(0))
    }

  /** Bounded top-k by (score DESC, id ASC) as an exploded (qid, rk, cid,
    * score) frame — the shared tail of every ANN path. A
    * [[graft.functions.TopKByScore]] typed aggregate keeps ≤k pairs per
    * (map partition, qid) and merges partials, so candidates reduce
    * BEFORE the shuffle; the window formulation would funnel every
    * candidate row of a query through one task (single-task-per-query on
    * a 100 TB corpus). */
  private def topKExplode(scored: DataFrame, k: Int,
                          scoreName: String): DataFrame = {
    val topk = udaf(new graft.functions.TopKByScore(k))
    // null scores (zero-norm vectors, see [[cosine]]) must not reach the
    // typed aggregate — its (Double, Long) input encoder is non-nullable
    scored.filter(col("__score").isNotNull)
      .groupBy("qid")
      .agg(topk(col("__score"), col("cid")).as("top"))
      .select(col("qid"), posexplode(col("top")))
      .select(col("qid"), (col("pos") + 1).as("rk"),
        col("col._2").as("cid"), col("col._1").as(scoreName))
      .orderBy(col("qid"), col("rk"))
  }

  /** Exact top-k cosine neighbors of each query vector (self-matches
    * excluded). Ties break on neighbor id for determinism. Corpus/query
    * norms are precomputed per row, not per pair. */
  def cosineTopK(queries: DataFrame, corpus: DataFrame, k: Int,
                 idCol: String = "vec_id", vecCol: String = "embedding",
                 dim: Int = -1): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(queries.sparkSession)
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qv"),
      sqrt(norm2(col(vecCol), dim)).as("qn"))
    // widen the corpus scan (r15): the per-row norm + the per-pair dot
    // products below run in the scan stage, and a single-split corpus
    // file serialized the whole brute-force scorer on one task; output
    // is partitioning-invariant (per-row math + deterministic top-k
    // tie-break). No-op on a real multi-split corpus.
    val c = graft.ops.Par.widen(corpus.select(col(idCol), col(vecCol)))
      .select(col(idCol).as("cid"), col(vecCol).as("cv"),
        sqrt(norm2(col(vecCol), dim)).as("cn"))
    val scored = broadcast(q).crossJoin(c)
      .filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"),
        when(col("qn") * col("cn") > 0,
          dot(col("qv"), col("cv"), dim) / (col("qn") * col("cn"))).as("__score"))
    topKExplode(scored, k, "cos")
  }

  /** Symmetric int8 scalar quantization of an embedding column — the
    * standard 4× storage/bandwidth shrink before an ANN index ships to
    * serving. Per vector: scale = 127/max|xᵢ|, qᵢ = round-half-up
    * (floor(x·scale + 0.5)) — every op (float→double cast, ÷, ×, floor)
    * is IEEE-exact-or-correctly-rounded, so the quantized codes and the
    * stored scale hash-match any engine; an all-zero vector quantizes to
    * zeros (scale term guards the 0/0). |x·scale| ≤ 127 by construction,
    * so codes fit int8 with no clamp.
    *
    * Scale shape: stateless per-row projection — one codegen scan, no
    * shuffle. */
  def quantizeInt8(df: DataFrame, idCol: String = "vec_id",
                   vecCol: String = "embedding"): DataFrame = {
    val v = transform(col(vecCol), x => x.cast("double"))
    val mx = array_max(transform(col(vecCol), x => abs(x.cast("double"))))
    df.select(col(idCol).as("vec_id"), v.as("v"), mx.as("max_abs"))
      .withColumn("scale",
        when(col("max_abs") > 0, lit(127.0) / col("max_abs")).otherwise(lit(0.0)))
      .select(col("vec_id"), col("max_abs"), col("scale"),
        transform(col("v"), x => floor(x * col("scale") + 0.5).cast("int")).as("q"),
        // CSV form of the codes: integer-exact, and scalar-typed for
        // harnesses that hash flat values
        array_join(transform(col("v"),
          x => floor(x * col("scale") + 0.5).cast("int")), ",").as("q_csv"))
      .orderBy(col("vec_id"))
  }

  /** LSH-bucketed approximate top-k (scale path; MLlib
    * BucketedRandomProjectionLSH under euclidean distance on normalized
    * vectors — rank-equivalent to cosine). */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int,
              idCol: String = "vec_id", vecCol: String = "embedding",
              bucketLength: Double = 2.0, numHashTables: Int = 3,
              seed: Long = 42L): DataFrame = {
    import org.apache.spark.ml.feature.BucketedRandomProjectionLSH

    val q = queries.select(col(idCol).as("qid"), toUnitVec(col(vecCol)).as("fv"))
    // NOT widened (r15 measured): approxSimilarityJoin explodes and
    // reshuffles the hashed corpus itself, so a widen exchange upstream
    // only added cost (0.66 → 0.85 s pooled) — unlike the brute/PQ/IVF
    // siblings whose per-row scan work dominates
    val c = corpus.select(col(idCol).as("cid"), toUnitVec(col(vecCol)).as("fv"))
    // MLlib's fit reads head() for the input dim and aborts on an empty
    // corpus; an empty candidate set is the correct result instead
    if (c.isEmpty)
      return topKExplode(q.crossJoin(c)
        .select(col("qid"), col("cid"), lit(0.0).as("__score")), k, "cos_approx")
    val lsh = new BucketedRandomProjectionLSH()
      .setInputCol("fv").setOutputCol("hashes")
      .setBucketLength(bucketLength).setNumHashTables(numHashTables).setSeed(seed)
    val model = lsh.fit(c)
    val joined = model.approxSimilarityJoin(q, c, 2.0, "dist")
      .select(col("datasetA.qid").as("qid"), col("datasetB.cid").as("cid"), col("dist"))
      .filter(col("qid") =!= col("cid"))
    // On unit vectors cos = 1 − dist²/2, monotone-decreasing in dist ≥ 0,
    // so ranking by it DESC equals ranking by dist ASC — one bounded
    // aggregate replaces the per-query window.
    topKExplode(joined.select(col("qid"), col("cid"),
      (lit(1.0) - col("dist") * col("dist") / 2.0).as("__score")),
      k, "cos_approx")
  }

  /** IVF (inverted-file) approximate top-k — the other standard ANN scale
    * path next to [[lshTopK]]: k-means coarse quantizer over the corpus
    * (fit once, tiny model), each corpus vector assigned to its nearest
    * centroid list, each query probing only the `nprobe` nearest lists.
    * The candidate join is an equi-join on the cluster id — at 100 TB the
    * corpus partitions BY LIST, queries broadcast, and each scan touches
    * nprobe/nlist of the data. Scores re-rank with the exact vec_dot
    * cosine, so output columns match [[cosineTopK]] (approximate recall,
    * rows-only check). */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, k: Int,
              idCol: String = "vec_id", vecCol: String = "embedding",
              nlist: Int = 16, nprobe: Int = 4, seed: Long = 42L): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.linalg.Vector
    graft.functions.GraftFunctions.ensureRegistered(queries.sparkSession)

    val c = corpus.select(col(idCol).as("cid"), col(vecCol).as("cv"),
      toUnitVec(col(vecCol)).as("fv"),
      sqrt(norm2(col(vecCol))).as("cn"))
    // KMeans.fit aborts on an empty corpus; empty candidates are correct
    if (c.isEmpty)
      return topKExplode(queries.select(col(idCol).as("qid")).crossJoin(c)
        .select(col("qid"), col("cid"), lit(0.0).as("__score")), k, "cos")
    // k-means|| init + 10 iterations: cheaper quantizers (random init,
    // fewer passes) measurably cost recall on weakly-clustered embeddings
    // (IvfSpec's recall@5 floor caught that), and the fit is a one-off
    // against the whole-corpus probe cost. Structural invariants —
    // probed(p) ⊆ probed(p′) for p ≤ p′, and nprobe = nlist degenerating
    // to exact brute force — are pinned in SimSearchSpec.
    val km = new KMeans().setK(nlist).setSeed(seed).setMaxIter(10)
      .setFeaturesCol("fv").setPredictionCol("list_id")
    val model = km.fit(c)
    // the FIT reads the un-widened frame (k-means float-sum order feeds
    // the centroids, which are part of this declared operator's output
    // identity); the list ASSIGNMENT + exact re-rank are per-row math
    // under a fixed model, so they read the widened scan (r15 — the
    // single-split corpus serialized the whole probe on one task)
    val cW = graft.ops.Par.widen(corpus.select(col(idCol), col(vecCol)))
      .select(col(idCol).as("cid"), col(vecCol).as("cv"),
        toUnitVec(col(vecCol)).as("fv"),
        sqrt(norm2(col(vecCol))).as("cn"))
    val assigned = model.transform(cW).select(col("cid"), col("cv"), col("cn"), col("list_id"))

    val centers = model.clusterCenters.map(_.toArray)
    val probesUdf = udf { (v: Vector) =>
      val arr = v.toArray
      centers.zipWithIndex.map { case (ct, i) =>
        var d = 0.0; var j = 0
        while (j < arr.length) { val t = arr(j) - ct(j); d += t * t; j += 1 }
        (d, i)
      }.sortBy(_._1).take(nprobe).map(_._2).toSeq
    }
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qv"),
        sqrt(norm2(col(vecCol))).as("qn"), toUnitVec(col(vecCol)).as("fv"))
      .withColumn("list_id", explode(probesUdf(col("fv"))))
      .drop("fv")

    val scored = broadcast(q).join(assigned, "list_id")
      .filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"),
        when(col("qn") * col("cn") > 0,
          dot(col("qv"), col("cv")) / (col("qn") * col("cn"))).as("__score"))
    // a query probing multiple lists can meet the same candidate once per
    // list only if assignment were multi-list; it is not (one list per
    // corpus vector), so no distinct is needed before the bounded top-k
    topKExplode(scored, k, "cos")
  }

  /** Product-quantization ANN (PQ/ADC) — the COMPRESSED-DOMAIN scan of
    * the ANN family: split the unit-normalized embedding into `m`
    * subspaces, k-means each subspace into `ksub` centroids (fit-once,
    * m tiny models whose total state is m·ksub·(dim/m) doubles — driver-
    * constant), encode every corpus vector as m small codes (64-dim
    * float32 = 256 B → 8 B at m=8: 32× memory compression), and score
    * queries by Asymmetric Distance Computation: per query ONE m×ksub
    * lookup table of subspace dot products, each candidate scored as
    * Σⱼ LUT[j][codeⱼ] — table lookups, no float-vector arithmetic per
    * pair. This is what makes a 100 TB corpus scannable from memory:
    * the scan touches codes, never raw vectors, and candidates reduce
    * through the bounded [[graft.functions.TopKByScore]] aggregate
    * BEFORE any shuffle, same as every ANN path here. IVF list pruning
    * composes upstream when scan volume (not memory) is the bound.
    *
    * Declared mode: the fit is MLlib k-means (not SQL-expressible);
    * SimSearchSpec pins recall@k against the exact brute-force scorer
    * and the self-exclusion/ordering contract. */
  /** Codebook training sample bound: PQ codebooks ALWAYS train on a
    * bounded sample (FAISS practice — quantizer quality saturates far
    * below this), so fit cost is CONSTANT in corpus size: one filtered
    * collect (≤ 32 MB at 64 dims), then m driver-local Lloyd fits of
    * microseconds each. The m-fits-as-Spark-jobs alternative was
    * measured at 19.6 s on a 5 000-vector corpus — pure scheduling
    * overhead (16 fits × ~13 k-means|| jobs), none of it data. */
  private val PqFitSampleCap = 65536

  /** Fail FAST (analysis time, clear message) when a driver-side-fit
    * operator gets a non-integral id column: the fit paths collect ids
    * as longs and the bounded TopK aggregate keys on (Double, Long), so
    * a string id would otherwise die mid-job in a ClassCastException
    * deep inside a task. Integral ids cast up to long losslessly. */
  private def requireLongId(df: DataFrame, idCol: String, op: String): Unit = {
    import org.apache.spark.sql.types._
    val dt = df.schema(idCol).dataType
    require(Seq(ByteType, ShortType, IntegerType, LongType).contains(dt),
      s"$op: id column '$idCol' must be an integral type (byte/short/int/long), " +
        s"got ${dt.simpleString} — map your ids to longs (e.g. xxhash64 or a " +
        "dense id spine) before calling this operator")
  }

  def pqTopK(queries: DataFrame, corpus: DataFrame, k: Int,
             idCol: String = "vec_id", vecCol: String = "embedding",
             m: Int = 8, ksub: Int = 16, seed: Long = 42L): DataFrame = {
    require(m > 0 && ksub > 1, "need m ≥ 1 subspaces and ksub ≥ 2 centroids")
    requireLongId(queries, idCol, "pqTopK")
    requireLongId(corpus, idCol, "pqTopK")
    val spark = queries.sparkSession
    graft.functions.GraftFunctions.ensureRegistered(spark)

    val unitArr = udf { (arr: Seq[Float]) =>
      val n = math.sqrt(arr.map(x => x.toDouble * x).sum)
      arr.map(x => if (n == 0) 0.0 else x / n)
    }
    // widened corpus scan (r15, see cosineTopK): the codebook fit sample
    // is a pure hash gate on the id SORTED after collect, so the fitted
    // codebooks are partition-invariant by construction; encode + ADC
    // are per-row math under the broadcast codebooks
    val c0 = graft.ops.Par.widen(corpus.select(col(idCol), col(vecCol)))
      .select(col(idCol).cast("long").as("cid"), unitArr(col(vecCol)).as("cu"))
    val stats = c0.agg(count(lit(1)), max(size(col("cu")))).head()
    val nCorpus = stats.getLong(0)
    if (nCorpus == 0)
      return topKExplode(queries.select(col(idCol).cast("long").as("qid")).crossJoin(c0)
        .select(col("qid"), col("cid"), lit(0.0).as("__score")), k, "adc_score")
    val dim = stats.getInt(1)
    val sub = math.max(1, (dim + m - 1) / m)
    val mEff = math.min(m, (dim + sub - 1) / sub)

    // Deterministic hash-gated training sample (partition-invariant: the
    // gate is a pure function of the id, and the collected rows sort by
    // id before any seeded choice) — ONE job, bounded by the cap.
    val sampled =
      if (nCorpus <= PqFitSampleCap) c0
      else c0.filter(pmod(xxhash64(col("cid"), lit(seed)), lit(1000000L)) <
        lit(math.max(1L, (PqFitSampleCap.toDouble / nCorpus * 1e6).toLong)))
    val sample0: Array[Array[Double]] = sampled.select(col("cid"), col("cu"))
      .collect().sortBy(_.getLong(0))
      .map(_.getSeq[Double](1).toArray)
    // the hash gate could in principle select nothing from a non-empty
    // corpus — fall back to one row so the fit always has an anchor
    // (same guard as coresetSample)
    val sample =
      if (sample0.nonEmpty) sample0
      else c0.limit(1).collect().map(_.getSeq[Double](1).toArray)
    val ksubEff = math.min(ksub, sample.length)

    // Driver-local seeded k-means++ init + 10 Lloyd iterations per
    // subspace. Empty clusters keep their previous center (standard).
    def fitSub(j: Int): Array[Array[Double]] = {
      val off = j * sub
      val pts = sample.map { v =>
        Array.tabulate(sub)(t => if (off + t < v.length) v(off + t) else 0.0)
      }
      val rnd = new scala.util.Random(seed + j)
      val kk = ksubEff
      val centers = Array.ofDim[Array[Double]](kk)
      centers(0) = pts(rnd.nextInt(pts.length)).clone()
      val d2 = Array.fill(pts.length)(Double.MaxValue)
      var i = 1
      while (i < kk) {
        var s = 0.0
        var p = 0
        while (p < pts.length) {
          val c = centers(i - 1)
          var d = 0.0; var t = 0
          while (t < sub) { val x = pts(p)(t) - c(t); d += x * x; t += 1 }
          if (d < d2(p)) d2(p) = d
          s += d2(p)
          p += 1
        }
        val r = rnd.nextDouble() * s
        var acc = 0.0
        var pick = 0
        while (pick < pts.length - 1 && acc + d2(pick) < r) { acc += d2(pick); pick += 1 }
        centers(i) = pts(pick).clone()
        i += 1
      }
      var it = 0
      while (it < 10) {
        val sums = Array.fill(kk)(new Array[Double](sub))
        val cnt = new Array[Long](kk)
        pts.foreach { pt =>
          var best = 0; var bd = Double.MaxValue; var ci = 0
          while (ci < kk) {
            var d = 0.0; var t = 0
            while (t < sub) { val x = pt(t) - centers(ci)(t); d += x * x; t += 1 }
            if (d < bd) { bd = d; best = ci }
            ci += 1
          }
          cnt(best) += 1
          var t = 0
          while (t < sub) { sums(best)(t) += pt(t); t += 1 }
        }
        var ci = 0
        while (ci < kk) {
          if (cnt(ci) > 0) {
            var t = 0
            while (t < sub) { centers(ci)(t) = sums(ci)(t) / cnt(ci); t += 1 }
          }
          ci += 1
        }
        it += 1
      }
      centers
    }
    // per-subspace fits are independent (own seeded Random(seed+j), own
    // slice of the sample) — run them on the common pool instead of
    // serially on one driver core (the numProfileViaDriverSort idiom);
    // output identical, fit wall ÷ min(mEff, cores)
    val codebooks: Array[Array[Array[Double]]] =
      (0 until mEff).map(j => java.util.concurrent.CompletableFuture
        .supplyAsync(() => fitSub(j)))
        .map(_.join()).toArray
    val bc = spark.sparkContext.broadcast(codebooks)

    // .asNondeterministic() is a PLAN BARRIER, not a semantics claim:
    // encode is a pure function, but without the marker Catalyst
    // collapses this projection ABOVE the query cross join and
    // re-evaluates the whole nearest-centroid search once per
    // (corpus × query) output row — measured 7.9 s vs 0.8 s at sf0.1
    // (10 queries = 10× amplification; a 10k-query batch would be
    // 10 000×). The marker pins encoding below the join: each corpus
    // vector encodes exactly once, which is the whole point of PQ.
    val encode = udf { (arr: Seq[Double]) =>
      val cbs = bc.value
      (0 until cbs.length).map { j =>
        val off = j * sub
        var best = 0
        var bd = Double.MaxValue
        var i = 0
        while (i < cbs(j).length) {
          val ct = cbs(j)(i)
          var d = 0.0
          var t = 0
          while (t < ct.length) {
            val x = if (off + t < arr.length) arr(off + t) else 0.0
            val diff = x - ct(t); d += diff * diff; t += 1
          }
          if (d < bd) { bd = d; best = i }
          i += 1
        }
        best
      }
    }.asNondeterministic()
    val lut = udf { (arr: Seq[Double]) =>
      val cbs = bc.value
      cbs.indices.flatMap { j =>
        val off = j * sub
        cbs(j).map { ct =>
          var d = 0.0
          var t = 0
          while (t < ct.length) {
            d += (if (off + t < arr.length) arr(off + t) else 0.0) * ct(t)
            t += 1
          }
          d
        }
      }
    }
    val adc = udf { (l: Seq[Double], code: Seq[Int]) =>
      var s = 0.0
      var j = 0
      while (j < code.length) { s += l(j * ksubEff + code(j)); j += 1 }
      s
    }
    val codes = c0.select(col("cid"), encode(col("cu")).as("code"))
    val q = queries
      .select(col(idCol).cast("long").as("qid"), lut(unitArr(col(vecCol))).as("lut"))
    val scored = codes.crossJoin(broadcast(q))
      .filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"),
        adc(col("lut"), col("code")).as("__score"))
    topKExplode(scored, k, "adc_score")
  }

  /** Greedy k-center coreset selection — diversity-aware data selection
    * (the k-center/facility-location family used for training-subset
    * picking): choose `k` corpus vectors that 2-approximate the optimal
    * minimax cover (each new center is the point farthest from the
    * chosen set), then assign EVERY corpus vector to its nearest center.
    * Output (vec_id, center_id, l2_dist) — the per-point coverage map a
    * selection/budgeting step consumes; max(l2_dist) is the coverage
    * radius.
    *
    * Scale shape: the greedy selection is inherently sequential (k
    * passes), so it runs driver-side over the same bounded deterministic
    * hash sample as the PQ codebook fit — constant cost in corpus size;
    * the assignment is ONE stateless scan against the broadcast center
    * matrix (k·dim doubles). Ties in the farthest-point choice break on
    * the smaller id, so selection is a pure function of (sample, k,
    * seed) — partition-invariant.
    *
    * Declared mode (selection not SQL-expressible); SimSearchSpec pins
    * center self-assignment, coverage-radius monotonicity in k, and
    * determinism. Distances are over unit-normalized vectors (cosine
    * geometry), consistent with the rest of the embedding family. */
  def coresetSample(df: DataFrame, k: Int,
                    idCol: String = "vec_id", vecCol: String = "embedding",
                    seed: Long = 42L): DataFrame = {
    require(k > 0, "need k ≥ 1 centers")
    requireLongId(df, idCol, "coresetSample")
    // NULL embeddings carry no geometry: drop them, like every cosine op
    // here (the zero-norm policy) — without the filter one null vector
    // NPEs the whole job inside the unit-vector lambda (r11 fuzz)
    val dfNN = df.filter(col(vecCol).isNotNull)
    val spark = df.sparkSession
    val unitArr = udf { (arr: Seq[Float]) =>
      val n = math.sqrt(arr.map(x => x.toDouble * x).sum)
      arr.map(x => if (n == 0) 0.0 else x / n)
    }
    val c0 = dfNN.select(col(idCol).cast("long").as("vec_id"), unitArr(col(vecCol)).as("cu"))
    val nCorpus = c0.count()
    if (nCorpus == 0)
      return c0.select(col("vec_id"), col("vec_id").as("center_id"),
        lit(0.0).as("l2_dist"))
    val sampled =
      if (nCorpus <= PqFitSampleCap) c0
      else c0.filter(pmod(xxhash64(col("vec_id"), lit(seed)), lit(1000000L)) <
        lit(math.max(1L, (PqFitSampleCap.toDouble / nCorpus * 1e6).toLong)))
    val sample0: Array[(Long, Array[Double])] = sampled.collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).sortBy(_._1)
    // the hash gate could in principle select nothing — fall back to one
    // arbitrary row so selection always has an anchor
    val sample =
      if (sample0.nonEmpty) sample0
      else c0.limit(1).collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)

    def d2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      val len = math.min(a.length, b.length)
      while (i < len) { val x = a(i) - b(i); s += x * x; i += 1 }
      s
    }
    val kk = math.min(k.toLong, sample.length.toLong).toInt
    val centerIdx = new Array[Int](kk)
    centerIdx(0) = 0 // smallest id — deterministic anchor
    val minD = Array.fill(sample.length)(Double.MaxValue)
    var ci = 1
    while (ci <= kk) {
      var far = 0
      var fd = -1.0
      var p = 0
      while (p < sample.length) {
        val d = d2(sample(p)._2, sample(centerIdx(ci - 1))._2)
        if (d < minD(p)) minD(p) = d
        if (minD(p) > fd) { fd = minD(p); far = p } // first max wins = smallest id
        p += 1
      }
      if (ci < kk) centerIdx(ci) = far
      ci += 1
    }
    val centers: Array[(Long, Array[Double])] = centerIdx.map(sample)
    val bc = spark.sparkContext.broadcast(centers)
    val assign = udf { (arr: Seq[Double]) =>
      val cs = bc.value
      val a = arr.toArray
      var best = 0; var bd = Double.MaxValue; var i = 0
      while (i < cs.length) {
        val d = d2(a, cs(i)._2)
        if (d < bd) { bd = d; best = i }
        i += 1
      }
      (cs(best)._1, math.sqrt(bd))
    }
    c0.select(col("vec_id"), assign(col("cu")).as("__a"))
      .select(col("vec_id"), col("__a._1").as("center_id"),
        col("__a._2").as("l2_dist"))
      .orderBy(col("vec_id"))
  }

  /** Embedding-cosine near-duplicate pairs above a threshold within one
    * table (brute force over a bounded id range; LSH for the full set). */
  def cosineNearDupPairs(df: DataFrame, threshold: Double,
                         idCol: String = "vec_id", vecCol: String = "embedding",
                         dim: Int = -1): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(df.sparkSession)
    val a = df.select(col(idCol).as("ida"), col(vecCol).as("va"))
    val b = df.select(col(idCol).as("idb"), col(vecCol).as("vb"))
    a.crossJoin(b).filter(col("ida") < col("idb"))
      .select(col("ida"), col("idb"), cosine(col("va"), col("vb"), dim).as("cos"))
      .filter(col("cos") >= threshold)
      .orderBy(col("ida"), col("idb"))
  }

  /** Semantic dedup (SemDeDup-style, deterministic form): embeddings
    * bucket by the sign-bit code of their first `bits` dimensions (a
    * fixed hyperplane LSH — no RNG, so the operator is exactly
    * reproducible and oracle-gateable, unlike a k-means partition);
    * within a bucket, a vector is a DUPLICATE when some lower-id bucket
    * neighbor has cosine ≥ `threshold` (greedy keep-first — the same
    * survivor convention as the text dedup family). Output: one row per
    * vector with its bucket, the smallest such neighbor (`dup_of`,
    * null = none) and the keep flag.
    *
    * Scale shape: the pair join is an equi-join ON THE BUCKET CODE —
    * candidates are bucket-local (E[bucket] = n/2^bits; raise `bits`
    * with corpus size), the corpus never self-joins unbucketed, and the
    * per-duplicate reduction is a min aggregate, not a window. Missing
    * cross-bucket pairs are the documented approximation (two sign-LSH
    * buckets differing ⇒ some coordinate pair straddles a hyperplane),
    * exactly as in published SemDeDup, which also only dedups within a
    * cluster. */
  def semDedup(df: DataFrame, threshold: Double, bits: Int = 8,
               idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(df.sparkSession)
    val v = df.select(col(idCol).as("id"), col(vecCol).as("v"),
      signBitCode(vecCol, bits).as("bucket"))
    val a = v.select(col("bucket"), col("id").as("ida"), col("v").as("va"))
    val b = v.select(col("bucket"), col("id").as("idb"), col("v").as("vb"))
    val dups = a.join(b, Seq("bucket"))
      .filter(col("ida") < col("idb"))
      .filter(cosine(col("va"), col("vb")) >= threshold)
      .groupBy(col("idb").as("id")).agg(min(col("ida")).as("dup_of"))
    v.select(col("id"), col("bucket"))
      .join(dups, Seq("id"), "left")
      .select(col("id").as("vec_id"), col("bucket"), col("dup_of"),
        col("dup_of").isNull.as("keep"))
      .orderBy(col("vec_id"))
  }

  /** Incremental batch-vs-corpus SEMANTIC dedup — the embedding sibling
    * of `Dedup.neardupDelta` for continuous ingestion: which incoming
    * vectors are ≥`threshold`-cosine duplicates of the curated corpus?
    * Same fixed sign-bit buckets as [[semDedup]]; the candidate join is
    * batch⋈corpus equi-keyed on the bucket (never batch×corpus), and the
    * corpus is only ever scanned, not self-joined. Returns one row per
    * DUPLICATE batch vector: (batch_id, dup_of = smallest matching
    * corpus id, n_matches, best_cos = the strongest match). */
  def semDedupDelta(corpus: DataFrame, batch: DataFrame, threshold: Double,
                    bits: Int = 8, idCol: String = "vec_id",
                    vecCol: String = "embedding"): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(corpus.sparkSession)
    val c = corpus.select(signBitCode(vecCol, bits).as("bucket"),
      col(idCol).as("cid"), col(vecCol).as("cv"))
    val b = batch.select(signBitCode(vecCol, bits).as("bucket"),
      col(idCol).as("batch_id"), col(vecCol).as("bv"))
    b.join(c, Seq("bucket"))
      .select(col("batch_id"), col("cid"),
        cosine(col("bv"), col("cv")).as("cos"))
      .filter(col("cos") >= threshold)
      .groupBy("batch_id")
      .agg(min("cid").as("dup_of"), count(lit(1)).as("n_matches"),
        max("cos").as("best_cos"))
      .orderBy("batch_id")
  }

  /** Corpus topic clustering — the mixture-analysis view a training
    * pipeline takes before sampling decisions: k-means over
    * unit-normalized embeddings (same quantizer family as [[ivfTopK]]),
    * summarized per cluster as (size, mean cosine to the centroid — a
    * cohesion signal). Seeded/approximate by nature (rows-only check;
    * ClusterSpec pins the structural invariants). Scale shape: the
    * MLlib fit is distributed; assignment is one scan against the tiny
    * broadcast model; the summary is a cluster-domain aggregate. */
  def clusterSummary(df: DataFrame, nClusters: Int = 16,
                     idCol: String = "vec_id", vecCol: String = "embedding",
                     seed: Long = 42L): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.linalg.Vector
    // null embeddings dropped — no geometry, and un-guarded they NPE the
    // vector-conversion lambda (r11 fuzz)
    val c = df.filter(col(vecCol).isNotNull)
      .select(col(idCol).as("cid"), toUnitVec(col(vecCol)).as("fv"))
    // KMeans.fit aborts on an empty input; an empty summary is correct
    if (c.isEmpty)
      return c.select(lit(0).as("cluster_id"), lit(0L).as("n_members"),
        lit(0.0).as("avg_cos_to_centroid"))
    val km = new KMeans().setK(nClusters).setSeed(seed).setMaxIter(10)
      .setFeaturesCol("fv").setPredictionCol("cluster_id")
    val model = km.fit(c)
    val centers = model.clusterCenters.map(_.toArray)
    val cosToCenter = udf { (v: Vector, cl: Int) =>
      val ct = centers(cl); val a = v.toArray
      var dp = 0.0; var nc = 0.0; var j = 0
      while (j < a.length) { dp += a(j) * ct(j); nc += ct(j) * ct(j); j += 1 }
      if (nc == 0) 0.0 else dp / math.sqrt(nc) // |v| = 1 by construction
    }
    model.transform(c)
      .select(col("cluster_id"), cosToCenter(col("fv"), col("cluster_id")).as("cos"))
      .groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("n_members"), avg(col("cos")).as("avg_cos_to_centroid"))
      .orderBy(col("cluster_id"))
  }

  /** PCA projection of the embedding column to `k` dimensions — the
    * standard shrink before an IVF/LSH index when the raw width is
    * wasteful. MLlib's PCA computes the covariance eigenbasis
    * distributed (one pass for the Gramian); the k×d rotation then
    * broadcasts into a stateless projection scan. Component SIGN is
    * BLAS-build-indeterminate, so the operator is rows-only; the spec
    * pins the invariants that matter (explained variance ordering,
    * norm preservation bound, determinism within a session). Output:
    * (vec_id, pc — the k projected coordinates as a CSV string for
    * scalar-typed harnesses). */
  def pcaProject(df: DataFrame, k: Int,
                 idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    import org.apache.spark.ml.feature.PCA
    import org.apache.spark.ml.linalg.{Vector, Vectors}
    val toVec = udf { (arr: Seq[Float]) => Vectors.dense(arr.map(_.toDouble).toArray) }
    // null embeddings dropped — no geometry, and un-guarded they NPE the
    // vector-conversion lambda (r11 fuzz)
    val c = df.filter(col(vecCol).isNotNull)
      .select(col(idCol).as("vec_id"), toVec(col(vecCol)).as("fv"))
    // PCA.fit aborts on an empty input; an empty projection is correct
    if (c.isEmpty)
      return c.select(col("vec_id"), lit(null).cast("string").as("pc_csv"))
    val model = new PCA().setK(k).setInputCol("fv").setOutputCol("pc").fit(c)
    // Locale.ROOT: the f"" interpolator formats via the JVM default
    // locale — a comma-decimal default (de_DE, fr_FR) would corrupt the
    // comma-joined CSV into ambiguous fields
    val csv = udf { (v: Vector) =>
      v.toArray.map(x => String.format(java.util.Locale.ROOT, "%.6f",
        Double.box(x))).mkString(",")
    }
    model.transform(c)
      .select(col("vec_id"), csv(col("pc")).as("pc_csv"))
      .orderBy(col("vec_id"))
  }

  /** Embedding-distribution drift between two vector populations — the
    * monitoring twin of the scalar drift family for the embedding
    * column: per-dimension EXACT-decimal centroid means on each side,
    * then the L2 norm of the mean-shift vector and the worst single
    * dimension's |shift|. The signal a pipeline watches when the
    * upstream encoder or corpus mix changes.
    *
    * Determinism: each mean is an order-independent DECIMAL(38,12) sum
    * over exact float-widened elements (the [[labelCentroids]] policy,
    * same ≤10⁻¹² element-level rounding caveat); the diff² sum runs
    * through a position-ordered window and rounds at 6 dp.
    *
    * Plan shape: one posexplode + hash aggregate per side keyed by
    * dimension (map-side combined, O(dim) rows out); everything after
    * operates on the dim-sized frame. */
  def centroidShift(a: DataFrame, b: DataFrame,
                    vecCol: String = "embedding", roundTo: Int = 6): DataFrame = {
    def dimMeans(df: DataFrame, out: String) = df
      .select(posexplode(col(vecCol)).as(Seq("pos", "e")))
      .groupBy("pos")
      .agg((sum(col("e").cast("double").cast("decimal(38,12)")).cast("double") /
        count(lit(1))).as(out))
    val wCum = Window.orderBy("pos")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // FULL OUTER on pos: an encoder width change (768 → 1024) is exactly
    // the event this monitor watches for — an inner join would silently
    // restrict the shift to the shared prefix and underreport it. A
    // dimension absent on one side contributes its full |mean| (missing
    // ≡ zero mean), and n_dims reports the union width.
    dimMeans(a, "ma").join(dimMeans(b, "mb"), Seq("pos"), "full_outer")
      .withColumn("diff", coalesce(col("ma"), lit(0.0)) - coalesce(col("mb"), lit(0.0)))
      .withColumn("cum", sum(col("diff") * col("diff")).over(wCum))
      .agg(count(lit(1)).as("n_dims"),
        round(sqrt(max("cum")), roundTo).as("l2_shift"),
        round(max(abs(col("diff"))), roundTo).as("max_abs_shift"))
  }

  /** Per-label mean embedding (class centroids), one output row per
    * (label, dimension) — the prototype-vector primitive behind label
    * diagnostics, nearest-class-mean classification, and IVF seeding.
    *
    * Determinism: each float element is EXACT as a double and is cast to
    * DECIMAL(38,12) — the decimal SUM is then exact and order-independent,
    * so the mean never wobbles across partitionings or reruns (an
    * unordered double sum would). The one cross-engine seam left is the
    * per-element decimal rounding itself: a float whose value is an odd
    * multiple of 2⁻¹³ lands exactly half-way at scale 12, where Spark
    * rounds HALF_UP and DuckDB half-even — a ≤10⁻¹² element-level wobble,
    * which the published 6-dp mean absorbs (the same rounding convention
    * as the drift metrics).
    *
    * Scale shape: posexplode → ONE hash aggregate keyed by
    * (label, dimension) with map-side partial combine; shuffled rows are
    * O(|labels|·dim) after the combine, never O(corpus). */
  def labelCentroids(df: DataFrame, labelCol: String = "label",
                     vecCol: String = "embedding"): DataFrame =
    df.select(col(labelCol).as("label"), posexplode(col(vecCol)).as(Seq("pos", "e")))
      .groupBy("label", "pos")
      .agg(
        round(sum(col("e").cast("double").cast("decimal(38,12)")).cast("double") /
          count(lit(1)), 6).as("mean_v"),
        count(lit(1)).as("n"))
      .orderBy("label", "pos")

  /** Hybrid retrieval: BM25 lexical candidates fused with cosine
    * semantic candidates by reciprocal-rank fusion (RRF, Cormack et al.
    * 2009 — public; the standard fusion in every modern RAG stack):
    * `rrf = Σ_side 1/(60 + rank_side)`, a doc absent from one side
    * contributing 0 for it. Ranks, not scores, are fused — RRF needs no
    * cross-side score calibration, which is what makes it robust.
    *
    * Scale shape: both candidate generators are already partial top-k
    * plans — BM25 ends in TakeOrderedAndProject, cosine in the bounded
    * TopKByScore aggregate — so the fusion join sees at most 2·depth
    * rows however large the corpus; the lexical rank window sorts a
    * ≤depth frame (bounded constant, not data-scaled). Ties in rrf
    * (same single-side rank on opposite sides) break on doc id. */
  def hybridSearch(docs: DataFrame, embeddings: DataFrame, terms: Seq[String],
                   queryVecId: Long, depth: Int, k: Int,
                   textCol: String = "text", docIdCol: String = "doc_id"): DataFrame = {
    val lex = TextStats.bm25Search(docs, textCol, docIdCol, terms, depth)
      .select(col("doc_id"),
        row_number().over(Window.orderBy(col("score").desc, col("doc_id")))
          .as("r_lex"))
    val sem = cosineTopK(embeddings.filter(col("vec_id") === queryVecId),
        embeddings, depth)
      .select(col("cid").as("doc_id"), col("rk").cast("int").as("r_sem"))
    lex.join(sem, Seq("doc_id"), "full_outer")
      .select(col("doc_id"), col("r_lex"), col("r_sem"),
        (coalesce(lit(1.0) / (lit(60) + col("r_lex")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(60) + col("r_sem")), lit(0.0))).as("rrf"))
      .orderBy(col("rrf").desc, col("doc_id"))
      .limit(k)
  }
}
