package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog today"),
    (1L, "the quick brown fox jumps over the lazy cat today"),  // near-dup of 0
    (2L, "spark makes big data processing fast and scalable always"),
    (3L, "the quick brown fox jumps over the lazy dog today"),  // exact dup of 0
    (4L, "completely different content about databases and queries here now")
  ).toDF("doc_id", "text")

  test("native shingle_hashes / minhash_sig equal the HOF reference forms") {
    // the real documents table exercises vocabulary beyond the fixture
    val real = graft.Tables.documents(spark, Sf).select(col("doc_id"), col("text"))
    val both = real.select(
      col("doc_id"),
      Dedup.shingleHashArray(real, "text", 3).as("native"),
      Dedup.shingleHashes(col("text"), 3).as("hof"),
      size(split(col("text"), " ")).as("ntoks"))
    both.collect().foreach { r =>
      val native = r.getSeq[Long](1)
      val hof = r.getSeq[Any](2)
      if (r.getInt(3) >= 3)
        assert(native == hof, s"doc ${r.getLong(0)}: $native vs $hof")
      else assert(native.isEmpty) // HOF emits a partial-window shingle; native none
    }
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val sigs = real.select(
      Dedup.shingleHashArray(real, "text", 3).as("sh"))
      .filter(size(col("sh")) > 0)
      .select(
        call_function("minhash_sig", col("sh"), lit(8)).as("native"),
        Dedup.minhashSignatureFromHashes(col("sh"), 8).as("hof"))
    sigs.collect().foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Any](1), s"${r.getSeq[Long](0)} vs ${r.getSeq[Any](1)}")
    }
  }

  test("prefix-filtered jaccard equals the unfiltered inverted-index join (lossless)") {
    val real = graft.Tables.documents(spark, Sf).select(col("doc_id"), col("text"))
    for (t <- Seq(0.3, 0.5, 0.6, 0.8)) {
      // unfiltered reference: full index join + shared counts
      val sh = Dedup.shingleHashFrame(real, "text", "doc_id", 3)
      val sizes = sh.groupBy("id").agg(count(lit(1)).as("sz"))
      val ref = sh.alias("a").join(sh.alias("b"),
          col("a.s") === col("b.s") && col("a.id") < col("b.id"))
        .groupBy(col("a.id").as("ida"), col("b.id").as("idb"))
        .agg(count(lit(1)).as("shared"))
        .join(sizes.withColumnRenamed("id", "ida").withColumnRenamed("sz", "sza"), "ida")
        .join(sizes.withColumnRenamed("id", "idb").withColumnRenamed("sz", "szb"), "idb")
        .withColumn("j", col("shared").cast("double") / (col("sza") + col("szb") - col("shared")))
        .filter(col("j") >= t)
        .select(col("ida"), col("idb"), col("j"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val got = Dedup.ngramJaccardPairs(real, "text", "doc_id", 3, t)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got == ref, s"t=$t: ${(ref -- got).take(3)} missing, ${(got -- ref).take(3)} extra")
    }
  }

  test("exact dedup keeps min id with multiplicity") {
    val out = Dedup.exact(docs, "text", "doc_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(0L) == 2L) // docs 0 and 3
    assert(out(1L) == 1L && out(2L) == 1L && out(4L) == 1L)
    assert(!out.contains(3L))
  }

  test("normalized dedup collapses case/whitespace variants") {
    val d = Seq((0L, "Hello  World"), (1L, "hello world")).toDF("doc_id", "text")
    val out = Dedup.exactNormalized(d, "text", "doc_id").collect()
    assert(out.length == 1 && out(0).getLong(1) == 2L)
  }

  test("ngram jaccard finds the near-dup pair and not unrelated docs") {
    val pairs = Dedup.ngramJaccardPairs(docs, "text", "doc_id", 3, 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.contains((0L, 1L)))
    assert(pairs.contains((0L, 3L)) && pairs.contains((1L, 3L))) // exact dup pairs
    assert(!pairs.exists(p => p._1 == 2L || p._2 == 2L))
  }

  test("minhash LSH recalls the same pairs as exact jaccard here") {
    val exact = Dedup.ngramJaccardPairs(docs, "text", "doc_id", 3, 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashLshPairs(docs, "text", "doc_id", 3, 32, 8, 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh == exact)
  }

  test("nearDupPairsAuto dispatches AllPairs below the ceiling, minhash above — same pairs") {
    val real = graft.Tables.documents(spark, Sf).select(col("doc_id"), col("text"))
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val viaExact = Dedup.nearDupPairsAuto(real, "text", "doc_id", 3, 0.6,
      maxExactInputBytes = Long.MaxValue)
    val viaMinhash = Dedup.nearDupPairsAuto(real, "text", "doc_id", 3, 0.6,
      maxExactInputBytes = 0L)
    // the forced paths must be the two real physical forms, not one form twice
    assert(viaExact.queryExecution.executedPlan.toString !=
      viaMinhash.queryExecution.executedPlan.toString)
    // on this corpus the banding recalls every ≥0.6 pair, and collisions
    // verify with exact Jaccard — so the dispatch is output-invisible
    assert(pairSet(viaExact) == pairSet(Dedup.ngramJaccardPairs(real, "text", "doc_id", 3, 0.6)))
    assert(pairSet(viaMinhash) == pairSet(viaExact))
    // downstream clustering is therefore identical on both paths
    val cExact = Dedup.dedupClusters(viaExact).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val cMin = Dedup.dedupClusters(viaMinhash).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cExact == cMin)
  }

  test("minhash signature: identical docs identical sigs; near-dups mostly agree") {
    val sigs = docs.select(col("doc_id"),
        Dedup.minhashSignature(col("text"), 3, 32).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sigs(0L) == sigs(3L))
    val agree01 = sigs(0L).zip(sigs(1L)).count { case (a, b) => a == b }
    assert(agree01 > 16) // jaccard ~0.75 → most minhashes agree
    val agree02 = sigs(0L).zip(sigs(2L)).count { case (a, b) => a == b }
    assert(agree02 < 8)
  }

  test("simhash: exact dups hamming 0; near-dups small; unrelated large") {
    val fps = docs
      .select(col("doc_id"), Dedup.spreadHashes(col("text")).as("__hs"))
      .select(col("doc_id"), Dedup.simhashExpr("__hs").as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(fps(0L), fps(3L)) == 0)
    assert(hamming(fps(0L), fps(1L)) <= 10)
    assert(hamming(fps(0L), fps(4L)) > 10)
  }

  test("simhashed (codegen agg form) equals simhashExpr (HOF form)") {
    val viaAgg = Dedup.simhashed(docs, "text", "doc_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaExpr = docs
      .select(col("doc_id"), Dedup.spreadHashes(col("text")).as("__hs"))
      .select(col("doc_id"), Dedup.simhashExpr("__hs").as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaAgg == viaExpr)
  }

  test("simhash pairs finds exact-dup pair via block join") {
    val pairs = Dedup.simhashPairs(docs, "text", "doc_id", 3).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.contains((0L, 3L)))
  }

  test("cross-corpus containment finds probe docs covered by the corpus") {
    val corpus = Seq(
      (10L, "the quick brown fox jumps over the lazy dog today and more words here"),
      (11L, "entirely unrelated corpus content about spark and scala engines")
    ).toDF("doc_id", "text")
    val probe = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"), // contained in 10
      (2L, "no overlap with anything in this corpus whatsoever")
    ).toDF("doc_id", "text")
    val out = Dedup.crossContainment(corpus, probe, "text", "doc_id", 3, 0.6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.length == 1 && out(0)._1 == 1L && out(0)._2 == 10L)
    assert(out(0)._3 == 1.0, s"probe 1 fully contained: ${out(0)._3}")
  }

  test("dedup clusters: transitive chains collapse to the min id") {
    val pairs = Seq((1L, 5L), (5L, 9L), (20L, 21L)).toDF("ida", "idb")
    val out = Dedup.dedupClusters(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 5L -> 1L, 9L -> 1L, 20L -> 20L, 21L -> 20L))
    // empty pair set → empty mapping
    assert(Dedup.dedupClusters(Seq.empty[(Long, Long)].toDF("ida", "idb")).isEmpty)
  }

  test("dedupClustersAuto: driver path below the edge ceiling, distributed above — same output") {
    val pairs = Seq((1L, 5L), (5L, 9L), (20L, 21L)).toDF("ida", "idb")
    val expect = Map(1L -> 1L, 5L -> 1L, 9L -> 1L, 20L -> 20L, 21L -> 20L)
    def localRelation(df: org.apache.spark.sql.DataFrame): Boolean =
      df.queryExecution.optimizedPlan.collect {
        case _: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => ()
      }.nonEmpty
    // default ceiling (≫ 3 edges): the driver union-find runs — its
    // output is a LocalRelation (driver-materialized)
    val viaDriver = Dedup.dedupClustersAuto(pairs)
    assert(localRelation(viaDriver), "below the ceiling the driver path must run")
    assert(viaDriver.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap == expect)
    // zero ceiling trips the dispatch: label propagation runs (no
    // LocalRelation — the labels ride a checkpointed RDD), same rows
    val viaDist = Dedup.dedupClustersAuto(pairs, maxDriverEdges = 0L)
    assert(!localRelation(viaDist), "above the ceiling the distributed path must run")
    assert(viaDist.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap == expect)
  }

  test("rep-map broadcast is size-gated, not forced: strategy flips across the ceiling") {
    val docs = (1L to 40L).map(i => (i, s"doc number $i")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("ida", "idb")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // disable the planner's own auto-broadcast so the physical join
      // strategy reflects ONLY our hint
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      def strategies(df: org.apache.spark.sql.DataFrame): String = {
        df.collect() // finalize the adaptive plan
        physicalPlan(df).toString
      }
      val hinted = strategies(Dedup.softDedupWeights(docs, pairs, "doc_id"))
      assert(hinted.contains("BroadcastHashJoin"),
        s"small rep map must broadcast:\n$hinted")
      val unhinted = strategies(
        Dedup.softDedupWeights(docs, pairs, "doc_id", maxBcBytes = 0L))
      assert(!unhinted.contains("BroadcastHashJoin"),
        s"rep map above the ceiling must NOT be force-broadcast:\n$unhinted")
      val split = strategies(graft.ext.Sampling.leakageSafeSplit(
        docs, pairs, "doc_id", 800, 100, maxBcBytes = 0L))
      assert(!split.contains("BroadcastHashJoin"),
        s"leakage-split rep map above the ceiling must NOT be force-broadcast:\n$split")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("verify fixtures sit below the near-dup dispatch ceilings (pin, not assumption)") {
    // x_neardup_auto / x_minhash_lsh_auto reuse the EXACT oracles on the
    // premise that the fixtures dispatch to the lossless path; if a
    // fixture's plan-stats estimate ever crosses a ceiling the engine
    // would silently band/cap while the oracle still expects exact — a
    // confusing fail-closed break. Pin the premise so fixture/ceiling
    // drift fails loudly HERE instead.
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
                    "/root/testdata/sf0.1")) {
      val est = graft.Tables.documents(spark, dir)
        .queryExecution.optimizedPlan.stats.sizeInBytes
      assert(est <= Dedup.AllPairsExactMaxInputBytes,
        s"$dir documents estimate $est crossed the AllPairs ceiling " +
          s"${Dedup.AllPairsExactMaxInputBytes}: x_neardup_auto would band while " +
          "its oracle expects exact — re-point the oracle or raise the ceiling")
      assert(est <= Dedup.MinhashUncappedMaxInputBytes,
        s"$dir documents estimate $est crossed the minhash uncapped ceiling " +
          s"${Dedup.MinhashUncappedMaxInputBytes}: x_minhash_lsh_auto would cap while " +
          "its oracle expects uncapped")
    }
  }

  test("distributed label propagation equals the driver union-find") {
    // a long path (worst case for propagation: diameter = edge count), a
    // star, a triangle with a multi-edge, and reversed-order edges
    val pairs = Seq(
      (9L, 8L), (8L, 7L), (7L, 6L), (6L, 5L), (5L, 4L), (4L, 3L), // path 3..9
      (100L, 50L), (100L, 60L), (100L, 70L),                      // star, min inside
      (200L, 201L), (201L, 202L), (200L, 202L), (200L, 202L)      // triangle + dup edge
    ).toDF("ida", "idb")
    val viaDriver = Dedup.dedupClusters(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).sorted
    val viaDist = Dedup.dedupClustersDistributed(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).sorted
    assert(viaDist.sameElements(viaDriver))
    assert(viaDist.toMap.apply(9L) == 3L) // full path collapsed
    // and on the real detector output at the fixture scale factor
    val real = Dedup.ngramJaccardPairs(
      graft.Tables.documents(spark, Sf), "text", "doc_id", 3, 0.6)
    val a = Dedup.dedupClusters(real).collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val b = Dedup.dedupClustersDistributed(real).collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(a.nonEmpty && b.sameElements(a))
  }

  test("dedup delta keeps only batch-first docs unseen in the existing corpus") {
    val existing = Seq((0L, "Alpha  Beta"), (3L, "gamma delta")).toDF("doc_id", "text")
    val incoming = Seq(
      (10L, "alpha beta"),     // normalized dup of existing 0 -> dropped
      (11L, "epsilon zeta"),   // new
      (12L, "epsilon  ZETA"),  // batch-internal dup of 11 -> collapsed
      (13L, "eta theta")       // new
    ).toDF("doc_id", "text")
    val out = Dedup.dedupDelta(existing, incoming, "text", "doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq((11L, 2L), (13L, 1L)))
  }

  test("neardup delta flags batch docs near the corpus, exact jaccard values") {
    val existing = Seq(
      (0L, "the quick brown fox jumps over the lazy dog today"),
      (3L, "completely different corpus text about other things entirely")
    ).toDF("doc_id", "text")
    val incoming = Seq(
      (10L, "the quick brown fox jumps over the lazy dog tonight"), // near 0
      (11L, "unrelated fresh content with novel wording throughout") // new
    ).toDF("doc_id", "text")
    val out = Dedup.neardupDelta(existing, incoming, "text", "doc_id", 3, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.length == 1 && out(0)._1 == 10L && out(0)._2 == 0L)
    // 10 tokens → 8 shingles per doc, 7 shared → J = 7/9
    assert(math.abs(out(0)._3 - 7.0 / 9.0) < 1e-12)
    // threshold above the pair's jaccard → empty
    assert(Dedup.neardupDelta(existing, incoming, "text", "doc_id", 3, 0.9).count() == 0)
  }

  test("passage dedup keeps only corpus-wide first passage occurrences") {
    // 2-token passages: doc 0 = [a b][c d], doc 1 = [a b][x y] (first
    // passage duplicates doc 0's), doc 2 = [c d][a b] (both passages
    // already seen), doc 3 = odd length -> short trailing passage
    val df = Seq(
      (0L, "a b c d"),
      (1L, "a b x y"),
      (2L, "c d a b"),
      (3L, "p q r")
    ).toDF("doc_id", "text")
    val out = Dedup.passageDedup(df, "text", "doc_id", 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(out.toSeq == Seq(
      (0L, 2L, 0L, "a b c d"),
      (1L, 2L, 1L, "x y"),
      (2L, 2L, 2L, ""),      // fully duplicated doc collapses to empty
      (3L, 2L, 0L, "p q r")  // trailing short passage is its own unit
    ))
    // token conservation: every token is kept exactly once corpus-wide
    val keptTokens = out.map(_._4).filter(_.nonEmpty).flatMap(_.split(" ")).length
    val distinctPassageTokens = Seq("a b", "c d", "x y", "p q", "r")
      .flatMap(_.split(" ")).length
    assert(keptTokens == distinctPassageTokens)
  }

  test("bloom contamination is a superset of exact containment flags") {
    val docs = graft.Tables.documents(spark, Sf)
    val corpus = docs.filter(col("doc_id") % 10 =!= 0)
    val probe = docs.filter(col("doc_id") % 10 === 0)
    val exact = Dedup.crossContainment(corpus, probe, "text", "doc_id", 3, 0.6)
      .select("corpus_id").distinct().collect().map(_.getLong(0)).toSet
    val bloom = Dedup.bloomContamination(corpus, probe, "text", "doc_id", 3, 1 << 20, 0.6)
      .select("corpus_id").collect().map(_.getLong(0)).toSet
    // k=1 bloom membership is collision-tolerant: never misses a true
    // hit, may add false ones — flagged set must contain the exact set
    assert(exact.subsetOf(bloom), s"exact-only ids: ${exact.diff(bloom)}")
    // and with a tiny bitmap the false-positive rate must visibly rise
    // (sanity that `bits` is actually the knob)
    val tiny = Dedup.bloomContamination(corpus, probe, "text", "doc_id", 3, 256, 0.6)
      .select("corpus_id").collect().map(_.getLong(0)).toSet
    assert(bloom.subsetOf(tiny) && tiny.size >= bloom.size)
  }

  test("minhashDelta ⊆ neardupDelta with identical scores where recalled") {
    val docs = graft.Tables.documents(spark, Sf)
    import org.apache.spark.sql.functions.col
    val corpus = docs.filter(col("doc_id") % 3 === 0)
    val batch = docs.filter(col("doc_id") % 3 =!= 0)
    val banded = Dedup.minhashDelta(corpus, batch, "text", "doc_id").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // the exact inverted-index form, reduced to the same best-match shape
    val exact = Dedup.neardupDelta(corpus, batch, "text", "doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1).map { case (b, ms) =>
        val best = ms.minBy { case (_, cid, j) => (-j, cid) }
        b -> (best._2, best._3)
      }
    // banding can only MISS pairs, never invent them; recalled ids agree
    assert(banded.keySet.subsetOf(exact.keySet))
    banded.foreach { case (b, (cid, j)) =>
      assert(exact(b) == (cid, j), s"batch $b: banded ($cid,$j) vs exact ${exact(b)}")
    }
    // at these near-dup similarities the 8×4 banding recalls nearly all
    assert(banded.size >= exact.size * 7 / 10, s"${banded.size} of ${exact.size}")
  }

  test("neardupDeltaBanded ⊆ neardupDelta, identical pairs+scores; auto dispatches on batch size") {
    val docs = graft.Tables.documents(spark, Sf)
    import org.apache.spark.sql.functions.col
    val corpus = docs.filter(col("doc_id") % 3 === 0)
    val batch = docs.filter(col("doc_id") % 3 =!= 0)
    val exact = Dedup.neardupDelta(corpus, batch, "text", "doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val banded = Dedup.neardupDeltaBanded(corpus, batch, "text", "doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // band candidates can only MISS pairs, never invent them; every
    // recalled pair carries the identical exact-verified jaccard
    assert(banded.keySet.subsetOf(exact.keySet),
      s"banded-only pairs: ${banded.keySet.diff(exact.keySet)}")
    banded.foreach { case (k, j) => assert(exact(k) == j, s"pair $k: $j vs ${exact(k)}") }
    assert(banded.size >= exact.size * 7 / 10, s"${banded.size} of ${exact.size}")
    // auto: a small batch takes the exact path verbatim...
    val auto = Dedup.neardupDeltaAuto(corpus, batch, "text", "doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(auto == exact)
    // ...and a zero byte ceiling forces the banded path
    val forced = Dedup.neardupDeltaAuto(corpus, batch, "text", "doc_id",
        maxExactBatchBytes = 0L).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(forced == banded)
  }

  test("softDedupWeights: every doc kept, cluster mass sums to one doc each") {
    val pairs = Dedup.ngramJaccardPairs(docs, "text", "doc_id", 3, 0.6)
    val out = Dedup.softDedupWeights(docs, pairs, "doc_id").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out.keySet == Set(0L, 1L, 2L, 3L, 4L), "all docs survive")
    // docs 0/1/3 cluster together; 2 and 4 are singletons
    assert(out(0L)._1 == 3 && out(1L)._1 == 3 && out(3L)._1 == 3)
    assert(out(2L) == (1L, 1.0) && out(4L) == (1L, 1.0))
    // total weight = number of distinct clusters (3): each cluster
    // contributes exactly one document's worth of training mass
    assert(math.abs(out.values.map(_._2).sum - 3.0) < 1e-12)
  }

  test("docNovelty: unique doc 1.0, duplicated docs 0.0, short doc null") {
    import spark.implicits._
    val df = Seq(
      (1L, "alpha beta gamma delta"),       // unique content → 1.0
      (2L, "one two three four five"),      // duplicated with 3 → 0.0
      (3L, "one two three four five"),
      (4L, "hi")                            // < n tokens → no shingles
    ).toDF("doc_id", "text")
    val out = Dedup.docNovelty(df, "text", "doc_id").collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getDouble(3) == 1.0)
    assert(out(2L).getDouble(3) == 0.0 && out(3L).getDouble(3) == 0.0)
    assert(out(4L).getLong(1) == 0L && out(4L).isNullAt(3))
  }

  test("noveltyYield: exact copy scores 0, disjoint content scores 1") {
    val corpus = docs.filter($"doc_id" <= 1)   // docs 0 and 1
    val batch = docs.filter($"doc_id" >= 2)    // 2 (new), 3 (copy of 0), 4 (new)
    val out = Dedup.noveltyYield(corpus, batch, "text", "doc_id").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out.keySet == Set(2L, 3L, 4L))
    assert(out(3L)._2 == 0 && out(3L)._3 == 0.0, "exact re-crawl has zero novelty")
    assert(out(2L)._3 == 1.0 && out(4L)._3 == 1.0, "unseen content is fully novel")
    out.values.foreach { case (nSh, nNew, nov) =>
      assert(nNew >= 0 && nNew <= nSh && nov >= 0.0 && nov <= 1.0)
    }
  }

  test("contamination attribution: leaked shingles ranked by corpus spread") {
    import spark.implicits._
    // probe doc 0 shares "a b c" with corpus docs 1,2,3 and "x y z"
    // with corpus doc 4 only; shingle "q r s" never leaks
    val corpus = Seq(
      (1L, "a b c one"), (2L, "two a b c"), (3L, "a b c three"),
      (4L, "x y z four"), (5L, "nothing shared here at all"))
      .toDF("doc_id", "text")
    val probe = Seq((10L, "a b c x y z q r s")).toDF("doc_id", "text")
    val out = Dedup.contaminationAttribution(corpus, probe, "text", "doc_id", 3, 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(out.nonEmpty && out.head._2 == 3L,
      s"widest-spread leaked shingle first (a b c in 3 docs): ${out.toSeq}")
    assert(out.map(_._2).toSeq == out.map(_._2).sorted(Ordering[Long].reverse).toSeq,
      "spread-descending order")
    // every reported shingle occurs in ≥1 corpus doc, and the probe's
    // unleaked shingles are absent: counts are 3 (abc) then 1s
    assert(out.map(_._2).count(_ == 3L) >= 1 && out.forall(_._2 >= 1L))
  }

  test("minhash bucketCap: mega-bucket pairs drop, small-bucket pairs survive") {
    import spark.implicits._
    val mega = "alpha beta gamma delta epsilon zeta eta theta"
    val near1 = "one two three four five six seven eight nine ten"
    val near2 = "one two three four five six seven eight nine eleven"
    val docs = ((100L to 107L).map(i => (i, mega)) ++
      Seq((1L, near1), (2L, near2), (3L, "totally unrelated words entirely distinct")))
      .toDF("doc_id", "text")
    val uncapped = Dedup.minhashLshPairs(docs, "text", "doc_id", 3, 32, 16, 0.6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val capped = Dedup.minhashLshPairs(docs, "text", "doc_id", 3, 32, 16, 0.6,
      bucketCap = 4).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // 8 identical docs: every band bucket has size 8 > cap → all 28
    // pairs drop; the (1,2) near-dup sits in 2-doc buckets and survives
    assert(uncapped.contains((1L, 2L)) && capped.contains((1L, 2L)))
    assert(uncapped.count { case (a, b) => a >= 100L && b >= 100L } == 28)
    assert(capped.forall { case (a, b) => a < 100L && b < 100L },
      s"mega-cluster pairs must be capped away, got $capped")
  }

  test("minhashLshAuto: uncapped below the ceiling, capped skew-guard above it") {
    // below (default ceiling ≫ fixture): bit-identical to the raw form
    val auto = Dedup.minhashLshAuto(docs, "text", "doc_id", 3, 32, 8, 0.6)
      .collect().map(_.toSeq).toSeq
    val raw = Dedup.minhashLshPairs(docs, "text", "doc_id", 3, 32, 8, 0.6)
      .collect().map(_.toSeq).toSeq
    assert(auto == raw)
    // above (forced 0-byte ceiling): the dispatch selects the capped
    // operating point — identical to calling the capped form directly
    val capped = Dedup.minhashLshAuto(docs, "text", "doc_id", 3, 32, 8, 0.6,
        maxUncappedBytes = 0L)
      .collect().map(_.toSeq).toSeq
    val expect = Dedup.minhashLshPairs(docs, "text", "doc_id", 3, 32, 8, 0.6,
        bucketCap = Dedup.MinhashBucketCapDefault)
      .collect().map(_.toSeq).toSeq
    assert(capped == expect)
  }

  test("minhash bucketCap: recall holds on the fixture via band redundancy") {
    // sf0.001 corpus at the 16-band operating point: capping drops the
    // oversized buckets yet every verified pair is recalled through its
    // other, smaller buckets — the production trade the cap encodes
    val docs = graft.Tables.documents(spark, Sf)
    val un = Dedup.minhashLshPairs(docs, "text", "doc_id", 3, 32, 16, 0.6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val cp = Dedup.minhashLshPairs(docs, "text", "doc_id", 3, 32, 16, 0.6,
      bucketCap = 4).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cp.subsetOf(un), "cap can only remove candidates, never add")
  }

  test("shingle HOF twins: texts shorter than n yield EMPTY arrays like the native form") {
    // the unguarded window indexed past the token array — an ANSI
    // (Spark 4 default) job abort for any 1- or 2-token document
    val short = Seq((1L, "a b"), (2L, ""), (3L, "a b c d e")).toDF("doc_id", "text")
    val rows = short.select(col("doc_id"),
        Dedup.shingles(col("text"), 3).as("sg"),
        Dedup.shingleHashes(col("text"), 3).as("sh"),
        Dedup.shingleHashArray(short, "text", 3).as("nat"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(rows(1L).getSeq[String](1).isEmpty && rows(1L).getSeq[Long](2).isEmpty)
    assert(rows(2L).getSeq[Long](2).isEmpty && rows(2L).getSeq[Long](3).isEmpty)
    // documented equality with the native form holds where both defined
    assert(rows(3L).getSeq[Long](2).sorted == rows(3L).getSeq[Long](3).sorted)
  }

  test("bandingFor: derived operating point recalls ≥95% at the threshold") {
    def recall(t: Double): Double = {
      val (perms, b) = Dedup.bandingFor(t)
      val r = perms / b
      1.0 - math.pow(1.0 - math.pow(t, r.toDouble), b.toDouble)
    }
    Seq(0.5, 0.6, 0.7, 0.8, 0.9).foreach { t =>
      assert(recall(t) >= 0.95, s"recall at J=$t is ${recall(t)}")
    }
    // the old fixed default (32 perms, 8 bands) was the counterexample
    assert(1.0 - math.pow(1.0 - math.pow(0.6, 4.0), 8.0) < 0.7,
      "fixed 32/8 recalled under 70% at J=0.6 — why the derivation exists")
  }

  test("sourceOverlap: containment both ways on a known shingle overlap") {
    import spark.implicits._
    val df = Seq(
      (1L, "w1 w2 w3 w4", "A"),  // shingles {w1w2w3, w2w3w4}
      (2L, "w2 w3 w4 w5", "B"),  // shingles {w2w3w4, w3w4w5} — shares 1 with A
      (3L, "x1 x2 x3", "C"),     // disjoint from both → no C rows
      (4L, "too short", "A")     // < 3 tokens: contributes nothing
    ).toDF("doc_id", "text", "source")
    val out = Dedup.sourceOverlap(df, "text", "source").collect()
    assert(out.length == 1, s"only the A-B pair shares shingles: ${out.mkString(";")}")
    val r = out(0)
    assert(r.getString(0) == "A" && r.getString(1) == "B")
    assert(r.getLong(2) == 2 && r.getLong(3) == 2 && r.getLong(4) == 1)
    assert(math.abs(r.getDouble(5) - 0.5) < 1e-12)
    assert(math.abs(r.getDouble(6) - 0.5) < 1e-12)
  }

  test("raw all-pairs tools fail loudly above the input ceiling, naming the auto twin") {
    val docs = graft.Tables.documents(spark, Sf)
    // plan-time guard: must throw at CONSTRUCTION, before any job
    val e1 = intercept[IllegalArgumentException] {
      Dedup.ngramJaccardPairs(docs, "text", "doc_id", 3, 0.6, maxRawInputBytes = 1L)
    }
    assert(e1.getMessage.contains("nearDupPairsAuto"))
    val e2 = intercept[IllegalArgumentException] {
      Dedup.neardupDelta(docs, docs, "text", "doc_id", maxRawInputBytes = 1L)
    }
    assert(e2.getMessage.contains("neardupDeltaAuto"))
    // the default ceiling admits the test corpora (both construct fine)
    Dedup.ngramJaccardPairs(docs, "text", "doc_id", 3, 0.6)
    Dedup.neardupDelta(docs, docs, "text", "doc_id")
  }
}
