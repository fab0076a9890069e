package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class ChunkingSpec extends SparkSpec {

  test("packBins: capacity respected, every doc packed once, overflow flagged, deterministic") {
    val docs = graft.Tables.documents(spark, Sf)
    val budget = 128
    val out = Chunking.packBins(docs, "text", "doc_id", budget = budget, groups = 8)
      .cache()
    try {
      // completeness: every doc assigned exactly once
      assert(out.count() == docs.count())
      assert(out.select("doc_id").distinct().count() == docs.count())
      // capacity: no non-overflow bin exceeds the budget; overflow bins
      // hold exactly one oversized doc
      val bins = out.groupBy("bin_id")
        .agg(sum(col("n_tokens")).as("fill"), count(lit(1)).as("n"),
          max(col("overflow").cast("int")).as("ov"))
      assert(bins.filter(col("ov") === 0 && col("fill") > budget).count() == 0)
      assert(bins.filter(col("ov") === 1 && col("n") =!= 1).count() == 0)
      assert(out.filter(col("overflow") && col("n_tokens") <= budget).count() == 0)
      // FFD packs reasonably tight: mean fill of full (non-overflow,
      // non-last-per-group) bins well above half the budget
      val nBins = bins.filter(col("ov") === 0).count().toDouble
      val totTok = out.filter(!col("overflow")).agg(sum("n_tokens"))
        .head().getLong(0).toDouble
      assert(nBins <= 2.0 * math.ceil(totTok / budget) + 8,
        s"bin count $nBins vs token mass ${totTok / budget}")
      // pure function of the input
      val again = Chunking.packBins(docs.repartition(13), "text", "doc_id",
        budget = budget, groups = 8)
      assert(again.collect().map(_.toSeq).toSeq == out.collect().map(_.toSeq).toSeq)
    } finally out.unpersist()
  }

  test("packBins auto groups: plan-stats-derived, so the per-group slice is bounded, not corpus/32") {
    val docs = graft.Tables.documents(spark, Sf)
    // small corpus → the floor (keep all cores busy)
    assert(Chunking.autoGroups(docs) == 32)
    // groups grow linearly with the scan estimate: a frame whose
    // optimizer size estimate is ~N group-targets derives ~N groups, so
    // docs-per-group stays CONSTANT as the corpus scales (the old fixed
    // 32 grew the per-task slice as corpus/32)
    val t = Chunking.GroupTargetInputBytes
    assert(Chunking.autoGroups(BigInt(1)) == 32)
    assert(Chunking.autoGroups(BigInt(t) * 100) == 101)
    assert(Chunking.autoGroups(BigInt(t) * 1000000) == 1000001)
    // a 100 TB corpus derives ~400k groups → per-task slice stays ~256 MB
    assert(Chunking.autoGroups(BigInt(100L * (1L << 40))) == 409601)
    // the auto path packs correctly end to end (same invariants as the
    // fixed-groups case: complete + capacity-clean)
    val out = Chunking.packBins(docs, "text", "doc_id", budget = 128)
    assert(out.count() == docs.count())
    val badBins = out.filter(!col("overflow")).groupBy("bin_id")
      .agg(sum("n_tokens").as("fill")).filter(col("fill") > 128).count()
    assert(badBins == 0)
  }

  test("packBins bin-count bounds hold on the adversarial half-full workload") {
    import spark.implicits._
    // items of budget/2 + 1 tokens: no two fit one bin, so EVERY bin ends
    // just over half full — the worst case for the audit's first-fit
    // upper bound (n_bins ≤ 2·mass/budget + groups). 40 docs of 65
    // tokens, budget 128 → 40 bins, mass 2600, bound = 40 + groups.
    val docs = (1L to 40L).map(i => (i, Seq.fill(65)("w").mkString(" ")))
      .toDF("doc_id", "text")
    val out = Chunking.packBins(docs, "text", "doc_id", budget = 128, groups = 4)
    val bins = out.filter(!col("overflow")).groupBy("bin_id")
      .agg(sum("n_tokens").as("fill"))
    val nBins = bins.count()
    assert(nBins == 40, s"one 65-token doc per 128-budget bin, got $nBins bins")
    assert(bins.filter(col("fill") > 128).count() == 0)
    val mass = 40L * 65L
    assert(nBins <= math.floor(mass * 2.0 / 128).toLong + 4,
      "first-fit half-full upper bound must cover the adversarial case")
    assert(nBins >= math.ceil(mass / 128.0).toLong)
  }

  test("token chunks cover every token at the declared stride and reassemble exactly") {
    val docs = graft.Tables.documents(spark, Sf)
    val chunks = Chunking.tokenChunks(docs, "text", "doc_id", 32, 24).collect()
    val texts = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val byDoc = chunks.groupBy(_.getLong(0))
    assert(byDoc.keySet == texts.keySet)
    for ((id, rows) <- byDoc) {
      val toks = texts(id).split(" ")
      val sorted = rows.sortBy(_.getInt(1))
      sorted.foreach { r =>
        val i = r.getInt(1)
        val expect = toks.slice(i * 24, i * 24 + 32)
        assert(r.getString(3) == expect.mkString(" "), s"doc $id chunk $i")
        assert(r.getInt(2) == expect.length)
      }
      // the last chunk reaches the end of the document — full coverage
      val last = sorted.last
      assert(last.getInt(1) * 24 + last.getInt(2) == toks.length)
      assert(sorted.length ==
        math.ceil(math.max(toks.length - 32, 0) / 24.0).toInt + 1)
    }
  }

  test("packing conserves tokens, fills every bin to capacity, splits docs losslessly") {
    val docs = graft.Tables.documents(spark, Sf)
    val rows = Chunking.packSequences(docs, "text", "doc_id", 256).collect()
    val nTok = docs.select(sum(size(split(col("text"), " ")))).head.getLong(0)
    assert(rows.map(_.getLong(4)).sum == nTok, "packing must conserve tokens")
    val perBin = rows.groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(4)).sum)
    val maxBin = perBin.keys.max
    perBin.foreach { case (b, n) =>
      if (b < maxBin) assert(n == 256, s"interior bin $b holds $n tokens")
      else assert(n <= 256)
    }
    // per-document spans tile [0, n): start at 0, end at n, contiguous
    val lens = docs.select(col("doc_id"), size(split(col("text"), " ")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    rows.groupBy(_.getLong(1)).foreach { case (id, spans) =>
      val s = spans.sortBy(_.getLong(2))
      assert(s.head.getLong(2) == 0L)
      assert(s.last.getLong(3) == lens(id).toLong)
      s.sliding(2).foreach {
        case Array(a, b) => assert(a.getLong(3) == b.getLong(2),
          s"doc $id spans must be contiguous")
        case _ =>
      }
    }
  }

  test("two-pass packing equals the global-window formulation and ignores partitioning") {
    val docs = graft.Tables.documents(spark, Sf)
    val a = Chunking.packSequences(docs, "text", "doc_id", 256)
    val b = Chunking.packSequences(docs.repartition(17), "text", "doc_id", 256)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      "bin assignment must not depend on input partitioning")
    val base = docs.select(col("doc_id").cast("long").as("doc_id"),
      size(split(col("text"), " ")).cast("long").as("n"))
    val w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
    val ref = base.withColumn("gstart", coalesce(sum("n").over(w), lit(0L)))
      .withColumn("gend", col("gstart") + col("n"))
      .select(col("doc_id"), col("gstart"), col("gend"),
        explode(sequence(expr("gstart div 256"),
          expr("(gend - 1) div 256"))).as("bin_id"))
      .select(col("bin_id"), col("doc_id"),
        (greatest(col("gstart"), col("bin_id") * 256) - col("gstart")).as("tok_start"),
        (least(col("gend"), col("bin_id") * 256 + 256) - col("gstart")).as("tok_end"))
      .withColumn("n_tokens", col("tok_end") - col("tok_start"))
    assert(a.exceptAll(ref).isEmpty && ref.exceptAll(a).isEmpty,
      "two-pass prefix sums must be bitwise-identical to the global window")
  }

  test("the only unpartitioned windows in the packing plan ride aggregated frames") {
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.execution.aggregate.HashAggregateExec
    val df = Chunking.packSequences(
      graft.Tables.documents(spark, Sf), "text", "doc_id", 256)
    val unpart = physicalPlan(df).collect {
      case w: WindowExec if w.partitionSpec.isEmpty => w
    }
    assert(unpart.nonEmpty,
      "expected the offsets-frame window in the plan — a zero hit means the sweep went vacuous")
    // the ≤buckets-row offsets frame may sort on one task; the corpus
    // cumulative pass must not
    unpart.foreach { w =>
      val aggBelow = w.collect { case a: HashAggregateExec => a }
      assert(aggBelow.nonEmpty,
        s"unpartitioned window over an unaggregated frame:\n$w")
    }
  }

  test("tokenChunks rejects stride > chunkSize (gaps would silently drop tokens)") {
    import spark.implicits._
    val df = Seq((1L, "a b c d e f g h i j")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      Chunking.tokenChunks(df, "text", "doc_id", chunkSize = 4, stride = 6)
    }
    assert(e.getMessage.contains("stride"))
  }
}
