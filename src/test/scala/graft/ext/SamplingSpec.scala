package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  test("hash sample is deterministic across partitionings and close to the rate") {
    val li = graft.Tables.lineitem(spark, Sf)
    val a = Sampling.hashSample(li, "l_orderkey", 37, 100)
    val b = Sampling.hashSample(li.repartition(13), "l_orderkey", 37, 100)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      "selection must not depend on partitioning")
    val rate = a.count().toDouble / li.count()
    assert(math.abs(rate - 0.37) < 0.05, s"rate $rate")
    // selection is a pure function of the id: an order's lines all share
    // one fate
    val perKey = a.groupBy("l_orderkey").count()
      .join(li.groupBy("l_orderkey").count().withColumnRenamed("count", "all"), "l_orderkey")
    assert(perKey.filter(col("count") =!= col("all")).isEmpty,
      "partial orders would mean the gate depends on more than the id")
  }

  test("perKeyCap equals the window formulation and is partitioning-invariant") {
    import org.apache.spark.sql.expressions.Window
    val docs = graft.Tables.documents(spark, Sf)
    val capped = Sampling.perKeyCap(docs, "doc_id", "source", 10)
    val viaWindow = docs
      .withColumn("rk", row_number().over(
        Window.partitionBy("source").orderBy("doc_id")))
      .filter(col("rk") <= 10).select(col("source"), col("doc_id"))
    assert(capped.exceptAll(viaWindow).isEmpty && viaWindow.exceptAll(capped).isEmpty)
    val reshuffled = Sampling.perKeyCap(docs.repartition(17), "doc_id", "source", 10)
    assert(capped.exceptAll(reshuffled).isEmpty && reshuffled.exceptAll(capped).isEmpty)
    // every source is capped at 10, and under-cap sources keep all rows
    val joined = capped.groupBy("source").count()
      .join(docs.groupBy("source").count().withColumnRenamed("count", "all"), "source")
    assert(joined.filter(col("count") > 10).isEmpty)
    assert(joined.filter(col("all") <= 10 && col("count") =!= col("all")).isEmpty)
  }

  test("stratified rates hold per stratum; unmapped strata drop") {
    val li = graft.Tables.lineitem(spark, Sf)
    val out = Sampling.stratifiedHashSample(li, "l_orderkey", "l_returnflag",
      Map("A" -> (1, 2), "R" -> (1, 10)))
    val got = out.groupBy("l_returnflag").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val base = li.groupBy("l_returnflag").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!got.contains("N"), "unmapped stratum must drop")
    assert(math.abs(got("A").toDouble / base("A") - 0.5) < 0.1)
    assert(math.abs(got("R").toDouble / base("R") - 0.1) < 0.06)
  }

  test("split column partitions every row into exactly one label at ~800/100/100") {
    val li = graft.Tables.lineitem(spark, Sf)
    val counts = li.withColumn("split", Sampling.splitColumn(col("l_orderkey"), 800, 100))
      .groupBy("split").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet == Set("train", "valid", "test"))
    val n = counts.values.sum.toDouble
    assert(n == li.count())
    assert(math.abs(counts("train") / n - 0.8) < 0.05)
    // the same row always lands in the same split (pure function of id)
    val again = li.withColumn("split", Sampling.splitColumn(col("l_orderkey"), 800, 100))
      .groupBy("split").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(again == counts)
  }

  test("gate arithmetic is overflow-free at extreme ids") {
    val big = Seq(Long.MaxValue - 1, 4611686018427387904L, 0L, 1L).toDF("id")
    val gates = big.select(Sampling.gate(col("id")).as("g")).collect().map(_.getLong(0))
    gates.foreach(g => assert(g >= 0 && g < 1000000007L))
  }

  test("mix rebalance: floor group kept whole, selection matches the gate formula exactly") {
    // en 180 / de 90 / fr 30 → uniform target = 30
    val rows = (0L until 300L).map(i =>
      (i, if (i % 10 < 6) "en" else if (i % 10 < 9) "de" else "fr"))
    val df = rows.toDF("id", "g")
    val out = Sampling.mixRebalance(df, "id", "g")
    val got = out.groupBy("g").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

    // reference model: the same RATE-form gate arithmetic in plain Scala
    // (keep iff gate < ⌊M·target/cnt⌋, group kept whole at cnt ≤ target —
    // the mod-cnt spelling was biased once cnt approached M)
    def gate(id: Long) = ((id % 2147483647L) * 2654435761L) % 1000000007L
    def keep(id: Long, t: Long, c: Long): Boolean =
      c <= t || gate(id) < math.floor(1000000007.0 * math.min(t, c).toDouble / c.toDouble)
    val cnt = rows.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val expected = rows.groupBy(_._2).view.mapValues(
      _.count { case (id, g) => keep(id, 30L, cnt(g)) }.toLong).toMap
    assert(got("fr") == 30L, "smallest group must survive in full")
    assert(got == expected, s"got $got expected $expected")

    // deterministic under repartitioning
    val out2 = Sampling.mixRebalance(df.repartition(7), "id", "g")
    assert(out.exceptAll(out2).isEmpty && out2.exceptAll(out).isEmpty)

    // explicit per-group target downsamples harder; absent groups keep the floor
    val capped = Sampling.mixRebalance(df, "id", "g", targets = Map("en" -> 10L))
      .groupBy("g").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(capped("fr") == 30L && capped("de") == expected("de"))
    assert(capped("en") ==
      rows.filter(_._2 == "en").count { case (id, _) => keep(id, 10L, 180L) }.toLong)
  }

  test("mix rebalance treats NULL group as a real stratum") {
    // en 20, null 5 → target 5: the null stratum is the floor group and
    // must survive whole, not vanish in the count join
    val df = (0L until 25L).map(i => (i, if (i < 20) "en" else null))
      .toDF("id", "g")
    val got = Sampling.mixRebalance(df, "id", "g")
      .groupBy("g").count().collect()
      .map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    assert(got(None) == 5L, s"null stratum dropped: $got")
    def gate(id: Long) = ((id % 2147483647L) * 2654435761L) % 1000000007L
    assert(got(Some("en")) == (0L until 20L).count(i =>
      gate(i) < math.floor(1000000007.0 * 5.0 / 20.0)).toLong)
  }

  test("curriculum stages equal the lang-window formulation, balanced within one doc") {
    import org.apache.spark.sql.expressions.Window
    val docs = graft.Tables.documents(spark, Sf)
    val got = Sampling.curriculumStages(docs, "text", "doc_id")
    val q = docs.select(col("lang"), col("doc_id").cast("long").as("doc_id"),
      TextStats.qualityScore(col("text")).as("q"))
    val ref = q
      .withColumn("rk", row_number().over(
        Window.partitionBy("lang").orderBy(col("q"), col("doc_id"))).cast("long"))
      .withColumn("cnt", count(lit(1)).over(Window.partitionBy("lang")))
      .withColumn("stage", expr("((rk - 1) * 5) div cnt").cast("int"))
      .groupBy("lang", "stage")
      .agg(count(lit(1)).as("n_docs"),
        min("q").as("min_quality"), max("q").as("max_quality"))
    assert(got.exceptAll(ref).isEmpty && ref.exceptAll(got).isEmpty,
      "two-pass ranking must match the single-window reference bitwise")
    val byLang = got.collect().groupBy(_.getString(0))
    byLang.foreach { case (lang, rows) =>
      val ns = rows.map(_.getLong(2))
      assert(ns.max - ns.min <= 1, s"$lang stages unbalanced: ${ns.toSeq}")
      assert(rows.map(_.getInt(1)).sorted.sameElements(rows.indices),
        s"$lang missing stages")
      val s = rows.sortBy(_.getInt(1))
      s.sliding(2).foreach {
        case Array(a, b) => assert(b.getDouble(3) >= a.getDouble(4),
          s"$lang stage quality ranges must be ordered")
        case _ =>
      }
    }
  }

  test("temperature rebalance flattens the mix toward uniform, deterministically") {
    val docs = graft.Tables.documents(spark, Sf)
    val out = Sampling.temperatureRebalance(docs, "doc_id", "source")
    val before = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val after = out.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // α=½ keeps every source present and shrinks only over-represented ones
    assert(after.keySet == before.keySet)
    // flattening: the kept-share is higher for smaller sources
    val shares = before.toSeq.sortBy(_._2).map { case (s, n) => after(s).toDouble / n }
    shares.sliding(2).foreach { case Seq(small, large) =>
      assert(small >= large - 0.1, s"smaller sources must keep a larger share: $shares")
    case _ => }
    // selection is a pure function of ids — identical under repartitioning
    val again = Sampling.temperatureRebalance(docs.repartition(13), "doc_id", "source")
    assert(out.select("doc_id").exceptAll(again.select("doc_id")).isEmpty &&
      again.select("doc_id").exceptAll(out.select("doc_id")).isEmpty)
  }

  test("shardAssign conserves docs and tokens, is partitioning-invariant") {
    val docs = graft.Tables.documents(spark, Sf)
    val shards = Sampling.shardAssign(docs, "doc_id", "text", 8)
    val rows = shards.collect()
    assert(rows.map(_.getLong(0)).toSeq == (0L until 8L), "all 8 shards populated")
    assert(rows.map(_.getLong(1)).sum == docs.count(), "doc mass conserved")
    val totalTokens = docs
      .agg(sum(size(split(col("text"), " ")).cast("long"))).collect()(0).getLong(0)
    assert(rows.map(_.getLong(2)).sum == totalTokens, "token mass conserved")
    val again = Sampling.shardAssign(docs.repartition(11), "doc_id", "text", 8).collect()
    assert(again.toSeq == rows.toSeq)
    // balance: no shard holds more than 3× its fair share of docs
    val fair = docs.count().toDouble / 8
    assert(rows.forall(_.getLong(1) < fair * 3), "gate should spread docs")
  }

  test("leakage-safe split gates every doc by its cluster representative") {
    val docs = (0L until 200L).toDF("doc_id")
    // two clusters: {1,5,9} (rep 1, transitively) and {20,150} (rep 20)
    val pairs = Seq((1L, 5L), (5L, 9L), (20L, 150L)).toDF("ida", "idb")
    val out = Sampling.leakageSafeSplit(docs, pairs, "doc_id", 800, 100)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // independent scalar oracle: replicate the documented gate arithmetic
    val rep = Map(5L -> 1L, 9L -> 1L, 150L -> 20L).withDefault(identity[Long])
    def splitOf(id: Long): String = {
      val g = ((id % 2147483647L) * 2654435761L) % 1000000007L % 1000L
      if (g < 800) "train" else if (g < 900) "valid" else "test"
    }
    val expected = (0L until 200L).groupBy(d => splitOf(rep(d))).map {
      case (s, ds) => s -> (
        ds.size.toLong,
        ds.map(rep).distinct.size.toLong,
        ds.count(d => rep(d) != d).toLong)
    }
    assert(out == expected, s"got $out expected $expected")
    // mass checks: every doc exactly once; each dup member folds into
    // its representative's group
    assert(out.values.map(_._1).sum == 200L)
    assert(out.values.map(_._3).sum == 3L)
    assert(out.values.map(_._2).sum == 197L)
  }
}
