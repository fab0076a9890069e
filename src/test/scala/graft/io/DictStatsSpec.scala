package graft.io

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DictStatsSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"dictstats_$tag").toString + "/t.parquet"

  test("distinctExceeds: proven answers match count(DISTINCT) on both sides of the threshold") {
    val path = tmp("basic")
    spark.range(10000).select(
      (col("id") % 50).cast("double").as("d50"),   // exactly 50 → NOT > 50
      (col("id") % 51).cast("double").as("d51"),   // 51 → > 50
      (col("id") % 20).cast("string").as("s20"),   // exactly 20 → NOT > 20
      (col("id") % 21).cast("string").as("s21"),   // 21 → > 20
      when(col("id") % 2 === 0, col("id") % 60).as("n30") // nulls excluded: 30 non-null
    ).coalesce(1).write.mode("overwrite").parquet(path)
    val df = spark.read.parquet(path)
    val got = DictStats.distinctExceeds(df,
      Map("d50" -> 50L, "d51" -> 50L, "s20" -> 20L, "s21" -> 20L, "n30" -> 50L))
    assert(got == Map("d50" -> false, "d51" -> true, "s20" -> false,
      "s21" -> true, "n30" -> false))
  }

  test("distinctExceeds: SQL distinct semantics — NaN is one value, -0.0 merges with 0.0") {
    val path = tmp("nan")
    // 3 SQL-distinct values: NaN, 0.0 (= -0.0), 1.0
    Seq(Double.NaN, Double.NaN, 0.0, -0.0, 1.0, 1.0, Double.NaN)
      .toDF("v").coalesce(1).write.mode("overwrite").parquet(path)
    val df = spark.read.parquet(path)
    assert(DictStats.distinctExceeds(df, Map("v" -> 2L)) == Map("v" -> true))
    assert(DictStats.distinctExceeds(df, Map("v" -> 3L)) == Map("v" -> false))
    // engine agreement, the actual contract:
    val n = df.select(count_distinct(col("v"))).head().getLong(0)
    assert(n == 3L)
  }

  test("distinctExceeds: multi-file union — per-file dictionaries below T, union above") {
    val path = tmp("union")
    // file A holds values 0..29, file B holds 25..54 → per-file 30 ≤ 40,
    // union 55 > 40. Values REPEAT (id % n): an all-unique column gives the
    // writer no compression and it drops the dictionary entirely (parquet-mr
    // isCompressionSatisfying) — dictionaries only exist where they pay.
    spark.range(3000).select((col("id") % 30).cast("string").as("s"))
      .coalesce(1).write.mode("overwrite").parquet(path)
    spark.range(3000).select((col("id") % 30 + 25).cast("string").as("s"))
      .coalesce(1).write.mode("append").parquet(path)
    val df = spark.read.parquet(path)
    assert(DictStats.distinctExceeds(df, Map("s" -> 40L)) == Map("s" -> true))
    assert(DictStats.distinctExceeds(df, Map("s" -> 55L)) == Map("s" -> false))
  }

  test("distinctExceeds: refuses non-pure scans and non-parquet sources") {
    val li = graft.Tables.lineitem(spark, Sf)
    assert(DictStats.distinctExceeds(li.filter(col("l_quantity") > 10),
      Map("l_returnflag" -> 2L)).isEmpty)
    assert(DictStats.distinctExceeds(li.limit(5), Map("l_returnflag" -> 2L)).isEmpty)
    assert(DictStats.distinctExceeds(Seq("a", "b").toDF("s"), Map("s" -> 1L)).isEmpty)
    // column-pruning select is still pure
    assert(DictStats.distinctExceeds(li.select("l_returnflag"),
      Map("l_returnflag" -> 2L)) == Map("l_returnflag" -> true))
  }

  test("distinctExceeds: fallen-back high-cardinality chunk still proves the lower bound") {
    val path = tmp("fallback")
    // 200k distinct doubles, each twice, in one chunk: the first ~1 MiB
    // data page flushes dictionary-encoded (dict at ~65k entries), then the
    // dictionary hits its 1 MiB ceiling and the writer falls back to plain.
    // Exactness is gone, but the persisted dictionary's own entries already
    // exceed any small T — the occurrence lower bound.
    // (An ALL-unique column is different: the writer drops the dictionary
    // before anything flushes, leaving no metadata to prove from.)
    spark.range(400000).select((floor(col("id") / 2) + 0.5).cast("double").as("v"))
      .coalesce(1).write.mode("overwrite").parquet(path)
    val df = spark.read.parquet(path)
    assert(DictStats.distinctExceeds(df, Map("v" -> 50L)) == Map("v" -> true))
    // ...and refuses to answer a threshold the dictionary can't settle
    // (exceeds-by-how-much needs the plain pages it never reads)
    assert(DictStats.distinctExceeds(df, Map("v" -> 10000000L)).isEmpty)
  }

  test("distinctExceeds: partition columns get NO answer — their values live in paths, not footers") {
    val path = tmp("parts").stripSuffix("/t.parquet") + "/t_parts.parquet"
    // 25 distinct partition values at threshold 20: the truth is `true`,
    // but no file footer ever carries column p, so the only SOUND outputs
    // are "true via some other proof" or "no answer" — never `false`
    // (the r15 ADVICE defect: the vacuous all-exact empty union answered
    // false and smartSuggest consumed it as proven).
    spark.range(1000).select(
      (col("id") % 25).cast("string").as("p"),
      (col("id") % 10).cast("string").as("s10"))
      .coalesce(1) // 25 files (one per partition dir), under DictStats.MaxFiles
      .write.partitionBy("p").mode("overwrite").parquet(path)
    val df = spark.read.parquet(path)
    assert(df.select(count_distinct(col("p"))).head().getLong(0) == 25L)
    val got = DictStats.distinctExceeds(df, Map("p" -> 20L, "s10" -> 20L, "s10b" -> 5L))
    assert(!got.contains("p"), s"partition column must be unanswerable, got $got")
    assert(got.get("s10").contains(false)) // data columns still proven
    assert(!got.contains("s10b"))          // asked-but-absent column: no answer either
  }

  test("reflective parquet-mr surface canary: answers computed UNswallowed (loud on version drift)") {
    // distinctExceeds swallows every exception into "no answer" because
    // per-input ineligibility is routine; that same swallow would hide a
    // parquet-mr upgrade breaking the reflective getDictionaryReader /
    // readDictionaryPage lookup (DictStats.GetDictReader), silently
    // degrading v4/v5 to their Spark fallbacks forever. This test drives
    // the UNswallowed internal entry point on a file that is guaranteed
    // dictionary-encoded, so an ABI break is a thrown test error — loud —
    // while a wrong answer would fail the assert.
    val path = tmp("canary")
    spark.range(4000).select((col("id") % 7).cast("string").as("s"))
      .coalesce(1).write.mode("overwrite").parquet(path)
    val files = new java.io.File(path).listFiles()
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("."))
      .map(_.getAbsolutePath).toSeq
    assert(files.nonEmpty)
    val conf = spark.sessionState.newHadoopConf()
    val got = DictStats.answerFromFooters(files, conf, Map("s" -> 5L, "s_hi" -> 6L))
    assert(got == Map("s" -> true))
    val exact = DictStats.answerFromFooters(files, conf, Map("s" -> 7L))
    assert(exact == Map("s" -> false))
  }

  test("smartSuggest rides the metadata path with zero scan jobs on a pure parquet scan") {
    val li = graft.Tables.lineitem(spark, Sf)
    val expected = graft.ops.Privacy.smartSuggest(li).collect().map(_.toSeq).toSeq
    // brute-force the heuristic from count(DISTINCT) to pin the decisions
    val byCol = expected.map(r => r.head.toString -> r(1).toString).toMap
    for (f <- li.schema.fields) {
      val t = f.dataType match {
        case org.apache.spark.sql.types.StringType => Some(20L)
        case _: org.apache.spark.sql.types.NumericType => Some(50L)
        case _ => None
      }
      t.foreach { thr =>
        val u = li.select(count_distinct(col(f.name))).head().getLong(0)
        val want =
          if (f.dataType == org.apache.spark.sql.types.StringType)
            if (u > thr) Some("sdc") else None
          else if (u > thr) Some("generalize+dp") else Some("dp")
        assert(byCol.get(f.name) == want, s"column ${f.name} (distinct=$u)")
      }
    }
  }
}
