package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

case class Obs(ts: Timestamp, v: Double)

class DriftStreamSpec extends SparkSpec {
  import spark.implicits._

  private def t(m: String) = Timestamp.valueOf(s"2024-01-01 $m:00")

  test("psiMonitor: per-window PSI matches the batch psi of the same rows") {
    implicit val sc = spark.sqlContext
    val reference = (1 to 200).map(_.toDouble).toDF("v")

    // window 10:00 draws from the reference range; window 11:00 is shifted
    val w1 = (1 to 50).map(i => Obs(t("10:05"), i * 4.0))
    val w2 = (1 to 50).map(i => Obs(t("11:10"), 150.0 + i))
    val mem = MemoryStream[Obs]
    val q = DriftStream.psiMonitor(mem.toDF(), reference, "v", tsCol = "ts")
      .writeStream.format("memory").queryName("psi_out")
      .outputMode("complete").start()
    mem.addData(w1 ++ w2: _*)
    q.processAllAvailable()
    q.stop()

    val got = spark.table("psi_out").collect()
      .map(r => r.getTimestamp(0).toString ->
        (r.getLong(2), if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(got.keySet == Set("2024-01-01 10:00:00.0", "2024-01-01 11:00:00.0"))
    assert(got("2024-01-01 10:00:00.0")._1 == 50L)

    // batch twin on exactly the same rows, same reference
    def batchPsi(rows: Seq[Obs]) = graft.ops.Drift
      .psi(reference, rows.map(_.v).toDF("v"), "v")
      .collect()(0).getDouble(1)
    assert(got("2024-01-01 10:00:00.0")._2.contains(batchPsi(w1)),
      s"stream ${got("2024-01-01 10:00:00.0")._2} vs batch ${batchPsi(w1)}")
    assert(got("2024-01-01 11:00:00.0")._2.contains(batchPsi(w2)))
    // the shifted window must read as more drifted
    assert(got("2024-01-01 11:00:00.0")._2.get > got("2024-01-01 10:00:00.0")._2.get)
  }

  test("w1Monitor: identical window scores ~0, one-decile shift scores ~1") {
    implicit val sc = spark.sqlContext
    val reference = (1 to 200).map(_.toDouble).toDF("v")
    // window 10:00 resamples the reference uniformly (every 4th value →
    // identical decile occupancy); window 11:00 is the reference shifted
    // by exactly one decile (+20)
    val w1 = (1 to 50).map(i => Obs(t("10:05"), i * 4.0))
    val w2 = (1 to 50).map(i => Obs(t("11:10"), i * 4.0 + 20.0))
    val mem = MemoryStream[Obs]
    val q = DriftStream.w1Monitor(mem.toDF(), reference, "v", tsCol = "ts")
      .writeStream.format("memory").queryName("w1_out")
      .outputMode("complete").start()
    mem.addData(w1 ++ w2: _*)
    q.processAllAvailable()
    q.stop()
    val got = spark.table("w1_out").collect()
      .map(r => r.getTimestamp(0).toString -> r.getDouble(3)).toMap
    assert(got.size == 2)
    val same = got("2024-01-01 10:00:00.0")
    val shifted = got("2024-01-01 11:00:00.0")
    assert(same < 0.15, s"uniform resample scored $same")
    // +20 on a 1..200 reference = one decile of mass moved per cut point
    assert(shifted > 0.7 && shifted < 1.3, s"one-decile shift scored $shifted")
    assert(shifted > same)
  }

  test("jsMonitor: per-window JS matches the batch jsDivergence of the same rows") {
    implicit val sc = spark.sqlContext
    val reference = (Seq.fill(60)("a") ++ Seq.fill(30)("b") ++ Seq.fill(10)("c")).toDF("k")

    // window 10:00 mirrors the reference; window 11:00 is skewed to c
    val w1 = Seq.fill(6)("a") ++ Seq.fill(3)("b") ++ Seq.fill(1)("c")
    val w2 = Seq.fill(1)("a") ++ Seq.fill(1)("b") ++ Seq.fill(8)("c")
    case class KObs(ts: Timestamp, k: String)
    val mem = MemoryStream[(Timestamp, String)]
    val q = DriftStream.jsMonitor(
        mem.toDF().toDF("ts", "k"), reference, "k", tsCol = "ts")
      .writeStream.format("memory").queryName("js_out")
      .outputMode("complete").start()
    mem.addData(w1.map(k => (t("10:05"), k)) ++ w2.map(k => (t("11:10"), k)): _*)
    q.processAllAvailable()
    q.stop()

    val got = spark.table("js_out").collect()
      .map(r => r.getTimestamp(0).toString ->
        (r.getLong(2), if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    def batchJs(ks: Seq[String]) = graft.ops.Drift
      .jsDivergence(reference, ks.toDF("k"), "k")
      .collect()(0).getDouble(1)
    assert(got("2024-01-01 10:00:00.0")._2.contains(batchJs(w1)),
      s"stream ${got("2024-01-01 10:00:00.0")._2} vs batch ${batchJs(w1)}")
    assert(got("2024-01-01 11:00:00.0")._2.contains(batchJs(w2)))
    assert(got("2024-01-01 11:00:00.0")._2.get > got("2024-01-01 10:00:00.0")._2.get)
    // out-of-vocabulary live values fold into OTHER instead of widening the agg
    val mem2 = MemoryStream[(Timestamp, String)]
    val q2 = DriftStream.jsMonitor(
        mem2.toDF().toDF("ts", "k"), reference, "k", tsCol = "ts")
      .writeStream.format("memory").queryName("js_oov")
      .outputMode("complete").start()
    mem2.addData(Seq((t("10:05"), "zzz"), (t("10:06"), "a")): _*)
    q2.processAllAvailable()
    q2.stop()
    val oov = spark.table("js_oov").collect()(0)
    assert(oov.getLong(2) == 2L && !oov.isNullAt(3) && oov.getDouble(3) > 0.0)
  }

  test("jsMonitor: wide reference keeps top-MASS categories, not the first keys") {
    implicit val sc = spark.sqlContext
    // 121 categories, maxCategories=100: the dominant one sorts LAST
    // lexicographically, so a first-keys vocabulary would fold it into
    // __OTHER__ and score it like a never-seen value
    val reference = (Seq.fill(500)("zz_dominant") ++
      (1 to 120).flatMap(i => Seq.fill(5)(f"a$i%03d"))).toDF("k")
    def windowJs(value: String): Double = {
      val mem = MemoryStream[(Timestamp, String)]
      val q = DriftStream.jsMonitor(
          mem.toDF().toDF("ts", "k"), reference, "k", tsCol = "ts")
        .writeStream.format("memory").queryName(s"js_wide_$value")
        .outputMode("complete").start()
      mem.addData((1 to 10).map(_ => (t("10:05"), value)): _*)
      q.processAllAvailable()
      q.stop()
      spark.table(s"js_wide_$value").collect()(0).getDouble(3)
    }
    val familiar = windowJs("zz_dominant") // 45% of the reference mass
    val novel = windowJs("yy_unseen")      // zero reference mass
    assert(familiar < novel,
      s"dominant ref category scored like a novel one: $familiar >= $novel")
  }

  test("psiMonitor: watermark closes windows in append mode") {
    implicit val sc = spark.sqlContext
    val reference = (1 to 100).map(_.toDouble).toDF("v")
    val mem = MemoryStream[Obs]
    val q = DriftStream.psiMonitor(mem.toDF(), reference, "v",
      tsCol = "ts", watermark = "30 minutes")
      .writeStream.format("memory").queryName("psi_append")
      .outputMode("append").start()
    mem.addData((1 to 10).map(i => Obs(t("10:05"), i.toDouble)): _*)
    q.processAllAvailable()
    // advance event time far enough to expire the 10:00 window
    mem.addData(Obs(t("13:00"), 1.0))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("psi_append").collect()
    assert(rows.length == 1, "exactly the closed 10:00 window must emit")
    assert(rows(0).getTimestamp(0).toString == "2024-01-01 10:00:00.0")
    assert(rows(0).getLong(2) == 10L)
  }

  test("monitors fail loudly on degenerate references, not with silent NaN/double-counting") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[Obs]
    // empty reference → every pRef would be NaN (0/0) and psi NaN forever
    val emptyRef = Seq.empty[Double].toDF("v")
    val e1 = intercept[IllegalArgumentException] {
      DriftStream.psiMonitor(mem.toDF(), emptyRef, "v")
    }
    assert(e1.getMessage.contains("empty reference"))
    // bins=1 used to build malformed percentile SQL, failing analysis
    // with an unrelated message
    val ref = Seq(1.0, 2.0, 3.0).toDF("v")
    val e2 = intercept[IllegalArgumentException] {
      DriftStream.psiMonitor(mem.toDF(), ref, "v", bins = 1)
    }
    assert(e2.getMessage.contains("bins"))
    // a real reference category spelled "__OTHER__" would collide with
    // the overflow bucket and double-count its rows in every window
    val collide = Seq("a", "__OTHER__").toDF("v")
    val e3 = intercept[IllegalArgumentException] {
      DriftStream.jsMonitor(mem.toDF(), collide, "v")
    }
    assert(e3.getMessage.contains("__OTHER__"))
  }
}
