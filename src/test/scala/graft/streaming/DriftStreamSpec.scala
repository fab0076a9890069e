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
}
