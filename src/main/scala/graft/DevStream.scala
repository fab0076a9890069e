package graft

import org.apache.spark.sql.SparkSession
import graft.streaming.EventsStream

/** Dev-only: run the Structured Streaming file source over a testdata
  * events directory and reconcile against the batch reader.
  * Usage: runMain graft.DevStream <sfDir> */
object DevStream {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val spark = Sessions.local(cpus = "8", appName = "graft-devstream")
    spark.sparkContext.setLogLevel("ERROR")

    // stream source dirs must contain only data files — stage a copy
    val dir = java.nio.file.Files.createTempDirectory("graft_devstream").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      java.nio.file.Paths.get(s"$dir/events.parquet"))

    val q = EventsStream.tumblingCounts(EventsStream.readEvents(spark, dir))
      .writeStream.format("memory").queryName("devstream_out")
      .outputMode("complete").start()
    q.processAllAvailable()
    q.stop()

    val windows = spark.table("devstream_out").count()
    val streamed = spark.table("devstream_out")
      .groupBy().sum("n").collect()(0).getLong(0)
    val batch = Tables.events(spark, sfDir).count()
    println(s"[devstream] windows=$windows streamedRows=$streamed batchRows=$batch " +
      s"reconciled=${streamed == batch}")
    spark.stop()
  }
}
