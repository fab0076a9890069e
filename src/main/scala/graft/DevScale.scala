package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import graft.io.Bucketing
import graft.ops.{Exact, Salting}

/** Dev-only: demonstrate the scale utilities end to end.
  * Usage: runMain graft.DevScale <sfDir> */
object DevScale {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val spark = Sessions.local(cpus = "8", appName = "graft-devscale",
      extraConf = Map("spark.sql.autoBroadcastJoinThreshold" -> "-1"))
    spark.sparkContext.setLogLevel("ERROR")

    Bucketing.writeBucketed(Tables.lineitem(spark, sfDir), "devscale_li", "l_orderkey", 8)
    Bucketing.writeBucketed(Tables.orders(spark, sfDir), "devscale_o", "o_orderkey", 8)
    val joined = Bucketing.bucketJoin(spark, "devscale_li", "devscale_o",
      "l_orderkey", "o_orderkey")
    val shuffles = (joined.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }).collect {
      case e: ShuffleExchangeExec => e
    }
    println(s"[devscale] bucket join rows=${joined.count()} shuffleExchanges=${shuffles.size}")

    val skewed = Tables.lineitem(spark, sfDir)
      .withColumn("k", when(col("l_orderkey") % 10 =!= 0, "hot")
        .otherwise(concat(lit("tail_"), col("l_orderkey"))))
    val direct = skewed.groupBy("k")
      .agg(count(lit(1)).as("n"), sum(Exact.cents(col("l_quantity"))).cast("double").as("sum_cents"))
      .filter(col("k") === "hot").collect()(0)
    val salted = Salting.saltedCountSum(skewed, "k", "l_quantity")
      .filter(col("k") === "hot").collect()(0)
    println(s"[devscale] hot-key direct=(${direct.getLong(1)}, ${direct.getDouble(2)}) " +
      s"salted=(${salted.getLong(1)}, ${salted.getDouble(2)}) " +
      s"equal=${direct.getLong(1) == salted.getLong(1) && direct.getDouble(2) == salted.getDouble(2)}")

    spark.sql("DROP TABLE IF EXISTS devscale_li")
    spark.sql("DROP TABLE IF EXISTS devscale_o")
    spark.stop()
  }
}
