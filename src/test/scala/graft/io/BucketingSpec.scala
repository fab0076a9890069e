package graft.io

import graft.SparkSpec
import graft.Tables
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

class BucketingSpec extends SparkSpec {

  test("bucketed fact-to-fact join plans with NO shuffle exchange") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path
    try {
      Bucketing.writeBucketed(Tables.lineitem(spark, Sf), "li_b", "l_orderkey", 8)
      Bucketing.writeBucketed(Tables.orders(spark, Sf), "o_b", "o_orderkey", 8)
      val joined = Bucketing.bucketJoin(spark, "li_b", "o_b", "l_orderkey", "o_orderkey")
      val shuffles = physicalPlan(joined).collect {
        case e: ShuffleExchangeExec => e
      }
      assert(shuffles.isEmpty, s"expected shuffle-free bucket join, got: $shuffles")
      assert(joined.count() > 0)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS o_b")
    }
  }
}
