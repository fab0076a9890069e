package graft

import org.apache.spark.sql.functions._

/** Dev-only: stage-level timing probes for the privacy-op hot paths.
  * Usage: runMain graft.DevProbe <sfDir> */
object DevProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val spark = Sessions.local(appName = "graft-devprobe")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $name ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val li = Tables.lineitem(spark, sfDir)
    li.count() // warm the scan

    // v2 pieces
    t("v2a hist groupBy+collect (old)") {
      graft.ops.Exact.quantilesViaCentsHistogram(li, "l_extendedprice", (0 to 10).map(_ / 10.0))
    }
    t("v2b hist window quantiles (new)") {
      graft.ops.Exact.quantilesViaCentsHistogramDistributed(li, "l_extendedprice", (0 to 10).map(_ / 10.0))
    }
    t("v2c label scan only") {
      val edges = (1 to 11).map(_ * 10000.0)
      li.withColumn("l_extendedprice",
        graft.ops.Privacy.labelExpr(col("l_extendedprice"), edges)).count()
    }
    // v4 pieces
    t("v4a fused stats job") {
      val entries = Seq(
        struct(lit(-1).as("i"), lit(0L).as("bin"), lit(null).cast("string").as("cat")),
        struct(lit(0).as("i"), graft.ops.Exact.cents(col("l_quantity")).as("bin"), lit(null).cast("string").as("cat")),
        struct(lit(1).as("i"), graft.ops.Exact.cents(col("l_extendedprice")).as("bin"), lit(null).cast("string").as("cat")),
        struct(lit(2).as("i"), lit(null).cast("long").as("bin"), col("l_returnflag").as("cat")))
      li.select(explode(array(entries: _*)).as("e"))
        .groupBy(col("e.i"), col("e.bin"), col("e.cat"))
        .agg(count(lit(1)).as("cnt")).collect().length
    }
    t("v4b ep-hist only collect as pairs") {
      li.select(graft.ops.Exact.cents(col("l_extendedprice")).as("b"))
        .filter(col("b").isNotNull).groupBy("b").agg(count(lit(1)).as("cnt"))
        .as[(Long, Long)](org.apache.spark.sql.Encoders.product[(Long, Long)])
        .collect().length
    }
    t("v4 full") {
      graft.ops.Privacy.syntheticSample(li,
        Seq("l_quantity", "l_extendedprice", "l_returnflag"), seed = 42L).count()
    }
    // v5 pieces
    t("v5 explode+2agg (new)") {
      graft.ops.Privacy.smartSuggest(li).count()
    }
    t("v5 single col count_distinct") {
      li.agg(count_distinct(col("l_extendedprice"))).head()
    }
    t("v5x explode+struct+count only") {
      val fields = li.schema.fields.toSeq
      li.select(explode(array(fields.map(f =>
        struct(lit(f.name).as("c"), col(f.name).cast("string").as("v"))): _*)).as("p"))
        .groupBy(col("p.c")).agg(count(lit(1))).collect().length
    }
    t("v5y flat capped-hash agg (no explode)") {
      val capped = udaf(new graft.functions.CappedDistinctLong(64))
      val aggs = li.schema.fields.toSeq.map { f =>
        capped(when(col(f.name).isNull, lit(Long.MinValue))
          .otherwise(xxhash64(col(f.name)))).as(f.name)
      }
      li.agg(aggs.head, aggs.tail: _*).head()
    }
    t("v4 count only") {
      graft.ops.Privacy.syntheticSample(li,
        Seq("l_quantity", "l_extendedprice", "l_returnflag"), seed = 42L).count()
    }
    t("v4 assembly-only with UDF lookup") {
      val vals = (0 until 583000).map(_ / 100.0).toArray
      val cum = (1 to 583000).map(_ / 583000.0).toArray
      val bv = spark.sparkContext.broadcast((vals, cum))
      val f = udf { (u: Double) =>
        val (vs, cm) = bv.value
        val j = java.util.Arrays.binarySearch(cm, u)
        val idx = math.min(if (j >= 0) j else -j - 1, vs.length - 1)
        vs(idx)
      }
      spark.range(600000).select(
        when(col("id") < 300000, f(rand(1))).otherwise(randn(2) * 3.0 + 1.0).as("x"),
        when(col("id") < 300000, f(rand(3))).otherwise(randn(4) * 3.0 + 1.0).as("y"))
        .count()
    }
    t("v4 assembly-only no UDF") {
      spark.range(600000).select(
        when(col("id") < 300000, rand(1)).otherwise(randn(2) * 3.0 + 1.0).as("x"),
        when(col("id") < 300000, rand(3)).otherwise(randn(4) * 3.0 + 1.0).as("y"))
        .count()
    }
    t("v5y again") {
      val capped = udaf(new graft.functions.CappedDistinctLong(64))
      val aggs = li.schema.fields.toSeq.map { f =>
        capped(when(col(f.name).isNull, lit(Long.MinValue))
          .otherwise(xxhash64(col(f.name)))).as(f.name)
      }
      li.agg(aggs.head, aggs.tail: _*).head()
    }
    spark.stop()
  }
}
