package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** r16 measurement scaffolding (deleted at round end): window vs
  * aggregate-slice prefix build for ngramJaccardPairs, end to end and
  * component-wise, with pair-set equality as the guard.
  * Usage: runMain graft.DevR16Order <sfDir> */
object DevR16Order {
  def mat(df: DataFrame): Long = df.queryExecution.toRdd.count()
  def t(label: String)(fn: => Any): Unit = {
    System.gc()
    val t0 = System.nanoTime()
    fn
    println(f"[order] $label%-34s ${(System.nanoTime() - t0) / 1e9}%.3f s")
  }

  def main(args: Array[String]): Unit = {
    val d = args.head
    val spark = Sessions.local(appName = "graft-devr16order")
    import graft.ext.Dedup
    val docs = Tables.documents(spark, d)
    val (textCol, idCol, n, threshold) = ("text", "doc_id", 3, 0.6)

    def pipeline(aggSlice: Boolean): DataFrame = {
      val withSh = docs.select(col(idCol).as("id"),
          sort_array(Dedup.shingleHashArray(docs, textCol, n)).as("sh"))
        .filter(size(col("sh")) > 0)
      val fullIdx = withSh.select(col("id"), size(col("sh")).as("sz"),
        explode(col("sh")).as("s"))
      val dfreq = fullIdx.groupBy("s").agg(count(lit(1)).as("df"))
      val joined = fullIdx.join(broadcast(dfreq), "s")
      val prefLen = (col("sz").cast("double") * (1.0 - threshold) + 1e-9).cast("int") + 1
      val prefix =
        if (!aggSlice) {
          val wDoc = Window.partitionBy("id").orderBy("df", "s")
          joined.withColumn("rk", row_number().over(wDoc))
            .filter(col("rk") <= prefLen)
            .select(col("id"), col("sz"), col("rk"), col("s"))
        } else {
          joined.groupBy(col("id"), col("sz"))
            .agg(array_sort(collect_list(struct(col("df"), col("s")))).as("items"))
            .select(col("id"), col("sz"),
              posexplode(slice(col("items"), lit(1), prefLen)))
            .select(col("id"), col("sz"), (col("pos") + 1).as("rk"), col("col.s").as("s"))
        }
      val posUb = (lit(1) + least(col("a.sz") - col("a.rk"),
        col("b.sz") - col("b.rk"))).cast("double")
      val posNeed = (col("a.sz") + col("b.sz")).cast("double") *
        (threshold / (1.0 + threshold)) - 1e-9
      val candidates = prefix.alias("a").join(prefix.alias("b"),
          col("a.s") === col("b.s") && col("a.id") < col("b.id") &&
            col("a.sz").cast("double") >= col("b.sz") * threshold &&
            col("b.sz").cast("double") >= col("a.sz") * threshold &&
            posUb >= posNeed)
        .select(col("a.id").as("ida"), col("b.id").as("idb"))
        .distinct()
      val full = withSh.select(col("id"), col("sh"))
      candidates
        .join(full.select(col("id").as("ida"), col("sh").as("sha")), "ida")
        .join(full.select(col("id").as("idb"), col("sh").as("shb")), "idb")
        .withColumn("shared", size(array_intersect(col("sha"), col("shb"))))
        .withColumn("jaccard", col("shared").cast("double") /
          (size(col("sha")) + size(col("shb")) - col("shared")))
        .filter(col("jaccard") >= threshold)
        .select(col("ida"), col("idb"), col("jaccard"))
        .orderBy(col("ida"), col("idb"))
    }

    // equality guard first
    val a = pipeline(aggSlice = false).collect().toSeq
    val b = pipeline(aggSlice = true).collect().toSeq
    println(s"[order] pairs window=${a.size} aggSlice=${b.size} equal=${a == b}")
    (1 to 3).foreach { p =>
      t(s"window    full pass $p")(mat(pipeline(aggSlice = false)))
      t(s"aggSlice  full pass $p")(mat(pipeline(aggSlice = true)))
    }
    spark.stop()
  }
}
