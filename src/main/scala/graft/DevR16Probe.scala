package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** r16 measurement scaffolding (deleted at round end): decompose
  * a1_profile_approx and d_drift_extended into their component passes.
  * Usage: runMain graft.DevR16Probe <sfDir> */
object DevR16Probe {
  def t(label: String)(fn: => Any): Unit = {
    System.gc()
    val t0 = System.nanoTime()
    fn
    println(f"[probe] $label%-42s ${(System.nanoTime() - t0) / 1e9}%.3f s")
  }
  def mat(df: DataFrame): Long = df.queryExecution.toRdd.count()

  def main(args: Array[String]): Unit = {
    val d = args.head
    val spark = Sessions.local(appName = "graft-devr16probe")
    import graft.ops.{Drift, Exact, Par, Profile}
    val li = Tables.lineitem(spark, d)
    val numCols = li.schema.fields.filter(f =>
      f.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType]).map(_.name).toSeq
    val allCols = li.schema.fields.map(_.name).toSeq
    val catCols = allCols.filterNot(numCols.contains)

    // warm everything once
    mat(li)
    (1 to 2).foreach { pass =>
      println(s"== pass $pass ==")
      // ---- a1_profile_approx decomposition
      t("a1 full profileApprox")(mat(Profile.profileApprox(li)))
      val wide = Par.widen(li)
      t("a1 widen only (exchange materialize)")(mat(wide.agg(count(lit(1)))))
      val declAggs: Seq[org.apache.spark.sql.Column] =
        Seq(count(lit(1)).as("n")) ++ numCols.flatMap { c =>
          Seq(count(col(c)).as(s"${c}_n"), avg(col(c).cast("double")).as(s"${c}_m"),
            stddev_samp(col(c).cast("double")).as(s"${c}_s"),
            min(col(c)).cast("double").as(s"${c}_mn"), max(col(c)).cast("double").as(s"${c}_mx"))
        } ++ catCols.flatMap { c =>
          Seq(count(col(c)).as(s"${c}_n"), min(col(c)).cast("string").as(s"${c}_mn"),
            max(col(c)).cast("string").as(s"${c}_mx"))
        }
      t("a1 declarative aggs only")(mat(wide.agg(declAggs.head, declAggs.tail: _*)))
      val pctAggs = numCols.map(c => percentile_approx(col(c).cast("double"),
        typedlit(Seq(0.25, 0.5, 0.75)), lit(2000)).as(s"${c}_q"))
      t("a1 percentile_approx only (7 cols)")(mat(wide.agg(pctAggs.head, pctAggs.tail: _*)))
      val hllAggs = allCols.map(c => approx_count_distinct(col(c)).as(s"${c}_u"))
      t("a1 approx_count_distinct only (11 cols)")(mat(wide.agg(hllAggs.head, hllAggs.tail: _*)))
      val both = pctAggs ++ hllAggs
      t("a1 sketches only (pct+hll)")(mat(wide.agg(both.head, both.tail: _*)))
      t("a1 rank-recount agg (audit extra)") {
        val rankAggs = numCols.flatMap { c =>
          val v = col(c).cast("double")
          Seq(count(v).as(s"${c}__nn"), sum((v <= lit(1.0)).cast("long")).as(s"${c}__le"))
        }
        mat(li.agg(rankAggs.head, rankAggs.tail: _*))
      }
      t("a1 distinctCounts (audit extra)")(mat(Profile.distinctCounts(li)))

      // ---- d_drift_extended decomposition
      val after = li.filter(col("l_orderkey") % 2 === 1).drop("l_tax")
      t("dx full driftAllExtended")(mat(Drift.driftAllExtended(li, after)))
      t("dx psiEdges-equivalent driver fit") {
        Exact.quantilesViaDriverSortMulti(li, numCols, (1 until 10).map(_ / 10.0))
      }
      def fusedSideCount(df: DataFrame, cols: Seq[String]): Long = {
        val entries = cols.zipWithIndex.map { case (c, i) =>
          struct(lit(i).as("ci"), coalesce(col(c).cast("string"), lit("NA")).as("k"))
        }
        mat(df.select(explode(array(entries: _*)).as("e"))
          .groupBy(col("e.ci").as("ci"), col("e.k").as("k"))
          .agg(count(lit(1)).as("n")))
      }
      t("dx one fused cat side count (before)")(fusedSideCount(li, catCols))
      t("dx one fused cat side count (after)")(fusedSideCount(after, catCols.filter(_ != "l_tax")))
      t("dx psiMulti alone (numCols)")(Drift.psiMulti(li, after, numCols.filter(after.columns.contains)))
      t("dx jsMulti alone (catCols)")(mat(Drift.jsMulti(li, after, catCols.filter(after.columns.contains))))

      // ---- d3_drift_all decomposition
      t("d3 full driftAll")(mat(Drift.driftAll(li, after)))
      t("d3 ksStatisticMulti alone")(Drift.ksStatisticMulti(li, after,
        numCols.filter(after.columns.contains), roundTo = Some(6)))
      t("d3 chi2Multi alone")(mat(Drift.chi2Multi(li, after, catCols.filter(after.columns.contains))))
    }
    spark.stop()
  }
}
