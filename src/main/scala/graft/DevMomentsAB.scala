package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Dev-only: A/B the r10 DECIMAL(38) moment-finalization widening
  * (commit 472c732) against the r9 DECIMAL(19) form on the a1 profile's
  * wide aggregate — the component the widening touched. The r10→r11
  * bench moved `a1_profile_lineitem` from 1.91× to 2.36× baseline and
  * the widening is the only code suspect; this measures it directly,
  * interleaved A,B,A,B in ONE JVM so host drift cancels.
  *
  * The widening changed PER-GROUP expressions only (final casts in
  * s1FromParts/mergeMomentStates + the stdFromMoments magnitude-guard
  * CaseWhen); the per-row hot loop (momentPartsPre's five long sums) is
  * byte-identical in both forms, so the expected delta is ~0 — but the
  * bench letter demands the measurement, not the argument.
  *
  * Usage: runMain graft.DevMomentsAB <sfDir> [reps]
  */
object DevMomentsAB {

  // ---- r9 (DECIMAL(19,0)) finalization forms, reconstructed verbatim ----

  private def s1FromParts19(p: String): Column = {
    val l = col(s"${p}__s1l")
    val d = col(s"${p}__s1d")
    when(l.isNull && d.isNull, lit(null).cast(DecimalType(19, 0)))
      .otherwise((coalesce(l.cast(DecimalType(19, 0)), lit(0)) +
        coalesce(d, lit(0))).cast(DecimalType(19, 0)))
  }

  private def stdFromMoments19(s1: Column, s2: Column, n: Column): Column = {
    val num = (n.cast(DecimalType(10, 0)) * s2 - s1 * s1).cast("double")
    when(n >= 2, sqrt(greatest(lit(0.0), num / n / (n - lit(1)) / 10000.0)))
  }

  private def meanFromMoments(s1: Column, n: Column): Column =
    when(n >= 1, s1.cast("double") / 100.0 / n)

  /** The a1 wide aggregate + moment finalization over every numeric
    * lineitem column, parameterized by the finalization width. */
  private def momentFrame(df0: DataFrame, numCols: Seq[String], wide38: Boolean,
                          repart: Int = 0): DataFrame = {
    def centsName(c: String) = s"__cents_$c"
    // repart > 0: prune to the needed columns, then a round-robin
    // exchange BEFORE the expensive cents projection — parallelizes the
    // per-row work when the source is a single-row-group file (1 task)
    val df = if (repart > 0) df0.select(numCols.map(col): _*).repartition(repart) else df0
    val proj = df.select(
      df.columns.map(col).toSeq ++
        numCols.map(c => ops.Exact.cents(col(c)).as(centsName(c))): _*)
    val aggs: Seq[Column] =
      Seq(count(lit(1)).as("__n_total")) ++
        numCols.flatMap { c =>
          Seq(count(col(c)).as(s"${c}__n")) ++
            ops.Exact.momentPartsPre(col(centsName(c)), c) ++
            Seq(min(col(c)).cast("double").as(s"${c}__min"),
              max(col(c)).cast("double").as(s"${c}__max"))
        }
    val wide = proj.agg(aggs.head, aggs.tail: _*)
    val outs = numCols.flatMap { c =>
      val n = col(s"${c}__n")
      if (wide38) {
        val s1 = ops.Exact.s1FromParts(c)
        val s2 = ops.Exact.s2FromParts(c)
        Seq(ops.Exact.meanFromMoments(s1, n).as(s"${c}__mean"),
          ops.Exact.stdFromMoments(s1, s2, n).as(s"${c}__std"))
      } else {
        val s1 = s1FromParts19(c)
        val s2 = ops.Exact.s2FromParts(c)
        Seq(meanFromMoments(s1, n).as(s"${c}__mean"),
          stdFromMoments19(s1, s2, n).as(s"${c}__std"))
      }
    }
    wide.select(col("__n_total") +: outs: _*)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val reps = if (args.length > 1) args(1).toInt else 7
    val spark = Sessions.local(appName = "graft-devmoments")
    val df = Tables.load(spark, sfDir, "lineitem")
    val numCols = df.schema.fields.filter(f => f.dataType match {
      case _: NumericType => true
      case _ => false
    }).map(_.name).toSeq
    println(s"[momentsAB] ${numCols.length} numeric cols: ${numCols.mkString(",")}")

    if (args.contains("explain")) {
      Seq(true, false).foreach { w =>
        val plan = momentFrame(df, numCols, wide38 = w).queryExecution.executedPlan.toString
        val cgSpans = "WholeStageCodegen".r.findAllIn(plan).length
        println(s"[momentsAB] wide38=$w WholeStageCodegen spans=$cgSpans")
        println(plan.linesIterator.take(25).mkString("\n"))
      }
      spark.stop(); return
    }

    // untimed warm pass compiles both plans (janino/C2)
    Bench.materialize(momentFrame(df, numCols, wide38 = true))
    Bench.materialize(momentFrame(df, numCols, wide38 = false))

    Bench.materialize(momentFrame(df, numCols, wide38 = true, repart = 32))

    val t38 = Array.fill(reps)(0.0)
    val t19 = Array.fill(reps)(0.0)
    val t38r = Array.fill(reps)(0.0)
    (0 until reps).foreach { r =>
      Seq("w38", "w19", "w38r").foreach { v =>
        System.gc()
        val t0 = System.nanoTime()
        Bench.materialize(v match {
          case "w38" => momentFrame(df, numCols, wide38 = true)
          case "w19" => momentFrame(df, numCols, wide38 = false)
          case _ => momentFrame(df, numCols, wide38 = true, repart = 32)
        })
        val s = (System.nanoTime() - t0) / 1e9
        v match {
          case "w38" => t38(r) = s; case "w19" => t19(r) = s; case _ => t38r(r) = s
        }
        println(f"[momentsAB] rep $r $v $s%.3f s")
      }
    }
    // the full production query for scale context, same JVM
    val a1 = (1 to 3).map { _ =>
      System.gc()
      val t0 = System.nanoTime()
      Bench.materialize(SparkEntry.queries("a1_profile_lineitem")(spark, sfDir))
      (System.nanoTime() - t0) / 1e9
    }.min
    def stats(a: Array[Double]) = (a.min, a.sorted.apply(a.length / 2))
    val (m38, md38) = stats(t38)
    val (m19, md19) = stats(t19)
    val (m38r, md38r) = stats(t38r)
    println(f"[momentsAB] w38 min $m38%.3f median $md38%.3f | w19 min $m19%.3f median $md19%.3f | w38+repart32 min $m38r%.3f median $md38r%.3f | delta(min) ${(m38 - m19) / m19 * 100}%.1f%% | a1_full min-of-3 $a1%.3f")
    spark.stop()
  }
}
