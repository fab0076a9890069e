package graft

import org.apache.spark.sql.DataFrame

/** Benchmark main: times every catalog query at the target scale factor
  * and prints ONE JSON line. A warmup pass (table counts + the catalog at
  * the smallest available scale factor) absorbs JVM/codegen/parquet-footer
  * startup so per-query numbers measure the operators, not janino/C2. */
object Bench {

  /** Force FULL materialization of every output row and column, without
    * shipping data to the driver.
    *
    * `df.count()` is NOT a benchmark action: Catalyst prunes everything
    * the count doesn't need, so a count over a wide aggregate times only
    * the grouping (the aggregate functions are optimized away) and a
    * count over a projection times a zero-column scan. Executing the
    * analyzed plan's own InternalRow RDD produces every output row with
    * all columns computed — the work a real consumer of the query pays. */
  def materialize(df: DataFrame): Long = df.queryExecution.toRdd.count()

  /** One timed, fully-materialized execution behind a GC barrier. The
    * barrier keeps one query's garbage (an MLlib fit, a big broadcast)
    * from being collected inside the NEXT query's wall time — the
    * run-order contamination that made round-4 numbers partly
    * untrustworthy. */
  def timed(fn: => DataFrame): Double = {
    System.gc()
    val t0 = System.nanoTime()
    materialize(fn)
    (System.nanoTime() - t0) / 1e9
  }

  /** Host 1/5/15-minute run-queue lengths as a JSON array — the window
    * marker that lets a later reader distinguish "this run was noisy"
    * from "this query regressed" (r14's three final-tree runs spread
    * 121.6–154.0 s with nothing recording why). */
  private def loadavg: String =
    try {
      val p = java.nio.file.Files.readString(java.nio.file.Paths.get("/proc/loadavg"))
        .trim.split("\\s+")
      s"[${p(0)},${p(1)},${p(2)}]"
    } catch { case _: Throwable => "null" }

  /** Fixed-cost single-thread calibration: sort 4M seeded doubles. Its
    * wall is a direct probe of CPU contention DURING this process (a
    * loadavg number is a minutes-scale average that can miss a short
    * co-tenant burst); the quiet-window figure on this box is recorded
    * alongside each run so drift is self-evident. */
  private def calibrate(): Double = {
    val rnd = new java.util.Random(42)
    val a = Array.fill(1 << 22)(rnd.nextDouble())
    val t0 = System.nanoTime()
    java.util.Arrays.sort(a)
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val loadStart = loadavg
    val calibStart = calibrate()
    val spark = Sessions.local(appName = "graft-bench")

    // Warmup 1: fully materialize every table at the TARGET sf (all columns,
    // all row groups). A count() here is not enough — Catalyst prunes it to a
    // zero-column scan, leaving the data pages cold, and the first queries in
    // alphabetical order (a1_*, a5_*) then absorb the entire first-touch
    // parquet read of lineitem inside their own timings (r6 showed 6.0 s
    // benched vs 2.4 s steady-state for a1_profile_lineitem). BASELINE.md's
    // pandas numbers were measured page-cache-warm, so warm-read parity is
    // the apples-to-apples comparison; per-query numbers should measure the
    // operator, not the OS page cache.
    Tables.names.foreach { t =>
      try materialize(Tables.load(spark, sfDir, t))
      catch { case _: Throwable => () }
    }
    // Warmup 2: run the whole catalog at a SMALLER scale factor so codegen
    // compilation and JIT happen before the timed pass — MATERIALIZED like
    // the timed pass, because a count()-pruned plan compiles different
    // generated classes than the plan the timed pass executes. If no
    // smaller directory exists we skip this pass entirely — running it at
    // the target scale would double wall time and fully warm the page
    // cache, overstating steady-state numbers for cold-read workloads.
    val warmDir = sys.env.get("SPARK_GRAFT_WARMUP_DIR").orElse {
      val guess = sfDir.replaceAll("sf[0-9.]+/?$", "sf0.001")
      Option.when(guess != sfDir && new java.io.File(guess).isDirectory)(guess)
    }
    warmDir match {
      case Some(dir) =>
        SparkEntry.queries.foreach { case (_, fn) =>
          try materialize(fn(spark, dir)) catch { case _: Throwable => () }
        }
      case None =>
        System.err.println("[bench] no smaller scale-factor dir found; skipping catalog warmup")
    }

    // Timed pass: per query, MIN over `runs` back-to-back executions
    // (default 2). Single-shot numbers on this box carry ±25% run-to-run
    // noise (GC pauses, host scheduling) that dwarfs most plan-level
    // differences; the minimum estimates the operator's intrinsic cost
    // and is the standard way to time under noisy neighbors. A query
    // that throws is reported with value -1 (and listed under "failed")
    // so a failure can't masquerade as a timing.
    val runs = math.max(1, sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "2").toInt)
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val (v, ok) =
        try ((1 to runs).map(_ => timed(fn(spark, sfDir))).min, true)
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          (-1.0, false)
        }
      (name, v, ok)
    }
    val qs = results.map { case (k, v, ok) => "\"" + k + "\":" + (if (ok) v else -1.0) }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, _, false) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.collect { case (_, v, true) => v }.sum

    // Scale-up pass: time the headline subset on a 4× key-offset copy so
    // scaling curvature is part of the record (a plan that is secretly
    // quadratic or single-task shows ratio ≫ 4). Auto-runs at the
    // standard bench SF; SPARK_GRAFT_SCALEUP=on/off overrides.
    val scaleupMode = sys.env.getOrElse("SPARK_GRAFT_SCALEUP", "auto")
    val runScaleup = scaleupMode == "on" ||
      (scaleupMode == "auto" && sfDir.matches(".*sf0\\.1/?$"))
    var scaleupTotals: Option[(Int, Double, Double)] = None
    val scaleupJson =
      if (!runScaleup) ""
      else try {
        val copies = sys.env.getOrElse("SPARK_GRAFT_SCALEUP_COPIES", "4").toInt
        val dst = ScaleUp.ensure(spark, sfDir, copies)
        // base-scale headline times come from the timed pass above (same
        // session, same warmth) — only the Nx pass runs fresh
        val base = results.collect {
          case (k, v, true) if ScaleUp.Headline.contains(k) => k -> v
        }.toMap
        val big = ScaleUp.timeHeadline(spark, dst)
        val baseTotal = big.map { case (k, _) => base.getOrElse(k, 0.0) }.sum
        val bigTotal = big.map(_._2).sum
        scaleupTotals = Some((copies, baseTotal, bigTotal))
        val perQ = big.map { case (k, v) =>
          "\"" + k + "\":{\"base\":" + base.getOrElse(k, -1.0) + ",\"x4\":" + v + "}"
        }.mkString("{", ",", "}")
        // method note (r12 ADVICE): the base side reuses the main bench
        // pass (plain min-of-runs) while the Nx side runs through
        // timeHeadline's stop-on-stable extension — the extension can
        // only LOWER the Nx numerator, so this informational ratio reads
        // optimistic vs a symmetric measurement; the actual GATE
        // (DevScaleUp) times both sides through the same rule.
        s""","scaleup":{"copies":$copies,"total_base":$baseTotal,"total_x$copies":$bigTotal,"ratio":${bigTotal / math.max(baseTotal, 1e-9)},"method":"base from main bench pass (min-of-runs); x$copies via timeHeadline stop-on-stable (asymmetric: can only lower the x$copies side; gate runs symmetric in DevScaleUp)","queries":$perQ}"""
      } catch { case e: Throwable =>
        System.err.println(s"[bench] scaleup pass failed: ${e.getMessage}")
        ""
      }

    // Fast-path observability (r15): tally of driver-side metadata paths
    // vs Spark fallbacks across the whole timed run. These paths degrade
    // silently by design (any surprise → the Spark path), so a parquet-mr
    // version drift that broke them would otherwise show up only as v4/v5
    // wall times sliding — the counter makes it a visible number in the
    // artifact diff instead.
    val fastpath = graft.io.FastPath.snapshotJson
    val loadJson =
      s"""{"loadavg_start":$loadStart,"loadavg_end":$loadavg,""" +
        s""""calib_sort_sec_start":$calibStart,"calib_sort_sec_end":${calibrate()},""" +
        s""""cores":${Runtime.getRuntime.availableProcessors()}}"""
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","runs":$runs,"queries":$qs,"failed":$failed,"fastpath":$fastpath,"load":$loadJson,"sf":"$sfDir"$scaleupJson}"""
    println(json)
    // Also drop the line as a file: sbt wraps stdout in "[info] " prefixes,
    // so a consumer that greps the raw line has a clean fallback.
    try java.nio.file.Files.writeString(java.nio.file.Paths.get("BENCH_SELF.json"), json + "\n")
    catch { case _: Throwable => () }
    // The driver archives only the LAST ~2000 chars of stdout; with a
    // 175-query catalog the full line above no longer fits, so rounds 5–7
    // shipped a mid-JSON fragment (`parsed: null`). Print a compact,
    // complete summary LAST — totals, failure list, and a pointer to the
    // full per-query map (BENCH_SELF.json, committed per round) — so the
    // archived tail always ends in one parseable JSON line.
    val scaleupBrief = scaleupTotals.map { case (copies, b, x) =>
      s""","scaleup":{"copies":$copies,"total_base":$b,"total_x$copies":$x,"ratio":${x / math.max(b, 1e-9)}}"""
    }.getOrElse("")
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","runs":$runs,"n_queries":${results.size},"failed":$failed,"fastpath":$fastpath,"load":$loadJson,"sf":"$sfDir","queries_file":"BENCH_SELF.json"$scaleupBrief}""")
    spark.stop()
  }
}
