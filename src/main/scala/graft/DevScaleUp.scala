package graft

import org.apache.spark.sql.SparkSession

/** Dev-only: the sf1-rehearsal harness AND the scale-regression GATE.
  * Times the [[ScaleUp.Headline]] set at the base scale factor and at an
  * N× key-offset copy (default 16 — sf0.1 × 16 ≈ sf1.6 rows for
  * lineitem), printing per-query ratios, then asserts each row against
  * [[ScaleUp.ceilingFor]] (r15 rule: sub-1 s-base rows gate on the x16
  * WALL, ≥1 s-base rows on the ratio — records pinned to
  * SCALE_r14_repin_source.json): a breach exits NONZERO, so a
  * scale-shape regression fails as loudly as a correctness regression
  * fails Verify. A headline query without a recorded ceiling only
  * warns — its first measured walls become the next round's record. Also writes SCALE_SELF.json (the SCALE_r{N}
  * artifact format) directly — no log parsing needed.
  * Usage: runMain graft.DevScaleUp <sfDir> [copies]
  *
  * Method matches [[Bench]]: one untimed base pass compiles every plan
  * (janino/C2), then the timed base and N× passes run fully
  * materialized behind per-query GC barriers, min-of-2 each. */
object DevScaleUp {
  /** Locale-pinned "%.2f" for the JSON artifact: the f-interpolator
    * formats via the default JVM locale, so a comma-decimal locale
    * (de_DE) would emit `"ratio": 3,43` — invalid JSON in a GATE file. */
  private def jf(d: Double): String =
    String.format(java.util.Locale.ROOT, "%.2f", Double.box(d))

  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val copies = if (args.length > 1) args(1).toInt else 16
    // No skip list at any copy count (r15, closing the r10 vestige): the
    // docmark-v5 fixture already removed the cross-copy shingle pathology
    // that forced the r10 x64 skips, and the deliberately-raw all-pairs
    // tools now guard themselves AT PLAN TIME (ext/Dedup.requireRawInput-
    // Bounded, 256 MiB optimizer-estimate ceiling naming the auto twin) —
    // if a rehearsal scale ever crosses that ceiling the rehearsal
    // CATCHES the loud failure as that query's row instead of pre-skipping.
    val spark: SparkSession = Sessions.local(appName = "graft-devscaleup")
    // warm: compile the headline plans at base scale
    ScaleUp.Headline.foreach { n =>
      try Bench.materialize(SparkEntry.queries(n)(spark, sfDir))
      catch { case e: Throwable => System.err.println(s"[scaleup] warm $n: ${e.getMessage}") }
    }
    val base = ScaleUp.timeHeadline(spark, sfDir).toMap
    val dst = ScaleUp.ensure(spark, sfDir, copies)
    val big = ScaleUp.timeHeadline(spark, dst)
    var baseTotal = 0.0
    var bigTotal = 0.0
    val ratios = big.map { case (n, v) =>
      val b = base.getOrElse(n, -1.0)
      baseTotal += b; bigTotal += v
      val r = v / math.max(b, 1e-9)
      println(f"[scaleup] $n%-26s base $b%7.2f  x$copies%-3d $v%7.2f  ratio $r%6.2f")
      (n, b, v, r)
    }
    println(f"[scaleup] TOTAL base $baseTotal%.2f x$copies $bigTotal%.2f ratio ${bigTotal / math.max(baseTotal, 1e-9)}%.2f (linear = $copies)")

    // ---- regression gate ----
    // Ceilings are RECORDS AT x16: applying them to another copy count
    // would compare curvature measured on different fixtures. A non-x16
    // run (the x64 curvature rehearsal) is measurement-only: no gate,
    // and its artifact goes to SCALE_SELF_x{copies}.json so it can never
    // shadow the gate file.
    val gated = copies == 16
    val breaches = ratios.flatMap { case (n, _, v, r) =>
      if (!gated) None
      else ScaleUp.ceilingFor(n) match {
        case Some(("wall", c)) if v > c =>
          println(f"[scaleup] BREACH $n x16 wall $v%.2f s > wall ceiling $c%.2f s " +
            f"(recorded x16 ${ScaleUp.RecordedWalls(n)._2}%.2f s x slack ${ScaleUp.CeilingSlack})")
          Some(n)
        case Some(("ratio", c)) if r > c =>
          println(f"[scaleup] BREACH $n ratio $r%.2f > ratio ceiling $c%.2f " +
            f"(recorded ${ScaleUp.RecordedWalls(n) match { case (b, x) => x / b }}%.2f x slack ${ScaleUp.CeilingSlack})")
          Some(n)
        case Some(_) => None
        case None =>
          println(s"[scaleup] WARN no recorded walls for $n — this run becomes next round's record")
          None
      }
    }

    // SCALE_SELF.json — same shape scale_json.py produced from the logs
    val qJson = ratios.map { case (n, b, v, r) =>
      val gate = if (!gated) "" else ScaleUp.ceilingFor(n).map { case (kind, c) =>
        s""", "gate_kind": "$kind", "ceiling": ${jf(c)}"""
      }.getOrElse("")
      s""""$n": {"base": ${jf(b)}, "x$copies": ${jf(v)}, "ratio": ${jf(r)}$gate}"""
    }.mkString(",\n    ")
    val gateJson =
      if (!gated) "\"none (measurement-only: ceilings are x16 records)\""
      else if (breaches.isEmpty) "\"pass\""
      else breaches.map("\"" + _ + "\"").mkString("[", ", ", "]")
    val doc =
      s"""{
         |  "copies": $copies,
         |  "sf": "$sfDir",
         |  "linear_ratio": $copies.0,
         |  "total_base": ${jf(baseTotal)},
         |  "total_x$copies": ${jf(bigTotal)},
         |  "total_ratio": ${jf(bigTotal / math.max(baseTotal, 1e-9))},
         |  "gate": $gateJson,
         |  "ceiling_rule": "${ScaleUp.CeilingRule}",
         |  "method": "graft.DevScaleUp: headline set, plans precompiled at base, fully-materialized InternalRow execution behind per-query GC barriers, min-of-2 per query at both scales extended by up to 2 stop-on-stable reps while a >5 s row is still descending >=10% (warming-phase walls are not scaling evidence); fixture = key-offset copies with residue-class token mutation (zero cross-copy shingle overlap), per-copy money-cent offsets, and disjoint per-copy user populations (ScaleUp.ensure docmark-v5)",
         |  "queries": {
         |    $qJson
         |  }
         |}""".stripMargin
    val outName = if (gated) "SCALE_SELF.json" else s"SCALE_SELF_x$copies.json"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outName), doc)
    println(s"[scaleup] wrote $outName; gate=${
      if (!gated) "skipped (non-x16 measurement run)"
      else if (breaches.isEmpty) "pass" else s"FAIL ${breaches.mkString(",")}"}")
    spark.stop()
    if (breaches.nonEmpty) sys.exit(1)
  }
}
