package graft

import org.scalatest.funsuite.AnyFunSuite

/** Grep-gate for the two anti-patterns the plan sweeps can't see from a
  * fixture-scale physical plan: DRIVER COLLECTS and FORCED BROADCASTS.
  * Every `.collect()` in ops/ext/risk/streaming must be a bounded driver
  * fit behind a measured ceiling, and every `broadcast(...)` hint must be
  * either provably constant-size (dimension tables, fit rows) or behind a
  * plan-stats size gate (`maybeBroadcast`) — that's a REVIEW judgment, so
  * the gate pins the per-file COUNTS: adding a new site fails here until
  * the author consciously re-records it, making "new unguarded
  * collect/broadcast" impossible to land silently. Comment lines don't
  * count; Dev-prefixed and Bench/Verify/Demo tooling is out of scope. */
class SourceSweepSpec extends AnyFunSuite {

  private val Root = java.nio.file.Paths.get("src/main/scala/graft")

  /** file (repo-relative) → (collect sites, broadcast hints). Update ONLY
    * alongside a review of the new site's boundedness (ceiling, fit size,
    * or maybeBroadcast gate) — note the justification in the commit. */
  private val Recorded: Map[String, (Int, Int)] = Map(
    "ExtCatalog.scala" -> (0, 3),
    // r12: the a1_profile_approx_audit rank recount collects the 21
    // quantile literals off the checkpointed 11-row profile (bounded at
    // any corpus size) instead of broadcast-joining them against a 7×
    // corpus-fan-out explode — the broadcast went away WITH the explode.
    "QueryCatalog.scala" -> (1, 0),
    "ext/Chunking.scala" -> (0, 1),
    "ext/Dedup.scala" -> (1, 6),
    "ext/Sampling.scala" -> (0, 5),
    "ext/SimSearch.scala" -> (4, 5),
    "ext/Sketches.scala" -> (1, 0),
    // r13: bigramLogProb's two count-table broadcasts fused into ONE
    // pre-combined (a,b)->term broadcast, gated by the checkpointed
    // table's exact row count (BigramBroadcastMaxTermRows) — a bounded,
    // measured-size broadcast, reviewed
    "ext/TextStats.scala" -> (0, 5),
    "io/Csv.scala" -> (1, 0),
    "io/ZOrder.scala" -> (1, 1),
    // r16 +2 collects: collectCatSides' two per-side grouped-count
    // collects feeding the psi/js/chi2 driver tails — both behind the
    // same KsDriverMaxBytes input ceiling as every drift driver path
    // (bounded inputs ⇒ bounded category domains; above it the windowed
    // plan tail runs and neither site executes), reviewed
    "ops/Drift.scala" -> (9, 3),
    "ops/Exact.scala" -> (5, 1),
    // r14 +2 collects: collectRawState's per-column parallel path (one
    // RDD collect per fitted column) — both behind the DriverFitMaxCells
    // dispatch, same boundedness as the fused collect they replace
    "ops/Privacy.scala" -> (6, 1),
    "ops/Profile.scala" -> (2, 1),
    "ops/Relational.scala" -> (0, 9),
    "ops/RowTransforms.scala" -> (1, 3),
    "report/Html.scala" -> (1, 0),
    // risk/Linkage.scala: 0 collects since the r11 fit-once refactor
    // moved the bounded feature-stat collects into RowTransforms
    "streaming/DriftStream.scala" -> (3, 0),
    "streaming/Events.scala" -> (0, 3))

  private def excluded(name: String): Boolean =
    name.startsWith("Dev") || Seq("Bench.scala", "Verify.scala",
      "DemoPipeline.scala").contains(name)

  test("driver-collect and broadcast-hint sites match the reviewed record") {
    import scala.jdk.CollectionConverters._
    val actual = java.nio.file.Files.walk(Root).iterator().asScala
      .filter(p => p.toString.endsWith(".scala") && !excluded(p.getFileName.toString))
      .flatMap { p =>
        val code = java.nio.file.Files.readAllLines(p).asScala
          .map(_.trim).filterNot(l => l.startsWith("//") || l.startsWith("*"))
        val collects = code.map(l =>
          l.sliding(".collect()".length).count(_ == ".collect()")).sum
        val bcasts = code.map(l =>
          l.sliding("broadcast(".length).count(_ == "broadcast(")).sum
        if (collects == 0 && bcasts == 0) None
        else Some(Root.relativize(p).toString -> (collects, bcasts))
      }.toMap
    val drift = (actual.keySet ++ Recorded.keySet).toSeq.sorted.flatMap { f =>
      val a = actual.getOrElse(f, (0, 0))
      val r = Recorded.getOrElse(f, (0, 0))
      if (a == r) None
      else Some(s"  $f: actual (collect=${a._1}, broadcast=${a._2}) vs recorded (${r._1}, ${r._2})")
    }
    assert(drift.isEmpty,
      "collect/broadcast site counts drifted from the reviewed record —\n" +
        "review each NEW site for boundedness (ceiling / fit-size / maybeBroadcast\n" +
        "gate), then update SourceSweepSpec.Recorded in the same commit:\n" +
        drift.mkString("\n"))
  }
}
