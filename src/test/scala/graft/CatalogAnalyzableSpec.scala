package graft

/** Every registered query must at least ANALYZE against the current testdata.
  *
  * Guards the whole catalog against schema drift in the driver fixtures
  * (e.g. the round-5/6 regression where `events.ts` changed parquet encoding
  * to TIMESTAMP_NTZ and four queries failed analysis for two rounds without
  * any test going red — they simply vanished from CORRECTNESS_r{N}.json).
  * Analysis-only (`queryExecution.analyzed`), no execution, so the whole
  * sweep costs seconds; failure names the broken query.
  */
class CatalogAnalyzableSpec extends SparkSpec {

  test("every SparkEntry.queries entry analyzes against sf0.001") {
    val broken = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try { fn(spark, Sf).queryExecution.analyzed; None }
      catch { case e: Exception =>
        // getMessage may be null (bare NPE) or empty — never let the
        // reporter itself throw, or the sweep loses the query name.
        val msg = Option(e.getMessage).iterator
          .flatMap(_.linesIterator).find(_.trim.nonEmpty).getOrElse(e.toString)
        Some(s"$name: ${e.getClass.getSimpleName}: $msg")
      }
    }
    assert(broken.isEmpty, s"\n${broken.size} queries fail analysis:\n${broken.mkString("\n")}")
  }

  test("entry() flagship analyzes and resolves a non-empty schema") {
    assert(SparkEntry.entry(spark).queryExecution.analyzed.schema.nonEmpty)
  }
}
