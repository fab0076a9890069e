package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir, rest) = args match {
      case Array(s, o, r @ _*) => (s, o, r.toSet)
    }
    // --x16: dump the scale-fixture oracle map (the dedup autos'
    // above-ceiling banded semantics) instead of the driver-SF one
    val x16 = rest("--x16")
    val spark = Sessions.local(
      cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"), appName = "graft-verify")
    dump(spark, sfDir, outDir, rest - "--x16", x16Oracles = x16)
    spark.stop()
  }

  /** The dump body behind [[main]], callable in-process (FuzzSpec runs it
    * against generated fixtures with the suite's shared session). Returns
    * the names that FAILED to produce output. */
  def dump(spark: SparkSession, sfDir: String, outDir: String,
           only: Set[String], x16Oracles: Boolean = false): Seq[String] = {
    new java.io.File(outDir).mkdirs()
    val selected =
      if (only.isEmpty) SparkEntry.queries
      else SparkEntry.queries.filter { case (n, _) => only(n) }
    val failed = selected.flatMap { case (name, fn) =>
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        None
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        Some(name)
      }
    }.toSeq
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val oracles = if (x16Oracles) SparkEntry.oracleSqlX16 else SparkEntry.oracleSql
    val json = oracles
      // fixture-scoped scratch paths (s1 CSV round-trip) resolve at dump
      // time, when the source sfDir is known
      .map { case (k, v) => k -> v.replace("{S1_CSV_DIR}", SparkEntry.s1CsvPath(sfDir)) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    failed
  }
}
