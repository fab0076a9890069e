package graft

import org.apache.spark.sql.SparkSession
import graft.core.GraftSession
import graft.io.{Csv, YamlConfig}

/** Runnable usage example of the 6-step pipeline (also serves as the
  * README's "switch from the reference" demo).
  * Usage: runMain graft.DemoPipeline <realCsv> <anonCsv> */
object DemoPipeline {
  def main(args: Array[String]): Unit = {
    val Array(realCsv, anonCsv) = args
    val spark = Sessions.local(cpus = "4", appName = "graft-demo")
    spark.sparkContext.setLogLevel("ERROR")

    val s = new GraftSession(spark)
    s.uploadReal(Csv.read(spark, realCsv))
    s.uploadAnon(Csv.read(spark, anonCsv))

    val risk = s.assessRisk()
    println(s"[demo] risk: score=${risk.riskScore} quasi=${risk.quasi.mkString(",")}")

    val cfgYaml = YamlConfig.dump(YamlConfig.PipelineConfig(
      sdcCols = Seq("gender"), generalizeCols = Seq("income"),
      dpCols = Seq("age"), epsilon = 1.0))
    println(s"[demo] config:\n$cfgYaml")
    val prot = s.protect(YamlConfig.load(cfgYaml))
    println("[demo] protected preview:")
    prot.show(3, truncate = false)

    val u = s.measureUtility(target = Some("target"))
    println("[demo] drift:")
    u.drift.show(10, truncate = false)
    u.modelUtility.foreach { m => println("[demo] model utility:"); m.show() }

    val (_, score) = s.compliance()
    println(s"[demo] compliance score: $score")

    val html = s.report()
    println(s"[demo] report: ${html.length} chars, contains risk_score=" +
      html.contains("risk_score"))
    spark.stop()
  }
}
