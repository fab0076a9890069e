package graft.core

import graft.SparkSpec
import graft.io.{Csv, YamlConfig}
import graft.io.YamlConfig.PipelineConfig
import java.time.Instant

/** End-to-end 6-step pipeline on the reference's own sample fixtures
  * (FIXTURES.md §1) — the "switch from the reference" scenario. */
class GraftSessionSpec extends SparkSpec {

  private lazy val real = Csv.read(spark, "/root/reference/sample_real.csv")
  private lazy val anon = Csv.read(spark, "/root/reference/sample_anon.csv")

  test("S1 csv inference matches the expected schema") {
    assert(real.schema.map(_.name) ==
      Seq("age", "gender", "pincode", "income", "target", "name"))
    assert(real.schema("age").dataType.typeName == "integer")
    assert(real.schema("income").dataType.typeName == "double")
  }

  test("full pipeline: risk=1.0 on the identical-pair demo, protect, utility, report") {
    val s = new GraftSession(spark)
    s.uploadReal(real).uploadAnon(anon)

    // V7 suggests age/gender/pincode/income; pairwise-identical rows → 1.0
    val risk = s.assessRisk()
    assert(risk.quasi == Seq("age", "gender", "pincode", "income"))
    assert(risk.riskScore == 1.0)

    val cfg = PipelineConfig(
      sdcCols = Seq("gender"), generalizeCols = Seq("income"),
      dpCols = Seq("age"), epsilon = 1.0)
    val prot = s.protect(cfg)
    assert(prot.count() == 200)
    assert(prot.schema("income").dataType.typeName == "string") // generalized

    val u = s.measureUtility(target = Some("target"), extended = true)
    val drift = u.drift.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(drift("income") == "chi2_like") // generalized col takes the categorical branch (SURVEY §4.4.1)
    assert(drift("age") == "ks")
    assert(u.statsBefore.count() == anon.columns.length)
    // extended monitoring frame: same columns, psi/js dispatch
    val ext = u.extendedDrift.get.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(ext.keySet == drift.keySet)
    assert(ext("income") == "js" && ext("age") == "psi")

    val (checklist, score) = s.compliance()
    assert(checklist.count() == 12 && score == 0.0)

    val html = s.report(clock = () => Instant.parse("2026-01-01T00:00:00Z"))
    assert(html.contains("\"risk_score\": 1.0"))
    assert(html.contains("protected preview"))
  }

  test("S3 yaml config round-trips") {
    val cfg = PipelineConfig(sdcCols = Seq("gender", "city"), epsilon = 2.5,
      generalizeCols = Seq("income"), synthetic = true, seed = 7L)
    assert(YamlConfig.load(YamlConfig.dump(cfg)) == cfg)
    assert(YamlConfig.load("") == PipelineConfig())
  }

  test("S2 csv sink writes a single header'd file") {
    val dir = java.nio.file.Files.createTempDirectory("graft_csv").toString + "/out"
    Csv.write(anon.limit(3), dir)
    val files = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".csv"))
    assert(files.length == 1)
    val lines = scala.io.Source.fromFile(files(0)).getLines().toSeq
    assert(lines.head == "age,gender,pincode,income,target")
    assert(lines.length == 4)
  }
}
