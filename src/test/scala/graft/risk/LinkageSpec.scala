package graft.risk

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LinkageSpec extends SparkSpec {
  import spark.implicits._

  test("linkage risk = 1.0 when real contains exact quasi duplicates of anon") {
    val anon = Seq((25.0, 0.05, "A"), (30.0, 0.07, "B")).toDF("q", "d", "f")
    val real = Seq((25.0, 0.05, "A"), (30.0, 0.07, "B"), (99.0, 0.01, "C"))
      .toDF("q", "d", "f")
    val risk = Linkage.linkageRisk(anon, real, Seq("q", "d", "f"))
      .collect()(0).getDouble(0)
    assert(risk == 1.0)
  }

  test("linkage risk ≈ 0 when no exact match exists (k=1 degeneracy)") {
    val anon = Seq((25.0, 0.05, "A"), (30.0, 0.07, "B")).toDF("q", "d", "f")
    val real = Seq((26.0, 0.06, "A"), (31.0, 0.08, "B")).toDF("q", "d", "f")
    val risk = Linkage.linkageRisk(anon, real, Seq("q", "d", "f"))
      .collect()(0).getDouble(0)
    assert(risk < 1e-6)
  }

  test("linkage risk: mixed → fraction of exact-matched rows") {
    val anon = Seq((25.0, "A"), (30.0, "B"), (40.0, "C"), (50.0, "D")).toDF("q", "f")
    val real = Seq((25.0, "A"), (30.0, "B"), (41.0, "C"), (51.0, "D")).toDF("q", "f")
    val risk = Linkage.linkageRisk(anon, real, Seq("q", "f"))
      .collect()(0).getDouble(0)
    assert(math.abs(risk - 0.5) < 1e-6)
  }

  test("unseen categories in real produce zero vectors (handle_unknown=ignore)") {
    val anon = Seq((1.0, "A")).toDF("q", "f")
    val real = Seq((1.0, "Z")).toDF("q", "f") // Z unseen in anon fit
    val (realF, featCols) = Linkage.features(real, anon, Seq("q", "f"))
    assert(featCols == Seq("q", "f__A"))
    assert(realF.select(col("f__A")).collect()(0).getDouble(0) == 0.0)
  }

  test("v6 oracle precondition: anon subset carries exactly A/N/R at gated SFs") {
    // The v6_linkage_risk oracle SQL one-hot-encodes the fitted category
    // list; the Spark side derives it from the anon subset's distinct
    // values. This pins the two feature spaces together: if a fixture or
    // scale factor ever loses a flag value in the l_orderkey%100=0 subset,
    // this test fails loudly instead of the hash check diverging silently.
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")
      .filter(d => new java.io.File(d).isDirectory)
      .foreach { d =>
        val cats = graft.Tables.lineitem(spark, d)
          .filter(col("l_orderkey") % 100 === 0)
          .select(col("l_returnflag")).distinct()
          .collect().map(_.getString(0)).sorted.toSeq
        assert(cats == Seq("A", "N", "R"), s"at $d")
      }
  }

  test("LSH risk agrees with exact on an exact-match heavy pair") {
    val anon = (1 to 40).map(i => (i.toDouble, if (i % 2 == 0) "A" else "B")).toDF("q", "f")
    val real = anon
    val exact = Linkage.linkageRisk(anon, real, Seq("q", "f")).collect()(0).getDouble(0)
    val approx = Linkage.linkageRiskLSH(anon, real, Seq("q", "f")).collect()(0).getDouble(0)
    assert(exact == 1.0)
    assert(math.abs(approx - 1.0) < 1e-6)
  }
}
