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

  /** Naive driver-side reference: standardize on anon (population σ),
    * one-hot distance via explicit fitted category vectors, k=1 min
    * distance, score mean. Deliberately a different code path (plain
    * Scala loops over explicit one-hot vectors) from both the engine and
    * the oracle identity form. */
  private def naiveRisk(anon: Seq[(Double, String)], real: Seq[(Double, String)]): Double = {
    val n = anon.length
    val mu = anon.map(_._1).sum / n
    val sd0 = math.sqrt(anon.map(v => (v._1 - mu) * (v._1 - mu)).sum / n)
    val sd = if (sd0 == 0.0) 1.0 else sd0
    val fitted = anon.map(_._2).filter(_ != null).distinct.sorted
    def vec(t: (Double, String)): Array[Double] =
      ((t._1 - mu) / sd) +: fitted.map(c => if (t._2 == c) 1.0 else 0.0).toArray
    val scores = anon.map { a =>
      val av = vec(a)
      val d0 = real.map { r =>
        val rv = vec(r)
        math.sqrt(av.zip(rv).map { case (x, y) => (x - y) * (x - y) }.sum)
      }.min
      1.0 - d0 / (d0 + 1e-9)
    }
    math.min(1.0, math.max(0.0, scores.sum / n))
  }

  test("perturbed subsets: risk matches a naive one-hot reference, incl. categories missing from the anon fit") {
    // the oracle SQL derives its category terms from the same fitted rule
    // as the engine (IN (SELECT DISTINCT…)), so the property to pin here
    // is the SEMANTICS under perturbation: anon lacking a category that
    // real has, unseen categories, and near-match numerics
    val cases = Seq(
      // anon has only A,B — real's R must map to a zero vector
      (Seq((25.0, "A"), (30.0, "B")), Seq((25.0, "R"), (30.0, "B"))),
      // anon category missing entirely from real
      (Seq((1.0, "A"), (2.0, "B"), (3.0, "B")), Seq((1.0, "B"), (2.5, "C"))),
      // exact matches through standardization
      (Seq((10.0, "X"), (20.0, "Y"), (30.0, "X")), Seq((10.0, "X"), (20.0, "Y"), (30.0, "X"))))
    cases.foreach { case (a, r) =>
      val risk = Linkage.linkageRisk(a.toDF("q", "f"), r.toDF("q", "f"), Seq("q", "f"))
        .collect()(0).getDouble(0)
      val expect = naiveRisk(a, r)
      assert(math.abs(risk - expect) < 1e-9, s"anon=$a real=$r: $risk vs $expect")
    }
  }

  test("linkageRisk guard dispatches exact below the pair ceiling, LSH above") {
    val anon = (1 to 40).map(i => (i.toDouble, if (i % 2 == 0) "A" else "B")).toDF("q", "f")
    val real = anon
    // tiny frames → pair space affordable → exact path
    assert(Linkage.exactIsSafe(anon, real))
    // forced-zero ceiling → guard must refuse the cross join
    assert(!Linkage.exactIsSafe(anon, real, maxPairBytesProduct = BigInt(0)))
    // both dispatch targets agree on this exact-match corpus, so the
    // guard is output-invisible here while provably switching plans:
    // the LSH physical form carries the hash-table generator; the exact
    // form must not
    val exactPlan = Linkage.linkageRisk(anon, real, Seq("q", "f"))
      .queryExecution.executedPlan.toString
    val lshPlan = Linkage.linkageRisk(anon, real, Seq("q", "f"), maxPairBytesProduct = BigInt(0))
      .queryExecution.executedPlan.toString
    assert(!exactPlan.contains("UDF"), s"exact path must stay UDF-free:\n$exactPlan")
    assert(exactPlan != lshPlan)
    val viaGuardExact = Linkage.linkageRisk(anon, real, Seq("q", "f")).collect()(0).getDouble(0)
    val viaGuardLsh = Linkage.linkageRisk(anon, real, Seq("q", "f"), maxPairBytesProduct = BigInt(0))
      .collect()(0).getDouble(0)
    assert(viaGuardExact == 1.0)
    assert(math.abs(viaGuardLsh - 1.0) < 1e-6)
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
