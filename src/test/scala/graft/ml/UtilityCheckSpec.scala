package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** D4 property bounds (prop-mode per SURVEY §2.4 — MLlib's optimizer is
  * not sklearn's, so values are bounded, never hash-compared). */
class UtilityCheckSpec extends SparkSpec {
  import spark.implicits._

  private def separable(n: Int, flip: Int = 0) = {
    // class 1 iff x1 > 0; a few flipped labels keep the fit non-trivial
    (1 to n).map { i =>
      val x = if (i % 2 == 0) 1.0 + (i % 7) else -1.0 - (i % 5)
      val label = if (i <= flip) (if (x > 0) 0 else 1) else (if (x > 0) 1 else 0)
      (x, x * 0.5 + (i % 3), label)
    }.toDF("x1", "x2", "target")
  }

  test("separable data → accuracy and weighted F1 near 1, bounded in (0.5, 1]") {
    val df = separable(400)
    val out = UtilityCheck.modelUtility(df, df, "target").collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    Seq("before", "after").foreach { k =>
      val (acc, f1) = out(k)
      assert(acc > 0.95 && acc <= 1.0, s"$k acc=$acc")
      assert(f1 > 0.95 && f1 <= 1.0, s"$k f1=$f1")
    }
    // identical input on both sides → identical metrics (seeded split)
    assert(out("before") == out("after"))
  }

  test("noisy labels reduce but do not destroy utility; metrics stay bounded") {
    val out = UtilityCheck.modelUtility(separable(400), separable(400, flip = 80), "target")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out("before") >= out("after") - 0.05, s"$out")
    out.values.foreach(a => assert(a >= 0.0 && a <= 1.0))
  }

  test("degenerate inputs yield the reference's NaN row") {
    // fewer than 2 classes
    val oneClass = Seq((1.0, 0), (2.0, 0), (3.0, 0)).toDF("x", "target")
    val r1 = UtilityCheck.evalOne(oneClass, "target")
    assert(r1._1.isNaN && r1._2.isNaN)
    // no numeric features besides the target
    val noFeats = Seq(("a", 1), ("b", 0)).toDF("s", "target")
    val r2 = UtilityCheck.evalOne(noFeats, "target")
    assert(r2._1.isNaN && r2._2.isNaN)
  }
}
