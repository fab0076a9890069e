package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The native vec_dot expression must be bit-identical to the
  * left-associated fold it replaced (the oracle SQL mirrors that fold
  * term-for-term). */
class VecDotSpec extends SparkSpec {
  import spark.implicits._

  private def vec(xs: Double*): Array[Float] = xs.map(_.toFloat).toArray

  test("vec_dot equals a left-associated element_at chain bitwise") {
    val df = graft.Tables.embeddings(spark, Sf).limit(50)
      .select(col("embedding").as("a"), col("embedding").as("b"))
    val chain = (1 to 64).map(i =>
      element_at(col("a"), i).cast("double") * element_at(col("b"), i).cast("double"))
      .reduce(_ + _)
    val diff = df.select(
        call_function("vec_dot", col("a"), col("b")).as("fast"), chain.as("slow"))
      .filter(col("fast") =!= col("slow")) // bitwise: any ulp difference fails
      .count()
    assert(diff == 0L)
  }

  test("vec_dot basics: orthogonal, self, null") {
    val df = Seq(
      (Some(vec(1, 0)), Some(vec(0, 1))),
      (Some(vec(1, 2)), Some(vec(3, 4))),
      (None: Option[Array[Float]], Some(vec(1, 1)))
    ).toDF("a", "b")
    val out = df.select(call_function("vec_dot", col("a"), col("b"))).collect()
    assert(out(0).getDouble(0) == 0.0)
    assert(out(1).getDouble(0) == 11.0)
    assert(out(2).isNullAt(0))
  }

  test("vec_dot interpreted eval matches codegen") {
    val e = VecDot(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(1.0f, 2.0f, 3.0f), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(4.0f, 5.0f, 6.0f), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType)))
    assert(e.eval(null) == (1.0 * 4 + 2.0 * 5 + 3.0 * 6))
  }
}
