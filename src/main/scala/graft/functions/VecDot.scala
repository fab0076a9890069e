package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native dot product over two `array<float>` columns, accumulated
  * left-to-right in double precision.
  *
  * Why a custom Catalyst Expression and not `functions.aggregate`/a flat
  * `element_at` chain: the HOF form runs interpreted (CodegenFallback) and
  * re-evaluates captured subtrees per element, and the flat 64-term chain
  * is whole-stage-codegen'd but costs seconds of janino compilation per
  * plan (three such trees made `x_embed_topk` pay ~6 s of compile). This
  * expression generates a constant-size loop: microseconds to compile,
  * fully inside whole-stage codegen, and the sequential `s += a[i]*b[i]`
  * fold is bit-identical to a left-associated SQL sum — so oracle parity
  * is preserved term-for-term.
  *
  * Scale note: per-row compute with no shuffle implications; at 100 TB the
  * scan stays embarrassingly parallel and the expression vectorizes per
  * batch like any codegen'd projection.
  *
  * Contract: vectors are non-null float arrays of equal length (the
  * engine's embedding-column invariant). A NULL array yields NULL; the
  * loop runs over min(len(a), len(b)), and null ELEMENTS read as 0.0 —
  * callers needing strict length/null checking validate upstream.
  */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))

  override def dataType: DataType = DoubleType

  override def prettyName: String = "vec_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

/** Registration of the engine's native SQL functions, both as a
  * [[SparkSessionExtensions]] injector (`Sessions.local` builds with it)
  * and as an idempotent per-session registry call for externally-built
  * sessions. */
object GraftFunctions {

  private val functions: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("vec_dot", classOf[VecDot].getName, es => {
      require(es.length == 2, s"vec_dot expects 2 arguments, got ${es.length}")
      VecDot(es.head, es(1))
    }),
    // empirical_sample(u, values_literal, cum_literal): the array literals
    // are unwrapped ONCE here at plan time into the expression's reference
    // arrays — codegen never touches ArrayData per row
    ("shingle_hashes", classOf[ShingleHashes].getName, es => {
      require(es.length == 2, s"shingle_hashes expects (text, n), got ${es.length} args")
      val n = es(1) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
        case other => sys.error(s"shingle_hashes n must be an int literal, got $other")
      }
      ShingleHashes(es.head, n)
    }),
    ("simhash64", classOf[Simhash64].getName, es => {
      require(es.length == 1, s"simhash64 expects 1 argument, got ${es.length}")
      Simhash64(es.head)
    }),
    ("minhash_sig", classOf[MinhashSig].getName, es => {
      require(es.length == 2, s"minhash_sig expects (hashes, numPerms), got ${es.length} args")
      val p = es(1) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
        case other => sys.error(s"minhash_sig numPerms must be an int literal, got $other")
      }
      MinhashSig(es.head, p)
    }),
    ("lang_pred", classOf[LangPred].getName, es => {
      require(es.length == 1, s"lang_pred expects 1 argument, got ${es.length}")
      LangPred(es.head, graft.ext.TextStats.LangMarkers)
    }),
    ("bucket_counts", classOf[BucketCounts].getName, es => {
      require(es.length == 2, s"bucket_counts expects (ids, dim), got ${es.length} args")
      val d = es(1) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
        case other => sys.error(s"bucket_counts dim must be an int literal, got $other")
      }
      BucketCounts(es.head, d)
    }),
    ("empirical_sample", classOf[EmpiricalSample].getName, es => {
      require(es.length == 3, s"empirical_sample expects 3 arguments, got ${es.length}")
      def arr(e: Expression, what: String): Array[Double] = e match {
        case org.apache.spark.sql.catalyst.expressions.Literal(
            a: org.apache.spark.sql.catalyst.util.ArrayData, _) => a.toDoubleArray()
        case other => sys.error(s"empirical_sample $what must be an array literal, got $other")
      }
      EmpiricalSample(es.head, arr(es(1), "values"), arr(es(2), "cum"))
    })
  )

  /** For `SparkSession.builder().withExtensions(GraftFunctions.install)`. */
  def install(ext: SparkSessionExtensions): Unit =
    functions.foreach { case (name, clazz, builder) =>
      ext.injectFunction((FunctionIdentifier(name), new ExpressionInfo(clazz, name), builder))
    }

  /** Idempotent runtime registration for sessions not built with the
    * extension (e.g. a user's own session handed to the library). */
  def ensureRegistered(spark: SparkSession): Unit =
    functions.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "internal")
    }
}
