package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Inverse-CDF sampling over a fitted empirical distribution: maps a
  * uniform draw u ∈ [0,1) to `values[searchsorted(cum, u)]`, i.e. the
  * bootstrap draw the synthesizer's numeric columns need (reference
  * `modules/privacy.py:40-47` samples rows with replacement; an
  * inverse-CDF over the empirical distribution IS iid empirical
  * sampling).
  *
  * This replaces the engine's last Scala UDF: the fitted arrays ride
  * along as plan references (`ctx.addReferenceObj` — shipped once per
  * stage like any codegen constant, NOT re-broadcast per row), the
  * binary search runs inside whole-stage codegen with no boxing, and
  * the expression stays bit-identical to the UDF it replaces (same
  * `Arrays.binarySearch` insertion-point contract, same clamp).
  *
  * Scale note: pure per-row compute in the projection — no shuffle, no
  * driver round-trip; the fit arrays are bounded by the fitted value
  * domain (driver fit) or cents domain (distributed fit).
  */
case class EmpiricalSample(child: Expression, values: Array[Double], cum: Array[Double])
    extends UnaryExpression with ExpectsInputTypes {

  require(values.nonEmpty && values.length == cum.length,
    s"fit arrays must be non-empty and equal-length (${values.length} vs ${cum.length})")

  override def inputTypes: Seq[DataType] = Seq(DoubleType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "empirical_sample"

  override protected def nullSafeEval(u: Any): Any = {
    val j = java.util.Arrays.binarySearch(cum, u.asInstanceOf[Double])
    val idx = math.min(if (j >= 0) j else -j - 1, values.length - 1)
    values(idx)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val vRef = ctx.addReferenceObj("empValues", values, "double[]")
    val cRef = ctx.addReferenceObj("empCum", cum, "double[]")
    nullSafeCodeGen(ctx, ev, u => {
      val j = ctx.freshName("j")
      val idx = ctx.freshName("idx")
      s"""
         |int $j = java.util.Arrays.binarySearch($cRef, $u);
         |int $idx = $j >= 0 ? $j : -$j - 1;
         |if ($idx > ${values.length - 1}) $idx = ${values.length - 1};
         |${ev.value} = $vRef[$idx];
       """.stripMargin
    })
  }

  // fit arrays are value state, not plan structure: compare by content so
  // canonicalization/codegen caching behave
  override def equals(other: Any): Boolean = other match {
    case e: EmpiricalSample =>
      child == e.child && java.util.Arrays.equals(values, e.values) &&
        java.util.Arrays.equals(cum, e.cum)
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(child, Integer.valueOf(java.util.Arrays.hashCode(values)),
      Integer.valueOf(java.util.Arrays.hashCode(cum)))

  override protected def withNewChildInternal(newChild: Expression): EmpiricalSample =
    copy(child = newChild)
}
