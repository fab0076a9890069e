package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Native histogram of an `array<long>` of bucket ids into a fixed-`dim`
  * `array<int>` of counts — the per-row kernel of the hashing-trick text
  * embedding (`TextStats.hashEmbedVec`).
  *
  * Why a custom Catalyst Expression: the HOF spelling
  * `transform(sequence(0, dim-1), b -> size(filter(hs, h -> h = b)))`
  * re-scans the token array once PER BUCKET and allocates a filtered
  * array each time — O(dim·tokens) interpreted work and dim allocations
  * per document (23 s for 5 000 docs at dim=64). This expression is one
  * O(tokens) pass into an int[dim], fully inside whole-stage codegen.
  *
  * Contract: ids outside [0, dim) and null elements are ignored; a NULL
  * array yields NULL. Counts are exact ints — identical to the
  * filter-count spelling for in-range ids, so the DuckDB oracle mirror
  * is unchanged.
  *
  * Scale note: stateless per-row projection — embarrassingly parallel at
  * any input size, no shuffle implications.
  */
case class BucketCounts(child: Expression, dim: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(dim > 0, s"bucket_counts dim must be positive, got $dim")

  override def inputTypes: Seq[DataType] = Seq(ArrayType(LongType))

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def prettyName: String = "bucket_counts"

  override protected def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val counts = new Array[Int](dim)
    val n = a.numElements()
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) {
        val h = a.getLong(i)
        if (h >= 0L && h < dim) counts(h.toInt) += 1
      }
      i += 1
    }
    new GenericArrayData(counts)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val counts = ctx.freshName("counts")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val h = ctx.freshName("h")
      s"""
         |int[] $counts = new int[$dim];
         |int $n = $a.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i)) {
         |    long $h = $a.getLong($i);
         |    if ($h >= 0L && $h < ${dim}L) $counts[(int) $h]++;
         |  }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($counts);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): BucketCounts =
    copy(child = newChild)
}
