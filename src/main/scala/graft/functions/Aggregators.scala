package graft.functions

import org.apache.spark.sql.expressions.Aggregator

/** Saturating-set buffer for [[CappedDistinct]]. */
case class CapSet(over: Boolean, items: Seq[String])

/** Distinct count with SATURATION: exact while the running set holds ≤ cap
  * values, and pinned to cap+1 the moment it exceeds it. For
  * threshold-style questions ("are there more than 50 distinct values?")
  * this is exact whenever threshold < cap — and unlike a real distinct
  * aggregation the state is bounded: every partition's partial collapses
  * to at most cap+1 strings (usually the single `over` bit), so a
  * high-cardinality column costs O(1) per row after saturation and the
  * shuffle carries ~nothing. A 100 TB column with 10⁹ distinct values
  * shuffles 65 strings instead of 10⁹ rows.
  *
  * A typed [[Aggregator]] (ObjectHashAggregate keeps the buffer as a JVM
  * object; serialization only on shuffle) — the Spark-native form for an
  * aggregate whose state has no fixed-width encoding.
  */
/** [[CappedDistinct]] over pre-hashed 64-bit values — for threshold
  * questions the column value can be hashed first (xxhash64 is codegen'd;
  * no string materialization), making the per-row cost a long compare.
  * `Long.MinValue` is the caller's null sentinel and is not counted. */
case class CapSetL(over: Boolean, items: Seq[Long])
class CappedDistinctLong(cap: Int) extends Aggregator[Long, CapSetL, Long] {
  override def zero: CapSetL = CapSetL(over = false, Nil)
  override def reduce(b: CapSetL, v: Long): CapSetL =
    if (b.over || v == Long.MinValue) b
    else if (b.items.contains(v)) b
    else if (b.items.length >= cap) CapSetL(over = true, Nil)
    else CapSetL(over = false, v +: b.items)
  override def merge(a: CapSetL, b: CapSetL): CapSetL =
    if (a.over || b.over) CapSetL(over = true, Nil)
    else {
      val u = (a.items ++ b.items).distinct
      if (u.length > cap) CapSetL(over = true, Nil) else CapSetL(over = false, u)
    }
  override def finish(r: CapSetL): Long = if (r.over) cap + 1L else r.items.length.toLong
  override def bufferEncoder: org.apache.spark.sql.Encoder[CapSetL] =
    org.apache.spark.sql.Encoders.product[CapSetL]
  override def outputEncoder: org.apache.spark.sql.Encoder[Long] =
    org.apache.spark.sql.Encoders.scalaLong
}

/** Bounded k-smallest-ids-per-group aggregate — the scale-correct form of
  * "keep at most k rows per key": every partition's partial state is at
  * most k longs (sorted ascending), partials are map-side combinable, and
  * the shuffle carries k values per (partition, key) instead of every row.
  * The window-function formulation (`row_number() OVER (PARTITION BY key
  * ORDER BY id) <= k`) sorts ALL rows of every key through one exchange;
  * this aggregate reduces first — on a 100 TB corpus with per-domain caps
  * that is the difference between shuffling k·|domains| longs and
  * shuffling the corpus. Output order is ascending, deterministic. */
case class MinKBuf(items: Seq[Long])
class MinKIds(k: Int) extends Aggregator[Long, MinKBuf, Seq[Long]] {
  require(k > 0, s"cap must be positive: $k")
  override def zero: MinKBuf = MinKBuf(Vector.empty)
  override def reduce(b: MinKBuf, v: Long): MinKBuf =
    if (b.items.length >= k && v >= b.items.last) b
    else {
      val (lo, hi) = b.items.span(_ <= v)
      MinKBuf(((lo :+ v) ++ hi).take(k))
    }
  override def merge(a: MinKBuf, b: MinKBuf): MinKBuf =
    MinKBuf((a.items ++ b.items).sorted.take(k))
  override def finish(r: MinKBuf): Seq[Long] = r.items
  override def bufferEncoder: org.apache.spark.sql.Encoder[MinKBuf] =
    org.apache.spark.sql.Encoders.product[MinKBuf]
  override def outputEncoder: org.apache.spark.sql.Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}

/** Bounded k-best-by-score aggregate — [[MinKIds]]' scored sibling and
  * the scale-correct form of "top k per key by score": partial state is
  * at most k (score, id) pairs kept sorted (score DESC, id ASC — the
  * same total order as `ORDER BY score DESC, id` with Spark's
  * NaN-greatest double semantics), partials merge map-side, and the
  * shuffle carries k pairs per (partition, key) instead of every scored
  * row. The window formulation (`row_number() OVER (PARTITION BY qid
  * ORDER BY score DESC)`) funnels every candidate row of a query
  * through one task — on a 100 TB corpus, single-task-per-query. */
case class TopKBuf(items: Seq[(Double, Long)])
class TopKByScore(k: Int) extends Aggregator[(Double, Long), TopKBuf, Seq[(Double, Long)]] {
  require(k > 0, s"k must be positive: $k")
  private val ord: Ordering[(Double, Long)] = new Ordering[(Double, Long)] {
    def compare(a: (Double, Long), b: (Double, Long)): Int = {
      val c = java.lang.Double.compare(b._1, a._1) // score DESC, NaN greatest
      if (c != 0) c else java.lang.Long.compare(a._2, b._2) // id ASC
    }
  }
  override def zero: TopKBuf = TopKBuf(Vector.empty)
  override def reduce(b: TopKBuf, v: (Double, Long)): TopKBuf =
    if (b.items.length >= k && ord.compare(v, b.items.last) >= 0) b
    else {
      val (lo, hi) = b.items.span(ord.compare(_, v) <= 0)
      TopKBuf(((lo :+ v) ++ hi).take(k))
    }
  override def merge(a: TopKBuf, b: TopKBuf): TopKBuf =
    TopKBuf((a.items ++ b.items).sorted(ord).take(k))
  override def finish(r: TopKBuf): Seq[(Double, Long)] = r.items
  override def bufferEncoder: org.apache.spark.sql.Encoder[TopKBuf] =
    org.apache.spark.sql.Encoders.product[TopKBuf]
  override def outputEncoder: org.apache.spark.sql.Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
}

class CappedDistinct(cap: Int) extends Aggregator[String, CapSet, Long] {
  override def zero: CapSet = CapSet(over = false, Nil)

  override def reduce(b: CapSet, v: String): CapSet =
    if (b.over || v == null) b // distinct counts exclude nulls
    else if (b.items.contains(v)) b
    else if (b.items.length >= cap) CapSet(over = true, Nil)
    else CapSet(over = false, v +: b.items)

  override def merge(a: CapSet, b: CapSet): CapSet =
    if (a.over || b.over) CapSet(over = true, Nil)
    else {
      val u = (a.items ++ b.items).distinct
      if (u.length > cap) CapSet(over = true, Nil) else CapSet(over = false, u)
    }

  override def finish(r: CapSet): Long = if (r.over) cap + 1L else r.items.length.toLong

  override def bufferEncoder: org.apache.spark.sql.Encoder[CapSet] =
    org.apache.spark.sql.Encoders.product[CapSet]
  override def outputEncoder: org.apache.spark.sql.Encoder[Long] =
    org.apache.spark.sql.Encoders.scalaLong
}
