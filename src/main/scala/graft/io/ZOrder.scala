package graft.io

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustered layout — multi-DIMENSIONAL data
  * skipping for the write side (SURVEY.md §1.5 scale brief; the Delta
  * Lake / Iceberg `OPTIMIZE ZORDER BY` idea, built from plain Spark).
  *
  * Range-partitioning a table by ONE key gives perfect file pruning on
  * that key and none on any other. Interleaving the bits of two keys'
  * rank buckets puts rows that are close in BOTH dimensions into the
  * same file, so per-file parquet min/max footers prune scans filtered
  * on EITHER key (each z-contiguous file covers a bounded rectangle of
  * the key domain, side ~domain/2^(bits - fileBits/2) instead of the
  * full axis). At 100 TB this is the difference between "point queries
  * on the secondary key read every file" and "they read O(√files)".
  *
  * Everything is exact integer arithmetic — bucket = (v-min)·2^bits div
  * (range+1), z = bit interleave — so the layout is a pure deterministic
  * function of the data and the DuckDB oracle mirrors it bit-for-bit.
  */
object ZOrder {

  /** Per-dimension bucket index in [0, 2^bits): monotone in `v`, full
    * range maps onto the full bucket space. Spark and DuckDB both
    * evaluate `/` as IEEE double division, so the result is EXACT (and
    * engine-identical) while (max-min)·2^bits < 2^53 — at bits = 8
    * that is any key domain below ~3.5·10¹³, comfortably past real
    * surrogate-key ranges; beyond it, widen to a two-step div. */
  private def bucket(v: Column, minV: Column, maxV: Column, bits: Int): Column =
    floor((v - minV) * lit(1L << bits) / (maxV - minV + lit(1L))).cast("long")

  /** Morton z-value of two bucket indices: bit i of b1 → bit 2i, bit i
    * of b2 → bit 2i+1. A fixed fold of shifts/masks — pure codegen. */
  private[graft] def interleave(b1: Column, b2: Column, bits: Int): Column =
    (0 until bits).map { i =>
      shiftleft(shiftright(b1, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(shiftright(b2, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)

  /** `df` with a `zval` column interleaving `k1`/`k2` rank buckets.
    * The min/max fit is ONE map-side-combinable aggregate broadcast
    * onto the scan — no second pass, no driver round-trip in the plan.
    * A NULL key buckets to 0 (clustering with the axis minimum): parquet
    * footers ignore nulls for min/max, so pruning on the other key is
    * unaffected — and without the coalesce a single null row gave the
    * whole write path a null zval and an opaque NPE at the cut fit. */
  def withZValue(df: DataFrame, k1: String, k2: String,
                 bits: Int = 8): DataFrame = {
    require(bits > 0 && bits <= 16, "bits must be in [1,16]")
    val ext = df.agg(
      min(col(k1)).cast("long").as("min1"), max(col(k1)).cast("long").as("max1"),
      min(col(k2)).cast("long").as("min2"), max(col(k2)).cast("long").as("max2"))
    df.crossJoin(broadcast(ext))
      .withColumn("zval", interleave(
        coalesce(bucket(col(k1).cast("long"), col("min1"), col("max1"), bits), lit(0L)),
        coalesce(bucket(col(k2).cast("long"), col("min2"), col("max2"), bits), lit(0L)),
        bits))
      .drop("min1", "max1", "min2", "max2")
  }

  /** Clustering-quality view: split the z-range into `parts` contiguous
    * slices (the file boundaries a z-ordered write produces) and report
    * each slice's row count and k1/k2 bounding rectangle. The rectangle
    * spans ARE the parquet footer min/max a scan would prune against —
    * this query is the audit that the layout actually localizes both
    * keys. Exact integers end-to-end (oracle-EXACT). */
  def zorderStats(df: DataFrame, k1: String, k2: String,
                  bits: Int = 8, parts: Int = 16): DataFrame = {
    require(parts > 0 && Integer.bitCount(parts) == 1 && parts <= (1 << (2 * bits)),
      "parts must be a power of two within the z-range")
    val shift = 2 * bits - (31 - Integer.numberOfLeadingZeros(parts))
    withZValue(df, k1, k2, bits)
      .withColumn("slice", shiftright(col("zval"), shift))
      .groupBy("slice")
      .agg(count(lit(1)).as("n_rows"),
        min(col(k1)).cast("long").as("min_k1"), max(col(k1)).cast("long").as("max_k1"),
        min(col(k2)).cast("long").as("min_k2"), max(col(k2)).cast("long").as("max_k2"))
      .orderBy("slice")
  }

  /** Write `df` z-order-clustered into `parts` files, each covering a
    * CELL-ALIGNED contiguous z-range, sorted within, helper columns
    * dropped. Parquet then records per-file min/max for BOTH keys over a
    * bounded rectangle — the data-skipping layout `zorderStats` audits.
    *
    * File boundaries are NOT sampled `repartitionByRange(zval)` quantiles:
    * the range partitioner's sampled split points land mid-cell, and a
    * file that takes even a sliver of the next z-octant inherits that
    * octant's corner coordinates in its footer min/max — the straddle
    * that un-prunes band queries. Instead the z-range splits into
    * `parts`·`cellsPerFile` prefix cells, ONE tiny exact count aggregate
    * (driver-bounded by the cell count, not the data) feeds a greedy
    * balanced cut of contiguous cell RUNS into `parts` groups, and the
    * monotone group id becomes the range-partition key — every file is a
    * whole number of z-cells, count-balanced under skew. */
  def zorderWrite(df: DataFrame, k1: String, k2: String, path: String,
                  bits: Int = 8, parts: Int = 16,
                  cellsPerFile: Int = 16): Unit = {
    require(parts > 0 && cellsPerFile > 0, "parts/cellsPerFile must be positive")
    val cellBits = math.min(2 * bits,
      64 - java.lang.Long.numberOfLeadingZeros(parts.toLong * cellsPerFile - 1))
    val shift = 2 * bits - cellBits.toInt
    val z = withZValue(df, k1, k2, bits)
      .withColumn("zcell", shiftright(col("zval"), shift))
    // Exact per-cell counts: ≤ parts·cellsPerFile rows regardless of data
    // volume — the documented driver-bounded fit of this operator.
    val cells = z.groupBy("zcell").agg(count(lit(1)).as("n"))
      .orderBy("zcell").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val total = cells.map(_._2).sum.toDouble
    // Greedy balanced cut: close a group once its mass reaches the ideal
    // share, but never let trailing groups starve (leave ≥1 cell each).
    // The second disjunct FORCES a cut when the remaining cells exactly
    // cover the remaining cuts — end-concentrated mass (e.g. counts
    // [1,1,1,97]) otherwise never reaches the ideal share in time and
    // the whole table lands in ONE file.
    val upper = Array.newBuilder[Long] // inclusive zcell upper bound per cut
    var acc = 0L; var cut = 1
    cells.zipWithIndex.foreach { case ((c, n), i) =>
      acc += n
      val remainingCells = cells.length - i - 1
      val remainingCuts = parts - cut
      if (cut < parts && remainingCuts <= remainingCells &&
          (acc >= total * cut / parts || remainingCuts == remainingCells)) {
        upper += c; cut += 1
      }
    }
    val bounds = upper.result()
    // Monotone file id: number of cut bounds strictly below this cell —
    // a short codegen'd comparison chain, no join, no driver lookup.
    val fid = bounds.foldLeft(lit(0)) { (acc, b) =>
      acc + when(col("zcell") > lit(b), 1).otherwise(0)
    }
    val withFid = z.withColumn("fid", fid)
    // Exact placement: partition i holds EXACTLY file-id i. The
    // declarative spelling (`repartitionByRange(parts, fid)`) re-derives
    // boundaries by SAMPLING and can merge two ids into one partition
    // (an empty file, a doubled rectangle) whenever a group's mass slips
    // between sample points. Placement-by-computed-id is the one spot
    // where the engine genuinely needs an identity partitioner, so this
    // drops to the RDD layer for the final exchange+sort only.
    val schema = withFid.schema
    val fidIdx = schema.fieldIndex("fid")
    val zvalIdx = schema.fieldIndex("zval")
    val partitioner = new org.apache.spark.Partitioner {
      def numPartitions: Int = parts
      def getPartition(key: Any): Int = key.asInstanceOf[(Int, Long)]._1
    }
    val placed = withFid.rdd
      .map(r => ((r.getInt(fidIdx), r.getLong(zvalIdx)), r))
      .repartitionAndSortWithinPartitions(partitioner)
      .values
    df.sparkSession.createDataFrame(placed, schema)
      .drop("zval", "zcell", "fid")
      .write.mode("overwrite").parquet(path)
  }
}
