package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/** ORC source/sink — the second columnar format large estates actually
  * hold (Hive-era lakes are ORC; Spark's reader is built in). Same
  * optimizer contract as parquet: column pruning via `ReadSchema`,
  * predicate pushdown via `PushedFilters` (ORC row-group/stripe statistics
  * skip IO), hive-style partition pruning when written with
  * `partitionBy`. Exists so a pipeline can ingest ORC estates without a
  * conversion pass; everything downstream is format-agnostic DataFrames.
  */
object Orc {

  /** Write `df` as ORC, optionally hive-partitioned (same pruning
    * semantics as [[Sinks.writePartitioned]]). */
  def write(df: DataFrame, path: String, partitionCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w).orc(path)
  }

  /** Read ORC back; filters and projections push into the stripe reader
    * exactly as with parquet (visible in `.explain("formatted")`). */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)
}
