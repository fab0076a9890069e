package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/** CSV source/sink (SURVEY.md §2.1 S1/S2; reference `app.py:116-119,200`).
  *
  * S1 mirrors `pd.read_csv` type inference; tests pin explicit schemas
  * where determinism matters (SURVEY §1.5). S2 writes a single header'd
  * file via coalesce(1) for byte-parity with the reference's download —
  * callers at scale should omit `singleFile` and let each task write its
  * own split.
  */
object Csv {

  /** S1: header + schema inference scan. */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("header", "true")
      .option("inferSchema", "true")
      .csv(path)

  /** S2: header'd CSV sink. */
  def write(df: DataFrame, path: String, singleFile: Boolean = true): Unit = {
    val out = if (singleFile) df.coalesce(1) else df
    out.write.mode("overwrite").option("header", "true").csv(path)
  }

  /** S6: row preview (reference `df.head()`). */
  def preview(df: DataFrame, n: Int = 5): Array[org.apache.spark.sql.Row] =
    df.limit(n).collect()
}
