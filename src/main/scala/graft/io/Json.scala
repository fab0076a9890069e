package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** JSON-lines source/sink — the interchange format a training-data
  * pipeline meets most often (one JSON document per line, splittable and
  * parallel-readable like CSV/parquet).
  *
  * Schema policy: inference is fine interactively, but a 100 TB read must
  * pin the schema (`readWithSchema`) — inference costs an extra full pass
  * and silently widens types when late files disagree. `columnNameOfCorruptRecord`
  * keeps malformed lines visible instead of dropping them.
  */
object Json {

  /** Inferred-schema scan (interactive use). */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.json(path)

  /** Pinned-schema scan with corrupt-record capture (PERMISSIVE: bad
    * lines land in `_corrupt_record` instead of failing the job). */
  def readWithSchema(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(schema.add("_corrupt_record", "string"))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)

  /** JSON-lines sink. */
  def write(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)
}
