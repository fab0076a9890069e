package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dataset snapshot diff — classify every row of two versions of a table
  * as added / removed / changed / unchanged (extension scope; no reference
  * counterpart). The audit primitive behind incremental corpus refreshes:
  * "what did this crawl/cleaning run actually change?"
  */
object Snapshot {

  /** Per-id diff of two table versions keyed by `idCol`, comparing the
    * `cmpCols` payload:
    *   - `added`     — id only in `newDf`
    *   - `removed`   — id only in `oldDf`
    *   - `changed`   — id in both, any payload column differs
    *   - `unchanged` — id in both, payload null-safely equal
    * Returns (id, change_class) ordered by id.
    *
    * Plan shape: ONE full-outer sort-merge/hash join on the id — the only
    * shuffle, and exactly the join co-located bucketing on `idCol` would
    * make shuffle-free at 100 TB ([[graft.io.Bucketing]]). Payloads
    * compare as null-safe struct equality (`<=>`), so a null payload cell
    * never misclassifies a row; presence flags distinguish "missing row"
    * from "row of nulls". */
  def diff(oldDf: DataFrame, newDf: DataFrame, idCol: String,
           cmpCols: Seq[String]): DataFrame = {
    def side(df: DataFrame, tag: String) = df.select(
      col(idCol),
      struct(cmpCols.map(col): _*).as(s"payload_$tag"),
      lit(true).as(s"in_$tag"))
    side(oldDf, "old").join(side(newDf, "new"), Seq(idCol), "full_outer")
      .select(
        col(idCol),
        when(col("in_old").isNull, "added")
          .when(col("in_new").isNull, "removed")
          .when(col("payload_old") <=> col("payload_new"), "unchanged")
          .otherwise("changed").as("change_class"))
      .orderBy(col(idCol))
  }

  /** Roll-up of [[diff]] to class counts — the summary line a pipeline
    * run report carries. The classification frame is already grouped by
    * nothing bigger than four classes, so this is one tiny aggregate on
    * top of the same single-join plan. */
  def diffSummary(oldDf: DataFrame, newDf: DataFrame, idCol: String,
                  cmpCols: Seq[String]): DataFrame =
    diff(oldDf, newDf, idCol, cmpCols)
      .groupBy("change_class").agg(count(lit(1)).as("n_rows"))
      .orderBy("change_class")
}
