package graft.io

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project, SubqueryAlias}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Driver-side scan statistics read from FILE METADATA — no Spark job.
  *
  * A dispatch decision (driver-fit vs distributed, broadcast vs shuffle)
  * often needs a ROW count, which plan statistics only carry under CBO;
  * without it the fallback is a probe job. But when the optimized plan
  * is a pure column-pruned scan, the exact row count is already sitting
  * in the parquet footers (one block-metadata record per row group) —
  * the same statistics the scan itself will use — and reading them is a
  * few milliseconds of driver IO per file. Callers keep their probe-job
  * fallback for every other plan shape (filters, joins, non-parquet
  * sources), so this is a pure fast path, never a new failure mode. */
object ScanStats {

  /** Exact row count when `df`'s optimized plan is a parquet scan with
    * no row-changing operator on top (column-pruning Projects and
    * aliases are fine; any Filter/Join/Aggregate is not). None means
    * "can't answer from metadata — use your fallback". Callers should
    * bound their own exposure first (the existing plan-stats byte
    * short-circuits): footer reads are per-file driver IO, right for
    * the ≲1 GiB plans dispatch decisions actually probe. */
  def parquetScanRowCount(df: DataFrame): Option[Long] =
    parquetScanLayout(df).map(_._1)

  /** The scanned parquet files when `df` is a pure scan whose projections
    * only prune or rename columns (plain attribute lists — no computed
    * expressions, no Filter/Join/Aggregate): the files' stored bytes ARE
    * the column values, so metadata readers ([[DictStats]]) and direct
    * column decoders ([[DriverParquet]]) may reason from them. */
  def pureParquetInputFiles(df: DataFrame): Option[Seq[String]] = {
    import org.apache.spark.sql.catalyst.expressions.AttributeReference
    def unwrap(p: LogicalPlan): LogicalPlan = p match {
      case Project(exprs, child) if exprs.forall(_.isInstanceOf[AttributeReference]) =>
        unwrap(child)
      case SubqueryAlias(_, child) => unwrap(child)
      case other => other
    }
    unwrap(df.queryExecution.optimizedPlan) match {
      case rel: LogicalRelation => rel.relation match {
        case fs: HadoopFsRelation
            if fs.fileFormat.getClass.getName.toLowerCase.contains("parquet") =>
          Some(fs.location.inputFiles.toSeq)
        case _ => None
      }
      case _ => None
    }
  }

  /** Exact (row count, row-group count) from the footers under the same
    * pure-scan condition as [[parquetScanRowCount]]. The row-group count
    * is the scan's PARALLELISM CEILING — data assignment is row-group
    * granular, so splitting a file beyond its groups only makes empty
    * tasks (the r10 DevScanSplit finding) — which makes it the right
    * driver-side signal for "this scan cannot use the machine" dispatch
    * (e.g. [[graft.ops.Profile]]'s narrow fan-out before heavy per-row
    * projections). */
  def parquetScanLayout(df: DataFrame): Option[(Long, Int)] = {
    def unwrap(p: LogicalPlan): LogicalPlan = p match {
      // a Project can only prune/rename columns — row-preserving
      case Project(exprs, child) if exprs.forall(_.deterministic) => unwrap(child)
      case SubqueryAlias(_, child) => unwrap(child)
      case other => other
    }
    unwrap(df.queryExecution.optimizedPlan) match {
      case rel: LogicalRelation => rel.relation match {
        case fs: HadoopFsRelation
            if fs.fileFormat.getClass.getName.toLowerCase.contains("parquet") =>
          val conf = df.sparkSession.sessionState.newHadoopConf()
          try {
            var rows = 0L
            var groups = 0
            fs.location.inputFiles.foreach { f =>
              val reader = ParquetFileReader.open(
                HadoopInputFile.fromPath(new Path(f), conf))
              try {
                rows += reader.getRecordCount
                groups += reader.getRowGroups.size()
              } finally reader.close()
            }
            Some((rows, groups))
          } catch { case _: Exception => None } // unreadable footer → fallback
        case _ => None
      }
      case _ => None
    }
  }
}
