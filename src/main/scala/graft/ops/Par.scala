package graft.ops

import org.apache.spark.sql.DataFrame

/** Parallelism repair for CPU-heavy NARROW pipelines.
  *
  * A parquet scan's parallelism is bounded by its file splits — and a
  * single-file, single-row-group table (the shape of every local
  * testdata table, and of any small dimension in production) plans as
  * ONE partition, so everything narrow downstream (explode fan-outs,
  * hashing, per-row kernels) runs on one core no matter how many the
  * session has. Operators whose per-row work dwarfs a row's shuffle
  * cost call [[widen]] on their input: a cheap round-robin repartition
  * to the session's parallelism, applied ONLY when the planned scan has
  * fewer partitions than half the cores.
  *
  * At scale this is a no-op by construction: a 100 TB table scans as
  * thousands of splits, so the guard never fires and no shuffle is
  * added. It exists for the opposite regime — plenty of cores, few
  * splits — where one 30 MB shuffle buys a 32× speedup on the compute
  * stage.
  */
object Par {

  /** Repartition `df` to the session's default parallelism iff its
    * planned RDD has fewer than half that many partitions. Plans (but
    * does not run) the physical query to read the partition count. */
  def widen(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    val cur = df.queryExecution.toRdd.getNumPartitions
    if (cur * 2 < target) df.repartition(target) else df
  }
}
