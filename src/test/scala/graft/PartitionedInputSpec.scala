package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Hive-partitioned datasets are a distinct input CLASS, not a variant of
  * flat parquet: partition columns live in directory names instead of file
  * footers, the recovered schema appends them at the tail, file listing
  * order changes, and per-file row groups no longer contain every column.
  * The r15 round's one real defect — DictStats answering `distinct ≤ T`
  * unsoundly for partition columns (r14 ADVICE-high) — was exactly this
  * class going unexercised end-to-end: every fixture the catalog had ever
  * run on was a flat single file.
  *
  * This spec closes the class, not just the instance: hive-layout copies
  * of the sf0.001 fixtures (lineitem BY l_returnflag, orders BY
  * o_orderstatus, documents BY lang) are run through a representative
  * catalog slice — relational, profile, transform, privacy (including the
  * DictStats consumer v5 and the seeded driver-fit v4), drift, and
  * corpus/text families — and each query must produce SEMANTICALLY
  * IDENTICAL results on both layouts: columns aligned by name (the
  * partitioned read's tail-appended partition columns are Spark
  * semantics, not a defect), rows compared as sorted multisets, doubles
  * at 1e-9 relative tolerance (the driver comparator's float policy —
  * hive listing order legitimately reorders partial-aggregation inputs,
  * so bit equality of every double is not the contract; order-canonical
  * paths still match bit-for-bit and the tolerance only absorbs genuine
  * summation-order ulps).
  *
  * Division of labor with DictStatsSpec: the fixture's partition columns
  * are low-cardinality (so partition-value inference round-trips), which
  * means the original defect's wrong answer (`false` for `distinct > 20`)
  * coincides with the truth here — the threshold-CROSSING partition
  * column is pinned at module level by DictStatsSpec's partitioned case
  * (25 distinct at threshold 20 → must answer None, not false). This
  * spec guards everything else the layout changes: schema-tail partition
  * columns, hive listing order, footers missing the partition column,
  * the DriverParquet eligibility matrix, null/row-group pruning shapes.
  */
class PartitionedInputSpec extends SparkSpec {

  /** (table, partition column) choices: low-cardinality string columns so
    * partition-value type inference round-trips losslessly. */
  private val Partitioning = Seq(
    "lineitem" -> "l_returnflag",
    "orders" -> "o_orderstatus",
    "documents" -> "lang")

  private lazy val partDir: String = {
    val dir = "/tmp/graft_partfix"
    val path = java.nio.file.Paths.get(dir)
    org.apache.commons.io.FileUtils.deleteQuietly(path.toFile)
    java.nio.file.Files.createDirectories(path)
    Partitioning.foreach { case (t, pcol) =>
      Tables.load(spark, Sf, t)
        .write.partitionBy(pcol).mode("overwrite")
        .parquet(s"$dir/$t.parquet")
    }
    val done = Partitioning.map(_._1).toSet
    Tables.names.filterNot(done).foreach { t =>
      java.nio.file.Files.createSymbolicLink(
        path.resolve(s"$t.parquet"),
        java.nio.file.Paths.get(s"$Sf/$t.parquet"))
    }
    dir
  }

  /** One query per operator-family surface that reads a partitioned
    * table. v5 consumes DictStats (the fixed module: partition columns
    * must now fall back to the Spark path); v4's seeded synthesis rides
    * the DriverParquet fit eligibility matrix, which must refuse the
    * hive layout's pruned footers rather than misread them. */
  private val Slice = Seq(
    "q1_pricing_summary", "q18_large_orders", "q5_local_supplier_volume",
    "a1_profile_lineitem", "a2_value_counts", "a5_distinct_counts",
    "a9_category_pmf", "a_corr_matrix",
    "p_row_transforms", "p8_standardize",
    "v1_sdc_suppress", "v2_generalize", "v5_smart_suggest", "v4_synthetic",
    "v7_quasi_suggestions",
    "d1_ks_statistic", "d3_drift_all", "d_psi",
    "x_corpus_clean", "x_minhash_lsh", "x_token_chunks", "x_source_overlap",
    "t_lang_id", "x_doc_novelty")

  /** Collect with columns aligned by sorted name, rows sorted by a
    * coarse stable key (doubles at 6 significant digits so last-ulp
    * drift cannot reorder), then compared cell-wise at tolerance. */
  private def canon(df: DataFrame): Seq[Seq[Any]] = {
    val cols = df.columns.sorted.toSeq
    val rows = df.select(cols.map(col): _*).collect().map(_.toSeq).toSeq
    rows.sortBy(r => r.map(cellKey).mkString("\u0000"))
  }

  private def cellKey(v: Any): String = v match {
    case null => "\u0001null"
    case d: Double => if (d.isNaN) "NaN" else f"$d%.6e"
    case f: Float => f"${f.toDouble}%.6e"
    case s: collection.Seq[_] => s.map(cellKey).mkString("[", ",", "]")
    case a: Array[_] => a.map(cellKey).mkString("[", ",", "]")
    case other => String.valueOf(other)
  }

  private def cellsMatch(a: Any, b: Any): Boolean = (a, b) match {
    case (null, null) => true
    case (x: Double, y: Double) =>
      (x.isNaN && y.isNaN) || x == y ||
        math.abs(x - y) <= 1e-9 * math.max(1.0, math.max(math.abs(x), math.abs(y)))
    case (x: collection.Seq[_], y: collection.Seq[_]) =>
      x.length == y.length && x.lazyZip(y).forall(cellsMatch)
    case (x, y) => x == y
  }

  test("catalog slice: hive-partitioned inputs match flat inputs") {
    val failures = Slice.flatMap { name =>
      val q = SparkEntry.queries(name)
      try {
        val flat = canon(q(spark, Sf))
        val part = canon(q(spark, partDir))
        if (flat.length != part.length)
          Some(s"$name: row count ${flat.length} vs ${part.length}")
        else {
          val bad = flat.lazyZip(part).zipWithIndex.collectFirst {
            case ((fr, pr), i)
                if fr.length != pr.length || !fr.lazyZip(pr).forall(cellsMatch) =>
              s"$name: row $i differs\n  flat=$fr\n  part=$pr"
          }
          bad
        }
      } catch {
        case e: Exception => Some(s"$name: threw ${e.getClass.getSimpleName}: ${e.getMessage}")
      }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("directory datasets: in-place part rewrite is visible to the next load (no stale schema cache)") {
    // A part file rewritten IN PLACE (same name, truncate+write) changes
    // its own mtime but not any directory's — the one invalidation signal
    // a dir-keyed schema cache can never see. Tables must therefore not
    // cache directory datasets at all.
    import org.apache.spark.sql.functions.lit
    val dir = "/tmp/graft_dirschema"
    val path = java.nio.file.Paths.get(dir, "documents.parquet")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    java.nio.file.Files.createDirectories(path)
    def onePart(df: org.apache.spark.sql.DataFrame): java.nio.file.Path = {
      val tmp = s"$dir/__tmp"
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      new java.io.File(tmp).listFiles()
        .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
        .get.toPath
    }
    val base = Tables.documents(spark, Sf).limit(20)
    val v1 = onePart(base)
    val target = path.resolve("part-00000.parquet")
    java.nio.file.Files.copy(v1, target)
    assert(!Tables.load(spark, dir, "documents").columns.contains("extra"))
    val v2 = onePart(base.withColumn("extra", lit(1L)))
    // in-place: same file name, content replaced — dir mtimes untouched
    java.nio.file.Files.write(target, java.nio.file.Files.readAllBytes(v2),
      java.nio.file.StandardOpenOption.TRUNCATE_EXISTING)
    assert(Tables.load(spark, dir, "documents").columns.contains("extra"),
      "rewritten part file served a stale schema")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("partitioned lineitem: partition column recovered with original type and full cardinality") {
    val df = Tables.load(spark, partDir, "lineitem")
    val flat = Tables.load(spark, Sf, "lineitem")
    assert(df.schema("l_returnflag").dataType == flat.schema("l_returnflag").dataType)
    assert(df.columns.sorted.toSeq == flat.columns.sorted.toSeq)
    val a = df.groupBy("l_returnflag").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val b = flat.groupBy("l_returnflag").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a == b)
  }
}
