package graft.io

import graft.SparkSpec
import graft.Tables
import org.apache.spark.sql.functions._

import java.nio.file.Files

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("interleave: known bit patterns") {
    // b1 = 1010₂ → even positions 0100 0100; b2 = 0101₂ → odd 0010 0010
    val df = Seq((10L, 5L)).toDF("b1", "b2")
    val z = df.select(ZOrder.interleave(col("b1"), col("b2"), 4).as("z"))
      .collect()(0).getLong(0)
    assert(z == 102L, s"expected 0b1100110 = 102, got $z")
    // identity checks: interleave(x, 0) spreads x onto even bits
    val z2 = Seq((3L, 0L)).toDF("b1", "b2")
      .select(ZOrder.interleave(col("b1"), col("b2"), 4).as("z"))
      .collect()(0).getLong(0)
    assert(z2 == 5L) // bits 0,1 → positions 0,2
  }

  test("zorderStats: slices partition the rows and bound both key ranges") {
    val li = Tables.lineitem(spark, Sf)
    val total = li.count()
    val stats = ZOrder.zorderStats(li, "l_orderkey", "l_partkey", 8, 16).collect()
    assert(stats.map(_.getLong(1)).sum == total, "slices partition the table")
    val (min1, max1, min2, max2) = {
      val r = li.agg(min("l_orderkey").cast("long"), max("l_orderkey").cast("long"),
        min("l_partkey").cast("long"), max("l_partkey").cast("long")).collect()(0)
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    }
    val fullArea = (max1 - min1 + 1).toDouble * (max2 - min2 + 1).toDouble
    val areas = stats.map { r =>
      (r.getLong(3) - r.getLong(2) + 1).toDouble *
        (r.getLong(5) - r.getLong(4) + 1).toDouble / fullArea
    }
    // a 16-slice z-split at bits=8 covers ≤ 2 of the 16×16 coarse cells
    // per slice plus fringe — each rectangle must be FAR below the full
    // domain, which is the whole point of the layout
    assert(areas.max < 0.5, s"every slice rectangle bounded, worst ${areas.max}")
    assert(areas.sum / areas.length < 0.25,
      s"mean slice rectangle area must be small, got ${areas.sum / areas.length}")
  }

  test("zorderWrite: per-file parquet footers bound BOTH keys (data skipping)") {
    val li = Tables.lineitem(spark, Sf)
    val dir = Files.createTempDirectory("zorder").toFile
    dir.deleteOnExit()
    val path = dir.getAbsolutePath + "/li"
    ZOrder.zorderWrite(li, "l_orderkey", "l_partkey", path, 8, 8)
    val files = new java.io.File(path).listFiles()
      .filter(f => f.getName.endsWith(".parquet")).map(_.getAbsolutePath)
    assert(files.length == 8, s"8 range partitions → 8 files, got ${files.length}")
    val (min1, max1, min2, max2) = {
      val r = li.agg(min("l_orderkey").cast("long"), max("l_orderkey").cast("long"),
        min("l_partkey").cast("long"), max("l_partkey").cast("long")).collect()(0)
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    }
    val fullArea = (max1 - min1 + 1).toDouble * (max2 - min2 + 1).toDouble
    val rects = files.map { f =>
      val r = spark.read.parquet(f)
        .agg(min("l_orderkey").cast("long"), max("l_orderkey").cast("long"),
          min("l_partkey").cast("long"), max("l_partkey").cast("long")).collect()(0)
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    }
    val areas = rects.map { case (a, b, c, d) =>
      (b - a + 1).toDouble * (d - c + 1).toDouble / fullArea }
    assert(areas.sum / areas.length < 0.35,
      s"z-clustered files cover bounded rectangles, mean ${areas.sum / areas.length}")
    // the pruning effect: a narrow band on the SECONDARY key (middle
    // 1/8th of l_partkey) must skip at least a third of the files on
    // footer stats alone — a single-key range layout skips none
    val bandLo = min2 + (max2 - min2) * 7 / 16
    val bandHi = min2 + (max2 - min2) * 9 / 16
    val touched = rects.count { case (_, _, c, d) => c <= bandHi && d >= bandLo }
    assert(touched <= files.length * 2 / 3,
      s"secondary-key band query must prune files: touched $touched of ${files.length}")
  }

  test("zorderWrite: null keys cluster to cell 0 instead of NPEing the cut fit") {
    import spark.implicits._
    val df = Seq[(java.lang.Long, java.lang.Long)](
      (null, 5L), (1L, null), (2L, 2L), (900L, 900L), (901L, 899L), (3L, 1L))
      .toDF("k1", "k2")
    val dir = Files.createTempDirectory("zorder_null").toFile
    dir.deleteOnExit()
    val path = dir.getAbsolutePath + "/t"
    ZOrder.zorderWrite(df, "k1", "k2", path, 4, 2, 4)
    assert(spark.read.parquet(path).count() == 6, "all rows (incl. null keys) written")
  }

  test("zorderWrite: end-concentrated mass still cuts into `parts` files") {
    import spark.implicits._
    // almost all mass in the top z-corner: the greedy share threshold is
    // never reached early, so only the forced remaining-cells==remaining-
    // cuts rule produces any cuts at all
    val low = Seq((1L, 1L), (400L, 400L), (700L, 700L)) // one row per early cell
    val high = (1 to 97).map(i => (1080L + (i % 8), 1080L + (i % 8)))
    val df = (low ++ high).toDF("k1", "k2")
    val dir = Files.createTempDirectory("zorder_skew").toFile
    dir.deleteOnExit()
    val path = dir.getAbsolutePath + "/t"
    ZOrder.zorderWrite(df, "k1", "k2", path, 4, 4, 4)
    val files = new java.io.File(path).listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(files.length == 4, s"4 parts → 4 files even under end-skew, got ${files.length}")
  }
}
