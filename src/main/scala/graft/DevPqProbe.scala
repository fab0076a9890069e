package graft
import org.apache.spark.sql.functions._
object DevPqProbe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(cpus = "8", appName = "pq-probe")
    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val e = Tables.embeddings(spark, sf)
      val q = e.filter(col("vec_id") < 10)
      val exact = graft.ext.SimSearch.cosineTopK(q, e, 5).collect()
        .map(r => (r.getLong(0), r.getLong(2))).toSet
      for ((m, ks) <- Seq((8, 16), (16, 16), (16, 32), (32, 16), (16, 64), (8, 64))) {
        val pq = graft.ext.SimSearch.pqTopK(q, e, 5, m = m, ksub = ks).collect()
          .map(r => (r.getLong(0), r.getLong(2)))
        val hits = pq.count(exact.contains)
        println(s"[pqprobe] $sf m=$m ksub=$ks recall@5 = $hits/${exact.size}")
      }
    }
    spark.stop()
  }
}
