package graft
import org.apache.spark.sql.SparkSession
object DevFail {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local()
    val dir = "/root/testdata/sf0.001"
    val all = SparkEntry.queries
    for (n <- Seq("q_nearest_event", "s_attribution", "s_funnel", "s_sessionize")) {
      try {
        val df = all(n)(spark, dir)
        println(s"[$n] OK rows=" + df.count())
      } catch { case e: Throwable =>
        println(s"[$n] FAIL: ${e.getClass.getName}: ${e.getMessage}")
        e.getStackTrace.take(12).foreach(t => println("   " + t))
      }
    }
    spark.stop()
  }
}
