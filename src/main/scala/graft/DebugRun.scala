package graft
import org.apache.spark.sql.SparkSession
object DebugRun {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = args.toSeq
    names.foreach { n =>
      try {
        val c = SparkEntry.queries(n)(spark, "/root/testdata/sf0.01").count()
        println(s"DBG $n OK rows=$c")
      } catch { case e: Throwable =>
        println(s"DBG $n FAIL: ${e.getClass.getName}: ${e.getMessage}")
        e.getStackTrace.take(12).foreach(f => println("   " + f))
      }
    }
    spark.stop()
  }
}
