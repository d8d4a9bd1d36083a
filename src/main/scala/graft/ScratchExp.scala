package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// temporary r21 experiment scaffold (not part of the driver contract)
object ScratchExp {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[exp] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }

    val d = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("n_chars").cast("double").as("v"))
    val x = col("v")
    val B = 60
    def agg(): Unit =
      ops.Classifier.bootstrapAggregate(d, x, "doc_id", B).head()
    agg()
    for (_ <- 0 until 3) time("bootstrap agg")(agg())
    spark.stop()
  }
}
