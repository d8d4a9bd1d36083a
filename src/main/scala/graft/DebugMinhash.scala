package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.Dedup
object DebugMinhash {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"TIME $label ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    time("warmup count") { docs.count() }
    time("tokenize only (forced via explode)") {
      println("n=" + docs.select(explode(split(trim(lower(col("text"))), "\\s+"))).count())
    }
    val sf = Dedup.shingleFrame(docs, "text", "doc_id", Nil, 3)
    time("shingleFrame forced (explode sh)") {
      println("n=" + sf.select(explode(col("sh"))).count())
    }
    time("shingleFrame agg sum sizes") {
      println("n=" + sf.select(sum(size(col("sh")))).head().getLong(0))
    }
    val sig = {
      val sh2 = sf.withColumnRenamed("sh", "__sh").repartition(col("doc_id"))
      sh2.select(col("doc_id"), Dedup.minHashSignature(col("__sh"), 32).as("sig"))
    }
    time("signatures forced") {
      println("n=" + sig.select(explode(col("sig"))).count())
    }
    time("candidates full") {
      println("n=" + Dedup.minHashCandidates(docs, "text", "doc_id").count())
    }
    spark.stop()
  }
}
