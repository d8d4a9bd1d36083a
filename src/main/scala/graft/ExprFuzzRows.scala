package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.expr.Expressions
object ExprFuzzRows {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
      .orderBy("l_orderkey", "l_linenumber", "l_partkey",
        "l_suppkey", "l_quantity", "l_extendedprice").limit(200)
    scala.io.Source.fromFile(args(0)).getLines().foreach { e =>
      li.select(format_string("%.6e", Expressions.compile(li, e).cast("double")).as("v"))
        .collect().zipWithIndex.foreach { case (r, i) => println(s"V $i ${r.getString(0)}") }
    }
    spark.stop()
  }
}
