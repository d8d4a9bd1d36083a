package graft.functions

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.SparkSpec

class TopKAggSpec extends SparkSpec {
  import spark.implicits._

  test("topk aggregate equals the window row_number formulation exactly") {
    val rnd = new scala.util.Random(7)
    val rows = (0 until 5000).map { i =>
      (i % 13L, rnd.nextDouble(), i.toLong)
    }
    val df = rows.toDF("key", "score", "id").repartition(8)

    val viaAgg = df.groupBy("key")
      .agg(TopKAgg.topk(col("score"), col("id"), 7).as("tk"))
      .select(col("key"), posexplode(col("tk")))
      .select(col("key"), (col("pos") + 1).as("rank"),
        col("col.id").as("id"), col("col.score").as("score"))

    val w = Window.partitionBy("key").orderBy(col("score").desc, col("id").asc)
    val viaWindow = df.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 7)
      .select(col("key"), col("rank").cast("long"), col("id"), col("score"))

    val a = viaAgg.collect().map(_.toSeq).toSet
    val b = viaWindow.collect().map(_.toSeq).toSet
    assert(a === b)
    assert(a.size === 13 * 7)
  }

  test("ties break on smaller id; fewer than k rows returns all") {
    val df = Seq((1L, 0.5, 10L), (1L, 0.5, 3L), (1L, 0.1, 7L))
      .toDF("key", "score", "id")
    val out = df.groupBy("key")
      .agg(TopKAgg.topk(col("score"), col("id"), 2).as("tk"))
      .select(explode(col("tk")).as("e"))
      .select(col("e.id")).as[Long].collect().toSeq
    assert(out === Seq(3L, 10L))
    val all = df.groupBy("key")
      .agg(TopKAgg.topk(col("score"), col("id"), 99).as("tk"))
      .select(size(col("tk"))).head().getInt(0)
    assert(all === 3)
  }
}
