package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class ScaleSpec extends SparkSpec {

  test("salted count equals plain groupBy count") {
    val li = spark.read.parquet(s"${sf()}/lineitem.parquet")
    val plain = li.groupBy("l_returnflag").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Scale.saltedCount(li, Seq("l_returnflag"), 8)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted === plain)
  }

  test("salted join equals plain join") {
    val li = spark.read.parquet(s"${sf()}/lineitem.parquet")
      .select("l_suppkey", "l_quantity")
    val supp = spark.read.parquet(s"${sf()}/supplier.parquet")
      .select(col("s_suppkey").as("l_suppkey"), col("s_name"))
    val plain = li.join(supp, "l_suppkey").count()
    val salted = Scale.saltedJoin(li, supp, "l_suppkey", 4).count()
    assert(salted === plain)
  }

  test("bucketed write+join plans without an exchange on the bucketed side") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val o = spark.read.parquet(s"${sf()}/orders.parquet")
      Scale.writeBucketed(o, "orders_bucketed", 4, Seq("o_orderkey"))
      val t = Scale.readBucketed(spark, "orders_bucketed")
      val joined = t.join(t.select(col("o_orderkey"), col("o_totalprice").as("p2")),
        "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(joined.count() > 0)
      // both sides bucketed on the join key: no shuffle exchange in the plan
      assert(!plan.contains("Exchange hashpartitioning"), plan.take(2000))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS orders_bucketed")
    }
  }
}
