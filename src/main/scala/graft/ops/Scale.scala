package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale tactics that are policy, not semantics: salting for skewed keys,
  * bucketed tables for shuffle-free co-located joins. AQE covers most skew
  * automatically (`spark.sql.adaptive.skewJoin`); salting is for the cases
  * AQE can't split (skewed AGGREGATION keys, or pre-AQE Spark).
  */
object Scale {

  /** Two-phase skew-safe aggregation: salt the group key into `salts`
    * subkeys, partially aggregate, then merge. `aggs` must be decomposable
    * (sum/count/min/max — the partial and final functions coincide).
    *
    * Example: saltedCount(df, Seq("k"), 16) ≡ df.groupBy("k").count() but a
    * hot key spreads over 16 reducers in phase 1.
    */
  def saltedCount(df: DataFrame, keys: Seq[String], salts: Int): DataFrame =
    df.withColumn("__salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)))
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(count(lit(1)).as("__partial"))
      .groupBy(keys.map(col): _*)
      .agg(sum("__partial").as("count"))

  /** Salted broadcast-skew join: replicate the small side `salts`× and
    * scatter the big side's hot keys across the replicas. Exact same rows
    * as a plain inner equi-join.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 salts: Int): DataFrame = {
    val saltedBig = big.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salts)))
    val saltedSmall = small.withColumn("__salt",
      explode(sequence(lit(0L), lit((salts - 1).toLong))))
    saltedBig.join(saltedSmall, Seq(key, "__salt")).drop("__salt")
  }

  /** Write a bucketed + sorted table for shuffle-free future joins on
    * `bucketCols` (both sides bucketed the same way ⇒ SortMergeJoin with no
    * Exchange). Bucketing requires the session catalog (`saveAsTable`).
    */
  def writeBucketed(df: DataFrame, table: String, buckets: Int,
                    bucketCols: Seq[String]): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .format("parquet")
      .saveAsTable(table)

  /** Read back a bucketed table (bucket metadata comes from the catalog). */
  def readBucketed(spark: SparkSession, table: String): DataFrame =
    spark.table(table)
}
