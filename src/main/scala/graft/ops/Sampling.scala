package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Deterministic sampling and sequence packing for training-data
  * pipelines: reproducible corpus subsampling (global, stratified, and
  * per-source mixture weights) and greedy packing of documents into
  * fixed-token-budget training sequences.
  *
  * Scale design (100 TB):
  *  - sampling is a scan-side filter on a hash of the row key — no
  *    shuffle, no RNG state, no `sample()` nondeterminism; the same row
  *    set is selected on any cluster size, any partitioning, any engine
  *    (the hash is md5, which every engine reproduces bit-for-bit)
  *  - packing shuffles once on the group column and streams each group in
  *    sorted order (`flatMapSortedGroups` — Spark's secondary sort, so a
  *    group never materialises in memory); real pipelines pack within
  *    shards exactly like this
  */
object Sampling {

  /** First 8 hex chars of md5(key) — a uniform 32-bit draw in hex,
    * lexicographically comparable (md5 hex is lowercase in Spark, DuckDB,
    * Python, …). The basis of every deterministic sampler here.
    */
  def hashBucket(key: Column): Column =
    substring(md5(key.cast("string")), 1, 8)

  /** Hex threshold such that P(hashBucket(key) < threshold) = fraction
    * for a uniform hash.
    */
  def thresholdHex(fraction: Double): String = {
    require(fraction >= 0 && fraction <= 1, s"fraction in [0,1]: $fraction")
    // "g" sorts after every hex digit, so fraction 1.0 keeps ALL rows
    // (a 0xffffffff threshold would drop the one-in-4-billion max hash)
    if (fraction >= 1.0) "g"
    else f"${(fraction * 4294967296.0).toLong}%08x"
  }

  /** Keep ~`fraction` of rows, chosen deterministically by `keyCol`. */
  def deterministicSample(df: DataFrame, keyCol: String,
                          fraction: Double): DataFrame =
    df.filter(hashBucket(col(keyCol)) < lit(thresholdHex(fraction)))

  /** Stratified deterministic sample: per-stratum keep rates (the
    * "mixture weights" step of corpus assembly — e.g. upsample code,
    * downsample CommonCrawl), `defaultRate` for strata not listed.
    */
  def stratifiedSample(df: DataFrame, keyCol: String, stratumCol: String,
                       rates: Seq[(String, Double)],
                       defaultRate: Double): DataFrame = {
    val threshold = rates.foldRight(lit(thresholdHex(defaultRate))) {
      case ((stratum, rate), acc) =>
        when(col(stratumCol) === stratum, lit(thresholdHex(rate))).otherwise(acc)
    }
    df.filter(hashBucket(col(keyCol)) < threshold)
  }

  /** Greedy sequence packing: within each `groupCol` shard, walk documents
    * in `orderCol` order and assign pack ids so each pack's token total
    * stays ≤ `maxTokens` (a document larger than the budget gets a pack of
    * its own). Returns (group, ord, n_tokens, pack_id, pack_cum) — the
    * assignment a sequence-packing writer would consume.
    *
    * One shuffle on the group column; each group streams through the
    * executor in sorted order via `flatMapSortedGroups` (secondary sort),
    * so memory is O(1) per group regardless of shard size. The walk is
    * inherently sequential per shard — shard granularity (source, file,
    * date…) is the parallelism dial, exactly as in production packers.
    */
  def packSequences(docs: DataFrame, groupCol: String, orderCol: String,
                    tokenCount: Column, maxTokens: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val base: Dataset[(String, Long, Int)] = docs.select(
        col(groupCol).cast("string").as("__grp"),
        col(orderCol).cast("long").as("__ord"),
        tokenCount.cast("int").as("__nt"))
      .as[(String, Long, Int)]
    base.groupByKey(_._1)
      .flatMapSortedGroups($"__ord") { (grp, it) =>
        // anchor: first doc opens pack 1; step: overflow opens a new pack
        var pack = 0
        var cum = 0
        it.map { case (_, ord, nt) =>
          if (pack == 0) { pack = 1; cum = nt }
          else if (cum + nt > maxTokens) { pack += 1; cum = nt }
          else cum += nt
          (grp, ord, nt, pack, cum)
        }
      }
      .toDF(groupCol, orderCol, "n_tokens", "pack_id", "pack_cum")
  }

  // ---------------------------------------------------------------- shards

  /** Deterministic shard id in [0, nShards): the md5 32-bit draw of the
    * key, mod nShards. Engine-portable (md5 hex is identical everywhere)
    * and stable under any repartitioning — the property a training-data
    * export needs so a re-run (or a different engine) produces the SAME
    * shard membership, keeping downstream dataloader order reproducible.
    */
  def shardId(key: Column, nShards: Int): Column = {
    require(nShards > 0, s"nShards must be positive: $nShards")
    conv(hashBucket(key), 16, 10).cast("long") % nShards
  }

  /** Shard a corpus for training export: assign `shard` by [[shardId]] and
    * cluster rows so each output file holds exactly one shard.
    *
    * Scale shape: ONE shuffle keyed by the shard id (a small long),
    * through an IDENTITY partitioner — shard k lands in task k, every
    * task gets exactly one shard (plain `repartition(n, shard)` hashes the
    * id, so shards can collide into one task and leave others idle). A
    * 1000-executor write therefore streams nShards files in parallel with
    * no post-hoc compaction. Directory layout comes from
    * `partitionBy(shard)`, the standard layout dataloaders glob.
    */
  def exportShards(df: DataFrame, keyCol: String, nShards: Int,
                   outDir: String): Unit = {
    val spark = df.sparkSession
    val withShard = df.withColumn("shard", shardId(col(keyCol), nShards))
    val schema = withShard.schema
    val si = schema.fieldIndex("shard")
    val identity = new org.apache.spark.Partitioner {
      override def numPartitions: Int = nShards
      override def getPartition(key: Any): Int = key.asInstanceOf[Long].toInt
    }
    val rows = withShard.rdd.map(r => (r.getLong(si), r))
      .partitionBy(identity).values
    spark.createDataFrame(rows, schema)
      .write.mode("overwrite").partitionBy("shard").parquet(outDir)
  }
}
