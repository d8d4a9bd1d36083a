package graft.sources

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** TokenBin indexed-binary shard sink + DSv2 reader: round-trip fidelity,
  * shard placement, idx-only pruned scans, and real BPE ids through the
  * binary path.
  */
class TokenBinSpec extends SparkSpec {

  private def tmp(name: String) = s"/root/repo/target/tokenbin_test/$name"

  test("round-trip: keys, shard placement, and exact id sequences survive") {
    import spark.implicits._
    val in = Seq(
      (0L, Seq(5, 6, 7)),
      (1L, Seq.empty[Int]),           // empty sequence
      (2L, Seq(Int.MaxValue, -1, 0)), // full int range
      (5L, (1 to 1000).toSeq),        // crosses write-buffer boundaries
      (-3L, Seq(9)),                  // negative key -> pmod shard
      (7L, Seq(42))
    ).toDF("key", "ids")
    val out = tmp("roundtrip")
    val (nSeqs, nToks) = TokenBin.write(in, "key", "ids", out, shards = 4)
    assert(nSeqs == 6)
    assert(nToks == 3 + 0 + 3 + 1000 + 1 + 1)

    val back = spark.read.format("tokenbin").load(out)
      .orderBy("key").collect()
    assert(back.length == 6)
    val byKey = back.map(r => r.getLong(1) -> r).toMap
    in.collect().foreach { r =>
      val k = r.getLong(0)
      val got = byKey(k)
      assert(got.getInt(0) == ((k % 4 + 4) % 4).toInt, s"shard of $k")
      assert(got.getSeq[Int](2) == r.getSeq[Int](1), s"ids of $k")
    }
  }

  test("pruned projection reads only the idx sidecars (no .bin open needed)") {
    import spark.implicits._
    val out = tmp("pruned")
    TokenBin.write(Seq((1L, Seq(1, 2)), (2L, Seq(3))).toDF("key", "ids"),
      "key", "ids", out, shards = 2)
    // delete the .bin files; a key/count-only scan must still succeed
    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val bins = fs.globStatus(new org.apache.hadoop.fs.Path(out, "*.bin"))
    assert(bins.nonEmpty)
    bins.foreach(b => fs.delete(b.getPath, false))
    val keys = spark.read.format("tokenbin").load(out)
      .select("key").orderBy("key").as[Long].collect()
    assert(keys.toSeq == Seq(1L, 2L))
    assert(spark.read.format("tokenbin").load(out).count() == 2)
  }

  test("re-writing with fewer shards clears the previous shard set") {
    import spark.implicits._
    val out = tmp("rewrite")
    TokenBin.write((0L to 11L).map(k => (k, Seq(k.toInt))).toDF("key", "ids"),
      "key", "ids", out, shards = 6)
    // second write: 4 shards — without cleanup, stale shard-00004/5 from
    // the 6-shard run would be silently unioned back in by the reader
    TokenBin.write(Seq((1L, Seq(9))).toDF("key", "ids"),
      "key", "ids", out, shards = 4)
    val back = spark.read.format("tokenbin").load(out).collect()
    assert(back.length == 1)
    assert(back.head.getLong(1) == 1L)
    assert(TokenBin.verifyShards(spark, out).filter(!col("ok")).count() == 0)
  }

  test("columnar read: plan shows ColumnarToRow; multi-batch shard is exact") {
    import spark.implicits._
    val out = tmp("columnar")
    // 10000 sequences in ONE shard -> at least 3 ColumnarBatches (4096 cap)
    val in = (0L until 10000L).map(k => (k * 3, Seq(k.toInt, k.toInt + 1)))
      .toDF("key", "ids")
    TokenBin.write(in, "key", "ids", out, shards = 1)
    val df = spark.read.format("tokenbin").load(out)
    assert(df.queryExecution.executedPlan.toString.contains("ColumnarToRow"))
    assert(df.count() == 10000)
    val got = df.select(sum(expr("aggregate(ids, 0L, (a, x) -> a + x)")),
      sum("key")).head()
    val wantIds = (0L until 10000L).map(k => 2 * k + 1).sum
    assert(got.getLong(0) == wantIds)
    assert(got.getLong(1) == (0L until 10000L).map(_ * 3).sum)
    // batch-boundary exactness: first/last rows of the shard
    val rows = df.orderBy("key").collect()
    assert(rows.head.getSeq[Int](2) == Seq(0, 1))
    assert(rows.last.getSeq[Int](2) == Seq(9999, 10000))
  }

  test("shards option prunes partitions; assignShards balances by tokens") {
    import spark.implicits._
    val out = tmp("assign")
    // shard sizes engineered via key % 4: shard k gets docs with k tokens
    // spread so token totals differ strongly
    val in = (0L until 40L).map(k =>
      (k, (0 to ((k % 4) * 3).toInt).map(_.toInt))).toDF("key", "ids")
    TokenBin.write(in, "key", "ids", out, shards = 4)
    // shards option: only the listed shard numbers are scanned
    val some = spark.read.format("tokenbin").option("shards", "1,3")
      .load(out)
    assert(some.select("shard").distinct().as[Int].collect().sorted.toSeq
      == Seq(1, 3))
    val range = spark.read.format("tokenbin").option("shards", "0-2")
      .load(out)
    assert(range.select("shard").distinct().as[Int].collect().sorted.toSeq
      == Seq(0, 1, 2))
    // LPT assignment: every shard exactly once, worker loads within the
    // largest single shard of each other, deterministic across calls
    val a1 = TokenBin.assignShards(spark, out, workers = 2).collect()
      .map(r => (r.getInt(0), r.getInt(2), r.getLong(3)))
    assert(a1.map(_._2).sorted.toSeq == Seq(0, 1, 2, 3))
    val loads = a1.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    assert(loads.size == 2)
    val maxShard = a1.map(_._3).max
    assert(math.abs(loads(0) - loads(1)) <= maxShard)
    val a2 = TokenBin.assignShards(spark, out, workers = 2).collect()
      .map(r => (r.getInt(0), r.getInt(2), r.getLong(3)))
    assert(a1.toSeq == a2.toSeq)
    // per-shard manifest stats agree with an idx-derived recount
    val infos = TokenBin.readShardInfos(
      new org.apache.hadoop.fs.Path(out)
        .getFileSystem(spark.sessionState.newHadoopConf()), out)
    val byShard = spark.read.format("tokenbin").load(out)
      .groupBy("shard").agg(count(lit(1)).as("n"), sum(size(col("ids"))).as("t"))
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    infos.foreach(i =>
      assert(byShard(i.shard) == ((i.seqs, i.tokens)), s"shard ${i.shard}"))
  }

  test("manifest records shard count and totals") {
    import spark.implicits._
    val out = tmp("manifest")
    TokenBin.write(Seq((1L, Seq(1, 2, 3)), (9L, Seq(4))).toDF("key", "ids"),
      "key", "ids", out, shards = 3)
    val txt = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(out, "manifest.json")), "UTF-8")
    assert(txt.contains("\"shards\": 3"))
    assert(txt.contains("\"total_seqs\": 2"))
    assert(txt.contains("\"total_tokens\": 4"))
    assert(txt.contains("\"dtype\": \"int32\""))
  }

  test("uint16 dtype: half the bytes, same values back; overflow raises") {
    import spark.implicits._
    val in = Seq((1L, Seq(0, 1, 65535)), (2L, Seq(300, 40000)))
      .toDF("key", "ids")
    val out16 = tmp("u16"); val out32 = tmp("u16_as32")
    TokenBin.write(in, "key", "ids", out16, shards = 1, dtype = "uint16")
    TokenBin.write(in, "key", "ids", out32, shards = 1)
    def binLen(d: String) = java.nio.file.Files.size(
      java.nio.file.Paths.get(d, "shard-00000.bin"))
    assert(binLen(out16) * 2 == binLen(out32))
    val back = spark.read.format("tokenbin").load(out16)
      .orderBy("key").collect()
    assert(back.map(_.getSeq[Int](2)).toSeq ==
      Seq(Seq(0, 1, 65535), Seq(300, 40000)))
    // out-of-range ids must fail loudly, not truncate silently
    val bad = Seq((1L, Seq(70000))).toDF("key", "ids")
    val e = intercept[org.apache.spark.SparkException] {
      TokenBin.write(bad, "key", "ids", tmp("u16_bad"), 1, dtype = "uint16")
    }
    assert(e.getMessage.contains("does not fit uint16") ||
      Option(e.getCause).exists(_.getMessage.contains("does not fit uint16")))
  }

  test("verifyShards: clean set passes, a flipped byte is caught") {
    import spark.implicits._
    val out = tmp("verify")
    TokenBin.write(Seq((1L, Seq(1, 2, 3)), (2L, Seq(4, 5)), (5L, Seq(6)))
      .toDF("key", "ids"), "key", "ids", out, shards = 2)
    val clean = TokenBin.verifyShards(spark, out)
    assert(clean.count() == 2 && clean.filter(!col("ok")).count() == 0)
    // corrupt one byte of shard 1's payload
    val p = java.nio.file.Paths.get(out, "shard-00001.bin")
    val bytes = java.nio.file.Files.readAllBytes(p)
    bytes(0) = (bytes(0) ^ 0x40).toByte
    java.nio.file.Files.write(p, bytes)
    val dirty = TokenBin.verifyShards(spark, out)
    assert(dirty.filter(!col("ok")).select("shard").as[Int].collect().toSeq
      == Seq(1))
  }

  test("streaming: foreachBatch appends epoch shard sets the reader unions") {
    val nt = graft.ops.TextAnalysis.tokenCount(col("text"))
    val enc = (df: org.apache.spark.sql.DataFrame) => df.select(col("doc_id"),
      when(nt < 1, array().cast("array<int>"))
        .otherwise(sequence(lit(1), nt)).as("ids"))
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
      .select("doc_id", "text").limit(40)
    val srcDir = tmp("stream_src")
    docs.repartition(2).write.mode("overwrite").parquet(srcDir)
    val out = tmp("stream_out")
    // clear any previous run's epochs (appendBatch only overwrites its own)
    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new org.apache.hadoop.fs.Path(out), true)
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1").parquet(srcDir)
    val q = enc(stream).writeStream.foreachBatch {
      (b: org.apache.spark.sql.DataFrame, id: Long) =>
        TokenBin.appendBatch(b, "doc_id", "ids", out, shards = 2, epoch = id)
        ()
    }.start()
    q.processAllAvailable(); q.stop()
    // multiple epoch dirs exist (one per micro-batch)
    assert(fs.globStatus(new org.apache.hadoop.fs.Path(out, "epoch-*")).length >= 2)
    val back = spark.read.format("tokenbin").load(out)
      .select(col("key"), md5(array_join(transform(col("ids"),
        _.cast("string")), ",")).as("m"))
    val expect = enc(docs)
      .select(col("doc_id").as("key"), md5(array_join(transform(col("ids"),
        _.cast("string")), ",")).as("m"))
    assert(back.count() == 40)
    assert(back.except(expect).count() == 0 && expect.except(back).count() == 0)
  }

  test("real BPE ids ride the binary path losslessly") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet").limit(50)
    val merges = graft.ops.Bpe.learnBpe(docs, "text", numMerges = 40)
    val vocab = graft.ops.Bpe.vocabFromMerges(merges)
    val enc = graft.ops.Bpe.applyBpeIds(docs, "text", merges, vocab)
      .select(col("doc_id"), col("bpe_ids").as("ids"))
    val out = tmp("bpe")
    TokenBin.write(enc, "doc_id", "ids", out, shards = 4)
    val back = spark.read.format("tokenbin").load(out)
      .select(col("key").as("doc_id"), col("ids").as("ids_back"))
    val joined = enc.join(back, "doc_id")
    assert(joined.count() == enc.count())
    assert(joined.filter(col("ids") =!= col("ids_back")).count() == 0)
  }
}
