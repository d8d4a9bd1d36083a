package graft.streaming

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Real readStream → writeStream runs against the events table (memory
  * sink, processAllAvailable = synchronous), checked against the identical
  * batch computation — the streaming/batch parity the module promises.
  */
class EventStreamSpec extends SparkSpec {

  test("normalizeTs lands every shipped ts encoding on the same instants") {
    // the two physical encodings testdata has shipped with — TIMESTAMP
    // (NANOS) read as LongType nanos, and timestamp[us] read as
    // TIMESTAMP_NTZ — plus an already-normalized TimestampType frame,
    // must all normalize to identical session-UTC TimestampType values.
    // (Round 11 lost all ten events queries to exactly this: the loader
    // assumed one encoding and threw DATATYPE_MISMATCH on the other.)
    import spark.implicits._
    val micros = Seq(0L, 1L, 1700000000123456L)
    val fromLongNanos = EventStream.normalizeTs(
      micros.map(_ * 1000L).toDF("ts"))
    val fromNtz = EventStream.normalizeTs(
      micros.toDF("us").select(
        expr("timestamp_micros(us)").cast("timestamp_ntz").as("ts")))
    val fromTs = EventStream.normalizeTs(
      micros.toDF("us").select(expr("timestamp_micros(us)").as("ts")))
    for (df <- Seq(fromLongNanos, fromNtz, fromTs)) {
      assert(df.schema("ts").dataType ===
        org.apache.spark.sql.types.TimestampType)
      val got = df.select(unix_micros(col("ts"))).as[Long].collect().sorted
      assert(got.toSeq === micros.sorted)
    }
  }

  test("typeDrift: hand-computed JS between consecutive hours; gaps excluded") {
    import spark.implicits._
    // hour 0: {a: 2, b: 2}; hour 1: {a: 4}; hour 3: {b: 1} (gap at 2)
    val rows = (0 until 2).map(i => (s"2024-01-01 00:0$i:00", "a")) ++
      (0 until 2).map(i => (s"2024-01-01 00:1$i:00", "b")) ++
      (0 until 4).map(i => (s"2024-01-01 01:0$i:00", "a")) ++
      Seq(("2024-01-01 03:00:00", "b"))
    val events = rows.toDF("tss", "event_type")
      .select(col("tss").cast("timestamp").as("ts"), col("event_type"))
    val got = EventStream.typeDrift(events, "event_type", "1 hour")
      .collect().map(r => (r.getTimestamp(0).toString.take(13),
        r.getLong(1), r.getDouble(2))).toList.sortBy(_._1)
    // only hour 1 has an immediate predecessor (hour 3 follows a gap)
    assert(got.map(_._1) === List("2024-01-01 01"))
    assert(got.head._2 === 4L)
    // JS({a:.5,b:.5} vs {a:1}): m_a=.75, m_b=.25
    val expect = 0.5 * (0.5 * math.log(0.5 / 0.75) +
      0.5 * math.log(0.5 / 0.25)) + 0.5 * (1.0 * math.log(1.0 / 0.75))
    assert(math.abs(got.head._3 - expect) < 1e-9)
    // identical mixes drift 0; disjoint mixes hit ln 2
    val same = (0 until 3).flatMap(h => Seq(
      (s"2024-01-01 0$h:00:00", "a"), (s"2024-01-01 0$h:30:00", "b")))
      .toDF("tss", "event_type")
      .select(col("tss").cast("timestamp").as("ts"), col("event_type"))
    val sameJs = EventStream.typeDrift(same, "event_type", "1 hour")
      .select("js_drift").as[Double].collect()
    assert(sameJs.length === 2 && sameJs.forall(_ === 0.0))
    val flip = Seq(("2024-01-01 00:00:00", "a"), ("2024-01-01 01:00:00", "b"))
      .toDF("tss", "event_type")
      .select(col("tss").cast("timestamp").as("ts"), col("event_type"))
    val flipJs = EventStream.typeDrift(flip, "event_type", "1 hour")
      .select("js_drift").as[Double].collect()
    assert(flipJs.length === 1 &&
      math.abs(flipJs.head - math.log(2)) < 1e-9)
  }

  test("tumbling window streaming equals batch") {
    val dir = sf("sf0.001")
    val raw = EventStream.loadEvents(spark, dir)
    // write a µs-timestamped copy the file stream can read
    val evDir = "/root/repo/target/test_stream_events"
    raw.write.mode("overwrite").parquet(evDir)

    val stream = spark.readStream.schema(raw.schema).parquet(evDir)
    val agg = EventStream.tumbling(stream, "1 hour")
    EventStream.runToMemory(agg, "tumble_out")
    val streamed = spark.table("tumble_out")
      .orderBy("window_start", "event_type").collect()

    val batch = EventStream.tumbling(raw, "1 hour")
      .orderBy("window_start", "event_type").collect()
    assert(streamed.toSeq === batch.toSeq)
    assert(streamed.nonEmpty)
  }

  test("streaming dedup equals batch distinct on the key aggregate") {
    val dir = sf("sf0.001")
    val raw = EventStream.loadEvents(spark, dir)
    val evDir = "/root/repo/target/test_stream_dedup_events"
    raw.write.mode("overwrite").parquet(evDir)

    val stream = spark.readStream.schema(raw.schema).parquet(evDir)
    val dd = EventStream.dedupEvents(stream, Seq("user_id", "event_type"))
    EventStream.runToMemory(dd, "dedup_out", mode = "append")
    // which survivor is kept is order-dependent; the key SET is not
    val streamed = spark.table("dedup_out")
      .select("user_id", "event_type").distinct()
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val batch = EventStream.dedupEvents(raw, Seq("user_id", "event_type"))
      .select("user_id", "event_type")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(streamed === batch)
    assert(streamed.nonEmpty)
    // and dedup is exact: no key appears twice in the streamed output
    assert(spark.table("dedup_out").count() ===
      spark.table("dedup_out").select("user_id", "event_type").distinct().count())
  }

  test("stream-stream interval join streaming equals batch") {
    val dir = sf("sf0.001")
    val raw = EventStream.loadEvents(spark, dir)
    val evDir = "/root/repo/target/test_stream_join_events"
    raw.write.mode("overwrite").parquet(evDir)

    val stream = spark.readStream.schema(raw.schema).parquet(evDir)
    // inner stream-stream joins emit eagerly on match (the watermark only
    // bounds STATE, not emission), so full parity with batch holds
    val joined = EventStream.intervalJoin(stream, "click", "purchase", "1 hour")
    EventStream.runToMemory(joined, "sjoin_out", mode = "append")
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getTimestamp(1).getTime, r.getTimestamp(2).getTime)
    val streamed = spark.table("sjoin_out").collect().map(key).toSeq.sorted
    val batch = EventStream.intervalJoin(raw, "click", "purchase", "1 hour")
      .collect().map(key).toSeq.sorted
    assert(streamed === batch)
    assert(streamed.nonEmpty)
    // sanity: every pair is same-user and within the bound
    spark.table("sjoin_out").collect().foreach { r =>
      val dt = r.getTimestamp(2).getTime - r.getTimestamp(1).getTime
      assert(dt >= 0 && dt <= 3600 * 1000L)
    }
  }

  test("session windows produce plausible sessions in batch") {
    val raw = EventStream.loadEvents(spark, sf("sf0.001"))
    val sess = EventStream.sessions(raw, "30 minutes")
    assert(sess.count() > 0)
    assert(sess.agg(min("n_events")).head().getLong(0) >= 1)
  }

  test("append mode with watermark emits only watermark-closed windows") {
    val raw = EventStream.loadEvents(spark, sf("sf0.001"))
    val evDir = "/root/repo/target/test_stream_append"
    raw.write.mode("overwrite").parquet(evDir)
    val stream = spark.readStream.schema(raw.schema)
      .option("maxFilesPerTrigger", "1").parquet(evDir)
    val agg = EventStream.tumbling(stream, "1 hour", watermark = "2 hours")
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("append_out").start()
    q.processAllAvailable(); q.stop()
    val emitted = spark.table("append_out")
    val batch = EventStream.tumbling(raw, "1 hour").collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    val em = emitted.collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    // append emits exactly the windows the watermark closed: a subset of
    // the batch result, with identical values for every emitted window
    assert(em.subsetOf(batch), (em -- batch).take(3).toString)
    assert(em.nonEmpty)
    // every emitted window closed under the watermark: window end must be
    // at or before max(event ts) - 2h (the watermark delay)
    val maxTs = raw.agg(max(col("ts"))).head().getTimestamp(0).getTime
    emitted.collect().foreach { r =>
      val windowEnd = r.getTimestamp(0).getTime + 3600L * 1000
      assert(windowEnd <= maxTs - 2 * 3600L * 1000,
        s"window ending $windowEnd emitted past watermark")
    }
  }

  test("KMV cardinality sketch aggregates inside a real stream, batch parity") {
    // distinct-user sketch per event_type over an ingest stream — the
    // streaming-cardinality shape (KmvAgg is mergeable, so the streaming
    // state per group is <= k longs); complete-mode final result must
    // equal the batch aggregate bit-for-bit
    val dir = sf("sf0.001")
    val raw = EventStream.loadEvents(spark, dir)
    val evDir = "/root/repo/target/test_stream_kmv_events"
    raw.write.mode("overwrite").parquet(evDir)
    def sketch(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("event_type").agg(graft.functions.KmvAgg.kmv(
        xxhash64(col("user_id")), 32).as("sk"))
    val stream = spark.readStream.schema(raw.schema)
      .option("maxFilesPerTrigger", "1").parquet(evDir)
    EventStream.runToMemory(sketch(stream), "kmv_out", mode = "complete")
    def key(r: org.apache.spark.sql.Row) =
      (r.getString(0), r.getSeq[Long](1).mkString(","))
    val streamed = spark.table("kmv_out").collect().map(key).toSeq.sorted
    val batch = sketch(raw).collect().map(key).toSeq.sorted
    assert(streamed === batch)
    assert(streamed.nonEmpty)
    // and the sketch estimates the true per-type distinct-user count
    val est = spark.table("kmv_out").collect().map(r => r.getString(0) ->
      graft.ops.Sketches.distinctEstimate(r.getSeq[Long](1).toArray, 32)).toMap
    val exact = raw.groupBy("event_type").agg(countDistinct("user_id"))
      .collect().map(r => r.getString(0) -> r.getLong(1).toDouble).toMap
    exact.foreach { case (t, ex) =>
      assert(math.abs(est(t) / ex - 1) < 0.5, s"$t: est ${est(t)} vs $ex") }
  }

  test("blocklist census runs inside a real stream (stateless automaton scan)") {
    // the AC automaton rides the closure like the classifier weights —
    // a stateless streaming projection, batch parity exact
    val dir = sf("sf0.001")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text")
    val dDir = "/root/repo/target/test_stream_blocklist_docs"
    docs.write.mode("overwrite").parquet(dDir)
    val pats = Seq("table", "able", "scan")
    def census(df: org.apache.spark.sql.DataFrame) =
      graft.ops.Blocklist.blocklistMatches(df, "text", "doc_id", pats)
    val stream = spark.readStream.schema(docs.schema).parquet(dDir)
    EventStream.runToMemory(census(stream), "blocklist_out", mode = "append")
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getInt(2), r.getString(3))
    val streamed = spark.table("blocklist_out").collect().map(key).sorted
    val batch = census(docs).collect().map(key).sorted
    assert(streamed.toSeq === batch.toSeq && streamed.nonEmpty)
    assert(streamed.exists(_._2 > 0), "expected some blocklist hits")
  }

  test("learned quality scoring runs inside a real stream (scoreColumn)") {
    val dir = sf("sf0.001")
    val raw = EventStream.loadEvents(spark, dir)
    val evDir = "/root/repo/target/test_stream_score_events"
    raw.write.mode("overwrite").parquet(evDir)
    // model trained batch-side on documents; its weights ride the
    // streaming plan as a literal — no RDD access, so this compiles to a
    // stateless streaming projection
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .withColumn("label", (length(col("text")) > 300).cast("int"))
    val m = graft.ops.Classifier.trainHashedLR(docs, "text", "label",
      buckets = 1 << 10, iters = 10)
    def score(df: org.apache.spark.sql.DataFrame) = df.select(
      col("user_id"), col("event_type"),
      graft.ops.Classifier.scoreColumn(col("event_type"), m).as("quality_score"))
    val stream = spark.readStream.schema(raw.schema).parquet(evDir)
    EventStream.runToMemory(score(stream), "score_out", mode = "append")
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getString(1), r.getDouble(2))
    val streamed = spark.table("score_out").collect().map(key).toSeq.sorted
    val batch = score(raw).collect().map(key).toSeq.sorted
    assert(streamed === batch)
    assert(streamed.nonEmpty)
    streamed.foreach { case (_, _, s) =>
      assert(s > 0.0 && s < 1.0, s"score out of (0,1): $s") }
  }

  test("BPE id encoding runs inside a real stream (UDF apply path)") {
    // the apply path is a Column projection, so a learned tokenizer can
    // encode an INGEST stream — merges learned batch-side, ids assigned
    // incrementally with exact batch parity
    val dir = sf("sf0.001")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text")
    val merges = graft.ops.Bpe.learnBpe(docs, "text", numMerges = 80,
      maxWords = 5000)
    val vocab = graft.ops.Bpe.vocabFromMerges(merges)
    val dDir = "/root/repo/target/test_stream_bpe_docs"
    docs.write.mode("overwrite").parquet(dDir)
    val stream = spark.readStream.schema(docs.schema).parquet(dDir)
    val enc = graft.ops.Bpe.applyBpeIds(stream, "text", merges, vocab)
      .select("doc_id", "bpe_ids", "n_bpe_tokens")
    EventStream.runToMemory(enc, "bpe_out", mode = "append")
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getSeq[Int](1).mkString(","), r.getLong(2))
    val streamed = spark.table("bpe_out").collect().map(key).toSeq.sorted
    val batch = graft.ops.Bpe.applyBpeIds(docs, "text", merges, vocab)
      .select("doc_id", "bpe_ids", "n_bpe_tokens")
      .collect().map(key).toSeq.sorted
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }

  test("unigram-LM id encoding runs inside a real stream (UDF apply path)") {
    // same claim as the BPE case: the Viterbi apply is a Column
    // projection, so a fitted unigram tokenizer encodes an ingest
    // stream with exact batch parity
    val dir = sf("sf0.001")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text")
    val m = graft.ops.UnigramLm.learnUnigram(docs, "text", vocabSize = 300,
      maxWords = 5000)
    val dDir = "/root/repo/target/test_stream_uni_docs"
    docs.write.mode("overwrite").parquet(dDir)
    val stream = spark.readStream.schema(docs.schema).parquet(dDir)
    val enc = graft.ops.UnigramLm.applyUnigramIds(stream, "text", m)
      .select("doc_id", "uni_ids", "n_uni_pieces")
    EventStream.runToMemory(enc, "uni_out", mode = "append")
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getSeq[Int](1).mkString(","), r.getLong(2))
    val streamed = spark.table("uni_out").collect().map(key).toSeq.sorted
    val batch = graft.ops.UnigramLm.applyUnigramIds(docs, "text", m)
      .select("doc_id", "uni_ids", "n_uni_pieces")
      .collect().map(key).toSeq.sorted
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }

  test("WordPiece id encoding runs inside a real stream (UDF apply path)") {
    // same claim as the BPE/unigram cases: greedy longest-match apply is
    // a Column projection, so a learned WordPiece vocabulary encodes an
    // ingest stream with exact batch parity
    val dir = sf("sf0.001")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text")
    val vocab = graft.ops.WordPiece.learnWordPiece(docs, "text",
      vocabSize = 300, maxWords = 5000)
    val dDir = "/root/repo/target/test_stream_wp_docs"
    docs.write.mode("overwrite").parquet(dDir)
    val stream = spark.readStream.schema(docs.schema).parquet(dDir)
    val enc = graft.ops.WordPiece.applyWordPieceIds(stream, "text", vocab)
      .select("doc_id", "wp_ids", "n_wp_tokens")
    EventStream.runToMemory(enc, "wp_out", mode = "append")
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getSeq[Int](1).mkString(","), r.getLong(2))
    val streamed = spark.table("wp_out").collect().map(key).toSeq.sorted
    val batch = graft.ops.WordPiece.applyWordPieceIds(docs, "text", vocab)
      .select("doc_id", "wp_ids", "n_wp_tokens")
      .collect().map(key).toSeq.sorted
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }

  test("span scrub runs at ingest via foreachBatch (stream equals batch)") {
    // decontamination-at-ingest: the scrub is per-document given the
    // STATIC benchmark set (the hit agg groups within the document), so
    // applying it per micro-batch via foreachBatch is exactly the batch
    // semantics regardless of how the stream is chopped
    val dir = sf("sf0.001")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text")
    val bench = docs.filter(col("doc_id") % 29 === 0)
    val corpus = docs.filter(col("doc_id") % 29 =!= 0)
    val dDir = "/root/repo/target/test_stream_scrub_docs"
    val outDir = "/root/repo/target/test_stream_scrub_out"
    // 4 files + maxFilesPerTrigger=1 → 4 real micro-batches; a single-file
    // write would collapse to one batch and the chopping claim would go
    // untested
    corpus.repartition(4).write.mode("overwrite").parquet(dDir)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(outDir))
    val stream = spark.readStream.schema(corpus.schema)
      .option("maxFilesPerTrigger", "1").parquet(dDir)
    val q = stream.writeStream.foreachBatch {
      (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        graft.ops.Dedup.decontaminateScrub(batch.toDF(), bench, "text",
            "doc_id", n = 4, pad = 2)
          .write.mode("append").parquet(outDir)
    }.start()
    q.processAllAvailable(); q.stop()
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq.sorted
    val streamed = key(spark.read.parquet(outDir)
      .select("doc_id", "scrub_text", "n_tokens", "n_removed", "n_pieces"))
    val batch = key(graft.ops.Dedup.decontaminateScrub(corpus, bench, "text",
        "doc_id", n = 4, pad = 2)
      .select("doc_id", "scrub_text", "n_tokens", "n_removed", "n_pieces"))
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }

  test("windowedEval agrees with the batch operators on a single-window frame") {
    // cross-operator consistency: one window's (auc, ece) must equal
    // Classifier.rocAuc(bins=8) and calibrationReport(bins=8)'s ECE on
    // the same rows — the monitor is the same math, windowed
    import spark.implicits._
    val rows = (0 until 200).map { i =>
      (3600L + i, ((i % 2) * 300 + (i * 37 + 11) % 700) / 1024.0,
        (i % 2).toDouble)
    }
    val df = rows.toDF("sec", "score", "label")
      .select(expr("timestamp_seconds(sec)").as("ts"),
        col("score"), col("label"))
    val w = EventStream.windowedEval(df, "score", "label", "1 hour",
      bins = 8).head()
    val auc = graft.ops.Classifier.rocAuc(
      df.select("score", "label"), "score", "label", bins = Some(8))
      .head().getDouble(2)
    val ece = graft.ops.Classifier.calibrationReport(
      df.select("score", "label"), "score", "label", bins = 8)
      .filter(col("bin") === -1).head().getDouble(4)
    assert(w.getLong(1) === 200L)
    assert(math.abs(w.getDouble(2) - auc) < 1e-9,
      s"windowed auc ${w.getDouble(2)} vs batch $auc")
    assert(math.abs(w.getDouble(3) - ece) < 1e-9,
      s"windowed ece ${w.getDouble(3)} vs batch $ece")
  }

  test("scoreDrift: PSI is nonnegative and symmetric under window swap") {
    // each term (p-q)ln(p/q) is >= 0 and invariant under p<->q, so PSI
    // >= 0 always and swapping the two windows' data leaves it fixed
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 3) {
      val h0 = Seq.fill(30)(math.floor(rnd.nextDouble() * 4) / 4 + 0.1)
      val h1 = Seq.fill(40)(math.floor(rnd.nextDouble() * 4) / 4 + 0.1)
      def drift(a: Seq[Double], b: Seq[Double]): (Double, Long) = {
        val df = (a.map((0L, _)) ++ b.map((3600L, _)))
          .toDF("sec", "score")
          .select(expr("timestamp_seconds(sec)").as("ts"),
            (col("score") / 2).as("score"))
        val r = EventStream.scoreDrift(df, "score", "1 hour", bins = 8)
          .head()
        (r.getDouble(2), r.getLong(3))
      }
      val (fwd, osF) = drift(h0, h1)
      val (bwd, osB) = drift(h1, h0)
      assert(fwd >= 0.0 && bwd >= 0.0)
      assert(math.abs(fwd - bwd) < 1e-9, s"$fwd vs $bwd")
      assert(osF === osB)
    }
  }

  test("scoreDrift: hand-computed PSI, one-sided bin census, identity zero") {
    import spark.implicits._
    // three consecutive hours, bins = 4 (bin 0: s=.1, bin 1: s=.3,
    // bin 2: s=.6):
    //   h0: {b0: 2, b1: 2}   h1: {b0: 3, b1: 1}   h2: {b0: 2, b2: 2}
    def at(hour: Int, s: Double, n: Int) =
      Seq.fill(n)((hour * 3600L, s))
    val rows = at(0, 0.1, 2) ++ at(0, 0.3, 2) ++
      at(1, 0.1, 3) ++ at(1, 0.3, 1) ++
      at(2, 0.1, 2) ++ at(2, 0.6, 2)
    val df = rows.toDF("sec", "score")
      .select(expr("timestamp_seconds(sec)").as("ts"), col("score"))
    val got = EventStream.scoreDrift(df, "score", "1 hour", bins = 4)
      .orderBy("window_start").collect()
    assert(got.length === 2) // h0 has no predecessor
    // h1 vs h0: (.75-.5)ln(1.5) + (.25-.5)ln(.5) = 0.274653072
    assert(got(0).getLong(1) === 4L)
    assert(math.abs(got(0).getDouble(2) - 0.274653072) < 1e-9)
    assert(got(0).getLong(3) === 0L)
    // h2 vs h1: shared bin 0 only -> (.5-.75)ln(2/3) = 0.101366277;
    // bin 1 vanished + bin 2 appeared -> 2 one-sided bins
    assert(math.abs(got(1).getDouble(2) - 0.101366277) < 1e-9)
    assert(got(1).getLong(3) === 2L)
    // identical consecutive distributions drift 0 with no one-sided mass
    val same = (at(0, 0.1, 2) ++ at(0, 0.3, 2) ++
      at(1, 0.1, 2) ++ at(1, 0.3, 2)).toDF("sec", "score")
      .select(expr("timestamp_seconds(sec)").as("ts"), col("score"))
    val s0 = EventStream.scoreDrift(same, "score", "1 hour", bins = 4)
      .head()
    assert(s0.getDouble(2) === 0.0 && s0.getLong(3) === 0L)
  }

  test("embeddingDrift: equals scoreDrift's PSI on the matching cell stream; refusals") {
    import spark.implicits._
    // centroids at 10·e_j: nearest-centroid = argmax coordinate, so a
    // one-hot-ish stream has a KNOWN cell and the PSI must equal the
    // hand-checked scoreDrift numbers on the equivalent bin stream:
    //   h0: {c0: 2, c1: 2}   h1: {c0: 3, c1: 1}
    val centroids = Array(Array(10.0, 0.0, 0.0), Array(0.0, 10.0, 0.0))
    def vec(cell: Int) = Seq.tabulate(3)(k => if (k == cell) 1.0f else 0.1f)
    def at(hour: Int, cell: Int, n: Int) =
      Seq.fill(n)((hour * 3600L, vec(cell)))
    val rows = at(0, 0, 2) ++ at(0, 1, 2) ++ at(1, 0, 3) ++ at(1, 1, 1)
    val df = rows.toDF("sec", "v")
      .select(expr("timestamp_seconds(sec)").as("ts"), col("v"))
    val got = EventStream.embeddingDrift(df, "v", centroids, "1 hour")
      .orderBy("window_start").collect()
    assert(got.length === 1)
    // identical to the scoreDrift hand case: (.75-.5)ln(1.5)
    // + (.25-.5)ln(.5) = 0.274653072
    assert(got(0).getLong(1) === 4L)
    assert(math.abs(got(0).getDouble(2) - 0.274653072) < 1e-9)
    assert(got(0).getLong(3) === 0L)
    // refusals: null vector, wrong dimension, degenerate centroid table
    val withNull = (rows :+ ((0L, null.asInstanceOf[Seq[Float]])))
      .toDF("sec", "v")
      .select(expr("timestamp_seconds(sec)").as("ts"), col("v"))
    intercept[IllegalArgumentException](
      EventStream.embeddingDrift(withNull, "v", centroids, "1 hour")
        .count())
    val shortVec = (rows :+ ((0L, Seq(1.0f))))
      .toDF("sec", "v")
      .select(expr("timestamp_seconds(sec)").as("ts"), col("v"))
    intercept[IllegalArgumentException](
      EventStream.embeddingDrift(shortVec, "v", centroids, "1 hour")
        .count())
    intercept[IllegalArgumentException](
      EventStream.embeddingDrift(df, "v",
        Array(Array(10.0, 0.0, 0.0)), "1 hour").count())
  }

  test("ksDrift: hand-computed D on the pooled support; p-value formula; identity") {
    import spark.implicits._
    def at(hour: Int, s: Double, n: Int) = Seq.fill(n)((hour * 3600L, s))
    def drift(rows: Seq[(Long, Double)]) = EventStream.ksDrift(
      rows.toDF("sec", "score")
        .select(expr("timestamp_seconds(sec)").as("ts"), col("score")),
      "score", "1 hour")
    // h0: {.1×2, .3×2}  h1: {.1×3, .3×1}: ECDFs on support {.1, .3} are
    // cur (.75, 1) vs prev (.5, 1) → D = .25 at x = .1
    val r = drift(at(0, 0.1, 2) ++ at(0, 0.3, 2) ++
      at(1, 0.1, 3) ++ at(1, 0.3, 1)).head()
    assert(r.getLong(1) === 4L && r.getLong(2) === 4L)
    assert(r.getDouble(3) === 0.25)
    // the documented fixed-truncation Kolmogorov p at n_eff = 2
    val lam = (math.sqrt(2.0) + 0.12 + 0.11 / math.sqrt(2.0)) * 0.25
    val expP = 2.0 * (1 to 8).map(j =>
      (if (j % 2 == 1) 1.0 else -1.0) *
        math.exp(-2.0 * j * j * lam * lam)).sum
    assert(math.abs(r.getDouble(4) -
      graft.ops.Num.round9(math.min(1.0, math.max(0.0, expP)))) < 1e-9)
    // disjoint supports: cur {.2×2, .4×2} vs prev {.1×4} → at x = .1 the
    // prev ECDF is already 1 while cur is 0 → D = 1 (the one-sided
    // alignment the coalesce-to-0 cumulative handles)
    val dj = drift(at(0, 0.1, 4) ++ at(1, 0.2, 2) ++ at(1, 0.4, 2)).head()
    assert(dj.getDouble(3) === 1.0)
    assert(dj.getDouble(4) < 0.3, s"disjoint p ${dj.getDouble(4)}")
    // identical consecutive distributions: D = 0, λ < .3 → p exactly 1
    val id0 = drift(at(0, 0.1, 2) ++ at(0, 0.3, 2) ++
      at(1, 0.1, 2) ++ at(1, 0.3, 2)).head()
    assert(id0.getDouble(3) === 0.0 && id0.getDouble(4) === 1.0)
  }

  test("ksDrift: symmetric under window swap; refusals (null, NaN, maxDistinct)") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val h0 = Seq.fill(30)(math.floor(rnd.nextDouble() * 8) / 16)
    val h1 = Seq.fill(40)(math.floor(rnd.nextDouble() * 8) / 16)
    def drift(a: Seq[Double], b: Seq[Double]) = EventStream.ksDrift(
      (a.map((0L, _)) ++ b.map((3600L, _))).toDF("sec", "score")
        .select(expr("timestamp_seconds(sec)").as("ts"), col("score")),
      "score", "1 hour").head()
    val f = drift(h0, h1); val g = drift(h1, h0)
    // |F1 − F2| and n_eff are symmetric in the two samples, so D and p
    // are window-swap invariant (the counts swap roles)
    assert(math.abs(f.getDouble(3) - g.getDouble(3)) < 1e-12)
    assert(math.abs(f.getDouble(4) - g.getDouble(4)) < 1e-9)
    assert(f.getLong(1) === g.getLong(2) && f.getLong(2) === g.getLong(1))
    def frame(rows: Seq[(Long, Option[Double])]) =
      rows.toDF("sec", "score")
        .select(expr("timestamp_seconds(sec)").as("ts"), col("score"))
    intercept[IllegalArgumentException](EventStream.ksDrift(
      frame(Seq((0L, Some(0.1)), (3600L, None))), "score", "1 hour")
      .count())
    intercept[IllegalArgumentException](EventStream.ksDrift(
      frame(Seq((0L, Some(0.1)), (3600L, Some(Double.NaN)))), "score",
      "1 hour").count())
    // the guard is PER-WINDOW: 3 distinct in window 0 refuses at
    // maxDistinct = 2 ...
    intercept[IllegalArgumentException](EventStream.ksDrift(
      frame(Seq((0L, Some(0.1)), (0L, Some(0.2)), (0L, Some(0.3)),
        (3600L, Some(0.3)))),
      "score", "1 hour", maxDistinct = 2).count())
    // ... while a GLOBALLY large support with every window bounded at 2
    // keeps running (the r17 ADVICE case: bounded per-window ECDF state)
    val spread = EventStream.ksDrift(
      frame(Seq((0L, Some(0.1)), (0L, Some(0.2)),
        (3600L, Some(0.3)), (3600L, Some(0.4)),
        (7200L, Some(0.5)), (7200L, Some(0.6)))),
      "score", "1 hour", maxDistinct = 2)
    assert(spread.count() === 2L)
  }

  test("cusumDrift: closed-form prefix identity == driver recurrence; alarm time; slack; refusals") {
    import spark.implicits._
    // one row per hour whose value IS that hour's mean, so the hand
    // recurrence runs on the same numbers
    def drift(means: Seq[Double], mu0: Double, kappa: Double, h: Double) =
      EventStream.cusumDrift(
        means.zipWithIndex.map { case (m, i) => (i * 3600L, m) }
          .toDF("sec", "v")
          .select(expr("timestamp_seconds(sec)").as("ts"), col("v")),
        "v", mu0, kappa, h).orderBy("window_start").collect()
    def recurrence(means: Seq[Double], mu0: Double, kappa: Double,
                   up: Boolean): Seq[Double] =
      means.scanLeft(0.0) { (s, m) =>
        val d = if (up) m - mu0 - kappa else mu0 - m - kappa
        math.max(0.0, s + d)
      }.tail
    val means = Seq(5.0, 5.1, 4.9, 6.0, 6.0, 6.0, 6.0)
    val out = drift(means, 5.0, 0.2, 1.5)
    val expUp = recurrence(means, 5.0, 0.2, up = true)
    val expDn = recurrence(means, 5.0, 0.2, up = false)
    out.zipWithIndex.foreach { case (r, i) =>
      assert(r.getLong(1) === 1L)
      assert(math.abs(r.getDouble(2) - means(i)) < 1e-9)
      assert(math.abs(r.getDouble(3) - expUp(i)) < 1e-9,
        s"cusum_pos window $i: ${r.getDouble(3)} vs ${expUp(i)}")
      assert(math.abs(r.getDouble(4) - expDn(i)) < 1e-9)
      assert(r.getBoolean(5) === (expUp(i) > 1.5 || expDn(i) > 1.5))
    }
    // the small persistent +1.0 shift alarms (window-vs-window tests
    // never would at this size); the alarm time matches the recurrence
    assert(out.exists(_.getBoolean(5)))
    assert(out.indexWhere(_.getBoolean(5)) ===
      expUp.indexWhere(_ > 1.5))
    // downward shift drives the NEGATIVE side
    val dn = drift(Seq(5.0, 4.0, 4.0, 4.0), 5.0, 0.2, 1.2)
    assert(dn.last.getDouble(4) > dn.last.getDouble(3))
    assert(dn.last.getBoolean(5))
    // slack: a shift smaller than kappa never accumulates — S stays 0
    val slack = drift(Seq(5.5, 5.5, 5.5, 5.5, 5.5), 5.0, 1.0, 0.5)
    assert(slack.forall(r => r.getDouble(3) === 0.0 &&
      r.getDouble(4) === 0.0 && !r.getBoolean(5)))
    // refusals: NaN census rides the aggregate; parameter guards
    intercept[IllegalArgumentException](
      drift(Seq(5.0, Double.NaN), 5.0, 0.2, 1.5))
    intercept[IllegalArgumentException](
      drift(Seq(5.0), 5.0, -0.1, 1.5))
    intercept[IllegalArgumentException](
      drift(Seq(5.0), 5.0, 0.2, 0.0))
  }

  test("windowedAbSprt: hand LLR, decisive streams decide at the Wald bound, balanced holds then closes, refusals") {
    import spark.implicits._
    // per hour: nb discordants A wins, nc discordants B wins, plus 3
    // concordant rows that must carry NO information
    def mk(hours: Seq[(Int, Int)]) =
      hours.zipWithIndex.flatMap { case ((nb, nc), h) =>
        val base = h * 3600L
        Seq.fill(nb)((base, "1", "1", "0")) ++
          Seq.fill(nc)((base, "1", "0", "1")) ++
          Seq.fill(3)((base, "1", "1", "1"))
      }.toDF("sec", "y", "a", "b")
        .select(expr("timestamp_seconds(sec)").as("ts"), col("y"),
          col("a"), col("b"))
    def sprt(hours: Seq[(Int, Int)], p1: Double = 0.6) =
      EventStream.windowedAbSprt(mk(hours), "y", "a", "b", "1 hour", p1)
        .orderBy("window_start").collect()
    // hand LLR on the cumulative counts after two windows:
    // b_cum = 3, c_cum = 5 at p1 = .6
    val out = sprt(Seq((2, 3), (1, 2)))
    assert(out(1).getLong(2) === 3L && out(1).getLong(3) === 5L)
    assert(out(1).getDouble(4) === graft.ops.Num.round9(
      5 * math.log(2.0 * 0.6) + 3 * math.log(2.0 * 0.4)))
    assert(out(1).getDouble(5) === graft.ops.Num.round9(
      3 * math.log(2.0 * 0.6) + 5 * math.log(2.0 * 0.4)))
    // B sweeping the discordants: the decision fires exactly when the
    // pinned llr crosses the Wald bound ln((1-beta)/alpha) = ln(19)
    val win = sprt(Seq.fill(20)((0, 4)))
    assert(win.last.getString(6) === "b_better")
    val hi = math.log((1.0 - 0.05) / 0.05)
    assert(win.indexWhere(_.getString(6) == "b_better") ===
      win.indexWhere(_.getDouble(4) >= hi))
    // symmetric roles
    assert(sprt(Seq.fill(20)((4, 0))).last.getString(6) === "a_better")
    // balanced discordants: both LLRs drift down — never a win call,
    // eventually BOTH cross the lower bound -> no_difference
    val bal = sprt(Seq.fill(40)((3, 3)))
    assert(!bal.exists(r => r.getString(6) == "b_better" ||
      r.getString(6) == "a_better"))
    assert(bal.last.getString(6) === "no_difference")
    // refusals: p1/alpha guards; null labels via the riding census
    intercept[IllegalArgumentException](sprt(Seq((1, 1)), p1 = 0.5))
    intercept[IllegalArgumentException](EventStream.windowedAbSprt(
      mk(Seq((1, 1))), "y", "a", "b", "1 hour", 0.6, alpha = 0.6))
    intercept[IllegalArgumentException](EventStream.windowedAbSprt(
      mk(Seq((1, 1))).select(col("ts"),
        lit(null).cast("string").as("y"), col("a"), col("b")),
      "y", "a", "b").count())
  }

  test("cusumDrift gap windows: default skips them (data-window semantics); densify emits n = 0 rows that accrue mu0 - kappa downward") {
    import spark.implicits._
    // hours 0, 1, 4 carry one event each at the reference mean; hours
    // 2 and 3 are SILENT
    def gapped(mu0: Double, kappa: Double, h: Double, dense: Boolean) =
      EventStream.cusumDrift(
        Seq((0L, mu0), (3600L, mu0), (4 * 3600L, mu0)).toDF("sec", "v")
          .select(expr("timestamp_seconds(sec)").as("ts"), col("v")),
        "v", mu0, kappa, h, "1 hour", densify = dense)
        .orderBy("window_start").collect()
    // default: 3 rows, the gap invisible, nothing accrues anywhere
    val sparse = gapped(5.0, 0.5, 2.0, dense = false)
    assert(sparse.length === 3)
    assert(sparse.forall(r => r.getDouble(3) === 0.0 &&
      r.getDouble(4) === 0.0 && !r.getBoolean(5)))
    // densified: 5 rows; the two gap rows read n = 0, mean = 0, and
    // each accrues mu0 - kappa = 4.5 on the NEGATIVE side (a stopped
    // feed IS downward drift) — alarm fires inside the gap at h = 2
    val dense = gapped(5.0, 0.5, 2.0, dense = true)
    assert(dense.length === 5)
    assert(dense.map(_.getLong(1)).toSeq === Seq(1L, 1L, 0L, 0L, 1L))
    assert(dense(2).getDouble(2) === 0.0)          // gap mean reads 0
    assert(dense(2).getDouble(4) === 4.5)          // one silent hour
    assert(dense(3).getDouble(4) === 9.0)          // two silent hours
    assert(!dense(1).getBoolean(5) && dense(2).getBoolean(5))
    // the data windows carry the SAME statistics in both modes up to
    // the gap's contribution: window 0 and 1 match exactly
    for (i <- 0 to 1; j <- 3 to 4)
      assert(dense(i).getDouble(j) === sparse(i).getDouble(j))
  }

  test("windowedAbSprt densify: gap rows carry cums forward; decisions on data windows unchanged") {
    import spark.implicits._
    // discordants only in hours 0 and 3 — hours 1, 2 silent
    val df = Seq((0L, "1", "0", "1"), (0L, "1", "0", "1"),
        (3 * 3600L, "1", "0", "1"))
      .toDF("sec", "y", "a", "b")
      .select(expr("timestamp_seconds(sec)").as("ts"), col("y"),
        col("a"), col("b"))
    val sparse = EventStream.windowedAbSprt(df, "y", "a", "b", "1 hour")
      .orderBy("window_start").collect()
    val dense = EventStream.windowedAbSprt(df, "y", "a", "b", "1 hour",
      densify = true).orderBy("window_start").collect()
    assert(sparse.length === 2 && dense.length === 4)
    // gap rows: zero traffic, cums carried forward, same verdict path
    assert(dense(1).getLong(1) === 0L && dense(2).getLong(1) === 0L)
    assert(dense(1).getLong(3) === 2L && dense(2).getLong(3) === 2L)
    assert(dense(1).getDouble(4) === dense(0).getDouble(4))
    // the data windows are bit-identical across modes (an empty
    // window adds zero discordants — nothing is understated)
    assert(dense(0).toSeq === sparse(0).toSeq)
    assert(dense(3).toSeq === sparse(1).toSeq)
  }

  test("windowedMixtureSprt: hand log-lambda, anytime p, boundary crossing monotone in effect size, refusals") {
    import spark.implicits._
    def mk(vals: Seq[Seq[Double]]) =
      vals.zipWithIndex.flatMap { case (xs, h) =>
        xs.map(x => (h * 3600L, x)) }
        .toDF("sec", "x")
        .select(expr("timestamp_seconds(sec)").as("ts"), col("x"))
    def msprt(vals: Seq[Seq[Double]], s2: Option[Double] = Some(0.25),
              t2: Double = 1.0, a: Double = 0.05) =
      EventStream.windowedMixtureSprt(mk(vals), "x", s2, t2, a)
        .orderBy("window_start").collect()
    // hand case: two windows, cumulative (n, S) = (2, 1.0) then
    // (3, 2.0); log Λ = .5·ln(σ²/(σ²+nτ²)) + S²τ²/(2σ²(σ²+nτ²))
    val out = msprt(Seq(Seq(0.5, 0.5), Seq(1.0)))
    def handLl(n: Long, s: Double) =
      graft.ops.Num.round9(0.5 * math.log(0.25 / (0.25 + n * 1.0))
        + (s * s * 1.0) / (2.0 * 0.25 * (0.25 + n * 1.0)))
    assert(out(0).getLong(2) === 2L && out(1).getLong(2) === 3L)
    assert(out(0).getDouble(5) === handLl(2, 1.0))
    assert(out(1).getDouble(5) === handLl(3, 2.0))
    assert(out(1).getDouble(3) === graft.ops.Num.round9(2.0 / 3.0))
    // known-variance path: var_used reports the constant, always
    // decidable
    assert(out.forall(r => r.getDouble(4) === 0.25 && r.getBoolean(8)))
    // anytime-valid p = min(1, 1/Λ), monotone against the statistic
    assert(out(1).getDouble(6) === graft.ops.Num.round9(
      math.min(1.0, math.exp(0.0 - handLl(3, 2.0)))))
    // a zero-mean stream never rejects (Λ shrinks below 1, p pins at 1)
    val nullCase = msprt(Seq.fill(20)(Seq(0.5, -0.5)))
    assert(nullCase.forall(!_.getBoolean(7)))
    assert(nullCase.last.getDouble(6) === 1.0)
    // boundary-crossing time is MONOTONE in effect size: a 2x shift
    // rejects no later (here strictly earlier) than a 1x shift
    def firstReject(shift: Double): Int =
      msprt(Seq.fill(30)(Seq.fill(4)(shift)))
        .indexWhere(_.getBoolean(7))
    val (slow, fast) = (firstReject(0.25), firstReject(0.5))
    assert(slow > 0 && fast >= 0 && fast <= slow)
    // refusals: parameter guards; NaN census rides the aggregate
    intercept[IllegalArgumentException](
      msprt(Seq(Seq(1.0)), s2 = Some(0.0)))
    intercept[IllegalArgumentException](
      msprt(Seq(Seq(1.0)), t2 = -1.0))
    intercept[IllegalArgumentException](
      msprt(Seq(Seq(1.0)), a = 0.5))
    intercept[IllegalArgumentException](
      msprt(Seq(Seq(Double.NaN))))
  }

  test("windowedMixtureSprt plug-in variance: running s2 in var_used, pre-variance sentinel, convergence to the known-sigma2 statistic") {
    import spark.implicits._
    def mk(vals: Seq[Seq[Double]]) =
      vals.zipWithIndex.flatMap { case (xs, h) =>
        xs.map(x => (h * 3600L, x)) }
        .toDF("sec", "x")
        .select(expr("timestamp_seconds(sec)").as("ts"), col("x"))
    // an alternating ±1 stream has empirical s² = n/(n−1) → 1 exactly
    // computable by hand: at cumulative n = 2k, S = 0, Σx² = n
    val alt = Seq.tabulate(30)(_ => Seq(1.0, -1.0))
    val plug = EventStream.windowedMixtureSprt(mk(alt), "x", None, 1.0)
      .orderBy("window_start").collect()
    // window h: n_cum = 2(h+1); s² = (Σx² − 0)/(n−1) = n/(n−1)
    for ((r, h) <- plug.zipWithIndex) {
      val n = 2.0 * (h + 1)
      assert(r.getBoolean(8), s"window $h should be decidable")
      assert(r.getDouble(4) === graft.ops.Num.round9(n / (n - 1.0)))
    }
    // plug-in → known convergence: s² → 1, so the plug-in log Λ
    // approaches the σ² = 1 statistic as data accrues
    val known = EventStream.windowedMixtureSprt(mk(alt), "x",
      Some(1.0), 1.0).orderBy("window_start").collect()
    val gapFirst = math.abs(plug(0).getDouble(5) - known(0).getDouble(5))
    val gapLast = math.abs(plug.last.getDouble(5) - known.last.getDouble(5))
    // the plug-in gap decays like 0.5·ln(n/(n−1)) ≈ 0.5/(n−1): ~0.2
    // at n = 2, under 0.01 by n = 60
    assert(gapLast < gapFirst && gapLast < 0.01)
    // a one-event first window cannot have a variance yet: sentinel
    // with decidable = false, then the monitor recovers
    val thin = EventStream.windowedMixtureSprt(
      mk(Seq(Seq(0.5), Seq(1.0, 0.0))), "x", None, 1.0)
      .orderBy("window_start").collect()
    assert(!thin(0).getBoolean(8) && thin(0).getDouble(5) === -1.0
      && thin(0).getDouble(4) === -1.0)
    assert(thin(1).getBoolean(8))
    // a CONSTANT stream has s² = 0 — no scale to test against, the
    // window stays undecidable rather than dividing by zero
    val const = EventStream.windowedMixtureSprt(
      mk(Seq(Seq(0.5, 0.5, 0.5))), "x", None, 1.0).collect()
    assert(!const(0).getBoolean(8) && const(0).getDouble(5) === -1.0)
  }

  test("windowedConfidenceSeq: hand radius, exact duality with the mixture SPRT, radius shrinks, refusals") {
    import spark.implicits._
    def mk(vals: Seq[Seq[Double]]) =
      vals.zipWithIndex.flatMap { case (xs, h) =>
        xs.map(x => (h * 3600L, x)) }
        .toDF("sec", "x")
        .select(expr("timestamp_seconds(sec)").as("ts"), col("x"))
    // hand radius at (n, S) = (2, 1): σ² = .25, τ² = 1, α = .05 —
    // r = sqrt((2·.25·(.25+2)/1)·(.5·ln((.25+2)/.25) − ln .05)) / 2
    val out = EventStream.windowedConfidenceSeq(
      mk(Seq(Seq(0.5, 0.5), Seq(1.0))), "x", Some(0.25), 1.0)
      .orderBy("window_start").collect()
    val handR = graft.ops.Num.round9(math.sqrt(
      (2.0 * 0.25 * (0.25 + 2.0 * 1.0) / 1.0)
        * (0.5 * math.log((0.25 + 2.0 * 1.0) / 0.25)
          - math.log(0.05))) / 2.0)
    assert(out(0).getLong(2) === 2L)
    assert(out(0).getDouble(5) === handR)
    assert(out(0).getDouble(6) === graft.ops.Num.round9(0.5 - handR))
    assert(out(0).getDouble(7) === graft.ops.Num.round9(0.5 + handR))
    assert(out.forall(r => r.getDouble(4) === 0.25 && r.getBoolean(8)))
    // DUALITY with the mixture SPRT: the mSPRT rejects mu = 0 exactly
    // when 0 leaves the sequence — checked window by window on a
    // drifting stream (boundary-distance guard excludes ties on the
    // 1e-9 grid)
    val stream = Seq.tabulate(25)(h => Seq.fill(4)(0.25))
    val cs = EventStream.windowedConfidenceSeq(mk(stream), "x",
      Some(0.25), 1.0).orderBy("window_start").collect()
    val ms = EventStream.windowedMixtureSprt(mk(stream), "x",
      Some(0.25), 1.0).orderBy("window_start").collect()
    var checked = 0
    for ((c, m) <- cs.zip(ms)) {
      val gap = math.abs(math.abs(c.getDouble(3)) - c.getDouble(5))
      if (gap > 1e-6) {
        assert(m.getBoolean(7) ===
          (math.abs(c.getDouble(3)) > c.getDouble(5)),
          s"duality broken at ${c.get(0)}")
        checked += 1
      }
    }
    assert(checked >= 20)
    assert(ms.exists(_.getBoolean(7)))   // the drift IS detected
    // the radius SHRINKS as data accrues (eventually ~ sqrt(ln n / n))
    assert(cs.last.getDouble(5) < cs.head.getDouble(5))
    // the PLUG-IN duality is preserved too: both operators plug in
    // the same running s², so reject ⟺ 0 outside the sequence, still
    // window for window (a noisy stream so s² > 0 from window 1)
    val noisy = Seq.tabulate(25)(h =>
      Seq(0.5, 0.0, 0.75, 0.25))
    val csP = EventStream.windowedConfidenceSeq(mk(noisy), "x",
      None, 1.0).orderBy("window_start").collect()
    val msP = EventStream.windowedMixtureSprt(mk(noisy), "x",
      None, 1.0).orderBy("window_start").collect()
    for ((c, m) <- csP.zip(msP) if c.getBoolean(8)) {
      assert(c.getDouble(4) === m.getDouble(4)) // same s² plugged in
      val gap = math.abs(math.abs(c.getDouble(3)) - c.getDouble(5))
      if (gap > 1e-6)
        assert(m.getBoolean(7) ===
          (math.abs(c.getDouble(3)) > c.getDouble(5)),
          s"plug-in duality broken at ${c.get(0)}")
    }
    // refusals: parameter guards; NaN census
    intercept[IllegalArgumentException](
      EventStream.windowedConfidenceSeq(mk(Seq(Seq(1.0))), "x",
        Some(0.0), 1.0))
    intercept[IllegalArgumentException](
      EventStream.windowedConfidenceSeq(mk(Seq(Seq(1.0))), "x",
        Some(0.25), 1.0, alpha = 0.9))
    intercept[IllegalArgumentException](
      EventStream.windowedConfidenceSeq(mk(Seq(Seq(Double.NaN))), "x",
        Some(0.25), 1.0))
  }

  test("windowedOffPolicy: per-window rows equal the batch offPolicyEval on that window's traffic; refusal") {
    import spark.implicits._
    // two hours of logged-bandit traffic with different policies
    val rows = Seq(
      (0L, 1.0, 0.5, 1.0), (0L, 0.0, 0.5, 0.25), (0L, 1.0, 0.25, 1.0),
      (3600L, 0.5, 1.0, 0.5), (3600L, 1.0, 0.5, 0.5),
      (3600L, 0.0, 0.25, 0.75))
    val df = rows.toDF("sec", "r", "pb", "pt")
      .select(expr("timestamp_seconds(sec)").as("ts"), col("r"),
        col("pb"), col("pt"))
    val out = EventStream.windowedOffPolicy(df, "r", "pb", "pt",
      clip = 2.0).orderBy("window_start").collect()
    assert(out.length === 2)
    // single-sourcing check: each window row equals the BATCH
    // operator run on exactly that hour's rows, column for column
    for ((row, sec) <- Seq((out(0), 0L), (out(1), 3600L))) {
      val solo = graft.ops.Classifier.offPolicyEval(
        rows.filter(_._1 == sec).map(t => (t._2, t._3, t._4))
          .toDF("r", "pb", "pt"), "r", "pb", "pt", clip = 2.0).head()
      for (i <- 0 until solo.length)
        assert(row.get(i + 1) === solo.get(i),
          s"window $sec column $i: ${row.get(i + 1)} vs ${solo.get(i)}")
    }
    // hygiene rides the one aggregate: a zero logging propensity
    // anywhere refuses the whole monitor
    intercept[IllegalArgumentException](EventStream.windowedOffPolicy(
      df.select(col("ts"), col("r"), lit(0.0).as("pb"), col("pt")),
      "r", "pb", "pt"))
  }

  test("windowedCuped: single-window equality to batch cupedDelta; one-armed window emits sentinels; refusal") {
    import spark.implicits._
    val rows = Seq(
      ("arm0", 0.0, 1.0), ("arm0", 1.0, 3.0), ("arm0", 0.0, 0.0),
      ("arm0", 1.0, 2.0),
      ("arm1", 1.0, 2.0), ("arm1", 1.0, 4.0), ("arm1", 2.0, 1.0),
      ("arm1", 2.0, 3.0))
    val oneWin = rows.map { case (a, y, x) => (100L, a, y, x) }
      .toDF("sec", "arm", "y", "x")
      .select(expr("timestamp_seconds(sec)").as("ts"), col("arm"),
        col("y"), col("x"))
    val w = EventStream.windowedCuped(oneWin, "arm", "arm0", "arm1",
      "y", "x").head()
    val b = graft.ops.Classifier.cupedDelta(rows.toDF("arm", "y", "x"),
      "arm", "arm0", "arm1", "y", "x").head()
    // windowed columns (n_a..p_value at 1..9) vs batch (n_a, n_b,
    // theta, delta_raw, se_raw, delta, se, z, p_value at 0..8);
    // approx, not ===: the column erfcc uses codegen exp, the batch
    // scalar the Math intrinsic — a measured 1-ulp surface
    assert(w.getLong(1) === b.getLong(0) && w.getLong(2) === b.getLong(1))
    for ((wi, bi) <- Seq(3 -> 2, 4 -> 3, 5 -> 4, 6 -> 5, 7 -> 6,
        8 -> 7, 9 -> 8))
      assert(math.abs(w.getDouble(wi) - b.getDouble(bi)) < 1e-8,
        s"windowed($wi)=${w.getDouble(wi)} batch($bi)=${b.getDouble(bi)}")
    assert(w.getBoolean(10))
    // a window with only one arm emits the -1 sentinel row but keeps
    // emitting (decidable = false) — the monitor never goes dark
    val gap = (rows.map { case (a, y, x) => (100L, a, y, x) } ++
      Seq((3700L, "arm0", 1.0, 1.0), (3700L, "arm0", 0.0, 2.0)))
      .toDF("sec", "arm", "y", "x")
      .select(expr("timestamp_seconds(sec)").as("ts"), col("arm"),
        col("y"), col("x"))
    val out = EventStream.windowedCuped(gap, "arm", "arm0", "arm1",
      "y", "x").orderBy("window_start").collect()
    assert(out.length === 2)
    assert(!out(1).getBoolean(10))
    assert(out(1).getDouble(6) === -1.0 && out(1).getDouble(9) === -1.0)
    // census refusal
    intercept[IllegalArgumentException](EventStream.windowedCuped(
      oneWin.select(col("ts"), col("arm"), lit(Double.NaN).as("y"),
        col("x")), "arm", "arm0", "arm1", "y", "x"))
  }

  test("windowedCuped unitCol: single-window equality to the batch unit path; poisoned unit refuses") {
    import spark.implicits._
    // 2 events per unit, 3 units per arm, one hour
    val rows = (0 until 12).map { i =>
      val unit = (i / 2).toLong
      val arm = s"arm${unit % 2}"
      (100L + i, arm, unit, (i % 5).toDouble / 4.0 + (unit % 2) * 0.5,
        (i % 3).toDouble / 2.0)
    }
    val oneWin = rows.toDF("sec", "arm", "u", "y", "x")
      .select(expr("timestamp_seconds(sec)").as("ts"), col("arm"),
        col("u"), col("y"), col("x"))
    val w = EventStream.windowedCuped(oneWin, "arm", "arm0", "arm1",
      "y", "x", unitCol = Some("u")).head()
    val b = graft.ops.Classifier.cupedDelta(
      rows.map(t => (t._2, t._3, t._4, t._5)).toDF("arm", "u", "y", "x"),
      "arm", "arm0", "arm1", "y", "x", unitCol = Some("u")).head()
    assert(w.getLong(1) === b.getLong(0) && w.getLong(2) === b.getLong(1))
    assert(w.getLong(1) === 3L) // units, not the 6 events
    for ((wi, bi) <- Seq(3 -> 2, 4 -> 3, 5 -> 4, 6 -> 5, 7 -> 6,
        8 -> 7, 9 -> 8))
      assert(math.abs(w.getDouble(wi) - b.getDouble(bi)) < 1e-8,
        s"windowed($wi)=${w.getDouble(wi)} batch($bi)=${b.getDouble(bi)}")
    assert(w.getBoolean(10))
    // a bad row poisons its unit and the monitor refuses in units
    val ex = intercept[IllegalArgumentException](
      EventStream.windowedCuped(
        oneWin.select(col("ts"), col("arm"), col("u"),
          when(col("u") === 0L, lit(Double.NaN)).otherwise(col("y"))
            .as("y"), col("x")),
        "arm", "arm0", "arm1", "y", "x", unitCol = Some("u")))
    assert(ex.getMessage.contains("unit"))
  }

  test("windowedAbMixtureSprt: hand log-lambda, balanced arms never reject, crossing monotone in lift, one-arm start sentinel, refusals") {
    import spark.implicits._
    def mk(hours: Seq[Seq[(String, Double)]]) =
      hours.zipWithIndex.flatMap { case (xs, h) =>
        xs.map { case (a, v) => (h * 3600L, a, v) } }
        .toDF("sec", "arm", "y")
        .select(expr("timestamp_seconds(sec)").as("ts"), col("arm"),
          col("y"))
    def sprt(hours: Seq[Seq[(String, Double)]],
             s2: Option[Double] = Some(0.25), t2: Double = 1.0) =
      EventStream.windowedAbMixtureSprt(mk(hours), "arm", "a", "b",
        "y", s2, t2).orderBy("window_start").collect()
    // hand case after window 2: na = 2, nb = 2, sa = 1, sb = 2 ->
    // d = .5, V = .25(.5 + .5) = .25
    val out = sprt(Seq(
      Seq(("a", 0.5), ("b", 1.0)), Seq(("a", 0.5), ("b", 1.0))))
    def handLl(d: Double, v: Double) = graft.ops.Num.round9(
      0.5 * math.log(v / (v + 1.0))
        + (d * d * 1.0) / (2.0 * v * (v + 1.0)))
    assert(out(1).getLong(2) === 2L && out(1).getLong(3) === 2L)
    assert(out(1).getDouble(4) === 0.5)
    assert(out(1).getDouble(5) === 0.25) // var_used = the constant
    assert(out(1).getDouble(6) === handLl(0.5, 0.25))
    assert(out(1).getDouble(7) === graft.ops.Num.round9(
      math.min(1.0, math.exp(0.0 - handLl(0.5, 0.25)))))
    // identical arms: Lambda shrinks below 1 — never rejects, p = 1
    val same = sprt(Seq.fill(20)(Seq(("a", 0.5), ("b", 0.5),
      ("a", 0.25), ("b", 0.25))))
    assert(same.forall(!_.getBoolean(8)))
    assert(same.last.getDouble(7) === 1.0)
    // crossing time monotone in the lift
    def firstReject(lift: Double): Int =
      sprt(Seq.fill(40)(Seq.fill(3)(("a", 0.5))
        ++ Seq.fill(3)(("b", 0.5 + lift))))
        .indexWhere(_.getBoolean(8))
    val (slow, fast) = (firstReject(0.25), firstReject(0.5))
    assert(slow > 0 && fast >= 0 && fast <= slow)
    // a stream that STARTS one-armed: sentinel rows until both arms
    // have cumulative traffic, decidable forever after
    val oneArm = sprt(Seq(Seq(("a", 0.5)), Seq(("a", 0.5), ("b", 1.0))))
    assert(!oneArm(0).getBoolean(9) && oneArm(0).getDouble(6) === -1.0)
    assert(oneArm(1).getBoolean(9))
    // PLUG-IN variance: hand pooled s² on a 2+2 window — per arm
    // Σx², s² = (xa + xb − sa²/na − sb²/nb)/(na+nb−2); thin windows
    // (n < 2 per arm) stay sentinel until the variance exists
    val plug = EventStream.windowedAbMixtureSprt(
      mk(Seq(Seq(("a", 0.0), ("a", 1.0), ("b", 1.0), ("b", 2.0)))),
      "arm", "a", "b", "y", None, 1.0).collect()
    // xa = 1, xb = 5, sa = 1, sb = 3 -> s² = (6 − .5 − 4.5)/2 = .5
    assert(plug(0).getBoolean(9))
    assert(plug(0).getDouble(5) === 0.5)
    assert(plug(0).getDouble(6) === handLl(1.0, 0.5))
    val thin = EventStream.windowedAbMixtureSprt(
      mk(Seq(Seq(("a", 0.5), ("b", 1.0)),
        Seq(("a", 0.0), ("b", 2.0)))),
      "arm", "a", "b", "y", None, 1.0)
      .orderBy("window_start").collect()
    assert(!thin(0).getBoolean(9) && thin(0).getDouble(6) === -1.0)
    assert(thin(1).getBoolean(9)) // cumulative 2 per arm now
    // refusals: same arms, bad sigma2/tau2/alpha, NaN census
    intercept[IllegalArgumentException](
      EventStream.windowedAbMixtureSprt(mk(Seq(Seq(("a", 1.0)))),
        "arm", "a", "a", "y", Some(0.25), 1.0))
    intercept[IllegalArgumentException](
      sprt(Seq(Seq(("a", 1.0))), s2 = Some(0.0)))
    intercept[IllegalArgumentException](
      sprt(Seq(Seq(("a", 1.0))), t2 = 0.0))
    intercept[IllegalArgumentException](
      EventStream.windowedAbMixtureSprt(mk(Seq(Seq(("a", 1.0)))),
        "arm", "a", "b", "y", Some(0.25), 1.0, alpha = 0.6))
    intercept[IllegalArgumentException](
      sprt(Seq(Seq(("a", Double.NaN), ("b", 1.0)))))
  }

  test("windowedAbMixtureSprt unitCol: unit totals are the observations; the iid-row path overstates the evidence; singleton units equal the row path; poisoned unit refuses") {
    import spark.implicits._
    def mk(rows: Seq[(String, Long, Double)]) =
      rows.map { case (a, u, v) => (100L, a, u, v) }
        .toDF("sec", "arm", "u", "y")
        .select(expr("timestamp_seconds(sec)").as("ts"), col("arm"),
          col("u"), col("y"))
    // 2 units per arm, 2 events each: unit totals a = (0, 1),
    // b = (1, 2) — the windowedAbMixtureSprt plug-in hand case
    val events = Seq(
      ("a", 1L, 0.0), ("a", 1L, 0.0), ("a", 2L, 0.5), ("a", 2L, 0.5),
      ("b", 3L, 0.5), ("b", 3L, 0.5), ("b", 4L, 1.0), ("b", 4L, 1.0))
    val unit = EventStream.windowedAbMixtureSprt(mk(events), "arm",
      "a", "b", "y", None, 1.0, unitCol = Some("u")).head()
    def handLl(d: Double, v: Double) = graft.ops.Num.round9(
      0.5 * math.log(v / (v + 1.0))
        + (d * d * 1.0) / (2.0 * v * (v + 1.0)))
    assert(unit.getLong(2) === 2L && unit.getLong(3) === 2L) // units
    assert(unit.getDouble(4) === 1.0)        // delta of unit totals
    assert(unit.getDouble(5) === 0.5)        // between-unit s²
    assert(unit.getDouble(6) === handLl(1.0, 0.5))
    // the iid-row path on the SAME stream sees 4 "independent" rows
    // per arm and a smaller V — MORE evidence than the units justify
    // (the anti-conservative boundary the unit path fixes)
    val iid = EventStream.windowedAbMixtureSprt(mk(events), "arm",
      "a", "b", "y", None, 1.0).head()
    assert(iid.getLong(2) === 4L)
    assert(iid.getDouble(6) > unit.getDouble(6))
    // singleton units: the unit path IS the row path, column for
    // column
    val single = events.zipWithIndex.map { case ((a, _, v), i) =>
      (a, 100L + i, v) }
    val su = EventStream.windowedAbMixtureSprt(mk(single), "arm",
      "a", "b", "y", None, 1.0, unitCol = Some("u")).head()
    val sr = EventStream.windowedAbMixtureSprt(mk(single), "arm",
      "a", "b", "y", None, 1.0).head()
    for (i <- 1 until sr.length)
      assert(su.get(i) === sr.get(i), s"column $i")
    // a bad row poisons its unit; the refusal speaks in units
    val ex = intercept[IllegalArgumentException](
      EventStream.windowedAbMixtureSprt(
        mk(events.updated(0, ("a", 1L, Double.NaN))), "arm", "a", "b",
        "y", None, 1.0, unitCol = Some("u")))
    assert(ex.getMessage.contains("unit"))
  }

  test("windowedRatioDelta: single-window equality to batch ratioMetricDelta; thin/zero-exposure windows sentinel; poisoned unit refuses") {
    import spark.implicits._
    def mk(rows: Seq[(Long, String, Long, Double, Double)]) =
      rows.toDF("sec", "arm", "u", "y", "d")
        .select(expr("timestamp_seconds(sec)").as("ts"), col("arm"),
          col("u"), col("y"), col("d"))
    // the batch hand case as one window: a units (1,4),(3,4); b units
    // (2,4),(4,4) — each unit split into two half-rows
    val rows = Seq(
      (100L, "a", 1L, 0.5, 2.0), (101L, "a", 1L, 0.5, 2.0),
      (102L, "a", 2L, 1.5, 2.0), (103L, "a", 2L, 1.5, 2.0),
      (104L, "b", 3L, 1.0, 2.0), (105L, "b", 3L, 1.0, 2.0),
      (106L, "b", 4L, 2.0, 2.0), (107L, "b", 4L, 2.0, 2.0))
    val w = EventStream.windowedRatioDelta(mk(rows), "arm", "a", "b",
      "y", "d", "u").head()
    val b = graft.ops.Classifier.ratioMetricDelta(
      rows.map(t => (t._2, t._3, t._4, t._5)).toDF("arm", "u", "y", "d"),
      "arm", "a", "b", "y", "d", "u").head()
    // windowed (n_a..p_value at 1..8) vs batch (n_a..p_value at 0..7)
    // — the same single-sourced chain, so exact
    assert(w.getLong(1) === b.getLong(0) && w.getLong(2) === b.getLong(1))
    for ((wi, bi) <- Seq(3 -> 2, 4 -> 3, 5 -> 4, 6 -> 5, 7 -> 6))
      assert(w.getDouble(wi) === b.getDouble(bi),
        s"windowed($wi)=${w.getDouble(wi)} batch($bi)=${b.getDouble(bi)}")
    assert(math.abs(w.getDouble(8) - b.getDouble(7)) < 1e-9)
    assert(w.getBoolean(9))
    assert(w.getDouble(3) === 0.5 && w.getDouble(4) === 0.75)
    // a later hour with ONE unit in an arm: sentinel, never dark
    val thin = EventStream.windowedRatioDelta(
      mk(rows ++ Seq((3700L, "a", 9L, 1.0, 2.0),
        (3701L, "b", 10L, 1.0, 2.0), (3702L, "b", 11L, 2.0, 2.0))),
      "arm", "a", "b", "y", "d", "u")
      .orderBy("window_start").collect()
    assert(thin.length === 2 && !thin(1).getBoolean(9))
    assert(thin(1).getDouble(5) === -1.0)
    // a window whose arm has ZERO total exposure: no ratio — sentinel
    val zeroD = EventStream.windowedRatioDelta(
      mk(rows.map { case (s, a, u, y, d) =>
        if (a == "a") (s, a, u, 0.0, 0.0) else (s, a, u, y, d) }),
      "arm", "a", "b", "y", "d", "u").head()
    assert(!zeroD.getBoolean(9))
    // a negative denominator row poisons its unit and refuses
    val ex = intercept[IllegalArgumentException](
      EventStream.windowedRatioDelta(
        mk(rows.updated(0, (100L, "a", 1L, 0.5, -1.0))), "arm", "a",
        "b", "y", "d", "u"))
    assert(ex.getMessage.contains("unit"))
  }

  test("windowedEbRates: single-window equality to batch empiricalBayesRates; one-slice window sentinels; refusal") {
    import spark.implicits._
    def mk(rows: Seq[(Long, String, Int)]) =
      rows.toDF("sec", "slice", "succ")
        .select(expr("timestamp_seconds(sec)").as("ts"), col("slice"),
          col("succ"))
    // the batch hand case in one window: g1 = 4 trials 2 successes,
    // g2 = 2 trials 2 successes
    val rows = Seq((100L, "g1", 1), (101L, "g1", 1), (102L, "g1", 0),
      (103L, "g1", 0), (104L, "g2", 1), (105L, "g2", 1))
    val w = EventStream.windowedEbRates(mk(rows), "slice", "succ")
      .orderBy("slice").collect()
    val b = graft.ops.Classifier.empiricalBayesRates(
      rows.map(t => (t._2, t._3)).toDF("slice", "succ"),
      "slice", "succ").orderBy("slice").collect()
    assert(w.length === 2)
    // windowed (slice..shrunk_rate at 1..6) vs batch (0..5) — the
    // operand-for-operand mirror makes this EXACT, not approximate
    for ((wr, br) <- w.zip(b); i <- 0 until br.length)
      assert(wr.get(i + 1) === br.get(i), s"column $i")
    assert(w.forall(_.getBoolean(7)))
    // an hour with ONE slice: no between-slice variance — sentinel
    // shrink columns, real rate, decidable = false
    val oneSlice = EventStream.windowedEbRates(
      mk(rows ++ Seq((3700L, "g1", 1), (3701L, "g1", 0))),
      "slice", "succ").orderBy("window_start", "slice").collect()
    assert(oneSlice.length === 3)
    assert(!oneSlice(2).getBoolean(7))
    assert(oneSlice(2).getDouble(5) === -1.0
      && oneSlice(2).getDouble(6) === -1.0)
    assert(oneSlice(2).getDouble(4) === 0.5) // the rate still reports
    // census refusal: a non-binary success anywhere
    intercept[IllegalArgumentException](EventStream.windowedEbRates(
      mk(Seq((100L, "g1", 3), (101L, "g2", 1))), "slice", "succ"))
  }

  test("windowedSrm: single-window equality to batch srmCheck; a broken hour flags alone; undeclared arm refuses") {
    import spark.implicits._
    def mk(hours: Seq[Seq[String]]) =
      hours.zipWithIndex.flatMap { case (arms, h) =>
        arms.map(a => (h * 3600L, a)) }
        .toDF("sec", "arm")
        .select(expr("timestamp_seconds(sec)").as("ts"), col("arm"))
    // single window, 60/40 on a 50/50 design: the window row must
    // equal the batch srmCheck verdict column for column (the
    // single-sourcing pin: srmAggExprs/srmStatCols are shared)
    val split = Seq.fill(60)("a") ++ Seq.fill(40)("b")
    val w = EventStream.windowedSrm(mk(Seq(split)), "arm",
      Seq("a" -> 0.5, "b" -> 0.5), alpha = 0.05).head()
    val b = graft.ops.Classifier.srmCheck(split.toDF("arm"), "arm",
      Seq("a" -> 0.5, "b" -> 0.5), alpha = 0.05).head()
    // windowed (n, chi2, df, p, srm at 1..5) vs batch globals (5..9)
    assert(w.getLong(1) === b.getLong(5))
    assert(w.getDouble(2) === b.getDouble(6))
    assert(w.getInt(3) === b.getInt(7))
    assert(w.getDouble(4) === b.getDouble(8))
    assert(w.getBoolean(5) === b.getBoolean(9))
    // hour 0 healthy, hour 1 breaks 90/10: only hour 1 fires, the
    // monitor catches the regression THE HOUR it appears
    val stream = mk(Seq(
      Seq.fill(50)("a") ++ Seq.fill(50)("b"),
      Seq.fill(90)("a") ++ Seq.fill(10)("b")))
    val out = EventStream.windowedSrm(stream, "arm",
      Seq("a" -> 0.5, "b" -> 0.5)).orderBy("window_start").collect()
    assert(!out(0).getBoolean(5))
    assert(out(1).getDouble(2) === 64.0) // (40² + 40²)/50
    assert(out(1).getBoolean(5))
    // an undeclared arm anywhere refuses the whole monitor
    intercept[IllegalArgumentException](EventStream.windowedSrm(
      mk(Seq(Seq("a", "b", "c"))), "arm",
      Seq("a" -> 0.5, "b" -> 0.5)))
    // design validation mirrors the batch check
    intercept[IllegalArgumentException](EventStream.windowedSrm(
      mk(Seq(Seq("a"))), "arm", Seq("a" -> 0.7, "b" -> 0.2)))
  }

  test("windowedAb: single-window equality to batch mcnemarTest; degenerate; refusal") {
    import spark.implicits._
    val rows = (0 until 200).map { i =>
      (3600L + i, ((i * 7) % 3).toString, ((i * 11) % 3).toString,
        ((i * 13) % 3).toString)
    }
    val df = rows.toDF("sec", "y", "a", "b")
      .select(expr("timestamp_seconds(sec)").as("ts"),
        col("y"), col("a"), col("b"))
    val w = EventStream.windowedAb(df, "y", "a", "b", "1 hour").head()
    val m = graft.ops.Classifier.mcnemarTest(
      df.select("y", "a", "b"), "y", "a", "b").head()
    // same math, windowed: every column of the batch operator must match
    assert(w.getLong(1) === m.getLong(0))
    assert(w.getDouble(2) === m.getDouble(1))
    assert(w.getDouble(3) === m.getDouble(2))
    assert(w.getLong(4) === m.getLong(3))
    assert(w.getLong(5) === m.getLong(4))
    assert(math.abs(w.getDouble(6) - m.getDouble(5)) < 1e-9)
    assert(math.abs(w.getDouble(7) - m.getDouble(6)) < 1e-9)
    // models that never disagree: a monitor must keep emitting —
    // statistic 0, p-value exactly 1 after the clamp
    val same = rows.map { case (s2, y, a, _) => (s2, y, a, a) }
      .toDF("sec", "y", "a", "b")
      .select(expr("timestamp_seconds(sec)").as("ts"),
        col("y"), col("a"), col("b"))
    val s0 = EventStream.windowedAb(same, "y", "a", "b", "1 hour").head()
    assert(s0.getDouble(6) === 0.0 && s0.getDouble(7) === 1.0)
    val withNull = (rows.take(5).map { case (s2, _, a, b) =>
      (s2, null: String, a, b) } ++ rows.drop(5))
      .toDF("sec", "y", "a", "b")
      .select(expr("timestamp_seconds(sec)").as("ts"),
        col("y"), col("a"), col("b"))
    intercept[IllegalArgumentException](
      EventStream.windowedAb(withNull, "y", "a", "b", "1 hour").count())
  }

  test("windowed eval monitor runs via foreachBatch (stream equals batch)") {
    // streaming parity for the EVALUATION leg: the per-window binned
    // AUC + ECE monitor is a (window, bin) hash aggregate, so running
    // it per micro-batch via foreachBatch equals the batch computation
    // whenever micro-batches align to completed windows — exactly the
    // completed-window contract a quality monitor reports under (the
    // typeDrift discipline). The stream is chopped so every hour lands
    // wholly inside one micro-batch.
    val dir = sf("sf0.001")
    val ev = EventStream.loadEvents(spark, dir)
    val m = (col("user_id") % 2) * 300 +
      pmod(col("user_id") * 37 + 11, lit(700))
    val scored = ev.select(col("ts"),
      (m.cast("double") / 1024.0).as("score"),
      (col("user_id") % 2).cast("double").as("label"))
    val dDir = "/root/repo/target/test_stream_eval_in"
    val outDir = "/root/repo/target/test_stream_eval_out"
    // hash the hour id into 4 partitions: each hour's rows land whole
    // in one file, 4 files + maxFilesPerTrigger=1 → 4 real micro-batches
    scored
      .repartition(4, (unix_timestamp(col("ts")) / 3600).cast("long"))
      .write.mode("overwrite").parquet(dDir)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(outDir))
    val stream = spark.readStream.schema(scored.schema)
      .option("maxFilesPerTrigger", "1").parquet(dDir)
    val q = stream.writeStream.foreachBatch {
      (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        EventStream.windowedEval(batch.toDF(), "score", "label",
            "1 hour", bins = 8)
          .write.mode("append").parquet(outDir)
    }.start()
    q.processAllAvailable(); q.stop()
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getTimestamp(0).getTime, r.getLong(1),
        Option(r.get(2)).map(_.toString), r.getDouble(3)))
      .toSeq.sortBy(t => (t._1, t._2))
    val streamed = key(spark.read.parquet(outDir))
    val batch = key(EventStream.windowedEval(scored, "score", "label",
      "1 hour", bins = 8))
    assert(streamed === batch)
    assert(streamed.nonEmpty)
    // and at least one window actually discriminates (auc defined > .5)
    assert(streamed.exists(_._3.exists(_.toDouble > 0.5)))
  }

  test("windowed A/B monitor runs via foreachBatch (stream equals batch)") {
    // windowedAb is a pure (window) aggregate, so per-micro-batch
    // foreachBatch over window-aligned batches equals the batch run —
    // the same completed-window contract as windowedEval
    val dir = sf("sf0.001")
    val ev = EventStream.loadEvents(spark, dir)
    val scored = ev.select(col("ts"),
      ((col("user_id") * 7) % 3).cast("string").as("y"),
      ((col("user_id") * 11) % 3).cast("string").as("a"),
      ((col("user_id") * 13) % 3).cast("string").as("b"))
    val dDir = "/root/repo/target/test_stream_ab_in"
    val outDir = "/root/repo/target/test_stream_ab_out"
    scored
      .repartition(4, (unix_timestamp(col("ts")) / 3600).cast("long"))
      .write.mode("overwrite").parquet(dDir)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(outDir))
    val stream = spark.readStream.schema(scored.schema)
      .option("maxFilesPerTrigger", "1").parquet(dDir)
    val q = stream.writeStream.foreachBatch {
      (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        EventStream.windowedAb(batch.toDF(), "y", "a", "b", "1 hour")
          .write.mode("append").parquet(outDir)
    }.start()
    q.processAllAvailable(); q.stop()
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getTimestamp(0).getTime, r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getLong(4), r.getLong(5), r.getDouble(6),
        r.getDouble(7)))
      .toSeq.sortBy(_._1)
    val streamed = key(spark.read.parquet(outDir))
    val batch = key(EventStream.windowedAb(scored, "y", "a", "b", "1 hour"))
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }

  test("PCA whitening projection runs inside a real stream (Expression path)") {
    // the projection is a scan-side AffineProject expression, so a
    // batch-fitted basis whitens an ingest stream with exact batch parity
    val dir = sf("sf0.001")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "embedding")
    val m = graft.ops.Pca.fitPca(emb, "embedding", k = 8)
    val dDir = "/root/repo/target/test_stream_pca"
    emb.write.mode("overwrite").parquet(dDir)
    val stream = spark.readStream.schema(emb.schema).parquet(dDir)
    val proj = graft.ops.Pca.projectPca(stream, "embedding", "vec_id", m,
      whiten = true)
    EventStream.runToMemory(proj, "pca_out", mode = "append")
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getSeq[Double](1).mkString(","))
    val streamed = spark.table("pca_out").collect().map(key).toSeq.sorted
    val batch = graft.ops.Pca.projectPca(emb, "embedding", "vec_id", m,
        whiten = true)
      .collect().map(key).toSeq.sorted
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }

  test("ingest-gate signals run inside a real stream (r12 scan-side ops)") {
    // compressibility, script fractions, canonical URL, HTML strip, and
    // media sniff are all scan-side projections — an INGEST stream can
    // gate on them before anything lands, with exact batch parity
    import org.apache.spark.sql.functions._
    import graft.ops.{Multimodal, TextAnalysis}
    val dir = sf("sf0.001")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").limit(50)
    val dDir = "/root/repo/target/test_stream_gate_docs"
    docs.write.mode("overwrite").parquet(dDir)
    def gates(df: org.apache.spark.sql.DataFrame) = {
      val url = concat(lit("HTTP://A"), col("doc_id").cast("string"),
        lit(".COM:80/p?utm_source=s&k="), col("doc_id").cast("string"))
      val fracs = TextAnalysis.scriptFracs(col("text")).map {
        case (n, c) => round(c, 6).as(s"${n}_frac") }
      df.select((Seq(col("doc_id"),
        round(TextAnalysis.compressionRatio(col("text")), 6).as("ratio"),
        TextAnalysis.canonicalUrl(url).as("canon"),
        TextAnalysis.stripHtml(concat(lit("<p>"), col("text"), lit("</p>")))
          .as("stripped"),
        Multimodal.sniffMedia(encode(col("text"), "UTF-8"))("format")
          .as("fmt")) ++ fracs): _*)
    }
    val stream = spark.readStream.schema(docs.schema).parquet(dDir)
    EventStream.runToMemory(gates(stream), "gate_out", mode = "append")
    val streamed = spark.table("gate_out").collect()
      .map(_.toSeq.mkString("|")).sorted.toSeq
    val batch = gates(docs).collect().map(_.toSeq.mkString("|")).sorted.toSeq
    assert(streamed === batch)
    assert(streamed.size === 50)
  }

  test("vocab coverage aggregates inside a real stream (complete mode parity)") {
    // the OOV audit is a streaming aggregation: per-source running
    // token/OOV counts update as document batches arrive — exact batch
    // parity once the stream drains (complete output mode)
    import graft.ops.TextAnalysis
    val dir = sf("sf0.001")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("source", "text").limit(60)
    val dDir = "/root/repo/target/test_stream_vocab_docs"
    docs.repartition(3).write.mode("overwrite").parquet(dDir)
    val vocab = Seq("the", "a", "of", "and", "to")
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1").parquet(dDir)
    EventStream.runToMemory(
      TextAnalysis.vocabCoverage(stream, "text", "source", vocab),
      "vocab_cov_out", mode = "complete")
    val streamed = spark.table("vocab_cov_out").collect()
      .map(_.toSeq.mkString("|")).sorted.toSeq
    val batch = TextAnalysis.vocabCoverage(docs, "text", "source", vocab)
      .collect().map(_.toSeq.mkString("|")).sorted.toSeq
    assert(streamed === batch && streamed.nonEmpty)
  }

  test("chat rendering aggregates inside a real stream (complete mode parity)") {
    // renderChat is one conversation-keyed aggregation (collect + in-agg
    // sort + fold), so it runs as a streaming aggregation too: rendered
    // conversations re-emit as turn batches arrive and reach exact batch
    // parity once the stream drains — the SFT-assembly-over-a-live-feed
    // path
    import graft.ops.Sft
    val dir = sf("sf0.001")
    val docs = spark.read.parquet(s"$dir/documents.parquet").limit(72)
    val turns = docs.selectExpr("CAST(doc_id AS BIGINT) % 6 AS conv",
      "CAST(doc_id AS BIGINT) AS ord",
      "CASE WHEN (CAST(doc_id AS BIGINT) div 6) % 2 = 0 THEN 'user' " +
        "ELSE 'assistant' END AS role", "text")
    val dDir = "/root/repo/target/test_stream_chat_turns"
    turns.repartition(3).write.mode("overwrite").parquet(dDir)
    val stream = spark.readStream.schema(turns.schema)
      .option("maxFilesPerTrigger", "1").parquet(dDir)
    EventStream.runToMemory(
      Sft.renderChat(stream, "conv", "ord", "role", "text"),
      "chat_out", mode = "complete")
    val streamed = spark.table("chat_out").collect()
      .map(_.toSeq.mkString("|")).sorted.toSeq
    val batch = Sft.renderChat(turns, "conv", "ord", "role", "text")
      .collect().map(_.toSeq.mkString("|")).sorted.toSeq
    assert(streamed === batch && streamed.size === 6)
  }

  test("flatMapGroupsWithState sessionization emits closed sessions") {
    import spark.implicits._
    def ts(s: Long) = new java.sql.Timestamp(s * 1000)
    val evs = Seq(
      EventStream.Ev(1L, ts(0), 1.0), EventStream.Ev(1L, ts(60), 2.0),
      EventStream.Ev(1L, ts(10000), 5.0), // gap > 30 min closes session 1
      EventStream.Ev(2L, ts(0), 7.0)
    ).toDS()
    val out = EventStream.sessionize(evs, gapMs = 1800 * 1000).collect()
    // only user 1's first session is closed by a later event
    assert(out.length === 1)
    assert(out.head.user_id === 1L && out.head.n === 2 && out.head.total === 3.0)
  }
}
