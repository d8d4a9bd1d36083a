package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog", "en"),
    (1L, "the quick brown fox jumps over the lazy dog", "en"), // exact dup
    (2L, "the quick brown fox jumps over a lazy dog", "en"),   // near dup
    (3L, "completely different content about spark engines", "en"),
    (4L, "", "en")
  ).toDF("doc_id", "text", "lang")

  test("exact dedup keeps min id and counts copies") {
    val out = Dedup.exact(docs, "text", "doc_id")
      .orderBy("doc_id").collect()
    val dup = out.find(_.getLong(0) == 0L).get
    assert(dup.getLong(1) === 2L)
    assert(Dedup.exactKeepFirst(docs, "text", "doc_id").count() === 4)
  }

  test("band-join size-ratio prune is lossless: verified pairs identical to unpruned") {
    val corpus = spark.read.parquet(s"${sf()}/documents.parquet")
    val sh = Dedup.shingleFrame(corpus, "text", "doc_id", Nil, 3)
      .repartition(col("doc_id"))
    val all = Dedup.minHashCandidatesFromShingles(sh, "doc_id", 32, 8,
      maxBucket = 1000)
    val pruned = Dedup.minHashCandidatesFromShingles(sh, "doc_id", 32, 8,
      maxBucket = 1000, sizeRatio = 0.6)
    // prune only removes candidates, never invents them
    assert(pruned.except(all).count() === 0)
    // no pair that verifies at jaccard >= 0.6 is lost: verify the FULL
    // candidate set by exact jaccard and compare to the pruned pipeline
    val ground = all
      .join(sh.toDF("id_a", "sh_a"), "id_a")
      .join(sh.toDF("id_b", "sh_b"), "id_b")
      .filter(Dedup.jaccardCol(col("sh_a"), col("sh_b")) >= 0.6)
      .select("id_a", "id_b")
    val got = Dedup.minHashDedup(corpus, "text", "doc_id", threshold = 0.6)
      .select("id_a", "id_b")
    assert(got.except(ground).count() === 0)
    assert(ground.except(got).count() === 0)
  }

  test("duplicate span stats count cross-doc n-token windows") {
    // 3-token windows: docs 0 and 1 are identical (7 windows each, all
    // duplicated); doc 2 shares windows with 0/1 everywhere except around
    // the "a" substitution ("over a lazy"/"a lazy dog"/"the lazy dog" flip);
    // doc 3 shares nothing; doc 4 has no window at all
    val out = Dedup.duplicateSpanStats(docs, "text", "doc_id", n = 3)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out(0) === ((0L, 7L, 7L, 1.0)))
    assert(out(1) === ((1L, 7L, 7L, 1.0)))
    // doc 2 shares the first 4 windows; "jumps over a" / "over a lazy" /
    // "a lazy dog" are unique to it
    assert(out(2) === ((2L, 7L, 4L, round5(4.0 / 7))))
    assert(out(3) === ((3L, 4L, 0L, 0.0)))
    assert(out(4)._3 === 0L)
  }

  private def round5(x: Double) = math.round(x * 1e6) / 1e6

  test("minhash LSH finds the exact and near duplicate pair") {
    // word 1-shingles: jaccard(0,2) = 8/9 ≈ 0.89 — well inside LSH recall
    val pairs = Dedup.minHashDedup(docs, "text", "doc_id", threshold = 0.5,
        shingleWords = 1)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)))
    assert(pairs.contains((0L, 2L)) && pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("lshParams: S-curve optimum over divisor pairs, property-checked") {
    // independent cost recomputation (trapezoid rule, different step
    // count than the implementation's midpoint) — the returned pair must
    // be a divisor split and no other divisor pair may cost less
    def cost(b: Int, r: Int, t: Double, fpW: Double, fnW: Double): Double = {
      def p(s: Double) = 1.0 - math.pow(1.0 - math.pow(s, r), b)
      val n = 4000
      def integ(lo: Double, hi: Double, f: Double => Double): Double = {
        val dx = (hi - lo) / n
        (0 until n).map(i => (f(lo + i * dx) + f(lo + (i + 1) * dx)) / 2 * dx).sum
      }
      fpW * integ(0, t, p) + fnW * integ(t, 1, s => 1 - p(s))
    }
    for (t <- Seq(0.3, 0.5, 0.6, 0.8, 0.9); sigLen <- Seq(16, 32, 64, 100)) {
      val (b, r) = Dedup.lshParams(t, sigLen)
      assert(b * r === sigLen, s"t=$t k=$sigLen -> ($b,$r)")
      val best = cost(b, r, t, 0.5, 0.5)
      for (bb <- 1 to sigLen if sigLen % bb == 0) {
        val other = cost(bb, sigLen / bb, t, 0.5, 0.5)
        assert(best <= other + 1e-6,
          s"t=$t k=$sigLen: ($b,$r) cost $best beaten by ($bb,${sigLen / bb}) $other")
      }
    }
    // known values (hand-checked S-curve): the gated query's regime keeps
    // the historical default, higher thresholds move to taller curves
    assert(Dedup.lshParams(0.6, 32) === ((8, 4)))
    assert(Dedup.lshParams(0.8, 32) === ((4, 8)))
    // rows-per-band is monotone non-decreasing in the threshold
    val rs = Seq(0.2, 0.4, 0.6, 0.8, 0.95).map(t => Dedup.lshParams(t, 64)._2)
    assert(rs === rs.sorted, s"rows-per-band not monotone in threshold: $rs")
    // FP-averse weighting never loosens the curve (rows per band cannot drop)
    assert(Dedup.lshParams(0.6, 32, fpWeight = 0.9, fnWeight = 0.1)._2 >=
      Dedup.lshParams(0.6, 32, fpWeight = 0.1, fnWeight = 0.9)._2)
  }

  test("ngram jaccard pairs are exact and blocked") {
    // 3-gram shingles: jaccard(0,1) = 1.0 (exact dup), jaccard(0,2) = 4/10
    val pairs = Dedup.ngramJaccardPairs(docs, "text", "doc_id",
      Seq("lang"), n = 3, threshold = 0.3)
    val m = pairs.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(m((0L, 1L)) === 1.0)
    assert(m((0L, 2L)) === 0.4)
  }

  test("char shingles: correct n-grams, distinct") {
    val df = Seq((0L, "abcab")).toDF("id", "t")
    val sh = df.select(Dedup.charShingles(col("t"), 3).as("s"))
      .head().getSeq[String](0).toSet
    assert(sh === Set("abc", "bca", "cab"))
    // n > length degenerates to the whole (short) string
    val short = Seq((0L, "ab")).toDF("id", "t")
      .select(Dedup.charShingles(col("t"), 3)).head().getSeq[String](0)
    assert(short === Seq("ab"))
  }

  test("simhash: identical texts distance 0; different texts far") {
    val sigs = docs.filter(length(col("text")) > 0)
      .select(col("doc_id"), Dedup.simHash(col("text")).as("sig"))
      .as[(Long, Long)].collect().toMap
    assert(sigs(0L) === sigs(1L))
    val d03 = java.lang.Long.bitCount(sigs(0L) ^ sigs(3L))
    assert(d03 > 10)
  }

  test("keepRepresentatives keeps best-scored member per cluster") {
    val pairs = Seq((0L, 1L), (1L, 2L)).toDF("id_a", "id_b")
    // cluster {0,1,2}: texts 0/1 tie on length (exact dups) → lowest id 0
    // wins; doc 2 is shorter. 3 and 4 are untouched singletons.
    val kept = Dedup.keepRepresentatives(docs, pairs, "doc_id",
        length(col("text")))
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(0L, 3L, 4L))
    // score that prefers doc 2 ("a lazy dog" variant): highest doc_id wins
    val kept2 = Dedup.keepRepresentatives(docs, pairs, "doc_id",
        col("doc_id"))
      .select("doc_id").as[Long].collect().toSet
    assert(kept2 === Set(2L, 3L, 4L))
  }

  test("embedding near-dup with blocking") {
    val emb = Seq(
      (0L, Array(1f, 0f, 0f), 0), (1L, Array(0.99f, 0.1f, 0f), 0),
      (2L, Array(0f, 1f, 0f), 0), (3L, Array(1f, 0f, 0f), 1)
    ).toDF("id", "vec", "label")
    val pairs = Dedup.embeddingNearDup(emb, "vec", "id", 0.95, Seq("label"))
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs === Set((0L, 1L))) // 0-3 blocked apart by label
  }
}

/** Ingest-time dedup: a new batch checked against an existing corpus,
  * in three shapes — exact anti-join, corpus-rescan LSH, and the
  * precomputed-index variant that also runs on a readStream.
  */
class IncrementalDedupSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    (0L, "the quick brown fox jumps over the lazy dog"),
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over a lazy dog"),
    (3L, "completely different content about spark engines")
  ).toDF("doc_id", "text")

  private def batch = Seq(
    (10L, "the quick brown fox jumps over the lazy dog"), // exact dup of 0/1
    (11L, "the quick brown fox jumps over a lazy dog"),   // exact dup of 2
    (12L, "unrelated text entirely about something else") // genuinely new
  ).toDF("doc_id", "text")

  test("incrementalNew keeps only documents absent from the corpus") {
    val kept = Dedup.incrementalNew(batch, corpus, "text", "doc_id")
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(12L))
  }

  test("incrementalNearDup emits only batch-vs-corpus pairs above threshold") {
    val pairs = Dedup.incrementalNearDup(batch, corpus, "text", "doc_id",
        threshold = 0.5, shingleWords = 1)
      .select("id_new", "id_old").as[(Long, Long)].collect().toSet
    // word-unigram jaccard: 10 vs {0,1} = 1.0, 10 vs 2 = 8/9; 11 symmetric
    assert(pairs === Set((10L, 0L), (10L, 1L), (10L, 2L),
      (11L, 0L), (11L, 1L), (11L, 2L)))
    // no corpus-internal pair (0,1 are exact dups of each other) and no id 12
    assert(!pairs.exists(p => p._1 < 10L || p._2 >= 10L))
  }

  test("nearDupAgainstIndex batch output equals incrementalNearDup") {
    val idx = Dedup.nearDupIndex(corpus, "text", "doc_id", shingleWords = 1)
    val viaIdx = Dedup.nearDupAgainstIndex(batch, idx, "text", "doc_id",
        threshold = 0.5, shingleWords = 1)
      .as[(Long, Long, Double)].collect().toSet
    val direct = Dedup.incrementalNearDup(batch, corpus, "text", "doc_id",
        threshold = 0.5, shingleWords = 1)
      .as[(Long, Long, Double)].collect().toSet
    assert(viaIdx === direct && viaIdx.nonEmpty)
  }

  test("nearDupAgainstIndex runs as a real stream-static streaming query") {
    val dir = "/root/repo/target/test_stream_neardup"
    batch.write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(batch.schema).parquet(dir)
    val idx = Dedup.nearDupIndex(corpus, "text", "doc_id", shingleWords = 1)
      .localCheckpoint()
    val flagged = Dedup.nearDupAgainstIndex(stream, idx, "text", "doc_id",
      threshold = 0.5, shingleWords = 1)
    assert(flagged.isStreaming)
    graft.streaming.EventStream.runToMemory(flagged, "neardup_stream_out",
      mode = "append")
    val got = spark.table("neardup_stream_out")
      .select("id_new", "id_old").as[(Long, Long)].collect().toSet
    assert(got === Set((10L, 0L), (10L, 1L), (10L, 2L),
      (11L, 0L), (11L, 1L), (11L, 2L)))
  }

  test("streaming near-dup with eventTimeCol: watermark evicts pair state") {
    import java.sql.Timestamp
    val dir = "/root/repo/target/test_stream_neardup_wm"
    val fs = new java.io.File(dir)
    if (fs.exists()) fs.listFiles().foreach(_.delete())
    val idx = Dedup.nearDupIndex(corpus, "text", "doc_id", shingleWords = 1)
      .localCheckpoint()
    def micro(ids: Seq[Long], hour: Int) = ids.map(i =>
        (i, "the quick brown fox jumps over the lazy dog",
          Timestamp.valueOf(f"2026-01-01 $hour%02d:00:00")))
      .toDF("doc_id", "text", "ts")
    // batch 1 arrives at 00:00; batches 2 and 3 hours later — each
    // watermark advance (delay 10 min) expires the previous batch's
    // dedup state
    micro(Seq(10L), 0).write.mode("append").parquet(dir)
    val stream = spark.readStream.schema(micro(Seq(10L), 0).schema).parquet(dir)
    val flagged = Dedup.nearDupAgainstIndex(stream, idx, "text", "doc_id",
      threshold = 0.5, shingleWords = 1, eventTimeCol = Some("ts"))
    val q = flagged.writeStream.outputMode("append").format("memory")
      .queryName("neardup_wm_out").start()
    try {
      q.processAllAvailable()
      micro(Seq(11L), 3).write.mode("append").parquet(dir)
      q.processAllAvailable()
      micro(Seq(12L), 6).write.mode("append").parquet(dir)
      q.processAllAvailable()
      // every batch flagged against the 3 near-dup corpus docs
      val got = spark.table("neardup_wm_out")
        .select("id_new", "id_old").as[(Long, Long)].collect().toSet
      assert(got === (for (n <- 10L to 12L; o <- 0L to 2L) yield (n, o)).toSet)
      // state eviction happened: rows were removed from the dedup state
      // store as the watermark passed them (unbounded growth otherwise)
      val removed = q.recentProgress.flatMap(_.stateOperators)
        .map(_.numRowsRemoved).sum
      assert(removed > 0, "watermark never evicted dedup state")
      // and the final state holds at most the LAST batch's pairs, not all
      val finalState = q.recentProgress.flatMap(_.stateOperators)
        .lastOption.map(_.numRowsTotal).getOrElse(Long.MaxValue)
      assert(finalState <= 3, s"state not bounded: $finalState rows")
    } finally q.stop()
  }
}

class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  test("min-label propagation finds components incl. chains") {
    // chain 1-2-3-4 (diameter 3), pair (7,8), singleton edge (10,10 not given)
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (7L, 8L))
      .toDF("id_a", "id_b")
    val got = Dedup.connectedComponents(pairs, "id_a", "id_b")
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 7L -> 7L, 8L -> 7L))
  }

  test("clusters over real dup pairs pick min-id representatives") {
    val docs = Seq(
      (10L, "the quick brown fox jumps over the lazy dog"),
      (11L, "the quick brown fox jumps over the lazy dog"),
      (12L, "the quick brown fox jumps over a lazy dog"),
      (20L, "completely different content about spark engines"),
      (21L, "completely different content about spark engines"))
      .toDF("doc_id", "text")
    val pairs = Dedup.ngramJaccardPairs(docs, "text", "doc_id",
      blockCols = Nil, n = 1, threshold = 0.5)
    val reps = Dedup.connectedComponents(pairs, "id_a", "id_b")
      .as[(Long, Long)].collect().toMap
    assert(reps(11L) === 10L && reps(12L) === 10L && reps(21L) === 20L)
  }
}

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def emb = (0 until 50).map { i =>
    val v = Array.tabulate(8)(j => math.sin(i * 8 + j).toFloat)
    (i.toLong, v)
  }.toDF("id", "vec")

  test("brute-force top-k is exact, ranked, excludes self") {
    val out = Similarity.bruteForceTopK(
      emb.filter(col("id") < 3), emb, "id", "vec", "id", "vec", k = 4)
    val rows = out.collect()
    assert(rows.length === 12)
    assert(rows.forall(r => r.getLong(2) != r.getLong(0)))
    // ranks are 1..4 per query with non-increasing cosine
    val byQ = rows.groupBy(_.getLong(0))
    byQ.values.foreach { rs =>
      val sorted = rs.sortBy(_.getInt(1))
      assert(sorted.map(_.getInt(1)).toSeq === Seq(1, 2, 3, 4))
      val cos = sorted.map(_.getDouble(3))
      assert(cos.zip(cos.tail).forall { case (a, b) => a >= b })
    }
  }

  test("matryoshka truncation: prefix, unit norm, zero-safe, composes with top-k") {
    val t = Similarity.truncateEmbeddings(emb, "vec", dim = 4)
    val rows = t.collect().map(r =>
      r.getLong(0) -> r.getSeq[Double](1))
    rows.foreach { case (id, v) =>
      assert(v.length === 4, s"id $id")
      // unit L2 norm after renormalization
      assert(math.abs(v.map(x => x * x).sum - 1.0) < 1e-12, s"id $id")
      // direction preserved: proportional to the raw prefix
      val raw = emb.filter(col("id") === id).head().getSeq[Float](1)
        .take(4).map(_.toDouble)
      val scale = math.sqrt(raw.map(x => x * x).sum)
      v.zip(raw).foreach { case (a, b) =>
        assert(math.abs(a - b / scale) < 1e-9, s"id $id") }
    }
    // renormalize = false keeps the raw prefix values
    val plain = Similarity.truncateEmbeddings(emb, "vec", dim = 4,
      renormalize = false).head().getSeq[Double](1)
    assert(plain.length === 4)
    // zero vectors stay zero instead of NaN
    val z = Similarity.truncateEmbeddings(
      Seq((1L, Array(0f, 0f, 0f))).toDF("id", "vec"), "vec", dim = 2)
      .head().getSeq[Double](1)
    assert(z === Seq(0.0, 0.0))
    // a dim past the vector length keeps the full vector (no padding)
    val long = Similarity.truncateEmbeddings(emb, "vec", dim = 99)
      .head().getSeq[Double](1)
    assert(long.length === 8)
    // truncated brute-force top-k still finds mostly-true neighbors
    val full = Similarity.bruteForceTopK(
      emb.filter(col("id") < 4), emb, "id", "vec", "id", "vec", k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val q4 = Similarity.truncateEmbeddings(emb.filter(col("id") < 4), "vec", 4)
    val c4 = Similarity.truncateEmbeddings(emb, "vec", 4)
    val trunc = Similarity.bruteForceTopK(
      q4, c4, "id", "vec", "id", "vec", k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    assert((trunc intersect full).size >= 8,
      s"recall too low: ${(trunc intersect full).size}/20")
    intercept[IllegalArgumentException](
      Similarity.truncateEmbeddings(emb, "vec", dim = 0))
  }

  test("matryoshka cascade: refine recovers recall the raw truncation loses") {
    // these synthetic vectors are NOT MRL-trained, so the truncated
    // tier alone ranks poorly — the point of the cascade is that the
    // full-dim re-rank over a refine-widened shortlist wins it back
    def recallOf(res: org.apache.spark.sql.DataFrame, exact: Set[(Long, Long)]) =
      res.select("query_id", "neighbor_id").as[(Long, Long)]
        .collect().toSet.intersect(exact).size.toDouble / exact.size
    val exact = Similarity.bruteForceTopK(
      emb.filter(col("id") < 5), emb, "id", "vec", "id", "vec", k = 4)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val cascade = recallOf(Similarity.matryoshkaTopK(
      emb.filter(col("id") < 5), emb, "id", "vec", "id", "vec",
      k = 4, dim = 4, refine = 8), exact)
    val raw = recallOf(Similarity.bruteForceTopK(
      Similarity.truncateEmbeddings(emb.filter(col("id") < 5), "vec", 4),
      Similarity.truncateEmbeddings(emb, "vec", 4),
      "id", "vec", "id", "vec", k = 4), exact)
    info(f"cascade recall $cascade%.2f vs raw truncated $raw%.2f")
    assert(cascade >= raw, s"cascade $cascade < raw $raw")
    assert(cascade >= 0.7, s"cascade recall $cascade")
    // refine = full corpus width makes the cascade EXACT by construction
    val full = recallOf(Similarity.matryoshkaTopK(
      emb.filter(col("id") < 5), emb, "id", "vec", "id", "vec",
      k = 4, dim = 4, refine = 13), exact)
    assert(full === 1.0, s"refine covering the corpus must be exact: $full")
    // a zero-PREFIX corpus vector (NaN truncated cosine) stays eligible:
    // it ranks at the floor, and a corpus-wide refine still re-ranks it
    // exactly instead of NaN-evicting it from every shortlist
    val zp = Seq((100L, Array(0f, 0f, 3f, 4f)),
        (101L, Array(1f, 0f, 0f, 0f)), (102L, Array(0f, 1f, 0f, 0f)))
      .toDF("id", "vec")
    val got = Similarity.matryoshkaTopK(
        zp.filter(col("id") === 100L), zp, "id", "vec", "id", "vec",
        k = 2, dim = 2, refine = 3)
      .select("neighbor_id").as[Long].collect().toSet
    assert(got === Set(101L, 102L))
  }

  test("maxSim: per-token best matches sum; empty and zero vectors score 0") {
    val df = Seq(
      // q tokens: e1 and the 45-degree vector; doc tokens: e1, e2.
      // maxsim = cos(e1,e1) + max(cos(45,e1), cos(45,e2)) = 1 + cos45
      (1L, Seq(Seq(1.0, 0.0), Seq(1.0, 1.0)),
        Seq(Seq(1.0, 0.0), Seq(0.0, 1.0))),
      // empty document token list scores 0, not null
      (2L, Seq(Seq(1.0, 0.0)), Seq.empty[Seq[Double]]),
      // a zero doc token contributes 0 (nanvl), the real token wins
      (3L, Seq(Seq(1.0, 0.0)), Seq(Seq(0.0, 0.0), Seq(2.0, 0.0))))
      .toDF("id", "q", "d")
    val got = df.select(col("id"), Similarity.maxSim(col("q"), col("d")))
      .as[(Long, Double)].collect().toMap
    assert(math.abs(got(1L) - (1.0 + math.sqrt(0.5))) < 1e-12)
    assert(got(2L) === 0.0)
    assert(got(3L) === 1.0)
  }

  test("dendrogram: hand-computed single-linkage merges, ties, guards") {
    // angular 2-D points at 0, 5 and 90 degrees: (0,1) merge first,
    // then single linkage pulls 2 in at min(d(0,2), d(1,2)) = 1-cos(85)
    def ang(deg: Double) = Array(math.cos(math.toRadians(deg)),
      math.sin(math.toRadians(deg)))
    val pts = Seq((0L, ang(0).toSeq), (1L, ang(5).toSeq),
      (2L, ang(90).toSeq)).toDF("id", "v")
    val got = Similarity.dendrogram(pts, "id", "v")
      .orderBy("step").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getInt(4)))
    assert(got.length === 2)
    assert((got(0)._2, got(0)._3, got(0)._5) === ((0L, 1L, 2)))
    assert(math.abs(got(0)._4 - (1 - math.cos(math.toRadians(5)))) < 1e-9)
    assert((got(1)._2, got(1)._3, got(1)._5) === ((0L, 2L, 3)))
    assert(math.abs(got(1)._4 - (1 - math.cos(math.toRadians(85)))) < 1e-9)
    // exact ties break on (left, right): identical vectors merge in
    // min-id order and the cluster keeps its smallest member's name
    val same = Seq(5L, 9L, 7L, 3L).map(i => (i, Seq(1.0, 0.0)))
      .toDF("id", "v")
    val ties = Similarity.dendrogram(same, "id", "v")
      .orderBy("step").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getInt(4)))
    assert(ties.toSeq === Seq((3L, 5L, 2), (3L, 7L, 3), (3L, 9L, 4)))
    // guards: corpus-sized input, duplicate ids, singleton
    intercept[IllegalArgumentException](Similarity.dendrogram(
      same, "id", "v", maxRows = 3))
    intercept[IllegalArgumentException](Similarity.dendrogram(
      Seq((1L, Seq(1.0)), (1L, Seq(2.0))).toDF("id", "v"), "id", "v"))
    intercept[IllegalArgumentException](Similarity.dendrogram(
      Seq((1L, Seq(1.0))).toDF("id", "v"), "id", "v"))
    // a NaN coordinate refuses loudly instead of emitting a -1 merge
    intercept[IllegalArgumentException](Similarity.dendrogram(
      Seq((1L, Seq(Double.NaN, 1.0)), (2L, Seq(1.0, 0.0)))
        .toDF("id", "v"), "id", "v"))
  }

  test("binary quantization: mean fit, bit packing, hamming identities") {
    // fit = per-dimension mean
    val fitted = Similarity.fitBq(
      Seq((1L, Array(0f, 10f)), (2L, Array(2f, 20f)), (3L, Array(4f, 30f)))
        .toDF("id", "vec"), "vec")
    assert(fitted.toSeq === Seq(2.0, 20.0))
    // encode is strict >: at/below threshold → 0, above → 1
    val codes = Similarity.bqEncode(
      Seq((1L, Array(0f, 10f)), (2L, Array(2f, 20f)), (3L, Array(4f, 30f)))
        .toDF("id", "vec"), "vec", fitted)
      .orderBy("id").collect().map(_.getSeq[Long](1))
    assert(codes.toSeq === Seq(Seq(0L), Seq(0L), Seq(3L)))
    // packing past 64 dims: bit 69 lands in word 1, bit 5
    val wide = Similarity.bqEncode(
      Seq((1L, Array.tabulate(70)(i => if (i == 69) 1f else -1f)))
        .toDF("id", "vec"), "vec", Array.fill(70)(0.0))
      .head().getSeq[Long](1)
    assert(wide === Seq(0L, 1L << 5))
    // hamming: zero on identity, counts xor bits across words
    val h = Seq((Array(0L, 5L), Array(3L, 6L)), (Array(7L, 7L), Array(7L, 7L)))
      .toDF("a", "b")
      .select(Similarity.hamming(col("a"), col("b"))).as[Long]
      .collect().toSeq
    assert(h === Seq(4L, 0L)) // bit_count(0^3)=2, bit_count(5^6)=2; identity 0
    // dimension mismatch fails loudly instead of truncating
    val thrown = intercept[org.apache.spark.SparkException](
      Similarity.bqEncode(Seq((1L, Array(1f, 2f, 3f))).toDF("id", "vec"),
        "vec", Array(0.0)).collect())
    assert(thrown.getMessage.contains("bq") ||
      thrown.getCause.getMessage.contains("bq"))
  }

  test("bq top-k: hamming shortlist recall, refine covering corpus is exact") {
    val exact = Similarity.bruteForceTopK(
      emb.filter(col("id") < 5), emb, "id", "vec", "id", "vec", k = 4)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val bq = Similarity.bqTopK(
      emb.filter(col("id") < 5), emb, "id", "vec", "id", "vec",
      k = 4, refine = 6)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = bq.intersect(exact).size.toDouble / exact.size
    info(f"bq recall@4 with refine=6: $recall%.2f")
    assert(recall >= 0.5, s"bq recall $recall") // 8 dims = 8 bits, lossy tier
    // refine wide enough to cover the corpus makes the cascade exact
    val full = Similarity.bqTopK(
      emb.filter(col("id") < 5), emb, "id", "vec", "id", "vec",
      k = 4, refine = 13)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    assert(full === exact, "refine covering the corpus must be exact")
    intercept[IllegalArgumentException](Similarity.bqTopK(
      emb, emb, "id", "vec", "id", "vec", k = 0))
  }

  test("persisted matryoshka/BQ indexes match their inline tiers; missing sidecar refuses") {
    // build once, search many: the index forms amortize the corpus-side
    // fit/encode but run the SAME shortlist + re-rank, so their results
    // must equal the inline cascades row for row
    val q = emb.filter(col("id") < 5)
    def rowsOf(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "rank", "neighbor_id", "cosine")
        .as[(Long, Int, Long, Double)].collect().toSet
    val mDir = "/root/repo/target/test_matryoshka_index"
    Similarity.buildMatryoshkaIndex(emb, "id", "vec", mDir, dim = 4)
    assert(rowsOf(Similarity.matryoshkaSearchIndex(spark, mDir, q,
        "id", "vec", k = 4, refine = 8)) ===
      rowsOf(Similarity.matryoshkaTopK(q, emb, "id", "vec", "id", "vec",
        k = 4, dim = 4, refine = 8)))
    val bDir = "/root/repo/target/test_bq_index"
    Similarity.buildBqIndex(emb, "id", "vec", bDir)
    assert(rowsOf(Similarity.bqSearchIndex(spark, bDir, q,
        "id", "vec", k = 4, refine = 6)) ===
      rowsOf(Similarity.bqTopK(q, emb, "id", "vec", "id", "vec",
        k = 4, refine = 6)))
    // the stored thresholds round-trip exactly
    assert(Similarity.readBqThresholds(spark, bDir).toSeq ===
      Similarity.fitBq(emb.select(col("id"), col("vec").as("cv")), "cv").toSeq)
    // a plain parquet directory without the sidecar refuses loudly
    val plain = "/root/repo/target/test_noindex_sidecar"
    emb.write.mode("overwrite").parquet(plain)
    assert(intercept[IllegalArgumentException](
      Similarity.matryoshkaSearchIndex(spark, plain, q, "id", "vec", k = 2))
      .getMessage.contains("sidecar"))
    assert(intercept[IllegalArgumentException](
      Similarity.bqSearchIndex(spark, plain, q, "id", "vec", k = 2))
      .getMessage.contains("sidecar"))
  }

  test("MMR re-rank: lambda=1 is relevance order, diversity pick is hand-exact") {
    val cand = Seq(
      (1L, 10L, 0.95, Array(1.0, 0.0)),
      (1L, 11L, 0.90, Array(0.995, 0.1)), // near-duplicate of 10
      (1L, 12L, 0.50, Array(0.0, 1.0)),
      (2L, 20L, 0.40, Array(1.0, 0.0)))   // second query group, independent
      .toDF("query_id", "neighbor_id", "cosine", "vec")
    val rel = Similarity.mmrRerank(cand, "query_id", "neighbor_id",
        "cosine", "vec", k = 3, lambda = 1.0)
      .select("query_id", "rank", "neighbor_id")
      .as[(Long, Int, Long)].collect().toSeq
    assert(rel === Seq((1L, 1, 10L), (1L, 2, 11L), (1L, 3, 12L),
      (2L, 1, 20L)))
    // λ=0.5: 10 first; 11's redundancy vs 10 (~0.995) sinks it below 12
    val div = Similarity.mmrRerank(cand, "query_id", "neighbor_id",
        "cosine", "vec", k = 3, lambda = 0.5)
      .filter(col("query_id") === 1L)
      .select("rank", "neighbor_id").as[(Int, Long)].collect().toSeq
    assert(div === Seq((1, 10L), (2, 12L), (3, 11L)))
    // k beyond the candidate list returns the whole list, ranks dense;
    // a zero vector is redundancy-0 against anything (never NaN)
    val zed = Seq((3L, 30L, 0.9, Array(0.0, 0.0)),
      (3L, 31L, 0.8, Array(1.0, 0.0)))
      .toDF("query_id", "neighbor_id", "cosine", "vec")
    val all = Similarity.mmrRerank(zed, "query_id", "neighbor_id",
        "cosine", "vec", k = 10, lambda = 0.3)
      .select("rank", "neighbor_id").as[(Int, Long)].collect().toSeq
    assert(all === Seq((1, 30L), (2, 31L)))
    // a NaN relevance drops that candidate instead of crashing the greedy
    val withNan = Seq((4L, 40L, 0.9, Array(1.0, 0.0)),
      (4L, 41L, Double.NaN, Array(0.0, 1.0)))
      .toDF("query_id", "neighbor_id", "cosine", "vec")
    val nanOut = Similarity.mmrRerank(withNan, "query_id", "neighbor_id",
        "cosine", "vec", k = 2, lambda = 0.5)
      .select("neighbor_id").as[Long].collect().toSeq
    assert(nanOut === Seq(40L))
    // a NaN VECTOR coordinate likewise drops the candidate (its
    // redundancy term would poison every later round's score)
    val nanVec = Seq((5L, 50L, 0.9, Array(1.0, 0.0)),
      (5L, 51L, 0.8, Array(Double.NaN, 1.0)))
      .toDF("query_id", "neighbor_id", "cosine", "vec")
    val nv = Similarity.mmrRerank(nanVec, "query_id", "neighbor_id",
        "cosine", "vec", k = 2, lambda = 0.5)
      .select("neighbor_id").as[Long].collect().toSeq
    assert(nv === Seq(50L))
    intercept[IllegalArgumentException](Similarity.mmrRerank(
      cand, "query_id", "neighbor_id", "cosine", "vec", k = 1, lambda = 1.5))
  }

  test("LSH top-k returns a subset of the exact neighbors' quality") {
    val exact = Similarity.bruteForceTopK(
      emb.filter(col("id") < 2), emb, "id", "vec", "id", "vec", k = 3)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val approx = Similarity.lshTopK(
      emb.filter(col("id") < 2), emb, "id", "vec", "id", "vec",
      k = 3, nPlanes = 2, dim = 8)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    assert(approx.nonEmpty)
    // same bucket ⇒ candidates are a subset of the corpus; sanity only
    assert(approx.forall(p => p._1 < 2))
    assert((approx intersect exact).nonEmpty)
  }
}

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("token counts, ratios, quality bounds") {
    val df = Seq(
      (0L, "the cat sat on the mat and it is a fine day for all of us"),
      (1L, "1234567890 !!! ???"),
      (2L, "")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.analyze(df).orderBy("doc_id").collect()
    assert(out(0).getAs[Int]("n_tokens") === 16)
    assert(out(0).getAs[Double]("quality") > out(1).getAs[Double]("quality"))
    assert(out(2).getAs[Int]("n_tokens") === 0)
    out.foreach { r =>
      val q = r.getAs[Double]("quality")
      assert(q >= 0.0 && q <= 1.0)
    }
  }

  test("langId picks the stopword-dominant language") {
    val df = Seq(
      (0L, "the cat is in the house and it is fine"),
      (1L, "der hund ist nicht zu alt und das ist gut"),
      (2L, "le chat est dans la maison et il est pas"),
      (3L, "xyzzy qwerty plugh")
    ).toDF("doc_id", "text")
    val out = df.select(col("doc_id"), TextAnalysis.langId(col("text")).as("l"))
      .as[(Long, String)].collect().toMap
    assert(out(0L) === "en"); assert(out(1L) === "de")
    assert(out(2L) === "fr"); assert(out(3L) === "und")
  }

  test("fingerprint is the documented polynomial hash") {
    val df = Seq((0L, "ab")).toDF("doc_id", "text")
    val fp = df.select(TextAnalysis.fingerprintExpr("text")).head().getLong(0)
    assert(fp === (97L * 31 + 98) % 1000000007L)
  }

  test("scriptFracs count the declared ranges over non-whitespace chars") {
    def fracs(s: String): Map[String, Double] =
      Seq((1L, s)).toDF("id", "t")
        .select(TextAnalysis.scriptFracs(col("t")).map {
          case (n, c) => c.as(n) }: _*)
        .head().getValuesMap[Double](TextAnalysis.scriptRanges.map(_._1))
    // 4 latin + 6 cyrillic + 2 han + 4 arabic + 4 digits = 20 non-space
    val m = fracs("abcd Привет 世界 ربحم 1234")
    assert(m("latin") === 0.2)
    assert(m("cyrillic") === 0.3)
    assert(m("cjk") === 0.1)
    assert(m("arabic") === 0.2)
    assert(m("digit") === 0.2)
    // kana and hangul are cjk-class; accented latin counts as latin
    assert(fracs("カナ한글")("cjk") === 1.0)
    assert(fracs("éàü")("latin") === 1.0)
    // all-whitespace text: defined zero, no division blowup
    assert(fracs("  \t ").values.forall(_ === 0.0))
  }

  test("compressionRatio separates repetition from prose; edges defined") {
    val prose = "A quick brown fox jumps over the lazy dog while seventeen " +
      "magpies argue about breakfast near the riverbank in pale light."
    val spam = ("buy cheap now " * 40).trim
    val df = Seq((0L, prose), (1L, spam), (2L, ""), (3L, null))
      .toDF("doc_id", "text")
    val out = df.select(col("doc_id"),
        TextAnalysis.compressionRatio(col("text")).as("r"))
      .orderBy("doc_id").collect()
    val prosR = out(0).getDouble(1)
    val spamR = out(1).getDouble(1)
    assert(prosR > 0.4 && prosR < 1.2, s"prose ratio $prosR")
    assert(spamR < 0.3, s"repetitive ratio $spamR")
    assert(spamR < prosR, "repetition must compress harder than prose")
    assert(out(2).getDouble(1) === 1.0) // empty text: defined, not NaN
    assert(out(3).isNullAt(1))          // null text passes through
    // deterministic across two independent jobs (curation reproducibility)
    val a = df.select(TextAnalysis.compressionRatio(col("text"))).collect()
    val b = df.select(TextAnalysis.compressionRatio(col("text"))).collect()
    assert(a.toSeq === b.toSeq)
    // multi-byte text: ratio is over UTF-8 BYTES, not chars
    val cjk = Seq((0L, "量子力学の基礎を学ぶ学生のための講義ノート")).toDF("id", "t")
    val r = cjk.select(TextAnalysis.compressionRatio(col("t"))).head().getDouble(0)
    assert(r > 0 && r < 2.0, s"cjk ratio $r")
    // level out of range fails fast
    val e = intercept[IllegalArgumentException](
      TextAnalysis.compressionRatio(col("t"), level = 11))
    assert(e.getMessage.contains("level"))
  }
}

class MultimodalSpec extends SparkSpec {

  test("dHash: grid images hash to their pattern; flip moves exactly one bit") {
    for (key <- 0L to 20L) {
      val base = Multimodal.syntheticGridImage(key * 2, key, flipBit = false)
      val edit = Multimodal.syntheticGridImage(key * 2 + 1, key, flipBit = true)
      val hb = Multimodal.dHash64(base.bytes).get
      val he = Multimodal.dHash64(edit.bytes).get
      assert(java.lang.Long.bitCount(hb ^ he) === 1, s"key $key")
      // edited bytes differ, so exact (md5) dedup would MISS this pair
      assert(!java.util.Arrays.equals(base.bytes, edit.bytes))
    }
  }

  test("dHash survives re-encoding: PNG and BMP of the same pixels agree") {
    val item = Multimodal.syntheticGridImage(0L, 7L, flipBit = false)
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(item.bytes))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "bmp", bos)
    val bmp = bos.toByteArray
    assert(!java.util.Arrays.equals(item.bytes, bmp)) // different container
    assert(Multimodal.dHash64(item.bytes) === Multimodal.dHash64(bmp))
  }

  test("dHash: undecodable and sub-grid payloads yield None, not garbage") {
    assert(Multimodal.dHash64("not an image".getBytes) === None)
    val tiny = new java.awt.image.BufferedImage(4, 4,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(tiny, "png", bos)
    assert(Multimodal.dHash64(bos.toByteArray) === None)
  }

  test("imageNearDup finds the 1-bit edits and nothing else") {
    import spark.implicits._
    val items = spark.range(0, 80).as[Long]
      .map(id => Multimodal.syntheticGridImage(id, id / 2, flipBit = id % 2 == 1))
    val pairs = Multimodal.imageNearDup(items, maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted
    assert(pairs.toSeq === (0L until 80L by 2).map(k => (k, k + 1, 1)))
  }

  test("audio fingerprint: tone patterns hash exactly; flip moves one bit") {
    for (key <- 0L to 20L) {
      val base = Multimodal.syntheticToneWav(key * 2, key, flipBit = false)
      val edit = Multimodal.syntheticToneWav(key * 2 + 1, key, flipBit = true)
      val hb = Multimodal.audioFingerprint64(base.bytes).get
      val he = Multimodal.audioFingerprint64(edit.bytes).get
      assert(java.lang.Long.bitCount(hb ^ he) === 1, s"key $key")
      assert(!java.util.Arrays.equals(base.bytes, edit.bytes))
    }
  }

  test("audio fingerprint is gain-invariant and rejects non-PCM payloads") {
    val item = Multimodal.syntheticToneWav(0L, 5L, flipBit = false)
    // halve every sample: the contour (relative energies) must not move
    val samples = item.bytes.drop(44)
    val scaled = item.bytes.take(44) ++ {
      val out = new Array[Byte](samples.length)
      var i = 0
      while (i < samples.length / 2) {
        val v = (((samples(i * 2 + 1) << 8) | (samples(i * 2) & 0xff)).toShort / 2).toShort
        out(i * 2) = (v & 0xff).toByte; out(i * 2 + 1) = ((v >> 8) & 0xff).toByte
        i += 1
      }
      out
    }
    assert(Multimodal.audioFingerprint64(item.bytes) ===
      Multimodal.audioFingerprint64(scaled))
    assert(Multimodal.audioFingerprint64("not audio".getBytes) === None)
  }

  test("audioNearDup finds the 1-bit edits and nothing else") {
    import spark.implicits._
    val items = spark.range(0, 80).as[Long]
      .map(id => Multimodal.syntheticToneWav(id, id / 2, flipBit = id % 2 == 1))
    val pairs = Multimodal.audioNearDup(items, maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted
    assert(pairs.toSeq === (0L until 80L by 2).map(k => (k, k + 1, 1)))
  }

  test("feature extraction: schema, determinism, digest parity with md5") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet").limit(20)
    val items = Multimodal.fromText(spark, docs, "doc_id", "text")
    val f1 = Multimodal.extractFeatures(items).collect().sortBy(_.id)
    val f2 = Multimodal.extractFeatures(items).collect().sortBy(_.id)
    assert(f1.map(_.digest).toSeq === f2.map(_.digest).toSeq) // deterministic
    assert(f1.forall(_.features.length === 10))
    val sparkMd5 = docs.select(col("doc_id"), md5(encode(col("text"), "UTF-8")).as("d"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    f1.foreach(f => assert(f.digest === sparkMd5(f.id)))
  }

  test("real PNG payloads decode via javax.imageio with pixel moments") {
    import spark.implicits._
    // 8×4 image: left half solid red, right half solid blue
    val img = new java.awt.image.BufferedImage(8, 4,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 4; x <- 0 until 8)
      img.setRGB(x, y, if (x < 4) 0xff0000 else 0x0000ff)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val png = bos.toByteArray

    val items = Seq(
      Multimodal.MediaItem(1L, "image", png, 8, 4, 0, 1),
      Multimodal.MediaItem(2L, "image", "not an image".getBytes, 0, 0, 0, 1),
      Multimodal.MediaItem(3L, "audio", png, 0, 0, 44100, 1)).toDS()
    val out = Multimodal.extractFeatures(items).collect().sortBy(_.id).toSeq

    val real = out.head
    assert(real.decoded, "a valid PNG must take the real decode path")
    assert(real.features(0) === 8.0 && real.features(1) === 4.0) // width, height
    assert(real.features(2) === 127.5) // mean R: half 255, half 0
    assert(real.features(3) === 0.0)   // mean G
    assert(real.features(4) === 127.5) // mean B
    assert(real.features(7) === 2.0)   // aspect
    // luminance: half 0.299*255, half 0.114*255
    assert(math.abs(real.features(5) - (0.299 + 0.114) * 255 / 2) < 1e-9)

    // undecodable "image" and audio fall back to the byte stub, flagged
    assert(!out(1).decoded && !out(2).decoded)
    assert(out(1).features.length === 10)
  }

  test("sniff recovers metadata from REAL encoder output, header-only") {
    // real image files from the JDK's encoders — the sniffer must agree
    // with what the encoder actually wrote
    def encoded(fmt: String, w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, (x * 31 + y) << 8)
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, fmt, bos), s"JDK encodes $fmt")
      bos.toByteArray
    }
    for ((fmt, w, h) <- Seq(("png", 17, 9), ("gif", 33, 2), ("bmp", 5, 21),
        ("jpg", 12, 7))) {
      val info = Multimodal.sniff(encoded(fmt, w, h))
      val want = if (fmt == "jpg") "jpeg" else fmt
      assert(info.format === want, s"$fmt detected")
      assert(info.width === Some(w) && info.height === Some(h), s"$fmt dims")
    }
    // real WAV from javax.sound.sampled
    val afmt = new javax.sound.sampled.AudioFormat(22050f, 16, 2, true, false)
    val pcm = new Array[Byte](22050 * 4 / 10)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), afmt, pcm.length / 4)
    val wavOut = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, wavOut)
    val wavInfo = Multimodal.sniff(wavOut.toByteArray)
    assert(wavInfo.format === "wav")
    assert(wavInfo.sampleRate === Some(22050) && wavInfo.channels === Some(2))
    // garbage, truncation, null: rejected, never thrown
    assert(Multimodal.sniff(null).format === "unknown")
    assert(Multimodal.sniff(Array.emptyByteArray).format === "unknown")
    assert(Multimodal.sniff("plain text".getBytes).format === "unknown")
    val png = encoded("png", 6, 6)
    for (cut <- Seq(3, 10, 20))
      assert(Multimodal.sniff(png.take(cut)).format === "unknown", s"cut=$cut")
    // synthetic payloads agree with the sniffed schema end-to-end
    val syn = Multimodal.sniff(Multimodal.syntheticPayload(7L, "jpeg", 640, 480, 0, 0))
    assert(syn === Multimodal.MediaInfo("jpeg", Some(640), Some(480), None, None))
  }

  test("sniffMedia Column: distributed sniff, resolution predicate prunes") {
    import spark.implicits._
    val rows = (0L until 200L).map { i =>
      (i, Multimodal.syntheticPayload(i, "png", (i % 50 + 1).toInt, 32, 0, 0))
    }.toDF("id", "payload").repartition(7)
    val sniffed = rows.select(col("id"),
      Multimodal.sniffMedia(col("payload")).as("info"))
    val big = sniffed.filter(col("info.width") >= 40).count()
    assert(big === (0L until 200L).count(_ % 50 + 1 >= 40))
    assert(sniffed.filter(col("info.format") === "png").count() === 200)
  }

  test("resize does a REAL bilinear resize for decodable images, stub otherwise") {
    import spark.implicits._
    // 8×8 solid green PNG → 4×2: output must be a valid PNG of the target
    // dimensions whose pixels are still (approximately) green
    val img = new java.awt.image.BufferedImage(8, 8,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 8; x <- 0 until 8) img.setRGB(x, y, 0x00c800)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val items = Seq(
      Multimodal.MediaItem(1L, "image", bos.toByteArray, 8, 8, 0, 1),
      Multimodal.MediaItem(2L, "image", "garbage".getBytes, 0, 0, 0, 1)).toDS()
    val out = Multimodal.resize(items, 4, 2).collect().sortBy(_.id)
    val back = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(out(0).bytes))
    assert(back.getWidth === 4 && back.getHeight === 2)
    assert(out(0).width === 4 && out(0).height === 2)
    for (y <- 0 until 2; x <- 0 until 4) {
      val rgb = back.getRGB(x, y)
      assert(((rgb >> 8) & 0xff) > 180, f"pixel ($x,$y) stays green: $rgb%06x")
      assert(((rgb >> 16) & 0xff) < 40 && (rgb & 0xff) < 40)
    }
    // undecodable payload falls back to the stride stub with target meta
    assert(out(1).width === 4 && out(1).height === 2)
    assert(out(1).bytes.length <= math.max(1, 4 * 2).max("garbage".length))
  }

  test("real WAV payloads decode via javax.sound.sampled with signal stats") {
    import spark.implicits._
    // 0.1 s of a 400 Hz sine at amplitude 0.5, 16-bit mono PCM, 8 kHz
    val sr = 8000f
    val n = 800
    val amp = 0.5
    val pcm = new Array[Byte](n * 2)
    for (i <- 0 until n) {
      val v = (math.sin(2 * math.Pi * 400 * i / sr) * amp * 32767).toInt.toShort
      pcm(2 * i) = (v & 0xff).toByte
      pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(sr, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)

    val out = Multimodal.extractFeatures(
      Seq(Multimodal.MediaItem(1L, "audio", bos.toByteArray, 0, 0, 8000, 1)).toDS())
      .head()
    assert(out.decoded, "a valid WAV must take the real decode path")
    assert(out.features(0) === 8000.0) // sample rate
    assert(out.features(1) === 1.0) // channels
    assert(out.features(2) === 800.0) // samples
    assert(math.abs(out.features(3) - 0.1) < 1e-9) // duration
    assert(math.abs(out.features(4)) < 0.01) // mean ~ 0 for a sine
    assert(math.abs(out.features(5) - amp / math.sqrt(2)) < 0.01) // RMS
    assert(math.abs(out.features(6) - amp) < 0.01) // peak
    assert(math.abs(out.features(7) - 0.1) < 0.01) // zcr = 2f/sr
  }

  test("resize and frame sampling keep plumbing invariants") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet").limit(5)
    val items = Multimodal.fromText(spark, docs, "doc_id", "text")
    val resized = Multimodal.resize(items, 4, 4).collect()
    assert(resized.forall(i => i.bytes.length <= 16 && i.width == 4 && i.height == 4))
    import spark.implicits._
    val vid = items.map(_.copy(kind = "video", nFrames = 10))
    val sampled = Multimodal.sampleFrames(vid, 2).collect()
    assert(sampled.forall(_.nFrames === 5))
  }
}

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  test("asOf attaches latest right value at or before left ts") {
    def ts(s: Long) = new java.sql.Timestamp(s * 1000)
    val left = Seq((1L, ts(10), "l1"), (1L, ts(20), "l2"), (2L, ts(10), "l3"))
      .toDF("k", "ts", "tag")
    val right = Seq((1L, ts(5), 100.0), (1L, ts(20), 200.0), (2L, ts(11), 300.0))
      .toDF("k", "ts", "v")
    val out = AsOfJoin.asOf(left, right, Seq("k"), "ts", Seq("v"))
      .select("tag", "asof_v").as[(String, Option[Double])].collect().toMap
    assert(out("l1") === Some(100.0))
    assert(out("l2") === Some(200.0)) // equal ts matches
    assert(out("l3") === None)        // right is later than left
  }
}

/** Duplicate-segment text rewriting ([[Dedup.dedupTextSegments]]) and DSIR
  * importance weights ([[TextAnalysis.dsirWeights]]).
  */
class RewriteAndDsirSpec extends SparkSpec {
  import spark.implicits._

  test("dedupTextSegments cuts corpus-frequent segments, keeps unique text") {
    // 4-token segments; "a b c d" opens three docs (df=3 → cut); tails are
    // unique and survive; doc 3 is nothing BUT boilerplate → empty
    val docs = Seq(
      (0L, "a b c d unique tail zero here"),
      (1L, "a b c d another tail goes here"),
      (2L, "a b c d third distinct ending text"),
      (3L, "a b c d"),
      (4L, "entirely unique document with no shared segments at all")
    ).toDF("doc_id", "text")
    val out = Dedup.dedupTextSegments(docs, "text", "doc_id",
        segTokens = 4, minDf = 2)
      .orderBy("doc_id")
      .as[(Long, String, Long, Long)].collect()
    assert(out(0) === ((0L, "unique tail zero here", 2L, 1L)))
    assert(out(1) === ((1L, "another tail goes here", 2L, 1L)))
    assert(out(2) === ((2L, "third distinct ending text", 2L, 1L)))
    assert(out(3) === ((3L, "", 1L, 1L)))
    assert(out(4) === ((4L,
      "entirely unique document with no shared segments at all", 3L, 0L)))
  }

  test("dedupTextSegments reassembles multi-segment survivors in order") {
    // segmentation is POSITIONAL (consecutive 4-token windows): doc 0 =
    // [x x y y][AA BB x x][y y CC DD] — only the boundary-aligned first
    // segment matches the boilerplate docs; the unaligned repeat inside
    // segment 2 does not (that granularity is duplicateSpanStats' job)
    val docs = Seq(
      (0L, "x x y y AA BB x x y y CC DD"),
      (1L, "x x y y"),
      (2L, "x x y y")
    ).toDF("doc_id", "text")
    val out = Dedup.dedupTextSegments(docs, "text", "doc_id",
        segTokens = 4, minDf = 2)
      .filter(col("doc_id") === 0L).head()
    assert(out.getString(1) === "AA BB x x y y CC DD")
    assert(out.getLong(2) === 3L) // 12 tokens / 4
    assert(out.getLong(3) === 1L)
  }

  test("dedupTextSegments: whitespace-only doc has 0 segments, can't poison dup set") {
    // two all-whitespace docs: under the old [""]-token convention their
    // empty segments would reach df=2 and enter the duplicate set; the
    // contract is n_segments = 0, clean_text = '', nothing cut elsewhere
    val docs = Seq(
      (0L, "   "), (1L, ""), (2L, " \t "),
      (3L, "real text stays intact here")
    ).toDF("doc_id", "text")
    val out = Dedup.dedupTextSegments(docs, "text", "doc_id",
        segTokens = 2, minDf = 2)
      .orderBy("doc_id").as[(Long, String, Long, Long)].collect()
    assert(out(0) === ((0L, "", 0L, 0L)))
    assert(out(1) === ((1L, "", 0L, 0L)))
    assert(out(2) === ((2L, "", 0L, 0L)))
    assert(out(3) === ((3L, "real text stays intact here", 3L, 0L)))
  }

  test("dedupLinesKeepFirst keeps exactly the first occurrence of each line") {
    val docs = Seq(
      (0L, "alpha\nbeta\nalpha"),   // within-doc repeat: 2nd alpha drops
      (1L, "beta\ngamma"),          // beta seen in doc 0 -> drops here
      (2L, "gamma\ndelta\ngamma"),  // gamma seen in doc 2 pos 0... no, doc 1
      (3L, "unique only")
    ).toDF("doc_id", "text")
    val out = Dedup.dedupLinesKeepFirst(docs, "text", "doc_id")
      .orderBy("doc_id").as[(Long, String, Long, Long)].collect()
    assert(out(0) === ((0L, "alpha\nbeta", 3L, 2L)))
    assert(out(1) === ((1L, "gamma", 2L, 1L)))
    assert(out(2) === ((2L, "delta", 3L, 1L)))
    assert(out(3) === ((3L, "unique only", 1L, 1L)))
  }

  test("dedupLinesKeepFirst: all-duplicate doc comes back empty, not absent") {
    val docs = Seq(
      (0L, "x\ny"), (1L, "x\ny"), (2L, "y"), (3L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val out = Dedup.dedupLinesKeepFirst(docs, "text", "doc_id")
      .orderBy("doc_id").as[(Long, String, Long, Long)].collect()
    assert(out(0) === ((0L, "x\ny", 2L, 2L)))
    assert(out(1) === ((1L, "", 2L, 0L)))
    assert(out(2) === ((2L, "", 1L, 0L)))
    // null text counts as one empty line, not a vanished document
    assert(out(3) === ((3L, "", 1L, 1L)))
    // empty-string lines dedup like any other line: the output is
    // deterministic under any partitioning (re-run agrees)
    val again = Dedup.dedupLinesKeepFirst(docs.repartition(7), "text", "doc_id")
      .orderBy("doc_id").as[(Long, String, Long, Long)].collect()
    assert(out.toSeq === again.toSeq)
  }

  test("dedupLinesKeepFirst fails loudly past posBase and on non-numeric ids") {
    val docs = Seq((0L, "a\nb\nc")).toDF("doc_id", "text")
    val ex = intercept[Exception] {
      Dedup.dedupLinesKeepFirst(docs, "text", "doc_id", posBase = 2L)
        .collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("posBase")))
    val bad = Seq(("a", "x")).toDF("doc_id", "text")
    val ex2 = intercept[IllegalArgumentException] {
      Dedup.dedupLinesKeepFirst(bad, "text", "doc_id")
    }
    assert(ex2.getMessage.contains("numeric"))
    // a hash-scale id would overflow the packed (id, pos) key — loud, not
    // a silently corrupted keep-first order
    val big = Seq((Long.MaxValue / 1000L, "x")).toDF("doc_id", "text")
    val ex3 = intercept[Exception] {
      Dedup.dedupLinesKeepFirst(big, "text", "doc_id").collect()
    }
    assert(msgs(ex3).exists(_.contains("overflows")))
  }

  test("dsirWeights scores token-less docs as (0.0, 0) instead of dropping them") {
    val raw = Seq((0L, "alpha beta"), (1L, "   "), (2L, "")).toDF("doc_id", "text")
    val tgt = Seq((9L, "alpha")).toDF("doc_id", "text")
    val w = TextAnalysis.dsirWeights(raw, tgt, "text", "doc_id", buckets = 64)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
      .sortBy(_._1)
    assert(w.map(_._1).toSeq === Seq(0L, 1L, 2L), s"every raw doc scored: ${w.toSeq}")
    assert(w(1) === ((1L, 0.0, 0L)))
    assert(w(2) === ((2L, 0.0, 0L)))
    assert(w(0)._3 === 2L)
  }

  test("dsirWeights: target-like documents score higher, exact formula") {
    // target distribution = docs full of "alpha"; raw adds "omega" docs.
    // A candidate of alphas must outweigh a candidate of omegas.
    val raw = Seq(
      (0L, "alpha alpha alpha alpha"),
      (1L, "omega omega omega omega"),
      (2L, "alpha alpha omega omega")
    ).toDF("doc_id", "text")
    val target = Seq((100L, "alpha alpha alpha alpha alpha alpha"))
      .toDF("doc_id", "text")
    val w = TextAnalysis.dsirWeights(raw, target, "text", "doc_id",
        buckets = 1024)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(w(0L) > w(2L) && w(2L) > w(1L), s"ordering wrong: $w")
    // exact check of doc 0's weight against the published formula:
    // 4 tokens, all in bucket(md5('alpha')); raw model: alpha 6, omega 6,
    // total 12; target: alpha 6, total 6; B=1024
    def bucket(tok: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(tok.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(8), 16) % 1024
    }
    assume(bucket("alpha") != bucket("omega")) // md5 makes this certain
    val perTok = math.log((6.0 + 1) / (6 + 1024)) -
      math.log((6.0 + 1) / (12 + 1024))
    val expected = BigDecimal(4 * perTok)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(w(0L) - expected) < 1e-9, s"${w(0L)} vs $expected")
  }

  test("dsirWeights is deterministic and n_tokens counts nonempty tokens") {
    val raw = Seq((0L, "a b c"), (1L, "  d  e  ")).toDF("doc_id", "text")
    val tgt = Seq((9L, "a b")).toDF("doc_id", "text")
    val a = TextAnalysis.dsirWeights(raw, tgt, "text", "doc_id").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).sortBy(_._1)
    val b = TextAnalysis.dsirWeights(raw, tgt, "text", "doc_id").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).sortBy(_._1)
    assert(a.toSeq === b.toSeq)
    assert(a.map(x => x._1 -> x._3).toMap === Map(0L -> 3L, 1L -> 2L))
  }
}
