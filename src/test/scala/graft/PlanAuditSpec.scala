package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

/** Physical-plan audits: the properties that make operators survive a
  * 100× scale-up are asserted here, not just eyeballed — filter/projection
  * pushdown into the scan, broadcast for dimension lookups, no cartesian
  * products in the pair generators, top-k without a global sort.
  */
class PlanAuditSpec extends SparkSpec {

  private def plan(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  private def q(name: String): DataFrame =
    SparkEntry.queries(name)(spark, sf())

  test("TAQL predicates are pushed to the parquet scan") {
    val p = plan(q("q_p2_taql"))
    assert(p.contains("PushedFilters"), p)
    // the translated predicate lands in the scan, not just a Filter node
    assert(p.contains("IsNotNull(l_quantity)") ||
      p.contains("GreaterThanOrEqual(l_quantity"), p)
  }

  test("projection prunes the scan to the requested columns") {
    val p = plan(q("q_p1_project"))
    val readSchema = p.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(readSchema.nonEmpty, p)
    // lineitem has 16 columns; the key projection must not read the rest
    assert(!readSchema.contains("l_comment") && !readSchema.contains("l_shipmode"),
      readSchema)
  }

  test("dimension lookups broadcast (no shuffle of the fact table for J1/J2)") {
    assert(plan(q("q_j1_lookup")).contains("BroadcastHashJoin"))
    assert(plan(q("q_j2_chain")).contains("BroadcastHashJoin"))
  }

  test("pair-generating dedup OPERATORS plan no cartesian product") {
    // audit the raw operators (the q_dedup_* queries wrap them in derived
    // checks that cross-join 1-row metric frames for the report — harmless,
    // but they would trip a naive plan scan)
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val ops = Map(
      "minhash" -> graft.ops.Dedup.minHashDedup(docs, "text", "doc_id",
        threshold = 0.6),
      "ngram" -> graft.ops.Dedup.ngramJaccardPairs(docs, "text", "doc_id",
        blockCols = Nil, n = 3, threshold = 0.4),
      "simhash" -> graft.ops.Dedup.simHashDedup(docs, "text", "doc_id",
        maxDist = 3))
    for ((name, df) <- ops) {
      val p = plan(df)
      assert(!p.contains("CartesianProduct"), s"$name:\n$p")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$name:\n$p")
    }
  }

  test("top-k compiles to TakeOrderedAndProject, not a global sort+limit") {
    val p = plan(q("q_o4_topk"))
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("ANN brute force broadcasts the query set and keeps partial top-k") {
    val p = plan(q("q_ann_topk"))
    assert(!p.contains("CartesianProduct"), p)
    // bounded-heap partial aggregation: an ObjectHashAggregate pair, so at
    // most k rows per key leave each task
    assert(p.contains("ObjectHashAggregate"), p)
  }

  test("fingerprint scan stays inside whole-stage codegen (no fallback expr)") {
    val df = ops.TextAnalysis.analyze(
      spark.read.parquet(s"${sf()}/documents.parquet"))
      .select("doc_id", "fingerprint")
    val p = plan(df)
    // the Project computing rollinghash carries a codegen id — it is inside
    // a WholeStageCodegen stage, which an interpreted-HOF fallback would not be
    val projLine = p.linesIterator.find(l =>
      l.contains("Project") && l.contains("codegen id"))
    assert(projLine.isDefined, p)
    assert(p.contains("rollinghash"), p)
  }

  test("NFC normalization stays inside whole-stage codegen, scan-side") {
    // audit the operator without the query's presentation orderBy: with
    // an exchange present AQE defers codegen ids until execution
    import org.apache.spark.sql.functions._
    val df = spark.read.parquet(s"${sf()}/documents.parquet")
      .select(col("doc_id"),
        ops.TextAnalysis.normalizeText(col("text")).as("norm_text"))
    val p = plan(df)
    // nfcnormalize is computed in a Project that carries a codegen id —
    // the custom Expression's doGenCode keeps the scan stage fused
    val projLine = p.linesIterator.find(l =>
      l.contains("Project") && l.contains("codegen id"))
    assert(projLine.isDefined, p)
    assert(p.toLowerCase.contains("nfcnormalize"), p)
    // projection-pruned scan: only the two referenced columns are read
    val read = p.linesIterator.find(_.contains("ReadSchema")).get
    assert(read.contains("doc_id") && read.contains("text") &&
      !read.contains("lang"), read)
  }

  test("C4 line cleaning plans no exchange below the final sort") {
    val p = plan(q("q_c4_clean"))
    // the only exchange allowed is the orderBy's range partitioning —
    // the cleaning itself is scan-side Column algebra
    val exchanges = p.linesIterator.count(_.trim.startsWith("Exchange"))
    assert(exchanges <= 1, p)
    assert(!p.contains("CartesianProduct") && !p.contains("ExistingRDD"), p)
  }

  test("as-of join is one shuffle on the key (no range explosion)") {
    val p = plan(q("q_join_asof"))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  /** count physical operators via the formatted detail headers ("(4) Exchange"),
    * which appear exactly once per node (tree lines would double-count)
    */
  private def opCount(p: String, op: String): Int =
    p.linesIterator.count(_.trim.matches(s"\\(\\d+\\) $op.*"))

  test("repetition metrics are one codegen'd scan pass (no shuffle, no HOF)") {
    // audit the metrics frame itself (no orderBy: under AQE the formatted
    // explain of an exchange-bearing plan hides codegen ids)
    val df = ops.TextAnalysis.repetitionMetrics(
        spark.read.parquet(s"${sf()}/documents.parquet"))
      .select("doc_id", "top_word_frac", "dup_bigram_frac", "dup_trigram_frac")
    val p = plan(df)
    assert(opCount(p, "Exchange") == 0, s"scan-side metrics must not shuffle:\n$p")
    val projLine = p.linesIterator.find(l =>
      l.contains("Project") && l.contains("codegen id"))
    assert(projLine.isDefined, "NgramProfile fell out of whole-stage codegen:\n" + p)
  }

  test("deterministic sampling is a scan-side filter (no exchange at all)") {
    val df = ops.Sampling.deterministicSample(
      spark.read.parquet(s"${sf()}/documents.parquet"), "doc_id", 0.5)
    val p = plan(df)
    assert(!p.contains("Exchange"), s"sampling must not shuffle:\n$p")
    assert(p.contains("Filter"), p)
  }

  test("weighted upsampling is scan-side generate (no exchange at all)") {
    val df = ops.Sampling.upsampleByWeight(
      spark.read.parquet(s"${sf()}/documents.parquet")
        .select(org.apache.spark.sql.functions.col("doc_id"),
          org.apache.spark.sql.functions.col("lang")),
      "doc_id", org.apache.spark.sql.functions.lit(2.4))
    val p = plan(df)
    assert(!p.contains("Exchange"), s"upsampling must not shuffle:\n$p")
    assert(p.contains("Generate"), p) // the explode(sequence(...))
  }

  test("temperature mixture weights ride the scan as a literal (no join)") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
      .select("doc_id", "lang")
    val w = ops.Sampling.temperatureWeights(docs, "lang", alpha = 0.5)
    val p = plan(ops.Sampling.upsampleByWeight(docs, "doc_id", w))
    // the census ran at build time (bounded collect); the query itself is
    // the same scan-side generate as plain upsampling — no join, 0 shuffles
    assert(!p.contains("Join"), s"weights must not join:\n$p")
    assert(opCount(p, "Exchange") == 0, s"mixture must not shuffle:\n$p")
    assert(p.contains("Generate"), p)
  }

  test("decontamination broadcasts the benchmark gram set") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val df = ops.Dedup.decontaminate(
      docs.filter(org.apache.spark.sql.functions.col("doc_id") % 29 =!= 0),
      docs.filter(org.apache.spark.sql.functions.col("doc_id") % 29 === 0),
      "text", "doc_id", n = 4)
    val p = plan(df)
    assert(p.contains("BroadcastHashJoin"), s"bench side must broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), p)
    // partial aggregation before the final per-doc count
    assert(p.contains("HashAggregate"), p)
  }

  test("cluster assignment is a single scan (no exchange, no join)") {
    val emb = spark.read.parquet(s"${sf()}/embeddings.parquet")
    val cents = ops.Similarity.fitKmeans(emb, "embedding", k = 4)
    val p = plan(ops.Similarity.assignClusters(emb, "embedding", "vec_id",
      cents))
    assert(!p.contains("Exchange"), s"assignment must not shuffle:\n$p")
    assert(!p.contains("Join"), p)
    // the centroid table rides the plan as a literal, not a scan (count
    // the detail headers — the tree line would double-count each node)
    assert(p.linesIterator.count(_.matches("""\(\d+\) Scan parquet\s*""")) === 1, p)
  }

  test("span scrub broadcasts bench grams; mask rebuild joins doc-keyed only") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val df = ops.Dedup.decontaminateScrub(
      docs.filter(org.apache.spark.sql.functions.col("doc_id") % 29 =!= 0),
      docs.filter(org.apache.spark.sql.functions.col("doc_id") % 29 === 0),
      "text", "doc_id", n = 4, pad = 2)
    val p = plan(df)
    assert(p.contains("BroadcastHashJoin"), s"bench side must broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    // the only shuffle keys are doc_id (hit-position agg + join back) and
    // __g (the SMALL bench side's gram distinct) — the corpus gram stream
    // itself never shuffles; it meets the bench set in the broadcast join
    val keys = p.linesIterator.filter(_.contains("hashpartitioning(")).toSeq
    assert(keys.nonEmpty && keys.forall(k =>
        k.contains("doc_id") || k.contains("__g")),
      s"unexpected shuffle key:\n${keys.mkString("\n")}\n$p")
  }

  test("sequence packing shuffles once, on the shard column") {
    val df = ops.Sampling.packSequences(
      spark.read.parquet(s"${sf()}/documents.parquet"), "source", "doc_id",
      ops.TextAnalysis.tokenCount(org.apache.spark.sql.functions.col("text")),
      maxTokens = 128)
    val p = plan(df)
    assert(opCount(p, "Exchange") == 1, s"packing should shuffle exactly once:\n$p")
  }

  test("chat rendering shuffles once (conversation agg), no window, no explode") {
    val df = ops.Sft.renderChat(
      spark.read.parquet(s"${sf()}/documents.parquet")
        .selectExpr("doc_id % 40 AS conv", "doc_id AS ord",
          "CASE WHEN (doc_id div 40) % 2 = 0 THEN 'user' ELSE 'assistant' END AS role",
          "text"),
      "conv", "ord", "role", "text")
    val p = plan(df)
    assert(opCount(p, "Exchange") == 1,
      s"chat render should shuffle exactly once:\n$p")
    assert(opCount(p, "Window") == 0, s"no corpus window:\n$p")
    assert(opCount(p, "Generate") == 0, s"no explode:\n$p")
  }

  test("bm25 prunes to query terms pre-shuffle, broadcasts stats, TakeOrdered top-k") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val df = ops.TextAnalysis.bm25Rank(docs, "text", "doc_id",
      Seq("spark", "merge"), topK = 50)
    val p = plan(df)
    assert(p.contains("TakeOrderedAndProject"), s"top-k must not global-sort:\n$p")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      s"df/stats must broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), p)
    // the isin filter sits below the first aggregate: the (doc, term)
    // shuffle carries only query-term hits
    assert(p.contains("spark") && p.contains("merge"), p)
  }

  test("token chunking is a pure scan-side generate (no exchange)") {
    val df = ops.TextAnalysis.chunkTokens(
      spark.read.parquet(s"${sf()}/documents.parquet"), "text", "doc_id",
      window = 32, stride = 24)
    val p = plan(df)
    assert(opCount(p, "Exchange") == 0, s"chunking must not shuffle:\n$p")
    assert(p.contains("Generate"), p)
  }

  test("bloom decontamination probe is scan-side (no join, no exchange)") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val df = ops.Dedup.contaminatedBloom(
      docs.filter(org.apache.spark.sql.functions.col("doc_id") % 29 =!= 0),
      docs.filter(org.apache.spark.sql.functions.col("doc_id") % 29 === 0),
      "text", "doc_id", n = 4, fpp = 1e-6)
    val p = plan(df)
    assert(opCount(p, "Exchange") == 0, s"bloom probe must not shuffle:\n$p")
    assert(!p.contains("Join"), s"bloom probe must not join:\n$p")
  }

  test("z-value is a pure codegen projection (no exchange, no fallback)") {
    val df = spark.read.parquet(s"${sf()}/lineitem.parquet")
      .select(org.apache.spark.sql.functions.col("l_orderkey"),
        ops.Sampling.zValue(Seq(
          org.apache.spark.sql.functions.col("l_partkey"),
          org.apache.spark.sql.functions.col("l_suppkey")), 16).as("zval"))
    val p = plan(df)
    assert(opCount(p, "Exchange") == 0, s"zValue must not shuffle:\n$p")
    val projLine = p.linesIterator.find(l =>
      l.contains("Project") && l.contains("codegen id"))
    assert(projLine.isDefined, s"zValue fell out of whole-stage codegen:\n$p")
  }

  test("PQ search: no cartesian product, bounded-heap candidate top-k, codegen encode") {
    val emb = spark.read.parquet(s"${sf()}/embeddings.parquet")
    val q = emb.filter(org.apache.spark.sql.functions.col("vec_id") < 8)
    val df = ops.Similarity.pqTopK(q, emb, "vec_id", "embedding",
      "vec_id", "embedding", k = 5, m = 8, ksub = 16)
    val p = plan(df)
    assert(!p.contains("CartesianProduct"), p)
    // candidate selection is the partial-agg bounded heap, not a global sort
    assert(p.contains("ObjectHashAggregate"), p)
    // the corpus-encode projection stays inside whole-stage codegen
    assert(p.contains("pqencode") || p.contains("PqEncode"), p)
  }

  test("duplicate-span stats: hash-agg + semi-join on longs, no cartesian") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val p = plan(ops.Dedup.duplicateSpanStats(docs, "text", "doc_id", n = 5))
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("HashAggregate"), p)
  }

  test("semdedup pair generation plans no cartesian product") {
    val emb = spark.read.parquet(s"${sf()}/embeddings.parquet")
    val p = plan(ops.Similarity.semDedupPairs(emb, "embedding", "vec_id",
      threshold = 0.4, nlist = 4))
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("DSIR scoring joins the bucket model by broadcast (no corpus-wide token shuffle)") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val p = plan(ops.TextAnalysis.dsirWeights(docs,
      docs.filter(org.apache.spark.sql.functions.col("lang") === "en"),
      "text", "doc_id", buckets = 256))
    // the B-row log-ratio model reaches the token stream via broadcast —
    // the only shuffles are the model hash-aggs and the final doc-keyed sum
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("BPE apply and classifier scoring stay scan-side (no RDD round-trip)") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val merges = Seq(("t", "h"), ("th", "e"), ("the", graft.ops.Bpe.EndOfWord))
    val vocab = graft.ops.Bpe.vocabFromMerges(merges)
    val model = graft.ops.Classifier.LinearTextModel(new Array[Double](64 + 2), 0.1)
    val plans = Map(
      "applyBpe" -> plan(graft.ops.Bpe.applyBpe(docs, "text", merges)
        .select("doc_id", "bpe_tokens")),
      "applyBpeIds" -> plan(graft.ops.Bpe.applyBpeIds(docs, "text", merges, vocab)
        .select("doc_id", "bpe_ids")),
      "scoreHashedLR" -> plan(graft.ops.Classifier.scoreHashedLR(docs, "text", model)
        .select("doc_id", "quality_score")))
    for ((name, p) <- plans) {
      // an RDD round-trip would plan Scan ExistingRDD and sever the scan
      assert(!p.contains("ExistingRDD"), s"$name fell back to RDD:\n$p")
      assert(opCount(p, "Exchange") == 0, s"$name must not shuffle:\n$p")
      // projection pruning reaches the parquet scan through the UDF:
      // only doc_id + text are read, not the wide passthrough columns
      val readSchema = p.linesIterator.filter(_.contains("ReadSchema")).mkString
      assert(!readSchema.contains("url") && !readSchema.contains("lang"),
        s"$name read columns it does not need: $readSchema")
    }
  }

  test("KMV sketch aggregates partially: map-side combine before the 1-row merge") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val p = plan(docs.select(graft.functions.KmvAgg.kmv(
      org.apache.spark.sql.functions.xxhash64(
        org.apache.spark.sql.functions.col("text")), 64).as("sk")))
    // TypedImperativeAggregate plans as ObjectHashAggregate with a partial
    // stage — each task ships <= k longs, never its rows
    assert(p.contains("ObjectHashAggregate"), p)
    assert(p.contains("partial_kmvagg") || p.contains("partial kmvagg") ||
      p.toLowerCase.contains("partial"), p)
  }

  test("Gopher duplicate line/paragraph metrics stay scan-side, zero shuffles") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val p = plan(ops.TextAnalysis.dupSegmentMetrics(docs, "text")
      .select("doc_id", "dup_line_frac", "dup_para_char_frac"))
    assert(!p.contains("ExistingRDD"), s"fell back to RDD:\n$p")
    assert(opCount(p, "Exchange") == 0, s"must not shuffle:\n$p")
    val readSchema = p.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(!readSchema.contains("lang") && !readSchema.contains("source"),
      s"read columns it does not need: $readSchema")
  }

  test("tokenbin: key-only scan prunes the ids column out of the DSv2 read") {
    import spark.implicits._
    val out = "/root/repo/target/tokenbin_audit"
    graft.sources.TokenBin.write(
      Seq((1L, Seq(1, 2)), (2L, Seq(3))).toDF("key", "ids"),
      "key", "ids", out, shards = 2)
    // pruned projection must reach the DSv2 scan: the BatchScan's output
    // attribute list carries key only (TokenBinSpec proves it behaviorally
    // by deleting the .bin files and scanning anyway)
    val scanLine = spark.read.format("tokenbin").load(out).select("key")
      .queryExecution.executedPlan.toString.linesIterator
      .filter(_.contains("BatchScan")).mkString
    assert(scanLine.contains("key#") && !scanLine.contains("ids#"),
      s"ids not pruned from tokenbin scan: $scanLine")
  }

  test("duplicate-segment rewrite: hash-aggs + anti-join, no cartesian") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val p = plan(ops.Dedup.dedupTextSegments(docs, "text", "doc_id"))
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("HashAggregate"), p)
  }

  test("WordPiece apply stays scan-side with projection pruning") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val vocab = Seq(graft.ops.WordPiece.Unk, "a", "b", "##a", "##b")
    val p = plan(graft.ops.WordPiece.applyWordPiece(docs, "text", vocab)
      .select("doc_id", "wp_tokens"))
    assert(!p.contains("ExistingRDD"), s"fell back to RDD:\n$p")
    assert(opCount(p, "Exchange") == 0, s"must not shuffle:\n$p")
    val readSchema = p.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(!readSchema.contains("url") && !readSchema.contains("lang"),
      s"read columns it does not need: $readSchema")
  }

  test("PCA projection stays scan-side; fit is the only corpus job") {
    val emb = spark.read.parquet(s"${sf()}/embeddings.parquet")
    val m = graft.ops.Pca.PcaModel(
      mean = new Array[Double](64),
      eigenvalues = Array.fill(8)(1.0),
      components = Array.tabulate(8, 64)((i, j) => if (i == j) 1.0 else 0.0),
      totalVariance = 64.0)
    val p = plan(graft.ops.Pca.projectPca(emb, "embedding", "vec_id", m,
      whiten = true))
    assert(!p.contains("ExistingRDD"), s"fell back to RDD:\n$p")
    assert(opCount(p, "Exchange") == 0, s"must not shuffle:\n$p")
    val readSchema = p.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(!readSchema.contains("label"),
      s"read columns it does not need: $readSchema")
  }

  test("bigram LM: capped model joins broadcast; no cartesian on data") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val p = plan(ops.TextAnalysis.bigramSurprisal(docs, "text", "doc_id",
      maxBigrams = 500))
    // the top-N bigram model and the 1-row total reach the occurrence
    // stream via broadcast; the only SMJ-eligible join is the vocab-keyed
    // unigram model join (skew-tolerant, same as unigramSurprisal)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("compressibility and media sniff stay scan-side (no shuffle)") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val pr = plan(docs.select(col("doc_id"),
      ops.TextAnalysis.compressionRatio(col("text"))))
    assert(opCount(pr, "Exchange") == 0, s"ratio must not shuffle:\n$pr")
    val ps = plan(docs.select(col("doc_id"),
      ops.Multimodal.sniffMedia(encode(col("text"), "UTF-8"))))
    assert(opCount(ps, "Exchange") == 0, s"sniff must not shuffle:\n$ps")
  }

  test("html strip, url canonicalization, script fracs stay scan-side") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val fracs = ops.TextAnalysis.scriptFracs(col("text"))
      .map { case (n, c) => c.as(n) }
    val p = plan(docs.select(Seq(col("doc_id"),
      ops.TextAnalysis.stripHtml(col("text")).as("h"),
      ops.TextAnalysis.canonicalUrl(col("text")).as("u")) ++ fracs: _*))
    assert(opCount(p, "Exchange") == 0, s"must ride the scan:\n$p")
  }

  test("span dedup plans no cartesian and no per-gram window") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val p = plan(ops.Dedup.dedupSpansKeepFirst(docs, "text", "doc_id", n = 7))
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    // keeper selection must be the min-struct AGGREGATE, not a window
    // (a window partitioned by gram serializes boilerplate grams)
    assert(!p.contains("Window"), s"no window operator:\n$p")
  }

  test("interleave plans no per-stratum window and no cartesian") {
    // the scale-killer formulation is a Window partitioned by stratum
    // (one task per stratum); the census implementation must not plan one
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
      .select("doc_id", "source")
    val p = plan(ops.Sampling.interleaveSorted(docs, "doc_id", "source",
      assumeDeterministic = true))
    assert(!p.contains("Window"), s"no window operator:\n$p")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      s"stratum sizes must broadcast:\n$p")
  }

  test("fuzzy pairs: variant-key equi-join, no cartesian, pruned scan") {
    val cust = spark.read.parquet(s"${sf()}/customer.parquet")
    val p = plan(ops.Fuzzy.editDistancePairs(cust, "c_name", "c_custkey", 1))
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    // only the name + key columns leave the scan
    val readSchema = p.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(!readSchema.contains("c_acctbal") && !readSchema.contains("c_mktsegment"),
      readSchema)
  }

  test("sorted-neighborhood: offset equi-join, no cartesian, no whole-frame window") {
    val cust = spark.read.parquet(s"${sf()}/customer.parquet")
    for (df <- Seq(
      ops.Fuzzy.sortedNeighborhoodPairs(cust, "c_name", "c_custkey",
        window = 8, maxDist = 2, assumeDeterministic = true),
      ops.Fuzzy.sortedNeighborhoodJaroWinkler(cust, "c_name", "c_custkey",
        window = 8, minSim = 0.9, assumeDeterministic = true))) {
      val p = plan(df)
      assert(!p.contains("CartesianProduct"), p)
      assert(!p.contains("BroadcastNestedLoopJoin"), p)
      // rank must come from the census zip, not a one-task Window
      assert(!p.contains("Window"), s"no window operator:\n$p")
    }
  }

  test("corpus divergence: no cartesian on data, word join is an equi-join") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val p = plan(ops.TextAnalysis.corpusDivergenceJS(docs, "text", "source"))
    // the only nested-loop structure allowed is the corpus-dim cross
    // (two 1-column aggregates, both broadcast); the word-level pair terms
    // must come from hash joins
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), p)
  }

  test("hard negatives broadcast the query set and keep partial top-k") {
    val emb = spark.read.parquet(s"${sf()}/embeddings.parquet")
    val p = plan(ops.Similarity.hardNegatives(
      emb.filter(col("vec_id") < 8), emb,
      "vec_id", "embedding", "label", "vec_id", "embedding", "label", k = 5))
    assert(p.contains("BroadcastExchange"), p)
    assert(p.contains("partial_topk") || p.contains("TopKAgg") ||
      p.contains("topk"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("top terms per group: aggregate below the rank window") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val p = plan(ops.TextAnalysis.topTermsPerGroup(docs, "text", "source", 5))
    // the window must consume the (group, token) AGGREGATE, never raw
    // token occurrences: assert a partial hash-aggregate exists and the
    // plan has exactly one Window
    assert(p.contains("HashAggregate"), p)
    assert("Window".r.findAllIn(p).size >= 1, p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("cooccurrence: zipped-slice explodes, no positional self-join") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val p = plan(ops.TextAnalysis.cooccurrence(docs, "text", window = 3,
      minCount = 2, topK = 50))
    assert(!p.contains("Join"), p)      // offsets come from slices, not a join
    assert(p.contains("Generate"), p)   // the per-offset pair explode
    assert(p.contains("HashAggregate"), p)
  }

  test("vocab coverage: closure hash-set UDF scan — no join, no explode") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val p = plan(ops.TextAnalysis.vocabCoverage(docs, "text", "source",
      Seq("the", "a", "of")))
    assert(!p.contains("Join"), p)       // vocab rides the closure, never a join
    assert(!p.contains("Generate"), p)   // counting needs no explode
    assert(p.contains("HashAggregate"), p)
  }

  test("length-sorted batches: global sort + census, no whole-frame window") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
      .select("doc_id", "text")
    val p = plan(ops.Sampling.lengthSortedBatches(docs, "doc_id",
      ops.TextAnalysis.tokenCount(col("text")), batchSize = 32,
      assumeDeterministic = true))
    assert(!p.contains("Window"), p)     // positions come from the census
    assert(!p.contains("CartesianProduct"), p)
  }

  test("sq8: candidate scan broadcasts queries, no sort-merge join anywhere") {
    val emb = spark.read.parquet(s"${sf()}/embeddings.parquet")
    val p = plan(ops.Similarity.sq8TopK(
      emb.filter(col("vec_id") < 8), emb,
      "vec_id", "embedding", "vec_id", "embedding", k = 5, refine = 4))
    assert(p.contains("BroadcastExchange"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("matryoshka cascade: truncation stays scan-side, queries broadcast, no SMJ") {
    val emb = spark.read.parquet(s"${sf()}/embeddings.parquet")
    val p = plan(ops.Similarity.matryoshkaTopK(
      emb.filter(col("vec_id") < 8), emb,
      "vec_id", "embedding", "vec_id", "embedding",
      k = 5, dim = 32, refine = 4))
    assert(p.contains("BroadcastExchange"), p)  // queries + shortlist broadcast
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.contains("CartesianProduct"), p)  // broadcast NLJ, never cartesian
  }

  test("bq cascade: hamming scan is UDF-free codegen, queries broadcast, no SMJ") {
    val emb = spark.read.parquet(s"${sf()}/embeddings.parquet")
    val p = plan(ops.Similarity.bqTopK(
      emb.filter(col("vec_id") < 8), emb,
      "vec_id", "embedding", "vec_id", "embedding", k = 5, refine = 4))
    assert(p.contains("BroadcastExchange"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    // the shortlist DISTANCE is builtin bit_count/xor column algebra;
    // the only UDF is the once-per-row encode, never the pair scan
    val analyzed = ops.Similarity.bqTopK(
      emb.filter(col("vec_id") < 8), emb,
      "vec_id", "embedding", "vec_id", "embedding", k = 5, refine = 4)
      .queryExecution.analyzed.toString()
    assert(analyzed.contains("bit_count"), analyzed.take(2000))
  }

  test("pagerank: cached normalized edges join with NO re-exchange per iteration") {
    // the r14 loop refactor: out-shares are folded into the src-keyed
    // cached edge frame once, so the per-iteration step must read the
    // cache without re-shuffling it (the pre-refactor shape paid a deg
    // join + a second exchange every iteration). The r21 fused step also
    // folds the update join into the one node-keyed aggregate — the
    // audit additionally pins ONE data-sized exchange per iteration.
    // Audits the PRODUCTION pieces (normalizedEdges + fusedStep),
    // broadcast off.
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    import org.apache.spark.sql.functions.lit
    import spark.implicits._
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val edges = (0L until 300L).flatMap(i =>
        Seq((i, (i * 7 + 3) % 300), (i, (i + 1) % 300))).toDF("s", "d")
      val e = ops.Graph.normalizedEdges(edges, "s", "d", None)
      try {
        e.count() // materialize the cache, as the loop's first action does
        val ranks = e.select(col("node")).distinct()
          .withColumn("rank", lit(1.0 / 300)).localCheckpoint()
        val step = ops.Graph.fusedStep(e, ranks,
          ranks.withColumn("__s", lit(1.0 / 300)))
        val phys = step.queryExecution.executedPlan match {
          case a: AdaptiveSparkPlanExec => a.executedPlan
          case p                        => p
        }
        val scans = phys.collect { case s: InMemoryTableScanExec => s }
        assert(scans.nonEmpty, s"expected the cached edge scan:\n$phys")
        val joins = phys.collect {
          case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
        }
        assert(joins.nonEmpty, s"expected the contrib join:\n$phys")
        val edgeSides = joins.flatMap(_.children).filter(
          _.collectFirst { case s: InMemoryTableScanExec => s }.isDefined)
        assert(edgeSides.nonEmpty, s"join must read the edge cache:\n$phys")
        for (side <- edgeSides)
          assert(side.collectFirst { case ex: ShuffleExchangeLike => ex }.isEmpty,
            s"edge cache must not re-shuffle per iteration:\n$phys")
        // the r21 fused-fold pin: with broadcast off, the iteration plans
        // exactly (a) the node-sized re-key of the checkpointed ranks RDD
        // (an RDD scan carries no partitioning metadata) and (b) the one
        // union → node-keyed aggregate exchange. The pre-r21 shape paid a
        // THIRD exchange — the left-outer update join re-shuffling ranks
        // a second time.
        val exchanges = phys.collect { case ex: ShuffleExchangeLike => ex }
        assert(exchanges.size <= 2,
          s"fused iteration must shuffle at most twice (ranks re-key + " +
            s"the one aggregate):\n$phys")
      } finally e.unpersist(false)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("fim transform: pure scan-side column algebra — no exchange, no UDF") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val df = ops.Sft.fimTransform(docs, "text", "doc_id",
      (col("doc_id") * 13 % 97).cast("double") / 97.0,
      (col("doc_id") * 29 % 89).cast("double") / 89.0)
    val p = plan(df)
    assert(!p.contains("Exchange"), p)
    assert(!df.queryExecution.analyzed.toString.contains("ScalaUDF"))
  }

  test("mmr re-rank: one exchange for the per-query collect, no window/cartesian") {
    val emb = spark.read.parquet(s"${sf()}/embeddings.parquet")
    val cand = ops.Similarity.bruteForceTopK(
        emb.filter(col("vec_id") < 4), emb,
        "vec_id", "embedding", "vec_id", "embedding", k = 10)
      .join(emb.select(col("vec_id").as("neighbor_id"),
        col("embedding").as("nv")), "neighbor_id")
      .localCheckpoint()
    val p = plan(ops.Similarity.mmrRerank(cand, "query_id", "neighbor_id",
      "cosine", "nv", k = 3, lambda = 0.5))
    // the greedy runs inside ONE query-keyed aggregate; the only other
    // exchange is the output sort's range partitioning (formatted
    // explain repeats each node in the detail section — count headers)
    val exchanges = p.linesIterator
      .count(l => l.trim.matches("""\(\d+\) Exchange.*"""))
    assert(exchanges <= 2, p)
    assert(!p.contains("Window") && !p.contains("CartesianProduct"), p)
  }

  test("min-k% prob: no corpus window — aggregates and a vocab-keyed join only") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val p = plan(ops.TextAnalysis.minKProb(docs, "text", "doc_id"))
    assert(!p.contains("Window"), p)      // the cut is scan-side slice math
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("HashAggregate"), p)
  }

  test("dpo best-worst: one prompt-keyed aggregate, no window, no self-join") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val r = docs.select((col("doc_id") % 50).as("prompt"),
      col("doc_id").as("rid"), col("text"),
      (col("doc_id") * 37 % 97).cast("double").as("score"))
    val p = plan(ops.Sft.preferencePairs(r, "prompt", "rid", "text", "score"))
    assert(!p.contains("Window") && !p.contains("Join"), p)
    assert(p.linesIterator
      .count(l => l.trim.matches("""\(\d+\) Exchange.*""")) === 1, p)
  }

  test("mad outliers: grouped percentile aggregates, no corpus window") {
    val events = graft.streaming.EventStream.loadEvents(spark, sf())
    val p = plan(ops.TextAnalysis.madOutliers(events, "value", "event_type"))
    assert(!p.contains("Window") && !p.contains("CartesianProduct"), p)
  }

  test("vocab richness: one token hash-agg + one spectrum fold, no window/join") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val p = plan(ops.TextAnalysis.vocabRichness(docs, "text"))
    assert(!p.contains("Window") && !p.contains("Join"), p)
    // one shuffle for the token agg; the spectrum fold reads the pinned
    // 1-row checkpoint (plus its single-partition exchange at most)
    assert(opCount(p, "Exchange") <= 1, p)
  }

  test("calibration report: one bin hash-agg, no corpus window or join") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
      .select((((col("doc_id") * 13) % 101).cast("double") / 100.0)
        .as("score"),
        (((col("doc_id") * 37) % 97) % 2).cast("double").as("label"))
    val p = plan(ops.Classifier.calibrationReport(docs, "score", "label"))
    assert(!p.contains("Window") && !p.contains("CartesianProduct"), p)
    // both branches read the localCheckpointed per-bin frame — no
    // second corpus scan
    assert(!p.contains("FileScan"), p)
  }

  test("bootstrap CI: ALL replicate sums ride ONE aggregate — no explode") {
    // the scale claim: B replicates must NOT become a B-fold row
    // expansion (Generate) or per-replicate scans — every replicate
    // sum is a generated column of a single pass over ONE scan
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
      .select(col("doc_id"), col("n_chars").cast("double").as("v"))
    val agg = ops.Classifier.bootstrapAggregate(docs, col("v"),
      "doc_id", replicates = 60)
    val p = plan(agg)
    assert(!p.contains("Generate") && !p.contains("Join"), p)
    assert(opCount(p, "Scan parquet") + p.linesIterator
      .count(_.trim.matches("""\(\d+\) BatchScan.*""")) <= 1, p)
    assert(opCount(p, "Exchange") <= 1, p)
  }

  test("windowedEval: one scan, window-PARTITIONED prefix sum — never a global window") {
    // the streaming quality monitor's scale claim: the AUC prefix sum
    // runs over the tiny (window, bin) aggregate PARTITIONED BY window —
    // an unpartitioned Window here would serialize every window's bins
    // into one task at corpus scale
    val ev = graft.streaming.EventStream.loadEvents(spark, sf())
    val scored = ev.select(col("ts"),
      (pmod(col("user_id") * 37 + 11, lit(700)).cast("double") / 1024.0)
        .as("score"),
      (col("user_id") % 2).cast("double").as("label"))
    val df = graft.streaming.EventStream.windowedEval(
      scored, "score", "label", "1 hour", bins = 8)
    val p = plan(df)
    // the hygiene census rides the (window, bin) aggregate: everything
    // downstream (prefix sum, per-window reduce) reads the tiny
    // checkpointed per-bin frame — NO second corpus scan anywhere
    assert(!p.contains("FileScan"), p)
    assert(opCount(p, "Scan parquet") + opCount(p, "BatchScan") === 0, p)
    // the Window operator exists and its windowspecdefinition carries
    // the w partition key BEFORE the bin sort key — the unpartitioned
    // form would read windowspecdefinition(bin ASC ...) with no key
    assert(p.contains("Window"), p)
    assert("windowspecdefinition\\(w#".r.findFirstIn(p).isDefined, p)
  }

  test("scoreDrift: census rides the (window, bin) aggregate — one stream scan") {
    // same discipline as windowedEval: the null/range refusal must NOT
    // cost a second scan of every micro-batch; the PSI join runs over
    // the checkpointed bins·windows frame
    val ev = graft.streaming.EventStream.loadEvents(spark, sf())
    val scored = ev.select(col("ts"),
      (pmod(col("user_id") * 37 + 11, lit(700)).cast("double") / 1024.0)
        .as("score"))
    val df = graft.streaming.EventStream.scoreDrift(
      scored, "score", "1 hour", bins = 8)
    val p = plan(df)
    // no FileScan anywhere downstream = every join side is the tiny
    // checkpointed (window, bin) frame, never the corpus
    assert(!p.contains("FileScan"), p)
    assert(opCount(p, "Scan parquet") + opCount(p, "BatchScan") === 0, p)
  }

  test("ksDrift: census rides the (window, value) aggregate; ECDF prefix sum is window-partitioned") {
    // the KS monitor's scale claims: no second corpus scan (the
    // null/NaN census rides the one aggregate; everything downstream
    // reads the checkpointed windows·distinct frame), and the ECDF
    // cumulative runs PARTITIONED BY window — an unpartitioned Window
    // would serialize the pooled support into one task
    val ev = graft.streaming.EventStream.loadEvents(spark, sf())
    val scored = ev.select(col("ts"),
      (pmod(col("user_id") * 37 + 11, lit(700)).cast("double") / 1024.0)
        .as("score"))
    val df = graft.streaming.EventStream.ksDrift(scored, "score", "1 hour")
    val p = plan(df)
    assert(!p.contains("FileScan"), p)
    assert(opCount(p, "Scan parquet") + opCount(p, "BatchScan") === 0, p)
    assert(p.contains("Window"), p)
    assert("windowspecdefinition\\(k#".r.findFirstIn(p).isDefined, p)
  }

  test("windowedAb: census rides the ONE (window) aggregate — no corpus re-scan") {
    // the A/B monitor's null-label refusal must not cost a second scan
    // of every micro-batch; all downstream arithmetic (χ², erfcc) runs
    // on the checkpointed windows-many rows
    val ev = graft.streaming.EventStream.loadEvents(spark, sf())
    val scored = ev.select(col("ts"),
      ((col("user_id") * 7) % 3).cast("string").as("y"),
      ((col("user_id") * 11) % 3).cast("string").as("a"),
      ((col("user_id") * 13) % 3).cast("string").as("b"))
    val df = graft.streaming.EventStream.windowedAb(scored, "y", "a", "b",
      "1 hour")
    val p = plan(df)
    assert(!p.contains("FileScan"), p)
    assert(opCount(p, "Scan parquet") + opCount(p, "BatchScan") === 0, p)
    assert(!p.contains("Join") && !p.contains("Window"), p)
  }

  test("sliceEval: census rides the (slice, bin) aggregate; prefix sum slice-partitioned") {
    // the batch twin of windowedEval keeps the same plan discipline:
    // one corpus scan (hygiene rides the aggregate), and the AUC
    // prefix sum PARTITIONED BY slice — never a global window
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
      .select(col("lang"),
        (pmod(col("doc_id") * 13, lit(101)).cast("double") / 128.0)
          .as("score"),
        (pmod(col("doc_id") * 37, lit(97)) % 2).cast("double").as("label"))
    val p = plan(ops.Classifier.sliceEval(docs, "score", "label", "lang",
      bins = 8))
    assert(!p.contains("FileScan"), p)
    assert(opCount(p, "Scan parquet") + opCount(p, "BatchScan") === 0, p)
    assert(p.contains("Window"), p)
    assert("windowspecdefinition\\(slice#".r.findFirstIn(p).isDefined, p)
  }

  test("gwetAC1: contingency agg + bounded marginal join, no corpus re-scan") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
      .select(((col("doc_id") * 3) % 4).cast("string").as("ra"),
        ((col("doc_id") * 5 + 1) % 4).cast("string").as("rb"))
    val p = plan(ops.Classifier.gwetAC1(docs, "ra", "rb"))
    assert(!p.contains("FileScan") && !p.contains("Window"), p)
  }

  test("excessLossWeights: ONE corpus aggregate; normalize reads the checkpointed domains") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
      .select(col("source"),
        ((col("doc_id") * 13) % 7).cast("double").as("lp"),
        ((col("doc_id") * 3) % 5).cast("double").as("lr"))
    val p = plan(ops.Sampling.excessLossWeights(docs, "source", "lp", "lr"))
    assert(!p.contains("FileScan"), p)
    assert(opCount(p, "Scan parquet") + opCount(p, "BatchScan") === 0, p)
    assert(!p.contains("Window"), p)
  }

  test("deLong moments: placement joins BROADCAST; one aggregate; no corpus re-scan") {
    // the paired-AUC pipeline's scale claims, pinned on the real
    // pre-head frame (the mcnemarAggregate convention): both
    // distinct-score placement tables are maxDistinct-bounded and
    // checkpointed, so the joins back to the corpus must broadcast
    // them (a shuffle join here would exchange the corpus twice), and
    // everything reads checkpoints — no parquet re-scan
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
      .select((pmod(col("doc_id") * 37, lit(97)) % 2).cast("double")
          .as("y"),
        (pmod(col("doc_id") * 13, lit(101)).cast("double") / 100.0)
          .as("sa"),
        (pmod(col("doc_id") * 29, lit(53)).cast("double") / 64.0)
          .as("sb"))
    val (moments, np, nn) = ops.Classifier.deLongMoments(
      docs, "y", "sa", "sb", 100000)
    assert(np >= 2 && nn >= 2)
    val p = plan(moments)
    assert(!p.contains("FileScan"), p)
    assert(opCount(p, "Scan parquet") + opCount(p, "BatchScan") === 0, p)
    assert(opCount(p, "BroadcastHashJoin") === 2, p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("cusumDrift: census rides the (window) aggregate; prefix scans run on the checkpointed windows frame") {
    // the sequential statistic is a prefix recurrence over the
    // windows-many POST-AGGREGATE rows: no corpus scan downstream of
    // the one (window) aggregate, and the stacked window functions
    // are present (the global order is over time-bounded windows, not
    // traffic — the rocAuc distinct-scores convention)
    val ev = graft.streaming.EventStream.loadEvents(spark, sf())
    val scored = ev.select(col("ts"),
      ((col("user_id") * 7 + 3) % 13).cast("double").as("metric"))
    val df = graft.streaming.EventStream.cusumDrift(scored, "metric",
      mu0 = 5.5, kappa = 0.0, h = 2.0)
    val p = plan(df)
    assert(!p.contains("FileScan"), p)
    assert(opCount(p, "Scan parquet") + opCount(p, "BatchScan") === 0, p)
    assert(p.contains("Window"), p)
    assert(!p.contains("Join"), p)
  }

  test("properScoresMulticlass: per-class fold reads the checkpointed (cls, bin) frame — no corpus re-scan") {
    // the K-fold Generate and the one (cls, bin) aggregate happen
    // before the checkpoint; everything the caller receives folds
    // from K*bins tiny rows — no parquet scan, no Generate downstream
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
      .select(array(
          (pmod(col("doc_id") * 13, lit(64)).cast("double") / 128.0),
          (pmod(col("doc_id") * 29, lit(64)).cast("double") / 128.0),
          ((lit(128) - pmod(col("doc_id") * 13, lit(64))
            - pmod(col("doc_id") * 29, lit(64))).cast("double") / 128.0))
          .as("probs"),
        (pmod(col("doc_id") * 37, lit(97)) % 3).cast("int").as("label"))
    val df = ops.Classifier.properScoresMulticlass(docs, "probs", "label",
      bins = 8)
    val p = plan(df)
    assert(!p.contains("FileScan"), p)
    assert(opCount(p, "Scan parquet") + opCount(p, "BatchScan") === 0, p)
    assert(!p.contains("Generate"), p)
  }

  test("windowedAbSprt: ONE (window) aggregate; prefix sums on the checkpointed windows frame") {
    val ev = graft.streaming.EventStream.loadEvents(spark, sf())
    val scored = ev.select(col("ts"),
      ((col("user_id") * 7) % 3).cast("string").as("y"),
      ((col("user_id") * 11) % 3).cast("string").as("a"),
      ((col("user_id") * 13) % 3).cast("string").as("b"))
    val df = graft.streaming.EventStream.windowedAbSprt(scored, "y",
      "a", "b", "1 hour")
    val p = plan(df)
    assert(!p.contains("FileScan"), p)
    assert(opCount(p, "Scan parquet") + opCount(p, "BatchScan") === 0, p)
    assert(p.contains("Window") && !p.contains("Join"), p)
  }

  test("offPolicyEvalBySlice: output folds from the checkpointed (slice) aggregate — no corpus re-scan, no join, no window") {
    // ONE (slice) hash aggregate over the log; every estimate, SE and
    // CI is column arithmetic on the checkpointed per-slice rows —
    // the frame the caller receives must not re-touch parquet
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
      .select(concat(lit("s"),
          (pmod(col("doc_id"), lit(3))).cast("string")).as("slice"),
        (pmod(col("doc_id") * 13, lit(8)).cast("double") / 8.0)
          .as("reward"),
        (lit(1.0) / pow(lit(2.0),
          (pmod(col("doc_id") * 7, lit(3)) + 1).cast("double")))
          .as("pb"),
        ((pmod(col("doc_id") * 11, lit(8)) + 1).cast("double") / 16.0)
          .as("pt"))
    val df = ops.Classifier.offPolicyEvalBySlice(docs, "reward", "pb",
      "pt", "slice", clip = 2.0)
    val p = plan(df)
    assert(!p.contains("FileScan"), p)
    assert(opCount(p, "Scan parquet") + opCount(p, "BatchScan") === 0, p)
    assert(!p.contains("Join") && !p.contains("Window"), p)
  }

  test("doublyRobustEvalBySlice: output folds from the checkpointed (slice) aggregate — no corpus re-scan, no join, no window") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
      .select(concat(lit("s"),
          (pmod(col("doc_id"), lit(3))).cast("string")).as("slice"),
        (pmod(col("doc_id") * 13, lit(8)).cast("double") / 8.0)
          .as("reward"),
        (lit(1.0) / pow(lit(2.0),
          (pmod(col("doc_id") * 7, lit(3)) + 1).cast("double")))
          .as("pb"),
        ((pmod(col("doc_id") * 11, lit(8)) + 1).cast("double") / 16.0)
          .as("pt"),
        (pmod(col("doc_id") * 5, lit(8)).cast("double") / 8.0).as("qh"),
        (pmod(col("doc_id") * 3, lit(8)).cast("double") / 8.0).as("vh"))
    val df = ops.Classifier.doublyRobustEvalBySlice(docs, "reward",
      "pb", "pt", "qh", "vh", "slice", clip = 2.0)
    val p = plan(df)
    assert(!p.contains("FileScan"), p)
    assert(opCount(p, "Scan parquet") + opCount(p, "BatchScan") === 0, p)
    assert(!p.contains("Join") && !p.contains("Window"), p)
  }

  test("empiricalBayesRates: output is column arithmetic on the checkpointed (slice) aggregate — no corpus re-scan, no join") {
    // the slice-ordered moment prefix scan happens ONCE inside the
    // operator (over slices-many tiny rows); the frame the caller
    // receives reads only the checkpoint
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
      .select(concat(lit("g"), (pmod(col("doc_id"), lit(4))
          * pmod(col("doc_id"), lit(3))).cast("string")).as("slice"),
        (pmod(col("doc_id") * 37, lit(97)) % 2).cast("int").as("succ"))
    val df = ops.Classifier.empiricalBayesRates(docs, "slice", "succ")
    val p = plan(df)
    assert(!p.contains("FileScan"), p)
    assert(opCount(p, "Scan parquet") + opCount(p, "BatchScan") === 0, p)
    assert(!p.contains("Join") && !p.contains("Window"), p)
  }

  test("windowedMixtureSprt: ONE (window) aggregate; prefix sums on the checkpointed windows frame") {
    val ev = graft.streaming.EventStream.loadEvents(spark, sf())
    val scored = ev.select(col("ts"),
      (((col("user_id") * 13) % 9 - 4).cast("double") / 8.0
        + lit(0.015625)).as("delta"))
    val df = graft.streaming.EventStream.windowedMixtureSprt(scored,
      "delta", sigma2 = Some(0.125), tau2 = 0.0625)
    val p = plan(df)
    assert(!p.contains("FileScan"), p)
    assert(opCount(p, "Scan parquet") + opCount(p, "BatchScan") === 0, p)
    assert(p.contains("Window") && !p.contains("Join"), p)
  }

  test("windowedConfidenceSeq: ONE (window) aggregate; prefix sums on the checkpointed windows frame") {
    val ev = graft.streaming.EventStream.loadEvents(spark, sf())
    val scored = ev.select(col("ts"),
      (((col("user_id") * 13) % 9 - 4).cast("double") / 8.0
        + lit(0.015625)).as("delta"))
    val df = graft.streaming.EventStream.windowedConfidenceSeq(scored,
      "delta", sigma2 = Some(0.125), tau2 = 0.0625)
    val p = plan(df)
    assert(!p.contains("FileScan"), p)
    assert(opCount(p, "Scan parquet") + opCount(p, "BatchScan") === 0, p)
    assert(p.contains("Window") && !p.contains("Join"), p)
  }

  test("sampleSizeBySlice: output is column arithmetic on the checkpointed (slice) aggregate") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
      .select(concat(lit("g"), (pmod(col("doc_id"), lit(4))
          * pmod(col("doc_id"), lit(3))).cast("string")).as("slice"),
        (pmod(col("doc_id") * 37, lit(97)) % 2).cast("int").as("succ"))
    val df = ops.Classifier.sampleSizeBySlice(docs, "slice", "succ",
      mde = 0.05)
    val p = plan(df)
    assert(!p.contains("FileScan"), p)
    assert(opCount(p, "Scan parquet") + opCount(p, "BatchScan") === 0, p)
    assert(!p.contains("Join") && !p.contains("Window"), p)
  }

  test("windowedOffPolicy: ONE (window) aggregate; output reads only the checkpoint") {
    val ev = graft.streaming.EventStream.loadEvents(spark, sf())
    val scored = ev.select(col("ts"),
      (pmod(col("user_id") * 13, lit(8)).cast("double") / 8.0)
        .as("reward"),
      (lit(1.0) / pow(lit(2.0),
        (pmod(col("user_id") * 7, lit(3)) + 1).cast("double")))
        .as("pb"),
      ((pmod(col("user_id") * 11, lit(8)) + 1).cast("double") / 16.0)
        .as("pt"))
    val df = graft.streaming.EventStream.windowedOffPolicy(scored,
      "reward", "pb", "pt", clip = 2.0)
    val p = plan(df)
    assert(!p.contains("FileScan"), p)
    assert(opCount(p, "Scan parquet") + opCount(p, "BatchScan") === 0, p)
    assert(!p.contains("Join") && !p.contains("Window("), p)
  }

  test("windowedCuped: ONE (window, arm) aggregate; the pivot fold reads only the checkpoint") {
    val ev = graft.streaming.EventStream.loadEvents(spark, sf())
    val base = pmod(col("user_id") * 13, lit(16)).cast("double") / 16.0
    val scored = ev.select(col("ts"),
      concat(lit("arm"), pmod(col("user_id"), lit(2)).cast("string"))
        .as("arm"),
      (base + pmod(col("user_id"), lit(2)).cast("double") * 0.03125)
        .as("y"),
      (base * 0.5 + pmod(col("user_id") * 29, lit(8)).cast("double")
        / 16.0).as("x"))
    val df = graft.streaming.EventStream.windowedCuped(scored, "arm",
      "arm0", "arm1", "y", "x")
    val p = plan(df)
    assert(!p.contains("FileScan"), p)
    assert(opCount(p, "Scan parquet") + opCount(p, "BatchScan") === 0, p)
    assert(!p.contains("Join"), p)
  }

  test("windowedAbMixtureSprt: ONE (window, arm) aggregate; pivot + prefix sums on the checkpointed rows") {
    val ev = graft.streaming.EventStream.loadEvents(spark, sf())
    val base = pmod(col("user_id") * 13, lit(16)).cast("double") / 16.0
    val scored = ev.select(col("ts"),
      concat(lit("arm"), pmod(col("user_id"), lit(2)).cast("string"))
        .as("arm"),
      (base + pmod(col("user_id"), lit(2)).cast("double") * 0.03125)
        .as("y"))
    val df = graft.streaming.EventStream.windowedAbMixtureSprt(scored,
      "arm", "arm0", "arm1", "y", sigma2 = Some(0.125), tau2 = 0.0625)
    val p = plan(df)
    assert(!p.contains("FileScan"), p)
    assert(opCount(p, "Scan parquet") + opCount(p, "BatchScan") === 0, p)
    assert(p.contains("Window") && !p.contains("Join"), p)
  }

  test("windowedCuped unitCol: (window, arm, unit) fold then the (window, arm) aggregate — no join, no window function, units never collected") {
    val ev = graft.streaming.EventStream.loadEvents(spark, sf())
    val unit = pmod(col("user_id"), lit(512))
    val df = graft.streaming.EventStream.windowedCuped(
      ev.select(col("ts"), unit.as("unit"),
        concat(lit("arm"), pmod(unit, lit(2)).cast("string")).as("arm"),
        (pmod(col("user_id") * 13, lit(16)).cast("double") / 16.0)
          .as("y"),
        (pmod(col("user_id") * 29, lit(8)).cast("double") / 16.0)
          .as("x")),
      "arm", "arm0", "arm1", "y", "x", unitCol = Some("unit"))
    val p = plan(df)
    assert(!p.contains("FileScan"), p)
    assert(opCount(p, "Scan parquet") + opCount(p, "BatchScan") === 0, p)
    assert(!p.contains("Join") && !p.contains("Window("), p)
  }

  test("abExperimentReport: the slice output reads only the checkpointed (slice) aggregate — no join, no corpus re-scan; globals are literals") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
      .select(concat(lit("arm"), pmod(col("doc_id"), lit(2))
          .cast("string")).as("arm"),
        (pmod(col("doc_id") * 13, lit(16)).cast("double") / 16.0
          + pmod(col("doc_id"), lit(2)).cast("double") * 0.03125)
          .as("y"),
        (pmod(col("doc_id") * 13, lit(16)).cast("double") / 32.0)
          .as("x"),
        (pmod(col("doc_id") * 37, lit(97)) % 2).cast("int").as("succ"),
        concat(lit("g"), pmod(col("doc_id"), lit(3)).cast("string"))
          .as("slice"))
    val df = ops.Classifier.abExperimentReport(docs, "arm", "arm0",
      "arm1", "y", "x", "succ", "slice")
    val p = plan(df)
    assert(!p.contains("FileScan"), p)
    assert(opCount(p, "Scan parquet") + opCount(p, "BatchScan") === 0, p)
    assert(!p.contains("Join") && !p.contains("Window("), p)
  }

  test("srmCheck: ONE scalar aggregate (no arm-key shuffle); per-arm rows unfold from the checkpoint — no join, no window") {
    val m = pmod(pmod(col("doc_id") * 37, lit(97)), lit(16))
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
      .select(when(m < 7, "a").when(m < 11, "b").when(m < 13, "c")
        .otherwise("d").as("arm"))
    val df = ops.Classifier.srmCheck(docs, "arm",
      Seq("a" -> 0.5, "b" -> 0.25, "c" -> 0.125, "d" -> 0.125))
    val p = plan(df)
    assert(!p.contains("FileScan"), p)
    assert(opCount(p, "Scan parquet") + opCount(p, "BatchScan") === 0, p)
    assert(!p.contains("Join") && !p.contains("Window("), p)
  }

  test("windowedRatioDelta: (window, arm, unit) fold then ONE (window, arm) moment aggregate + pivot — no join, no window function") {
    val ev = graft.streaming.EventStream.loadEvents(spark, sf())
    val unit = pmod(col("user_id"), lit(512))
    val df = graft.streaming.EventStream.windowedRatioDelta(
      ev.select(col("ts"), unit.as("unit"),
        concat(lit("arm"), pmod(unit, lit(2)).cast("string")).as("arm"),
        (pmod(col("user_id") * 13, lit(8)).cast("double") / 8.0)
          .as("clicks"),
        (lit(1) + pmod(col("user_id") * 7, lit(4))).cast("double")
          .as("imps")),
      "arm", "arm0", "arm1", "clicks", "imps", "unit")
    val p = plan(df)
    assert(!p.contains("FileScan"), p)
    assert(opCount(p, "Scan parquet") + opCount(p, "BatchScan") === 0, p)
    assert(!p.contains("Join") && !p.contains("Window("), p)
  }

  test("cupedDeltaBySlice: ONE (slice, arm) aggregate then the (slice) pivot fold — no join, no window function, slices never collected") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
      .select(concat(lit("g"), pmod(col("doc_id"), lit(3))
          .cast("string")).as("slice"),
        concat(lit("arm"), pmod(col("doc_id"), lit(2)).cast("string"))
          .as("arm"),
        (pmod(col("doc_id") * 13, lit(16)).cast("double") / 16.0)
          .as("y"),
        (pmod(col("doc_id") * 29, lit(8)).cast("double") / 16.0)
          .as("x"))
    val df = ops.Classifier.cupedDeltaBySlice(docs, "arm", "arm0",
      "arm1", "y", "x", "slice")
    val p = plan(df)
    assert(!p.contains("FileScan"), p)
    assert(opCount(p, "Scan parquet") + opCount(p, "BatchScan") === 0, p)
    assert(!p.contains("Join") && !p.contains("Window("), p)
  }

  test("windowedEbRates: ONE (window, slice) aggregate; partitioned prefix/frame functions on the checkpoint — no join, no corpus re-scan") {
    val ev = graft.streaming.EventStream.loadEvents(spark, sf())
    val df = graft.streaming.EventStream.windowedEbRates(
      ev.select(col("ts"),
        concat(lit("g"), (pmod(col("user_id"), lit(4))
          * pmod(col("user_id"), lit(3))).cast("string")).as("slice"),
        (pmod(col("user_id") * 37, lit(97)) % 2).cast("int")
          .as("succ")),
      "slice", "succ")
    val p = plan(df)
    assert(!p.contains("FileScan"), p)
    assert(opCount(p, "Scan parquet") + opCount(p, "BatchScan") === 0, p)
    assert(p.contains("Window") && !p.contains("Join"), p)
  }

  test("windowedSrm: ONE (window) aggregate; output is column arithmetic on the checkpoint — no join, no window function") {
    val ev = graft.streaming.EventStream.loadEvents(spark, sf())
    val scored = ev.select(col("ts"),
      when(pmod(col("user_id") * 13, lit(16)) < 9, "a").otherwise("b")
        .as("arm"))
    val df = graft.streaming.EventStream.windowedSrm(scored, "arm",
      Seq("a" -> 0.5, "b" -> 0.5))
    val p = plan(df)
    assert(!p.contains("FileScan"), p)
    assert(opCount(p, "Scan parquet") + opCount(p, "BatchScan") === 0, p)
    assert(!p.contains("Join") && !p.contains("Window("), p)
  }

  test("cusumDrift densify: the spine join is windows-many post-aggregate rows — no corpus re-scan downstream of the one aggregate") {
    val ev = graft.streaming.EventStream.loadEvents(spark, sf())
    val scored = ev.filter(hour(col("ts")) % 3 =!= 1)
      .select(col("ts"),
        ((col("user_id") * 7 + 3) % 13).cast("double").as("metric"))
    val df = graft.streaming.EventStream.cusumDrift(scored, "metric",
      mu0 = 5.5, kappa = 0.0, h = 2.0, densify = true)
    val p = plan(df)
    assert(!p.contains("FileScan"), p)
    assert(opCount(p, "Scan parquet") + opCount(p, "BatchScan") === 0, p)
    assert(p.contains("Window"), p)
  }

  test("abReport: ONE pinned holdout — both legs read the checkpoint; placements broadcast") {
    // the r18 promotion's whole point: the McNemar aggregate and the
    // DeLong moment aggregate must BOTH read the one localCheckpointed
    // frame (no parquet scan anywhere downstream), the census rides
    // the DeLong leg's first per-score aggregate (no separate filter
    // pass exists in the operator at all), and the placement joins
    // keep the broadcast shape
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
      .select((pmod(col("doc_id") * 37, lit(97)) % 2).cast("double")
          .as("y"),
        (pmod(col("doc_id") * 13, lit(101)).cast("double") / 100.0)
          .as("sa"),
        (pmod(col("doc_id") * 29, lit(53)).cast("double") / 64.0)
          .as("sb"))
    val (mcAgg, moments, np, nn) = ops.Classifier.abReportAggregates(
      docs, "y", "sa", "sb", 0.5, 100000)
    assert(np >= 2 && nn >= 2)
    val pm = plan(mcAgg)
    assert(!pm.contains("FileScan"), pm)
    assert(opCount(pm, "Scan parquet") + opCount(pm, "BatchScan") === 0, pm)
    assert(!pm.contains("Join") && !pm.contains("Window"), pm)
    val pd = plan(moments)
    assert(!pd.contains("FileScan"), pd)
    assert(opCount(pd, "Scan parquet") + opCount(pd, "BatchScan") === 0, pd)
    assert(opCount(pd, "BroadcastHashJoin") === 2, pd)
    assert(!pd.contains("SortMergeJoin"), pd)
  }

  test("regressionReport: census RIDES the one power-sum aggregate — one scan, no join") {
    // the r18 hygiene fold on the batch evaluation legs: the exposed
    // pre-head aggregate carries the null/NaN census as a rider
    // column, so the op is one corpus scan, one exchange, total
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
      .select((pmod(col("doc_id") * 13, lit(101)).cast("double") / 100.0)
          .as("x"),
        (pmod(col("doc_id") * 37, lit(97)) % 2).cast("double").as("t"))
    val p = plan(ops.Classifier.regressionAggregate(docs, col("x"),
      col("t")))
    assert(!p.contains("Join") && !p.contains("Window"), p)
    assert(opCount(p, "Scan parquet") + opCount(p, "BatchScan") <= 1, p)
    assert(opCount(p, "Exchange") <= 1, p)
  }

  test("mcnemarTest: ONE scalar hash aggregate — no join, no window, one scan") {
    // audits the REAL pre-head aggregate (mcnemarAggregate, the
    // bootstrapAggregate convention), so a regression that adds a
    // second pass or a join to the operator flips this, not a replica
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
      .select(((col("doc_id") * 7) % 3).cast("string").as("y"),
        ((col("doc_id") * 11) % 3).cast("string").as("a"),
        ((col("doc_id") * 13) % 3).cast("string").as("b"))
    val p = plan(ops.Classifier.mcnemarAggregate(docs, "y", "a", "b"))
    assert(!p.contains("Join") && !p.contains("Window"), p)
    assert(opCount(p, "Scan parquet") + opCount(p, "BatchScan") <= 1, p)
    assert(opCount(p, "Exchange") <= 1, p)
  }

  test("cohen kappa: contingency agg + bounded marginal join, no corpus re-scan") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
      .select(((col("doc_id") * 3) % 4).cast("string").as("ra"),
        ((col("doc_id") * 5 + 1) % 4).cast("string").as("rb"))
    val p = plan(ops.Classifier.cohenKappa(docs, "ra", "rb"))
    // everything downstream reads the checkpointed labels² table (the
    // scalar-aggregate crossJoin is a 1-row broadcast, not a cartesian
    // over data)
    assert(!p.contains("FileScan") && !p.contains("Window"), p)
  }

  test("maxsim: nested higher-order scoring — no explode, no extra shuffle") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    def tokEmb = transform(
      slice(ops.TextAnalysis.nonEmptyTokens(col("text")), 1, 4),
      t => transform(sequence(lit(0), lit(7)), j =>
        sin(ascii(t) * 31 + length(t) * 7 + j)))
    val q = docs.filter(col("doc_id") < 3)
      .select(col("doc_id").as("qid"), tokEmb.as("qe"))
    val c = docs.filter(col("doc_id") < 20)
      .select(col("doc_id").as("did"), tokEmb.as("de"))
    val p = plan(c.crossJoin(broadcast(q))
      .select(col("qid"), col("did"),
        ops.Similarity.maxSim(col("qe"), col("de")).as("maxsim")))
    assert(!p.contains("Generate"), p)   // token scores never explode
    assert(!p.contains("SortMergeJoin") && p.contains("BroadcastExchange"), p)
  }

  test("blocklist: one closure-automaton scan — no join, no explode") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val p = plan(ops.Blocklist.blocklistMatches(docs, "text", "doc_id",
      Seq("table", "scan")))
    assert(!p.contains("Join") && !p.contains("Generate"), p)
    assert(!p.contains("Exchange"), p)   // rides the scan outright
  }

  test("lpa: cached closed adjacency enters the vote join with NO re-exchange") {
    // lpaSetup partitions the adjacency on the join key n and caches it;
    // the per-iteration lpaStep must read that cache without re-shuffling
    // the data-sized side (the pageRank discipline). Broadcast off so the
    // join is a genuine shuffle join at test scale.
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    import spark.implicits._
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val edges = (0L until 300L).flatMap(i =>
        Seq((i, (i * 7 + 3) % 300), (i, (i + 1) % 300))).toDF("s", "d")
      val (adj, nodes) = ops.Graph.lpaSetup(edges, "s", "d")
      try {
        adj.count() // materialize, as the loop's first action does
        val state = nodes.select(col("z").as("node"), col("z").as("label"))
          .localCheckpoint()
        val step = ops.Graph.lpaStep(adj, state)
        val phys = step.queryExecution.executedPlan match {
          case a: AdaptiveSparkPlanExec => a.executedPlan
          case p                        => p
        }
        val joins = phys.collect {
          case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
        }
        assert(joins.nonEmpty, s"expected the vote join:\n$phys")
        val adjSides = joins.flatMap(_.children).filter(
          _.collectFirst { case s: InMemoryTableScanExec => s }.isDefined)
        assert(adjSides.nonEmpty, s"join must read the adjacency cache:\n$phys")
        for (side <- adjSides)
          assert(side.collectFirst { case ex: ShuffleExchangeLike => ex }.isEmpty,
            s"adjacency cache must not re-shuffle per iteration:\n$phys")
      } finally adj.unpersist(false)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("hits: BOTH edge caches enter their half-step joins with NO re-exchange") {
    // hits caches the edge list twice — src-partitioned for the auth
    // half-step, dst-partitioned for the hub half-step — so neither
    // per-iteration join may re-shuffle its data-sized side. Audits the
    // PRODUCTION steps (hitsAuthStep / hitsHubStep), broadcast off.
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    import org.apache.spark.sql.functions.lit
    import spark.implicits._
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val edges = (0L until 300L).flatMap(i =>
        Seq((i, (i * 7 + 3) % 300), (i, (i + 1) % 300))).toDF("src", "dst")
      val eSrc = edges.repartition(col("src")).persist()
      val eDst = edges.repartition(col("dst")).persist()
      try {
        eSrc.count(); eDst.count()
        val state = edges.select(col("src").as("node")).distinct()
          .withColumn("hub", lit(1.0)).withColumn("auth", lit(1.0))
          .localCheckpoint()
        def assertNoEdgeReshuffle(df: org.apache.spark.sql.DataFrame): Unit = {
          val phys = df.queryExecution.executedPlan match {
            case a: AdaptiveSparkPlanExec => a.executedPlan
            case p                        => p
          }
          val joins = phys.collect {
            case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
          }
          assert(joins.nonEmpty, s"expected the half-step join:\n$phys")
          val edgeSides = joins.flatMap(_.children).filter(
            _.collectFirst { case s: InMemoryTableScanExec => s }.isDefined)
          assert(edgeSides.nonEmpty, s"join must read an edge cache:\n$phys")
          for (side <- edgeSides)
            assert(side.collectFirst { case ex: ShuffleExchangeLike => ex }.isEmpty,
              s"edge cache must not re-shuffle per iteration:\n$phys")
        }
        assertNoEdgeReshuffle(ops.Graph.hitsAuthStep(eSrc, state))
        assertNoEdgeReshuffle(ops.Graph.hitsHubStep(eDst, state))
      } finally { eSrc.unpersist(false); eDst.unpersist(false) }
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("random walks: edge cache enters the step join with NO re-exchange") {
    // the per-step frontier re-keys on `cur` (that exchange IS the
    // algorithm); the u-partitioned edge cache must not pay a second one
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    import org.apache.spark.sql.functions.lit
    import spark.implicits._
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val edges = (0L until 300L).flatMap(i =>
        Seq((i, (i * 7 + 3) % 300), (i, (i + 1) % 300))).toDF("s", "d")
      val e = edges.select(col("s").as("u"), col("d").as("v"))
        .repartition(col("u")).persist()
      try {
        e.count()
        val state = e.select(col("u").as("start")).distinct()
          .select(col("start"), lit(0).as("walk"), col("start").as("cur"))
          .localCheckpoint()
        val step = ops.Graph.walkStep(e, state, 0, 42L)
        val phys = step.queryExecution.executedPlan match {
          case a: AdaptiveSparkPlanExec => a.executedPlan
          case p                        => p
        }
        val joins = phys.collect {
          case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
        }
        assert(joins.nonEmpty, s"expected the step join:\n$phys")
        val edgeSides = joins.flatMap(_.children).filter(
          _.collectFirst { case s: InMemoryTableScanExec => s }.isDefined)
        assert(edgeSides.nonEmpty, s"join must read the edge cache:\n$phys")
        for (side <- edgeSides)
          assert(side.collectFirst { case ex: ShuffleExchangeLike => ex }.isEmpty,
            s"edge cache must not re-shuffle per step:\n$phys")
      } finally e.unpersist(false)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("hyperball: cached edge frame joins with NO re-exchange (u-keyed)") {
    // the r13 defect: the edge cache was partitioned on v while the
    // per-iteration join keys on u, so every iteration re-shuffled the
    // full edge list. This audit mirrors iteration >= 2 (state is a
    // checkpointed scan, so the ONE InMemoryTableScan in the plan is the
    // edge cache) with broadcast off (at 100 TB the edge side cannot
    // broadcast) and asserts no shuffle exchange sits anywhere above the
    // cached scan — the u-partitioning must flow into the join.
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    import spark.implicits._
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val edges = (0L until 300L).flatMap(i =>
        Seq((i, (i * 7 + 3) % 300), (i, (i + 1) % 300))).toDF("s", "d")
      val (e, _, _, hllMerge, init) =
        ops.Graph.hyperBallSetup(edges, "s", "d", maxDepth = 4, logM = 7)
      try {
        val state = init.localCheckpoint()
        val step = ops.Graph.hyperBallStep(e, state, hllMerge,
          carryH = false)
        val phys = step.queryExecution.executedPlan match {
          // the adaptive wrapper's current plan (pre-execution: the
          // initial plan AFTER EnsureRequirements, so the
          // ENSURE_REQUIREMENTS exchanges are present and auditable)
          case a: AdaptiveSparkPlanExec => a.executedPlan
          case p                        => p
        }
        val scans = phys.collect { case s: InMemoryTableScanExec => s }
        assert(scans.size == 1, s"expected exactly the edge cache scan:\n$phys")
        // the per-iteration join: the side whose subtree holds the cached
        // edge scan must reach it with NO shuffle exchange in between
        // (the v-keyed bug re-Exchanged the full edge list here); the
        // aggregate's exchange above the join is legitimate and excluded
        val joins = phys.collect {
          case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
        }
        assert(joins.nonEmpty, s"expected the per-iteration join:\n$phys")
        val edgeSides = joins.flatMap(_.children).filter(
          _.collectFirst { case s: InMemoryTableScanExec => s }.isDefined)
        assert(edgeSides.nonEmpty, s"join must read the edge cache:\n$phys")
        for (side <- edgeSides)
          assert(side.collectFirst { case ex: ShuffleExchangeLike => ex }.isEmpty,
            s"edge cache must not re-shuffle per iteration:\n$phys")
        // sanity: the aggregate's exchange is still there (we audited a
        // real shuffling plan, not a degenerate one)
        assert(phys.collectFirst { case ex: ShuffleExchangeLike => ex }.isDefined,
          s"expected the register-merge aggregate exchange:\n$phys")
      } finally e.unpersist(true)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("persisted matryoshka/BQ indexes: coarse scan column-prunes the full vectors") {
    // the indexes' whole point at 100 TB: the shortlist pass reads ONLY
    // the dim/d prefix (or d/8-byte code) column, and the full vector
    // column is fetched in a SEPARATE pruned scan for the re-rank —
    // assert the parquet ReadSchemas, not the doc comment
    import org.apache.spark.sql.functions.col
    val spark2 = spark
    import spark2.implicits._
    val emb = (0 until 40).map { i =>
      (i.toLong, Array.tabulate(8)(j => math.sin(i * 8 + j)))
    }.toDF("id", "vec")
    val q = emb.filter(col("id") < 4)
    def readSchemas(df: DataFrame): Seq[String] =
      plan(df).linesIterator.filter(_.contains("ReadSchema")).toSeq
    val mDir = "/root/repo/target/audit_matryoshka_index"
    graft.ops.Similarity.buildMatryoshkaIndex(emb, "id", "vec", mDir, dim = 4)
    val mrs = readSchemas(graft.ops.Similarity.matryoshkaSearchIndex(
      spark, mDir, q, "id", "vec", k = 3, refine = 2))
    assert(mrs.exists(l => l.contains("tv") && !l.contains("cv")),
      s"coarse scan must not read cv:\n${mrs.mkString("\n")}")
    assert(mrs.exists(l => l.contains("cv") && !l.contains("tv")),
      s"re-rank scan must not read tv:\n${mrs.mkString("\n")}")
    val bDir = "/root/repo/target/audit_bq_index"
    graft.ops.Similarity.buildBqIndex(emb, "id", "vec", bDir)
    val brs = readSchemas(graft.ops.Similarity.bqSearchIndex(
      spark, bDir, q, "id", "vec", k = 3, refine = 2))
    assert(brs.exists(l => l.contains("ccode") && !l.contains("cv")),
      s"hamming scan must not read cv:\n${brs.mkString("\n")}")
    assert(brs.exists(l => l.contains("cv") && !l.contains("ccode")),
      s"re-rank scan must not read ccode:\n${brs.mkString("\n")}")
  }
}
