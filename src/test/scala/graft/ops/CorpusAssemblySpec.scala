package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** End-to-end corpus assembly: the full training-data pipeline a user of
  * this library would run, chained from the real operators — quality
  * filter → exact + near dedup → benchmark decontamination → mixture
  * weighting → deterministic shuffle → sequence packing → sharded export.
  * Asserts the global invariants that matter at the end of the pipe, and
  * that the WHOLE chain is deterministic end to end.
  */
class CorpusAssemblySpec extends SparkSpec {
  import spark.implicits._

  test("quality→dedup→decontaminate→mixture→shuffle→pack→shard, deterministic") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val bench = docs.filter(col("doc_id") % 29 === 0)
      .select(col("doc_id"), col("text"))

    def assemble(): org.apache.spark.sql.DataFrame = {
      // 1. heuristic quality gate (Gopher-style rule verdict)
      val quality = docs.filter(
        TextAnalysis.filterReason(col("text")) === "keep")
      // 2. exact dedup (keep first), then near-dup representatives
      val exact = Dedup.exactKeepFirst(quality, "text", "doc_id")
      val pairs = Dedup.ngramJaccardPairs(exact, "text", "doc_id",
        blockCols = Seq("lang"), n = 3, threshold = 0.5)
      val deduped = Dedup.keepRepresentatives(exact, pairs, "doc_id",
        length(col("text")))
      // 3. drop docs sharing 4-grams with the benchmark slice
      val clean = Dedup.decontaminateKeep(deduped, bench, "text", "doc_id", 4)
      // 4. mixture: downsample en, keep the rest
      val mixed = Sampling.stratifiedSample(clean, "doc_id", "lang",
        Seq("en" -> 0.5), defaultRate = 1.0)
      // 5. reproducible epoch order
      val ordered = Sampling.deterministicShuffle(
        mixed.select("doc_id", "lang", "text"), "doc_id", seed = 7,
        assumeDeterministic = true)
      // 6. pack into 512-token sequences per shard (packSequences emits
      // its own n_tokens column from the tokens expression)
      val sharded = ordered
        .withColumn("shard", Sampling.shardId(col("doc_id"), 4))
      Sampling.packSequences(sharded, "shard", "shuffle_pos",
          TextAnalysis.tokenCount(col("text")), maxTokens = 512)
        .join(sharded.select("doc_id", "shard", "shuffle_pos"),
          Seq("shard", "shuffle_pos"))
    }

    val out = assemble()
    val docsOut = out.select("doc_id").distinct()
    val n = docsOut.count()
    assert(n > 100, s"pipeline keeps a real corpus slice: $n")

    // decontamination held: nothing in the output shares a 4-gram with bench
    val dirty = Dedup.decontaminate(
      docs.join(docsOut, "doc_id"), bench, "text", "doc_id", 4).count()
    assert(dirty === 0, s"contaminated docs escaped: $dirty")

    // exact dedup held: no two output docs share identical text
    val textDups = docs.join(docsOut, "doc_id")
      .groupBy("text").count().filter(col("count") > 1).count()
    assert(textDups === 0)

    // packing respected the budget in every shard
    val overBudget = out.groupBy("shard", "pack_id")
      .agg(sum("n_tokens").as("t"), count(lit(1)).as("c"))
      .filter(col("t") > 512 && col("c") > 1).count()
    assert(overBudget === 0, "multi-doc packs must fit the token budget")

    // every shard id is the pure md5 function of the doc id
    val badShard = out.withColumn("expect", Sampling.shardId(col("doc_id"), 4))
      .filter(col("shard") =!= col("expect")).count()
    assert(badShard === 0)

    // the WHOLE pipeline is deterministic: a second run builds the same
    // (doc, shard, pack, position) assignment exactly
    val again = assemble()
    assert(out.except(again).count() === 0)
    assert(again.except(out).count() === 0)

    // 7. dataloader-ready leg: learn a subword vocabulary ON the
    // assembled corpus, encode every kept doc to int ids, then select
    // the best docs within a token budget counted in BPE ids — the form
    // a training job actually consumes
    val corpus = docs.join(docsOut, "doc_id").select("doc_id", "text")
    val merges = Bpe.learnBpe(corpus, "text", numMerges = 150, maxWords = 10000)
    val vocab = Bpe.vocabFromMerges(merges)
    val encoded = Bpe.applyBpeIds(corpus, "text", merges, vocab)
    // half the corpus's id total, so the budget genuinely cuts
    val budget = encoded.agg(sum("n_bpe_tokens")).head().getLong(0) / 2
    val selected = Sampling.selectTokenBudget(encoded, "doc_id",
      priority = col("n_bpe_tokens").cast("double"),
      tokens = col("n_bpe_tokens"), budget = budget)
    val nSel = selected.count()
    assert(nSel > 0 && nSel < n, s"budget selects a strict subset: $nSel of $n")
    // the id sequences fit the budget, and the budget counted the ids:
    // cum_tokens' high-water mark equals the total id count selected
    val (cumMax, idTotal) = {
      val r = selected.agg(max("cum_tokens"),
        sum(size(col("bpe_ids"))).cast("long")).head()
      (r.getLong(0), r.getLong(1))
    }
    assert(cumMax <= budget, s"selection exceeds the token budget: $cumMax")
    assert(cumMax === idTotal, s"cum_tokens $cumMax != id count $idTotal")
    // every id addresses the learned vocabulary (no stray ids — the
    // r10 fused-operand bug class would shift this space)
    assert(selected.select(explode(col("bpe_ids")).as("id"))
      .filter(col("id") < 0 || col("id") >= vocab.size).count() === 0)

    // 8. physical packs: the selected id sequences concatenated into
    // dataloader rows (EOS = first id past the vocab); ids are conserved
    // and every multi-doc pack fits the window
    val packed = Sampling.assemblePackedIds(
      selected.withColumn("grp", lit("all"))
        .select(col("grp"), col("doc_id"), col("bpe_ids")),
      "grp", "doc_id", "bpe_ids", size(col("bpe_ids")), maxTokens = 512,
      sepId = vocab.size)
    // PER-PACK id accounting: n_ids must equal the pack's documents' id
    // total plus one separator per document (joined through doc_ids, so a
    // dropped separator or duplicated doc cannot hide in an aggregate)
    val perPack = packed.select(col("pack_id"), col("n_ids"), col("n_docs"),
        explode(col("doc_ids")).as("doc_id"))
      .join(selected.select(col("doc_id"), size(col("bpe_ids")).as("sz")),
        "doc_id")
      .groupBy("pack_id", "n_ids", "n_docs").agg(sum("sz").as("tok"))
    assert(perPack.filter(col("n_ids") =!= col("tok") + col("n_docs"))
      .count() === 0, "per-pack id accounting broke")
    val chk = packed.agg(
      min(col("n_ids") - col("n_docs") <= 512 || col("n_docs") === 1).as("bud"),
      sum(col("n_ids") - col("n_docs")).as("tot")).head()
    assert(chk.getBoolean(0))
    assert(chk.getLong(1) === idTotal, "packed ids must conserve the selection")

    // 9. the LAST mile: the packs land in indexed binary shards (uint16 —
    // the learned vocab + separator fit 65536 by construction here) and
    // read back byte-identical through the DSv2 source, integrity-swept
    val binDir = "/root/repo/target/assembly_tokenbin"
    val packRows = packed.select(col("pack_id").cast("long").as("key"),
      col("packed_ids").as("ids"))
    val (nPacks, nIds) = graft.sources.TokenBin.write(
      packRows, "key", "ids", binDir, shards = 4, dtype = "uint16")
    assert(nPacks === packed.count())
    val back = spark.read.format("tokenbin").load(binDir)
      .select(col("key"), col("ids").as("ids_back"))
    assert(back.join(packRows, "key")
      .filter(col("ids") =!= col("ids_back")).count() === 0,
      "binary shards must round-trip the packs exactly")
    assert(nIds === back.agg(sum(size(col("ids_back")))).head().getLong(0))
    assert(graft.sources.TokenBin.verifyShards(spark, binDir)
      .filter(!col("ok")).count() === 0)
  }

  test("span scrub feeds the pipe: pieces become documents, zero residue") {
    // the scrub alternative to step 3 of the main assembly: instead of
    // dropping contaminated documents, cut out only the colliding spans
    // and continue with the surviving pieces as first-class documents —
    // the GPT-3 recipe, composed with the downstream budget cut
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val bench = docs.filter(col("doc_id") % 29 === 0)
      .select(col("doc_id"), col("text"))
    val corpus = docs.filter(col("doc_id") % 29 =!= 0)
    val scrubbed = Dedup.decontaminateScrub(corpus, bench, "text", "doc_id",
      n = 4, pad = 2)
    // pieces → documents (piece_id keyed); empty docs drop out here
    val pieces = Dedup.decontaminateScrubPieces(corpus, bench, "text",
        "doc_id", n = 4, pad = 2)
      .select((col("doc_id") * 1000 + col("piece_idx")).as("doc_id"),
        col("text"))
    assert(pieces.count() >= corpus.count() - scrubbed
      .filter(col("scrub_text") === "").count())
    // token conservation: piece tokens = original tokens - removed
    val pieceToks = pieces
      .agg(sum(TextAnalysis.tokenCount(col("text")))).head().getLong(0)
    val (origToks, removed) = {
      val r = scrubbed.agg(sum("n_tokens"), sum("n_removed")).head()
      (r.getLong(0), r.getLong(1))
    }
    assert(pieceToks === origToks - removed,
      s"token conservation: $pieceToks != $origToks - $removed")
    // the scrubbed pieces flow into the dataloader leg unchanged
    val merges = Bpe.learnBpe(pieces, "text", numMerges = 80, maxWords = 5000)
    val enc = Bpe.applyBpeIds(pieces, "text", merges,
      Bpe.vocabFromMerges(merges))
    assert(enc.filter(size(col("bpe_ids")) =!= col("n_bpe_tokens")).count() === 0)
  }

  test("C4 preprocess front-end feeds the unigram dataloader leg") {
    // the round-11 front half of the pipe: line-level cleaning
    // (deterministic line structure — the corpus is single-line) →
    // normalization → unigram tokenization; then the same token-budget
    // cut, counted in unigram ids this time
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val arr = filter(split(trim(col("text")), "\\s+"), w => length(w) > 0)
    val nl = ceil(size(arr) / lit(8.0)).cast("int")
    val lines = transform(sequence(lit(0), greatest(nl, lit(1)) - 1), i =>
      concat(array_join(slice(arr, i * 8 + 1, lit(8)), " "), lit(".")))
    val structured = docs.select(col("doc_id"), col("lang"),
      array_join(lines, "\n").as("text"))
    // 1. line rules: ≥4 words, terminal punct (built), nothing banned
    val cleaned = TextAnalysis.cleanLines(structured, "text", "doc_id",
      minWords = 4)
    val kept = cleaned.filter(col("n_kept") >= 2)
      .select(col("doc_id"), col("clean_text"))
    assert(kept.count() > 100, "line cleaning keeps a real slice")
    // 2. normalization is idempotent on the cleaned text minus newlines
    val normed = kept.select(col("doc_id"),
      TextAnalysis.normalizeText(col("clean_text")).as("text"))
    val again = normed.select(
      (TextAnalysis.normalizeText(col("text")) === col("text")).as("ok"))
      .agg(min("ok")).head().getBoolean(0)
    assert(again, "normalizeText must be idempotent")
    // 3. unigram tokenizer fit on the CLEANED corpus, ids within budget
    val m = UnigramLm.learnUnigram(normed, "text", vocabSize = 600,
      maxWords = 10000)
    val enc = UnigramLm.applyUnigramIds(normed, "text", m)
    val budget = enc.agg(sum("n_uni_pieces")).head().getLong(0) / 2
    val sel = Sampling.selectTokenBudget(enc, "doc_id",
      priority = col("n_uni_pieces").cast("double"),
      tokens = col("n_uni_pieces"), budget = budget)
    val r = sel.agg(max("cum_tokens"),
      sum(size(col("uni_ids"))).cast("long")).head()
    assert(r.getLong(0) <= budget && r.getLong(0) === r.getLong(1))
    assert(sel.select(explode(col("uni_ids")).as("id"))
      .filter(col("id") < 0 || col("id") > m.size).count() === 0)
  }

  test("line dedup → bigram ppl buckets → semantic decon → weighted draw → WordPiece ids") {
    // the round's NEW operators chained as the CCNet-flavored back half
    // of the pipe: cross-doc boilerplate removal, LM-quality bucketing,
    // fuzzy decontamination, weight-proportional selection, and a
    // BERT-family dataloader encoding — deterministic end to end
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val emb = spark.read.parquet(s"${sf()}/embeddings.parquet")

    def assemble(): org.apache.spark.sql.DataFrame = {
      // the SAME deterministic 3-word line build the q_dedup_lines
      // oracle checks (one shared definition)
      val structured = graft.SparkEntry.syntheticLines(docs, wordsPerLine = 3)
      // 1. corpus-wide keep-first line dedup; keep docs retaining text
      val deduped = Dedup.dedupLinesKeepFirst(structured, "text", "doc_id")
        .filter(col("n_kept") > 0)
        .select(col("doc_id"),
          regexp_replace(col("dedup_text"), "\n", " ").as("text"))
      // 2. bigram-LM perplexity buckets; CCNet keep-head-and-middle
      val buckets = TextAnalysis.perplexityBuckets(deduped, "text", "doc_id",
        exact = true, bigram = true)
      val headMid = deduped.join(
        buckets.filter(col("ppl_bucket") =!= "tail")
          .select("doc_id", "n_tokens"), Seq("doc_id"))
      // 3. semantic decontamination vs the % 23 embedding bench slice
      val flagged = Dedup.decontaminateSemantic(emb,
        emb.filter(col("vec_id") % 23 === 0),
        "vec_id", "embedding", "embedding", threshold = 0.4)
      val clean = headMid.join(
        flagged.select(col("vec_id").as("doc_id")), Seq("doc_id"), "left_anti")
      // 4. 100-doc weighted draw proportional to surviving token count
      val drawn = Sampling.sampleByWeight(clean, "doc_id",
        col("n_tokens").cast("double"), n = 100)
      // 5. WordPiece int-id encoding on the drawn corpus
      val vocab = WordPiece.learnWordPiece(drawn, "text", vocabSize = 400,
        maxWords = 10000)
      WordPiece.applyWordPieceIds(drawn, "text", vocab)
        .select("doc_id", "wp_ids", "n_wp_tokens")
    }

    val out = assemble()
    val n = out.count()
    assert(n === 100, s"the weighted draw fixes the corpus size: $n")
    // the learned alphabet covers its own training corpus: no [UNK] (id
    // 0) anywhere in the encoded output
    assert(out.select(explode(col("wp_ids")).as("id"))
      .filter(col("id") === 0).count() === 0, "unexpected [UNK] ids")
    // id count column matches the sequences; every doc carries tokens
    assert(out.filter(size(col("wp_ids")) =!= col("n_wp_tokens")).count() === 0)
    assert(out.filter(col("n_wp_tokens") === 0).count() === 0)
    // the whole chain is deterministic
    val again = assemble()
    assert(out.except(again).count() === 0 && again.except(out).count() === 0)
  }

  test("length-sorted batches minimize padding and are partition-invariant") {
    val docs = Seq(
      (1L, "a b c d e f g h"), (2L, "a"), (3L, "a b"), (4L, "a b c"),
      (5L, "x y z"), (6L, "q"), (7L, "a b c d"), (8L, "")).toDF("doc_id", "text")
    def run(parts: Int) = Sampling.lengthSortedBatches(
      docs.repartition(parts), "doc_id",
      coalesce(TextAnalysis.tokenCount(col("text")), lit(0)), batchSize = 3)
    val got = run(1).select("doc_id", "n_tokens", "batch_id", "batch_pos")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
      .sortBy(_._1)
    // sort order is (n_tokens, doc_id): 8(0),2(1),6(1),3(2),4(3),5(3),7(4),1(8)
    val byBatch = got.map(t => t._1 -> t._3).toMap
    assert(byBatch(8L) === 0 && byBatch(2L) === 0 && byBatch(6L) === 0)
    assert(byBatch(3L) === 1 && byBatch(4L) === 1 && byBatch(5L) === 1)
    assert(byBatch(7L) === 2 && byBatch(1L) === 2)
    // padding audit: batch 0 pads to 1 (waste 1+0+0=1), batch 1 to 3
    // (waste 1+0+0=1), batch 2 to 8 (waste 4)
    val stats = Sampling.batchPadStats(run(1))
      .collect().map(r => r.getLong(0) -> r.getLong(4)).toMap
    assert(stats === Map(0L -> 1L, 1L -> 1L, 2L -> 4L))
    // deterministic under partitioning
    assert(run(7).select("doc_id", "batch_id", "batch_pos").collect().toSet ===
      run(1).select("doc_id", "batch_id", "batch_pos").collect().toSet)
    // length-sorting beats arrival-order batching on total padding
    val arrival = docs.withColumn("n_tokens",
        coalesce(TextAnalysis.tokenCount(col("text")), lit(0)).cast("long"))
      .withColumn("batch_id", ((col("doc_id") - 1) / 3).cast("long"))
    val wasteSorted = stats.values.sum
    val wasteArrival = Sampling.batchPadStats(arrival)
      .agg(sum("pad_waste")).head().getLong(0)
    assert(wasteSorted < wasteArrival, s"$wasteSorted vs $wasteArrival")
    // a reserved name as the ORDER column would clobber the tie-break
    // key — refused up front, like any other reserved-column collision
    val e = intercept[IllegalArgumentException](Sampling.lengthSortedBatches(
      docs.withColumnRenamed("doc_id", "n_tokens"), "n_tokens",
      lit(1), batchSize = 3))
    assert(e.getMessage.contains("n_tokens"))
  }

  test("vocabCoverage: exact OOV accounting, zero-token group, dup tokens") {
    val docs = Seq(
      ("a", "the cat the dog"), ("a", "the unk1"),
      ("b", "unk2 unk2 the"), ("c", ""), ("c", null.asInstanceOf[String]))
      .toDF("source", "text")
    val out = TextAnalysis.vocabCoverage(docs, "text", "source",
        Seq("the", "cat", "dog"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out("a") === ((6L, 1L, 0.166667)))     // unk1 of 6
    assert(out("b") === ((3L, 2L, 0.666667)))     // unk2 twice counts twice
    assert(out("c") === ((0L, 0L, 0.0)))          // empty + null => rate 0
  }

  test("web ingest leg: html → canonical-url dedup → group split → byte ids") {
    // the crawl-side front of the pipeline, composed from the r12
    // operators: raw pages arrive under MANY url spellings, get their
    // text extracted, collapse on the canonical url, split leakage-safe
    // by site, and the train slice encodes to byte-level ids that decode
    // byte-exactly
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
      .limit(200).select(col("doc_id"), col("text"))
    val html = concat(lit("<html><body><h1>Page</h1><p>"), col("text"),
      lit("</p><!-- boilerplate --></body></html>"))
    val site = concat(lit("site"), pmod(col("doc_id"), lit(23)).cast("string"))
    // the same page crawled twice under different spellings
    val crawlA = docs.select(col("doc_id").as("page_id"),
      concat(lit("HTTPS://WWW."), site, lit(".COM:443/p/"),
        col("doc_id").cast("string"), lit("?utm_source=feed#top")).as("url"),
      html.as("html"))
    val crawlB = docs.select((col("doc_id") + 1000000L).as("page_id"),
      concat(lit("https://www."), site, lit(".com/p/"),
        col("doc_id").cast("string")).as("url"),
      html.as("html"))
    val pages = crawlA.unionByName(crawlB)
      .withColumn("text", TextAnalysis.stripHtml(col("html")))
      .withColumn("url", TextAnalysis.canonicalUrl(col("url")))
      .withColumn("site", TextAnalysis.urlDomain(col("url")))
      .drop("html")
    // both spellings landed on ONE canonical url; url-keyed dedup halves
    // the crawl (keep-first: the smaller page_id survives)
    val deduped = Dedup.exactKeepFirst(pages, "url", "page_id")
    assert(pages.count() === 400 && deduped.count() === 200)
    assert(deduped.agg(max("page_id")).head().getLong(0) < 1000000L)
    // extraction produced clean text lines, not markup
    assert(deduped.filter(col("text").contains("<") ||
      col("text").contains("boilerplate")).count() === 0)
    // leakage-safe split: every site wholly in one split
    val split = Sampling.splitByGroup(deduped, "site",
      Seq("train" -> 0.8, "test" -> 0.2))
    assert(split.groupBy("site").agg(countDistinct("split").as("k"))
      .filter(col("k") =!= 1).count() === 0)
    val train = split.filter(col("split") === "train")
    assert(train.count() > 0 && train.count() < 200)
    // byte-level ids on the train slice decode byte-exactly
    val merges = Bpe.learnBpeByteLevel(train, "text", numMerges = 60,
      maxWords = 5000)
    val vocab = Bpe.vocabFromMerges(merges, extraAlphabet = Bpe.ByteAlphabet)
    val enc = Bpe.applyBpeIdsByteLevel(train, "text", merges, vocab)
    val bad = enc.select(col("text"), col("bpe_ids")).collect().count { r =>
      Bpe.decodeByteLevelIds(r.getSeq[Int](1), vocab) != r.getString(0)
    }
    assert(bad === 0, s"byte-level decode mismatches: $bad")
  }
}
