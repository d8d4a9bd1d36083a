package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Scale-slope probe: replicate sf0.1 N× with shifted keys (under
  * target/, testdata stays untouched) and time headline operators at 1×
  * and N× to observe the scaling exponent. */
object ScalingProbe {
  def main(args: Array[String]): Unit = {
    val mult = args.headOption.map(_.toInt).getOrElse(8)
    // args after the mult are comma-or-space separated tokens: label
    // substrings to probe (others skipped), plus the flags "all" (no
    // filter) and "reuse" (skip the replication writes; target/sfbig
    // from a previous run must exist at the same mult). Flags are
    // stripped from the filter list wherever they appear, so
    // "dedup,reuse" means filter=dedup AND reuse — not a never-matching
    // filter entry
    val tokens = args.drop(1).flatMap(_.split(",")).filter(_.nonEmpty).toSeq
    val only = tokens.filterNot(a => a == "all" || a == "reuse")
    val reuse = tokens.contains("reuse")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val src = "/root/testdata/sf0.1"
    val big = "/root/repo/target/sfbig"
    def rep(t: String, idCols: Seq[String]) = {
      // events has shipped as TIMESTAMP(NANOS) in some testdata
      // generations — a raw read needs the legacy long mapping or the
      // whole probe run dies at replication (the Bench.scala defense).
      // SCOPED: the flag changes timestamp decoding for every parquet
      // read on the session, so restore the prior value after the
      // events replication instead of leaking it into later probes.
      val flag = "spark.sql.legacy.parquet.nanosAsLong"
      val prior = spark.conf.getOption(flag)
      if (t == "events") spark.conf.set(flag, "true")
      try {
        val base = spark.read.parquet(s"$src/$t.parquet")
        val n = base.count()
        val copies = (0 until mult).map { i =>
          idCols.foldLeft(base)((d, c) => d.withColumn(c, col(c) + lit(i * 10000000L)))
        }
        copies.reduce(_ union _).write.mode("overwrite").parquet(s"$big/$t.parquet")
      } finally if (t == "events") {
        prior match {
          case Some(v) => spark.conf.set(flag, v)
          case None    => spark.conf.unset(flag)
        }
      }
    }
    if (!reuse) {
    rep("lineitem", Seq("l_orderkey"))
    rep("orders", Seq("o_orderkey"))
    rep("documents", Seq("doc_id"))
    rep("embeddings", Seq("vec_id"))
    // events replicate on user_id (same ts range: 8x the rows land in
    // the SAME windows — the dense-traffic shape the streaming
    // monitors' per-window aggregates must absorb)
    rep("events", Seq("user_id"))
    }
    // Salted replication: every copy rewrites each token with a
    // copy-specific suffix, so copies share NO shingles — cross-copy
    // near-dup pairs are zero and the corpus keeps sf0.1's own
    // (realistic, low) dup rate, instead of the plain replication whose
    // identical texts make the true pair count quadratic in mult. The 1×
    // frame gets the same i=0 rewrite so both sides pay identical
    // tokenize/concat cost and the ratio isolates the operator.
    def salted(i: Int) = spark.read.parquet(s"$src/documents.parquet")
      .withColumn("doc_id", col("doc_id") + lit(i * 10000000L))
      .withColumn("text", array_join(
        transform(split(col("text"), " "), t => concat(t, lit(s"_$i"))), " "))
    if (!reuse) {
    salted(0).write.mode("overwrite").parquet(s"$big/documents_salt1.parquet")
    (0 until mult).map(salted).reduce(_ union _)
      .write.mode("overwrite").parquet(s"$big/documents_saltN.parquet")
    // the reuse contract is "same data at the SAME mult": record which
    // mult built this replication so a later `reuse` run can refuse a
    // mismatched one instead of silently timing the wrong scale
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$big/mult.txt"),
      mult.toString.getBytes("UTF-8"))
    }
    if (reuse) {
      val mf = java.nio.file.Paths.get(s"$big/mult.txt")
      require(java.nio.file.Files.exists(mf),
        s"reuse: $big/mult.txt missing — the replication predates the " +
          "mult marker (or never ran); re-run without `reuse`")
      val prior = new String(java.nio.file.Files.readAllBytes(mf),
        "UTF-8").trim
      require(prior == mult.toString,
        s"reuse: $big was replicated at mult=$prior, this run asks " +
          s"mult=$mult — ratios would silently measure the wrong " +
          "scale; re-run without `reuse`")
    }
    def time(label: String)(f: String => Long): Unit = {
      if (only.nonEmpty && !only.exists(label.contains)) return
      def once(dir: String): Double = {
        val t0 = System.nanoTime(); f(dir); (System.nanoTime() - t0) / 1e9
      }
      once(src) // warm
      val t1 = once(src); val tN = once(big)
      println(f"SCALE $label 1x=${t1}%.2f s ${mult}x=${tN}%.2f s ratio=${tN / t1}%.1f")
    }
    time("agg_stats") { d => SparkEntry.queries("q_agg_stats")(spark, d).count() }
    time("join_smj") { d => SparkEntry.queries("q_join_smj")(spark, d).count() }
    time("topk") { d => SparkEntry.queries("q_o4_topk")(spark, d).count() }
    time("dedup_exact") { d => SparkEntry.queries("q_dedup_exact")(spark, d).count() }
    time("dedup_minhash") { d => SparkEntry.queries("q_dedup_minhash")(spark, d).count() }
    time("dedup_ngram") { d => SparkEntry.queries("q_dedup_ngram")(spark, d).count() }
    time("ann_topk") { d => SparkEntry.queries("q_ann_topk")(spark, d).count() }
    // round-6 pipeline operators (semdedup probes the raw operator — the
    // query wraps it in a derived check whose exact all-pairs baseline is
    // deliberately quadratic and would dominate the probe)
    time("repetition") { d => SparkEntry.queries("q_text_repetition")(spark, d).count() }
    time("decontaminate") { d => SparkEntry.queries("q_decontaminate")(spark, d).count() }
    time("pack_sequences") { d => SparkEntry.queries("q_pack_sequences")(spark, d).count() }
    time("shard") { d => SparkEntry.queries("q_shard")(spark, d).count() }
    time("vocab") { d => SparkEntry.queries("q_vocab")(spark, d).count() }
    time("tfidf") { d => SparkEntry.queries("q_tfidf")(spark, d).count() }
    time("semdedup") { d =>
      graft.ops.Similarity.semDedupPairs(
        spark.read.parquet(s"$d/embeddings.parquet"), "embedding", "vec_id",
        threshold = 0.4, nlist = 8).count()
    }
    // round-7 operators. Queries probe as-is where the q_ entry IS the
    // operator; ANN ops probe raw (their q_ entries wrap a brute-force
    // recall audit). nlist scales with the corpus for IVF-PQ — that is
    // the documented dial (cells sized to a constant occupancy).
    time("dedup_substring") { d =>
      SparkEntry.queries("q_dedup_substring")(spark, d).count() }
    time("shuffle") { d => SparkEntry.queries("q_shuffle")(spark, d).count() }
    time("select_budget") { d =>
      SparkEntry.queries("q_select_budget")(spark, d).count() }
    time("zorder_write") { d =>
      graft.ops.Sampling.zorderWrite(
        spark.read.parquet(s"$d/lineitem.parquet"),
        Seq("l_partkey", "l_suppkey"), "/root/repo/target/probe_zorder",
        nFiles = 32)
      1L
    }
    time("bm25_index_build+search") { d =>
      graft.ops.TextAnalysis.buildTextIndex(
        spark.read.parquet(s"$d/documents.parquet"), "text", "doc_id",
        "/root/repo/target/probe_bm25", nBuckets = 16)
      graft.ops.TextAnalysis.bm25SearchIndex(spark,
        "/root/repo/target/probe_bm25",
        Seq("spark", "merge", "window", "hash"), topK = 50).count()
    }
    time("ann_pq") { d =>
      val emb = spark.read.parquet(s"$d/embeddings.parquet")
      val q = emb.orderBy("vec_id").limit(10)
      graft.ops.Similarity.pqTopK(q, emb, "vec_id", "embedding",
        "vec_id", "embedding", k = 5, m = 16, ksub = 32, refine = 16).count()
    }
    // SQ8: d-row min/max fit, byte-decode scoring scan, broadcast re-rank
    time("ann_sq8") { d =>
      val emb = spark.read.parquet(s"$d/embeddings.parquet")
      val q = emb.orderBy("vec_id").limit(10)
      graft.ops.Similarity.sq8TopK(q, emb, "vec_id", "embedding",
        "vec_id", "embedding", k = 5, refine = 4).count()
    }
    // PCAR+PQ: one covariance pass + driver Jacobi on top of the PQ
    // shape; the ADC scan runs in the 48-dim rotation
    time("ann_pcapq") { d =>
      val emb = spark.read.parquet(s"$d/embeddings.parquet")
      val q = emb.orderBy("vec_id").limit(10)
      graft.ops.Similarity.pcaPqTopK(q, emb, "vec_id", "embedding",
        "vec_id", "embedding", k = 5, pcaK = 48, m = 16, ksub = 32,
        refine = 24).count()
    }
    // persisted PCAR-PQ: build (fit + two writes) + search per scale
    time("ann_pcapq_index") { d =>
      val emb = spark.read.parquet(s"$d/embeddings.parquet")
      val q = emb.orderBy("vec_id").limit(10)
      graft.ops.Similarity.buildPcaPqIndex(emb, "vec_id", "embedding",
        "/root/repo/target/probe_pcapq_idx", pcaK = 48, m = 16, ksub = 32)
      graft.ops.Similarity.pcaPqSearchIndex(spark,
        "/root/repo/target/probe_pcapq_idx", q, "vec_id", "embedding",
        k = 5, refine = 24).count()
    }
    // round-8/9 operators: the q_ entry IS the operator for all three
    time("dedup_rewrite") { d =>
      SparkEntry.queries("q_dedup_rewrite")(spark, d).count() }
    time("dsir") { d => SparkEntry.queries("q_dsir")(spark, d).count() }
    time("cap_stratum") { d =>
      SparkEntry.queries("q_cap_stratum")(spark, d).count() }
    // round-11 operators: the q_ entry IS the operator for all four.
    // temperature = bounded census + CASE-literal scan; ccnet = surprisal
    // aggs + 2-row percentile broadcast; normalize / c4_clean = pure
    // scan-side Column algebra (expect ~scan-bound slopes)
    time("temperature") { d =>
      SparkEntry.queries("q_temperature")(spark, d).count() }
    time("ccnet") { d => SparkEntry.queries("q_ccnet")(spark, d).count() }
    // NB: .count() would prune a pure-projection query's expressions
    // away entirely — aggregate over the computed column to force them
    time("normalize") { d =>
      SparkEntry.queries("q_normalize")(spark, d)
        .agg(sum(length(col("norm_text")))).collect(); 1L }
    time("c4_clean") { d =>
      SparkEntry.queries("q_c4_clean")(spark, d)
        .agg(sum(length(col("clean_text"))), sum("n_kept")).collect(); 1L }
    // BPE: training = one word hash-agg (top-maxWords collect, bounded)
    // + constant driver merge loop; application = broadcast ranks +
    // narrow memoized pass — both should track the scan, near-linear
    time("bpe_train+apply") { d =>
      val docs = spark.read.parquet(s"$d/documents.parquet")
      val merges = graft.ops.Bpe.learnBpe(docs, "text", numMerges = 100,
        maxWords = 20000)
      graft.ops.Bpe.applyBpe(docs, "text", merges)
        .agg(sum("n_bpe_tokens")).collect()
      1L
    }
    // quality classifier: featurize scan + bounded-iteration tree-aggs
    // (iters cut to 30 for the probe — the slope of interest is the
    // per-iteration corpus scan, not the fixed iteration count)
    time("quality_clf_train") { d =>
      val docs = spark.read.parquet(s"$d/documents.parquet")
        .withColumn("label",
          (graft.ops.TextAnalysis.stopwordRatio(col("text")) > 0.06).cast("int"))
      graft.ops.Classifier.trainHashedLR(docs, "text", "label",
        buckets = 1 << 12, iters = 30, lr = 1.0)
      1L
    }
    // classifier SCORING alone at the default 2^15 buckets: the dense-
    // array-literal Column scorer — should track the scan (the weight
    // vector rides the plan; no shuffle, no join)
    time("quality_clf_score") { d =>
      val docs = spark.read.parquet(s"$d/documents.parquet")
      // deterministic synthetic weights: isolates scoring from training
      val b = 1 << 15
      val w = Array.tabulate(b + 2)(i => ((i * 2654435761L & 0xffff) - 32768) / 1e6)
      val m = graft.ops.Classifier.LinearTextModel(w, 0.1)
      graft.ops.Classifier.scoreHashedLR(docs, "text", m)
        .agg(sum("quality_score")).collect()
      1L
    }
    // unigram-LM tokenizer: training = one word hash-agg (bounded) +
    // driver EM; application = broadcast-scores Viterbi scan — like BPE,
    // both should track the corpus scan
    time("unigram") { d =>
      val docs = spark.read.parquet(s"$d/documents.parquet")
      val m = graft.ops.UnigramLm.learnUnigram(docs, "text",
        vocabSize = 800, maxWords = 20000)
      graft.ops.UnigramLm.applyUnigram(docs, "text", m)
        .agg(sum("n_uni_pieces")).collect()
      1L
    }
    // WordPiece: same shape as BPE/unigram — bounded word hash-agg +
    // driver merge loop, broadcast-vocab greedy scan — expect scan-bound
    time("wordpiece") { d =>
      val docs = spark.read.parquet(s"$d/documents.parquet")
      val vocab = graft.ops.WordPiece.learnWordPiece(docs, "text",
        vocabSize = 400, maxWords = 20000)
      graft.ops.WordPiece.applyWordPiece(docs, "text", vocab)
        .agg(sum("n_wp_tokens")).collect()
      1L
    }
    // PCA: fit = ONE covariance treeAggregate (d² driver state) +
    // driver Jacobi (corpus-independent); project = scan-side
    // AffineProject — both passes should track the embedding scan
    time("pca_fit+project") { d =>
      val emb = spark.read.parquet(s"$d/embeddings.parquet")
      val m = graft.ops.Pca.fitPca(emb, "embedding")
      graft.ops.Pca.projectPca(emb, "embedding", "vec_id", m, whiten = true)
        .agg(sum(element_at(col("pca"), 1))).collect()
      1L
    }
    // bigram LM: two scan-side explodes + vocab-keyed model join +
    // broadcast capped bigram model — expect the unigram-surprisal shape
    time("bigram_lm") { d =>
      SparkEntry.queries("q_bigram_lm")(spark, d).count() }
    // ES weighted sampling: scan-side jitter + TakeOrdered bounded heaps
    time("sample_weighted") { d =>
      SparkEntry.queries("q_sample_weighted")(spark, d).count() }
    // semantic decontamination: broadcast bench embeddings × corpus scan
    // + partial-agg'd per-doc max — expect the broadcast-ANN shape
    time("decon_semantic") { d =>
      SparkEntry.queries("q_decontaminate_semantic")(spark, d).count() }
    // physical pack assembly: the packSequences walk with the id payload
    // threaded through — one group-keyed shuffle, streaming pack emission
    time("pack_assemble") { d =>
      SparkEntry.queries("q_pack_assemble")(spark, d)
        .agg(sum("n_ids")).collect(); 1L }
    // k-means curation clustering: fit touches only the bounded sample
    // (capped at 100k rows — constant beyond that corpus size), the
    // assignment is one codegen scan — expect ~scan-bound growth until
    // the sample cap bites, then better
    time("cluster") { d =>
      val emb = spark.read.parquet(s"$d/embeddings.parquet")
      graft.ops.Similarity.kmeansCluster(emb, "embedding", "vec_id", k = 8)
        .agg(sum("cluster")).collect(); 1L }
    // span scrub: broadcast bench grams × corpus positional-gram explode,
    // doc-keyed hit agg + join back, scan-side mask rebuild — expect the
    // decontaminate slope plus the O(tokens) reassembly scan
    time("decon_scrub") { d =>
      SparkEntry.queries("q_decontaminate_scrub")(spark, d)
        .agg(sum(length(col("scrub_text"))), sum("n_removed")).collect(); 1L }
    // keep-first line dedup: scan-side posexplode, line-keyed min-agg
    // (partial agg absorbs boilerplate skew), co-partitioned join back,
    // one doc-keyed reassembly — line bytes cross the wire once
    time("dedup_lines") { d =>
      SparkEntry.queries("q_dedup_lines")(spark, d).count() }
    // minhash on a REALISTIC input (constant dup rate, cross-copy shingle
    // spaces disjoint) — the q_dedup_minhash probe above replicates
    // identical texts, so its true pair count is quadratic in mult and
    // the measured slope conflates output size with operator cost
    time("minhash_realistic") { d =>
      val p = if (d == big) s"$big/documents_saltN.parquet"
              else s"$big/documents_salt1.parquet"
      graft.ops.Dedup.minHashDedup(spark.read.parquet(p), "text", "doc_id",
        threshold = 0.6).count()
    }
    // same realistic input for the exact ngram pair generator — the
    // q_dedup_ngram probe above replicates identical texts (quadratic
    // true pair count); this measures the operator at a constant dup rate
    time("ngram_realistic") { d =>
      val p = if (d == big) s"$big/documents_saltN.parquet"
              else s"$big/documents_salt1.parquet"
      graft.ops.Dedup.ngramJaccardPairs(spark.read.parquet(p), "text",
        "doc_id", Nil, n = 3, threshold = 0.6).count()
    }
    // (the r13 lineitem fragment_depth probe was superseded in r16 by
    // the deeper 1x/Nx frag_depth probe at the end of this main — one
    // measured basis for the compaction cadence, not two)

    time("ann_ivfpq_index") { d =>
      val emb = spark.read.parquet(s"$d/embeddings.parquet")
      val nl = if (d == big) 8 * mult else 8
      graft.ops.Similarity.buildIvfPqIndex(emb, "vec_id", "embedding",
        "/root/repo/target/probe_ivfpq", nlist = nl, m = 16, ksub = 32)
      val q = emb.orderBy("vec_id").limit(10)
      graft.ops.Similarity.ivfPqSearchIndex(spark,
        "/root/repo/target/probe_ivfpq", q, "vec_id", "embedding",
        k = 5, nprobe = 4, refine = 16).count()
    }
    // round-12 operators. interleave = census ranks + broadcast sizes +
    // one position sort + census zip (expect the deterministic-shuffle
    // class, ~2×); compressibility + media sniff are scan-side UDF
    // projections whose q_ entries already aggregate (expect ~scan-bound)
    time("interleave") { d =>
      SparkEntry.queries("q_interleave")(spark, d).count() }
    time("compress_ratio") { d =>
      SparkEntry.queries("q_compress_ratio")(spark, d).count() }
    time("media_sniff") { d =>
      SparkEntry.queries("q_media_sniff")(spark, d).count() }
    // keep-first span dedup: on the identical-copies corpus EVERY gram is
    // duplicated, so this is the worst-case mask density — cost must stay
    // O(tokens) (gram explode + df census + min-struct agg + rebuild)
    time("dedup_spans") { d =>
      SparkEntry.queries("q_dedup_spans")(spark, d).count() }
    // end-to-end recipe on the IDENTICAL-COPIES corpus: the exact-dedup
    // stage collapses the 8 copies (hash-agg, linear), so downstream
    // near-dup/decontaminate/interleave run at unique-document scale —
    // the shape a dedup pipeline is FOR; not an output-quadratic probe
    time("curation_e2e") { d =>
      SparkEntry.queries("q_curation_e2e")(spark, d).count() }
    // full pretraining chain INCLUDING both binary sinks and their
    // read-back verification legs: same identical-copies corpus as
    // curation_e2e (exact dedup collapses the copies early), so the
    // sink+verify stages run at unique-document scale — the probe
    // measures the composed write→read→re-hash cost, not output blowup
    time("pretrain_e2e") { d =>
      SparkEntry.queries("q_pretrain_e2e")(spark, d).count() }
    // Gopher duplicate line/para fractions: pure scan-side array algebra
    // over the reshaped text — expect ~scan-bound
    time("gopher_dup") { d =>
      SparkEntry.queries("q_gopher_dup")(spark, d)
        .agg(sum("dup_line_frac"), sum("dup_para_char_frac")).collect(); 1L }
    // image perceptual-hash near-dup: one synthetic PNG per doc pushed
    // through real decode → dHash → quarter-blocked Hamming join — decode
    // dominates and is embarrassingly parallel, expect ~linear
    time("image_neardup") { d =>
      import org.apache.spark.sql.Encoders
      val ids = spark.read.parquet(s"$d/documents.parquet")
        .select("doc_id").as[Long](Encoders.scalaLong)
      val items = ids.map(id => graft.ops.Multimodal.syntheticGridImage(
        id, id / 2, flipBit = id % 2 == 1))(
        Encoders.product[graft.ops.Multimodal.MediaItem])
      graft.ops.Multimodal.imageNearDup(items).count()
    }
    // PageRank: 10 synchronous iterations over a 3-regular graph on the
    // documents — per-iteration cost is one co-partitioned join + one
    // agg, so expect ~linear in nodes (constant per-iteration overhead
    // dominates at this scale)
    time("pagerank") { d =>
      val nodes = spark.read.parquet(s"$d/documents.parquet")
        .select(col("doc_id").cast("long").as("node"))
      val nMod = nodes.count()
      val edges = Seq((7L, 3L), (13L, 5L), (29L, 11L)).map { case (k, c) =>
        nodes.select(col("node").as("src"),
          ((col("node") * k + c) % nMod).as("dst"))
      }.reduce(_ unionByName _)
      graft.ops.Graph.pageRank(edges, "src", "dst", iters = 10)
        .agg(sum("rank")).collect(); 1L
    }
    // harmonic centrality, both paths on the 3-map graph: the exact BFS
    // carries the discovered PAIR set (state ~ n·ball — the documented
    // test-scale baseline), HyperBall carries m=128 bytes per node —
    // the pair probes how each state shape absorbs 8× nodes
    time("harmonic_exact") { d =>
      val nodes = spark.read.parquet(s"$d/documents.parquet")
        .select(col("doc_id").cast("long").as("node"))
      val nMod = nodes.count()
      val edges = Seq((7L, 3L), (13L, 5L), (29L, 11L)).map { case (k, c) =>
        nodes.select(col("node").as("src"),
          ((col("node") * k + c) % nMod).as("dst"))
      }.reduce(_ unionByName _)
      graft.ops.Graph.harmonicCentralityExact(edges, "src", "dst", maxDepth = 4)
        .agg(sum("harmonic")).collect(); 1L
    }
    time("harmonic_hyperball") { d =>
      val nodes = spark.read.parquet(s"$d/documents.parquet")
        .select(col("doc_id").cast("long").as("node"))
      val nMod = nodes.count()
      val edges = Seq((7L, 3L), (13L, 5L), (29L, 11L)).map { case (k, c) =>
        nodes.select(col("node").as("src"),
          ((col("node") * k + c) % nMod).as("dst"))
      }.reduce(_ unionByName _)
      graft.ops.Graph.harmonicCentralityHyperBall(edges, "src", "dst",
        maxDepth = 4, logM = 7)
        .agg(sum("harmonic")).collect(); 1L
    }
    // same graph with convergence early-stop: iteration budget 50 but
    // tol halts well short of it — the probe records how many of the 50
    // the L1-delta criterion actually spends (the saved-iterations story)
    time("pagerank_tol") { d =>
      val nodes = spark.read.parquet(s"$d/documents.parquet")
        .select(col("doc_id").cast("long").as("node"))
      val nMod = nodes.count()
      val edges = Seq((7L, 3L), (13L, 5L), (29L, 11L)).map { case (k, c) =>
        nodes.select(col("node").as("src"),
          ((col("node") * k + c) % nMod).as("dst"))
      }.reduce(_ unionByName _)
      val (ranks, it, _) = graft.ops.Graph.pageRankCore(
        edges, "src", "dst", iters = 50, tol = 1e-7)
      ranks.agg(sum("rank")).collect()
      println(s"DBG pagerank_tol iters_run=$it of 50")
      it.toLong
    }
    // well-connected probe graph (r14): the shifted-copy replica ids make
    // the plain 3-map graph sink-heavy (~7/8 of the dst range out-degree
    // 0 — the r13 SCALE.md admission), so ball growth never exercised
    // the two state shapes. Rank the ids DENSE first: over a contiguous
    // 0..n-1 range the three maps are near-bijections, out-degree is 3
    // everywhere, and depth-4 in-balls reach ~3+9+27+81 ≈ 120 nodes.
    def denseEdges(d: String): (org.apache.spark.sql.DataFrame, Long) = {
      import org.apache.spark.sql.expressions.Window
      val nodes = spark.read.parquet(s"$d/documents.parquet")
        .select((row_number().over(Window.orderBy("doc_id")) - 1)
          .cast("long").as("node"))
      val nMod = nodes.count()
      (Seq((7L, 3L), (13L, 5L), (29L, 11L)).map { case (k, c) =>
        nodes.select(col("node").as("src"),
          ((col("node") * k + c) % nMod).as("dst"))
      }.reduce(_ unionByName _), nMod)
    }
    // ball-size census — the state-shape crossover that justifies the
    // HLL path: exact BFS state = the discovered pair set (~16 B/pair),
    // HyperBall = 2^logM + ~40 B per node. HLL wins once the average
    // ball exceeds (128+40)/16 ≈ 10.5 nodes; the census prints the
    // measured average so SCALE.md can record where this graph sits.
    time("graph_census") { d =>
      val (edges, n) = denseEdges(d)
      val (seen, _, e) = graft.ops.Graph.discoveredPairs(edges, "src", "dst", 4)
      val pairs = seen.count()
      e.unpersist(false)
      println(f"DBG graph_census dir=$d nodes=$n pairs=$pairs " +
        f"avg_ball=${pairs.toDouble / n}%.1f " +
        f"exact_state_mb=${pairs * 16 / 1e6}%.2f " +
        f"hll_state_mb=${n * 168 / 1e6}%.2f")
      pairs
    }
    time("harmonic_exact_dense") { d =>
      val (edges, _) = denseEdges(d)
      graft.ops.Graph.harmonicCentralityExact(edges, "src", "dst", maxDepth = 4)
        .agg(sum("harmonic")).collect(); 1L
    }
    time("harmonic_hyperball_dense") { d =>
      val (edges, _) = denseEdges(d)
      graft.ops.Graph.harmonicCentralityHyperBall(edges, "src", "dst",
        maxDepth = 4, logM = 7)
        .agg(sum("harmonic")).collect(); 1L
    }
    // triangle counting + link prediction on the dense graph: wedge
    // volume is the cost driver for both (O(m^1.5) oriented for
    // triangles, O(sum deg^2) capped for link prediction)
    time("triangles_dense") { d =>
      val (edges, _) = denseEdges(d)
      graft.ops.Graph.triangleCounts(edges, "src", "dst")
        .agg(sum("triangles")).collect(); 1L
    }
    time("link_predict_dense") { d =>
      val (edges, _) = denseEdges(d)
      graft.ops.Graph.linkPredictionScores(edges, "src", "dst",
        minCommon = 2).count()
    }
    time("kcore_dense") { d =>
      val (edges, _) = denseEdges(d)
      graft.ops.Graph.kCore(edges, "src", "dst", k = 5).count()
    }
    // connected components on the WORST round-count shape for the star
    // alternation — long chains (residue classes mod 7 over the dense id
    // range; 8x data makes the chains 8x LONGER, so this also probes the
    // O(log^2 n) round bound, the property that beats label flooding's
    // O(diameter)); two bridges keep the merge logic on the path
    time("components") { d =>
      import org.apache.spark.sql.expressions.Window
      val nodes = spark.read.parquet(s"$d/documents.parquet")
        .select((row_number().over(Window.orderBy("doc_id")) - 1)
          .cast("long").as("node"))
      val nMod = nodes.count()
      val edges = nodes.filter(col("node") + 7 < nMod)
        .select(col("node").as("src"), (col("node") + lit(7L)).as("dst"))
        .unionByName(spark.range(2).select((col("id") * 2).as("src"),
          (col("id") * 2 + 1).as("dst")))
      val comps = graft.ops.Graph.connectedComponents(edges, "src", "dst")
      val n = comps.select("component").distinct().count()
      println(s"DBG components dir=$d n_components=$n")
      n
    }
    // HITS on the dense 3-map graph: per-iteration two co-partitioned
    // joins + two aggregates off the twin edge caches — expect the
    // pagerank-like ~flat per-iteration cost
    time("hits_dense") { d =>
      val (edges, _) = denseEdges(d)
      graft.ops.Graph.hits(edges, "src", "dst", iters = 5)
        .agg(sum("hub")).collect(); 1L
    }
    // SCC coloring on the block-cycle graph (8x data = 8x more 5-node
    // SCCs, same 2 peel rounds and ~7-step floods by construction):
    // per inner step one co-partitioned join + one agg off the twin
    // edge caches — expect the flat iterative band
    time("scc") { d =>
      import org.apache.spark.sql.expressions.Window
      val nodes = spark.read.parquet(s"$d/documents.parquet")
        .select((row_number().over(Window.orderBy("doc_id")) - 1)
          .cast("long").as("node"))
      val nMod = nodes.count()
      val cycles = nodes.select(col("node").as("src"),
        (expr("CAST(node AS BIGINT) div 25") * 25 +
          (col("node") % 25 + 5) % 25).as("dst"))
      val bridges = nodes.filter(col("node") % 50 === 0 &&
          col("node") + 25 < nMod)
        .select(col("node").as("src"), (col("node") + 25).as("dst"))
      val comps = graft.ops.Graph.stronglyConnectedComponents(
        cycles.unionByName(bridges), "src", "dst")
      val n = comps.select("component").distinct().count()
      println(s"DBG scc dir=$d n_scc=$n")
      n
    }
    // deterministic random walks (DeepWalk preprocessing): frontier is
    // O(n) rows at EVERY step (paths ride along, they are the product),
    // each step one co-partitioned edge join + one per-walk argmin agg —
    // expect the pagerank-like linear band
    time("walks_dense") { d =>
      val (edges, _) = denseEdges(d)
      graft.ops.Graph.randomWalks(edges, "src", "dst", length = 10)
        .agg(sum("n_steps")).collect(); 1L
    }
    // SFT chat rendering: conversation COUNT scales with the corpus
    // (fixed ~12 turns each), so the one conversation-keyed aggregate
    // should ride the scan ~linearly
    time("sft_chat") { d =>
      val docs = spark.read.parquet(s"$d/documents.parquet")
      val k = math.max(1L, docs.count() / 12)
      val turns = docs.select(
        (col("doc_id").cast("long") % k).as("conv"),
        col("doc_id").cast("long").as("ord"),
        when(col("doc_id").cast("long") % 2 === 0, "user")
          .otherwise("assistant").as("role"), col("text"))
      graft.ops.Sft.renderChat(turns, "conv", "ord", "role", "text")
        .agg(sum("masked_chars")).collect(); 1L
    }
    // offline FFD packing vs the greedy streaming baseline: the probe
    // records the slope AND the measured pad-waste reduction (DBG line)
    time("pack_ffd") { d =>
      val docs = spark.read.parquet(s"$d/documents.parquet")
      val tc = graft.ops.TextAnalysis.tokenCount(col("text"))
      val ffd = graft.ops.Sampling.packSequencesFFD(docs, "source", "doc_id",
        tc, maxTokens = 128)
      val greedy = graft.ops.Sampling.packSequences(docs, "source", "doc_id",
        tc, maxTokens = 128)
      val wf = graft.ops.Sampling.packWasteStats(ffd, "source", 128)
        .agg(sum("pad_waste"), sum("n_packs")).head()
      val wg = graft.ops.Sampling.packWasteStats(greedy, "source", 128)
        .agg(sum("pad_waste"), sum("n_packs")).head()
      println(s"DBG pack_ffd dir=$d waste_ffd=${wf.getLong(0)} " +
        s"packs_ffd=${wf.getLong(1)} waste_greedy=${wg.getLong(0)} " +
        s"packs_greedy=${wg.getLong(1)}")
      wf.getLong(0)
    }
    // S13 convert round-trip: parquet → zarr → parquet on orders (the
    // one S13 path without a scale measurement — r13 verdict #8). Both
    // legs are full-table rewrites, so expect ~linear in rows; the
    // checksum equality makes the probe a correctness witness too.
    time("convert_zarr_roundtrip") { d =>
      val zr = "/root/repo/target/probe_zarr_rt/z"
      val pq = "/root/repo/target/probe_zarr_rt/p"
      val fs = new org.apache.hadoop.fs.Path(zr)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path("/root/repo/target/probe_zarr_rt"), true)
      // o_orderdate is a timestamp — a type zarr deliberately refuses;
      // the pruned column list also exercises S13's -c selection leg
      graft.api.ConvertApp.convert(spark, graft.api.ConvertApp.Args(
        input = s"$d/orders.parquet", output = zr, format = "zarr",
        columns = Some(Seq("o_orderkey", "o_custkey", "o_orderstatus",
          "o_totalprice"))))
      graft.api.ConvertApp.convert(spark, graft.api.ConvertApp.Args(
        input = zr, output = pq, format = "parquet"))
      def sig(path: String): (Long, Long) = {
        val t = graft.api.MSTable.open(spark, path)
        val r = t.agg(count(lit(1)),
          expr("bit_xor(xxhash64(o_orderkey, o_totalprice, o_orderstatus))"))
          .head()
        (r.getLong(0), r.getLong(1))
      }
      val (n0, h0) = sig(s"$d/orders.parquet")
      val (n1, h1) = sig(pq)
      require(n0 == n1 && h0 == h1,
        s"zarr round-trip mismatch: ($n0,$h0) vs ($n1,$h1)")
      n1
    }
    // audio amplitude-contour near-dup: WAV synth + real PCM decode per
    // doc — same shape as image_neardup, expect ~linear
    time("audio_neardup") { d =>
      import org.apache.spark.sql.Encoders
      val ids = spark.read.parquet(s"$d/documents.parquet")
        .select("doc_id").as[Long](Encoders.scalaLong)
      val items = ids.map(id => graft.ops.Multimodal.syntheticToneWav(
        id, id / 2, flipBit = id % 2 == 1))(
        Encoders.product[graft.ops.Multimodal.MediaItem])
      graft.ops.Multimodal.audioNearDup(items).count()
    }
    // TokenBin sink+source: one hash repartition + streaming binary append,
    // then a shard-per-partition scan back — expect ~linear in tokens
    // (shards scale with the corpus: constant tokens per shard)
    time("tokenbin_write+read") { d =>
      val nt = graft.ops.TextAnalysis.tokenCount(col("text"))
      val enc = spark.read.parquet(s"$d/documents.parquet")
        .select(col("doc_id"),
          when(nt < 1, array().cast("array<int>"))
            .otherwise(sequence(lit(1), nt)).as("ids"))
      // distinct dir per scale: a shared dir would leave the N× run's
      // higher-numbered shard files for a later 1× read to pick up
      val out = s"/root/repo/target/probe_tokenbin_${if (d == big) "N" else "1"}"
      val sh = if (d == big) 32 * mult else 32
      graft.sources.TokenBin.write(enc, "doc_id", "ids", out, shards = sh)
      spark.read.format("tokenbin").load(out)
        .agg(sum(size(col("ids")))).collect()
      1L
    }
    // round-13 operators. Salted customer replication for the fuzzy pair
    // join: copies keep their own digit-neighbor pair structure but the
    // 4-char copy suffix holds cross-copy names > 1 edit apart, so the
    // true pair count scales ~linearly with mult (plain replication would
    // make every name an exact cross-copy duplicate — quadratic output)
    def saltedCust(i: Int) = spark.read.parquet(s"$src/customer.parquet")
      .withColumn("c_custkey", col("c_custkey") + lit(i * 10000000L))
      .withColumn("c_name", concat(col("c_name"), lit(s"_$i$i$i$i")))
    // gate must list EVERY probe label that reads the salted parquet —
    // fuzzy_probe_index/inline consume it too, so a filtered fresh run
    // of just those probes must still trigger the write. `reuse` only
    // promises the BIG replication exists; the salted tables are built
    // by the fuzzy section itself, so a reuse run on a box whose prior
    // run was FILTERED past this section must still write them (an r17
    // `all,reuse` sweep died exactly here). Readiness = _SUCCESS plus
    // this section's OWN mult marker — the global mult.txt can't vouch
    // for tables a filtered run skipped rebuilding, and a salted table
    // from a different mult would silently time the wrong scale.
    val saltMark = java.nio.file.Paths.get(s"$big/customer_salt_mult.txt")
    val saltReady =
      new java.io.File(s"$big/customer_saltN.parquet/_SUCCESS").exists &&
      new java.io.File(s"$big/customer_salt1.parquet/_SUCCESS").exists &&
      java.nio.file.Files.exists(saltMark) &&
      new String(java.nio.file.Files.readAllBytes(saltMark), "UTF-8")
        .trim == mult.toString
    if ((!reuse || !saltReady) &&
        (only.isEmpty || only.exists(
          ("fuzzy_pairs_unique fuzzy_pairs_d2 fuzzy_snm " +
            "fuzzy_probe_index fuzzy_probe_inline").contains))) {
      saltedCust(0).write.mode("overwrite").parquet(s"$big/customer_salt1.parquet")
      (0 until mult).map(saltedCust).reduce(_ union _)
        .write.mode("overwrite").parquet(s"$big/customer_saltN.parquet")
      java.nio.file.Files.write(saltMark, mult.toString.getBytes("UTF-8"))
    }
    time("fuzzy_pairs") { d =>
      val p = if (d == big) s"$big/customer_saltN.parquet"
              else s"$big/customer_salt1.parquet"
      graft.ops.Fuzzy.editDistancePairs(spark.read.parquet(p),
        "c_name", "c_custkey", maxDist = 1).count()
    }
    // same data with the exact-duplicate collapse skipped (names are
    // unique here, so this isolates the collapse overhead the default
    // pays as insurance against corpus-scale duplicate skew)
    time("fuzzy_pairs_unique") { d =>
      val p = if (d == big) s"$big/customer_saltN.parquet"
              else s"$big/customer_salt1.parquet"
      graft.ops.Fuzzy.editDistancePairs(spark.read.parquet(p),
        "c_name", "c_custkey", maxDist = 1, collapseExact = false).count()
    }
    // index amortization: probe 1000 names against the salted reference,
    // inline (reference explode paid per probe batch) vs a prebuilt
    // matchAgainstIndex store (explode+distinct paid once at build) —
    // the per-batch probe cost is what repeated-ingest pipelines pay
    if (only.isEmpty || only.exists("fuzzy_probe_index".contains)) {
      def refPath(d: String) = if (d == big) s"$big/customer_saltN.parquet"
                               else s"$big/customer_salt1.parquet"
      def idx(d: String) = s"/root/repo/target/probe_fuzzy_idx_${if (d == big) "N" else "1"}"
      for (d <- Seq(src, big))
        graft.ops.Fuzzy.buildMatchIndex(spark.read.parquet(refPath(d)),
          "c_name", "c_custkey", idx(d), maxDist = 1)
      def probes(d: String) = spark.read.parquet(refPath(d))
        .filter(col("c_custkey") % 10000000L < 1000L)
        .limit(1000).localCheckpoint()
      for ((label, f) <- Seq[(String, String => Long)](
        "fuzzy_probe_inline" -> { d =>
          graft.ops.Fuzzy.matchAgainst(probes(d),
            spark.read.parquet(refPath(d)), "c_name", "c_custkey",
            "c_name", "c_custkey", maxDist = 1).count() },
        "fuzzy_probe_index" -> { d =>
          graft.ops.Fuzzy.matchAgainstIndex(spark, idx(d), probes(d),
            "c_name", "c_custkey").count() })) {
        def once(dir: String): Double = {
          val t0 = System.nanoTime(); f(dir); (System.nanoTime() - t0) / 1e9
        }
        once(src)
        val t1 = once(src); val tN = once(big)
        println(f"SCALE $label 1x=${t1}%.2f s ${mult}x=${tN}%.2f s ratio=${tN / t1}%.1f")
      }
    }
    // windowed co-occurrence: one tokenize + one Generate over all
    // offsets' zipped slices into a single pair hash-agg — scan-bound
    time("cooccurrence") { d =>
      graft.ops.TextAnalysis.cooccurrence(
        spark.read.parquet(s"$d/documents.parquet"), "text",
        window = 3, minCount = 2, topK = 50).count()
    }
    // coverage curve: one token hash-agg + four bounded TakeOrdered
    // jobs over the vocabulary — agg-scan-bound
    time("coverage_curve") { d =>
      graft.ops.TextAnalysis.coverageCurve(
        spark.read.parquet(s"$d/documents.parquet"), "text",
        ks = Seq(10, 100, 1000, 10000)).count()
    }
    // personalized PageRank: same per-iteration join+agg as pagerank
    // with the seed-teleport column riding the update join
    time("ppr") { d =>
      val nodes = spark.read.parquet(s"$d/documents.parquet")
        .select(col("doc_id").cast("long").as("node"))
      val nMod = nodes.count()
      val edges = Seq((7L, 3L), (13L, 5L), (29L, 11L)).map { case (k, c) =>
        nodes.select(col("node").as("src"),
          ((col("node") * k + c) % nMod).as("dst"))
      }.reduce(_ unionByName _)
      graft.ops.Graph.personalizedPageRank(edges, "src", "dst",
        nodes.filter(col("node") % 50 === 0).select(col("node").as("id")),
        "id", iters = 10)
        .agg(sum("rank")).collect(); 1L
    }
    // radius-2 deletion neighborhood: ~1 + L + L(L-1)/2 variant keys per
    // name (vs 1 + L at d=1, ~9× amplification at these name lengths) —
    // the probe records how that key blowup lands at 8× corpus scale
    time("fuzzy_pairs_d2") { d =>
      val p = if (d == big) s"$big/customer_saltN.parquet"
              else s"$big/customer_salt1.parquet"
      graft.ops.Fuzzy.editDistancePairs(spark.read.parquet(p),
        "c_name", "c_custkey", maxDist = 2).count()
    }
    // index-amortization crossover: grow the REFERENCE side until the
    // prebuilt matchAgainstIndex store beats inline matchAgainst on a
    // fixed 1000-probe batch — the number a user needs to decide whether
    // building the index is worth it. Opt-in (label fuzzy_crossover):
    // it writes its own reference sizes beyond the shared mult.
    if (only.exists("fuzzy_crossover".contains)) {
      for (m <- Seq(1, 8, 32, 96)) {
        val refP = s"/root/repo/target/probe_xover_ref_$m"
        // self-provisioning: these references are private to this block,
        // so "reuse" only skips them when they actually exist
        if (!reuse || !new java.io.File(s"$refP/_SUCCESS").exists)
          (0 until m).map(saltedCust).reduce(_ union _)
            .write.mode("overwrite").parquet(refP)
        val idxP = s"/root/repo/target/probe_xover_idx_$m"
        graft.ops.Fuzzy.buildMatchIndex(spark.read.parquet(refP),
          "c_name", "c_custkey", idxP, maxDist = 1)
        val probes = spark.read.parquet(refP)
          .filter(col("c_custkey") % 10000000L < 1000L)
          .limit(1000).localCheckpoint()
        def onceOf(f: () => Long): Double = {
          val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e9
        }
        val inlineF = () => graft.ops.Fuzzy.matchAgainst(probes,
          spark.read.parquet(refP), "c_name", "c_custkey",
          "c_name", "c_custkey", maxDist = 1).count()
        val indexF = () => graft.ops.Fuzzy.matchAgainstIndex(spark, idxP,
          probes, "c_name", "c_custkey").count()
        onceOf(inlineF); onceOf(indexF) // warm both paths
        val tIn = Seq(onceOf(inlineF), onceOf(inlineF)).min
        val tIx = Seq(onceOf(indexF), onceOf(indexF)).min
        println(f"SCALE fuzzy_crossover ref=${m}x15k inline=$tIn%.2f s " +
          f"index=$tIx%.2f s ratio=${tIx / tIn}%.2f")
      }
    }
    // sorted-neighborhood linkage: one global sort + census positions +
    // an offset equi-join — expect the deterministic-shuffle class
    time("fuzzy_snm") { d =>
      val p = if (d == big) s"$big/customer_saltN.parquet"
              else s"$big/customer_salt1.parquet"
      graft.ops.Fuzzy.sortedNeighborhoodPairs(spark.read.parquet(p),
        "c_name", "c_custkey", window = 8, maxDist = 2,
        assumeDeterministic = true).count()
    }
    // corpus JS divergence: explode → (source, word) agg → word-keyed
    // pair join whose per-word output is bounded by sources² — the
    // replicated corpus keeps the same 20 sources, so expect ~scan-bound
    time("corpus_divergence") { d =>
      SparkEntry.queries("q_corpus_divergence")(spark, d)
        .agg(sum("js_divergence")).collect(); 1L }
    // per-source top-k terms: hash-agg then a rank window over the
    // aggregated (source, token) frame — expect ~scan-bound
    time("top_terms") { d =>
      SparkEntry.queries("q_top_terms")(spark, d).count() }
    // NPMI collocations: bigram + unigram hash-aggs, TakeOrdered top-k —
    // expect ~scan-bound; q_phrases adds the driver-artifact mine, the
    // scan-side merge, and the restore-check aggregate on top
    time("collocations") { d =>
      SparkEntry.queries("q_collocations")(spark, d).count() }
    time("phrases") { d =>
      SparkEntry.queries("q_phrases")(spark, d).count() }
    // round-14 late additions. The two cascade ANN tiers probe raw (their
    // q_ entries wrap a brute-force recall audit); both are one corpus
    // scan + a broadcast re-rank, so the slope should be the scan's.
    time("ann_matryoshka") { d =>
      val emb = spark.read.parquet(s"$d/embeddings.parquet")
      val q = emb.orderBy("vec_id").limit(10)
      graft.ops.Similarity.matryoshkaTopK(q, emb, "vec_id", "embedding",
        "vec_id", "embedding", k = 5, dim = 32, refine = 8).count()
    }
    time("ann_bq") { d =>
      val emb = spark.read.parquet(s"$d/embeddings.parquet")
      val q = emb.orderBy("vec_id").limit(10)
      graft.ops.Similarity.bqTopK(q, emb, "vec_id", "embedding",
        "vec_id", "embedding", k = 5, refine = 16).count()
    }
    // r15 persisted forms: fit/encode amortizes into the build, the
    // search reads the column-pruned code/prefix column (plan-audited);
    // timed build+search like bm25_index — the slope should stay the
    // corpus scan's
    time("ann_matryoshka_index_build+search") { d =>
      val p = "/root/repo/target/probe_matry_idx"
      val emb = spark.read.parquet(s"$d/embeddings.parquet")
      graft.ops.Similarity.buildMatryoshkaIndex(emb, "vec_id", "embedding",
        p, dim = 32)
      val q = emb.orderBy("vec_id").limit(10)
      graft.ops.Similarity.matryoshkaSearchIndex(spark, p, q,
        "vec_id", "embedding", k = 5, refine = 8).count()
    }
    time("ann_bq_index_build+search") { d =>
      val p = "/root/repo/target/probe_bq_idx"
      val emb = spark.read.parquet(s"$d/embeddings.parquet")
      graft.ops.Similarity.buildBqIndex(emb, "vec_id", "embedding", p)
      val q = emb.orderBy("vec_id").limit(10)
      graft.ops.Similarity.bqSearchIndex(spark, p, q,
        "vec_id", "embedding", k = 5, refine = 16).count()
    }
    // LPA on the dense map graph: per-iteration cost = the cache-local
    // vote join + two hash-aggs; the label churn on this graph runs the
    // full budget on both sides, so the ratio isolates per-round cost
    time("lpa_dense") { d =>
      val (edges, _) = denseEdges(d)
      graft.ops.Graph.labelPropagation(edges, "src", "dst",
        maxIters = 8).count()
    }
    // clustering coefficients ride the triangle pass: wedge volume is
    // the cost driver, the degree agg + n-row join are noise
    time("clustering_dense") { d =>
      val (edges, _) = denseEdges(d)
      graft.ops.Graph.clusteringCoefficients(edges, "src", "dst")
        .agg(sum("lcc")).collect(); 1L
    }
    // events replication (r14): a fresh run rewrites it like every other
    // table (a mult change must not time stale-mult events); under
    // `reuse` it is written only when a pre-r14 sfbig lacks it
    if (!reuse || !new java.io.File(s"$big/events.parquet").exists())
      rep("events", Seq("event_id", "user_id"))
    // the round's text/SFT/event additions probe through their queries
    // (the query IS the operator for these)
    time("mink_prob") { d =>
      SparkEntry.queries("q_mink_prob")(spark, d).count() }
    time("ngram_novelty") { d =>
      SparkEntry.queries("q_ngram_novelty")(spark, d).count() }
    time("fim") { d => SparkEntry.queries("q_fim")(spark, d).count() }
    time("dpo_pairs") { d =>
      SparkEntry.queries("q_dpo_pairs")(spark, d).count() }
    time("drift") { d => SparkEntry.queries("q_drift")(spark, d).count() }
    time("mad_outliers") { d =>
      SparkEntry.queries("q_mad_outliers")(spark, d).count() }
    // AC blocklist: one closure-automaton pass per doc (plan-audited
    // 0 exchanges) — the slope should be the document scan's
    time("blocklist") { d =>
      SparkEntry.queries("q_blocklist")(spark, d).count() }
    time("rouge") { d => SparkEntry.queries("q_rouge")(spark, d).count() }
    time("distinct_n") { d =>
      SparkEntry.queries("q_distinct_n")(spark, d).count() }
    time("zipf") { d => SparkEntry.queries("q_zipf")(spark, d).count() }
    // r15 evaluation leg: the corpus-scan aggregates should ride the
    // token/doc scan (slope ~= scan); bradley_terry adds its battles →
    // pair-count hash agg with O(models²) driver MM on top; conformal's
    // driver sort grows with the (by-contract bounded) calibration half
    time("vocab_richness") { d =>
      SparkEntry.queries("q_vocab_richness")(spark, d).count() }
    time("calibration") { d =>
      SparkEntry.queries("q_calibration")(spark, d).count() }
    time("agree_alpha") { d =>
      SparkEntry.queries("q_agree_alpha")(spark, d).count() }
    time("bradley_terry") { d =>
      SparkEntry.queries("q_bradley_terry")(spark, d).count() }
    time("conformal") { d =>
      SparkEntry.queries("q_conformal")(spark, d).count() }
    time("auc") { d => SparkEntry.queries("q_auc")(spark, d).count() }
    time("chi2") { d => SparkEntry.queries("q_chi2")(spark, d).count() }
    time("spearman") { d =>
      SparkEntry.queries("q_spearman")(spark, d).count() }
    time("privacy") { d =>
      SparkEntry.queries("q_privacy")(spark, d).count() }
    time("slice_accuracy") { d =>
      SparkEntry.queries("q_slice_accuracy")(spark, d).count() }
    time("bootstrap") { d =>
      SparkEntry.queries("q_bootstrap")(spark, d).count() }
    // betweenness with a FIXED 64-pivot sample (the Brandes–Pich scale
    // path): forward state is O(pivots·ball), so 8x data should cost
    // ~the per-level linear join, not 8x the pair state
    time("betweenness_pivots") { d =>
      import org.apache.spark.sql.expressions.Window
      val (edges, _) = denseEdges(d)
      val piv = spark.range(64).select((col("id") * 7L).as("s"))
      graft.ops.Graph.betweennessCentrality(edges, "src", "dst",
        maxDepth = 4, pivots = Some(piv))
        .agg(sum("betweenness")).collect(); 1L
    }
    // ------------------------------------------------------- skew probes
    // every graph probe above runs on regular (constant-degree) or chain
    // graphs; real link graphs are power-law. zipfEdges builds a
    // deterministic LOG-UNIFORM-destination graph (Zipf s≈1): each node
    // emits 4 edges at dst = floor(n^u) − 1 with u a 6-digit hash
    // fraction, so P(dst = r) ∝ 1/(r+1) and node 0 alone collects
    // ~ln2/ln(n) of ALL edges — a genuine hub (the census prints the
    // measured head). The skew-sensitivity claims (degree-ordered
    // triangle orientation, LPA vote-join fan-in, pagerank/HITS dst
    // aggregates, pivot betweenness) are then measured, not asserted.
    def zipfEdgesGen(d: String): org.apache.spark.sql.DataFrame = {
      import org.apache.spark.sql.expressions.Window
      val nodes = spark.read.parquet(s"$d/documents.parquet")
        .select((row_number().over(Window.orderBy("doc_id")) - 1)
          .cast("long").as("node"))
      val nMod = nodes.count()
      (0 until 4).map { j =>
        val u = pmod(xxhash64(col("node"), lit(j)), lit(1000000L))
          .cast("double") / 1000000.0
        nodes.select(col("node").as("src"),
          (floor(pow(lit(nMod.toDouble), u)) - 1).cast("long").as("dst"))
      }.reduce(_ unionByName _)
        .filter(col("dst") >= 0 && col("dst") =!= col("src"))
    }
    // the generator's global row_number window + count are construction
    // cost COMMON to every skew probe — materialize the edge sets ONCE
    // per scale OUTSIDE the timed closures (each probe then pays only a
    // parquet scan, the realistic input), so the measured slopes are the
    // operators', not the harness's
    val skewLabels = Seq("skew_census", "skew_triangles", "skew_lpa",
      "skew_pagerank", "skew_hits", "skew_hits_guard", "skew_betweenness")
    def zipfPath(d: String) =
      if (d == big) s"$big/zipf_edges.parquet"
      else "/root/repo/target/zipf_edges_1x.parquet"
    if (only.isEmpty || skewLabels.exists(l => only.exists(l.contains)))
      Seq(src, big).foreach { d =>
        zipfEdgesGen(d).write.mode("overwrite").parquet(zipfPath(d))
      }
    def zipfEdges(d: String): org.apache.spark.sql.DataFrame =
      spark.read.parquet(zipfPath(d))
    time("skew_census") { d =>
      val edges = zipfEdges(d)
      val n = spark.read.parquet(s"$d/documents.parquet").count()
      val m = edges.count()
      val deg = edges.select(col("src").as("x"))
        .unionByName(edges.select(col("dst").as("x")))
        .groupBy("x").agg(count(lit(1)).as("deg"))
      val top = deg.orderBy(col("deg").desc, col("x")).limit(5)
        .select("deg").collect().map(_.getLong(0))
      val pct = deg.agg(expr("percentile(deg, array(0.5, 0.99))")).head()
        .getSeq[Double](0)
      println(f"DBG skew_census dir=$d nodes=$n edges=$m " +
        s"top5_deg=${top.mkString(",")} p50=${pct(0)} p99=${pct(1)} " +
        f"hub_share=${top.head.toDouble / (2 * m)}%.3f")
      m
    }
    // degree-ordered orientation is the skew-proof: the hub's star edges
    // all orient INTO it, so the hub emits ZERO oriented wedges and the
    // wedge volume stays Σ min-degree-side², not deg(hub)²
    time("skew_triangles") { d =>
      val edges = zipfEdges(d)
      graft.ops.Graph.triangleCounts(edges, "src", "dst")
        .agg(sum("triangles")).collect(); 1L
    }
    // LPA's vote join keys on the NEIGHBOR: the hub's closed adjacency
    // is deg(hub) separate rows (never one giant row), and the
    // (node, label) count agg absorbs the fan-in with map-side combine
    time("skew_lpa") { d =>
      val edges = zipfEdges(d)
      graft.ops.Graph.labelPropagation(edges, "src", "dst",
        maxIters = 4).count()
    }
    // pagerank joins ranks on the UNIFORM src key (out-degree 4 by
    // construction); the skew lands on the dst AGGREGATE, where partial
    // aggregation caps the hub's shuffle rows at one per task
    time("skew_pagerank") { d =>
      val edges = zipfEdges(d)
      graft.ops.Graph.pageRank(edges, "src", "dst", iters = 5)
        .agg(sum("rank")).collect(); 1L
    }
    // HITS iterates stay exact only while (co-citation degree)^(2·iters)
    // < 2^53 — the hub makes that bind at SMALL iteration counts
    time("skew_hits") { d =>
      val edges = zipfEdges(d)
      graft.ops.Graph.hits(edges, "src", "dst", iters = 2)
        .agg(sum("hub")).collect(); 1L
    }
    // ...and past the exact range the r15 guard must REFUSE, not drift:
    // on this hub graph iters = 8 overflows at both scales
    time("skew_hits_guard") { d =>
      val edges = zipfEdges(d)
      val fired =
        try {
          graft.ops.Graph.hits(edges, "src", "dst", iters = 8)
            .agg(sum("hub")).collect(); false
        } catch {
          case e: IllegalArgumentException if e.getMessage.contains("2^53") =>
            true
        }
      println(s"DBG skew_hits_guard dir=$d fired=$fired")
      1L
    }
    // pivot betweenness: the hub sits on most shortest paths, so balls
    // reach most of the graph fast — forward state is O(pivots·ball)
    // rows by design, and 8x data should scale the per-level joins, not
    // square them
    time("skew_betweenness") { d =>
      val edges = zipfEdges(d)
      val piv = spark.range(64).select((col("id") * 7L).as("s"))
      graft.ops.Graph.betweennessCentrality(edges, "src", "dst",
        maxDepth = 3, pivots = Some(piv))
        .agg(sum("betweenness")).collect(); 1L
    }
    // streaming monitors at 8x traffic: both are (window, bin) hash
    // aggregates + tiny downstream joins, so 8x rows into the SAME
    // windows should scan-scale (~linear at worst)
    time("stream_eval") { d =>
      SparkEntry.queries("q_stream_eval")(spark, d).count() }
    time("score_drift") { d =>
      SparkEntry.queries("q_score_drift")(spark, d).count() }
    // embedding drift: the cell assignment is a codegen scan-side
    // expression (O(dim·cells)/row), everything after is (window, cell)
    // rows — the slope should be the embedding scan's
    time("embed_drift") { d =>
      SparkEntry.queries("q_embed_drift")(spark, d).count() }
    // KS drift: one (window, distinct-score) aggregate + a
    // window-partitioned prefix sum over the pooled support — 8x rows
    // into the SAME windows grows only the aggregate scan (the dyadic
    // score keeps distinct values fixed at ~700/window)
    time("ks_drift") { d =>
      SparkEntry.queries("q_ks_drift")(spark, d).count() }
    // windowed A/B: ONE (window) aggregate; post-aggregate work is
    // windows-many rows regardless of traffic
    time("stream_ab") { d =>
      SparkEntry.queries("q_stream_ab")(spark, d).count() }
    // DeLong paired AUC: two distinct-score prefix tables (bounded) +
    // two score-keyed joins + ONE moment aggregate — the joins ride
    // the corpus scan, the prefix tables stay ~101/53 rows at any SF
    time("delong") { d =>
      SparkEntry.queries("q_delong")(spark, d).count() }
    // per-slice AUC/ECE: ONE (slice, bin) aggregate + slice-partitioned
    // prefix sum — post-aggregate state is slices*bins at any SF
    time("slice_eval") { d =>
      SparkEntry.queries("q_slice_eval")(spark, d).count() }
    // Gwet AC1 / mixture weights: one contingency / one (group)
    // aggregate, driver-bounded everything after
    time("agree_ac1") { d =>
      SparkEntry.queries("q_agree_ac1")(spark, d).count() }
    time("mixture_weights") { d =>
      SparkEntry.queries("q_mixture_weights")(spark, d).count() }
    // proper scoring rules: ONE (bin) aggregate + a bins-many reduce
    time("proper_scores") { d =>
      SparkEntry.queries("q_proper_scores")(spark, d).count() }
    // multiclass proper scores (r18): a bounded K-fold posexplode
    // Generate (K = 3) into ONE (cls, bin) aggregate — the slope
    // should be the corpus scan's, K never grows with data
    time("proper_scores_mc") { d =>
      SparkEntry.queries("q_proper_scores_mc")(spark, d).count() }
    // ratio-metric alpha (r18): one (item, value) aggregate, an
    // item-keyed self-join over bounded per-item supports, a d² cross
    // on the maxDistinct-bounded value table — post-aggregate state
    // is items + d², independent of corpus rows per item
    time("alpha_ratio") { d =>
      SparkEntry.queries("q_alpha_ratio")(spark, d).count() }
    // windowed CUSUM (r18): ONE (window) aggregate; the stacked
    // prefix scans run over windows-many rows regardless of traffic
    time("cusum") { d =>
      SparkEntry.queries("q_cusum")(spark, d).count() }
    // non-inferiority / off-policy eval (r18): each ONE scalar hash
    // aggregate over the corpus — the mcnemarTest shape
    time("noninferiority") { d =>
      SparkEntry.queries("q_noninferiority")(spark, d).count() }
    time("offpolicy") { d =>
      SparkEntry.queries("q_offpolicy")(spark, d).count() }
    time("offpolicy_dr") { d =>
      SparkEntry.queries("q_offpolicy_dr")(spark, d).count() }
    // Wald SPRT (r18): the windowedAb aggregate + prefix sums over
    // windows-many rows — post-aggregate state independent of traffic
    time("stream_sprt") { d =>
      SparkEntry.queries("q_stream_sprt")(spark, d).count() }
    // composed A/B report (r18, the promoted operator): one pinned
    // corpus scan, then the DeLong moment aggregate (broadcast
    // placements) + the six-column McNemar aggregate both over the
    // checkpoint — the slope should track the single scan
    time("ab_report") { d =>
      SparkEntry.queries("q_ab_report")(spark, d).count() }
    // r19 decision-theory additions: each ONE hash aggregate (scalar,
    // (slice), (arm), or (window)) — the post-aggregate state never
    // grows with traffic, so every slope should track the scan
    time("offpolicy_slice") { d =>
      SparkEntry.queries("q_offpolicy_slice")(spark, d).count() }
    time("offpolicy_router") { d =>
      SparkEntry.queries("q_offpolicy_router")(spark, d).count() }
    time("offpolicy_dr_slice") { d =>
      SparkEntry.queries("q_offpolicy_dr_slice")(spark, d).count() }
    time("cuped") { d =>
      SparkEntry.queries("q_cuped")(spark, d).count() }
    time("eb_rates") { d =>
      SparkEntry.queries("q_eb_rates")(spark, d).count() }
    time("power_slice") { d =>
      SparkEntry.queries("q_power_slice")(spark, d).count() }
    time("stream_msprt") { d =>
      SparkEntry.queries("q_stream_msprt")(spark, d).count() }
    time("stream_confseq") { d =>
      SparkEntry.queries("q_stream_confseq")(spark, d).count() }
    time("cusum_gap") { d =>
      SparkEntry.queries("q_cusum_gap")(spark, d).count() }
    time("judge_bias") { d =>
      SparkEntry.queries("q_judge_bias")(spark, d).count() }
    time("stream_ope") { d =>
      SparkEntry.queries("q_stream_ope")(spark, d).count() }
    time("stream_cuped") { d =>
      SparkEntry.queries("q_stream_cuped")(spark, d).count() }
    time("stream_ab_msprt") { d =>
      SparkEntry.queries("q_stream_ab_msprt")(spark, d).count() }
    // r20 additions: the SRM guards are ONE scalar / (window)
    // aggregate with k+2 conditional counts (no arm-key shuffle);
    // the plug-in mSPRT forms add one Σx² column to the same
    // aggregate; the unit paths prepend one map-side-combinable
    // keyed fold; the composed report is one corpus read + two keyed
    // aggregates over the checkpoint — every slope should track the
    // scan
    time("srm") { d =>
      SparkEntry.queries("q_srm")(spark, d).count() }
    time("stream_srm") { d =>
      SparkEntry.queries("q_stream_srm")(spark, d).count() }
    time("stream_msprt_var") { d =>
      SparkEntry.queries("q_stream_msprt_var")(spark, d).count() }
    time("stream_ab_msprt_var") { d =>
      SparkEntry.queries("q_stream_ab_msprt_var")(spark, d).count() }
    time("stream_ab_msprt_unit") { d =>
      SparkEntry.queries("q_stream_ab_msprt_unit")(spark, d).count() }
    time("cuped_unit") { d =>
      SparkEntry.queries("q_cuped_unit")(spark, d).count() }
    time("cuped_multi") { d =>
      SparkEntry.queries("q_cuped_multi")(spark, d).count() }
    time("ratio_delta") { d =>
      SparkEntry.queries("q_ratio_delta")(spark, d).count() }
    time("ab_e2e") { d =>
      SparkEntry.queries("q_ab_e2e")(spark, d).count() }
    time("stream_ratio") { d =>
      SparkEntry.queries("q_stream_ratio")(spark, d).count() }
    time("stream_eb") { d =>
      SparkEntry.queries("q_stream_eb")(spark, d).count() }
    time("cuped_slice") { d =>
      SparkEntry.queries("q_cuped_slice")(spark, d).count() }
    // fragment ancestry depth: the overlay read chains one ROWID join
    // per ancestor (MSWrite.readFragment walks the sidecars, then folds
    // updateByRowId). Probe READ cost (chains pre-built, untimed) vs
    // chain depth at 1x and Nx — the measured basis for the compaction-
    // recommended depth in SCALE.md (compaction = MSWrite
    // .compactFragments, gated by q_compact).
    locally {
      val label = "frag_depth"
      if (only.isEmpty || only.exists(label.contains)) {
        import graft.api.{MSTable, MSWrite}
        val depths = Seq(2, 8, 16)
        def buildAndTime(d: String): Map[Int, Double] = {
          val tag = if (d == big) "N" else "1"
          val base = s"/root/repo/target/fragprobe_$tag"
          val fs = new org.apache.hadoop.fs.Path(base)
            .getFileSystem(spark.sparkContext.hadoopConfiguration)
          fs.delete(new org.apache.hadoop.fs.Path(base), true)
          val docs = spark.read.parquet(s"$d/documents.parquet")
            .select(col("doc_id").cast("long").as("doc_id"),
              col("source").cast("string").as("source"))
          MSWrite.create(docs, s"$base/t0")
          val root = MSTable.withRowId(MSTable.open(spark, s"$base/t0"),
            Seq("doc_id")).localCheckpoint()
          var parent = s"$base/t0"
          (1 to depths.max).foreach { i =>
            // each fragment touches a distinct 1/16 slice — the
            // incremental-curation shape ancestry chains accumulate
            val delta = root.filter(pmod(col("doc_id"), lit(16L)) === (i - 1).toLong)
              .select(col(MSTable.RowId), lit(s"v$i").as("source"))
            MSWrite.writeFragment(delta, s"$base/t$i", parent)
            parent = s"$base/t$i"
          }
          depths.map { dep =>
            def once(): Double = {
              val t0 = System.nanoTime()
              MSWrite.readFragment(spark, s"$base/t$dep", Seq("doc_id"))
                .agg(count(lit(1))).collect()
              (System.nanoTime() - t0) / 1e9
            }
            once() // warm
            dep -> once()
          }.toMap
        }
        val t1 = buildAndTime(src)
        val tN = buildAndTime(big)
        depths.foreach { dep =>
          println(f"SCALE frag_depth_$dep 1x=${t1(dep)}%.2f s " +
            f"${mult}x=${tN(dep)}%.2f s ratio=${tN(dep) / t1(dep)}%.1f")
        }
      }
    }
    spark.stop()
  }
}
