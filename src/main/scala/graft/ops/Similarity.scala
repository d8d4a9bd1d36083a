package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  *  - [[bruteForceTopK]] — exact cosine top-k: queries × corpus cross join.
  *    The query side is broadcast (queries ≪ corpus), so the corpus is
  *    scanned once with no shuffle; per-partition partial top-k then a
  *    single small global top-k. This is the correctness baseline.
  *  - [[lshTopK]] — random-hyperplane LSH bucketing: corpus vectors land in
  *    sign-pattern buckets; a query probes only its own bucket(s). At 100 TB
  *    this turns a full scan into a bucket-pruned equi-join; the bucket
  *    column is also a natural partition/bucketing key for the stored
  *    corpus.
  */
object Similarity {

  /** Deterministic random hyperplanes (seeded) — `nPlanes` × `dim`. */
  def hyperplanes(nPlanes: Int, dim: Int, seed: Long = 42L): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(nPlanes, dim)(rnd.nextGaussian())
  }

  /** Sign-pattern bucket id of a vector under the given hyperplanes. */
  def lshBucket(vec: Column, planes: Array[Array[Double]]): Column = {
    val bits = planes.zipWithIndex.map { case (p, i) =>
      val dot = aggregate(
        zip_with(vec, array(p.toSeq.map(lit): _*), (x, w) => x.cast("double") * w),
        lit(0d), (s, v) => s + v)
      when(dot >= 0, shiftleft(lit(1L), i)).otherwise(0L)
    }
    bits.reduce(_ + _)
  }

  /** Exact cosine top-k for each query vector.
    *
    * @param queries (qid, vector) frame — expected small; broadcast.
    * @param corpus  (id, vector) frame — the big side, scanned once.
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame,
                     qIdCol: String, qVecCol: String,
                     cIdCol: String, cVecCol: String, k: Int,
                     excludeSelf: Boolean = true): DataFrame = {
    val q = queries.select(col(qIdCol).as("query_id"), col(qVecCol).as("qv"))
    val c = corpus.select(col(cIdCol).as("neighbor_id"), col(cVecCol).as("cv"))
    val scored = c.crossJoin(broadcast(q))
      .filter(if (excludeSelf) col("neighbor_id") =!= col("query_id") else lit(true))
      .withColumn("cosine", Dedup.cosine(col("qv"), col("cv")))
    explodeTopK(scored, k)
  }

  /** Matryoshka-style embedding truncation (Kusupati et al. 2022, MRL):
    * keep the FIRST `dim` coordinates and L2-renormalize — the
    * progressive-dimension trick MRL-trained encoders support, trading
    * recall for a `dim/d` storage and dot-product cost cut (the cheap
    * tier in a truncate → ANN-shortlist → full-dim re-rank cascade,
    * composing directly with [[bruteForceTopK]] / [[lshTopK]] and the
    * index builders). Pure scan-side Column algebra — no UDF, no
    * shuffle; zero vectors stay zero instead of dividing by 0. Vectors
    * shorter than `dim` keep their full (renormalized) length — slice
    * never pads.
    */
  def truncateEmbeddings(df: DataFrame, vecCol: String, dim: Int,
                         renormalize: Boolean = true): DataFrame = {
    require(dim >= 1, s"dim must be >= 1: $dim")
    val sliced = transform(slice(col(vecCol), 1, dim), x => x.cast("double"))
    val out =
      if (!renormalize) sliced
      else {
        val n2 = aggregate(sliced, lit(0d), (s, x) => s + x * x)
        when(n2 > 0, transform(sliced, x => x / sqrt(n2))).otherwise(sliced)
      }
    df.withColumn(vecCol, out)
  }

  /** Shared tail of every matryoshka/BQ coarse-shortlist → exact-re-rank
    * cascade, inline AND persisted: bounded-heap top k·refine on the
    * coarse scores, broadcast-join the shortlist ids back to the full
    * vectors and the queries, exact cosine, top k. Keeping all four
    * tiers on ONE code path is what makes the spec-asserted
    * "index ≡ inline" parity hold by construction, not by test luck.
    * `scoredCoarse` carries (query_id, neighbor_id, cosine);
    * `corpusVec` (neighbor_id, cv); `q` (query_id, qv).
    */
  private def shortlistRerank(scoredCoarse: DataFrame, corpusVec: DataFrame,
                              q: DataFrame, k: Int, refine: Int): DataFrame = {
    val cand = explodeTopK(scoredCoarse, k * refine)
      .select("query_id", "neighbor_id")
    val rer = corpusVec.join(broadcast(cand), Seq("neighbor_id"))
      .join(broadcast(q), Seq("query_id"))
      .withColumn("cosine", Dedup.cosine(col("qv"), col("cv")))
    explodeTopK(rer, k)
  }

  /** The matryoshka search cascade: shortlist `k · refine` candidates
    * with TRUNCATED-dim cosine (a `dim/d` cost scan — the whole point
    * of MRL serving), then re-rank the shortlist with full-dim exact
    * cosine. Same two-tier shape as [[sq8TopK]] (coarse scan, exact
    * refine); on MRL-trained embeddings the prefix is engineered to
    * rank well, so small `refine` recovers near-1 recall — on
    * arbitrary embeddings the truncated tier is just a lossy filter
    * and `refine` buys the recall back. */
  def matryoshkaTopK(queries: DataFrame, corpus: DataFrame,
                     qIdCol: String, qVecCol: String,
                     cIdCol: String, cVecCol: String,
                     k: Int, dim: Int, refine: Int = 4): DataFrame = {
    require(k >= 1 && refine >= 1, s"matryoshkaTopK: k=$k refine=$refine")
    val q = queries.select(col(qIdCol).as("query_id"), col(qVecCol).as("qv"))
    val c = corpus.select(col(cIdCol).as("neighbor_id"), col(cVecCol).as("cv"))
    // nanvl: a vector whose first `dim` coordinates are ALL zero has an
    // undefined truncated cosine (0/0 = NaN), and TopKAgg's total order
    // would silently evict NaN from every shortlist — pin such
    // candidates to the cosine floor instead, so they rank worst but
    // stay eligible (the refine width, not NaN propagation, decides)
    val scored = truncateEmbeddings(c, "cv", dim)
      .crossJoin(broadcast(truncateEmbeddings(q, "qv", dim)))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine",
        nanvl(Dedup.cosine(col("qv"), col("cv")), lit(-1.0)))
      .select("query_id", "neighbor_id", "cosine")
    shortlistRerank(scored, c, q, k, refine)
  }

  private val MatryoshkaKey = "__graft_matryoshka__"

  /** Build and PERSIST a matryoshka index: the truncated+renormalized
    * `dim`-prefix column is precomputed ONCE next to the full vector and
    * the dim is recorded in the keyword sidecar. The fit-once/search-many
    * form of [[matryoshkaTopK]] (the [[buildIvfIndex]] convention):
    * every later query batch skips the corpus-wide truncate/renormalize
    * scan, the coarse pass reads ONLY the dim/d-sized prefix column
    * (Parquet column pruning — the storage overhead buys the scan cut),
    * and full vectors are fetched for just the shortlist ids.
    */
  def buildMatryoshkaIndex(corpus: DataFrame, cIdCol: String,
                           cVecCol: String, path: String, dim: Int): Unit = {
    require(dim >= 1, s"buildMatryoshkaIndex: dim=$dim")
    val c = corpus.select(col(cIdCol).as("neighbor_id"), col(cVecCol).as("cv"))
    truncateEmbeddings(c.withColumn("tv", col("cv")), "tv", dim)
      .select("neighbor_id", "tv", "cv")
      .write.mode("overwrite").parquet(path)
    graft.api.MSWrite.putKeywords(corpus.sparkSession, path,
      graft.api.MSWrite.readKeywords(corpus.sparkSession, path) +
        (MatryoshkaKey -> dim.toString))
  }

  /** Query a persisted matryoshka index: truncated-cosine shortlist over
    * the prefix column (k·refine candidates at dim/d scan cost), exact
    * full-dim re-rank — [[matryoshkaTopK]] semantics, corpus-side work
    * amortized into [[buildMatryoshkaIndex]].
    */
  def matryoshkaSearchIndex(spark: org.apache.spark.sql.SparkSession,
                            path: String, queries: DataFrame,
                            qIdCol: String, qVecCol: String,
                            k: Int, refine: Int = 4): DataFrame = {
    require(k >= 1 && refine >= 1, s"matryoshkaSearchIndex: k=$k refine=$refine")
    val dim = graft.api.MSWrite.readKeywords(spark, path)
      .getOrElse(MatryoshkaKey, throw new IllegalArgumentException(
        s"no matryoshka sidecar at $path")).toInt
    val q = queries.select(col(qIdCol).as("query_id"), col(qVecCol).as("qv"))
    val qt = truncateEmbeddings(q.withColumn("qt", col("qv")), "qt", dim)
      .select("query_id", "qt")
    // same NaN pinning as matryoshkaTopK: an all-zero prefix must rank
    // worst, not vanish from the shortlist
    val scored = spark.read.parquet(path).select("neighbor_id", "tv")
      .crossJoin(broadcast(qt))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine",
        nanvl(Dedup.cosine(col("qt"), col("tv")), lit(-1.0)))
      .select("query_id", "neighbor_id", "cosine")
    shortlistRerank(scored,
      spark.read.parquet(path).select("neighbor_id", "cv"), q, k, refine)
  }

  /** Maximal-marginal-relevance re-rank (Carbonell & Goldstein 1998):
    * from each query's CANDIDATE list — (query_id, neighbor_id, cosine,
    * vector) rows, e.g. a k·refine ANN shortlist — greedily pick `k`
    * items maximizing
    * {{{ λ·rel(x) − (1−λ)·max_{s ∈ picked} cos(x, s) }}}
    * so results trade relevance against redundancy (λ = 1 is plain
    * top-k; λ → 0 maximizes diversity after the first pick). Ties and
    * the first pick break toward higher cosine then smaller id —
    * fully deterministic. Returns (query_id, rank, neighbor_id,
    * mmr_score) with rank 1..k.
    *
    * Scale shape: ONE hash-aggregate collects each query's candidate
    * list and the greedy runs inside the aggregation as a per-group
    * kernel — state is O(candidates·d) per query, bounded because the
    * candidate list is a shortlist BY CONSTRUCTION (k·refine from the
    * ANN tiers, never a corpus). The pairwise sims are computed
    * in-kernel on the ≤ candidates² shortlist pairs; no corpus-sized
    * shuffle or crossJoin exists anywhere.
    */
  def mmrRerank(candidates: DataFrame, qIdCol: String, cIdCol: String,
                scoreCol: String, vecCol: String,
                k: Int, lambda: Double): DataFrame = {
    require(k >= 1, s"mmrRerank: k=$k")
    require(lambda >= 0 && lambda <= 1, s"mmrRerank: lambda=$lambda")
    val greedy = udf { (items: Seq[Row]) =>
      // a NaN relevance OR a NaN vector coordinate (either poisons the
      // mmr score, making every comparison false and leaving best = -1)
      // drops that candidate instead of crashing the stage
      val cand = items.map { r =>
        (r.getLong(0), r.getDouble(1),
          Option(r.getSeq[Double](2)).map(_.toArray).orNull)
      }.filterNot { case (_, s, v) =>
        s.isNaN || (v != null && v.exists(_.isNaN))
      }.sortBy { case (id, s, _) => (-s, id) }.toArray
      def cos(a: Array[Double], b: Array[Double]): Double = {
        if (a == null || b == null) return 0d
        var dot = 0d; var na = 0d; var nb = 0d; var i = 0
        val n = math.min(a.length, b.length)
        while (i < n) { dot += a(i) * b(i); na += a(i) * a(i)
          nb += b(i) * b(i); i += 1 }
        if (na == 0 || nb == 0) 0d else dot / math.sqrt(na * nb)
      }
      val picked = scala.collection.mutable.ArrayBuffer.empty[Int]
      val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Double)]
      var rank = 1
      while (rank <= k && picked.size < cand.length) {
        var best = -1; var bestScore = Double.NegativeInfinity
        var bestRel = Double.NegativeInfinity; var bestId = Long.MaxValue
        var i = 0
        while (i < cand.length) {
          if (!picked.contains(i)) {
            val (id, rel, v) = cand(i)
            var red = 0d
            picked.foreach { p => red = math.max(red, cos(v, cand(p)._3)) }
            val s = lambda * rel - (1 - lambda) * (if (picked.isEmpty) 0d else red)
            // deterministic total order: score, then relevance, then id
            if (s > bestScore ||
                (s == bestScore && (rel > bestRel ||
                  (rel == bestRel && id < bestId)))) {
              best = i; bestScore = s; bestRel = rel; bestId = id
            }
          }
          i += 1
        }
        if (best < 0) {
          // defensive: no pickable candidate (cannot happen after the
          // NaN filter above, but a -1 index must never dereference)
          rank = k + 1
        } else {
          picked += best
          out += ((rank, cand(best)._1, bestScore))
          rank += 1
        }
      }
      out.toSeq
    }
    candidates
      .groupBy(col(qIdCol).as("query_id"))
      .agg(collect_list(struct(col(cIdCol).cast("long"),
        col(scoreCol).cast("double"),
        transform(col(vecCol), x => x.cast("double")))).as("__c"))
      .select(col("query_id"), explode(greedy(col("__c"))).as("r"))
      .select(col("query_id"), col("r._1").as("rank"),
        col("r._2").as("neighbor_id"),
        round(col("r._3"), 6).as("mmr_score"))
      .orderBy("query_id", "rank")
  }

  /** ColBERT-style late-interaction score (Khattab & Zaharia 2020):
    * {{{ maxsim(Q, D) = Σ_{q ∈ Q} max_{d ∈ D} cos(q, d) }}}
    * over per-TOKEN embedding arrays — the retrieval scorer between
    * single-vector cosine (too coarse) and a cross-encoder (too
    * expensive): every query token finds its best-matching document
    * token. Pure nested higher-order Column algebra — no UDF, no
    * explode, no shuffle; rides whatever scan/join the caller builds
    * (typically a broadcast of the tokenized queries, the
    * [[bruteForceTopK]] shape). A zero token vector scores 0 against
    * everything (nanvl), and an empty document token list scores 0.
    */
  def maxSim(queryToks: Column, docToks: Column): Column =
    coalesce(
      aggregate(queryToks, lit(0d), (acc, q) =>
        acc + coalesce(
          array_max(transform(docToks, d =>
            nanvl(Dedup.cosine(q, d), lit(0.0)))), lit(0.0))),
      lit(0.0))

  /** Single-linkage agglomerative dendrogram over a BOUNDED vector
    * frame (cluster centroids, never a corpus — `maxRows` refuses
    * anything else): the topic-hierarchy view of a k-means curation
    * pass. Cosine distance (1 − cos; zero vectors at distance 1 from
    * everything); merges pick the globally closest pair with a total
    * (dist, left, right) tie order, and clusters are NAMED by their
    * smallest member id, so the whole tree is deterministic. Returns
    * k−1 rows: (step 1.., left, right, dist round-9, size of the merged
    * cluster). Single linkage makes the merge distances NONDECREASING —
    * the gated query pins that invariant.
    *
    * Scale shape: driver-side Lance–Williams (min) updates, O(k²)
    * memory and O(k³) time on k ≤ `maxRows` rows — the PCA/Jacobi
    * bounded-driver-model convention; the corpus-sized work happened in
    * the k-means pass that produced the centroids.
    */
  def dendrogram(df: DataFrame, idCol: String, vecCol: String,
                 maxRows: Int = 512): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val rows = df.select(col(idCol).cast("long"),
        col(vecCol).cast("array<double>")).na.drop()
      .collect().map(r => (r.getLong(0), toDoubleArray(r.getSeq[Any](1))))
    require(rows.length >= 2, s"dendrogram: need >= 2 vectors: ${rows.length}")
    require(rows.length <= maxRows,
      s"dendrogram: ${rows.length} rows exceed maxRows=$maxRows — this is " +
        "a centroid-level tree, run k-means first")
    require(rows.map(_._1).distinct.length == rows.length,
      "dendrogram: duplicate ids")
    // a NaN coordinate would make every distance comparison false and
    // the merge index -1 — refuse loudly like the other guards
    rows.foreach { case (id, v) =>
      require(!v.exists(_.isNaN), s"dendrogram: NaN coordinate in id $id") }
    val k = rows.length
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0d; var na = 0d; var nb = 0d; var i = 0
      val n = math.min(a.length, b.length)
      while (i < n) { dot += a(i) * b(i); na += a(i) * a(i)
        nb += b(i) * b(i); i += 1 }
      if (na == 0 || nb == 0) 0d else dot / math.sqrt(na * nb)
    }
    val d = Array.tabulate(k, k)((i, j) =>
      if (i == j) 0d else 1.0 - cos(rows(i)._2, rows(j)._2))
    val minId = rows.map(_._1)        // cluster name = smallest member id
    val size = Array.fill(k)(1)
    val alive = Array.fill(k)(true)
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Long, Double, Int)]
    var step = 1
    while (step < k) {
      var bi = -1; var bj = -1
      var bd = Double.MaxValue; var bl = Long.MaxValue; var br = Long.MaxValue
      var i = 0
      while (i < k) {
        if (alive(i)) {
          var j = i + 1
          while (j < k) {
            if (alive(j)) {
              val dd = d(i)(j)
              val l = math.min(minId(i), minId(j))
              val r = math.max(minId(i), minId(j))
              if (dd < bd || (dd == bd && (l < bl || (l == bl && r < br)))) {
                bd = dd; bi = i; bj = j; bl = l; br = r
              }
            }
            j += 1
          }
        }
        i += 1
      }
      // Lance–Williams single-linkage update into slot bi; bj retires
      var t = 0
      while (t < k) {
        if (alive(t) && t != bi && t != bj) {
          val m = math.min(d(bi)(t), d(bj)(t))
          d(bi)(t) = m; d(t)(bi) = m
        }
        t += 1
      }
      alive(bj) = false
      size(bi) = size(bi) + size(bj)
      minId(bi) = math.min(minId(bi), minId(bj))
      out += ((step, bl, br, BigDecimal(bd).setScale(9,
        BigDecimal.RoundingMode.HALF_UP).toDouble, size(bi)))
      step += 1
    }
    out.toSeq.toDF("step", "left", "right", "dist", "size")
  }

  /** [[dendrogram]] over the IVF k-means centroids of a corpus — the
    * end-to-end topic tree (cells named 0..nlist−1, the same cell ids
    * [[ivfTopK]] and the curation pass use). */
  def topicDendrogram(corpus: DataFrame, vecCol: String, nlist: Int,
                      fitSampleRows: Long = 50000L): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val cents = fitCentroids(
      corpus.select(col(vecCol).as("cv")), nlist, fitSampleRows)
    dendrogram(cents.zipWithIndex.map { case (c, i) => (i.toLong, c.toSeq) }
      .toSeq.toDF("cell", "centroid"), "cell", "centroid")
  }

  /** Binary-quantization fit: the per-dimension MEAN threshold, from one
    * posexplode + d-row hash-aggregate (the same scale shape as
    * [[fitSq8]]). Mean-centering balances the bit distribution so
    * Hamming distance tracks angular distance (sign-random-projection
    * estimate: P(bit differs) ≈ angle/π on centered data); the model is
    * O(d) driver state riding the encode closure.
    */
  def fitBq(corpus: DataFrame, vecCol: String): Array[Double] = {
    val stats = corpus.select(posexplode(col(vecCol)))
      .select(col("pos"), col("col").cast("double").as("__x"))
      .groupBy("pos").agg(avg("__x").as("mu"))
      .orderBy("pos")
      .collect()
    require(stats.nonEmpty, "fitBq: empty corpus or vectors")
    stats.map(_.getDouble(1))
  }

  private def bqEncodeUdf(thresholds: Array[Double]) =
    // Seq[Double]: float embeddings widen via Spark's implicit cast
    udf { (v: Seq[Double]) =>
      if (v == null) null
      else {
        val x = v.toArray
        require(x.length == thresholds.length,
          s"bq: vector has ${x.length} dims, model has ${thresholds.length}")
        val out = new Array[Long]((x.length + 63) >>> 6)
        var i = 0
        while (i < x.length) {
          if (x(i) > thresholds(i)) out(i >>> 6) |= 1L << (i & 63)
          i += 1
        }
        out
      }
    }

  /** Replace `vecCol` with its packed-long sign-bit code under the given
    * per-dimension thresholds (bit i of word i/64 set iff x_i > thr_i).
    */
  def bqEncode(df: DataFrame, vecCol: String,
               thresholds: Array[Double]): DataFrame =
    df.withColumn(vecCol, bqEncodeUdf(thresholds)(col(vecCol)))

  /** Hamming distance between two equal-length packed-long bit codes —
    * pure builtin Column algebra (`bit_count(xor)` summed with
    * zip_with/aggregate), so the distance scan stays inside whole-stage
    * codegen with no UDF.
    */
  def hamming(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => bit_count(x.bitwiseXOR(y)).cast("long")),
      lit(0L), (s, v) => s + v)

  /** Binary-quantized approximate top-k — the 1-bit-per-dim tier below
    * [[sq8TopK]] (32× smaller than float32; Lucene/faiss-style BQ).
    * Corpus and queries pack to sign bits under the shared mean
    * thresholds; the shortlist scan ranks by NEGATED Hamming distance
    * (d/8 bytes and a few popcounts per candidate) through the
    * bounded-heap [[graft.functions.TopKAgg]]; the ≤ queries·k·refine
    * survivors re-rank with exact full-precision cosine. One bit per
    * dimension is the lossiest tier, so `refine` defaults wider than
    * SQ8's.
    *
    * Scale shape: fit is one d-row aggregate; codes are ceil(d/64)
    * longs/row; the Hamming scan is builtin-codegen (no UDF); re-rank
    * is a broadcast join on the candidate ids.
    */
  def bqTopK(queries: DataFrame, corpus: DataFrame,
             qIdCol: String, qVecCol: String,
             cIdCol: String, cVecCol: String,
             k: Int, refine: Int = 16): DataFrame = {
    require(k >= 1 && refine >= 1, s"bqTopK: k=$k refine=$refine")
    val c = corpus.select(col(cIdCol).as("neighbor_id"), col(cVecCol).as("cv"))
    val enc = bqEncodeUdf(fitBq(c, "cv"))
    val codes = c.select(col("neighbor_id"), enc(col("cv")).as("ccode"))
    val q = queries.select(col(qIdCol).as("query_id"), col(qVecCol).as("qv"))
    val qc = q.select(col("query_id"), enc(col("qv")).as("qcode"))
    val scored = codes.crossJoin(broadcast(qc))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine",
        -hamming(col("qcode"), col("ccode")).cast("double"))
      .select("query_id", "neighbor_id", "cosine")
    shortlistRerank(scored, c, q, k, refine)
  }

  private val BqKey = "__graft_bq__"

  /** Build and PERSIST a binary-quantization index: fit the
    * per-dimension mean thresholds once, encode every corpus vector to
    * its packed sign-bit code, and store (id, code, vector) with the
    * thresholds in the keyword sidecar. The fit-once/search-many form
    * of [[bqTopK]] (the [[buildIvfIndex]] convention): a query batch
    * re-pays neither the threshold fit nor the corpus encode scan — the
    * Hamming pass reads ONLY the d/8-byte code column (Parquet column
    * pruning), and full vectors are fetched for just the
    * ≤ queries·k·refine shortlist ids.
    */
  def buildBqIndex(corpus: DataFrame, cIdCol: String, cVecCol: String,
                   path: String): Unit = {
    val c = corpus.select(col(cIdCol).as("neighbor_id"), col(cVecCol).as("cv"))
    val thresholds = fitBq(c, "cv")
    c.select(col("neighbor_id"),
        bqEncodeUdf(thresholds)(col("cv")).as("ccode"), col("cv"))
      .write.mode("overwrite").parquet(path)
    graft.api.MSWrite.putKeywords(corpus.sparkSession, path,
      graft.api.MSWrite.readKeywords(corpus.sparkSession, path) +
        (BqKey -> thresholds.mkString("[", ",", "]")))
  }

  /** Thresholds stored with an index by [[buildBqIndex]] — doubles
    * round-trip exactly through toString. */
  def readBqThresholds(spark: org.apache.spark.sql.SparkSession,
                       path: String): Array[Double] = {
    val json = graft.api.MSWrite.readKeywords(spark, path).getOrElse(BqKey,
      throw new IllegalArgumentException(s"no BQ thresholds sidecar at $path"))
    val body = json.stripPrefix("[").stripSuffix("]")
    if (body.isEmpty) Array.empty else body.split(",").map(_.toDouble)
  }

  /** Query a persisted BQ index: queries pack under the STORED
    * thresholds (fit and corpus codes come from build time, so results
    * are reproducible across query batches), the codegen
    * `bit_count(xor)` Hamming scan shortlists k·refine candidates, and
    * the survivors re-rank with exact full-precision cosine —
    * [[bqTopK]] semantics with the corpus-side work amortized into
    * [[buildBqIndex]].
    */
  def bqSearchIndex(spark: org.apache.spark.sql.SparkSession, path: String,
                    queries: DataFrame, qIdCol: String, qVecCol: String,
                    k: Int, refine: Int = 16): DataFrame = {
    require(k >= 1 && refine >= 1, s"bqSearchIndex: k=$k refine=$refine")
    val enc = bqEncodeUdf(readBqThresholds(spark, path))
    val q = queries.select(col(qIdCol).as("query_id"), col(qVecCol).as("qv"))
    val qc = q.select(col("query_id"), enc(col("qv")).as("qcode"))
    val scored = spark.read.parquet(path).select("neighbor_id", "ccode")
      .crossJoin(broadcast(qc))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine",
        -hamming(col("qcode"), col("ccode")).cast("double"))
      .select("query_id", "neighbor_id", "cosine")
    shortlistRerank(scored,
      spark.read.parquet(path).select("neighbor_id", "cv"), q, k, refine)
  }

  /** Hard-negative mining (contrastive-training data prep): for each
    * query, the `k` most cosine-similar corpus vectors whose label
    * DIFFERS from the query's — the near-misses a contrastive loss
    * learns most from. Same plan shape as [[bruteForceTopK]]: the corpus
    * scans once against broadcast queries (the label-mismatch theta
    * predicate rides the broadcast join), and [[graft.functions.TopKAgg]]
    * ships ≤ k rows per query into the shuffle.
    */
  def hardNegatives(queries: DataFrame, corpus: DataFrame,
                    qIdCol: String, qVecCol: String, qLabelCol: String,
                    cIdCol: String, cVecCol: String, cLabelCol: String,
                    k: Int): DataFrame = {
    val q = queries.select(col(qIdCol).as("query_id"), col(qVecCol).as("qv"),
      col(qLabelCol).as("__ql"))
    val c = corpus.select(col(cIdCol).as("neighbor_id"), col(cVecCol).as("cv"),
      col(cLabelCol).as("__cl"))
    val scored = c.join(broadcast(q), col("__cl") =!= col("__ql"))
      .withColumn("cosine", Dedup.cosine(col("qv"), col("cv")))
    explodeTopK(scored, k)
  }

  /** Per-key exact top-k via the partial-aggregating [[graft.functions.TopKAgg]]
    * (bounded heap per key per task — each task ships ≤ k rows per key into
    * the shuffle, vs. the window formulation shuffling every scored row).
    * Expects columns (query_id, neighbor_id, cosine).
    */
  private def explodeTopK(scored: org.apache.spark.sql.DataFrame, k: Int) =
    scored.groupBy("query_id")
      .agg(graft.functions.TopKAgg.topk(col("cosine"), col("neighbor_id"), k).as("tk"))
      .select(col("query_id"), posexplode(col("tk")))
      .select(col("query_id"), (col("pos") + 1).cast("int").as("rank"),
        col("col.id").as("neighbor_id"), round(col("col.score"), 6).as("cosine"))
      .orderBy("query_id", "rank")

  /** Fit IVF centroids on a bounded corpus sample (k-means needs a
    * representative sketch, not the full corpus) — the boxing toVec UDF
    * runs only on the sample.
    */
  private def fitCentroids(corpusC: DataFrame, nlist: Int,
                           fitSampleRows: Long): Array[Array[Double]] = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.linalg.Vectors
    val n = corpusC.count()
    val frac = math.min(1.0, fitSampleRows.toDouble / math.max(n, 1L))
    // cast at the boundary so the fit survives the embedding column
    // shipping as array<float> OR array<double> (the events-ts lesson:
    // testdata physical types drift between generations)
    val toVec = udf((a: Seq[Double]) => Vectors.dense(a.toArray))
    val fitSet = (if (frac < 1.0) corpusC.sample(withReplacement = false, frac, 42L)
                  else corpusC)
      .withColumn("features", toVec(col("cv").cast("array<double>")))
    val model = new KMeans().setK(nlist).setSeed(42L).setMaxIter(10)
      .fit(fitSet)
    model.clusterCenters.map(_.toArray)
  }

  /** The `nprobe` nearest cells for each query vector (tiny: centroids are
    * a driver-side constant). Takes array<double> — apply via
    * [[probeCells]] so the query column's element type never matters.
    */
  private def probeCellsUdf(centroids: Array[Array[Double]], nprobe: Int) =
    udf((a: Seq[Double]) => {
      val v = a.toArray
      centroids.zipWithIndex.map { case (c, i) =>
        var d = 0d; var j = 0
        while (j < math.min(c.length, v.length)) {
          val t = c(j) - v(j); d += t * t; j += 1
        }
        (d, i)
      }.sortBy(_._1).take(nprobe).map(_._2)
    })

  /** [[probeCellsUdf]] with the float/double boundary cast applied. */
  private def probeCells(centroids: Array[Array[Double]], nprobe: Int,
                         vec: Column): Column =
    probeCellsUdf(centroids, nprobe)(vec.cast("array<double>"))

  /** IVF (inverted-file) approximate top-k: k-means the corpus into
    * `nlist` cells (MLlib KMeans, fixed seed), store each vector under its
    * cell id, probe the `nprobe` nearest cells per query. At 100 TB the
    * cell id is the corpus partition/bucket key, so a query touches
    * nprobe/nlist of the data; the centroid table is tiny and lives on the
    * driver/broadcast.
    */
  def ivfTopK(queries: DataFrame, corpus: DataFrame,
              qIdCol: String, qVecCol: String,
              cIdCol: String, cVecCol: String,
              k: Int, nlist: Int, nprobe: Int,
              fitSampleRows: Long = 100000L): DataFrame = {
    val corpusC = corpus.select(col(cIdCol).as("neighbor_id"), col(cVecCol).as("cv"))
    val centroids = fitCentroids(corpusC, nlist, fitSampleRows)
    // full-corpus cell assignment: one primitive-typed Catalyst expression
    // over the scan — no UDF, no MLlib row boxing
    val assigned = corpusC.withColumn("cell",
      graft.expr.VectorExprs.nearest_centroid(col("cv"), centroids))
    val q = queries.select(col(qIdCol).as("query_id"), col(qVecCol).as("qv"))
      .withColumn("cell", explode(probeCells(centroids, nprobe, col("qv"))))
    explodeTopK(
      assigned.join(broadcast(q), Seq("cell"))
        .filter(col("neighbor_id") =!= col("query_id"))
        .withColumn("cosine", Dedup.cosine(col("qv"), col("cv"))), k)
  }

  // --------------------------------------------------------------- SemDeDup

  /** SemDeDup-style semantic near-duplicate pairs (Abbas et al. 2023):
    * k-means the embedding space into `nlist` cells, then compare only
    * within-cell pairs for cosine ≥ `threshold`. The clustering is the
    * blocking structure — pair cost drops from n² to Σ|cell|², and recall
    * is bounded by how often true near-dups land in the same cell (the
    * paper's tradeoff; raise `nlist` for speed, lower it for recall).
    *
    * Returns (id_a, id_b, cosine) pairs; feed them to
    * [[Dedup.connectedComponents]] + an anti-join to prune, as
    * [[semDedupKeep]] does.
    */
  def semDedupPairs(emb: DataFrame, vecCol: String, idCol: String,
                    threshold: Double, nlist: Int,
                    fitSampleRows: Long = 100000L): DataFrame = {
    val embC = emb.select(col(idCol), col(vecCol).as("cv"))
    val centroids = fitCentroids(embC, nlist, fitSampleRows)
    val assigned = embC
      .withColumn("__cell",
        graft.expr.VectorExprs.nearest_centroid(col("cv"), centroids))
      .select(col(idCol), col("cv").as(vecCol), col("__cell"))
    Dedup.embeddingNearDup(assigned, vecCol, idCol, threshold, Seq("__cell"))
  }

  /** SemDeDup pruning: keep one representative (min id) per semantic
    * duplicate cluster; rows with no near-dup pass through.
    */
  def semDedupKeep(emb: DataFrame, vecCol: String, idCol: String,
                   threshold: Double, nlist: Int): DataFrame = {
    val pairs = semDedupPairs(emb, vecCol, idCol, threshold, nlist)
    val drop = Dedup.connectedComponents(pairs, "id_a", "id_b")
      .filter(col("id") =!= col("rep"))
      .select(col("id").as(idCol))
    emb.join(drop, Seq(idCol), "left_anti")
  }

  // ------------------------------------------------------- clustering

  /** Fit k-means centroids over an embedding column (bounded driver-side
    * sample, fixed seed — see [[fitCentroids]]), exposed for corpus
    * clustering / curriculum bucketing pipelines.
    */
  def fitKmeans(emb: DataFrame, vecCol: String, k: Int,
                fitSampleRows: Long = 100000L): Array[Array[Double]] =
    fitCentroids(emb.select(col(vecCol).as("cv")), k, fitSampleRows)

  /** Assign every vector its nearest centroid (squared-L2, ties to the
    * lowest index) via the codegen [[graft.expr.VectorExprs.NearestCentroid]]
    * expression. The corpus never leaves the executors; the centroid table
    * is a broadcast-sized literal. Returns the input plus `cluster`.
    */
  def assignClusters(emb: DataFrame, vecCol: String, idCol: String,
                     centroids: Array[Array[Double]]): DataFrame =
    emb.select(col(idCol), col(vecCol).as("cv"))
      .withColumn("cluster",
        graft.expr.VectorExprs.nearest_centroid(col("cv"), centroids))
      .select(col(idCol), col("cluster"))

  /** K-means document clustering end-to-end: fit on a sample, assign all.
    * One scan + one tiny fit job — no shuffle in the assignment pass.
    */
  def kmeansCluster(emb: DataFrame, vecCol: String, idCol: String, k: Int,
                    fitSampleRows: Long = 100000L): DataFrame =
    assignClusters(emb, vecCol, idCol, fitKmeans(emb, vecCol, k, fitSampleRows))

  // ------------------------------------------------ persisted IVF index

  private val CentroidsKey = "__graft_ivf_centroids__"

  /** Build and PERSIST an IVF index: fit centroids once, assign every
    * corpus vector its cell, write the corpus partitioned by cell with the
    * centroid table in the keyword sidecar. This is the batch-ANN shape at
    * 100 TB — the expensive fit+assign runs once, and every later query
    * batch reads only its probed cells' partition directories (static
    * partition pruning, see [[ivfSearchIndex]]) instead of re-clustering
    * the corpus per call the way [[ivfTopK]] does.
    */
  def buildIvfIndex(corpus: DataFrame, cIdCol: String, cVecCol: String,
                    path: String, nlist: Int,
                    fitSampleRows: Long = 100000L): Unit = {
    val corpusC = corpus.select(col(cIdCol).as("neighbor_id"), col(cVecCol).as("cv"))
    val centroids = fitCentroids(corpusC, nlist, fitSampleRows)
    corpusC.withColumn("cell",
        graft.expr.VectorExprs.nearest_centroid(col("cv"), centroids))
      .write.mode("overwrite").partitionBy("cell").parquet(path)
    val json = centroids.map(_.mkString("[", ",", "]")).mkString("[", ",", "]")
    graft.api.MSWrite.putKeywords(corpus.sparkSession, path,
      graft.api.MSWrite.readKeywords(corpus.sparkSession, path) +
        (CentroidsKey -> json))
  }

  /** Centroids stored with an index by [[buildIvfIndex]]. */
  def readIvfCentroids(spark: org.apache.spark.sql.SparkSession,
                       path: String): Array[Array[Double]] = {
    val json = graft.api.MSWrite.readKeywords(spark, path).getOrElse(CentroidsKey,
      throw new IllegalArgumentException(s"no IVF centroids sidecar at $path"))
    // [[a,b,...],[...]] — doubles round-trip exactly through toString
    json.stripPrefix("[").stripSuffix("]").split("\\],\\[")
      .map(_.replaceAll("[\\[\\]]", "").split(",").map(_.toDouble))
  }

  /** Query a persisted IVF index. The probed cell set (≤ queries × nprobe
    * distinct values) is applied as a literal `isin` filter BEFORE the
    * join, so Parquet partition pruning skips every unprobed cell
    * directory — the scan cost is nprobe/nlist of the index regardless of
    * corpus size.
    */
  def ivfSearchIndex(spark: org.apache.spark.sql.SparkSession, path: String,
                     queries: DataFrame, qIdCol: String, qVecCol: String,
                     k: Int, nprobe: Int): DataFrame = {
    val centroids = readIvfCentroids(spark, path)
    val q = queries.select(col(qIdCol).as("query_id"), col(qVecCol).as("qv"))
      .withColumn("cell", explode(probeCells(centroids, nprobe, col("qv"))))
    // queries are small by contract — collecting the probed cells gives a
    // plan-time literal the scan can prune partitions with
    val probed = q.select("cell").distinct().collect().map(_.getInt(0)).toSeq
    val corpus = spark.read.parquet(path)
      .filter(col("cell").isin(probed: _*))
    explodeTopK(
      corpus.join(broadcast(q), Seq("cell"))
        .filter(col("neighbor_id") =!= col("query_id"))
        .withColumn("cosine", Dedup.cosine(col("qv"), col("cv"))), k)
  }

  // ------------------------------------------------ product quantization

  /** Product-quantization codebooks (Jégou, Douze, Schmid, "Product
    * Quantization for Nearest Neighbor Search", TPAMI 2011): the embedding
    * space is split into `m` subspaces, each quantized independently with
    * `ksub` centroids — a vector compresses to `m` small codes.
    */
  case class PqModel(codebooks: Array[Array[Array[Double]]]) {
    def m: Int = codebooks.length
    def ksub: Int = codebooks(0).length
    def subDim: Int = codebooks(0)(0).length
    /** Flattened m×ksub table of squared centroid norms — the
      * query-INDEPENDENT half of the approximate-cosine denominator.
      */
    def normLut: Array[Double] =
      codebooks.flatMap(_.map(c => { var s = 0d; var i = 0
        while (i < c.length) { s += c(i) * c(i); i += 1 }; s }))
  }

  private[ops] def toDoubleArray(a: Seq[Any]): Array[Double] =
    a.map {
      case f: java.lang.Float => f.toDouble
      case d: java.lang.Double => d.doubleValue
      case l: java.lang.Long => l.toDouble
      case i: java.lang.Integer => i.toDouble
      case other => throw new IllegalArgumentException(s"vector element: $other")
    }.toArray

  /** Seeded Lloyd's k-means on a driver-side point set (the PQ sub-problems
    * are tiny — sample × subDim — so a local loop beats M distributed MLlib
    * fits and is bit-deterministic). Empty cells keep their previous
    * centroid.
    */
  private def kmeansLloyd(pts: Array[Array[Double]], k: Int, iters: Int,
                          seed: Long): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    val order = rnd.shuffle(pts.indices.toVector)
    var cents = order.take(k).map(pts(_).clone).toArray
    if (cents.length < k)
      cents = cents ++ Array.fill(k - cents.length)(pts(order(rnd.nextInt(pts.length))).clone)
    val dim = pts(0).length
    var it = 0
    while (it < iters) {
      val sums = Array.fill(k)(new Array[Double](dim))
      val cnts = new Array[Int](k)
      pts.foreach { p =>
        var best = 0; var bd = Double.MaxValue
        var c = 0
        while (c < k) {
          var d = 0d; var i = 0
          while (i < dim) { val t = cents(c)(i) - p(i); d += t * t; i += 1 }
          if (d < bd) { bd = d; best = c }
          c += 1
        }
        var i = 0
        while (i < dim) { sums(best)(i) += p(i); i += 1 }
        cnts(best) += 1
      }
      cents = Array.tabulate(k)(c =>
        if (cnts(c) == 0) cents(c)
        else { val s = sums(c); Array.tabulate(dim)(i => s(i) / cnts(c)) })
      it += 1
    }
    cents
  }

  /** Fit PQ codebooks on a bounded corpus sample: per subspace, seeded
    * Lloyd's on the sample's subvectors. Deterministic (fixed seed, fixed
    * iteration count). The sample — not the corpus — comes to the driver.
    */
  def fitPq(corpus: DataFrame, vecCol: String, m: Int, ksub: Int,
            fitSampleRows: Long = 50000L, seed: Long = 42L,
            iters: Int = 15): PqModel = {
    val vecs = corpus.select(col(vecCol))
    val n = vecs.count()
    val frac = math.min(1.0, fitSampleRows.toDouble / math.max(n, 1L))
    val sample = (if (frac < 1.0) vecs.sample(withReplacement = false, frac, seed)
                  else vecs)
      .collect().map(r => toDoubleArray(r.getSeq[Any](0)))
    require(sample.nonEmpty, "fitPq: empty corpus")
    val dim = sample.head.length
    require(dim % m == 0, s"fitPq: dim $dim not divisible by m=$m")
    val sub = dim / m
    PqModel(Array.tabulate(m) { s =>
      val pts = sample.map(v => java.util.Arrays.copyOfRange(v, s * sub, (s + 1) * sub))
      kmeansLloyd(pts, ksub, iters, seed + s)
    })
  }

  /** PQ-compressed approximate top-k with exact re-ranking.
    *
    * Scale shape (the point of PQ at 100 TB): the corpus is scanned once to
    * encode (codegen [[graft.expr.VectorExprs.PqEncode]]), after which the
    * search operates on `4·m` bytes per vector instead of `4·dim` — a
    * 64-dim float corpus shrinks 8× with m=8. The ADC scoring pass is one
    * table lookup per subspace against per-query broadcast LUTs (no
    * per-element arithmetic), feeds the bounded-heap
    * [[graft.functions.TopKAgg]] (≤ k·refine rows per query per task cross
    * the shuffle), and only the surviving candidates — queries × k·refine
    * rows — touch full vectors again for the exact cosine re-rank.
    *
    * Approximate score = cos(q, x̂) where x̂ is the PQ reconstruction:
    * Σ_s dot(q_s, c_s) / (|q| · sqrt(Σ_s |c_s|²)) — both sums are ADC
    * lookups ([[graft.expr.VectorExprs.PqAdc]]); the numerator table is
    * per-query, the norm table is a plan constant.
    */
  /** Shared ADC first pass for every PQ-family searcher ([[pqTopK]],
    * [[ivfPqSearchIndex]], [[pcaPqSearchIndex]]): score codes against the
    * broadcast per-query LUTs (approx cosine = ADC dot / (|q| ·
    * reconstructed norm)), keep a bounded-heap k·refine per query, and
    * return (query_id, neighbor_id) candidates. `q` must carry
    * (query_id, dot_lut, qnorm) plus `cell` when `joinOnCell` — cell-keyed
    * indexes equi-join, flat ones broadcast-cross. One site owns the
    * scoring formula, so a guard added here covers every index shape.
    */
  private def adcCandidates(codes: DataFrame, q: DataFrame, model: PqModel,
                            k: Int, refine: Int,
                            joinOnCell: Boolean = false): DataFrame = {
    val normLut = array(model.normLut.toSeq.map(lit): _*)
    val joined =
      if (joinOnCell) codes.join(broadcast(q), Seq("cell"))
      else codes.crossJoin(broadcast(q))
    joined
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("approx",
        graft.expr.VectorExprs.pq_adc(col("codes"), col("dot_lut"), model.ksub) /
          (col("qnorm") *
            sqrt(graft.expr.VectorExprs.pq_adc(col("codes"), normLut, model.ksub))))
      .groupBy("query_id")
      .agg(graft.functions.TopKAgg.topk(col("approx"), col("neighbor_id"),
        k * refine).as("tk"))
      .select(col("query_id"), explode(col("tk")).as("c"))
      .select(col("query_id"), col("c.id").as("neighbor_id"))
  }

  def pqTopK(queries: DataFrame, corpus: DataFrame,
             qIdCol: String, qVecCol: String,
             cIdCol: String, cVecCol: String,
             k: Int, m: Int = 8, ksub: Int = 16, refine: Int = 8,
             fitSampleRows: Long = 50000L): DataFrame = {
    val corpusC = corpus.select(col(cIdCol).as("neighbor_id"), col(cVecCol).as("cv"))
    val model = fitPq(corpusC, "cv", m, ksub, fitSampleRows)
    val codes = corpusC.select(col("neighbor_id"),
      graft.expr.VectorExprs.pq_encode(col("cv"), model.codebooks).as("codes"))
    val q = queries.select(col(qIdCol).as("query_id"), col(qVecCol).as("qv"))
      .withColumn("__l", pqLutUdf(model.codebooks)(col("qv")))
      .select(col("query_id"), col("qv"),
        col("__l._1").as("dot_lut"), col("__l._2").as("qnorm"))
    val cand = adcCandidates(codes,
      q.select("query_id", "dot_lut", "qnorm"), model, k, refine)
    // exact re-rank: a broadcast join against the candidate ids — the
    // corpus streams past once more, but only the ≤ queries × k·refine
    // candidate rows compute the exact cosine, never a full rescore (the
    // persisted-index forms go further and prune the scan itself with a
    // collected candidate-id literal; here the corpus is an arbitrary
    // caller plan, not a parquet layout we control)
    val rer = corpusC.join(broadcast(cand), Seq("neighbor_id"))
      .join(broadcast(q.select("query_id", "qv")), Seq("query_id"))
      .withColumn("cosine", Dedup.cosine(col("qv"), col("cv")))
    explodeTopK(rer, k)
  }

  /** faiss-style SQ8 scalar quantization fit: per-dimension [min, max]
    * from ONE training pass. Returns (mins, scales) where a coordinate
    * stores as `round((x − min_i) / scale_i)` in one byte (scale_i =
    * range_i / 255; a constant dimension gets scale 0 and decodes
    * exactly to its min). 4× smaller than float32 vectors with
    * near-lossless cosine — the cheapest compression tier below PQ.
    *
    * Scale shape: one posexplode + per-dim hash-aggregate with map-side
    * combine — d rows leave the shuffle, the model is O(d) driver state
    * broadcast in the encode/score closures.
    */
  def fitSq8(corpus: DataFrame, vecCol: String): (Array[Double], Array[Double]) = {
    val stats = corpus.select(posexplode(col(vecCol)))
      .select(col("pos"), col("col").cast("double").as("__x"))
      .groupBy("pos").agg(min("__x").as("mn"), max("__x").as("mx"))
      .orderBy("pos")
      .collect()
    require(stats.nonEmpty, "fitSq8: empty corpus or vectors")
    val mins = stats.map(_.getDouble(1))
    val scales = stats.map(r => (r.getDouble(2) - r.getDouble(1)) / 255.0)
    (mins, scales)
  }

  private def sq8EncodeUdf(mins: Array[Double], scales: Array[Double]) =
    // Seq[Double]: float embeddings widen via Spark's implicit cast
    udf { (v: Seq[Double]) =>
      if (v == null) null
      else {
        val x = v.toArray
        require(x.length == mins.length,
          s"sq8: vector has ${x.length} dims, model has ${mins.length}")
        val out = new Array[Byte](x.length)
        var i = 0
        while (i < x.length) {
          val c =
            if (scales(i) == 0) 0
            else math.max(0, math.min(255,
              math.round((x(i) - mins(i)) / scales(i)).toInt))
          out(i) = c.toByte
          i += 1
        }
        out
      }
    }

  private def sq8ScoreUdf(mins: Array[Double], scales: Array[Double]) =
    udf { (qv: Seq[Double], codes: Array[Byte]) =>
      if (qv == null || codes == null) Option.empty[Double]
      else {
        val q = qv.toArray
        // a query whose dimension differs from the corpus's would
        // silently truncate the cosine — fail loudly, mirroring
        // pqLutUdf's query-side check and the encode-side require
        require(q.length == codes.length && codes.length == mins.length,
          s"sq8: query has ${q.length} dims, codes ${codes.length}, " +
            s"model ${mins.length}")
        var dot = 0d; var nq = 0d; var nx = 0d
        var i = 0
        while (i < codes.length) {
          val x = mins(i) + (codes(i) & 0xFF) * scales(i)
          dot += q(i) * x; nq += q(i) * q(i); nx += x * x
          i += 1
        }
        Some(if (nq == 0 || nx == 0) 0d else dot / math.sqrt(nq * nx))
      }
    }

  /** SQ8 approximate top-k: score every corpus CODE against the
    * broadcast queries (the 1-byte-per-dim decode rides the scan), keep
    * k·refine candidates per query through the bounded-heap
    * [[graft.functions.TopKAgg]], then re-rank exactly — the byte-level
    * sibling of [[pqTopK]] (coarser compression there, finer here; at
    * 255 levels per dim the approximate order is near-exact, so small
    * `refine` suffices).
    *
    * Scale shape: fit is one d-row aggregate; the scoring scan reads
    * d bytes per code instead of 4–8d vector bytes; ≤ queries·k·refine
    * candidate rows re-rank against the full vectors by broadcast join.
    */
  def sq8TopK(queries: DataFrame, corpus: DataFrame,
              qIdCol: String, qVecCol: String,
              cIdCol: String, cVecCol: String,
              k: Int, refine: Int = 4): DataFrame = {
    require(k >= 1 && refine >= 1, s"sq8TopK: k=$k refine=$refine")
    val c = corpus.select(col(cIdCol).as("neighbor_id"), col(cVecCol).as("cv"))
    val (mins, scales) = fitSq8(c, "cv")
    val codes = c.select(col("neighbor_id"),
      sq8EncodeUdf(mins, scales)(col("cv")).as("codes"))
    val q = queries.select(col(qIdCol).as("query_id"), col(qVecCol).as("qv"))
    val scored = codes.crossJoin(broadcast(q))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine",
        sq8ScoreUdf(mins, scales)(col("qv"), col("codes")))
    val cand = explodeTopK(scored, k * refine)
      .select("query_id", "neighbor_id")
    val rer = c.join(broadcast(cand), Seq("neighbor_id"))
      .join(broadcast(q), Seq("query_id"))
      .withColumn("cosine", Dedup.cosine(col("qv"), col("cv")))
    explodeTopK(rer, k)
  }

  /** PCA-rotated PQ search — the faiss `PCAR{k},PQ{m}` recipe (Jégou
    * 2011 §V.A): fit a truncated orthonormal basis on the corpus
    * ([[Pca.fitPca]], one covariance pass + driver Jacobi), run the PQ
    * candidate search entirely in the ROTATED pcaK-dim space (the ADC
    * scan reads pcaK/d of the bytes per code and the subquantizers see
    * decorrelated coordinates — the reason faiss rotates before PQ),
    * then re-rank the surviving ~2k candidates EXACTLY in the ORIGINAL
    * space, so truncation error can demote but never mis-score a
    * returned neighbor.
    *
    * Scale shape: both projections are scan-side [[graft.expr.VectorExprs.AffineProject]]
    * expressions; the inner [[pqTopK]] contributes its broadcast-LUT ADC
    * scan + bounded-heap top-k; the final re-rank joins candidate ids
    * back to the full-width vectors by broadcast — only candidates are
    * rescored ([[buildPcaPqIndex]]/[[pcaPqSearchIndex]] is the form that
    * also prunes the vectors SCAN, via its id-sorted layout plus a
    * collected candidate-id literal).
    */
  def pcaPqTopK(queries: DataFrame, corpus: DataFrame,
                qIdCol: String, qVecCol: String,
                cIdCol: String, cVecCol: String,
                k: Int, pcaK: Int, m: Int = 8, ksub: Int = 16,
                refine: Int = 8, fitSampleRows: Long = 50000L): DataFrame = {
    // fitPca treats k <= 0 as keep-all, which would make the basis.k
    // check below fire with a wrong diagnosis ("0 exceeds dimension")
    require(pcaK > 0, s"pcaPqTopK: pcaK must be positive, got $pcaK")
    require(pcaK % m == 0, s"pcaPqTopK: pcaK $pcaK not divisible by m=$m")
    val basis = Pca.fitPca(corpus, cVecCol, k = pcaK)
    // fitPca clamps k to the corpus dimension; a clamped basis would break
    // the pcaK % m contract (or silently change the index geometry) — fail
    // at the bad argument, not downstream in fitPq
    require(basis.k == pcaK,
      s"pcaPqTopK: pcaK $pcaK exceeds corpus dimension ${basis.k}")
    val projC = Pca.projectPca(corpus, cVecCol, cIdCol, basis)
    val projQ = Pca.projectPca(queries, qVecCol, qIdCol, basis)
    val cand = pqTopK(projQ, projC, qIdCol, "pca", cIdCol, "pca",
        k = 2 * k, m = m, ksub = ksub, refine = refine,
        fitSampleRows = fitSampleRows)
      .select(col("query_id"), col("neighbor_id"))
    val rer = corpus
      .select(col(cIdCol).as("neighbor_id"), col(cVecCol).as("cv"))
      .join(broadcast(cand), Seq("neighbor_id"))
      .join(broadcast(queries.select(col(qIdCol).as("query_id"),
        col(qVecCol).as("qv"))), Seq("query_id"))
      .withColumn("cosine", Dedup.cosine(col("qv"), col("cv")))
    explodeTopK(rer, k)
  }

  private val PcaPqKey = "__graft_pcapq__"

  /** Build and PERSIST a PCAR+PQ index — the fit-once/search-many form of
    * [[pcaPqTopK]] (which refits basis and codebooks per call). Layout:
    *
    *  - `path/codes`   — (neighbor_id, codes): rotated-space PQ codes,
    *    `4·m` bytes per vector — the flat ADC scan
    *  - `path/vectors` — (neighbor_id, cv), range-partitioned and sorted
    *    by id so the candidate re-rank's id filter prunes parquet row
    *    groups on footer min/max stats
    *  - sidecar — PCA mean + components + PQ codebooks + params
    */
  def buildPcaPqIndex(corpus: DataFrame, cIdCol: String, cVecCol: String,
                      path: String, pcaK: Int, m: Int = 8, ksub: Int = 16,
                      fitSampleRows: Long = 50000L): Unit = {
    require(pcaK > 0, s"buildPcaPqIndex: pcaK must be positive, got $pcaK")
    require(pcaK % m == 0, s"buildPcaPqIndex: pcaK $pcaK not divisible by m=$m")
    val basis = Pca.fitPca(corpus, cVecCol, k = pcaK)
    require(basis.k == pcaK,
      s"buildPcaPqIndex: pcaK $pcaK exceeds corpus dimension ${basis.k}")
    val corpusC = corpus.select(col(cIdCol).as("neighbor_id"),
      col(cVecCol).as("cv"))
    // same projection policy as the inline pcaPqTopK path (whiten=false =>
    // unit scale) — one decision point, not a hand-rolled twin
    val projected = Pca.projectPca(corpusC, "cv", "neighbor_id", basis)
    val model = fitPq(projected, "pca", m, ksub, fitSampleRows)
    projected
      .withColumn("codes",
        graft.expr.VectorExprs.pq_encode(col("pca"), model.codebooks))
      .select("neighbor_id", "codes")
      .write.mode("overwrite").parquet(s"$path/codes")
    corpusC
      .repartitionByRange(col("neighbor_id"))
      .sortWithinPartitions("neighbor_id")
      .write.mode("overwrite").parquet(s"$path/vectors")
    val json = s"""{"pcaK":$pcaK,"m":$m,"ksub":$ksub,""" +
      s""""mean":${matToJson(Array(basis.mean))},""" +
      s""""components":${matToJson(basis.components)},""" +
      s""""codebooks":${matToJson(model.codebooks.flatten)}}"""
    graft.api.MSWrite.putKeywords(corpus.sparkSession, path,
      graft.api.MSWrite.readKeywords(corpus.sparkSession, path) +
        (PcaPqKey -> json))
  }

  private[ops] def readPcaPqSidecar(spark: org.apache.spark.sql.SparkSession,
                                    path: String)
      : (Array[Double], Array[Array[Double]], PqModel) = {
    val json = graft.api.MSWrite.readKeywords(spark, path).getOrElse(PcaPqKey,
      throw new IllegalArgumentException(s"no PCAR-PQ sidecar at $path"))
    val sc = new SidecarJson(json, "PCAR-PQ")
    val meanRows = sc.mat("mean")
    require(meanRows.length == 1, "PCAR-PQ sidecar: mean must be one row")
    (meanRows(0), sc.mat("components"), sc.pqModel())
  }

  /** Query a persisted [[buildPcaPqIndex]]: queries rotate through the
    * stored basis (scan-side AffineProject), the flat codes table scores
    * by ADC with bounded-heap k·refine candidates, and the exact re-rank
    * reads ORIGINAL vectors for candidate ids only (row-group pruned by
    * the id-sorted layout). Same recall-floor protocol as [[pcaPqTopK]].
    */
  def pcaPqSearchIndex(spark: org.apache.spark.sql.SparkSession, path: String,
                       queries: DataFrame, qIdCol: String, qVecCol: String,
                       k: Int, refine: Int = 8): DataFrame = {
    val (mean, components, model) = readPcaPqSidecar(spark, path)
    val ones = Array.fill(components.length)(1.0)
    val q = queries.select(col(qIdCol).as("query_id"), col(qVecCol).as("qv"))
      .withColumn("__p", graft.expr.VectorExprs.affine_project(
        col("qv"), components, mean, ones))
      .withColumn("__l", pqLutUdf(model.codebooks)(col("__p")))
      .select(col("query_id"), col("qv"),
        col("__l._1").as("dot_lut"), col("__l._2").as("qnorm"))
    val cand = adcCandidates(spark.read.parquet(s"$path/codes"),
      q.select("query_id", "dot_lut", "qnorm"), model, k, refine)
    val (candIds, candLocal) = collectCandidates(spark, cand)
    val rer = spark.read.parquet(s"$path/vectors")
      .filter(col("neighbor_id").isin(candIds: _*))
      .join(broadcast(candLocal), Seq("neighbor_id"))
      .join(broadcast(q.select("query_id", "qv")), Seq("query_id"))
      .withColumn("cosine", Dedup.cosine(col("qv"), col("cv")))
    explodeTopK(rer, k)
  }

  /** Collect an [[adcCandidates]] frame for the exact re-rank: the rows
    * come back as a LOCAL relation (so the ADC scan runs exactly once)
    * and the distinct neighbor ids as a plan-time literal list for an
    * `isin` the vectors scan pushes to Parquet — without the literal, a
    * broadcast join alone reads every row group of the id-sorted table
    * the index build paid a range shuffle to lay out.
    *
    * Driver state is ≤ queries × k·refine rows. That is bounded by the
    * same contract that makes the whole indexed-search shape work: the
    * query BATCH is broadcast-small (each query already ships an m·ksub
    * LUT to every task), exactly like [[ivfSearchIndex]]'s probed-cell
    * collect. Corpus size is unbounded; query batch size is not.
    */
  private def collectCandidates(spark: org.apache.spark.sql.SparkSession,
                                cand: DataFrame): (Seq[Any], DataFrame) = {
    val candRows = cand.collect()
    val candIds = candRows.map(_.getAs[Any]("neighbor_id")).distinct.toSeq
    val candLocal = spark.createDataFrame(
      java.util.Arrays.asList(candRows: _*), cand.schema)
    (candIds, candLocal)
  }

  /** Per-query ADC prep: the flattened m×ksub dot-product table plus the
    * query norm. A driver/broadcast-side UDF — it runs once per QUERY row,
    * never on the corpus.
    */
  private def pqLutUdf(cb: Array[Array[Array[Double]]]) =
    // Seq[Double] input: float embeddings widen via Spark's implicit
    // cast, and the double-typed PCA projections pass through unchanged
    udf((qv: Seq[Double]) => {
      val q = qv.toArray
      val sub = cb(0)(0).length
      // a query whose dimension differs from the corpus's m·subDim would
      // silently truncate the per-subspace dot products — fail loudly,
      // mirroring fitPq's corpus-side dim % m == 0 check
      require(q.length == cb.length * sub,
        s"PQ query dimension ${q.length} != corpus dimension ${cb.length * sub}")
      val lut = new Array[Double](cb.length * cb(0).length)
      var s = 0
      while (s < cb.length) {
        var c = 0
        while (c < cb(s).length) {
          var d = 0d; var i = 0
          while (i < sub) {
            d += q(s * sub + i) * cb(s)(c)(i); i += 1
          }
          lut(s * cb(s).length + c) = d
          c += 1
        }
        s += 1
      }
      (lut, math.sqrt(q.map(x => x * x).sum))
    })

  // --------------------------------------------- persisted IVF-PQ index

  private val IvfPqKey = "__graft_ivfpq__"

  private[ops] def matToJson(m: Array[Array[Double]]): String = {
    // NaN/Infinity have no JSON encoding — a degenerate k-means fit must
    // fail here at write time, not poison the sidecar for later readers
    require(m.forall(_.forall(java.lang.Double.isFinite)),
      "IVF-PQ sidecar: non-finite centroid/codebook value (degenerate fit?)")
    m.map(_.mkString("[", ",", "]")).mkString("[", ",", "]")
  }

  /** One sidecar-JSON parser for every persisted-index reader (IVF-PQ,
    * PCAR-PQ): field lookup with a loud missing-key error, 2-d array
    * parsing, and the m·ksub codebook re-chunk — a format hardening lands
    * once here instead of drifting across per-index copies.
    */
  private[ops] final class SidecarJson(json: String, prefix: String) {
    import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
    // real JSON parsing (Jackson ships with Spark): key order, whitespace,
    // and nesting are the parser's problem, not a regex's
    private val root = new ObjectMapper().readTree(json)
    private def field(k: String): JsonNode = {
      val n = root.get(k)
      require(n != null, s"$prefix sidecar missing '$k'")
      n
    }
    private def parse2d(n: JsonNode): Array[Array[Double]] = {
      import scala.jdk.CollectionConverters._
      require(n.isArray, s"$prefix sidecar: expected a 2-d array")
      n.elements().asScala.map { row =>
        require(row.isArray, s"$prefix sidecar: expected a 2-d array")
        row.elements().asScala.map { v =>
          // asDouble() maps strings/nulls silently to 0.0 — a corrupted
          // sidecar must fail at read, not seed a basis with zeros
          require(v.isNumber, s"$prefix sidecar: non-numeric element $v")
          v.asDouble()
        }.toArray
      }.toArray
    }
    def int(k: String): Int = {
      val n = field(k)
      // same rule as the matrix elements: asInt() would coerce "4x" to 0
      // (and 4.6 to 4) silently, then mis-blame the codebook row count
      require(n.isIntegralNumber && n.canConvertToInt,
        s"$prefix sidecar: non-integer '$k' value $n")
      n.asInt()
    }
    def mat(k: String): Array[Array[Double]] = parse2d(field(k))
    /** The flattened m·ksub codebook rows re-chunked into a [[PqModel]]. */
    def pqModel(): PqModel = {
      val m = int("m")
      val ksub = int("ksub")
      val rows2d = mat("codebooks")
      require(rows2d.length == m * ksub,
        s"$prefix sidecar: ${rows2d.length} codebook rows, expected ${m * ksub}")
      PqModel(rows2d.grouped(ksub).map(_.toArray).toArray)
    }
  }

  /** Build and PERSIST an IVF-PQ index (the FAISS IVFPQ shape, Jégou et
    * al. 2011): coarse k-means cells for partition pruning, PQ codes for a
    * compressed first-pass scan, and a cell-partitioned, id-sorted vector
    * table for exact re-ranking. Layout:
    *
    *  - `path/codes`   — (neighbor_id, codes, cell), partitioned by cell:
    *    the search scan, `4·m` bytes per vector
    *  - `path/vectors` — (neighbor_id, cv, cell), partitioned by cell and
    *    SORTED by id inside each file, so the candidate re-rank's id filter
    *    prunes parquet row groups on footer min/max stats
    *  - sidecar — coarse centroids + PQ codebooks + params
    *
    * At 100 TB a query batch touches nprobe/nlist of the codes table
    * (partition pruning), never the full vector table — only candidate
    * row groups of the probed cells.
    */
  def buildIvfPqIndex(corpus: DataFrame, cIdCol: String, cVecCol: String,
                      path: String, nlist: Int = 8, m: Int = 8,
                      ksub: Int = 16, fitSampleRows: Long = 50000L): Unit = {
    val corpusC = corpus.select(col(cIdCol).as("neighbor_id"), col(cVecCol).as("cv"))
    val centroids = fitCentroids(corpusC, nlist, fitSampleRows)
    val model = fitPq(corpusC, "cv", m, ksub, fitSampleRows)
    val assigned = corpusC.withColumn("cell",
      graft.expr.VectorExprs.nearest_centroid(col("cv"), centroids))
    assigned
      .withColumn("codes",
        graft.expr.VectorExprs.pq_encode(col("cv"), model.codebooks))
      .select(col("neighbor_id"), col("codes"), col("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(s"$path/codes")
    assigned
      .repartition(col("cell")).sortWithinPartitions("neighbor_id")
      .write.mode("overwrite").partitionBy("cell").parquet(s"$path/vectors")
    // codebooks stored flattened to m·ksub rows (m and ksub re-chunk it on
    // read) — keeps the sidecar a plain 2-d array like the centroids
    val json = s"""{"nlist":$nlist,"m":$m,"ksub":$ksub,""" +
      s""""centroids":${matToJson(centroids)},""" +
      s""""codebooks":${matToJson(model.codebooks.flatten)}}"""
    graft.api.MSWrite.putKeywords(corpus.sparkSession, path,
      graft.api.MSWrite.readKeywords(corpus.sparkSession, path) +
        (IvfPqKey -> json))
  }

  private[ops] def readIvfPqSidecar(spark: org.apache.spark.sql.SparkSession,
                                    path: String)
      : (Array[Array[Double]], PqModel) = {
    val json = graft.api.MSWrite.readKeywords(spark, path).getOrElse(IvfPqKey,
      throw new IllegalArgumentException(s"no IVF-PQ sidecar at $path"))
    val sc = new SidecarJson(json, "IVF-PQ")
    (sc.mat("centroids"), sc.pqModel())
  }

  /** Query a persisted [[buildIvfPqIndex]]: probed cells apply as literal
    * partition filters on BOTH tables; the first pass scans only the
    * probed cells' PQ codes (ADC scoring, bounded-heap k·refine
    * candidates); the exact re-rank reads vectors for candidate ids only.
    * Same recall-floor protocol as the other ANN operators.
    */
  def ivfPqSearchIndex(spark: org.apache.spark.sql.SparkSession, path: String,
                       queries: DataFrame, qIdCol: String, qVecCol: String,
                       k: Int, nprobe: Int, refine: Int = 8): DataFrame = {
    val (centroids, model) = readIvfPqSidecar(spark, path)
    val q = queries.select(col(qIdCol).as("query_id"), col(qVecCol).as("qv"))
      .withColumn("cell", explode(probeCells(centroids, nprobe, col("qv"))))
      .withColumn("__l", pqLutUdf(model.codebooks)(col("qv")))
      .select(col("query_id"), col("qv"), col("cell"),
        col("__l._1").as("dot_lut"), col("__l._2").as("qnorm"))
    val probed = q.select("cell").distinct().collect().map(_.getInt(0)).toSeq
    val codes = spark.read.parquet(s"$path/codes")
      .filter(col("cell").isin(probed: _*))
    val cand = adcCandidates(codes,
      q.select("query_id", "cell", "dot_lut", "qnorm"), model, k, refine,
      joinOnCell = true)
    // same pruning contract as pcaPqSearchIndex (see [[collectCandidates]]):
    // the cell filter prunes partition DIRECTORIES, the candidate-id
    // literal prunes ROW GROUPS inside the probed cells on the footer
    // min/max stats the id-sorted build laid down
    val (candIds, candLocal) = collectCandidates(spark, cand)
    val vectors = spark.read.parquet(s"$path/vectors")
      .filter(col("cell").isin(probed: _*) &&
        col("neighbor_id").isin(candIds: _*))
      .select("neighbor_id", "cv")
    val rer = vectors.join(broadcast(candLocal), Seq("neighbor_id"))
      .join(broadcast(q.select("query_id", "qv").distinct()), Seq("query_id"))
      .withColumn("cosine", Dedup.cosine(col("qv"), col("cv")))
    explodeTopK(rer, k)
  }

  /** LSH-bucketed approximate top-k with MULTIPROBE: a query probes its
    * own sign-pattern bucket plus every bucket within `probeBits` bit
    * flips (near-misses land in sign patterns that differ on the few
    * hyperplanes the pair straddles — probing them is the standard
    * recall/cost dial). probeBits=1 probes `1 + nPlanes` of the `2^nPlanes`
    * buckets; the corpus is still touched only via the bucket equi-join,
    * so at 100 TB the scan is bucket-pruned, never full.
    */
  def lshTopK(queries: DataFrame, corpus: DataFrame,
              qIdCol: String, qVecCol: String,
              cIdCol: String, cVecCol: String,
              k: Int, nPlanes: Int, dim: Int,
              probeBits: Int = 1): DataFrame = {
    require(probeBits >= 0 && probeBits <= 2, "probeBits in 0..2")
    val planes = hyperplanes(nPlanes, dim)
    // enumerate bit-flip masks up to probeBits (tiny: 1 + n + n(n-1)/2)
    val masks: Seq[Long] = {
      val one = (0 until nPlanes).map(i => 1L << i)
      val two = for { i <- 0 until nPlanes; j <- (i + 1) until nPlanes }
        yield (1L << i) | (1L << j)
      (Seq(0L) ++ (if (probeBits >= 1) one else Nil) ++
        (if (probeBits >= 2) two else Nil)).distinct
    }
    val q = queries.select(col(qIdCol).as("query_id"), col(qVecCol).as("qv"))
      .withColumn("__b0", lshBucket(col("qv"), planes))
      .withColumn("bucket",
        explode(array(masks.map(m => col("__b0").bitwiseXOR(lit(m))): _*)))
      .drop("__b0")
    val c = corpus.select(col(cIdCol).as("neighbor_id"), col(cVecCol).as("cv"))
      .withColumn("bucket", lshBucket(col("cv"), planes))
    explodeTopK(
      c.join(broadcast(q), Seq("bucket"))
        .filter(col("neighbor_id") =!= col("query_id"))
        .withColumn("cosine", Dedup.cosine(col("qv"), col("cv"))), k)
  }
}
