package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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
    val toVec = udf((a: Seq[Float]) => Vectors.dense(a.map(_.toDouble).toArray))
    val fitSet = (if (frac < 1.0) corpusC.sample(withReplacement = false, frac, 42L)
                  else corpusC)
      .withColumn("features", toVec(col("cv")))
    val model = new KMeans().setK(nlist).setSeed(42L).setMaxIter(10)
      .fit(fitSet)
    model.clusterCenters.map(_.toArray)
  }

  /** The `nprobe` nearest cells for each query vector (tiny: centroids are
    * a driver-side constant).
    */
  private def probeCellsUdf(centroids: Array[Array[Double]], nprobe: Int) =
    udf((a: Seq[Float]) => {
      val v = a.map(_.toDouble).toArray
      centroids.zipWithIndex.map { case (c, i) =>
        var d = 0d; var j = 0
        while (j < math.min(c.length, v.length)) {
          val t = c(j) - v(j); d += t * t; j += 1
        }
        (d, i)
      }.sortBy(_._1).take(nprobe).map(_._2)
    })

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
      .withColumn("cell", explode(probeCellsUdf(centroids, nprobe)(col("qv"))))
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
      .withColumn("cell", explode(probeCellsUdf(centroids, nprobe)(col("qv"))))
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
