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
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.linalg.Vectors
    val corpusC = corpus.select(col(cIdCol).as("neighbor_id"), col(cVecCol).as("cv"))
    // fit centroids on a bounded sample (k-means needs a representative
    // sketch, not the full corpus) — the boxing toVec UDF runs only there
    val n = corpusC.count()
    val frac = math.min(1.0, fitSampleRows.toDouble / math.max(n, 1L))
    val toVec = udf((a: Seq[Float]) => Vectors.dense(a.map(_.toDouble).toArray))
    val fitSet = (if (frac < 1.0) corpusC.sample(withReplacement = false, frac, 42L)
                  else corpusC)
      .withColumn("features", toVec(col("cv")))
    val model = new KMeans().setK(nlist).setSeed(42L).setMaxIter(10)
      .fit(fitSet)
    val centroids: Array[Array[Double]] = model.clusterCenters.map(_.toArray)
    // full-corpus cell assignment: one primitive-typed Catalyst expression
    // over the scan — no UDF, no MLlib row boxing
    val assigned = corpusC.withColumn("cell",
      graft.expr.VectorExprs.nearest_centroid(col("cv"), centroids))
    val probeCells = udf((a: Seq[Float]) => {
      val v = a.map(_.toDouble).toArray
      centroids.zipWithIndex.map { case (c, i) =>
        var d = 0d; var j = 0
        while (j < math.min(c.length, v.length)) {
          val t = c(j) - v(j); d += t * t; j += 1
        }
        (d, i)
      }.sortBy(_._1).take(nprobe).map(_._2)
    })
    val q = queries.select(col(qIdCol).as("query_id"), col(qVecCol).as("qv"))
      .withColumn("cell", explode(probeCells(col("qv"))))
    explodeTopK(
      assigned.join(broadcast(q), Seq("cell"))
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
