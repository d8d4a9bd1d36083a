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
              k: Int, nlist: Int, nprobe: Int): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.linalg.Vectors
    val spark = corpus.sparkSession
    val toVec = udf((a: Seq[Float]) => Vectors.dense(a.map(_.toDouble).toArray))
    val corpusV = corpus
      .select(col(cIdCol).as("neighbor_id"), col(cVecCol).as("cv"))
      .withColumn("features", toVec(col("cv")))
    val model = new KMeans().setK(nlist).setSeed(42L).setMaxIter(10)
      .fit(corpusV)
    val assigned = model.transform(corpusV)
      .select(col("neighbor_id"), col("cv"), col("prediction").as("cell"))
    val centroids: Array[Array[Double]] = model.clusterCenters.map(_.toArray)
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

  /** LSH-bucketed approximate top-k: probe only the query's bucket.
    * Recall < 1 by construction; bump `nPlanes` down / probe multiple
    * buckets for higher recall.
    */
  def lshTopK(queries: DataFrame, corpus: DataFrame,
              qIdCol: String, qVecCol: String,
              cIdCol: String, cVecCol: String,
              k: Int, nPlanes: Int, dim: Int): DataFrame = {
    val planes = hyperplanes(nPlanes, dim)
    val q = queries.select(col(qIdCol).as("query_id"), col(qVecCol).as("qv"))
      .withColumn("bucket", lshBucket(col("qv"), planes))
    val c = corpus.select(col(cIdCol).as("neighbor_id"), col(cVecCol).as("cv"))
      .withColumn("bucket", lshBucket(col("cv"), planes))
    explodeTopK(
      c.join(broadcast(q), Seq("bucket"))
        .filter(col("neighbor_id") =!= col("query_id"))
        .withColumn("cosine", Dedup.cosine(col("qv"), col("cv"))), k)
  }
}
