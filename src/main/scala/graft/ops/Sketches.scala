package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cross-corpus set-overlap estimation from bottom-k (KMV) sketches
  * (Beyer et al., SIGMOD 2007): one scan per corpus produces k longs of
  * driver state; distinct counts, Jaccard, overlap and containment then
  * come from pure driver arithmetic — NO join, NO shuffle of either
  * corpus. The screening number of corpus curation at 100 TB: "how much
  * of crawl B is already in A" answered before committing to a full
  * dedup join, for the cost of two scans. Exact MinHash/PPJoin dedup
  * ([[Dedup]]) remains the precision tool once the estimate says it is
  * worth running.
  */
object Sketches {

  /** One corpus scan → the KMV sketch of `expr`'s distinct values: the k
    * smallest distinct xxhash64 values, ascending in unsigned order.
    * Partial-aggregated ([[graft.functions.KmvAgg]]) — each task ships at
    * most k longs into the one-row final merge.
    */
  def kmvSketch(df: DataFrame, expr: Column, k: Int): Array[Long] =
    // xxhash64(null) is the SEED (42), not null — gate the hash so null
    // keys are skipped by the aggregate instead of all colliding on 42
    df.select(graft.functions.KmvAgg.kmv(
        when(expr.isNotNull, xxhash64(expr)), k).as("sk"))
      .head().getSeq[Long](0).toArray

  /** Estimates derived from two KMV sketches built with the same k. */
  final case class OverlapEstimate(
      distinctA: Double, distinctB: Double, jaccard: Double,
      overlap: Double, containmentAinB: Double, containmentBinA: Double)

  private def unsignedFrac(h: Long): Double =
    ((h ^ Long.MinValue).toDouble - Long.MinValue.toDouble) / math.pow(2, 64)

  /** KMV distinct-count estimate: exact when the sketch is unsaturated
    * (fewer than k distinct values existed), else `(k-1) / u_k` with
    * `u_k` the k-th smallest hash mapped onto (0,1).
    */
  def distinctEstimate(sketch: Array[Long], k: Int): Double =
    if (sketch.length < k) sketch.length.toDouble
    else (k - 1).toDouble / unsignedFrac(sketch.last)

  /** Jaccard, overlap and both containments from two sketches: the
    * bottom-k of the union is itself a uniform sample of A ∪ B, so the
    * fraction of it present in BOTH sketches estimates J(A,B); overlap =
    * J · D(A∪B), containments = overlap / D.
    */
  def estimate(a: Array[Long], b: Array[Long], k: Int): OverlapEstimate = {
    val aSet = a.toSet
    val bSet = b.toSet
    val union = (aSet ++ bSet).toArray.map(_ ^ Long.MinValue).sorted
      .take(k).map(_ ^ Long.MinValue)
    val inBoth = union.count(h => aSet.contains(h) && bSet.contains(h))
    val j = if (union.isEmpty) 0d else inBoth.toDouble / union.length
    val dU =
      if (union.length < k) union.length.toDouble
      else (k - 1).toDouble / unsignedFrac(union.last)
    val dA = distinctEstimate(a, k)
    val dB = distinctEstimate(b, k)
    val ov = j * dU
    OverlapEstimate(dA, dB, j, ov,
      if (dA > 0) math.min(1d, ov / dA) else 0d,
      if (dB > 0) math.min(1d, ov / dB) else 0d)
  }

  /** Two scans + driver arithmetic → one estimate row. */
  def corpusOverlap(a: DataFrame, b: DataFrame, expr: Column,
                    k: Int = 1024): OverlapEstimate =
    estimate(kmvSketch(a, expr, k), kmvSketch(b, expr, k), k)

  /** ONE corpus scan → a KMV sketch per group (the aggregate is partial,
    * so each task ships ≤ k longs per group). Driver state O(groups·k).
    */
  def groupedKmvSketches(df: DataFrame, groupCol: String, expr: Column,
                         k: Int): Map[String, Array[Long]] =
    df.groupBy(col(groupCol).cast("string").as("__g"))
      .agg(graft.functions.KmvAgg.kmv(
        when(expr.isNotNull, xxhash64(expr)), k).as("sk"))
      .collect()
      .map(r => r.getString(0) -> r.getSeq[Long](1).toArray).toMap

  /** The pairwise overlap matrix of all groups from one corpus scan —
    * "how much do my N crawls overlap" without any join: G·(G−1)/2
    * estimates from G sketches of k longs each, all driver arithmetic.
    * Returns (group_a, group_b, jaccard, overlap, containment_a_in_b,
    * containment_b_in_a) for group_a < group_b.
    */
  def overlapMatrix(df: DataFrame, groupCol: String, expr: Column,
                    k: Int = 1024): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val sks = groupedKmvSketches(df, groupCol, expr, k).toSeq.sortBy(_._1)
    val rows = for {
      i <- sks.indices
      j <- (i + 1) until sks.size
    } yield {
      val e = estimate(sks(i)._2, sks(j)._2, k)
      (sks(i)._1, sks(j)._1, e.jaccard, e.overlap,
        e.containmentAinB, e.containmentBinA)
    }
    rows.toDF("group_a", "group_b", "jaccard", "overlap",
      "containment_a_in_b", "containment_b_in_a")
  }
}
