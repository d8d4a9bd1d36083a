package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Iterative graph operators over plain edge-list DataFrames — the link-
  * graph leg of web-corpus curation (page importance is a classic crawl
  * quality prior; Common Crawl publishes harmonic-centrality/PageRank
  * rankings for exactly this use).
  *
  * Spark-first shape: no GraphX/RDD — the edge list is repartitioned on
  * src ONCE and cached, and each synchronous iteration is one src-keyed
  * join plus one dst-keyed aggregate, both reusing that partitioning.
  * Driver state per iteration is a single double (the dangling mass).
  * Each iteration's ranks are localCheckpointed, so the logical plan is
  * truncated to one iteration — without that the tree doubles per
  * iteration (the ranks frame is referenced twice) and explodes
  * exponentially (the iterative-algorithm analog of fragment-chain
  * compaction).
  */
object Graph {

  /** Standard damped PageRank, up to `iters` synchronous iterations from
    * the uniform start:
    * {{{ r'(v) = (1-d)/N + d * ( Σ_{(s,v)∈E} r(s)/deg(s) + dangling/N ) }}}
    * with the rank mass of out-degree-0 nodes redistributed uniformly
    * (total mass stays 1 every iteration). Nodes = src ∪ dst of the edge
    * list. Returns (node: long, rank: double).
    *
    * `tol > 0` enables convergence early-stop: iteration halts once the
    * L1 rank delta Σ|r'(v) − r(v)| drops below `tol` — the standard
    * power-iteration criterion (Page et al. 1999 use the same norm). The
    * delta is one extra scalar aggregate per iteration over the
    * just-checkpointed ranks (the prev rank rides the same join that
    * builds the update, so no extra join materializes); `tol = 0` keeps
    * the fixed-iteration behavior with zero added work.
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iters: Int, damping: Double = 0.85,
               tol: Double = 0.0): DataFrame =
    pageRankCore(edges, srcCol, dstCol, iters, damping, tol)._1

  /** [[pageRank]] plus the number of iterations actually run — the
    * observable early-stop: with `tol > 0` a converged graph reports
    * fewer than `iters`. */
  def pageRankCore(edges: DataFrame, srcCol: String, dstCol: String,
                   iters: Int, damping: Double = 0.85,
                   tol: Double = 0.0): (DataFrame, Int) = {
    require(iters >= 0, s"iters must be >= 0: $iters")
    require(damping > 0 && damping < 1, s"damping in (0,1): $damping")
    require(tol >= 0, s"tol must be >= 0: $tol")
    val e = edges.select(col(srcCol).cast("long").as("node"),
        col(dstCol).cast("long").as("dst"))
      .repartition(col("node"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nodes = e.select(col("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val n = nodes.count()
    require(n > 0, "pageRank: empty graph")
    val deg = e.groupBy("node").agg(count(lit(1)).as("deg"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // the dangling-node SET is iteration-invariant — resolve it once, so
    // graphs without sinks (most link graphs after degree filtering) skip
    // the per-iteration scalar job entirely
    val danglingNodes = nodes.join(deg, Seq("node"), "left_anti")
      .localCheckpoint()
    val hasDangling = !danglingNodes.isEmpty
    var ranks = nodes.withColumn("rank", lit(1.0 / n))
    var it = 0
    var converged = false
    while (it < iters && !converged) {
      // dangling mass: one scalar action per iteration (O(1) driver state)
      val dangling =
        if (!hasDangling) 0d
        else ranks.join(danglingNodes, Seq("node"), "left_semi")
          .agg(coalesce(sum("rank"), lit(0d))).head().getDouble(0)
      val outflow = ranks.join(deg, Seq("node"))
        .select(col("node"), (col("rank") / col("deg")).as("share"))
      val contrib = outflow.join(e, Seq("node"))
        .groupBy("dst").agg(sum("share").as("c"))
        .select(col("dst").as("node"), col("c"))
      // prev rides the update join (ranks ⊇ nodes by construction), so
      // the convergence delta needs no second join against old ranks
      val next = ranks.select(col("node"), col("rank").as("__prev"))
        .join(contrib, Seq("node"), "left")
        .select(col("node"), col("__prev"),
          (lit((1.0 - damping) / n) + lit(damping) *
            (coalesce(col("c"), lit(0d)) + lit(dangling / n))).as("rank"))
      // localCheckpoint TRUNCATES the plan, it does not merely cache:
      // each iteration references the previous ranks twice (dangling +
      // outflow), so without truncation the logical tree doubles per
      // iteration — 2^iters nodes, OOM by ~20 on plan strings alone.
      // On a cluster with executor churn swap for reliable checkpoint()
      // (spark.sparkContext.setCheckpointDir) at the same call site.
      val cp = next.localCheckpoint()
      it += 1
      if (tol > 0 && it < iters) {
        // one scalar scan of the just-materialized checkpoint blocks
        val delta = cp.agg(sum(abs(col("rank") - col("__prev"))))
          .head().getDouble(0)
        converged = delta < tol
      }
      ranks = cp.drop("__prev")
    }
    // the final ranks are a checkpointed scan — the working frames'
    // cached blocks can go (plans remain valid; only the cache drops)
    e.unpersist(false); deg.unpersist(false)
    if (iters > 0) nodes.unpersist(false)
    (ranks, it)
  }
}
