package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{Dedup, Similarity}

/** QA probe for the approximate operators' derived checks: measures actual
  * recall/precision of IVF / LSH ANN and MinHash / SimHash / embedding-LSH
  * dedup against the in-engine exact baselines at each scale factor, so the
  * assertion floors in [[SparkEntry]] are set from evidence, not hope.
  *
  * Usage: runMain graft.RecallProbe [sfDir ...]
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    for (dir <- dirs) {
      println(s"=== $dir ===")
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val q = emb.filter(col("vec_id") < 8)

      val exactNN = Similarity.bruteForceTopK(q, emb,
          "vec_id", "embedding", "vec_id", "embedding", k = 5)
        .select("query_id", "neighbor_id")

      def annRecall(name: String, app: DataFrame): Unit = {
        val hits = exactNN.join(app.select("query_id", "neighbor_id"),
          Seq("query_id", "neighbor_id"), "left_semi")
          .groupBy("query_id").agg(count(lit(1)).as("n_hit"))
        val rec = q.select(col("vec_id").cast("long").as("query_id")).distinct()
          .join(hits, Seq("query_id"), "left")
          .select(col("query_id"),
            (coalesce(col("n_hit"), lit(0L)).cast("double") / 5.0).as("recall"))
          .orderBy("query_id").collect()
        val rs = rec.map(r => f"${r.getLong(0)}:${r.getDouble(1)}%.2f").mkString(" ")
        val minR = rec.map(_.getDouble(1)).min
        println(f"$name%-12s min=$minR%.2f  per-query: $rs")
      }
      annRecall("ann_ivf", Similarity.ivfTopK(q, emb,
        "vec_id", "embedding", "vec_id", "embedding", k = 5, nlist = 8, nprobe = 4))
      annRecall("ann_lsh", Similarity.lshTopK(q, emb,
        "vec_id", "embedding", "vec_id", "embedding", k = 5, nPlanes = 4, dim = 64))
      annRecall("ann_pq", Similarity.pqTopK(q, emb,
        "vec_id", "embedding", "vec_id", "embedding", k = 5, m = 16, ksub = 32,
        refine = 16))
      annRecall("ann_sq8", Similarity.sq8TopK(q, emb,
        "vec_id", "embedding", "vec_id", "embedding", k = 5, refine = 4))
      annRecall("ann_ivfpq", {
        val p = s"/root/repo/target/qtmp/probe_ivfpq"
        Similarity.buildIvfPqIndex(emb, "vec_id", "embedding", p,
          nlist = 8, m = 16, ksub = 32)
        Similarity.ivfPqSearchIndex(spark, p, q, "vec_id", "embedding",
          k = 5, nprobe = 4, refine = 16)
      })

      def pairStats(name: String, approx: DataFrame, exact: DataFrame): Unit = {
        val keys = Seq("id_a", "id_b")
        val nApp = approx.count(); val nEx = exact.count()
        val nBad = approx.join(exact, keys, "left_anti").count()
        val nMiss = exact.join(approx, keys, "left_anti").count()
        val recall = if (nEx == 0) 1.0 else 1.0 - nMiss.toDouble / nEx
        println(f"$name%-12s n=$nApp exact=$nEx falsePairs=$nBad recall=$recall%.3f")
      }
      // minhash recall vs the exact n-gram baseline, measured for the
      // self-tuned default AND the old fixed 8 bands — RECALL and COST
      // side by side, so a bench-line delta is attributable to the
      // banding profile, not guessed at. The exact baseline (the
      // expensive side) and each approx pair set are pinned so the
      // four-action pairStats never recomputes them.
      locally {
        val (bAuto, rAuto) = Dedup.lshParams(0.6, 32)
        println(s"DBG lshParams(threshold=0.6, k=32) = (bands=$bAuto, rows=$rAuto)")
        val exactPairs = Dedup.ngramJaccardPairs(docs, "text", "doc_id",
          Nil, 3, 0.6).select("id_a", "id_b").persist()
        exactPairs.count()
        for ((tag, bands) <- Seq(("auto", None), ("fixed8", Some(8)))) {
          def run() =
            Dedup.minHashDedup(docs, "text", "doc_id", threshold = 0.6,
              bands = bands).select("id_a", "id_b")
          run().count() // warm
          val t = (0 until 2).map { _ =>
            val t0 = System.nanoTime()
            run().count()
            (System.nanoTime() - t0) / 1e9
          }.min
          println(f"DBG minhash_cfg $tag bands=${bands.getOrElse(bAuto)} " +
            f"min_time=$t%.2f s")
          val app = run().persist()
          pairStats(s"minhash_$tag", app, exactPairs)
          app.unpersist(false)
        }
        exactPairs.unpersist(false)
      }
      pairStats("embed_lsh",
        Dedup.embeddingNearDupLSH(emb, "embedding", "vec_id", 0.4, 4, 64).select("id_a", "id_b"),
        Dedup.embeddingNearDup(emb, "embedding", "vec_id", 0.4, Nil).select("id_a", "id_b"))
      pairStats("semdedup",
        Similarity.semDedupPairs(emb, "embedding", "vec_id", 0.4, nlist = 8).select("id_a", "id_b"),
        Dedup.embeddingNearDup(emb, "embedding", "vec_id", 0.4, Nil).select("id_a", "id_b"))
      val sigs = docs.select(col("doc_id"), Dedup.simHash(col("text")).as("sig"))
      val allSim = sigs.select(col("doc_id").as("id_a"), col("sig").as("sig_a"))
        .crossJoin(sigs.select(col("doc_id").as("id_b"), col("sig").as("sig_b")))
        .filter(col("id_a") < col("id_b"))
        .filter(Dedup.hamming64(col("sig_a"), col("sig_b")) <= 3)
        .select("id_a", "id_b")
      pairStats("simhash",
        Dedup.simHashDedup(docs, "text", "doc_id", maxDist = 3).select("id_a", "id_b"),
        allSim)
    }
    spark.stop()
  }
}
