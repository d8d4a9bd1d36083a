package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Similarity

/** ANN tier-selection sweep: recall@5 vs wall-time vs index bytes for
  * every ANN tier on the SAME embedding set, at the gated parameters —
  * the measured basis for the when-to-use table in `SCALE.md`. Run
  * against sf0.1 and the 8× replication (`target/sfbig`, produced by
  * [[ScalingProbe]]; pass dirs as args).
  *
  * Usage: runMain graft.TierSweep [embDir ...]
  * Prints one `TIER` line per (dir, tier):
  *   TIER dir=... name=... recall_mean=.. recall_min=.. build_s=..
  *     search_s=.. index_mb=..
  * search_s is the second (warm) run; build_s / index_mb are 0 for the
  * inline (fit-per-query-batch) tiers.
  */
object TierSweep {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.1", "/root/repo/target/sfbig")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val s = spark

    for (dir <- dirs) {
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
        .localCheckpoint()
      val q = emb.filter(col("vec_id") < 8).localCheckpoint()
      val n = emb.count()
      println(s"=== $dir (corpus $n vectors) ===")

      // exact top-5 baseline (also timed — brute force IS a tier)
      def timed[A](f: => A): (A, Double) = {
        val t0 = System.nanoTime()
        val r = f
        (r, (System.nanoTime() - t0) / 1e9)
      }
      def collectPairs(df: DataFrame): Set[(Long, Long)] =
        df.select(col("query_id").cast("long"),
            col("neighbor_id").cast("long"))
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val exact = collectPairs(Similarity.bruteForceTopK(q, emb,
        "vec_id", "embedding", "vec_id", "embedding", k = 5))

      def dirBytes(p: String): Long = {
        val path = new org.apache.hadoop.fs.Path(p)
        val fs = path.getFileSystem(
          spark.sparkContext.hadoopConfiguration)
        if (!fs.exists(path)) 0L
        else {
          val it = fs.listFiles(path, true)
          var b = 0L
          while (it.hasNext) b += it.next().getLen
          b
        }
      }

      /** One sweep row: warm once, time the second search run. */
      def tier(name: String, buildS: Double, indexPath: Option[String])
              (search: => DataFrame): Unit = {
        collectPairs(search) // warm (plans compile, index parquet in page cache)
        val (pairs, searchS) = timed(collectPairs(search))
        val byQ = pairs.groupBy(_._1)
        val recalls = exact.groupBy(_._1).map { case (qid, ex) =>
          val hit = byQ.getOrElse(qid, Set.empty)
          ex.count(hit.contains).toDouble / ex.size
        }.toSeq
        val mb = indexPath.map(dirBytes).getOrElse(0L) / 1e6
        println(f"TIER dir=$dir name=$name%-18s " +
          f"recall_mean=${recalls.sum / recalls.size}%.3f " +
          f"recall_min=${recalls.min}%.2f build_s=$buildS%.2f " +
          f"search_s=$searchS%.2f index_mb=$mb%.2f")
      }

      val ip = s"/root/repo/target/tiersweep"

      tier("brute", 0.0, None)(Similarity.bruteForceTopK(q, emb,
        "vec_id", "embedding", "vec_id", "embedding", k = 5))
      tier("lsh", 0.0, None)(Similarity.lshTopK(q, emb,
        "vec_id", "embedding", "vec_id", "embedding", k = 5,
        nPlanes = 4, dim = 64))
      tier("ivf", 0.0, None)(Similarity.ivfTopK(q, emb,
        "vec_id", "embedding", "vec_id", "embedding", k = 5,
        nlist = 8, nprobe = 4))
      tier("pq", 0.0, None)(Similarity.pqTopK(q, emb,
        "vec_id", "embedding", "vec_id", "embedding", k = 5,
        m = 16, ksub = 32, refine = 16))
      tier("sq8", 0.0, None)(Similarity.sq8TopK(q, emb,
        "vec_id", "embedding", "vec_id", "embedding", k = 5, refine = 4))
      tier("pcapq", 0.0, None)(Similarity.pcaPqTopK(q, emb,
        "vec_id", "embedding", "vec_id", "embedding", k = 5,
        pcaK = 48, m = 16, ksub = 32, refine = 24))
      tier("matryoshka", 0.0, None)(Similarity.matryoshkaTopK(q, emb,
        "vec_id", "embedding", "vec_id", "embedding", k = 5,
        dim = 32, refine = 40))
      tier("bq", 0.0, None)(Similarity.bqTopK(q, emb,
        "vec_id", "embedding", "vec_id", "embedding", k = 5, refine = 16))

      locally {
        val p = s"$ip/ivf"
        val (_, b) = timed(Similarity.buildIvfIndex(emb,
          "vec_id", "embedding", p, nlist = 8))
        tier("ivf_index", b, Some(p))(Similarity.ivfSearchIndex(s, p, q,
          "vec_id", "embedding", k = 5, nprobe = 4))
      }
      locally {
        val p = s"$ip/ivfpq"
        val (_, b) = timed(Similarity.buildIvfPqIndex(emb,
          "vec_id", "embedding", p, nlist = 8, m = 16, ksub = 32))
        tier("ivfpq_index", b, Some(p))(Similarity.ivfPqSearchIndex(s, p,
          q, "vec_id", "embedding", k = 5, nprobe = 4, refine = 16))
      }
      locally {
        val p = s"$ip/pcapq"
        val (_, b) = timed(Similarity.buildPcaPqIndex(emb,
          "vec_id", "embedding", p, pcaK = 48, m = 16, ksub = 32))
        tier("pcapq_index", b, Some(p))(Similarity.pcaPqSearchIndex(s, p,
          q, "vec_id", "embedding", k = 5, refine = 24))
      }
      locally {
        val p = s"$ip/matryoshka"
        val (_, b) = timed(Similarity.buildMatryoshkaIndex(emb,
          "vec_id", "embedding", p, dim = 32))
        tier("matryoshka_index", b, Some(p))(
          Similarity.matryoshkaSearchIndex(s, p, q,
            "vec_id", "embedding", k = 5, refine = 40))
      }
      locally {
        val p = s"$ip/bq"
        val (_, b) = timed(Similarity.buildBqIndex(emb,
          "vec_id", "embedding", p))
        tier("bq_index", b, Some(p))(Similarity.bqSearchIndex(s, p, q,
          "vec_id", "embedding", k = 5, refine = 16))
      }
    }
    spark.stop()
  }
}
