package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** r22 measurement probe for the q_components loop (guide §1: measure
  * candidate shapes before committing one). Runs the CURRENT alternating
  * large-star/small-star loop against two candidates on the exact
  * q_components graph (documents doc_id, node → node+7, plus (0,1) and
  * (2,3)), checks all outputs are identical, and reports min-of-N times
  * plus the ROUND COUNT of each variant. Not on the bench path.
  *
  * Variants:
  *  - `star`     — production Graph.connectedComponents (sig per round)
  *  - `star2`    — alternating star, convergence signature every 2nd
  *                 round (halves driver actions; 2-deep lazy chains)
  *  - `fastsv`   — FastSV-style parent-pointer loop: k pointer-jump
  *                 (shortcut) self-joins then one closed-neighborhood
  *                 min-hook per round. Round count O(log d / log 2^k).
  */
object ComponentsProbe {
  private def componentGraph(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val nodes = s.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id").cast("long").as("node"))
    val nMod = nodes.count()
    nodes.filter(col("node") + 7 < nMod)
      .select(col("node").as("src"), (col("node") + lit(7L)).as("dst"))
      .unionByName(Seq((0L, 1L), (2L, 3L)).toDF("src", "dst"))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val iters = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "5").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val g = componentGraph(spark, sfDir)

    val variants: Seq[(String, () => DataFrame)] = Seq(
      "star" -> (() =>
        graft.ops.Graph.ccAlternatingStar(g, "src", "dst")),
      "fastsv4" -> (() =>
        graft.ops.Graph.connectedComponents(g, "src", "dst")))
    val (_, rounds) =
      graft.ops.Graph.ccFastSVCore(g, "src", "dst", jumps = 4, maxRounds = 50)
    println(s"[probe] fastsv4 rounds=$rounds")

    // equality check once
    val ref = variants.head._2().orderBy("node").collect().toSeq
    variants.tail.foreach { case (n, f) =>
      val got = f().orderBy("node").collect().toSeq
      require(got == ref, s"variant $n output differs from star!")
      println(s"[probe] $n output identical to star (${ref.size} rows)")
    }

    // warmup + timing
    variants.foreach { case (n, f) => f().count() }
    variants.foreach { case (name, f) =>
      spark.sparkContext.setJobDescription(name)
      val times = (0 until iters).map { _ =>
        val t0 = System.nanoTime()
        f().count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe] $name min=${times.min}%.3f " +
        f"all=[${times.map(t => f"$t%.3f").mkString(", ")}]")
    }
    val calibPar = Bench.calibrateParallel(cpus.toInt)
    println(f"[probe] calib_par=$calibPar%.4f")
    spark.stop()
  }
}
