package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** r22 measurement probe for the q_scc loop: times
  * stronglyConnectedComponents with different jump counts on the exact
  * q_scc graph. Not on the bench path.
  */
object SccProbe {
  /** Verbatim copy of the r21 stronglyConnectedComponents loop (commit
    * 2f224d7) — the same-session A/B baseline. */
  private def sccR21(edges: DataFrame, maxRounds: Int = 25,
                     maxIters: Int = 300): DataFrame = {
    val srcCol = "src"; val dstCol = "dst"
    val raw = edges.select(col(srcCol).cast("long").as("u"),
        col(dstCol).cast("long").as("v"))
      .filter(col("u").isNotNull && col("v").isNotNull)
    val allNodes = raw.select(col("u").as("node"))
      .union(raw.select(col("v").as("node"))).distinct()
      .localCheckpoint()
    val simple = raw.filter(col("u") =!= col("v")).distinct()
    var e = simple.repartition(col("u")).localCheckpoint()
    var eV = simple.repartition(col("v")).localCheckpoint()
    var nodes = allNodes
    var assigned: DataFrame = null
    var remaining = nodes.count()
    var rounds = 0
    var itersLeft = maxIters
    while (remaining > 0 && rounds < maxRounds) {
      var color = nodes.select(col("node"), col("node").as("color"))
        .localCheckpoint()
      var changed = 1L
      while (changed > 0 && itersLeft > 0) {
        val inMax = e.join(
            color.select(col("node").as("u"), col("color").as("__c")), "u")
          .groupBy(col("v").as("node")).agg(max("__c").as("__cin"))
        val next = color.join(inMax, Seq("node"), "left")
          .select(col("node"), col("color"),
            greatest(col("color"), coalesce(col("__cin"), col("color")))
              .as("__next"))
          .localCheckpoint(false)
        changed = next.filter(col("__next") =!= col("color")).count()
        color = next.select(col("node"), col("__next").as("color"))
        itersLeft -= 1
      }
      require(changed == 0, "color flood did not converge")
      var member = color.filter(col("node") === col("color"))
        .localCheckpoint(false)
      var grew = 1L
      while (grew > 0 && itersLeft > 0) {
        val pred = eV.join(
            member.select(col("node").as("v"), col("color").as("__mc")), "v")
          .select(col("u").as("node"), col("__mc"))
          .join(color, Seq("node"))
          .filter(col("color") === col("__mc"))
          .select(col("node"), col("color")).distinct()
          .join(member, Seq("node"), "left_anti")
          .localCheckpoint(false)
        grew = pred.count()
        if (grew > 0) member = member.union(pred).localCheckpoint(false)
        itersLeft -= 1
      }
      require(grew == 0, "membership flood did not converge")
      assigned =
        if (assigned == null) member else assigned.union(member)
      nodes = nodes.join(member.select("node"), Seq("node"), "left_anti")
        .localCheckpoint(false)
      val keep = nodes.select(col("node"))
      val pruned = e
        .join(keep.withColumnRenamed("node", "u"), Seq("u"), "left_semi")
        .join(keep.withColumnRenamed("node", "v"), Seq("v"), "left_semi")
        .select("u", "v")
      e = pruned.repartition(col("u")).localCheckpoint()
      eV = pruned.repartition(col("v")).localCheckpoint()
      remaining = nodes.count()
      rounds += 1
    }
    require(remaining == 0, "unassigned nodes")
    if (assigned == null)
      return allNodes.select(col("node"), col("node").as("component"))
    val rel = assigned.groupBy("color").agg(min("node").as("component"))
    assigned.join(rel, "color").select(col("node"), col("component"))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val iters = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val nodes = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").cast("long").as("node"))
    val nMod = nodes.count()
    val cycles = nodes.select(col("node").as("src"),
      (expr("CAST(node AS BIGINT) div 25") * 25 +
        (col("node") % 25 + 5) % 25).as("dst"))
    val bridges = nodes.filter(col("node") % 50 === 0 &&
        col("node") + 25 < nMod)
      .select(col("node").as("src"), (col("node") + 25).as("dst"))
    val back = Seq((nMod - 1, 3L)).toDF("src", "dst")
    val g = cycles.unionByName(bridges).unionByName(back)

    val variants: Seq[(String, () => DataFrame)] = Seq(
      "scc-r21" -> (() => sccR21(g)),
      "scc-r22" -> (() =>
        graft.ops.Graph.stronglyConnectedComponents(g, "src", "dst")))
    val ref = variants.head._2().orderBy("node").collect().toSeq
    variants.tail.foreach { case (n, f) =>
      require(f().orderBy("node").collect().toSeq == ref,
        s"variant $n differs!")
    }
    println(s"[probe] outputs identical (${ref.size} rows)")
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
