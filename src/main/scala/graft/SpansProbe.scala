package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r22 measurement probe: stage-by-stage timing of the q_dedup_spans
  * derived-check harness (operator, dup-set reuse, post-rewrite recount,
  * final check assembly). Not on the bench path.
  */
object SpansProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.count()
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[spans] $name ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    (0 until 2).foreach { pass =>
      println(s"[spans] === pass $pass ===")
      val spanN = 7
      val (scrubRaw, dupSet) = t("core-build (lazy)") {
        ops.Dedup.dedupSpansKeepFirstCore(docs, "text", "doc_id", n = spanN)
      }
      val scrubbed = t("scrubbed pin")(scrubRaw.localCheckpoint())
      val dupBefore = t("dupBefore pin")(
        dupSet.select(col("__g").as("g")).localCheckpoint())
      def gramsOf(c: org.apache.spark.sql.Column) =
        ops.Dedup.positionalGramHashes(
          ops.Dedup.gramTokens(coalesce(c, lit(""))), spanN)
      val pieces = scrubbed.filter(length(col("scrub_text")) > 0)
        .select(explode(split(col("scrub_text"), "\n")).as("piece"))
      t("pieces count")(println("[spans] n_pieces=" + pieces.count()))
      val afterGrams = pieces
        .select(ops.Dedup.gramTokens(col("piece")).as("__ptoks"))
        .select(explode(
          ops.Dedup.positionalGramHashes(col("__ptoks"), spanN)).as("g"))
      t("after grams count")(println("[spans] n_after_grams=" + afterGrams.count()))
      val after = afterGrams.groupBy("g").agg(count(lit(1)).as("c_after"))
      t("after census")(after.write.format("noop").mode("overwrite").save())
      val joined = t("after + join pin")(
        dupBefore.join(after, Seq("g"), "left").localCheckpoint())
      t("final checks") {
        val one = dupBefore.agg(count(lit(1)).as("n_dup"))
          .crossJoin(joined.agg(
            sum(when(col("c_after") > 1, 1L).otherwise(0L)).as("n_viol"),
            sum(when(col("c_after") === 1, 1L).otherwise(0L)).as("n_kept_once")))
          .crossJoin(scrubbed.agg(
            sum(when(col("n_removed") > 0, 1L).otherwise(0L)).as("n_touched"),
            count(lit(1)).as("n_docs")))
        one.count()
      }
    }
    spark.stop()
  }
}
