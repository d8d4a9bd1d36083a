package graft.ops

import org.apache.spark.sql.functions._

import graft.{SparkEntry, SparkSpec}

/** The composed curation recipe (q_curation_e2e) must not just execute —
  * every derived check it reports has to hold, at test time, on the same
  * frame the driver's oracle will hash. The three single-operator checks
  * (q_compress_ratio, q_media_sniff, q_interleave's bijection) ride along
  * so a regression names the failing metric, not just a hash mismatch.
  */
class CurationE2ESpec extends SparkSpec {

  private def checksOf(name: String): Map[String, Boolean] =
    SparkEntry.queries(name)(spark, sf()).collect()
      .map(r => r.getString(0) -> r.getBoolean(1)).toMap

  test("q_curation_e2e: every pipeline invariant holds at sf0.001") {
    val m = checksOf("q_curation_e2e")
    assert(m.size === 6)
    m.foreach { case (metric, ok) => assert(ok, s"check failed: $metric") }
  }

  test("q_eval_e2e: every evaluation-pipeline invariant holds at sf0.001") {
    // the eval leg's composition must not just execute — a regression
    // flipping any derived check would otherwise stay green until the
    // round drive's hash compare (the q_curation_e2e discipline)
    val m = checksOf("q_eval_e2e")
    assert(m.size === 5)
    m.foreach { case (metric, ok) => assert(ok, s"check failed: $metric") }
  }

  test("q_pretrain_e2e: curation composes into both binary sinks losslessly") {
    // the full pretraining path — curate → tokenize → FFD pack →
    // TokenBin + WebDataset → read back — must hold every round-trip,
    // manifest, and pack invariant at test time, so a sink regression
    // names its metric instead of hash-mismatching the round drive
    val m = checksOf("q_pretrain_e2e")
    assert(m.size === 11)
    m.foreach { case (metric, ok) => assert(ok, s"check failed: $metric") }
  }

  test("q_compress_ratio, q_media_sniff, q_dedup_spans, q_unimax all-green") {
    for (q <- Seq("q_compress_ratio", "q_media_sniff", "q_dedup_spans",
        "q_unimax")) {
      val m = checksOf(q)
      assert(m.nonEmpty, q)
      m.foreach { case (metric, ok) => assert(ok, s"$q check failed: $metric") }
    }
  }

  test("q_interleave output is a bijection and matches its window oracle") {
    val out = SparkEntry.queries("q_interleave")(spark, sf())
    val n = out.count()
    assert(n > 0)
    assert(out.select("interleave_pos").distinct().count() === n)
    assert(out.agg(max("interleave_pos")).head().getLong(0) === n - 1)
  }
}
