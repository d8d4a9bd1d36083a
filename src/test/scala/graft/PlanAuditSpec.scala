package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode

/** Physical-plan audits: the properties that make operators survive a
  * 100× scale-up are asserted here, not just eyeballed — filter/projection
  * pushdown into the scan, broadcast for dimension lookups, no cartesian
  * products in the pair generators, top-k without a global sort.
  */
class PlanAuditSpec extends SparkSpec {

  private def plan(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  private def q(name: String): DataFrame =
    SparkEntry.queries(name)(spark, sf())

  test("TAQL predicates are pushed to the parquet scan") {
    val p = plan(q("q_p2_taql"))
    assert(p.contains("PushedFilters"), p)
    // the translated predicate lands in the scan, not just a Filter node
    assert(p.contains("IsNotNull(l_quantity)") ||
      p.contains("GreaterThanOrEqual(l_quantity"), p)
  }

  test("projection prunes the scan to the requested columns") {
    val p = plan(q("q_p1_project"))
    val readSchema = p.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(readSchema.nonEmpty, p)
    // lineitem has 16 columns; the key projection must not read the rest
    assert(!readSchema.contains("l_comment") && !readSchema.contains("l_shipmode"),
      readSchema)
  }

  test("dimension lookups broadcast (no shuffle of the fact table for J1/J2)") {
    assert(plan(q("q_j1_lookup")).contains("BroadcastHashJoin"))
    assert(plan(q("q_j2_chain")).contains("BroadcastHashJoin"))
  }

  test("pair-generating dedup OPERATORS plan no cartesian product") {
    // audit the raw operators (the q_dedup_* queries wrap them in derived
    // checks that cross-join 1-row metric frames for the report — harmless,
    // but they would trip a naive plan scan)
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val ops = Map(
      "minhash" -> graft.ops.Dedup.minHashDedup(docs, "text", "doc_id",
        threshold = 0.6),
      "ngram" -> graft.ops.Dedup.ngramJaccardPairs(docs, "text", "doc_id",
        blockCols = Nil, n = 3, threshold = 0.4),
      "simhash" -> graft.ops.Dedup.simHashDedup(docs, "text", "doc_id",
        maxDist = 3))
    for ((name, df) <- ops) {
      val p = plan(df)
      assert(!p.contains("CartesianProduct"), s"$name:\n$p")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$name:\n$p")
    }
  }

  test("top-k compiles to TakeOrderedAndProject, not a global sort+limit") {
    val p = plan(q("q_o4_topk"))
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("ANN brute force broadcasts the query set and keeps partial top-k") {
    val p = plan(q("q_ann_topk"))
    assert(!p.contains("CartesianProduct"), p)
    // bounded-heap partial aggregation: an ObjectHashAggregate pair, so at
    // most k rows per key leave each task
    assert(p.contains("ObjectHashAggregate"), p)
  }

  test("fingerprint scan stays inside whole-stage codegen (no fallback expr)") {
    val df = ops.TextAnalysis.analyze(
      spark.read.parquet(s"${sf()}/documents.parquet"))
      .select("doc_id", "fingerprint")
    val p = plan(df)
    // the Project computing rollinghash carries a codegen id — it is inside
    // a WholeStageCodegen stage, which an interpreted-HOF fallback would not be
    val projLine = p.linesIterator.find(l =>
      l.contains("Project") && l.contains("codegen id"))
    assert(projLine.isDefined, p)
    assert(p.contains("rollinghash"), p)
  }

  test("as-of join is one shuffle on the key (no range explosion)") {
    val p = plan(q("q_join_asof"))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }
}
