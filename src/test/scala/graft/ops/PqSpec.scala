package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Product-quantization ANN ([[Similarity.fitPq]]/[[Similarity.pqTopK]]). */
class PqSpec extends SparkSpec {
  import spark.implicits._

  private def clustered = (0 until 200).map { i =>
    val cluster = i % 5
    val v = Array.tabulate(16)(j =>
      (math.sin(cluster * 16 + j) + 0.01 * math.sin(i * 31 + j)).toFloat)
    (i.toLong, v)
  }.toDF("id", "vec")

  test("fitPq: deterministic codebooks, codes in range") {
    val vecs = clustered
    val a = Similarity.fitPq(vecs, "vec", m = 4, ksub = 8)
    val b = Similarity.fitPq(vecs, "vec", m = 4, ksub = 8)
    assert(a.m === 4 && a.ksub === 8 && a.subDim === 4)
    assert(a.codebooks.flatten.flatten.toSeq === b.codebooks.flatten.flatten.toSeq)

    val codes = vecs.select(
      graft.expr.VectorExprs.pq_encode(col("vec"), a.codebooks).as("c"))
      .as[Seq[Int]].collect()
    assert(codes.forall(c => c.length == 4 && c.forall(x => x >= 0 && x < 8)))
  }

  test("pq_adc: ADC lookup equals the hand-computed sum") {
    val lut = Array.tabulate(2 * 4)(_.toDouble) // m=2, ksub=4
    val got = Seq((Seq(3, 1), lut.toSeq)).toDF("codes", "lut")
      .select(graft.expr.VectorExprs.pq_adc(col("codes"), col("lut"), 4))
      .as[Double].head()
    assert(got === lut(3) + lut(4 + 1)) // lut[0*4+3] + lut[1*4+1]
  }

  test("pqTopK: high recall vs brute force on clustered vectors") {
    val vecs = clustered
    val queries = vecs.filter(col("id") < 5)
    val exact = Similarity.bruteForceTopK(
      queries, vecs, "id", "vec", "id", "vec", k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val pq = Similarity.pqTopK(
      queries, vecs, "id", "vec", "id", "vec", k = 5, m = 4, ksub = 8, refine = 8)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (pq intersect exact).size.toDouble / exact.size
    assert(recall >= 0.8, s"recall $recall; pq=$pq exact=$exact")
  }

  test("pqTopK: exact re-rank emits true cosines, ranks descending per query") {
    val vecs = clustered
    val queries = vecs.filter(col("id") < 3)
    val rows = Similarity.pqTopK(queries, vecs,
      "id", "vec", "id", "vec", k = 5, m = 4, ksub = 8)
      .as[(Long, Int, Long, Double)].collect()
    assert(rows.length === 15)
    rows.groupBy(_._1).values.foreach { g =>
      val byRank = g.sortBy(_._2).map(_._4)
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b - 1e-9 })
    }
    // spot-check one reported cosine against a driver-side computation
    val (qid, _, nid, cos) = rows.minBy(r => (r._1, r._2))
    val byId = vecs.as[(Long, Array[Float])].collect().toMap
    val (q, v) = (byId(qid).map(_.toDouble), byId(nid).map(_.toDouble))
    val expected = q.zip(v).map { case (a, b) => a * b }.sum /
      (math.sqrt(q.map(x => x * x).sum) * math.sqrt(v.map(x => x * x).sum))
    assert(math.abs(cos - expected) < 1e-5)
  }
}
