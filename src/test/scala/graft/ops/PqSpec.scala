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

  test("sq8: quantization error bounded by half a level; constant dim exact") {
    val vecs = Seq(
      (1L, Array(0f, 10f, 7f)), (2L, Array(5f, 10f, -3f)),
      (3L, Array(10f, 10f, 2f))).toDF("id", "vec")
    val (mins, scales) = Similarity.fitSq8(vecs, "vec")
    assert(mins.toSeq === Seq(0.0, 10.0, -3.0))
    // dim 1 is constant: scale 0, decodes exactly to the min
    assert(scales(1) === 0.0)
    assert(scales(0) === 10.0 / 255 && scales(2) === 10.0 / 255)
    // every coordinate round-trips within half a quantization level
    val rows = vecs.collect().map(r =>
      (r.getLong(0), r.getSeq[Float](1).map(_.toDouble)))
    rows.foreach { case (_, x) =>
      x.indices.foreach { i =>
        val c = if (scales(i) == 0) 0
                else math.round((x(i) - mins(i)) / scales(i)).toInt
        val back = mins(i) + c * scales(i)
        assert(math.abs(back - x(i)) <= scales(i) / 2 + 1e-12)
      }
    }
  }

  test("sq8TopK: full recall vs brute force; 255 levels keep order") {
    val vecs = clustered
    val queries = vecs.filter(col("id") < 5)
    val exact = Similarity.bruteForceTopK(
      queries, vecs, "id", "vec", "id", "vec", k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val sq = Similarity.sq8TopK(
      queries, vecs, "id", "vec", "id", "vec", k = 5, refine = 4)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (sq intersect exact).size.toDouble / exact.size
    assert(recall >= 0.9, s"recall $recall; sq=$sq exact=$exact")
    // the re-rank emits TRUE cosines: spot-check one pair against the
    // exact scorer
    val one = Similarity.sq8TopK(queries, vecs, "id", "vec", "id", "vec",
        k = 1, refine = 4)
      .select("query_id", "neighbor_id", "cosine")
      .as[(Long, Long, Double)].collect()
    val ex1 = Similarity.bruteForceTopK(queries, vecs, "id", "vec",
        "id", "vec", k = 1)
      .select("query_id", "neighbor_id", "cosine")
      .as[(Long, Long, Double)].collect()
    // ids can differ on exact cosine TIES (the clustered fixture has
    // duplicates); the claim is that the reported score is the true one
    assert(one.sortBy(_._1).map(t => (t._1, t._3)).toSeq ===
      ex1.sortBy(_._1).map(t => (t._1, t._3)).toSeq)
  }

  test("pcaPqTopK: rotated-space PQ with original-space re-rank keeps recall") {
    // the faiss PCAR,PQ recipe: candidates found in an 8-dim rotation of
    // the 16-dim corpus, re-ranked exactly in the original space
    val vecs = clustered
    val queries = vecs.filter(col("id") < 5)
    val exact = Similarity.bruteForceTopK(
      queries, vecs, "id", "vec", "id", "vec", k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val out = Similarity.pcaPqTopK(
      queries, vecs, "id", "vec", "id", "vec",
      k = 5, pcaK = 8, m = 4, ksub = 8, refine = 8)
    val got = out.select("query_id", "neighbor_id")
      .as[(Long, Long)].collect().toSet
    val recall = (got intersect exact).size.toDouble / exact.size
    assert(recall >= 0.8, s"recall $recall")
    // the emitted cosines are ORIGINAL-space (exact re-rank): spot-check
    // against a driver-side computation on the raw vectors
    val raw = vecs.as[(Long, Array[Float])].collect().toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      dot / (math.sqrt(a.map(x => x.toDouble * x).sum) *
        math.sqrt(b.map(x => x.toDouble * x).sum))
    }
    out.select("query_id", "neighbor_id", "cosine")
      .as[(Long, Long, Double)].collect().foreach { case (q, nb, c) =>
        assert(math.abs(c - cos(raw(q), raw(nb))) < 1e-5, s"($q,$nb)")
      }
  }

  test("persisted PCAR-PQ index: search recall holds and sidecar round-trips") {
    val vecs = clustered
    val queries = vecs.filter(col("id") < 5)
    val path = "/root/repo/target/test_pcapq_index"
    Similarity.buildPcaPqIndex(vecs, "id", "vec", path,
      pcaK = 8, m = 4, ksub = 8)
    // the sidecar rehydrates the exact basis and codebook geometry
    val (mean, comps, model) = Similarity.readPcaPqSidecar(spark, path)
    assert(mean.length == 16 && comps.length == 8 &&
      comps.forall(_.length == 16))
    assert(model.m == 4 && model.ksub == 8 && model.subDim == 2)
    val exact = Similarity.bruteForceTopK(
      queries, vecs, "id", "vec", "id", "vec", k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val out = Similarity.pcaPqSearchIndex(spark, path, queries, "id", "vec",
      k = 5, refine = 8)
    val got = out
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (got intersect exact).size.toDouble / exact.size
    assert(recall >= 0.8, s"recall $recall")
    // the exact re-rank must read the id-sorted vectors table through a
    // pushed candidate-id filter (row-group pruning), not a bare
    // broadcast join that scans every row group
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [In(neighbor_id"),
      s"vectors scan missing pushed candidate-id filter:\n$plan")
  }

  test("PCAR-PQ: pcaK above the corpus dimension fails loudly, never clamps") {
    val vecs = clustered // 16-dim
    val err = intercept[IllegalArgumentException] {
      Similarity.buildPcaPqIndex(vecs, "id", "vec",
        "/root/repo/target/test_pcapq_badk", pcaK = 32, m = 4, ksub = 8)
    }
    assert(err.getMessage.contains("exceeds corpus dimension"))
    val err2 = intercept[IllegalArgumentException] {
      Similarity.pcaPqTopK(vecs.filter(col("id") < 2), vecs,
        "id", "vec", "id", "vec", k = 3, pcaK = 32, m = 4, ksub = 8)
    }
    assert(err2.getMessage.contains("exceeds corpus dimension"))
    // pcaK = 0 must not reach fitPca's keep-all path and then blame the
    // corpus dimension — it fails at the argument, with the right message
    val err3 = intercept[IllegalArgumentException] {
      Similarity.pcaPqTopK(vecs.filter(col("id") < 2), vecs,
        "id", "vec", "id", "vec", k = 3, pcaK = 0, m = 4, ksub = 8)
    }
    assert(err3.getMessage.contains("must be positive"))
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

  test("pqTopK: query dimension mismatch fails loudly, never truncates") {
    val vecs = clustered
    val badQueries = (0 until 3).map(i =>
      (1000L + i, Array.tabulate(8)(j => (i + j).toFloat))) // 8-dim vs 16
      .toDF("id", "vec")
    val e = intercept[Exception](
      Similarity.pqTopK(badQueries, vecs, "id", "vec", "id", "vec",
        k = 3, m = 4, ksub = 8).collect())
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: messages(x.getCause))
    assert(messages(e).exists(m =>
      m != null && m.contains("PQ query dimension")), messages(e).toString)
  }

  test("IVF-PQ sidecar: Jackson read survives reordered keys and whitespace") {
    val dir = "/root/repo/target/pq_test/sidecar"
    val vecs = clustered
    Similarity.buildIvfPqIndex(vecs, "id", "vec", dir,
      nlist = 4, m = 4, ksub = 8)
    val queries = vecs.filter(col("id") < 3)
    def search() = Similarity.ivfPqSearchIndex(spark, dir, queries,
      "id", "vec", k = 5, nprobe = 2, refine = 8)
      .select("query_id", "neighbor_id", "cosine")
      .as[(Long, Long, Double)].collect().toSet
    val before = search()
    assert(before.nonEmpty)
    // the re-rank's vectors scan must carry the pushed candidate-id
    // filter (row-group pruning inside the probed cells), not rely on
    // the broadcast join alone
    val plan = Similarity.ivfPqSearchIndex(spark, dir, queries,
      "id", "vec", k = 5, nprobe = 2, refine = 8)
      .queryExecution.executedPlan.toString
    assert(plan.contains("In(neighbor_id"),
      s"vectors scan missing pushed candidate-id filter:\n$plan")
    // rewrite the sidecar with reordered keys, whitespace, and an extra
    // field a future engine version might add — an equally valid encoding
    // of the same JSON object that the old regex/bracket-walker reader
    // could not be trusted with
    val kw = graft.api.MSWrite.readKeywords(spark, dir)
    val root = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(kw("__graft_ivfpq__"))
    val rewritten =
      s"""{ "future_field": {"nested": [1, [2, 3]]},
         |  "codebooks": ${root.get("codebooks").toString},
         |  "ksub": ${root.get("ksub")}, "m": ${root.get("m")},
         |  "nlist": ${root.get("nlist")},
         |  "centroids": ${root.get("centroids").toString} }""".stripMargin
    graft.api.MSWrite.putKeywords(spark, dir,
      kw + ("__graft_ivfpq__" -> rewritten))
    assert(search() === before)
    // a CORRUPTED sidecar — a string where a number belongs — must fail
    // loudly at read: Jackson's asDouble() would otherwise map it
    // silently to 0.0 and seed the codebooks with zeros
    val corrupted = rewritten.replaceFirst("""("centroids": \[\[)[-0-9.E]+""",
      """$1"oops"""")
    assert(corrupted != rewritten, "corruption did not apply")
    graft.api.MSWrite.putKeywords(spark, dir,
      kw + ("__graft_ivfpq__" -> corrupted))
    val err = intercept[IllegalArgumentException](search())
    assert(err.getMessage.contains("non-numeric element"))
    // scalar fields get the same treatment: asInt() would coerce "4x"
    // to m=0 and mis-blame the codebook row count
    val badM = rewritten.replaceFirst(""""m": \d+""", """"m": "4x"""")
    assert(badM != rewritten, "scalar corruption did not apply")
    graft.api.MSWrite.putKeywords(spark, dir,
      kw + ("__graft_ivfpq__" -> badM))
    val err2 = intercept[IllegalArgumentException](search())
    assert(err2.getMessage.contains("non-integer 'm'"))
  }

  test("IVF-PQ sidecar encoding rejects non-finite values (no JSON form)") {
    val e = intercept[IllegalArgumentException](
      Similarity.matToJson(Array(Array(1.0, Double.NaN), Array(2.0, 3.0))))
    assert(e.getMessage.contains("non-finite"))
    val e2 = intercept[IllegalArgumentException](
      Similarity.matToJson(Array(Array(Double.PositiveInfinity))))
    assert(e2.getMessage.contains("non-finite"))
    // finite values round-trip through the Jackson reader
    assert(new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(Similarity.matToJson(Array(Array(1.5, -2.25)))).isArray)
  }
}
