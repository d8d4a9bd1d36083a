package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** PCA fit/project/whiten ([[Pca]]): Jacobi eigensolver against
  * hand-decomposable matrices, basis recovery on data with a known
  * principal axis, norm/variance invariants, truncation, the persistable
  * artifact round-trip, and the plan contract (scan-side projection).
  */
class PcaSpec extends SparkSpec {
  import spark.implicits._

  private def approx(a: Double, b: Double, eps: Double = 1e-9): Boolean =
    math.abs(a - b) <= eps

  test("jacobiEigh decomposes [[2,1],[1,2]] into 3, 1 with known vectors") {
    val (vals, vecs) = Pca.jacobiEigh(Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    assert(approx(vals(0), 3.0) && approx(vals(1), 1.0))
    val r = 1.0 / math.sqrt(2.0)
    // sign convention: largest-|coordinate| (first on ties) non-negative
    assert(approx(vecs(0)(0), r) && approx(vecs(0)(1), r))
    assert(math.abs(math.abs(vecs(1)(0)) - r) < 1e-9 &&
      approx(vecs(1)(0) * vecs(1)(1), -0.5))
  }

  test("jacobiEigh handles zero-diagonal and diagonal matrices") {
    val (v0, _) = Pca.jacobiEigh(Array(Array(0.0, 1.0), Array(1.0, 0.0)))
    assert(approx(v0(0), 1.0) && approx(v0(1), -1.0))
    val (v1, e1) = Pca.jacobiEigh(Array(
      Array(1.0, 0.0, 0.0), Array(0.0, 5.0, 0.0), Array(0.0, 0.0, 3.0)))
    assert(v1.toSeq == Seq(5.0, 3.0, 1.0))
    assert(e1(0).toSeq == Seq(0.0, 1.0, 0.0)) // eigenvector follows the sort
  }

  test("jacobiEigh returns an orthonormal basis on a random symmetric matrix") {
    val rnd = new scala.util.Random(7)
    val d = 16
    val m = Array.ofDim[Double](d, d)
    for (i <- 0 until d; j <- i until d) {
      val x = rnd.nextGaussian(); m(i)(j) = x; m(j)(i) = x
    }
    val (vals, vecs) = Pca.jacobiEigh(m)
    assert(vals.sliding(2).forall(p => p(0) >= p(1) - 1e-12), "descending")
    for (i <- 0 until d; j <- i until d) {
      val dot = (0 until d).map(t => vecs(i)(t) * vecs(j)(t)).sum
      assert(approx(dot, if (i == j) 1.0 else 0.0, 1e-9), s"ortho ($i,$j)=$dot")
    }
    // each pair satisfies M v = lambda v
    for (i <- 0 until d; r <- 0 until d) {
      val mv = (0 until d).map(t => m(r)(t) * vecs(i)(t)).sum
      assert(approx(mv, vals(i) * vecs(i)(r), 1e-8), s"eigenpair $i row $r")
    }
  }

  test("fitPca recovers the dominant axis of anisotropic 2-d data") {
    // points along y = 2x with small orthogonal jitter: the first
    // component must be ±(1,2)/sqrt(5) and carry almost all the variance
    val rnd = new scala.util.Random(11)
    val pts = Seq.tabulate(400) { _ =>
      val t = rnd.nextGaussian() * 3.0
      val o = rnd.nextGaussian() * 0.05
      Seq(t * 1.0 / math.sqrt(5) - o * 2.0 / math.sqrt(5),
          t * 2.0 / math.sqrt(5) + o * 1.0 / math.sqrt(5))
    }
    val df = pts.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val m = Pca.fitPca(df, "v")
    assert(m.dim == 2 && m.k == 2)
    val c0 = m.components(0)
    assert(approx(math.abs(c0(0) * 2.0 - c0(1) * 1.0), 0.0, 0.05),
      s"axis ${c0.toSeq}") // parallel to (1,2)
    assert(m.eigenvalues(0) / m.totalVariance > 0.99)
    assert(approx(m.eigenvalues.sum, m.totalVariance, 1e-9),
      "full-rank spectrum sums to the trace")
  }

  test("full-rank projection preserves centered norms; truncation drops them") {
    val rnd = new scala.util.Random(3)
    val data = Seq.tabulate(120) { i =>
      (i.toLong, Seq.fill(6)(rnd.nextGaussian() * (1 + i % 3)))
    }
    val df = data.toDF("id", "v")
    val m = Pca.fitPca(df, "v")
    val proj = Pca.projectPca(df, "v", "id", m)
      .select(col("id"), aggregate(col("pca"), lit(0.0),
        (acc, x) => acc + x * x).as("n2"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val mean = m.mean
    data.foreach { case (id, v) =>
      val cn2 = v.zip(mean).map { case (x, mu) => (x - mu) * (x - mu) }.sum
      assert(approx(proj(id), cn2, 1e-9), s"norm preservation id=$id")
    }
    val m2 = Pca.fitPca(df, "v", k = 2)
    assert(m2.k == 2 && m2.eigenvalues.length == 2)
    assert(approx(m2.totalVariance, m.totalVariance, 1e-9),
      "truncation keeps the full trace for explained-variance ratios")
    val p2 = Pca.projectPca(df, "v", "id", m2).head()
    assert(p2.getSeq[Double](1).length == 2)
  }

  test("whitened projection has unit variance and zero mean per component") {
    val rnd = new scala.util.Random(5)
    val df = Seq.tabulate(300) { i =>
      (i.toLong, Seq.fill(4)(rnd.nextGaussian() * (1 + i % 5)))
    }.toDF("id", "v")
    val m = Pca.fitPca(df, "v")
    val stats = Pca.projectPca(df, "v", "id", m, whiten = true)
      .select(posexplode(col("pca")).as(Seq("c", "y")))
      .groupBy("c")
      .agg(avg(col("y")).as("mu"), avg(col("y") * col("y")).as("m2"))
      .collect()
    assert(stats.length == 4)
    stats.foreach { r =>
      assert(approx(r.getDouble(1), 0.0, 1e-9), s"mean c=${r.getInt(0)}")
      assert(approx(r.getDouble(2), 1.0, 1e-9), s"variance c=${r.getInt(0)}")
    }
  }

  test("whitening zeroes degenerate directions instead of amplifying noise") {
    // rank-1 data: second eigenvalue ~ 0 -> whitened coordinate must be 0
    val df = Seq.tabulate(50) { i =>
      (i.toLong, Seq(i.toDouble, 2.0 * i))
    }.toDF("id", "v")
    val m = Pca.fitPca(df, "v")
    assert(m.eigenvalues(1) < 1e-9 * m.totalVariance)
    val ys = Pca.projectPca(df, "v", "id", m, whiten = true)
      .select(element_at(col("pca"), 2)).collect().map(_.getDouble(0))
    assert(ys.forall(_ == 0.0))
  }

  test("float input vectors project identically to their double widening") {
    val data = Seq.tabulate(40)(i =>
      (i.toLong, Seq(i * 0.5f, (i % 7).toFloat, 3.25f - i)))
    val dfF = data.toDF("id", "v")
    val dfD = data.map { case (id, v) => (id, v.map(_.toDouble)) }.toDF("id", "v")
    val m = Pca.fitPca(dfF, "v")
    val a = Pca.projectPca(dfF, "v", "id", m).orderBy("id")
      .collect().map(_.getSeq[Double](1))
    val b = Pca.projectPca(dfD, "v", "id", m).orderBy("id")
      .collect().map(_.getSeq[Double](1))
    a.zip(b).foreach { case (x, y) =>
      x.zip(y).foreach { case (xa, ya) => assert(approx(xa, ya, 1e-12)) }
    }
  }

  test("model artifact round-trips through its DataFrame form") {
    val rnd = new scala.util.Random(9)
    val df = Seq.tabulate(60) { i =>
      (i.toLong, Seq.fill(5)(rnd.nextGaussian()))
    }.toDF("id", "v")
    val m = Pca.fitPca(df, "v", k = 3)
    val back = Pca.pcaFromDf(Pca.pcaToDf(spark, m))
    assert(back.k == m.k && back.dim == m.dim)
    assert(approx(back.totalVariance, m.totalVariance, 0.0))
    assert(back.mean.toSeq == m.mean.toSeq)
    assert(back.eigenvalues.toSeq == m.eigenvalues.toSeq)
    assert(back.components.map(_.toSeq).toSeq == m.components.map(_.toSeq).toSeq)
  }

  test("projection plan is a scan-side Column projection (no shuffle, no RDD)") {
    val df = Seq.tabulate(10)(i => (i.toLong, Seq(i * 1.0, 1.0 - i))).toDF("id", "v")
    val m = Pca.fitPca(df, "v")
    val plan = Pca.projectPca(df, "v", "id", m)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Scan ExistingRDD"),
      s"projection must stay scan-side:\n$plan")
  }

  test("ragged vectors and null elements fail loudly at projection time") {
    val df = Seq((0L, Seq(1.0, 2.0)), (1L, Seq(1.0, 2.0, 3.0))).toDF("id", "v")
    val m = Pca.fitPca(df.filter(col("id") === 0L), "v")
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    val ex = intercept[Exception] {
      Pca.projectPca(df, "v", "id", m).collect()
    }
    assert(msgs(ex).exists(_.contains("AffineProject")))
    // a null ELEMENT would read back 0.0 from the unsafe accessor and
    // project garbage — must throw instead
    val withNull = df.filter(col("id") === 0L)
      .select(col("id"), array(lit(1.0), lit(null).cast("double")).as("v"))
    val ex2 = intercept[Exception] {
      Pca.projectPca(withNull, "v", "id", m).collect()
    }
    assert(msgs(ex2).exists(_.contains("null element")))
  }

  test("procrustes: recovers a known rotation+shift; orthogonal; deterministic") {
    // deterministic 6-dim source vectors, target = (x - mx)*G + shift
    // for a known Givens rotation G in the (0, 2) plane by 0.6 rad
    val d = 6
    val theta = 0.6
    val g = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    g(0)(0) = math.cos(theta); g(2)(2) = math.cos(theta)
    g(0)(2) = math.sin(theta); g(2)(0) = -math.sin(theta)
    val shift = Array.tabulate(d)(j => j * 0.5 - 1.0)
    val xs = (0 until 80).map { r =>
      Array.tabulate(d)(j => math.sin(r * d + j) + (if (j == r % d) 2.0 else 0.0))
    }
    def rot(x: Array[Double]): Array[Double] =
      Array.tabulate(d)(j => (0 until d).map(i => x(i) * g(i)(j)).sum + shift(j))
    val pairs = xs.zipWithIndex.map { case (x, i) =>
      (i.toLong, x.toSeq, rot(x).toSeq) }.toDF("id", "x", "y")
    val m = Pca.fitProcrustes(pairs, "x", "y")
    // orthogonality: R^T R = I
    for (a <- 0 until d; b <- 0 until d) {
      val dot = (0 until d).map(i => m.rotation(i)(a) * m.rotation(i)(b)).sum
      assert(math.abs(dot - (if (a == b) 1.0 else 0.0)) < 1e-9, s"RtR($a,$b)")
    }
    // the map reproduces the target exactly (exact rotation, no noise).
    // NOTE the recovered R need not equal G entry-wise off the data span;
    // the MAP on the data is what is identified
    val aligned = Pca.alignEmbeddings(pairs, "x", "id", m)
      .join(pairs.select("id", "y"), "id")
      .collect().map { r =>
        val a = r.getSeq[Double](1); val y = r.getSeq[Double](2)
        a.zip(y).map { case (u, v) => math.abs(u - v) }.max
      }
    assert(aligned.max < 1e-8, s"max residual ${aligned.max}")
    // determinism: refit on a different partitioning gives the same R
    val m2 = Pca.fitProcrustes(pairs.repartition(7), "x", "y")
    for (i <- 0 until d; j <- 0 until d)
      assert(math.abs(m.rotation(i)(j) - m2.rotation(i)(j)) < 1e-9)
    // rank-deficient pairs refuse: all x confined to one direction
    val flat = (0 until 20).map(i =>
      (i.toLong, Seq(i.toDouble, 0.0), Seq(0.0, i.toDouble)))
      .toDF("id", "x", "y")
    val ex = intercept[IllegalArgumentException](
      Pca.fitProcrustes(flat, "x", "y"))
    assert(ex.getMessage.contains("rank-deficient"))
  }
}
