package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** KMV bottom-k sketch: aggregate semantics (distinct, capped, partition-
  * invariant), estimator exactness below saturation, and accuracy bands
  * above it.
  */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  test("sketch is the k smallest DISTINCT hashes, partition-invariant") {
    val vals = (1 to 300).map(i => s"v$i") ++ (1 to 300).map(i => s"v$i")
    val df = vals.toDF("v")
    val k = 64
    val sk1 = Sketches.kmvSketch(df.repartition(1), col("v"), k)
    val skN = Sketches.kmvSketch(df.repartition(7), col("v"), k)
    assert(sk1.toSeq == skN.toSeq) // merge order cannot matter
    assert(sk1.length == k)
    assert(sk1.toSeq == sk1.sortBy(_ ^ Long.MinValue).toSeq) // ascending unsigned
    // exactly the bottom k of the true distinct hash set
    val all = df.distinct().select(xxhash64(col("v"))).as[Long].collect()
      .sortBy(_ ^ Long.MinValue)
    assert(sk1.toSeq == all.take(k).toSeq)
  }

  test("unsaturated sketches give exact counts and exact set relations") {
    val a = (1 to 40).map(i => s"x$i").toDF("v")
    val b = (21 to 50).map(i => s"x$i").toDF("v")
    val k = 256
    val est = Sketches.corpusOverlap(a, b, col("v"), k)
    assert(est.distinctA === 40.0)
    assert(est.distinctB === 30.0)
    // below saturation the union sample IS the union: everything exact
    assert(est.overlap === 20.0)
    assert(est.jaccard === 20.0 / 50.0)
    assert(est.containmentAinB === 0.5)
    assert(est.containmentBinA === 20.0 / 30.0)
  }

  test("saturated estimates land within the k=256 accuracy band") {
    val a = (1 to 4000).map(i => s"a$i").toDF("v")
    val b = ((1 to 2000).map(i => s"a$i") ++ (1 to 2000).map(i => s"b$i"))
      .toDF("v")
    val k = 256
    val est = Sketches.corpusOverlap(a, b, col("v"), k)
    // truth: |A|=4000, |B|=4000, overlap 2000, union 6000, J=1/3
    assert(math.abs(est.distinctA / 4000.0 - 1) < 0.25, est.toString)
    assert(math.abs(est.distinctB / 4000.0 - 1) < 0.25, est.toString)
    assert(math.abs(est.jaccard - 1.0 / 3) < 0.12, est.toString)
    assert(math.abs(est.overlap / 2000.0 - 1) < 0.35, est.toString)
    assert(math.abs(est.containmentBinA - 0.5) < 0.2, est.toString)
  }

  test("overlap matrix: one scan, exact pairwise relations below saturation") {
    // three "crawls" with engineered overlaps: A∩B = 20, A∩C = 0, B∩C = 10
    val rows =
      (1 to 40).map(i => ("A", s"x$i")) ++
      (21 to 60).map(i => ("B", s"x$i")) ++
      ((101 to 120).map(i => ("C", s"x$i")) ++ (51 to 60).map(i => ("C", s"x$i")))
    val df = rows.toDF("crawl", "v")
    val m = Sketches.overlapMatrix(df, "crawl", col("v"), k = 256)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getDouble(3), r.getDouble(2))).toMap
    assert(m(("A", "B"))._1 === 20.0)
    assert(m(("A", "C"))._1 === 0.0)
    assert(m(("B", "C"))._1 === 10.0)
    assert(m(("A", "B"))._2 === 20.0 / 60.0) // |A∪B| = 60
    assert(m.size === 3)
  }

  test("kmv_sketch registers as a SQL aggregate") {
    import org.apache.spark.sql.graft.ColumnShim.registerFunction
    registerFunction(spark, "kmv_sketch_t", exprs =>
      graft.functions.KmvAgg(exprs(0),
        exprs(1).eval().asInstanceOf[Int]).toAggregateExpression())
    (1 to 100).map(i => s"v$i").toDF("v").createOrReplaceTempView("kmv_in")
    val r = spark.sql(
      "SELECT kmv_sketch_t(xxhash64(v), 16) AS sk FROM kmv_in").head()
    val sk = r.getSeq[Long](0)
    assert(sk.length == 16)
    assert(sk == Sketches.kmvSketch(spark.table("kmv_in"), col("v"), 16).toSeq)
  }

  test("nulls are ignored; empty corpus sketches cleanly") {
    val df = Seq(Some("a"), None, Some("b"), None).toDF("v")
    assert(Sketches.kmvSketch(df, col("v"), 8).length == 2)
    val empty = Seq.empty[String].toDF("v")
    assert(Sketches.kmvSketch(empty, col("v"), 8).isEmpty)
    val est = Sketches.estimate(Array.empty, Array.empty, 8)
    assert(est.jaccard === 0.0 && est.overlap === 0.0)
  }
}
