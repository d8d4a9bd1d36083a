package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.api.{MSTable, ReadSpec}

/** ScalaCheck properties for the engine invariants the SURVEY test plan
  * calls out: partition completeness, ROWID density/stability, Jaccard
  * bounds (mirrors the reference's parametrized grid testing, §5.3).
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def check(p: Prop, n: Int = 10): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, res.status.toString)
  }

  test("grouped read partitions the table completely and disjointly") {
    val li = spark.read.parquet(s"${sf()}/lineitem.parquet")
    val total = li.count()
    val genGroup = Gen.someOf("l_returnflag", "l_linestatus").suchThat(_.nonEmpty)
    check(Prop.forAll(genGroup) { groupCols =>
      val dss = MSTable.read(spark, s"${sf()}/lineitem.parquet",
        ReadSpec(groupCols = groupCols.toSeq))
      val counts = dss.map(_.df.count())
      counts.sum == total && dss.nonEmpty
    }, n = 4)
  }

  test("ROWID is a dense permutation for any unique key order") {
    val keys = Seq(
      Seq("s_suppkey"), Seq("s_name"), Seq("s_acctbal", "s_suppkey"))
    for (k <- keys) {
      val df = MSTable.withRowId(
        spark.read.parquet(s"${sf()}/supplier.parquet"), k)
      val ids = df.select(MSTable.RowId).as[Long].collect().sorted
      assert(ids.toSeq === ids.indices.map(_.toLong), s"order $k")
    }
  }

  test("jaccard is bounded, reflexive, symmetric on random word sets") {
    val genDoc = Gen.listOfN(12,
      Gen.oneOf("alpha", "beta", "gamma", "delta", "eps", "zeta"))
      .map(_.mkString(" "))
    check(Prop.forAll(genDoc, genDoc) { (ta, tb) =>
      val df = Seq((0L, ta), (1L, tb), (2L, ta)).toDF("id", "text")
      // threshold must be > 0 (zero-intersection pairs are never generated);
      // 0.01 keeps every co-shingled pair while exercising the prefix filter
      val pairs = graft.ops.Dedup.ngramJaccardPairs(
        df.withColumn("b", lit(1)), "text", "id", Seq("b"), 2, 0.01)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      val selfJ = pairs.get((0L, 2L))
      val symOk = pairs.getOrElse((0L, 1L), 0d) == pairs.getOrElse((0L, 1L), 0d)
      pairs.values.forall(j => j >= 0.0 && j <= 1.0) &&
        selfJ.forall(_ == 1.0) && symOk
    }, n = 6)
  }

  test("updateTable rewrites in place with read-your-writes") {
    val path = "/root/repo/target/test_updatetable"
    val supp = spark.read.parquet(s"${sf()}/supplier.parquet")
    graft.api.MSWrite.create(supp, path)
    val base = MSTable.withRowId(MSTable.open(spark, path), Seq("s_suppkey"))
    val delta = base.filter(col("s_suppkey") <= 2)
      .select(col(MSTable.RowId), lit(-1.0).as("s_acctbal"))
    graft.api.MSWrite.updateTable(spark, path, delta, Seq("s_suppkey"))
    val back = MSTable.open(spark, path)
    assert(back.count() === supp.count())
    assert(back.filter(col("s_suppkey") <= 2)
      .select(max("s_acctbal")).head().getDouble(0) === -1.0)
    assert(back.filter(col("s_suppkey") > 2)
      .select(min("s_acctbal")).head().getDouble(0) > -1.0)
  }
}
