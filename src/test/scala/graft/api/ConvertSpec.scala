package graft.api

import org.apache.spark.sql.functions._
import graft.SparkSpec

class ConvertSpec extends SparkSpec {
  private val out = "/root/repo/target/test_convert"

  test("convert applies where/sort/group and carries keywords") {
    ConvertApp.convert(spark, ConvertApp.Args(
      input = s"${sf()}/nation.parquet", output = s"$out/nation",
      group = Seq("n_regionkey"), sort = Seq("n_nationkey"),
      where = Some("n_nationkey != 2")))
    val back = spark.read.parquet(s"$out/nation")
    assert(back.count() === 24)
    assert(!back.select("n_nationkey").collect().map(_.getInt(0)).contains(2))
  }

  test("subtable walking converts nested tables; partition dirs excluded") {
    // build a store with a main table + one subtable
    val store = s"$out/store"
    MSWrite.create(spark.read.parquet(s"${sf()}/region.parquet"), store)
    MSWrite.create(spark.read.parquet(s"${sf()}/nation.parquet"), s"$store/NATION")
    assert(ConvertApp.subtables(spark, store) === Seq("NATION"))

    ConvertApp.convert(spark, ConvertApp.Args(input = store, output = s"$out/store2"))
    assert(spark.read.parquet(s"$out/store2").count() === 5)
    assert(spark.read.parquet(s"$out/store2/NATION").count() === 25)
    assert(MSTable.open(spark, s"$out/store2::NATION").count() === 25)

    // partitioned output dirs are not subtables
    MSWrite.create(spark.read.parquet(s"${sf()}/nation.parquet"),
      s"$out/parted", partitionBy = Seq("n_regionkey"))
    assert(ConvertApp.subtables(spark, s"$out/parted") === Nil)
  }

  test("-x excludes per table: bare col from MAIN, SUB::col from that subtable") {
    val store = s"$out/xstore"
    MSWrite.create(spark.read.parquet(s"${sf()}/region.parquet"), store)
    MSWrite.create(spark.read.parquet(s"${sf()}/nation.parquet"), s"$store/NATION")
    MSWrite.create(spark.read.parquet(s"${sf()}/supplier.parquet"), s"$store/SUPPLIER")

    ConvertApp.convert(spark, ConvertApp.Args(
      input = store, output = s"$out/xstore2",
      exclude = Seq("r_comment", "NATION::n_comment")))
    // bare col excluded from MAIN only
    assert(!spark.read.parquet(s"$out/xstore2").columns.contains("r_comment"))
    // NATION::n_comment from NATION only — SUPPLIER keeps its comment col
    val nat = spark.read.parquet(s"$out/xstore2/NATION")
    assert(!nat.columns.contains("n_comment"))
    assert(nat.columns.contains("n_name"))
    // the sibling subtable is untouched (full column set survives)
    assert(spark.read.parquet(s"$out/xstore2/SUPPLIER").columns.toSeq ===
      spark.read.parquet(s"${sf()}/supplier.parquet").columns.toSeq)

    // SUB::* drops the whole subtable
    ConvertApp.convert(spark, ConvertApp.Args(
      input = store, output = s"$out/xstore3", exclude = Seq("SUPPLIER::*")))
    val fs = new org.apache.hadoop.fs.Path(out).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$out/xstore3/SUPPLIER")))
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$out/xstore3/NATION")))

    // MAIN::* is rejected like the reference
    intercept[IllegalArgumentException] {
      ConvertApp.Args(input = "a", output = "b", exclude = Seq("*")).excludeByTable
    }
    // malformed triple-:: rejected
    intercept[IllegalArgumentException] {
      ConvertApp.Args(input = "a", output = "b",
        exclude = Seq("A::B::C")).excludeByTable
    }
  }

  test("-f zarr converts a parquet store (with subtables) to zarr and back") {
    val store = s"$out/zin"
    MSWrite.create(spark.read.parquet(s"${sf()}/region.parquet"), store)
    MSWrite.create(spark.read.parquet(s"${sf()}/nation.parquet"), s"$store/NATION")

    // parquet → zarr: main table + subtable land as zarr groups
    ConvertApp.convert(spark, ConvertApp.Args(
      input = store, output = s"$out/zstore", format = "zarr"))
    assert(MSTable.sniffFormat(spark, s"$out/zstore") == MSTable.ZarrFormat)
    assert(MSTable.sniffFormat(spark, s"$out/zstore::NATION") == MSTable.ZarrFormat)
    // ::SUBTABLE addressing dispatches into the nested zarr group
    val nat = MSTable.open(spark, s"$out/zstore::NATION")
    assert(nat.count() === 25)
    // string columns survived via the object codec
    assert(nat.select("n_name").collect().map(_.getString(0)).toSet
      === spark.read.parquet(s"${sf()}/nation.parquet")
        .select("n_name").collect().map(_.getString(0)).toSet)
    // the nested group is discovered as a subtable, its arrays are not
    assert(ConvertApp.subtables(spark, s"$out/zstore") === Seq("NATION"))

    // zarr → parquet round-trip (input format sniffed)
    ConvertApp.convert(spark, ConvertApp.Args(
      input = s"$out/zstore", output = s"$out/zback"))
    val a = spark.read.parquet(s"${sf()}/nation.parquet")
      .select("n_nationkey", "n_name", "n_regionkey").orderBy("n_nationkey").collect()
    val b = spark.read.parquet(s"$out/zback/NATION")
      .select("n_nationkey", "n_name", "n_regionkey").orderBy("n_nationkey").collect()
    assert(a.toSeq === b.toSeq)
  }

  test("bad args raise clearly") {
    intercept[IllegalArgumentException](ConvertApp.parseArgs(Array("-i", "x")))
    intercept[IllegalArgumentException](
      ConvertApp.parseArgs(Array("-i", "x", "-o", "y", "--bogus", "z")))
    intercept[IllegalArgumentException](
      ConvertApp.parseArgs(Array("-i", "x", "-o", "y", "-f", "orc")))
    intercept[IllegalArgumentException]( // -g is a parquet-only feature
      ConvertApp.parseArgs(Array("-i", "x", "-o", "y", "-f", "zarr", "-g", "c")))
  }
}

class SimilarityIvfSpec extends SparkSpec {
  import spark.implicits._

  test("persisted IVF index: partition-pruned search with high recall") {
    val vecs = (0 until 200).map { i =>
      val cluster = i % 5
      val v = Array.tabulate(16)(j =>
        (math.sin(cluster * 16 + j) + 0.01 * math.sin(i * 31 + j)).toFloat)
      (i.toLong, v)
    }.toDF("id", "vec")
    val idx = "/root/repo/target/test_ivf_index"
    graft.ops.Similarity.buildIvfIndex(vecs, "id", "vec", idx, nlist = 5)
    // centroids round-trip through the sidecar
    val cents = graft.ops.Similarity.readIvfCentroids(spark, idx)
    assert(cents.length === 5 && cents.head.length === 16)

    val queries = vecs.filter(col("id") < 5)
    val got = graft.ops.Similarity.ivfSearchIndex(spark, idx, queries,
      "id", "vec", k = 5, nprobe = 2)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val exact = graft.ops.Similarity.bruteForceTopK(
      queries, vecs, "id", "vec", "id", "vec", k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (got intersect exact).size.toDouble / exact.size
    assert(recall >= 0.8, s"recall $recall")

    // the probed scan prunes partition directories at plan time
    val probedScan = spark.read.parquet(idx).filter(col("cell").isin(0, 1))
    val p = probedScan.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val pf = p.linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
    assert(pf.contains("cell") && (pf.contains("IN (0,1") || pf.contains("in(cell")),
      s"cell isin must land in PartitionFilters:\n$p")
  }

  test("IVF top-k: high recall vs brute force on clustered vectors") {
    // 5 clusters of 40 vectors each, 16-dim
    val vecs = (0 until 200).map { i =>
      val cluster = i % 5
      val v = Array.tabulate(16)(j =>
        (math.sin(cluster * 16 + j) + 0.01 * math.sin(i * 31 + j)).toFloat)
      (i.toLong, v)
    }.toDF("id", "vec")
    val queries = vecs.filter(col("id") < 5)
    val exact = graft.ops.Similarity.bruteForceTopK(
      queries, vecs, "id", "vec", "id", "vec", k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val ivf = graft.ops.Similarity.ivfTopK(
      queries, vecs, "id", "vec", "id", "vec", k = 5, nlist = 5, nprobe = 2)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    // clusters are well separated: probing 2/5 cells must recover most of
    // the true neighbors
    val recall = (ivf intersect exact).size.toDouble / exact.size
    assert(recall >= 0.8, s"recall $recall; ivf=$ivf exact=$exact")
  }
}
