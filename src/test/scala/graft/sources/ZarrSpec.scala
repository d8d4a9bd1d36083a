package graft.sources

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.api.{MSTable, MSWrite}
import graft.sources.zarr.{ZarrMeta, ZarrWrite}

/** Zarr v2 source + sink: round-trip across every supported dtype,
  * multi-chunk stores, missing-chunk fill semantics, raw (uncompressed)
  * stores, corrupt-chunk failure, format dispatch, and column pruning —
  * semantics matching the reference round-trip test
  * (daskms/experimental/zarr/tests/test_zarr.py:293 xds_to_zarr →
  * xds_from_zarr → assert equal).
  */
class ZarrSpec extends SparkSpec {

  private def tmp(name: String) = s"/root/repo/target/zarr_test/$name"

  private def allTypesDf = {
    import spark.implicits._
    spark.range(0, 20).select(
      col("id").as("c_long"),
      col("id").cast("int").as("c_int"),
      col("id").cast("short").as("c_short"),
      (col("id") % 2 === 0).as("c_bool"),
      (col("id") * 1.5).as("c_double"),
      (col("id") * 0.25).cast("float").as("c_float"),
      struct(col("id").cast("double").as("re"),
        (-col("id")).cast("double").as("im")).as("c_complex"),
      array(col("id").cast("double"), (col("id") * 2).cast("double"),
        (col("id") * 3).cast("double")).as("c_vec"),
      array(array(col("id").cast("double"), lit(1.0)),
        array(lit(2.0), col("id").cast("double"))).as("c_mat"))
  }

  test("round-trip: every supported dtype, multiple chunks, partial last chunk") {
    val df = allTypesDf
    val path = tmp("alltypes")
    // rowChunk 7 over 20 rows → 3 chunks, last one partial (padded)
    ZarrWrite.write(df, path, rowChunk = 7, overwrite = true)
    val back = spark.read.format("zarr").load(path)
    // store columns come back name-sorted; realign and compare by c_long
    val a = df.orderBy("c_long").collect()
    val b = back.select(df.columns.map(col): _*).orderBy("c_long").collect()
    assert(b.length == 20)
    assert(a.zip(b).forall { case (x, y) => x == y },
      s"round-trip mismatch:\n${a.take(3).mkString("\n")}\nvs\n${b.take(3).mkString("\n")}")
  }

  test("schema maps dtypes and trailing dims") {
    val path = tmp("alltypes") // written above (alphabetical test order not
    ZarrWrite.write(allTypesDf, path, rowChunk = 7, overwrite = true) // assumed — rewrite)
    val sch = spark.read.format("zarr").load(path).schema
    assert(sch("c_long").dataType == LongType)
    assert(sch("c_int").dataType == IntegerType)
    assert(sch("c_short").dataType == ShortType)
    assert(sch("c_bool").dataType == BooleanType)
    assert(sch("c_float").dataType == FloatType)
    assert(sch("c_complex").dataType ==
      StructType(Seq(StructField("re", DoubleType, nullable = false),
        StructField("im", DoubleType, nullable = false))))
    assert(sch("c_vec").dataType == ArrayType(DoubleType, containsNull = false))
    assert(sch("c_mat").dataType ==
      ArrayType(ArrayType(DoubleType, containsNull = false), containsNull = false))
  }

  test("MSTable.open dispatches a .zgroup store to the zarr source") {
    val path = tmp("dispatch")
    ZarrWrite.write(allTypesDf.select("c_long", "c_double"), path, rowChunk = 16, overwrite = true)
    assert(MSTable.sniffFormat(spark, path) == MSTable.ZarrFormat)
    val back = MSTable.open(spark, path)
    assert(back.agg(sum("c_long")).head.getLong(0) == (0 until 20).sum)
  }

  test("MSWrite.toZarr is the public sink entry") {
    val path = tmp("public_sink")
    MSWrite.toZarr(allTypesDf.select("c_long"), path, rowChunk = 8, overwrite = true)
    assert(MSTable.open(spark, path).count() == 20)
  }

  test("missing chunk reads as fill_value") {
    val path = tmp("fill")
    ZarrWrite.write(allTypesDf.select("c_long", "c_double"), path, rowChunk = 5, overwrite = true)
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    // drop chunk 1 (rows 5-9) of c_double only
    assert(fs.delete(new Path(s"$path/c_double/1"), false))
    val back = spark.read.format("zarr").load(path)
      .filter(col("c_long") >= 5 && col("c_long") < 10)
    val vals = back.select("c_double").collect().map(_.getDouble(0)).toSeq
    assert(vals == Seq.fill(5)(0.0), s"expected fill zeros, got $vals")
    // the intact column is unaffected
    assert(back.agg(sum("c_long")).head.getLong(0) == (5 until 10).sum)
  }

  test("""fill_value "NaN" (zarr-python's float default) reads as NaN""") {
    val path = tmp("nanfill")
    ZarrWrite.write(allTypesDf.select("c_long", "c_double"), path,
      rowChunk = 5, overwrite = true)
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    // rewrite c_double's .zarray with the string fill zarr-python emits
    val zaPath = new Path(s"$path/c_double/.zarray")
    val in = fs.open(zaPath)
    val za = try scala.io.Source.fromInputStream(in).mkString finally in.close()
    val out = fs.create(zaPath, true)
    try out.write(za.replaceAll(""""fill_value":\s*[0-9.eE+-]+""",
      """"fill_value": "NaN"""").getBytes("UTF-8")) finally out.close()
    // consolidated metadata would shadow the edited sidecar — drop it
    fs.delete(new Path(s"$path/.zmetadata"), false)
    assert(fs.delete(new Path(s"$path/c_double/1"), false))
    val vals = spark.read.format("zarr").load(path)
      .filter(col("c_long") >= 5 && col("c_long") < 10)
      .select("c_double").collect().map(_.getDouble(0)).toSeq
    assert(vals.length == 5 && vals.forall(_.isNaN), s"expected NaNs, got $vals")
  }

  test("order F is accepted for 1-d arrays (identical layout), rejected for 2-d") {
    import com.fasterxml.jackson.databind.ObjectMapper
    val m = new ObjectMapper()
    def meta(shape: String) = m.readTree(
      s"""{"zarr_format":2,"shape":$shape,"chunks":$shape,"dtype":"<i8",
         |"compressor":null,"fill_value":0,"filters":null,"order":"F"}"""
        .stripMargin.replace("\n", ""))
    val ok = ZarrMeta.parseArrayMeta("v", meta("[10]"))
    assert(ok.shape === Seq(10L))
    val e = intercept[IllegalArgumentException] {
      ZarrMeta.parseArrayMeta("v", meta("[10, 4]"))
    }
    assert(e.getMessage.contains("order 'F'"))
  }

  test("uncompressed (compressor: null) stores read back") {
    val path = tmp("raw")
    ZarrWrite.write(allTypesDf.select("c_long", "c_vec"), path,
      rowChunk = 6, zlibLevel = 0, overwrite = true)
    val meta = ZarrMeta.readArrayMeta(spark.sparkContext.hadoopConfiguration,
      new Path(s"$path/c_long"))
    assert(meta.compressor.isEmpty)
    val back = spark.read.format("zarr").load(path)
    assert(back.count() == 20)
    assert(back.agg(sum(element_at(col("c_vec"), 2))).head.getDouble(0)
      == (0 until 20).map(_ * 2.0).sum)
  }

  test("truncated zlib chunk fails the read instead of hanging") {
    val path = tmp("corrupt")
    ZarrWrite.write(allTypesDf.select("c_long"), path, rowChunk = 20, overwrite = true)
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val chunk = new Path(s"$path/c_long/0")
    val len = fs.getFileStatus(chunk).getLen.toInt
    val bytes = new Array[Byte](len)
    val in = fs.open(chunk); in.readFully(0, bytes); in.close()
    val out = fs.create(chunk, true)
    out.write(bytes, 0, math.max(2, len / 2)); out.close() // truncate
    val e = intercept[Exception] {
      spark.read.format("zarr").load(path).collect()
    }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(_.getMessage).filter(_ != null).mkString(" | ")
    assert(msgs.contains("zlib chunk") || msgs.contains("truncated"), msgs)
  }

  test("column pruning opens only the requested arrays' chunks") {
    val path = tmp("prune")
    ZarrWrite.write(allTypesDf, path, rowChunk = 10, overwrite = true)
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    // make every other column unreadable: pruning is proven if the
    // projection still succeeds
    allTypesDf.columns.filterNot(_ == "c_long").foreach { c =>
      val chunks = fs.listStatus(new Path(s"$path/$c"))
        .filterNot(_.getPath.getName.startsWith("."))
      assert(chunks.nonEmpty)
      chunks.foreach(st => assert(
        fs.rename(st.getPath, new Path(st.getPath.getParent, "hidden_" + st.getPath.getName))))
    }
    val only = spark.read.format("zarr").load(path)
      .select("c_long").filter(col("c_long") < 10)
    // missing chunk = fill, so a non-pruned scan would still "work" — but
    // the plan's readSchema proves the pruning
    assert(only.queryExecution.executedPlan.toString.contains("c_long"))
    assert(only.collect().map(_.getLong(0)).sorted.toSeq == (0L until 10L))
  }

  test("string columns round-trip via the json2 object codec") {
    import spark.implicits._
    val df = Seq(
      (0L, "ANT-00"), (1L, "ANT-01"), (2L, "größe-ünïcode"), (3L, ""),
      (4L, "json \"quotes\" and, commas"), (5L, "日本語"), (6L, "ANT-06"))
      .toDF("row_id", "name")
    val path = tmp("strings")
    ZarrWrite.write(df, path, rowChunk = 3, overwrite = true) // 3 chunks, last partial
    // the sidecar carries the reference's object-codec markers
    val meta = ZarrMeta.readArrayMeta(
      spark.sparkContext.hadoopConfiguration, new Path(s"$path/name"))
    assert(meta.dtype == "|O" && meta.objectCodec)
    val back = spark.read.format("zarr").load(path)
    assert(back.schema("name").dataType == StringType)
    val a = df.select("row_id", "name").orderBy("row_id")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val b = back.select("row_id", "name").orderBy("row_id")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(a.toSeq == b.toSeq)
  }

  test("existing store is not clobbered unless overwrite = true") {
    val path = tmp("noclobber")
    ZarrWrite.write(allTypesDf.select("c_long"), path, rowChunk = 8, overwrite = true)
    val e = intercept[IllegalArgumentException] {
      ZarrWrite.write(allTypesDf.select("c_double"), path, rowChunk = 8)
    }
    assert(e.getMessage.contains("already exists"))
    // the original store is untouched
    assert(spark.read.format("zarr").load(path).columns.toSeq == Seq("c_long"))
  }

  test(".zmetadata is preferred over sidecar walks (one read opens the store)") {
    val path = tmp("consolidated")
    ZarrWrite.write(allTypesDf.select("c_long", "c_double"), path,
      rowChunk = 8, overwrite = true)
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new Path(path).getFileSystem(conf)
    assert(fs.exists(new Path(s"$path/.zmetadata")))
    // break a sidecar: if the open still works, it came from .zmetadata
    val out = fs.create(new Path(s"$path/c_long/.zarray"), true)
    out.write("NOT JSON".getBytes("UTF-8")); out.close()
    val metas = ZarrMeta.readGroup(conf, new Path(path))
    assert(metas.map(_.name) == Seq("c_double", "c_long"))
    val back = spark.read.format("zarr").load(path)
    assert(back.agg(sum("c_long")).head.getLong(0) == (0 until 20).sum)
  }

  test("input frame is evaluated exactly once across count and write passes") {
    val acc = spark.sparkContext.longAccumulator("zarr_src_evals")
    val schema = StructType(Seq(StructField("v", LongType, nullable = false)))
    val src = spark.sparkContext.parallelize(0L until 100L, 5)
      .map { i => acc.add(1); Row(i) }
    val df = spark.createDataFrame(src, schema)
    val path = tmp("singlepass")
    ZarrWrite.write(df, path, rowChunk = 16, overwrite = true)
    // persisted across the count pass and the chunk write: one evaluation
    assert(acc.value == 100L, s"input evaluated ${acc.value / 100.0}×")
    val back = spark.read.format("zarr").load(path)
    assert(back.agg(sum("v")).head.getLong(0) == (0L until 100L).sum)
  }

  test("assumeDeterministic write round-trips a plain scan (no persist)") {
    val src = spark.read.parquet(s"${sf()}/region.parquet")
    val path = tmp("det")
    ZarrWrite.write(src, path, rowChunk = 2, overwrite = true,
      assumeDeterministic = true)
    val back = MSTable.open(spark, path).orderBy("r_regionkey").collect()
    val exp = src.select(back.head.schema.fieldNames.map(
      org.apache.spark.sql.functions.col): _*).orderBy("r_regionkey").collect()
    assert(back.toSeq === exp.toSeq)
  }

  test("complex struct with float fields fails driver-side with a clear message") {
    val df = allTypesDf.select(struct(
      col("c_float").as("re"), col("c_float").as("im")).as("c_bad"))
    val e = intercept[IllegalArgumentException] {
      ZarrWrite.write(df, tmp("badcomplex"), rowChunk = 8, overwrite = true)
    }
    assert(e.getMessage.contains("struct(re double, im double)"))
  }

  test("chunk byte size is Long arithmetic (no Int overflow on wide rows)") {
    import graft.sources.zarr.ZarrArrayMeta
    // 4M rows/chunk × 1000 doubles/row = 32 GB — far over Int.MaxValue;
    // the old Int math would have wrapped negative
    val m = ZarrArrayMeta("wide", Seq(100000000L, 1000L), Seq(4000000, 1000),
      "<f8", Some("zlib"), 0d)
    assert(ZarrMeta.chunkByteSize(m) == 4000000L * 1000L * 8L)
    assert(ZarrMeta.chunkByteSize(m) > Int.MaxValue.toLong)
  }

  test("scalar/string stores read columnar (vectorized), others fall back") {
    import spark.implicits._
    val df = spark.range(0, 50).select(
      col("id").as("k"), (col("id") * 1.5).as("x"),
      concat(lit("name-"), col("id")).as("nm"))
    val path = tmp("columnar")
    ZarrWrite.write(df, path, rowChunk = 16, overwrite = true)
    val back = spark.read.format("zarr").load(path)
    // all-scalar store → batch interface → plan carries a ColumnarToRow
    assert(back.queryExecution.executedPlan.toString.contains("ColumnarToRow"),
      back.queryExecution.executedPlan.toString)
    val got = back.select("k", "x", "nm").orderBy("k")
      .as[(Long, Double, String)].collect()
    assert(got.length == 50)
    assert(got(7) == ((7L, 10.5, "name-7")))
    // missing chunk still fills (vectorized fill path)
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.delete(new Path(s"$path/x/1"), false))
    val refilled = spark.read.format("zarr").load(path)
      .filter(col("k") >= 16 && col("k") < 32).select("x")
      .as[Double].collect().toSeq
    assert(refilled == Seq.fill(16)(0.0))

    // flat arrays and complex structs vectorize too (the q_zarr store shape)
    val dfa = spark.range(0, 10).select(col("id").as("k"),
      array(col("id").cast("double"), lit(1.0)).as("v"),
      struct(col("id").cast("double").as("re"),
        (-col("id")).cast("double").as("im")).as("z"))
    val patha = tmp("columnar_vec")
    ZarrWrite.write(dfa, patha, rowChunk = 4, overwrite = true)
    val backa = spark.read.format("zarr").load(patha)
    assert(backa.queryExecution.executedPlan.toString.contains("ColumnarToRow"))
    assert(backa.select(sum(element_at(col("v"), 1))).head.getDouble(0)
      == (0 until 10).map(_.toDouble).sum)
    assert(backa.select(sum(col("z.im"))).head.getDouble(0)
      == -(0 until 10).map(_.toDouble).sum)

    // two trailing dims (matrix cells — the MS DATA shape) vectorize too:
    // rectangular cells mean uniform nested offsets into one flat leaf run
    val dfm = spark.range(0, 6).select(col("id").as("k"),
      array(array(col("id").cast("double"), lit(1.0)),
        array(lit(2.0), col("id").cast("double"))).as("mat"),
      array(struct(col("id").cast("double").as("re"), lit(0.5).as("im")),
        struct(lit(9.0).as("re"), col("id").cast("double").as("im"))).as("vis"))
    val pathm = tmp("columnar_matrix")
    ZarrWrite.write(dfm, pathm, rowChunk = 3, overwrite = true)
    val backm = spark.read.format("zarr").load(pathm)
    assert(backm.queryExecution.executedPlan.toString.contains("ColumnarToRow"))
    assert(backm.select(sum(element_at(element_at(col("mat"), 1), 1)))
      .head.getDouble(0) == (0 until 6).map(_.toDouble).sum)
    assert(backm.select(sum(element_at(col("vis"), 2).getField("im")))
      .head.getDouble(0) == (0 until 6).map(_.toDouble).sum)
    // matrix values round-trip exactly through the columnar path
    assert(backm.orderBy("k").select("mat").as[Seq[Seq[Double]]].collect()
      .zipWithIndex.forall { case (m, i) =>
        m == Seq(Seq(i.toDouble, 1.0), Seq(2.0, i.toDouble)) })

    // multi-dim object (string) arrays are the remaining row-reader case;
    // our writer keeps strings 1-d, so hand-build the store (zarr-python
    // json2 layout: flat items + dtype + shape trailer)
    val paths = tmp("columnar_fallback")
    val fss = new Path(paths).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fss.delete(new Path(paths), true); fss.mkdirs(new Path(paths + "/tags"))
    def puts(rel: String, s: String): Unit = {
      val out = fss.create(new Path(s"$paths/$rel"), true)
      try out.write(s.getBytes("UTF-8")) finally out.close()
    }
    puts(".zgroup", """{"zarr_format": 2}""")
    puts("tags/.zarray",
      """{"zarr_format": 2, "shape": [2, 2], "chunks": [2, 2], "dtype": "|O",
        | "compressor": null, "fill_value": null, "order": "C",
        | "filters": [{"id": "json2", "encoding": "utf-8"}]}""".stripMargin)
    puts("tags/0.0", """["a0", "b", "a1", "b", "|O", [2, 2]]""")
    val backs = spark.read.format("zarr").load(paths)
    assert(!backs.queryExecution.executedPlan.toString.contains("ColumnarToRow"))
    assert(backs.select(element_at(col("tags"), 1)).as[String].collect().toSeq
      == Seq("a0", "a1"))
  }

  test("reads a store laid out the way zarr-python writes it (foreign fixture)") {
    // hand-built fixture following zarr-python v2 output conventions this
    // engine's own writer does NOT use: ensure_ascii \u escapes in json2
    // payloads, fill_value null, no .zattrs, extra whitespace-free JSON
    val path = tmp("foreign")
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new Path(path), true)
    fs.mkdirs(new Path(path))
    def put(rel: String, bytes: Array[Byte]): Unit = {
      val out = fs.create(new Path(s"$path/$rel"), true)
      try out.write(bytes) finally out.close()
    }
    def deflate(b: Array[Byte]): Array[Byte] = {
      val d = new java.util.zip.Deflater(1); d.setInput(b); d.finish()
      val o = new java.io.ByteArrayOutputStream(); val buf = new Array[Byte](4096)
      while (!d.finished()) o.write(buf, 0, d.deflate(buf))
      d.end(); o.toByteArray
    }
    put(".zgroup", """{"zarr_format":2}""".getBytes("UTF-8"))
    // int column: compressor null, fill_value null
    put("idx/.zarray",
      """{"zarr_format":2,"shape":[4],"chunks":[2],"dtype":"<i8","compressor":null,"fill_value":null,"filters":null,"order":"C"}"""
        .getBytes("UTF-8"))
    val b0 = ByteBuffer.allocate(16).order(ByteOrder.LITTLE_ENDIAN)
    b0.putLong(10L).putLong(11L); put("idx/0", b0.array())
    val b1 = ByteBuffer.allocate(16).order(ByteOrder.LITTLE_ENDIAN)
    b1.putLong(12L).putLong(13L); put("idx/1", b1.array())
    // object column: json2 filter, zlib, ensure_ascii escapes (as numcodecs
    // writes non-ASCII), dtype/shape trailer
    put("label/.zarray",
      """{"zarr_format":2,"shape":[4],"chunks":[2],"dtype":"|O","compressor":{"id":"zlib","level":1},"fill_value":null,"filters":[{"id":"json2","encoding":"utf-8","skipkeys":false,"ensure_ascii":true,"check_circular":true,"allow_nan":true,"sort_keys":true,"indent":null,"separators":[",",":"],"strict":true}],"order":"C"}"""
        .getBytes("UTF-8"))
    // literal backslash-u escape in the payload, as ensure_ascii emits it
    put("label/0", deflate("[\"caf\\u00e9\",null,\"|O\",[2]]".getBytes("UTF-8")))
    put("label/1", deflate("""["plain","日本","|O",[2]]""".getBytes("UTF-8")))

    val back = spark.read.format("zarr").load(path)
      .select("idx", "label").orderBy("idx").collect()
    assert(back.map(_.getLong(0)).toSeq == Seq(10L, 11L, 12L, 13L))
    assert(back.map(r => Option(r.getString(1)).orNull).toSeq ==
      Seq("café", null, "plain", "日本"))

    // Fortran order on a true tensor is rejected loudly, not misread
    // (1-d F == C, so only ndim > 1 rejects)
    put("bad/.zarray",
      """{"zarr_format":2,"shape":[4,3],"chunks":[2,3],"dtype":"<i8","compressor":null,"fill_value":0,"filters":null,"order":"F"}"""
        .getBytes("UTF-8"))
    val e = intercept[Exception] {
      ZarrMeta.readArrayMeta(spark.sparkContext.hadoopConfiguration,
        new Path(s"$path/bad"))
    }
    assert(e.getMessage.contains("order"))
    // blosc metadata is ACCEPTED (decoded by graft.sources.zarr.Blosc);
    // an unknown compressor is still rejected with the supported set named
    put("bad2/.zarray",
      """{"zarr_format":2,"shape":[4],"chunks":[2],"dtype":"<i8","compressor":{"id":"blosc","cname":"lz4","clevel":5,"shuffle":1},"fill_value":0,"filters":null,"order":"C"}"""
        .getBytes("UTF-8"))
    assert(ZarrMeta.readArrayMeta(spark.sparkContext.hadoopConfiguration,
      new Path(s"$path/bad2")).compressor === Some("blosc"))
    put("bad3/.zarray",
      """{"zarr_format":2,"shape":[4],"chunks":[2],"dtype":"<i8","compressor":{"id":"lzma"},"fill_value":0,"filters":null,"order":"C"}"""
        .getBytes("UTF-8"))
    val e2 = intercept[Exception] {
      ZarrMeta.readArrayMeta(spark.sparkContext.hadoopConfiguration,
        new Path(s"$path/bad3"))
    }
    assert(e2.getMessage.contains("blosc/zlib"))
  }

  test("grouped dataset-list read works over a zarr store (ROWID = store order)") {
    import graft.api.ReadSpec
    val src = spark.read.parquet(s"${sf()}/nation.parquet")
    val path = tmp("grouped")
    ZarrWrite.write(src, path, rowChunk = 7, overwrite = true)
    val dss = MSTable.read(spark, path, ReadSpec(groupCols = Seq("n_regionkey")))
    assert(dss.map(_.df.count()).sum === 25)
    assert(dss.map(_.partitionKey.head._2.toString.toInt).sorted === Seq(0, 1, 2, 3, 4))
    // ROWID present, dense and unique across groups
    val ids = dss.flatMap(_.df.select(MSTable.RowId).collect().map(_.getLong(0)))
    assert(ids.sorted === (0L until 25L))
  }

  test("parquet → zarr → parquet keeps values bit-exact") {
    val src = spark.read.parquet(s"${sf()}/lineitem.parquet")
      .select("l_orderkey", "l_partkey", "l_quantity", "l_extendedprice")
    val zpath = tmp("li_zarr")
    ZarrWrite.write(src, zpath, rowChunk = 1024, overwrite = true)
    val back = MSTable.open(spark, zpath)
      .select("l_orderkey", "l_partkey", "l_quantity", "l_extendedprice")
    val key = Seq("l_orderkey", "l_partkey", "l_quantity", "l_extendedprice")
    val a = src.orderBy(key.map(col): _*).collect()
    val b = back.orderBy(key.map(col): _*).collect()
    assert(a.length == b.length)
    assert(a.zip(b).forall { case (x, y) => x == y })
  }

  test("zarr sink + source + keywords run against a NON-file:// scheme") {
    // mockfs: is RawLocalFileSystem re-registered under a foreign scheme —
    // the reference's parity here is minio-backed fsspec stores
    // (daskms/conftest.py:238-344); any hidden `file:` assumption
    // (default-FS lookup, java.io.File round-trip, scheme stripping) makes
    // this path fail to resolve
    spark.sparkContext.hadoopConfiguration
      .set("fs.mockfs.impl", "graft.MockFs")
    val zpath = s"mockfs:${tmp("scheme_matrix")}"
    val src = allTypesDf.select(col("c_long"), col("c_int"), col("c_double"),
      concat(lit("s"), col("c_long")).as("c_str"))
    ZarrWrite.write(src, zpath, rowChunk = 7, overwrite = true)
    // overwrite must also work through the foreign scheme
    ZarrWrite.write(src, zpath, rowChunk = 7, overwrite = true)
    val back = spark.read.format("zarr").load(zpath)
    assert(back.count() === 20)
    assert(back.orderBy("c_long").select("c_str").as[String](
      org.apache.spark.sql.Encoders.STRING).collect()
      === src.orderBy("c_long").select("c_str").as[String](
        org.apache.spark.sql.Encoders.STRING).collect())
    // keyword sidecar through the same scheme
    MSWrite.putKeywords(spark, zpath, Map("OBS" -> "meerkat", "V" -> "2"))
    assert(MSWrite.readKeywords(spark, zpath)
      === Map("OBS" -> "meerkat", "V" -> "2"))
    // format dispatch sniffs zarr through the foreign scheme too
    assert(MSTable.open(spark, zpath).count() === 20)
  }
}
