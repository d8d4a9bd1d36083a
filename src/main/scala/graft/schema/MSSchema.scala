package graft.schema

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The Measurement-Set data model mapped to Spark SQL types — the analog of
  * the reference's schema registry (ref: daskms/table_schemas.py:35-124) and
  * its typed column system (ref: daskms/columns.py:15-54 `_TABLE_TO_PY`).
  *
  * Design decisions (SURVEY §1.2-1.4):
  *  - complex64/128 → `StructType(re, im)` — the same struct-of-two-floats
  *    layout the reference uses for its Arrow extension type
  *    (ref: daskms/experimental/arrow/extension_types.py:178-207)
  *  - N-d cells (e.g. DATA (row, chan, corr)) → nested `ArrayType` with the
  *    non-row dimension NAMES recorded in column `Metadata` under key
  *    `dims`, mirroring the reference's Arrow field metadata and Zarr
  *    `_ARRAY_DIMENSIONS` (ref: arrow_schema.py:180-187,
  *    zarr/__init__.py:119-126)
  *  - per-partition shape uniformity is an enforced invariant, checked from
  *    an exemplar row like the reference (ref: daskms/columns.py:181-223)
  */
object MSSchema {

  val DimsKey = "dims"

  def complexType(double: Boolean = false): StructType = {
    val t = if (double) DoubleType else FloatType
    StructType(Seq(StructField("re", t, nullable = false),
      StructField("im", t, nullable = false)))
  }

  /** CASA value type name → Spark type (ref: daskms/columns.py:15-54). */
  val casaToSpark: Map[String, DataType] = Map(
    "BOOL" -> BooleanType, "BOOLEAN" -> BooleanType,
    "BYTE" -> ShortType, "UCHAR" -> ShortType,
    "SMALLINT" -> ShortType, "SHORT" -> ShortType,
    "USMALLINT" -> IntegerType, "USHORT" -> IntegerType,
    "INT" -> IntegerType, "INTEGER" -> IntegerType,
    "UINT" -> LongType, "UINTEGER" -> LongType,
    "FLOAT" -> FloatType, "DOUBLE" -> DoubleType,
    "FCOMPLEX" -> complexType(), "COMPLEX" -> complexType(),
    "DCOMPLEX" -> complexType(double = true),
    "STRING" -> StringType)

  private def dimsMeta(dims: String*): Metadata =
    new MetadataBuilder().putStringArray(DimsKey, dims.toArray).build()

  private def arr(t: DataType, depth: Int): DataType =
    (1 to depth).foldLeft(t)((acc, _) => ArrayType(acc, containsNull = false))

  /** MS MAIN table (ref: daskms/table_schemas.py MS_SCHEMA): every column
    * carries its non-row dims in metadata. TIME stays DoubleType MJD seconds
    * (NOT a timestamp — ref: daskms/conftest.py:115).
    */
  val msMain: StructType = StructType(Seq(
    StructField("TIME", DoubleType, nullable = false, dimsMeta()),
    StructField("ANTENNA1", IntegerType, nullable = false, dimsMeta()),
    StructField("ANTENNA2", IntegerType, nullable = false, dimsMeta()),
    StructField("FEED1", IntegerType, nullable = false, dimsMeta()),
    StructField("FEED2", IntegerType, nullable = false, dimsMeta()),
    StructField("FIELD_ID", IntegerType, nullable = false, dimsMeta()),
    StructField("DATA_DESC_ID", IntegerType, nullable = false, dimsMeta()),
    StructField("SCAN_NUMBER", IntegerType, nullable = false, dimsMeta()),
    StructField("EXPOSURE", DoubleType, nullable = false, dimsMeta()),
    StructField("INTERVAL", DoubleType, nullable = false, dimsMeta()),
    StructField("UVW", arr(DoubleType, 1), nullable = false, dimsMeta("uvw")),
    StructField("DATA", arr(complexType(), 2), nullable = false, dimsMeta("chan", "corr")),
    StructField("MODEL_DATA", arr(complexType(), 2), nullable = false, dimsMeta("chan", "corr")),
    StructField("CORRECTED_DATA", arr(complexType(), 2), nullable = false, dimsMeta("chan", "corr")),
    StructField("WEIGHT", arr(FloatType, 1), nullable = false, dimsMeta("corr")),
    StructField("SIGMA", arr(FloatType, 1), nullable = false, dimsMeta("corr")),
    StructField("FLAG", arr(BooleanType, 2), nullable = false, dimsMeta("chan", "corr")),
    StructField("FLAG_ROW", BooleanType, nullable = false, dimsMeta()),
    StructField("FLAG_CATEGORY", arr(BooleanType, 3), nullable = false,
      dimsMeta("flagcat", "chan", "corr"))))

  /** SPECTRAL_WINDOW subtable (ragged across rows — read with per-row
    * grouping, ref: daskms/reads.py:493-517).
    */
  val spectralWindow: StructType = StructType(Seq(
    StructField("NUM_CHAN", IntegerType, nullable = false, dimsMeta()),
    StructField("CHAN_FREQ", arr(DoubleType, 1), nullable = false, dimsMeta("chan")),
    StructField("CHAN_WIDTH", arr(DoubleType, 1), nullable = false, dimsMeta("chan")),
    StructField("REF_FREQUENCY", DoubleType, nullable = false, dimsMeta()),
    StructField("TOTAL_BANDWIDTH", DoubleType, nullable = false, dimsMeta())))

  /** ANTENNA subtable. */
  val antenna: StructType = StructType(Seq(
    StructField("NAME", StringType, nullable = false, dimsMeta()),
    StructField("STATION", StringType, nullable = false, dimsMeta()),
    StructField("POSITION", arr(DoubleType, 1), nullable = false, dimsMeta("xyz")),
    StructField("DISH_DIAMETER", DoubleType, nullable = false, dimsMeta()),
    StructField("MOUNT", StringType, nullable = false, dimsMeta())))

  /** Dimension names of a column, from metadata (synthesized `COL-i` names
    * for unknown columns, like daskms/columns.py:228-231).
    */
  def dims(field: StructField): Seq[String] =
    if (field.metadata.contains(DimsKey)) field.metadata.getStringArray(DimsKey).toSeq
    else {
      def depth(t: DataType): Int = t match {
        case ArrayType(e, _) => 1 + depth(e)
        case _ => 0
      }
      (1 to depth(field.dataType)).map(i => s"${field.name}-$i")
    }

  /** Exemplar-based shape inference: the cell shape of the FIRST row of each
    * partition is assumed for the whole partition (the reference's central
    * simplification, README.rst:100-117 "Limitations"); [[enforceUniform]]
    * turns the assumption into a checked invariant.
    */
  def exemplarShape(df: DataFrame, column: String): Seq[Int] = {
    def shapeOf(v: Any): List[Int] = v match {
      case s: scala.collection.Seq[_] =>
        s.length :: (if (s.isEmpty) Nil else shapeOf(s.head))
      case _ => Nil
    }
    val head = df.select(column).head()
    shapeOf(head.get(0))
  }

  /** Shape expression for a (possibly nested) array column — first-element
    * descent, matching exemplar semantics.
    */
  private def shapeCol(c: Column, t: DataType): Column = t match {
    case ArrayType(et, _) => concat(array(size(c)), shapeCol(element_at(c, 1), et))
    case _ => array().cast("array<int>")
  }

  /** Verify the per-partition shape-uniformity invariant for `column`
    * within each group of `groupCols` (no group ⇒ whole frame). Returns the
    * offending (group, shape) rows — empty means the invariant holds.
    */
  def nonUniformShapes(df: DataFrame, column: String,
                       groupCols: Seq[String]): DataFrame = {
    val t = df.schema(column).dataType
    val withShape = df.withColumn("__shape", shapeCol(col(column), t))
    val keys = if (groupCols.isEmpty) Seq(lit(0).as("__g")) else groupCols.map(col)
    withShape.groupBy(keys: _*)
      .agg(countDistinct(col("__shape")).as("n_shapes"),
        collect_set(col("__shape")).as("shapes"))
      .filter(col("n_shapes") > 1)
  }

  def enforceUniform(df: DataFrame, column: String, groupCols: Seq[String]): Unit = {
    val bad = nonUniformShapes(df, column, groupCols).collect()
    require(bad.isEmpty,
      s"column $column has heterogeneous cell shapes within a partition: " +
        bad.take(3).mkString(", ") +
        " — regroup (group_cols) so each partition is shape-homogeneous")
  }
}
