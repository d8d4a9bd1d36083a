package graft.schema

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthetic Measurement-Set main table, built from
  * `spark.range` — used by tests and the tensor-column demo query to
  * exercise the §1.3 data model (N-d cells as nested arrays with dims
  * metadata) without casacore.
  *
  * All cell values are simple closed-form functions of (row, chan, corr) so
  * any engine can reproduce them.
  */
object SyntheticMS {

  /** rows × nchan × ncorr complex DATA + flags + uvw, shaped like MS MAIN. */
  def build(spark: SparkSession, rows: Long, nchan: Int, ncorr: Int): DataFrame = {
    val base = spark.range(rows).toDF("row")
    val r = col("row")
    val data = transform(sequence(lit(0), lit(nchan - 1)), c =>
      transform(sequence(lit(0), lit(ncorr - 1)), p =>
        struct(
          (r + c).cast("double").as("re"),
          (r % 7 * p).cast("double").as("im"))))
    val flag = transform(sequence(lit(0), lit(nchan - 1)), c =>
      transform(sequence(lit(0), lit(ncorr - 1)), p =>
        (r + c + p) % 11 === 0))
    val uvw = array((r % 100).cast("double"), (r % 50).cast("double"),
      (r % 25).cast("double"))
    base.select(
      r.cast("double").as("TIME"),
      (r % 4).cast("int").as("ANTENNA1"),
      (r % 5).cast("int").as("ANTENNA2"),
      (r % 3).cast("int").as("FIELD_ID"),
      (r % 2).cast("int").as("DATA_DESC_ID"),
      uvw.as("UVW"),
      data.as("DATA"),
      flag.as("FLAG"),
      r.as("ROWID"))
  }
}
