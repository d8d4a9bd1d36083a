package graft.api

import org.apache.spark.sql.DataFrame

/** One partition's worth of data — the Spark-native analog of the
  * reference's per-group xarray Dataset (ref: daskms/dataset.py:238-536,
  * daskms/reads.py:362-430).
  *
  * @param partitionKey group-column name → scalar value for this group,
  *        the analog of the reference's DASKMS_PARTITION_KEY attr
  *        (ref: daskms/reads.py:415-424, daskms/constants.py:1)
  * @param df the partition's rows; always carries a ROWID LongType column
  *        (ref: daskms/reads.py:227 ROWID coordinate)
  * @param attrs free-form metadata (ref: dataset attrs)
  */
final case class MSDataset(
    partitionKey: Seq[(String, Any)],
    df: DataFrame,
    attrs: Map[String, String] = Map.empty) {

  /** Re-expand the group scalars back into columns, the inverse of
    * group-values→attrs demotion (ref: daskms/apps/convert.py:201-222). */
  def withPartitionColumns: DataFrame = {
    import org.apache.spark.sql.functions.lit
    partitionKey.foldLeft(df) { case (d, (name, value)) =>
      if (d.columns.contains(name)) d else d.withColumn(name, lit(value))
    }
  }
}
