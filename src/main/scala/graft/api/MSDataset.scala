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

  import org.apache.spark.sql.functions.{col, expr}

  /** Projection (ref: dataset column selection, P1). ROWID always kept. */
  def select(columns: String*): MSDataset = {
    val keep = (columns :+ "ROWID").distinct.filter(df.columns.contains)
    copy(df = df.select(keep.map(col): _*))
  }

  /** Drop variables (ref: drop_vars, daskms/dataset.py:379-417, P3).
    * `errors="raise"` semantics: unknown names throw.
    */
  def dropVars(names: String*): MSDataset = {
    val missing = names.filterNot(df.columns.contains)
    require(missing.isEmpty, s"drop_vars: unknown columns ${missing.mkString(", ")}")
    copy(df = df.drop(names: _*))
  }

  /** Assign a derived column from the P4 expression mini-language
    * (ref: ds.assign + data_column_expr, daskms/dataset.py:332-346).
    */
  def assign(name: String, expression: String): MSDataset =
    copy(df = graft.expr.Expressions.withExpr(df, name, expression))

  /** TAQL-subset filter (ref: taql_where semantics applied post-read). */
  def where(taql: String): MSDataset =
    copy(df = df.filter(expr(graft.expr.Taql.toSql(taql))))

  /** Re-expand the group scalars back into columns, the inverse of
    * group-values→attrs demotion (ref: daskms/apps/convert.py:201-222).
    * Partition-key values are validated to the scalar types `lit` supports
    * (group columns are scalar by construction in the reference too) so an
    * unsupported type fails here with a clear message, not inside Spark.
    */
  def withPartitionColumns: DataFrame = {
    import org.apache.spark.sql.functions.lit
    partitionKey.foldLeft(df) { case (d, (name, value)) =>
      val litCol = value match {
        case v @ (_: Int | _: Long | _: Short | _: Byte | _: Double | _: Float |
                  _: Boolean | _: String | _: java.math.BigDecimal |
                  _: java.sql.Date | _: java.sql.Timestamp) => lit(v)
        case null => lit(null)
        case other => throw new IllegalArgumentException(
          s"partition key '$name' has unsupported scalar type " +
            s"${other.getClass.getName}; use Int/Long/Double/String/… scalars")
      }
      if (d.columns.contains(name)) d else d.withColumn(name, litCol)
    }
  }
}
