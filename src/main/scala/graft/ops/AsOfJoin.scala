package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (most-recent-match) join and range join — operators Spark lacks
  * as primitives, composed from built-ins per the preference order
  * (compose > custom plan): union + partitioned window `last(ignoreNulls)`.
  *
  * One shuffle on (keys), no point-in-interval explosion, no
  * BroadcastNestedLoop: the classic scalable as-of formulation. Sorting is
  * within key partitions only.
  */
object AsOfJoin {

  /** For every left row, attach the latest right row (its `valueCols`)
    * with right.ts <= left.ts, matching on `keys`.
    *
    * Implementation: tag both sides, union by name, window over
    * (keys ORDER BY ts, side) with `last(ignoreNulls)` carrying right
    * values forward; keep left rows.
    */
  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
           tsCol: String, valueCols: Seq[String]): DataFrame = {
    val l = left
      .withColumn("__side", lit(1))
      .select(left.columns.toSeq.map(col) :+ col("__side") :+
        lit(null).cast("long").as("__rmark"): _*)
    // right side contributes only keys + ts + values
    var r = right.select((keys :+ tsCol).map(col) ++ valueCols.map(col): _*)
      .withColumn("__side", lit(0))
      .withColumn("__rmark", lit(1L))
    // align schemas: add left-only columns as nulls on the right
    val leftOnly = left.columns.filterNot(c => keys.contains(c) || c == tsCol)
    val rightRenamed = valueCols.foldLeft(r) { (d, c) =>
      d.withColumnRenamed(c, s"__v_$c")
    }
    var lAligned = valueCols.foldLeft(l) { (d, c) =>
      d.withColumn(s"__v_$c", lit(null))
    }
    val rAligned = leftOnly.foldLeft(rightRenamed) { (d, c) =>
      d.withColumn(c, lit(null))
    }
    val unioned = lAligned.unionByName(rAligned.select(lAligned.columns.toSeq.map(col): _*))
    // right rows sort before left rows at equal ts (side 0 < 1) so an exact
    // ts match is visible to the left row
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val carried = valueCols.foldLeft(unioned) { (d, c) =>
      d.withColumn(s"__asof_$c", last(col(s"__v_$c"), ignoreNulls = true).over(w))
    }
    val out = carried.filter(col("__side") === 1)
    valueCols.foldLeft(out) { (d, c) =>
      d.withColumn(s"asof_$c", col(s"__asof_$c"))
    }.drop(valueCols.flatMap(c => Seq(s"__v_$c", s"__asof_$c")) ++
       Seq("__side", "__rmark"): _*)
  }

  /** Range join: left rows matched to right intervals [lo, hi] on the same
    * keys. Equi-join on keys first (hash join), range predicate applied
    * post-join — avoids BroadcastNestedLoop whenever keys exist.
    */
  def rangeJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                probe: Column, lo: Column, hi: Column): DataFrame =
    left.join(right, keys).filter(probe >= lo && probe <= hi)
}
