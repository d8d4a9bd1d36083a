package graft.api

import org.apache.spark.sql.SparkSession

/** Format-conversion CLI — the Spark-native analog of `dask-ms convert`
  * (ref: daskms/apps/convert.py:74-281; format registry
  * daskms/apps/formats.py:10-170).
  *
  * Usage (spark-submit or sbt "runMain graft.api.ConvertApp ..."):
  * {{{
  *   ConvertApp -i INPUT -o OUTPUT [-f parquet|zarr] [-g col1,col2]
  *              [-x colA,colB] [-s idx1,idx2] [-w TAQL_WHERE] [-c cols]
  * }}}
  *  -f output format (ref: convert.py `-f/--format`); input format is
  *     sniffed (parquet / zarr / CASA-fails-fast) like the reference's
  *     storage dispatch
  *  -g group cols → Hive-style partition directories on the output
  *  -x exclude columns, reference syntax (ref: convert.py:29-61):
  *     `COL` excludes from the main table, `SUBTABLE::COL` from that
  *     subtable only, `SUBTABLE::*` drops the whole subtable
  *  -s index (sort) cols, -w TAQL where, -c projection
  *
  * The reference walks every subtable of a CASA MS; here a "subtable" is a
  * subdirectory (the `::SUBTABLE` convention, MSTable.resolveSubtable), and
  * each direct parquet subdirectory of the input is converted alongside the
  * main table.
  */
object ConvertApp {

  final case class Args(
      input: String = "", output: String = "",
      group: Seq[String] = Nil, exclude: Seq[String] = Nil,
      sort: Seq[String] = Nil, where: Option[String] = None,
      columns: Option[Seq[String]] = None, format: String = "parquet") {

    /** `-x` entries bucketed per table: bare `COL` → MAIN, `SUB::COL` →
      * that subtable, `SUB::*` → the whole subtable (reference semantics,
      * convert.py:29-61). Excluding all of MAIN is an error there too.
      */
    lazy val excludeByTable: Map[String, Set[String]] = {
      val pairs = exclude.map { e =>
        e.split("::") match {
          case Array(col) => "MAIN" -> col
          case Array(table, col) => table -> col
          case _ => throw new IllegalArgumentException(
            s"excluded columns must be COLUMN or SUBTABLE::COLUMN, got '$e'")
        }
      }
      val m = pairs.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      require(!m.getOrElse("MAIN", Set.empty).contains("*"),
        "excluding all columns of the MAIN table is not supported")
      m
    }
  }

  def parseArgs(argv: Array[String]): Args = {
    def split(s: String) = s.split(",").map(_.trim).filter(_.nonEmpty).toSeq
    @annotation.tailrec
    def loop(rest: List[String], a: Args): Args = rest match {
      case "-i" :: v :: t => loop(t, a.copy(input = v))
      case "-o" :: v :: t => loop(t, a.copy(output = v))
      case "-g" :: v :: t => loop(t, a.copy(group = split(v)))
      case "-x" :: v :: t => loop(t, a.copy(exclude = split(v)))
      case "-s" :: v :: t => loop(t, a.copy(sort = split(v)))
      case "-w" :: v :: t => loop(t, a.copy(where = Some(v)))
      case "-c" :: v :: t => loop(t, a.copy(columns = Some(split(v))))
      case "-f" :: v :: t => loop(t, a.copy(format = v))
      case Nil => a
      case x :: _ => throw new IllegalArgumentException(s"unknown arg $x")
    }
    val a = loop(argv.toList, Args())
    require(a.input.nonEmpty && a.output.nonEmpty, "need -i INPUT -o OUTPUT")
    require(Seq("parquet", "zarr").contains(a.format),
      s"-f must be parquet or zarr, got '${a.format}'")
    require(a.format == "parquet" || a.group.isEmpty,
      "-g (Hive partition dirs) applies to parquet output only")
    a
  }

  /** Subtable discovery: direct subdirectories of the input that contain
    * parquet files (the `::SUBTABLE` convention) — the analog of the
    * reference enumerating a CASA MS's subtables
    * (ref: daskms/apps/formats.py:10-170).
    */
  def subtables(spark: SparkSession, input: String): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(input)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p) || !fs.getFileStatus(p).isDirectory) Nil
    else fs.listStatus(p).toSeq
      .filter(_.isDirectory)
      .map(_.getPath)
      .filterNot(_.getName.contains("=")) // Hive partition dirs ≠ subtables
      .filter { d =>
        // parquet subtable, or a nested zarr GROUP (.zgroup); zarr ARRAYS
        // (.zarray) are columns of the parent store, not subtables
        fs.listStatus(d).exists(f => f.getPath.getName.endsWith(".parquet") ||
          f.getPath.getName == "_SUCCESS") ||
          (fs.exists(new org.apache.hadoop.fs.Path(d, ".zgroup")) &&
            !fs.exists(new org.apache.hadoop.fs.Path(d, ".zarray")))
      }
      .map(_.getName)
  }

  def convert(spark: SparkSession, a: Args): Unit = {
    val excl = a.excludeByTable
    convertOne(spark, a, excl.getOrElse("MAIN", Set.empty))
    // walk subtables with a plain copy (group/sort/where apply to the main
    // table only, like the reference's per-subtable defaults); per-subtable
    // exclusions apply, and SUBTABLE::* skips the subtable entirely
    subtables(spark, a.input).foreach { st =>
      val stExcl = excl.getOrElse(st, Set.empty)
      if (!stExcl.contains("*"))
        convertOne(spark,
          Args(input = s"${a.input}/$st", output = s"${a.output}/$st",
            format = a.format), stExcl)
    }
  }

  private def convertOne(spark: SparkSession, a: Args,
                         exclude: Set[String]): Unit = {
    val spec = ReadSpec(columns = a.columns, groupCols = a.group,
      indexCols = a.sort, where = a.where)
    var df = MSTable.readDF(spark, a.input, spec)
    if (a.sort.nonEmpty)
      df = df.repartitionByRange(a.sort.map(org.apache.spark.sql.functions.col): _*)
        .sortWithinPartitions(a.sort.map(org.apache.spark.sql.functions.col): _*)
    val kept = df.drop(exclude.toSeq: _*)
    if (a.format == "zarr") MSWrite.toZarr(kept, a.output, overwrite = true)
    else MSWrite.create(kept, a.output, partitionBy = a.group)
    // carry keyword sidecars across the conversion (S14)
    val kw = MSWrite.readKeywords(spark, a.input)
    if (kw.nonEmpty) MSWrite.putKeywords(spark, a.output, kw)
  }

  def main(argv: Array[String]): Unit = {
    val a = parseArgs(argv)
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try convert(spark, a) finally spark.stop()
  }
}
