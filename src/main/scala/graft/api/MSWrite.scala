package graft.api

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Write surface: create / append / update-by-ROWID / fragments / keyword
  * sidecars — the Spark-native re-expression of the reference's write path
  * (ref: daskms/writes.py:258-783; daskms/dask_ms.py:18-125 xds_to_table;
  * daskms/experimental/fragments/__init__.py).
  *
  * Parquet is immutable, so the reference's in-place `putcol` scatter
  * (ref: daskms/writes.py:493-566) becomes either
  *  (a) a copy-on-write MERGE — join updates on ROWID, coalesce, rewrite —
  *      [[updateByRowId]] / [[updateTable]], or
  *  (b) a fragment overlay — write only the changed columns plus a parent
  *      pointer, overlay at read time — [[writeFragment]] / [[readFragment]]
  *      (ref: xds_to_table_fragment / xds_from_table_fragment,
  *      fragments/__init__.py:191-237,120-188).
  *
  * Both keep ROWID stable, which is the invariant the whole reference write
  * model hangs on.
  */
object MSWrite {

  import MSTable.RowId

  // ------------------------------------------------------------ create/append

  /** Create (overwrite) a table; `partitionBy` mirrors the reference's
    * group-cols-to-directory layout (ref: arrow/writes.py:100-178 writes
    * one directory per FIELD=val).
    */
  def create(df: DataFrame, path: String, partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
  }

  /** Create (overwrite) a catalog-managed table bucketed + sorted on
    * `keys`: both sides of a same-bucketed equi-join, and any aggregation
    * on the bucket keys, then plan with ZERO exchanges — at 100 TB this is
    * the difference between an all-to-all shuffle per join and none. The
    * standard layout for a fact table that is repeatedly joined on the
    * same key (the subtable-lookup pattern of SURVEY §2.3 at scale).
    */
  def createBucketed(df: DataFrame, table: String, keys: Seq[String],
                     buckets: Int): Unit = {
    val spark = df.sparkSession
    // quote each part of a (possibly db-qualified) name separately:
    // `db`.`tbl`, never `db.tbl`
    val parts = table.split('.')
    require(parts.length <= 2 && parts.forall(_.nonEmpty),
      s"table name '$table' must be 'tbl' or 'db.tbl'")
    val quoted = parts.map(p => s"`$p`").mkString(".")
    spark.sql(s"DROP TABLE IF EXISTS $quoted")
    // Overwrite only clears locations the catalog owns; a crashed run can
    // leave an orphaned dir a fresh catalog refuses to reuse. Resolve the
    // managed location through the catalog's database metadata (works for
    // non-default databases) and clear it only after the DROP above, when
    // anything left there is by definition orphaned.
    val db = if (parts.length == 2) parts(0) else spark.catalog.currentDatabase
    val dbLoc = new org.apache.hadoop.fs.Path(
      spark.sessionState.catalog.getDatabaseMetadata(db).locationUri)
    val loc = new org.apache.hadoop.fs.Path(dbLoc, parts.last.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, keys.head, keys.drop(1): _*)
      .sortBy(keys.head, keys.drop(1): _*)
      .format("parquet").saveAsTable(quoted)
  }

  /** Append rows (ref: add_row_orders chunk-chain, daskms/writes.py:363-490 —
    * here Spark's commit protocol owns file naming, no chaining needed).
    */
  def append(df: DataFrame, path: String, partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode(SaveMode.Append)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
  }

  /** Zarr v2 sink (S7; ref: xds_to_zarr,
    * daskms/experimental/zarr/__init__.py:269-364): one array per column,
    * row-chunked, zlib — the layout [[MSTable.open]] reads back natively.
    */
  def toZarr(df: DataFrame, path: String, rowChunk: Int = 65536,
             overwrite: Boolean = false): Unit =
    graft.sources.zarr.ZarrWrite.write(df, path, rowChunk, overwrite = overwrite)

  /** Write a list of per-group datasets as one partitioned table — the
    * dataset-list form of the reference's `xds_to_table(xds, name, ...)`
    * (ref: daskms/dask_ms.py:18-125): group scalars are re-expanded to
    * columns and become the Hive partition layout, so reading back with
    * `MSTable.read(groupCols = ...)` reconstructs the same dataset list.
    */
  def createDatasets(datasets: Seq[MSDataset], path: String): Unit = {
    require(datasets.nonEmpty, "no datasets to write")
    val groupCols = datasets.head.partitionKey.map(_._1)
    val unioned = datasets.map(_.withPartitionColumns).reduce(_ unionByName _)
    create(unioned, path, partitionBy = groupCols)
  }

  // ----------------------------------------------------------------- update

  /** MERGE semantics: for every column of `delta` (other than ROWID) replace
    * the base value on matching ROWID, keep base elsewhere. Executed as a
    * single equi-join — broadcast when the delta is small (the common case:
    * updates touch a fraction of rows), shuffle-hash/SMJ otherwise, chosen
    * by Catalyst + AQE.
    */
  def updateByRowId(base: DataFrame, delta: DataFrame): DataFrame = {
    require(base.columns.contains(RowId) && delta.columns.contains(RowId),
      s"updateByRowId requires a $RowId column on both sides")
    val cols = delta.columns.filterNot(_ == RowId)
    val renamed = cols.foldLeft(delta) { (d, c) => d.withColumnRenamed(c, s"__u_$c") }
    val joined = base.join(renamed, Seq(RowId), "left")
    val out = cols.foldLeft(joined) { (d, c) =>
      d.withColumn(c, coalesce(col(s"__u_$c"), col(c)))
    }
    out.drop(cols.toSeq.map(c => s"__u_$c"): _*)
  }

  /** Copy-on-write table update: read, merge, rewrite. At scale, prefer
    * partition-scoped rewrites (filter base to affected partition values
    * before the join) or the fragment overlay below.
    */
  private[api] def cowTmpPath(path: String) = path + ".__cow_tmp"
  private[api] def cowBakPath(path: String) = path + ".__cow_bak"

  /** FileSystem schemes whose `rename` is a non-atomic client-side
    * copy+delete (flat-namespace object stores). The crash-safety
    * argument of [[updateTable]] — "a live, complete copy exists at
    * every instant" — is FALSE there: a crash mid-copy leaves both
    * paths partial. HDFS, local file, abfs (hierarchical namespace)
    * and viewfs rename atomically and are unaffected.
    */
  private[api] val NonAtomicRenameSchemes =
    Set("s3", "s3a", "s3n", "gs", "oss", "cos", "cosn", "swift", "wasb", "wasbs")

  /** Filesystem scheme a path actually lands on: the explicit URI scheme,
    * or — for a schemeless path — the scheme of `fs.defaultFS`. On a
    * cluster whose default filesystem IS the object store, "tables/x"
    * resolves to s3a, so the non-atomic-rename guard must check the
    * resolved scheme, not assume "file".
    */
  private[api] def resolvedScheme(
      path: String, conf: org.apache.hadoop.conf.Configuration): String =
    Option(new org.apache.hadoop.fs.Path(path).toUri.getScheme)
      .orElse(Option(
        org.apache.hadoop.fs.FileSystem.getDefaultUri(conf).getScheme))
      .getOrElse("file").toLowerCase(java.util.Locale.ROOT)

  /** Crash-safe commit order: write tmp → rename base ASIDE (backup) →
    * rename tmp IN → delete backup. A live, complete copy of the table
    * exists at a well-known path at every instant; [[recoverTable]] heals
    * the one window where it sits at the backup path.
    *
    * That guarantee requires ATOMIC directory rename, which flat object
    * stores do not provide ([[NonAtomicRenameSchemes]] — s3a renames by
    * copying every object and deleting the source). On those schemes this
    * method refuses to run: use the fragment overlay ([[writeFragment]] —
    * it never touches the parent table, so a crash can tear only the new
    * child directory, which is deleted and rewritten; also the better
    * answer at 100 TB since it writes only the delta) or pass
    * `allowNonAtomicRename = true` to accept a torn-update window.
    */
  def updateTable(spark: SparkSession, path: String, delta: DataFrame,
                  rowIdOrder: Seq[String],
                  allowNonAtomicRename: Boolean = false): Unit = {
    val scheme = resolvedScheme(path, spark.sparkContext.hadoopConfiguration)
    if (!allowNonAtomicRename && NonAtomicRenameSchemes.contains(scheme))
      throw new UnsupportedOperationException(
        s"updateTable: $scheme:// renames are non-atomic (copy+delete), so " +
          "the crash-safe commit cannot hold a live copy at every instant. " +
          "Use writeFragment (rename-free overlay, the right call on object " +
          "stores) or pass allowNonAtomicRename = true to accept the risk.")
    val base = MSTable.withRowId(MSTable.open(spark, path), rowIdOrder)
    val merged = updateByRowId(base, delta).drop(RowId)
    val tmp = cowTmpPath(path)
    create(merged, tmp)
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    val bak = new org.apache.hadoop.fs.Path(cowBakPath(path))
    fs.delete(bak, true) // clear any stale backup
    // rename returns false instead of throwing on some FileSystems; treat
    // either rename failing as fatal BEFORE touching the backup — deleting
    // bak after a failed rename would discard the only live copy
    if (!fs.rename(p, bak))
      throw new java.io.IOException(
        s"updateTable: rename $path -> ${cowBakPath(path)} failed; table unchanged")
    if (!fs.rename(new org.apache.hadoop.fs.Path(tmp), p)) {
      // put the base back so the table stays live at its well-known path
      fs.rename(bak, p)
      throw new java.io.IOException(
        s"updateTable: rename $tmp -> $path failed; base restored from backup")
    }
    fs.delete(bak, true)
  }

  /** Heal an interrupted [[updateTable]]: if the table is missing but its
    * backup exists (crash between the two renames), restore the backup; if
    * both exist (crash before the final delete), drop the stale backup.
    * Stale tmp directories are removed in either case. No-op otherwise.
    */
  def recoverTable(spark: SparkSession, path: String): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    val bak = new org.apache.hadoop.fs.Path(cowBakPath(path))
    if (!fs.exists(p) && fs.exists(bak)) fs.rename(bak, p)
    else if (fs.exists(p) && fs.exists(bak)) fs.delete(bak, true)
    fs.delete(new org.apache.hadoop.fs.Path(cowTmpPath(path)), true)
  }

  // -------------------------------------------------------------- fragments

  private val ParentKey = "__graft_parent_url__" // analog of __dask_ms_parent_url__
  private val RowsKey = "__graft_fragment_rows__"

  /** Write only the changed columns (+ ROWID) as a child fragment with a
    * parent pointer in its keyword sidecar
    * (ref: fragments/__init__.py:191-237).
    *
    * The sidecar also records the fragment's ROW COUNT, observed INSIDE
    * the write job itself (`Dataset.observe` + `Observation`): the
    * recorded count is provably the number of rows the write streamed
    * into the parquet files — not a persist-then-recount, which survives
    * cache eviction but not executor loss, where a nondeterministic
    * delta recomputed after partition loss could record a count that
    * disagrees with the files actually written. Why the count matters:
    * on an object store whose LIST lags its writes, a reader can
    * discover the fragment through its sidecar (a GET) before the
    * listing shows every parquet part-file, and would silently overlay
    * a TRUNCATED delta. [[readFragment]]`(verifyCounts = true)` turns
    * that silent window into a loud refusal. Re-reading the count from
    * the just-written directory would be circular — the writer's own
    * listing can lag exactly like the reader's, baking a truncated
    * count into the guard.
    */
  def writeFragment(delta: DataFrame, childPath: String, parentPath: String): Unit = {
    require(delta.columns.contains(RowId), s"fragment delta needs $RowId")
    val obs = org.apache.spark.sql.Observation("graft.writeFragment")
    create(delta.observe(obs, count(lit(1)).as("rows")), childPath)
    val written = obs.get("rows").asInstanceOf[Long]
    putKeywords(delta.sparkSession, childPath,
      readKeywords(delta.sparkSession, childPath) +
        (ParentKey -> parentPath) + (RowsKey -> written.toString))
  }

  /** Key-wise diff of two versions of a table — the review step of a
    * curation iteration ("what did this recipe change?") and the audit
    * for any versioned store (fragment chain before/after, updateTable
    * before/after): one row per key whose row was `added`, `removed`, or
    * `changed` between `a` (old) and `b` (new); unchanged keys emit
    * nothing. Schemas must match; comparison is null-safe over all
    * non-key columns.
    *
    * Scale shape: ONE full-outer shuffle join on the key — the minimum
    * any content diff pays; the non-key payload travels as a single
    * struct compared with one null-safe `<=>`, and on bucketed stores
    * ([[createBucketed]]) the exchange disappears entirely.
    */
  def diffByKey(a: DataFrame, b: DataFrame,
                keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "diffByKey needs at least one key column")
    require(a.columns.sorted.sameElements(b.columns.sorted),
      s"schemas must match: ${a.columns.mkString(",")} vs ${b.columns.mkString(",")}")
    val dataCols = a.columns.filterNot(keyCols.contains).toSeq
    require(dataCols.nonEmpty, "diffByKey: no non-key columns to compare")
    def pack(df: DataFrame, tag: String) = df.select(
      keyCols.map(col) :+ struct(dataCols.map(col): _*).as(s"__v$tag")
        :+ lit(1).as(s"__in$tag"): _*)
    pack(a, "a").join(pack(b, "b"), keyCols, "full_outer")
      .withColumn("change",
        when(col("__ina").isNull, lit("added"))
          .when(col("__inb").isNull, lit("removed"))
          .when(!(col("__va") <=> col("__vb")), lit("changed")))
      .filter(col("change").isNotNull)
      .select(keyCols.map(col) :+ col("change"): _*)
  }

  /** Read a fragment chain: walk the ancestry to the root, then overlay
    * newest columns over oldest via ROWID-joined coalesce
    * (ref: get_ancestry + consolidate, fragments/__init__.py:17-117).
    * `rowIdOrder` defines ROWID for stores that don't carry one.
    *
    * Read cost is LINEAR in chain depth — one sidecar GET plus one
    * co-partitioned ROWID join per ancestor (measured: ~0.065 s/ancestor
    * fixed overhead at test scale, flat in data size; SCALE.md r16
    * `frag_depth`). Compact chains at depth ≈ 8–16 with
    * [[compactFragments]]: past that the per-read join tax exceeds the
    * one-off compaction write. The read itself SIGNALS when a chain
    * crosses that cadence: past [[CompactionWarnDepth]] ancestors it
    * logs a warning naming the depth and the compaction API (and fires
    * the test hook), so the per-read tax is visible to an operator
    * BEFORE it compounds — a silent linear walk is how a depth-40 chain
    * happens. [[chainDepth]] exposes the measurement (sidecar GETs only,
    * no data read) for monitoring.
    */
  def readFragment(spark: SparkSession, path: String, rowIdOrder: Seq[String]): DataFrame =
    readFragment(spark, path, rowIdOrder, verifyCounts = false)

  /** Ancestor count past which [[readFragment]] warns: the measured
    * compaction cadence (SCALE.md `frag_depth`: linear ~0.065 s/ancestor;
    * compact at 8–16) — 16 is the outer edge of "cheaper to keep
    * reading than to compact".
    */
  val CompactionWarnDepth = 16

  /** Test/monitoring hook invoked with (path, depth) whenever a read
    * walks a chain deeper than [[CompactionWarnDepth]]; defaults to a
    * log4s-less stderr-visible log line via the Spark logger. Swap in
    * tests to assert the signal fires.
    */
  @volatile private[graft] var onDeepChain: (String, Int) => Unit =
    (path, depth) => org.slf4j.LoggerFactory.getLogger(getClass).warn(
      s"fragment chain at $path is $depth ancestors deep " +
        s"(> $CompactionWarnDepth): every read pays ~depth sidecar GETs " +
        "+ ROWID joins — compact with MSWrite.compactFragments")

  /** The ONE ancestry walk (eldest first, `path` last) shared by
    * [[readFragment]], [[chainDepth]], and [[compactFragments]] — a
    * single cycle guard and parent-pointer traversal, so a future fix
    * (path normalization, a depth cap) cannot silently apply to one
    * walker and miss another. Sidecar GETs only; no data read.
    */
  private def ancestry(spark: SparkSession, path: String): List[String] = {
    var chain = List.empty[String]
    var cur: Option[String] = Some(path)
    while (cur.isDefined) {
      val p = cur.get
      require(!chain.contains(p), s"fragment ancestry cycle at $p")
      chain = p :: chain
      cur = readKeywords(spark, p).get(ParentKey)
    }
    chain
  }

  /** The number of ANCESTORS above `path` (0 = standalone table): walks
    * only the keyword sidecars — no data files touched — so a monitor
    * can poll it cheaply and schedule [[compactFragments]] on the
    * SCALE.md cadence (8–16).
    */
  def chainDepth(spark: SparkSession, path: String): Int =
    ancestry(spark, path).length - 1

  /** [[readFragment]] with an optional torn-listing guard: with
    * `verifyCounts = true`, each fragment's visible row count is checked
    * against the count its writer recorded in the sidecar
    * ([[writeFragment]]) and a mismatch REFUSES the read. The sidecar
    * travels by GET (consistent on S3-class stores) while the parquet
    * scan enumerates files via LIST (which may lag) — so a fragment can
    * be discoverable before all its part-files are listable, and an
    * unverified read would silently overlay a truncated delta. Costs one
    * footer-count job per fragment in the chain (no data pages); turn it
    * on for chains on eventually-consistent stores. Fragments written
    * before the count key existed are skipped (nothing recorded to
    * verify against).
    */
  def readFragment(spark: SparkSession, path: String, rowIdOrder: Seq[String],
                   verifyCounts: Boolean): DataFrame =
    readFragmentWithDepth(spark, path, rowIdOrder, verifyCounts)._1

  /** Attrs key under which [[readFragmentDataset]] reports the chain
    * depth its own ancestry walk measured. */
  val ChainDepthAttr = "graft.fragment.chain_depth"

  /** [[readFragment]] as an [[MSDataset]] whose `attrs` carry the
    * walked chain depth under [[ChainDepthAttr]] — the r17 verdict
    * stretch: the [[CompactionWarnDepth]] warning is operator-facing
    * (a log line), so a PIPELINE alerting on depth had to parse logs
    * or pay a second sidecar walk via [[chainDepth]]; here the depth
    * the read's OWN walk already measured rides along at zero extra
    * cost, and a scheduler can trigger [[compactFragments]] off
    * `ds.attrs` programmatically.
    */
  def readFragmentDataset(spark: SparkSession, path: String,
                          rowIdOrder: Seq[String],
                          verifyCounts: Boolean = false): MSDataset = {
    val (df, depth) =
      readFragmentWithDepth(spark, path, rowIdOrder, verifyCounts)
    MSDataset(Seq.empty, df, Map(ChainDepthAttr -> depth.toString))
  }

  private def readFragmentWithDepth(spark: SparkSession, path: String,
      rowIdOrder: Seq[String], verifyCounts: Boolean): (DataFrame, Int) = {
    val chain = ancestry(spark, path)
    // surface the per-read depth tax once it passes the measured
    // compaction cadence — the walk is silent otherwise and a deep
    // chain only gets deeper
    val depth = chain.length - 1
    if (depth > CompactionWarnDepth) onDeepChain(path, depth)
    if (verifyCounts) chain.tail.foreach { child =>
      readKeywords(spark, child).get(RowsKey).foreach { expect =>
        val got = MSTable.open(spark, child).count()
        require(got == expect.toLong,
          s"fragment $child lists $got rows but its writer recorded " +
            s"$expect — the store's listing has not caught up with the " +
            "write (or files were lost); refusing a truncated overlay")
      }
    }
    val root0 = MSTable.open(spark, chain.head)
    val root =
      if (root0.columns.contains(RowId)) root0
      else MSTable.withRowId(root0, rowIdOrder)
    (chain.tail.foldLeft(root) { (acc, child) =>
      updateByRowId(acc, MSTable.open(spark, child))
    }, depth)
  }

  /** Compact a fragment chain into a single standalone table at
    * `outPath`: the overlay-merged view ([[readFragment]]) is written as
    * a fresh create (no parent pointer — `outPath` reads on its own), and
    * the ROOT's other keywords carry over so table metadata survives the
    * compaction. The workflow closer for object stores: in-place
    * [[updateTable]] is refused there (non-atomic rename), fragments
    * accumulate instead, and a periodic compaction folds the chain —
    * entirely rename-free for the chain itself (the new table is created,
    * never swapped; retire the old chain by deleting it once readers have
    * moved). `outPath` must not be part of the chain being compacted.
    */
  def compactFragments(spark: SparkSession, path: String, outPath: String,
                       rowIdOrder: Seq[String],
                       keepRowId: Boolean = false): Unit = {
    // walk the ancestry for the root's keywords (minus the parent pointer)
    val chain = ancestry(spark, path)
    val root = chain.head
    require(!chain.contains(outPath),
      s"compactFragments: outPath $outPath is part of the chain")
    val merged = readFragment(spark, path, rowIdOrder)
    create(if (keepRowId) merged else merged.drop(RowId), outPath)
    val rootKw = readKeywords(spark, root) - ParentKey
    if (rootKw.nonEmpty) putKeywords(spark, outPath, rootKw)
  }

  // ------------------------------------------------- keyword sidecars (S14)

  /** Table keyword dictionaries (ref: daskms/reads.py:292-294,541-546;
    * daskms/writes.py:720-739) stored as a JSON sidecar next to the data.
    */
  def putKeywords(spark: SparkSession, path: String, kw: Map[String, String]): Unit =
    putKeywordsFile(spark, new org.apache.hadoop.fs.Path(path, "_KEYWORDS.json"), kw)

  private def putKeywordsFile(spark: SparkSession,
                              p: org.apache.hadoop.fs.Path,
                              kw: Map[String, String]): Unit = {
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    def esc(s: String) = s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    }
    val json = kw.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""${esc(k)}": "${esc(v)}"""" }
      .mkString("{", ", ", "}")
    out.write(json.getBytes("UTF-8")); out.close()
  }

  /** Keyword UPDATE with the reference's eager put semantics
    * (`_put_keywords`, daskms/writes.py:722-739): each entry is put INTO
    * the existing keyword set — a per-key merge, not a replacement of the
    * whole dictionary — and a `None` value is the `DELKW` sentinel
    * (`table.removekeyword`). [[putKeywords]], by contrast, replaces the
    * sidecar wholesale (the create-style write).
    */
  def updateKeywords(spark: SparkSession, path: String,
                     updates: Map[String, Option[String]]): Unit =
    putKeywords(spark, path, mergeKw(readKeywords(spark, path), updates))

  /** Column-keyword update, merge semantics as [[updateKeywords]]
    * (`table.putcolkeyword`/`removecolkeyword`, daskms/writes.py:731-737);
    * other columns' keyword sets are never touched.
    */
  def updateColumnKeywords(spark: SparkSession, path: String, column: String,
                           updates: Map[String, Option[String]]): Unit =
    putColumnKeywords(spark, path, column,
      mergeKw(readColumnKeywords(spark, path, column), updates))

  private def mergeKw(cur: Map[String, String],
                      updates: Map[String, Option[String]]): Map[String, String] =
    updates.foldLeft(cur) {
      case (m, (k, Some(v))) => m + (k -> v)
      case (m, (k, None))    => m - k
    }

  /** Per-COLUMN keyword dictionaries (ref: column_keywords kwarg,
    * daskms/reads.py:292-294) — stored as one sidecar per column under
    * `_COLKEYWORDS/<col>.json`, so a column's metadata can be updated
    * without touching the others (mirrors CASA's per-column keyword sets).
    */
  def putColumnKeywords(spark: SparkSession, path: String, column: String,
                        kw: Map[String, String]): Unit =
    putKeywordsFile(spark, new org.apache.hadoop.fs.Path(
      new org.apache.hadoop.fs.Path(path, "_COLKEYWORDS"), s"$column.json"), kw)

  def readColumnKeywords(spark: SparkSession, path: String,
                         column: String): Map[String, String] =
    readKeywordsFile(spark, new org.apache.hadoop.fs.Path(
      new org.apache.hadoop.fs.Path(path, "_COLKEYWORDS"), s"$column.json"))

  def readKeywords(spark: SparkSession, path: String): Map[String, String] =
    readKeywordsFile(spark, new org.apache.hadoop.fs.Path(path, "_KEYWORDS.json"))

  private def readKeywordsFile(spark: SparkSession,
                               p: org.apache.hadoop.fs.Path): Map[String, String] = {
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Map.empty
    else {
      val in = fs.open(p)
      val txt = scala.io.Source.fromInputStream(in, "UTF-8").mkString
      in.close()
      // minimal flat string→string JSON object parser (sidecars are ours).
      // Unescape in ONE left-to-right scan (sequential .replace calls would
      // corrupt e.g. backslash-then-'n') and decode the \uXXXX forms that
      // the writer emits for control characters. Plain-character runs are
      // matched possessively ([^"\\]++): the per-character alternation form
      // recurses once per char in java.util.regex and StackOverflows on
      // multi-KB values (e.g. serialized IVF centroid tables).
      val pat = """"((?:[^"\\]++|\\.)*)"\s*:\s*"((?:[^"\\]++|\\.)*)"""".r
      def unesc(s: String): String = {
        val b = new StringBuilder(s.length)
        var i = 0
        while (i < s.length) {
          val c = s.charAt(i)
          if (c == '\\' && i + 1 < s.length) {
            s.charAt(i + 1) match {
              case 'n' => b += '\n'; i += 2
              case 'r' => b += '\r'; i += 2
              case 't' => b += '\t'; i += 2
              case 'u' if i + 5 < s.length =>
                b += Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar; i += 6
              case e => b += e; i += 2 // \" \\ \/ and friends
            }
          } else { b += c; i += 1 }
        }
        b.result()
      }
      pat.findAllMatchIn(txt).map(m => unesc(m.group(1)) -> unesc(m.group(2))).toMap
    }
  }
}
