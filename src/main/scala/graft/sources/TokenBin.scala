package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.util

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.util.SerializableConfiguration

import scala.jdk.CollectionConverters._

/** Indexed binary token shards — the dataloader "last mile" after
  * tokenization/packing: sequences of int token ids stored as flat
  * little-endian int32 `.bin` files with an `.idx` sidecar of
  * (key, length) entries, the layout popularized by the public
  * Megatron-LM / GPT-NeoX `indexed_dataset` format (token bytes +
  * an index of sequence offsets a training job memory-maps and seeks).
  * This engine both produces the shards (distributed, streaming, no
  * driver data path) and reads them back as a DataFrame via
  * `spark.read.format("tokenbin").load(dir)`.
  *
  * Layout at `dir/`:
  * {{{
  *   shard-%05d.bin   int32-LE token ids, sequences back-to-back in key order
  *   shard-%05d.idx   "GRAFTIDX" magic, version i32, dtype i32, n_seqs i64,
  *                    then n_seqs x (key i64-LE, len i64-LE)
  *   manifest.json    {"shards":N,"total_seqs":S,"total_tokens":T,"dtype":"int32"}
  * }}}
  *
  * Scale design:
  *  - shard assignment is a pure function of the key (`pmod(key, shards)`)
  *    so placement is reproducible by any engine, and incremental runs
  *    land a key in the same shard;
  *  - the write is ONE hash repartition + per-task streaming append —
  *    executor memory is O(seqs-per-shard x 16 B) for the index entries,
  *    never the token payload;
  *  - the read plans one InputPartition per shard, streams the `.bin`
  *    sequentially (entries are in file order — no seeks), and when the
  *    projection drops `ids` reads ONLY the `.idx` sidecars: counting
  *    sequences/tokens over a 100 TB corpus never opens a token byte.
  */
object TokenBin {
  val Magic = "GRAFTIDX"
  val Version = 1
  // numpy-style dtype codes (the Megatron indexed-dataset convention):
  // 4 = int32, 8 = uint16 — uint16 halves the token bytes whenever the
  // vocabulary fits in 65536 ids, the common case for trained tokenizers
  val DtypeInt32 = 4
  val DtypeUint16 = 8

  private[sources] def dtypeCode(dtype: String): Int = dtype match {
    case "int32"  => DtypeInt32
    case "uint16" => DtypeUint16
    case other => throw new IllegalArgumentException(
      s"tokenbin: unsupported dtype '$other' (int32 | uint16)")
  }
  private[sources] def dtypeName(code: Int): String = code match {
    case DtypeInt32  => "int32"
    case DtypeUint16 => "uint16"
    case other => throw new IllegalArgumentException(
      s"tokenbin: unsupported dtype code $other")
  }
  private[sources] def dtypeBytes(code: Int): Int =
    if (code == DtypeUint16) 2 else 4

  val schema: StructType = StructType(Seq(
    StructField("shard", IntegerType, nullable = false),
    StructField("key", LongType, nullable = false),
    StructField("ids", ArrayType(IntegerType, containsNull = false),
      nullable = false)))

  /** Write `df`'s (`keyCol`: castable to long, `idsCol`: array<int>) as
    * `shards` indexed binary shards under `outDir`. shard =
    * `pmod(key, shards)`; within a shard, sequences are in key order.
    * Returns (total_seqs, total_tokens) — counted by accumulator on the
    * same single pass that writes the bytes.
    */
  def write(df: DataFrame, keyCol: String, idsCol: String, outDir: String,
            shards: Int, dtype: String = "int32"): (Long, Long) = {
    require(shards > 0, s"tokenbin: shards must be positive: $shards")
    val dt = dtypeCode(dtype)
    val spark = df.sparkSession
    val conf = new SerializableConfiguration(spark.sessionState.newHadoopConf())
    val root = new Path(outDir)
    val rootFs = root.getFileSystem(conf.value)
    rootFs.mkdirs(root)
    // overwrite semantics: clear any previous shard set first — a re-run
    // with a different shard count would otherwise leave stale
    // higher-numbered shard files for the reader to silently union in
    // (epoch subdirectories are untouched: appendBatch overwrites only
    // its own epoch directory, preserving retry idempotence)
    Seq("shard-*.bin", "shard-*.idx", "manifest.json",
        "manifest.json.tmp").foreach { g =>
      Option(rootFs.globStatus(new Path(root, g))).getOrElse(Array())
        .foreach(st => rootFs.delete(st.getPath, false))
    }
    val rows = df.select(
      pmod(col(keyCol).cast("long"), lit(shards.toLong)).cast("int").as("shard"),
      col(keyCol).cast("long").as("key"),
      col(idsCol).cast("array<int>").as("ids"))
      .repartition(shards, col("shard"))
      .sortWithinPartitions("shard", "key")
    val seqAcc = spark.sparkContext.longAccumulator("tokenbin.seqs")
    val tokAcc = spark.sparkContext.longAccumulator("tokenbin.tokens")
    // per-shard (md5, seqs, tokens), the md5 computed ON the write
    // stream — O(shards) driver state; md5 is recheckable later with
    // [[verifyShards]], the counts feed [[assignShards]]'s balancing
    val md5Acc = spark.sparkContext
      .collectionAccumulator[(Int, String, Long, Long)]("tokenbin.shards")
    rows.foreachPartition { (it: Iterator[Row]) =>
      // a hash partition may carry several shard values (or none); the
      // sort makes each shard a contiguous run — stream each run into its
      // own .bin and close it with its .idx sidecar
      val cfs = new Path(outDir).getFileSystem(conf.value)
      var cur = -1
      var bin: java.io.DataOutputStream = null
      var dig: java.security.MessageDigest = null
      val keys = scala.collection.mutable.ArrayBuffer.empty[Long]
      val lens = scala.collection.mutable.ArrayBuffer.empty[Long]
      def closeShard(): Unit = if (cur >= 0) {
        bin.close()
        md5Acc.add((cur, dig.digest().map("%02x".format(_)).mkString,
          keys.length.toLong, lens.sum))
        val out = new java.io.DataOutputStream(new java.io.BufferedOutputStream(
          cfs.create(new Path(outDir, f"shard-$cur%05d.idx"), true), 1 << 16))
        try {
          out.writeBytes(Magic)
          writeIntLE(out, Version); writeIntLE(out, dt)
          writeLongLE(out, keys.length.toLong)
          var i = 0
          while (i < keys.length) {
            writeLongLE(out, keys(i)); writeLongLE(out, lens(i)); i += 1
          }
        } finally out.close()
        keys.clear(); lens.clear(); cur = -1; bin = null; dig = null
      }
      it.foreach { r =>
        val s = r.getInt(0)
        if (s != cur) {
          closeShard()
          cur = s
          dig = java.security.MessageDigest.getInstance("MD5")
          bin = new java.io.DataOutputStream(new java.io.BufferedOutputStream(
            new java.security.DigestOutputStream(
              cfs.create(new Path(outDir, f"shard-$s%05d.bin"), true), dig),
            1 << 16))
        }
        val ids = r.getSeq[Int](2)
        keys += r.getLong(1); lens += ids.length.toLong
        seqAcc.add(1L); tokAcc.add(ids.length.toLong)
        val w = dtypeBytes(dt)
        val bb = ByteBuffer.allocate(ids.length * w).order(ByteOrder.LITTLE_ENDIAN)
        ids.foreach { id =>
          if (dt == DtypeUint16) {
            if (id < 0 || id > 0xFFFF) throw new IllegalArgumentException(
              s"tokenbin: id $id of key ${r.getLong(1)} does not fit uint16 — " +
                "write with dtype=int32")
            bb.putShort(id.toShort)
          } else bb.putInt(id)
        }
        bin.write(bb.array())
      }
      closeShard()
    }
    val fs = root.getFileSystem(conf.value)
    val shardList = md5Acc.value.asScala.sortBy(_._1)
      .map { case (s, m, ns, nt) =>
        s"""{"shard": $s, "md5": "$m", "seqs": $ns, "tokens": $nt}""" }
      .mkString("[", ", ", "]")
    val manifest = s"""{"shards": $shards, "total_seqs": ${seqAcc.value}, """ +
      s""""total_tokens": ${tokAcc.value}, "dtype": "$dtype", """ +
      s""""shard_list": $shardList}"""
    // atomic manifest commit: temp-write + rename, so no crash window
    // leaves a TRUNCATED manifest.json whose partial shard_list would
    // silently shrink the read inventory (readShardInfos additionally
    // cross-checks entry sums against the recorded totals)
    val tmpP = new Path(root, "manifest.json.tmp")
    val out = fs.create(tmpP, true)
    try out.write(manifest.getBytes("UTF-8")) finally out.close()
    require(fs.rename(tmpP, new Path(root, "manifest.json")),
      s"tokenbin: manifest rename failed at $outDir")
    (seqAcc.value, tokAcc.value)
  }

  /** One parsed per-shard manifest entry. */
  final case class ShardInfo(dir: String, shard: Int, md5: String,
                             seqs: Long, tokens: Long)

  private val ShardEntryRe =
    ("\\{\"shard\": (\\d+), \"md5\": \"([0-9a-f]{32})\", " +
      "\"seqs\": (\\d+), \"tokens\": (\\d+)\\}").r

  /** Read every manifest under `dir` (batch root + streaming epochs) —
    * O(shards) driver work, no token bytes touched.
    */
  /** Commit-marker audit. The manifest is written LAST, so a directory
    * holding shard files without one is a crashed write ([[write]]
    * bypasses Spark's committer). The batch ROOT in that state is
    * refused loudly — re-running the write (or deleting the partial
    * shards) is the only safe continuation. An UNCOMMITTED epoch
    * subdirectory is merely SKIPPED: `appendBatch` keys the directory by
    * batch id, so the streaming retry of that exact batch overwrites it
    * in place — surfacing it early would hand the dataloader a
    * partially-written epoch. Returns every committed directory.
    */
  private[sources] def committedDirs(
      fs: org.apache.hadoop.fs.FileSystem, dir: String): Seq[Path] = {
    val root = new Path(dir)
    val rootIdx =
      Option(fs.globStatus(new Path(root, "shard-*.idx"))).getOrElse(Array())
    val rootCommitted = fs.exists(new Path(root, "manifest.json"))
    require(rootIdx.isEmpty || rootCommitted,
      s"tokenbin: ${rootIdx.length} shard file(s) at $dir have no " +
        "manifest.json — the write crashed before its manifest commit; " +
        "re-run the write or remove the partial shards")
    val epochs =
      Option(fs.globStatus(new Path(root, "epoch-*/manifest.json")))
        .getOrElse(Array()).map(_.getPath.getParent).toSeq
    (if (rootCommitted) Seq(root) else Nil) ++ epochs
  }

  private[sources] def readShardInfos(
      fs: org.apache.hadoop.fs.FileSystem, dir: String): Seq[ShardInfo] = {
    val manifests = committedDirs(fs, dir).map(d => new Path(d, "manifest.json"))
    require(manifests.nonEmpty, s"tokenbin: no manifest.json under $dir")
    manifests.flatMap { p =>
      val in = fs.open(p)
      val txt = try new String(in.readAllBytes(), "UTF-8") finally in.close()
      val d = p.getParent.toString
      val infos = ShardEntryRe.findAllMatchIn(txt).map(m => ShardInfo(d,
        m.group(1).toInt, m.group(2), m.group(3).toLong, m.group(4).toLong))
        .toSeq
      // self-integrity: the totals share the entries' accumulators, so
      // a manifest whose entry sums disagree (including zero parsed
      // entries against nonzero totals) is torn or corrupt — refuse
      // instead of silently shrinking the shard inventory
      def totalOf(field: String): Long =
        (s""""$field":\\s*(\\d+)""".r.findFirstMatchIn(txt) match {
          case Some(m) => m.group(1)
          case None => throw new IllegalArgumentException(
            s"tokenbin: manifest.json at $d is missing $field — " +
              "truncated or corrupt; re-run the write")
        }).toLong
      val (ts, tt) = (totalOf("total_seqs"), totalOf("total_tokens"))
      require(infos.map(_.seqs).sum == ts && infos.map(_.tokens).sum == tt,
        s"tokenbin: manifest.json at $d is internally inconsistent — " +
          s"shard_list sums (${infos.map(_.seqs).sum} seqs, " +
          s"${infos.map(_.tokens).sum} tokens) != recorded totals " +
          s"($ts, $tt); the manifest is torn or corrupt; re-run the write")
      infos
    }
  }

  /** Deterministic balanced shard→worker assignment for `workers`
    * dataloader ranks: LPT greedy over the manifests' per-shard token
    * counts (largest shard to the currently-lightest worker, ties by
    * worker id) — O(shards log shards) driver work, no data read.
    * Returns (worker, dir, shard, tokens) covering every shard once.
    */
  def assignShards(spark: SparkSession, dir: String, workers: Int): DataFrame = {
    require(workers > 0, s"tokenbin: workers must be positive: $workers")
    val fs = new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())
    val infos = readShardInfos(fs, dir).sortBy(i => (-i.tokens, i.dir, i.shard))
    val loads = scala.collection.mutable.PriorityQueue.empty[(Long, Int)](
      Ordering.by(t => (-t._1, -t._2))) // head = lightest, ties -> lowest id
    (0 until workers).foreach(w => loads.enqueue((0L, w)))
    val rows = infos.map { i =>
      val (load, w) = loads.dequeue()
      loads.enqueue((load + i.tokens, w))
      (w, i.dir, i.shard, i.tokens)
    }
    import spark.implicits._
    rows.toDF("worker", "dir", "shard", "tokens")
  }

  /** Distributed integrity check: re-hash every shard's token bytes and
    * compare with the manifest md5 recorded at write time — one task per
    * shard, driver state O(shards). Returns (dir, shard, ok, expected,
    * actual); a missing/corrupt/truncated .bin shows up as ok = false.
    * Covers both the batch layout and the streaming epoch subdirectories.
    */
  def verifyShards(spark: SparkSession, dir: String): DataFrame = {
    val conf = new SerializableConfiguration(spark.sessionState.newHadoopConf())
    val fs = new Path(dir).getFileSystem(conf.value)
    // tiny fixed-shape manifest — a regex parse keeps the reader
    // dependency-free (the writer controls the format end to end)
    val expected: Seq[(String, Int, String)] =
      readShardInfos(fs, dir).map(i => (i.dir, i.shard, i.md5))
    val spark2 = spark
    import spark2.implicits._
    spark.createDataset(expected).repartition(expected.size.max(1))
      .map { case (d, shard, want) =>
        val p = new Path(d, f"shard-$shard%05d.bin")
        val pfs = p.getFileSystem(conf.value)
        val got =
          try {
            val dg = java.security.MessageDigest.getInstance("MD5")
            val in = pfs.open(p)
            try {
              val buf = new Array[Byte](1 << 16)
              var n = in.read(buf)
              while (n >= 0) { dg.update(buf, 0, n); n = in.read(buf) }
            } finally in.close()
            dg.digest().map("%02x".format(_)).mkString
          } catch { case _: java.io.IOException => "<unreadable>" }
        (d, shard, got == want, want, got)
      }
      .toDF("dir", "shard", "ok", "expected", "actual")
  }

  /** Streaming leg: append one micro-batch as an `epoch-%06d/` shard set —
    * use inside `foreachBatch` (the idiomatic Structured Streaming escape
    * hatch for sinks that need whole-batch repartition semantics):
    * {{{
    * enc.writeStream.foreachBatch { (b: DataFrame, id: Long) =>
    *   TokenBin.appendBatch(b, "doc_id", "ids", dir, shards = 32, epoch = id)
    *   ()
    * }.start()
    * }}}
    * Exactly-once by construction: the epoch directory is keyed by the
    * batch id, so a retried batch overwrites its own files instead of
    * duplicating them. The reader picks up top-level AND epoch shard sets.
    */
  def appendBatch(df: DataFrame, keyCol: String, idsCol: String,
                  outDir: String, shards: Int, epoch: Long,
                  dtype: String = "int32"): (Long, Long) =
    write(df, keyCol, idsCol, f"$outDir/epoch-$epoch%06d", shards, dtype)

  private def writeIntLE(o: java.io.DataOutputStream, v: Int): Unit = {
    o.write(v & 0xFF); o.write((v >>> 8) & 0xFF)
    o.write((v >>> 16) & 0xFF); o.write((v >>> 24) & 0xFF)
  }
  private def writeLongLE(o: java.io.DataOutputStream, v: Long): Unit = {
    writeIntLE(o, (v & 0xFFFFFFFFL).toInt); writeIntLE(o, (v >>> 32).toInt)
  }

  private[sources] def readIntLE(in: java.io.DataInputStream): Int = {
    val a = in.read(); val b = in.read(); val c = in.read(); val d = in.read()
    if ((a | b | c | d) < 0) throw new java.io.EOFException("tokenbin idx truncated")
    a | (b << 8) | (c << 16) | (d << 24)
  }
  private[sources] def readLongLE(in: java.io.DataInputStream): Long =
    (readIntLE(in).toLong & 0xFFFFFFFFL) | (readIntLE(in).toLong << 32)

  /** Parse one .idx sidecar → (dtype code, keys, lens). Shared by the row
    * and columnar readers.
    */
  private[sources] def parseIdx(fs: org.apache.hadoop.fs.FileSystem,
                                idxFile: String): (Int, Array[Long], Array[Long]) = {
    val in = new java.io.DataInputStream(new java.io.BufferedInputStream(
      fs.open(new Path(idxFile)), 1 << 16))
    try {
      val magic = new Array[Byte](8)
      in.readFully(magic)
      require(new String(magic, "US-ASCII") == Magic,
        s"tokenbin: bad magic in $idxFile")
      val version = readIntLE(in)
      require(version == Version,
        s"tokenbin: unsupported version $version in $idxFile")
      val dt = readIntLE(in)
      dtypeName(dt) // validates the code
      val n = readLongLE(in)
      require(n >= 0 && n <= Int.MaxValue, s"tokenbin: bad n_seqs $n")
      val ks = new Array[Long](n.toInt); val ls = new Array[Long](n.toInt)
      var i = 0
      while (i < n.toInt) {
        ks(i) = readLongLE(in); ls(i) = readLongLE(in); i += 1
      }
      (dt, ks, ls)
    } finally in.close()
  }
}

/** `spark.read.format("tokenbin").load(dir)` — DSv2 reader over a TokenBin
  * shard directory: one InputPartition per shard, sequential streaming of
  * the token bytes, idx-only scans when `ids` is pruned away.
  */
class TokenBinDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "tokenbin"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    TokenBin.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new TokenBinTable(properties.get("path"))
}

class TokenBinTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"tokenbin:$path"
  override def schema(): StructType = TokenBin.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new TokenBinScanBuilder(path, Option(options.get("shards")))
}

class TokenBinScanBuilder(path: String, shardsOpt: Option[String])
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = TokenBin.schema
  override def pruneColumns(requiredSchema: StructType): Unit = {
    val names = requiredSchema.fieldNames.toSet
    val kept = StructType(TokenBin.schema.fields.filter(f => names(f.name)))
    // empty projection (count(*)) keeps `key` — rows enumerate from the
    // idx sidecar alone, the .bin is never opened
    required = if (kept.isEmpty)
      StructType(TokenBin.schema.fields.filter(_.name == "key")) else kept
  }
  override def build(): Scan = new TokenBinScan(path, required, shardsOpt)
}

case class TokenBinPartition(shard: Int, idxFile: String, binFile: String)
    extends InputPartition

class TokenBinScan(path: String, required: StructType,
                   shardsOpt: Option[String] = None) extends Scan with Batch {
  private lazy val hadoopConf =
    SparkSession.active.sessionState.newHadoopConf()

  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  // `.option("shards", "0,3,8-11")` — the dataloader-rank read: a worker
  // scans ONLY its assigned shard numbers (see TokenBin.assignShards);
  // partition pruning at plan time, unlisted shards' files never open
  private def shardFilter: Option[Set[Int]] = shardsOpt.map { s =>
    s.split(",").filter(_.nonEmpty).flatMap { tok =>
      tok.split("-", 2) match {
        case Array(a, b) => (a.trim.toInt to b.trim.toInt).toSet
        case Array(a)    => Set(a.trim.toInt)
      }
    }.toSet
  }

  override def planInputPartitions(): Array[InputPartition] = {
    val fs = new Path(path).getFileSystem(hadoopConf)
    // the shard INVENTORY comes from the manifests, not a directory glob:
    // the commit marker is also the authoritative shard list, so data
    // reads are exact-path GETs. On an object store whose LIST lags its
    // writes, a glob could silently drop a shard the manifest already
    // committed — keying off the manifest makes a committed directory's
    // read torn-proof (directory DISCOVERY — epoch-*/manifest.json in
    // TokenBin.committedDirs — still lists, so a lagged epoch appears
    // late but always whole). Crashed-root refusal rides committedDirs
    // inside readShardInfos, unchanged.
    val infos = TokenBin.readShardInfos(fs, path)
    require(infos.nonEmpty, s"tokenbin: no committed shards at $path")
    val keep = shardFilter
    infos.sortBy(i => (i.dir, i.shard)).flatMap { i =>
      if (keep.forall(_.contains(i.shard)))
        Some(TokenBinPartition(i.shard,
          new Path(i.dir, f"shard-${i.shard}%05d.idx").toString,
          new Path(i.dir, f"shard-${i.shard}%05d.bin").toString): InputPartition)
      else None
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val conf = new SerializableConfiguration(hadoopConf)
    val fields = required.fieldNames
    new PartitionReaderFactory {
      override def createReader(p: InputPartition): PartitionReader[InternalRow] =
        new TokenBinPartitionReader(p.asInstanceOf[TokenBinPartition], fields, conf)
      // shards decode straight into column vectors: the .bin is already a
      // flat columnar token run, so the batch path skips per-row
      // GenericInternalRow/GenericArrayData allocation entirely (the
      // ZarrColumnarReader pattern)
      override def supportColumnarReads(p: InputPartition): Boolean = true
      override def createColumnarReader(p: InputPartition)
          : PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] =
        new TokenBinColumnarReader(p.asInstanceOf[TokenBinPartition], fields, conf)
    }
  }
}

/** Columnar shard reader: batches of up to 4096 sequences (capped at ~4M
  * tokens), each filled in one tight pass — shard/key vectors from the
  * idx arrays, the ids child vector decoded from one contiguous byte read
  * of the token run (entries are in file order; zero seeks).
  */
class TokenBinColumnarReader(part: TokenBinPartition, fields: Array[String],
                             conf: SerializableConfiguration)
    extends PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] {
  import org.apache.spark.sql.execution.vectorized.OnHeapColumnVector
  import org.apache.spark.sql.vectorized.{ColumnarBatch, ColumnVector}

  private val wantIds = fields.contains("ids")
  private val fs = new Path(part.idxFile).getFileSystem(conf.value)
  private val (dtype, keys, lens) = TokenBin.parseIdx(fs, part.idxFile)
  private val bin: java.io.DataInputStream =
    if (wantIds) new java.io.DataInputStream(new java.io.BufferedInputStream(
      fs.open(new Path(part.binFile)), 1 << 16))
    else null

  private val MaxRows = 4096
  private val MaxTokens = 4 << 20
  private var pos = 0
  private var batch: ColumnarBatch = _

  override def next(): Boolean = {
    if (batch != null) { batch.close(); batch = null }
    if (pos >= keys.length) return false
    // batch extent: up to MaxRows sequences, bounded by MaxTokens ids
    // (a single oversized sequence still forms its own batch)
    var count = 0
    var toks = 0L
    while (pos + count < keys.length && count < MaxRows &&
      (count == 0 || toks + lens(pos + count) <= MaxTokens)) {
      toks += lens(pos + count); count += 1
    }
    val vectors: Array[ColumnVector] = fields.map {
      case "shard" =>
        val v = new OnHeapColumnVector(count, IntegerType)
        v.putInts(0, count, part.shard)
        v: ColumnVector
      case "key" =>
        val v = new OnHeapColumnVector(count, LongType)
        var i = 0
        while (i < count) { v.putLong(i, keys(pos + i)); i += 1 }
        v: ColumnVector
      case "ids" =>
        val v = new OnHeapColumnVector(count,
          ArrayType(IntegerType, containsNull = false))
        var off = 0
        var i = 0
        while (i < count) {
          val len = lens(pos + i).toInt
          v.putArray(i, off, len); off += len
          i += 1
        }
        val child = v.arrayData()
        child.reserve(off)
        val w = TokenBin.dtypeBytes(dtype)
        val bytes = new Array[Byte](off * w)
        bin.readFully(bytes)
        val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
        var j = 0
        if (dtype == TokenBin.DtypeUint16)
          while (j < off) { child.putInt(j, bb.getShort(j * 2) & 0xFFFF); j += 1 }
        else
          while (j < off) { child.putInt(j, bb.getInt(j * 4)); j += 1 }
        v: ColumnVector
      case other =>
        throw new IllegalArgumentException(s"tokenbin: unknown column $other")
    }
    pos += count
    batch = new ColumnarBatch(vectors, count)
    true
  }

  override def get(): ColumnarBatch = batch

  override def close(): Unit = {
    if (batch != null) { batch.close(); batch = null }
    if (bin != null) bin.close()
  }
}

class TokenBinPartitionReader(part: TokenBinPartition, fields: Array[String],
                              conf: SerializableConfiguration)
    extends PartitionReader[InternalRow] {
  private val wantIds = fields.contains("ids")
  private val fs = new Path(part.idxFile).getFileSystem(conf.value)

  private val (dtype, keys, lens): (Int, Array[Long], Array[Long]) =
    TokenBin.parseIdx(fs, part.idxFile)

  // entries are in .bin file order, so a plain buffered stream walks the
  // token bytes with zero seeks
  private val bin: java.io.DataInputStream =
    if (wantIds) new java.io.DataInputStream(new java.io.BufferedInputStream(
      fs.open(new Path(part.binFile)), 1 << 16))
    else null

  private var i = -1
  override def next(): Boolean = { i += 1; i < keys.length }

  override def get(): InternalRow = {
    val row = new GenericInternalRow(fields.length)
    var f = 0
    while (f < fields.length) {
      fields(f) match {
        case "shard" => row.setInt(f, part.shard)
        case "key"   => row.setLong(f, keys(i))
        case "ids" =>
          val n = lens(i).toInt
          val w = TokenBin.dtypeBytes(dtype)
          val bytes = new Array[Byte](n * w)
          bin.readFully(bytes)
          val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
          val ids = new Array[Int](n)
          var j = 0
          if (dtype == TokenBin.DtypeUint16)
            while (j < n) { ids(j) = bb.getShort(j * 2) & 0xFFFF; j += 1 }
          else
            while (j < n) { ids(j) = bb.getInt(j * 4); j += 1 }
          row.update(f, new GenericArrayData(ids))
        case other =>
          throw new IllegalArgumentException(s"tokenbin: unknown column $other")
      }
      f += 1
    }
    row
  }

  override def close(): Unit = if (bin != null) bin.close()
}
