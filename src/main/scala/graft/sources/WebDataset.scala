package graft.sources

import java.io.{BufferedOutputStream, DataOutputStream}
import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.SerializableConfiguration

/** WebDataset-style tar shards — the multimodal sibling of
  * [[TokenBin]]: each SAMPLE is a group of same-stem tar members
  * (`<key>.txt`, `<key>.json`, `<key>.jpg`, ...), shards are plain
  * POSIX ustar archives a training dataloader streams sequentially.
  * The format is an open convention (webdataset/tarp); the writer here
  * emits byte-deterministic archives: mtime 0, uid/gid 0, mode 0644,
  * members in (key, extension) order, shard assignment by key hash —
  * re-running the same write yields bit-identical shards (verified by
  * md5 in the spec), which makes shard-level caching and diffing sound.
  *
  * Scale shape: ONE hash repartition on the shard id + an in-partition
  * sort, then each task streams its shard(s) through a tar encoder —
  * the TokenBin write discipline (contiguous runs, O(members-per-
  * sample) task state, accumulator-collected per-shard stats as
  * O(shards) driver state). Reads plan ONE task per manifest entry,
  * each streaming its whole archive — sound because a WebDataset
  * shard is SIZED to be a sequential-read unit by the format's own
  * contract (typically 0.1–1 GB; pick `shards` accordingly).
  *
  * Durability: [[write]] bypasses Spark's committer (raw `fs.create`
  * streams), so its commit marker is `manifest.json` — per-shard md5 /
  * sample / member counts, written as the atomic LAST step (and deleted
  * as the FIRST step of a re-run, so no crash window ever pairs a live
  * manifest with partial shards). [[read]] takes its shard INVENTORY
  * from the manifest, not a directory glob: a crashed write (shards
  * present, manifest missing) REFUSES loudly instead of parsing a
  * partial shard set into a training run, and on a LIST-lagged object
  * store a committed shard still unlisted is read anyway by exact-path
  * GET — the TokenBin discipline (`TokenBin.committedDirs`).
  */
object WebDataset {

  private val BlockSize = 512

  /** One ustar header block for a regular file. Deterministic: mtime 0,
    * uid/gid 0, mode 0644. Names longer than 100 bytes are refused
    * (WebDataset keys are short stems by convention — refusing beats
    * silently truncating a sample key).
    */
  private def ustarHeader(name: String, size: Long): Array[Byte] = {
    val nameB = name.getBytes(StandardCharsets.UTF_8)
    require(nameB.length <= 100,
      s"webdataset: member name exceeds 100 bytes: $name")
    val h = new Array[Byte](BlockSize)
    def putOctal(value: Long, off: Int, len: Int): Unit = {
      val s = java.lang.Long.toOctalString(value)
      val padded = ("0" * (len - 1 - s.length)) + s
      require(padded.length == len - 1,
        s"webdataset: value $value overflows a $len-byte octal field")
      var i = 0
      while (i < len - 1) { h(off + i) = padded.charAt(i).toByte; i += 1 }
      h(off + len - 1) = 0
    }
    System.arraycopy(nameB, 0, h, 0, nameB.length)
    putOctal(420, 100, 8)          // mode 0644
    putOctal(0, 108, 8)            // uid
    putOctal(0, 116, 8)            // gid
    putOctal(size, 124, 12)        // size
    putOctal(0, 136, 12)           // mtime: fixed for determinism
    h(156) = '0'                   // typeflag: regular file
    System.arraycopy("ustar".getBytes(StandardCharsets.US_ASCII), 0, h, 257, 5)
    h(262) = 0
    h(263) = '0'; h(264) = '0'     // version "00"
    // checksum: field treated as 8 spaces, then written octal + NUL + ' '
    java.util.Arrays.fill(h, 148, 156, ' '.toByte)
    var sum = 0L
    var i = 0
    while (i < BlockSize) { sum += h(i) & 0xFF; i += 1 }
    val cs = java.lang.Long.toOctalString(sum)
    val padded = ("0" * (6 - cs.length)) + cs
    i = 0
    while (i < 6) { h(148 + i) = padded.charAt(i).toByte; i += 1 }
    h(154) = 0
    h(155) = ' '
    h
  }

  private def writeMember(out: DataOutputStream, name: String,
                          data: Array[Byte]): Unit = {
    out.write(ustarHeader(name, data.length.toLong))
    out.write(data)
    val pad = (BlockSize - (data.length % BlockSize)) % BlockSize
    if (pad > 0) out.write(new Array[Byte](pad))
  }

  /** Write `df` as WebDataset tar shards.
    *
    * @param members (column, extension) pairs — each non-null value
    *                becomes the tar member `<key>.<extension>` (string
    *                columns encode UTF-8; binary columns write as-is;
    *                null members are skipped, so optional modalities
    *                cost nothing)
    * @return (samples, members) written
    */
  def write(df: DataFrame, keyCol: String,
            members: Seq[(String, String)], outDir: String,
            shards: Int): (Long, Long) = {
    require(shards > 0, s"webdataset: shards must be positive: $shards")
    require(members.nonEmpty, "webdataset: at least one member column")
    require(members.map(_._2).distinct.size == members.size,
      s"webdataset: duplicate member extensions: ${members.map(_._2)}")
    val spark = df.sparkSession
    // a duplicate (or null) key would silently write several same-stem
    // members into one archive and corrupt same-stem sample grouping on
    // read — refuse loudly, like the long-name and extension guards
    val ks = df.select(col(keyCol).cast("string").as("k"))
      .agg(count(lit(1)).as("n"), count(col("k")).as("nn"),
        countDistinct(col("k")).as("nd")).head()
    require(ks.getLong(1) == ks.getLong(0),
      s"webdataset: ${ks.getLong(0) - ks.getLong(1)} null keys")
    require(ks.getLong(2) == ks.getLong(0),
      s"webdataset: duplicate keys (${ks.getLong(0)} rows, " +
        s"${ks.getLong(2)} distinct)")
    val conf = new SerializableConfiguration(spark.sessionState.newHadoopConf())
    val root = new Path(outDir)
    val rootFs = root.getFileSystem(conf.value)
    rootFs.mkdirs(root)
    // overwrite semantics, manifest FIRST: once the old commit marker is
    // gone the directory is "uncommitted" and every crash window below
    // (mid-delete, mid-stream) leaves a state read() refuses — never an
    // old manifest describing new or partial shards. Then clear stale
    // archives so a re-run with fewer shards leaves nothing to union in.
    rootFs.delete(new Path(root, "manifest.json"), false)
    rootFs.delete(new Path(root, "manifest.json.tmp"), false)
    Option(rootFs.globStatus(new Path(root, "shard-*.tar")))
      .getOrElse(Array()).foreach(st => rootFs.delete(st.getPath, false))
    val memberCols = members.map { case (c, ext) =>
      struct(lit(ext).as("ext"),
        (df.schema(c).dataType match {
          case org.apache.spark.sql.types.BinaryType => col(c)
          case _ => encode(col(c).cast("string"), "UTF-8")
        }).as("data"))
    }
    val rows = df.select(
        pmod(xxhash64(col(keyCol).cast("string")), lit(shards.toLong))
          .cast("int").as("shard"),
        col(keyCol).cast("string").as("key"),
        array(memberCols: _*).as("ms"))
      .repartition(shards, col("shard"))
      .sortWithinPartitions("shard", "key")
    val sampleAcc = spark.sparkContext.longAccumulator("webdataset.samples")
    val memberAcc = spark.sparkContext.longAccumulator("webdataset.members")
    // per-shard (md5, samples, members), the md5 computed ON the write
    // stream — O(shards) driver state for the manifest commit marker
    val shardAcc = spark.sparkContext
      .collectionAccumulator[(Int, String, Long, Long)]("webdataset.shards")
    rows.foreachPartition { (it: Iterator[Row]) =>
      val cfs = new Path(outDir).getFileSystem(conf.value)
      var cur = -1
      var out: DataOutputStream = null
      var dig: java.security.MessageDigest = null
      var nSamples = 0L
      var nMembers = 0L
      def closeShard(): Unit = if (cur >= 0) {
        out.write(new Array[Byte](2 * BlockSize)) // ustar end marker
        out.close()
        shardAcc.add((cur, dig.digest().map("%02x".format(_)).mkString,
          nSamples, nMembers))
        out = null; dig = null; cur = -1; nSamples = 0L; nMembers = 0L
      }
      it.foreach { r =>
        val s = r.getInt(0)
        if (s != cur) {
          closeShard()
          cur = s
          dig = java.security.MessageDigest.getInstance("MD5")
          out = new DataOutputStream(new BufferedOutputStream(
            new java.security.DigestOutputStream(
              cfs.create(new Path(outDir, f"shard-$s%05d.tar"), true), dig),
            1 << 16))
        }
        val key = r.getString(1)
        var wrote = false
        r.getSeq[Row](2).foreach { m =>
          val data = m.getAs[Array[Byte]]("data")
          if (data != null) {
            writeMember(out, s"$key.${m.getString(0)}", data)
            memberAcc.add(1L)
            nMembers += 1L
            wrote = true
          }
        }
        if (wrote) { sampleAcc.add(1L); nSamples += 1L }
      }
      closeShard()
    }
    // the commit marker, written LAST: a directory without it is a
    // crashed write and read()/verifyShards refuse it
    import scala.jdk.CollectionConverters._
    val shardList = shardAcc.value.asScala.sortBy(_._1)
      .map { case (s, m, ns, nm) =>
        s"""{"shard": $s, "md5": "$m", "samples": $ns, "members": $nm}""" }
      .mkString("[", ", ", "]")
    val manifest = s"""{"shards": $shards, """ +
      s""""total_samples": ${sampleAcc.value}, """ +
      s""""total_members": ${memberAcc.value}, "shard_list": $shardList}"""
    // the manifest itself must commit atomically: stream to a temp name,
    // then rename into place, so no crash window ever leaves a TRUNCATED
    // manifest.json that parses to a partial shard_list (readShardInfos
    // additionally cross-checks the entry sums against the totals)
    val tmpP = new Path(root, "manifest.json.tmp")
    val mOut = rootFs.create(tmpP, true)
    try mOut.write(manifest.getBytes(StandardCharsets.UTF_8)) finally mOut.close()
    require(rootFs.rename(tmpP, new Path(root, "manifest.json")),
      s"webdataset: manifest rename failed at $outDir")
    (sampleAcc.value, memberAcc.value)
  }

  /** One parsed per-shard manifest entry. */
  final case class ShardInfo(shard: Int, md5: String, samples: Long,
                             members: Long)

  private val ShardEntryRe =
    ("\\{\"shard\": (\\d+), \"md5\": \"([0-9a-f]{32})\", " +
      "\"samples\": (\\d+), \"members\": (\\d+)\\}").r

  /** Commit-marker audit + shard inventory: parse `manifest.json` (tiny
    * fixed-shape writer-controlled format — a regex parse keeps the
    * reader dependency-free, the TokenBin convention). A directory
    * holding shard archives WITHOUT a manifest is a crashed [[write]]
    * and is refused loudly — re-running the write (or deleting the
    * partial shards) is the only safe continuation.
    */
  private[sources] def readShardInfos(
      fs: org.apache.hadoop.fs.FileSystem, dir: String): Seq[ShardInfo] = {
    val root = new Path(dir)
    val manifestP = new Path(root, "manifest.json")
    if (!fs.exists(manifestP)) {
      val tars =
        Option(fs.globStatus(new Path(root, "shard-*.tar"))).getOrElse(Array())
      require(tars.isEmpty,
        s"webdataset: ${tars.length} shard file(s) at $dir have no " +
          "manifest.json — the write crashed before its manifest commit; " +
          "re-run the write or remove the partial shards")
      throw new IllegalArgumentException(
        s"webdataset: no manifest.json at $dir")
    }
    val in = fs.open(manifestP)
    val txt = try new String(in.readAllBytes(), StandardCharsets.UTF_8)
      finally in.close()
    val infos = ShardEntryRe.findAllMatchIn(txt).map(m =>
      ShardInfo(m.group(1).toInt, m.group(2), m.group(3).toLong,
        m.group(4).toLong)).toSeq
    // self-integrity: the totals were written from the SAME accumulators
    // as the per-shard entries, so a manifest whose entry sums disagree
    // (including zero parsed entries against nonzero totals) is torn or
    // corrupt — refuse instead of silently dropping shards
    def totalOf(field: String): Long =
      (s""""$field":\\s*(\\d+)""".r.findFirstMatchIn(txt) match {
        case Some(m) => m.group(1)
        case None => throw new IllegalArgumentException(
          s"webdataset: manifest.json at $dir is missing $field — " +
            "truncated or corrupt; re-run the write")
      }).toLong
    val (ts, tm) = (totalOf("total_samples"), totalOf("total_members"))
    require(infos.map(_.samples).sum == ts && infos.map(_.members).sum == tm,
      s"webdataset: manifest.json at $dir is internally inconsistent — " +
        s"shard_list sums (${infos.map(_.samples).sum} samples, " +
        s"${infos.map(_.members).sum} members) != recorded totals " +
        s"($ts, $tm); the manifest is torn or corrupt; re-run the write")
    infos
  }

  /** Deterministic balanced shard→worker assignment for `workers`
    * dataloader ranks: LPT greedy over the manifest's per-shard SAMPLE
    * counts (largest shard to the currently-lightest worker, ties by
    * worker id) — O(shards log shards) driver work, no data read. The
    * [[TokenBin.assignShards]] contract on the multimodal store.
    * Returns (worker, shard, samples) covering every shard once.
    */
  def assignShards(spark: SparkSession, dir: String, workers: Int): DataFrame = {
    require(workers > 0, s"webdataset: workers must be positive: $workers")
    val fs = new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())
    val infos = readShardInfos(fs, dir).sortBy(i => (-i.samples, i.shard))
    val loads = scala.collection.mutable.PriorityQueue.empty[(Long, Int)](
      Ordering.by(t => (-t._1, -t._2))) // head = lightest, ties -> lowest id
    (0 until workers).foreach(w => loads.enqueue((0L, w)))
    val rows = infos.map { i =>
      val (load, w) = loads.dequeue()
      loads.enqueue((load + i.samples, w))
      (w, i.shard, i.samples)
    }
    import spark.implicits._
    rows.toDF("worker", "shard", "samples")
  }

  /** Distributed integrity check: re-hash every shard archive and compare
    * with the manifest md5 recorded at write time — one task per shard,
    * driver state O(shards). Returns (shard, ok, expected, actual); a
    * missing/corrupt/truncated archive shows up as ok = false.
    */
  def verifyShards(spark: SparkSession, dir: String): DataFrame = {
    val conf = new SerializableConfiguration(spark.sessionState.newHadoopConf())
    val fs = new Path(dir).getFileSystem(conf.value)
    val expected: Seq[(Int, String)] =
      readShardInfos(fs, dir).map(i => (i.shard, i.md5))
    val spark2 = spark
    import spark2.implicits._
    spark.createDataset(expected).repartition(expected.size.max(1))
      .map { case (shard, want) =>
        val p = new Path(dir, f"shard-$shard%05d.tar")
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
        (shard, got == want, want, got)
      }
      .toDF("shard", "ok", "expected", "actual")
  }

  /** Parse one ustar archive into (name, bytes) members. Shared by
    * [[read]] and the format spec; strict about block structure. */
  private[graft] def parseTar(bytes: Array[Byte]): Seq[(String, Array[Byte])] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Array[Byte])]
    var off = 0
    def zeroBlock(o: Int): Boolean =
      (o until o + BlockSize).forall(i => bytes(i) == 0)
    while (off + BlockSize <= bytes.length && !zeroBlock(off)) {
      val nameEnd = (off until off + 100).find(bytes(_) == 0)
        .getOrElse(off + 100)
      val name = new String(bytes, off, nameEnd - off, StandardCharsets.UTF_8)
      val sizeStr = new String(bytes, off + 124, 12, StandardCharsets.US_ASCII)
        .takeWhile(c => c >= '0' && c <= '7')
      val size = java.lang.Long.parseLong(sizeStr, 8)
      require(new String(bytes, off + 257, 5,
          StandardCharsets.US_ASCII) == "ustar",
        s"webdataset: not a ustar member at offset $off")
      val data = java.util.Arrays.copyOfRange(bytes, off + BlockSize,
        off + BlockSize + size.toInt)
      out += ((name, data))
      val dataBlocks = ((size + BlockSize - 1) / BlockSize).toInt
      off += BlockSize * (1 + dataBlocks)
    }
    out.toSeq
  }

  /** Read a WebDataset shard directory back as one row per member:
    * (shard, key, ext, content). One task per shard, each streaming its
    * whole archive sequentially — sound because a WebDataset shard is
    * SIZED to be a sequential-read unit by the format's own contract.
    *
    * The shard inventory comes from `manifest.json`, not a listing: a
    * crashed write refuses loudly ([[readShardInfos]]), a stale archive
    * a dying re-run left behind is never unioned in (it is not in the
    * manifest), and on a LIST-lagged store every committed shard is read
    * by exact-path GET even before the listing surfaces it (Spark's
    * `binaryFile` source would not give that — its FileIndex LISTS even
    * explicitly-named files, so the manifest entries plan the tasks
    * directly, the TokenBin reader discipline). Each parsed archive's
    * member count is checked against the count its writer recorded — a
    * truncation that still parses (cut at a block boundary) refuses
    * instead of silently dropping trailing samples.
    */
  def read(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val conf = new SerializableConfiguration(spark.sessionState.newHadoopConf())
    val fs = new Path(dir).getFileSystem(conf.value)
    val entries: Seq[(Int, Long)] =
      readShardInfos(fs, dir).map(i => (i.shard, i.members))
    spark.createDataset(entries).repartition(entries.size.max(1))
      .flatMap { case (shard, expectedMembers) =>
        val p = new Path(dir, f"shard-$shard%05d.tar")
        val pfs = p.getFileSystem(conf.value)
        val in = pfs.open(p)
        val bytes = try in.readAllBytes() finally in.close()
        val members = parseTar(bytes)
        require(members.length.toLong == expectedMembers,
          s"webdataset: shard $shard parsed ${members.length} members " +
            s"but the manifest recorded $expectedMembers — truncated " +
            "or corrupt archive; run verifyShards and re-write")
        members.map { case (name, data) =>
          val dot = name.lastIndexOf('.')
          (shard, name.substring(0, dot), name.substring(dot + 1), data)
        }
      }
      .toDF("shard", "key", "ext", "content")
  }
}
