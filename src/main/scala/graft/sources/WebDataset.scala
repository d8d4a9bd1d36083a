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
  * O(shards) driver state). Reads go through Spark's `binaryFile`
  * source: ONE whole-file read per shard — sound because a WebDataset
  * shard is SIZED to be a sequential-read unit by the format's own
  * contract (typically 0.1–1 GB; pick `shards` accordingly).
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
    // overwrite semantics: a re-run with fewer shards must not leave
    // stale higher-numbered archives for the reader to union in
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
    rows.foreachPartition { (it: Iterator[Row]) =>
      val cfs = new Path(outDir).getFileSystem(conf.value)
      var cur = -1
      var out: DataOutputStream = null
      def closeShard(): Unit = if (cur >= 0) {
        out.write(new Array[Byte](2 * BlockSize)) // ustar end marker
        out.close(); out = null; cur = -1
      }
      it.foreach { r =>
        val s = r.getInt(0)
        if (s != cur) {
          closeShard()
          cur = s
          out = new DataOutputStream(new BufferedOutputStream(
            cfs.create(new Path(outDir, f"shard-$s%05d.tar"), true), 1 << 16))
        }
        val key = r.getString(1)
        var wrote = false
        r.getSeq[Row](2).foreach { m =>
          val data = m.getAs[Array[Byte]]("data")
          if (data != null) {
            writeMember(out, s"$key.${m.getString(0)}", data)
            memberAcc.add(1L)
            wrote = true
          }
        }
        if (wrote) sampleAcc.add(1L)
      }
      closeShard()
    }
    (sampleAcc.value, memberAcc.value)
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
    * (shard, key, ext, content). Whole-shard reads via `binaryFile` —
    * the format's own sequential-read contract (see the object doc). */
  def read(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // pathGlobFilter instead of a glob-in-path: DataSource.resolveRelation
    // stat()s a literal path first and logs a spurious FileNotFound for
    // the glob form before falling back
    spark.read.format("binaryFile").option("pathGlobFilter", "shard-*.tar")
      .load(dir)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (path, bytes) =>
        val shard = path.split("/").last
          .stripPrefix("shard-").stripSuffix(".tar").toInt
        parseTar(bytes).map { case (name, data) =>
          val dot = name.lastIndexOf('.')
          (shard, name.substring(0, dot), name.substring(dot + 1), data)
        }
      }
      .toDF("shard", "key", "ext", "content")
  }
}
