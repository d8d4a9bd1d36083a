package graft.sources.zarr

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/** Zarr v2 store metadata (public spec: zarr.readthedocs.io — v2 storage
  * layout; the reference writes one zarr array per table column with
  * xarray `_ARRAY_DIMENSIONS` attrs, row as the first axis:
  * /root/reference/daskms/experimental/zarr/__init__.py:61-124).
  *
  * Supported subset (documented in README):
  *  - numeric/bool dtypes `<i2 <i4 <i8 <f4 <f8 |b1 |i1 |u1`, plus complex
  *    `<c8 <c16` mapped to the engine's struct(re, im) convention
  *  - C order, little-endian; `null`, `zlib`, `zstd`, `gzip`, `lz4`, or
  *    `blosc` compressor (blosc decoded by [[Blosc]] — lz4/snappy/zlib/
  *    zstd inner codecs, byte-shuffle; blosclz/bitshuffle raise with the
  *    codec named)
  *  - chunking along the row (first) axis; trailing axes single-chunk
  */
final case class ZarrArrayMeta(
    name: String,
    shape: Seq[Long],
    chunks: Seq[Int],
    dtype: String,
    compressor: Option[String], // None = raw, Some("zlib")
    fillValue: Double,
    objectCodec: Boolean = false) { // dtype "|O" behind a numcodecs json2 filter

  def rows: Long = shape.head
  def rowChunk: Int = chunks.head
  def numRowChunks: Int =
    if (rows == 0) 0 else ((rows + rowChunk - 1) / rowChunk).toInt
  /** values per row = product of trailing dims */
  def rowWidth: Long = shape.drop(1).product.max(1L)

  def elementType: DataType =
    if (objectCodec) StringType else ZarrMeta.dtypeToSpark(dtype)
  def sparkType: DataType =
    shape.drop(1).foldRight(elementType)((_, t) => ArrayType(t, containsNull = false))

  /** chunk file name for row-chunk i: "i", "i.0", "i.0.0", ... */
  def chunkFile(i: Int): String =
    (i.toString +: shape.drop(1).map(_ => "0")).mkString(".")
}

object ZarrMeta {

  private val mapper = new ObjectMapper()

  def dtypeToSpark(dtype: String): DataType = dtype match {
    case "<i8" => LongType
    case "<i4" => IntegerType
    case "<i2" => ShortType
    case "|i1" | "|u1" => ByteType
    case "<f8" => DoubleType
    case "<f4" => FloatType
    case "|b1" => BooleanType
    case "<c16" | "<c8" => StructType(Seq(
      StructField("re", DoubleType, nullable = false),
      StructField("im", DoubleType, nullable = false)))
    case other => throw new UnsupportedOperationException(
      s"zarr dtype '$other' not supported (numeric/bool/complex little-endian only)")
  }

  def sparkToDtype(t: DataType): String = t match {
    case LongType => "<i8"
    case IntegerType => "<i4"
    case ShortType => "<i2"
    case ByteType => "|i1"
    case DoubleType => "<f8"
    case FloatType => "<f4"
    case BooleanType => "|b1"
    case StringType => "|O" // via the numcodecs json2 object codec
    case s: StructType if s.fieldNames.sameElements(Array("re", "im")) =>
      // fail driver-side with a clear message: the serializer calls
      // getDouble, so float re/im would die mid-job with a ClassCastException
      require(s.fields.forall(_.dataType == DoubleType),
        s"complex zarr column must be struct(re double, im double), got $s " +
          "— cast the fields to double before writing")
      "<c16"
    case other => throw new UnsupportedOperationException(
      s"cannot write $other to zarr (numeric/bool/complex(re,im)/string only)")
  }

  def bytesPerElement(dtype: String): Int = dtype match {
    case "<i8" | "<f8" | "<c8" => 8
    case "<i4" | "<f4" => 4
    case "<i2" => 2
    case "|i1" | "|u1" | "|b1" => 1
    case "<c16" => 16
  }

  private def readFile(conf: Configuration, p: Path): Option[Array[Byte]] = {
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try {
        val len = fs.getFileStatus(p).getLen.toInt
        val buf = new Array[Byte](len)
        in.readFully(0, buf)
        Some(buf)
      } finally in.close()
    }
  }

  /** Parse one array's .zarray JSON node. */
  def parseArrayMeta(name: String, node: com.fasterxml.jackson.databind.JsonNode)
  : ZarrArrayMeta = {
    val shape = node.get("shape").elements().asScala.map(_.asLong()).toSeq
    val chunks = node.get("chunks").elements().asScala.map(_.asInt()).toSeq
    val dtype = node.get("dtype").asText()
    val order = if (node.has("order")) node.get("order").asText() else "C"
    // F layout equals C for 1-D arrays, so only reject F on true tensors
    require(order == "C" || (order == "F" && shape.length <= 1),
      s"zarr order '$order' unsupported for ${shape.length}-d arrays (C only)")
    val comp = Option(node.get("compressor")).filterNot(_.isNull).map { c =>
      val id = c.get("id").asText()
      require(Set("zlib", "blosc", "zstd", "gzip", "lz4").contains(id),
        s"zarr compressor '$id' unsupported (blosc/zlib/zstd/gzip/lz4/null only)")
      // blosc's inner codec (cname) and shuffle mode are re-read from each
      // chunk's own frame header, so no more of the JSON matters here
      id
    }
    // object (string) arrays carry a numcodecs object codec as the first
    // filter (ref: daskms/experimental/zarr/__init__.py:75 numcodecs.JSON());
    // any other filter chain is unsupported
    val filterIds = Option(node.get("filters")).filterNot(_.isNull)
      .map(_.elements().asScala.map(_.get("id").asText()).toSeq)
      .getOrElse(Nil)
    val isObject = dtype == "|O"
    if (isObject)
      require(filterIds == Seq("json2"),
        s"$name: object dtype needs the numcodecs json2 filter, got $filterIds")
    else
      require(filterIds.isEmpty, s"$name: zarr filters $filterIds unsupported")
    // zarr v2 encodes non-finite float fills as the JSON strings "NaN" /
    // "Infinity" / "-Infinity" (zarr-python writes fill_value: "NaN" for
    // float arrays by default); object-array fills are codec-internal and
    // ignored here
    val fill = Option(node.get("fill_value")).filterNot(_.isNull).map { f =>
      if (f.isNumber) f.asDouble(0d)
      else if (isObject) 0d
      else f.asText() match {
        case "NaN" => Double.NaN
        case "Infinity" => Double.PositiveInfinity
        case "-Infinity" => Double.NegativeInfinity
        case other =>
          throw new IllegalArgumentException(
            s"$name: unsupported fill_value '$other'")
      }
    }.getOrElse(0d)
    shape.drop(1).zip(chunks.drop(1)).foreach { case (s, c) =>
      require(c.toLong == s,
        s"$name: non-row dim chunked ($c of $s) — row-axis chunking only")
    }
    // multi-dim object arrays read fine (json2 items are stored flat in
    // C order, exactly how the row reader indexes them)
    ZarrArrayMeta(name, shape, chunks, dtype, comp, fill, objectCodec = isObject)
  }

  /** Parse one array's .zarray (+ .zattrs for dimension names). */
  def readArrayMeta(conf: Configuration, arrayDir: Path): ZarrArrayMeta = {
    val bytes = readFile(conf, new Path(arrayDir, ".zarray")).getOrElse(
      throw new IllegalArgumentException(s"no .zarray under $arrayDir"))
    parseArrayMeta(arrayDir.getName, mapper.readTree(new String(bytes, "UTF-8")))
  }

  /** All arrays of a zarr group, sorted by name.
    *
    * Prefers consolidated metadata (`.zmetadata`, one read) over the
    * N+1 sidecar walk — on object stores a 100-column group opens with a
    * single GET instead of a LIST + 100 `.zarray` reads (the reference
    * consolidates by default: daskms/experimental/zarr/__init__.py:355-360).
    */
  def readGroup(conf: Configuration, groupDir: Path): Seq[ZarrArrayMeta] = {
    readFile(conf, new Path(groupDir, ".zmetadata")) match {
      case Some(bytes) =>
        val root = mapper.readTree(new String(bytes, "UTF-8"))
        val meta = root.get("metadata")
        require(meta != null, s"malformed .zmetadata at $groupDir")
        meta.properties().asScala.toSeq
          .filter(_.getKey.endsWith("/.zarray"))
          .map(e => parseArrayMeta(e.getKey.stripSuffix("/.zarray"), e.getValue))
          .sortBy(_.name)
      case None =>
        val fs = groupDir.getFileSystem(conf)
        require(fs.exists(new Path(groupDir, ".zgroup")), s"no .zgroup at $groupDir")
        fs.listStatus(groupDir).filter(_.isDirectory)
          .filter(st => fs.exists(new Path(st.getPath, ".zarray")))
          .map(st => readArrayMeta(conf, st.getPath))
          .sortBy(_.name).toSeq
    }
  }

  /** Decode a numcodecs json2 object chunk: UTF-8 JSON of
    * `[item0, ..., itemN-1, dtypeStr, [shape...]]` (the trailing two entries
    * are the codec's dtype/shape trailer). Null items read as null.
    */
  def decodeJsonChunk(bytes: Array[Byte]): Array[String] = {
    val node = mapper.readTree(new String(bytes, "UTF-8"))
    require(node.isArray && node.size >= 2, "malformed json2 object chunk")
    Array.tabulate(node.size - 2) { i =>
      val it = node.get(i)
      if (it == null || it.isNull) null else it.asText()
    }
  }

  /** Uncompressed chunk byte size — Long to survive wide rows; callers
    * enforce zarr's 2 GiB chunk limit before allocating.
    */
  def chunkByteSize(m: ZarrArrayMeta): Long =
    m.rowChunk.toLong * m.rowWidth * bytesPerElement(m.dtype)

  /** Decompressed bytes of row-chunk `i`, or None if the file is absent
    * (zarr semantics: missing chunk = all fill_value).
    */
  def readChunk(conf: Configuration, groupDir: Path, m: ZarrArrayMeta,
                i: Int): Option[Array[Byte]] =
    readFile(conf, new Path(new Path(groupDir, m.name), m.chunkFile(i))).map {
      raw =>
        m.compressor match {
          case Some("blosc") =>
            // frame header self-describes inner codec/shuffle/sizes; for
            // fixed-width dtypes validate the decoded size like zlib below
            val out = Blosc.decompress(raw, s"${m.name}/${m.chunkFile(i)}")
            if (!m.objectCodec) {
              val expectedL = chunkByteSize(m)
              require(expectedL < (1L << 31),
                s"zarr chunk ${m.name}/${m.chunkFile(i)} is $expectedL B — over " +
                  "the 2 GiB zarr chunk limit; rechunk with a smaller rowChunk")
              if (out.length != expectedL.toInt)
                throw new java.io.IOException(
                  s"blosc chunk ${m.name}/${m.chunkFile(i)} decompressed to " +
                    s"${out.length} bytes, expected $expectedL")
            }
            out
          case Some("zlib") if m.objectCodec =>
            // variable-length (JSON) payload: inflate into a growing buffer
            inflateAll(raw, s"${m.name}/${m.chunkFile(i)}")
          case Some("zlib") =>
            val inf = new java.util.zip.Inflater()
            inf.setInput(raw)
            val expectedL = chunkByteSize(m)
            require(expectedL < (1L << 31),
              s"zarr chunk ${m.name}/${m.chunkFile(i)} is $expectedL B — over " +
                "the 2 GiB zarr chunk limit; rechunk with a smaller rowChunk")
            val expected = expectedL.toInt
            val out = new Array[Byte](expected)
            var off = 0
            while (!inf.finished() && off < out.length) {
              val n = inf.inflate(out, off, out.length - off)
              // inflate()==0 without finished() means the stream is
              // truncated/corrupt (needsInput/needsDictionary) — fail the
              // task instead of spinning forever
              if (n == 0 && !inf.finished()) {
                inf.end()
                throw new java.io.IOException(
                  s"truncated/corrupt zlib chunk ${m.name}/${m.chunkFile(i)} " +
                    s"(decompressed $off of $expected bytes)")
              }
              off += n
            }
            inf.end()
            if (off != expected)
              throw new java.io.IOException(
                s"zlib chunk ${m.name}/${m.chunkFile(i)} decompressed to $off " +
                  s"bytes, expected $expected (zarr v2 chunks are full-size)")
            out
          case Some("zstd") =>
            // numcodecs.Zstd writes single frames with the content size in
            // the frame header, so the exact output size is known up front
            val what = s"${m.name}/${m.chunkFile(i)}"
            val sz = com.github.luben.zstd.Zstd.getFrameContentSize(raw)
            if (sz < 0 || sz >= (1L << 31))
              throw new java.io.IOException(
                s"zstd chunk $what: missing/oversized frame content size ($sz)")
            val out = new Array[Byte](sz.toInt)
            val n = com.github.luben.zstd.Zstd.decompressByteArray(
              out, 0, out.length, raw, 0, raw.length)
            if (com.github.luben.zstd.Zstd.isError(n) || n != sz)
              throw new java.io.IOException(s"zstd chunk $what: " +
                com.github.luben.zstd.Zstd.getErrorName(n))
            checkFixedSize(m, i, out.length)
            out
          case Some("gzip") =>
            // numcodecs.GZip: standard gzip stream (variable-length safe)
            val what = s"${m.name}/${m.chunkFile(i)}"
            val in = new java.util.zip.GZIPInputStream(
              new java.io.ByteArrayInputStream(raw))
            val out = new java.io.ByteArrayOutputStream(raw.length * 4 + 64)
            try {
              val buf = new Array[Byte](65536)
              var n = in.read(buf)
              while (n > 0) { out.write(buf, 0, n); n = in.read(buf) }
            } catch {
              case e: java.io.IOException =>
                throw new java.io.IOException(s"corrupt gzip chunk $what", e)
            } finally in.close()
            val bytes = out.toByteArray
            checkFixedSize(m, i, bytes.length)
            bytes
          case Some("lz4") =>
            // numcodecs.LZ4: int32 LE uncompressed length + one lz4 block
            val what = s"${m.name}/${m.chunkFile(i)}"
            if (raw.length < 4)
              throw new java.io.IOException(s"truncated lz4 chunk $what")
            val expected = (raw(0) & 0xff) | ((raw(1) & 0xff) << 8) |
              ((raw(2) & 0xff) << 16) | ((raw(3) & 0xff) << 24)
            if (expected < 0)
              throw new java.io.IOException(
                s"lz4 chunk $what: negative length prefix $expected")
            val out = new Array[Byte](expected)
            val n = Blosc.lz4Decompress(raw, 4, raw.length - 4, out, 0, expected)
            if (n != expected)
              throw new java.io.IOException(
                s"lz4 chunk $what decoded $n of $expected bytes")
            checkFixedSize(m, i, out.length)
            out
          case _ => raw
        }
    }

  /** Fixed-width chunks must decode to exactly the full chunk size (zarr
    * v2 stores whole chunks, fill-padded at the edge).
    */
  private def checkFixedSize(m: ZarrArrayMeta, i: Int, got: Int): Unit =
    if (!m.objectCodec) {
      val expectedL = chunkByteSize(m)
      require(expectedL < (1L << 31),
        s"zarr chunk ${m.name}/${m.chunkFile(i)} is $expectedL B — over " +
          "the 2 GiB zarr chunk limit; rechunk with a smaller rowChunk")
      if (got != expectedL.toInt)
        throw new java.io.IOException(
          s"chunk ${m.name}/${m.chunkFile(i)} decompressed to $got bytes, " +
            s"expected $expectedL")
    }

  private def inflateAll(raw: Array[Byte], what: String): Array[Byte] = {
    val inf = new java.util.zip.Inflater()
    inf.setInput(raw)
    val out = new java.io.ByteArrayOutputStream(raw.length * 4 + 64)
    val buf = new Array[Byte](65536)
    while (!inf.finished()) {
      val n = inf.inflate(buf)
      if (n == 0 && !inf.finished()) {
        inf.end()
        throw new java.io.IOException(s"truncated/corrupt zlib chunk $what")
      }
      out.write(buf, 0, n)
    }
    inf.end()
    out.toByteArray
  }
}
