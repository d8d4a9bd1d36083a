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
  *  - C order, little-endian, `zlib` or `null` compressor (blosc needs a
  *    native lib the JVM doesn't ship)
  *  - chunking along the row (first) axis; trailing axes single-chunk
  */
final case class ZarrArrayMeta(
    name: String,
    shape: Seq[Long],
    chunks: Seq[Int],
    dtype: String,
    compressor: Option[String], // None = raw, Some("zlib")
    fillValue: Double) {

  def rows: Long = shape.head
  def rowChunk: Int = chunks.head
  def numRowChunks: Int =
    if (rows == 0) 0 else ((rows + rowChunk - 1) / rowChunk).toInt
  /** values per row = product of trailing dims */
  def rowWidth: Long = shape.drop(1).product.max(1L)

  def elementType: DataType = ZarrMeta.dtypeToSpark(dtype)
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
    case s: StructType if s.fieldNames.sameElements(Array("re", "im")) => "<c16"
    case other => throw new UnsupportedOperationException(
      s"cannot write $other to zarr (numeric/bool/complex(re,im) only)")
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

  /** Parse one array's .zarray (+ .zattrs for dimension names). */
  def readArrayMeta(conf: Configuration, arrayDir: Path): ZarrArrayMeta = {
    val bytes = readFile(conf, new Path(arrayDir, ".zarray")).getOrElse(
      throw new IllegalArgumentException(s"no .zarray under $arrayDir"))
    val node = mapper.readTree(new String(bytes, "UTF-8"))
    val shape = node.get("shape").elements().asScala.map(_.asLong()).toSeq
    val chunks = node.get("chunks").elements().asScala.map(_.asInt()).toSeq
    val dtype = node.get("dtype").asText()
    val order = if (node.has("order")) node.get("order").asText() else "C"
    require(order == "C", s"zarr order '$order' unsupported (C only)")
    val comp = Option(node.get("compressor")).filterNot(_.isNull).map { c =>
      val id = c.get("id").asText()
      require(id == "zlib", s"zarr compressor '$id' unsupported (zlib/null only)")
      id
    }
    val fill = Option(node.get("fill_value")).filterNot(_.isNull)
      .map(_.asDouble(0d)).getOrElse(0d)
    shape.drop(1).zip(chunks.drop(1)).foreach { case (s, c) =>
      require(c.toLong == s,
        s"${arrayDir.getName}: non-row dim chunked ($c of $s) — row-axis chunking only")
    }
    ZarrArrayMeta(arrayDir.getName, shape, chunks, dtype, comp, fill)
  }

  /** All arrays of a zarr group, sorted by name. */
  def readGroup(conf: Configuration, groupDir: Path): Seq[ZarrArrayMeta] = {
    val fs = groupDir.getFileSystem(conf)
    require(fs.exists(new Path(groupDir, ".zgroup")), s"no .zgroup at $groupDir")
    fs.listStatus(groupDir).filter(_.isDirectory)
      .filter(st => fs.exists(new Path(st.getPath, ".zarray")))
      .map(st => readArrayMeta(conf, st.getPath))
      .sortBy(_.name).toSeq
  }

  /** Decompressed bytes of row-chunk `i`, or None if the file is absent
    * (zarr semantics: missing chunk = all fill_value).
    */
  def readChunk(conf: Configuration, groupDir: Path, m: ZarrArrayMeta,
                i: Int): Option[Array[Byte]] =
    readFile(conf, new Path(new Path(groupDir, m.name), m.chunkFile(i))).map {
      raw =>
        m.compressor match {
          case Some("zlib") =>
            val inf = new java.util.zip.Inflater()
            inf.setInput(raw)
            val expected = m.rowChunk * m.rowWidth.toInt * bytesPerElement(m.dtype)
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
          case _ => raw
        }
    }
}
