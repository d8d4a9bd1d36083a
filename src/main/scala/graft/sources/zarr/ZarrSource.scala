package graft.sources.zarr

import java.nio.{ByteBuffer, ByteOrder}
import java.util

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.util.SerializableConfiguration

import scala.jdk.CollectionConverters._

/** `spark.read.format("zarr").load(path)` — a DataSourceV2 reader for the
  * zarr v2 subset the reference writes (one array per column, row first
  * axis; ref: daskms/experimental/zarr/__init__.py:379-528).
  *
  * Spark-first scale design:
  *  - one InputPartition PER ROW-CHUNK → a 100 TB store parallelizes
  *    across the cluster exactly along its native chunk grid, no shuffle
  *  - column pruning is pushed into the scan: only the REQUESTED arrays'
  *    chunk files are opened (a 2-column projection of a 100-column store
  *    reads 2% of the bytes)
  */
class ZarrDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "zarr"

  private def path(options: CaseInsensitiveStringMap): String = {
    val p = Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException("zarr source needs a path"))
    p
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    // driver-side: the active session's Hadoop configuration, so non-local
    // filesystems (s3a/hdfs credentials etc.) resolve like any other source
    val conf = SparkSession.active.sessionState.newHadoopConf()
    val metas = ZarrMeta.readGroup(conf, new Path(path(options)))
    // object (string) columns are nullable: the json2 codec can carry nulls
    StructType(metas.map(m =>
      StructField(m.name, m.sparkType, nullable = m.objectCodec)))
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new ZarrTable(properties.get("path"), schema)
}

class ZarrTable(path: String, schema: StructType) extends Table with SupportsRead {
  override def name(): String = s"zarr:$path"
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ZarrScanBuilder(path, schema)
}

class ZarrScanBuilder(path: String, full: StructType)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = full
  override def pruneColumns(requiredSchema: StructType): Unit = {
    // preserve store column order; empty projection (count(*)) keeps one
    // cheap column so rows can still be enumerated
    val names = requiredSchema.fieldNames.toSet
    val kept = StructType(full.fields.filter(f => names.contains(f.name)))
    required = if (kept.isEmpty) StructType(full.fields.take(1)) else kept
  }
  override def build(): Scan = new ZarrScan(path, required)
}

/** One row-chunk of the store = one Spark partition. */
case class ZarrInputPartition(chunkIdx: Int, rowStart: Long, rowEnd: Long)
    extends InputPartition

class ZarrScan(path: String, required: StructType) extends Scan with Batch {
  // metadata is read ONCE on the driver with the session's Hadoop conf;
  // executors get the parsed metas + a serialized conf (no per-task
  // re-parsing of .zarray sidecars)
  private lazy val hadoopConf =
    SparkSession.active.sessionState.newHadoopConf()
  private lazy val metas: Seq[ZarrArrayMeta] =
    ZarrMeta.readGroup(hadoopConf, new Path(path))

  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    require(metas.nonEmpty, s"empty zarr group at $path")
    val rows = metas.head.rows
    require(metas.forall(_.rows == rows),
      s"zarr arrays disagree on row count at $path")
    val rowChunk = metas.head.rowChunk
    require(metas.forall(_.rowChunk == rowChunk),
      s"zarr arrays disagree on row chunk at $path (uniform row chunking required)")
    (0 until metas.head.numRowChunks).map { i =>
      ZarrInputPartition(i, i.toLong * rowChunk,
        math.min(rows, (i.toLong + 1) * rowChunk)): InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val byName = metas.map(m => m.name -> m).toMap
    new ZarrReaderFactory(path, required.fieldNames.map(byName(_)),
      new SerializableConfiguration(hadoopConf))
  }
}

class ZarrReaderFactory(path: String, metas: Array[ZarrArrayMeta],
                        conf: SerializableConfiguration)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new ZarrPartitionReader(path, metas, conf,
      partition.asInstanceOf[ZarrInputPartition])

  // columns decode straight into column vectors — the chunk buffer is
  // already columnar, so the batch path skips the per-row
  // GenericInternalRow allocation entirely. Covered: scalars and
  // arbitrary trailing-dim nesting (tensor cells) of plain dtypes and
  // complex structs — the nested offsets are uniform (putArray(i, i*d, d)
  // at every level) because zarr cells are rectangular. Only multi-dim
  // object (string) arrays fall back to the row reader.
  private def vectorizable(m: ZarrArrayMeta): Boolean =
    !(m.objectCodec && m.shape.length > 1)
  override def supportColumnarReads(partition: InputPartition): Boolean =
    metas.forall(vectorizable)
  override def createColumnarReader(partition: InputPartition)
  : PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] =
    new ZarrColumnarReader(path, metas, conf,
      partition.asInstanceOf[ZarrInputPartition])
}

/** Columnar zarr reader: one ColumnarBatch per row-chunk, vectors filled
  * in one tight pass per column from the decompressed chunk buffer.
  */
class ZarrColumnarReader(path: String, metas: Array[ZarrArrayMeta],
                         serConf: SerializableConfiguration,
                         part: ZarrInputPartition)
    extends PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] {
  import org.apache.spark.sql.execution.vectorized.OnHeapColumnVector
  import org.apache.spark.sql.vectorized.{ColumnarBatch, ColumnVector}

  private val n = (part.rowEnd - part.rowStart).toInt
  private var emitted = false
  private var batch: ColumnarBatch = _

  override def next(): Boolean = !emitted && { emitted = true; n > 0 }

  /** fill `count` leaf elements of plain dtype into `v` starting at 0,
    * reading the chunk buffer (or the fill value when the chunk is absent)
    */
  private def fillPlain(v: org.apache.spark.sql.execution.vectorized.WritableColumnVector,
                        m: ZarrArrayMeta, buf: Option[ByteBuffer],
                        count: Int): Unit = buf match {
    case None =>
      m.dtype match {
        case "<i8" => v.putLongs(0, count, m.fillValue.toLong)
        case "<i4" => v.putInts(0, count, m.fillValue.toInt)
        case "<i2" => v.putShorts(0, count, m.fillValue.toShort)
        case "|i1" | "|u1" => v.putBytes(0, count, m.fillValue.toByte)
        case "<f8" => v.putDoubles(0, count, m.fillValue)
        case "<f4" => v.putFloats(0, count, m.fillValue.toFloat)
        case "|b1" => v.putBooleans(0, count, m.fillValue != 0d)
      }
    case Some(b) =>
      var i = 0
      m.dtype match {
        case "<i8" => while (i < count) { v.putLong(i, b.getLong(i * 8)); i += 1 }
        case "<i4" => while (i < count) { v.putInt(i, b.getInt(i * 4)); i += 1 }
        case "<i2" => while (i < count) { v.putShort(i, b.getShort(i * 2)); i += 1 }
        case "|i1" | "|u1" => while (i < count) { v.putByte(i, b.get(i)); i += 1 }
        case "<f8" => while (i < count) { v.putDouble(i, b.getDouble(i * 8)); i += 1 }
        case "<f4" => while (i < count) { v.putFloat(i, b.getFloat(i * 4)); i += 1 }
        case "|b1" => while (i < count) { v.putBoolean(i, b.get(i) != 0); i += 1 }
      }
  }

  /** fill `count` leaf complex values into the struct vector `v`
    * (children = two double vectors) from the interleaved re/im buffer
    */
  private def fillComplex(v: org.apache.spark.sql.execution.vectorized.WritableColumnVector,
                          m: ZarrArrayMeta, buf: Option[ByteBuffer],
                          count: Int): Unit = {
    val re = v.getChild(0); val im = v.getChild(1)
    re.reserve(count); im.reserve(count)
    val w = ZarrMeta.bytesPerElement(m.dtype)
    var i = 0
    buf match {
      case None =>
        re.putDoubles(0, count, m.fillValue); im.putDoubles(0, count, m.fillValue)
      case Some(b) if m.dtype == "<c16" =>
        while (i < count) {
          re.putDouble(i, b.getDouble(i * w))
          im.putDouble(i, b.getDouble(i * w + 8)); i += 1
        }
      case Some(b) =>
        while (i < count) {
          re.putDouble(i, b.getFloat(i * w).toDouble)
          im.putDouble(i, b.getFloat(i * w + 4).toDouble); i += 1
        }
    }
  }

  override def get(): ColumnarBatch = {
    val conf = serConf.value
    val group = new Path(path)
    val vectors: Array[ColumnVector] = metas.map { m =>
      val v = new OnHeapColumnVector(n, m.sparkType)
      val chunk = ZarrMeta.readChunk(conf, group, m, part.chunkIdx)
      if (m.objectCodec) {
        chunk.map(ZarrMeta.decodeJsonChunk) match {
          case None => var i = 0; while (i < n) { v.putNull(i); i += 1 }
          case Some(items) =>
            var i = 0
            while (i < n) {
              val s = items(i)
              if (s == null) v.putNull(i)
              else { val b = s.getBytes("UTF-8"); v.putByteArray(i, b, 0, b.length) }
              i += 1
            }
        }
      } else {
        // Descend through the trailing dims: zarr cells are rectangular,
        // so every array level has uniform offsets (putArray(i, i*d, d))
        // and the leaf is one flat run of count = n·∏dims elements.
        val buf = chunk.map(b => ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN))
        var leaf: org.apache.spark.sql.execution.vectorized.WritableColumnVector = v
        var count = n
        m.shape.drop(1).foreach { dim =>
          val d = dim.toInt
          var i = 0
          while (i < count) { leaf.putArray(i, i * d, d); i += 1 }
          leaf = leaf.arrayData()
          count *= d
          leaf.reserve(count)
        }
        if (m.dtype == "<c16" || m.dtype == "<c8") fillComplex(leaf, m, buf, count)
        else fillPlain(leaf, m, buf, count)
      }
      v: ColumnVector
    }
    batch = new ColumnarBatch(vectors, n)
    batch
  }

  override def close(): Unit = if (batch != null) batch.close()
}

class ZarrPartitionReader(path: String, metas: Array[ZarrArrayMeta],
                          serConf: SerializableConfiguration,
                          part: ZarrInputPartition)
    extends PartitionReader[InternalRow] {

  private val conf = serConf.value
  private val group = new Path(path)
  // decompressed chunk bytes per column (None = missing chunk → fill)
  private val bufs: Array[Option[ByteBuffer]] = metas.map { m =>
    if (m.objectCodec) None
    else ZarrMeta.readChunk(conf, group, m, part.chunkIdx)
      .map(b => ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN))
  }
  // decoded json2 items per object (string) column (None = missing chunk)
  private val objs: Array[Option[Array[String]]] = metas.map { m =>
    if (!m.objectCodec) None
    else ZarrMeta.readChunk(conf, group, m, part.chunkIdx)
      .map(ZarrMeta.decodeJsonChunk)
  }

  private var pos = -1L
  private val n = part.rowEnd - part.rowStart

  override def next(): Boolean = { pos += 1; pos < n }

  /** element at flat index `idx` of column `c` */
  private def elem(c: Int, idx: Long): Any = {
    val m = metas(c)
    if (m.objectCodec) {
      return objs(c) match {
        case None => null // missing object chunk → fill (null)
        case Some(items) =>
          val s = items(idx.toInt)
          if (s == null) null
          else org.apache.spark.unsafe.types.UTF8String.fromString(s)
      }
    }
    bufs(c) match {
      case None =>
        m.dtype match {
          case "<i8" => m.fillValue.toLong
          case "<i4" => m.fillValue.toInt
          case "<i2" => m.fillValue.toShort
          case "|i1" | "|u1" => m.fillValue.toByte
          case "<f8" => m.fillValue
          case "<f4" => m.fillValue.toFloat
          case "|b1" => m.fillValue != 0d
          case "<c16" | "<c8" =>
            new GenericInternalRow(Array[Any](m.fillValue, m.fillValue))
        }
      case Some(b) =>
        val w = ZarrMeta.bytesPerElement(m.dtype)
        val off = (idx * w).toInt
        m.dtype match {
          case "<i8" => b.getLong(off)
          case "<i4" => b.getInt(off)
          case "<i2" => b.getShort(off)
          case "|i1" | "|u1" => b.get(off)
          case "<f8" => b.getDouble(off)
          case "<f4" => b.getFloat(off)
          case "|b1" => b.get(off) != 0
          case "<c16" => new GenericInternalRow(
            Array[Any](b.getDouble(off), b.getDouble(off + 8)))
          case "<c8" => new GenericInternalRow(
            Array[Any](b.getFloat(off).toDouble, b.getFloat(off + 4).toDouble))
        }
    }
  }

  /** value of column `c` for the current row: scalars direct, trailing
    * dims as (nested) arrays
    */
  private def value(c: Int): Any = {
    val m = metas(c)
    val base = pos * m.rowWidth
    val dims = m.shape.drop(1).map(_.toInt)
    if (dims.isEmpty) elem(c, base)
    else {
      def build(offset: Long, ds: Seq[Int]): Any = ds match {
        case Seq(last) =>
          new GenericArrayData(
            Array.tabulate[Any](last)(i => elem(c, offset + i)))
        case head +: tail =>
          val stride = tail.map(_.toLong).product
          new GenericArrayData(
            Array.tabulate[Any](head)(i => build(offset + i * stride, tail)))
      }
      build(base, dims)
    }
  }

  override def get(): InternalRow =
    new GenericInternalRow(Array.tabulate[Any](metas.length)(value))

  override def close(): Unit = ()
}
