package graft.sources.zarr

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.hadoop.fs.Path
import graft.SparkSpec

/** Specs for the pure-JVM blosc decoder: LZ4 block decode against
  * hand-built known vectors, then whole blosc frames built by a
  * spec-faithful test encoder (greedy LZ4, byte-shuffle, splits, memcpy,
  * zlib inner codec), then the zarr read path end-to-end.
  */
class BloscSpec extends SparkSpec {

  // ------------------------------------------------ test-side LZ4 encoder

  /** Greedy, windowed LZ4 block encoder — slow (O(n·window)) but format-
    * correct; matches ≥ 4 bytes within the 64 KiB window.
    */
  private def lz4Compress(src: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def writeLen(first: Int, len: Int): Unit = {
      if (first == 15) {
        var rest = len
        while (rest >= 255) { out.write(255); rest -= 255 }
        out.write(rest)
      }
    }
    var i = 0
    var anchor = 0
    val n = src.length
    while (i < n) {
      // find the longest match for position i in [max(0, i-65535), i)
      var bestLen = 0; var bestOff = 0
      var cand = math.max(0, i - 65535)
      while (cand < i) {
        var l = 0
        while (i + l < n && src(cand + l) == src(i + l)) l += 1
        if (l >= 4 && l > bestLen) { bestLen = l; bestOff = i - cand }
        cand += 1
      }
      if (bestLen >= 4) {
        val litLen = i - anchor
        val litNib = math.min(litLen, 15)
        val matNib = math.min(bestLen - 4, 15)
        out.write((litNib << 4) | matNib)
        writeLen(litNib, litLen - 15)
        out.write(src, anchor, litLen)
        out.write(bestOff & 0xff); out.write((bestOff >> 8) & 0xff)
        writeLen(matNib, bestLen - 4 - 15)
        i += bestLen
        anchor = i
      } else i += 1
    }
    val litLen = n - anchor
    if (litLen > 0) {
      val litNib = math.min(litLen, 15)
      out.write(litNib << 4)
      writeLen(litNib, litLen - 15)
      out.write(src, anchor, litLen)
    }
    out.toByteArray
  }

  private def deflate(b: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater(6); d.setInput(b); d.finish()
    val o = new java.io.ByteArrayOutputStream(); val buf = new Array[Byte](4096)
    while (!d.finished()) o.write(buf, 0, d.deflate(buf))
    d.end(); o.toByteArray
  }

  /** c-blosc byte-shuffle of one block: typesize streams, tail verbatim. */
  private def shuffleBytes(b: Array[Byte], typesize: Int): Array[Byte] = {
    val count = b.length / typesize
    val out = new Array[Byte](b.length)
    for (j <- 0 until typesize; i <- 0 until count)
      out(j * count + i) = b(i * typesize + j)
    System.arraycopy(b, count * typesize, out, count * typesize,
      b.length - count * typesize)
    out
  }

  /** Build a blosc1 frame the way c-blosc lays it out. */
  private def bloscFrame(payload: Array[Byte], typesize: Int, blocksize: Int,
                         shuffle: Boolean, split: Boolean,
                         codec: String): Array[Byte] = {
    val nbytes = payload.length
    if (codec == "memcpy") {
      val h = ByteBuffer.allocate(16 + nbytes).order(ByteOrder.LITTLE_ENDIAN)
      h.put(2.toByte).put(1.toByte).put(0x2.toByte).put(typesize.toByte)
      h.putInt(nbytes).putInt(blocksize).putInt(16 + nbytes).put(payload)
      return h.array()
    }
    val codecCode = codec match {
      case "lz4" => 1; case "snappy" => 2; case "zlib" => 3; case "zstd" => 4
    }
    val nblocks = (nbytes + blocksize - 1) / blocksize
    val blockBytes = new java.io.ByteArrayOutputStream()
    val starts = new Array[Int](nblocks)
    var base = 16 + 4 * nblocks
    for (j <- 0 until nblocks) {
      starts(j) = base + blockBytes.size()
      val neblock = math.min(blocksize, nbytes - j * blocksize)
      val raw0 = java.util.Arrays.copyOfRange(payload, j * blocksize,
        j * blocksize + neblock)
      val raw = if (shuffle) shuffleBytes(raw0, typesize) else raw0
      val nsplits = if (split && neblock % typesize == 0) typesize else 1
      val per = neblock / nsplits
      for (s <- 0 until nsplits) {
        val stream = java.util.Arrays.copyOfRange(raw, s * per, (s + 1) * per)
        val comp = codec match {
          case "lz4" => lz4Compress(stream)
          case "snappy" => org.xerial.snappy.Snappy.compress(stream)
          case "zstd" => com.github.luben.zstd.Zstd.compress(stream, 3)
          case _ => deflate(stream)
        }
        val use = if (comp.length < per) comp else stream // raw if no gain
        blockBytes.write(use.length & 0xff); blockBytes.write((use.length >> 8) & 0xff)
        blockBytes.write((use.length >> 16) & 0xff); blockBytes.write((use.length >> 24) & 0xff)
        blockBytes.write(use)
      }
    }
    val body = blockBytes.toByteArray
    val buf = ByteBuffer.allocate(16 + 4 * nblocks + body.length)
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.put(2.toByte).put(1.toByte)
      .put(((if (shuffle) 1 else 0) | (codecCode << 5)).toByte)
      .put(typesize.toByte)
      .putInt(nbytes).putInt(blocksize).putInt(buf.capacity())
    starts.foreach(buf.putInt)
    buf.put(body)
    buf.array()
  }

  // ------------------------------------------------------------ LZ4 decode

  test("lz4: hand-built vectors — literals, match, overlapping RLE") {
    // pure literals
    val lit = Array[Byte](0x40, 'a', 'b', 'c', 'd')
    val d1 = new Array[Byte](4)
    assert(Blosc.lz4Decompress(lit, 0, lit.length, d1, 0, 4) === 4)
    assert(new String(d1) === "abcd")
    // 8 literals then a match of 8 at offset 8 -> "abcdefghabcdefgh"
    val m = Array[Byte](0x84.toByte, 'a', 'b', 'c', 'd', 'e', 'f', 'g', 'h', 8, 0)
    val d2 = new Array[Byte](16)
    assert(Blosc.lz4Decompress(m, 0, m.length, d2, 0, 16) === 16)
    assert(new String(d2) === "abcdefghabcdefgh")
    // RLE via overlapping match: 1 literal 'a', offset 1, len 7 -> "aaaaaaaa"
    val r = Array[Byte](0x13, 'a', 1, 0)
    val d3 = new Array[Byte](8)
    assert(Blosc.lz4Decompress(r, 0, r.length, d3, 0, 8) === 8)
    assert(new String(d3) === "aaaaaaaa")
  }

  test("lz4: malformed input throws instead of corrupting") {
    val d = new Array[Byte](8)
    // literal run past input end
    intercept[java.io.IOException] {
      Blosc.lz4Decompress(Array[Byte](0x40, 'a'), 0, 2, d, 0, 8)
    }
    // offset before window start
    intercept[java.io.IOException] {
      Blosc.lz4Decompress(Array[Byte](0x13, 'a', 9, 0), 0, 4, d, 0, 8)
    }
  }

  test("lz4: encoder/decoder round-trip incl. long lengths (255 extensions)") {
    val rnd = new scala.util.Random(7)
    for (payload <- Seq(
      Array.fill(500)('x'.toByte), // long RLE -> matchLen ext bytes
      Array.tabulate(400)(i => (i % 7).toByte),
      Array.fill(300)(rnd.nextInt().toByte), // incompressible -> long literals
      Array.emptyByteArray)) {
      val comp = lz4Compress(payload)
      val out = new Array[Byte](payload.length)
      assert(Blosc.lz4Decompress(comp, 0, comp.length, out, 0, out.length)
        === payload.length)
      assert(out.sameElements(payload))
    }
  }

  // ----------------------------------------------------------- blosc frames

  private def longs(n: Int, f: Int => Long): Array[Byte] = {
    val b = ByteBuffer.allocate(n * 8).order(ByteOrder.LITTLE_ENDIAN)
    (0 until n).foreach(i => b.putLong(f(i)))
    b.array()
  }

  test("blosc: memcpy frame decodes to the original buffer") {
    val payload = longs(100, _.toLong)
    val frame = bloscFrame(payload, 8, 256, shuffle = false, split = false,
      codec = "memcpy")
    assert(Blosc.decompress(frame, "t").sameElements(payload))
  }

  test("blosc: lz4 inner codec, no shuffle, multi-block incl. leftover") {
    val payload = longs(300, i => (i % 5).toLong) // 2400 B, blocksize 1024
    val frame = bloscFrame(payload, 8, 1024, shuffle = false, split = false,
      codec = "lz4")
    assert(frame.length < payload.length, "test frame should actually compress")
    assert(Blosc.decompress(frame, "t").sameElements(payload))
  }

  test("blosc: byte-shuffle + typesize splits (the numcodecs default shape)") {
    // 256 int64 per 2048-B block: blocksize/typesize = 256 >= 128 -> split
    val payload = longs(600, i => 1000000L + i) // delta-friendly for shuffle
    val frame = bloscFrame(payload, 8, 2048, shuffle = true, split = true,
      codec = "lz4")
    assert(Blosc.decompress(frame, "t").sameElements(payload))
  }

  test("blosc: shuffled but UNSPLIT frame decodes via the fallback probe") {
    // writer policy variance: same data, nsplits=1 — must still decode
    val payload = longs(600, i => 1000000L + i)
    val frame = bloscFrame(payload, 8, 2048, shuffle = true, split = false,
      codec = "lz4")
    assert(Blosc.decompress(frame, "t").sameElements(payload))
  }

  test("blosc: zlib inner codec with shuffle") {
    val payload = longs(512, i => i.toLong * 3)
    val frame = bloscFrame(payload, 8, 1024, shuffle = true, split = true,
      codec = "zlib")
    assert(Blosc.decompress(frame, "t").sameElements(payload))
  }

  test("blosc: incompressible streams stored raw round-trip") {
    val rnd = new scala.util.Random(11)
    val payload = Array.fill(4096)(rnd.nextInt().toByte)
    val frame = bloscFrame(payload, 8, 1024, shuffle = true, split = true,
      codec = "lz4")
    assert(Blosc.decompress(frame, "t").sameElements(payload))
  }

  test("blosc: bit-shuffle and blosclz are rejected with the codec named") {
    val h = ByteBuffer.allocate(20).order(ByteOrder.LITTLE_ENDIAN)
    h.put(2.toByte).put(1.toByte).put(0x4.toByte).put(8.toByte)
    h.putInt(8).putInt(8).putInt(20)
    val e = intercept[java.io.IOException](Blosc.decompress(h.array(), "t"))
    assert(e.getMessage.contains("bit-shuffle"))
    val h2 = ByteBuffer.allocate(20).order(ByteOrder.LITTLE_ENDIAN)
    h2.put(2.toByte).put(1.toByte).put((0 << 5).toByte).put(8.toByte)
    h2.putInt(8).putInt(8).putInt(20)
    val e2 = intercept[java.io.IOException](Blosc.decompress(h2.array(), "t"))
    assert(e2.getMessage.contains("blosclz"))
  }

  test("blosc: zstd and snappy inner codecs round-trip") {
    val payload = longs(600, i => 1000000L + i)
    for (codec <- Seq("zstd", "snappy"); split <- Seq(true, false)) {
      val frame = bloscFrame(payload, 8, 2048, shuffle = true, split = split,
        codec = codec)
      assert(Blosc.decompress(frame, s"$codec/$split").sameElements(payload),
        s"codec=$codec split=$split")
    }
  }

  test("blosc: malformed header (blocksize<=0, bad block start) throws named") {
    // valid frame, then corrupt the blocksize field in place
    val payload = longs(64, _.toLong)
    val frame = bloscFrame(payload, 8, 256, shuffle = false, split = false,
      codec = "lz4")
    val badBs = frame.clone()
    ByteBuffer.wrap(badBs).order(ByteOrder.LITTLE_ENDIAN).putInt(8, 0)
    val e = intercept[java.io.IOException](Blosc.decompress(badBs, "t"))
    assert(e.getMessage.contains("blocksize"))
    // corrupt block 0's start offset to a negative value
    val badStart = frame.clone()
    ByteBuffer.wrap(badStart).order(ByteOrder.LITTLE_ENDIAN).putInt(16, -5)
    val e2 = intercept[java.io.IOException](Blosc.decompress(badStart, "t"))
    assert(e2.getMessage.contains("start offset"))
  }

  test("blosc: externally-generated fixture frame (python zlib) decodes") {
    // Frame generated OUTSIDE this codebase: streams compressed by
    // CPython's zlib module (an independent deflate implementation),
    // header/block-index laid out per the public c-blosc README_HEADER
    // spec: version 2, flags=0x61 (byte-shuffle | zlib<<5), typesize 4,
    // nbytes 256, blocksize 128 (2 blocks, nsplits=1). Payload = int32 LE
    // 0..63. Guards against a self-consistent misreading shared by the
    // spec's own encoder and the decoder.
    val hex =
      "0201610400010000800000007600000018000000470000002b00000078da6360" +
      "646266616563e7e0e4e2e6e1e5e31710141216111513979094929691959367a0" +
      "310000cfd001f12b00000078da5350545256515553d7d0d4d2d6d1d5d3373034" +
      "3236313533b7b0b4b2b6b1b5b367a031000091ee05f1"
    val frame = hex.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    val expected = ByteBuffer.allocate(256).order(ByteOrder.LITTLE_ENDIAN)
    (0 until 64).foreach(expected.putInt)
    assert(Blosc.decompress(frame, "fixture").sameElements(expected.array()))
  }

  test("blosc: foreign lz4 fixture — shuffle=1, typesize splits (numcodecs shape)") {
    // Frame whose streams were compressed by the REFERENCE lz4 C library
    // (liblz4 via Arrow's lz4_raw codec — the same library numcodecs'
    // blosc links), not this repo's encoder: header flags=0x21
    // (byte-shuffle | lz4<<5), typesize 4, nbytes 256, blocksize 128
    // (2 blocks), each block byte-shuffled then SPLIT into 4 lane streams
    // — the exact frame shape numcodecs.Blosc(cname='lz4', shuffle=1)
    // writes. Payload = int32 LE 0..63. Guards the lz4 decode + unshuffle
    // + split-probe path against a self-consistent misreading.
    val hex =
      "020121040001000080000000ba00000018000000690000002000000000010203" +
      "0405060708090a0b0c0d0e0f101112131415161718191a1b1c1d1e1f0b000000" +
      "1f000100075000000000000b0000001f000100075000000000000b0000001f00" +
      "01000750000000000020000000202122232425262728292a2b2c2d2e2f303132" +
      "333435363738393a3b3c3d3e3f0b0000001f000100075000000000000b000000" +
      "1f000100075000000000000b0000001f00010007500000000000"
    val frame = hex.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    assert(frame.length === 186)
    val expected = ByteBuffer.allocate(256).order(ByteOrder.LITTLE_ENDIAN)
    (0 until 64).foreach(expected.putInt)
    assert(Blosc.decompress(frame, "lz4-fixture").sameElements(expected.array()))
  }

  // ------------------------------------------------------------- zarr e2e

  test("zarr store with blosc-compressed chunks reads end-to-end") {
    val path = "/root/repo/target/zarr_test/blosc_store"
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new Path(path), true)
    fs.mkdirs(new Path(path))
    def put(rel: String, bytes: Array[Byte]): Unit = {
      val out = fs.create(new Path(s"$path/$rel"), true)
      try out.write(bytes) finally out.close()
    }
    put(".zgroup", """{"zarr_format":2}""".getBytes("UTF-8"))
    // the numcodecs default compressor JSON, verbatim shape
    put("v/.zarray",
      """{"zarr_format":2,"shape":[700],"chunks":[512],"dtype":"<i8","compressor":{"id":"blosc","cname":"lz4","clevel":5,"shuffle":1,"blocksize":0},"fill_value":0,"filters":null,"order":"C"}"""
        .getBytes("UTF-8"))
    put("v/0", bloscFrame(longs(512, i => i.toLong * 7), 8, 1024,
      shuffle = true, split = true, codec = "lz4"))
    // zarr v2 chunks are always full-size; the tail beyond `shape` is pad
    put("v/1", bloscFrame(longs(512, i =>
      if (i < 188) (512 + i).toLong * 7 else 0L), 8, 1024,
      shuffle = true, split = false, codec = "lz4"))

    val back = spark.read.format("zarr").load(path)
      .select("v").orderBy("v").collect().map(_.getLong(0))
    assert(back.length === 700)
    assert(back.toSeq === (0 until 700).map(_.toLong * 7))
  }

  test("zarr stores with standalone zstd/gzip/lz4 compressors read e2e") {
    // numcodecs formats: Zstd = bare zstd frame (content size in header),
    // GZip = standard gzip stream, LZ4 = int32 LE length prefix + block
    def gzip(b: Array[Byte]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write(b); g.close(); bos.toByteArray
    }
    def lz4Framed(b: Array[Byte]): Array[Byte] = {
      val body = lz4Compress(b)
      val buf = ByteBuffer.allocate(4 + body.length).order(ByteOrder.LITTLE_ENDIAN)
      buf.putInt(b.length).put(body)
      buf.array()
    }
    val encoders: Map[String, Array[Byte] => Array[Byte]] = Map(
      "zstd" -> (b => com.github.luben.zstd.Zstd.compress(b, 3)),
      "gzip" -> gzip, "lz4" -> lz4Framed)
    for ((id, enc) <- encoders) {
      val path = s"/root/repo/target/zarr_test/standalone_$id"
      val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(new Path(path), true)
      fs.mkdirs(new Path(path))
      def put(rel: String, bytes: Array[Byte]): Unit = {
        val out = fs.create(new Path(s"$path/$rel"), true)
        try out.write(bytes) finally out.close()
      }
      put(".zgroup", """{"zarr_format":2}""".getBytes("UTF-8"))
      put("v/.zarray",
        (s"""{"zarr_format":2,"shape":[300],"chunks":[256],"dtype":"<i8",""" +
          s""""compressor":{"id":"$id"},"fill_value":0,"filters":null,""" +
          s""""order":"C"}""").getBytes("UTF-8"))
      put("v/0", enc(longs(256, i => i.toLong * 3)))
      put("v/1", enc(longs(256, i => if (i < 44) (256 + i).toLong * 3 else 0L)))
      val back = spark.read.format("zarr").load(path)
        .select("v").orderBy("v").collect().map(_.getLong(0))
      assert(back.toSeq === (0 until 300).map(_.toLong * 3), s"compressor=$id")
    }
  }
}
