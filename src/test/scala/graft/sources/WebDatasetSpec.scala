package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** WebDataset tar shards: ustar format validity verified by independent
  * header arithmetic (not the writer's own parser), byte-deterministic
  * re-writes, round-trip equality, null-member skipping.
  */
class WebDatasetSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(name: String) = s"/root/repo/target/webdataset_test/$name"

  private def docs = Seq(
    (1L, "hello world", """{"lang":"en"}"""),
    (2L, "zweite zeile", """{"lang":"de"}"""),
    (3L, "third", null.asInstanceOf[String]),
    (4L, "vierte", """{"lang":"de"}"""))
    .toDF("doc_id", "text", "meta")

  test("ustar blocks validate by independent header arithmetic") {
    val dir = tmp("ustar")
    WebDataset.write(docs, "doc_id",
      Seq(("text", "txt"), ("meta", "json")), dir, shards = 2)
    val files = Files.list(Paths.get(dir)).toArray.map(_.toString)
      .filter(_.endsWith(".tar")).sorted
    assert(files.nonEmpty)
    var members = 0
    for (f <- files) {
      val bytes = Files.readAllBytes(Paths.get(f))
      assert(bytes.length % 512 === 0, s"$f not block-aligned")
      // trailer: at least two zero blocks
      assert(bytes.takeRight(1024).forall(_ == 0), s"$f missing end marker")
      var off = 0
      while (off + 512 <= bytes.length &&
             !(off until off + 512).forall(bytes(_) == 0)) {
        // independent checksum: sum of header bytes with the checksum
        // field read as spaces must equal the stored octal value
        var sum = 0L
        for (i <- 0 until 512)
          sum += (if (i >= 148 && i < 156) ' '.toByte else bytes(off + i)) & 0xFF
        val stored = java.lang.Long.parseLong(
          new String(bytes, off + 148, 6, StandardCharsets.US_ASCII), 8)
        assert(stored === sum, s"$f checksum mismatch at $off")
        assert(new String(bytes, off + 257, 5,
          StandardCharsets.US_ASCII) === "ustar")
        assert(bytes(off + 156) === '0'.toByte)
        // mtime pinned to zero => deterministic archives
        assert(java.lang.Long.parseLong(new String(bytes, off + 136, 11,
          StandardCharsets.US_ASCII), 8) === 0L)
        val size = java.lang.Long.parseLong(new String(bytes, off + 124, 11,
          StandardCharsets.US_ASCII), 8)
        members += 1
        off += 512 * (1 + ((size + 511) / 512)).toInt
      }
    }
    assert(members === 7) // 4 txt + 3 json (doc 3's meta is null)
  }

  test("round-trip: read back equals what was written, nulls skipped") {
    val dir = tmp("roundtrip")
    val (samples, members) = WebDataset.write(docs, "doc_id",
      Seq(("text", "txt"), ("meta", "json")), dir, shards = 2)
    assert(samples === 4L && members === 7L)
    val back = WebDataset.read(spark, dir)
      .select(col("key"), col("ext"), col("content").cast("string"))
      .as[(String, String, String)].collect()
      .map { case (k, e, c) => (k, e) -> c }.toMap
    assert(back.size === 7)
    assert(back(("1", "txt")) === "hello world")
    assert(back(("2", "json")) === """{"lang":"de"}""")
    assert(!back.contains(("3", "json")))
    // binary members survive byte-exactly (not just UTF-8 text)
    val bin = Seq((7L, Array[Byte](0, 1, -1, 127, -128)))
      .toDF("doc_id", "blob")
    val dir2 = tmp("binary")
    WebDataset.write(bin, "doc_id", Seq(("blob", "bin")), dir2, shards = 1)
    val blob = WebDataset.read(spark, dir2)
      .select("content").as[Array[Byte]].head()
    assert(blob.toSeq === Seq[Byte](0, 1, -1, 127, -128))
    // the manifest's write-stream md5s verify against the files on disk
    assert(WebDataset.verifyShards(spark, dir).filter(!col("ok")).count() === 0)
  }

  test("re-writing the same frame yields bit-identical shards") {
    val a = tmp("det_a"); val b = tmp("det_b")
    for (d <- Seq(a, b))
      WebDataset.write(docs.repartition(3), "doc_id",
        Seq(("text", "txt"), ("meta", "json")), d, shards = 2)
    def md5s(d: String) = Files.list(Paths.get(d)).toArray.map(_.toString)
      .filter(_.endsWith(".tar")).sorted.map { f =>
      val dig = java.security.MessageDigest.getInstance("MD5")
      f.split("/").last -> dig.digest(Files.readAllBytes(Paths.get(f)))
        .map("%02x".format(_)).mkString
    }.toSeq
    assert(md5s(a) === md5s(b) && md5s(a).nonEmpty)
    // overwrite semantics: a re-run with fewer shards leaves no strays
    WebDataset.write(docs, "doc_id", Seq(("text", "txt")), a, shards = 1)
    assert(md5s(a).size === 1)
  }

  test("assignShards: LPT covers every shard once, balances, refuses bad workers") {
    val dir = tmp("assign")
    val many = (0L until 40L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    WebDataset.write(many, "doc_id", Seq(("text", "txt")), dir, shards = 7)
    val asg = WebDataset.assignShards(spark, dir, workers = 3)
      .as[(Int, Int, Long)].collect().toSeq
    // every manifest shard exactly once
    assert(asg.map(_._2).sorted === (0 until 7))
    assert(asg.map(_._3).sum === 40L)
    // LPT balance: max load minus min load bounded by the largest shard
    val loads = asg.groupBy(_._1).view.mapValues(_.map(_._3).sum).values.toSeq
    assert(loads.max - loads.min <= asg.map(_._3).max)
    // deterministic
    assert(WebDataset.assignShards(spark, dir, 3)
      .as[(Int, Int, Long)].collect().toSeq === asg)
    intercept[IllegalArgumentException](
      WebDataset.assignShards(spark, dir, 0))
  }

  test("guards: long names, duplicate extensions, zero shards") {
    val dir = tmp("guards")
    val long = Seq(("x" * 120, "t")).toDF("doc_id", "text")
    val thrown = intercept[org.apache.spark.SparkException](
      WebDataset.write(long, "doc_id", Seq(("text", "txt")), dir, 1))
    assert(thrown.getMessage.contains("100 bytes") ||
      Option(thrown.getCause).exists(_.getMessage.contains("100 bytes")))
    intercept[IllegalArgumentException](WebDataset.write(
      docs, "doc_id", Seq(("text", "txt"), ("meta", "txt")), dir, 1))
    intercept[IllegalArgumentException](WebDataset.write(
      docs, "doc_id", Seq(("text", "txt")), dir, 0))
    // duplicate keys would collide same-stem members — refuse
    val dup = intercept[IllegalArgumentException](WebDataset.write(
      docs.union(docs), "doc_id", Seq(("text", "txt")), dir, 1))
    assert(dup.getMessage.contains("duplicate"))
    // null keys likewise (they would all stem as the string "null")
    val nk = intercept[IllegalArgumentException](WebDataset.write(
      Seq((Option.empty[Long], "t"), (Some(1L), "u")).toDF("doc_id", "text"),
      "doc_id", Seq(("text", "txt")), dir, 1))
    assert(nk.getMessage.contains("null"))
  }
}
