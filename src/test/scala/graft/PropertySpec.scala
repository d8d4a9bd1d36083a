package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.api.{MSTable, ReadSpec}

/** ScalaCheck properties for the engine invariants the SURVEY test plan
  * calls out: partition completeness, ROWID density/stability, Jaccard
  * bounds (mirrors the reference's parametrized grid testing, §5.3).
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def check(p: Prop, n: Int = 10): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, res.status.toString)
  }

  test("grouped read partitions the table completely and disjointly") {
    val li = spark.read.parquet(s"${sf()}/lineitem.parquet")
    val total = li.count()
    val genGroup = Gen.someOf("l_returnflag", "l_linestatus").suchThat(_.nonEmpty)
    check(Prop.forAll(genGroup) { groupCols =>
      val dss = MSTable.read(spark, s"${sf()}/lineitem.parquet",
        ReadSpec(groupCols = groupCols.toSeq))
      val counts = dss.map(_.df.count())
      counts.sum == total && dss.nonEmpty
    }, n = 4)
  }

  test("ROWID is a dense permutation for any unique key order") {
    val keys = Seq(
      Seq("s_suppkey"), Seq("s_name"), Seq("s_acctbal", "s_suppkey"))
    for (k <- keys) {
      val df = MSTable.withRowId(
        spark.read.parquet(s"${sf()}/supplier.parquet"), k)
      val ids = df.select(MSTable.RowId).as[Long].collect().sorted
      assert(ids.toSeq === ids.indices.map(_.toLong), s"order $k")
    }
  }

  test("jaccard is bounded, reflexive, symmetric on random word sets") {
    val genDoc = Gen.listOfN(12,
      Gen.oneOf("alpha", "beta", "gamma", "delta", "eps", "zeta"))
      .map(_.mkString(" "))
    check(Prop.forAll(genDoc, genDoc) { (ta, tb) =>
      val df = Seq((0L, ta), (1L, tb), (2L, ta)).toDF("id", "text")
      // threshold must be > 0 (zero-intersection pairs are never generated);
      // 0.01 keeps every co-shingled pair while exercising the prefix filter
      val pairs = graft.ops.Dedup.ngramJaccardPairs(
        df.withColumn("b", lit(1)), "text", "id", Seq("b"), 2, 0.01)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      val selfJ = pairs.get((0L, 2L))
      val symOk = pairs.getOrElse((0L, 1L), 0d) == pairs.getOrElse((0L, 1L), 0d)
      pairs.values.forall(j => j >= 0.0 && j <= 1.0) &&
        selfJ.forall(_ == 1.0) && symOk
    }, n = 6)
  }

  test("BPE: lossless round-trip, monotone compression, clean id space") {
    import graft.ops.Bpe
    // arbitrary-ish unicode alphabet, deliberately including the marker's
    // own characters ('<', '/', 'w', '>') so char-derived fused symbols
    // can collide with the EndOfWord marker string — the nastiest corner
    // of the symbol space, and exactly the class the r10 fused-operand
    // vocabulary bug lived in (fixtures missed it for two rounds)
    val alphabet = Gen.oneOf('a', 'b', 'c', 'ß', 'İ', 'ı', 'é', '中',
      '<', '/', 'w', '>')
    val genWord = Gen.choose(1, 8)
      .flatMap(n => Gen.listOfN(n, alphabet)).map(_.mkString)
    val genCorpus = Gen.choose(1, 40).flatMap(n => Gen.listOfN(n, genWord))
    check(Prop.forAll(genCorpus) { words =>
      val freq = words.groupBy(identity).toSeq
        .map { case (w, ws) => (w, ws.size.toLong) }
      val merges = Bpe.learnFromWordFreq(freq, numMerges = 30, minCount = 1)
      val ranksAll = merges.zipWithIndex.map { case (p, i) => p -> i }.toMap
      val ranksHalf = merges.take(merges.size / 2)
        .zipWithIndex.map { case (p, i) => p -> i }.toMap
      val vocab = Bpe.vocabFromMerges(merges,
        extraAlphabet = words.flatten.map(_.toString).distinct)
      val idOf = vocab.zipWithIndex.toMap
      val lossless = words.forall { w =>
        Bpe.encodeWord(w, ranksAll).mkString("") == w + Bpe.EndOfWord
      }
      // more merges never inflate the encoded token count
      val monotone =
        words.map(Bpe.encodeWord(_, ranksAll).length.toLong).sum <=
          words.map(Bpe.encodeWord(_, ranksHalf).length.toLong).sum
      // with the corpus alphabet declared, every emitted symbol has a
      // real id (never <unk>) and ids decode back to the exact word
      val idsClean = words.forall { w =>
        val ids = Bpe.encodeWord(w, ranksAll).map(s => idOf.getOrElse(s, 0))
        ids.forall(_ != 0) &&
          ids.map(vocab(_)).mkString("") == w + Bpe.EndOfWord
      }
      lossless && monotone && idsClean
    }, n = 40)
  }

  test("unigram-LM: lossless total segmentation, coverage, normalization") {
    import graft.ops.UnigramLm
    // includes the ▁ marker char itself (stripped defensively by the
    // learner) and multi-byte unicode — the same nasty-corner alphabet
    // philosophy as the BPE property above
    val alphabet = Gen.oneOf('a', 'b', 'c', 'ß', 'İ', 'ı', 'é', '中',
      '▁', '<', '>')
    val genWord = Gen.choose(1, 8)
      .flatMap(n => Gen.listOfN(n, alphabet)).map(_.mkString)
    val genCorpus = Gen.choose(1, 30).flatMap(n => Gen.listOfN(n, genWord))
    check(Prop.forAll(genCorpus) { words =>
      val freq = words.groupBy(identity).toSeq
        .map { case (w, ws) => (w, ws.size.toLong) }
      val m = UnigramLm.learnFromWordFreq(freq, vocabSize = 20,
        maxPieceLen = 4)
      // every corpus word AND arbitrary unseen words segment losslessly
      // (marked exactly as the apply path marks: no stripping)
      val probe = words ++ Seq("zzzz", "▁", "新词")
      val lossless = probe.forall { w =>
        val marked = UnigramLm.WordStart + w
        UnigramLm.encodeWord(marked, m.scoreOf).mkString == marked
      }
      // single-char coverage: every char of the (marked, stripped) corpus
      // words is a piece, so no corpus word ever needs the unk fallback
      val chars = freq.map(_._1)
        .map(w => UnigramLm.WordStart + w.replace(UnigramLm.WordStart, ""))
        .filter(_.length > 1) // the learner's own marker-only-word filter
        .flatMap(_.map(_.toString)).toSet
      val coverage = chars.subsetOf(m.pieces.toSet)
      // export is a normalized distribution in descending-score order
      // (vacuous for the marker-only corpus, which the learner filters
      // to an empty dictionary and an empty -- still lossless -- model)
      val normalized = m.size == 0 ||
        math.abs(m.logProbs.map(math.exp).sum - 1.0) < 1e-6
      val ordered = m.logProbs.toSeq == m.logProbs.sortBy(-(_: Double)).toSeq
      lossless && coverage && normalized && ordered
    }, n = 30)
  }

  test("updateTable rewrites in place with read-your-writes") {
    val path = "/root/repo/target/test_updatetable"
    val supp = spark.read.parquet(s"${sf()}/supplier.parquet")
    graft.api.MSWrite.create(supp, path)
    val base = MSTable.withRowId(MSTable.open(spark, path), Seq("s_suppkey"))
    val delta = base.filter(col("s_suppkey") <= 2)
      .select(col(MSTable.RowId), lit(-1.0).as("s_acctbal"))
    graft.api.MSWrite.updateTable(spark, path, delta, Seq("s_suppkey"))
    val back = MSTable.open(spark, path)
    assert(back.count() === supp.count())
    assert(back.filter(col("s_suppkey") <= 2)
      .select(max("s_acctbal")).head().getDouble(0) === -1.0)
    assert(back.filter(col("s_suppkey") > 2)
      .select(min("s_acctbal")).head().getDouble(0) > -1.0)
  }
}
