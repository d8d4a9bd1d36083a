package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** BPE subword training/application ([[Bpe]]) against the published
  * worked example (Sennrich et al. 2016 §3.2: the low/lower/newest/widest
  * dictionary) and the round-trip/compression contracts.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  private val sennrich = Seq(
    "low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)

  test("merge sequence matches the published example (deterministic ties)") {
    val merges = Bpe.learnFromWordFreq(sennrich, numMerges = 6)
    // pair counts: (e,s)=9 (s,t)=9 (t,</w>)=9 tie -> lexicographic;
    // then (es,t)=9, (est,</w>)=9; then (l,o)=(o,w)=7 tie -> (l,o);
    // then (lo,w)=7; then (e,w)/(n,e)/(w,est</w>)=6 tie -> (e,w)
    assert(merges === Seq(
      ("e", "s"), ("es", "t"), ("est", Bpe.EndOfWord),
      ("l", "o"), ("lo", "w"), ("e", "w")))
  }

  test("merge loop stops when no pair reaches minCount") {
    val merges = Bpe.learnFromWordFreq(Seq("ab" -> 1L, "cd" -> 1L),
      numMerges = 10, minCount = 2)
    assert(merges.isEmpty)
    // a single-char word still pairs with the end marker; after its
    // merge it is a singleton and contributes no further pairs
    val m2 = Bpe.learnFromWordFreq(Seq("a" -> 100L, "bc" -> 3L), numMerges = 10)
    assert(m2 === Seq(("a", Bpe.EndOfWord), ("b", "c"), ("bc", Bpe.EndOfWord)))
  }

  test("encodeWord applies merges greedily by rank: lowest -> low + est</w>") {
    val ranks = Bpe.learnFromWordFreq(sennrich, numMerges = 6)
      .zipWithIndex.map { case (p, i) => p -> i }.toMap
    assert(Bpe.encodeWord("lowest", ranks).toSeq ===
      Seq("low", "est" + Bpe.EndOfWord))
    // unseen characters fall back to char-level symbols
    assert(Bpe.encodeWord("xyz", ranks).toSeq ===
      Seq("x", "y", "z", Bpe.EndOfWord))
  }

  test("applyBpe round-trips every document and handles null/empty text") {
    val docs = Seq(
      (0L, "the lowest lower low"),
      (1L, "  NEWEST widest  "),
      (2L, ""),
      (3L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val merges = Bpe.learnFromWordFreq(sennrich, numMerges = 6)
    val out = Bpe.applyBpe(docs, "text", merges).orderBy("doc_id")
    val recon = out.select(col("doc_id"),
      array_join(col("bpe_tokens"), "").as("r"), col("n_bpe_tokens"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // concatenated subwords restore each lowercased word + marker
    assert(recon(0)._2 ===
      Seq("the", "lowest", "lower", "low")
        .map(_ + Bpe.EndOfWord).mkString(""))
    assert(recon(1)._2 ===
      Seq("newest", "widest").map(_ + Bpe.EndOfWord).mkString(""))
    assert(recon(2) === ((2L, "", 0L)))
    assert(recon(3) === ((3L, "", 0L)))
  }

  test("vocab ids: deterministic layout, round-trip through ids, unk fallback") {
    val merges = Bpe.learnFromWordFreq(sennrich, numMerges = 6)
    val vocab = Bpe.vocabFromMerges(merges, extraAlphabet = Seq("x"))
    // layout: <unk>, </w>, alphabet (sorted), fused symbols in rank order
    assert(vocab.take(2) === Seq("<unk>", Bpe.EndOfWord))
    assert(vocab.indexOf("es") < vocab.indexOf("est"))
    assert(vocab.contains("x") && vocab.contains("low"))
    assert(vocab.distinct === vocab)

    // fused merge operands like "est</w>" are alphabet-split on the CORE
    // only — no spurious '<', '/', '>' ids pollute the vocabulary
    val fusedVocab = Bpe.vocabFromMerges(Seq(("w", "est" + Bpe.EndOfWord)))
    assert(!fusedVocab.exists(Seq("<", "/", ">").contains),
      s"fused operand leaked marker chars: $fusedVocab")
    assert(fusedVocab.containsSlice(Seq("e", "s", "t", "w")) &&
      fusedVocab.last === "west" + Bpe.EndOfWord, fusedVocab)

    val docs = Seq((0L, "lowest"), (1L, "qqq")).toDF("doc_id", "text")
    val out = Bpe.applyBpeIds(docs, "text", merges, vocab).orderBy("doc_id")
      .select("bpe_ids").collect().map(_.getSeq[Int](0))
    // "lowest" -> [low, est</w>] by the published example, mapped to ids
    assert(out(0) === Seq(vocab.indexOf("low"), vocab.indexOf("est" + Bpe.EndOfWord)))
    // 'q' never appears in any merge rule or the extra alphabet -> <unk>,
    // while the end marker always has its own id
    assert(out(1) === Seq(0, 0, 0, 1))
  }

  test("merges persist to a frame and rehydrate in rank order") {
    val merges = Bpe.learnFromWordFreq(sennrich, numMerges = 6)
    val back = Bpe.mergesFromDf(
      // shuffle the row order: rehydration must re-sort by rank
      Bpe.mergesDf(spark, merges).orderBy(col("left")))
    assert(back === merges)
    // and the rehydrated artifact encodes identically
    val ranks = back.zipWithIndex.map { case (p, i) => p -> i }.toMap
    assert(Bpe.encodeWord("lowest", ranks).toSeq ===
      Seq("low", "est" + Bpe.EndOfWord))
  }

  test("corpus training is deterministic and more merges never inflate tokens") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val a = Bpe.learnBpe(docs, "text", numMerges = 60, maxWords = 5000)
    val b = Bpe.learnBpe(docs, "text", numMerges = 60, maxWords = 5000)
    assert(a === b)
    assert(a.size === 60)
    val n60 = Bpe.applyBpe(docs, "text", a)
      .agg(sum("n_bpe_tokens")).head().getLong(0)
    val n20 = Bpe.applyBpe(docs, "text", a.take(20))
      .agg(sum("n_bpe_tokens")).head().getLong(0)
    assert(n60 <= n20, s"more merges must not inflate: 60->$n60 20->$n20")
  }
}
