package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** WordPiece training/application ([[WordPiece]]): likelihood-ratio merge
  * choice on hand-computable dictionaries, BERT-style greedy
  * longest-match segmentation, the `[UNK]` whole-word fallback, the
  * DataFrame apply paths, and the plan contract.
  */
class WordPieceSpec extends SparkSpec {
  import spark.implicits._

  test("merge choice maximizes count(ab)/(count(a)count(b)), not raw count") {
    // "ab"x10, "cd"x3: pair (a,##b) count 10, score 10/(10*10) = 0.1;
    // pair (c,##d) count 3, score 3/(3*3) = 0.333 — WordPiece fuses cd
    // FIRST even though ab is 3x more frequent (BPE would pick ab)
    val v = WordPiece.learnFromWordFreq(
      Seq("ab" -> 10L, "cd" -> 3L), vocabSize = 6, minCount = 1)
    assert(v === Seq(WordPiece.Unk, "##b", "##d", "a", "c", "cd"))
  }

  test("score ties break by higher pair count, then lexicographic") {
    // "ab"x10, "ac"x5: (a,##b) 10/(15*10), (a,##c) 5/(15*5) — equal
    // scores 1/15; higher pair count wins -> ab merges first
    val v = WordPiece.learnFromWordFreq(
      Seq("ab" -> 10L, "ac" -> 5L), vocabSize = 7, minCount = 1)
    assert(v.slice(4, 6) === Seq("ab", "ac"))
    // exact ties everywhere: lexicographically smallest pair first
    val v2 = WordPiece.learnFromWordFreq(
      Seq("xy" -> 2L, "uv" -> 2L), vocabSize = 6, minCount = 1)
    assert(v2(5) === "uv")
  }

  test("vocabSize caps growth and minCount stops merging") {
    val v = WordPiece.learnFromWordFreq(
      Seq("abcd" -> 5L), vocabSize = 5, minCount = 1)
    assert(v.length == 5) // [UNK] + 4 alphabet symbols, no room to merge
    val v2 = WordPiece.learnFromWordFreq(
      Seq("ab" -> 1L, "cd" -> 1L), vocabSize = 100, minCount = 2)
    assert(v2 === Seq(WordPiece.Unk, "##b", "##d", "a", "c"))
  }

  test("duplicate fused strings enter the vocabulary once") {
    // merges can reach "abc" via (ab,##c) after (a,##b): force both
    // orders across words sharing the chars
    val v = WordPiece.learnFromWordFreq(
      Seq("abc" -> 20L, "ab" -> 1L), vocabSize = 50, minCount = 1)
    assert(v.distinct.length == v.length, s"dup ids in $v")
  }

  test("encodeWord segments greedily, longest match first") {
    val vocab = Set("un", "##aff", "##able", "##a", "u", "##n", "a", "b")
    assert(WordPiece.encodeWord("unaffable", vocab, maxPieceLen = 6).toSeq ===
      Seq("un", "##aff", "##able"))
    // longest-first: "abc" prefers piece "ab" over "a" when both present
    val v2 = Set("a", "ab", "##c", "##b")
    assert(WordPiece.encodeWord("abc", v2, 3).toSeq === Seq("ab", "##c"))
  }

  test("a position with no matching piece maps the WHOLE word to [UNK]") {
    val vocab = Set("a", "##b")
    assert(WordPiece.encodeWord("abz", vocab, 3).toSeq === Seq(WordPiece.Unk))
    assert(WordPiece.encodeWord("za", vocab, 3).toSeq === Seq(WordPiece.Unk))
    assert(WordPiece.encodeWord("", vocab, 3).isEmpty)
  }

  test("applyWordPiece reconstructs text when the alphabet is covered") {
    val docs = Seq(
      (0L, "the quick quick fox"),
      (1L, "THE QUICK fox"), // lowercased by the shared tokenizer
      (2L, ""),
      (3L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val vocab = WordPiece.learnWordPiece(docs, "text", vocabSize = 60,
      minCount = 1)
    val out = WordPiece.applyWordPiece(docs, "text", vocab)
      .select(col("doc_id"),
        array_join(transform(col("wp_tokens"),
          t => regexp_replace(t, "^##", "")), "").as("rec"),
        col("n_wp_tokens"))
      .orderBy("doc_id").collect()
    assert(out(0).getString(1) == "thequickquickfox")
    assert(out(1).getString(1) == "thequickfox")
    assert(out(2).getString(1) == "" && out(2).getLong(2) == 0L)
    assert(out(3).getString(1) == "" && out(3).getLong(2) == 0L)
  }

  test("applyWordPieceIds matches applyWordPiece through the id layout") {
    val docs = Seq((0L, "aa ab ba"), (1L, "zq aa")).toDF("doc_id", "text")
    val vocab = WordPiece.learnWordPiece(docs, "text", vocabSize = 20,
      minCount = 1)
    val idOf = vocab.zipWithIndex.toMap
    val toks = WordPiece.applyWordPiece(docs, "text", vocab)
      .orderBy("doc_id").collect().map(_.getSeq[String](2))
    val ids = WordPiece.applyWordPieceIds(docs, "text", vocab)
      .orderBy("doc_id").collect().map(_.getSeq[Int](2))
    toks.zip(ids).foreach { case (ts, is) =>
      assert(ts.map(idOf) == is)
    }
    assert(ids.flatten.forall(i => i >= 0 && i < vocab.length))
  }

  test("vocabulary artifact round-trips through its DataFrame form") {
    val vocab = WordPiece.learnFromWordFreq(
      Seq("low" -> 5L, "lower" -> 2L, "newest" -> 6L), vocabSize = 30,
      minCount = 1)
    assert(WordPiece.vocabFromDf(WordPiece.vocabDf(spark, vocab)) === vocab)
  }

  test("apply plan is a scan-side projection (no shuffle, no RDD)") {
    val docs = Seq((0L, "a b"), (1L, "b a")).toDF("doc_id", "text")
    val vocab = WordPiece.learnWordPiece(docs, "text", vocabSize = 10,
      minCount = 1)
    val plan = WordPiece.applyWordPiece(docs, "text", vocab)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Scan ExistingRDD"),
      s"apply must stay scan-side:\n$plan")
  }
}
