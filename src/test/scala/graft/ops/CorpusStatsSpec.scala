package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CorpusStatsSpec extends SparkSpec {
  import spark.implicits._

  test("JS divergence: 0 for identical distributions, 1 for disjoint vocab") {
    val docs = Seq(
      ("s1", "alpha beta alpha"), ("s2", "alpha beta alpha"),
      ("s3", "gamma delta")).toDF("source", "text")
    val m = TextAnalysis.corpusDivergenceJS(docs, "text", "source")
      .as[(String, String, Double)].collect()
      .map(t => (t._1, t._2) -> t._3).toMap
    assert(m(("s1", "s2")) == 0.0)
    assert(m(("s1", "s3")) == 1.0)
    assert(m(("s2", "s3")) == 1.0)
  }

  test("JS divergence matches the closed-form hand computation") {
    // P = {a: 1}, Q = {a: 1/2, b: 1/2}
    val docs = Seq(("p", "a a"), ("q", "a b")).toDF("source", "text")
    val got = TextAnalysis.corpusDivergenceJS(docs, "text", "source")
      .as[(String, String, Double)].collect().head._3
    val ln2 = math.log(2.0)
    val expect = (0.5 * math.log(4.0 / 3.0) +
      0.5 * (0.5 * math.log(2.0 / 3.0) + 0.5 * ln2)) / ln2
    assert(got == BigDecimal(expect).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("rougeL: hand LCS with reordering, identity 1s, disjoint 0s, empties") {
    import spark.implicits._
    val df = Seq(
      ("a b c d", "b x d"),    // LCS "b d" = 2: p=2/3, r=1/2, f=4/7
      ("same text", "same text"),
      ("alpha beta", "gamma delta"),
      ("", "anything"),
      ("REF case", "ref CASE")) // tokenizer lowercases: full match
      .toDF("ref", "cand")
    val got = df.select(TextAnalysis.rougeL(col("ref"), col("cand")).as("g"))
      .select("g._1", "g._2", "g._3").as[(Double, Double, Double)]
      .collect()
    assert(math.abs(got(0)._1 - 2.0 / 3) < 1e-12)
    assert(math.abs(got(0)._2 - 0.5) < 1e-12)
    assert(math.abs(got(0)._3 - 4.0 / 7) < 1e-12)
    assert(got(1) === ((1.0, 1.0, 1.0)))
    assert(got(2) === ((0.0, 0.0, 0.0)))
    assert(got(3) === ((0.0, 0.0, 0.0)))
    assert(got(4) === ((1.0, 1.0, 1.0)))
    // LCS respects ORDER: reversed tokens share only one subsequence
    val rev = df.sparkSession.sql("SELECT 1").select(
      TextAnalysis.rougeL(lit("a b c"), lit("c b a")).as("g"))
      .select("g._2").as[Double].head()
    assert(math.abs(rev - 1.0 / 3) < 1e-12)
  }

  test("distinctN: occurrence-exact diversity; zipfSlope: exact -1 on a power law") {
    import spark.implicits._
    val docs = Seq(
      ("A", "a b a b"),   // bigrams: "a b","b a","a b" -> 3 total, 2 distinct
      ("B", "x y"),
      ("C", "solo"))      // no bigrams
      .toDF("source", "text")
    val got = TextAnalysis.distinctN(docs, "text", "source", n = 2)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got("A") === ((3L, 2L, 0.666666667)))
    assert(got("B") === ((1L, 1L, 1.0)))
    assert(got("C") === ((0L, 0L, 0.0)))
    intercept[IllegalArgumentException](
      TextAnalysis.distinctN(docs, "text", "source", n = 0))
    // counts 12, 6, 4 = 12/rank exactly -> ln c = ln 12 - ln rank, an
    // exact line: the OLS slope must be exactly -1 at round(6)
    val zipf = Seq(("t1 " * 12) + ("t2 " * 6) + ("t3 " * 4))
      .toDF("text")
    val z = TextAnalysis.zipfSlope(zipf, "text").head()
    assert(z.getInt(0) === 3 && z.getDouble(1) === -1.0)
    // rank ties break on token so the fit is deterministic
    val tie = TextAnalysis.zipfSlope(
      Seq("p p q q r").toDF("text"), "text").head()
    assert(tie.getInt(0) === 3)
    intercept[IllegalArgumentException](TextAnalysis.zipfSlope(
      Seq("only").toDF("text"), "text"))
    intercept[IllegalArgumentException](TextAnalysis.zipfSlope(
      zipf, "text", maxRanks = 1))
  }

  test("madOutliers: hand medians/MAD, outlier census, constant-group degeneracy") {
    import spark.implicits._
    // group A: {1,2,3,4,100} — median 3, devs {2,1,0,1,97}, MAD 1;
    // threshold k=3 -> 3*1.4826 = 4.4478: only 100 is out
    val df = Seq(("A", Some(1.0)), ("A", Some(2.0)), ("A", Some(3.0)),
      ("A", Some(4.0)), ("A", Some(100.0)), ("B", Some(5.0)),
      ("B", Some(5.0)), ("B", Some(5.0)), ("C", Some(7.0)),
      ("C", Option.empty[Double]))
      .toDF("g", "v")
    val got = TextAnalysis.madOutliers(df, "v", "g", k = 3.0, exact = true)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4))))
      .toMap
    assert(got("A") === ((5L, 3.0, 1.0, 1L)))
    // constant group: MAD 0, nothing deviates, nothing flags
    assert(got("B") === ((3L, 5.0, 0.0, 0L)))
    // null values drop before the census
    assert(got("C") === ((1L, 7.0, 0.0, 0L)))
    // the documented degeneracy: MAD 0 with ANY off-median value flags it
    val dg = TextAnalysis.madOutliers(
      Seq(("D", 1.0), ("D", 1.0), ("D", 1.0), ("D", 9.0)).toDF("g", "v"),
      "v", "g", k = 3.0, exact = true).head()
    assert(dg.getDouble(3) === 0.0 && dg.getLong(4) === 1L)
    // approx path returns the same shape on well-separated data
    val ap = TextAnalysis.madOutliers(df, "v", "g", k = 3.0).collect()
      .map(r => r.getString(0) -> r.getLong(4)).toMap
    assert(ap("A") === 1L && ap("B") === 0L)
    intercept[IllegalArgumentException](
      TextAnalysis.madOutliers(df, "v", "g", k = 0.0))
  }

  test("topTermsPerGroup ranks by count then token, capped at k") {
    val docs = Seq(
      ("s1", "x x x y y z w"), ("s2", "m n n")).toDF("source", "text")
    val got = TextAnalysis.topTermsPerGroup(docs, "text", "source", 3)
      .orderBy("source", "rank")
      .as[(String, Int, String, Long)].collect().toSeq
    assert(got == Seq(
      ("s1", 1, "x", 3L), ("s1", 2, "y", 2L), ("s1", 3, "w", 1L),
      ("s2", 1, "n", 2L), ("s2", 2, "m", 1L)))
  }

  test("collocations: hand-computed NPMI, minCount gate, bounded range") {
    // corpus: "new york" always adjacent (3x), "a b" adjacent once of many
    val docs = Seq(
      "new york new york new york",
      "a b a c a d b c d a").toDF("text")
    val got = TextAnalysis.collocations(docs, "text", minCount = 2, topK = 10)
      .as[(String, String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    // hand computation for (new, york): one token-count normalizer
    // (16 tokens): p12 = 3/16, p1 = p2 = 3/16
    val p12 = 3.0 / 16; val p1 = 3.0 / 16
    val want = BigDecimal(math.log(p12 / (p1 * p1)) / -math.log(p12))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(("new", "york")) === ((3L, want)))
    // "york new" occurs 2x and qualifies; singleton bigrams are gated out
    assert(got.contains(("york", "new")))
    assert(!got.keySet.exists(p => p == ("b", "a") || p == ("c", "a")))
    assert(got.values.forall { case (_, npmi) => npmi >= -1.0 && npmi <= 1.0 })
  }

  test("applyPhrases merges greedily left-to-right and splits back losslessly") {
    val docs = Seq(
      Some("new york is in new york state"),
      Some("a new year"), None).toDF("text")
    val out = TextAnalysis.applyPhrases(docs, "text",
        Seq(("new", "york"), ("york", "is")))
      .select("phrased_text").as[Option[String]].collect().toSeq
    // greedy: "new york" wins at position 0, so "york is" cannot overlap
    assert(out(0).get === "new_york is in new_york state")
    assert(out(1).get === "a new year") // "new" alone never merges
    assert(out(2).isEmpty)              // null text passes through as null
  }

  test("two word2phrase passes compose bigram phrases into trigrams") {
    // the published recipe: run mine+apply twice — pass 2 sees pass 1's
    // joined tokens as units and promotes (new_york, city) to a trigram
    val docs = Seq.fill(3)("the new york city council met in new york city")
      .toDF("text")
    val p1 = TextAnalysis.collocations(docs, "text", minCount = 2, topK = 3)
      .select("w1", "w2").as[(String, String)].collect().toSeq
    assert(p1.contains(("new", "york")))
    val once = TextAnalysis.applyPhrases(docs, "text", p1)
    val p2 = TextAnalysis.collocations(
        once.select(col("phrased_text").as("text")), "text",
        minCount = 2, topK = 3)
      .select("w1", "w2").as[(String, String)].collect().toSeq
    assert(p2.exists(p => p._1 == "new_york" && p._2 == "city"))
    val twice = TextAnalysis.applyPhrases(
      once.select(col("phrased_text").as("text")), "text", p2)
    val out = twice.select("phrased_text").as[String].head()
    assert(out.contains("new_york_city"))
    // both passes stay lossless: splitting on "_" restores the original
    assert(out.replace("_", " ") ===
      "the new york city council met in new york city")
  }

  test("coverageCurve: hand-computed checkpoints, monotone, ties by token") {
    // counts: a=4, b=2, c=1, d=1 (total 8); top-1 = a (4/8), top-2 adds
    // b (6/8), top-3 breaks the c/d tie by token -> c (7/8), top-9 = all
    val docs = Seq("a a b c", "a b d a").toDF("text")
    val got = TextAnalysis.coverageCurve(docs, "text", Seq(1, 2, 3, 9))
      .as[(Int, Long, Long, Double)].collect().sortBy(_._1)
    assert(got.toSeq === Seq((1, 4L, 8L, 0.5), (2, 6L, 8L, 0.75),
      (3, 7L, 8L, 0.875), (9, 8L, 8L, 1.0)))
    // duplicate/unsorted checkpoints normalize; empty corpus refused
    assert(TextAnalysis.coverageCurve(docs, "text", Seq(2, 1, 2))
      .count() === 2)
    val e = intercept[IllegalArgumentException](
      TextAnalysis.coverageCurve(Seq("", " ").toDF("text"), "text", Seq(1)))
    assert(e.getMessage.contains("no tokens"))
  }

  test("cooccurrence: windowed pairs hand-computed, direction collapsed") {
    // "a b c a": window 2 → offset-1 pairs (a,b)(b,c)(a,c) + offset-2
    // pairs (a,c)(a,b) — unordered, so (a,b)x2 (a,c)x2 (b,c)x1
    val docs = Seq("a b c a", "z").toDF("text")
    val got = TextAnalysis.cooccurrence(docs, "text", window = 2,
        minCount = 1, topK = 10)
      .as[(String, String, Long)].collect()
      .map(t => (t._1, t._2) -> t._3).toMap
    assert(got === Map(("a", "b") -> 2L, ("a", "c") -> 2L, ("b", "c") -> 1L))
    // window 1 reduces to adjacent bigrams (unordered)
    val w1 = TextAnalysis.cooccurrence(docs, "text", window = 1,
        minCount = 1, topK = 10)
      .as[(String, String, Long)].collect()
      .map(t => (t._1, t._2) -> t._3).toMap
    assert(w1 === Map(("a", "b") -> 1L, ("b", "c") -> 1L, ("a", "c") -> 1L))
    // minCount gates the singletons out
    assert(TextAnalysis.cooccurrence(docs, "text", window = 2,
      minCount = 2, topK = 10).count() === 2)
  }

  test("textRank: hub word ranks first; mass conserved; topK; deterministic") {
    // "hub" co-occurs with every other word; the satellites only with
    // hub (and rarely each other) — graph centrality must put hub first
    // even though every pair count is comparable
    val docs = Seq("hub aa", "hub bb", "hub cc", "hub dd", "aa bb",
      "hub aa", "hub bb", "hub cc", "hub dd", "aa bb")
      .toDF("text")
    val all = TextAnalysis.textRankKeywords(docs, "text", window = 2,
      minCount = 1, topK = Int.MaxValue, iters = 20)
    val rows = all.as[(String, Double)].collect()
    assert(rows.head._1 === "hub", rows.mkString(","))
    assert(rows.forall(_._2 > 0))
    // stationary mass over the vocabulary stays 1 (PageRank invariant)
    assert(math.abs(rows.map(_._2).sum - 1.0) < 1e-9)
    // topK truncates the same ranking
    val top2 = TextAnalysis.textRankKeywords(docs, "text", window = 2,
      minCount = 1, topK = 2, iters = 20).as[(String, Double)].collect()
    assert(top2.toSeq === rows.take(2).toSeq)
    // deterministic under partitioning
    val again = TextAnalysis.textRankKeywords(docs.repartition(5), "text",
      window = 2, minCount = 1, topK = Int.MaxValue, iters = 20)
      .as[(String, Double)].collect()
    assert(again.map(t => t._1 -> math.rint(t._2 * 1e9)).toMap ===
      rows.map(t => t._1 -> math.rint(t._2 * 1e9)).toMap)
  }

  test("minePhrases chains the two-pass composition in one call") {
    val docs = Seq.fill(3)("the new york city council met in new york city")
      .toDF("text")
    val (got, vocab) = TextAnalysis.minePhrasesCore(docs, "text",
      minCount = 2, topK = 3, passes = 2)
    assert(vocab.head.contains(("new", "york")))
    assert(vocab.size === 2 &&
      vocab(1).exists(p => p._1 == "new_york" && p._2 == "city"))
    val out = got.select("phrased_text").as[String].head()
    assert(out.contains("new_york_city"))
    assert(out.replace("_", " ") ===
      "the new york city council met in new york city")
    // the input text column survives untouched next to the output
    assert(got.columns.toSeq === Seq("text", "phrased_text"))
    // a dry second pass ends the loop instead of rewriting to no effect:
    // with topK = 1 only (new, york) is mined and pass 2 has no
    // qualifying bigram above the threshold on this tiny corpus
    val (_, v1) = TextAnalysis.minePhrasesCore(
      Seq.fill(2)("ab cd").toDF("text"), "text",
      minCount = 2, topK = 5, passes = 3)
    assert(v1.size <= 1)
  }

  test("hardNegatives returns only label-mismatched neighbors, ranked by cosine") {
    val emb = Seq(
      (1L, Array(1f, 0f), 0), (2L, Array(0.9f, 0.1f), 0),
      (3L, Array(0.8f, 0.2f), 1), (4L, Array(0f, 1f), 1),
      (5L, Array(0.7f, 0.3f), 2)).toDF("vec_id", "embedding", "label")
    val got = Similarity.hardNegatives(
      emb.filter(col("vec_id") === 1), emb,
      "vec_id", "embedding", "label", "vec_id", "embedding", "label", k = 2)
      .as[(Long, Int, Long, Double)].collect().toSeq
    // query 1 (label 0): candidates are 3, 4, 5; nearest two by cosine are
    // 3 (0.970143) then 5 (0.919145); same-label 2 must NOT appear
    assert(got.map(t => (t._1, t._2, t._3)) == Seq((1L, 1, 3L), (1L, 2, 5L)))
    assert(got.forall(_._3 != 2L))
  }

  test("vocabRichness: hand spectrum, no-hapax corpus, empty refusal") {
    import spark.implicits._
    // tokens: a×3, b×2, c×1, d×1 -> N=7 V=4 F1=2 F2=1
    // chao1 = 4 + 2·1/(2·2) = 4.5; GT unseen = 2/7
    val docs = Seq("a a b", "a b c", "d").toDF("text")
    val r = TextAnalysis.vocabRichness(docs, "text").head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      === ((7L, 4L, 2L, 1L)))
    assert(r.getDouble(4) === 4.5)
    assert(math.abs(r.getDouble(5) - 2.0 / 7) < 1e-9)
    // a saturated corpus (no hapax): chao1 = V, unseen mass 0 — the
    // bias-corrected form must not divide by zero at F2 = 0
    val sat = TextAnalysis.vocabRichness(
      Seq("x x y y", "x y").toDF("text"), "text").head()
    assert(sat.getLong(2) === 0L)
    assert(sat.getDouble(4) === 2.0 && sat.getDouble(5) === 0.0)
    // case folding and whitespace runs share the corpus tokenizer
    val fold = TextAnalysis.vocabRichness(
      Seq("A  a\ta").toDF("text"), "text").head()
    assert((fold.getLong(0), fold.getLong(1)) === ((3L, 1L)))
    intercept[IllegalArgumentException](TextAnalysis.vocabRichness(
      Seq.empty[String].toDF("text"), "text"))
  }
}
