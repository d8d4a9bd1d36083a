package graft.ops

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** WordPiece subword tokenizer (Schuster & Nakajima 2012, "Japanese and
  * Korean Voice Search"; the BERT tokenizer of Devlin et al. 2019, whose
  * `##` continuation convention and greedy longest-match-first inference
  * this implements) — the third member of the subword-tokenizer family
  * next to [[Bpe]] (GPT lineage) and [[UnigramLm]] (T5/Llama lineage).
  *
  * Training differs from BPE only in the merge objective: instead of the
  * most FREQUENT adjacent pair, WordPiece fuses the pair maximizing the
  * likelihood ratio `count(ab) / (count(a)·count(b))` — the pair whose
  * parts co-occur most above chance.
  *
  * Scale design (100 TB): the [[Bpe]] recipe verbatim. One corpus scan
  * builds a bounded word-frequency dictionary (hash-aggregate, top
  * `maxWords`, deterministic count-then-word tie-break); the merge loop
  * runs on the DRIVER over that dictionary — O(dict · wordLen) state,
  * never O(corpus). Application is embarrassingly parallel: the vocabulary
  * rides one broadcast and a broadcast-closure UDF segments each row's
  * words greedily with a per-task word→pieces memo (Zipf keeps hit rates
  * high) — a scan-side Column projection, no shuffle, no RDD round-trip,
  * streaming-composable like the BPE/classifier paths. Tokenization on
  * learn and apply sides is the ONE shared Spark expression
  * ([[TextAnalysis.nonEmptyTokens]]).
  */
object WordPiece {

  /** BERT continuation prefix: a piece starting mid-word. */
  val Continuation = "##"

  /** Whole-word fallback when any position has no matching piece (the
    * BERT convention: the ENTIRE word maps to one unknown token, partial
    * segmentations are never emitted).
    */
  val Unk = "[UNK]"

  /** Train a WordPiece vocabulary of (at most) `vocabSize` pieces. One
    * Spark job (the same word hash-agg as [[Bpe.learnBpe]]), then the
    * driver merge loop on the bounded dictionary.
    */
  def learnWordPiece(docs: DataFrame, textCol: String, vocabSize: Int,
                     maxWords: Int = 50000, minCount: Long = 2L): Seq[String] = {
    require(vocabSize > 0, s"vocabSize must be positive: $vocabSize")
    require(maxWords > 0, s"maxWords must be positive: $maxWords")
    val spark = docs.sparkSession
    import spark.implicits._
    val wordFreq: Array[(String, Long)] = docs
      .select(explode(TextAnalysis.tokens(col(textCol))).as("__w"))
      .filter(length(col("__w")) > 0)
      .groupBy("__w").agg(count(lit(1)).as("__n"))
      .orderBy(col("__n").desc, col("__w"))
      .limit(maxWords)
      .as[(String, Long)].collect()
    learnFromWordFreq(wordFreq, vocabSize, minCount)
  }

  /** The driver merge loop on an explicit word-frequency dictionary.
    * Returns the vocabulary in the deterministic dataloader id layout:
    * id 0 = `[UNK]`, then the symbol alphabet (initial chars and
    * `##`-marked continuation chars, sorted), then each fused piece in
    * merge order. Merge choice: maximal `count(ab)/(count(a)·count(b))`,
    * ties broken by higher pair count then lexicographically smallest
    * pair — fully deterministic.
    */
  def learnFromWordFreq(wordFreq: Seq[(String, Long)], vocabSize: Int,
                        minCount: Long = 2L): Seq[String] = {
    // each word as symbols: first char bare, the rest ##-marked
    var syms: Array[Array[String]] = wordFreq.iterator.map { case (w, _) =>
      w.toArray.zipWithIndex.map { case (c, i) =>
        if (i == 0) c.toString else Continuation + c
      }
    }.toArray
    val freqs: Array[Long] = wordFreq.map(_._2).toArray
    val alphabet = syms.flatten.distinct.sorted
    val vocab = Seq.newBuilder[String]
    val seen = scala.collection.mutable.HashSet.empty[String]
    vocab += Unk
    vocab ++= alphabet
    seen += Unk
    seen ++= alphabet
    var size = 1 + alphabet.length
    var done = size >= vocabSize
    while (!done) {
      val pairCnt = scala.collection.mutable.HashMap.empty[(String, String), Long]
      val symCnt = scala.collection.mutable.HashMap.empty[String, Long]
      var wi = 0
      while (wi < syms.length) {
        val s = syms(wi); val f = freqs(wi)
        var i = 0
        while (i < s.length) {
          symCnt.update(s(i), symCnt.getOrElse(s(i), 0L) + f)
          if (i < s.length - 1) {
            val p = (s(i), s(i + 1))
            pairCnt.update(p, pairCnt.getOrElse(p, 0L) + f)
          }
          i += 1
        }
        wi += 1
      }
      val best = pairCnt.iterator.filter(_._2 >= minCount)
        .map { case (p, c) =>
          (p, c, c.toDouble / (symCnt(p._1).toDouble * symCnt(p._2)))
        }
        .reduceOption { (a, b) =>
          if (a._3 != b._3) { if (a._3 > b._3) a else b }
          else if (a._2 != b._2) { if (a._2 > b._2) a else b }
          else if (Ordering[(String, String)].lt(a._1, b._1)) a else b
        }
      best match {
        case None => done = true
        case Some(((l, r), _, _)) =>
          // distinct merge paths can fuse to the same string (e.g.
          // (a,##bc) and (ab,##c) both give "abc") — the id space must
          // not carry duplicates
          val fused = l + r.stripPrefix(Continuation)
          if (seen.add(fused)) { vocab += fused; size += 1 }
          syms = syms.map { s =>
            if (s.length < 2) s
            else {
              val out = Array.newBuilder[String]
              var i = 0
              while (i < s.length) {
                if (i < s.length - 1 && s(i) == l && s(i + 1) == r) {
                  out += fused; i += 2 // left-to-right, non-overlapping
                } else { out += s(i); i += 1 }
              }
              out.result()
            }
          }
          if (size >= vocabSize) done = true
      }
    }
    vocab.result()
  }

  /** Segment one word greedily, longest-match-first (BERT's
    * `WordpieceTokenizer`): repeatedly take the longest vocabulary piece
    * matching at the cursor (continuation positions try the `##`-marked
    * form); if some position matches nothing, the whole word becomes
    * `[UNK]`.
    */
  def encodeWord(word: String, vocab: Set[String],
                 maxPieceLen: Int): Array[String] = {
    if (word.isEmpty) return Array.empty
    val out = Array.newBuilder[String]
    var start = 0
    while (start < word.length) {
      val prefix = if (start == 0) "" else Continuation
      val hi = math.min(word.length, start + math.max(maxPieceLen - prefix.length, 1))
      var end = hi
      var hit: String = null
      while (end > start && hit == null) {
        val cand = prefix + word.substring(start, end)
        if (vocab.contains(cand)) hit = cand else end -= 1
      }
      if (hit == null) return Array(Unk)
      out += hit
      start = end
    }
    out.result()
  }

  /** Broadcast-closure word segmenter behind the [[applyWordPiece]] UDF —
    * the [[Bpe.applyBpe]] pattern: per-task word→pieces memo, one
    * executor-shared broadcast of (vocab set, max piece length).
    */
  private final class WordSegmenter(stateB: Broadcast[(Set[String], Int)])
      extends (Seq[String] => Seq[String]) with Serializable {
    @transient private lazy val memo =
      new java.util.concurrent.ConcurrentHashMap[String, Array[String]]()
    override def apply(words: Seq[String]): Seq[String] =
      if (words == null) Seq.empty
      else {
        val (vocab, maxLen) = stateB.value
        val out = Seq.newBuilder[String]
        words.foreach { w =>
          var t = memo.get(w)
          if (t == null) { t = encodeWord(w, vocab, maxLen); memo.put(w, t) }
          out ++= t
        }
        out.result()
      }
  }

  /** Segment every document: adds `wp_tokens` (piece strings, `##`-marked
    * continuations) and `n_wp_tokens`. A scan-side memoized Column
    * projection — no shuffle, no RDD round-trip.
    */
  def applyWordPiece(docs: DataFrame, textCol: String,
                     vocab: Seq[String]): DataFrame = {
    require(!docs.columns.contains("wp_tokens") &&
      !docs.columns.contains("n_wp_tokens"),
      "applyWordPiece reserves output columns wp_tokens, n_wp_tokens")
    val vocabSet = vocab.toSet
    val maxLen = if (vocabSet.isEmpty) 1 else vocabSet.iterator.map(_.length).max
    val stateB = docs.sparkSession.sparkContext.broadcast((vocabSet, maxLen))
    val seg = udf(new WordSegmenter(stateB): Seq[String] => Seq[String])
    docs.withColumn("wp_tokens", seg(TextAnalysis.nonEmptyTokens(col(textCol))))
      .withColumn("n_wp_tokens", size(col("wp_tokens")).cast("long"))
  }

  /** As [[WordSegmenter]], but memoizes straight to vocabulary ids — the
    * [[Bpe]] WordIdEncoder pattern (the vocab map rides the broadcast,
    * never the plan).
    */
  private final class WordIdSegmenter(
      stateB: Broadcast[(Set[String], Int, Map[String, Int])])
      extends (Seq[String] => Seq[Int]) with Serializable {
    @transient private lazy val memo =
      new java.util.concurrent.ConcurrentHashMap[String, Array[Int]]()
    override def apply(words: Seq[String]): Seq[Int] =
      if (words == null) Seq.empty
      else {
        val (vocab, maxLen, ids) = stateB.value
        val out = Seq.newBuilder[Int]
        words.foreach { w =>
          var t = memo.get(w)
          if (t == null) {
            t = encodeWord(w, vocab, maxLen).map(p => ids.getOrElse(p, 0))
            memo.put(w, t)
          }
          out ++= t
        }
        out.result()
      }
  }

  /** As [[applyWordPiece]] but emitting vocabulary ids (`wp_ids`; the
    * [[learnFromWordFreq]] layout — 0 = `[UNK]`) plus `n_wp_tokens` — the
    * dataloader-ready int form, mirroring [[Bpe.applyBpeIds]].
    */
  def applyWordPieceIds(docs: DataFrame, textCol: String,
                        vocab: Seq[String]): DataFrame = {
    require(!docs.columns.contains("wp_ids") &&
      !docs.columns.contains("n_wp_tokens"),
      "applyWordPieceIds reserves output columns wp_ids, n_wp_tokens")
    val vocabSet = vocab.toSet
    val maxLen = if (vocabSet.isEmpty) 1 else vocabSet.iterator.map(_.length).max
    val ids: Map[String, Int] = vocab.zipWithIndex.toMap
    val stateB = docs.sparkSession.sparkContext.broadcast((vocabSet, maxLen, ids))
    val seg = udf(new WordIdSegmenter(stateB): Seq[String] => Seq[Int])
    docs.withColumn("wp_ids", seg(TextAnalysis.nonEmptyTokens(col(textCol))))
      .withColumn("n_wp_tokens", size(col("wp_ids")).cast("long"))
  }

  /** The persistable artifact ([[Bpe.mergesDf]] pattern): (id, piece) in
    * the deterministic id layout; [[vocabFromDf]] rehydrates.
    */
  def vocabDf(spark: SparkSession, vocab: Seq[String]): DataFrame = {
    import spark.implicits._
    vocab.zipWithIndex.map { case (p, i) => (i.toLong, p) }.toDF("id", "piece")
  }

  /** Rehydrate [[vocabDf]] output (bounded rows — a vocabulary, not a
    * corpus read).
    */
  def vocabFromDf(df: DataFrame): Seq[String] =
    df.select("id", "piece").collect()
      .sortBy(_.getLong(0)).map(_.getString(1)).toSeq
}
