package graft.ops

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Unigram-language-model subword tokenizer (Kudo 2018, "Subword
  * Regularization: Improving Neural Network Translation Models with
  * Multiple Subword Candidates" — the SentencePiece `unigram` model used
  * by the T5/XLM-R/Llama pretraining pipelines; the standard alternative
  * to BPE's merge-list construction).
  *
  * Scale design (100 TB): exactly the [[Bpe]] recipe. The corpus is
  * scanned ONCE into a bounded word-frequency dictionary (hash-aggregate,
  * top `maxWords` with a deterministic count-then-word tie-break); the
  * EM fit then runs on the DRIVER over that dictionary — seed-candidate
  * extraction, forward-backward expected counts, and pruning are all
  * O(dict · wordLen · maxPieceLen) state, parameter-bounded like the
  * BPE merge loop / k-means / DSIR fits, never O(corpus). Application is
  * embarrassingly parallel: the scored pieces ride one broadcast and a
  * broadcast-closure UDF Viterbi-segments each row's words with a
  * per-task word→pieces memo (Zipf keeps the hit rate high), so apply is
  * a scan-side Column projection — no shuffle, no RDD round-trip, and it
  * composes with Structured Streaming transforms like the BPE and
  * classifier paths.
  *
  * Faithfulness notes: seeding uses frequency-weighted substring counts
  * (SentencePiece seeds from a suffix array with a count·len score — same
  * candidate family, different ranking); the E-step is the paper's
  * forward-backward expected-count computation; pruning keeps the
  * highest-expected-count pieces per shrink round (the paper ranks by
  * likelihood-loss-if-removed; expected count is the standard cheap
  * surrogate) and ALWAYS keeps the single-character pieces, the paper's
  * own character-coverage guarantee. Words are marked with the
  * SentencePiece word-boundary prefix U+2581 ("▁"), so a document's
  * piece sequence concatenates back to exactly "▁word▁word…" —
  * losslessness is testable by construction. Tokenization on learn and
  * apply sides is the ONE shared Spark expression
  * ([[TextAnalysis.nonEmptyTokens]]).
  */
object UnigramLm {

  /** SentencePiece word-boundary marker (U+2581 LOWER ONE EIGHTH BLOCK).
    * Prefixes every word; cannot collide with corpus characters of a
    * whitespace-tokenized word only if the corpus itself avoids it — the
    * learner strips any embedded occurrences defensively.
    */
  val WordStart = "▁"

  /** Log-prob assigned to a single unknown character at apply time: worse
    * than any real piece, so known segmentations are always preferred,
    * but finite, so segmentation never fails and stays lossless.
    */
  val UnkLogProb: Double = -1e3

  /** A fitted model: pieces with log probabilities, in the deterministic
    * dataloader id layout — id 0 is `&lt;unk&gt;`, then pieces by
    * descending logProb with a lexicographic tie-break (the
    * SentencePiece export order).
    */
  final case class UnigramModel(pieces: Array[String],
                                logProbs: Array[Double]) {
    require(pieces.length == logProbs.length,
      s"pieces/logProbs length mismatch: ${pieces.length}/${logProbs.length}")
    def size: Int = pieces.length
    lazy val scoreOf: Map[String, Double] = pieces.zip(logProbs).toMap
    /** Piece id layout: 0 = unk, 1.. = pieces array order. */
    lazy val idOf: Map[String, Int] =
      pieces.zipWithIndex.map { case (p, i) => p -> (i + 1) }.toMap
    /** Viterbi window = the longest piece actually in the vocabulary, so
      * a model always applies with the window it was trained with (no
      * silently-dead long pieces if train and apply defaults diverge).
      */
    lazy val maxPieceLen: Int =
      if (pieces.isEmpty) 1 else pieces.iterator.map(_.length).max
  }

  /** Train a unigram LM vocabulary of (at most) `vocabSize` pieces from
    * the corpus word-frequency dictionary. One Spark job (the same word
    * hash-agg as [[Bpe.learnBpe]]), then the driver EM fit. The floor of
    * the fit is the single-character alphabet (coverage pieces are never
    * pruned): a `vocabSize` below the corpus's distinct-character count
    * yields the alphabet-sized model, not a hang and not an error.
    */
  def learnUnigram(docs: DataFrame, textCol: String, vocabSize: Int,
                   maxWords: Int = 20000, maxPieceLen: Int = 8,
                   seedSize: Int = 0, shrink: Double = 0.75,
                   emIters: Int = 2): UnigramModel = {
    val spark = docs.sparkSession
    import spark.implicits._
    val wordFreq: Array[(String, Long)] = docs
      .select(explode(TextAnalysis.nonEmptyTokens(col(textCol))).as("__w"))
      .groupBy("__w").agg(count(lit(1)).as("__n"))
      .orderBy(col("__n").desc, col("__w"))
      .limit(maxWords)
      .as[(String, Long)].collect()
    learnFromWordFreq(wordFreq, vocabSize, maxPieceLen, seedSize, shrink,
      emIters)
  }

  /** The driver EM fit on an explicit word-frequency dictionary — split
    * out so specs can drive it with hand-built dictionaries.
    */
  def learnFromWordFreq(wordFreq: Seq[(String, Long)], vocabSize: Int,
                        maxPieceLen: Int = 8, seedSize: Int = 0,
                        shrink: Double = 0.75, emIters: Int = 2)
  : UnigramModel = {
    require(vocabSize > 0, s"vocabSize must be positive: $vocabSize")
    require(maxPieceLen >= 1, s"maxPieceLen must be >= 1: $maxPieceLen")
    require(shrink > 0 && shrink < 1, s"shrink must be in (0,1): $shrink")
    // words marked with the boundary prefix; defensive strip of embedded
    // markers keeps the marker's word-start meaning unambiguous
    val words: Array[(String, Long)] = wordFreq.iterator
      .map { case (w, n) => (WordStart + w.replace(WordStart, ""), n) }
      .filter(_._1.length > 1).toArray

    // ---- seed: single chars (always kept: character coverage) + the
    // top frequency-weighted substrings up to maxPieceLen
    val charSet = scala.collection.mutable.TreeSet.empty[String]
    val subCount = scala.collection.mutable.HashMap.empty[String, Long]
    words.foreach { case (w, f) =>
      var i = 0
      while (i < w.length) {
        charSet += w.charAt(i).toString
        var L = 2
        while (L <= maxPieceLen && i + L <= w.length) {
          val s = w.substring(i, i + L)
          subCount.update(s, subCount.getOrElse(s, 0L) + f)
          L += 1
        }
        i += 1
      }
    }
    val chars = charSet.toArray // sorted (TreeSet)
    val nSeed = if (seedSize > 0) seedSize else math.max(vocabSize * 4, 1000)
    val seeds: Array[String] = subCount.toArray
      .sortBy { case (s, c) => (-c, s) } // count desc, lex asc: stable
      .take(math.max(nSeed - chars.length, 0)).map(_._1)
    var pieces: Array[String] = (chars ++ seeds).distinct.sorted
    // init scores from the weighted substring counts (chars get their
    // occurrence counts too)
    val charCount = scala.collection.mutable.HashMap.empty[String, Long]
    words.foreach { case (w, f) =>
      w.foreach(c => charCount.update(c.toString,
        charCount.getOrElse(c.toString, 0L) + f))
    }
    def initScore(p: String): Double =
      math.max(subCount.getOrElse(p, charCount.getOrElse(p, 1L)), 1L).toDouble
    var logp: Map[String, Double] = {
      val tot = math.log(pieces.iterator.map(initScore).sum)
      pieces.iterator.map(p => p -> (math.log(initScore(p)) - tot)).toMap
    }

    def logsumexp(a: Double, b: Double): Double =
      if (a == Double.NegativeInfinity) b
      else if (b == Double.NegativeInfinity) a
      else { val m = math.max(a, b); m + math.log(math.exp(a - m) + math.exp(b - m)) }

    // ---- one EM step: forward-backward expected piece counts over the
    // dictionary (frequency-weighted), then MLE re-estimate
    def emStep(): Map[String, Double] = {
      val expected = scala.collection.mutable.HashMap.empty[String, Double]
      words.foreach { case (w, f) =>
        val n = w.length
        val alpha = Array.fill(n + 1)(Double.NegativeInfinity)
        val beta = Array.fill(n + 1)(Double.NegativeInfinity)
        alpha(0) = 0.0; beta(n) = 0.0
        var i = 1
        while (i <= n) {
          var j = math.max(0, i - maxPieceLen)
          while (j < i) {
            val lp = logp.get(w.substring(j, i))
            if (lp.isDefined && alpha(j) != Double.NegativeInfinity)
              alpha(i) = logsumexp(alpha(i), alpha(j) + lp.get)
            j += 1
          }
          i += 1
        }
        i = n - 1
        while (i >= 0) {
          var k = math.min(n, i + maxPieceLen)
          while (k > i) {
            val lp = logp.get(w.substring(i, k))
            if (lp.isDefined && beta(k) != Double.NegativeInfinity)
              beta(i) = logsumexp(beta(i), lp.get + beta(k))
            k -= 1
          }
          i -= 1
        }
        val z = alpha(n)
        if (z != Double.NegativeInfinity) {
          var j = 0
          while (j < n) {
            var k = j + 1
            while (k <= j + maxPieceLen && k <= n) {
              val s = w.substring(j, k)
              val lp = logp.get(s)
              if (lp.isDefined && alpha(j) != Double.NegativeInfinity &&
                  beta(k) != Double.NegativeInfinity) {
                val post = math.exp(alpha(j) + lp.get + beta(k) - z)
                if (post > 0) expected.update(s,
                  expected.getOrElse(s, 0.0) + f * post)
              }
              k += 1
            }
            j += 1
          }
        }
      }
      // tiny additive floor keeps the always-kept character pieces finite
      // even when the soft assignments starve them this round
      val tot = math.log(pieces.iterator
        .map(p => expected.getOrElse(p, 0.0) + 1e-9).sum)
      pieces.iterator
        .map(p => p -> (math.log(expected.getOrElse(p, 0.0) + 1e-9) - tot))
        .toMap
    }

    // ---- shrink rounds: EM, then prune to shrink× (never below
    // vocabSize, never dropping single-character pieces). Character
    // pieces are not prunable (coverage), so the floor of the loop is
    // the alphabet: when the alphabet alone exceeds vocabSize, or a
    // shrink step can make no progress (ceil(n·shrink)==n for tiny n),
    // stop at the smallest reachable vocabulary instead of spinning.
    val charsSet = chars.toSet
    var progress = true
    while (pieces.length > vocabSize && progress) {
      var e = 0
      while (e < emIters) { logp = emStep(); e += 1 }
      val target = math.max(vocabSize,
        math.ceil(pieces.length * shrink).toInt)
      val before = pieces.length
      if (target < pieces.length) {
        val keepN = math.max(target - chars.length, 0)
        val kept = pieces.iterator.filterNot(charsSet)
          .map(p => (p, logp(p))).toArray
          .sortBy { case (p, s) => (-s, p) } // score desc, lex asc
          .take(keepN).map(_._1)
        pieces = (chars ++ kept).distinct.sorted
        val rest = pieces.map(p => p -> logp(p))
        val tot = math.log(rest.iterator.map { case (_, s) => math.exp(s) }.sum)
        logp = rest.iterator.map { case (p, s) => p -> (s - tot) }.toMap
      }
      progress = pieces.length < before
    }
    // final fit at the settled size (exactly once, loop or no loop)
    if (pieces.nonEmpty) {
      var e = 0
      while (e < emIters) { logp = emStep(); e += 1 }
    }
    // deterministic export order: score desc, lex asc
    val ordered = pieces.map(p => (p, logp(p))).sortBy { case (p, s) => (-s, p) }
    UnigramModel(ordered.map(_._1), ordered.map(_._2))
  }

  /** Viterbi-segment one marked word (already [[WordStart]]-prefixed)
    * under the model scores; unknown characters become single-char
    * pieces at [[UnkLogProb]] so segmentation is total and lossless.
    * Deterministic tie-break: the longer final piece wins, then lex.
    */
  def encodeWord(marked: String, scoreOf: Map[String, Double],
                 maxPieceLen: Int = 8): Array[String] = {
    val n = marked.length
    if (n == 0) return Array.empty
    val best = Array.fill(n + 1)(Double.NegativeInfinity)
    val back = Array.fill(n + 1)(-1)
    best(0) = 0.0
    var i = 1
    while (i <= n) {
      var j = math.max(0, i - maxPieceLen)
      while (j < i) {
        if (best(j) != Double.NegativeInfinity) {
          val s = marked.substring(j, i)
          val lp = scoreOf.getOrElse(s,
            if (i - j == 1) UnkLogProb else Double.NegativeInfinity)
          if (lp != Double.NegativeInfinity) {
            val cand = best(j) + lp
            // strictly-better wins; on an exact tie prefer the longer
            // final piece (smaller j) — j increases, so keep the first
            if (cand > best(i)) { best(i) = cand; back(i) = j }
          }
          j += 1
        } else j += 1
      }
      i += 1
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var k = n
    while (k > 0) { val j = back(k); out += marked.substring(j, k); k = j }
    out.reverseIterator.toArray
  }

  /** Persistable artifact: (id, piece, log_prob) — id 0 is reserved for
    * `&lt;unk&gt;` and not stored.
    */
  def piecesDf(spark: SparkSession, model: UnigramModel): DataFrame = {
    import spark.implicits._
    model.pieces.zip(model.logProbs).zipWithIndex
      .map { case ((p, s), i) => ((i + 1).toLong, p, s) }.toSeq
      .toDF("id", "piece", "log_prob")
  }

  /** Rehydrate [[piecesDf]] output into a model (id order restored). */
  def piecesFromDf(df: DataFrame): UnigramModel = {
    val rows = df.select("id", "piece", "log_prob").collect()
      .sortBy(_.getLong(0))
    UnigramModel(rows.map(_.getString(1)), rows.map(_.getDouble(2)))
  }

  /** Broadcast-closure encoder behind the apply UDFs (the
    * [[Bpe.applyBpe]] pattern: per-task memo, executor-shared scores).
    */
  private final class PieceEncoder(modelB: Broadcast[UnigramModel])
      extends (Seq[String] => Seq[String]) with Serializable {
    @transient private lazy val memo =
      new java.util.concurrent.ConcurrentHashMap[String, Array[String]]()
    override def apply(words: Seq[String]): Seq[String] =
      if (words == null) Seq.empty
      else {
        val out = Seq.newBuilder[String]
        words.foreach { w =>
          var t = memo.get(w)
          if (t == null) {
            // no marker stripping here: losslessness must hold verbatim
            // for ANY input word (an embedded ▁ segments via the char
            // piece or the unk fallback; only the LEARNER strips, to
            // keep its dictionary's marker semantics clean)
            t = encodeWord(WordStart + w, modelB.value.scoreOf,
              modelB.value.maxPieceLen)
            memo.put(w, t)
          }
          out ++= t
        }
        out.result()
      }
  }

  private final class PieceIdEncoder(modelB: Broadcast[UnigramModel])
      extends (Seq[String] => Seq[Int]) with Serializable {
    @transient private lazy val memo =
      new java.util.concurrent.ConcurrentHashMap[String, Array[Int]]()
    override def apply(words: Seq[String]): Seq[Int] =
      if (words == null) Seq.empty
      else {
        val m = modelB.value
        val out = Seq.newBuilder[Int]
        words.foreach { w =>
          var t = memo.get(w)
          if (t == null) {
            t = encodeWord(WordStart + w, m.scoreOf, m.maxPieceLen)
              .map(p => m.idOf.getOrElse(p, 0))
            memo.put(w, t)
          }
          out ++= t
        }
        out.result()
      }
  }

  /** Apply the model to every document: adds `uni_pieces` (subword
    * strings; each word's first piece starts with [[WordStart]]) and
    * `n_uni_pieces`. Scan-side Column projection — broadcast scores, no
    * shuffle, no RDD round-trip.
    */
  def applyUnigram(docs: DataFrame, textCol: String,
                   model: UnigramModel): DataFrame = {
    require(!docs.columns.contains("uni_pieces") &&
      !docs.columns.contains("n_uni_pieces"),
      "applyUnigram reserves output columns uni_pieces, n_uni_pieces")
    val modelB = docs.sparkSession.sparkContext.broadcast(model)
    val enc = udf(new PieceEncoder(modelB): Seq[String] => Seq[String])
    docs.withColumn("uni_pieces",
        enc(TextAnalysis.nonEmptyTokens(col(textCol))))
      .withColumn("n_uni_pieces", size(col("uni_pieces")).cast("long"))
  }

  /** As [[applyUnigram]] but emits vocabulary ids (`uni_ids`; unknown
    * single-char fallback pieces map to 0 = `&lt;unk&gt;`) and
    * `n_uni_pieces` — the dataloader-ready form.
    */
  def applyUnigramIds(docs: DataFrame, textCol: String,
                      model: UnigramModel): DataFrame = {
    require(!docs.columns.contains("uni_ids") &&
      !docs.columns.contains("n_uni_pieces"),
      "applyUnigramIds reserves output columns uni_ids, n_uni_pieces")
    val modelB = docs.sparkSession.sparkContext.broadcast(model)
    val enc = udf(new PieceIdEncoder(modelB): Seq[String] => Seq[Int])
    docs.withColumn("uni_ids",
        enc(TextAnalysis.nonEmptyTokens(col(textCol))))
      .withColumn("n_uni_pieces", size(col("uni_ids")).cast("long"))
  }
}
