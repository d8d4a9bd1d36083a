package graft.ops

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer training and application (Sennrich et
  * al. 2016, "Neural Machine Translation of Rare Words with Subword
  * Units" — the standard subword vocabulary construction for LLM
  * pretraining corpora; GPT-2-style greedy rank application).
  *
  * Scale design (100 TB): BPE training does NOT iterate over the corpus.
  * The corpus is scanned ONCE into a word-frequency dictionary (a
  * hash-aggregate; the heavy shuffle carries (word, count) pairs, and
  * `maxWords` caps the dictionary at the top-frequency words — the
  * published practice, since pair statistics from the frequency dict are
  * exact regardless of corpus size). The merge loop then runs on the
  * DRIVER over that bounded dictionary — O(maxWords · avgLen) state,
  * parameter-bounded like the k-means / DSIR / heavy-hitter fits, never
  * O(corpus). Application is embarrassingly parallel: the learned merge
  * ranks broadcast (numMerges entries) and a broadcast-closure UDF
  * encodes each row's words with a per-task word→tokens memo (Zipf makes
  * the hit rate high), so the corpus is read once and nothing shuffles.
  * The apply path is a Column projection over the scan — not an RDD
  * round-trip — so it stays inside Catalyst planning (projection pruning,
  * whole-stage codegen around the UDF call) and works in Structured
  * Streaming transforms. Tokenization on BOTH the learn and apply sides
  * is the same Spark expression ([[TextAnalysis.tokens]]: `lower` +
  * whitespace `split`), so words seen at train time match words seen at
  * apply time under any JVM default locale.
  */
object Bpe {

  /** End-of-word marker (Sennrich et al. 2016 §3.2). Kept out of the
    * character alphabet by construction — corpus words are whitespace
    * tokens, which cannot contain whitespace, let alone "&lt;/w&gt;".
    */
  val EndOfWord = "</w>"

  /** Train `numMerges` BPE merges from the corpus word-frequency
    * dictionary. One Spark job (word hash-agg, top-`maxWords` by count,
    * deterministic count-then-word tie-break), then the classic driver
    * merge loop: repeatedly merge the most frequent adjacent symbol pair
    * (ties broken lexicographically so the result is engine-stable),
    * stopping early when no pair occurs at least `minCount` times.
    *
    * Returns the merges in rank order: (left, right), rank = index.
    */
  def learnBpe(docs: DataFrame, textCol: String, numMerges: Int,
               maxWords: Int = 50000, minCount: Long = 2L): Seq[(String, String)] = {
    require(numMerges > 0, s"numMerges must be positive: $numMerges")
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
    learnFromWordFreq(wordFreq, numMerges, minCount)
  }

  /** The driver merge loop on an explicit word-frequency dictionary —
    * split out so specs can drive it with hand-built dictionaries (the
    * published "low/lower/newest/widest" example).
    */
  def learnFromWordFreq(wordFreq: Seq[(String, Long)], numMerges: Int,
                        minCount: Long = 2L): Seq[(String, String)] = {
    // each word as a mutable symbol sequence: chars + the end marker
    val words: Array[(Array[String], Long)] = wordFreq.iterator
      .map { case (w, n) =>
        (w.map(_.toString).toArray :+ EndOfWord, n)
      }.toArray
    val merges = Seq.newBuilder[(String, String)]
    var syms: Array[Array[String]] = words.map(_._1)
    val freqs: Array[Long] = words.map(_._2)
    var done = false
    var it = 0
    while (it < numMerges && !done) {
      // count adjacent pairs weighted by word frequency. A full recount
      // per merge is O(dict tokens) — fine for a parameter-bounded dict;
      // the incremental-update optimization (only words containing the
      // merged pair change) is a constant-factor refinement, not a
      // complexity one.
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      var wi = 0
      while (wi < syms.length) {
        val s = syms(wi); val f = freqs(wi)
        var i = 0
        while (i < s.length - 1) {
          val p = (s(i), s(i + 1))
          counts.update(p, counts.getOrElse(p, 0L) + f)
          i += 1
        }
        wi += 1
      }
      val best = counts.iterator.filter(_._2 >= minCount)
        .reduceOption { (a, b) =>
          if (a._2 != b._2) { if (a._2 > b._2) a else b }
          // deterministic tie-break: lexicographically smallest pair
          else if (Ordering[(String, String)].lt(a._1, b._1)) a else b
        }
      best match {
        case None => done = true
        case Some(((l, r), _)) =>
          merges += ((l, r))
          val fused = l + r
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
      }
      it += 1
    }
    merges.result()
  }

  /** Learned merges as a frame: (rank, left, right) — the persistable
    * artifact (write it next to the corpus; `applyBpe` takes the Seq).
    */
  def mergesDf(spark: SparkSession, merges: Seq[(String, String)]): DataFrame = {
    import spark.implicits._
    merges.zipWithIndex
      .map { case ((l, r), i) => (i.toLong, l, r) }
      .toDF("rank", "left", "right")
  }

  /** Rehydrate [[mergesDf]] output (e.g. read back from parquet next to
    * the corpus) into the rank-ordered merge list [[applyBpe]] consumes.
    */
  def mergesFromDf(df: DataFrame): Seq[(String, String)] =
    df.select("rank", "left", "right").collect()
      .sortBy(_.getLong(0))
      .map(r => (r.getString(1), r.getString(2))).toSeq

  /** Tokenize one word (no whitespace) with greedy lowest-rank merging —
    * GPT-2-style application: repeatedly fuse the occurrence of the
    * best-ranked learned pair until none applies.
    */
  def encodeWord(word: String, ranks: Map[(String, String), Int]): Array[String] = {
    var s: Array[String] = word.map(_.toString).toArray :+ EndOfWord
    var continue = s.length > 1
    while (continue) {
      var bestRank = Int.MaxValue
      var i = 0
      while (i < s.length - 1) {
        val r = ranks.getOrElse((s(i), s(i + 1)), Int.MaxValue)
        if (r < bestRank) bestRank = r
        i += 1
      }
      if (bestRank == Int.MaxValue) continue = false
      else {
        val (l, fr) = {
          // recover the pair with that rank from the current sequence
          var j = 0; var li = -1
          while (j < s.length - 1 && li < 0) {
            if (ranks.getOrElse((s(j), s(j + 1)), Int.MaxValue) == bestRank) li = j
            j += 1
          }
          (s(li), s(li + 1))
        }
        val fused = l + fr
        val out = Array.newBuilder[String]
        var k = 0
        while (k < s.length) {
          if (k < s.length - 1 && s(k) == l && s(k + 1) == fr) { out += fused; k += 2 }
          else { out += s(k); k += 1 }
        }
        s = out.result()
        continue = s.length > 1
      }
    }
    s
  }

  /** Deterministic subword vocabulary for a merge list: id 0 = `<unk>`,
    * id 1 = [[EndOfWord]], then the single-character alphabet in code
    * order, then each merge's fused symbol in rank order — the id space a
    * dataloader consumes. The alphabet is the characters of the merge
    * rules' own symbols plus any `extraAlphabet` the caller knows about
    * (characters only seen in never-merged words).
    */
  def vocabFromMerges(merges: Seq[(String, String)],
                      extraAlphabet: Seq[String] = Nil): Seq[String] = {
    // strip an EndOfWord SUFFIX before char-splitting: merge operands are
    // fused symbols like "est</w>" at realistic merge counts, and naive
    // char-splitting would inject spurious '<', '/', '>' alphabet entries
    val chars = (merges.flatMap { case (l, r) => Seq(l, r) }
      .flatMap(s => s.stripSuffix(EndOfWord).map(_.toString)) ++
      extraAlphabet).filterNot(_ == EndOfWord).distinct.sorted
    val fused = merges.map { case (l, r) => l + r }
    (Seq("<unk>", EndOfWord) ++ chars ++ fused).distinct
  }

  /** The words of `textCol` exactly as [[learnBpe]] saw them: the same
    * Spark `lower` + whitespace-`split` expression, empties dropped — so
    * train-time and apply-time tokenization agree by construction under
    * any JVM default locale (the Turkish-İ class of mismatch cannot
    * occur: there is only one lowercasing mechanism).
    */
  private def corpusWords(textCol: String): Column =
    TextAnalysis.nonEmptyTokens(col(textCol))

  /** Broadcast-closure word encoder behind the [[applyBpe]] UDF. Each
    * task deserializes a fresh instance, so the transient memo is
    * per-task word→subwords state (Zipf makes the hit rate high and the
    * map small — bounded by the task's distinct-word count); the merge
    * ranks ride one executor-shared broadcast.
    */
  private final class WordEncoder(ranksB: Broadcast[Map[(String, String), Int]])
      extends (Seq[String] => Seq[String]) with Serializable {
    // Concurrent: on executors each task deserializes its own instance,
    // but a LocalRelation input evaluates the UDF DRIVER-side on the one
    // original instance, possibly from several query threads at once
    @transient private lazy val memo =
      new java.util.concurrent.ConcurrentHashMap[String, Array[String]]()
    override def apply(words: Seq[String]): Seq[String] =
      if (words == null) Seq.empty
      else {
        val out = Seq.newBuilder[String]
        words.foreach { w =>
          var t = memo.get(w)
          if (t == null) { t = encodeWord(w, ranksB.value); memo.put(w, t) }
          out ++= t
        }
        out.result()
      }
  }

  /** As [[WordEncoder]], but memoizes straight to vocabulary ids
    * (unknown subwords map to 0 = `<unk>`).
    */
  private final class WordIdEncoder(
      stateB: Broadcast[(Map[(String, String), Int], Map[String, Int])])
      extends (Seq[String] => Seq[Int]) with Serializable {
    @transient private lazy val memo =
      new java.util.concurrent.ConcurrentHashMap[String, Array[Int]]()
    override def apply(words: Seq[String]): Seq[Int] =
      if (words == null) Seq.empty
      else {
        val (ranks, ids) = stateB.value
        val out = Seq.newBuilder[Int]
        words.foreach { w =>
          var t = memo.get(w)
          if (t == null) {
            t = encodeWord(w, ranks).map(s => ids.getOrElse(s, 0))
            memo.put(w, t)
          }
          out ++= t
        }
        out.result()
      }
  }

  /** Apply learned merges + map subwords to vocabulary ids: adds
    * `bpe_ids` (ints; unknown subwords map to 0 = `<unk>`) and
    * `n_bpe_tokens` — the dataloader-ready form. Same scan-side memoized
    * projection as [[applyBpe]].
    */
  def applyBpeIds(docs: DataFrame, textCol: String,
                  merges: Seq[(String, String)],
                  vocab: Seq[String]): DataFrame = {
    require(!docs.columns.contains("bpe_ids") &&
      !docs.columns.contains("n_bpe_tokens"),
      "applyBpeIds reserves output columns bpe_ids, n_bpe_tokens")
    val ranks: Map[(String, String), Int] =
      merges.zipWithIndex.map { case (p, i) => p -> i }.toMap
    val ids: Map[String, Int] = vocab.zipWithIndex.toMap
    val stateB = docs.sparkSession.sparkContext.broadcast((ranks, ids))
    val enc = udf(new WordIdEncoder(stateB): Seq[String] => Seq[Int])
    docs.withColumn("bpe_ids", enc(corpusWords(textCol)))
      .withColumn("n_bpe_tokens", size(col("bpe_ids")).cast("long"))
  }

  /** Apply learned merges to every document: returns the input columns
    * plus `bpe_tokens` (subword strings, `EndOfWord`-terminated per word)
    * and `n_bpe_tokens`. A scan-side Column projection: merge ranks
    * broadcast, one UDF pass with a per-task word→tokens memo (Zipf
    * yields high hit rates) — no shuffle, no RDD round-trip, no per-row
    * re-tokenization of repeated words.
    */
  def applyBpe(docs: DataFrame, textCol: String,
               merges: Seq[(String, String)]): DataFrame = {
    require(!docs.columns.contains("bpe_tokens") &&
      !docs.columns.contains("n_bpe_tokens"),
      "applyBpe reserves output columns bpe_tokens, n_bpe_tokens")
    val ranks: Map[(String, String), Int] =
      merges.zipWithIndex.map { case (p, i) => p -> i }.toMap
    val ranksB = docs.sparkSession.sparkContext.broadcast(ranks)
    val enc = udf(new WordEncoder(ranksB): Seq[String] => Seq[String])
    docs.withColumn("bpe_tokens", enc(corpusWords(textCol)))
      .withColumn("n_bpe_tokens", size(col("bpe_tokens")).cast("long"))
  }
}
