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
                        minCount: Long = 2L): Seq[(String, String)] =
    learnCore(wordFreq, numMerges, minCount, marker = true)

  /** The merge loop WITHOUT the end-of-word marker — the byte-level
    * (GPT-2) formulation, where pieces already carry their own boundary
    * information (whitespace runs are pieces) and a marker symbol would
    * re-introduce the text-collides-with-marker ambiguity the id stream
    * must not have.
    */
  def learnFromPieceFreq(pieceFreq: Seq[(String, Long)], numMerges: Int,
                         minCount: Long = 2L): Seq[(String, String)] =
    learnCore(pieceFreq, numMerges, minCount, marker = false)

  private def learnCore(wordFreq: Seq[(String, Long)], numMerges: Int,
                        minCount: Long, marker: Boolean): Seq[(String, String)] = {
    // each word as a mutable symbol sequence: chars (+ the end marker)
    val words: Array[(Array[String], Long)] = wordFreq.iterator
      .map { case (w, n) =>
        val chars = w.map(_.toString).toArray
        (if (marker) chars :+ EndOfWord else chars, n)
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
  def encodeWord(word: String, ranks: Map[(String, String), Int]): Array[String] =
    greedyEncode(word.map(_.toString).toArray :+ EndOfWord, ranks)

  /** [[encodeWord]] WITHOUT the end-of-word marker — the byte-level
    * piece form (see [[learnFromPieceFreq]]).
    */
  def encodePiece(piece: String, ranks: Map[(String, String), Int]): Array[String] =
    greedyEncode(piece.map(_.toString).toArray, ranks)

  private def greedyEncode(init: Array[String],
                           ranks: Map[(String, String), Int]): Array[String] = {
    var s: Array[String] = init
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

  // ------------------------------------------------------------ byte level

  /** GPT-2's byte↔unicode bijection (Radford et al. 2019, the published
    * `bytes_to_unicode` table): the 188 printable latin-1 bytes map to
    * themselves and the other 68 to U+0100… in ascending byte order
    * (space → U+0120 'Ġ', newline → U+010A 'Ċ'). Every UTF-8 byte
    * becomes exactly one BMP char, so the char-level merge machinery
    * covers ARBITRARY text — emoji, any script, control bytes — with no
    * unknown symbol, ever; that totality is why every modern LLM
    * tokenizer is byte-level.
    */
  private[graft] val ByteToChar: Array[Char] = {
    val keep = ((0x21 to 0x7e) ++ (0xa1 to 0xac) ++ (0xae to 0xff)).toSet
    val arr = new Array[Char](256)
    var n = 0
    (0 until 256).foreach { b =>
      if (keep(b)) arr(b) = b.toChar
      else { arr(b) = (256 + n).toChar; n += 1 }
    }
    arr
  }
  private[graft] val CharToByte: Map[Char, Int] =
    ByteToChar.zipWithIndex.map { case (c, b) => c -> b }.toMap

  /** The full 256-symbol byte alphabet — pass as `extraAlphabet` to
    * [[vocabFromMerges]] so byte-level ids can never hit `<unk>`.
    */
  val ByteAlphabet: Seq[String] = ByteToChar.map(_.toString).toSeq

  def byteEncode(s: String): String = {
    val bs = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val out = new Array[Char](bs.length)
    var i = 0
    while (i < bs.length) { out(i) = ByteToChar(bs(i) & 0xff); i += 1 }
    new String(out)
  }

  def byteDecode(s: String): String = {
    val out = new Array[Byte](s.length)
    var i = 0
    while (i < s.length) {
      out(i) = CharToByte.getOrElse(s.charAt(i), throw new IllegalArgumentException(
        s"byteDecode: char U+${s.charAt(i).toInt.toHexString} is not in the byte alphabet")).toByte
      i += 1
    }
    new String(out, java.nio.charset.StandardCharsets.UTF_8)
  }

  /** Byte-level pieces: alternating whitespace / non-whitespace runs,
    * each [[byteEncode]]d — so `byteDecode(pieces).mkString` reproduces
    * the document EXACTLY (whitespace included), with no end-of-word
    * marker anywhere to collide with document text.
    *
    * `gpt2Split = true` uses the PUBLISHED GPT-2 pre-tokenizer regex
    * instead (Radford et al. 2019; the tiktoken `gpt2` pattern):
    * contractions split off, a single leading space attaches to its
    * word/number/punct run (the Ġ-prefixed tokens), trailing whitespace
    * runs kept whole. Both splitters PARTITION the text (every char in
    * exactly one piece), so the byte-exact decode contract is identical.
    */
  def byteLevelPieces(text: String, gpt2Split: Boolean = false): Seq[String] =
    if (text == null || text.isEmpty) Seq.empty
    else (if (gpt2Split) Gpt2Piece else ByteLevelPiece)
      .findAllIn(text).map(byteEncode).toSeq
  private val ByteLevelPiece = "(?s)\\s+|\\S+".r
  // (?U) = UNICODE_CHARACTER_CLASS: Java's \s is ASCII-only by default,
  // so without it Unicode whitespace (NBSP, ideographic space) would fall
  // into the punctuation alternative instead of the whitespace runs —
  // diverging from the published pattern's Python `re` semantics
  private val Gpt2Piece =
    ("(?U)'s|'t|'re|'ve|'m|'ll|'d| ?\\p{L}+| ?\\p{N}+" +
      "| ?[^\\s\\p{L}\\p{N}]+|\\s+(?!\\S)|\\s+").r

  /** Byte-level BPE training: piece-frequency census over the corpus
    * (same ONE-job bounded-dictionary shape as [[learnBpe]]) + the
    * marker-free driver merge loop.
    */
  def learnBpeByteLevel(docs: DataFrame, textCol: String, numMerges: Int,
                        maxWords: Int = 50000,
                        minCount: Long = 2L,
                        gpt2Split: Boolean = false): Seq[(String, String)] = {
    require(numMerges > 0, s"numMerges must be positive: $numMerges")
    require(maxWords > 0, s"maxWords must be positive: $maxWords")
    val spark = docs.sparkSession
    import spark.implicits._
    val pieces = udf((t: String) => byteLevelPieces(t, gpt2Split))
    val freq: Array[(String, Long)] = docs
      .select(explode(pieces(col(textCol))).as("__p"))
      .groupBy("__p").agg(count(lit(1)).as("__n"))
      .orderBy(col("__n").desc, col("__p"))
      .limit(maxWords)
      .as[(String, Long)].collect()
    learnFromPieceFreq(freq, numMerges, minCount)
  }

  /** Whole-text byte-level id encoder: pieces → marker-free greedy merge
    * → vocabulary ids, with the per-task piece memo of [[WordIdEncoder]].
    */
  private final class ByteIdEncoder(
      stateB: Broadcast[(Map[(String, String), Int], Map[String, Int])],
      gpt2Split: Boolean)
      extends (String => Seq[Int]) with Serializable {
    @transient private lazy val memo =
      new java.util.concurrent.ConcurrentHashMap[String, Array[Int]]()
    override def apply(text: String): Seq[Int] = {
      val (ranks, ids) = stateB.value
      val out = Seq.newBuilder[Int]
      byteLevelPieces(text, gpt2Split).foreach { p =>
        var t = memo.get(p)
        if (t == null) {
          t = encodePiece(p, ranks).map(s => ids.getOrElse(s, 0))
          memo.put(p, t)
        }
        out ++= t
      }
      out.result()
    }
  }

  /** Byte-level apply: adds `bpe_ids` + `n_bpe_tokens`. With a vocab
    * built over [[ByteAlphabet]], ids are NEVER `<unk>` and
    * [[decodeByteLevelIds]] reproduces the document byte-exactly —
    * the lossless-dataloader contract word-level BPE cannot make.
    */
  def applyBpeIdsByteLevel(docs: DataFrame, textCol: String,
                           merges: Seq[(String, String)],
                           vocab: Seq[String],
                           gpt2Split: Boolean = false): DataFrame = {
    require(!docs.columns.contains("bpe_ids") &&
      !docs.columns.contains("n_bpe_tokens"),
      "applyBpeIdsByteLevel reserves output columns bpe_ids, n_bpe_tokens")
    val ranks: Map[(String, String), Int] =
      merges.zipWithIndex.map { case (p, i) => p -> i }.toMap
    val ids: Map[String, Int] = vocab.zipWithIndex.toMap
    val stateB = docs.sparkSession.sparkContext.broadcast((ranks, ids))
    val enc = udf(new ByteIdEncoder(stateB, gpt2Split): String => Seq[Int])
    docs.withColumn("bpe_ids", enc(col(textCol)))
      .withColumn("n_bpe_tokens", size(col("bpe_ids")).cast("long"))
  }

  /** Exact inverse of the byte-level id stream: symbols concatenate and
    * byte-decode straight back to the document — no marker, no
    * ambiguity, no whitespace loss.
    */
  def decodeByteLevelIds(ids: Seq[Int], vocab: Seq[String]): String =
    byteDecode(ids.map(vocab).mkString)

  /** [[decodeByteLevelIds]] over PACKED training rows — the dataloader's
    * inverse of `Sampling.assemblePackedIdsFFD` + byte-level encode: each
    * pack's id stream splits on `sepId` (every document is
    * sep-terminated by the assembler), segments zip with the pack's
    * `doc_ids` in placement order, and each segment byte-decodes through
    * the vocabulary. `sepId` must be outside the vocabulary id space
    * (`vocab.size` by convention — the encoder can then never emit it
    * inside a document, so the split is unambiguous); a pack whose
    * segment count disagrees with its doc_ids raises rather than
    * misattributing text. Returns one (doc_id, text) row per packed
    * document — the read-back leg that proves encode → pack → shard →
    * write → read → decode is byte-lossless END-TO-END.
    *
    * Scale shape: one broadcast of the bounded vocabulary + a per-pack
    * projection and explode — no shuffle beyond the caller's own reads.
    */
  def decodePackedByteLevel(packs: DataFrame, packedCol: String,
                            docIdsCol: String, vocab: Seq[String],
                            sepId: Int): DataFrame = {
    require(sepId >= vocab.size || sepId < 0,
      s"decodePackedByteLevel: sepId=$sepId collides with the " +
        s"vocabulary id space [0, ${vocab.size}) — the segment split " +
        "would be ambiguous")
    val vocabB = packs.sparkSession.sparkContext.broadcast(vocab.toArray)
    val dec = udf(new PackDecoder(vocabB, sepId):
      (Seq[Int], Seq[Long]) => Seq[(Long, String)])
    packs.select(explode(dec(col(packedCol).cast("array<int>"),
        col(docIdsCol).cast("array<long>"))).as("__seg"))
      .select(col("__seg._1").as("doc_id"), col("__seg._2").as("text"))
  }

  private final class PackDecoder(vocabB: Broadcast[Array[String]],
                                  sepId: Int)
      extends ((Seq[Int], Seq[Long]) => Seq[(Long, String)])
      with Serializable {
    override def apply(ids: Seq[Int], docs: Seq[Long]): Seq[(Long, String)] = {
      val v = vocabB.value
      val out = Seq.newBuilder[(Long, String)]
      val sb = new StringBuilder
      var d = 0
      ids.foreach { i =>
        if (i == sepId) {
          require(d < docs.length,
            s"pack decode: more sep-terminated segments than doc_ids " +
              s"(${docs.length})")
          out += ((docs(d), byteDecode(sb.toString)))
          sb.clear(); d += 1
        } else sb.append(v(i))
      }
      require(d == docs.length && sb.isEmpty,
        s"pack decode: $d complete segments for ${docs.length} doc_ids " +
          s"(trailing ${sb.length} unterminated symbols) — the pack and " +
          "its membership list disagree")
      out.result()
    }
  }
}
