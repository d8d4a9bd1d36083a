package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Supervised-fine-tuning data assembly: render multi-turn conversations
  * through a deterministic chat template and emit the LOSS-MASK spans —
  * the character ranges a trainer computes loss on (conventionally the
  * assistant turns; everything else is context). The reference engine
  * has no conversation surface; this is pipeline extension surface, the
  * step between curation and [[graft.ops.Bpe]]-style tokenization
  * (char spans compose with any tokenizer whose encoder tracks source
  * offsets — the mask needs no re-derivation per tokenizer).
  *
  * Template, fixed and versionable: each turn renders as
  * `<|role|>` + text + `\n`; the span for a masked turn covers EXACTLY
  * the text segment (tag and newline excluded), as `start:end`
  * half-open CHARACTER (code point) offsets into the rendered string,
  * CSV-joined in turn order (scalar output — the driver comparator
  * cannot sort array columns).
  *
  * Scale shape: ONE conversation-keyed hash aggregate (collect + in-agg
  * sort of that conversation's turns), then the render + span fold is a
  * scan-side `aggregate` over the sorted struct array — no window over
  * the corpus, no second shuffle, no UDF closure state. Per-group state
  * is one conversation's turns — the same bound the pack-assembly walk
  * documents; a conversation is a training example and must fit one
  * task by definition.
  */
object Sft {

  /** Render conversations and derive loss-mask spans.
    *
    * Input: one row per turn. `orderCol` orders turns within a
    * conversation (ties break on (role, text) — keep it unique for
    * meaningful data). Null text renders as the empty string (span
    * `s:s` — kept, so turn counts stay honest). Output, one row per
    * conversation: (conv, n_turns, text, mask_spans, masked_chars).
    */
  def renderChat(turns: DataFrame, convCol: String, orderCol: String,
                 roleCol: String, textCol: String,
                 maskRole: String = "assistant"): DataFrame = {
    val collected = turns.groupBy(col(convCol).as("conv")).agg(
      sort_array(collect_list(struct(
        col(orderCol).as("o"),
        col(roleCol).cast("string").as("role"),
        coalesce(col(textCol).cast("string"), lit("")).as("txt")))).as("__ts"))
    val zero = struct(lit("").as("txt"), lit(0).as("off"),
      array().cast("array<string>").as("spans"), lit(0).as("masked"))
    val folded = aggregate(col("__ts"), zero, (acc, t) => {
      val tag = concat(lit("<|"), t.getField("role"), lit("|>"))
      val txt = t.getField("txt")
      val start = acc.getField("off") + length(tag)
      val end = start + length(txt)
      val isMask = t.getField("role") === lit(maskRole)
      struct(
        concat(acc.getField("txt"), tag, txt, lit("\n")).as("txt"),
        (end + lit(1)).as("off"),
        when(isMask, concat(acc.getField("spans"),
            array(concat(start.cast("string"), lit(":"), end.cast("string")))))
          .otherwise(acc.getField("spans")).as("spans"),
        (acc.getField("masked") + when(isMask, length(txt)).otherwise(lit(0)))
          .as("masked"))
    })
    collected
      .select(col("conv"), size(col("__ts")).as("n_turns"),
        folded.as("__acc"))
      .select(col("conv"), col("n_turns"),
        col("__acc.txt").as("text"),
        concat_ws(",", col("__acc.spans")).as("mask_spans"),
        col("__acc.masked").as("masked_chars"))
  }

  /** Fill-in-the-middle transform (Bavarian et al. 2022): split each
    * document at two code-point offsets into (prefix, middle, suffix)
    * and re-serialize with sentinel tags so a causal LM learns infill —
    * PSM order `<|fim_pre|>prefix<|fim_suf|>suffix<|fim_mid|>middle`
    * (the paper's default: the middle moves to the END so its loss is
    * ordinary next-token loss), or SPM (`spm = true`) leading with the
    * suffix. The split points come from CALLER-SUPPLIED fraction
    * columns in [0, 1] (cut k = floor(p·len) code points) — determinism
    * and oracle replay live with the caller (id arithmetic, a hash, or
    * literal fractions for an every-doc transform); a null or
    * out-of-range fraction RAISES (scan-side `raise_error`) rather than
    * silently emitting clipped/empty parts that would break the pinned
    * round-trip; the two fractions
    * are ordered internally, so argument order never matters. The
    * concatenation of the three parts is always EXACTLY the original
    * text (round-trip property, spec-pinned). Returns (id, fim_text,
    * n_prefix, n_middle, n_suffix) in code points; null text → empty
    * parts. Pure scan-side Column algebra — no UDF, no shuffle.
    */
  def fimTransform(docs: DataFrame, textCol: String, idCol: String,
                   p1: Column, p2: Column,
                   spm: Boolean = false): DataFrame = {
    val txt = coalesce(col(textCol).cast("string"), lit(""))
    val n = length(txt)
    // refuse-loudly contract check: a null / NaN / out-of-range fraction
    // would otherwise clip silently into empty parts
    def checked(p: Column): Column = {
      val d = p.cast("double")
      when(d.isNull || d.isNaN || d < 0 || d > 1,
        raise_error(concat(lit("fimTransform: fraction out of [0, 1]: "),
          coalesce(d.cast("string"), lit("null"))))).otherwise(d)
    }
    val (c1, c2) = (checked(p1), checked(p2))
    val lo = floor(least(c1, c2) * n).cast("int")
    val hi = floor(greatest(c1, c2) * n).cast("int")
    docs.select(col(idCol), txt.as("__t"), lo.as("__lo"), hi.as("__hi"))
      .select(col(idCol),
        col("__t").substr(lit(1), col("__lo")).as("__p"),
        col("__t").substr(col("__lo") + 1, col("__hi") - col("__lo"))
          .as("__m"),
        col("__t").substr(col("__hi") + 1,
          length(col("__t")) - col("__hi")).as("__s"))
      .select(col(idCol),
        (if (spm)
          concat(lit("<|fim_suf|>"), col("__s"), lit("<|fim_pre|>"),
            col("__p"), lit("<|fim_mid|>"), col("__m"))
        else
          concat(lit("<|fim_pre|>"), col("__p"), lit("<|fim_suf|>"),
            col("__s"), lit("<|fim_mid|>"), col("__m"))).as("fim_text"),
        length(col("__p")).as("n_prefix"),
        length(col("__m")).as("n_middle"),
        length(col("__s")).as("n_suffix"))
  }

  /** DPO/RLHF preference-pair assembly: from scored candidate responses
    * (one row per (prompt, response)), build (chosen, rejected) training
    * pairs.
    *
    *  - Default (best-worst): ONE pair per prompt — chosen = the
    *    highest-scored response (ties → smallest response id), rejected
    *    = the lowest-scored (ties → LARGEST id, so an all-tied prompt
    *    still yields two distinct responses); prompts with fewer than 2
    *    responses or a score gap below `minGap` are dropped.
    *  - `allPairs = true`: every ordered pair with `chosen` STRICTLY
    *    better and gap ≥ `minGap` (ties never pair — both orientations
    *    of a tie would otherwise appear). The ranking-to-pairwise
    *    expansion used when a reward model scores many samples.
    *
    * Returns (prompt, chosen_id, rejected_id, chosen_text,
    * rejected_text, score_gap).
    *
    * Scale shape: best-worst is ONE prompt-keyed hash aggregate (two
    * max_by/min_by over (score, −id) structs — no window, no
    * self-join); all-pairs is one co-partitioned self-equi-join on
    * prompt, output bounded by each prompt's own response count squared
    * — a prompt's sample set is small by construction (it is one
    * training prompt), the same per-group bound renderChat documents.
    */
  def preferencePairs(responses: DataFrame, promptCol: String,
                      respIdCol: String, textCol: String, scoreCol: String,
                      minGap: Double = 0.0,
                      allPairs: Boolean = false): DataFrame = {
    require(minGap >= 0, s"minGap must be >= 0: $minGap")
    val r = responses.select(col(promptCol).as("prompt"),
      col(respIdCol).cast("long").as("rid"),
      coalesce(col(textCol).cast("string"), lit("")).as("txt"),
      col(scoreCol).cast("double").as("score"))
    if (allPairs) {
      val a = r.select(col("prompt"), col("rid").as("chosen_id"),
        col("txt").as("chosen_text"), col("score").as("__sa"))
      val b = r.select(col("prompt"), col("rid").as("rejected_id"),
        col("txt").as("rejected_text"), col("score").as("__sb"))
      a.join(b, Seq("prompt"))
        .filter(col("__sa") > col("__sb") &&
          col("__sa") - col("__sb") >= minGap)
        .select(col("prompt"), col("chosen_id"), col("rejected_id"),
          col("chosen_text"), col("rejected_text"),
          (col("__sa") - col("__sb")).as("score_gap"))
    } else {
      r.groupBy("prompt").agg(
          count(lit(1)).as("__n"),
          max_by(struct(col("rid"), col("txt"), col("score")),
            struct(col("score"), negate(col("rid")))).as("__c"),
          min_by(struct(col("rid"), col("txt"), col("score")),
            struct(col("score"), negate(col("rid")))).as("__r"))
        .filter(col("__n") >= 2 &&
          col("__c.score") - col("__r.score") >= minGap &&
          col("__c.rid") =!= col("__r.rid"))
        .select(col("prompt"),
          col("__c.rid").as("chosen_id"), col("__r.rid").as("rejected_id"),
          col("__c.txt").as("chosen_text"), col("__r.txt").as("rejected_text"),
          (col("__c.score") - col("__r.score")).as("score_gap"))
    }
  }

  /** Bradley–Terry preference-strength fit (Bradley & Terry 1952, via
    * Hunter 2004's MM iteration) over pairwise battle outcomes — the
    * arena-style ranking step of an alignment pipeline: given (winner,
    * loser) rows (human preferences, reward-model verdicts, A/B
    * evals), fit strengths π with P(i beats j) = π_i/(π_i + π_j).
    * Fixed `iters` MM rounds from the uniform start — each round
    * {{{ π_i ← W_i / Σ_{j≠i} n_ij/(π_i + π_j) }}} then normalize to
    * Σπ = 1 — with every strength ROUNDED to 9 decimals after each
    * round, so the trajectory is bit-reproducible and replayable by a
    * SQL oracle (the [[graft.ops.Graph.labelPropagation]] discipline:
    * determinism beats the last ulp of convergence). Returns (model,
    * strength, wins, battles) for every model that appears, strengths
    * summing to ~1. A model with zero wins fits π → 0; the comparison
    * graph need not be complete (disconnected components rank only
    * relative to themselves — standard BT behavior, documented not
    * hidden).
    *
    * Scale shape: battles aggregate to pair counts in ONE hash
    * aggregate (models² tiny rows by contract — these are MODELS, not
    * documents; `maxModels` refuses a frame that is actually a corpus,
    * the [[graft.ops.Similarity.dendrogram]] convention), and the MM
    * iteration is O(iters · models²) driver arithmetic.
    */
  def bradleyTerry(battles: DataFrame, winnerCol: String, loserCol: String,
                   iters: Int = 10, maxModels: Int = 1024): DataFrame = {
    require(iters >= 1, s"bradleyTerry: iters=$iters")
    require(maxModels >= 2, s"bradleyTerry: maxModels=$maxModels")
    val spark = battles.sparkSession
    import spark.implicits._
    val grouped = battles.select(
        coalesce(col(winnerCol).cast("string"), lit("__null__")).as("w"),
        coalesce(col(loserCol).cast("string"), lit("__null__")).as("l"))
      .filter(col("w") =!= col("l"))
      .groupBy("w", "l").agg(count(lit(1)).as("n"))
      .localCheckpoint()
    // guard BEFORE collecting: the distinct-model census runs on the
    // cluster, so a corpus-shaped frame refuses without ever pulling
    // its (potentially corpus-sized) pair table onto the driver
    val nModels = grouped.select(col("w").as("m"))
      .unionByName(grouped.select(col("l").as("m")))
      .distinct().count()
    require(nModels > 0, "bradleyTerry: no battles")
    require(nModels <= maxModels,
      s"bradleyTerry: $nModels models exceed maxModels=$maxModels " +
        "— this expects model identifiers, not a document corpus")
    val pairRows = grouped
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2)))
    val models = pairRows.flatMap { case ((w, l), _) => Seq(w, l) }
      .distinct.sorted
    val winsOver = pairRows.toMap.withDefaultValue(0L)
    def nBetween(a: String, b: String) = winsOver((a, b)) + winsOver((b, a))
    // one pass over the pair table for the win totals (not one scan
    // per model — O(pairs), review-fixed)
    val wins = {
      val acc = scala.collection.mutable.Map.empty[String, Long]
        .withDefaultValue(0L)
      pairRows.foreach { case ((w, _), n) => acc(w) += n }
      models.map(m => m -> acc(m)).toMap
    }
    def r9(x: Double) = Num.round9(x)
    var pi = models.map(_ => 1.0 / models.length)
    var it = 0
    while (it < iters) {
      val raw = models.zipWithIndex.map { case (m, i) =>
        val den = models.zipWithIndex.collect {
          // the pi(i)+pi(j) > 0 guard keeps a pathological pair of
          // rounded-to-zero strengths from injecting Infinity into the
          // sum; the SQL oracle replays the same skip rule
          case (o, j) if j != i && nBetween(m, o) > 0 &&
              pi(i) + pi(j) > 0 =>
            nBetween(m, o) / (pi(i) + pi(j))
        }.sum
        if (den > 0) wins(m) / den else 0.0
      }
      val s = raw.sum
      pi = if (s > 0) raw.map(x => r9(x / s)) else raw
      it += 1
    }
    val battleCounts = {
      val acc = scala.collection.mutable.Map.empty[String, Long]
        .withDefaultValue(0L)
      pairRows.foreach { case ((w, l), n) => acc(w) += n; acc(l) += n }
      acc
    }
    models.zipWithIndex.map { case (m, i) =>
      (m, pi(i), wins(m), battleCounts(m))
    }.toSeq.toDF("model", "strength", "wins", "battles")
  }

  /** Elo rating trail (Elo 1978) over an ORDERED battle log — the
    * online counterpart of [[bradleyTerry]]: each battle moves the
    * winner up and the loser down by K·(1 − E_w) with
    * E_w = 1/(1 + 10^((R_l − R_w)/400)). Order-dependence is the
    * point (recency matters in arena leaderboards), so `orderCol`
    * values must be UNIQUE — a duplicate makes the fold
    * nondeterministic and refuses loudly (the FFD sort-key
    * discipline). The expected score and both updated ratings are
    * ROUNDED to 9 decimals at each step, so the trajectory is
    * bit-reproducible and a chained-CTE SQL oracle replays it
    * exactly.
    *
    * Scale shape: Elo is inherently SEQUENTIAL — there is no
    * associative decomposition, so the log is sorted and folded on
    * the driver. That is honest, not lazy: arena logs are
    * human-preference volumes (10^5..10^6 rows), bounded here by
    * `maxBattles`; a frame that is actually a corpus refuses with
    * the [[bradleyTerry]] message. For corpus-scale preference data
    * use [[bradleyTerry]], whose pair-count aggregate distributes.
    */
  def eloRatings(battles: DataFrame, winnerCol: String, loserCol: String,
                 orderCol: String, k: Double = 32.0,
                 initial: Double = 1000.0,
                 maxBattles: Int = 2000000): DataFrame = {
    require(k > 0, s"eloRatings: k=$k")
    require(maxBattles >= 1, s"eloRatings: maxBattles=$maxBattles")
    val spark = battles.sparkSession
    import spark.implicits._
    def r9(x: Double) = Num.round9(x)
    // the order column keeps its native type — a string cast would
    // re-order numeric sequences ("10" < "9") away from the oracle's
    val picked = battles.select(
        col(orderCol).as("o"),
        coalesce(col(winnerCol).cast("string"), lit("__null__")).as("w"),
        coalesce(col(loserCol).cast("string"), lit("__null__")).as("l"))
      .filter(col("w") =!= col("l"))
    val n = picked.count()
    require(n > 0, "eloRatings: no battles")
    require(n <= maxBattles,
      s"eloRatings: $n battles exceed maxBattles=$maxBattles — the Elo " +
        "fold is inherently sequential (driver-side); use bradleyTerry " +
        "for corpus-scale preference data")
    val log = picked.orderBy(col("o")).collect()
      .map(r => (r.get(0), r.getString(1), r.getString(2)))
    require(log.map(_._1).distinct.length == log.length,
      "eloRatings: duplicate orderCol values make the sequential fold " +
        "nondeterministic — supply a unique ordering")
    var ratings = Map.empty[String, Double].withDefaultValue(initial)
    var tally = Map.empty[String, (Long, Long)].withDefaultValue((0L, 0L))
    log.foreach { case (_, w, l) =>
      val (rw, rl) = (ratings(w), ratings(l))
      val ew = r9(1.0 / (1.0 + math.pow(10.0, (rl - rw) / 400.0)))
      ratings += w -> r9(rw + k * (1.0 - ew))
      ratings += l -> r9(rl - k * (1.0 - ew))
      tally += w -> (tally(w) match { case (a, b) => (a + 1, b) })
      tally += l -> (tally(l) match { case (a, b) => (a, b + 1) })
    }
    tally.keys.toSeq.sorted.map { m =>
      val (wi, lo) = tally(m)
      (m, ratings(m), wi, lo, wi + lo)
    }.toDF("model", "rating", "wins", "losses", "battles")
  }
}
