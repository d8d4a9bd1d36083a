package graft.ops

import org.apache.spark.sql.DataFrame
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
}
