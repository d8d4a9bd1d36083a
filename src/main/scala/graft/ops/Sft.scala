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
}
