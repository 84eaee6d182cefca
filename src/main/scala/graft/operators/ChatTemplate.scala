package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SFT chat-template assembly — the supervised-fine-tuning data-prep step:
  * per-conversation turn rows become ONE rendered training text plus the
  * completion-only loss-mask spans (loss on the `lossRole` turns' CONTENT,
  * never on role markers or the other roles' text — the standard
  * assistant-only masking of instruction-tuning collators).
  *
  * Spans are CHARACTER offsets `[span_start, span_end)` into the rendered
  * text: the downstream tokenizer maps chars → token ids via its own offset
  * mapping, so the engine's contract stays tokenizer-agnostic — exact
  * integers an oracle can replay, not estimates tied to one vocab.
  *
  * Turn rendering is `<|role|>content` concatenated in `turnCol` order with
  * no separator, so every span boundary is a pure prefix-sum of rendered
  * lengths.
  *
  * Plan shape: ONE conversation-keyed Exchange+Sort feeds every window —
  * the running end-offset (`sum(length) ORDER BY turn`) and the
  * whole-conversation frame (rendered text via an ordered, unbounded
  * `collect_list`) share partitioning and ordering, so Catalyst plans a
  * single Window chain over a single shuffle. Per-conversation state is the
  * turn list (conversations are KB-sized by construction; the corpus never
  * concentrates on one key the way a join can). No UDFs, no driver loops.
  */
object ChatTemplate {

  /** Returns one row per `lossRole` turn:
    * (convCol, turnCol, span_start, span_end, conv_len, conv_hash) where
    * conv_len/conv_hash describe the full rendered conversation — the gate
    * verifies assembly and masking through the same rows.
    *
    * `turnCol` must order each conversation's turns UNIQUELY: ties leave
    * the rendered order (and therefore every offset) nondeterministic, the
    * same contract as any window sort key in this library.
    */
  def lossSpans(
      df: DataFrame,
      convCol: String,
      turnCol: String,
      roleCol: String,
      contentCol: String,
      lossRole: String = "assistant"): DataFrame = {
    val rendered = concat(lit("<|"), col(roleCol), lit("|>"), col(contentCol))
    val byTurn = Window.partitionBy(convCol).orderBy(turnCol)
    val wholeConv = byTurn.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    df.withColumn("_rt", rendered)
      .withColumn("_end", sum(length(col("_rt"))).over(byTurn))
      .withColumn("_conv", array_join(collect_list(col("_rt")).over(wholeConv), ""))
      .where(col(roleCol) === lossRole)
      .select(
        col(convCol), col(turnCol),
        // Mask the content only: skip the `<|role|>` marker prefix.
        (col("_end") - length(col("_rt")) + lit(s"<|$lossRole|>".length)).cast("long")
          .as("span_start"),
        col("_end").cast("long").as("span_end"),
        length(col("_conv")).cast("long").as("conv_len"),
        md5(col("_conv")).as("conv_hash"))
  }

  /** DPO/RLHF preference-pair assembly — the post-training counterpart of
    * [[lossSpans]]: each (prompt, chosen, rejected) row becomes BOTH
    * rendered sequences, sharing the exact same rendered prompt prefix
    * (`<|user|>prompt<|assistant|>`), plus the response loss span — the
    * span starts where the shared prefix ends, so a DPO collator masks the
    * prompt and scores only the responses, and the shared prefix means the
    * two sequences' prompt KV/log-prob work is provably identical.
    *
    * Offsets are char-based like [[lossSpans]] (tokenizer-agnostic). Plan
    * shape: pure per-row codegen'd Column math — no shuffle, no window, no
    * UDF; at 100 TB this is scan-speed.
    *
    * Returns (pairCol, chosen_text, rejected_text, span_start, chosen_end,
    * rejected_end): both spans are `[span_start, *_end)` into their own
    * sequence.
    */
  def preferencePairs(
      df: DataFrame,
      pairCol: String,
      promptCol: String,
      chosenCol: String,
      rejectedCol: String): DataFrame = {
    val prefix = concat(lit("<|user|>"), col(promptCol), lit("<|assistant|>"))
    df.select(
      col(pairCol),
      concat(prefix, col(chosenCol)).as("chosen_text"),
      concat(prefix, col(rejectedCol)).as("rejected_text"),
      length(prefix).cast("long").as("span_start"),
      (length(prefix) + length(col(chosenCol))).cast("long").as("chosen_end"),
      (length(prefix) + length(col(rejectedCol))).cast("long").as("rejected_end"))
  }

  /** Best-of-n rejection sampling: per prompt, keep the highest-scoring
    * candidate response (reward-model argmax; ties → lowest candidate id,
    * so the selection replays on any engine) and render it under the same
    * `<|user|>…<|assistant|>…` template as [[preferencePairs]], with the
    * completion char-span for loss masking.
    *
    * One prompt-keyed `max(struct(score, −id))` argmax — no window sort,
    * O(1) aggregation state per prompt however many candidates a prompt
    * has; candidate stats (n, best/worst score) ride the same aggregate.
    * The render is a shuffle-free projection after the argmax, so the
    * response TEXT moves through the exchange once, inside the struct.
    */
  def bestOfN(
      df: DataFrame,
      promptIdCol: String,
      promptCol: String,
      responseCol: String,
      candidateIdCol: String,
      scoreCol: Column): DataFrame = {
    val picked = df
      .groupBy(col(promptIdCol))
      .agg(
        max(struct(scoreCol.as("s"), (-col(candidateIdCol)).as("negid"),
          col(promptCol).as("p"), col(responseCol).as("r"))).as("best"),
        count(lit(1)).as("n_candidates"),
        min(scoreCol).as("worst_score"))
    val prefix = concat(lit("<|user|>"), col("best.p"), lit("<|assistant|>"))
    picked.select(
      col(promptIdCol),
      (-col("best.negid")).as("best_candidate"),
      round(col("best.s"), 6).as("best_score"),
      round(col("worst_score"), 6).as("worst_score"),
      col("n_candidates"),
      concat(prefix, col("best.r")).as("text"),
      length(prefix).cast("long").as("span_start"),
      (length(prefix) + length(col("best.r"))).cast("long").as("span_end"))
  }
}
