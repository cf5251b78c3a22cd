package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document → training-example FORMAT transforms — the reshapes a data
  * pipeline applies after curation, immediately before tokenize/pack
  * (the [[graft.sources.PackedCorpus]] input side).
  *
  * FIM — fill-in-the-middle (Bavarian et al. 2022, arXiv:2207.14255):
  * split a document into (prefix, middle, suffix) and emit it in PSM
  * order with sentinel tokens, so an autoregressive model learns to
  * infill; applied to a FRACTION of the corpus (the paper's fim-rate),
  * the rest passes through unchanged.
  *
  * Determinism stance: production FIM draws pivots and the rate-gate
  * uniformly at random PER EPOCH; here both derive from md5 — the
  * rate-gate from md5(doc_id) and the pivots from the character length
  * (len/3, 2len/3) — so the transform is replay-idempotent (a retried
  * epoch emits byte-identical examples, the idempotent-overwrite stance
  * every graft sink assumes) and the gate's oracle can reproduce every
  * byte in SQL. A seeded-hash pivot (md5(doc_id || epoch)) generalizes
  * this to per-epoch resampling without losing either property.
  *
  * Everything is one narrow projection — no shuffle, no UDF; at 100 TB
  * this runs at scan speed inside whole-stage codegen.
  */
object TrainingFormats {

  val FimPrefix = "<fim_prefix>"
  val FimSuffix = "<fim_suffix>"
  val FimMiddle = "<fim_middle>"

  /** True for the deterministic `rate16/16` fraction of ids: first hex
    * nibble of md5(id) < rate16. (rate16 = 8 ⇒ the paper's default 0.5
    * fim-rate.) The edges short-circuit: 16 would render as the
    * two-char "10" and break the single-nibble lexicographic compare. */
  private def fimGate(id: Column, rate16: Int): Column =
    if (rate16 >= 16) lit(true)
    else if (rate16 <= 0) lit(false)
    else substring(md5(id.cast("string")), 1, 1) < lit(f"$rate16%x")

  /** Apply FIM (PSM order) to the gated fraction of `docs`; the rest
    * passes through. Output: (idCol, fim_applied, prefix, middle,
    * suffix, example) — `example` is the training string
    * (`<fim_prefix>P<fim_suffix>S<fim_middle>M` or the raw text). */
  def fimSplit(docs: DataFrame, rate16: Int = 8, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val len = length(col(textCol))
    val p1 = (len / 3).cast("int")
    val p2 = (len * 2 / 3).cast("int")
    // substr(pos, len): char-based in both Spark and the SQL oracle
    val prefix = col(textCol).substr(lit(1), p1)
    val middle = col(textCol).substr(p1 + 1, p2 - p1)
    val suffix = col(textCol).substr(p2 + 1, len - p2)
    val applied = fimGate(col(idCol), rate16)
    docs.select(col(idCol), col(textCol))
      .withColumn("fim_applied", applied)
      .withColumn("prefix", when(applied, prefix).otherwise(lit("")))
      .withColumn("middle", when(applied, middle).otherwise(lit("")))
      .withColumn("suffix", when(applied, suffix).otherwise(lit("")))
      .withColumn("example",
        when(applied, concat(lit(FimPrefix), prefix, lit(FimSuffix), suffix,
          lit(FimMiddle), middle))
          .otherwise(col(textCol)))
      .drop(textCol)
  }

  /** DPO/RLHF preference-PAIR assembly (Rafailov et al. 2023,
    * arXiv:2305.18290): within each prompt group, the highest-scoring
    * candidate becomes `chosen` and the lowest `rejected`; groups with
    * fewer than two candidates, or without a STRICT score margin, emit
    * nothing (a zero-margin pair carries no preference signal).
    *
    * Determinism: winner/loser are the lexicographic max/min of
    * (score, id), so score ties break by id on both ends — replayed
    * epochs assemble identical pairs. Scale shape: ONE partial-
    * aggregable groupBy (max/min of a two-field struct combine on the
    * map side) — no window sort, no per-group row materialization, so a
    * mega-prompt-group costs its scan, not a sort.
    *
    * Output: (groupCol, chosen_id, rejected_id, chosen_score,
    * rejected_score, margin, n_cands). */
  def preferencePairs(cands: DataFrame, groupCol: String,
      scoreCol: String, idCol: String = "doc_id"): DataFrame =
    cands.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_cands"),
        max(struct(col(scoreCol), col(idCol))).as("ch"),
        min(struct(col(scoreCol), col(idCol))).as("rj"))
      .filter(col("n_cands") >= 2 &&
        col(s"ch.$scoreCol") > col(s"rj.$scoreCol"))
      .select(col(groupCol),
        col(s"ch.$idCol").as("chosen_id"),
        col(s"rj.$idCol").as("rejected_id"),
        col(s"ch.$scoreCol").as("chosen_score"),
        col(s"rj.$scoreCol").as("rejected_score"),
        (col(s"ch.$scoreCol") - col(s"rj.$scoreCol")).as("margin"),
        col("n_cands"))

  /** Chat-template render with LOSS-MASK offsets — the supervised-
    * fine-tuning reshape: each document becomes one user/assistant
    * exchange (first ceil(n/2) words the user turn, the rest the
    * assistant turn), rendered with role tags, and the char span the
    * trainer computes loss over — the assistant reply only, the
    * standard SFT masking — is emitted as [loss_start, loss_end)
    * offsets into the rendered string. Documents under two words have
    * no assistant turn and emit nothing. One narrow projection (array
    * slice + concat inside codegen) — scan-speed at 100 TB.
    *
    * Output: (idCol, n_tokens, loss_start, loss_end, rendered). */
  def chatLossMask(docs: DataFrame, userTag: String = "<|user|>",
      assistantTag: String = "<|assistant|>", endTag: String = "<|end|>",
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val toks = filter(split(trim(col(textCol)), "\\s+"), x => length(x) > 0)
    docs.select(col(idCol), toks.as("w"))
      .withColumn("n", size(col("w")))
      .filter(col("n") >= 2)
      .withColumn("c", floor((col("n") + 1) / 2).cast("int"))
      .withColumn("prefix", concat(lit(userTag + "\n"),
        array_join(slice(col("w"), lit(1), col("c")), " "),
        lit("\n" + assistantTag + "\n")))
      .withColumn("atext",
        array_join(slice(col("w"), col("c") + 1, col("n") - col("c")), " "))
      .select(col(idCol), col("n").cast("long").as("n_tokens"),
        length(col("prefix")).cast("long").as("loss_start"),
        (length(col("prefix")) + length(col("atext"))).cast("long")
          .as("loss_end"),
        concat(col("prefix"), col("atext"), lit(endTag)).as("rendered"))
  }

  /** Contrastive two-VIEW augmentation (the SimCSE/CLIP-text data
    * shape): each document emits two overlapping word crops — the first
    * and last ceil(2n/3) words — that a contrastive trainer treats as a
    * positive pair; the guaranteed ≥ n/3-word overlap keeps the views
    * semantically anchored while the differing thirds make them
    * non-identical. Deterministic crops (no RNG) keep epoch replay
    * byte-identical and the oracle byte-exact. Documents under three
    * words cannot produce two distinct overlapping views and emit
    * nothing. One narrow projection — scan speed at 100 TB.
    *
    * Output: (idCol, n_tokens, n_overlap, view_a, view_b). */
  def contrastiveViews(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val toks = filter(split(trim(col(textCol)), "\\s+"), x => length(x) > 0)
    docs.select(col(idCol), toks.as("w"))
      .withColumn("n", size(col("w")))
      .filter(col("n") >= 3)
      .withColumn("c", floor((col("n") * 2 + 2) / 3).cast("int"))
      .select(col(idCol), col("n").cast("long").as("n_tokens"),
        (col("c") * 2 - col("n")).cast("long").as("n_overlap"),
        array_join(slice(col("w"), lit(1), col("c")), " ").as("view_a"),
        array_join(slice(col("w"), col("n") - col("c") + 1, col("c")), " ")
          .as("view_b"))
  }

  /** Span corruption — the T5/UL2 denoising objective (Raffel et al.
    * 2020 §3.1.4): mask contiguous word SPANS, emit the encoder view
    * (each span collapsed to one `<extra_id_k>` sentinel) and the
    * decoder target (sentinel followed by the masked words). Span
    * placement is deterministic: every 8-word block masks the 3 words
    * starting at a per-document offset `o = nibble(md5(doc_id)) mod 6`
    * — a 3/8 corruption rate with document-varying phase, exactly
    * replayable (idempotent epochs, SQL-expressible oracle); sentinel
    * ids are block indices, so they are strictly increasing per doc.
    * One narrow projection over higher-order array functions — no
    * explode, no shuffle, no UDF: at 100 TB this runs at scan speed
    * inside codegen.
    *
    * Output: (idCol, n_words, n_spans, n_masked, encoder, target). */
  def spanCorrupt(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val words = split(trim(col(textCol)), "\\s+")
    val o = conv(substring(md5(col(idCol).cast("string")), 1, 1), 16, 10)
      .cast("int") % 6
    def p(i: Column) = pmod(i, lit(8))
    def blk(i: Column) = floor(i / 8).cast("long")
    def sentinel(i: Column) =
      concat(lit("<extra_id_"), blk(i).cast("string"), lit(">"))
    docs.filter(length(trim(col(textCol))) > 0)
      .select(col(idCol), words.as("w"), o.as("o"))
      .select(col(idCol),
        size(col("w")).cast("long").as("n_words"),
        size(filter(transform(col("w"), (_, i) => i),
          i => p(i) === col("o"))).cast("long").as("n_spans"),
        size(filter(transform(col("w"), (_, i) => i),
          i => p(i) >= col("o") && p(i) <= col("o") + 2)).cast("long")
          .as("n_masked"),
        concat_ws(" ", filter(transform(col("w"), (w, i) =>
          when(p(i) === col("o"), sentinel(i))
            .when(p(i) > col("o") && p(i) <= col("o") + 2, lit(null))
            .otherwise(w)), x => x.isNotNull)).as("encoder"),
        concat_ws(" ", filter(transform(col("w"), (w, i) =>
          when(p(i) === col("o"), concat(sentinel(i), lit(" "), w))
            .when(p(i) > col("o") && p(i) <= col("o") + 2, w)
            .otherwise(lit(null))), x => x.isNotNull)).as("target"))
  }
}
