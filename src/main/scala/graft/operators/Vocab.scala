package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Vocabulary building and token-id encoding: the text → integer-ids step
  * in front of tokenizer training / model input pipelines.
  *
  * Scale shape: token counting is one hash aggregation whose shuffle
  * carries (token, count); the top-`size` selection is a deterministic
  * `orderBy(...).limit(size)` — TakeOrderedAndProject, i.e. per-partition
  * top-k + a driver k-way merge over ≤ V rows, NEVER a global sort of the
  * full distinct-token relation (10⁸–10⁹ rows at corpus scale). The ≤ V
  * survivors are numbered on the driver (metadata-sized, like the
  * centroid/codebook tables in [[Similarity]] and the BPE word table in
  * [[Bpe.learnMerges]]) and broadcast into the encode join. Encoding
  * explodes (doc, pos, token), joins the broadcast vocab, and reassembles
  * per-doc id arrays with `array_sort(collect_list(struct(pos, id)))` —
  * sorting inside one doc's group, deterministic regardless of row arrival
  * order. Documents with zero tokens vanish at the explode (both engines
  * agree) — callers that need them keep a left join.
  */
object Vocab {

  /** Top-`size` tokens by (count desc, token asc) with dense ids 0..V-1. */
  def build(docs: DataFrame, textCol: String = "text", size: Int = 256): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // Bounded deterministic top-V (TakeOrderedAndProject): the corpus-wide
    // distinct-token relation is reduced per-partition before the driver
    // sees ≤ `size` rows — the vocab itself is metadata-scale.
    val top: Seq[(String, Long)] = docs
      .select(explode(graft.functions.TextFunctions.tokens(lower(col(textCol)))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token")).limit(size)
      .collect().toSeq.map(r => (r.getString(0), r.getLong(1)))
    top.zipWithIndex
      .map { case ((token, cnt), i) => (token, i.toLong, cnt) }
      .toDF("token", "vid", "cnt")
  }

  /** Encode each doc as its token-id array (unknown tokens → -1), with an
    * unknown-token count. Returns (idCol, token_ids, n_unk). */
  def encode(docs: DataFrame, vocab: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame =
    docs
      .select(col(idCol),
        posexplode(graft.functions.TextFunctions.tokens(lower(col(textCol))))
          .as(Seq("pos", "token")))
      .join(broadcast(vocab.select("token", "vid")), Seq("token"), "left")
      .select(col(idCol), col("pos"), coalesce(col("vid"), lit(-1L)).as("vid"))
      .groupBy(idCol)
      .agg(
        transform(array_sort(collect_list(struct(col("pos"), col("vid")))),
          x => x.getField("vid")).as("token_ids"),
        sum(when(col("vid") === -1L, 1L).otherwise(0L)).as("n_unk"))
}
