package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Token-window chunking: split each document into fixed-size token windows
  * with configurable overlap — the retrieval / context-window preprocessing
  * step of a training-data pipeline (each chunk becomes an embedding or
  * training sample).
  *
  * Fully declarative: `sequence` generates window starts, `slice` carves
  * the token array, `posexplode` emits one row per chunk — expression-level
  * HOFs, no UDFs, no shuffle; chunking runs at scan speed and the output is
  * already partitioned like its input. A doc shorter than one window yields
  * exactly one chunk; an empty doc yields none.
  */
object Chunking {

  /** Chunk `textCol` into `chunkSize`-token windows advancing by
    * `chunkSize - overlap` tokens. Returns one row per chunk:
    * (id, chunk_id, chunk_start, n_chunk_tokens, chunk_text).
    */
  def chunkTokens(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id", chunkSize: Int = 64, overlap: Int = 8): DataFrame = {
    require(chunkSize > 0 && overlap >= 0 && overlap < chunkSize,
      s"need 0 <= overlap < chunkSize, got chunkSize=$chunkSize overlap=$overlap")
    val step = chunkSize - overlap
    val toks: Column = graft.functions.TextFunctions.tokens(col(textCol))
    // one start per window: 0, step, 2*step, … while start < n_tokens
    // (last window may be short; a final all-overlap window is never emitted)
    val starts = sequence(lit(0), greatest(
      (size(toks) - 1).cast("int"), lit(0)), lit(step))
    val chunks = filter(
      transform(starts, s => slice(toks, s + 1, lit(chunkSize))),
      c => size(c) > 0)
    docs
      .select(col(idCol), posexplode(chunks).as(Seq("chunk_id", "ctoks")))
      .select(col(idCol), col("chunk_id").cast("long").as("chunk_id"),
        (col("chunk_id") * step).cast("long").as("chunk_start"),
        size(col("ctoks")).cast("long").as("n_chunk_tokens"),
        array_join(col("ctoks"), " ").as("chunk_text"))
  }
}
