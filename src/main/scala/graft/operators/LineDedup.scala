package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Line/paragraph-granularity corpus deduplication — the CCNet
  * preprocessing step (Wenzek et al. 2020, "CCNet: Extracting High Quality
  * Monolingual Datasets from Web Crawl Data"): hash every line (paragraph)
  * of every document and keep exactly ONE copy of each distinct line
  * corpus-wide. Web boilerplate (headers, cookie banners, navigation) is
  * line-identical across millions of pages, so line-granularity dedup
  * removes it where whole-document hashing (see [[Dedup.exactDuplicateGroups]],
  * [[Dedup.normalizedDedup]]) sees every page as unique and token-window
  * spans (see [[Dedup.removeDupSpans]]) need the boilerplate to be long
  * enough to cross a gram window.
  *
  * Granularity sits between the document family and the span family:
  *   - doc-level: one hash per doc, removes only full duplicates;
  *   - line-level (THIS): one hash per line, removes repeated lines while
  *     keeping each doc's unique remainder;
  *   - span-level ([[Dedup.sharedSpans]]): position-free verbatim token
  *     runs, catches overlap that crosses line boundaries.
  *
  * Keep-first policy: the surviving copy of a line is the one at the
  * smallest (`idCol`, position) pair — deterministic, engine-portable, and
  * the same min-id-keeps stance as the rest of the dedup family. Pass
  * `keepFirst = false` for the drop-all-repeats form (any line occurring
  * in more than one (doc, position) disappears everywhere — closer to
  * aggressive boilerplate stripping).
  *
  * Returns one row per input document:
  * (idCol, n_lines_before, n_lines_after, clean_md5) where `clean_md5` is
  * the md5 of the SURVIVING lines rejoined with `delimiter` in original
  * order ('' hashes for a doc that lost every line) — the same
  * "cleaned-content digest, not the content" output contract as
  * [[Dedup.removeSharedSpans]], so the gate result stays scalar-only.
  *
  * Scale shape (100 TB read): one `posexplode` per doc (narrow, no
  * shuffle), then ONE shuffle keyed on the line key for the keep-first
  * window, then one groupBy(idCol) re-aggregation — both exchanges carry
  * (key-or-line, id, pos) rows, never whole documents. With
  * `hashKeys = true` (the at-scale default) the window partitions on the
  * line's xxhash64 instead of its text, cutting shuffle bytes to 8-byte
  * keys exactly like [[Dedup.cappedAnchorIndex]]; a 64-bit collision
  * merges two distinct lines (probability ~n²/2^65 over distinct corpus
  * lines) which exact-critical callers avoid with `hashKeys = false`.
  * CCNet normalization ([[graft.plans.TextNormalizeExpr]]) is applied to
  * the KEY only (when `normalize = true`) — dedup decisions are
  * normalization-aware, surviving text is verbatim.
  */
object LineDedup {

  /** Per-line exploded view: (idCol, pos, line, key). Empty lines are kept
    * (they dedup like any other line); a null/empty document contributes
    * its single empty line. */
  private[graft] def lines(docs: DataFrame, delimiter: String,
      normalize: Boolean, hashKeys: Boolean,
      idCol: String, textCol: String): DataFrame = {
    val exploded = docs.select(col(idCol),
      posexplode(split(coalesce(col(textCol), lit("")),
        java.util.regex.Pattern.quote(delimiter))))
      .toDF(idCol, "pos", "line")
    val normed: Column =
      if (normalize) graft.plans.TextNormalizeExpr.normalizeText(col("line"))
      else col("line")
    val key: Column = if (hashKeys) xxhash64(normed) else normed
    exploded.withColumn("key", key)
  }

  def dedupLines(docs: DataFrame, delimiter: String = "\n",
      normalize: Boolean = false, keepFirst: Boolean = true,
      hashKeys: Boolean = true,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val l = lines(docs, delimiter, normalize, hashKeys, idCol, textCol)
    // ONE key-partitioned window decides survival. keepFirst: the
    // (id, pos)-minimal copy survives; otherwise survival = "key is
    // globally unique", decided by a count over the same window (no
    // second shuffle — both forms are one exchange on `key`).
    val w = Window.partitionBy("key")
    val survives: Column =
      if (keepFirst)
        struct(col(idCol), col("pos")) <=> min(struct(col(idCol), col("pos"))).over(w)
      else count(lit(1L)).over(w) === 1L
    val marked = l.withColumn("keep", survives)
    reagg(marked, delimiter, idCol)
  }

  /** WITHIN-document line dedup — the C4 rule (Raffel et al. 2020 §2.2:
    * "we discarded all but one of any three-sentence span occurring more
    * than once", applied here at line granularity like its common
    * open-source reimplementations): inside each document the first
    * occurrence of each distinct line survives, later repeats are
    * dropped; the SAME line in two different documents is untouched (that
    * cross-doc case is [[dedupLines]]' corpus-wide job). Same output
    * contract as [[dedupLines]].
    *
    * Scale shape: strictly narrower than the corpus form — the one
    * exchange is keyed on (idCol, key), so the key domain is per-document
    * and boilerplate lines shared by millions of docs can never produce a
    * hot partition (each doc's copies hash to different (id, key) cells). */
  def dedupLinesWithinDoc(docs: DataFrame, delimiter: String = "\n",
      normalize: Boolean = false, hashKeys: Boolean = true,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val l = lines(docs, delimiter, normalize, hashKeys, idCol, textCol)
    val w = Window.partitionBy(col(idCol), col("key"))
    val marked = l.withColumn("keep",
      col("pos") <=> min(col("pos")).over(w))
    reagg(marked, delimiter, idCol)
  }

  /** Shared re-aggregation: one row per doc with the survivor digest. */
  private def reagg(marked: DataFrame, delimiter: String,
      idCol: String): DataFrame =
    marked
      .groupBy(idCol)
      .agg(
        count(lit(1L)).as("n_lines_before"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_lines_after"),
        md5(concat_ws(delimiter,
          sort_array(collect_list(when(col("keep"),
            struct(col("pos"), col("line"))))).getField("line")))
          .as("clean_md5"))
}
