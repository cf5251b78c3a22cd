package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data-capture utilities for plain-parquet pipelines: changelog
  * compaction ("what is the current state of a table given its I/U/D event
  * stream") and keyed snapshot diffing ("what changed between two table
  * versions"). Together with [[ScdMerge]] these cover the maintenance loop a
  * training-data pipeline runs over its metadata/dimension tables without a
  * lakehouse format dependency: ingest a changelog, compact it to a
  * snapshot, diff snapshots to audit a refresh before promoting it.
  *
  * Scale shape (both ops): exactly ONE shuffle on the business key —
  * compaction is a key-partitioned window (rank by sequence, keep the
  * latest), diff is a key-equi full outer join. No broadcast assumption on
  * either side, no driver materialization; at 100 TB both degenerate to a
  * standard keyed exchange, and AQE's skew split applies if one key is hot.
  */
object Cdc {

  /** Compact a changelog to its final state: for each key keep the row with
    * the HIGHEST `seqCol` (ties broken by `opCol` descending so a same-seq
    * U beats an I deterministically — callers should make `seqCol` unique
    * per key), then drop keys whose latest operation is a delete.
    *
    * `opCol` values follow the Debezium-style convention: "I" insert,
    * "U" update, "D" delete. Output carries every changelog column plus the
    * latest op (callers often want to know a row's last mutation kind).
    *
    * One shuffle: window partitioned by `keyCols` ordered by
    * `(seqCol, opCol) DESC`, rank-1 filter, delete filter. The window is a
    * running rank over a key-sorted partition — no second exchange, no
    * self-join, and map-side the scan only carries the changelog columns.
    */
  def compactChangelog(log: DataFrame, keyCols: Seq[String],
      seqCol: String, opCol: String): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(seqCol).desc, col(opCol).desc)
    log.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1 && col(opCol) =!= lit("D"))
      .drop("_rn")
  }

  /** Keyed diff of two snapshots of the same schema: one row per key that
    * is `added` (only in `after`), `removed` (only in `before`), or
    * `changed` (in both with any non-key column differing), with the sorted
    * list of differing column names. Unchanged keys are dropped — at 100 TB
    * the diff relation is the small output, the inputs are the big ones.
    *
    * Null-safe comparison (`<=>`) per column, so a null→value transition
    * reports as a change instead of vanishing. Columns compared are the
    * non-key columns the two snapshots SHARE; a column present on one side
    * only is ignored (schema evolution is [[ScdMerge]]'s concern).
    *
    * One shuffle per side on the key into a full outer sort-merge join; the
    * change classification is a codegen'd projection over the joined row.
    */
  def snapshotDiff(before: DataFrame, after: DataFrame,
      keyCols: Seq[String]): DataFrame = {
    val shared = before.columns.toSeq.filterNot(keyCols.contains)
      .filter(after.columns.contains)
    val b = before.select((keyCols ++ shared).map(col): _*)
      .withColumn("_in_b", lit(true))
    val a = after.select((keyCols ++ shared).map(col): _*)
      .withColumn("_in_a", lit(true))
    val bren = shared.foldLeft(b)((df, c) => df.withColumnRenamed(c, s"_b_$c"))
    val aren = shared.foldLeft(a)((df, c) => df.withColumnRenamed(c, s"_a_$c"))
    val joined = bren.join(aren, keyCols, "full_outer")
    val changedCols: Column = array_sort(filter(array(shared.map { c =>
      when(!(col(s"_b_$c") <=> col(s"_a_$c")), lit(c)).otherwise(lit(null))
    }: _*), x => x.isNotNull))
    joined.select(
      keyCols.map(col) ++ Seq(
        when(col("_in_b").isNull, lit("added"))
          .when(col("_in_a").isNull, lit("removed"))
          .otherwise(lit("changed")).as("change_type"),
        when(col("_in_b").isNotNull && col("_in_a").isNotNull, changedCols)
          .otherwise(array().cast("array<string>")).as("changed_cols")): _*)
      .filter(col("change_type") =!= "changed" || size(col("changed_cols")) > 0)
  }
}
