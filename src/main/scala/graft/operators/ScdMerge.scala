package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (type 2) merge — the `MERGE INTO` a lakehouse
  * table format provides, expressed as ONE declarative full-outer join so
  * it runs against plain parquet snapshots: the pattern a training-data
  * pipeline needs to version its dimension/metadata tables (source
  * registries, license states, domain quality tiers) without a format
  * dependency.
  *
  * Contract: `current` carries the full history — open rows
  * (`valid_to IS NULL`) plus closed rows — with `valid_from`, `valid_to`,
  * `version` alongside the business columns; `updates` carries one row per
  * key with the business columns only. Per key:
  *   - changed (any `changeCols` differs): the open row closes
  *     (`valid_to = batchTs`) and a successor opens at `version + 1`;
  *   - unchanged: the open row passes through untouched;
  *   - new key: a version-1 row opens;
  *   - absent from `updates`: the open row passes through (no deletes —
  *     absence means "no news", the usual feed contract).
  *
  * Scale shape: closed history never joins (filter + union); the open set
  * joins `updates` on the key once — both sides shuffle on the key, rows
  * carry only the dimension columns, and there is no window or collect.
  * The output is the NEW full history, ready to overwrite the snapshot.
  */
object ScdMerge {

  def merge(current: DataFrame, updates: DataFrame, key: String,
      changeCols: Seq[String], batchTs: Column): DataFrame = {
    val meta = Seq("valid_from", "valid_to", "version")
    val attrs = current.columns.filterNot(meta.contains) // includes key
    require(updates.columns.toSet == attrs.toSet,
      s"updates must carry exactly the business columns ${attrs.mkString(",")}")
    require(changeCols.nonEmpty, "changeCols must name at least one column " +
      "to compare — an empty list would make every update a silent no-op")

    val closed = current.filter(col("valid_to").isNotNull)
      .withColumn("change_status", lit("history"))
    val open = current.filter(col("valid_to").isNull)
    val u = updates.select(updates.columns.map(c => col(c).as(s"u_$c")).toSeq: _*)

    val j = open.join(u, col(key) === col(s"u_$key"), "full_outer")
    val hasOld = col(key).isNotNull
    val hasNew = col(s"u_$key").isNotNull
    // null-SAFE inequality: business columns are nullable (the scaladoc's
    // license states etc.), and a NULL→value or value→NULL transition must
    // count as changed — plain =!= would yield NULL there and the update
    // would silently vanish into the 'unchanged' branch
    val changed = changeCols.map(c => !(col(s"u_$c") <=> col(c))).reduce(_ || _)
    // reopen = this key gets a fresh open row (insert, or changed update)
    val reopen = hasNew && (!hasOld || changed)

    val openOut = j.select(
      attrs.map(a => when(reopen, col(s"u_$a")).otherwise(col(a)).as(a)) ++ Seq(
        when(reopen, batchTs).otherwise(col("valid_from")).as("valid_from"),
        lit(null).cast(current.schema("valid_to").dataType).as("valid_to"),
        when(reopen, coalesce(col("version"), lit(0L)) + 1)
          .otherwise(col("version")).as("version"),
        when(reopen && hasOld, lit("updated"))
          .when(reopen, lit("inserted")).otherwise(lit("unchanged"))
          .as("change_status")): _*)

    val closedOut = j.filter(hasOld && hasNew && changed)
      .select(attrs.map(col) ++ Seq(
        col("valid_from"),
        batchTs.as("valid_to"),
        col("version"),
        lit("closed").as("change_status")): _*)

    closed.unionByName(closedOut).unionByName(openOut)
  }
}
