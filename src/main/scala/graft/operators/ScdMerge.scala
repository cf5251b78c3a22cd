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

  /** [[merge]] with SCHEMA EVOLUTION between `current` and `updates` — the
    * feed contract a long-lived dimension actually faces (the reference
    * tolerates schema drift between producer and at-rest log the same way:
    * decode what the frame carries, null-fill what it doesn't, never
    * crash the pipeline on a widened schema).
    *
    *   - ADDED columns (in `updates`, not in `current`): the output schema
    *     widens. History, closed, and untouched open rows carry NULL — an
    *     SCD2 row is immutable once written, so a pre-evolution row never
    *     retro-acquires a value; only rows (re)opened by this batch carry
    *     the update's value.
    *   - DROPPED columns (in `current`, not in `updates`): policy-driven.
    *     `carryForwardDropped = true` (default): a reopened row inherits
    *     the prior open row's value — "no news per column", the usual feed
    *     contract; inserts (no prior row) get NULL. `false`: the column is
    *     retired — reopened rows get NULL, history keeps its values.
    *
    * `changeCols` must be columns `updates` carries; an ADDED column may be
    * listed (its old side reads as NULL, so the null-safe compare marks any
    * non-null arrival as a change).
    *
    * Scale shape identical to [[merge]]: closed history never joins, one
    * keyed shuffle for open-vs-updates, codegen'd projection. */
  def mergeEvolved(current: DataFrame, updates: DataFrame, key: String,
      changeCols: Seq[String], batchTs: Column,
      carryForwardDropped: Boolean = true): DataFrame = {
    val meta = Seq("valid_from", "valid_to", "version")
    val curAttrs = current.columns.filterNot(meta.contains).toSeq // includes key
    val updAttrs = updates.columns.toSeq
    require(updAttrs.contains(key), s"updates must carry the key column $key")
    require(changeCols.nonEmpty, "changeCols must name at least one column")
    require(changeCols.forall(updAttrs.contains),
      s"changeCols must be columns updates carries (${updAttrs.mkString(",")})")
    val added = updAttrs.filterNot(curAttrs.contains)
    val attrs = curAttrs ++ added // union schema, current's order first
    def updType(c: String) = updates.schema(c).dataType
    def nullAs(c: String) = lit(null).cast(
      if (curAttrs.contains(c)) current.schema(c).dataType else updType(c))

    val closed = current.filter(col("valid_to").isNotNull)
    val closedWide = added.foldLeft(closed)((df, c) => df.withColumn(c, nullAs(c)))
      .withColumn("change_status", lit("history"))
    val open = current.filter(col("valid_to").isNull)
    val u = updates.select(updAttrs.map(c => col(c).as(s"u_$c")): _*)

    val j = open.join(u, col(key) === col(s"u_$key"), "full_outer")
    val hasOld = col(key).isNotNull
    val hasNew = col(s"u_$key").isNotNull
    val changed = changeCols.map { c =>
      val old = if (curAttrs.contains(c)) col(c) else nullAs(c)
      !(col(s"u_$c") <=> old)
    }.reduce(_ || _)
    val reopen = hasNew && (!hasOld || changed)

    val openOut = j.select(
      attrs.map { a =>
        val newVal =
          if (updAttrs.contains(a)) col(s"u_$a")                 // fed by the batch
          else if (carryForwardDropped) col(a)                   // dropped: inherit
          else nullAs(a)                                         // dropped: retired
        val oldVal = if (curAttrs.contains(a)) col(a) else nullAs(a)
        when(reopen, newVal).otherwise(oldVal).as(a)
      } ++ Seq(
        when(reopen, batchTs).otherwise(col("valid_from")).as("valid_from"),
        lit(null).cast(current.schema("valid_to").dataType).as("valid_to"),
        when(reopen, coalesce(col("version"), lit(0L)) + 1)
          .otherwise(col("version")).as("version"),
        when(reopen && hasOld, lit("updated"))
          .when(reopen, lit("inserted")).otherwise(lit("unchanged"))
          .as("change_status")): _*)

    val closedOut = j.filter(hasOld && hasNew && changed)
      .select(attrs.map(a =>
        (if (curAttrs.contains(a)) col(a) else nullAs(a)).as(a)) ++ Seq(
        col("valid_from"),
        batchTs.as("valid_to"),
        col("version"),
        lit("closed").as("change_status")): _*)

    closedWide.unionByName(closedOut).unionByName(openOut)
  }
}
