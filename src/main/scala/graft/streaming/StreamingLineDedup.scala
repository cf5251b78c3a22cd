package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One exploded line arrival. Public for Janino (codegen'd encoders). */
case class LineArrival(key: Long, line: String, doc_id: Long, pos: Long,
    epoch: Int)

/** Per-key state: the arrival that owns this line corpus-wide. */
case class LineOwnerState(epoch: Int, doc_id: Long, pos: Long)

/** Keep/drop verdict for one arrived line. */
case class LineVerdict(key: Long, doc_id: Long, pos: Long, kept: Boolean)

/** STANDING line-granularity dedup — the continuous-ingest form of
  * [[graft.operators.LineDedup]]: as documents arrive, each line survives
  * only if its key was never seen in ANY earlier arrival (CCNet's
  * keep-one-copy policy under arrival order instead of (id, pos) order —
  * the owning copy is the EARLIEST ARRIVAL: first by epoch, then by
  * (doc_id, pos) within a trigger, which is what "first" means once data
  * is a stream). Within one trigger a key's rows are replayed in
  * (doc_id, pos) order, so the semantics are batch-boundary-DETERMINED,
  * not scheduler-determined: the same epoch slicing always yields the
  * same verdicts, and the one-epoch run equals batch
  * [[graft.operators.LineDedup.dedupLines]] keep-first exactly
  * (spec-pinned).
  *
  * Two execution paths, one semantics:
  *   - [[verdicts]]: `flatMapGroupsWithState` keyed on the line's
  *     xxhash64 — the real streaming operator; state per key is its
  *     owner triple (epoch, doc, pos), so resident state = one small
  *     fixed-size row per DISTINCT line ever seen. RocksDB-provider
  *     friendly (see [[StateStores]]) for unbounded line domains.
  *   - [[dedupFold]]: the relational epoch fold with identical
  *     per-trigger semantics (the w21/w23 gate stance) — per epoch, one
  *     key-partitioned window picks the epoch-first copy, one anti-join
  *     against the at-rest key set decides freshness, and the state
  *     relation (keys only, 8 bytes each) is localCheckpointed across
  *     epochs. Shuffles carry (key, id, pos) and the line text needed
  *     for the cleaned digest, never whole documents.
  */
object StreamingLineDedup extends Serializable {

  /** Exploded line arrivals from (idCol, textCol, epochCol). Keys are the
    * line's xxhash64 — the batch operator's `hashKeys = true` contract
    * ([[graft.operators.LineDedup]] documents the collision bound). */
  def lineArrivals(docs: DataFrame, delimiter: String = "\n",
      idCol: String = "doc_id", textCol: String = "text",
      epochCol: String = "_epoch"): Dataset[LineArrival] = {
    import docs.sparkSession.implicits._
    docs.select(col(idCol), col(epochCol).cast("int"),
        posexplode(split(coalesce(col(textCol), lit("")),
          java.util.regex.Pattern.quote(delimiter))))
      .toDF(idCol, "epoch", "pos", "line")
      .select(xxhash64(col("line")).as("key"), col("line"),
        col(idCol).as("doc_id"), col("pos").cast("long").as("pos"),
        col("epoch"))
      .as[LineArrival]
  }

  /** Real streaming path: one verdict per arrived line. Keys with an
    * owner in state drop every new copy; a fresh key's first replayed
    * copy (min (doc_id, pos) within the trigger) becomes the owner. */
  def verdicts(lines: Dataset[LineArrival]): Dataset[LineVerdict] = {
    import lines.sparkSession.implicits._

    def fold(key: Long, rows: Iterator[LineArrival],
        state: GroupState[LineOwnerState]): Iterator[LineVerdict] = {
      val sorted = rows.toSeq.sortBy(r => (r.epoch, r.doc_id, r.pos))
      var owner = state.getOption
      val out = sorted.map { r =>
        val keep = owner.isEmpty
        if (keep) {
          owner = Some(LineOwnerState(r.epoch, r.doc_id, r.pos))
          state.update(owner.get)
        }
        LineVerdict(key, r.doc_id, r.pos, keep)
      }
      out.iterator
    }

    lines.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout())(fold)
  }

  /** Gate fold with [[verdicts]]' exact per-trigger semantics: processes
    * `_epoch` slices 0 until nEpochs in order, carrying the seen-key set
    * across epochs. Returns one row per (doc): (idCol, epoch,
    * n_lines_before, n_lines_after, clean_md5) — the batch operator's
    * output contract plus the doc's arrival epoch. */
  def dedupFold(docs: DataFrame, nEpochs: Int, delimiter: String = "\n",
      idCol: String = "doc_id", textCol: String = "text",
      epochCol: String = "_epoch"): DataFrame = {
    require(nEpochs >= 1, s"need >= 1 epochs: $nEpochs")
    val spark = docs.sparkSession
    import spark.implicits._
    val all = lineArrivals(docs, delimiter, idCol, textCol, epochCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // an out-of-range epoch would otherwise SILENTLY vanish from every
    // slice (and from the output via the final join) — fail loudly
    // instead (review finding); the agg reads the cache just persisted
    val eb = all.agg(min(col("epoch")), max(col("epoch"))).head()
    if (!eb.isNullAt(0))
      require(eb.getInt(0) >= 0 && eb.getInt(1) < nEpochs,
        s"epochs [${eb.getInt(0)}, ${eb.getInt(1)}] outside [0, $nEpochs)")
    var seen = spark.emptyDataset[Long].toDF("key")
    var verdicts = spark.emptyDataset[(Long, Long, Boolean, String)]
      .toDF("doc_id", "pos", "kept", "line")
    for (e <- 0 until nEpochs) {
      val arr = all.filter(col("epoch") === e)
      val w = org.apache.spark.sql.expressions.Window.partitionBy("key")
      val epochFirst =
        struct(col("doc_id"), col("pos")) <=>
          min(struct(col("doc_id"), col("pos"))).over(w)
      val fresh = arr.join(seen, Seq("key"), "left_anti")
      val v = fresh.withColumn("kept", epochFirst)
        .select(col("doc_id"), col("pos"), col("kept"), col("line"))
        .unionByName(
          arr.join(seen, Seq("key"), "left_semi")
            .select(col("doc_id"), col("pos"), lit(false).as("kept"),
              col("line")))
      verdicts = verdicts.unionByName(v).localCheckpoint(true)
      seen = seen.unionByName(fresh.select("key").distinct())
        .localCheckpoint(true)
    }
    all.unpersist(false)
    val perDoc = verdicts
      .groupBy("doc_id")
      .agg(
        count(lit(1L)).as("n_lines_before"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_lines_after"),
        md5(concat_ws(delimiter,
          sort_array(collect_list(when(col("kept"),
            struct(col("pos"), col("line"))))).getField("line")))
          .as("clean_md5"))
    docs.select(col(idCol).as("doc_id"), col(epochCol).cast("int").as("epoch"))
      .join(perDoc, Seq("doc_id"))
      .select(col("doc_id"), col("epoch"), col("n_lines_before"),
        col("n_lines_after"), col("clean_md5"))
  }
}
