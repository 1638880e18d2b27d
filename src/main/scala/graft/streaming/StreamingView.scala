package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.plans.{MaterializedAgg, SnapshotTable}

/** CONTINUOUSLY-maintained materialized aggregate: the snapshot
  * table's streaming change feed drives [[MaterializedAgg]]'s additive
  * fold, so the view tracks the source commit-by-commit without any
  * scheduler — the streaming half of the same design (Delta's CDF →
  * foreachBatch MERGE maintenance loop, Flink's continuous aggregate).
  *
  * Exactly-once comes from TWO independent fences, either sufficient:
  * the stream checkpoint replays at-least-once on crash, and the
  * view's own source-version watermark ([[MaterializedAgg]]'s staged
  * property) filters every image at-or-below it — a replayed or
  * overlapping micro-batch folds only the commits the view has not
  * absorbed, and a fully-absorbed replay commits nothing. The fences
  * are per-COMMIT, not per-batch, so re-checkpointing from scratch
  * (new checkpoint dir, `startingVersion=0`) against a live view is
  * safe too.
  *
  * The feed's raw pair algebra (a rewrite re-delivers unchanged rows
  * as one `before` + one `after`) cancels inside the additive fold —
  * the contract [[graft.sources.GraftCdc]] documents — so compaction
  * and carried files fold to zero group deltas and touch nothing.
  *
  * Scale: each micro-batch costs O(its commits' changed files) to
  * read (the CDC planner never re-reads carried files), the fold is
  * one partial-aggregated shuffle of those rows, and the view merge
  * rewrites O(touched groups) of a key-clustered view. State lives in
  * the view table itself — the streaming query holds NO state-store
  * state, restarts are free. */
object StreamingView {

  /** Maintain `view` from `srcPath`'s change-feed stream until all
    * currently-committed changes are absorbed (AvailableNow), then
    * return. Call again (same checkpoint) to catch up later; the
    * watermark makes any overlap harmless. */
  def maintainAdditive(spark: SparkSession, srcPath: String,
                       view: SnapshotTable, keys: Seq[String],
                       sums: Seq[(String, org.apache.spark.sql.Column)],
                       checkpointDir: String): Unit =
    maintainLoop(spark, srcPath, view, checkpointDir) { (fresh, toV) =>
      MaterializedAgg.commitMerged(view, keys, sums.map(_._1),
        MaterializedAgg.foldAdditive(
          fresh.drop(SnapshotTable.CommitVersionCol), keys, sums),
        toV, additive = true)
    }

  /** Stream-maintain a DEFINED view ([[MaterializedAgg]]'s logged
    * definition — SQL-declared or define*-created) with the mode the
    * definition names: additive views fold the batch's images;
    * recompute views take the batch's DIRTY group keys and recompute
    * them from the source PINNED at the batch's high-water version,
    * so group values and watermark always describe the same source
    * state. The streaming half of `CALL graft.system.refresh_mv`. */
  def maintainByDefinition(view: SnapshotTable,
                           checkpointDir: String): Unit = {
    val (src, mode, keys, measures) = MaterializedAgg.definitionOf(view)
    if (mode == "additiveJoin" || mode == "recomputeJoin") {
      // join views stream on the FACT's change feed; each micro-batch
      // folds (additive) or dirty-key-recomputes (non-additive) its
      // fact images against the pinned dim versions AND any dim span
      // that opened since the last batch — the same shared span cores
      // as the batch refresh, with the batch's high-water version as
      // "the current fact" for dim terms, so group values, watermark,
      // and dim pins always describe one consistent version vector
      val dims = MaterializedAgg.dimsOf(view)
      maintainLoop(view.session, src.path, view, checkpointDir) {
        (fresh, toV) =>
          val (dimFrom, dimTo) = MaterializedAgg.dimSpanOf(view, dims)
          val images = Some(fresh.drop(SnapshotTable.CommitVersionCol))
          if (mode == "additiveJoin")
            MaterializedAgg.foldJoinSpan(src, dims, view, keys, measures,
              images, toV, dimFrom, dimTo)
          else
            MaterializedAgg.recomputeJoinSpan(src, dims, view, keys,
              measures, images, toV, dimFrom, dimTo)
      }
      // dim-ONLY residue: the fact stream is silent when only a dim
      // changed, so AvailableNow semantics ("current with everything
      // committed at call time") need one batch catch-up — a no-op
      // when the loop above already absorbed every span
      if (mode == "additiveJoin")
        MaterializedAgg.refreshAdditiveJoin(src, dims, view, keys, measures)
      else
        MaterializedAgg.refreshRecomputeJoin(src, dims, view, keys, measures)
      return
    }
    if (mode == "additive")
      // the additive loop IS maintainAdditive — one body, not a copy
      maintainAdditive(view.session, src.path, view, keys, measures,
        checkpointDir)
    else maintainLoop(view.session, src.path, view, checkpointDir) {
      (fresh, toV) =>
        // dirty keys come from the NET of the batch's raw pair algebra
        // (MaterializedAgg.netDirtyKeys), not its raw rows: a rewrite
        // (compaction, clustering) re-delivers unchanged rows as
        // canceling before+after pairs, and recomputing every
        // rewritten group would cost O(compacted data) in the view
        // for zero change — netted over the OBSERVED columns only
        // (keys + measure inputs), which is exactly as sound and a
        // fraction of the shuffle bytes
        val dirty = MaterializedAgg.netDirtyKeys(
          MaterializedAgg.narrowToMeasured(
            fresh.drop(SnapshotTable.CommitVersionCol), keys, measures),
          keys)
        MaterializedAgg.recomputeDirty(view, src.readVersion(toV),
          dirty, keys, measures, toV)
    }
  }

  /** The shared maintenance loop: CDC stream → per-batch version
    * fence → `apply(freshImages, highWaterVersion)`. */
  private def maintainLoop(spark: SparkSession, srcPath: String,
                           view: SnapshotTable, checkpointDir: String)
                          (apply: (DataFrame, Long) => Unit): Unit = {
    // ONE watermark contract with the batch refresh
    // (MaterializedAgg.absorbedVersion): an existing view that was
    // not created by a maintainer, or one persisted under an old key
    // format, has no trustworthy baseline and fails loudly; an empty
    // declared view folds from scratch.
    val absorbedAtStart = MaterializedAgg.absorbedVersion(view)
    val reader = spark.readStream.format("graft")
      .option("readChangeFeed", "true")
    // a FRESH checkpoint against a live view must NOT start from the
    // collapsed initial snapshot: its images are a full STATE stamped
    // with the head version (all above the watermark), and folding
    // them onto the absorbed state would double every group. Pinning
    // startingVersion to the watermark makes a fresh checkpoint
    // resume per-commit exactly where the view stands; an EXISTING
    // checkpoint ignores the option and resumes from its own offset,
    // where the per-batch version fence below handles any overlap.
    if (absorbedAtStart > 0L)
      reader.option("startingVersion", absorbedAtStart)
    val q = reader
      .load(srcPath)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val vc = col(SnapshotTable.CommitVersionCol)
        // the view's watermark, NOT the checkpoint, decides what is
        // new: a replayed batch (crash between sink commit and
        // checkpoint write) or a batch overlapping a prior
        // batch-boundary layout folds only versions above it
        val absorbed =
          if (!view.exists) 0L
          else view.properties.get(MaterializedAgg.SourceVersionProp)
            .flatMap(_.toLongOption).getOrElse(0L)
        val fresh = batch.filter(vc > absorbed)
        // bound the batch's high-water BEFORE folding: the property
        // must never claim a version whose images this batch lacks
        val hi = fresh.agg(max(vc)).head()
        if (!hi.isNullAt(0)) apply(fresh, hi.getLong(0))
      }
      .start()
    q.awaitTermination()
  }
}
