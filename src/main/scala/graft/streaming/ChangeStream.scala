package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

import graft.lineage.{RunStatistics, SnapshotStore, UpdateJob}
import graft.ops.ChangeBatch

/**
 * Structured Streaming surface. The reference is a micro-batch incremental
 * system driven by replication-server polling (reference:
 * src/osm/OsmUpdater.cpp:169-236) — its streaming vocabulary (watermark,
 * compaction, late-data reclassification) maps onto Structured Streaming as:
 *
 *  - ingest: `readStream` over the change-batch source, `foreachBatch`
 *    applying the SAME batch pipeline (classify -> compact -> MERGE) with
 *    `Trigger.AvailableNow` — streaming and batch share one code path, so
 *    semantics (last-writer-wins, modify-of-unknown => create) cannot drift;
 *  - exactly-once: the SnapshotStore's per-seq atomic commit markers make
 *    replayed micro-batches idempotent (a re-delivered seq is skipped),
 *    which is precisely Structured Streaming's contract with foreachBatch
 *    ("may be re-invoked with the same batchId after a failure");
 *  - event-time: windowed per-tile counts with a watermark bound late data
 *    (the reference's `updatesCompleteUntil` timestamp plays the same role);
 *  - custom state: last-writer-wins compaction as a stateful operator via
 *    `flatMapGroupsWithState` — the streaming form of the k-way merge-dedup
 *    (reference: include/osm/OsmFileHelper.h:42-101).
 */
object ChangeStream {

  /** One change record on the stream (mirrors the `changes` table). */
  case class Change(seq: Long, eid: Long, objType: String, id: Long,
                    version: Int, deleted: Int, ts: java.sql.Timestamp,
                    lon: Double, lat: Double)

  /** Current winner of last-writer-wins compaction for one (objType, id).
   * Carries `ts` because the comparator tiebreaks on it — the SAME order as
   * batch compaction (ChangeBatch.dedupLatestVersion: version desc, deleted
   * desc, ts desc, eid desc); omitting ts made streaming and batch pick
   * different winners on equal (version, deleted) (review finding). */
  case class Winner(objType: String, id: Long, version: Int, deleted: Int,
                    ts: java.sql.Timestamp, eid: Long, lon: Double, lat: Double)

  /**
   * Streaming ingest: apply each micro-batch's change rows seq-by-seq into
   * `store` through [[graft.lineage.UpdateJob.applySeq]] — the LITERAL batch
   * per-seq body (classify -> compact -> closure -> MERGE + cross-check ->
   * dirty-way rebuild -> lineage/stats write -> commit), so streaming and
   * batch semantics share one code path by construction. Idempotent under
   * micro-batch replay via the store's commit markers. Blocks until the
   * available data is drained (`Trigger.AvailableNow`).
   *
   * Source contract (made LOUD, not silently lossy — review finding): each
   * sequence must arrive WHOLE within one micro-batch and in ascending order
   * across batches (the reference's one-replication-file-per-seq layout
   * guarantees both). An uncommitted seq at or below the snapshot watermark
   * is out-of-order delivery and throws; rows for an already-committed seq
   * are indistinguishable from a replayed micro-batch and are skipped —
   * which is exactly why the whole-seq-per-batch contract exists.
   *
   * @param wayMembers way membership for the dirty-way rebuild; None for
   *                   node-only streams (the rebuild then runs over zero ways)
   * @return committed sequence numbers, ascending
   */
  def ingest(spark: SparkSession, changes: DataFrame, store: SnapshotStore,
             initialSnapshot: DataFrame, checkpointDir: String,
             cellRes: Int = 12, partitions: Int = 8,
             wayMembers: Option[DataFrame] = None): Seq[Long] = {
    val committed = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = changes.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val seqs = batch.select("seq").distinct()
          .collect().map(_.getLong(0)).sorted
        val w0 = store.watermark()
        var snapshot = w0 match {
          case Some(w) => store.readTable(spark, w, "node_geoms")
            .select("id", "lon", "lat")
          case None => initialSnapshot
        }
        val wm = wayMembers.getOrElse(UpdateJob.emptyWayMembers(spark))
        val stats = new RunStatistics(spark)
        try {
          var beforeRows = stats.time("init")(snapshot.count())
          seqs.foreach { seq =>
            if (!store.isCommitted(seq)) { // replayed batch => no-op
              require(w0.forall(seq > _),
                s"out-of-order change sequence $seq is at or below the store " +
                  s"watermark ${w0.get}: its effects are missing from the " +
                  "snapshot later sequences were applied to")
              val compacted = ChangeBatch.dedupLatestVersion(
                ChangeBatch.classify(batch.filter(col("seq") === seq)))
              val (snap2, afterRows) = UpdateJob.applySeq(spark, store, stats,
                seq, compacted, snapshot, wm, beforeRows, cellRes, partitions)
              snapshot = snap2
              beforeRows = afterRows
              committed += seq
            }
          }
        } finally stats.close()
        ()
      }
      .start()
    q.awaitTermination()
    committed.toSeq
  }

  /**
   * Event-time windowed per-tile counts with a watermark: the streaming form
   * of the tile histogram. Late rows beyond `lateness` are dropped — the
   * bound the reference expresses as `updatesCompleteUntil`.
   */
  def tileCounts(changes: DataFrame, z: Int,
                 windowDur: String = "1 hour",
                 lateness: String = "30 minutes"): DataFrame =
    changes
      .withColumn("tile_id",
        graft.functions.GraftFunctions.tile_id(col("lon"), col("lat"), lit(z)))
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), windowDur), col("tile_id"))
      .agg(count(lit(1)).as("cnt"))

  /**
   * Stateful last-writer-wins compaction: for each (objType, id) key keep
   * the winning record under the SAME comparator as batch compaction
   * (ChangeBatch.dedupLatestVersion: version desc, deleted desc, ts desc,
   * eid desc; reference comparator include/osm/OsmFileHelper.h:42-55)
   * across ALL micro-batches, emitting the new winner whenever it changes.
   */
  def latestVersionState(changes: Dataset[Change]): Dataset[Winner] = {
    import changes.sparkSession.implicits._
    def better(a: Winner, b: Winner): Winner = {
      // null ts sorts SMALLEST, matching batch dedupLatestVersion's
      // `ts.desc` (nulls last in a descending sort). Non-null timestamps
      // compare via Timestamp.compareTo, which is nanos-aware — Spark
      // TimestampType carries microseconds, and a getTime (millis) key
      // would tie two changes that batch `ts.desc` distinguishes,
      // breaking the same-comparator-as-batch claim at sub-ms deltas
      def tsCmp(x: java.sql.Timestamp, y: java.sql.Timestamp): Int =
        if (x eq y) 0
        else if (x == null) -1
        else if (y == null) 1
        else x.compareTo(y)
      val cmp = {
        val c0 =
          if (a.version != b.version) a.version.compareTo(b.version)
          else if (a.deleted != b.deleted) a.deleted.compareTo(b.deleted)
          else tsCmp(a.ts, b.ts)
        if (c0 != 0) c0 else a.eid.compareTo(b.eid)
      }
      if (cmp >= 0) a else b
    }
    changes
      .groupByKey(c => (c.objType, c.id))
      .flatMapGroupsWithState(
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (key: (String, Long), rows: Iterator[Change], state: GroupState[Winner]) =>
          val incoming = rows.map(c =>
            Winner(c.objType, c.id, c.version, c.deleted, c.ts, c.eid, c.lon, c.lat))
            .reduceOption(better)
          val prev = state.getOption
          val next = (prev ++ incoming).reduceOption(better)
          next match {
            case Some(w) if !prev.contains(w) => state.update(w); Iterator(w)
            case _ => Iterator.empty
          }
      }
  }
}
