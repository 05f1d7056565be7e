package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

import graft.lineage.SnapshotStore
import graft.ops.{ChangeBatch, DeltaApply}

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

  /** Current winner of last-writer-wins compaction for one (objType, id). */
  case class Winner(objType: String, id: Long, version: Int, deleted: Int,
                    eid: Long, lon: Double, lat: Double)

  /**
   * Streaming ingest: apply each micro-batch's change rows seq-by-seq
   * through the batch pipeline into `store`. Idempotent under micro-batch
   * replay via the store's commit markers. Blocks until the available data
   * is drained (`Trigger.AvailableNow`).
   *
   * @return committed sequence numbers, ascending
   */
  def ingest(spark: SparkSession, changes: DataFrame, store: SnapshotStore,
             initialSnapshot: DataFrame, checkpointDir: String,
             cellRes: Int = 12, partitions: Int = 8): Seq[Long] = {
    val committed = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = changes.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val seqs = batch.select("seq").distinct()
          .collect().map(_.getLong(0)).sorted
        var snapshot = store.watermark() match {
          case Some(w) => store.readTable(spark, w, "node_geoms")
            .select("id", "lon", "lat")
          case None => initialSnapshot
        }
        seqs.foreach { seq =>
          if (!store.isCommitted(seq)) { // replayed batch => no-op
            val compacted = ChangeBatch.dedupLatestVersion(
              ChangeBatch.classify(batch.filter(col("seq") === seq)))
            val nodeBatch = compacted.filter(col("obj_type") === "node")
              .select(col("id"), col("action"), col("lon"), col("lat"))
            // A6 exactly-once guard (shared with UpdateJob): the MERGE must
            // satisfy after == before - deleted + upserted
            val before = snapshot.count()
            val (expDeleted, expUpserted) = DeltaApply.mergeMetrics(snapshot, nodeBatch)
            snapshot = DeltaApply.applyChangeBatch(snapshot, nodeBatch)
              .select("id", "lon", "lat")
              .localCheckpoint(true)
            val after = snapshot.count()
            require(after == before - expDeleted + expUpserted,
              s"stream MERGE count cross-check failed at seq=$seq: " +
                s"after=$after != $before - $expDeleted + $expUpserted")
            val snapCells = snapshot.withColumn("cell",
              graft.functions.GraftFunctions.cell_encode(
                col("lon"), col("lat"), lit(cellRes)))
            store.writeTable(snapCells, seq, "node_geoms", "cell", partitions)
            store.commit(seq)
            committed += seq
          }
        }
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
   * the winning record under the reference's comparator (version desc,
   * deleted desc, eid desc — include/osm/OsmFileHelper.h:42-55) across ALL
   * micro-batches, emitting the new winner whenever it changes.
   */
  def latestVersionState(changes: Dataset[Change]): Dataset[Winner] = {
    import changes.sparkSession.implicits._
    def better(a: Winner, b: Winner): Winner = {
      val cmp =
        if (a.version != b.version) a.version.compareTo(b.version)
        else if (a.deleted != b.deleted) a.deleted.compareTo(b.deleted)
        else a.eid.compareTo(b.eid)
      if (cmp >= 0) a else b
    }
    changes
      .groupByKey(c => (c.objType, c.id))
      .flatMapGroupsWithState(
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (key: (String, Long), rows: Iterator[Change], state: GroupState[Winner]) =>
          val incoming = rows.map(c =>
            Winner(c.objType, c.id, c.version, c.deleted, c.eid, c.lon, c.lat))
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
