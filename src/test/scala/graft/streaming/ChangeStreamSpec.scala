package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSparkSession
import graft.lineage.SnapshotStore
import graft.streaming.ChangeStream.{Change, Winner}

class ChangeStreamSpec extends AnyFunSuite {
  lazy val spark = GraftSparkSession.spark
  import spark.implicits._

  def ts(s: Long) = new Timestamp(1700000000000L + s * 60000)

  private def changeRows(seqs: Seq[Long]) = seqs.flatMap { s =>
    Seq(
      // moves node s+1; creates node 100+s; deletes node s+10
      (s, s * 10 + 1, "node", s + 1, 2, 0, "modify", ts(s), s + 0.5, s + 0.5),
      (s, s * 10 + 2, "node", 100 + s, 1, 0, "create", ts(s), 10.0 + s, 20.0),
      (s, s * 10 + 3, "node", s + 10, 2, 1, "delete", ts(s), 0.0, 0.0))
  }

  test("ingest drains available change files; resume skips committed seqs") {
    graft.functions.GraftFunctions.register(spark)
    val srcDir = Files.createTempDirectory("stream_src").toString
    val storeDir = Files.createTempDirectory("stream_store").toString
    val ckptDir = Files.createTempDirectory("stream_ckpt").toString
    val store = new SnapshotStore(storeDir)

    val initial = (1L to 40L).map(i => (i, i * 1.0, i * 0.5)).toDF("id", "lon", "lat")
    val cols = Seq("seq", "eid", "obj_type", "id", "version", "deleted", "action", "ts", "lon", "lat")

    changeRows(Seq(0L, 1L)).toDF(cols: _*).write.parquet(s"$srcDir/f0.parquet")
    val schema = spark.read.parquet(s"$srcDir/f0.parquet").schema
    def stream = spark.readStream.schema(schema).parquet(s"$srcDir/*.parquet")

    val committed1 = ChangeStream.ingest(spark, stream, store, initial, ckptDir,
      partitions = 2)
    assert(committed1 === Seq(0L, 1L))
    assert(store.watermark() === Some(1L))

    // second wave: one more file; same checkpoint dir => only new data read
    changeRows(Seq(2L)).toDF(cols: _*).write.parquet(s"$srcDir/f1.parquet")
    val committed2 = ChangeStream.ingest(spark, stream, store, initial, ckptDir,
      partitions = 2)
    assert(committed2 === Seq(2L))
    assert(store.watermark() === Some(2L))

    // final state equals the batch pipeline applied seq-by-seq
    val got = store.readTable(spark, 2L, "node_geoms")
      .select("id", "lon", "lat").as[(Long, Double, Double)].collect().toSet
    val want = {
      var snap = initial
      Seq(0L, 1L, 2L).foreach { s =>
        val batch = changeRows(Seq(s)).toDF(cols: _*)
        val compacted = graft.ops.ChangeBatch.dedupLatestVersion(
          graft.ops.ChangeBatch.classify(batch))
        snap = graft.ops.DeltaApply.applyChangeBatch(snap,
          compacted.select(col("id"), col("action"), col("lon"), col("lat")))
          .select("id", "lon", "lat")
      }
      snap.as[(Long, Double, Double)].collect().toSet
    }
    assert(got === want)
  }

  test("ingest shares the batch per-seq body: dirty-way rebuild + stats committed; out-of-order seqs throw") {
    graft.functions.GraftFunctions.register(spark)
    val srcDir = Files.createTempDirectory("stream_src2").toString
    val storeDir = Files.createTempDirectory("stream_store2").toString
    val ckptDir = Files.createTempDirectory("stream_ckpt2").toString
    val store = new SnapshotStore(storeDir)
    val initial = (1L to 40L).map(i => (i, i * 1.0, i * 0.5)).toDF("id", "lon", "lat")
    // way 100 references node 1, which seq 0 moves -> must be rebuilt
    val wayMembers = Seq((100L, 1L, 1), (100L, 2L, 2)).toDF("way_id", "node_id", "pos")
    val cols = Seq("seq", "eid", "obj_type", "id", "version", "deleted", "action", "ts", "lon", "lat")
    changeRows(Seq(0L)).toDF(cols: _*).write.parquet(s"$srcDir/f0.parquet")
    val schema = spark.read.parquet(s"$srcDir/f0.parquet").schema
    def stream = spark.readStream.schema(schema).parquet(s"$srcDir/*.parquet")

    val committed = ChangeStream.ingest(spark, stream, store, initial, ckptDir,
      partitions = 2, wayMembers = Some(wayMembers))
    assert(committed === Seq(0L))
    // parity with UpdateJob: streaming-committed seqs carry the dirty-way
    // rebuild and the stats table, not just node_geoms
    val dirty = store.readTable(spark, 0L, "dirty_way_geoms")
      .select("way_id").as[Long].collect().toSet
    assert(dirty === Set(100L))
    val kinds = store.readStats(spark, 0L).select("kind").as[String].collect().toSet
    assert(kinds.contains("phase_ms") && kinds.contains("counter"))

    // an uncommitted seq at/below the watermark is out-of-order: loud, not lossy
    val lateDir = Files.createTempDirectory("stream_src2_late").toString
    val lateCkpt = Files.createTempDirectory("stream_ckpt2_late").toString
    // seq 0 would be skipped (committed); seq -1 is genuinely out of order
    changeRows(Seq(-1L)).toDF(cols: _*).write.parquet(s"$lateDir/f0.parquet")
    def lateStream = spark.readStream.schema(schema).parquet(s"$lateDir/*.parquet")
    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      ChangeStream.ingest(spark, lateStream, store, initial, lateCkpt,
        partitions = 2, wayMembers = Some(wayMembers))
    }
    assert(ex.getMessage.contains("out-of-order") ||
      Option(ex.getCause).exists(_.getMessage.contains("out-of-order")))
  }

  test("tileCounts: event-time windowed aggregation with watermark") {
    val input = MemoryStream[Change](spark)
    graft.functions.GraftFunctions.register(spark)
    val q = ChangeStream.tileCounts(input.toDF(), z = 4,
        windowDur = "10 minutes", lateness = "5 minutes")
      .writeStream.outputMode(OutputMode.Update())
      .format("memory").queryName("tile_counts_test").start()
    try {
      input.addData(
        Change(0, 1, "node", 1, 1, 0, ts(0), 10.0, 20.0),
        Change(0, 2, "node", 2, 1, 0, ts(1), 10.0, 20.0),
        Change(0, 3, "node", 3, 1, 0, ts(30), -170.0, -80.0))
      q.processAllAvailable()
      val rows = spark.table("tile_counts_test")
        .select("tile_id", "cnt").as[(Long, Long)].collect().toMap
      val hot = graft.geo.CellIndex.tileId(10.0, 20.0, 4)
      val cold = graft.geo.CellIndex.tileId(-170.0, -80.0, 4)
      assert(rows(hot) === 2L)
      assert(rows(cold) === 1L)
    } finally q.stop()
  }

  test("latestVersionState: stateful last-writer-wins across micro-batches") {
    val input = MemoryStream[Change](spark)
    val q = ChangeStream.latestVersionState(input.toDS())
      .writeStream.outputMode(OutputMode.Update())
      .format("memory").queryName("lww_test").start()
    try {
      input.addData(
        Change(0, 1, "node", 7, 2, 0, ts(0), 1.0, 1.0),
        Change(0, 2, "node", 7, 3, 0, ts(0), 2.0, 2.0)) // winner: v3
      q.processAllAvailable()
      input.addData(
        Change(1, 3, "node", 7, 3, 1, ts(1), 3.0, 3.0), // v3 deleted beats v3 kept
        Change(1, 4, "node", 7, 1, 0, ts(1), 4.0, 4.0)) // stale, ignored
      q.processAllAvailable()
      input.addData(
        Change(2, 5, "node", 7, 2, 0, ts(2), 5.0, 5.0)) // stale, no emission
      q.processAllAvailable()
      val winners = spark.table("lww_test").as[Winner].collect()
      assert(winners.length === 2) // one emission per winner change
      assert(winners.map(w => (w.version, w.deleted, w.eid)).toSet ===
        Set((3, 0, 2L), (3, 1, 3L)))
    } finally q.stop()
  }

  test("latestVersionState matches batch comparator at sub-millisecond ts deltas and on null ts") {
    // Spark TimestampType carries MICROSECONDS: batch dedupLatestVersion's
    // `ts.desc` distinguishes two changes 1 µs apart, so the streaming
    // comparator must too — a getTime (millis) tie-break key silently
    // fell through to eid and picked the OTHER row (review finding).
    val usA = new Timestamp(1700000000000L); usA.setNanos(2000) // +2 µs
    val usB = new Timestamp(1700000000000L); usB.setNanos(1000) // +1 µs
    val data = Seq(
      // same version/deleted; ts favors eid=9, eid favors eid=10
      Change(0, 9, "node", 71, 2, 0, usA, 1.0, 1.0),
      Change(0, 10, "node", 71, 2, 0, usB, 2.0, 2.0),
      // null ts sorts smallest: the non-null row wins despite smaller eid
      Change(0, 20, "node", 72, 2, 0, null, 3.0, 3.0),
      Change(0, 19, "node", 72, 2, 0, usB, 4.0, 4.0))

    val batchWinners = graft.ops.ChangeBatch.dedupLatestVersion(
      data.toDF().withColumnRenamed("objType", "obj_type"))
      .select(col("id"), col("eid")).as[(Long, Long)].collect().toMap
    assert(batchWinners === Map(71L -> 9L, 72L -> 19L))

    val input = MemoryStream[Change](spark)
    val q = ChangeStream.latestVersionState(input.toDS())
      .writeStream.outputMode(OutputMode.Update())
      .format("memory").queryName("lww_us_test").start()
    try {
      input.addData(data: _*)
      q.processAllAvailable()
      val streamWinners = spark.table("lww_us_test").as[Winner]
        .collect().map(w => w.id -> w.eid).toMap
      assert(streamWinners === batchWinners)
    } finally q.stop()
  }
}
