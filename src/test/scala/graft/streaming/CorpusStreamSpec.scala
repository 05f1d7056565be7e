package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSparkSession
import graft.streaming.CorpusStream.{Kept, StreamDoc, TsDoc}

class CorpusStreamSpec extends AnyFunSuite {
  lazy val spark = GraftSparkSession.spark
  import spark.implicits._

  test("streamDocsSql clone ids stay collision-free past 10^6 documents") {
    // The clone offsets are data-derived (smallest o1 > max(doc_id) with
    // o1 % 3 == 1, second family at 2*o1): fixed +10^6/+2*10^6 offsets
    // collided with real ids — and with each other — once the table
    // crossed a million docs (review finding). Exercise exactly that
    // scale shape with a sparse synthetic table.
    val ids = Seq(0L, 3L, 7L, 21L, 35L, 999999L, 1000000L, 1000005L,
      1500000L, 2000000L, 2000006L, 2500000L)
    ids.map(i => (i, s"text_$i")).toDF("doc_id", "text")
      .createOrReplaceTempView("documents")
    try {
      val out = spark.sql(graft.gen.DerivedTables.streamDocsSql)
        .select($"doc_id".as[Long]).collect()
      val expectedClones =
        ids.count(_ % 7 == 0) + ids.count(_ % 5 == 0)
      assert(out.length === ids.size + expectedClones)
      // every id distinct: originals, family-1 and family-2 never collide
      assert(out.distinct.length === out.length)
      // offsets keep the %3 batch-shift contract: clones of d land in
      // micro-batches (d+1)%3 and (d+2)%3
      val m = ids.max
      val o1 = (m + 1) + ((1 - (m + 1) % 3) + 3) % 3
      assert(o1 % 3 === 1 && o1 > m)
      val set = out.toSet
      ids.filter(_ % 7 == 0).foreach(d => assert(set.contains(d + o1)))
      ids.filter(_ % 5 == 0).foreach(d => assert(set.contains(d + 2 * o1)))
    } finally { spark.catalog.dropTempView("documents"); () }
  }

  test("streamingExactDedup: first-seen keeper per hash across micro-batches") {
    val input = MemoryStream[StreamDoc](spark)
    val q = CorpusStream.streamingExactDedup(input.toDS())
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("stream_dedup_test").start()
    try {
      // batch 1: docs 5 and 3 share text (keeper = min id 3); 7 unique
      input.addData(StreamDoc(5, "same text"), StreamDoc(3, "same text"),
        StreamDoc(7, "unique one"))
      q.processAllAvailable()
      val b1 = spark.table("stream_dedup_test")
        .as[Kept].collect().map(k => k.doc_id).sorted
      assert(b1 === Array(3L, 7L))

      // batch 2: doc 1 repeats batch-1 text (dropped — state remembers,
      // even though 1 < 3); doc 9 is new
      input.addData(StreamDoc(1, "same text"), StreamDoc(9, "brand new"))
      q.processAllAvailable()
      val b2 = spark.table("stream_dedup_test")
        .as[Kept].collect().map(k => k.doc_id).sorted
      assert(b2 === Array(3L, 7L, 9L))
    } finally q.stop()
  }

  test("streamingExactDedup agrees with batch Dedup.exact on a drained stream") {
    val input = MemoryStream[StreamDoc](spark)
    val docs = Seq(
      StreamDoc(1, "aa"), StreamDoc(2, "bb"), StreamDoc(3, "aa"),
      StreamDoc(4, "cc"), StreamDoc(5, "bb"), StreamDoc(6, "aa"))
    val q = CorpusStream.streamingExactDedup(input.toDS())
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("stream_dedup_parity").start()
    try {
      // one doc per micro-batch: worst-case ordering for cross-batch state
      docs.foreach { d => input.addData(d); q.processAllAvailable() }
      val streamed = spark.table("stream_dedup_parity")
        .as[Kept].collect().map(_.doc_id).toSet
      val batch = graft.text.Dedup.exact(
          docs.map(d => (d.doc_id, d.text)).toDF("doc_id", "text"))
        .filter("keep").select("doc_id").as[Long].collect().toSet
      assert(streamed === batch && streamed === Set(1L, 2L, 4L))
    } finally q.stop()
  }

  test("streamingExactDedupTtl: keeper suppresses dups only inside the horizon") {
    def ts(s: Long) = new java.sql.Timestamp(s * 1000L)
    val input = MemoryStream[TsDoc](spark)
    val q = CorpusStream.streamingExactDedupTtl(input.toDS(), ttlMs = 300000L)
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("stream_dedup_ttl_test").start()
    def kept(): Set[Long] = spark.table("stream_dedup_ttl_test")
      .as[Kept].collect().map(_.doc_id).toSet
    try {
      // batch 1: fresh hashes -> kept; expiries aa=1300, bb=1310
      input.addData(TsDoc(1, "aa", ts(1000)), TsDoc(2, "bb", ts(1010)))
      q.processAllAvailable()
      assert(kept() === Set(1L, 2L))
      // batch 2 (wm=1010): aa live (1300 > 1010) -> dup dropped; cc fresh
      input.addData(TsDoc(3, "aa", ts(1020)), TsDoc(4, "cc", ts(1030)))
      q.processAllAvailable()
      assert(kept() === Set(1L, 2L, 4L))
      // batch 3 (wm=1030): bb still live (1310 > 1030) -> dropped; dd fresh
      // at t=2000 pushes the NEXT watermark past both expiries
      input.addData(TsDoc(5, "dd", ts(2000)), TsDoc(6, "bb", ts(1999)))
      q.processAllAvailable()
      assert(kept() === Set(1L, 2L, 4L, 5L))
      // batch 4 (wm=2000): aa and bb EXPIRED (1300/1310 <= 2000) -> re-kept
      input.addData(TsDoc(7, "aa", ts(2050)), TsDoc(8, "bb", ts(2060)))
      q.processAllAvailable()
      assert(kept() === Set(1L, 2L, 4L, 5L, 7L, 8L))
      // batch 5 (wm=2060): aa's NEW keeper (expiry 2350) is live -> dropped
      input.addData(TsDoc(9, "aa", ts(2100)))
      q.processAllAvailable()
      assert(kept() === Set(1L, 2L, 4L, 5L, 7L, 8L))
    } finally q.stop()
  }

  test("streamingExactDedupTtl: hot hash that receives a dup is still evicted (bounded state)") {
    // ADVICE.md r04 (medium): Spark clears a group's timeout on every
    // invocation unless re-set; the duplicate-drop branch must RE-ARM it or
    // a hash that gets a dup then goes quiet keeps its state forever. The
    // observable is the state-store row count in streaming progress.
    def ts(s: Long) = new java.sql.Timestamp(s * 1000L)
    val input = MemoryStream[TsDoc](spark)
    val q = CorpusStream.streamingExactDedupTtl(input.toDS(), ttlMs = 300000L)
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("stream_dedup_ttl_evict").start()
    def stateRows: Long = q.lastProgress.stateOperators(0).numRowsTotal
    try {
      // b1: hot kept (expiry 1300)
      input.addData(TsDoc(1, "hot", ts(1000)))
      q.processAllAvailable()
      assert(stateRows === 1L)
      // b2: duplicate of hot -> dropped; THE invocation that used to clear
      // the timeout without re-arming it
      input.addData(TsDoc(2, "hot", ts(1010)))
      q.processAllAvailable()
      // b3: unrelated key far in the future; watermark entering the NEXT
      // batch becomes 5000, far past hot's 1300 expiry
      input.addData(TsDoc(3, "other", ts(5000)))
      q.processAllAvailable()
      // b4: another unrelated key triggers timeout processing at wm=5000;
      // hot (quiet since b2) must FIRE and be removed -> state holds only
      // `other` and `filler`
      input.addData(TsDoc(4, "filler", ts(5010)))
      q.processAllAvailable()
      assert(stateRows === 2L,
        s"hot hash state entry was not evicted (state rows = $stateRows)")
    } finally q.stop()
  }

  test("streamingExactDedupTtl: min doc_id wins within a micro-batch") {
    def ts(s: Long) = new java.sql.Timestamp(s * 1000L)
    val input = MemoryStream[TsDoc](spark)
    val q = CorpusStream.streamingExactDedupTtl(input.toDS(), ttlMs = 60000L)
      .writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("stream_dedup_ttl_minid").start()
    try {
      input.addData(TsDoc(9, "xx", ts(100)), TsDoc(4, "xx", ts(110)),
        TsDoc(7, "xx", ts(90)))
      q.processAllAvailable()
      val rows = spark.table("stream_dedup_ttl_minid").as[Kept].collect()
      assert(rows.map(_.doc_id).toSeq === Seq(4L))
    } finally q.stop()
  }
}
