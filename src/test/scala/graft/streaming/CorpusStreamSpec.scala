package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSparkSession
import graft.streaming.CorpusStream.{Kept, StreamDoc}

class CorpusStreamSpec extends AnyFunSuite {
  lazy val spark = GraftSparkSession.spark
  import spark.implicits._

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
}
