package graft.media

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSparkSession

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = GraftSparkSession.spark
  import spark.implicits._

  def spansDf = Seq(
    ("doc/1", 3, "media", "frame0", "tile/7"),
    ("doc/1", 0, "meta", "doc/1/v1", ""),
    ("doc/2", 3, "media", "frame0", "tile/9"))
    .toDF("doc_id", "span_pos", "kind", "text", "media_ref")

  test("mediaTable keeps only media spans with 16-byte payloads") {
    val m = Multimodal.mediaTable(spansDf)
    assert(m.count() === 2)
    val lens = m.select(length(col("media_bytes"))).as[Int].collect().toSet
    assert(lens === Set(16))
  }

  test("expression decode and typed mapPartitions decode agree") {
    val media = Multimodal.mediaTable(spansDf)
    val exprMeta = Multimodal.decodeMeta(media)
      .select("doc_id", "media_ref", "width", "height", "n_frames")
      .as[(String, String, Long, Long, Long)].collect().toSet
    val typedMeta = Multimodal.extractFeatures(spark, media)
      .map(f => (f.doc_id, f.media_ref, f.width.toLong, f.height.toLong, f.n_frames.toLong))
      .collect().toSet
    assert(exprMeta === typedMeta)
  }

  test("frameSample emits every 2nd frame index") {
    val decoded = Multimodal.decodeMeta(Multimodal.mediaTable(spansDf))
    val frames = Multimodal.frameSample(decoded)
      .groupBy("doc_id").agg(max("frame_idx").as("m"), count(lit(1)).as("c"))
      .as[(String, Long, Long)].collect()
    val nf = decoded.select("doc_id", "n_frames").as[(String, Long)].collect().toMap
    frames.foreach { case (d, m, c) =>
      assert(m <= nf(d) - 1)
      assert(c === (nf(d) + 1) / 2)
    }
  }

  test("resizeMeta bounds the long side at 64 and preserves aspect") {
    val out = Multimodal.resizeMeta(Multimodal.decodeMeta(Multimodal.mediaTable(spansDf)))
      .as[(String, String, Long, Long, Long, Long)].collect()
    out.foreach { case (_, _, w, h, ow, oh) =>
      assert(ow <= 64 && oh <= 64)
      assert(math.max(ow, oh) === math.min(64, math.max(w, h)))
    }
  }

  test("typed features are deterministic and in [0,1]") {
    val media = Multimodal.mediaTable(spansDf)
    val f1 = Multimodal.extractFeatures(spark, media).collect().map(f => f.doc_id -> f.feature.toSeq).toMap
    val f2 = Multimodal.extractFeatures(spark, media).collect().map(f => f.doc_id -> f.feature.toSeq).toMap
    assert(f1 === f2)
    f1.values.flatten.foreach(v => assert(v >= 0f && v <= 1f))
  }
}
