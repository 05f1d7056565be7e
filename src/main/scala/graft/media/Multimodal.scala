package graft.media

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.text.TextFunctions.hexInt

/** One media span with its opaque payload (the multimodal row shape). */
case class MediaItem(doc_id: String, media_ref: String, media_bytes: Array[Byte])

/** Decode-stub output: typed metadata + a small feature vector. */
case class MediaFeatures(doc_id: String, media_ref: String, width: Int,
                         height: Int, n_frames: Int, feature: Array[Float])

/**
 * Multimodal column plumbing: image/audio/video travel as opaque `binary`
 * columns with typed metadata alongside. The decode step is a clearly-marked
 * DETERMINISTIC STUB (this container has no image/audio codecs); everything
 * Spark-side — schema, batch shape, partitioning, the expression-level
 * metadata path — is real and tested.
 *
 * Two decode paths:
 *  - expression path (`decodeMeta`): metadata from payload-hash arithmetic,
 *    fully codegen'd, oracle-checkable;
 *  - typed batch path (`extractFeatures`): `Dataset[MediaItem].mapPartitions`
 *    — the Scala analog of `mapInPandas`: one iterator per partition, batch
 *    in / batch out, the exact seam where a real decoder (JNI/FFI) would sit.
 */
object Multimodal {

  /**
   * Materialize the media table from doc spans: payload = 16 deterministic
   * bytes (md5 of doc_id + media_ref) standing in for real image bytes.
   */
  def mediaTable(docSpans: DataFrame): DataFrame =
    docSpans.filter(col("kind") === "media")
      .select(col("doc_id"), col("media_ref"),
        unhex(md5(concat(col("doc_id"), lit(":"), col("media_ref")))).as("media_bytes"))

  /**
   * STUB decode (expression path): metadata derived from the payload hash —
   * a real decoder would read the container header instead. Deterministic by
   * construction, so the DuckDB oracle reproduces it bit-for-bit.
   */
  def decodeMeta(media: DataFrame): DataFrame = {
    val h = md5(concat(col("doc_id"), lit(":"), col("media_ref")))
    media.select(col("doc_id"), col("media_ref"),
      length(col("media_bytes")).cast("long").as("n_bytes"),
      (hexInt(substring(h, 1, 2)) + 16).as("width"),
      (hexInt(substring(h, 3, 2)) + 16).as("height"),
      (hexInt(substring(h, 5, 1)) + 1).as("n_frames"))
  }

  /** Frame sampling: every 2nd frame index of each decoded item. */
  def frameSample(decoded: DataFrame, stride: Int = 2): DataFrame =
    decoded.select(col("doc_id"), col("media_ref"),
      explode(sequence(lit(0L), col("n_frames") - 1, lit(stride.toLong))).as("frame_idx"))

  /** STUB resize: new dims preserving aspect via integer arithmetic. */
  def resizeMeta(decoded: DataFrame, maxSide: Int = 64): DataFrame =
    decoded.withColumn("scale_num",
        when(greatest(col("width"), col("height")) > maxSide, lit(maxSide))
          .otherwise(greatest(col("width"), col("height"))))
      .withColumn("out_w", (col("width") * col("scale_num")) / greatest(col("width"), col("height")))
      .withColumn("out_h", (col("height") * col("scale_num")) / greatest(col("width"), col("height")))
      .select(col("doc_id"), col("media_ref"), col("width"), col("height"),
        floor(col("out_w")).as("out_w"), floor(col("out_h")).as("out_h"))

  /**
   * Typed batch path — the `mapInPandas` analog. Partition-iterator in,
   * partition-iterator out; a real implementation would hand each batch to a
   * native decoder. The STUB emits an 8-dim feature from the payload bytes.
   */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select("doc_id", "media_ref", "media_bytes").as[MediaItem]
      .mapPartitions { items =>
        items.map { it =>
          val b = it.media_bytes
          // --- STUB: stands in for image decode + feature extraction ---
          val width = (b(0) & 0xff) + 16
          val height = (b(1) & 0xff) + 16
          val nFrames = ((b(2) & 0xff) >> 4) + 1
          val feature = Array.tabulate(8)(i => ((b(i % b.length) & 0xff) / 255.0f))
          MediaFeatures(it.doc_id, it.media_ref, width, height, nFrames, feature)
        }
      }
  }
}
