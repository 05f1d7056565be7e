package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.text.TextFunctions.dotSeq

/**
 * Similarity search over an embedding column (`embeddings(vec_id,
 * embedding: array<float>, label)`).
 *
 * Two plans:
 *  - `bruteTopK` — exact cosine top-k: broadcast the (small) query side,
 *    score every pair, windowed rank. The correctness baseline; O(Q x N)
 *    but embarrassingly parallel and shuffle-free until the final top-k
 *    window (which keys on qid — uniform).
 *  - `lshTopK` — scale path: sign-random-projection buckets (deterministic
 *    integer-arithmetic hyperplanes, so the oracle reproduces them); only
 *    same-bucket pairs are scored. Recall trades with #planes; exactness is
 *    per-bucket.
 *
 * All float math is sequential-fold double arithmetic (TextFunctions.dotSeq)
 * so results are bit-identical to the DuckDB oracle.
 */
object Similarity {

  /** Spread tiny-file inputs across cores before CPU-heavy scoring. */
  private def spread(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sessionState.conf.numShufflePartitions
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }

  /** Deterministic hyperplane weight: ((j*7919 + i*104729) % 2001 - 1000)/1000. */
  private def planeWeight(j: Int, i: Int): Double =
    (((j.toLong * 7919 + i.toLong * 104729) % 2001) - 1000) / 1000.0

  def planeWeights(numPlanes: Int, dim: Int): Seq[Seq[Double]] =
    (0 until numPlanes).map(j => (1 to dim).map(i => planeWeight(j, i)))

  /** Sign-random-projection bucket id of an embedding column. */
  def srpBucket(emb: Column, numPlanes: Int, dim: Int): Column =
    (0 until numPlanes).map { j =>
      val w = array((1 to dim).map(i => lit(planeWeight(j, i))): _*)
      when(dotSeq(w, emb) > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Exact cosine top-k: queries x targets, rank <= k (ties by vid). */
  def bruteTopK(queries: DataFrame, targets: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("qid"), col("embedding").as("qemb"),
      sqrt(dotSeq(col("embedding"), col("embedding"))).as("qn"))
    val t = spread(targets).select(col("vec_id").as("vid"), col("embedding").as("temb"),
      sqrt(dotSeq(col("embedding"), col("embedding"))).as("tn"))
    val scored = broadcast(q).crossJoin(t)
      .withColumn("cos", dotSeq(col("qemb"), col("temb")) / (col("qn") * col("tn")))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("vid"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("vid"), col("rank").cast("long").as("rank"))
  }

  /**
   * LSH (sign-random-projection) top-k: score only same-bucket pairs.
   * Equi-join on bucket id — broadcastable when the query side is small,
   * shuffled-hash otherwise; bucket ids are uniform, so no skew handling
   * needed beyond AQE.
   */
  def lshTopK(queries: DataFrame, targets: DataFrame, k: Int,
              numPlanes: Int = 8, dim: Int = 64): DataFrame = {
    val q = queries.select(col("vec_id").as("qid"), col("embedding").as("qemb"),
      sqrt(dotSeq(col("embedding"), col("embedding"))).as("qn"),
      srpBucket(col("embedding"), numPlanes, dim).as("bucket"))
    val t = spread(targets).select(col("vec_id").as("vid"), col("embedding").as("temb"),
      sqrt(dotSeq(col("embedding"), col("embedding"))).as("tn"),
      srpBucket(col("embedding"), numPlanes, dim).as("bucket"))
    val scored = q.join(t, "bucket")
      .withColumn("cos", dotSeq(col("qemb"), col("temb")) / (col("qn") * col("tn")))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("vid"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("vid"), col("rank").cast("long").as("rank"))
  }

  /**
   * Embedding-cosine near-dup pairs (cos >= threshold, a < b). Exact
   * variant; the LSH bucket join is the scale path for the same predicate.
   */
  def cosineNearDupPairs(vectors: DataFrame, threshold: Double): DataFrame = {
    // norms precomputed per vector (identical doubles to the per-pair
    // recompute, since sqrt(dotSeq(v,v)) is deterministic per row)
    val a = spread(vectors).select(col("vec_id").as("vec_a"), col("embedding").as("ea"),
      sqrt(dotSeq(col("embedding"), col("embedding"))).as("na"))
    val b = vectors.select(col("vec_id").as("vec_b"), col("embedding").as("eb"),
      sqrt(dotSeq(col("embedding"), col("embedding"))).as("nb"))
    a.join(b, col("vec_a") < col("vec_b"))
      .withColumn("cos", dotSeq(col("ea"), col("eb")) / (col("na") * col("nb")))
      .filter(col("cos") >= threshold)
      .select("vec_a", "vec_b", "cos")
  }
}
