package graft.ann

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSparkSession
import graft.text.TextFunctions.dotSeq

class SimilaritySpec extends AnyFunSuite {
  lazy val spark = GraftSparkSession.spark
  import spark.implicits._

  def vecs(rows: (Long, Seq[Float])*) =
    rows.toDF("vec_id", "embedding")

  val sample = vecs(
    (1L, Seq(1f, 0f, 0f)), (2L, Seq(0.9f, 0.1f, 0f)),
    (3L, Seq(0f, 1f, 0f)), (4L, Seq(-1f, 0f, 0f)))

  test("dotSeq is an exact sequential fold") {
    val got = sample.filter($"vec_id" === 1)
      .select(dotSeq(col("embedding"), col("embedding"))).as[Double].head()
    assert(got === 1.0)
  }

  test("bruteTopK: rank 1 is self, neighbors ordered by cosine") {
    val top = Similarity.bruteTopK(sample.filter($"vec_id" === 1), sample, 3)
      .orderBy("rank").as[(Long, Long, Long)].collect()
    assert(top.head === ((1L, 1L, 1L)))   // self has cos 1.0
    assert(top(1) === ((1L, 2L, 2L)))     // nearest real neighbor
    assert(top.length === 3)
  }

  test("cosineNearDupPairs finds only the near pair") {
    val pairs = Similarity.cosineNearDupPairs(sample, 0.9)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    assert(pairs === Set((1L, 2L)))
  }

  test("srpBucket: deterministic, equal for identical vectors") {
    val df = vecs((1L, Seq(1f, 2f, 3f)), (2L, Seq(1f, 2f, 3f)), (3L, Seq(-1f, -2f, -3f)))
    val b = df.select(col("vec_id"), Similarity.srpBucket(col("embedding"), 8, 3).as("b"))
      .as[(Long, Long)].collect().toMap
    assert(b(1L) === b(2L))
    assert(b(1L) !== b(3L)) // mirrored vector flips every non-zero plane sign
  }

  test("lshTopK results are a subset of brute-force candidates per query") {
    val brute = Similarity.bruteTopK(sample.filter($"vec_id" === 1), sample, 4)
      .select("qid", "vid").as[(Long, Long)].collect().toSet
    val lsh = Similarity.lshTopK(sample.filter($"vec_id" === 1), sample, 4,
      numPlanes = 4, dim = 3).select("qid", "vid").as[(Long, Long)].collect().toSet
    assert(lsh.subsetOf(brute))
    assert(lsh.contains((1L, 1L))) // identical vector always shares the bucket
  }
}
