package graft.ops

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSparkSession

class KnnIndexSpec extends AnyFunSuite {
  lazy val spark = GraftSparkSession.spark
  import spark.implicits._

  private def corpus = (0 until 500).map { i =>
    (i.toLong, (i * 31 % 360) - 180.0 + i * 1e-4, (i * 57 % 170) - 85.0 + i * 1e-4)
  }
  private val queryRows = Seq((1L, 0.5, 0.5), (2L, -179.9, -84.9), (3L, 10.0, 40.0))

  test("knnJoinIndexed over a saved+loaded index equals knnJoin row-for-row") {
    val targets = corpus.toDF("pid", "lon", "lat")
    val queries = queryRows.toDF("qid", "qlon", "qlat")
    val direct = SpatialJoins.knnJoin(queries, targets, k = 4)
      .select("qid", "pid", "rank").as[(Long, Long, Long)].collect().toSet

    val dir = Files.createTempDirectory("graft_knn_idx").toString
    KnnIndex.save(KnnIndex.build(targets, kMax = 6), dir)
    val loaded = KnnIndex.load(spark, dir)
    assert(loaded.kMax === 6)
    assert(loaded.ringK === 2)
    assert(loaded.levels === Seq(20, 18, 16, 14, 12, 10, 8, 6))

    // k=4 < kMax=6 exercises the lossless-dedup contract (top-4 of the
    // kept-6 stack prefix is the true top-4)
    val indexed = SpatialJoins.knnJoinIndexed(queries, loaded, k = 4)
      .select("qid", "pid", "rank").as[(Long, Long, Long)].collect().toSet
    assert(indexed === direct)
    assert(direct.nonEmpty)
  }

  test("co-located stacks: index built at kMax stays exact for any k <= kMax") {
    // 40 points stacked on ONE coordinate + a spread background; top-k must
    // be the k smallest pids of the stack for a query at the stack
    val stacked = (0 until 40).map(i => (100L + i, 7.0, 7.0)) ++
      (0 until 200).map(i => (i.toLong, (i % 20) - 10.0, (i % 14) - 7.0))
    val targets = stacked.toDF("pid", "lon", "lat")
    val queries = Seq((9L, 7.0, 7.0)).toDF("qid", "qlon", "qlat")
    val dir = Files.createTempDirectory("graft_knn_idx2").toString
    KnnIndex.save(KnnIndex.build(targets, kMax = 5), dir)
    val got = SpatialJoins.knnJoinIndexed(queries, KnnIndex.load(spark, dir), k = 3)
      .select("pid", "rank").as[(Long, Long)].collect().sortBy(_._2).map(_._1)
    assert(got.toSeq === Seq(100L, 101L, 102L))
  }

  test("knnJoinIndexed rejects k above the index's kMax") {
    val targets = corpus.take(50).toDF("pid", "lon", "lat")
    val queries = queryRows.toDF("qid", "qlon", "qlat")
    val idx = KnnIndex.build(targets, kMax = 3)
    val ex = intercept[IllegalArgumentException] {
      SpatialJoins.knnJoinIndexed(queries, idx, k = 5)
    }
    assert(ex.getMessage.contains("kMax"))
  }
}
