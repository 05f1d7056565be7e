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

  test("cosineNearDupPairs (blocked exact plan) finds only the near pair") {
    val pairs = Similarity.cosineNearDupPairs(sample, 0.9)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    assert(pairs === Set((1L, 2L)))
  }

  test("blocked plan covers every pair exactly once regardless of block count") {
    // 40 vectors, many near-dup pairs; every blocks setting must agree
    val many = vecs((0L until 40L).map(i =>
      (i, Seq((1000 + (i % 7)).toFloat, (i % 3).toFloat, 1f))): _*)
    def run(blocks: Int) = Similarity.cosineNearDupPairs(many, 0.999, blocks)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    val b1 = run(1)
    assert(b1.nonEmpty)
    assert(run(3) === b1)
    assert(run(8) === b1)
    // no duplicates: count equals set size
    val cnt = Similarity.cosineNearDupPairs(many, 0.999, 5).count()
    assert(cnt === run(5).size)
  }

  test("cosineNearDupPairs enforces the maxVectors quadratic-cost contract") {
    val ex = intercept[IllegalArgumentException] {
      Similarity.cosineNearDupPairs(sample, 0.9, maxVectors = 2)
    }
    assert(ex.getMessage.contains("maxVectors"))
  }

  test("srpNearDupPairs is a verified subset of the exact pairs") {
    val exact = Similarity.cosineNearDupPairs(sample, 0.9)
      .select("vec_a", "vec_b", "cos").as[(Long, Long, Double)].collect().toSet
    val approx = Similarity.srpNearDupPairs(sample, 0.9, numTables = 4,
      numPlanes = 4, dim = 3)
      .select("vec_a", "vec_b", "cos").as[(Long, Long, Double)].collect().toSet
    assert(approx.subsetOf(exact))
  }

  test("srpNearDupPairs hot-bucket guard: oversized buckets salt deterministically") {
    // 300 IDENTICAL vectors: every table hashes them into ONE bucket, which
    // unguarded would emit C(300,2) = 44850 candidates on a single shuffle
    // key per table. With maxBucketSize = 50 the bucket splits into
    // ns = ceil(300/50) = 6 residue classes of vec_id; survivors are exactly
    // the pairs with vec_a ≡ vec_b (mod 6) — 6 * C(50,2) = 7350 pairs, every
    // one verified at cos = 1.0.
    val many = vecs((0L until 300L).map(i => (i, Seq(1f, 2f, 3f))): _*)
    val got = Similarity.srpNearDupPairs(many, 0.9, numTables = 2,
        numPlanes = 4, dim = 3, maxBucketSize = 50L)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    val expected = (for {
      a <- 0L until 300L; b <- (a + 1) until 300L; if a % 6 == b % 6
    } yield (a, b)).toSet
    assert(got === expected)
    assert(got.size === 7350)
    // small buckets (under the cap) are untouched: full pair set survives
    val few = vecs((0L until 20L).map(i => (i, Seq(1f, 2f, 3f))): _*)
    val full = Similarity.srpNearDupPairs(few, 0.9, numTables = 2,
        numPlanes = 4, dim = 3, maxBucketSize = 50L).count()
    assert(full === 190L) // C(20,2)
  }

  test("srpBucket raises on a dim mismatch instead of hashing a prefix") {
    val ex = intercept[Exception] {
      sample.select(Similarity.srpBucket(col("embedding"), 8, 64).as("b")).collect()
    }
    assert(ex.getMessage.contains("srp_bucket") ||
      Option(ex.getCause).exists(_.getMessage.contains("srp_bucket")))
  }

  test("sqQuantize: codes match the floor((c/n)*127) contract within int8 range") {
    val rows = sample
      .select(col("vec_id"), col("embedding"),
        Similarity.sqQuantize(col("embedding"), 3).as("q"))
      .as[(Long, Seq[Float], Seq[Long])].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, e, q) =>
      val n = math.sqrt(e.map(c => c.toDouble * c.toDouble).sum)
      val expect = e.map(c => math.max(-127L, math.min(127L,
        math.floor(c.toDouble / n * 127.0).toLong)))
      assert(q === expect)
      // dequantized code is within one quantization step of the component
      q.zip(e).foreach { case (qi, c) =>
        assert(math.abs(qi / 127.0 - c.toDouble / n) < 1.0 / 127.0 + 1e-12)
      }
      assert(q.forall(v => v >= -127L && v <= 127L))
    }
  }

  test("sqQuantize raises on a dim mismatch instead of quantizing a prefix") {
    val ex = intercept[Exception] {
      sample.select(Similarity.sqQuantize(col("embedding"), 64).as("q")).collect()
    }
    assert(ex.getMessage.contains("sq_quantize") ||
      Option(ex.getCause).exists(_.getMessage.contains("sq_quantize")))
  }

  test("sqTopK matches bruteTopK on axis-aligned vectors (exact quantization)") {
    val axes = vecs(
      (1L, Seq(1f, 0f, 0f)), (2L, Seq(0f, 1f, 0f)), (3L, Seq(0f, 0f, 1f)),
      (4L, Seq(-1f, 0f, 0f)), (5L, Seq(2f, 0f, 0f))) // 5 normalizes to axis 1
    val q = axes.filter($"vec_id" <= 2)
    val sq = Similarity.sqTopK(q, axes, 5, dim = 3)
      .as[(Long, Long, Long)].collect().sorted.toSeq
    val brute = Similarity.bruteTopK(q, axes, 5)
      .as[(Long, Long, Long)].collect().sorted.toSeq
    assert(sq === brute && sq.size === 10)
  }

  test("srpBucket: deterministic, equal for identical vectors") {
    val df = vecs((1L, Seq(1f, 2f, 3f)), (2L, Seq(1f, 2f, 3f)), (3L, Seq(-1f, -2f, -3f)))
    val b = df.select(col("vec_id"), Similarity.srpBucket(col("embedding"), 8, 3).as("b"))
      .as[(Long, Long)].collect().toMap
    assert(b(1L) === b(2L))
    assert(b(1L) !== b(3L)) // mirrored vector flips every non-zero plane sign
  }

  test("ivfCell: deterministic, equal vectors share a list, dim guarded") {
    val df = vecs((1L, Seq(1f, 2f, 3f)), (2L, Seq(1f, 2f, 3f)), (3L, Seq(9f, -4f, 2f)))
    val cells = df.select(col("vec_id"),
        Similarity.ivfCell(col("embedding"), 8, 3).as("c"))
      .as[(Long, Int)].collect().toMap
    assert(cells(1L) === cells(2L))
    assert(cells.values.forall(c => c >= 0 && c < 8))
    val ex = intercept[Exception] {
      df.select(Similarity.ivfCell(col("embedding"), 8, 64)).collect()
    }
    assert(ex.getMessage.contains("ivf_cell") ||
      Option(ex.getCause).exists(_.getMessage.contains("ivf_cell")))
  }

  test("ivfTopK with nProbe = nCentroids degenerates to exact brute-force") {
    // 30 vectors, 3 query vectors: probing every list scores every pair,
    // so results must equal bruteTopK row-for-row
    val many = vecs((0L until 30L).map(i =>
      (i, Seq((i % 7).toFloat - 3f, (i % 5).toFloat, (i % 3).toFloat + 1f))): _*)
    val qs = many.filter($"vec_id" % 10 === 0)
    val brute = Similarity.bruteTopK(qs, many, 4)
      .as[(Long, Long, Long)].collect().toSet
    val ivf = Similarity.ivfTopK(qs, many, 4, nCentroids = 8, nProbe = 8, dim = 3)
      .as[(Long, Long, Long)].collect().toSet
    assert(ivf === brute)
  }

  test("ivfTopK partial probing: self always found, ranks contiguous from 1") {
    // top-k WITHIN probed lists is not a subset of the global top-k (a poor
    // probe set can surface globally-distant vectors), so assert the sound
    // properties: a query's own list is always probed (its centroid is its
    // best, rank 1 of the probe window), ranks are 1..n per query, n <= k
    val many = vecs((0L until 30L).map(i =>
      (i, Seq((i % 7).toFloat - 3f, (i % 5).toFloat, (i % 3).toFloat + 1f))): _*)
    val qs = many.filter($"vec_id" % 10 === 0)
    val ivf = Similarity.ivfTopK(qs, many, 4, nCentroids = 8, nProbe = 2, dim = 3)
      .as[(Long, Long, Long)].collect()
    val byQ = ivf.groupBy(_._1)
    assert(byQ.keySet === Set(0L, 10L, 20L))
    byQ.foreach { case (q, rows) =>
      assert(rows.length <= 4)
      assert(rows.map(_._3).sorted.toSeq === (1L to rows.length).toSeq)
      assert(rows.filter(_._3 == 1L).head._2 === q) // self: cos 1.0, min vid
    }
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
