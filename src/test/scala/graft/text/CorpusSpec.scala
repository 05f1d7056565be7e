package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSparkSession
import TextParams._

class CorpusSpec extends AnyFunSuite {
  lazy val spark = GraftSparkSession.spark
  import spark.implicits._

  test("connectedComponents: chain, triangle, isolated pair") {
    // components: {1,2,3,4} (a chain — exercises pointer jumping),
    // {10,11,12} (triangle), {20,21}
    val pairs = Seq(
      (2L, 1L), (2L, 3L), (3L, 4L),
      (10L, 11L), (11L, 12L), (10L, 12L),
      (20L, 21L)).toDF("doc_a", "doc_b")
    val got = Corpus.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("connectedComponents: long path converges (log-round doubling)") {
    // a 64-node path: plain min propagation needs 63 rounds; the
    // pointer-jumped loop must close it well inside maxIter=50
    val pairs = (0L until 63L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val got = Corpus.connectedComponents(pairs).as[(Long, Long)].collect()
    assert(got.length === 64 && got.forall(_._2 === 0L))
  }

  test("dedupClusters: singletons keep themselves; sizes count all members") {
    val docs = (0L to 5L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    val pairs = Seq((0L, 1L), (1L, 2L)).toDF("doc_a", "doc_b")
    val got = Corpus.dedupClusters(docs, pairs)
      .select("doc_id", "cluster_id", "cluster_size", "keep")
      .as[(Long, Long, Long, Boolean)].collect().sortBy(_._1)
    assert(got === Array(
      (0L, 0L, 3L, true), (1L, 0L, 3L, false), (2L, 0L, 3L, false),
      (3L, 3L, 1L, true), (4L, 4L, 1L, true), (5L, 5L, 1L, true)))
  }

  test("dedupClusters/curateCorpus: above-threshold path (no forced broadcast) matches") {
    // broadcastThreshold = 0 forces the shuffled-join fallback — the path a
    // corpus-scale duplicate graph takes (VERDICT.md: an unconditional
    // broadcast of the dup-graph-sized table OOMs at 100x)
    val docs = (0L to 5L).map(i =>
      (i, s"the quick brown fox and the lazy dog $i")).toDF("doc_id", "text")
    val pairs = Seq((0L, 1L), (1L, 2L)).toDF("doc_a", "doc_b")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toString).sorted.toSeq
    val viaBroadcast = Corpus.dedupClusters(docs, pairs)
    val viaShuffle = Corpus.dedupClusters(docs, pairs, broadcastThreshold = 0)
    assert(!viaShuffle.queryExecution.logical.toString.toLowerCase.contains("broadcast"))
    assert(rows(viaShuffle) === rows(viaBroadcast))
    val rates = Seq("en" -> 1.0)
    val cb = Corpus.curateCorpus(docs, pairs, 0.0, rates, 1.0)
    val cs = Corpus.curateCorpus(docs, pairs, 0.0, rates, 1.0,
      broadcastThreshold = 0)
    assert(!cs.queryExecution.logical.toString.toLowerCase.contains("broadcast"))
    assert(rows(cs) === rows(cb))
    assert(cs.count() > 0) // the gate didn't pass by filtering everything out
  }

  test("contamination: shared shingles counted per eval doc") {
    // doc 0 (eval): 4 tokens -> 2 shingles; one of them appears in train
    val docs = Seq(
      (0L, "alpha beta gamma delta"), // eval: shingles {a b g, b g d}
      (1L, "alpha beta gamma zeta"),  // train: contains "alpha beta gamma"
      (10L, "unrelated text entirely")).toDF("doc_id", "text")
    val got = Corpus.contamination(docs, col("doc_id") === 0)
      .as[(Long, Long, Long, Double)].collect()
    assert(got === Array((0L, 2L, 1L, 0.5)))
  }

  test("contamination: zero overlap and full overlap") {
    val docs = Seq(
      (0L, "one two three"),   // eval, exact copy in train
      (2L, "one two three"),
      (10L, "x y z"),          // eval, nothing shared
      (11L, "p q r")).toDF("doc_id", "text")
    val got = Corpus.contamination(docs, col("doc_id") % 10 === 0)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(got === Array((0L, 1L, 1L, 1.0), (10L, 1L, 0L, 0.0)))
  }

  test("sampleStratified: deterministic, honors per-stratum rates") {
    val docs = (0L until 1000L).map(i =>
      (i, s"text $i", if (i % 2 == 0) "en" else "de")).toDF("doc_id", "text", "lang")
    val rates = Seq("en" -> 0.0, "de" -> 1.0)
    val got = Corpus.sampleStratified(docs, col("lang"), rates, 0.5)
      .select("doc_id").as[Long].collect().sorted
    // en rate 0 -> none; de rate 1 -> all odd ids
    assert(got === (1L until 1000L by 2).toArray)
    // repeat run returns the identical set (no RNG state)
    val again = Corpus.sampleStratified(docs, col("lang"), rates, 0.5)
      .select("doc_id").as[Long].collect().sorted
    assert(again === got)
  }

  test("sampleBucket matches the canonical char fold of the id string") {
    val got = Seq(Tuple1(123L)).toDF("doc_id")
      .select(Corpus.sampleBucket(col("doc_id"), 10000)).as[Long].head()
    val want = "123".foldLeft(0L)((a, c) => (a * M1 + c.toInt) % P1) % 10000
    assert(got === want)
  }

  test("vocabTopK: frequency-ranked with deterministic tiebreak") {
    val docs = Seq(
      (1L, "b b b a a c"),
      (2L, "a c d")).toDF("doc_id", "text")
    val got = Corpus.vocabTopK(docs, 3)
      .select("token", "cnt", "rank").as[(String, Long, Long)].collect()
    assert(got === Array(("a", 3L, 1L), ("b", 3L, 2L), ("c", 2L, 3L)))
  }
}
