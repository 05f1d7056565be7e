package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSparkSession
import TextFunctions._
import TextParams._

class TextDedupSpec extends AnyFunSuite {
  lazy val spark = GraftSparkSession.spark
  import spark.implicits._

  def docsDf(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  test("tokens: lowercase, non-alnum split, empties dropped") {
    val got = docsDf((1L, "The quick, QUICK fox!! 42"))
      .select(tokens(col("text"))).as[Seq[String]].head()
    assert(got === Seq("the", "quick", "quick", "fox", "42"))
  }

  test("charHash matches the canonical fold ((acc*131+ascii)%P)") {
    val got = docsDf((1L, "x")).select(charHash(lit("abc"), M1, P1)).as[Long].head()
    val want = "abc".foldLeft(0L)((a, c) => (a * 131 + c.toInt) % P1)
    assert(got === want && want === 1677554L)
  }

  test("hash60 packs two independent 30-bit lanes") {
    val got = docsDf((1L, "x")).select(hash60(lit("abc"))).as[Long].head()
    val h1 = "abc".foldLeft(0L)((a, c) => (a * M1 + c.toInt) % P1)
    val h2 = "abc".foldLeft(0L)((a, c) => (a * M2 + c.toInt) % P2)
    assert(got === (h1 | (h2 << H2Shift)))
  }

  test("hexInt parses md5-style hex") {
    val got = docsDf((1L, "x")).select(hexInt(lit("ff"))).as[Long].head()
    assert(got === 255L)
    assert(docsDf((1L, "x")).select(hexInt(lit("0a"))).as[Long].head() === 10L)
  }

  test("shingles: trigrams when >=3 tokens, whole-text fallback otherwise") {
    val df = docsDf((1L, "a b c d"), (2L, "a b"))
    val got = df.select(col("doc_id"), shingles(tokens(col("text"))).as("s"))
      .as[(Long, Seq[String])].collect().toMap
    assert(got(1L) === Seq("a b c", "b c d"))
    assert(got(2L) === Seq("a b"))
  }

  test("exact dedup groups identical texts, keeper = min doc_id") {
    val df = docsDf((3L, "same text"), (1L, "same text"), (2L, "other"))
    val got = Dedup.exact(df).select("doc_id", "keeper_id", "keep")
      .as[(Long, Long, Boolean)].collect().toSet
    assert(got === Set((1L, 1L, true), (3L, 1L, false), (2L, 2L, true)))
  }

  test("ngram jaccard finds the near-dup pair, not the unrelated one") {
    val a = "spark shuffles data by key across the cluster nodes every stage"
    val b = "spark shuffles data by key across the cluster nodes every phase"
    val c = "completely different words here about nothing in particular at all"
    val got = Dedup.ngramJaccardPairs(docsDf((1L, a), (2L, b), (3L, c)), 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 2L)))
  }

  test("trigram60 == hash60 over materialized distinct shingles; PPJoin path == exact baseline") {
    import graft.text.TextParams.{M1, M2, P1, P2, H2Shift}
    val df = docsDf(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank"),
      (2L, "the quick brown fox jumps over the lazy dog near the river shore"),
      (3L, "a b"), (4L, ""), (5L, "short text"),
      (6L, "completely different words here about nothing in particular at all"))
    // expression parity: trigram60(tokens) == sorted distinct hash60(shingle strings)
    def fold(s: String, m: Long, p: Long): Long =
      s.getBytes("UTF-8").foldLeft(0L)((a, b) => (a * m + (b & 0xff)) % p)
    val got = df.select(col("doc_id"),
        graft.functions.GraftFunctions.trigram60(tokens(col("text"))).as("h"))
      .as[(Long, Seq[Long])].collect().toMap
    val want = df.select(col("doc_id"), shingles(tokens(col("text"))).as("s"))
      .as[(Long, Seq[String])].collect().toMap
      .map { case (id, sh) =>
        id -> sh.map(s => fold(s, M1, P1) | (fold(s, M2, P2) << H2Shift)).distinct.sorted }
    assert(got === want)
    // plan parity: hashed PPJoin pipeline == string inverted-index baseline
    val fast = Dedup.ngramJaccardPairs(df, 0.5)
      .as[(Long, Long, Double)].collect().toSet
    val base = Dedup.ngramJaccardPairs(df, 0.5, exactBaseline = true)
      .as[(Long, Long, Double)].collect().toSet
    assert(fast === base)
    assert(fast.nonEmpty)
  }

  test("minhash-LSH pairs == exact jaccard pairs on near-dup corpus") {
    val base = "the quick brown fox jumps over the lazy dog near the river bank today"
    val df = docsDf(
      (1L, base), (2L, base + " again"), (3L, "unrelated totally different content words"),
      (4L, base.replace("dog", "cat")))
    val exactPairs = Dedup.ngramJaccardPairs(df, 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val lshPairs = Dedup.minhashLshPairs(df, 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    // LSH is a filtered candidate set verified by the same exact Jaccard:
    assert(lshPairs.subsetOf(exactPairs))
    assert(lshPairs.nonEmpty)
  }

  test("simhash: identical docs collide; hamming pairs found") {
    val df = docsDf((1L, "alpha beta gamma delta"), (2L, "alpha beta gamma delta"),
      (3L, "zzz yyy xxx www"))
    val sigs = Dedup.simhashes(df).as[(Long, Long)].collect().toMap
    assert(sigs(1L) === sigs(2L))
    val pairs = Dedup.simhashPairs(df).select("doc_a", "doc_b", "hamming")
      .as[(Long, Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L, 0L)))
  }

  test("fingerprint is order-sensitive") {
    val df = docsDf((1L, "alpha beta gamma"), (2L, "gamma beta alpha"), (3L, "alpha beta gamma"))
    val fps = TextAnalysis.fingerprints(df).as[(Long, Long)].collect().toMap
    assert(fps(1L) === fps(3L))
    assert(fps(1L) !== fps(2L))
  }

  test("quality metrics bounded and deterministic") {
    val q = TextAnalysis.quality(docsDf((1L, "The the of data plus!!"))).collect().head
    assert(q.getAs[Long]("n_tokens") === 5L)
    assert(q.getAs[Double]("stopword_ratio") === 0.8) // the,the,of,data of 5
    assert(q.getAs[Double]("ttr") === 0.8)            // {the,of,data,plus} of 5
    val score = q.getAs[Double]("quality_score")
    assert(score >= 0.0 && score <= 1.0)
  }

  test("langId picks argmax with first-wins tiebreak, und on zero") {
    val df = docsDf((1L, "the and of to is"), (2L, "qqq www eee"))
    val out = TextAnalysis.langId(df).select("doc_id", "lang_pred")
      .as[(Long, String)].collect().toMap
    assert(out(1L) === "en")
    assert(out(2L) === "und")
  }
}
