package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import TextFunctions._
import TextParams._

/**
 * Per-document text analysis: token counting, quality scoring, language-id
 * heuristic, order-sensitive fingerprinting. All pure per-row expression
 * trees over `documents(doc_id, text, ...)` — the map side of a training-data
 * filter pipeline; at 100 TB these run inside the parquet scan stage with
 * zero shuffle.
 */
object TextAnalysis {

  /** Spread tiny-file inputs across cores before per-row text work. */
  private def spread(df: DataFrame): DataFrame = graft.util.Spread.spread(df)

  /** Token + character counts. */
  def tokenCounts(docs: DataFrame): DataFrame =
    spread(docs).select(col("doc_id"),
      length(col("text")).cast("long").as("n_chars"),
      size(tokens(col("text"))).cast("long").as("n_tokens"))

  /**
   * Quality metrics: type-token ratio, mean token length, whitespace-stripped
   * alpha ratio, stopword ratio, and a linear quality score. Single division
   * per ratio keeps Spark/DuckDB doubles bit-identical.
   *
   * Zero denominators (empty / punctuation-only documents that tokenize to
   * nothing) are guarded to 0.0 on BOTH engines: unguarded, Spark's
   * non-ANSI division yields NULL while DuckDB yields inf/NaN — a latent
   * oracle mismatch, and NULL scores silently fall out of threshold filters
   * in a real corpus (ADVICE.md).
   */
  /** The quality metric columns over (text, toks) — exposed so fused
   * pipelines (Corpus.curateCorpus) can compute them in the SAME projection
   * as other per-doc metrics instead of joining per-metric frames. */
  def qualityCols(text: Column, toks: Column): Seq[Column] = {
    val nTok = size(toks)
    val nTypes = size(array_distinct(toks))
    val alphaChars = length(regexp_replace(lower(text), "[^a-z0-9]", ""))
    val stopArr = array(stopwords.map(lit): _*)
    val nStop = size(filter(toks, t => array_contains(stopArr, t)))
    val tokenChars = aggregate(toks, lit(0), (acc, t) => acc + length(t))
    def overTokens(num: Column): Column =
      when(nTok === 0, lit(0.0)).otherwise(num.cast("double") / nTok)
    Seq(
      nTok.cast("long").as("n_tokens"),
      overTokens(nTypes).as("ttr"),
      overTokens(tokenChars).as("mean_token_len"),
      when(length(text) === 0, lit(0.0))
        .otherwise(alphaChars.cast("double") / length(text)).as("alpha_ratio"),
      overTokens(nStop).as("stopword_ratio"))
  }

  /** quality_score over the named metric columns of [[qualityCols]]. */
  def qualityScore: Column =
    col("ttr") * 0.4 + col("alpha_ratio") * 0.4 +
      (lit(1.0) - col("stopword_ratio")) * 0.2

  def quality(docs: DataFrame): DataFrame =
    spread(docs).select(col("doc_id"), col("text"), tokens(col("text")).as("toks"))
      .select(col("doc_id") +: qualityCols(col("text"), col("toks")): _*)
      .withColumn("quality_score", qualityScore)

  /**
   * Language-id heuristic: marker-token hits per language, argmax with
   * deterministic tiebreak (score desc, language asc), 'und' when no marker
   * hits. The marker lists are the operator's config, not learned state.
   */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is", "value", "fast"),
    "de" -> Seq("der", "die", "und", "das", "ist", "slow", "window"),
    "es" -> Seq("el", "la", "de", "los", "es", "scan", "batch"),
    "fr" -> Seq("le", "la", "et", "les", "est", "join", "filter"),
    "zh" -> Seq("de", "shi", "le", "zai", "he", "spark", "column"))

  /** Marker-hit score columns over a token-array column (one per language). */
  def langScoreCols(toks: Column): Seq[Column] =
    langMarkers.map { case (lang, markers) =>
      val arr = array(markers.map(lit): _*)
      size(filter(toks, t => array_contains(arr, t))).cast("long").as(s"score_$lang")
    }

  /** lang_pred over the named score columns of [[langScoreCols]]. */
  def langPred: Column = {
    val best = langMarkers.map { case (lang, _) =>
      struct(col(s"score_$lang").as("s"), lit(lang).as("l"))
    }.reduce((a, b) =>
      when(b.getField("s") > a.getField("s"), b).otherwise(a))
    when(greatest(langMarkers.map(m => col(s"score_${m._1}")): _*) === 0, "und")
      .otherwise(best.getField("l"))
  }

  def langId(docs: DataFrame): DataFrame =
    spread(docs).select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id") +: langScoreCols(col("toks")): _*)
      .withColumn("lang_pred", langPred)

  /** Order-sensitive 60-bit document fingerprint over the token sequence. */
  def fingerprints(docs: DataFrame): DataFrame =
    spread(docs).select(col("doc_id"), fingerprint(tokens(col("text"))).as("fp"))
}
