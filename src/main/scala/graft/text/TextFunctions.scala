package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Canonical text semantics shared by the engine and the DuckDB oracle.
 *
 * Every definition here has two faces kept in lock-step:
 *  - a Spark `Column` composition (built-ins only, whole-stage-codegen'd);
 *  - an ANSI-ish SQL fragment (`TextParams.sql*`) inlined into the oracle.
 *
 * All hashing is plain 64-bit integer arithmetic (char-polynomial folds mod
 * 30-bit primes) rather than engine-native hash functions, so Spark and
 * DuckDB provably compute the same values. Float reductions (cosine) are
 * *sequential left folds* so IEEE summation order — and therefore every last
 * bit of the result — is identical across engines.
 *
 * The reference has no text analytics; this layer is the training-data
 * pipeline addition (dedup / quality / language-id / fingerprinting) that a
 * 100 TB document corpus needs in front of the spatial engine. Hot paths are
 * per-row expression trees: no shuffles, no UDFs, no driver loops.
 */
object TextParams {
  /** char-polynomial hash 1: fold (acc*M1 + ascii(c)) % P1 — < 2^30 */
  val M1 = 131L;     val P1 = 1000000007L
  /** char-polynomial hash 2 (independent): < 2^30 */
  val M2 = 137L;     val P2 = 999999937L
  /** 60-bit combined hash: H1 | H2 << 30 */
  val H2Shift = 30
  val SimHashBits = 60
  /** minhash signature layout: 16 hashes = 4 bands x 4 rows */
  val NumHashes = 16; val Bands = 4; val RowsPerBand = 4
  def aCoef(j: Int): Long = 37L + 101L * j
  def bCoef(j: Int): Long = 17L + 59L * j
  /** token-sequence fingerprint multipliers (two 30-bit lanes -> 60 bits) */
  val FpM1 = 1000003L; val FpM2 = 999983L
  /** default similarity thresholds (tuned to the synthetic corpus) */
  val JaccardThreshold = 0.5
  val CosineThreshold = 0.45
  /** simhash near-dup: max hamming distance; bands for the candidate join */
  val MaxHamming = 3; val SimHashBands = 4

  val stopwords: Seq[String] = Seq(
    "the", "a", "of", "and", "to", "in", "is", "it", "for", "on",
    "key", "row", "data", "value", "table")

  // ---------------------------------------------------------------- SQL face

  /** tokens of x: lowercase, split on non-alphanumeric, drop empties. */
  def sqlTokens(x: String): String =
    s"list_filter(string_split_regex(lower($x), '[^a-z0-9]+'), t -> t <> '')"

  /** char-polynomial fold of string s (DuckDB). */
  def sqlCharHash(s: String, m: Long, p: Long): String =
    s"list_reduce(list_prepend(0::BIGINT, list_transform(string_split($s, ''), c -> CAST(ascii(c) AS BIGINT))), (a, b) -> (a * $m + b) % $p)"

  def sqlHash60(s: String): String =
    s"(${sqlCharHash(s, M1, P1)} | (${sqlCharHash(s, M2, P2)} << $H2Shift))"

  /** hex pair -> int (for the multimodal decode stub). */
  def sqlHexInt(s: String): String =
    s"list_reduce(list_prepend(0::BIGINT, list_transform(string_split($s, ''), c -> CAST(CASE WHEN ascii(c) >= 97 THEN ascii(c) - 87 ELSE ascii(c) - 48 END AS BIGINT))), (a, b) -> a * 16 + b)"

  /** token-trigram shingles (fallback: whole token string when < 3 tokens). */
  def sqlShingles(toks: String): String =
    s"""CASE WHEN len($toks) >= 3
        THEN list_distinct([($toks)[i] || ' ' || ($toks)[i+1] || ' ' || ($toks)[i+2] for i in range(1, len($toks) - 1)])
        ELSE [array_to_string($toks, ' ')] END"""

  /** sequential-fold dot product of two float lists cast to double. */
  def sqlDotSeq(a: String, b: String, dim: Int): String =
    s"list_reduce(list_prepend(0.0::DOUBLE, [CAST(($a)[i] AS DOUBLE) * CAST(($b)[i] AS DOUBLE) for i in range(1, ${dim + 1})]), (x, y) -> x + y)"

  def sqlCosine(a: String, b: String, dim: Int): String =
    s"(${sqlDotSeq(a, b, dim)} / (sqrt(${sqlDotSeq(a, a, dim)}) * sqrt(${sqlDotSeq(b, b, dim)})))"
}

object TextFunctions {
  import TextParams._
  import graft.functions.GraftFunctions.{char_fold_hash, vec_dot}

  /** tokens(text): lowercase, split on non-alphanumeric runs, drop empties. */
  def tokens(text: Column): Column =
    filter(split(lower(text), "[^a-z0-9]+"), t => t =!= "")

  /** char-polynomial fold hash of a single string column (native loop;
   * identical to the interpreted `aggregate(split(s,""), ...)` fold on the
   * ASCII inputs this engine feeds it). */
  def charHash(s: Column, m: Long, p: Long): Column =
    char_fold_hash(s, lit(m), lit(p))

  /** 60-bit combined hash (two independent 30-bit lanes). */
  def hash60(s: Column): Column =
    charHash(s, M1, P1).bitwiseOR(shiftleft(charHash(s, M2, P2), H2Shift))

  /** hex string -> integer (decode-stub arithmetic, matches sqlHexInt). */
  def hexInt(s: Column): Column =
    aggregate(split(s, ""), lit(0L),
      (acc, c) => acc * 16 + when(ascii(c) >= 97, ascii(c) - 87).otherwise(ascii(c) - 48))

  /** distinct token-trigram shingles; whole-text fallback under 3 tokens. */
  def shingles(toks: Column): Column =
    when(size(toks) >= 3,
      array_distinct(transform(sequence(lit(0), size(toks) - 3), i =>
        concat_ws(" ", element_at(toks, i + 1), element_at(toks, i + 2), element_at(toks, i + 3)))))
      .otherwise(array(array_join(toks, " ")))

  /**
   * minhash signature from a precomputed shingle-hash array: NumHashes minima
   * of (a_j*h + b_j) mod P1, in one native pass over the array.
   */
  def minhashSigFromHashes(hashed: Column): Column =
    graft.functions.GraftFunctions.minhash_sig(hashed)

  /**
   * 60-bit simhash from a precomputed token-hash array (majority vote per
   * bit) — one native two-pass loop per row; no shuffle, no UDF.
   */
  def simhashFromHashes(hashes: Column): Column =
    graft.functions.GraftFunctions.simhash60(hashes)

  /** order-sensitive token-sequence fingerprint: two 30-bit polynomial lanes. */
  def fingerprint(toks: Column): Column = {
    def lane(m: Long, p: Long) =
      aggregate(toks, lit(0L), (acc, t) => (acc * m + charHash(t, M1, P1)) % p)
    lane(FpM1, P1).bitwiseOR(shiftleft(lane(FpM2, P2), H2Shift))
  }

  /** sequential-fold dot product over float arrays (elements widened to
   * double before multiply — identical IEEE ops to the SQL face). */
  def dotSeq(a: Column, b: Column): Column = vec_dot(a, b)

  def cosine(a: Column, b: Column): Column =
    dotSeq(a, b) / (sqrt(dotSeq(a, a)) * sqrt(dotSeq(b, b)))
}
