package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ann.Similarity
import graft.gen.DerivedTables
import graft.media.Multimodal
import graft.text.{Corpus, Dedup, TextAnalysis}
import graft.text.TextParams._

/**
 * Training-data pipeline queries + their DuckDB oracles: deduplication
 * (exact / n-gram Jaccard / MinHash-LSH / SimHash / embedding-cosine),
 * similarity search (brute-force + SRP-LSH top-k), text analysis (token
 * stats, quality, language-id, fingerprints) and multimodal decode plumbing.
 *
 * Oracle fidelity: every float is produced by *sequential-fold* arithmetic
 * and every hash by shared integer folds (TextParams.sql*), so Spark and
 * DuckDB results are bit-identical — the same guarantee the geo suite gets
 * from integer cell ids.
 */
object TrainingQueries {

  private val EmbDim = 64
  private val TopK = 5
  private val QueryMod = 25
  private val NumPlanes = 8
  /** SRP hash tables for the sub-quadratic near-dup path (srp_near_dup) */
  private val SrpTables = 8
  /** hot-bucket salt cap for srp_near_dup (Similarity.srpNearDupPairs) */
  private val SrpMaxBucket = 4096L
  private val IvfCentroids = 16
  private val IvfProbe = 4
  /** eval split for the contamination screen: doc_id % EvalMod == 0 */
  private val EvalMod = 10
  /** stratified-sampling config: per-lang keep rates over SampleBuckets */
  private val SampleRates = Seq(
    "en" -> 0.3, "de" -> 0.7, "fr" -> 0.5, "es" -> 0.6, "zh" -> 0.4)
  private val SampleDefault = 1.0
  private val SampleBuckets = 10000
  private val VocabK = 100
  /** curation quality gate (synthetic-corpus scores span ~0.58-0.93) */
  private val CurateQualityMin = 0.63

  // ----------------------------------------------------------------- queries

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_tokens" -> ((s, dir) => TextAnalysis.tokenCounts(docs(s, dir))),
    "text_quality" -> ((s, dir) => TextAnalysis.quality(docs(s, dir))),
    "lang_id" -> ((s, dir) => TextAnalysis.langId(docs(s, dir))),
    "doc_fingerprint" -> ((s, dir) => TextAnalysis.fingerprints(docs(s, dir))),

    "dedup_exact" -> ((s, dir) => Dedup.exact(docs(s, dir))),
    "dedup_ngram_jaccard" -> ((s, dir) => Dedup.ngramJaccardPairs(docs(s, dir))),
    // sig serialized to a ','-joined string: the driver's pandas compare
    // cannot hash an array<long> column (r01 red row "unhashable type:
    // numpy.ndarray"); the string is value-equivalent and compare-stable
    "minhash_sig" -> ((s, dir) => Dedup.minhashSignatures(docs(s, dir))
      .select(col("doc_id"), array_join(col("sig"), ",").as("sig"))),
    "dedup_minhash_lsh" -> ((s, dir) => Dedup.minhashLshPairs(docs(s, dir))),
    "dedup_clusters" -> ((s, dir) => {
      val d = docs(s, dir)
      Corpus.dedupClusters(d, Dedup.minhashLshPairs(d))
    }),
    "simhash_sig" -> ((s, dir) => Dedup.simhashes(docs(s, dir))),
    "dedup_simhash" -> ((s, dir) => Dedup.simhashPairs(docs(s, dir))),

    "contamination" -> ((s, dir) =>
      Corpus.contamination(docs(s, dir), col("doc_id") % EvalMod === 0)),
    "sample_stratified" -> ((s, dir) =>
      Corpus.sampleStratified(docs(s, dir), col("lang"), SampleRates, SampleDefault,
          SampleBuckets)
        .select(col("doc_id"), col("lang"), col("bucket"))),
    "vocab_topk" -> ((s, dir) => Corpus.vocabTopK(docs(s, dir), VocabK)),
    // end-to-end curation: quality gate ∧ confident lang-id ∧ near-dup
    // cluster keeper ∧ stratified sample — one fused corpus projection +
    // broadcast anti-join on the dup losers (zero corpus shuffles)
    "curate_corpus" -> ((s, dir) => {
      val d = docs(s, dir)
      Corpus.curateCorpus(d, Dedup.minhashLshPairs(d), CurateQualityMin,
        SampleRates, SampleDefault, SampleBuckets)
    }),

    "embed_near_dup" -> ((s, dir) =>
      Similarity.cosineNearDupPairs(emb(s, dir), CosineThreshold)),
    // the 10^12-scale near-dup path: multi-table SRP candidates + exact
    // verify (precision 1.0, tunable recall) — sub-quadratic, unlike the
    // exact embed_near_dup above (VERDICT.md missing #1)
    "srp_near_dup" -> ((s, dir) =>
      Similarity.srpNearDupPairs(emb(s, dir), CosineThreshold, SrpTables,
        NumPlanes, EmbDim, SrpMaxBucket)),
    "ann_topk" -> ((s, dir) =>
      Similarity.bruteTopK(emb(s, dir).filter(col("vec_id") % QueryMod === 0),
        emb(s, dir), TopK)),
    "ann_lsh_topk" -> ((s, dir) =>
      Similarity.lshTopK(emb(s, dir).filter(col("vec_id") % QueryMod === 0),
        emb(s, dir), TopK, NumPlanes, EmbDim)),
    "srp_bucket" -> ((s, dir) =>
      emb(s, dir).select(col("vec_id"),
        Similarity.srpBucket(col("embedding"), NumPlanes, EmbDim).as("bucket"))),
    "ivf_assign" -> ((s, dir) =>
      emb(s, dir).select(col("vec_id"),
        Similarity.ivfCell(col("embedding"), IvfCentroids, EmbDim)
          .cast("long").as("ivf_cell"))),
    "ann_ivf_topk" -> ((s, dir) =>
      Similarity.ivfTopK(emb(s, dir).filter(col("vec_id") % QueryMod === 0),
        emb(s, dir), TopK, IvfCentroids, IvfProbe, EmbDim)),
    // codes serialized to a ','-joined string (the minhash_sig idiom: the
    // driver compare cannot hash an array column)
    "sq_encode" -> ((s, dir) => {
      val e = emb(s, dir).withColumn("n",
        sqrt(graft.text.TextFunctions.dotSeq(col("embedding"), col("embedding"))))
        .filter(col("n") > 0)
      e.select(col("vec_id"),
        array_join(Similarity.sqQuantize(col("embedding"), EmbDim), ",").as("q"))
    }),
    "ann_sq_topk" -> ((s, dir) =>
      Similarity.sqTopK(emb(s, dir).filter(col("vec_id") % QueryMod === 0),
        emb(s, dir), TopK, EmbDim)),

    "media_decode" -> ((s, dir) => Multimodal.decodeMeta(media(s, dir))),
    "media_frames" -> ((s, dir) =>
      Multimodal.frameSample(Multimodal.decodeMeta(media(s, dir)))),
    "media_resize" -> ((s, dir) =>
      Multimodal.resizeMeta(Multimodal.decodeMeta(media(s, dir)))),
    // typed batch path (mapPartitions decode stub); the stub arithmetic is
    // md5-derivable, so the same mediaCte oracle covers it (cast to BIGINT
    // to match the oracle's integer type)
    "media_features" -> ((s, dir) =>
      Multimodal.extractFeatures(s, media(s, dir)).toDF()
        .select(col("doc_id"), col("media_ref"), col("width").cast("long"),
          col("height").cast("long"), col("n_frames").cast("long"))),
  )

  private def docs(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    s.read.parquet(s"$dir/documents.parquet")
  }
  private def emb(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    s.read.parquet(s"$dir/embeddings.parquet")
  }
  private def media(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    DerivedTables.register(s, dir)
    Multimodal.mediaTable(s.table("doc_spans"))
  }

  // ----------------------------------------------------------------- oracles

  /** tokenized documents CTE */
  private val tdocs =
    s"tdocs AS (SELECT doc_id, text, ${sqlTokens("text")} AS toks FROM documents)"

  /** HASHED distinct-shingle index (hash60 per shingle — BOTH exact-Jaccard
   * engine paths, the ngram PPJoin and the LSH verify, carry shingles as
   * 60-bit hashes end to end; DISTINCT here mirrors the engine's
   * dedup-by-hash, so the two sides agree even on a hash collision). */
  private val hshingleCtes = s"""
    hsidx AS (SELECT DISTINCT doc_id, ${sqlHash60("shingle")} AS h
              FROM (SELECT doc_id, unnest(${sqlShingles("toks")}) AS shingle FROM tdocs)),
    hsizes AS (SELECT doc_id, count(*) AS n FROM hsidx GROUP BY doc_id),
    hinter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
      FROM hsidx a JOIN hsidx b ON a.h = b.h AND a.doc_id < b.doc_id
      GROUP BY 1, 2)"""

  private val hjaccardSelect = s"""
    SELECT i.doc_a AS doc_a, i.doc_b AS doc_b,
           i.i / (sa.n + sb.n - i.i) AS jaccard
    FROM hinter i
    JOIN hsizes sa ON sa.doc_id = i.doc_a
    JOIN hsizes sb ON sb.doc_id = i.doc_b
    WHERE i.i / (sa.n + sb.n - i.i) >= $JaccardThreshold"""

  /** minhash signature list expression over a shingle-hash list column hs */
  private def sigExpr: String =
    "[" + (0 until NumHashes).map { j =>
      s"list_min(list_transform(hs, h -> (h * ${aCoef(j)} + ${bCoef(j)}) % $P1))"
    }.mkString(", ") + "]"

  private val minhashCtes = s"""
    hdocs AS (SELECT doc_id, list_transform(${sqlShingles("toks")}, s -> ${sqlCharHash("s", M1, P1)}) AS hs FROM tdocs),
    sigs AS (SELECT doc_id, $sigExpr AS sig FROM hdocs)"""

  /** minhash-LSH verified pair list as a composable CTE block (consumed by
   * both the pair query and the cluster-closure query). */
  private val lshPairCtes = s"""$minhashCtes,
    bandrows AS (
      SELECT doc_id, bs.b AS band,
             array_to_string(list_slice(sig, bs.b * $RowsPerBand + 1, bs.b * $RowsPerBand + $RowsPerBand), ',') AS bkey
      FROM sigs, (SELECT unnest(range(0, $Bands)) AS b) bs),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bandrows a JOIN bandrows b
        ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id),
    $hshingleCtes,
    lshpairs AS (
      SELECT c.doc_a AS doc_a, c.doc_b AS doc_b,
             i.i / (sa.n + sb.n - i.i) AS jaccard
      FROM cand c
      JOIN hinter i ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b
      JOIN hsizes sa ON sa.doc_id = c.doc_a
      JOIN hsizes sb ON sb.doc_id = c.doc_b
      WHERE i.i / (sa.n + sb.n - i.i) >= $JaccardThreshold)"""

  /** per-doc quality metrics CTE block ending in `qual` */
  private val qualityCtes = s"""
    q AS (
      SELECT doc_id,
        CAST(len(toks) AS BIGINT) AS n_tokens,
        CASE WHEN len(toks) = 0 THEN 0.0 ELSE CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) END AS ttr,
        CASE WHEN len(toks) = 0 THEN 0.0 ELSE CAST(list_reduce(list_prepend(0::BIGINT, list_transform(toks, t -> CAST(length(t) AS BIGINT))), (a, b) -> a + b) AS DOUBLE) / len(toks) END AS mean_token_len,
        CASE WHEN length(text) = 0 THEN 0.0 ELSE CAST(length(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS DOUBLE) / length(text) END AS alpha_ratio,
        CASE WHEN len(toks) = 0 THEN 0.0 ELSE CAST(len(list_filter(toks, t -> list_contains(${stopwords.mkString("['", "', '", "']")}, t))) AS DOUBLE) / len(toks) END AS stopword_ratio
      FROM tdocs),
    qual AS (
      SELECT doc_id, n_tokens, ttr, mean_token_len, alpha_ratio, stopword_ratio,
             ttr * 0.4 + alpha_ratio * 0.4 + (1.0 - stopword_ratio) * 0.2 AS quality_score
      FROM q)"""

  /** language-prediction CTE block ending in `lpred` */
  private val langPredCtes: String = {
    val scores = TextAnalysis.langMarkers
      .map { case (l, m) => s"${langScore(m)} AS score_$l" }.mkString(",\n          ")
    val names = TextAnalysis.langMarkers.map(_._1)
    val m = names.map(l => s"score_$l").mkString("greatest(", ", ", ")")
    val argmax = names.map(l => s"WHEN score_$l = $m THEN '$l'").mkString(" ")
    s"""
    sc AS (
      SELECT doc_id,
        $scores
      FROM tdocs),
    lpred AS (
      SELECT doc_id, ${names.map(l => s"score_$l").mkString(", ")},
             CASE WHEN $m = 0 THEN 'und' $argmax END AS lang_pred
      FROM sc)"""
  }

  /** duplicate-cluster labels via recursive transitive closure, ending in
   * `lab(doc_id, cluster_id)` over ALL documents (requires WITH RECURSIVE
   * and $lshPairCtes before it). */
  private val clusterCtes = s"""
    sym AS (SELECT doc_a AS a, doc_b AS b FROM lshpairs
            UNION SELECT doc_b, doc_a FROM lshpairs),
    reach AS (
      SELECT a, b FROM sym
      UNION
      SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a),
    comp AS (SELECT a AS doc_id, least(a, min(b)) AS cluster_id
             FROM reach GROUP BY a),
    lab AS (SELECT d.doc_id, coalesce(c.cluster_id, d.doc_id) AS cluster_id
            FROM documents d LEFT JOIN comp c USING (doc_id))"""

  private val simhashCtes = s"""
    stok AS (SELECT doc_id, unnest(toks) AS tk FROM tdocs),
    sth AS (SELECT doc_id, ${sqlHash60("tk")} AS h FROM stok),
    votes AS (
      SELECT doc_id, ks.k AS k, sum(((h >> ks.k) & 1) * 2 - 1) AS vote
      FROM sth, (SELECT unnest(range(0, $SimHashBits)) AS k) ks
      GROUP BY doc_id, ks.k),
    shash AS (
      SELECT doc_id,
             CAST(sum(CASE WHEN vote > 0 THEN (1::BIGINT << k) ELSE 0 END) AS BIGINT) AS simhash
      FROM votes GROUP BY doc_id)"""

  /** fingerprint lane: fold token H1-hashes with multiplier m mod p */
  private def fpLane(m: Long, p: Long): String =
    s"list_reduce(list_prepend(0::BIGINT, list_transform(toks, t -> ${sqlCharHash("t", M1, P1)})), (a, b) -> (a * $m + b) % $p)"

  /** embeddings with sequential-fold norms; zero-norm vectors dropped
   * (mirrors Similarity.normed — ADVICE.md NULL-vs-NaN guard) */
  private val embCte = s"""
    p AS (SELECT * FROM (
          SELECT vec_id, embedding AS e,
                 sqrt(${sqlDotSeq("embedding", "embedding", EmbDim)}) AS n
          FROM embeddings) pp WHERE n > 0)"""

  private def pairCos(a: String, b: String): String =
    s"${sqlDotSeq(s"$a.e", s"$b.e", EmbDim)} / ($a.n * $b.n)"

  /** int8 scalar-quantized codes of the normalized embeddings — the same
   * ((c / n) * 127 -> floor -> clamp) double arithmetic as
   * Similarity.sqQuantize, so the codes are bit-identical. */
  private val sqzCte = s"""$embCte,
    qz AS (SELECT vec_id,
           [CAST(GREATEST(-127, LEAST(127, floor((CAST(e[i] AS DOUBLE) / n) * 127.0))) AS BIGINT)
            for i in range(1, ${EmbDim + 1})] AS qv
           FROM p)"""

  /** IVF centroid table (c, weight list, norm) as literal VALUES — the
   * SAME Scala doubles the engine folds over (toString round-trips). */
  private def centsCte: String = {
    val rows = (0 until IvfCentroids).map { c =>
      s"($c, [${Similarity.centroid(c, EmbDim).mkString(", ")}], " +
        s"${Similarity.centroidNorm(c, EmbDim)})"
    }.mkString(", ")
    s"cents AS (SELECT * FROM (VALUES $rows) t(c, w, cn))"
  }

  /** SRP bucket expression over an embedding column e (table's own
   * hyperplane family — the same per-table multipliers the engine uses) */
  private def bucketExpr(e: String, table: Int = 0): String =
    (0 until NumPlanes).map { j =>
      val w = "[" + Similarity.planeWeights(NumPlanes, EmbDim, table)(j).mkString(", ") + "]"
      s"(CASE WHEN ${sqlDotSeq(w, e, EmbDim)} > 0 THEN ${1L << j} ELSE 0 END)"
    }.mkString(" + ")

  private def langScore(markers: Seq[String]): String =
    s"CAST(len(list_filter(toks, t -> list_contains(${markers.mkString("['", "', '", "']")}, t))) AS BIGINT)"

  private val mediaCte = s"""
    m AS (SELECT doc_id, media_ref, md5(doc_id || ':' || media_ref) AS h
          FROM doc_spans WHERE kind = 'media'),
    dm AS (SELECT doc_id, media_ref,
                  CAST(length(h) // 2 AS BIGINT) AS n_bytes,
                  ${sqlHexInt("substr(h, 1, 2)")} + 16 AS width,
                  ${sqlHexInt("substr(h, 3, 2)")} + 16 AS height,
                  ${sqlHexInt("substr(h, 5, 1)")} + 1 AS n_frames
           FROM m)"""

  private def W(names: String*): String = DerivedTables.withClause(names: _*)

  def oracleSql: Map[String, String] = Map(
    "text_tokens" -> s"""WITH $tdocs
      SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars,
             CAST(len(toks) AS BIGINT) AS n_tokens
      FROM tdocs""",

    "text_quality" -> s"""WITH $tdocs, $qualityCtes
      SELECT doc_id, n_tokens, ttr, mean_token_len, alpha_ratio, stopword_ratio,
             quality_score
      FROM qual""",

    "lang_id" -> {
      val names = TextAnalysis.langMarkers.map(_._1)
      s"""WITH $tdocs, $langPredCtes
      SELECT doc_id, ${names.map(l => s"score_$l").mkString(", ")}, lang_pred
      FROM lpred"""
    },

    "doc_fingerprint" -> s"""WITH $tdocs
      SELECT doc_id,
             (${fpLane(FpM1, P1)} | (${fpLane(FpM2, P2)} << $H2Shift)) AS fp
      FROM tdocs""",

    "dedup_exact" -> s"""
      WITH h AS (SELECT doc_id, md5(text) AS content_hash FROM documents),
      k AS (SELECT content_hash, min(doc_id) AS keeper_id,
                   CAST(count(*) AS BIGINT) AS group_size
            FROM h GROUP BY content_hash)
      SELECT h.doc_id AS doc_id, h.content_hash AS content_hash, k.keeper_id,
             k.group_size, h.doc_id = k.keeper_id AS keep
      FROM h JOIN k USING (content_hash)""",

    "dedup_ngram_jaccard" -> s"WITH $tdocs, $hshingleCtes $hjaccardSelect",

    "minhash_sig" -> s"""WITH $tdocs, $minhashCtes
      SELECT doc_id, array_to_string(sig, ',') AS sig FROM sigs""",

    "dedup_minhash_lsh" -> s"""WITH $tdocs, $lshPairCtes
      SELECT doc_a, doc_b, jaccard FROM lshpairs""",

    // duplicate-pair -> cluster closure: transitive closure via recursive
    // CTE (the oracle analogue of the engine's pointer-jumping CC)
    "dedup_clusters" -> s"""WITH RECURSIVE $tdocs, $lshPairCtes, $clusterCtes,
      sz AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS cluster_size
             FROM lab GROUP BY cluster_id)
      SELECT l.doc_id, l.cluster_id, s.cluster_size,
             l.doc_id = l.cluster_id AS keep
      FROM lab l JOIN sz s USING (cluster_id)""",

    // end-to-end curation: quality gate ∧ confident language-id ∧ near-dup
    // cluster keeper ∧ deterministic stratified sample — the whole
    // training-data pipeline as ONE declarative plan (each stage is its own
    // green oracle above; this row proves they compose)
    "curate_corpus" -> {
      val rateCase = SampleRates
        .map { case (l, r) => s"WHEN '$l' THEN ${math.round(r * SampleBuckets)}" }
        .mkString("CASE lang_pred ", " ",
          s" ELSE ${math.round(SampleDefault * SampleBuckets)} END")
      s"""WITH RECURSIVE $tdocs, $lshPairCtes, $clusterCtes, $qualityCtes, $langPredCtes,
      sampled AS (
        SELECT q.doc_id, l.lang_pred, q.n_tokens, q.quality_score,
               ${sqlCharHash("CAST(q.doc_id AS VARCHAR)", M1, P1)} % $SampleBuckets AS bucket
        FROM qual q
        JOIN lpred l USING (doc_id)
        JOIN lab USING (doc_id)
        WHERE lab.doc_id = lab.cluster_id
          AND q.quality_score >= $CurateQualityMin
          AND l.lang_pred <> 'und')
      SELECT doc_id, lang_pred, n_tokens, quality_score, bucket
      FROM sampled WHERE bucket < ($rateCase)"""
    },

    "contamination" -> s"""WITH $tdocs,
      sh AS (SELECT doc_id, (doc_id % $EvalMod = 0) AS is_eval,
                    list_distinct(list_transform(${sqlShingles("toks")},
                      s -> ${sqlCharHash("s", M1, P1)})) AS sh FROM tdocs),
      eidx AS (SELECT doc_id, unnest(sh) AS shingle FROM sh WHERE is_eval),
      tsh AS (SELECT DISTINCT unnest(sh) AS shingle FROM sh WHERE NOT is_eval),
      tot AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shingles
              FROM eidx GROUP BY doc_id),
      hit AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_contaminated
              FROM eidx WHERE shingle IN (SELECT shingle FROM tsh)
              GROUP BY doc_id)
      SELECT t.doc_id, t.n_shingles,
             coalesce(h.n_contaminated, 0) AS n_contaminated,
             CAST(coalesce(h.n_contaminated, 0) AS DOUBLE) / t.n_shingles
               AS contamination
      FROM tot t LEFT JOIN hit h USING (doc_id)""",

    "sample_stratified" -> {
      // same integer thresholds the engine derives (math.round on the driver)
      val rateCase = SampleRates
        .map { case (l, r) => s"WHEN '$l' THEN ${math.round(r * SampleBuckets)}" }
        .mkString("CASE lang ", " ",
          s" ELSE ${math.round(SampleDefault * SampleBuckets)} END")
      s"""WITH b AS (
        SELECT doc_id, lang,
               ${sqlCharHash("CAST(doc_id AS VARCHAR)", M1, P1)} % $SampleBuckets AS bucket
        FROM documents)
      SELECT doc_id, lang, bucket FROM b
      WHERE bucket < ($rateCase)"""
    },

    "vocab_topk" -> s"""WITH $tdocs,
      tok AS (SELECT unnest(toks) AS token FROM tdocs),
      c AS (SELECT token, CAST(count(*) AS BIGINT) AS cnt FROM tok GROUP BY token),
      r AS (SELECT token, cnt,
                   ROW_NUMBER() OVER (ORDER BY cnt DESC, token) AS rank
            FROM c)
      SELECT token, cnt, CAST(rank AS BIGINT) AS rank FROM r WHERE rank <= $VocabK""",

    "simhash_sig" -> s"""WITH $tdocs, $simhashCtes
      SELECT doc_id, simhash FROM shash""",

    "dedup_simhash" -> {
      val bits = SimHashBits / SimHashBands
      s"""WITH $tdocs, $simhashCtes,
      bandrows AS (
        SELECT doc_id, simhash, bs.b AS band,
               (simhash >> (bs.b * $bits)) & ${(1L << bits) - 1} AS bkey
        FROM shash, (SELECT unnest(range(0, $SimHashBands)) AS b) bs),
      cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
               a.simhash AS sa, b.simhash AS sb
        FROM bandrows a JOIN bandrows b
          ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id)
      SELECT doc_a, doc_b, CAST(bit_count(xor(sa, sb)) AS BIGINT) AS hamming
      FROM cand WHERE bit_count(xor(sa, sb)) <= $MaxHamming"""
    },

    "embed_near_dup" -> s"""WITH $embCte,
      pairs AS (
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, ${pairCos("a", "b")} AS cos
        FROM p a JOIN p b ON a.vec_id < b.vec_id)
      SELECT vec_a, vec_b, cos FROM pairs WHERE cos >= $CosineThreshold""",

    // multi-table SRP candidates (same-bucket in ANY table) + exact verify:
    // the per-table bucket lists are the engine's own hyperplane families
    // reproduced bit-for-bit (integer congruence weights, sequential folds)
    "srp_near_dup" -> s"""WITH $embCte,
      pb AS (SELECT vec_id, e, n,
                    [${(0 until SrpTables).map(t => bucketExpr("e", t)).mkString(",\n                     ")}] AS bks
             FROM p),
      br AS (SELECT vec_id, t.i AS tbl, bks[t.i + 1] AS bucket
             FROM pb, (SELECT unnest(range(0, $SrpTables)) AS i) t),
      -- hot-bucket salt (mirrors srpNearDupPairs' guard): buckets above
      -- $SrpMaxBucket rows split into ns = ceil(size/$SrpMaxBucket)
      -- sub-buckets keyed by vec_id % ns; ns = 1 leaves small buckets as-is
      bsz AS (SELECT tbl, bucket, count(*) AS c FROM br GROUP BY tbl, bucket),
      br2 AS (SELECT br.vec_id, br.tbl, br.bucket,
                     GREATEST(1, CAST(CEIL(c / $SrpMaxBucket.0) AS BIGINT)) AS ns
              FROM br JOIN bsz USING (tbl, bucket)),
      cand AS (SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
               FROM br2 a JOIN br2 b
                 ON a.tbl = b.tbl AND a.bucket = b.bucket
                AND a.vec_id % a.ns = b.vec_id % b.ns AND a.vec_id < b.vec_id),
      verified AS (
        SELECT c.vec_a, c.vec_b, ${pairCos("va", "vb")} AS cos
        FROM cand c
        JOIN p va ON va.vec_id = c.vec_a
        JOIN p vb ON vb.vec_id = c.vec_b)
      SELECT vec_a, vec_b, cos FROM verified WHERE cos >= $CosineThreshold""",

    "ann_topk" -> s"""WITH $embCte,
      q AS (SELECT * FROM p WHERE vec_id % $QueryMod = 0),
      s AS (SELECT q.vec_id AS qid, t.vec_id AS vid, ${pairCos("q", "t")} AS cos
            FROM q CROSS JOIN p t),
      r AS (SELECT qid, vid,
                   ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, vid) AS rank
            FROM s)
      SELECT qid, vid, CAST(rank AS BIGINT) AS rank FROM r WHERE rank <= $TopK""",

    "ann_lsh_topk" -> s"""WITH $embCte,
      pb AS (SELECT vec_id, e, n, ${bucketExpr("e")} AS bucket FROM p),
      q AS (SELECT * FROM pb WHERE vec_id % $QueryMod = 0),
      s AS (SELECT q.vec_id AS qid, t.vec_id AS vid, ${pairCos("q", "t")} AS cos
            FROM q JOIN pb t ON q.bucket = t.bucket),
      r AS (SELECT qid, vid,
                   ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, vid) AS rank
            FROM s)
      SELECT qid, vid, CAST(rank AS BIGINT) AS rank FROM r WHERE rank <= $TopK""",

    "srp_bucket" -> s"""
      SELECT vec_id, ${bucketExpr("embedding")} AS bucket FROM embeddings""",

    "sq_encode" -> s"""WITH $sqzCte
      SELECT vec_id, array_to_string(qv, ',') AS q FROM qz""",

    // integer dot of the quantized codes (exact BIGINT arithmetic; products
    // bounded by 127^2 * dim), ranked DESC with vid tie-break
    "ann_sq_topk" -> s"""WITH $sqzCte,
      q AS (SELECT * FROM qz WHERE vec_id % $QueryMod = 0),
      s AS (SELECT q.vec_id AS qid, t.vec_id AS vid,
                   list_reduce(list_prepend(0::BIGINT,
                     [q.qv[i] * t.qv[i] for i in range(1, ${EmbDim + 1})]),
                     (x, y) -> x + y) AS score
            FROM q CROSS JOIN qz t),
      r AS (SELECT qid, vid,
                   ROW_NUMBER() OVER (PARTITION BY qid ORDER BY score DESC, vid) AS rank
            FROM s)
      SELECT qid, vid, CAST(rank AS BIGINT) AS rank FROM r WHERE rank <= $TopK""",

    "ivf_assign" -> s"""WITH $centsCte,
      sc AS (SELECT e.vec_id, c.c, ${sqlDotSeq("c.w", "e.embedding", EmbDim)} / c.cn AS s
             FROM embeddings e CROSS JOIN cents c),
      a AS (SELECT vec_id, c,
                   ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY s DESC, c) AS r
            FROM sc)
      SELECT vec_id, CAST(c AS BIGINT) AS ivf_cell FROM a WHERE r = 1""",

    "ann_ivf_topk" -> s"""WITH $embCte, $centsCte,
      sc AS (SELECT p.vec_id, p.e, p.n, c.c AS cell,
                    ${sqlDotSeq("c.w", "p.e", EmbDim)} / c.cn AS s
             FROM p CROSS JOIN cents c),
      tc AS (SELECT vec_id, e, n, cell FROM (
              SELECT vec_id, e, n, cell,
                     ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY s DESC, cell) AS r
              FROM sc) x WHERE r = 1),
      qp AS (SELECT vec_id, e, n, cell FROM (
              SELECT vec_id, e, n, cell,
                     ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY s DESC, cell) AS r
              FROM sc WHERE vec_id % $QueryMod = 0) x WHERE r <= $IvfProbe),
      s AS (SELECT q.vec_id AS qid, t.vec_id AS vid, ${pairCos("q", "t")} AS cos
            FROM qp q JOIN tc t ON q.cell = t.cell),
      r AS (SELECT qid, vid,
                   ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, vid) AS rank
            FROM s)
      SELECT qid, vid, CAST(rank AS BIGINT) AS rank FROM r WHERE rank <= $TopK""",

    "media_decode" -> s"""${W("doc_spans")}, $mediaCte
      SELECT doc_id, media_ref, n_bytes, width, height, n_frames FROM dm""",

    "media_features" -> s"""${W("doc_spans")}, $mediaCte
      SELECT doc_id, media_ref, width, height, n_frames FROM dm""",

    "media_frames" -> s"""${W("doc_spans")}, $mediaCte
      SELECT doc_id, media_ref,
             CAST(unnest(range(0, n_frames, 2)) AS BIGINT) AS frame_idx
      FROM dm""",

    "media_resize" -> s"""${W("doc_spans")}, $mediaCte,
      g AS (SELECT doc_id, media_ref, width, height,
                   greatest(width, height) AS gmax,
                   CASE WHEN greatest(width, height) > 64 THEN 64
                        ELSE greatest(width, height) END AS s
            FROM dm)
      SELECT doc_id, media_ref, width, height,
             CAST(floor((width * s) / gmax) AS BIGINT) AS out_w,
             CAST(floor((height * s) / gmax) AS BIGINT) AS out_h
      FROM g""",
  )
}
