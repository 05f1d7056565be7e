package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import TextFunctions._
import TextParams._

/**
 * Corpus-level training-data operators that sit ON TOP of the per-pair /
 * per-document stages in [[Dedup]] and [[TextAnalysis]]: the stages a real
 * 100 TB pipeline runs after near-dup pair mining and before sampling a
 * training mix.
 *
 *  - [[connectedComponents]] / [[dedupClusters]] — duplicate-PAIR output is
 *    not actionable until pairs are closed into CLUSTERS with one canonical
 *    keeper (a
 *    near-dup relation is not transitive, but dedup policy treats it as if
 *    it were — the standard practice in published corpus-dedup pipelines).
 *  - [[contamination]] — train/eval n-gram overlap: for each held-out
 *    document, the fraction of its shingles that appear anywhere in the
 *    training split (benchmark-contamination screening).
 *  - [[sampleStratified]] — deterministic per-stratum hash sampling: the
 *    reproducible "data mix" step (no RNG state, no sampleBy approximation —
 *    the same doc set comes back on every run and on every engine).
 *  - [[vocabTopK]] — global token frequency ranking (tokenizer/vocab
 *    construction input).
 *
 * Scale notes are on each operator; none materializes to the driver beyond
 * per-iteration convergence counts (CC) and the top-k result itself.
 */
object Corpus {

  private def spread(df: DataFrame): DataFrame = graft.util.Spread.spread(df)

  /**
   * Connected components over an undirected pair list `(doc_a, doc_b)` —
   * the closure stage of every dedup pipeline. Returns `(id, comp)` for
   * every node APPEARING IN SOME EDGE, with `comp` = the component's
   * minimum node id (so downstream "keeper" policy is deterministic).
   *
   * Algorithm: iterated neighbor-min + pointer jumping.
   * Each round does
   *   c'(u)  = min(c(u), min over neighbors v of c(v))      (one equi-join)
   *   c''(u) = c'(c'(u))                                    (path doubling)
   * Label values only decrease and path doubling halves the distance to the
   * component minimum each round, so rounds = O(log diameter) — a chain of
   * a million near-identical crawl snapshots closes in ~20 rounds, not 10^6
   * (plain label propagation is O(diameter) and melts down exactly there).
   * Every round is two shuffles on uniformly-hashed ids; per-round state is
   * one (id, comp) row per edge-touched node — duplicate-graph-sized, not
   * corpus-sized. `localCheckpoint` per round cuts the growing lineage (at
   * warehouse scale: a checkpoint table per round, same shape).
   */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 50,
                          driverThreshold: Long = 1L << 20): DataFrame = {
    val sym = pairs
      .select(col("doc_a").cast("long").as("src"), col("doc_b").cast("long").as("dst"))
      .unionByName(pairs
        .select(col("doc_b").cast("long").as("src"), col("doc_a").cast("long").as("dst")))
      .distinct()
      .localCheckpoint()
    connectedComponentsSym(sym, maxIter, driverThreshold)
  }

  /**
   * [[connectedComponents]] over an edge list that is ALREADY symmetric
   * (both directions present) and self-loop-free — callers whose edge
   * producer emits both directions natively (e.g. a spatial self-join,
   * SpatialJoins.epsCluster) skip the union+distinct shuffle AND the double
   * computation of the edge plan the union's two branches would each run.
   * Duplicate (src, dst) rows are tolerated: every consumer below is a
   * min-aggregation or a set insert, both idempotent. `sym` should be
   * materialized (checkpoint/table) — the driver gate counts it and the CC
   * rounds rescan it.
   */
  def connectedComponentsSym(sym: DataFrame, maxIter: Int = 50,
                             driverThreshold: Long = 1L << 20): DataFrame = {
    // Size-gated driver fast path (same shape as SpatialJoins' small-corpus
    // branch): a dup graph under `driverThreshold` edges closes in one
    // union-find pass instead of paying per-iteration Spark-job latency —
    // a bench-visible ~10 s at sf scale. The bound is explicit and the
    // distributed loop below remains the general path; the collect is of
    // the DUPLICATE-PAIR graph, never the corpus.
    val nEdges = sym.count()
    if (nEdges <= driverThreshold) {
      // Primitive-array union-find (sorted-id dictionary + int parent array,
      // union by min id via index order): the boxed HashMap version's
      // allocation churn ran up to 30x slower late in a JVM's life once
      // Spark codegen filled the JIT code cache and call sites degraded —
      // the primitive loop has no allocation and no megamorphic dispatch, so
      // it stays ~0.3 s at the gate's million-edge bound regardless of JVM
      // age (VERDICT.md r04 #3 profile).
      val edgeRows = sym.select(col("src"), col("dst")).collect()
      val m = edgeRows.length
      val all = new Array[Long](2 * m)
      var i = 0
      while (i < m) {
        val r = edgeRows(i)
        all(2 * i) = r.getLong(0); all(2 * i + 1) = r.getLong(1)
        i += 1
      }
      val ids = all.clone()
      java.util.Arrays.sort(ids)
      var n = 0; var j = 0
      while (j < ids.length) {
        if (n == 0 || ids(n - 1) != ids(j)) { ids(n) = ids(j); n += 1 }
        j += 1
      }
      val parent = new Array[Int](n)
      i = 0; while (i < n) { parent(i) = i; i += 1 }
      def find(x0: Int): Int = {
        var r = x0
        while (parent(r) != r) r = parent(r)
        var c = x0
        while (parent(c) != c) { val nx = parent(c); parent(c) = r; c = nx }
        r
      }
      i = 0
      while (i < m) {
        val a = java.util.Arrays.binarySearch(ids, 0, n, all(2 * i))
        val b = java.util.Arrays.binarySearch(ids, 0, n, all(2 * i + 1))
        val (ra, rb) = (find(a), find(b))
        // ids is ascending, so smaller index = smaller id: rooting the
        // larger index under the smaller keeps every root the component min
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        i += 1
      }
      val rows = (0 until n).map(ix => (ids(ix), ids(find(ix))))
      val spark = sym.sparkSession
      import spark.implicits._
      return rows.toDF("id", "comp")
    }
    var labels = sym.select(col("src").as("id")).distinct()
      .withColumn("comp", col("id"))
      .localCheckpoint()
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIter) {
      val nbrMin = sym
        .join(labels.select(col("id").as("dst"), col("comp").as("dcomp")), "dst")
        .groupBy(col("src").as("id")).agg(min("dcomp").as("nmin"))
      val stepped = labels.join(nbrMin, Seq("id"), "left_outer")
        .select(col("id"), col("comp").as("prev"),
          least(col("comp"), coalesce(col("nmin"), col("comp"))).as("c1"))
      // pointer jump: comp values are themselves node ids present in
      // `stepped`, so c1(c1(u)) is one self-join (left_outer is belt and
      // braces — a match always exists)
      val jumped = stepped
        .join(stepped.select(col("id").as("jid"), col("c1").as("jc")),
          col("c1") === col("jid"), "left_outer")
        .select(col("id"), col("prev"), coalesce(col("jc"), col("c1")).as("comp"))
        .localCheckpoint()
      changed = jumped.filter(col("comp") =!= col("prev")).count()
      labels = jumped.select("id", "comp")
      iter += 1
    }
    require(changed == 0, s"connectedComponents did not converge in $maxIter rounds")
    labels
  }

  /**
   * Near-dup clusters with a canonical keeper: every document gets a
   * `cluster_id` (= min doc_id of its duplicate component; itself when it
   * has no duplicate), the cluster size, and `keep` = "is the canonical
   * representative". CC state is sized by the DUPLICATE graph — the corpus
   * only flows through one left join at the end.
   *
   * The corpus-side label join is SIZE-GATED, not force-broadcast: the label
   * table is sized by the duplicate graph, and on a crawl corpus with 30-50%
   * duplication that is corpus-scale — an unconditional `hint("broadcast")`
   * of billions of ids OOMs the driver and every executor (VERDICT.md). Below
   * `broadcastThreshold` labels (counted — the label table is already
   * materialized by [[connectedComponents]]) the hint saves the corpus
   * shuffle; above it the join runs as a plain shuffled outer join — correct
   * either way, same idiom as connectedComponents' driver fast-path gate.
   *
   * @param docs  full corpus (doc_id, ...)
   * @param pairs duplicate pairs (doc_a, doc_b) from any [[Dedup]] strategy
   * @param broadcastThreshold max label rows to force-broadcast (~32 MB of
   *                           (long, long) rows at the 2^22 default)
   */
  def dedupClusters(docs: DataFrame, pairs: DataFrame,
                    broadcastThreshold: Long = 1L << 22): DataFrame = {
    val comp = connectedComponents(pairs)
      .select(col("id").as("doc_id"), col("comp").as("cid"))
    val compSide = if (comp.count() <= broadcastThreshold) comp.hint("broadcast") else comp
    val labeled = docs.select(col("doc_id"))
      .join(compSide, Seq("doc_id"), "left_outer")
      .select(col("doc_id"), coalesce(col("cid"), col("doc_id")).as("cluster_id"))
    val sizes = labeled.groupBy("cluster_id").agg(count(lit(1)).as("cluster_size"))
    labeled.join(sizes, "cluster_id")
      .select(col("doc_id"), col("cluster_id"), col("cluster_size"),
        (col("doc_id") === col("cluster_id")).as("keep"))
  }

  /**
   * Train/eval n-gram contamination: for each document in the eval split,
   * how many of its distinct token-trigram shingles appear in ANY training
   * document. The scale shape: the training side collapses to a DISTINCT
   * shingle-hash set (one aggregation, uniform 8-byte keys), the eval side
   * is a left-semi equi-join against it — never doc x doc, never
   * corpus-squared. Shingles travel as their charHash LONGS via the native
   * `trigram_hashes` expression — one codegen'd pass per row (the
   * interpreted string-shingle path costs ~3x more and, worse, gets inlined
   * into join-inferred isnotnull filters and re-evaluated per consumer —
   * the Dedup.verifiedJaccardPairs pathology), and the dedup/join shuffles
   * move fixed-width longs instead of shingle strings.
   *
   * @param evalPred predicate over `docs` columns choosing the eval split
   * @return (doc_id, n_shingles, n_contaminated, contamination) per eval doc
   */
  def contamination(docs: DataFrame, evalPred: Column): DataFrame = {
    // the split flag is evaluated BEFORE the shingle projection so each
    // branch's filter pushes below the (expensive) tokenization — the two
    // branches partition the corpus, so it is tokenized exactly once total
    val sh = spread(docs)
      .select(col("doc_id"), evalPred.as("__eval"), tokens(col("text")).as("toks"))
      .select(col("doc_id"), col("__eval"), array_distinct(
        graft.functions.GraftFunctions.trigram_hashes(
          col("toks"), lit(M1), lit(P1))).as("sh"))
    val evalIdx = sh.filter(col("__eval"))
      .select(col("doc_id"), explode(col("sh")).as("shingle"))
    val trainSh = sh.filter(!col("__eval"))
      .select(explode(col("sh")).as("shingle")).distinct()
    val totals = evalIdx.groupBy("doc_id").agg(count(lit(1)).as("n_shingles"))
    val hits = evalIdx.join(trainSh, Seq("shingle"), "left_semi")
      .groupBy("doc_id").agg(count(lit(1)).as("n_contaminated"))
    totals.join(hits, Seq("doc_id"), "left_outer")
      .select(col("doc_id"), col("n_shingles"),
        coalesce(col("n_contaminated"), lit(0L)).as("n_contaminated"))
      // shingles() never returns an empty array (whole-text fallback), so
      // the denominator is >= 1 by construction
      .withColumn("contamination",
        col("n_contaminated").cast("double") / col("n_shingles"))
  }

  /** Sampling hash: uniform bucket in [0, buckets) from doc_id alone — the
   * char-polynomial fold both engines compute identically (TextParams). */
  def sampleBucket(docId: Column, buckets: Int): Column =
    charHash(docId.cast("string"), M1, P1) % buckets

  /**
   * Deterministic stratified sampling: keep a document iff its hash bucket
   * falls under its stratum's rate. Pure map-side (no shuffle, no RNG, no
   * driver state); the SAME rows survive on every run, engine, and
   * partitioning — which is what makes a training mix reproducible and
   * resumable. `sampleBy` would give approximate Bernoulli draws instead.
   *
   * @param rates   per-stratum keep rates in [0,1], applied to `stratum`
   * @param default rate for strata not listed
   */
  /** Per-stratum INTEGER bucket threshold (math.round on the driver): the
   * per-row comparison is then pure integer arithmetic — no float product
   * whose last bit could differ between engines at a bucket boundary. */
  def stratumThreshold(stratum: Column, rates: Seq[(String, Double)],
                       default: Double, buckets: Int): Column =
    rates.foldLeft(lit(math.round(default * buckets))) {
      case (acc, (s, r)) => when(stratum === s, lit(math.round(r * buckets))).otherwise(acc)
    }

  def sampleStratified(docs: DataFrame, stratum: Column,
                       rates: Seq[(String, Double)], default: Double,
                       buckets: Int = 10000): DataFrame =
    spread(docs)
      .withColumn("bucket", sampleBucket(col("doc_id"), buckets))
      .filter(col("bucket") < stratumThreshold(stratum, rates, default, buckets))

  /**
   * End-to-end corpus curation: quality gate ∧ confident language-id ∧
   * near-dup cluster keeper ∧ deterministic stratified sample (stratified
   * on the PREDICTED language). The whole pipeline is ONE corpus
   * projection (quality + language metrics fused — they are per-row
   * expressions over the same tokenization, so joining separate
   * quality/lang frames would shuffle the corpus on doc_id twice for
   * nothing), one ANTI join against the duplicate LOSERS, and a map-side
   * hash-bucket filter.
   *
   * The loser anti-join is SIZE-GATED like [[dedupClusters]]'s label join:
   * losers are sized by the dup graph, so the broadcast (which keeps the
   * pipeline at zero corpus shuffles) only applies below
   * `broadcastThreshold` rows; above it the anti-join shuffles both sides —
   * one corpus shuffle instead of an executor-wide OOM (VERDICT.md).
   */
  def curateCorpus(docs: DataFrame, dupPairs: DataFrame, qualityMin: Double,
                   rates: Seq[(String, Double)], default: Double,
                   buckets: Int = 10000,
                   broadcastThreshold: Long = 1L << 22): DataFrame = {
    val losers = connectedComponents(dupPairs)
      .filter(col("id") =!= col("comp")).select(col("id").as("doc_id"))
    val loserSide = if (losers.count() <= broadcastThreshold) broadcast(losers) else losers
    // The metrics table is MATERIALIZED before the gates: pushing the
    // quality/lang filter below the projection would inline the whole
    // metric tree into the Filter, and higher-order functions evaluate
    // interpreted with no common-subexpression elimination — the corpus
    // would be re-tokenized ~15x per row (measured ~10s of the query at
    // sf0.1). At warehouse scale this checkpoint is the per-doc metrics
    // table a curation pipeline persists anyway (~1% of corpus bytes).
    val metrics = spread(docs)
      .select(col("doc_id"), col("text"), tokens(col("text")).as("toks"))
      .select(Seq(col("doc_id")) ++
        TextAnalysis.qualityCols(col("text"), col("toks")) ++
        TextAnalysis.langScoreCols(col("toks")): _*)
      .withColumn("quality_score", TextAnalysis.qualityScore)
      .withColumn("lang_pred", TextAnalysis.langPred)
      .localCheckpoint()
    metrics
      .filter(col("quality_score") >= qualityMin && col("lang_pred") =!= "und")
      .join(loserSide, Seq("doc_id"), "left_anti")
      .withColumn("bucket", sampleBucket(col("doc_id"), buckets))
      .filter(col("bucket") < stratumThreshold(col("lang_pred"), rates, default, buckets))
      .select("doc_id", "lang_pred", "n_tokens", "quality_score", "bucket")
  }

  /**
   * Global token frequency top-k (vocabulary construction input).
   * One aggregation + TakeOrdered: hot tokens (stopwords) are exactly the
   * skewed keys, but hash-aggregate's map-side partial combine already
   * bounds what any reducer receives to one partial per map task — explicit
   * salting would ADD a shuffle here, not remove one (contrast
   * SpatialJoins.tileHistogram, where the salt defends the reduce side of a
   * single mega-hot key at far higher per-key volumes). `orderBy.limit`
   * plans as TakeOrderedAndProject: per-partition top-k, then a k-sized
   * merge on the driver — no global sort.
   */
  def vocabTopK(docs: DataFrame, k: Int = 100): DataFrame = {
    val counts = spread(docs)
      .select(explode(tokens(col("text"))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))
    counts.orderBy(col("cnt").desc, col("token")).limit(k)
      .withColumn("rank",
        row_number().over(Window.orderBy(col("cnt").desc, col("token"))).cast("long"))
  }
}
