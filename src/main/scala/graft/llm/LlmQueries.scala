package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.table

/** Harness wiring for the LLM-data-pipeline operator family
  * (SURVEY.md §0 third finding, §7.2.5): dedup, similarity search, text
  * analysis, multimodal plumbing over the documents/embeddings tables.
  *
  * Oracle-checked where SQL-expressible — including the multimodal
  * decode/frame queries (the fixture's closed-form pixel functions let
  * DuckDB predict decoded statistics without parsing binary) and, since
  * round 10, the MinHash/SimHash/LSH/winnowing fingerprint family
  * (DuckXxh replays Spark's xxhash64/Murmur3 bit-exactly in DuckDB SQL,
  * so q_minhash_pairs, q_simhash_pairs/banded, q_winnow_pairs and
  * q_lsh_cosine_pairs are full hash oracles). The only rows-only
  * queries left are the nine adjudicated in SURVEY §8 (MLlib RNG/LBFGS,
  * Lloyd float iteration, DataSketches dense-HLL4, GK percentile
  * internals), each gated by an error-bound or stability spec instead.
  */
object LlmQueries {

  type Q = (SparkSession, String) => DataFrame

  /** Exact dedup groups (fingerprint → keep-first id + copy count). */
  def dedupExact(spark: SparkSession, dir: String): DataFrame =
    Dedup.exactDupGroups(table(spark, dir, "documents"))
      .orderBy("keep_id")

  /** Exact word-set Jaccard pairs on a bounded block (verification form of
    * near-dup; the scale path is the MinHash query below).
    */
  def jaccardPairs(spark: SparkSession, dir: String): DataFrame =
    Dedup.ngramJaccardPairs(table(spark, dir, "documents"),
        n = 1, minJaccard = 0.9, maxId = 200L)
      .orderBy("id_a", "id_b")

  /** Prefix-filtered exact Jaccard pairs: the SAME result set as
    * [[jaccardPairs]] through the AllPairs/PPJoin candidate plan — the
    * inverted index holds only each document's rarest-token prefix, not
    * every token (see [[Dedup.prefixJaccardPairs]]). One query, two
    * plans, one oracle: both hash against the identical DuckDB SQL.
    */
  def prefixJaccard(spark: SparkSession, dir: String): DataFrame =
    Dedup.prefixJaccardPairs(table(spark, dir, "documents"),
        minJaccard = 0.9, maxId = 200L)
      .orderBy("id_a", "id_b")

  /** MinHash+LSH near-dup pairs — oracle-checked since round 10: the
    * full banded pipeline (signatures, chained band keys, exact verify)
    * replays in DuckDB via [[DuckXxh]] ([[minhashOracleSql]]).
    */
  def minhashPairs(spark: SparkSession, dir: String): DataFrame =
    Dedup.minhashNearDupPairs(table(spark, dir, "documents"), minJaccard = 0.9)
      .orderBy("id_a", "id_b")

  /** SimHash near-dup pairs on a bounded block (the all-pairs
    * verification form — the baseline the banded query below must
    * equal). Oracle-checked since round 10 ([[simhashPairsOracleSql]]).
    */
  def simhashPairs(spark: SparkSession, dir: String): DataFrame =
    Dedup.simhashPairs(table(spark, dir, "documents"),
        maxHamming = 12, maxId = 200L)
      .orderBy("id_a", "id_b")

  /** SimHash near-dup pairs through the SCALE path: band the 64-bit
    * signature into bit-slices, bucket-join on shared slices, verify true
    * hamming (never N² — the plan that runs at corpus scale). Pigeonhole
    * makes banding lossless here (bands > maxHamming), so the result is
    * set-equal to the all-pairs form above — asserted in DedupSpec, and
    * both queries are full hash oracles since round 10 (DuckXxh XXH64
    * replay predicts the signatures in DuckDB SQL).
    */
  def simhashBanded(spark: SparkSession, dir: String): DataFrame =
    Dedup.simhashNearDupPairs(
        table(spark, dir, "documents").filter(col("doc_id") < 200L),
        maxHamming = 12)
      .orderBy("id_a", "id_b")

  /** Winnowing local-overlap pairs (oracle-checked since round 10 via
    * [[winnowPairsOracleSql]]): docs sharing ≥ 3 winnowed fingerprints
    * after the stop-gram frequency cap. The LOCAL-overlap complement to
    * the global-similarity minhash query. Bounded block for bench budget
    * only — the full-corpus form runs in ~8 s at sf0.1 (the plan is the
    * scale path: staged fingerprints, capped inverted-index equi-join).
    */
  def winnowPairs(spark: SparkSession, dir: String): DataFrame =
    Dedup.winnowingOverlapPairs(
        table(spark, dir, "documents").filter(col("doc_id") < 500L),
        minShared = 3, maxDocFreq = 20L)
      .orderBy("id_a", "id_b")

  /** Brute-force cosine top-10 for query vectors vec_id < 5. */
  def knnCosine(spark: SparkSession, dir: String): DataFrame = {
    val emb = table(spark, dir, "embeddings")
    Similarity.knnBruteForce(emb, emb.filter(col("vec_id") < 5), k = 10)
      .orderBy("query_id", "rk")
  }

  /** Balanced per-label downsample of the embedding corpus to the
    * minority class size ([[graft.ops.Sampling.classBalance]]) — the
    * rebalancing pass before training on skewed labels. md5-rank draw,
    * so the kept set is identical on any layout and in DuckDB.
    */
  def classBalance(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Sampling.classBalance(
        table(spark, dir, "embeddings").select(col("vec_id"), col("label")),
        "label", "vec_id")
      .select("label", "rk", "vec_id")
      .orderBy("label", "rk")

  /** Matryoshka two-stage retrieval: head-16-dim cosine ranks the corpus,
    * top-50 re-ranked by full 64-dim cosine to top-10 (queries vec_id <
    * 5). Oracle: the q_knn_cosine ranking contract applied to both
    * stages, with DuckDB's `embedding[1:16]` slice as the head.
    *
    * m is a recall knob tuned per-corpus: on these RANDOM fixtures the
    * untrained 16-dim head needs m≈400 for recall 1.0 (measured in
    * SimilaritySpec); MRL-trained embeddings concentrate signal in the
    * prefix and get away with far smaller shortlists. The oracle checks
    * the algorithm, not the recall — that's the spec's monotonicity gate.
    */
  def mrlRerank(spark: SparkSession, dir: String): DataFrame = {
    val emb = table(spark, dir, "embeddings")
    Similarity.mrlRerank(emb, emb.filter(col("vec_id") < 5),
        dHead = 16, m = 50, k = 10)
      .orderBy("query_id", "rk")
  }

  /** MMR diverse top-10 from each query's top-20 cosine candidates
    * (λ=0.7, queries vec_id < 5): the diversity-selection step between
    * retrieval and use ([[Similarity.mmrSelect]]). Oracle-checked
    * against a DuckDB 10-round materialized-CTE unroll of the same
    * greedy — the PageRank/BPE iterative-oracle pattern applied to a
    * selection loop.
    */
  def mmrDiverse(spark: SparkSession, dir: String): DataFrame = {
    val emb = table(spark, dir, "embeddings")
    Similarity.mmrSelect(emb, emb.filter(col("vec_id") < 5),
      m = 20, k = 10, lambda = 0.7)
  }

  /** Exact cosine pairs on a bounded block (oracle-checked baseline for
    * the LSH scale path below).
    */
  def cosinePairs(spark: SparkSession, dir: String): DataFrame =
    Similarity.cosinePairsExact(table(spark, dir, "embeddings"),
        minCosine = 0.3, maxId = 1000L)
      .orderBy("id_a", "id_b")

  /** LSH-bucketed cosine near-neighbor pairs (exact-verified so
    * precision is 1.0, recall is the banding tradeoff). Oracle-checked
    * since round 10 ([[lshCosineOracleSql]]).
    */
  def lshCosinePairs(spark: SparkSession, dir: String): DataFrame =
    Similarity.lshCosinePairs(table(spark, dir, "embeddings"), minCosine = 0.3,
        bucketLength = 1.0)
      .orderBy("id_a", "id_b")

  /** Top-k search over int8-quantized vectors (oracle-checked: every
    * float op is op-order-shared with the SQL, so the deterministic
    * approximation hashes exactly; agreement with float knn spec-gated).
    */
  def int8TopK(spark: SparkSession, dir: String): DataFrame = {
    val emb = table(spark, dir, "embeddings")
    Similarity.int8TopK(emb, emb.filter(col("vec_id") < 5), k = 10)
      .orderBy("query_id", "rk")
  }

  /** Hybrid-search fusion: RRF of the float brute-force top-20 and the
    * int8 quantized top-20 per query ([[Similarity.rrfFuse]], c=60),
    * fused top-10 — both input rankings are themselves oracle-checked,
    * and the fusion arithmetic is exact-integer-rank based, so the
    * combined query hashes too.
    */
  def rrfFusion(spark: SparkSession, dir: String): DataFrame = {
    val emb = table(spark, dir, "embeddings")
    val q = emb.filter(col("vec_id") < 5)
    Similarity.rrfFuse(
        Similarity.knnBruteForce(emb, q, k = 20),
        Similarity.int8TopK(emb, q, k = 20), k = 10)
      .orderBy("query_id", "rk")
  }

  /** SemDeDup-style cluster-scoped near-dup pairs (rows-only scale path;
    * within-KMeans-cell search only — candidates ~N²/nlist; every pair
    * exact-verified, recall vs the exact join gated in SimilaritySpec).
    */
  def semanticDedup(spark: SparkSession, dir: String): DataFrame =
    Similarity.semanticDedupPairs(table(spark, dir, "embeddings"),
        minCosine = 0.3, maxId = 1000L)
      .orderBy("id_a", "id_b")

  /** Embedding-cosine near-dedup on the bounded block: vectors surviving
    * after dropping the higher id of every exact cosine pair ≥ 0.3
    * (oracle-checked; the corpus-scale variant feeds lshCosinePairs in).
    */
  def embeddingDedup(spark: SparkSession, dir: String): DataFrame = {
    val emb = table(spark, dir, "embeddings")
    val block = emb.filter(col("vec_id") < 1000L)
    Similarity.cosineNearDupKeepFirst(block,
        Similarity.cosinePairsExact(emb, minCosine = 0.3, maxId = 1000L))
      .select("vec_id", "label")
      .orderBy("vec_id")
  }

  /** IVF approximate top-k (rows-only scale path; recall asserted vs the
    * brute-force baseline in SimilaritySpec).
    */
  def ivfTopK(spark: SparkSession, dir: String): DataFrame = {
    val emb = table(spark, dir, "embeddings")
    Similarity.ivfTopK(emb, emb.filter(col("vec_id") < 5), k = 10)
      .orderBy("query_id", "rk")
  }

  /** Per-label embedding centroids (class prototypes). Float sums are
    * merge-order dependent; round(6) absorbs the ulps (sums of ~200
    * unit-scale values carry ~1e-14 noise).
    */
  def labelCentroids(spark: SparkSession, dir: String): DataFrame =
    Similarity.labelCentroids(table(spark, dir, "embeddings"))
      .orderBy("label", "pos")

  /** Oracle slice for the near-dup GRAPH family (clusters / keep-best /
    * leakage split): the largest block whose DuckDB oracle — an N² exact
    * Jaccard pair join feeding a recursive reach closure — stays
    * affordable per round. Measured on sf0.1: 2 s at 200, 64 s at 1000,
    * 269 s at 2000 — so 1000 is the ceiling in practice. Division of
    * duties: these oracles prove the ALGORITHM (hash-level, both SFs) on
    * the slice; full-corpus behavior (8.4 M pairs at sf1) is covered by
    * ScaleCheck's CC invariants, which need no quadratic oracle. The
    * pairwise-family oracles (q_jaccard_pairs etc.) stay at 200 because
    * every one of them re-pays the same N² join in DuckDB per round.
    */
  private val GraphSlice = 1000L

  // Round 22: every bounded-block consumer of the exact-jaccard pair list
  // (the CC family below plus the graph-structure queries) sources pairs
  // from Dedup.prefixJaccardPairs — the PPJoin prefix form — instead of
  // the full inverted-index join: same result set (prefix filtering is
  // lossless at t=0.9; set-equality spec-asserted at both block sizes,
  // same DuckDB oracles), ~10× fewer candidate rows into the verify on
  // this corpus (8.9M → 0.87M at GraphSlice, measured sf0.1).
  // q_jaccard_pairs itself stays on ngramJaccardPairs by design — it IS
  // the full-form demonstration query ("one query, two plans, one
  // oracle" with q_prefix_jaccard).

  /** Transitive near-dup clusters: connected components over the exact
    * jaccard pair list on the bounded block — oracle-checked against a
    * DuckDB recursive-CTE closure (slice rationale at [[GraphSlice]]).
    */
  def dupClusters(spark: SparkSession, dir: String): DataFrame = {
    val docs = table(spark, dir, "documents")
    val nodes = docs.filter(col("doc_id") < GraphSlice)
      .select(col("doc_id").as("id"))
    val pairs = Dedup.prefixJaccardPairs(docs, minJaccard = 0.9,
      maxId = GraphSlice)
    Dedup.connectedComponents(nodes, pairs).orderBy("id")
  }

  /** Triangle census of the near-dup graph ([[graft.ops.Graph
    * .triangleStats]] over the exact-Jaccard pairs on the id<200 block):
    * per-node triangle counts and local clustering coefficient — the
    * structural answer to "are these dup clusters cliques (true
    * duplicates) or chains (drift)?". Oracle: DuckDB 3-way self-join on
    * the id-canonical edge list — same triangle set the degree-oriented
    * plan builds, enumerated the quadratic way the oracle can afford.
    */
  def triangleStats(spark: SparkSession, dir: String): DataFrame = {
    val docs = table(spark, dir, "documents")
    graft.ops.Graph.triangleStats(
        Dedup.prefixJaccardPairs(docs, minJaccard = 0.9, maxId = 200L))
      .orderBy("node")
  }

  /** Degree assortativity of the blocked near-dup graph
    * ([[graft.ops.Graph.assortativity]]) — near-1 on clique-structured
    * dup graphs (every member of a clique has the same degree), dropping
    * when chains/bridges appear. Oracle: DuckDB corr over the same
    * symmetrized degree pairs (the q_corr_matrix round-6 contract).
    */
  def dupAssortativity(spark: SparkSession, dir: String): DataFrame = {
    val docs = table(spark, dir, "documents")
    graft.ops.Graph.assortativity(
      Dedup.prefixJaccardPairs(docs, minJaccard = 0.9, maxId = 200L))
  }

  /** k-core kernel of the blocked near-dup graph (k=3): the members of
    * tightly-knit dup communities, with their within-core degrees —
    * oracle-checked against a DuckDB fixed-round peel unroll
    * ([[kcoreOracleSql]]; the q_pagerank pattern) plus hand-graph specs
    * in GraphSpec.
    */
  def dupKcore(spark: SparkSession, dir: String): DataFrame = {
    val docs = table(spark, dir, "documents")
    graft.ops.Graph.kCore(
        Dedup.prefixJaccardPairs(docs, minJaccard = 0.9, maxId = 200L),
        k = 3)
      .orderBy("node")
  }

  /** Leakage-safe train/test split: assignment is hashed from each
    * doc's DUP-CLUSTER representative, not the doc id — so a near-dup
    * pair can never straddle the split (the classic eval contamination:
    * a test doc's near-copy in train inflates every metric). Plain
    * hash-split-by-id fails exactly this; hashing the component id
    * moves whole clusters together. Split = md5(component) first byte
    * < 0.8·256 → train (~80/20), deterministic on any engine/layout.
    * Oracle: the q_dup_clusters recursive closure + the same md5 rule.
    */
  def leakageSafeSplit(spark: SparkSession, dir: String): DataFrame = {
    val docs = table(spark, dir, "documents")
    val nodes = docs.filter(col("doc_id") < GraphSlice)
      .select(col("doc_id").as("id"))
    val pairs = Dedup.prefixJaccardPairs(docs, minJaccard = 0.9,
      maxId = GraphSlice)
    Dedup.connectedComponents(nodes, pairs)
      .select(col("id").as("doc_id"), col("component"),
        (conv(substring(md5(col("component").cast("string")), 1, 2), 16, 10)
          .cast("long") < 205L).cast("bigint").as("in_train"))
      .orderBy("doc_id")
  }

  /** Curation-aware dedup: the transitive clusters resolved to ONE
    * canonical doc each by (max n_chars, ties to min doc_id) — the
    * keep-best policy real pipelines use instead of keep-first (a dup
    * group usually holds one clean original and several truncated
    * copies). Oracle: the q_dup_clusters recursive-CTE closure extended
    * with a per-component argmax join.
    */
  def dedupKeepBest(spark: SparkSession, dir: String): DataFrame = {
    val docs = table(spark, dir, "documents")
    val nodes = docs.filter(col("doc_id") < GraphSlice)
      .select(col("doc_id").as("id"))
    val pairs = Dedup.prefixJaccardPairs(docs, minJaccard = 0.9,
      maxId = GraphSlice)
    Dedup.keepBestPerCluster(Dedup.connectedComponents(nodes, pairs),
        docs, "n_chars")
      .orderBy("component")
  }

  /** Greedy near-dedup corpus: docs retained after dropping the higher id
    * of every MinHash-detected near-dup pair (oracle-checked since
    * round 10 — the keepfirst tail of [[minhashOracleSql]]).
    */
  def nearDedupedDocs(spark: SparkSession, dir: String): DataFrame =
    Dedup.nearDedupKeepFirst(table(spark, dir, "documents"), minJaccard = 0.9)
      .select("doc_id", "lang", "source")
      .orderBy("doc_id")

  /** Oracle-checked form of keep-first near-dedup: the pair source is the
    * EXACT Jaccard join on the bounded block (DuckDB can replicate it
    * without the XXH64 replay machinery), so the keep-first semantics —
    * drop the higher id of every near-dup pair — get a hash-level proof
    * on a second, independent pair source (the MinHash variant has its
    * own full hash oracle since round 10). Same downstream anti-join
    * shape as the scale path.
    */
  def nearDedupExact(spark: SparkSession, dir: String): DataFrame = {
    val docs = table(spark, dir, "documents")
    val drop = Dedup.prefixJaccardPairs(docs, minJaccard = 0.9,
        maxId = 200L)
      .select(col("id_b").as("doc_id")).distinct()
    docs.filter(col("doc_id") < 200L)
      .join(drop, Seq("doc_id"), "left_anti")
      .select("doc_id", "lang", "source")
      .orderBy("doc_id")
  }

  /** Incremental ingest dedup, oracle form: incoming docs (200 ≤ id <
    * 400) retained after dropping near-duplicates of the EXISTING block
    * (id < 200) — exact word-set Jaccard as the bipartite pair source
    * (cross-split pairs of the bounded exact join), so the keep/drop
    * semantics of continuous-ingest dedup get a hash-level proof. The
    * scale path is [[incrementalMinhashPairs]].
    */
  def incrementalDedup(spark: SparkSession, dir: String): DataFrame = {
    val docs = table(spark, dir, "documents")
    val drops = Dedup.ngramJaccardPairs(docs, n = 1, minJaccard = 0.9,
        maxId = 400L)
      .filter(col("id_a") < 200L && col("id_b") >= 200L)
      .select(col("id_b").as("doc_id")).distinct()
    docs.filter(col("doc_id") >= 200L && col("doc_id") < 400L)
      .join(drops, Seq("doc_id"), "left_anti")
      .select("doc_id", "lang", "source")
      .orderBy("doc_id")
  }

  /** Incremental near-dup pairs through the MinHash scale path
    * (oracle-checked since round 10 — the bipartite candidate predicate
    * of [[minhashOracleSql]]; pair-for-pair equality with the batch
    * form's cross-split slice additionally asserted in DedupSpec).
    */
  def incrementalMinhashPairs(spark: SparkSession, dir: String): DataFrame = {
    val docs = table(spark, dir, "documents")
    Dedup.incrementalNearDupPairs(
        docs.filter(col("doc_id") < 250L),
        docs.filter(col("doc_id") >= 250L),
        minJaccard = 0.9)
      .orderBy("id_a", "id_b")
  }

  /** PQ (product-quantization) approximate top-10 for query vectors
    * vec_id < 5 (rows-only: KMeans codebooks aren't SQL-reproducible;
    * recall vs brute force is gated in SimilaritySpec).
    */
  def pqTopK(spark: SparkSession, dir: String): DataFrame = {
    val emb = table(spark, dir, "embeddings")
    Similarity.pqTopK(emb, emb.filter(col("vec_id") < 5), k = 10)
      .orderBy("query_id", "rk")
  }

  /** Per-vector int8 (asymmetric min/max) quantization of the embedding
    * column — the storage form a 100 TB embedding table actually ships
    * (4× smaller than float32, 8× than float64; PQ compresses further but
    * drops exactness). Codes are floor((x−mn)/scale) clamped to [0,255]
    * — floor, not round: a .5 rounding tie would be engine-dependent,
    * floor is exact in both. Emitted per vector: the (mn, mx) dequant
    * params (raw input values — no arithmetic, hash-safe), the code sum
    * (an order-independent integer checksum of all 64 codes) and the max
    * reconstruction error in micro-units, which the spec bounds by one
    * quantization step. Pure per-row column math: zero shuffle at any
    * corpus size.
    */
  def embeddingInt8(spark: SparkSession, dir: String): DataFrame = {
    val v = col("__v")
    val mn = col("mn"); val mx = col("mx"); val sc = col("__sc")
    def code(x: Column): Column = Int8Quant.code(x, mn, sc)
    def err(x: Column): Column = abs(x - (mn + code(x) * sc))
    table(spark, dir, "embeddings")
      .select(col("vec_id"),
        col("embedding").cast("array<double>").as("__v"))
      .select(col("vec_id"), v,
        array_min(v).as("mn"), array_max(v).as("mx"))
      .withColumn("__sc", Int8Quant.scale(mn, mx))
      .select(col("vec_id"), mn, mx,
        when(sc === 0.0, lit(0L))
          .otherwise(aggregate(transform(v, x => code(x)), lit(0L),
            (a, b) => a + b))
          .as("code_sum"),
        when(sc === 0.0, lit(0L))
          .otherwise(floor(lit(1000000.0) *
            array_max(transform(v, x => err(x)))))
          .as("max_err_micro"))
      .orderBy("vec_id")
  }

  /** Per-vector L2 norms (exact fold, rounded). */
  def embeddingNorms(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "embeddings")
      .select(col("vec_id"),
        round(Similarity.l2Norm(col("embedding")), 6).as("l2"))
      .orderBy("vec_id")

  /** Token counting family: whitespace, distinct, regex ("BPE-ish"),
    * chars-per-token estimate, mean token length.
    */
  def textStats(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "documents")
      .select(col("doc_id"),
        TextStats.tokenCount(col("text")).as("n_tokens"),
        TextStats.distinctTokenCount(col("text")).as("n_distinct"),
        TextStats.regexTokenCount(col("text")).as("n_word_tokens"),
        TextStats.bpeTokenEstimate(col("text")).as("bpe_est"),
        round(TextStats.meanTokenLength(col("text")), 6).as("mean_tok_len"))
      .orderBy("doc_id")

  /** Language-ID heuristic distribution: predicted language per doc,
    * aggregated against the labelled lang column.
    */
  def langId(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "documents")
      .select(col("lang"), TextStats.langId(col("text")).as("lang_pred"))
      .groupBy("lang", "lang_pred")
      .agg(count(lit(1)).as("n"))
      .orderBy("lang", "lang_pred")

  /** Quality score per document (exact micro-units — see
    * [[TextStats.qualityScoreMicro]] for why not a rounded float).
    */
  def qualityScore(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "documents")
      // hoist tokenization into its own projection: the score references
      // the token array three times, and inlined HOFs would re-split the
      // document three times per row (no subexpression elimination in
      // interpreted HOF trees)
      .select(col("doc_id"), TextStats.tokens(col("text")).as("__toks"),
        col("n_chars"))
      .select(col("doc_id"),
        TextStats.qualityScoreMicroFromTokens(col("__toks"), col("n_chars"))
          .as("quality_micro"))
      .orderBy("doc_id")

  /** Normalize-then-fingerprint: the canonical dedup key (case,
    * punctuation and whitespace variants collapse to one hash).
    */
  def textNormalize(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "documents")
      // hoist the normalize chain into its own projection (same pattern as
      // qualityScore above): both output columns read it, and an inlined
      // copy would run the two regexp_replace passes twice per row
      .select(col("doc_id"), TextStats.normalize(col("text")).as("__norm"))
      .select(col("doc_id"),
        TextStats.fingerprint(col("__norm")).as("norm_fp"),
        length(col("__norm")).cast("bigint").as("norm_len"))
      .orderBy("doc_id")

  /** Content fingerprints: md5 (oracle-checked); SimHash lives in the
    * rows-only pair query + unit tests.
    */
  def docFingerprint(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "documents")
      .select(col("doc_id"), TextStats.fingerprint(col("text")).as("fp"))
      .orderBy("doc_id")

  /** Gopher-style repetition score: fraction of trigram occurrences that
    * repeat an earlier one, in exact integer micro-units — via the
    * codegen'd [[graft.functions.RepetitionMicro]] (one interning pass
    * per row; the HOF reference form materialized every trigram string
    * and paid O(shingles²) string compares in array_distinct, ~2.9 s at
    * sf0.1 vs ~0.6 s for this plan). Bit-identity between the two forms
    * is asserted in TextStatsSpec.
    */
  def repetitionScore(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "documents")
      .select(col("doc_id"),
        graft.functions.RepetitionMicro
          .repetitionMicro(TextStats.tokens(col("text"))).as("rep3_micro"))
      .orderBy("doc_id")

  /** Benchmark decontamination: per-doc fraction of distinct trigrams
    * shared with the "benchmark" block (doc_id < 50), integer micro-units.
    * Docs inside the block trivially score 1e6 — the check's fixed point.
    */
  def contamination(spark: SparkSession, dir: String): DataFrame =
    TextStats.contaminationMicro(table(spark, dir, "documents"),
        benchMaxId = 50L)
      .orderBy("doc_id")

  /** Mixture sampling: per-source token budget, documents admitted in
    * doc_id order until the source's running token total hits the cap —
    * the "sample source X down to N tokens" half of a mixture schedule
    * (the accounting half is q_source_mix). Integer window sum: exact in
    * any engine at any scale.
    */
  def tokenBudgetSample(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Sampling.budgetedPrefix(
        table(spark, dir, "documents")
          .select(col("doc_id"), col("source"),
            TextStats.tokenCount(col("text")).as("n_tokens")),
        groupCol = "source", orderCol = "doc_id", weightCol = "n_tokens",
        budget = 800L)
      .orderBy("doc_id")

  /** Water-filling token budget across sources at half the corpus total:
    * the level T with Σ min(c_s, T) = B — small sources keep everything,
    * big ones are capped at the water line (see
    * [[graft.ops.Sampling.waterfillAlloc]] for why the engine bisects
    * scalar aggregates instead of sorting a global window).
    */
  def budgetWaterfill(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Sampling.waterfillAlloc(
        table(spark, dir, "documents")
          .groupBy("source")
          .agg(sum(size(TextStats.tokens(col("text")))).cast("long").as("c")),
        groupCol = "source", cCol = "c", budgetFrac = 0.5)
      .orderBy("source")

  /** Corpus mixture accounting: docs, token totals and exact parts-per-
    * million share per source — the bookkeeping op behind "sample source X
    * to N tokens" mixture schedules. Shares are integer floor-divisions
    * (like quality_micro) so the value is bit-identical in any engine; a
    * rounded double k/total can land on a .5e-6 tie and round differently
    * per engine.
    */
  def sourceMix(spark: SparkSession, dir: String): DataFrame = {
    val per = table(spark, dir, "documents")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(TextStats.tokenCount(col("text"))).as("n_tokens"))
    val tot = per.agg(sum(col("n_tokens")).as("total"))
    // the ×1e6 product goes through DECIMAL: at real corpus scale (~2e13
    // tokens per source at 100 TB) a BIGINT product would overflow — an
    // ANSI runtime error, not a wrap — while DECIMAL(38,0) has 18 orders
    // of headroom; DIV brings the exact quotient back to BIGINT
    per.crossJoin(broadcast(tot))
      .withColumn("share_ppm",
        expr("CAST(n_tokens AS DECIMAL(38,0)) * 1000000 DIV total"))
      .select("source", "n_docs", "n_tokens", "share_ppm")
      .orderBy("source")
  }

  /** TF-IDF top-3 keywords per document (tf · ln(N/df), round-then-rank). */
  def tfidfTopTerms(spark: SparkSession, dir: String): DataFrame =
    TextStats.tfidfTopTerms(table(spark, dir, "documents"), k = 3)
      .orderBy("doc_id", "rk")

  /** Multimodal metadata columns over the binary payload. */
  def multimodalMeta(spark: SparkSession, dir: String): DataFrame =
    Multimodal.withBinaryPayload(table(spark, dir, "documents"))
      .select(col("doc_id"), col("meta.byte_len").as("byte_len"),
        col("meta.sha").as("sha"))
      .orderBy("doc_id")

  /** Partition-parallel REAL BMP decode + 8×8 resize, oracle-checked:
    * the fixture pixel function is closed-form in doc_id, so DuckDB
    * predicts every decoded statistic without parsing binary — a header
    * offset, row padding or orientation bug breaks the hash.
    */
  def multimodalDecode(spark: SparkSession, dir: String): DataFrame =
    Multimodal.decodeFeatures(spark, table(spark, dir, "documents"))
      .orderBy("doc_id")

  /** PPM frame-sample stage over the concatenated-frame video payload
    * (every 2nd frame), oracle-checked the same way as the decode.
    */
  def multimodalFrames(spark: SparkSession, dir: String): DataFrame =
    Multimodal.frameFeatures(spark, table(spark, dir, "documents"))
      .orderBy("doc_id", "frame_idx")

  /** WAV audio decode stage (header fields + exact signal statistics),
    * oracle-checked like the image decode: the DuckDB oracle recomputes
    * the deterministic sample formula, so a header-offset or endianness
    * bug in the codec breaks the hash.
    */
  def multimodalAudio(spark: SparkSession, dir: String): DataFrame =
    Multimodal.audioFeatures(spark, table(spark, dir, "documents"))
      .orderBy("doc_id")

  val all: Map[String, Q] = Map(
    "q_dedup_exact" -> (dedupExact _),
    "q_jaccard_pairs" -> (jaccardPairs _),
    "q_prefix_jaccard" -> (prefixJaccard _),
    "q_minhash_pairs" -> (minhashPairs _),
    "q_simhash_pairs" -> (simhashPairs _),
    "q_simhash_banded" -> (simhashBanded _),
    "q_near_dedup_exact" -> (nearDedupExact _),
    "q_incremental_dedup" -> (incrementalDedup _),
    "q_incremental_minhash" -> (incrementalMinhashPairs _),
    "q_winnow_pairs" -> (winnowPairs _),
    "q_knn_cosine" -> (knnCosine _),
    "q_mmr_diverse" -> (mmrDiverse _),
    "q_mrl_rerank" -> (mrlRerank _),
    "q_class_balance" -> (classBalance _),
    "q_cosine_pairs" -> (cosinePairs _),
    "q_lsh_cosine_pairs" -> (lshCosinePairs _),
    "q_semantic_dedup" -> (semanticDedup _),
    "q_int8_topk" -> (int8TopK _),
    "q_rrf_fusion" -> (rrfFusion _),
    "q_ivf_topk" -> (ivfTopK _),
    "q_pq_topk" -> (pqTopK _),
    "q_embedding_dedup" -> (embeddingDedup _),
    "q_embedding_norms" -> (embeddingNorms _),
    "q_embedding_int8" -> (embeddingInt8 _),
    "q_label_centroids" -> (labelCentroids _),
    "q_near_deduped_docs" -> (nearDedupedDocs _),
    "q_dup_clusters" -> (dupClusters _),
    "q_dedup_keep_best" -> (dedupKeepBest _),
    "q_triangle_stats" -> (triangleStats _),
    "q_leakage_safe_split" -> (leakageSafeSplit _),
    "q_assortativity" -> (dupAssortativity _),
    "q_kcore" -> (dupKcore _),
    "q_text_stats" -> (textStats _),
    "q_lang_id" -> (langId _),
    "q_quality_score" -> (qualityScore _),
    "q_doc_fingerprint" -> (docFingerprint _),
    "q_text_normalize" -> (textNormalize _),
    "q_tfidf_top_terms" -> (tfidfTopTerms _),
    "q_source_mix" -> (sourceMix _),
    "q_repetition_score" -> (repetitionScore _),
    "q_contamination" -> (contamination _),
    "q_token_budget_sample" -> (tokenBudgetSample _),
    "q_budget_waterfill" -> (budgetWaterfill _),
    "q_multimodal_meta" -> (multimodalMeta _),
    "q_multimodal_decode" -> (multimodalDecode _),
    "q_multimodal_audio" -> (multimodalAudio _),
    "q_multimodal_frames" -> (multimodalFrames _)
  )

  /** k-round CTE unroll of the MMR greedy (λ hardcoded 0.7; the
    * diversity weight is written `(1.0 - 0.7)` — an evaluated
    * subtraction, not a folded 0.3 literal — so DuckDB's double matches
    * Spark's `1.0 - lambda` exactly, 0.30000000000000004 and all).
    * Round i: every not-yet-selected candidate's max similarity to the
    * selected set, argmax of the unrounded λ·rel − (1−λ)·maxSim with
    * id-asc ties — the same comparisons [[Similarity.mmrSelect]]'s loop
    * performs on identical doubles.
    */
  private def mmrOracleSql(m: Int, k: Int): String = {
    def cos(av: String, bv: String): String =
      s"""(list_sum(list_transform(range(1, len($av) + 1),
         |      i -> CAST($av[i] AS DOUBLE) * CAST($bv[i] AS DOUBLE))) /
         |    (sqrt(list_sum(list_transform(range(1, len($av) + 1),
         |      i -> CAST($av[i] AS DOUBLE) * CAST($av[i] AS DOUBLE)))) *
         |     sqrt(list_sum(list_transform(range(1, len($bv) + 1),
         |      i -> CAST($bv[i] AS DOUBLE) * CAST($bv[i] AS DOUBLE))))))"""
        .stripMargin
    val rounds = (2 to k).map { i =>
      s"""mx$i AS MATERIALIZED (
         |  SELECT c.query_id, c.neighbor_id, c.rel_raw, c.rel,
         |    max(s.sim_raw) AS mx
         |  FROM cand c
         |  JOIN selall${i - 1} sl ON sl.query_id = c.query_id
         |  JOIN sims s ON s.query_id = c.query_id
         |    AND ((s.id_a = c.neighbor_id AND s.id_b = sl.neighbor_id)
         |      OR (s.id_b = c.neighbor_id AND s.id_a = sl.neighbor_id))
         |  WHERE NOT EXISTS (SELECT 1 FROM selall${i - 1} x
         |    WHERE x.query_id = c.query_id AND x.neighbor_id = c.neighbor_id)
         |  GROUP BY c.query_id, c.neighbor_id, c.rel_raw, c.rel),
         |sel$i AS MATERIALIZED (
         |  SELECT query_id, neighbor_id, rel,
         |    CAST(floor((0.7 * rel_raw - (1.0 - 0.7) * mx) * 1000000.0)
         |      AS BIGINT) AS mmr_micro FROM (
         |    SELECT query_id, neighbor_id, rel_raw, rel, mx,
         |      row_number() OVER (PARTITION BY query_id
         |        ORDER BY 0.7 * rel_raw - (1.0 - 0.7) * mx DESC,
         |          neighbor_id) AS rn
         |    FROM mx$i) WHERE rn = 1),
         |selall$i AS MATERIALIZED (
         |  SELECT query_id, neighbor_id FROM selall${i - 1}
         |  UNION ALL SELECT query_id, neighbor_id FROM sel$i)""".stripMargin
    }.mkString(",\n")
    val unions = (1 to k).map { i =>
      s"SELECT query_id, CAST($i AS BIGINT) AS rk, neighbor_id AS vec_id, rel, mmr_micro FROM sel$i"
    }.mkString("\nUNION ALL ")
    s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qv
       |           FROM embeddings WHERE vec_id < 5),
       |c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings),
       |scored AS (
       |  SELECT query_id, neighbor_id, ${cos("cv", "qv")} AS rel_raw
       |  FROM c, q WHERE query_id <> neighbor_id),
       |cand AS MATERIALIZED (
       |  SELECT query_id, neighbor_id, rel_raw, rel FROM (
       |    SELECT query_id, neighbor_id, rel_raw, round(rel_raw, 6) AS rel,
       |      row_number() OVER (PARTITION BY query_id
       |        ORDER BY round(rel_raw, 6) DESC, neighbor_id ASC) AS rk
       |    FROM scored) WHERE rk <= $m),
       |cvec AS MATERIALIZED (
       |  SELECT cand.query_id, cand.neighbor_id, e.embedding AS v
       |  FROM cand JOIN embeddings e ON e.vec_id = cand.neighbor_id),
       |sims AS MATERIALIZED (
       |  SELECT a.query_id, a.neighbor_id AS id_a, b.neighbor_id AS id_b,
       |    ${cos("a.v", "b.v")} AS sim_raw
       |  FROM cvec a JOIN cvec b
       |    ON a.query_id = b.query_id AND a.neighbor_id < b.neighbor_id),
       |sel1 AS MATERIALIZED (
       |  SELECT query_id, neighbor_id, rel,
       |    CAST(floor((0.7 * rel_raw) * 1000000.0) AS BIGINT) AS mmr_micro
       |  FROM (
       |    SELECT query_id, neighbor_id, rel_raw, rel,
       |      row_number() OVER (PARTITION BY query_id
       |        ORDER BY 0.7 * rel_raw DESC, neighbor_id) AS rn
       |    FROM cand) WHERE rn = 1),
       |selall1 AS MATERIALIZED (SELECT query_id, neighbor_id FROM sel1),
       |$rounds
       |SELECT * FROM (
       |$unions)
       |ORDER BY query_id, rk""".stripMargin
  }

  /** DuckDB unroll of [[graft.ops.Graph.kCore]]'s iterative peel on the
    * id<200 near-dup block (the q_pagerank/q_bpe_learn fixed-round
    * pattern). The peel is a fixpoint, but a fixpoint unrolled PAST its
    * convergence depth is stable — extra rounds are identity filters —
    * so a generous round count makes the data-dependent depth a
    * non-issue: measured depth is 2–3 at sf0.001/0.01/0.1, the oracle
    * unrolls `rounds`=12 (4–6× margin). If the data ever out-peels the
    * unroll, the mismatch is a loud hash failure, never a silent wrong
    * answer (Spark's side `require(converged)`s at its own fixpoint).
    */
  private def kcoreOracleSql(k: Int, rounds: Int): String = {
    val peel = (1 to rounds).map { i =>
      s"""keep$i AS (
         |  SELECT node FROM (
         |    SELECT u AS node FROM e${i - 1} UNION ALL SELECT v FROM e${i - 1})
         |  GROUP BY node HAVING count(*) >= $k),
         |e$i AS MATERIALIZED (
         |  SELECT u, v FROM e${i - 1}
         |  WHERE u IN (SELECT node FROM keep$i)
         |    AND v IN (SELECT node FROM keep$i))""".stripMargin
    }.mkString(",\n")
    s"""WITH sh AS (
       |  SELECT doc_id AS id, list_distinct(string_split(text, ' ')) AS s
       |  FROM documents WHERE doc_id < 200),
       |p AS (
       |  SELECT a.id AS u, b.id AS v
       |  FROM sh a JOIN sh b ON a.id < b.id
       |  WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
       |        (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.9),
       |e0 AS MATERIALIZED (SELECT DISTINCT u, v FROM p),
       |$peel
       |SELECT node, CAST(count(*) AS BIGINT) AS deg_in_core
       |FROM (SELECT u AS node FROM e$rounds UNION ALL SELECT v FROM e$rounds)
       |GROUP BY node
       |ORDER BY node""".stripMargin
  }

  /** DuckDB replay of [[Dedup.simhashPairs]] (and of the banded scale
    * path, which is proven set-equal to it): per-token XXH64 via
    * [[DuckXxh.xxh64]], bit-majority vote by unnesting (doc, tokenhash)
    * rows against a 64-bit range — `2·Σbit > n` is [[graft.functions
    * .SimHash64]]'s strict majority — then all-pairs hamming on the
    * id<200 block. NULL-text docs vanish at unnest and so produce no
    * pairs, matching Spark's null-sig propagation. The bit values are
    * HUGEINT shifts, NOT `2**b` — DuckDB's `**` returns DOUBLE and
    * silently corrupts bits ≥ 53.
    */
  private def simhashPairsOracleSql(maxHamming: Int, maxId: Long): String = {
    val xxh = DuckXxh.xxh64("t")
    s"""WITH toks AS (
       |  SELECT doc_id, string_split(text, ' ') AS tk
       |  FROM documents WHERE doc_id < $maxId),
       |hs AS MATERIALIZED (
       |  SELECT doc_id, len(tk) AS n,
       |    unnest(list_transform(tk, t -> $xxh)) AS h
       |  FROM toks),
       |bits AS MATERIALIZED (
       |  SELECT doc_id, r.b,
       |    CASE WHEN 2 * sum(CAST((h >> r.b) & 1 AS BIGINT)) > max(n)
       |         THEN (CAST(1 AS HUGEINT) << CAST(r.b AS INTEGER))
       |         ELSE CAST(0 AS HUGEINT) END AS bitval
       |  FROM hs CROSS JOIN range(0, 64) r(b)
       |  GROUP BY doc_id, r.b),
       |sig AS MATERIALIZED (
       |  SELECT doc_id,
       |    CAST(CASE WHEN sum(bitval) >= 9223372036854775808
       |              THEN sum(bitval) - 18446744073709551616
       |              ELSE sum(bitval) END AS BIGINT) AS s
       |  FROM bits GROUP BY doc_id)
       |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |  CAST(bit_count(xor(a.s, b.s)) AS INTEGER) AS hamming
       |FROM sig a JOIN sig b ON a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.s, b.s)) <= $maxHamming
       |ORDER BY id_a, id_b""".stripMargin
  }

  /** DuckDB replay of [[Dedup.winnowingOverlapPairs]] /
    * [[TextStats.winnowedDocs]]: 3-token shingles hashed with
    * [[DuckXxh.xxh64]] converted to SIGNED longs (Spark's `array_min`
    * compares signed — an unsigned min would pick different
    * fingerprints), window-4 minima, per-doc distinct, stop-gram df cap,
    * inverted-index pair count. Lambda vars are `wi`/`wj` to stay clear
    * of the generator's own short names.
    */
  private def winnowPairsOracleSql(minShared: Int, maxDocFreq: Long,
                                   maxId: Long): String = {
    val shingle = "array_to_string(list_slice(tk, wi+1, wi+3), ' ')"
    val sxxh = DuckXxh.toSigned(DuckXxh.xxh64(shingle))
    s"""WITH toks AS (
       |  SELECT doc_id, string_split(text, ' ') AS tk,
       |    len(string_split(text, ' ')) AS n
       |  FROM documents WHERE doc_id < $maxId AND text IS NOT NULL),
       |sh AS MATERIALIZED (
       |  SELECT doc_id, list_transform(
       |    range(0, greatest(n - 3, 0) + 1),
       |    wi -> $sxxh) AS shl
       |  FROM toks),
       |wm AS MATERIALIZED (
       |  SELECT doc_id, list_transform(
       |    range(0, greatest(len(shl) - 4, 0) + 1),
       |    wj -> list_min(list_slice(shl, wj+1, wj+4))) AS wml
       |  FROM sh),
       |fp AS MATERIALIZED (
       |  SELECT DISTINCT doc_id, unnest(wml) AS fp FROM wm),
       |rare AS MATERIALIZED (
       |  SELECT fp FROM fp GROUP BY fp HAVING count(*) <= $maxDocFreq),
       |idx AS MATERIALIZED (
       |  SELECT doc_id, fp FROM fp WHERE fp IN (SELECT fp FROM rare))
       |SELECT x.doc_id AS id_a, y.doc_id AS id_b,
       |  CAST(count(*) AS BIGINT) AS shared_fp
       |FROM idx x JOIN idx y ON x.fp = y.fp AND x.doc_id < y.doc_id
       |GROUP BY id_a, id_b HAVING count(*) >= $minShared
       |ORDER BY id_a, id_b""".stripMargin
  }

  /** DuckDB replay of the full MinHash+LSH pipeline ([[Dedup
    * .minhashNearDupPairs]] and friends) — token hash sets, 24 per-seed
    * signature minima, 3 banded keys, bucket-join candidates, exact
    * Jaccard verify. Three exactness traps, all bit-level:
    *
    *  - signature minima and the hash-set sort compare SIGNED longs
    *    (`Arrays.sort`/`v < sig(k)`), so every XXH64 result converts to
    *    signed before `list_min`/`list_sort`;
    *  - the band key is Spark's multi-child `xxhash64(lit(b), sig…)`,
    *    which CHAINS: each child's hash becomes the next child's seed,
    *    starting from `hashInt(b, 42)` (a compile-time constant here);
    *  - per-seed minhash seeds are `XXH64.hashInt(k, 42)` — taken from
    *    Spark's own implementation at generation time, not re-derived.
    *
    * Signatures are per-doc and split-independent, so the batch
    * self-join, the bipartite incremental form, and keep-first all share
    * one CTE chain — only the candidate predicate / final shape differ.
    */
  private def minhashOracleSql(kind: String, minJaccard: Double,
                               numHashes: Int = 24, bands: Int = 3): String = {
    require(numHashes % bands == 0)
    val r = numHashes / bands
    val sxxh = DuckXxh.toSigned(DuckXxh.xxh64("t"))
    def unsigned(l: Long): BigInt = (BigInt(l) + (BigInt(1) << 64)).mod(BigInt(1) << 64)
    // the 24 per-signature seeds, from Spark's own hashInt — embedded as
    // a literal UBIGINT list indexed by the permutation number
    val seedList = (0 until numHashes).map(k => unsigned(
      org.apache.spark.sql.catalyst.expressions.XXH64.hashInt(k, 42L)))
      .mkString("[", ", ", "]")
    def keyExpr(b: Int): String = {
      val init = unsigned(
        org.apache.spark.sql.catalyst.expressions.XXH64.hashInt(b, 42L))
      (0 until r).foldLeft(s"CAST($init AS UBIGINT)") { (seedE, i) =>
        DuckXxh.xxh64Long(DuckXxh.toUnsigned(s"sig[${b * r + i + 1}]"), seedE)
      }
    }
    val bandRows = (0 until bands).map(b =>
      s"SELECT doc_id, $b AS bi, k$b AS bk FROM keyed").mkString(
      "\nUNION ALL ")
    // Signatures are per-(vocab word, seed), and the corpus vocabulary is
    // tiny next to the corpus — so hash the VOCABULARY once (|V| string
    // hashes + |V|·24 long hashes) and make the per-doc minima a
    // relational GROUP BY over the (doc, tokenhash) join, instead of
    // re-evaluating the 20 KB hash expression per (doc, token, seed).
    val ctes =
      s"""WITH doctok AS MATERIALIZED (
         |  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS t
         |  FROM documents WHERE text IS NOT NULL),
         |vh AS MATERIALIZED (
         |  SELECT t, $sxxh AS h FROM (SELECT DISTINCT t FROM doctok)),
         |dt AS MATERIALIZED (
         |  SELECT DISTINCT doc_id, h FROM doctok JOIN vh USING (t)),
         |hsets AS MATERIALIZED (
         |  SELECT doc_id, list_sort(list(h)) AS hset FROM dt GROUP BY doc_id),
         |vperm AS MATERIALIZED (
         |  SELECT h, rk.k,
         |    ${DuckXxh.toSigned(DuckXxh.xxh64Long(
               DuckXxh.toUnsigned("h"),
               s"CAST($seedList AS UBIGINT[])[CAST(rk.k AS INTEGER)+1]"))} AS ph
         |  FROM (SELECT DISTINCT h FROM vh) CROSS JOIN range(0, $numHashes) rk(k)),
         |sigt AS MATERIALIZED (
         |  SELECT doc_id, k, min(ph) AS s
         |  FROM dt JOIN vperm USING (h) GROUP BY doc_id, k),
         |sigl AS MATERIALIZED (
         |  SELECT doc_id, list(s ORDER BY k) AS sig FROM sigt GROUP BY doc_id),
         |keyed AS MATERIALIZED (
         |  SELECT doc_id, hset,
         |    ${(0 until bands).map(b => s"${keyExpr(b)} AS k$b").mkString(",\n    ")}
         |  FROM sigl JOIN hsets USING (doc_id)),
         |bandrows AS MATERIALIZED (
         |$bandRows),""".stripMargin
    val candCond = kind match {
      case "incremental" => "x.doc_id < 250 AND y.doc_id >= 250"
      case _             => "x.doc_id < y.doc_id"
    }
    val verified =
      s"""cand AS MATERIALIZED (
         |  SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
         |  FROM bandrows x JOIN bandrows y
         |    ON x.bi = y.bi AND x.bk = y.bk AND $candCond),
         |pairs AS MATERIALIZED (
         |  SELECT id_a, id_b, jaccard FROM (
         |    SELECT c.id_a, c.id_b,
         |      round(CAST(len(list_intersect(a.hset, b.hset)) AS DOUBLE) /
         |        (len(a.hset) + len(b.hset) -
         |         len(list_intersect(a.hset, b.hset))), 6) AS jaccard
         |    FROM cand c
         |    JOIN keyed a ON a.doc_id = c.id_a
         |    JOIN keyed b ON b.doc_id = c.id_b)
         |  WHERE jaccard >= $minJaccard)""".stripMargin
    val tail = kind match {
      case "keepfirst" =>
        """SELECT doc_id, lang, source FROM documents
          |WHERE doc_id NOT IN (SELECT id_b FROM pairs)
          |ORDER BY doc_id""".stripMargin
      case _ =>
        "SELECT id_a, id_b, jaccard FROM pairs ORDER BY id_a, id_b"
    }
    s"$ctes\n$verified\n$tail"
  }

  /** DuckDB replay of [[Similarity.lshCosinePairs]]: the seeded Gaussian
    * hyperplanes are generated HERE with the same `Random(42)` stream the
    * operator uses and embedded as double literals (shortest-round-trip
    * repr, so DuckDB parses back the identical bits); unit-normalization
    * and projections replay the sequential-left-fold convention
    * (`list_sum` is bit-identical to the codegen'd DotProduct — the
    * q_knn_cosine precedent); band keys are Spark's chained multi-child
    * `xxhash64` over the floor-bucket longs via [[DuckXxh]]. Embedding
    * dim is baked at generation time (64) — a testdata drift would fail
    * loudly at the `len(embedding) = 64` guard, not silently.
    */
  private def lshCosineOracleSql(minCosine: Double, bucketLength: Double,
                                 bands: Int = 4, rowsPerBand: Int = 2,
                                 dim: Int = 64): String = {
    val rng = new scala.util.Random(42L)
    val projections = Array.fill(bands * rowsPerBand, dim)(rng.nextGaussian())
    def unsigned(l: Long): BigInt =
      (BigInt(l) + (BigInt(1) << 64)).mod(BigInt(1) << 64)
    val bCols = projections.zipWithIndex.map { case (g, i) =>
      val lit = g.map(java.lang.Double.toString).mkString("[", ", ", "]")
      s"CAST(floor(list_sum(list_transform(range(1, ${dim + 1}), " +
        s"li -> u[li] * CAST($lit AS DOUBLE[])[li])) / $bucketLength) " +
        s"AS BIGINT) AS pb$i"
    }
    def keyExpr(b: Int): String = {
      val init = unsigned(
        org.apache.spark.sql.catalyst.expressions.XXH64.hashInt(b, 42L))
      (0 until rowsPerBand).foldLeft(s"CAST($init AS UBIGINT)") { (seedE, i) =>
        DuckXxh.xxh64Long(DuckXxh.toUnsigned(s"pb${b * rowsPerBand + i}"), seedE)
      }
    }
    val bandRows = (0 until bands).map(b =>
      s"SELECT id, $b AS bi, k$b AS bk FROM keyed").mkString("\nUNION ALL ")
    s"""WITH ue AS MATERIALIZED (
       |  SELECT vec_id AS id,
       |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS xe
       |  FROM embeddings
       |  WHERE len(embedding) = $dim
       |    AND len(list_filter(embedding, x -> x IS NULL)) = 0),
       |un AS MATERIALIZED (
       |  SELECT id, list_transform(xe, x -> x / nrm) AS u
       |  FROM (SELECT id, xe,
       |          CASE WHEN s = 0 THEN 1.0 ELSE sqrt(s) END AS nrm
       |        FROM (SELECT id, xe,
       |                list_sum(list_transform(xe, x -> x*x)) AS s
       |              FROM ue))),
       |proj AS MATERIALIZED (
       |  SELECT id, u, ${bCols.mkString(",\n    ")}
       |  FROM un),
       |keyed AS MATERIALIZED (
       |  SELECT id, u,
       |    ${(0 until bands).map(b => s"${keyExpr(b)} AS k$b").mkString(",\n    ")}
       |  FROM proj),
       |bandrows AS MATERIALIZED (
       |$bandRows),
       |cand AS MATERIALIZED (
       |  SELECT DISTINCT x.id AS id_a, y.id AS id_b
       |  FROM bandrows x JOIN bandrows y
       |    ON x.bi = y.bi AND x.bk = y.bk AND x.id < y.id)
       |SELECT id_a, id_b, cosine FROM (
       |  SELECT c.id_a, c.id_b,
       |    round(list_sum(list_transform(range(1, ${dim + 1}),
       |      li -> a.u[li] * b.u[li])), 6) AS cosine
       |  FROM cand c JOIN keyed a ON a.id = c.id_a
       |               JOIN keyed b ON b.id = c.id_b)
       |WHERE cosine >= $minCosine
       |ORDER BY id_a, id_b""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    "q_mmr_diverse" -> mmrOracleSql(20, 10),
    "q_kcore" -> kcoreOracleSql(k = 3, rounds = 12),
    "q_lsh_cosine_pairs" -> lshCosineOracleSql(minCosine = 0.3,
      bucketLength = 1.0),
    "q_minhash_pairs" -> minhashOracleSql("pairs", 0.9),
    "q_incremental_minhash" -> minhashOracleSql("incremental", 0.9),
    "q_near_deduped_docs" -> minhashOracleSql("keepfirst", 0.9),
    "q_winnow_pairs" -> winnowPairsOracleSql(minShared = 3,
      maxDocFreq = 20L, maxId = 500L),
    "q_simhash_pairs" -> simhashPairsOracleSql(maxHamming = 12, maxId = 200L),
    // deliberately the SAME SQL: the banded plan must reproduce the
    // all-pairs result set exactly (pigeonhole makes banding lossless)
    "q_simhash_banded" -> simhashPairsOracleSql(maxHamming = 12, maxId = 200L),
    "q_dedup_exact" ->
      """SELECT md5(text) AS fp, min(doc_id) AS keep_id, count(*) AS copies
        |FROM documents
        |WHERE text IS NOT NULL
        |GROUP BY fp
        |ORDER BY keep_id""".stripMargin,

    "q_jaccard_pairs" ->
      """WITH sh AS (
        |  SELECT doc_id AS id, list_distinct(string_split(text, ' ')) AS s
        |  FROM documents WHERE doc_id < 200)
        |SELECT a.id AS id_a, b.id AS id_b,
        |  round(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
        |        (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 6) AS jaccard
        |FROM sh a JOIN sh b ON a.id < b.id
        |WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
        |      (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.9
        |ORDER BY id_a, id_b""".stripMargin,

    // deliberately the SAME SQL as q_jaccard_pairs: the prefix-filtered
    // plan must reproduce the exact result set, not an approximation
    "q_prefix_jaccard" ->
      """WITH sh AS (
        |  SELECT doc_id AS id, list_distinct(string_split(text, ' ')) AS s
        |  FROM documents WHERE doc_id < 200)
        |SELECT a.id AS id_a, b.id AS id_b,
        |  round(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
        |        (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 6) AS jaccard
        |FROM sh a JOIN sh b ON a.id < b.id
        |WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
        |      (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.9
        |ORDER BY id_a, id_b""".stripMargin,

    "q_near_dedup_exact" ->
      """WITH sh AS (
        |  SELECT doc_id AS id, list_distinct(string_split(text, ' ')) AS s
        |  FROM documents WHERE doc_id < 200),
        |p AS (
        |  SELECT b.id AS drop_id
        |  FROM sh a JOIN sh b ON a.id < b.id
        |  WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
        |        (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.9)
        |SELECT doc_id, lang, source
        |FROM documents
        |WHERE doc_id < 200 AND doc_id NOT IN (SELECT drop_id FROM p)
        |ORDER BY doc_id""".stripMargin,

    "q_incremental_dedup" ->
      """WITH sh AS (
        |  SELECT doc_id AS id, list_distinct(string_split(text, ' ')) AS s
        |  FROM documents WHERE doc_id < 400),
        |p AS (
        |  SELECT b.id AS drop_id
        |  FROM sh a JOIN sh b ON a.id < 200 AND b.id >= 200
        |  WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
        |        (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.9)
        |SELECT doc_id, lang, source
        |FROM documents
        |WHERE doc_id >= 200 AND doc_id < 400
        |  AND doc_id NOT IN (SELECT drop_id FROM p)
        |ORDER BY doc_id""".stripMargin,

    "q_dup_clusters" ->
      """WITH RECURSIVE sh AS (
        |  SELECT doc_id AS id, list_distinct(string_split(text, ' ')) AS s
        |  FROM documents WHERE doc_id < 1000),
        |p AS (
        |  SELECT a.id AS id_a, b.id AS id_b
        |  FROM sh a JOIN sh b ON a.id < b.id
        |  WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
        |        (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.9),
        |edges AS (
        |  SELECT id_a AS u, id_b AS v FROM p
        |  UNION ALL SELECT id_b, id_a FROM p),
        |reach(id, r) AS (
        |  SELECT id, id FROM sh
        |  UNION
        |  SELECT e.u, reach.r FROM edges e JOIN reach ON e.v = reach.id)
        |SELECT id, CAST(min(r) AS BIGINT) AS component
        |FROM reach GROUP BY id
        |ORDER BY id""".stripMargin,

    "q_triangle_stats" ->
      """WITH sh AS (
        |  SELECT doc_id AS id, list_distinct(string_split(text, ' ')) AS s
        |  FROM documents WHERE doc_id < 200),
        |p AS (
        |  SELECT a.id AS id_a, b.id AS id_b
        |  FROM sh a JOIN sh b ON a.id < b.id
        |  WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
        |        (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.9),
        |e AS (SELECT DISTINCT least(id_a, id_b) AS u,
        |        greatest(id_a, id_b) AS v FROM p),
        |d AS (
        |  SELECT node, CAST(count(*) AS BIGINT) AS deg
        |  FROM (SELECT u AS node FROM e UNION ALL SELECT v FROM e)
        |  GROUP BY node),
        |t AS (
        |  SELECT e1.u AS a, e1.v AS b, e2.v AS c
        |  FROM e e1 JOIN e e2 ON e2.u = e1.v
        |       JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v),
        |n AS (
        |  SELECT node, CAST(count(*) AS BIGINT) AS n_tri
        |  FROM (SELECT unnest([a, b, c]) AS node FROM t) GROUP BY node)
        |SELECT d.node, d.deg, COALESCE(n.n_tri, 0) AS n_tri,
        |  CASE WHEN d.deg < 2 THEN 0
        |       ELSE (1000000 * COALESCE(n.n_tri, 0)) //
        |            ((d.deg * (d.deg - 1)) // 2) END AS lcc_micro
        |FROM d LEFT JOIN n USING (node)
        |ORDER BY node""".stripMargin,

    "q_assortativity" ->
      """WITH sh AS (
        |  SELECT doc_id AS id, list_distinct(string_split(text, ' ')) AS s
        |  FROM documents WHERE doc_id < 200),
        |p AS (
        |  SELECT a.id AS u, b.id AS v
        |  FROM sh a JOIN sh b ON a.id < b.id
        |  WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
        |        (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.9),
        |d AS (
        |  SELECT node, count(*) AS deg
        |  FROM (SELECT u AS node FROM p UNION ALL SELECT v FROM p)
        |  GROUP BY node),
        |e AS (
        |  SELECT du.deg AS a, dv.deg AS b
        |  FROM p JOIN d du ON du.node = p.u JOIN d dv ON dv.node = p.v),
        |sym AS (SELECT a, b FROM e UNION ALL SELECT b, a FROM e)
        |SELECT CAST(count(*) / 2 AS BIGINT) AS n_edges,
        |       round(corr(a, b), 6) AS assortativity
        |FROM sym""".stripMargin,

    "q_leakage_safe_split" ->
      """WITH RECURSIVE sh AS (
        |  SELECT doc_id AS id, list_distinct(string_split(text, ' ')) AS s
        |  FROM documents WHERE doc_id < 1000),
        |p AS (
        |  SELECT a.id AS id_a, b.id AS id_b
        |  FROM sh a JOIN sh b ON a.id < b.id
        |  WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
        |        (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.9),
        |edges AS (
        |  SELECT id_a AS u, id_b AS v FROM p
        |  UNION ALL SELECT id_b, id_a FROM p),
        |reach(id, r) AS (
        |  SELECT id, id FROM sh
        |  UNION
        |  SELECT e.u, reach.r FROM edges e JOIN reach ON e.v = reach.id),
        |comp AS (
        |  SELECT id, CAST(min(r) AS BIGINT) AS component
        |  FROM reach GROUP BY id)
        |SELECT id AS doc_id, component,
        |  CAST(CASE WHEN CAST('0x' ||
        |      substring(md5(CAST(component AS VARCHAR)), 1, 2) AS BIGINT)
        |    < 205 THEN 1 ELSE 0 END AS BIGINT) AS in_train
        |FROM comp ORDER BY doc_id""".stripMargin,

    "q_dedup_keep_best" ->
      """WITH RECURSIVE sh AS (
        |  SELECT doc_id AS id, list_distinct(string_split(text, ' ')) AS s
        |  FROM documents WHERE doc_id < 1000),
        |p AS (
        |  SELECT a.id AS id_a, b.id AS id_b
        |  FROM sh a JOIN sh b ON a.id < b.id
        |  WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
        |        (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.9),
        |edges AS (
        |  SELECT id_a AS u, id_b AS v FROM p
        |  UNION ALL SELECT id_b, id_a FROM p),
        |reach(id, r) AS (
        |  SELECT id, id FROM sh
        |  UNION
        |  SELECT e.u, reach.r FROM edges e JOIN reach ON e.v = reach.id),
        |comp AS (SELECT id, min(r) AS component FROM reach GROUP BY id),
        |j AS (
        |  SELECT c.component, d.doc_id, d.n_chars
        |  FROM comp c JOIN documents d ON d.doc_id = c.id),
        |m AS (
        |  SELECT component, count(*) AS n_members, max(n_chars) AS best_q
        |  FROM j GROUP BY component)
        |SELECT CAST(m.component AS BIGINT) AS component,
        |       CAST(min(j.doc_id) AS BIGINT) AS kept_doc,
        |       CAST(m.n_members AS BIGINT) AS n_members,
        |       CAST(m.best_q AS BIGINT) AS best_quality
        |FROM m JOIN j ON j.component = m.component AND j.n_chars = m.best_q
        |GROUP BY m.component, m.n_members, m.best_q
        |ORDER BY component""".stripMargin,

    "q_class_balance" ->
      """WITH n AS (SELECT label, count(*) AS n FROM embeddings GROUP BY label),
        |m AS (SELECT min(n) AS n_min FROM n),
        |r AS (
        |  SELECT label, vec_id, row_number() OVER (PARTITION BY label
        |    ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rk
        |  FROM embeddings)
        |SELECT label, CAST(rk AS BIGINT) AS rk, vec_id
        |FROM r, m WHERE rk <= n_min
        |ORDER BY label, rk""".stripMargin,

    "q_mrl_rerank" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding[1:16] AS qh,
        |                  embedding AS qf
        |           FROM embeddings WHERE vec_id < 5),
        |c AS (SELECT vec_id AS neighbor_id, embedding[1:16] AS ch,
        |             embedding AS cf FROM embeddings),
        |head AS (
        |  SELECT query_id, neighbor_id, cf, qf, round(
        |    list_sum(list_transform(range(1, len(ch) + 1),
        |      i -> CAST(ch[i] AS DOUBLE) * CAST(qh[i] AS DOUBLE))) /
        |    (sqrt(list_sum(list_transform(range(1, len(ch) + 1),
        |      i -> CAST(ch[i] AS DOUBLE) * CAST(ch[i] AS DOUBLE)))) *
        |     sqrt(list_sum(list_transform(range(1, len(qh) + 1),
        |      i -> CAST(qh[i] AS DOUBLE) * CAST(qh[i] AS DOUBLE))))), 6)
        |    AS head_score
        |  FROM c, q WHERE query_id <> neighbor_id),
        |cand AS MATERIALIZED (
        |  SELECT *, row_number() OVER (PARTITION BY query_id
        |    ORDER BY head_score DESC, neighbor_id ASC) AS cand_rk
        |  FROM head),
        |rer AS (
        |  SELECT query_id, neighbor_id, head_score, round(
        |    list_sum(list_transform(range(1, len(cf) + 1),
        |      i -> CAST(cf[i] AS DOUBLE) * CAST(qf[i] AS DOUBLE))) /
        |    (sqrt(list_sum(list_transform(range(1, len(cf) + 1),
        |      i -> CAST(cf[i] AS DOUBLE) * CAST(cf[i] AS DOUBLE)))) *
        |     sqrt(list_sum(list_transform(range(1, len(qf) + 1),
        |      i -> CAST(qf[i] AS DOUBLE) * CAST(qf[i] AS DOUBLE))))), 6)
        |    AS score
        |  FROM cand WHERE cand_rk <= 50),
        |ranked AS (
        |  SELECT query_id, neighbor_id, head_score, score,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY score DESC, neighbor_id ASC) AS rk
        |  FROM rer)
        |SELECT query_id, rk, neighbor_id, score, head_score
        |FROM ranked WHERE rk <= 10
        |ORDER BY query_id, rk""".stripMargin,

    "q_knn_cosine" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding AS qv
        |           FROM embeddings WHERE vec_id < 5),
        |c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings),
        |scored AS (
        |  SELECT query_id, neighbor_id, round(
        |    list_sum(list_transform(range(1, len(cv) + 1),
        |      i -> CAST(cv[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE))) /
        |    (sqrt(list_sum(list_transform(range(1, len(cv) + 1),
        |      i -> CAST(cv[i] AS DOUBLE) * CAST(cv[i] AS DOUBLE)))) *
        |     sqrt(list_sum(list_transform(range(1, len(qv) + 1),
        |      i -> CAST(qv[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE))))), 6) AS score
        |  FROM c, q WHERE query_id <> neighbor_id),
        |ranked AS (
        |  SELECT query_id, neighbor_id, score,
        |    row_number() OVER (PARTITION BY query_id
        |                       ORDER BY score DESC, neighbor_id ASC) AS rk
        |  FROM scored)
        |SELECT query_id, rk, neighbor_id, score
        |FROM ranked WHERE rk <= 10
        |ORDER BY query_id, rk""".stripMargin,

    // op-order-shared with Similarity.int8TopK: normalize → per-vector
    // (min, scale) → least(floor(...), 255) codes → dequant mn + c*sc →
    // sequential-fold dot — identical doubles, so the deterministic
    // approximation hashes exactly
    "q_int8_topk" ->
      """WITH u AS (
        |  SELECT vec_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE) /
        |      sqrt(list_sum(list_transform(embedding,
        |        y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE))))) AS uv
        |  FROM embeddings),
        |qy AS (SELECT vec_id AS query_id, uv AS qu FROM u WHERE vec_id < 5),
        |c AS (
        |  SELECT vec_id AS neighbor_id, uv,
        |    list_min(uv) AS mn,
        |    (list_max(uv) - list_min(uv)) / 255.0 AS sc
        |  FROM u),
        |dq AS (
        |  SELECT neighbor_id,
        |    list_transform(uv, x -> CASE WHEN sc = 0 THEN mn
        |      ELSE mn + least(floor((x - mn) / sc), 255.0) * sc END) AS d
        |  FROM c),
        |scored AS (
        |  SELECT query_id, neighbor_id, round(
        |    list_sum(list_transform(range(1, len(d) + 1),
        |      i -> qu[i] * d[i])), 6) AS score
        |  FROM dq, qy WHERE query_id <> neighbor_id),
        |ranked AS (
        |  SELECT query_id, neighbor_id, score,
        |    row_number() OVER (PARTITION BY query_id
        |                       ORDER BY score DESC, neighbor_id ASC) AS rk
        |  FROM scored)
        |SELECT query_id, rk, neighbor_id, score
        |FROM ranked WHERE rk <= 10
        |ORDER BY query_id, rk""".stripMargin,

    // the two input rankings are verbatim the q_knn_cosine and
    // q_int8_topk oracle pipelines at k=20; fusion is rank-only
    "q_rrf_fusion" ->
      """WITH fq AS (SELECT vec_id AS query_id, embedding AS qv
        |            FROM embeddings WHERE vec_id < 5),
        |fc AS (SELECT vec_id AS neighbor_id, embedding AS cv
        |       FROM embeddings),
        |fscored AS (
        |  SELECT query_id, neighbor_id, round(
        |    list_sum(list_transform(range(1, len(cv) + 1),
        |      i -> CAST(cv[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE))) /
        |    (sqrt(list_sum(list_transform(range(1, len(cv) + 1),
        |      i -> CAST(cv[i] AS DOUBLE) * CAST(cv[i] AS DOUBLE)))) *
        |     sqrt(list_sum(list_transform(range(1, len(qv) + 1),
        |      i -> CAST(qv[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE))))), 6)
        |      AS score
        |  FROM fc, fq WHERE query_id <> neighbor_id),
        |franked AS (
        |  SELECT query_id, neighbor_id,
        |    row_number() OVER (PARTITION BY query_id
        |                       ORDER BY score DESC, neighbor_id ASC) AS rk_a
        |  FROM fscored),
        |flist AS (SELECT query_id, neighbor_id, rk_a
        |          FROM franked WHERE rk_a <= 20),
        |u AS (
        |  SELECT vec_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE) /
        |      sqrt(list_sum(list_transform(embedding,
        |        y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE))))) AS uv
        |  FROM embeddings),
        |qy AS (SELECT vec_id AS query_id, uv AS qu FROM u WHERE vec_id < 5),
        |c AS (
        |  SELECT vec_id AS neighbor_id, uv,
        |    list_min(uv) AS mn,
        |    (list_max(uv) - list_min(uv)) / 255.0 AS sc
        |  FROM u),
        |dq AS (
        |  SELECT neighbor_id,
        |    list_transform(uv, x -> CASE WHEN sc = 0 THEN mn
        |      ELSE mn + least(floor((x - mn) / sc), 255.0) * sc END) AS d
        |  FROM c),
        |qscored AS (
        |  SELECT query_id, neighbor_id, round(
        |    list_sum(list_transform(range(1, len(d) + 1),
        |      i -> qu[i] * d[i])), 6) AS score
        |  FROM dq, qy WHERE query_id <> neighbor_id),
        |qranked AS (
        |  SELECT query_id, neighbor_id,
        |    row_number() OVER (PARTITION BY query_id
        |                       ORDER BY score DESC, neighbor_id ASC) AS rk_b
        |  FROM qscored),
        |qlist AS (SELECT query_id, neighbor_id, rk_b
        |          FROM qranked WHERE rk_b <= 20),
        |fused AS (
        |  SELECT query_id, neighbor_id,
        |    COALESCE(1.0 / (60.0 + CAST(rk_a AS DOUBLE)), 0.0) +
        |    COALESCE(1.0 / (60.0 + CAST(rk_b AS DOUBLE)), 0.0) AS rrf
        |  FROM flist FULL OUTER JOIN qlist
        |    USING (query_id, neighbor_id)),
        |final AS (
        |  SELECT query_id, neighbor_id, rrf,
        |    row_number() OVER (PARTITION BY query_id
        |                       ORDER BY rrf DESC, neighbor_id ASC) AS rk
        |  FROM fused)
        |SELECT query_id, CAST(rk AS BIGINT) AS rk, neighbor_id,
        |  CAST(floor(rrf * 1000000000.0) AS BIGINT) AS rrf_nano
        |FROM final WHERE rk <= 10
        |ORDER BY query_id, rk""".stripMargin,

    "q_cosine_pairs" ->
      """WITH u AS (
        |  SELECT vec_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE) /
        |      sqrt(list_sum(list_transform(embedding,
        |        y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE))))) AS uv
        |  FROM embeddings WHERE vec_id < 1000)
        |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |  round(list_sum(list_transform(range(1, len(a.uv) + 1),
        |    i -> a.uv[i] * b.uv[i])), 6) AS cosine
        |FROM u a JOIN u b ON a.vec_id < b.vec_id
        |WHERE round(list_sum(list_transform(range(1, len(a.uv) + 1),
        |    i -> a.uv[i] * b.uv[i])), 6) >= 0.3
        |ORDER BY id_a, id_b""".stripMargin,

    "q_embedding_dedup" ->
      """WITH u AS (
        |  SELECT vec_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE) /
        |      sqrt(list_sum(list_transform(embedding,
        |        y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE))))) AS uv
        |  FROM embeddings WHERE vec_id < 1000),
        |p AS (
        |  SELECT b.vec_id AS id_b
        |  FROM u a JOIN u b ON a.vec_id < b.vec_id
        |  WHERE round(list_sum(list_transform(range(1, len(a.uv) + 1),
        |      i -> a.uv[i] * b.uv[i])), 6) >= 0.3)
        |SELECT e.vec_id, e.label
        |FROM embeddings e
        |WHERE e.vec_id < 1000 AND e.vec_id NOT IN (SELECT id_b FROM p)
        |ORDER BY e.vec_id""".stripMargin,

    "q_label_centroids" ->
      """SELECT label, CAST(r.i AS BIGINT) AS pos,
        |  round(sum(CAST(embedding[r.i + 1] AS DOUBLE)) / count(*), 6) AS mean
        |FROM embeddings CROSS JOIN range(0, 64) r(i)
        |GROUP BY label, pos
        |ORDER BY label, pos""".stripMargin,

    "q_embedding_int8" ->
      """WITH e AS (
        |  SELECT vec_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |s AS (
        |  SELECT vec_id, v, list_min(v) AS mn, list_max(v) AS mx,
        |    (list_max(v) - list_min(v)) / 255.0 AS sc
        |  FROM e)
        |SELECT vec_id, mn, mx,
        |  CAST(CASE WHEN sc = 0 THEN 0 ELSE list_sum(list_transform(v,
        |    x -> least(CAST(floor((x - mn) / sc) AS BIGINT), 255)))
        |  END AS BIGINT) AS code_sum,
        |  CAST(CASE WHEN sc = 0 THEN 0 ELSE CAST(floor(1000000 *
        |    list_max(list_transform(v, x -> abs(x - (mn +
        |      least(CAST(floor((x - mn) / sc) AS BIGINT), 255) * sc)))))
        |    AS BIGINT)
        |  END AS BIGINT) AS max_err_micro
        |FROM s
        |ORDER BY vec_id""".stripMargin,

    "q_embedding_norms" ->
      """SELECT vec_id,
        |  round(sqrt(list_sum(list_transform(embedding,
        |    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6) AS l2
        |FROM embeddings
        |ORDER BY vec_id""".stripMargin,

    "q_text_stats" ->
      """SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |  CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct,
        |  CAST(len(regexp_extract_all(text, '[a-z]+')) AS BIGINT) AS n_word_tokens,
        |  CAST(ceil(CAST(length(text) AS DOUBLE) / 4.0) AS BIGINT) AS bpe_est,
        |  round(CAST(list_sum(list_transform(string_split(text, ' '),
        |    x -> length(x))) AS DOUBLE) /
        |    len(string_split(text, ' ')), 6) AS mean_tok_len
        |FROM documents
        |ORDER BY doc_id""".stripMargin,

    "q_lang_id" ->
      """WITH scored AS (
        |  SELECT lang,
        |    len(list_filter(string_split(text, ' '),
        |      x -> x IN ('der','die','das','und','scan','row'))) AS hits_de,
        |    len(list_filter(string_split(text, ' '),
        |      x -> x IN ('the','a','of','and','query','table'))) AS hits_en,
        |    len(list_filter(string_split(text, ' '),
        |      x -> x IN ('le','la','les','et','join','merge'))) AS hits_fr
        |  FROM documents)
        |SELECT lang,
        |  CASE WHEN hits_fr > greatest(hits_de, hits_en) THEN 'fr'
        |       WHEN hits_en > hits_de THEN 'en'
        |       ELSE 'de' END AS lang_pred,
        |  count(*) AS n
        |FROM scored
        |GROUP BY lang, lang_pred
        |ORDER BY lang, lang_pred""".stripMargin,

    "q_quality_score" ->
      """WITH c AS (
        |  SELECT doc_id,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS t,
        |    CAST(len(list_filter(string_split(text, ' '),
        |      x -> x IN ('the','a','of','and','query','table',
        |                 'der','die','das','und','scan','row',
        |                 'le','la','les','et','join','merge'))) AS BIGINT) AS h,
        |    CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS d,
        |    least(n_chars, 500) AS m
        |  FROM documents)
        |SELECT doc_id,
        |  CAST((1000000 * (10 * m * t + 3750 * (h + d))) // (12500 * t)
        |    AS BIGINT) AS quality_micro
        |FROM c
        |ORDER BY doc_id""".stripMargin,

    "q_doc_fingerprint" ->
      """SELECT doc_id, md5(text) AS fp
        |FROM documents
        |ORDER BY doc_id""".stripMargin,

    "q_text_normalize" ->
      """WITH n AS (
        |  SELECT doc_id,
        |    trim(regexp_replace(regexp_replace(lower(text),
        |      '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS norm
        |  FROM documents)
        |SELECT doc_id, md5(norm) AS norm_fp,
        |       CAST(length(norm) AS BIGINT) AS norm_len
        |FROM n
        |ORDER BY doc_id""".stripMargin,

    "q_repetition_score" ->
      """WITH s AS (
        |  SELECT doc_id,
        |    CASE WHEN len(string_split(text, ' ')) >= 3
        |      THEN list_transform(range(1, len(string_split(text, ' ')) - 1),
        |        i -> string_split(text, ' ')[i] || ' ' ||
        |             string_split(text, ' ')[i+1] || ' ' ||
        |             string_split(text, ' ')[i+2])
        |      ELSE CAST([] AS VARCHAR[]) END AS sh
        |  FROM documents)
        |SELECT doc_id,
        |  CASE WHEN len(sh) = 0 THEN 0
        |    ELSE CAST((1000000 * (len(sh) - len(list_distinct(sh)))) // len(sh)
        |         AS BIGINT) END AS rep3_micro
        |FROM s
        |ORDER BY doc_id""".stripMargin,

    "q_contamination" ->
      """WITH sh AS (
        |  SELECT doc_id,
        |    list_distinct(CASE WHEN len(string_split(text, ' ')) >= 3
        |      THEN list_transform(range(1, len(string_split(text, ' ')) - 1),
        |        i -> string_split(text, ' ')[i] || ' ' ||
        |             string_split(text, ' ')[i+1] || ' ' ||
        |             string_split(text, ' ')[i+2])
        |      ELSE CAST([] AS VARCHAR[]) END) AS grams
        |  FROM documents),
        |g AS (SELECT doc_id, unnest(grams) AS g FROM sh),
        |b AS (SELECT DISTINCT g FROM g WHERE doc_id < 50),
        |hit AS (
        |  SELECT g.doc_id, count(*) AS h FROM g JOIN b USING (g)
        |  GROUP BY g.doc_id)
        |SELECT sh.doc_id,
        |  CASE WHEN len(sh.grams) = 0 THEN 0
        |    ELSE CAST((1000000 * COALESCE(hit.h, 0)) // len(sh.grams)
        |         AS BIGINT) END AS contam_micro
        |FROM sh LEFT JOIN hit ON sh.doc_id = hit.doc_id
        |ORDER BY sh.doc_id""".stripMargin,

    "q_token_budget_sample" ->
      """WITH c AS (
        |  SELECT doc_id, source,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, source, n_tokens,
        |    CAST(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id)
        |      AS BIGINT) AS cum_weight
        |  FROM c)
        |SELECT doc_id, source, n_tokens, cum_weight
        |FROM s WHERE cum_weight <= 800
        |ORDER BY doc_id""".stripMargin,

    // the oracle uses the textbook sorted-prefix scan; the engine bisects
    // scalar aggregates — same unique water level, and the level's final
    // division uses the same integer operands in both (bit-identical)
    "q_budget_waterfill" ->
      """WITH counts AS (
        |  SELECT source AS g,
        |    CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS c
        |  FROM documents GROUP BY source),
        |tot AS (SELECT CAST(sum(c) AS BIGINT) AS total, count(*) AS n
        |        FROM counts),
        |b AS (SELECT CAST(floor(total * 0.5) AS BIGINT) AS budget, n
        |      FROM tot),
        |ranked AS (
        |  SELECT g, c,
        |    row_number() OVER (ORDER BY c, g) AS rk,
        |    COALESCE(sum(c) OVER (ORDER BY c, g
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumprev
        |  FROM counts),
        |lvl AS (
        |  SELECT CAST(budget - cumprev AS DOUBLE) / (n - rk + 1) AS t
        |  FROM ranked CROSS JOIN b
        |  WHERE cumprev + (n - rk + 1) * c >= budget
        |  ORDER BY rk LIMIT 1)
        |SELECT counts.g AS source, c,
        |  round(least(CAST(c AS DOUBLE), t), 6) AS alloc,
        |  CAST(CAST(c AS DOUBLE) > t AS BIGINT) AS capped
        |FROM counts CROSS JOIN lvl
        |ORDER BY source""".stripMargin,

    "q_source_mix" ->
      """WITH per AS (
        |  SELECT source, count(*) AS n_docs,
        |    CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
        |  FROM documents GROUP BY source),
        |tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS total FROM per)
        |SELECT source, n_docs, n_tokens,
        |  CAST(CAST(n_tokens AS HUGEINT) * 1000000 // total AS BIGINT) AS share_ppm
        |FROM per, tot
        |ORDER BY source""".stripMargin,

    "q_tfidf_top_terms" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS term
        |  FROM documents),
        |tf AS (
        |  SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
        |dfreq AS (
        |  SELECT term, count(*) AS df FROM tf GROUP BY term),
        |n AS (SELECT count(*) AS n_docs FROM documents),
        |scored AS (
        |  SELECT tf.doc_id, tf.term,
        |    round(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / dfreq.df), 6) AS tfidf
        |  FROM tf JOIN dfreq USING (term) CROSS JOIN n),
        |ranked AS (
        |  SELECT doc_id, term, tfidf,
        |    row_number() OVER (PARTITION BY doc_id
        |                       ORDER BY tfidf DESC, term ASC) AS rk
        |  FROM scored)
        |SELECT doc_id, rk, term, tfidf
        |FROM ranked WHERE rk <= 3
        |ORDER BY doc_id, rk""".stripMargin,

    "q_multimodal_meta" ->
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
        |  sha256(text) AS sha
        |FROM documents
        |ORDER BY doc_id""".stripMargin,

    // predicts the DECODED statistics from the closed-form fixture pixel
    // function (w = 8 + id%24, h = 8 + 3id%24, px(i) = (31id + 7i)%256):
    // mean over the raster, the raster top-left byte, and the
    // nearest-neighbor 8×8 resize mean (sy = ry·h//8, sx = rx·w//8,
    // idx = (sy·w + sx)·3 + c with j enumerating (ry, rx, c))
    "q_multimodal_decode" ->
      """WITH dims AS (
        |  SELECT doc_id,
        |    8 + doc_id % 24 AS w,
        |    8 + (3 * doc_id) % 24 AS h
        |  FROM documents),
        |px AS (
        |  SELECT doc_id, w, h,
        |    list_sum(list_transform(range(0, w * h * 3),
        |      i -> (doc_id * 31 + i * 7) % 256)) AS s,
        |    list_sum(list_transform(range(0, 192),
        |      j -> (doc_id * 31 +
        |            (((j // 24) * h // 8 * w + ((j // 3) % 8) * w // 8) * 3
        |             + j % 3) * 7) % 256)) AS rs
        |  FROM dims)
        |SELECT doc_id,
        |  CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
        |  CAST(3 AS BIGINT) AS channels, CAST(w * h AS BIGINT) AS n_px,
        |  CAST((1000000 * s) // (w * h * 3) AS BIGINT) AS mean_px_micro,
        |  CAST((doc_id * 31) % 256 AS BIGINT) AS top_left,
        |  CAST((1000000 * rs) // 192 AS BIGINT) AS resized_mean_micro
        |FROM px
        |ORDER BY doc_id""".stripMargin,

    // rate = 8000 + (id%3)*4000, ch = 1 + id%2, frames = 64 + id%128,
    // sample(j) = ((id*17 + j*11) % 4096) - 2048 — the oracle recomputes
    // the generator; Spark decodes the actual RIFF/PCM bytes
    "q_multimodal_audio" ->
      """WITH p AS (
        |  SELECT doc_id,
        |    8000 + (doc_id % 3) * 4000 AS rate,
        |    1 + doc_id % 2 AS ch,
        |    64 + doc_id % 128 AS nf
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, rate, ch, nf,
        |    list_sum(list_transform(range(0, nf * ch),
        |      j -> abs((doc_id * 17 + j * 11) % 4096 - 2048))) AS sabs
        |  FROM p)
        |SELECT doc_id,
        |  CAST(rate AS BIGINT) AS sample_rate,
        |  CAST(ch AS BIGINT) AS channels,
        |  CAST(nf AS BIGINT) AS n_frames,
        |  CAST((1000000 * nf) // rate AS BIGINT) AS duration_micro,
        |  CAST((1000000 * sabs) // (nf * ch) AS BIGINT) AS mean_abs_micro
        |FROM s
        |ORDER BY doc_id""".stripMargin,

    // every 2nd frame of F = 1 + id%4 frames; per frame f:
    // w = 4 + (id+f)%5, h = 3 + (2id+f)%4, px(i) = (id + 13f + 7i)%256
    "q_multimodal_frames" ->
      """WITH fr AS (
        |  SELECT doc_id, r.f AS f,
        |    4 + (doc_id + r.f) % 5 AS w,
        |    3 + (2 * doc_id + r.f) % 4 AS h
        |  FROM documents CROSS JOIN range(0, 4) r(f)
        |  WHERE r.f < 1 + doc_id % 4 AND r.f % 2 = 0),
        |px AS (
        |  SELECT doc_id, f, w, h,
        |    list_sum(list_transform(range(0, w * h * 3),
        |      i -> (doc_id + 13 * f + 7 * i) % 256)) AS s
        |  FROM fr)
        |SELECT doc_id, CAST(f AS BIGINT) AS frame_idx,
        |  CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
        |  CAST((1000000 * s) // (w * h * 3) AS BIGINT) AS mean_px_micro
        |FROM px
        |ORDER BY doc_id, frame_idx""".stripMargin
  )
}
