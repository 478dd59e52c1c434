package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.{RollingHash, TextFunctions}

/** Text-analysis queries over `documents` (SURVEY §7.1.7 extensions). */
object TextQueries {

  /** Vocabulary statistics — the vocab-building / stopword-mining step
    * of a training pipeline: per-term document frequency + total term
    * frequency, top-100 by frequency. Scale shape: the classic two-level
    * aggregation — a (doc, term) pre-aggregate (map-side combine soaks
    * up within-doc repetition before the shuffle), then a per-term
    * rollup; the global top-100 is a TakeOrdered over the term
    * aggregate, never a full sort. Exact integer counts → hash-gated. */
  def vocabStats(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .select(col("doc_id"),
        explode(TextFunctions.tokens(col("text"))).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      .groupBy("term")
      .agg(count(lit(1)).as("df"), sum(col("tf")).as("tf_total"))
      .orderBy(col("tf_total").desc, col("term"))
      .limit(100)

  val vocabStatsSql: String = s"""
    WITH tok AS (
      SELECT doc_id, unnest(${TextFunctions.tokensSql("text")}) AS term
      FROM documents),
    dt AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2)
    SELECT term, count(*) AS df, CAST(sum(tf) AS BIGINT) AS tf_total
    FROM dt GROUP BY term
    ORDER BY tf_total DESC, term LIMIT 100"""

  /** Sequence packing: documents greedily packed into 512-token context
    * windows, sharded by `doc_id % 8` (8 independent sequential streams
    * — the oracle-reproducible stand-in for the hash sharding a real
    * pipeline would use). Exact integer state → hash-gated against a
    * recursive-CTE replay of the same greedy rule. */
  def packSequences(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), (col("doc_id") % 8).as("shard"),
        TextFunctions.tokenCount(col("text")).cast("long").as("ntok"))
    graft.operators.Pack.greedy(docs, "doc_id", "ntok", "shard",
        budget = 512L)
      .orderBy("shard", "id")
  }

  val packSequencesSql: String = s"""
    WITH RECURSIVE d AS (
      SELECT doc_id, doc_id % 8 AS shard,
        CAST(len(${TextFunctions.tokensSql("text")}) AS BIGINT) AS ntok,
        row_number() OVER (PARTITION BY doc_id % 8 ORDER BY doc_id) AS rn
      FROM documents),
    packed AS (
      SELECT shard, rn, doc_id, ntok, CAST(0 AS BIGINT) AS pack_id,
             ntok AS acc
      FROM d WHERE rn = 1
      UNION ALL
      SELECT nd.shard, nd.rn, nd.doc_id, nd.ntok,
        CASE WHEN p.acc + nd.ntok <= 512 THEN p.pack_id
             ELSE p.pack_id + 1 END,
        CASE WHEN p.acc + nd.ntok <= 512 THEN p.acc + nd.ntok
             ELSE nd.ntok END
      FROM packed p JOIN d nd ON nd.shard = p.shard AND nd.rn = p.rn + 1)
    SELECT doc_id AS id, shard, pack_id FROM packed ORDER BY shard, id"""

  /** Skew-resistant two-level packing gate: sub-shards come from
    * xxhash64 (not DuckDB-reproducible), so this emits a COMPARISON row
    * — doc count preserved, zero multi-doc packs over budget, pack ids
    * contiguous per shard — that DuckDB recomputes exactly (the
    * LSH-gate pattern). */
  def packBalanced(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), (col("doc_id") % 4).as("shard"),
        TextFunctions.tokenCount(col("text")).cast("long").as("ntok"))
    val packed = graft.operators.Pack.greedyBalanced(docs, "doc_id", "ntok",
      "shard", budget = 512L, fanout = 4)
    val packs = packed
      .join(docs.select(col("doc_id").as("id"), col("ntok")), "id")
      .groupBy("shard", "pack_id")
      .agg(sum(col("ntok")).as("tot"), count(lit(1)).as("n"))
    val contiguous = packs.groupBy("shard")
      .agg((max(col("pack_id")) + 1 ===
        count(col("pack_id")).cast("long")).as("c"))
      .agg(min(col("c")).as("contiguous"))
    packs.agg(
        sum(col("n")).as("n_docs"),
        sum(when(col("tot") > 512 && col("n") > 1, 1L).otherwise(0L))
          .as("n_over"))
      .crossJoin(contiguous)
  }

  val packBalancedSql: String = """
    SELECT CAST(count(*) AS BIGINT) AS n_docs,
           CAST(0 AS BIGINT) AS n_over,
           true AS contiguous
    FROM documents"""

  /** Token counting: whitespace tokens + BPE-ish subword estimate. */
  def tokenCounts(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .select(col("doc_id"),
        TextFunctions.tokenCount(col("text")).cast("long").as("ws_tokens"),
        TextFunctions.bpeTokenEstimate(col("text")).as("bpe_est"))
      .orderBy("doc_id")

  val tokenCountsSql: String = s"""
    SELECT doc_id,
      CAST(len(${TextFunctions.tokensSql("text")}) AS BIGINT) AS ws_tokens,
      CAST(ceil(length(text) / 4.0) AS BIGINT) AS bpe_est
    FROM documents ORDER BY doc_id"""

  /** Language ID via stopword-marker scoring (n-gram-free heuristic). */
  def langId(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("lang").as("declared"),
        TextFunctions.langId(col("text")).as("predicted"))
      .orderBy("doc_id")

  val langIdSql: String = s"""
    SELECT doc_id, lang AS declared,
      ${TextFunctions.langIdSql("text")} AS predicted
    FROM documents ORDER BY doc_id"""

  /** Quality scoring: rational formula over stopword ratio / length /
    * token-length saturations. */
  def quality(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .select(col("doc_id"),
        TextFunctions.tokenCount(col("text")).cast("long").as("n_tokens"),
        TextFunctions.qualityScore(col("text")).as("score"))
      .orderBy("doc_id")

  val qualitySql: String = s"""
    SELECT doc_id,
      CAST(len(${TextFunctions.tokensSql("text")}) AS BIGINT) AS n_tokens,
      ${TextFunctions.qualityScoreSql("text")} AS score
    FROM documents ORDER BY doc_id"""

  /** Repetition quality signals (the Gopher-style repetition filters a
    * pretraining pipeline applies alongside the rational quality score):
    * duplicate-token fraction and top-2-gram token fraction. One explode
    * + gram-count shuffle; the per-doc token stats are pure expressions.
    * All outputs are exact integer ratios cast to double → bit-identical
    * to the DuckDB oracle. */
  def repetition(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.load(spark, dir, "documents")
      .select(col("doc_id"),
        filter(split(lower(col("text")), "\\s+"), t => t =!= "").as("tk"))
      .filter(size(col("tk")) >= 2)
      .select(col("doc_id"), col("tk"),
        size(col("tk")).cast("long").as("n_tokens"),
        size(array_distinct(col("tk"))).cast("long").as("n_distinct"))
    val max2 = base
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(tk) - 2), " +
          "i -> concat(tk[i], ' ', tk[i + 1]))")).as("gram"))
      .groupBy("doc_id", "gram").agg(count(lit(1)).as("cnt"))
      .groupBy("doc_id").agg(max(col("cnt")).as("max2"))
    base.drop("tk").join(max2, "doc_id")
      .select(col("doc_id"), col("n_tokens"), col("n_distinct"), col("max2"),
        ((col("n_tokens") - col("n_distinct")).cast("double") /
          col("n_tokens")).as("dup_token_frac"),
        ((col("max2") * 2).cast("double") / col("n_tokens"))
          .as("top2gram_frac"))
      .orderBy("doc_id")
  }

  val repetitionSql: String = """
    WITH toks AS (
      SELECT doc_id,
        list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS tk
      FROM documents),
    base AS (
      SELECT doc_id, tk, CAST(len(tk) AS BIGINT) AS n_tokens,
        CAST(len(list_distinct(tk)) AS BIGINT) AS n_distinct
      FROM toks WHERE len(tk) >= 2),
    g AS (
      SELECT doc_id,
        unnest([array_to_string(tk[i:i+1], ' ') for i in range(1, len(tk))]) AS gram
      FROM base),
    c AS (SELECT doc_id, gram, count(*) AS cnt FROM g GROUP BY 1, 2),
    m AS (SELECT doc_id, max(cnt) AS max2 FROM c GROUP BY 1)
    SELECT b.doc_id, b.n_tokens, b.n_distinct, m.max2,
      CAST(b.n_tokens - b.n_distinct AS DOUBLE) / b.n_tokens AS dup_token_frac,
      CAST(m.max2 * 2 AS DOUBLE) / b.n_tokens AS top2gram_frac
    FROM base b JOIN m USING (doc_id)
    ORDER BY doc_id"""

  /** Benchmark decontamination over the documents table: every 50th doc
    * plays the held-out benchmark; corpus docs sharing any word 4-gram
    * with it are flagged with their distinct shared-gram count (the
    * [[graft.operators.Contamination]] operator). */
  def decontaminate(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    graft.operators.Contamination.sharedNgrams(
        docs.filter(col("doc_id") % 50 =!= 0),
        docs.filter(col("doc_id") % 50 === 0),
        "text", "doc_id", n = 4)
      .orderBy("doc_id")
  }

  val decontaminateSql: String = """
    WITH toks AS (
      SELECT doc_id,
        list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS tk
      FROM documents),
    g AS (
      SELECT doc_id,
        unnest([array_to_string(tk[i:i+3], ' ') for i in range(1, len(tk) - 2)]) AS gram
      FROM toks WHERE len(tk) >= 4),
    bench AS (SELECT DISTINCT gram FROM g WHERE doc_id % 50 = 0)
    SELECT g.doc_id, count(DISTINCT g.gram) AS n_shared
    FROM g JOIN bench USING (gram)
    WHERE g.doc_id % 50 <> 0
    GROUP BY 1 ORDER BY doc_id"""

  /** Exact word-bigram heavy hitters via the Misra-Gries sketch +
    * exact-recount operator ([[graft.operators.HeavyHitters]]): every
    * bigram exceeding 1/700 of all bigram occurrences, exact counts —
    * the sketch pass shuffles only fixed-size summaries and the
    * recount only candidate keys, so the plan never shuffles the full
    * vocabulary (what `vocab_stats`' two-level agg would do at
    * web-scale cardinalities). The gate is hash-exact BECAUSE the MG
    * candidate superset provably contains every true heavy hitter:
    * DuckDB recomputes the answer from full counts and must agree
    * row-for-row. */
  def heavyHitters(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
      .select(graft.functions.WordNGrams(col("text"), 2).as("grams"))
    graft.operators.HeavyHitters.exact(docs, "grams", k = 700)
      .orderBy(desc("cnt"), col("term"))
  }

  val heavyHittersSql: String = s"""
    WITH toks AS (
      SELECT ${TextFunctions.tokensSql("text")} AS tk FROM documents),
    g AS (
      SELECT unnest([array_to_string(tk[i:i+1], ' ')
                     for i in range(1, len(tk))]) AS term
      FROM toks WHERE len(tk) >= 2),
    c AS (SELECT term, count(*) AS cnt FROM g GROUP BY 1),
    n AS (SELECT sum(cnt) AS n FROM c)
    SELECT term, cnt FROM c, n
    WHERE cnt > n // 700
    ORDER BY cnt DESC, term"""

  /** FUZZY decontamination ([[graft.operators.Contamination
    * .benchmarkContainment]]): the benchmark is every 97th document
    * TRUNCATED to its first 25 tokens — the "eval question embedded in
    * a longer training document" shape — and the gate flags (corpus
    * doc, benchmark doc) pairs where ≥60% of the benchmark's distinct
    * 3-grams occur in the corpus document. The untruncated source doc
    * scores containment 1.0 while its Jaccard vs the truncated probe is
    * low — the asymmetry that makes containment (not Jaccard) the
    * contamination metric. */
  def decontaminateNear(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    val bench = docs.filter(col("doc_id") % 97 === 0)
      .select(col("doc_id"), array_join(slice(
        filter(split(lower(col("text")), "\\s+"), t => t =!= ""),
        1, 25), " ").as("text"))
    graft.operators.Contamination.benchmarkContainment(
        docs, bench, "text", "doc_id", n = 3, threshold = 0.6)
      .orderBy("doc_id", "bench_id")
  }

  val decontaminateNearSql: String = """
    WITH toks AS (
      SELECT doc_id,
        list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS tk
      FROM documents),
    cg AS (
      SELECT doc_id, unnest(list_distinct(
        [array_to_string(tk[i:i+2], ' ') for i in range(1, len(tk) - 1)]))
        AS gram
      FROM toks WHERE len(tk) >= 3),
    bt AS (SELECT doc_id AS bench_id, tk[1:25] AS btk
           FROM toks WHERE doc_id % 97 = 0),
    bg AS (
      SELECT bench_id, unnest(list_distinct(
        [array_to_string(btk[i:i+2], ' ') for i in range(1, len(btk) - 1)]))
        AS gram
      FROM bt WHERE len(btk) >= 3),
    bs AS (SELECT bench_id, count(*) AS sz_b FROM bg GROUP BY 1),
    ct AS (
      SELECT cg.doc_id, bg.bench_id, count(*) AS inter
      FROM cg JOIN bg USING (gram) GROUP BY 1, 2)
    SELECT ct.doc_id, ct.bench_id,
      round(inter * 1.0 / sz_b, 6) AS containment
    FROM ct JOIN bs USING (bench_id)
    WHERE inter * 1.0 / sz_b >= 0.6
    ORDER BY doc_id, bench_id"""

  /** End-to-end training-data curation pipeline — the composition a
    * 100 TB pretraining pass runs, oracle-gated as ONE query: annotate
    * (language ID + quality score + token count) → filter (keep
    * high-quality English) → exact dedup (one representative per
    * normalized content, cluster sizes kept) → per-representative
    * output. Every stage is an already-hash-gated operator; the gate
    * here proves they COMPOSE without drift (filter pushdown through
    * the annotations, dedup over the filtered set, join back on the
    * representative). */
  def trainPipeline(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    val annotated = docs.select(col("doc_id"), col("text"),
      TextFunctions.langId(col("text")).as("predicted"),
      TextFunctions.qualityScore(col("text")).as("score"),
      TextFunctions.tokenCount(col("text")).cast("long").as("ws_tokens"))
    val kept = annotated.filter(col("predicted") === "en" &&
      col("score") >= 0.15)
    // carry the representative's score/tokens THROUGH the dedup agg
    // (min_by) — a rejoin on rep_id would re-run langId/qualityScore
    // over the whole corpus a second time
    graft.operators.Dedup.exactWith(kept, "text", "doc_id",
        Seq("ws_tokens", "score"))
      .select("rep_id", "n_dups", "ws_tokens", "score")
      .orderBy("rep_id")
  }

  val trainPipelineSql: String = s"""
    WITH ann AS (
      SELECT doc_id, text,
        ${TextFunctions.langIdSql("text")} AS predicted,
        ${TextFunctions.qualityScoreSql("text")} AS score,
        CAST(len(${TextFunctions.tokensSql("text")}) AS BIGINT) AS ws_tokens
      FROM documents),
    kept AS (SELECT * FROM ann WHERE predicted = 'en' AND score >= 0.15),
    reps AS (
      SELECT min(doc_id) AS rep_id, count(*) AS n_dups,
        lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS ck
      FROM kept GROUP BY 3)
    SELECT r.rep_id, r.n_dups, k.ws_tokens, k.score
    FROM reps r JOIN kept k ON k.doc_id = r.rep_id
    ORDER BY rep_id"""

  /** Document fingerprinting via the custom codegen'd RollingHash
    * expression over normalized text. Oracle-checked: the mod-2^64
    * wraparound h = h·31 + byte is replayed in DuckDB with HUGEINT
    * arithmetic (128-bit headroom, explicit mod each step) and folded
    * back to the signed long; exactness is additionally pinned by
    * RollingHashSpec against the reference implementation. */
  def fingerprint(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .select(col("doc_id"),
        RollingHash(graft.operators.Dedup.normText(col("text"))).as("fp"))
      .orderBy("doc_id")

  /** h accumulates over the normalized text's UTF-8 bytes (replayed via
    * [[TextFunctions.utf8BytesSql]] so non-ASCII text folds the same
    * byte sequence the Spark kernel hashes); HUGEINT keeps h·31+b exact
    * below 2^70, the explicit mod reproduces Java long wraparound, and
    * the final CASE maps [2^63, 2^64) onto the negative longs. */
  val fingerprintSql: String = s"""
    WITH norm AS (
      SELECT doc_id, lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS t
      FROM documents),
    h AS (
      SELECT doc_id,
        list_reduce(
          list_prepend(CAST(0 AS HUGEINT),
            list_transform(${TextFunctions.utf8BytesSql("t")},
              b -> CAST(b AS HUGEINT))),
          (a, b) -> (a * 31 + b) % CAST('18446744073709551616' AS HUGEINT)) AS hv
      FROM norm)
    SELECT doc_id,
      CAST(CASE WHEN hv >= CAST('9223372036854775808' AS HUGEINT)
           THEN hv - CAST('18446744073709551616' AS HUGEINT) ELSE hv END
           AS BIGINT) AS fp
    FROM h ORDER BY doc_id"""

  /** Unigram language-model scoring — the classic cheap quality /
    * outlier signal (a doc of rare terms scores high NLL, boilerplate
    * scores low): train the MLE unigram model over the corpus in one
    * aggregation pass, then score every document by its per-token
    * negative log-likelihood. Scale shape: the model is the vocab_stats
    * aggregate (map-side combinable); scoring is one equijoin of the
    * (doc, term, tf) pre-aggregate against the term table — the corpus
    * text itself is never re-scanned or shuffled. Rounds to 6 dp. */
  def perplexity(spark: SparkSession, dir: String): DataFrame = {
    val dt = Tables.load(spark, dir, "documents")
      .select(col("doc_id"),
        explode(TextFunctions.tokens(col("text"))).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val terms = dt.groupBy("term").agg(sum(col("tf")).as("tf_total"))
    val total = broadcast(terms.agg(
      sum(col("tf_total")).cast("double").as("total")))
    dt.join(terms, "term").crossJoin(total)
      .groupBy("doc_id")
      .agg(round(
        -sum(col("tf") * log(col("tf_total").cast("double") / col("total")))
          / sum(col("tf")), 6).as("nll"))
      .orderBy("doc_id")
  }

  val perplexitySql: String = s"""
    WITH tok AS (
      SELECT doc_id, unnest(${TextFunctions.tokensSql("text")}) AS term
      FROM documents),
    dt AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
    terms AS (SELECT term, sum(tf) AS tf_total FROM dt GROUP BY 1),
    total AS (SELECT CAST(sum(tf_total) AS DOUBLE) AS total FROM terms)
    SELECT doc_id,
      round(-sum(tf * ln(CAST(tf_total AS DOUBLE) / total)) / sum(tf), 6)
        AS nll
    FROM dt JOIN terms USING (term), total
    GROUP BY doc_id ORDER BY doc_id"""

  /** BM25 keyword retrieval: the first three documents' texts replay as
    * queries against the whole corpus, top-10 each. Scores round to
    * 6 dp before ranking on both engines (ties break on doc id), so the
    * ranking — not just the row set — is hash-gated. */
  def bm25Search(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), TextFunctions.tokens(col("text")).as("toks"))
    val queries = docs.filter(col("doc_id") < 3)
      .select(col("doc_id").as("q_id"), col("toks").as("q_toks"))
    graft.operators.Retrieval.bm25TopK(docs, "doc_id", "toks",
        queries, "q_id", "q_toks", k = 10)
      .orderBy("q_id", "rank")
  }

  val bm25SearchSql: String = s"""
    WITH tok AS (
      SELECT doc_id, unnest(${TextFunctions.tokensSql("text")}) AS term
      FROM documents),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
    dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1),
    stats AS (SELECT avg(dl) AS avgdl, count(*) AS n FROM dl),
    dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
    q AS (SELECT DISTINCT doc_id AS q_id, term FROM tok WHERE doc_id < 3),
    hit AS (
      SELECT q.q_id, tf.doc_id,
        ln(1 + (stats.n - dfreq.df + 0.5) / (dfreq.df + 0.5)) * tf.tf
          * (1.2 + 1)
          / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / stats.avgdl))
          AS contrib
      FROM q
      JOIN tf USING (term)
      JOIN dfreq USING (term)
      JOIN dl ON tf.doc_id = dl.doc_id, stats),
    scored AS (
      SELECT q_id, doc_id, round(sum(contrib), 6) AS score
      FROM hit GROUP BY 1, 2),
    ranked AS (
      SELECT q_id,
        CAST(row_number() OVER (PARTITION BY q_id
          ORDER BY score DESC, doc_id) AS INT) AS rank,
        doc_id, score
      FROM scored)
    SELECT q_id, rank, doc_id, score FROM ranked
    WHERE rank <= 10 ORDER BY q_id, rank"""

  /** The FULL pretraining data path as one gate — [[trainPipeline]]'s
    * annotate → filter → exact-dedup stages extended through chunking
    * and the deterministic training shuffle: surviving representative
    * documents chunk into overlapping context windows, each chunk gets
    * a SplitMix64 permutation key, and the output is the sharded,
    * position-numbered order a trainer would actually read. Every
    * stage is an already-gated operator; this pins that the WHOLE chain
    * composes without drift (the final permutation is a pure function
    * of corpus content, so it hash-gates row-for-row). */
  def trainOrder(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    val kept = docs.select(col("doc_id"), col("text"),
        TextFunctions.langId(col("text")).as("predicted"),
        TextFunctions.qualityScore(col("text")).as("score"))
      .filter(col("predicted") === "en" && col("score") >= 0.15)
    val reps = graft.operators.Dedup
      .exactWith(kept, "text", "doc_id", Seq("text"))
      .select(col("rep_id").as("doc_id"), col("text"))
    // chunk key = doc_id·2^32 + chunk_id: disjoint per-doc chunk spaces
    // (a ·1000 encoding collides once a doc exceeds 1000 chunks ≈ 23k
    // tokens at window 32 / stride 24)
    val chunks = graft.operators.Chunk.tokenWindows(reps,
        "doc_id", "text", window = 32, stride = 24)
      .select((shiftleft(col("doc_id"), 32) + col("chunk_id")).as("cid"),
        col("n_tokens"))
    graft.operators.Shard.deterministic(chunks, "cid",
        seed = 2026L, shards = 16)
      .select("shard", "pos", "cid", "n_tokens", "sort_key")
      .orderBy("shard", "pos")
  }

  val trainOrderSql: String = s"""
    WITH ann AS (
      SELECT doc_id, text,
        ${TextFunctions.langIdSql("text")} AS predicted,
        ${TextFunctions.qualityScoreSql("text")} AS score
      FROM documents),
    kept AS (SELECT doc_id, text FROM ann
             WHERE predicted = 'en' AND score >= 0.15),
    reps AS (
      SELECT min(doc_id) AS doc_id, arg_min(text, doc_id) AS text
      FROM kept
      GROUP BY lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))),
    chunks AS (${graft.operators.Chunk.tokenWindowsSql(
        "reps", "doc_id", "text", window = 32, stride = 24)}),
    keyed AS (
      SELECT doc_id * 4294967296 + chunk_id AS cid, n_tokens FROM chunks),
    ${graft.operators.Shard.sortKeySql("keyed", "cid", 2026L)}
    SELECT CAST(sort_key & 15 AS INT) AS shard,
      CAST(row_number() OVER (
        PARTITION BY (sort_key & 15) ORDER BY sort_key, cid) - 1
        AS BIGINT) AS pos,
      cid, n_tokens, sort_key
    FROM _sk
    ORDER BY shard, pos"""

  /** Chunk-level retrieval — [[graft.operators.Chunk]] composed with
    * [[graft.operators.Retrieval.bm25TopK]]: the corpus is chunked into
    * overlapping 32-token windows and BM25 runs over CHUNKS (the RAG
    * retrieval granularity), with the first two documents' chunks
    * replayed as queries. Chunk keys are doc_id·2^32+chunk_id so one
    * BIGINT id flows through the index with disjoint per-doc chunk
    * spaces (no collision however many chunks a doc has); ranking is
    * 6-dp-rounded and id-tiebroken, hash-gated end-to-end. */
  def chunkSearch(spark: SparkSession, dir: String): DataFrame = {
    def chunked(docs: org.apache.spark.sql.DataFrame) =
      graft.operators.Chunk.tokenWindows(docs, "doc_id", "text",
          window = 32, stride = 24)
        .select((shiftleft(col("doc_id"), 32) + col("chunk_id")).as("cid"),
          TextFunctions.tokens(col("chunk_text")).as("toks"))
    val chunks = chunked(Tables.load(spark, dir, "documents"))
    // query chunks: filter the DOCS before chunking (chunking is
    // per-doc, so this is the same set as filtering cid afterwards) —
    // the cid-filter formulation re-chunked the whole corpus for a
    // 2-document query set because the cid predicate sits above the
    // chunk explode and cannot push into the scan
    val queries = chunked(Tables.load(spark, dir, "documents")
        .filter(col("doc_id") < 2))
      .select(col("cid").as("q_id"), col("toks").as("q_toks"))
    graft.operators.Retrieval.bm25TopK(chunks, "cid", "toks",
        queries, "q_id", "q_toks", k = 10)
      .orderBy("q_id", "rank")
  }

  val chunkSearchSql: String = s"""
    WITH chunks AS (${graft.operators.Chunk.tokenWindowsSql(
        "documents", "doc_id", "text", window = 32, stride = 24)}),
    tok AS (
      SELECT doc_id * 4294967296 + chunk_id AS cid,
        unnest(string_split(chunk_text, ' ')) AS term
      FROM chunks),
    tf AS (SELECT cid, term, count(*) AS tf FROM tok GROUP BY 1, 2),
    dl AS (SELECT cid, count(*) AS dl FROM tok GROUP BY 1),
    stats AS (SELECT avg(dl) AS avgdl, count(*) AS n FROM dl),
    dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
    q AS (SELECT DISTINCT cid AS q_id, term FROM tok
          WHERE cid < 8589934592),
    hit AS (
      SELECT q.q_id, tf.cid,
        ln(1 + (stats.n - dfreq.df + 0.5) / (dfreq.df + 0.5)) * tf.tf
          * (1.2 + 1)
          / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / stats.avgdl))
          AS contrib
      FROM q JOIN tf USING (term) JOIN dfreq USING (term)
      JOIN dl ON tf.cid = dl.cid, stats),
    scored AS (
      SELECT q_id, cid, round(sum(contrib), 6) AS score
      FROM hit GROUP BY 1, 2),
    ranked AS (
      SELECT q_id, CAST(row_number() OVER (PARTITION BY q_id
          ORDER BY score DESC, cid) AS INT) AS rank, cid, score
      FROM scored)
    SELECT q_id, rank, cid, score FROM ranked
    WHERE rank <= 10 ORDER BY q_id, rank"""

  /** INCREMENTAL inverted-index maintenance e2e — the search-index
    * counterpart of `dedup_incremental`: bootstrap the corpus into the
    * persistent postings/doc-length/stats tables, apply one mixed CDF
    * delta (clone inserts, token-appending updates, deletes), then
    * query the maintained index. The oracle runs from-scratch BM25 over
    * the FINAL corpus state in DuckDB — so the gate pins that O(delta)
    * maintenance converges to exactly what a full re-index would
    * produce. Queries use surviving unchanged docs (1,2,3). */
  def bm25Incremental(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.IncrementalIndex
    val docs = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), TextFunctions.tokens(col("text")).as("toks"))
    val root = java.nio.file.Files
      .createTempDirectory("graft-incindex").toString
    val postings = IncrementalIndex.postingsTable(s"$root/postings", 8)
    val dlens = IncrementalIndex.docTable(s"$root/docs", 4)
    val stats = IncrementalIndex.statsTable(s"$root/stats")
    def seq(v: Long) = f"$v%016x/0"

    // delta 1: the corpus bootstraps in
    IncrementalIndex.applyDelta(spark, postings, dlens, stats,
      docs.withColumn("_change_type", lit("insert")),
      "doc_id", "toks", seq(1))
    // delta 2 (mixed, same shape as dedup_incremental): clones of every
    // 97th doc insert under id+1e6; every 89th surviving doc gains
    // tokens; every 61st doc deletes
    val delCond = col("doc_id") % 61 === 0
    val updCond = col("doc_id") % 89 === 0 && !delCond
    val appended = concat(col("toks"), array(lit("qq"), lit("zz")))
    val changes = docs.filter(col("doc_id") % 97 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("toks"))
      .withColumn("_change_type", lit("insert"))
      .unionByName(docs.filter(delCond)
        .withColumn("_change_type", lit("delete")))
      .unionByName(docs.filter(updCond)
        .withColumn("_change_type", lit("update_preimage")))
      .unionByName(docs.filter(updCond)
        .withColumn("toks", appended)
        .withColumn("_change_type", lit("update_postimage")))
    IncrementalIndex.applyDelta(spark, postings, dlens, stats,
      changes, "doc_id", "toks", seq(2))

    val queries = docs.filter(col("doc_id").isin(1L, 2L, 3L))
      .select(col("doc_id").as("q_id"), col("toks").as("q_toks"))
    IncrementalIndex.bm25TopK(spark, postings, dlens, stats,
        queries, "q_id", "q_toks", k = 10)
      .withColumnRenamed("id", "doc_id")
      .orderBy("q_id", "rank")
  }

  val bm25IncrementalSql: String = s"""
    WITH corpus AS (
      SELECT doc_id,
        CASE WHEN doc_id % 89 = 0
          THEN ${TextFunctions.tokensSql("text")} ||
            ['qq', 'zz']
          ELSE ${TextFunctions.tokensSql("text")} END AS l
      FROM documents WHERE doc_id % 61 <> 0
      UNION ALL
      SELECT doc_id + 1000000, ${TextFunctions.tokensSql("text")}
      FROM documents WHERE doc_id % 97 = 0),
    tok AS (SELECT doc_id, unnest(l) AS term FROM corpus),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
    dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1),
    stats AS (SELECT avg(dl) AS avgdl, count(*) AS n FROM dl),
    dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
    q AS (SELECT DISTINCT doc_id AS q_id, term FROM tok
          WHERE doc_id IN (1, 2, 3)),
    hit AS (
      SELECT q.q_id, tf.doc_id,
        ln(1 + (stats.n - dfreq.df + 0.5) / (dfreq.df + 0.5)) * tf.tf
          * (1.2 + 1)
          / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / stats.avgdl))
          AS contrib
      FROM q
      JOIN tf USING (term)
      JOIN dfreq USING (term)
      JOIN dl ON tf.doc_id = dl.doc_id, stats),
    scored AS (
      SELECT q_id, doc_id, round(sum(contrib), 6) AS score
      FROM hit GROUP BY 1, 2),
    ranked AS (
      SELECT q_id,
        CAST(row_number() OVER (PARTITION BY q_id
          ORDER BY score DESC, doc_id) AS INT) AS rank,
        doc_id, score
      FROM scored)
    SELECT q_id, rank, doc_id, score FROM ranked
    WHERE rank <= 10 ORDER BY q_id, rank"""

  /** Positional phrase search gate: the corpus's own doc 0 donates its
    * first three tokens as the phrase (fully relational on both
    * engines, so the gate is scale-invariant), and every document
    * containing that contiguous token run reports its OVERLAPPING
    * occurrence count. The oracle re-checks every candidate start
    * position with a list-slice equality — token-boundary-exact, which
    * `LIKE '%…%'` is not. */
  def phraseSearch(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), TextFunctions.tokens(col("text")).as("toks"))
    val phrase = docs.filter(col("doc_id") === 0)
      .select(posexplode(slice(col("toks"), 1, 3)))
      .select(col("pos").as("slot"), col("col").as("term"))
    graft.operators.Retrieval.phraseSearch(docs, "doc_id", "toks", phrase)
      .orderBy("doc_id")
  }

  val phraseSearchSql: String = s"""
    WITH base AS (
      SELECT doc_id, ${TextFunctions.tokensSql("text")} AS l
      FROM documents),
    ph AS (SELECT l[1:3] AS p FROM base WHERE doc_id = 0),
    pos AS (
      SELECT doc_id, l, unnest(range(1, len(l) - 3 + 2)) AS c
      FROM base WHERE len(l) >= 3),
    hit AS (
      SELECT doc_id, c FROM pos, ph WHERE l[c:(c + 2)] = p)
    SELECT doc_id, count(*) AS n_hits
    FROM hit GROUP BY 1 ORDER BY doc_id"""

  /** Segment-level dedup gate: documents segmented into fixed 10-token
    * windows (this corpus has no newlines, so the fixed-window
    * segmenter is the non-degenerate choice); any segment appearing in
    * 2+ distinct documents is boilerplate and drops; documents
    * reassemble in order. Exact string output → hash-gated. */
  /** Corpus-wide exact substring dedup over the documents table —
    * [[graft.operators.Dedup.substringDedup]] with 6-token spans; any
    * token covered by a repeated 6-gram survives only at the gram's
    * globally-first `(doc, pos)`. The DuckDB oracle replays the same
    * semantics with STRING grams (the Spark side joins on 64-bit gram
    * hashes; agreement also pins collision-freedom at gate scale). */
  def dedupSubstrings(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    graft.operators.Dedup.substringDedup(docs, "doc_id", "text", k = 6)
      .orderBy("doc_id")
  }

  val dedupSubstringsSql: String = {
    val k = 6
    s"""
    WITH toks AS (
      SELECT doc_id, ${TextFunctions.tokensSql("text")} AS tk
      FROM documents),
    g0 AS (
      SELECT doc_id,
        unnest([{'pos': i, 'gram': array_to_string(tk[i+1:i+$k], ' ')}
                for i in range(0, len(tk) - $k + 1)]) AS u
      FROM toks WHERE len(tk) >= $k),
    g AS (SELECT doc_id, u.pos AS pos, u.gram AS gram FROM g0),
    d AS (
      SELECT doc_id, pos FROM (
        SELECT doc_id, pos,
          row_number() OVER (PARTITION BY gram ORDER BY doc_id, pos) AS rn
        FROM g) WHERE rn > 1),
    cov AS (
      SELECT DISTINCT doc_id, unnest([pos + j for j in range(0, $k)]) AS cpos
      FROM d),
    ts0 AS (
      SELECT doc_id,
        unnest([{'p': i, 'w': tk[i+1]} for i in range(0, len(tk))]) AS u
      FROM toks),
    ts AS (SELECT doc_id, u.p AS p, u.w AS w FROM ts0),
    kept AS (
      SELECT ts.doc_id, ts.p, ts.w FROM ts
      LEFT JOIN cov ON ts.doc_id = cov.doc_id AND ts.p = cov.cpos
      WHERE cov.doc_id IS NULL),
    agg AS (
      SELECT doc_id, array_to_string(list(w ORDER BY p), ' ') AS text_dedup,
        count(*) AS n_kept
      FROM kept GROUP BY 1)
    SELECT t.doc_id,
      coalesce(a.text_dedup, '') AS text_dedup,
      CAST(len(t.tk) AS BIGINT) AS n_tokens,
      CAST(len(t.tk) - coalesce(a.n_kept, 0) AS BIGINT) AS n_removed
    FROM toks t LEFT JOIN agg a USING (doc_id)
    ORDER BY t.doc_id"""
  }

  /** BPE tokenizer training over the documents table —
    * [[graft.operators.Bpe.train]], 8 merges, on words restricted to
    * `^[a-z0-9]+$` (the restriction keeps the ORACLE sound: DuckDB
    * replays each merge with `replace()` over double-space-separated
    * symbol strings, which is exactly leftmost-greedy non-overlapping
    * — legal only when no symbol can contain the separator). Gate 1
    * is the learned merge table itself; [[bpeEncode]] gates the
    * resulting vocab symbolization. */
  def bpeMerges(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    val (rules, _) = graft.operators.Bpe.train(
      graft.operators.Bpe.wordCounts(docs, "text", "^[a-z0-9]+$"),
      merges = 8)
    graft.operators.Bpe.rulesDf(spark, rules).orderBy("rank")
  }

  /** The trained vocab's final symbolization (top 200 words by count):
    * what [[graft.operators.Bpe.train]]'s vocab output — and therefore
    * any corpus encode that joins against it — actually produces. */
  def bpeEncode(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    val (_, vocab) = graft.operators.Bpe.train(
      graft.operators.Bpe.wordCounts(docs, "text", "^[a-z0-9]+$"),
      merges = 8)
    vocab.select(col("word"), col("cnt"),
        size(col("syms")).cast("long").as("n_subwords"),
        concat_ws("|", col("syms")).as("subwords"))
      .orderBy(desc("cnt"), asc("word")).limit(200)
  }

  /** Shared CTE chain replaying 8 BPE merge iterations in DuckDB:
    * level i = weighted pair counts over the level-(i−1) symbolization
    * → deterministic best pair (count DESC, then lexicographic) →
    * vocab rewrite via `replace(' l  r ', ' lr ')` on words rendered as
    * `' ' || join(syms, '  ') || ' '` — single-space sentinels,
    * double-space joints, so consecutive matches share a boundary space
    * and `replace`'s left-to-right non-overlapping scan reproduces the
    * merge fold exactly (validated against a driver BPE reference). */
  private def bpeCtes(m: Int): String = {
    val head = s"""w0 AS (
      SELECT tok AS word, count(*) AS cnt
      FROM (SELECT unnest(${TextFunctions.tokensSql("text")}) AS tok
            FROM documents)
      WHERE regexp_matches(tok, '^[a-z0-9]+$$') GROUP BY 1),
    t0 AS (
      SELECT word, cnt,
        ' ' || array_to_string([word[i:i] for i in range(1, len(word)+1)],
                               '  ') || ' ' AS s
      FROM w0)"""
    val levels = (1 to m).map { i =>
      val p = i - 1
      s"""pc$i AS (
      SELECT u.l AS l, u.r AS r, sum(cnt) AS c FROM (
        SELECT cnt,
          unnest([{'l': tk[j], 'r': tk[j+1]} for j in range(1, len(tk))]) AS u
        FROM (SELECT cnt, list_filter(string_split(s, ' '), x -> x <> '') AS tk
              FROM t$p))
      GROUP BY 1, 2),
    b$i AS (SELECT l, r, c FROM pc$i ORDER BY c DESC, l, r LIMIT 1),
    t$i AS (
      SELECT word, cnt,
        replace(s, ' '||b.l||'  '||b.r||' ', ' '||b.l||b.r||' ') AS s
      FROM t$p, b$i b)"""
    }
    (head +: levels).mkString(",\n    ")
  }

  val bpeMergesSql: String = {
    val m = 8
    val union = (1 to m).map(i =>
      s"""SELECT $i AS rank, l AS "left", r AS "right",
          CAST(c AS BIGINT) AS pair_count FROM b$i""").mkString(" UNION ALL ")
    s"""WITH ${bpeCtes(m)}
    SELECT * FROM ($union) ORDER BY rank"""
  }

  val bpeEncodeSql: String = {
    val m = 8
    s"""WITH ${bpeCtes(m)}
    SELECT word, cnt, CAST(len(tk) AS BIGINT) AS n_subwords,
      array_to_string(tk, '|') AS subwords
    FROM (SELECT word, cnt,
            list_filter(string_split(s, ' '), x -> x <> '') AS tk
          FROM t$m)
    ORDER BY cnt DESC, word LIMIT 200"""
  }

  /** Bench-only 256-merge soak ([[graft.operators.Bpe.train]]'s
    * driver-side fast path): per-merge cost must stay sub-linear in the
    * dictionary — the collected-dictionary trainer touches only each
    * merged pair's supporting words, so 32× the gate's 8 merges should
    * cost nowhere near 32× (the corpus scan + collect dominates).
    * Returns the rule table; no oracle (the 8-merge gates pin
    * correctness, and the 256-CTE DuckDB replay would dwarf the run). */
  def opBpeTrain256(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    val (rules, _) = graft.operators.Bpe.train(
      graft.operators.Bpe.wordCounts(docs, "text", "^[a-z0-9]+$"),
      merges = 256)
    graft.operators.Bpe.rulesDf(spark, rules).orderBy("rank")
  }

  /** Per-document TRUE tokenizer token counts — the trained-BPE upgrade
    * of `text_tokens`' whitespace/4-char estimates: train 8 merges on
    * the corpus ([[bpeMerges]]'s setup), then charge each document the
    * subword count of its trained words (corpus words outside the
    * trained `^[a-z0-9]+$` set fall back to 1 subword per word — the
    * byte-fallback convention, stated in the oracle identically).
    * Encoding joins the corpus WORD STREAM against the vocab-scale
    * symbolization (broadcast — the vocab is tiny next to the corpus),
    * so the corpus is never re-encoded per occurrence. */
  def bpeTokens(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    val (_, vocab) = graft.operators.Bpe.train(
      graft.operators.Bpe.wordCounts(docs, "text", "^[a-z0-9]+$"),
      merges = 8)
    val enc = vocab.select(col("word"),
      size(col("syms")).cast("long").as("n_sub"))
    docs.select(col("doc_id"),
        explode_outer(TextFunctions.tokens(col("text"))).as("word"))
      .join(broadcast(enc), Seq("word"), "left")
      .groupBy("doc_id").agg(
        count(col("word")).as("n_words"),
        // null word = the explode_outer placeholder of an empty doc —
        // it must contribute 0, not the unknown-word fallback of 1
        coalesce(sum(when(col("word").isNotNull,
            coalesce(col("n_sub"), lit(1L))).otherwise(lit(0L))), lit(0L))
          .as("n_bpe_tokens"))
      .orderBy("doc_id")
  }

  val bpeTokensSql: String = {
    val m = 8
    s"""WITH ${bpeCtes(m)},
    enc AS (
      SELECT word, CAST(len(list_filter(string_split(s, ' '),
        x -> x <> '')) AS BIGINT) AS n_sub
      FROM t$m),
    stream AS (
      SELECT doc_id, unnest(
        CASE WHEN len(tok) = 0 THEN [NULL] ELSE tok END) AS word
      FROM (SELECT doc_id, ${TextFunctions.tokensSql("text")} AS tok
            FROM documents))
    SELECT s.doc_id,
      count(s.word) AS n_words,
      CAST(coalesce(sum(CASE WHEN s.word IS NULL THEN 0
                        ELSE coalesce(e.n_sub, 1) END), 0)
           AS BIGINT) AS n_bpe_tokens
    FROM stream s LEFT JOIN enc e ON s.word = e.word
    GROUP BY s.doc_id ORDER BY s.doc_id"""
  }

  def dedupSegments(spark: SparkSession, dir: String): DataFrame = {
    val seg = 10
    val toksC = TextFunctions.tokens(col("text"))
    val docs = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), when(size(toksC) > 0, transform(
          sequence(lit(0),
            ceil(size(toksC) / lit(seg.toDouble)).cast("int") - 1),
          c => concat_ws(" ", slice(toksC, c * seg + 1, lit(seg)))))
        .otherwise(array().cast("array<string>")).as("segs"))
    graft.operators.Dedup.segmentDedup(docs, "doc_id", "segs",
        minDocs = 2L)
      .orderBy("doc_id")
  }

  val dedupSegmentsSql: String = s"""
    WITH base AS (
      SELECT doc_id, ${TextFunctions.tokensSql("text")} AS l
      FROM documents),
    poss AS (
      SELECT doc_id, l,
        unnest(range(0, CAST(ceil(len(l) / 10.0) AS BIGINT))) AS pos
      FROM base WHERE len(l) > 0),
    segs AS (
      SELECT doc_id, pos,
        array_to_string(l[(pos * 10 + 1):(pos * 10 + 10)], ' ') AS seg
      FROM poss),
    dup AS (
      SELECT seg FROM (SELECT DISTINCT seg, doc_id FROM segs)
      GROUP BY seg HAVING count(*) >= 2),
    kept AS (
      SELECT * FROM segs WHERE seg NOT IN (SELECT seg FROM dup))
    SELECT b.doc_id,
      coalesce(string_agg(k.seg, ' ' ORDER BY k.pos), '') AS text_dedup
    FROM base b LEFT JOIN kept k USING (doc_id)
    GROUP BY b.doc_id ORDER BY b.doc_id"""

  /** Mutable per-JVM state backing [[opBm25Incremental]] — the
    * memoized-bootstrap pattern of `SimQueries.opDedupIncremental`. */
  private[queries] final class IncIdxState(
      val postings: graft.sinks.GraftTable,
      val dlens: graft.sinks.GraftTable,
      val stats: graft.sinks.GraftTable) {
    private val seq = new java.util.concurrent.atomic.AtomicLong(1L)
    def next(): (Long, Boolean) = {
      val s = seq.incrementAndGet()
      (s, s % 2 == 0)
    }
  }
  private[queries] val incIdxState =
    new java.util.concurrent.ConcurrentHashMap[String, IncIdxState]()

  /** Bench-only steady-state search-index delta: one real A/B-toggled
    * update sync + one bucket-pruned query wave against a memoized
    * prebuilt index (bootstrap excluded by the Bench pre-pass) —
    * attributes the `bm25_incremental` gate's cost to the per-delta
    * sync + serve path a production index pays per commit. */
  def opBm25Incremental(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.IncrementalIndex
    val docs = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), TextFunctions.tokens(col("text")).as("toks"))
    val st = incIdxState.computeIfAbsent(dir, _ => {
      val root = java.nio.file.Files
        .createTempDirectory("graft-incindex-op").toString
      val postings = IncrementalIndex.postingsTable(s"$root/postings", 8)
      val dlens = IncrementalIndex.docTable(s"$root/docs", 4)
      val stats = IncrementalIndex.statsTable(s"$root/stats")
      IncrementalIndex.applyDelta(spark, postings, dlens, stats,
        docs.withColumn("_change_type", lit("insert")),
        "doc_id", "toks", f"${1L}%016x/0")
      new IncIdxState(postings, dlens, stats)
    })
    val (seqNo, toAppended) = st.next()
    val updCond = col("doc_id") % 89 === 0
    val appended = concat(col("toks"), array(lit("qq"), lit("zz")))
    val (preT, postT) =
      if (toAppended) (col("toks"), appended) else (appended, col("toks"))
    val changes = docs.filter(updCond)
      .withColumn("toks", preT)
      .withColumn("_change_type", lit("update_preimage"))
      .unionByName(docs.filter(updCond)
        .withColumn("toks", postT)
        .withColumn("_change_type", lit("update_postimage")))
    IncrementalIndex.applyDelta(spark, st.postings, st.dlens, st.stats,
      changes, "doc_id", "toks", f"$seqNo%016x/0")
    val queries = docs.filter(col("doc_id").isin(1L, 2L, 3L))
      .select(col("doc_id").as("q_id"), col("toks").as("q_toks"))
    IncrementalIndex.bm25TopK(spark, st.postings, st.dlens, st.stats,
        queries, "q_id", "q_toks", k = 10)
      .agg(count(lit(1)).as("n_results"))
  }
}
