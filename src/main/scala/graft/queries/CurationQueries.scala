package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions
import graft.operators.{Chunk, Mix, Shard}

/** Corpus-curation queries: domain mixing and PII redaction — two
  * standard passes of a pre-training data pipeline, both exact-gated. */
object CurationQueries {

  /** Per-source document caps — the Common-Crawl-style curation pass
    * that stops any one domain from dominating the corpus: keep at most
    * K documents per source, preferring longer documents (token count,
    * doc-id tiebreak). One shuffle on `source` + an in-partition rank;
    * at 100 TB a pathologically hot source serializes into one task, so
    * a production run would first prefilter with a per-source
    * approximate length threshold (the [[Mix.stratifiedExact]]
    * oversample trick) to bound window input — at the tested scales the
    * plain window is the right plan. Exact integers → hash-gated. */
  def capPerSource(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("source"),
        TextFunctions.tokenCount(col("text")).cast("long").as("ntok"))
    val w = Window.partitionBy("source")
      .orderBy(col("ntok").desc, col("doc_id"))
    docs.withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= 20)
      .select("source", "rank", "doc_id", "ntok")
      .orderBy("source", "rank")
  }

  val capPerSourceSql: String = s"""
    WITH d AS (
      SELECT doc_id, source,
        CAST(len(${TextFunctions.tokensSql("text")}) AS BIGINT) AS ntok
      FROM documents),
    r AS (
      SELECT source,
        CAST(row_number() OVER (PARTITION BY source
          ORDER BY ntok DESC, doc_id) AS INT) AS rank,
        doc_id, ntok
      FROM d)
    SELECT source, rank, doc_id, ntok FROM r
    WHERE rank <= 20 ORDER BY source, rank"""

  /** Weight rule shared by Spark and oracle: parse the numeric suffix
    * of `srcN` and map to 1..5 — a deterministic non-uniform target mix
    * over the synthetic sources. */
  private def weightOf(domain: org.apache.spark.sql.Column) =
    substring(domain, 4, 10).cast("int") % 5 + 1
  private val weightSql = "(CAST(substr(source, 4) AS INT) % 5) + 1"

  /** Rate-based domain mixing targeting ~200 sampled docs with source
    * shares ∝ weight. The kept set is a pure function of (doc_id,
    * per-domain threshold), so DuckDB recomputes the exact same sample
    * row-for-row — no randomness, no approximation gate needed. */
  def mixDomains(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("source"))
    Mix.sampleByDomain(docs, "source", "doc_id", weightOf, total = 200L)
      .orderBy("doc_id")
  }

  val mixDomainsSql: String = s"""
    WITH c AS (
      SELECT source, count(*) AS n, $weightSql AS w
      FROM documents GROUP BY source),
    t AS (
      SELECT source,
        CAST(floor(least(1.0,
          CAST(200 * w AS DOUBLE) /
          CAST((SELECT sum(w) FROM c) * n AS DOUBLE)) * 4294967296.0)
          AS BIGINT) AS thr
      FROM c)
    SELECT d.doc_id, d.source
    FROM documents d JOIN t ON d.source = t.source
    WHERE ${Mix.hashOrdSql("d.doc_id")} < t.thr
    ORDER BY d.doc_id"""

  /** INCREMENTAL corpus profile ([[graft.operators.IncrementalStats]]):
    * the per-source (docs, tokens) materialized aggregate maintained
    * O(delta) from the row CDF — bootstrap insert, then the standard
    * mixed delta (%97 clones insert, %89 survivors gain tokens, %61
    * delete) — hash-compared against DuckDB recomputing the aggregate
    * from scratch over the post-delta corpus. The subtractable-
    * aggregate maintenance class: the sync probes ONLY the touched
    * keys' buckets, never rescans the corpus. */
  def corpusStatsIncremental(spark: SparkSession, dir: String)
      : DataFrame = {
    import graft.operators.IncrementalStats
    val docs = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("source"), col("text"))
    val ntok = size(TextFunctions.tokens(col("text"))).cast("long")
    val stats = IncrementalStats.statsTable(java.nio.file.Files
      .createTempDirectory("graft-incstats").toString, 4)
    def seq(v: Long) = f"$v%016x/0"
    IncrementalStats.applyDelta(spark, stats,
      docs.withColumn("_v", ntok)
        .withColumn("_change_type", lit("insert")),
      "source", "_v", seq(1))
    val delCond = col("doc_id") % 61 === 0
    val updCond = col("doc_id") % 89 === 0 && !delCond
    val updated = concat(col("text"), lit(" qq zz extra"))
    val changes = docs.filter(col("doc_id") % 97 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("source"),
        col("text"))
      .withColumn("_change_type", lit("insert"))
      .unionByName(docs.filter(delCond)
        .withColumn("_change_type", lit("delete")))
      .unionByName(docs.filter(updCond)
        .withColumn("_change_type", lit("update_preimage")))
      .unionByName(docs.filter(updCond)
        .withColumn("text", updated)
        .withColumn("_change_type", lit("update_postimage")))
    IncrementalStats.applyDelta(spark, stats,
      changes.withColumn("_v", ntok), "source", "_v", seq(2))
    IncrementalStats.read(spark, stats)
      .withColumn("mean_tokens",
        round(col("n_tokens").cast("double") / col("n_docs"), 6))
      .orderBy("key")
  }

  val corpusStatsIncrementalSql: String = s"""
    WITH corpus AS (
      SELECT doc_id, source,
        CASE WHEN doc_id % 89 = 0 THEN text || ' qq zz extra'
             ELSE text END AS text
      FROM documents WHERE doc_id % 61 <> 0
      UNION ALL
      SELECT doc_id + 1000000, source, text FROM documents
      WHERE doc_id % 97 = 0)
    SELECT source AS key, count(*) AS n_docs,
      CAST(sum(len(${TextFunctions.tokensSql("text")})) AS BIGINT)
        AS n_tokens,
      round(CAST(sum(len(${TextFunctions.tokensSql("text")})) AS DOUBLE)
        / count(*), 6) AS mean_tokens
    FROM corpus GROUP BY source ORDER BY key"""

  /** Temperature mixing over the (skewed) language column: weights =
    * count^0.5 flatten `en`'s dominance toward the tail languages —
    * [[graft.operators.Mix.sampleByTemperature]], τ = 0.5,
    * total = 150. The whole kept set is hash-gated: DuckDB recomputes
    * the observed counts, the pow-derived thresholds, and every row's
    * Knuth-hash fate. */
  def mixTemperature(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("lang"))
    Mix.sampleByTemperature(docs, "lang", "doc_id", tau = 0.5,
        total = 150L)
      .orderBy("doc_id")
  }

  val mixTemperatureSql: String = s"""
    WITH c AS (
      SELECT lang, count(*) AS n,
        pow(CAST(count(*) AS DOUBLE), 0.5) AS w
      FROM documents GROUP BY lang),
    t AS (
      SELECT lang,
        CAST(floor(least(1.0,
          CAST(150 AS DOUBLE) * w /
          ((SELECT sum(w) FROM c) * CAST(n AS DOUBLE))) * 4294967296.0)
          AS BIGINT) AS thr
      FROM c)
    SELECT d.doc_id, d.lang
    FROM documents d JOIN t ON d.lang = t.lang
    WHERE ${Mix.hashOrdSql("d.doc_id")} < t.thr
    ORDER BY d.doc_id"""

  /** Exact-count stratified sample: 20 docs per source, smallest
    * Knuth-hash first. The kept set is a pure function of (doc_id,
    * per-source counts), so DuckDB recomputes the identical sample —
    * including the two-phase prefilter, which is part of the operator's
    * definition, not an approximation. */
  def sampleStratified(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("source"))
    Mix.stratifiedExact(docs, "source", "doc_id", n = 20, oversample = 8.0)
      .orderBy("doc_id")
  }

  val sampleStratifiedSql: String = s"""
    WITH c AS (
      SELECT source, count(*) AS n FROM documents GROUP BY source),
    t AS (
      SELECT source,
        CAST(floor(least(1.0, 160.0 / CAST(n AS DOUBLE)) * 4294967296.0)
          AS BIGINT) AS thr
      FROM c),
    p AS (
      SELECT d.doc_id, d.source,
        ${Mix.hashOrdSql("d.doc_id")} AS h
      FROM documents d JOIN t ON d.source = t.source
      WHERE ${Mix.hashOrdSql("d.doc_id")} < t.thr),
    r AS (
      SELECT doc_id, source,
        row_number() OVER (PARTITION BY source ORDER BY h, doc_id) AS rn
      FROM p)
    SELECT doc_id, source FROM r WHERE rn <= 20 ORDER BY doc_id"""

  /** PII redaction over text that provably CONTAINS PII: the corpus is
    * synthetic word soup with no emails/IPs/phones, so both engines
    * append the same deterministic doc_id-derived contact block to each
    * document and the gate checks the redaction chain scrubs it (and
    * nothing else) identically. */
  def textRedact(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    val synth = concat(
      substring(col("text"), 1, 40),
      lit(" contact u"), col("doc_id").cast("string"),
      lit("@ex"), (col("doc_id") % 7).cast("string"), lit(".com ip "),
      (col("doc_id") % 256).cast("string"), lit("."),
      (col("doc_id") * 7 % 256).cast("string"), lit("."),
      (col("doc_id") * 13 % 256).cast("string"), lit("."),
      (col("doc_id") % 100).cast("string"),
      lit(" tel +1-555-"), lpad((col("doc_id") % 10000).cast("string"),
        4, "0"), lit(" end"))
    docs.select(col("doc_id"), col("source"),
      TextFunctions.redactPii(synth).as("redacted"))
  }

  val textRedactSql: String = {
    val synth = """substr(text, 1, 40) || ' contact u' || doc_id ||
      '@ex' || (doc_id % 7) || '.com ip ' ||
      (doc_id % 256) || '.' || (doc_id * 7 % 256) || '.' ||
      (doc_id * 13 % 256) || '.' || (doc_id % 100) ||
      ' tel +1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ||
      ' end'"""
    s"""SELECT doc_id, source,
      ${TextFunctions.redactPiiSql(s"($synth)")} AS redacted
    FROM documents"""
  }

  /** RAG chunking: overlapping 32-token windows advancing by 24 —
    * typical retrieval segmentation (window > stride → ~33% overlap).
    * Exact text output, hash-gated against DuckDB replaying the same
    * slice arithmetic. */
  def chunkDocs(spark: SparkSession, dir: String): DataFrame =
    Chunk.tokenWindows(Tables.load(spark, dir, "documents"),
        "doc_id", "text", window = 32, stride = 24)
      .orderBy("doc_id", "chunk_id")

  val chunkDocsSql: String =
    Chunk.tokenWindowsSql("documents", "doc_id", "text",
      window = 32, stride = 24) + "\n    ORDER BY doc_id, chunk_id"

  /** Fractional-epoch mixing: sources repeat 0.5/1.0/1.7/2.25 epochs by
    * source-number class — floor(f) guaranteed repeats plus one more for
    * the deterministic hash-fraction of rows. Pure map + explode (zero
    * shuffles); the oracle replays the identical IEEE-double threshold
    * arithmetic, so the expanded corpus is hash-gated row-for-row. */
  def mixEpochs(spark: SparkSession, dir: String): DataFrame = {
    val factor = (d: org.apache.spark.sql.Column) =>
      element_at(array(lit(0.5), lit(1.0), lit(1.7), lit(2.25)),
        (substring(d, 4, 10).cast("int") % 4 + 1).cast("int"))
    Mix.epochs(
        Tables.load(spark, dir, "documents").select("doc_id", "source"),
        "source", "doc_id", factor)
      .orderBy("doc_id", "epoch")
  }

  val mixEpochsSql: String = s"""
    WITH f AS (
      SELECT doc_id, source,
        CASE CAST(substr(source, 4) AS INT) % 4
          WHEN 0 THEN 0.5 WHEN 1 THEN 1.0 WHEN 2 THEN 1.7
          ELSE 2.25 END AS f
      FROM documents),
    r AS (
      SELECT doc_id, source,
        CAST(floor(f) AS BIGINT) +
        CASE WHEN ${Mix.hashOrdSql("doc_id")} <
          CAST(floor((f - floor(f)) * 4294967296.0) AS BIGINT)
          THEN 1 ELSE 0 END AS reps
      FROM f)
    SELECT doc_id, source, CAST(unnest(range(0, reps)) AS INT) AS epoch
    FROM r WHERE reps > 0 ORDER BY doc_id, epoch"""

  /** Per-source corpus statistics: exact token-length quantiles (linear
    * interpolation, identical definition in Spark `percentile` and
    * DuckDB `quantile_cont`), min/max/mean, doc counts. The exact
    * percentile sorts each group in the aggregate buffer — right at
    * report scale; a 100 TB profile run would swap in
    * `approx_percentile` (t-digest, mergeable partials) and gate with a
    * rank tolerance instead of a hash. */
  def corpusStats(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
      .select(col("source"),
        TextFunctions.tokenCount(col("text")).cast("long").as("ntok"))
    docs.groupBy("source").agg(
        count(lit(1)).as("n_docs"),
        min(col("ntok")).as("min_tok"),
        max(col("ntok")).as("max_tok"),
        round(avg(col("ntok")), 6).as("avg_tok"),
        expr("percentile(ntok, array(0.25D, 0.5D, 0.75D))").as("_q"))
      .select(col("source"), col("n_docs"), col("min_tok"), col("max_tok"),
        col("avg_tok"),
        round(element_at(col("_q"), 1), 6).as("p25"),
        round(element_at(col("_q"), 2), 6).as("p50"),
        round(element_at(col("_q"), 3), 6).as("p75"))
      .orderBy("source")
  }

  val corpusStatsSql: String = s"""
    WITH d AS (
      SELECT source,
        CAST(len(${TextFunctions.tokensSql("text")}) AS BIGINT) AS ntok
      FROM documents)
    SELECT source,
      count(*) AS n_docs,
      min(ntok) AS min_tok,
      max(ntok) AS max_tok,
      round(avg(ntok), 6) AS avg_tok,
      round(quantile_cont(ntok, 0.25), 6) AS p25,
      round(quantile_cont(ntok, 0.5), 6) AS p50,
      round(quantile_cont(ntok, 0.75), 6) AS p75
    FROM d GROUP BY source ORDER BY source"""

  /** Deterministic training shuffle: every event keyed by
    * SplitMix64(id ^ seed), sharded by the key's low 5 bits, densely
    * position-numbered per shard. The oracle recomputes the identical
    * mixer through HUGEINT mod-2^64 arithmetic, so the full permutation
    * is hash-gated row-for-row — the property a resumable training run
    * depends on. */
  def shuffleShard(spark: SparkSession, dir: String): DataFrame =
    Shard.deterministic(
        Tables.load(spark, dir, "events").select(col("event_id")),
        "event_id", seed = 2026L, shards = 32)
      .orderBy("shard", "pos")

  val shuffleShardSql: String = s"""
    WITH ${Shard.sortKeySql("events", "event_id", 2026L)}
    SELECT event_id, sort_key,
      CAST(sort_key & 31 AS INT) AS shard,
      CAST(row_number() OVER (
        PARTITION BY (sort_key & 31) ORDER BY sort_key, event_id) - 1
        AS BIGINT) AS pos
    FROM _sk
    ORDER BY shard, pos"""

  private val splitWeights =
    Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)

  /** Deterministic 80/10/10 train/val/test split over the documents
    * table — [[graft.operators.Mix.splitAssign]]; the full assignment is
    * hash-gated (the oracle replays the SplitMix64 mixer bit-exactly and
    * compares every row's fate, not just the realized counts). */
  def splitAssign(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Mix.splitAssign(
        Tables.load(spark, dir, "documents").select("doc_id", "source"),
        "doc_id", seed = 814L, splitWeights)
      .orderBy("doc_id")

  val splitAssignSql: String = {
    val thrs = graft.operators.Mix.splitThresholds(splitWeights)
    val cases = splitWeights.zip(thrs).map { case ((name, _), t) =>
      s"WHEN u32 < $t THEN '$name'"
    }.mkString(" ")
    s"""
    WITH docs AS (SELECT doc_id, source FROM documents),
    ${Shard.sortKeySql("docs", "doc_id", 814L)},
    u AS (
      SELECT doc_id, source, CAST(
        ((CASE WHEN sort_key < 0
           THEN CAST(sort_key AS HUGEINT)
                + CAST('18446744073709551616' AS HUGEINT)
           ELSE CAST(sort_key AS HUGEINT) END) // 4294967296)
        AS BIGINT) AS u32
      FROM _sk)
    SELECT doc_id, source, CASE $cases END AS split
    FROM u ORDER BY doc_id"""
  }

  /** Quality-classifier scoring ([[graft.operators.Classifier]]) under
    * FIXED weights — the `cluster_assign` pattern: training is
    * spec-validated (planted separation, bit-exact partitioning
    * determinism), while the gate pins the SCORING path hash-exactly
    * under a weight vector both engines can derive: `w_b =
    * floorMod(splitmix64(b), 2001) − 1000` micro-nats, bias 0.1. The
    * margin is an exact integer gram-dot (same kernel the 100 TB sweep
    * uses), so only the final sigmoid touches floats, rounded to 6 dp. */
  def qualityClassify(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.Classifier
    val w = Array.tabulate(1024)(b => Math.floorMod(
      graft.functions.SplitMix64.compute(b.toLong), 2001L) - 1000L)
    val model = Classifier.Model(w, biasMicros = 100000L,
      Classifier.Config(buckets = 1024))
    Classifier.classify(
        Tables.load(spark, dir, "documents").select("doc_id", "text"),
        "text", model)
      .select("doc_id", "margin_micros", "score", "keep")
      .orderBy("doc_id")
  }

  val qualityClassifySql: String = {
    val M = "CAST('18446744073709551616' AS HUGEINT)"
    s"""
    WITH bs AS (SELECT unnest(range(0, 1024)) AS b),
    ${Shard.sortKeySql("bs", "b", 0L)},
    w AS (
      SELECT b, ((sort_key % 2001) + 2001) % 2001 - 1000 AS wm
      FROM _sk),
    toks AS (
      SELECT doc_id,
        list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')
          AS tk
      FROM documents),
    g AS (
      SELECT doc_id, unnest([array_to_string(tk[i:i+1], ' ')
                             for i in range(1, len(tk))]) AS gram
      FROM toks WHERE len(tk) >= 2),
    gb AS (
      SELECT doc_id, CAST(list_reduce(list_prepend(CAST(0 AS HUGEINT),
        list_transform(${TextFunctions.utf8BytesSql("gram")},
          b -> CAST(b AS HUGEINT))),
        (a, b) -> (a * 31 + b) % $M) % 1024 AS BIGINT) AS b
      FROM g),
    db AS (SELECT doc_id, b, count(*) AS cnt FROM gb GROUP BY 1, 2),
    m AS (
      SELECT d.doc_id,
        CAST(coalesce(sum(db.cnt * w.wm), 0) + 100000 AS BIGINT) AS mm
      FROM documents d
      LEFT JOIN db ON d.doc_id = db.doc_id
      LEFT JOIN w ON db.b = w.b
      GROUP BY d.doc_id)
    SELECT doc_id, mm AS margin_micros,
      round(1.0 / (1.0 + exp(-(mm / 1000000.0))), 6) AS score,
      mm >= 0 AS keep
    FROM m ORDER BY doc_id"""
  }

  /** The SELECTION pipeline composed — quality-gate then
    * importance-resample, the two-stage recipe production corpora use
    * (filter the junk cheaply, then spend the token budget on
    * target-domain-like survivors): [[qualityClassify]]'s fixed-weight
    * keep gate feeds [[graft.operators.Select]]'s DSIR fit + Gumbel
    * top-100. One hash-gated query: distribution fitting sees only
    * kept documents, so the oracle must reproduce the classifier's
    * keep set AND the refit ratios AND the resample to agree. */
  def selectPipeline(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.{Classifier, Select}
    val w = Array.tabulate(1024)(b => Math.floorMod(
      graft.functions.SplitMix64.compute(b.toLong), 2001L) - 1000L)
    val model = Classifier.Model(w, biasMicros = 100000L,
      Classifier.Config(buckets = 1024))
    val docs = Tables.load(spark, dir, "documents")
      .select("doc_id", "text", "source")
    val kept = Classifier.classify(docs, "text", model)
      .filter(col("keep")).select("doc_id", "text", "source")
    val raw = kept.filter(col("source") =!= "src0").select("doc_id", "text")
    val tgt = kept.filter(col("source") === "src0").select("text")
    Select.dsir(raw, tgt, "doc_id", "text", k = 100, seed = 1357L)
      .orderBy(desc("skey"), col("doc_id"))
      .select(col("doc_id"), col("logw"), round(col("skey"), 6).as("skey"))
  }

  val selectPipelineSql: String = {
    val M = "CAST('18446744073709551616' AS HUGEINT)"
    def bucket(b: Int) = "CAST(list_reduce(list_prepend(CAST(0 AS " +
      s"HUGEINT), list_transform(${TextFunctions.utf8BytesSql("gram")}, " +
      "b -> CAST(b AS HUGEINT))), " +
      s"(a, b) -> (a * 31 + b) % $M) % $b AS BIGINT)"
    def grams(toks: String) =
      s"unnest([array_to_string($toks[i:i+1], ' ') " +
        s"for i in range(1, len($toks))])"
    s"""
    WITH bs AS (SELECT unnest(range(0, 1024)) AS b),
    ${Shard.sortKeySql("bs", "b", 0L, "qw_")},
    w AS (
      SELECT b, ((sort_key % 2001) + 2001) % 2001 - 1000 AS wm
      FROM qw_sk),
    toks AS (
      SELECT doc_id, source,
        list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')
          AS tk
      FROM documents),
    qg AS (SELECT doc_id, ${grams("tk")} AS gram FROM toks
           WHERE len(tk) >= 2),
    qgb AS (SELECT doc_id, ${bucket(1024)} AS b FROM qg),
    qdb AS (SELECT doc_id, b, count(*) AS cnt FROM qgb GROUP BY 1, 2),
    qm AS (
      SELECT t.doc_id,
        CAST(coalesce(sum(qdb.cnt * w.wm), 0) + 100000 AS BIGINT) AS mm
      FROM toks t
      LEFT JOIN qdb ON t.doc_id = qdb.doc_id
      LEFT JOIN w ON qdb.b = w.b
      GROUP BY t.doc_id),
    kept AS (
      SELECT t.doc_id, t.source, t.tk
      FROM toks t JOIN qm ON t.doc_id = qm.doc_id
      WHERE qm.mm >= 0),
    raw AS (SELECT doc_id, tk FROM kept WHERE source <> 'src0'),
    rg AS (SELECT doc_id, ${grams("tk")} AS gram FROM raw
           WHERE len(tk) >= 2),
    tg AS (SELECT ${grams("tk")} AS gram FROM kept
           WHERE source = 'src0' AND len(tk) >= 2),
    rb AS (SELECT doc_id, CAST(${bucket(4096)} AS INT) AS b FROM rg),
    tb AS (SELECT CAST(${bucket(4096)} AS INT) AS b FROM tg),
    qc AS (SELECT b, count(*) AS c FROM rb GROUP BY b),
    pc AS (SELECT b, count(*) AS c FROM tb GROUP BY b),
    qtot AS (SELECT CAST(sum(c) AS DOUBLE) AS q FROM qc),
    ptot AS (SELECT CAST(coalesce(sum(c), 0) AS DOUBLE) AS p FROM pc),
    lr AS (
      SELECT qc.b,
        CAST(floor((ln((coalesce(pc.c, 0) + 1.0) / (ptot.p + 4096.0)) -
                    ln((qc.c + 1.0) / (qtot.q + 4096.0))) * 1000000 + 0.5)
             AS BIGINT) AS lrm
      FROM qc LEFT JOIN pc ON qc.b = pc.b, qtot, ptot),
    db2 AS (SELECT doc_id, b, count(*) AS cnt FROM rb GROUP BY 1, 2),
    dw AS (
      SELECT r.doc_id, coalesce(sum(db2.cnt * lr.lrm), 0) AS lw
      FROM raw r
      LEFT JOIN db2 ON r.doc_id = db2.doc_id
      LEFT JOIN lr ON db2.b = lr.b
      GROUP BY r.doc_id),
    ${Shard.sortKeySql("dw", "doc_id", 1357L, "g_")},
    gk AS (
      SELECT doc_id, lw,
        -ln(-ln((CAST((CASE WHEN sort_key < 0
            THEN CAST(sort_key AS HUGEINT) + $M
            ELSE CAST(sort_key AS HUGEINT) END) // 2048 AS DOUBLE) + 0.5)
          / 9007199254740992.0)) AS gum
      FROM g_sk),
    top AS (
      SELECT doc_id, lw / 1000000.0 AS logw,
        lw / 1000000.0 + gum AS skey_x
      FROM gk ORDER BY skey_x DESC, doc_id LIMIT 100)
    SELECT doc_id, logw, round(skey_x, 6) AS skey
    FROM top ORDER BY skey_x DESC, doc_id"""
  }

  /** DSIR data selection ([[graft.operators.Select]]): target = the
    * `src0` documents, raw = everything else; hashed-bigram importance
    * weights in exact micro-nats; Gumbel top-200 without replacement
    * under seed 2468. The ENTIRE path is hash-gated: the oracle refits
    * both bucket distributions (replaying the polynomial gram hash with
    * the fingerprint gate's HUGEINT fold), rebuilds the integer
    * log-ratio table, re-sums every document's exact integer weight,
    * and replays the SplitMix64-derived Gumbel keys — so feature
    * hashing, smoothing, scoring, and the sampler all have to agree
    * row-for-row. */
  def selectDsir(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    val raw = docs.filter(col("source") =!= "src0")
      .select("doc_id", "text")
    val tgt = docs.filter(col("source") === "src0").select("text")
    graft.operators.Select.dsir(raw, tgt, "doc_id", "text",
        k = 200, seed = 2468L)
      .orderBy(desc("skey"), col("doc_id"))
      .select(col("doc_id"), col("logw"), round(col("skey"), 6).as("skey"))
  }

  val selectDsirSql: String = {
    val M = "CAST('18446744073709551616' AS HUGEINT)"
    def grams(toks: String) = // bigrams with multiplicity
      s"unnest([array_to_string($toks[i:i+1], ' ') " +
        s"for i in range(1, len($toks))])"
    val bucket = "CAST(list_reduce(list_prepend(CAST(0 AS HUGEINT), " +
      s"list_transform(${TextFunctions.utf8BytesSql("gram")}, " +
      "b -> CAST(b AS HUGEINT))), " +
      s"(a, b) -> (a * 31 + b) % $M) % 4096 AS INT)"
    s"""
    WITH raw AS (
      SELECT doc_id, text FROM documents WHERE source <> 'src0'),
    rt AS (
      SELECT doc_id,
        list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')
          AS tk
      FROM raw),
    tt AS (
      SELECT
        list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')
          AS tk
      FROM documents WHERE source = 'src0'),
    rg AS (SELECT doc_id, ${grams("tk")} AS gram FROM rt
           WHERE len(tk) >= 2),
    tg AS (SELECT ${grams("tk")} AS gram FROM tt WHERE len(tk) >= 2),
    rb AS (SELECT doc_id, $bucket AS b FROM rg),
    tb AS (SELECT $bucket AS b FROM tg),
    qc AS (SELECT b, count(*) AS c FROM rb GROUP BY b),
    pc AS (SELECT b, count(*) AS c FROM tb GROUP BY b),
    qt AS (SELECT CAST(sum(c) AS DOUBLE) AS q FROM qc),
    pt AS (SELECT CAST(coalesce(sum(c), 0) AS DOUBLE) AS p FROM pc),
    lr AS (
      SELECT qc.b,
        CAST(floor((ln((coalesce(pc.c, 0) + 1.0) / (pt.p + 4096.0)) -
                    ln((qc.c + 1.0) / (qt.q + 4096.0))) * 1000000 + 0.5)
             AS BIGINT) AS lrm
      FROM qc LEFT JOIN pc ON qc.b = pc.b, qt, pt),
    db AS (SELECT doc_id, b, count(*) AS cnt FROM rb GROUP BY 1, 2),
    dw AS (
      SELECT r.doc_id, coalesce(sum(db.cnt * lr.lrm), 0) AS lw
      FROM raw r
      LEFT JOIN db ON r.doc_id = db.doc_id
      LEFT JOIN lr ON db.b = lr.b
      GROUP BY r.doc_id),
    ${graft.operators.Shard.sortKeySql("dw", "doc_id", 2468L)},
    gk AS (
      SELECT doc_id, lw,
        -ln(-ln((CAST((CASE WHEN sort_key < 0
            THEN CAST(sort_key AS HUGEINT) + $M
            ELSE CAST(sort_key AS HUGEINT) END) // 2048 AS DOUBLE) + 0.5)
          / 9007199254740992.0)) AS gum
      FROM _sk),
    top AS (
      SELECT doc_id, lw / 1000000.0 AS logw,
        lw / 1000000.0 + gum AS skey_x
      FROM gk ORDER BY skey_x DESC, doc_id LIMIT 200)
    SELECT doc_id, logw, round(skey_x, 6) AS skey
    FROM top ORDER BY skey_x DESC, doc_id"""
  }
}
