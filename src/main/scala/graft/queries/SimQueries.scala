package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{Cluster, Dedup, Multimodal, Retrieval, Similarity}

/** Dedup / similarity-search / multimodal queries (SURVEY §7.1.7,
  * BASELINE.json north star). Shingle/Jaccard arithmetic is integer-ratio
  * → bit-exact against the DuckDB oracles; the LSH variants are the
  * 100 TB paths and are verified (a) against the same oracle where recall
  * is provably ~1 on this data, (b) by recall specs against the exact
  * operators. */
object SimQueries {

  // ----------------------------------------------------------------- dedup
  def dedupExact(spark: SparkSession, dir: String): DataFrame =
    Dedup.exact(Tables.load(spark, dir, "documents"), "text", "doc_id")
      .select("rep_id", "n_dups", "content_key")
      .orderBy("rep_id")

  val dedupExactSql: String = """
    SELECT min(doc_id) AS rep_id, count(*) AS n_dups,
      lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS content_key
    FROM documents GROUP BY 3 ORDER BY rep_id"""

  /** Shared oracle for the exact inverted-index Jaccard AND the MinHash-LSH
    * variant: the planted near-dups sit at j ≥ 0.89 with the next pair at
    * j ≈ 0.07, and the LSH band curve (16 bands × 2 rows) misses a j=0.89
    * pair with probability (1-j²)⁴⁶ ≈ 3e-12 — so both must return exactly
    * the pairs with j ≥ 0.5. */
  private def jaccardCtesOn(tbl: String): String = s"""toks AS (
      SELECT doc_id,
        list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS tk
      FROM $tbl),
    sh AS (
      SELECT doc_id,
        list_distinct([array_to_string(tk[i:i+2], ' ')
                       for i in range(1, len(tk) - 1)]) AS g
      FROM toks WHERE len(tk) >= 3),
    posting AS (SELECT doc_id, len(g) AS sz, unnest(g) AS gram FROM sh),
    cand AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.sz AS sz_a, b.sz AS sz_b,
             count(*) AS inter
      FROM posting a JOIN posting b ON a.gram = b.gram AND a.doc_id < b.doc_id
      GROUP BY 1, 2, 3, 4)"""

  private val jaccardCtes: String = jaccardCtesOn("documents")

  private val jaccardOracle: String = s"""
    WITH $jaccardCtes
    SELECT id_a, id_b,
      inter * 1.0 / (sz_a + sz_b - inter) AS jaccard
    FROM cand
    WHERE inter * 1.0 / (sz_a + sz_b - inter) >= 0.5
    ORDER BY id_a, id_b"""

  /** Exact 3-gram Jaccard near-dup pairs (inverted-index join). */
  def dedupJaccard(spark: SparkSession, dir: String): DataFrame =
    Dedup.ngramJaccardPairs(Tables.load(spark, dir, "documents"),
      "text", "doc_id", n = 3, threshold = 0.5)
      .orderBy("id_a", "id_b")

  val dedupJaccardSql: String = jaccardOracle

  /** Duplicate CLUSTERS: connected components over the exact Jaccard
    * pair graph (min-label propagation + pointer jumping), every
    * document mapped to its cluster representative (smallest reachable
    * id; singletons map to themselves). Oracle: the same pair CTEs +
    * a recursive transitive closure. */
  def dedupClusters(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    val pairs = Dedup.ngramJaccardPairs(docs, "text", "doc_id",
      n = 3, threshold = 0.5)
    val cc = Dedup.connectedComponents(pairs, "id_a", "id_b")
    docs.select(col("doc_id").as("id"))
      .join(cc, Seq("id"), "left")
      .select(col("id"), coalesce(col("rep"), col("id")).as("rep_id"))
      .orderBy("id")
  }

  /** Hybrid two-stage retrieval — the standard production shape: a
    * cheap lexical pass (BM25 over the inverted index) narrows the
    * corpus to 20 candidates per query, then the expensive dense signal
    * (embedding cosine; testdata aligns doc_id and vec_id on one id
    * domain) re-ranks just those candidates to a final top-5. At
    * 100 TB the first stage touches only probed postings and the second
    * touches 20 vectors per query — no dense scan of the corpus. Both
    * stages rank on 6-dp-rounded scores with doc-id tie-break, so the
    * candidate CUT and the final ranking are engine-reproducible and
    * hash-gated. */
  def hybridSearch(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextFunctions
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), TextFunctions.tokens(col("text")).as("toks"))
    val queries = docs.filter(col("doc_id") < 3)
      .select(col("doc_id").as("q_id"), col("toks").as("q_toks"))
    val cand = Retrieval.bm25TopK(docs, "doc_id", "toks",
      queries, "q_id", "q_toks", k = 20)
    val emb = Tables.load(spark, dir, "embeddings")
    val qv = emb.filter(col("vec_id") < 3)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val w = Window.partitionBy("q_id")
      .orderBy(col("sim").desc, col("doc_id"))
    cand.join(emb.select(col("vec_id").as("doc_id"),
        col("embedding").as("d_vec"),
        Similarity.norm(col("embedding")).as("_dn")), "doc_id")
      .join(broadcast(qv.withColumn("_qn",
        Similarity.norm(col("q_vec")))), "q_id")
      .withColumn("sim",
        round(Similarity.cosinePre(col("q_vec"), col("d_vec"),
          col("_qn"), col("_dn")), 6))
      .withColumn("_r", row_number().over(w))
      .filter(col("_r") <= 5)
      .select(col("q_id"), col("_r").cast("int").as("rank"),
        col("doc_id"), col("sim"), col("score").as("bm25"))
      .orderBy("q_id", "rank")
  }

  val hybridSearchSql: String = s"""
    WITH tok AS (
      SELECT doc_id,
        unnest(${graft.functions.TextFunctions.tokensSql("text")}) AS term
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
    cand AS (
      SELECT * FROM (
        SELECT q_id, doc_id, score,
          row_number() OVER (PARTITION BY q_id
            ORDER BY score DESC, doc_id) AS lrank
        FROM scored) WHERE lrank <= 20),
    sim AS (
      SELECT c.q_id, c.doc_id, c.score,
        round(
          list_reduce(list_prepend(CAST(0 AS DOUBLE),
            list_transform(range(1, len(qe.embedding)+1),
              i -> CAST(qe.embedding[i] AS DOUBLE)
                 * CAST(de.embedding[i] AS DOUBLE))),
            (a,b) -> a+b)
          / (sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list_transform(qe.embedding,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
               (a,b) -> a+b))
           * sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list_transform(de.embedding,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
               (a,b) -> a+b))), 6) AS sim
      FROM cand c
      JOIN embeddings qe ON qe.vec_id = c.q_id
      JOIN embeddings de ON de.vec_id = c.doc_id),
    reranked AS (
      SELECT q_id,
        CAST(row_number() OVER (PARTITION BY q_id
          ORDER BY sim DESC, doc_id) AS INT) AS rank,
        doc_id, sim, score AS bm25
      FROM sim)
    SELECT q_id, rank, doc_id, sim, bm25 FROM reranked
    WHERE rank <= 5 ORDER BY q_id, rank"""

  val dedupClustersSql: String = s"""
    WITH RECURSIVE $jaccardCtes,
    pairs AS (
      SELECT id_a, id_b FROM cand
      WHERE inter * 1.0 / (sz_a + sz_b - inter) >= 0.5),
    edges AS (
      SELECT id_a AS u, id_b AS v FROM pairs
      UNION SELECT id_b, id_a FROM pairs),
    reach(a, b) AS (
      SELECT u, v FROM edges
      UNION
      SELECT r.a, e.v FROM reach r JOIN edges e ON r.b = e.u
      WHERE e.v <> r.a),
    cc AS (SELECT a AS id, least(a, min(b)) AS rep FROM reach GROUP BY a)
    SELECT d.doc_id AS id, coalesce(cc.rep, d.doc_id) AS rep_id
    FROM documents d LEFT JOIN cc ON d.doc_id = cc.id
    ORDER BY id"""

  /** MinHash+LSH near-dup pairs — the sub-quadratic scale path; verified
    * candidates carry their exact Jaccard, so the result set equals the
    * exact operator's (same oracle). */
  def dedupMinhashLsh(spark: SparkSession, dir: String): DataFrame =
    Dedup.minhashLshPairs(Tables.load(spark, dir, "documents"),
      "text", "doc_id", n = 3, numHashes = 32, bands = 16, threshold = 0.5)
      .orderBy("id_a", "id_b")

  /** INCREMENTAL near-dup maintenance e2e: the corpus bootstraps in as
    * one CDC delta, then a MIXED second delta (clone inserts + text-
    * divergence updates + deletes in one batch — the realistic CDC sync
    * shape) is maintained O(delta) through
    * [[graft.operators.IncrementalDedup.applyDelta]] against persistent
    * band/pair GraftTables. The final pair table must equal the exact
    * Jaccard pair set of the final corpus — DuckDB rebuilds that corpus
    * with the same mutation rules and recomputes the pairs from scratch,
    * so the gate pins both the incremental invariant AND LSH recall. */
  def dedupIncremental(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.IncrementalDedup
    val cfg = IncrementalDedup.Config()
    val docs = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
    val root = java.nio.file.Files
      .createTempDirectory("graft-incdedup").toString
    // modest bucket counts: each sync commits O(nBuckets) files per
    // table; a production index sizes this up with the corpus
    val bands = IncrementalDedup.bandTable(s"$root/bands", nBuckets = 8)
    val pairs = IncrementalDedup.pairTable(s"$root/pairs", nBuckets = 4)
    def seq(v: Long) = f"$v%016x/0"

    // delta 1: the corpus bootstraps in
    IncrementalDedup.applyDelta(spark, bands, pairs, docs,
      docs.withColumn("_change_type", lit("insert")),
      "doc_id", "text", seq(1), cfg)
    // delta 2 (mixed): clones of every 97th doc (id + 1e6, original
    // text) insert; every 89th surviving doc diverges (appended
    // tokens); every 61st doc deletes
    val delCond = col("doc_id") % 61 === 0
    val updCond = col("doc_id") % 89 === 0 && !delCond
    val clones = docs.filter(col("doc_id") % 97 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
    val updated = concat(col("text"), lit(" qq zz extra"))
    val changes = clones.withColumn("_change_type", lit("insert"))
      .unionByName(docs.filter(delCond)
        .withColumn("_change_type", lit("delete")))
      .unionByName(docs.filter(updCond)
        .withColumn("_change_type", lit("update_preimage")))
      .unionByName(docs.filter(updCond)
        .withColumn("text", updated)
        .withColumn("_change_type", lit("update_postimage")))
    val corpus2 = docs.filter(!delCond)
      .withColumn("text", when(updCond, updated).otherwise(col("text")))
      .unionByName(clones)
    IncrementalDedup.applyDelta(spark, bands, pairs, corpus2, changes,
      "doc_id", "text", seq(2), cfg)

    IncrementalDedup.readPairs(spark, pairs)
      .select("id_a", "id_b", "jaccard")
      .orderBy("id_a", "id_b")
  }

  /** INCREMENTAL EMBEDDING near-dup maintenance e2e — the
    * [[dedupIncremental]] scenario over the embeddings corpus (bootstrap
    * sync, then a mixed clone-insert + delete sync through
    * `IncrementalDedup.applyEmbedDelta`), comparison-row gated like
    * `dedup_embed_cosine`: n_exact is the exact cosine pair count of the
    * final corpus (DuckDB replays the same fold + round-6 bit-exactly
    * over the same mutated corpus), n_false counts incremental pairs
    * absent from the exact set (0 — the verify step applies the same
    * metric and rounding), recall_ok gates at ≥ 0.2 (deterministic; the
    * incremental invariant pins equality to the BATCH operator in
    * IncrementalDedupSpec, and identical-clone pairs always collide). */
  def dedupIncrementalEmbed(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.IncrementalDedup
    val cfg = IncrementalDedup.EmbedConfig()
    val emb = Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val root = java.nio.file.Files
      .createTempDirectory("graft-incembed").toString
    val bands = IncrementalDedup.bandTable(s"$root/bands", nBuckets = 8)
    val pairs = IncrementalDedup.pairTable(s"$root/pairs", nBuckets = 4)
    def seq(v: Long) = f"$v%016x/0"

    IncrementalDedup.applyEmbedDelta(spark, bands, pairs, emb,
      emb.withColumn("_change_type", lit("insert")),
      "vec_id", "embedding", seq(1), cfg)
    val delCond = col("vec_id") % 17 === 0
    val clones = emb.filter(col("vec_id") % 23 === 0)
      .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))
    val changes = clones.withColumn("_change_type", lit("insert"))
      .unionByName(emb.filter(delCond)
        .withColumn("_change_type", lit("delete")))
    val corpus2 = emb.filter(!delCond).unionByName(clones)
    IncrementalDedup.applyEmbedDelta(spark, bands, pairs, corpus2,
      changes, "vec_id", "embedding", seq(2), cfg)

    // norms per row, not per pair (Similarity.cosinePre — bit-identical):
    // the exact leg is the declared n² oracle cross join, so the per-pair
    // kernel cost is the whole leg's cost
    val a = corpus2.select(col("vec_id").as("id_a"),
      col("embedding").as("va"),
      graft.operators.Similarity.norm(col("embedding")).as("na"))
    val b = corpus2.select(col("vec_id").as("id_b"),
      col("embedding").as("vb"),
      graft.operators.Similarity.norm(col("embedding")).as("nb"))
    val exact = a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .withColumn("sim",
        round(graft.operators.Similarity.cosinePre(col("va"), col("vb"),
          col("na"), col("nb")), 6))
      .filter(col("sim") >= cfg.threshold)
      .select("id_a", "id_b").withColumn("_e", lit(1))
    val approx = IncrementalDedup.readPairs(spark, pairs)
      .select("id_a", "id_b").withColumn("_a", lit(1))
    exact.join(approx, Seq("id_a", "id_b"), "full_outer")
      .agg(
        coalesce(sum(col("_e")), lit(0L)).as("n_exact"),
        coalesce(sum(when(col("_a") === 1 && col("_e").isNull, 1)
          .otherwise(0)), lit(0L)).as("n_false"),
        coalesce(sum(when(col("_e") === 1 && col("_a") === 1, 1)
          .otherwise(0)), lit(0L)).as("n_hit"))
      .select(col("n_exact"), col("n_false"),
        (col("n_hit") * 5 >= col("n_exact")).as("recall_ok"))
  }

  val dedupIncrementalEmbedSql: String = """
    WITH corpus AS (
      SELECT vec_id, embedding FROM embeddings WHERE vec_id % 17 <> 0
      UNION ALL
      SELECT vec_id + 1000000, embedding FROM embeddings
      WHERE vec_id % 23 = 0),
    s AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        round(
          list_reduce(list_prepend(CAST(0 AS DOUBLE),
            list_transform(range(1, len(a.embedding)+1),
              i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))),
            (x,y) -> x+y)
          / (sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
               (x,y) -> x+y))
           * sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
               (x,y) -> x+y))), 6) AS sim
      FROM corpus a JOIN corpus b ON a.vec_id < b.vec_id)
    SELECT count(*) AS n_exact, CAST(0 AS BIGINT) AS n_false,
           true AS recall_ok
    FROM s WHERE sim >= 0.45"""

  val dedupIncrementalSql: String = s"""
    WITH corpus AS (
      SELECT doc_id,
        CASE WHEN doc_id % 89 = 0 THEN text || ' qq zz extra'
             ELSE text END AS text
      FROM documents WHERE doc_id % 61 <> 0
      UNION ALL
      SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 97 = 0),
    ${jaccardCtesOn("corpus")}
    SELECT id_a, id_b,
      inter * 1.0 / (sz_a + sz_b - inter) AS jaccard
    FROM cand
    WHERE inter * 1.0 / (sz_a + sz_b - inter) >= 0.5
    ORDER BY id_a, id_b"""

  val dedupMinhashLshSql: String = jaccardOracle

  /** CONTINUOUS duplicate-cluster maintenance e2e — the
    * [[dedupIncremental]] scenario with an [[graft.operators.IncrementalClusters]]
    * sync after each pair sync: the cluster table follows the pair
    * table O(touched components) per delta, and the gate hash-compares
    * the final clustered ids row-for-row against DuckDB recomputing
    * connected components (recursive closure) over the post-delta
    * corpus's exact Jaccard pair graph. */
  def dedupIncrementalClusters(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.{IncrementalClusters, IncrementalDedup}
    val cfg = IncrementalDedup.Config()
    val docs = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
    val root = java.nio.file.Files
      .createTempDirectory("graft-incclu").toString
    val bands = IncrementalDedup.bandTable(s"$root/bands", 8)
    val pairs = IncrementalDedup.pairTable(s"$root/pairs", 4)
    val idRep = IncrementalClusters.idRepTable(s"$root/idrep", 4)
    val members = IncrementalClusters.membersTable(s"$root/members", 4)
    def seq(v: Long) = f"$v%016x/0"

    // chain each cluster sync off the pair sync's returned verified set
    // (the designed corpus→pairs→clusters consumer shape): the cluster
    // sync seeds from it directly instead of re-probing the pair table
    val verified1 = IncrementalDedup.applyDelta(spark, bands, pairs, docs,
      docs.withColumn("_change_type", lit("insert")),
      "doc_id", "text", seq(1), cfg)
    IncrementalClusters.applyDelta(spark, idRep, members, pairs,
      docs.select(col("doc_id").as("id")), "id", seq(1),
      touchingPairs = Some(verified1))

    val delCond = col("doc_id") % 61 === 0
    val updCond = col("doc_id") % 89 === 0 && !delCond
    val clones = docs.filter(col("doc_id") % 97 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
    val updated = concat(col("text"), lit(" qq zz extra"))
    val changes = clones.withColumn("_change_type", lit("insert"))
      .unionByName(docs.filter(delCond)
        .withColumn("_change_type", lit("delete")))
      .unionByName(docs.filter(updCond)
        .withColumn("_change_type", lit("update_preimage")))
      .unionByName(docs.filter(updCond)
        .withColumn("text", updated)
        .withColumn("_change_type", lit("update_postimage")))
    val corpus2 = docs.filter(!delCond)
      .withColumn("text", when(updCond, updated).otherwise(col("text")))
      .unionByName(clones)
    val verified2 = IncrementalDedup.applyDelta(spark, bands, pairs,
      corpus2, changes, "doc_id", "text", seq(2), cfg)
    IncrementalClusters.applyDelta(spark, idRep, members, pairs,
      changes.select(col("doc_id").as("id")).distinct(), "id", seq(2),
      touchingPairs = Some(verified2))

    IncrementalClusters.readClusters(spark, idRep).orderBy("id")
  }

  val dedupIncrementalClustersSql: String = s"""
    WITH RECURSIVE corpus AS (
      SELECT doc_id,
        CASE WHEN doc_id % 89 = 0 THEN text || ' qq zz extra'
             ELSE text END AS text
      FROM documents WHERE doc_id % 61 <> 0
      UNION ALL
      SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 97 = 0),
    ${jaccardCtesOn("corpus")},
    p AS (
      SELECT id_a, id_b FROM cand
      WHERE inter * 1.0 / (sz_a + sz_b - inter) >= 0.5),
    edges AS (
      SELECT id_a AS u, id_b AS v FROM p
      UNION SELECT id_b, id_a FROM p),
    reach(a, b) AS (
      SELECT u, v FROM edges
      UNION
      SELECT r.a, e.v FROM reach r JOIN edges e ON r.b = e.u
      WHERE e.v <> r.a),
    cc AS (SELECT a AS id, least(a, min(b)) AS rep FROM reach GROUP BY a)
    SELECT id, rep FROM cc ORDER BY id"""

  /** DuckDB cosine of two float-list expressions via double-cast
    * left-to-right folds — the [[graft.functions.NearestCentroids]] /
    * `Similarity.cosine` replay fragment shared by the ann oracles. */
  /** Hybrid retrieval by reciprocal-rank fusion
    * ([[graft.operators.Retrieval.rrfFuse]]): BM25 top-20 fused with
    * exact-cosine top-20 (the declared exact leg — at scale any
    * `ann_*` operator's ranks drop in), top-5 per query hash-gated.
    * The oracle recomputes BOTH legs' rankings and the fused
    * reciprocal sum row-for-row. */
  def rrfSearch(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextFunctions
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), TextFunctions.tokens(col("text")).as("toks"))
    val queries = docs.filter(col("doc_id") < 3)
      .select(col("doc_id").as("q_id"), col("toks").as("q_toks"))
    val bleg = Retrieval.bm25TopK(docs, "doc_id", "toks",
        queries, "q_id", "q_toks", k = 20)
      .select("q_id", "doc_id", "rank")
    val emb = Tables.load(spark, dir, "embeddings")
    val qv = emb.filter(col("vec_id") < 3)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val w = Window.partitionBy("q_id")
      .orderBy(col("sim").desc, col("doc_id"))
    val cleg = emb.select(col("vec_id").as("doc_id"),
        col("embedding").as("d_vec"),
        Similarity.norm(col("embedding")).as("_dn"))
      .crossJoin(broadcast(qv.withColumn("_qn",
        Similarity.norm(col("q_vec")))))
      .withColumn("sim",
        round(Similarity.cosinePre(col("q_vec"), col("d_vec"),
          col("_qn"), col("_dn")), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 20)
      .select("q_id", "doc_id", "rank")
    graft.operators.Retrieval.rrfFuse(Seq(bleg, cleg),
        "q_id", "doc_id", "rank", kRrf = 60, topK = 5)
      .select("q_id", "rank", "doc_id", "rrf")
      .orderBy("q_id", "rank")
  }

  val rrfSearchSql: String = s"""
    WITH tok AS (
      SELECT doc_id,
        unnest(${graft.functions.TextFunctions.tokensSql("text")}) AS term
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
    bleg AS (
      SELECT * FROM (
        SELECT q_id, doc_id,
          row_number() OVER (PARTITION BY q_id
            ORDER BY score DESC, doc_id) AS rank
        FROM scored) WHERE rank <= 20),
    cq AS (SELECT vec_id AS q_id, embedding FROM embeddings
           WHERE vec_id < 3),
    csim AS (
      SELECT cq.q_id, de.vec_id AS doc_id,
        round(${cosSql("cq.embedding", "de.embedding")}, 6) AS sim
      FROM cq, embeddings de),
    cleg AS (
      SELECT * FROM (
        SELECT q_id, doc_id,
          row_number() OVER (PARTITION BY q_id
            ORDER BY sim DESC, doc_id) AS rank
        FROM csim) WHERE rank <= 20),
    contrib AS (
      SELECT q_id, doc_id,
        CAST(1.0 AS DOUBLE) / (60.0 + rank) AS c FROM bleg
      UNION ALL
      SELECT q_id, doc_id,
        CAST(1.0 AS DOUBLE) / (60.0 + rank) AS c FROM cleg),
    fused AS (
      SELECT q_id, doc_id, round(sum(c), 6) AS rrf
      FROM contrib GROUP BY 1, 2),
    ranked AS (
      SELECT q_id,
        CAST(row_number() OVER (PARTITION BY q_id
          ORDER BY rrf DESC, doc_id) AS INT) AS rank,
        doc_id, rrf
      FROM fused)
    SELECT q_id, rank, doc_id, rrf FROM ranked
    WHERE rank <= 5 ORDER BY q_id, rank"""

  private def cosSql(a: String, b: String): String = s"""
      list_reduce(list_prepend(CAST(0 AS DOUBLE),
        list_transform(range(1, len($a)+1),
          i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE))),
        (x,y) -> x+y)
      / (sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
           list_transform($a, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
           (x,y) -> x+y))
       * sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
           list_transform($b, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
           (x,y) -> x+y)))"""

  /** INCREMENTAL ANN INDEX e2e, hash-gated EXACT: bootstrap the
    * persistent IVF index from the embeddings corpus under FIXED
    * centroids (vec_id < 8, the [[semDedup]] trick — training is
    * spec-gated, the SEARCH/MAINTENANCE semantics are fully
    * SQL-replayable), apply one mixed delta (deletes, list-crossing
    * reversal updates, negated clone inserts — all exact float
    * transforms), then serve top-5/nProbe-2 queries from the maintained
    * index. The oracle replays IVF-Flat over the post-delta corpus:
    * same assignment tie-breaks, same probes, same rounded scores —
    * every returned row must match bit-for-bit, which pins that the
    * index state equals a from-scratch build after the delta. */
  def annIncremental(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.IncrementalAnn
    val emb = Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val centroids = emb.filter(col("vec_id") < 8).orderBy("vec_id")
      .select(transform(col("embedding"), x => x.cast("double")))
      .collect().map(_.getSeq[Double](0).toArray)
    val root = java.nio.file.Files
      .createTempDirectory("graft-incann").toString
    val lists = IncrementalAnn.listsTable(s"$root/lists", 8)
    val cents = IncrementalAnn.centroidsTable(s"$root/cents")
    def seq(v: Long) = f"$v%016x/0"

    IncrementalAnn.bootstrap(spark, lists, cents,
      emb.select(col("vec_id").as("id"), col("embedding").as("vec")),
      "id", "vec", centroids, seq(1))

    val delCond = col("vec_id") % 13 === 0
    val updCond = col("vec_id") % 7 === 3 && !delCond
    val clones = emb.filter(col("vec_id") % 11 === 5)
      .select((col("vec_id") + 100000L).as("vec_id"),
        transform(col("embedding"), x => -x).as("embedding"))
    val changes = clones.withColumn("_change_type", lit("insert"))
      .unionByName(emb.filter(delCond)
        .withColumn("_change_type", lit("delete")))
      .unionByName(emb.filter(updCond)
        .withColumn("_change_type", lit("update_preimage")))
      .unionByName(emb.filter(updCond)
        .withColumn("embedding", reverse(col("embedding")))
        .withColumn("_change_type", lit("update_postimage")))
    IncrementalAnn.applyDelta(spark, lists, cents,
      changes.select(col("vec_id").as("id"), col("embedding").as("vec"),
        col("_change_type")),
      "id", "vec", seq(2))

    val queries = emb.filter(col("vec_id") % 50 === 1)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    IncrementalAnn.search(spark, lists, cents, queries, k = 5, nProbe = 2)
      .orderBy("q_id", "rank")
  }

  val annIncrementalSql: String = s"""
    WITH base AS (SELECT vec_id, embedding FROM embeddings),
    cor AS (
      SELECT vec_id,
        CASE WHEN vec_id % 7 = 3 AND vec_id % 13 <> 0
             THEN list_reverse(embedding) ELSE embedding END AS embedding
      FROM base WHERE vec_id % 13 <> 0
      UNION ALL
      SELECT vec_id + 100000, list_transform(embedding, x -> -x)
      FROM base WHERE vec_id % 11 = 5),
    cents AS (SELECT vec_id AS cl_id, embedding AS c_vec
              FROM base WHERE vec_id < 8),
    csim AS (
      SELECT c.vec_id, c.embedding, ct.cl_id,
        ${cosSql("c.embedding", "ct.c_vec")} AS sim
      FROM cor c, cents ct),
    asg AS (
      SELECT vec_id, embedding, cl_id AS list_id FROM (
        SELECT vec_id, embedding, cl_id,
          row_number() OVER (PARTITION BY vec_id
                             ORDER BY sim DESC, cl_id) AS rk
        FROM csim) t WHERE rk = 1),
    qs AS (SELECT vec_id AS q_id, embedding AS q_vec FROM base
           WHERE vec_id % 50 = 1),
    qsim AS (
      SELECT q.q_id, q.q_vec, ct.cl_id,
        ${cosSql("q.q_vec", "ct.c_vec")} AS sim
      FROM qs q, cents ct),
    probe AS (
      SELECT q_id, q_vec, cl_id AS list_id FROM (
        SELECT q_id, q_vec, cl_id,
          row_number() OVER (PARTITION BY q_id
                             ORDER BY sim DESC, cl_id) AS rk
        FROM qsim) t WHERE rk <= 2),
    scored AS (
      SELECT p.q_id, a.vec_id AS c_id,
        round(${cosSql("p.q_vec", "a.embedding")}, 6) AS sim
      FROM probe p JOIN asg a ON a.list_id = p.list_id),
    r AS (SELECT q_id, c_id, sim,
            row_number() OVER (PARTITION BY q_id
                               ORDER BY sim DESC, c_id) AS rank
          FROM scored)
    SELECT q_id, c_id, sim, CAST(rank AS INT) AS rank
    FROM r WHERE rank <= 5 ORDER BY q_id, rank"""

  /** SimHash near-dup pairs (hamming ≤ 3 over 64-bit signatures),
    * ORACLE-GATED as a comparison row: xxhash64 bit patterns aren't
    * reproducible in DuckDB SQL, but the metrics of the simhash result
    * against the EXACT Jaccard pair set are — n_exact is the exact
    * operator's pair count (DuckDB recomputes it), n_false counts output
    * pairs violating the operator's own hamming bound (0 by the verify
    * step's construction), and recall_ok gates recall vs the Jaccard set
    * at ≥ 0.5 (deterministic: no RNG anywhere — measured 0.75 at
    * sf0.001, 0.60 at sf0.01). Pair-level brute-force equivalence is
    * additionally pinned in DedupSpec. */
  def dedupSimhash(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    val exact = Dedup.ngramJaccardPairs(docs, "text", "doc_id",
      n = 3, threshold = 0.5).select("id_a", "id_b")
      .withColumn("_e", lit(1))
    val approx = Dedup.simhashPairs(docs, "text", "doc_id", maxDist = 3)
      .withColumn("_a", lit(1))
    // ONE full-outer join evaluates each (expensive) leg exactly once;
    // all three counts fall out of the same aggregation
    exact.join(approx, Seq("id_a", "id_b"), "full_outer")
      .agg(
        coalesce(sum(col("_e")), lit(0L)).as("n_exact"),
        coalesce(sum(when(col("_a") === 1 && col("hamming") > 3, 1)
          .otherwise(0)), lit(0L)).as("n_false"),
        coalesce(sum(when(col("_e") === 1 && col("_a") === 1, 1)
          .otherwise(0)), lit(0L)).as("n_hit"))
      .select(col("n_exact"), col("n_false"),
        (col("n_hit") * 2 >= col("n_exact")).as("recall_ok"))
  }

  val dedupSimhashSql: String = s"""
    WITH pairs AS (${jaccardOracle.replace("ORDER BY id_a, id_b", "")})
    SELECT count(*) AS n_exact, CAST(0 AS BIGINT) AS n_false,
           true AS recall_ok
    FROM pairs"""

  /** Embedding-cosine near-dup pairs via hyperplane LSH + exact verify,
    * ORACLE-GATED as a comparison row against the exact all-pairs cross
    * join (testdata is diffuse — threshold 0.45 exercises the operator):
    * n_exact = exact pair count (DuckDB replays the same left-to-right
    * double fold + 6-dp round, bit-exact), n_false = LSH pairs absent
    * from the exact set (0 — the verify step applies the SAME metric and
    * rounding), recall_ok gates at ≥ 0.2 (deterministic; measured 0.29
    * at sf0.001 — 4 planes × 8 tables on near-orthogonal vectors — and
    * 0.86 at sf0.01). Pair-level recall is additionally pinned in
    * SimilaritySpec. */
  def dedupEmbedCosine(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.load(spark, dir, "embeddings")
    // norms per row, not per pair (Similarity.cosinePre — bit-identical)
    val a = emb.select(col("vec_id").as("id_a"), col("embedding").as("va"),
      Similarity.norm(col("embedding")).as("na"))
    val b = emb.select(col("vec_id").as("id_b"), col("embedding").as("vb"),
      Similarity.norm(col("embedding")).as("nb"))
    val exact = a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .withColumn("sim", round(Similarity.cosinePre(col("va"), col("vb"),
        col("na"), col("nb")), 6))
      .filter(col("sim") >= 0.45)
      .select("id_a", "id_b")
    val approx = Similarity.cosineNearDupPairs(emb, "vec_id", "embedding",
      threshold = 0.45, nPlanes = 4, nTables = 8).select("id_a", "id_b")
    // one full-outer join: the all-pairs cross join and the LSH pipeline
    // each evaluate exactly once
    exact.withColumn("_e", lit(1))
      .join(approx.withColumn("_a", lit(1)),
        Seq("id_a", "id_b"), "full_outer")
      .agg(
        coalesce(sum(col("_e")), lit(0L)).as("n_exact"),
        coalesce(sum(when(col("_a") === 1 && col("_e").isNull, 1)
          .otherwise(0)), lit(0L)).as("n_false"),
        coalesce(sum(when(col("_e") === 1 && col("_a") === 1, 1)
          .otherwise(0)), lit(0L)).as("n_hit"))
      .select(col("n_exact"), col("n_false"),
        (col("n_hit") * 5 >= col("n_exact")).as("recall_ok"))
  }

  val dedupEmbedCosineSql: String = """
    WITH s AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        round(
          list_reduce(list_prepend(CAST(0 AS DOUBLE),
            list_transform(range(1, len(a.embedding)+1),
              i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))),
            (x,y) -> x+y)
          / (sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
               (x,y) -> x+y))
           * sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
               (x,y) -> x+y))), 6) AS sim
      FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id)
    SELECT count(*) AS n_exact, CAST(0 AS BIGINT) AS n_false,
           true AS recall_ok
    FROM s WHERE sim >= 0.45"""

  // ------------------------------------------------------------------- ann
  /** Brute-force cosine top-10 for the first 10 vectors as queries
    * (self-match included, rank 1). Oracle-checked: both sides fold the
    * float elements to double LEFT-TO-RIGHT (VecDot here; an explicit
    * list_reduce in the DuckDB SQL), so the scores agree to the last bit
    * before the shared round(…, 6). */
  def annTopK(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.load(spark, dir, "embeddings")
    val queries = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val corpus = emb.select(col("vec_id").as("c_id"),
      col("embedding").as("c_vec"))
    Similarity.bruteForceTopK(queries, corpus, k = 10)
      .orderBy("q_id", "rank")
  }

  /** Same cosine, spelled out so DuckDB reproduces the exact double fold:
    * Σ double(q_i)·double(c_i) accumulated left-to-right (list_reduce with
    * a prepended 0 — DuckDB's reduce has no init), norms likewise, then
    * the same 6-dp round. `list_cosine_similarity` is NOT used — its
    * internal precision/order is unspecified. */
  val annTopKSql: String = """
    WITH q AS (SELECT vec_id AS q_id, embedding AS q_vec
               FROM embeddings WHERE vec_id < 10),
    c AS (SELECT vec_id AS c_id, embedding AS c_vec FROM embeddings),
    s AS (
      SELECT q_id, c_id,
        round(
          list_reduce(list_prepend(CAST(0 AS DOUBLE),
            list_transform(range(1, len(q_vec)+1),
              i -> CAST(q_vec[i] AS DOUBLE) * CAST(c_vec[i] AS DOUBLE))),
            (a,b) -> a+b)
          / (sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list_transform(q_vec, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
               (a,b) -> a+b))
           * sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list_transform(c_vec, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
               (a,b) -> a+b))), 6) AS sim
      FROM c, q),
    r AS (SELECT q_id, c_id, sim,
            row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, c_id) AS rank
          FROM s)
    SELECT q_id, c_id, sim, CAST(rank AS INT) AS rank
    FROM r WHERE rank <= 10 ORDER BY q_id, rank"""

  /** Shared shape for the approximate-ANN comparison rows: the approx
    * top-10 is joined against the EXACT top-10 (brute force, in Spark)
    * and reduced to driver-checkable invariants — n_queries / n_returned
    * (k rows per query: candidate pools exceed k at every SF), top1_hits
    * (the self-match ALWAYS lands: a vector shares its own bucket and
    * its own nearest centroid's list), and a recall gate. All inputs are
    * deterministic (seeded hashes, decimal-summed k-means), so the gate
    * booleans are stable run-to-run. */
  private def annCompare(queries: DataFrame, approx: DataFrame,
      exact: DataFrame, minHits: Int): DataFrame = {
    val e = exact.select("q_id", "c_id").withColumn("_e", lit(1))
    val a = approx.select("q_id", "c_id").withColumn("_a", lit(1))
    val nQ = queries.agg(count(lit(1)).as("n_queries"))
    // one full-outer join: brute force and the approx path each run once
    val stats = e.join(a, Seq("q_id", "c_id"), "full_outer")
      .agg(
        coalesce(sum(col("_a")), lit(0L)).as("n_returned"),
        coalesce(sum(when(col("_a") === 1 &&
          col("q_id") === col("c_id"), 1).otherwise(0)), lit(0L))
          .as("top1_hits"),
        coalesce(sum(when(col("_e") === 1 && col("_a") === 1, 1)
          .otherwise(0)), lit(0L)).as("n_hit"))
    nQ.crossJoin(stats)
      .select(col("n_queries"), col("n_returned"), col("top1_hits"),
        (col("n_hit") >= minHits).as("recall_ok"))
  }

  private val annCompareSql: String = """
    WITH q AS (SELECT vec_id FROM embeddings WHERE vec_id < 10)
    SELECT count(*) AS n_queries,
           count(*) * 10 AS n_returned,
           count(*) AS top1_hits,
           true AS recall_ok
    FROM q"""

  /** LSH-bucketed ANN over the same queries — the scale path (probes
    * ~ (nPlanes+1)/2^nPlanes of the corpus). ORACLE-GATED as a
    * comparison row vs exact brute-force top-10: recall gate ≥ 10/100
    * hits (measured 23 at sf0.001, 17 at sf0.01 — 8 planes on
    * near-orthogonal vectors probe ~3.5% of the corpus). Per-rank rows
    * are pinned in SimilaritySpec. */
  def annLsh(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.load(spark, dir, "embeddings")
    val queries = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val corpus = emb.select(col("vec_id").as("c_id"),
      col("embedding").as("c_vec"))
    annCompare(queries,
      Similarity.lshTopK(queries, corpus, k = 10, nPlanes = 8),
      Similarity.bruteForceTopK(queries, corpus, k = 10),
      minHits = 10)
  }

  val annLshSql: String = annCompareSql

  /** IVF-Flat ANN: deterministic spherical-k-means coarse quantizer,
    * nProbe inverted lists per query. ORACLE-GATED as a comparison row
    * vs exact brute-force top-10: recall gate ≥ 40/100 hits (measured 63
    * at sf0.001, 61 at sf0.01 with 4/16 lists probed). */
  def annIvf(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.load(spark, dir, "embeddings")
    val queries = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val corpus = emb.select(col("vec_id").as("c_id"),
      col("embedding").as("c_vec"))
    annCompare(queries,
      Similarity.ivfTopK(queries, corpus, k = 10, nLists = 16, nProbe = 4,
        iterations = 3),
      Similarity.bruteForceTopK(queries, corpus, k = 10),
      minHits = 40)
  }

  val annIvfSql: String = annCompareSql

  /** IVF-PQ ANN: product-quantized inverted file (8 subvectors × 16
    * codewords over the 64-dim embeddings — candidate payload through
    * the probe join shrinks ~32×) with residual encoding against the
    * coarse centroid, ADC shortlist + exact refine. ORACLE-GATED as a
    * comparison row vs brute-force top-10: recall gate ≥ 30/100 hits
    * (measured 59 at sf0.001, 55 at sf0.01 — residual codebooks beat
    * the raw-vector variant's 57/52 at the same budget; deterministic:
    * sampled coarse training, hash-ordered codebook init,
    * decimal/ordered folds). */
  def annPq(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.load(spark, dir, "embeddings")
    val queries = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val corpus = emb.select(col("vec_id").as("c_id"),
      col("embedding").as("c_vec"))
    annCompare(queries,
      Similarity.ivfPqTopK(queries, corpus, k = 10, nLists = 16,
        nProbe = 4, m = 8, ks = 16, iterations = 3, refineFactor = 4),
      Similarity.bruteForceTopK(queries, corpus, k = 10),
      minHits = 30)
  }

  val annPqSql: String = annCompareSql

  // --------------------------------------------------- operator-only bench
  // The four gate queries above time their exact oracle leg (an O(n²)
  // crossJoin for the cosine gate) alongside the operator, which pollutes
  // the round-over-round perf signal. These run the approximate scale
  // path ALONE for the bench; correctness stays with the gate queries.

  def opDedupEmbedCosine(spark: SparkSession, dir: String): DataFrame =
    Similarity.cosineNearDupPairs(Tables.load(spark, dir, "embeddings"),
      "vec_id", "embedding", threshold = 0.45, nPlanes = 4, nTables = 8)

  def opDedupSimhash(spark: SparkSession, dir: String): DataFrame =
    Dedup.simhashPairs(Tables.load(spark, dir, "documents"),
      "text", "doc_id", maxDist = 3)

  def opAnnLsh(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.load(spark, dir, "embeddings")
    val queries = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val corpus = emb.select(col("vec_id").as("c_id"),
      col("embedding").as("c_vec"))
    Similarity.lshTopK(queries, corpus, k = 10, nPlanes = 8)
  }

  def opAnnIvf(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.load(spark, dir, "embeddings")
    val queries = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val corpus = emb.select(col("vec_id").as("c_id"),
      col("embedding").as("c_vec"))
    Similarity.ivfTopK(queries, corpus, k = 10, nLists = 16, nProbe = 4,
      iterations = 3)
  }

  def opAnnPq(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.load(spark, dir, "embeddings")
    val queries = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val corpus = emb.select(col("vec_id").as("c_id"),
      col("embedding").as("c_vec"))
    Similarity.ivfPqTopK(queries, corpus, k = 10, nLists = 16, nProbe = 4,
      m = 8, ks = 16, iterations = 3, refineFactor = 4)
  }

  /** kNN label vote, hash-gated EXACT: the first 50 vectors classified
    * by the majority label of their 5 nearest neighbors (self excluded)
    * over the whole corpus — DuckDB replays ranking (rounded sim desc,
    * c_id) and the vote (count desc, label asc). */
  def knnLabel(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.load(spark, dir, "embeddings")
    val queries = emb.filter(col("vec_id") < 50)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val corpus = emb.select(col("vec_id").as("c_id"),
      col("embedding").as("c_vec"), col("label"))
    Similarity.knnClassify(queries, corpus, k = 5).orderBy("q_id")
  }

  val knnLabelSql: String = """
    WITH q AS (SELECT vec_id AS q_id, embedding AS q_vec
               FROM embeddings WHERE vec_id < 50),
    c AS (SELECT vec_id AS c_id, embedding AS c_vec, label FROM embeddings),
    s AS (
      SELECT q_id, c_id, label,
        round(
          list_reduce(list_prepend(CAST(0 AS DOUBLE),
            list_transform(range(1, len(q_vec)+1),
              i -> CAST(q_vec[i] AS DOUBLE) * CAST(c_vec[i] AS DOUBLE))),
            (a,b) -> a+b)
          / (sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list_transform(q_vec, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
               (a,b) -> a+b))
           * sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list_transform(c_vec, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
               (a,b) -> a+b))), 6) AS sim
      FROM c, q WHERE c_id <> q_id),
    r AS (SELECT q_id, label,
            row_number() OVER (PARTITION BY q_id
                               ORDER BY sim DESC, c_id) AS rk
          FROM s),
    v AS (SELECT q_id, label, count(*) AS votes
          FROM r WHERE rk <= 5 GROUP BY q_id, label),
    p AS (SELECT q_id, label, votes,
            row_number() OVER (PARTITION BY q_id
                               ORDER BY votes DESC, label) AS rk2
          FROM v)
    SELECT q_id, label AS pred, votes FROM p WHERE rk2 = 1 ORDER BY q_id"""

  def opClusterKmeans(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.load(spark, dir, "embeddings")
    Cluster.kmeans(emb, "vec_id", "embedding", k = 8, iterations = 3)._2
  }

  def opSemDedup(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.load(spark, dir, "embeddings")
    val (centroids, _) =
      Cluster.kmeans(emb, "vec_id", "embedding", k = 8, iterations = 3)
    Cluster.semDeDup(emb, "vec_id", "embedding", centroids,
      threshold = 0.45)
  }

  /** Operator-only timing for ONE incremental-dedup delta sync against
    * a PREBUILT index — the number the `dedup_incremental` gate cannot
    * give (its median is dominated by the O(corpus) bootstrap sync it
    * runs by construction). The index bootstraps once per JVM and
    * corpus dir (memoized — Bench samples share it); each timed call
    * then applies a genuine small delta, ALTERNATING the corpus between
    * two states so every sample pays a real sync (a repeated identical
    * seq would replay-no-op to ~zero, which would be a dishonest
    * timing). */
  def opDedupIncremental(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.IncrementalDedup
    val cfg = IncrementalDedup.Config()
    val docs = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
    val st = SimQueries.incDedupState.computeIfAbsent(dir, _ => {
      val root = java.nio.file.Files
        .createTempDirectory("graft-incdedup-op").toString
      val bands = IncrementalDedup.bandTable(s"$root/bands", 8)
      val pairs = IncrementalDedup.pairTable(s"$root/pairs", 4)
      IncrementalDedup.applyDelta(spark, bands, pairs, docs,
        docs.withColumn("_change_type", lit("insert")),
        "doc_id", "text", f"${1L}%016x/0", cfg)
      new IncDedupState(bands, pairs)
    })
    val (seqNo, toAppended) = st.next()
    val updCond = col("doc_id") % 89 === 0
    val appended = concat(col("text"), lit(" qq zz extra"))
    val (preT, postT) =
      if (toAppended) (col("text"), appended) else (appended, col("text"))
    val changes = docs.filter(updCond)
      .withColumn("text", preT)
      .withColumn("_change_type", lit("update_preimage"))
      .unionByName(docs.filter(updCond)
        .withColumn("text", postT)
        .withColumn("_change_type", lit("update_postimage")))
    val corpus = docs
      .withColumn("text", when(updCond, postT).otherwise(col("text")))
    IncrementalDedup.applyDelta(spark, st.bands, st.pairs, corpus,
      changes, "doc_id", "text", f"$seqNo%016x/0", cfg)
    IncrementalDedup.readPairs(spark, st.pairs)
      .agg(count(lit(1)).as("n_pairs"))
  }

  /** Dataset profiling: per-event-type cardinalities and value stats —
    * the distinct-count/statistics surface (exact, oracle-checked; the
    * HLL approx_count_distinct variant is spec-tested for error bound
    * since approximation isn't oracle-comparable). */
  def profileStats(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "events")
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        countDistinct(col("user_id")).as("n_users"),
        countDistinct(col("props")).as("n_props"),
        min(col("value")).as("min_v"),
        max(col("value")).as("max_v"),
        sum(col("value").cast("decimal(9,2)")).cast("double").as("sum_v"))
      .orderBy("event_type")

  val profileStatsSql: String = """
    SELECT event_type, COUNT(*) AS n,
      COUNT(DISTINCT user_id) AS n_users,
      COUNT(DISTINCT props) AS n_props,
      MIN(value) AS min_v, MAX(value) AS max_v,
      CAST(SUM(CAST(value AS DECIMAL(9,2))) AS DOUBLE) AS sum_v
    FROM events GROUP BY event_type ORDER BY event_type"""

  // ------------------------------------------------------------ multimodal
  /** Multimodal metadata: media payload as BINARY + pure-expression
    * metadata (n_bytes, dims) — oracle-checkable since the metadata is
    * arithmetic over octet_length. */
  def mmMeta(spark: SparkSession, dir: String): DataFrame =
    Multimodal.withMediaColumns(
        Tables.load(spark, dir, "documents"), "text")
      .select(col("doc_id"), col("media_meta.n_bytes").as("n_bytes"),
        col("media_meta.width").cast("long").as("width"),
        col("media_meta.height").cast("long").as("height"))
      .orderBy("doc_id")

  val mmMetaSql: String = """
    SELECT doc_id,
      CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      320 + octet_length(encode(text)) % 320 AS width,
      240 + octet_length(encode(text)) % 240 AS height
    FROM documents ORDER BY doc_id"""

  /** Multimodal decode/feature-extract/frame-sample through the stubbed
    * MediaCodec via partition-local batch processing. The fake decode is
    * DETERMINISTIC byte arithmetic (features: out[i mod 8] += byte/255
    * accumulated in float; frames: every 16th byte), so it IS
    * oracle-checkable — the SQL below replays the same float folds. */
  def mmFeatures(spark: SparkSession, dir: String): DataFrame = {
    val media = Multimodal.withMediaColumns(
      Tables.load(spark, dir, "documents"), "text")
    Multimodal.extractFeatures(media, "doc_id", d = 8, frameStride = 16)
      .select(col("id").as("doc_id"), col("n_frames"),
        round(aggregate(col("features"), lit(0.0),
          (a, x) => a + x.cast("double")), 4).as("feat_sum"))
      .orderBy("doc_id")
  }

  /** Replays MediaCodec.features/frameSample in SQL. The payload is the
    * UTF-8 text, replayed byte-for-byte via
    * [[graft.functions.TextFunctions.utf8BytesSql]] (so multi-byte
    * characters fold the same octets the Spark side's binary payload
    * holds); each of the 8 feature buckets accumulates its stride-8 byte
    * slice in FLOAT (every step re-rounded via CAST), the bucket totals
    * fold to double for the same 4-dp rounded sum, and n_frames counts
    * stride-16 offsets. */
  val mmFeaturesSql: String = s"""
    WITH b AS (
      SELECT doc_id,
        ${graft.functions.TextFunctions.utf8BytesSql("text")} AS bys
      FROM documents),
    f AS (
      SELECT doc_id, len(bys) AS n,
        list_transform(range(0, 8), j ->
          list_reduce(list_prepend(CAST(0 AS FLOAT),
            list_transform(list_filter(range(1, len(bys)+1), i -> (i-1) % 8 = j),
              i -> CAST(CAST(bys[i] AS FLOAT) / CAST(255 AS FLOAT) AS FLOAT))),
            (a, x) -> CAST(a + x AS FLOAT))) AS feats
      FROM b)
    SELECT doc_id,
      CAST((n + 15) // 16 AS INT) AS n_frames,
      round(list_reduce(list_prepend(CAST(0 AS DOUBLE),
        list_transform(feats, x -> CAST(x AS DOUBLE))), (a,x) -> a+x), 4) AS feat_sum
    FROM f ORDER BY doc_id"""

  /** Binary-content exact dedup over the media column — duplicate
    * payloads planted deterministically (every 7th doc's media is one
    * of 3 shared blobs, the re-crawled-asset shape) so the content
    * groups are non-trivial; SHA-256 digests agree byte-for-byte across
    * engines (Spark hashes the binary payload, DuckDB the identical
    * UTF-8 varchar). */
  def mmDedup(spark: SparkSession, dir: String): DataFrame = {
    val payload = when(col("doc_id") % 7 === 0,
        concat(lit("shared blob "), (col("doc_id") % 3).cast("string")))
      .otherwise(col("text"))
    val media = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), encode(payload, "UTF-8").as("media"))
    Multimodal.dedupByContent(media, "doc_id", "media")
      .orderBy("keeper")
  }

  val mmDedupSql: String = """
    WITH m AS (
      SELECT doc_id,
        CASE WHEN doc_id % 7 = 0 THEN 'shared blob ' || (doc_id % 3)
             ELSE text END AS payload
      FROM documents)
    SELECT sha256(payload) AS content_hash,
      min(doc_id) AS keeper,
      CAST(count(*) AS BIGINT) AS n_copies,
      CAST(min(octet_length(encode(payload))) AS BIGINT) AS n_bytes
    FROM m GROUP BY 1 ORDER BY keeper"""

  // ------------------------------------------------------------ clustering
  /** Centroid assignment, hash-gated EXACT: centroids fixed to the 8
    * embeddings with the smallest vec_id (0-based cluster id = that
    * vec_id), every corpus vector assigned through the
    * [[graft.operators.Cluster.assign]] kernel path (NearestCentroids +
    * CentroidDot — zero-shuffle projections, the 100 TB shape). The
    * oracle replays the argmax over UNROUNDED sims (the kernel compares
    * unrounded; both sides' double folds are bit-identical), then both
    * round the reported sim to 6 dp. */
  def clusterAssign(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.load(spark, dir, "embeddings")
    val centroids = emb.filter(col("vec_id") < 8).orderBy("vec_id")
      .select(transform(col("embedding"), x => x.cast("double")))
      .collect().map(_.getSeq[Double](0).toArray)
    Cluster.assign(emb, "vec_id", "embedding", centroids)
      .orderBy("vec_id")
  }

  val clusterAssignSql: String = """
    WITH c AS (SELECT vec_id AS cl_id, embedding AS c_vec
               FROM embeddings WHERE vec_id < 8),
    p AS (SELECT vec_id, embedding AS p_vec FROM embeddings),
    s AS (
      SELECT vec_id, cl_id,
        list_reduce(list_prepend(CAST(0 AS DOUBLE),
          list_transform(range(1, len(p_vec)+1),
            i -> CAST(p_vec[i] AS DOUBLE) * CAST(c_vec[i] AS DOUBLE))),
          (a,b) -> a+b)
        / (sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
             list_transform(c_vec, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
             (a,b) -> a+b))
         * sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
             list_transform(p_vec, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
             (a,b) -> a+b))) AS sim
      FROM p, c),
    r AS (SELECT vec_id, cl_id, sim,
            row_number() OVER (PARTITION BY vec_id
                               ORDER BY sim DESC, cl_id) AS rk
          FROM s)
    SELECT vec_id, CAST(cl_id AS INT) AS cluster, round(sim, 6) AS sim
    FROM r WHERE rk = 1 ORDER BY vec_id"""

  /** Full k-means over the corpus, gated on SQL-checkable invariants
    * (the annCompare pattern — training state is engine-internal):
    * n_points = corpus size; clusters_ok = between 2 and k lists used
    * (non-degenerate); stable_ok = re-assigning a repartition(7)-ed
    * corpus against the same centroids changes NOTHING (layout
    * independence — decimal-summed means + deterministic init make the
    * whole pipeline partition-invariant). */
  def clusterKmeans(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.load(spark, dir, "embeddings")
    val (centroids, asg) =
      Cluster.kmeans(emb, "vec_id", "embedding", k = 8, iterations = 3)
    val again = Cluster.assign(emb.repartition(7), "vec_id", "embedding",
      centroids)
    asg.select(col("vec_id"), col("cluster").as("c1"))
      .join(again.select(col("vec_id"), col("cluster").as("c2")), "vec_id")
      .agg(
        count(lit(1)).as("n_points"),
        (countDistinct(col("c1")) >= 2 &&
          countDistinct(col("c1")) <= 8).as("clusters_ok"),
        (sum(when(col("c1") === col("c2"), 0).otherwise(1)) === 0)
          .as("stable_ok"))
  }

  val clusterKmeansSql: String = """
    SELECT count(*) AS n_points, true AS clusters_ok, true AS stable_ok
    FROM embeddings"""

  /** SemDeDup, hash-gated EXACT under the same fixed centroids as
    * [[clusterAssign]] (trained-centroid runs are spec-gated — training
    * state is engine-internal, but the PRUNING semantics are fully
    * SQL-replayable): per-cluster near-dup pairs at cosine ≥ 0.45
    * (rounded 6 dp, the dedup_embed_cosine threshold — the testdata
    * plants near-dup embeddings), transitive closure to the smallest-id
    * representative, keep = being that representative. */
  def semDedup(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.load(spark, dir, "embeddings")
    val centroids = emb.filter(col("vec_id") < 8).orderBy("vec_id")
      .select(transform(col("embedding"), x => x.cast("double")))
      .collect().map(_.getSeq[Double](0).toArray)
    Cluster.semDeDup(emb, "vec_id", "embedding", centroids,
      threshold = 0.45).orderBy("vec_id")
  }

  val semDedupSql: String = """
    WITH RECURSIVE
    c AS (SELECT vec_id AS cl_id, embedding AS c_vec
          FROM embeddings WHERE vec_id < 8),
    p AS (SELECT vec_id, embedding AS p_vec FROM embeddings),
    s AS (
      SELECT vec_id, cl_id,
        list_reduce(list_prepend(CAST(0 AS DOUBLE),
          list_transform(range(1, len(p_vec)+1),
            i -> CAST(p_vec[i] AS DOUBLE) * CAST(c_vec[i] AS DOUBLE))),
          (a,b) -> a+b)
        / (sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
             list_transform(c_vec, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
             (a,b) -> a+b))
         * sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
             list_transform(p_vec, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
             (a,b) -> a+b))) AS sim
      FROM p, c),
    asg AS (
      SELECT vec_id, cl_id AS cluster FROM (
        SELECT vec_id, cl_id,
          row_number() OVER (PARTITION BY vec_id
                             ORDER BY sim DESC, cl_id) AS rk
        FROM s) t WHERE rk = 1),
    pairs AS (
      SELECT x.vec_id AS id_a, y.vec_id AS id_b
      FROM embeddings x
      JOIN asg ax ON ax.vec_id = x.vec_id
      JOIN embeddings y ON x.vec_id < y.vec_id
      JOIN asg ay ON ay.vec_id = y.vec_id AND ay.cluster = ax.cluster
      WHERE round(
        list_reduce(list_prepend(CAST(0 AS DOUBLE),
          list_transform(range(1, len(x.embedding)+1),
            i -> CAST(x.embedding[i] AS DOUBLE) * CAST(y.embedding[i] AS DOUBLE))),
          (a,b) -> a+b)
        / (sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
             list_transform(x.embedding, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))),
             (a,b) -> a+b))
         * sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
             list_transform(y.embedding, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))),
             (a,b) -> a+b))), 6) >= 0.45),
    edges AS (
      SELECT id_a AS u, id_b AS v FROM pairs
      UNION SELECT id_b, id_a FROM pairs),
    reach(a, b) AS (
      SELECT u, v FROM edges
      UNION
      SELECT r.a, e.v FROM reach r JOIN edges e ON r.b = e.u
      WHERE e.v <> r.a),
    cc AS (SELECT a AS id, least(a, min(b)) AS rep FROM reach GROUP BY a)
    SELECT g.vec_id, CAST(g.cluster AS INT) AS cluster,
           coalesce(cc.rep, g.vec_id) AS rep,
           coalesce(cc.rep, g.vec_id) = g.vec_id AS keep
    FROM asg g LEFT JOIN cc ON cc.id = g.vec_id
    ORDER BY g.vec_id"""

  /** Mutable per-JVM state backing [[opDedupIncremental]]: the prebuilt
    * index tables plus a monotone sync counter and the A/B corpus-state
    * toggle. Bench-only (Verify never calls benchOnly entries). */
  private[queries] final class IncDedupState(
      val bands: graft.sinks.GraftTable,
      val pairs: graft.sinks.GraftTable) {
    private val seq = new java.util.concurrent.atomic.AtomicLong(1L)
    /** Returns (next seq, whether this sync moves the corpus TO the
      * appended state). Bootstrap used seq 1; first delta flips to
      * appended. */
    def next(): (Long, Boolean) = {
      val s = seq.incrementAndGet()
      (s, s % 2 == 0)
    }
  }
  private[queries] val incDedupState =
    new java.util.concurrent.ConcurrentHashMap[String, IncDedupState]()

  /** Mutable per-JVM state backing [[opDedupIncrementalClusters]]: the
    * full corpus→pairs→clusters chain bootstrapped once per sfDir. */
  private[queries] final class IncCluState(
      val bands: graft.sinks.GraftTable,
      val pairs: graft.sinks.GraftTable,
      val idRep: graft.sinks.GraftTable,
      val members: graft.sinks.GraftTable) {
    private val seq = new java.util.concurrent.atomic.AtomicLong(1L)
    def next(): (Long, Boolean) = {
      val s = seq.incrementAndGet()
      (s, s % 2 == 0)
    }
  }
  private[queries] val incCluState =
    new java.util.concurrent.ConcurrentHashMap[String, IncCluState]()

  /** Mutable per-JVM state backing [[opDedupIncrementalEmbed]]. */
  private[queries] val incEmbState =
    new java.util.concurrent.ConcurrentHashMap[String, IncDedupState]()

  // ------------- adaptive merge-on-read at index-table scale (bench pair)

  /** Shared state for the `op_dedup_incremental_{cow,mor}` pair: the
    * text near-dup BAND INDEX, inflated to ~96 MiB of base (disjoint
    * id-shifted copies of the real band rows — the index of a
    * K×-larger corpus with identical per-bucket shape, the
    * op_sink_delta_* inflation pattern), materialized twice: `_1` with
    * the layer path disabled (`morMinAffectedBytes = Long.MaxValue` →
    * every sync rewrites its touched buckets) and `_2` with the
    * PRODUCTION DEFAULT threshold (64 MiB), which the inflated base
    * genuinely crosses. The pair times the per-sync BAND-TABLE MERGE —
    * the write leg the adaptive admission governs (the full sync around
    * it is already timed by op_dedup_incremental; its probe/verify legs
    * are identical across write modes and would only dilute this
    * attribution). Its gap is the touched-bucket read+rewrite each
    * layered sync skips, which grows linearly with index size. Layer
    * engagement under the DEFAULT threshold plus probe bucket-pruning
    * over the layered inflated index are asserted in
    * `MorIndexScaleSpec`. */
  private[queries] val incMorState =
    new java.util.concurrent.ConcurrentHashMap[String,
      (IncDedupState, IncDedupState)]()

  private def incMorStateFor(spark: SparkSession,
      dir: String): (IncDedupState, IncDedupState) =
    incMorState.computeIfAbsent(dir, _ => {
      import graft.operators.IncrementalDedup
      val cfg = IncrementalDedup.Config()
      val docs = Tables.load(spark, dir, "documents")
        .select(col("doc_id"), col("text"))
      val bandRows = graft.operators.Dedup.bandRows(
        docs.select(col("doc_id").as("id"), col("text").as("payload")),
        "payload", "id", cfg.n, cfg.numHashes, cfg.bands)
        .localCheckpoint()
      // inflation factor: measured once from a 1-copy write, then the
      // index is rebuilt at K copies. Shifted ids preserve (band, bh) →
      // per-bucket bytes scale ×K. Capped so toy SFs stay bounded. The
      // inflated index is WRITTEN once and directory-copied for the
      // second leg (manifest paths are root-relative by design) — the
      // two legs differ only in their admission threshold.
      val cowRoot = java.nio.file.Files
        .createTempDirectory("graft-incmor-cow").toString
      val cowBands = IncrementalDedup.bandTable(s"$cowRoot/bands", 8,
        morMinAffectedBytes = Long.MaxValue)
      cowBands.overwrite(bandRows)
      val target = 96L << 20
      val baseBytes = math.max(1L, cowBands.basePressure.bytes)
      val k = math.min(4096L, (target + baseBytes - 1) / baseBytes)
      if (k > 1) {
        val rep = spark.range(0, k).select(col("id").as("_rep"))
        cowBands.overwrite(bandRows.crossJoin(broadcast(rep))
          .withColumn("id", col("id") + col("_rep") * 1000000000L)
          .drop("_rep"))
      }
      val morRoot = java.nio.file.Files
        .createTempDirectory("graft-incmor-mor").toString
      locally {
        import java.nio.file.{Files, Path, Paths}
        val src = Paths.get(cowRoot); val dst = Paths.get(morRoot)
        val walk = Files.walk(src)
        try walk.forEach { (p: Path) =>
          val t = dst.resolve(src.relativize(p))
          if (Files.isDirectory(p)) Files.createDirectories(t)
          else Files.copy(p, t,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        } finally walk.close()
      }
      val morBands = IncrementalDedup.bandTable(s"$morRoot/bands", 8,
        morMinAffectedBytes =
          graft.sinks.GraftTable.MorMinAffectedBytesDefault)
      (new IncDedupState(cowBands,
         IncrementalDedup.pairTable(s"$cowRoot/pairs", 4,
           morMinAffectedBytes = Long.MaxValue)),
       new IncDedupState(morBands,
         IncrementalDedup.pairTable(s"$morRoot/pairs", 4)))
    })

  /** One steady-state band-table merge against the inflated index (the
    * opDedupIncremental delta shape: every 89th doc's bands A/B-toggle
    * between original and appended text, so each sample pays a genuine
    * netted I/D merge). Returns the table's layer engagement so the
    * pair's mechanism is visible in the result, not just the timing. */
  private def incMorSync(spark: SparkSession, dir: String,
      st: IncDedupState): DataFrame = {
    import graft.operators.IncrementalDedup
    val cfg = IncrementalDedup.Config()
    val docs = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
    val (seqNo, toAppended) = st.next()
    val updCond = col("doc_id") % 89 === 0
    val appended = concat(col("text"), lit(" qq zz extra"))
    val (preT, postT) =
      if (toAppended) (col("text"), appended) else (appended, col("text"))
    def bandsOf(t: Column) = graft.operators.Dedup.bandRows(
      docs.filter(updCond).select(col("doc_id").as("id"),
        t.as("payload")),
      "payload", "id", cfg.n, cfg.numHashes, cfg.bands)
    val newBands = bandsOf(postT).cache()
    val oldBands = bandsOf(preT).cache()
    try {
      val key = Seq("band", "bh", "id")
      val ins = newBands.join(oldBands, key, "left_anti")
        .withColumn("_op", lit("I"))
      val del = oldBands.join(newBands, key, "left_anti")
        .withColumn("_op", lit("D"))
      st.bands.merge(ins.unionByName(del)
        .withColumn("_seq", lit(f"$seqNo%016x/0")))
    } finally { newBands.unpersist(); oldBands.unpersist() }
    spark.range(1).select(
      lit(st.bands.hasLayers).as("bands_layered"),
      lit(seqNo).as("sync"))
  }

  /** Copy-on-write leg: every merge rewrites its touched band buckets —
    * O(index) read+write per sync on the inflated base. */
  def opDedupIncrementalCow(spark: SparkSession, dir: String): DataFrame =
    incMorSync(spark, dir, incMorStateFor(spark, dir)._1)

  /** Merge-on-read leg under the DEFAULT adaptive threshold: the
    * inflated base crosses 64 MiB of affected bytes, so each merge
    * commits an O(delta) layer instead (every MorMaxLayers-th sync pays
    * the amortized collapse, honestly inside the median). */
  def opDedupIncrementalMor(spark: SparkSession, dir: String): DataFrame =
    incMorSync(spark, dir, incMorStateFor(spark, dir)._2)

  /** Bench-only steady-state EMBEDDING-front delta: one real
    * delete+reinsert sync of every 23rd vector against a memoized
    * prebuilt index (A/B-toggled between present/absent so replay
    * can't fake the timing) — attributes the `dedup_incremental_embed`
    * gate's cost, which is dominated by its corpus-scale bootstrap and
    * all-pairs exact-comparison oracle leg by construction. */
  def opDedupIncrementalEmbed(spark: SparkSession, dir: String)
      : DataFrame = {
    import graft.operators.IncrementalDedup
    val cfg = IncrementalDedup.EmbedConfig()
    val emb = Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val st = incEmbState.computeIfAbsent(dir, _ => {
      val root = java.nio.file.Files
        .createTempDirectory("graft-incembed-op").toString
      val bands = IncrementalDedup.bandTable(s"$root/bands", 8)
      val pairs = IncrementalDedup.pairTable(s"$root/pairs", 4)
      IncrementalDedup.applyEmbedDelta(spark, bands, pairs, emb,
        emb.withColumn("_change_type", lit("insert")),
        "vec_id", "embedding", f"${1L}%016x/0", cfg)
      new IncDedupState(bands, pairs)
    })
    val (seqNo, present) = st.next()
    val touched = col("vec_id") % 23 === 0
    val changes = emb.filter(touched).withColumn("_change_type",
      lit(if (present) "insert" else "delete"))
    val corpus = if (present) emb else emb.filter(!touched)
    IncrementalDedup.applyEmbedDelta(spark, st.bands, st.pairs, corpus,
      changes, "vec_id", "embedding", f"$seqNo%016x/0", cfg)
    IncrementalDedup.readPairs(spark, st.pairs)
      .agg(count(lit(1)).as("n_pairs"))
  }

  /** Bench-only steady-state CLUSTER-chain delta: one real pair sync +
    * cluster sync against a memoized prebuilt chain (bootstrap excluded
    * from the timing by the Bench pre-pass), A/B-toggled like
    * [[opDedupIncremental]] so replay idempotence can't fake the
    * timing. Attributes the `dedup_incremental_clusters` gate's cost:
    * the gate pays corpus-scale bootstrap by construction, this is the
    * per-delta cost a production sync pays. */
  def opDedupIncrementalClusters(spark: SparkSession, dir: String)
      : DataFrame = {
    import graft.operators.{IncrementalClusters, IncrementalDedup}
    val cfg = IncrementalDedup.Config()
    val docs = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
    val st = SimQueries.incCluState.computeIfAbsent(dir, _ => {
      val root = java.nio.file.Files
        .createTempDirectory("graft-incclu-op").toString
      val bands = IncrementalDedup.bandTable(s"$root/bands", 8)
      val pairs = IncrementalDedup.pairTable(s"$root/pairs", 4)
      val idRep = IncrementalClusters.idRepTable(s"$root/idrep", 4)
      val members = IncrementalClusters.membersTable(s"$root/members", 4)
      IncrementalDedup.applyDelta(spark, bands, pairs, docs,
        docs.withColumn("_change_type", lit("insert")),
        "doc_id", "text", f"${1L}%016x/0", cfg)
      IncrementalClusters.applyDelta(spark, idRep, members, pairs,
        docs.select(col("doc_id").as("id")), "id", f"${1L}%016x/0")
      new IncCluState(bands, pairs, idRep, members)
    })
    val (seqNo, toAppended) = st.next()
    val updCond = col("doc_id") % 89 === 0
    val appended = concat(col("text"), lit(" qq zz extra"))
    val (preT, postT) =
      if (toAppended) (col("text"), appended) else (appended, col("text"))
    val changes = docs.filter(updCond)
      .withColumn("text", preT)
      .withColumn("_change_type", lit("update_preimage"))
      .unionByName(docs.filter(updCond)
        .withColumn("text", postT)
        .withColumn("_change_type", lit("update_postimage")))
    val corpus = docs
      .withColumn("text", when(updCond, postT).otherwise(col("text")))
    val verified = IncrementalDedup.applyDelta(spark, st.bands, st.pairs,
      corpus, changes, "doc_id", "text", f"$seqNo%016x/0", cfg)
    IncrementalClusters.applyDelta(spark, st.idRep, st.members, st.pairs,
      docs.filter(updCond).select(col("doc_id").as("id")),
      "id", f"$seqNo%016x/0", touchingPairs = Some(verified))
    IncrementalClusters.readClusters(spark, st.idRep)
      .agg(count(lit(1)).as("n_clustered"),
        countDistinct(col("rep")).as("n_components"))
  }

  /** Mutable per-JVM state backing [[opAnnIncremental]]: the prebuilt
    * ANN index plus a monotone sync counter and the A/B orientation
    * toggle. Bench-only. */
  private[queries] final class IncAnnState(
      val lists: graft.sinks.GraftTable,
      val cents: graft.sinks.GraftTable) {
    private val seq = new java.util.concurrent.atomic.AtomicLong(1L)
    def next(): (Long, Boolean) = {
      val s = seq.incrementAndGet()
      (s, s % 2 == 0)
    }
  }
  private[queries] val incAnnState =
    new java.util.concurrent.ConcurrentHashMap[String, IncAnnState]()

  /** Operator-only timing for the incremental ANN index: ONE
    * steady-state delta sync (an update wave flipping every 7th
    * vector's orientation — preimages always match the index's current
    * state via the A/B toggle, so replay can't fake the timing) plus
    * one bucket-pruned query wave against the memoized prebuilt index.
    * The `ann_incremental` GATE pays bootstrap + oracle legs; this
    * reports what a production sync+serve actually costs. */
  def opAnnIncremental(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.IncrementalAnn
    val emb = Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val st = incAnnState.computeIfAbsent(dir, _ => {
      val centroids = emb.filter(col("vec_id") < 8).orderBy("vec_id")
        .select(transform(col("embedding"), x => x.cast("double")))
        .collect().map(_.getSeq[Double](0).toArray)
      val root = java.nio.file.Files
        .createTempDirectory("graft-incann-op").toString
      val lists = IncrementalAnn.listsTable(s"$root/lists", 8)
      val cents = IncrementalAnn.centroidsTable(s"$root/cents")
      IncrementalAnn.bootstrap(spark, lists, cents,
        emb.select(col("vec_id").as("id"), col("embedding").as("vec")),
        "id", "vec", centroids, f"${1L}%016x/0")
      new IncAnnState(lists, cents)
    })
    val (seqNo, toReversed) = st.next()
    val updCond = col("vec_id") % 7 === 3
    val (preV, postV) =
      if (toReversed) (col("embedding"), reverse(col("embedding")))
      else (reverse(col("embedding")), col("embedding"))
    val changes = emb.filter(updCond)
      .withColumn("embedding", preV)
      .withColumn("_change_type", lit("update_preimage"))
      .unionByName(emb.filter(updCond)
        .withColumn("embedding", postV)
        .withColumn("_change_type", lit("update_postimage")))
    IncrementalAnn.applyDelta(spark, st.lists, st.cents,
      changes.select(col("vec_id").as("id"), col("embedding").as("vec"),
        col("_change_type")),
      "id", "vec", f"$seqNo%016x/0")
    val queries = emb.filter(col("vec_id") % 50 === 1)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    IncrementalAnn.search(spark, st.lists, st.cents, queries,
        k = 5, nProbe = 2)
      .agg(count(lit(1)).as("n_results"))
  }
}
