package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Overlapping token-window chunking — the retrieval-side (RAG) document
  * segmentation pass: each document becomes ⌈(n−w)/s⌉+1 windows of up to
  * `window` tokens advancing by `stride`, every token covered, the final
  * window allowed to overlap its predecessor by more than the others so no
  * degenerate tail chunk is emitted.
  *
  * Scale shape: pure `Column` expressions end-to-end (split → sequence →
  * posexplode → slice), zero UDFs, zero shuffles — chunking is
  * embarrassingly parallel per document and stays inside one
  * whole-stage-codegen span per input partition. Output size is
  * ~(1 + overlap) × corpus, so the expansion factor — not any exchange —
  * is the 100 TB cost, exactly as it should be.
  */
object Chunk {

  /** Chunk `textCol` into lowercased whitespace-token windows.
    *
    * Emits one row per (document, window): `chunk_id` (0-based), `start`
    * (0-based token offset), `n_tokens` (≤ window; the tail window is
    * short only when the whole document is shorter than `window`), and
    * `chunk_text` (space-rejoined tokens — whitespace-normalized by
    * construction). Documents with no tokens emit nothing; callers that
    * need total coverage left-join back to the corpus.
    */
  def tokenWindows(df: DataFrame, idCol: String, textCol: String,
      window: Int, stride: Int): DataFrame = {
    require(window > 0 && stride > 0 && stride <= window,
      s"need 0 < stride <= window, got window=$window stride=$stride")
    val toks = TextFunctions.tokens(col(textCol))
    val n = col("_n")
    // number of windows: 1 if n <= window, else ceil((n-window)/stride)+1;
    // the LAST window snaps back to start n-window (full-size, possibly
    // overlapping its predecessor by more than the others) instead of
    // emitting a degenerate stride-aligned tail.
    val m = when(n <= window, lit(1))
      .otherwise(ceil((n - window).cast("double") / stride).cast("int") + 1)
    val start = when(col("pos") === col("_m") - 1 && n > window,
      (n - window).cast("long")).otherwise(col("pos").cast("long") * stride)
    df.select(col(idCol), toks.as("_toks"))
      .filter(size(col("_toks")) > 0)
      .withColumn("_n", size(col("_toks")))
      .withColumn("_m", m)
      .select(col(idCol), col("_toks"), col("_n"), col("_m"),
        posexplode(sequence(lit(0), col("_m") - 1)))
      .withColumn("_start", start)
      .select(
        col(idCol),
        col("pos").cast("int").as("chunk_id"),
        col("_start").as("start"),
        least(lit(window), col("_n")).cast("long").as("n_tokens"),
        concat_ws(" ", slice(col("_toks"), col("_start") + 1, lit(window)))
          .as("chunk_text"))
  }

  /** DuckDB expression fragments mirroring [[tokenWindows]] (oracle side).
    * `range(0, m)` + aligned unnest replays posexplode; `list_slice` is
    * 1-based inclusive like Spark's `slice`. */
  def tokenWindowsSql(table: String, idCol: String, textCol: String,
      window: Int, stride: Int): String = s"""
    WITH _toks AS (
      SELECT $idCol, ${TextFunctions.tokensSql(textCol)} AS toks
      FROM $table),
    _n AS (
      SELECT $idCol, toks, len(toks) AS n FROM _toks WHERE len(toks) > 0),
    _m AS (
      SELECT $idCol, toks, n,
        CASE WHEN n <= $window THEN 1
             ELSE CAST(ceil((n - $window) / $stride.0) AS INT) + 1 END AS m
      FROM _n),
    _w AS (
      SELECT $idCol, toks, n,
        CAST(unnest(range(0, m)) AS INT) AS chunk_id, m
      FROM _m),
    _s AS (
      SELECT $idCol, toks, n, chunk_id,
        CASE WHEN chunk_id = m - 1 AND n > $window
             THEN CAST(n - $window AS BIGINT)
             ELSE CAST(chunk_id * $stride AS BIGINT) END AS start
      FROM _w)
    SELECT $idCol, chunk_id, start,
      CAST(least($window, n) AS BIGINT) AS n_tokens,
      array_to_string(
        list_slice(toks, start + 1, start + $window), ' ') AS chunk_text
    FROM _s"""
}
