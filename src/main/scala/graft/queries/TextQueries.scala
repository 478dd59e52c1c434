package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.{RollingHash, TextFunctions}

/** Text-analysis queries over `documents` (SURVEY §7.1.7 extensions). */
object TextQueries {

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

  /** h accumulates over the normalized text's bytes (ASCII testdata →
    * unicode(char) == UTF-8 byte); HUGEINT keeps h·31+b exact below 2^70,
    * the explicit mod reproduces Java long wraparound, and the final CASE
    * maps [2^63, 2^64) onto the negative longs. */
  val fingerprintSql: String = """
    WITH norm AS (
      SELECT doc_id, lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS t
      FROM documents),
    h AS (
      SELECT doc_id,
        list_reduce(
          list_prepend(CAST(0 AS HUGEINT),
            list_transform(string_split(t, ''),
              c -> CAST(unicode(c) AS HUGEINT))),
          (a, b) -> (a * 31 + b) % CAST('18446744073709551616' AS HUGEINT)) AS hv
      FROM norm)
    SELECT doc_id,
      CAST(CASE WHEN hv >= CAST('9223372036854775808' AS HUGEINT)
           THEN hv - CAST('18446744073709551616' AS HUGEINT) ELSE hv END
           AS BIGINT) AS fp
    FROM h ORDER BY doc_id"""
}
