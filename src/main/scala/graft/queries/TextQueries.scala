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
    * expression over normalized text. No SQL oracle (64-bit wraparound
    * arithmetic isn't expressible in DuckDB SQL) → driver records the
    * rows-only check; exactness is pinned by RollingHashSpec against the
    * reference implementation. */
  def fingerprint(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .select(col("doc_id"),
        RollingHash(graft.operators.Dedup.normText(col("text"))).as("fp"))
      .orderBy("doc_id")
}
