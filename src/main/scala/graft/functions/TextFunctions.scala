package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis functions for large-scale training-data pipelines:
  * language ID, quality scoring, token counting. All are composed from
  * codegen'd Spark built-ins (no UDFs on the hot path) so they stay inside
  * WholeStageCodegen and scale linearly with the scan; every scoring
  * formula is integer/rational arithmetic (no transcendentals) so results
  * are bit-identical across engines for oracle checking.
  */
object TextFunctions {

  /** Lowercased whitespace tokens, empties removed. */
  def tokens(text: Column): Column =
    filter(split(lower(text), "\\s+"), t => t =!= "")

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword token estimate: ~1 token per 4 chars (the standard
    * heuristic), exact formula ceil(len/4). */
  def bpeTokenEstimate(text: Column): Column =
    ceil(length(text) / lit(4.0)).cast("long")

  /** Stopword/marker profiles per language for n-gram-free language ID.
    * Genuine high-frequency function words; scoring = occurrence count of
    * each language's markers among the tokens. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "zu"),
    "en" -> Seq("the", "a", "of", "and", "to", "is", "in", "it"),
    "es" -> Seq("el", "la", "de", "que", "y", "los", "es", "un"),
    "fr" -> Seq("le", "la", "les", "de", "et", "est", "un", "une"),
    "zh" -> Seq("的", "是", "了", "在", "我", "有", "和", "不"))

  /** Marker-hit count for one language over a token array column. */
  def markerHits(toks: Column, lang: String): Column = {
    val markers = langMarkers.toMap.apply(lang)
    size(filter(toks, t => t.isin(markers: _*)))
  }

  /** Predicted language: argmax of marker hits, ties broken by language
    * code order (deterministic). */
  def langId(text: Column): Column = {
    val toks = tokens(text)
    // build struct(score, negOrd) per lang and take greatest → lang name
    val scored = langMarkers.zipWithIndex.map { case ((lang, _), i) =>
      struct(markerHits(toks, lang).as("score"),
        lit(-i).as("ord"), lit(lang).as("lang"))
    }
    greatest(scored: _*).getField("lang")
  }

  /** Quality score in [0,1]: rational combination of stopword ratio,
    * length saturation, and average token length saturation.
    * score = (2·sw_ratio + min(n_tok,500)/500 + min(avg_len,10)/10) / 4 */
  def qualityScore(text: Column): Column = {
    val toks = tokens(text)
    val nTok = size(toks).cast("double")
    val allMarkers = langMarkers.flatMap(_._2).distinct
    val swHits = size(filter(toks, t => t.isin(allMarkers: _*))).cast("double")
    val swRatio = when(nTok > 0, swHits / nTok).otherwise(lit(0.0))
    val nonSpace = length(regexp_replace(text, "\\s+", "")).cast("double")
    val avgLen = when(nTok > 0, nonSpace / nTok).otherwise(lit(0.0))
    round((lit(2.0) * swRatio + least(nTok, lit(500.0)) / 500.0 +
      least(avgLen, lit(10.0)) / 10.0) / 4.0, 6)
  }

  /** PII redaction patterns — shared by the Spark expression and the
    * oracle SQL so the two can never drift. Every pattern is restricted
    * to syntax with IDENTICAL semantics in Java regex (Spark) and RE2
    * (DuckDB): character classes, greedy counted quantifiers, `\b` —
    * no lookaround (RE2 has none), no alternation whose order could
    * resolve differently between leftmost-first and leftmost-longest
    * matching. Order matters: emails first (self-contained by the `@`),
    * then dotted quads, then `+`-prefixed phone numbers (by then no
    * redacted token contains digits for the phone class to swallow). */
  val piiPatterns: Seq[(String, String)] = Seq(
    ("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "[EMAIL]"),
    ("\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "[IP]"),
    ("\\+\\d[\\d().-]{6,}\\d", "[PHONE]"))

  /** Scrub emails / IPv4 addresses / international-format phone numbers —
    * the standard pre-training redaction pass (C4/Dolma-style), as a
    * pure codegen'd `regexp_replace` chain. */
  def redactPii(text: Column): Column =
    piiPatterns.foldLeft(text) { case (c, (pat, tag)) =>
      regexp_replace(c, pat, tag)
    }

  // ---------------------------------------------------------------- oracle SQL
  /** DuckDB expression equivalents, generated from the SAME marker lists so
    * Spark and oracle can never drift. `t` = text column name. */
  def tokensSql(t: String): String =
    s"list_filter(string_split_regex(lower($t), '\\s+'), x -> x <> '')"

  /** The UTF-8 byte list of a string expression, as arithmetic over its
    * code points (DuckDB has no blob-byte accessor). The Spark-side gram
    * and fingerprint kernels fold UTF-8 BYTES (`getBytes(UTF_8)`), so
    * oracle replays must fold the same byte sequence — a bare
    * `unicode(c)` fold agrees only on pure-ASCII text and silently
    * diverges on any multi-byte character. The CASE mirrors RFC 3629's
    * 1–4-byte encoding exactly (validated against Python's
    * `str.encode()` for all four width classes). */
  def utf8BytesSql(t: String): String =
    s"""flatten(list_transform(
      list_transform(string_split($t, ''), c -> unicode(c)),
      cp -> CASE
        WHEN cp < 128 THEN [cp]
        WHEN cp < 2048 THEN [192 + cp // 64, 128 + cp % 64]
        WHEN cp < 65536 THEN [224 + cp // 4096, 128 + (cp // 64) % 64,
                              128 + cp % 64]
        ELSE [240 + cp // 262144, 128 + (cp // 4096) % 64,
              128 + (cp // 64) % 64, 128 + cp % 64] END))"""

  def markerHitsSql(toksExpr: String, lang: String): String = {
    val set = langMarkers.toMap.apply(lang).map(w => s"'$w'").mkString(", ")
    s"len(list_filter($toksExpr, x -> x IN ($set)))"
  }

  /** CASE-based argmax matching [[langId]]'s greatest(struct) tie-break:
    * higher score wins; on ties the EARLIER language in langMarkers order
    * wins (ord = -index). */
  def langIdSql(t: String): String = {
    val toks = tokensSql(t)
    val scores = langMarkers.map { case (lang, _) =>
      lang -> markerHitsSql(toks, lang) }
    // greatest(struct(score, -i, lang)): lang L wins iff score(L) > score(M)
    // for all M before L and score(L) >= ... after L. Expressed as nested
    // CASE scanning in order, keeping the max with earlier-index priority.
    val conds = scores.zipWithIndex.map { case ((lang, expr), i) =>
      val beats = scores.zipWithIndex.collect {
        case ((_, e2), j) if j < i => s"$expr > $e2"
        case ((_, e2), j) if j > i => s"$expr >= $e2"
      }
      s"WHEN ${beats.mkString(" AND ")} THEN '$lang'"
    }
    s"CASE ${conds.mkString(" ")} END"
  }

  def qualityScoreSql(t: String): String = {
    val toks = tokensSql(t)
    val allMarkers = langMarkers.flatMap(_._2).distinct
      .map(w => s"'$w'").mkString(", ")
    val nTok = s"CAST(len($toks) AS DOUBLE)"
    val sw = s"CAST(len(list_filter($toks, x -> x IN ($allMarkers))) AS DOUBLE)"
    val nonSpace = s"CAST(length(regexp_replace($t, '\\s+', '', 'g')) AS DOUBLE)"
    s"""round((2.0 * (CASE WHEN $nTok > 0 THEN $sw / $nTok ELSE 0.0 END)
       + least($nTok, 500.0) / 500.0
       + (CASE WHEN $nTok > 0 THEN least($nonSpace / $nTok, 10.0) ELSE 0.0 END) / 10.0) / 4.0, 6)"""
  }

  /** DuckDB redaction chain from the SAME [[piiPatterns]] (RE2 needs the
    * explicit 'g' flag; Java replaces globally by default). */
  def redactPiiSql(t: String): String =
    piiPatterns.foldLeft(t) { case (e, (pat, tag)) =>
      s"regexp_replace($e, '$pat', '$tag', 'g')"
    }
}
