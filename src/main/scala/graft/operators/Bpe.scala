package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Distributed byte-pair-encoding TOKENIZER TRAINING (Sennrich et al.,
  * "Neural Machine Translation of Rare Words with Subword Units",
  * ACL'16) — the operator a pretraining pipeline runs before any token
  * count is meaningful. The repo's other text operators consume
  * whitespace tokens or the 4-chars≈1-token estimate; this learns the
  * actual subword merge table from the corpus and encodes with it.
  *
  * Scale shape (the reason BPE training is feasible at 100 TB): the
  * corpus is touched EXACTLY ONCE, by the word-count aggregation — a
  * single hash-exchange with map-side combine. Every merge iteration
  * after that operates on the DISTINCT-WORD table (vocab scale, ~10⁵–10⁷
  * rows regardless of corpus size; this is the same word-dictionary
  * trick every production BPE trainer uses). One iteration = one
  * vocab-scale pair-count aggregation + a single-row TakeOrdered
  * collect (metadata-scale, the same driver role as IVF centroid
  * training) + a narrow per-word rewrite. Lineage is cut with
  * `localCheckpoint` every `checkpointEvery` rounds, the iterative-frame
  * idiom [[Dedup.connectedComponents]] uses.
  *
  * Merge semantics are the paper's: each learned rule `(l, r)` rewrites
  * every word by ONE leftmost-greedy non-overlapping pass (`"aaa"` under
  * `(a,a)` → `[aa, a]`). Chained/self-overlapping effects need no
  * re-scan within a rule: a merged symbol `l+r` can never re-create the
  * `(l, r)` adjacency it just consumed (`r` is non-empty, so `l+r ≠ l`),
  * and a pair of pre-existing symbols can only become adjacent by a
  * merge CONSUMING one of them — which is why sequential single passes
  * in rank order are also a correct encoder (see [[encodeWords]]).
  * Candidate selection ties break deterministically: highest total
  * count, then lexicographically smallest `(l, r)`.
  */
object Bpe {

  /** Corpus word counts — the one corpus-scale pass. `pattern`
    * optionally restricts trained words (e.g. `"^[a-z0-9]+$"` keeps
    * the oracle's separator-replay trick sound; pass null to train on
    * every whitespace token). */
  def wordCounts(df: DataFrame, textCol: String,
      pattern: String = null): DataFrame = {
    val toks = df.select(explode(TextFunctions.tokens(col(textCol))).as("word"))
    val kept = if (pattern == null) toks else toks.filter(col("word").rlike(pattern))
    kept.groupBy("word").agg(count(lit(1)).as("cnt"))
  }

  /** One leftmost-greedy non-overlapping merge pass of `(l, r)` over a
    * symbol array, as a pure fold — runs codegen'd inside the vocab
    * rewrite projection, never a UDF. */
  def mergeOnce(syms: Column, l: String, r: String): Column =
    aggregate(syms, array().cast("array<string>"), (acc, s) =>
      when(size(acc) > 0 && element_at(acc, -1) === lit(l) && s === lit(r),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
        .otherwise(concat(acc, array(s))))

  /** A learned merge rule. `count` is the pair's total weighted
    * frequency at the time it was chosen. */
  final case class Rule(rank: Int, left: String, right: String, count: Long)

  /** Train `merges` rules over a `(word, cnt)` dictionary (from
    * [[wordCounts]]). Returns the ordered rule list AND the final
    * symbolization of every word (the trained vocab — callers encoding
    * the SAME corpus join against it instead of re-encoding). Stops
    * early when no pair reaches `minCount`. */
  def train(words: DataFrame, merges: Int, minCount: Long = 1L,
      checkpointEvery: Int = 8): (Seq[Rule], DataFrame) = {
    var cur = words
      .select(col("word"), col("cnt"), split(col("word"), "").as("syms"))
      .localCheckpoint(eager = false)
    val rules = Seq.newBuilder[Rule]
    var rank = 1
    var done = false
    while (rank <= merges && !done) {
      val best = cur
        .filter(size(col("syms")) >= 2)
        .select(col("cnt"), explode(expr(
          "transform(sequence(0, size(syms) - 2), " +
            "i -> struct(syms[i] AS l, syms[i + 1] AS r))")).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("cnt")).as("c"))
        .orderBy(desc("c"), asc("l"), asc("r"))
        .limit(1).collect()
      if (best.isEmpty || best.head.getLong(2) < minCount) done = true
      else {
        val (l, r, c) = (best.head.getString(0), best.head.getString(1),
          best.head.getLong(2))
        rules += Rule(rank, l, r, c)
        val next = cur.withColumn("syms", mergeOnce(col("syms"), l, r))
        cur = if (rank % checkpointEvery == 0) next.localCheckpoint()
              else next.localCheckpoint(eager = false)
        rank += 1
      }
    }
    (rules.result(), cur)
  }

  /** Rules as a DataFrame `(rank, left, right, pair_count)` — the
    * persistable merge-table artifact. */
  def rulesDf(spark: SparkSession, rules: Seq[Rule]): DataFrame = {
    import spark.implicits._
    rules.map(r => (r.rank, r.left, r.right, r.count))
      .toDF("rank", "left", "right", "pair_count")
  }

  /** Encode arbitrary words with a trained rule list: sequential
    * leftmost-greedy passes in rank order (correct by the adjacency
    * argument in the object scaladoc). Runs per DISTINCT word — encode
    * a corpus by encoding its vocab and broadcast-joining back. The
    * per-word symbol set gates each rule (a rule whose operands aren't
    * present costs O(1)), so cost is O(applicable rules × |word|), not
    * O(all rules × |word|). Rules ship once per task via broadcast. */
  def encodeWords(words: DataFrame, wordCol: String,
      rules: Seq[Rule]): DataFrame = {
    val spark = words.sparkSession
    import spark.implicits._
    val ruleArr = rules.sortBy(_.rank).map(r => (r.left, r.right)).toArray
    val bc = spark.sparkContext.broadcast(ruleArr)
    val in = words.select(col(wordCol).cast("string")).as[String]
    in.mapPartitions { it =>
      val rs = bc.value
      it.map { w =>
        // split by CODE POINT to match train's `split(word, "")` initial
        // symbolization — a per-UTF-16-unit split would emit lone
        // surrogates for non-BMP characters that no trained rule matches
        var syms = w.codePoints().toArray
          .map(cp => new String(Character.toChars(cp))).toBuffer
        val present = scala.collection.mutable.HashSet(syms.toSeq: _*)
        var i = 0
        while (i < rs.length) {
          val (l, r) = rs(i)
          if (present.contains(l) && present.contains(r)) {
            val out = scala.collection.mutable.ArrayBuffer.empty[String]
            var j = 0
            var merged = false
            while (j < syms.length) {
              if (out.nonEmpty && out.last == l && syms(j) == r) {
                out(out.length - 1) = l + r; merged = true
              } else out += syms(j)
              j += 1
            }
            if (merged) { syms = out; present += (l + r) }
          }
          i += 1
        }
        (w, syms.toSeq)
      }
    }.toDF(wordCol, "subwords")
  }
}
