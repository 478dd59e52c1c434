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
    * early when no pair reaches `minCount`.
    *
    * The dictionary is vocab-scale (10⁵–10⁷ distinct words no matter
    * how big the corpus), so when it fits under `collectLimit` rows the
    * trainer collects it ONCE and runs [[trainLocal]] — incremental
    * pair counts plus a lazily-invalidated max-heap, the structure
    * every production BPE trainer uses: each merge touches only the
    * words that CONTAIN the merged pair, so per-merge cost is
    * proportional to the pair's support, not the dictionary (a 32k-merge
    * vocab is minutes, not 32k sequential Spark jobs). Past the limit it
    * falls back to [[trainDistributed]], one pair-count aggregation per
    * merge over the distributed dictionary. */
  def train(words: DataFrame, merges: Int, minCount: Long = 1L,
      checkpointEvery: Int = 8, collectLimit: Long = 1L << 22)
      : (Seq[Rule], DataFrame) = {
    val dictSize = words.count()
    if (dictSize <= collectLimit) trainLocal(words, merges, minCount)
    else trainDistributed(words, merges, minCount, checkpointEvery)
  }

  /** Driver-side trainer over the collected dictionary. Semantics are
    * IDENTICAL to the distributed path (BpeSpec pins rule-sequence and
    * vocab equality): greedy leftmost merge passes, count-desc then
    * lexicographic tie-break. Structure: `pairCount` holds every
    * adjacent pair's total weighted frequency; `pairWords` maps a pair
    * to the word ids that contained it when last rewritten (entries go
    * stale when a word is rewritten — filtered by an adjacency re-check
    * at merge time, the standard lazy-index trick); the heap orders
    * (count desc, pair asc) with stale entries dropped on pop by
    * comparing against the live count. One merge = rewrite only the
    * pair's supporting words and push refreshed heap entries for the
    * pairs whose counts those rewrites changed. */
  private def trainLocal(words: DataFrame, merges: Int, minCount: Long)
      : (Seq[Rule], DataFrame) = {
    import scala.collection.mutable
    val spark = words.sparkSession
    import spark.implicits._
    val wc = words.select(col("word").cast("string"), col("cnt").cast("long"))
      .as[(String, Long)].collect()
    // initial symbolization by CODE POINT (= Spark's split(word, ""))
    val syms = wc.map { case (w, _) =>
      w.codePoints().toArray.map(cp => new String(Character.toChars(cp))) }
    val cnts = wc.map(_._2)

    val pairCount = mutable.HashMap.empty[(String, String), Long]
    val pairWords = mutable.HashMap.empty[(String, String),
      mutable.ArrayBuffer[Int]]
    // heap priority: highest count first; ties -> smallest (l, r)
    val ord = new Ordering[(Long, String, String)] {
      def compare(a: (Long, String, String), b: (Long, String, String)): Int = {
        val c = java.lang.Long.compare(a._1, b._1)
        if (c != 0) c
        else {
          val cl = b._2.compareTo(a._2)
          if (cl != 0) cl else b._3.compareTo(a._3)
        }
      }
    }
    val heap = mutable.PriorityQueue.empty[(Long, String, String)](ord)

    def indexWord(wi: Int, delta: Long, touched: mutable.HashSet[(String, String)]): Unit = {
      val s = syms(wi)
      var i = 0
      val seen = mutable.HashSet.empty[(String, String)]
      while (i < s.length - 1) {
        val p = (s(i), s(i + 1))
        val nc = pairCount.getOrElse(p, 0L) + delta * cnts(wi)
        if (nc == 0L) pairCount.remove(p) else pairCount(p) = nc
        if (touched ne null) touched += p
        if (delta > 0 && seen.add(p))
          pairWords.getOrElseUpdate(p, mutable.ArrayBuffer.empty) += wi
        i += 1
      }
    }
    syms.indices.foreach(indexWord(_, 1L, null))
    pairCount.foreach { case ((l, r), c) => heap.enqueue((c, l, r)) }

    val rules = Seq.newBuilder[Rule]
    var rank = 1
    while (rank <= merges && heap.nonEmpty) {
      val (c, l, r) = heap.dequeue()
      if (pairCount.get((l, r)).contains(c)) { // fresh entry
        if (c < minCount) { heap.clear() }     // best live pair too rare
        else {
          rules += Rule(rank, l, r, c)
          val touched = mutable.HashSet.empty[(String, String)]
          val support = pairWords.remove((l, r))
            .getOrElse(mutable.ArrayBuffer.empty)
          val visited = mutable.HashSet.empty[Int]
          support.foreach { wi =>
            if (visited.add(wi)) {
              val s = syms(wi)
              // stale-entry filter: the word may have been rewritten
              // since it was indexed under this pair
              var has = false
              var i = 0
              while (!has && i < s.length - 1) {
                has = s(i) == l && s(i + 1) == r; i += 1
              }
              if (has) {
                indexWord(wi, -1L, touched)
                val out = mutable.ArrayBuffer.empty[String]
                var j = 0
                while (j < s.length) {
                  if (out.nonEmpty && out.last == l && s(j) == r)
                    out(out.length - 1) = l + r
                  else out += s(j)
                  j += 1
                }
                syms(wi) = out.toArray
                indexWord(wi, 1L, touched)
              }
            }
          }
          pairCount.remove((l, r)) // fully consumed by the greedy passes
          touched.foreach { p =>
            pairCount.get(p).foreach(nc => heap.enqueue((nc, p._1, p._2)))
          }
          rank += 1
        }
      }
    }
    val vocab = spark.createDataset(
        wc.indices.map(i => (wc(i)._1, cnts(i), syms(i).toSeq)))
      .toDF("word", "cnt", "syms")
    (rules.result(), vocab)
  }

  /** Distributed fallback for dictionaries past the collect guard: one
    * vocab-scale pair-count aggregation + single-row TakeOrdered pick
    * per merge (serialized driver round-trips — acceptable only because
    * a >4M-distinct-word dictionary is the rare case, and still exact). */
  private def trainDistributed(words: DataFrame, merges: Int,
      minCount: Long, checkpointEvery: Int): (Seq[Rule], DataFrame) = {
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
