package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Exact corpus-wide heavy hitters WITHOUT a full-vocabulary shuffle:
  * a mergeable Misra-Gries summary (Misra & Gries 1982; the "frequent"
  * sketch whose mergeability Agarwal et al. 2012 established) finds a
  * small candidate superset in one map-side-combined pass, then an
  * exact recount of just those candidates makes the counts — and the
  * final answer — exact.
  *
  * Why not `groupBy(token).count.orderBy.limit`: that shuffles one row
  * per DISTINCT token (web-scale corpora: billions of keys, heavy
  * skew). The MG pass shuffles only fixed-size summaries (one ≤k-entry
  * map per partition), and the recount's aggregation carries ≤k
  * distinct keys — so shuffle and driver cost are O(k), independent of
  * vocabulary size.
  *
  * Guarantee chain (what makes the output EXACT, not approximate):
  * every trim that shrinks the summary to k counters subtracts some
  * `cut` from at least k counters, so Σcuts ≤ N/k (mass argument,
  * preserved across merges) and any token undercounts by at most N/k —
  * every token with true count > N/k therefore GUARANTEED survives as
  * a candidate. Recounting candidates exactly and filtering
  * count > N/k yields precisely the true heavy-hitter set with true
  * counts; the sketch only ever prunes tokens that cannot pass.
  *
  * [[mgSummary]] is the SURVEY §2.9 typed-`Aggregator` surface (usable
  * directly via `ds.select(agg.toColumn)` for a one-pass approximate
  * summary with lower-bound counts); [[exact]] is the two-pass exact
  * operator.
  */
object HeavyHitters {

  /** The mutable sketch state: object aggregation buffers live as plain
    * objects between rows (kryo only on spill/shuffle), so updates
    * mutate a HashMap in place instead of allocating a persistent map
    * per token — the difference between an O(1)-amortized counter bump
    * and churning the allocator on every occurrence. `total` tracks N. */
  final class MgState(var counts: java.util.HashMap[String, Long],
      var total: Long) extends Serializable {
    def this() = this(new java.util.HashMap[String, Long](), 0L)
  }

  /** Mergeable Misra-Gries aggregator over token-array rows with `k`
    * counters. Output: (surviving token → lower-bound count, total
    * occurrences N). */
  def mgSummary(k: Int): Aggregator[Seq[String], MgState,
      (Map[String, Long], Long)] =
    new Aggregator[Seq[String], MgState, (Map[String, Long], Long)] {
      override def zero: MgState = new MgState()

      private def trim(m: java.util.HashMap[String, Long]): Unit =
        if (m.size > k) {
          // batched MG decrement: subtract the k-th largest count from
          // everyone in one pass, so at most k-1 counters survive
          val cuts = new Array[Long](m.size)
          var i = 0
          val vs = m.values.iterator()
          while (vs.hasNext) { cuts(i) = vs.next(); i += 1 }
          java.util.Arrays.sort(cuts)
          val cut = cuts(m.size - k)
          val it = m.entrySet().iterator()
          while (it.hasNext) {
            val e = it.next()
            if (e.getValue > cut) e.setValue(e.getValue - cut)
            else it.remove()
          }
        }

      override def reduce(b: MgState, in: Seq[String]): MgState = {
        // null tokens array (null text upstream) = empty token sequence,
        // matching the null tolerance of the rest of the operator surface
        if (in != null) {
          val m = b.counts
          in.foreach(t => m.put(t, m.getOrDefault(t, 0L) + 1L))
          trim(m)
          b.total += in.length
        }
        b
      }

      override def merge(l: MgState, r: MgState): MgState = {
        val it = r.counts.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          l.counts.put(e.getKey,
            l.counts.getOrDefault(e.getKey, 0L) + e.getValue)
        }
        trim(l.counts)
        l.total += r.total
        l
      }

      override def finish(b: MgState): (Map[String, Long], Long) = {
        val out = Map.newBuilder[String, Long]
        val it = b.counts.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          out += (e.getKey -> e.getValue)
        }
        (out.result(), b.total)
      }
      override def bufferEncoder: Encoder[MgState] = Encoders.kryo[MgState]
      override def outputEncoder: Encoder[(Map[String, Long], Long)] =
        Encoders.kryo[(Map[String, Long], Long)]
    }

  /** Exact heavy hitters: every token of `df[tokensCol]`
    * (ARRAY<STRING>) whose total occurrence count exceeds `N/k`, with
    * exact counts. Two scans: MG candidates + N in one map-side-
    * combined pass (O(k)-sized summaries on the wire), then an exact
    * recount filtered to the candidate set BEFORE the aggregation, so
    * the second pass shuffles ≤k keys. For integer counts,
    * `cnt > N/k ⇔ cnt > floor(N/k)`. */
  def exact(df: DataFrame, tokensCol: String, k: Int): DataFrame = {
    import df.sparkSession.implicits._
    val toks = df.select(col(tokensCol).cast("array<string>").as("tk"))
    val (summary, n) =
      toks.as[Seq[String]].select(mgSummary(k).toColumn).head()
    val candidates = summary.keySet.toSeq
    toks.select(explode(col("tk")).as("term"))
      .filter(col("term").isInCollection(candidates))
      .groupBy("term").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > n / k)
  }
}
