package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Backward as-of join: each probe row picks the most recent state row
  * of the same key with `state.time <= probe.time` (point-in-time /
  * temporal lookup — the classic enrich-events-with-dimension-state
  * operator; absent from both Spark and the reference, so it belongs to
  * the north-star extension set alongside sessionize/range-join).
  *
  * Spark-first shape: NO per-key loops and NO inequality join (a naive
  * `probe JOIN state ON key = key AND st <= pt` is a
  * BroadcastNestedLoopJoin + per-pair max — quadratic in the hot key).
  * Instead the two sides are UNIONed with a side tag, shuffled ONCE on
  * the key, and a running `last(state_row, ignoreNulls)` window carries
  * the latest state row forward in time order; probe rows then read the
  * carried struct. State columns travel as ONE struct so the carry is
  * row-wise (a state row whose value column is legitimately NULL still
  * wins as a whole row — per-column `last` would resurrect older
  * values).
  *
  * Tie rule: at equal time the state row sorts FIRST (tag 0 < 1), so a
  * state change at time t is visible to a probe at exactly t —
  * inclusive `>=`, DuckDB `ASOF JOIN`'s rule. State rows must be unique
  * per (key, time); pre-aggregate ties upstream (e.g. `max_by`) or the
  * carried row is nondeterministic.
  *
  * Scale: `join` serializes each key's timeline through one window
  * partition — correct at any size but a single very hot key becomes
  * one task. `joinBucketed` is the 100 TB path: it splits time into
  * fixed-width buckets so the heavy shuffle key is (key, bucket), then
  * stitches bucket boundaries with a metadata-scale carry (one row per
  * key×active-bucket) — a hot key parallelizes across its time range
  * while small keys pay one extra tiny shuffle.
  */
object AsOfJoin {

  /** Single-window form. `probe`/`state` must share `keys`; every other
    * column name must be distinct across the two sides (alias upstream).
    * Time columns may be any mutually comparable orderable type.
    * `toleranceMicros`: when set, a match older than `probeTime - tol`
    * is nulled out (left-join semantics, like pandas `merge_asof`). */
  def join(probe: DataFrame, state: DataFrame, keys: Seq[String],
      probeTime: String, stateTime: String,
      tolerance: Option[Long] = None): DataFrame = {
    val u = tagged(probe, state, keys, probeTime, stateTime)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_t"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    finish(u.withColumn("_match", last(col("_srow"), ignoreNulls = true)
        .over(w)),
      probe, state, keys, probeTime, stateTime, tolerance)
  }

  /** Two-pass bucketed form — the skew-immune scale path. `probeTime` /
    * `stateTime` must be LONG (e.g. epoch micros); `bucketWidth` in the
    * same unit sizes the parallelism of a hot key (aim for ≥ tasks×10
    * buckets across the data's time span). Results are identical to
    * [[join]]. */
  def joinBucketed(probe: DataFrame, state: DataFrame, keys: Seq[String],
      probeTime: String, stateTime: String, bucketWidth: Long,
      tolerance: Option[Long] = None): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive: $bucketWidth")
    require(probe.schema(probeTime).dataType == LongType &&
      state.schema(stateTime).dataType == LongType,
      "joinBucketed needs LONG time columns (epoch micros/millis)")
    val u = tagged(probe, state, keys, probeTime, stateTime)
      .withColumn("_b", floor(col("_t") / bucketWidth))
    val kb = keys.map(col) :+ col("_b")

    // pass 1: running last within each (key, bucket) — the heavy
    // shuffle, hot keys spread across their time buckets
    val wIn = Window.partitionBy(kb: _*).orderBy(col("_t"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val staged = u.withColumn("_in", last(col("_srow"), ignoreNulls = true)
      .over(wIn))

    // boundary spine: ONE row per (key, active bucket) — metadata scale.
    // max_by picks each bucket's final state row (unique per (key,time)
    // by contract, so the struct-ordered tie-break never fires).
    val spine = u.groupBy(kb: _*)
      .agg(max_by(col("_srow"), when(col("_side") === 0, col("_t")))
        .as("_last_state"))
    // carry-in for bucket b = last state of any STRICTLY earlier bucket
    val wCarry = Window.partitionBy(keys.map(col): _*).orderBy(col("_b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = spine.select(kb ++ Seq(last(col("_last_state"),
      ignoreNulls = true).over(wCarry).as("_carry")): _*)

    // stitch: within-bucket running last, else the carried boundary
    val joined = staged.join(carry, keys :+ "_b", "left")
      .withColumn("_match", coalesce(col("_in"), col("_carry")))
    finish(joined, probe, state, keys, probeTime, stateTime, tolerance)
  }

  // ---------------------------------------------------------- streaming

  /** One element of the merged probe+state stream: `isState = true`
    * rows update the key's dimension state, others are probes. */
  final case class AsOfEvent(key: Long, tMicros: Long, isState: Boolean,
      value: Double)
  final case class AsOfDimState(tMicros: Long, value: Double)
  /** Probe row enriched with the latest state at or before its time. */
  final case class AsOfEnriched(key: Long, tMicros: Long, value: Double,
      stateT: Option[Long], stateValue: Option[Double])

  /** Streaming as-of enrichment over an unbounded keyed stream — the
    * CDC shape: dimension updates and probe events arrive interleaved on
    * one stream (e.g. a union of two sources), each probe reads the
    * newest dimension version it trails. Keyed state holds ONE row per
    * key (the latest dimension state) — O(keys) state, no buffering of
    * probes.
    *
    * Ordering contract (same engine-wide rule as streaming sessionize):
    * within a micro-batch, events are re-sorted by (time, state-first);
    * ACROSS batches arrival order is trusted — a state row arriving in a
    * later batch than a probe it precedes in event time does not
    * retroactively re-enrich that probe (that would need the full
    * watermark-buffered symmetric join; this operator is the low-latency
    * last-known-state form, which is exactly the CDC enrichment
    * semantic: you join against the replica as of processing time). */
  def streaming(events: org.apache.spark.sql.Dataset[AsOfEvent])
      : org.apache.spark.sql.Dataset[AsOfEnriched] = {
    import org.apache.spark.sql.{Encoders, streaming => ss}
    implicit val outEnc = Encoders.product[AsOfEnriched]
    implicit val stEnc = Encoders.product[AsOfDimState]
    implicit val keyEnc = Encoders.scalaLong
    events.groupByKey(_.key)
      .flatMapGroupsWithState[AsOfDimState, AsOfEnriched](
        ss.OutputMode.Append(), ss.GroupStateTimeout.NoTimeout()) {
        (key: Long, it: Iterator[AsOfEvent],
         state: ss.GroupState[AsOfDimState]) =>
          // state sorts before probes at equal time — the inclusive `>=`
          // tie rule the batch operator and DuckDB ASOF share
          val sorted = it.toSeq.sortBy(e => (e.tMicros, !e.isState))
          var cur = state.getOption
          val out = Vector.newBuilder[AsOfEnriched]
          sorted.foreach { e =>
            if (e.isState) {
              // monotone guard: a late/duplicate older state version
              // must not roll the dimension backwards
              if (cur.forall(_.tMicros <= e.tMicros))
                cur = Some(AsOfDimState(e.tMicros, e.value))
            } else out += AsOfEnriched(key, e.tMicros, e.value,
              cur.map(_.tMicros), cur.map(_.value))
          }
          cur.foreach(state.update)
          out.result().iterator
      }
  }

  /** Buffered probe awaiting its event-time flush. */
  final case class AsOfProbe(tMicros: Long, value: Double)
  /** Per-key buffer of the watermarked symmetric join: dimension
    * versions and probes still inside the lateness window, plus the one
    * compacted version at-or-below the watermark (`committed`). */
  final case class AsOfSymState(states: Seq[AsOfDimState],
      probes: Seq[AsOfProbe], committed: Option[AsOfDimState])
  /** [[AsOfEvent]] carrying its own watermark timestamp column —
    * internal to [[streamingWatermarked]], public only because encoder
    * codegen must reach the constructor. */
  final case class AsOfEventW(key: Long, tMicros: Long,
      isState: Boolean, value: Double, et: java.sql.Timestamp)

  /** Event-time-correct streaming as-of: the watermark-buffered
    * symmetric form of [[streaming]]. Both sides buffer inside the
    * `lateness` bound and re-order by EVENT time across micro-batches —
    * a dimension row arriving one batch late still enriches an
    * earlier-event-time probe, the cross-batch half of the late-data
    * story (ST6 coalesces late TOAST columns; this re-orders late
    * enrichment state).
    *
    * Mechanics: each probe is held until the event-time watermark passes
    * its timestamp — at that point no state row at-or-before it can
    * still arrive, so the match is final (same guarantee Spark's
    * stream-stream interval join derives from watermarks). State rows
    * at-or-below the watermark compact to ONE carried version per key
    * (`committed`) — exactly the batch operator's running-`last` carry,
    * so steady-state memory is O(keys + rows-inside-lateness), never
    * O(stream).
    *
    * Rows later than the lateness bound never reach the operator: the
    * engine's watermark filter drops stateful-op input older than the
    * watermark (standard Spark semantics — same fate such rows meet at
    * a windowed aggregation). The internal stale-version guard (a
    * dimension row older than the committed carry is ignored) is
    * therefore only replay defense, mirroring [[streaming]]'s monotone
    * rule.
    *
    * `idleTtlMs`: with a value, a key whose buffers drained keeps its
    * carried dimension state only until the watermark advances that far
    * past the drain — then the key evicts (bounded state for churning
    * key spaces). `None` keeps last-known state forever, matching
    * [[streaming]]. */
  def streamingWatermarked(events: org.apache.spark.sql.Dataset[AsOfEvent],
      lateness: String, idleTtlMs: Option[Long] = None)
      : org.apache.spark.sql.Dataset[AsOfEnriched] = {
    import org.apache.spark.sql.{Encoders, streaming => ss}
    implicit val outEnc = Encoders.product[AsOfEnriched]
    implicit val stEnc = Encoders.product[AsOfSymState]
    implicit val keyEnc = Encoders.scalaLong
    // the watermark attribute must survive into the grouped input, so
    // the event travels with its own timestamp column
    val wmEvents = events.toDF()
      .withColumn("et", timestamp_micros(col("tMicros")))
      .withWatermark("et", lateness)
      .as[AsOfEventW](Encoders.product[AsOfEventW])
    wmEvents.groupByKey(_.key)
      .flatMapGroupsWithState[AsOfSymState, AsOfEnriched](
        ss.OutputMode.Append(), ss.GroupStateTimeout.EventTimeTimeout()) {
        (key: Long, it: Iterator[AsOfEventW],
         state: ss.GroupState[AsOfSymState]) =>
          val prev = state.getOption.getOrElse(AsOfSymState(Nil, Nil, None))
          val timedOut = state.hasTimedOut
          val incoming = if (timedOut) Seq.empty[AsOfEventW] else it.toSeq
          val committedT =
            prev.committed.map(_.tMicros).getOrElse(Long.MinValue)
          val states = (prev.states ++ incoming.filter(_.isState)
              .map(e => AsOfDimState(e.tMicros, e.value))
              .filter(_.tMicros > committedT)) // stale: would roll back
            .sortBy(_.tMicros)
          val probes = (prev.probes ++ incoming.filterNot(_.isState)
            .map(e => AsOfProbe(e.tMicros, e.value))).sortBy(_.tMicros)
          val wmMicros = state.getCurrentWatermarkMs * 1000L
          val timeline = (prev.committed.toSeq ++ states).toIndexedSeq
          def lookup(t: Long): Option[AsOfDimState] = {
            var res: Option[AsOfDimState] = None
            var i = 0
            while (i < timeline.length && timeline(i).tMicros <= t) {
              res = Some(timeline(i)); i += 1
            }
            res
          }
          // probes at-or-below the watermark are final; later-than-
          // lateness probes (t <= wm on arrival) flush here best-effort
          val (emit, keepProbes) = probes.partition(_.tMicros <= wmMicros)
          val out = emit.map { p =>
            val m = lookup(p.tMicros)
            AsOfEnriched(key, p.tMicros, p.value,
              m.map(_.tMicros), m.map(_.value))
          }
          // compact dim versions at-or-below the watermark to one carry
          val (below, above) = states.partition(_.tMicros <= wmMicros)
          val committed =
            (prev.committed.toSeq ++ below).sortBy(_.tMicros).lastOption
          if (timedOut && prev.states.isEmpty && prev.probes.isEmpty) {
            state.remove() // the armed timer was the idle TTL
          } else if (above.isEmpty && keepProbes.isEmpty &&
              committed.isEmpty) {
            state.remove()
          } else {
            state.update(AsOfSymState(above, keepProbes, committed))
            val wmMs = state.getCurrentWatermarkMs
            if (above.nonEmpty || keepProbes.nonEmpty)
              state.setTimeoutTimestamp(wmMs + 1) // flush on next advance
            else idleTtlMs.foreach(ttl => state.setTimeoutTimestamp(
              wmMs + math.max(1L, ttl)))
          }
          out.iterator
      }
  }

  // ----------------------------------------------------------- plumbing

  private def stateValCols(state: DataFrame, keys: Seq[String],
      stateTime: String): Seq[String] =
    state.columns.filterNot(c => keys.contains(c) || c == stateTime).toSeq

  /** Align both sides onto one layout: keys, _t, _side, probe payload
    * (null on state rows), _srow = struct(stateTime, state values)
    * (null on probe rows). */
  private def tagged(probe: DataFrame, state: DataFrame, keys: Seq[String],
      probeTime: String, stateTime: String): DataFrame = {
    val pPayload = probe.columns.filterNot(c => keys.contains(c) ||
      c == probeTime).toSeq
    val sVals = stateValCols(state, keys, stateTime)
    val overlap = pPayload.toSet.intersect(sVals.toSet + stateTime)
    require(overlap.isEmpty,
      s"probe/state column names must be distinct: ${overlap.mkString(",")}")
    val srowType = {
      val f = state.select(struct((stateTime +: sVals).map(col): _*)
        .as("_srow")).schema("_srow").dataType
      f
    }
    val pSel = keys.map(col) ++ Seq(col(probeTime).as("_t"),
      lit(1).as("_side")) ++ pPayload.map(col) ++
      Seq(lit(null).cast(srowType).as("_srow"))
    val sSel = keys.map(col) ++ Seq(col(stateTime).as("_t"),
      lit(0).as("_side")) ++ pPayload.map(c =>
        lit(null).cast(probe.schema(c).dataType).as(c)) ++
      Seq(struct((stateTime +: sVals).map(col): _*).as("_srow"))
    probe.select(pSel: _*).unionByName(state.select(sSel: _*))
  }

  /** Keep probe rows, apply tolerance, unpack the matched state row. */
  private def finish(df: DataFrame, probe: DataFrame, state: DataFrame,
      keys: Seq[String], probeTime: String, stateTime: String,
      tolerance: Option[Long]): DataFrame = {
    val sVals = stateValCols(state, keys, stateTime)
    val pPayload = probe.columns.filterNot(c => keys.contains(c) ||
      c == probeTime).toSeq
    val gated: Column = tolerance match {
      case Some(tol) => when(col("_t") - col("_match")(stateTime) <= tol,
        col("_match"))
      case None => col("_match")
    }
    df.filter(col("_side") === 1)
      .withColumn("_m", gated)
      .select(keys.map(col) ++ Seq(col("_t").as(probeTime)) ++
        pPayload.map(col) ++
        (stateTime +: sVals).map(c => col("_m")(c).as(c)): _*)
  }
}
