package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Sessionization: group a user's events into sessions split at
  * inactivity gaps — a standard training-data/behavioral operator (and
  * the classic `flatMapGroupsWithState` showcase; the reference has no
  * event-time operators, SURVEY §2.6 ST5/ST6, so this belongs to the
  * north-star extension set).
  *
  * Batch form: two windows per user key (lag to mark gap starts, running
  * sum to number sessions) — shuffle-partitioned by user, no driver
  * state, oracle-expressible in ANSI SQL.
  *
  * Streaming form: `flatMapGroupsWithState` with per-user
  * (lastEventMs, sessionOrdinal) state and processing-time timeout —
  * emits closed sessions; the Spark-native shape for unbounded streams
  * where the batch windows can't apply.
  */
object Sessionize {

  /** Batch sessionization. Input needs (userCol, tsMsCol: epoch millis,
    * valueCol). Output: one row per session with start/end/count/sum. */
  def sessions(df: DataFrame, userCol: String, tsMsCol: String,
      valueCol: String, gapMs: Long): DataFrame = {
    val byUser = Window.partitionBy(col(userCol))
      .orderBy(col(tsMsCol), col(valueCol))
    val marked = df.withColumn("_prev", lag(col(tsMsCol), 1).over(byUser))
      .withColumn("_new_session",
        when(col("_prev").isNull ||
          col(tsMsCol) - col("_prev") > gapMs, 1).otherwise(0))
    val numbered = marked.withColumn("session_id",
      sum(col("_new_session")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    numbered.groupBy(col(userCol), col("session_id"))
      .agg(
        min(col(tsMsCol)).as("session_start_ms"),
        max(col(tsMsCol)).as("session_end_ms"),
        count(lit(1)).as("n_events"),
        sum(col(valueCol).cast("decimal(9,2)")).cast("double").as("total"))
  }

  // ------------------------------------------------------------- streaming
  final case class SessionEvent(userId: Long, tsMs: Long, value: Double)
  final case class SessionState(lastMs: Long, ordinal: Long, startMs: Long,
      n: Long, total: Double)
  final case class ClosedSession(userId: Long, sessionOrdinal: Long,
      sessionStartMs: Long, sessionEndMs: Long, nEvents: Long)

  /** Streaming sessionization over an unbounded keyed stream: state holds
    * the open session; a gap (or timeout) closes it. Events within a
    * micro-batch are sorted by time before folding — order is
    * re-established, never assumed (the engine-wide rule). */
  def streamingSessions(events: Dataset[SessionEvent], gapMs: Long,
      useTimeout: Boolean = true): Dataset[ClosedSession] = {
    implicit val outEnc = Encoders.product[ClosedSession]
    implicit val stEnc = Encoders.product[SessionState]
    implicit val keyEnc = Encoders.scalaLong
    val timeoutConf = if (useTimeout) GroupStateTimeout.ProcessingTimeTimeout()
                      else GroupStateTimeout.NoTimeout()
    events.groupByKey(_.userId)
      .flatMapGroupsWithState[SessionState, ClosedSession](
        OutputMode.Append(), timeoutConf) {
        (userId: Long, it: Iterator[SessionEvent],
         state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(
              ClosedSession(userId, s.ordinal, s.startMs, s.lastMs, s.n))
          } else {
            val sorted = it.toSeq.sortBy(_.tsMs)
            var closed = List.empty[ClosedSession]
            var cur = state.getOption
            sorted.foreach { e =>
              cur match {
                case Some(s) if e.tsMs - s.lastMs <= gapMs =>
                  cur = Some(s.copy(lastMs = e.tsMs, n = s.n + 1,
                    total = s.total + e.value))
                case Some(s) =>
                  closed ::= ClosedSession(userId, s.ordinal, s.startMs,
                    s.lastMs, s.n)
                  cur = Some(SessionState(e.tsMs, s.ordinal + 1, e.tsMs, 1,
                    e.value))
                case None =>
                  cur = Some(SessionState(e.tsMs, 1, e.tsMs, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              if (useTimeout) state.setTimeoutDuration(gapMs)
            }
            closed.reverseIterator
          }
      }
  }
}
