package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class SessionizeSpec extends SparkSpec {
  import spark.implicits._
  import Sessionize._

  test("batch sessions split at inactivity gaps") {
    val gap = 1000L
    val df = Seq(
      (1L, 0L, 1.0), (1L, 500L, 2.0), (1L, 900L, 3.0), // session 1
      (1L, 5000L, 4.0),                                // session 2
      (2L, 0L, 5.0)                                    // other user
    ).toDF("user_id", "ts_ms", "value")
    val out = sessions(df, "user_id", "ts_ms", "value", gap)
      .orderBy("user_id", "session_id")
      .select("user_id", "session_id", "n_events", "total")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(out == Seq((1L, 1L, 3L, 6.0), (1L, 2L, 1L, 4.0), (2L, 1L, 1L, 5.0)))
  }

  test("streaming flatMapGroupsWithState emits closed sessions (guide pattern)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[SessionEvent]
    // useTimeout=false: deterministic (sessions close only via gap events;
    // processing-time timeouts would race processAllAvailable)
    val q = streamingSessions(input.toDS(), gapMs = 1000L, useTimeout = false)
      .writeStream.outputMode("append")
      .format("memory").queryName("sess_out")
      .start()
    try {
      input.addData(SessionEvent(1L, 0L, 1.0), SessionEvent(1L, 500L, 2.0))
      q.processAllAvailable()
      assert(spark.table("sess_out").count() == 0) // session still open
      // a far-future event closes session 1 and opens session 2
      input.addData(SessionEvent(1L, 10000L, 3.0))
      q.processAllAvailable()
      val closed = spark.table("sess_out")
        .as[ClosedSession].collect().toSeq
      assert(closed == Seq(ClosedSession(1L, 1L, 0L, 500L, 2L)))
    } finally q.stop()
  }
}
