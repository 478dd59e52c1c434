package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def probe = Seq(
    // (key, t, label)
    (1L, 10L, "p10"), (1L, 20L, "p20"), (1L, 35L, "p35"),
    (2L, 5L, "q5"), (3L, 50L, "r50")
  ).toDF("k", "pt", "plabel")

  private def state = Seq(
    // (key, t, value)
    (1L, 10L, "a"), (1L, 30L, "b"),
    (2L, 7L, "x") // after the only probe of key 2
  ).toDF("k", "st", "sval")

  test("backward as-of: most recent state at or before probe time") {
    val out = AsOfJoin.join(probe, state, Seq("k"), "pt", "st")
      .orderBy("k", "pt")
      .select("k", "pt", "plabel", "st", "sval")
      .as[(Long, Long, String, Option[Long], Option[String])]
      .collect().toSeq
    assert(out == Seq(
      // state at exactly t=10 is visible to the probe at t=10 (>=)
      (1L, 10L, "p10", Some(10L), Some("a")),
      (1L, 20L, "p20", Some(10L), Some("a")),
      (1L, 35L, "p35", Some(30L), Some("b")),
      (2L, 5L, "q5", None, None), // only later state → no match
      (3L, 50L, "r50", None, None) // key never has state
    ))
  }

  test("tolerance nulls out stale matches, keeps probe rows") {
    val out = AsOfJoin.join(probe, state, Seq("k"), "pt", "st",
        tolerance = Some(5L))
      .orderBy("k", "pt").select("k", "pt", "sval")
      .as[(Long, Long, Option[String])].collect().toSeq
    assert(out == Seq(
      (1L, 10L, Some("a")), // age 0 <= 5
      (1L, 20L, None), // age 10 > 5
      (1L, 35L, Some("b")), // age 5 <= 5 (inclusive)
      (2L, 5L, None), (3L, 50L, None)))
  }

  test("a state row with a NULL value column wins as a whole row") {
    val st = Seq((1L, 10L, Some("a")), (1L, 30L, None))
      .toDF("k", "st", "sval")
    val pr = Seq((1L, 40L, "p")).toDF("k", "pt", "plabel")
    val out = AsOfJoin.join(pr, st, Seq("k"), "pt", "st")
      .select("st", "sval").as[(Option[Long], Option[String])]
      .collect().toSeq
    // the t=30 row matched (st=30) and its NULL value is NOT backfilled
    // from the older t=10 row — row-wise carry, not per-column
    assert(out == Seq((Some(30L), None)))
  }

  test("bucketed two-pass == single-window on real events (several widths)") {
    val ev = graft.Tables.load(spark, sf(), "events")
    val pr = ev.select(col("event_id"), col("user_id"),
      unix_micros(col("ts")).as("pt"), col("value"))
    val st = ev.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), unix_micros(col("ts")).as("st"))
      .agg(max_by(col("value"), col("event_id")).as("sval"))
    val base = AsOfJoin.join(pr, st, Seq("user_id"), "pt", "st")
      .orderBy("event_id").collect().toSeq
    // widths from "every row its own bucket" to "one giant bucket"
    for (w <- Seq(3600L * 1000000L, 86400L * 1000000L, 1L << 62)) {
      val b = AsOfJoin.joinBucketed(pr, st, Seq("user_id"), "pt", "st", w)
        .orderBy("event_id").collect().toSeq
      assert(b == base, s"bucketWidth=$w diverged")
    }
  }

  test("streaming: probes read latest state; late older state ignored") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import AsOfJoin.{AsOfEvent, AsOfEnriched}
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[AsOfEvent]
    val q = AsOfJoin.streaming(input.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("asof_out").start()
    try {
      // batch 1: state@10 then probes at 5 (before!) and 20 — in-batch
      // re-sort gives the 5-probe nothing, the 20-probe the state
      input.addData(
        AsOfEvent(1L, 20L, isState = false, 2.0),
        AsOfEvent(1L, 10L, isState = true, 1.0),
        AsOfEvent(1L, 5L, isState = false, 9.0))
      q.processAllAvailable()
      // batch 2: newer state, then a probe; plus an OLD duplicate state
      // that must not roll the dimension back
      input.addData(
        AsOfEvent(1L, 30L, isState = true, 3.0),
        AsOfEvent(1L, 8L, isState = true, 99.0), // stale — ignored
        AsOfEvent(1L, 40L, isState = false, 4.0))
      q.processAllAvailable()
      val out = spark.table("asof_out").as[AsOfEnriched]
        .collect().toSeq.sortBy(_.tMicros)
      assert(out == Seq(
        AsOfEnriched(1L, 5L, 9.0, None, None),
        AsOfEnriched(1L, 20L, 2.0, Some(10L), Some(1.0)),
        AsOfEnriched(1L, 40L, 4.0, Some(30L), Some(3.0))))
    } finally q.stop()
  }

  test("watermarked streaming: cross-batch late state enriches an " +
      "earlier-event-time probe; watermark finalizes, carry compacts") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import AsOfJoin.{AsOfEvent, AsOfEnriched}
    implicit val sqlCtx = spark.sqlContext
    def s(sec: Long): Long = sec * 1000000L
    val input = MemoryStream[AsOfEvent]
    val q = AsOfJoin.streamingWatermarked(input.toDS(), "10 seconds")
      .writeStream.outputMode("append")
      .format("memory").queryName("asof_wm_out").start()
    try {
      // batch 1: the probe arrives FIRST; filler key 9 sets wm = 15s,
      // so the 20s probe stays buffered (not final yet)
      input.addData(
        AsOfEvent(1L, s(20), isState = false, 2.0),
        AsOfEvent(9L, s(25), isState = true, 0.0))
      q.processAllAvailable()
      assert(spark.table("asof_wm_out").isEmpty,
        "probe must wait for the watermark, not flush eagerly")
      // batch 2: the state row arrives one batch late but EARLIER in
      // event time (18s < 20s) and strictly inside the lateness bound
      // (wm is 15s — the engine's watermark filter admits it); filler
      // pushes wm to 35s at batch end
      input.addData(
        AsOfEvent(1L, s(18), isState = true, 1.0),
        AsOfEvent(9L, s(45), isState = true, 0.0))
      q.processAllAvailable()
      // batch 3: any batch after the advance fires the flush timer
      input.addData(AsOfEvent(9L, s(46), isState = true, 0.0))
      q.processAllAvailable()
      val out = spark.table("asof_wm_out").as[AsOfEnriched]
        .collect().toSeq.filter(_.key == 1L)
      assert(out == Seq(
        AsOfEnriched(1L, s(20), 2.0, Some(s(18)), Some(1.0))),
        s"late state must re-order under the probe: $out")
    } finally q.stop()
  }

  test("watermarked streaming: idle TTL evicts a drained key's carried " +
      "state; without TTL it persists") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import AsOfJoin.{AsOfEvent, AsOfEnriched}
    implicit val sqlCtx = spark.sqlContext
    def s(sec: Long): Long = sec * 1000000L
    def run(name: String, ttl: Option[Long]): Option[Double] = {
      val input = MemoryStream[AsOfEvent]
      val q = AsOfJoin.streamingWatermarked(input.toDS(), "1 second", ttl)
        .writeStream.outputMode("append")
        .format("memory").queryName(name).start()
      try {
        // state for key 2, then march the watermark far past the TTL
        input.addData(AsOfEvent(2L, s(10), isState = true, 7.0))
        q.processAllAvailable()
        input.addData(AsOfEvent(9L, s(30), isState = true, 0.0))
        q.processAllAvailable() // k=2 drains: committed carry, TTL armed
        input.addData(AsOfEvent(9L, s(100), isState = true, 0.0))
        q.processAllAvailable() // wm ≫ drain + TTL
        input.addData(AsOfEvent(9L, s(101), isState = true, 0.0))
        q.processAllAvailable() // real batch fires the TTL timer (evict)
        input.addData(AsOfEvent(2L, s(200), isState = false, 5.0))
        q.processAllAvailable()
        input.addData(AsOfEvent(9L, s(300), isState = true, 0.0))
        q.processAllAvailable() // wm passes the probe → it finalizes
        input.addData(AsOfEvent(9L, s(301), isState = true, 0.0))
        q.processAllAvailable()
        val rows = spark.table(name).as[AsOfEnriched]
          .collect().toSeq.filter(_.key == 2L)
        assert(rows.map(r => (r.tMicros, r.value)) == Seq((s(200), 5.0)))
        rows.head.stateValue
      } finally q.stop()
    }
    assert(run("asof_ttl_out", Some(5000L)).isEmpty,
      "TTL'd key must forget its carried state")
    assert(run("asof_nottl_out", None).contains(7.0),
      "without TTL the carry is last-known-state forever")
  }

  test("bucketed carry crosses empty buckets") {
    // state in bucket 0, probes in buckets 3 and 7 — carry must span
    // bucket gaps with no rows at all
    val pr = Seq((1L, 35L, "p35"), (1L, 75L, "p75")).toDF("k", "pt", "pl")
    val st = Seq((1L, 2L, "early")).toDF("k", "st", "sv")
    val out = AsOfJoin.joinBucketed(pr, st, Seq("k"), "pt", "st", 10L)
      .orderBy("pt").select("sv").as[Option[String]].collect().toSeq
    assert(out == Seq(Some("early"), Some("early")))
  }
}
