package graft.sinks

import graft.SparkSpec
import java.nio.file.Files
import scala.math.Ordering.Implicits._

/** Model-based differential test for the external-engine sink: a random
  * op stream (event batches with overlapping/stale sequence ranges,
  * TOAST-masked batches, exact replays, truncates, backfills) runs
  * against BOTH a real embedded-Derby JdbcSink and a driver-side model
  * of the apply contract (in-batch masked forward-fill, engine-held
  * batch cursor, per-row seq-guarded LWW, residual masks keep
  * engine-stored values). After every step the engine's read-back must
  * equal the model — catches cursor/guard/mask interactions (late
  * events after truncate, stale rows inside fresh batches, replayed
  * masked batches) that scenario tests don't reach. Deterministic
  * seeds.
  *
  * Stale-lsn dips appear only in UNMASKED batches: an unseen masked
  * event below the durable cursor would violate the CDC contract (the
  * cursor's premise is that everything at-or-below it was applied), and
  * in-batch mask fills legitimately read those already-applied rows. */
class JdbcSinkModelSpec extends SparkSpec {
  import spark.implicits._

  // (key, value, op, lsn, ordinal, mask-or-null)
  private type Ev = (Long, Double, String, Long, Long, String)
  private final case class MRow(v: Option[Double], seq: (Long, Long))

  private def runScenario(seed: Long, steps: Int,
      urlPrefix: String = "jdbc:derby:"): Unit = {
    val rnd = new scala.util.Random(seed)
    val tmp = Files.createTempDirectory(s"graft-jdbc-model-$seed").toString
    val sink = new JdbcSink(s"$urlPrefix$tmp/db;create=true", _ => Seq("key"))
    sink.startup(spark)

    val model = scala.collection.mutable.Map.empty[Long, MRow]
    var hw: Option[(Long, Long)] = None // engine-held batch cursor
    var maxLsn = 0L
    val applied = scala.collection.mutable.ArrayBuffer.empty[Seq[Ev]]
    var tableLive = false
    // a real WAL never emits two events at the same (lsn, ordinal) with
    // different content — LWW between exact seq ties is rightly
    // unspecified on both sides, so ordinals are globally unique here
    var ord = 0L

    def events(rows: Seq[Ev]) =
      rows.toDF("key", "val", "_op", "_commit_lsn", "_tx_ordinal", "_missing")

    def applyModel(rows: Seq[Ev]): Unit = {
      // the sink resolves masks + LWW over the WHOLE batch, then the
      // cursor gate drops stale WINNERS; with unique seqs and fills
      // confined to fresh batches this equals: per key, forward-fill
      // masked values in seq order, take the last row, gate, guard
      var bMax: Option[(Long, Long)] = None
      rows.groupBy(_._1).foreach { case (k, g) =>
        val sorted = g.sortBy { case (_, _, _, l, o, _) => (l, o) }
        var fill: Option[Double] = None
        sorted.foreach { case (_, v, _, _, _, m) =>
          if (m == null || !m.split(",").contains("val")) fill = Some(v) }
        val (_, v, op, l, o, m) = sorted.last
        val masked = m != null && m.split(",").contains("val")
        val resolved = if (masked) fill else Some(v)
        if (hw.forall(h => (l, o) > h)) {
          val newer = model.get(k).forall(_.seq < ((l, o)))
          if (newer) {
            if (op == "D") model.remove(k)
            else if (resolved.isDefined) model(k) = MRow(resolved, (l, o))
            else model(k) = MRow(model.get(k).flatMap(_.v), (l, o))
          }
        }
      }
      rows.foreach { case (_, _, _, l, o, _) =>
        if (hw.forall(h => (l, o) > h) &&
            bMax.forall(b => (l, o) > b)) bMax = Some((l, o)) }
      bMax.foreach(b => hw = Some(hw.fold(b)(h => if (b > h) b else h)))
    }

    def check(step: String): Unit = {
      if (!tableLive) return
      val got = sink.read(spark, "state")
        .select("key", "val").as[(Long, Option[Double])].collect().toMap
      val want = model.map { case (k, r) => k -> r.v }.toMap
      assert(got == want, s"seed=$seed diverged after $step: " +
        s"got=${got.toSeq.sortBy(_._1)} want=${want.toSeq.sortBy(_._1)}")
    }

    def freshRow(masked: Boolean): Ev = {
      maxLsn += rnd.nextInt(3)
      ord += 1
      (rnd.nextInt(20).toLong, rnd.nextInt(1000) * 1.0,
        if (!masked && rnd.nextInt(5) == 0) "D" else "U", maxLsn, ord,
        if (masked) "val" else null)
    }

    (0 until steps).foreach { step =>
      rnd.nextInt(10) match {
        case 0 => // backfill: full reload, cursor rotates with the data
          val snap = (0L until (1 + rnd.nextInt(8)))
            .map(i => (rnd.nextInt(20).toLong, rnd.nextInt(100) * 1.0))
            .distinctBy(_._1)
          sink.writeTableRows("state", snap.toDF("key", "val"))
          model.clear()
          snap.foreach { case (k, v) => model(k) = MRow(Some(v), (-1L, -1L)) }
          hw = None
          tableLive = true
          applied.clear()
          check(s"$step-backfill")
        case 1 if tableLive => // truncate rotates the cursor too
          sink.truncateTable("state")
          model.clear()
          hw = None
          applied.clear()
          check(s"$step-truncate")
        case 2 if applied.nonEmpty => // exact replay of an old batch
          val b = applied(rnd.nextInt(applied.size))
          sink.writeEvents("state", events(b))
          applyModel(b)
          check(s"$step-replay")
        case 3 if tableLive => // masked batch: strictly fresh lsns
          val rows = (0 until (1 + rnd.nextInt(8)))
            .map(_ => freshRow(masked = rnd.nextInt(5) < 2))
          sink.writeEvents("state", events(rows))
          applyModel(rows)
          applied += rows
          check(s"$step-masked")
        case _ if tableLive => // unmasked batch; lsns may dip stale
          val lo = math.max(1L, maxLsn - rnd.nextInt(6))
          val rows = (0 until (1 + rnd.nextInt(10))).map { _ =>
            val l = lo + rnd.nextInt(8)
            maxLsn = math.max(maxLsn, l)
            ord += 1
            (rnd.nextInt(20).toLong, rnd.nextInt(1000) * 1.0,
              if (rnd.nextInt(5) == 0) "D" else "U", l, ord,
              null: String)
          }
          sink.writeEvents("state", events(rows))
          applyModel(rows)
          applied += rows
          check(s"$step-batch")
        case _ => () // table not live yet and op needs it — skip
      }
    }
  }

  test("random op sequences match the apply-contract model (3 seeds)") {
    Seq(11L, 23L, 47L).foreach(runScenario(_, steps = 14))
  }

  test("the same model contract holds on the PostgreSQL dialect — " +
      "MERGE passthrough at major 16 and the transpiled " +
      "INSERT-ON-CONFLICT pair at major 14") {
    PgEmulatingJdbc.register()
    Seq(11L, 23L).foreach(
      runScenario(_, steps = 14, urlPrefix = PgEmulatingJdbc.Prefix))
    Seq(11L, 23L).foreach(
      runScenario(_, steps = 14, urlPrefix = PgEmulatingJdbc.Prefix14))
  }
}
