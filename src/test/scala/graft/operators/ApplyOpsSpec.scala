package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row

class ApplyOpsSpec extends SparkSpec {
  import spark.implicits._

  private def events = Seq(
    // (pk, commit_lsn, tx_ordinal, payload)
    (1L, 10L, 0L, "a"),
    (1L, 10L, 1L, "b"),   // same tx, later ordinal wins
    (1L, 5L, 9L, "stale"),
    (2L, 7L, 0L, "x"),
    (3L, 1L, 0L, "only")
  ).toDF("pk", "_commit_lsn", "_tx_ordinal", "v")

  test("lastWriterWins keeps highest (commit_lsn, tx_ordinal) per key") {
    val out = ApplyOps.lastWriterWins(events, Seq("pk"),
      Seq("_commit_lsn", "_tx_ordinal"))
      .select("pk", "v").as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "b", 2L -> "x", 3L -> "only"))
    // window variant agrees
    val out2 = ApplyOps.lastWriterWinsWindow(events, Seq("pk"),
      Seq("_commit_lsn", "_tx_ordinal"))
      .select("pk", "v").as[(Long, String)].collect().toMap
    assert(out2 == out)
  }

  test("expandPkChanges: changed key → DELETE(old)+UPSERT(new), stable ordinals") {
    val ev = Seq(
      ("U", 10L, 1L, Some(1L), Some(1L)),  // key unchanged
      ("U", 11L, 0L, Some(2L), Some(9L)),  // key changed
      ("I", 12L, 0L, None, Some(3L))       // insert: no before
    ).toDF("_op", "_commit_lsn", "_tx_ordinal", "bk", "ak")
      .select(col("_op"), col("_commit_lsn"), col("_tx_ordinal"),
        when(col("bk").isNotNull, struct(col("bk").as("k"))).as("before"),
        when(col("ak").isNotNull, struct(col("ak").as("k"))).as("after"))
    val out = ApplyOps.expandPkChanges(ev, Seq("k"))
      .select(col("_op"), col("_commit_lsn"), col("_sub"),
        col("before.k").as("bk"), col("after.k").as("ak"))
      .orderBy("_commit_lsn", "_sub", "_op")
      .collect().toSeq
    assert(out == Seq(
      Row("U", 10L, 0L, 1L, 1L),
      Row("D", 11L, 0L, 2L, null),
      Row("U", 11L, 1L, null, 9L),
      Row("I", 12L, 0L, null, 3L)))
  }

  test("coalescePartials forward-fills missing values in sequence order") {
    val df = Seq(
      (1L, 1L, Some("v1")),
      (1L, 2L, None),        // TOAST-unchanged → keeps v1
      (1L, 3L, Some("v3")),
      (1L, 4L, None),        // keeps v3
      (2L, 1L, None)         // nothing to fill from → stays null
    ).toDF("pk", "lsn", "v")
    val out = ApplyOps.coalescePartials(df, Seq("pk"), Seq("lsn"), Seq("v"))
      .orderBy("pk", "lsn").select("v").as[Option[String]].collect().toSeq
    assert(out == Seq(Some("v1"), Some("v1"), Some("v3"), Some("v3"), None))
  }

  test("planBatches: floor(exclusive prefix sum / budget), order-deterministic") {
    val df = Seq((1L, 40L), (2L, 40L), (3L, 40L), (4L, 100L), (5L, 10L))
      .toDF("lsn", "sz")
    val out = ApplyOps.planBatches(df, Seq("lsn"), "sz", 100L)
      .orderBy("lsn").select("_batch_id").as[Long].collect().toSeq
    // prefix-excl: 0,40,80,120,220 → /100 → 0,0,0,1,2
    assert(out == Seq(0L, 0L, 0L, 1L, 2L))
  }

  test("planBatches plans a backfill-sized frame in parallel, matching " +
      "the sequential reference") {
    val n = 50000
    val rnd = new scala.util.Random(7L)
    val rows = (1 to n).map(i => (i.toLong, 1L + rnd.nextInt(2000).toLong))
    val df = rows.toDF("lsn", "sz").repartition(16) // arbitrary layout in
    // AQE off so the raw exchange partitioning is observable (with AQE on
    // it rightly coalesces this small frame — the property under test is
    // that the PLAN is range-partitioned, not a single-task global sort)
    val out = withSqlConf("spark.sql.adaptive.enabled" -> "false") {
      val o = ApplyOps.planBatches(df, Seq("lsn"), "sz", 64 * 1024L)
      assert(o.rdd.getNumPartitions > 1)
      o
    }
    val got = out.orderBy("lsn").select("lsn", "_batch_id")
      .as[(Long, Long)].collect()
    var prefix = 0L
    rows.sortBy(_._1).zip(got).foreach { case ((lsn, sz), (glsn, bid)) =>
      assert(glsn == lsn)
      assert(bid == prefix / (64 * 1024L), s"lsn $lsn")
      prefix += sz
    }
    // batch ids are non-decreasing in sequence order and start at 0
    assert(got.head._2 == 0L)
  }

  test("snapshotGate filters by per-table snapshot LSN (apply.rs:2844)") {
    val ev = Seq(
      (1L, 5L), (1L, 10L), (1L, 15L),
      (2L, 5L), (2L, 10L),
      (3L, 1L)
    ).toDF("_table", "_commit_lsn")
    val out = ApplyOps.snapshotGate(ev, Map(1L -> 10L, 2L -> 0L))
      .as[(Long, Long)].collect().toSet
    // table 1: >= 10 (inclusive boundary — a tx committing exactly at the
    // snapshot LSN is NOT in the copy); table 2: all; table 3: ungated
    assert(out == Set((1L, 10L), (1L, 15L), (2L, 5L), (2L, 10L), (3L, 1L)))
  }

  test("salted LWW equals plain LWW (skew-resistant two-phase)") {
    val out = ApplyOps.lastWriterWins(events, Seq("pk"),
      Seq("_commit_lsn", "_tx_ordinal"))
      .select("pk", "v").as[(Long, String)].collect().toMap
    val salted = ApplyOps.lastWriterWinsSalted(events, Seq("pk"),
      Seq("_commit_lsn", "_tx_ordinal"), saltBuckets = 4)
      .select("pk", "v").as[(Long, String)].collect().toMap
    assert(salted == out)
    // a hot key with many versions still resolves to the max
    val hot = (1L to 1000L).map(i => (42L, i, 0L, s"v$i"))
      .toDF("pk", "_commit_lsn", "_tx_ordinal", "v")
    val hotOut = ApplyOps.lastWriterWinsSalted(hot, Seq("pk"),
      Seq("_commit_lsn", "_tx_ordinal"), saltBuckets = 8)
      .select("v").as[String].collect().toSeq
    assert(hotOut == Seq("v1000"))
  }

  test("maskedLastWriterWins: sequential semantics for mixed full/partial rows") {
    // key 1: full update then partial (name masked) — name must come
    // from the SAME-batch full update, not pre-batch storage;
    // key 2: a real null written by an unmasked row is preserved;
    // key 3: only masked rows → column unresolved → residual mask
    val ev2 = Seq(
      (1L, 1L, "I", Option("new"), 30, Option.empty[String]),
      (1L, 2L, "U", Option.empty[String], 31, Option("name")),
      (2L, 1L, "I", Option("x"), 40, Option.empty[String]),
      (2L, 2L, "U", Option.empty[String], 41, Option.empty[String]),
      (3L, 1L, "U", Option.empty[String], 50, Option("name"))
    ).toDF("pk", "_commit_lsn", "_op", "name", "age", "_missing")
      .withColumn("_tx_ordinal", lit(0L))
    val out = ApplyOps.maskedLastWriterWins(ev2, Seq("pk"),
      Seq("_commit_lsn", "_tx_ordinal"), Seq("name", "age"))
      .select("pk", "name", "age", "_missing")
      .as[(Long, Option[String], Int, Option[String])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(1L) == ((Some("new"), 31, None)))  // filled from in-batch full row
    assert(out(2L) == ((None, 41, None)))          // real null kept, no mask
    assert(out(3L) == ((None, 50, Some("name")))) // still missing → residual mask
  }

  test("typed LwwAggregator agrees with the DataFrame max_by path (§2.9)") {
    import graft.core.SequenceKey
    import graft.operators.ApplyOpsSpec.Ev
    val data = Seq(Ev(1, 10, 0, "a"), Ev(1, 10, 1, "b"), Ev(1, 5, 9, "stale"),
      Ev(2, 7, 0, "x"), Ev(3, 1, 0, "only"))
    val ds = spark.createDataset(data)(org.apache.spark.sql.Encoders.product[Ev])
    val agg = graft.operators.LwwAggregator[Ev](e => SequenceKey(e.lsn, e.ord))(
      org.apache.spark.sql.Encoders.product[Ev])
    val typed = ds.groupByKey(_.pk)(org.apache.spark.sql.Encoders.scalaLong)
      .agg(agg.toColumn).collect().map { case (k, e) => k -> e.v }.toMap
    assert(typed == Map(1L -> "b", 2L -> "x", 3L -> "only"))
  }

  test("schemaVersionsInBatch returns sorted distinct versions") {
    val ev = Seq((20L), (10L), (20L), (30L)).toDF("_schema_lsn")
    assert(ApplyOps.schemaVersionsInBatch(ev) == Seq(10L, 20L, 30L))
  }
}

object ApplyOpsSpec {
  case class Ev(pk: Long, lsn: Long, ord: Long, v: String)
}
