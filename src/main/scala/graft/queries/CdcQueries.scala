package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables
import graft.operators.ApplyOps
import graft.sinks.CurrentStateSink

/** CDC-semantics queries: the driver testdata has no live Postgres, so the
  * `events` table plays the WAL role (FIXTURES.md §B maps it to the CDC
  * stream role): `event_id` = LSN (already totally ordered), `user_id` = the
  * replicated table's primary key, and `event_type` maps onto change ops
  * (signup→Insert, purchase/view/click→Update, error→Delete). Each query
  * drives a REAL operator from graft.operators / graft.sinks and has an
  * equivalent ANSI-SQL oracle.
  */
object CdcQueries {

  /** event_type → change op (used consistently across queries + oracles). */
  private val opExpr = when(col("event_type") === "signup", "I")
    .when(col("event_type") === "error", "D")
    .otherwise("U")
  private val opSqlCase =
    "CASE WHEN event_type = 'signup' THEN 'I' WHEN event_type = 'error' THEN 'D' ELSE 'U' END"

  /** P4 — event-type routing: dispatch by op, count per route (the
    * reference's message-type dispatch, apply.rs:2080-2127). */
  def route(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "events")
      .withColumn("op", opExpr)
      .groupBy("op")
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(9, 2))).cast(DoubleType).as("total"))
      .orderBy("op")

  val routeSql: String = s"""
    SELECT $opSqlCase AS op, COUNT(*) AS n,
      CAST(SUM(CAST(value AS DECIMAL(9,2))) AS DOUBLE) AS total
    FROM events GROUP BY 1 ORDER BY op"""

  /** A1 — last-writer-wins dedup: one row per key, highest sequence key
    * wins (ApplyOps.lastWriterWins; reference event.rs:321-375 +
    * clickhouse/core.rs:93-110). */
  def lwwDedup(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(spark, dir, "events")
      .select("user_id", "event_id", "event_type", "value", "props")
    ApplyOps.lastWriterWins(ev, Seq("user_id"), Seq("event_id"))
      .orderBy("user_id")
  }

  val lwwDedupSql: String = """
    SELECT user_id, event_id, event_type, value, props FROM (
      SELECT user_id, event_id, event_type, value, props,
        ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
      FROM events) t
    WHERE rn = 1 ORDER BY user_id"""

  /** J1 — primary-key-change expansion: updates whose key changed become
    * DELETE(old) + UPSERT(new) (ApplyOps.expandPkChanges; reference
    * bigquery/core.rs:1425-1475). 'purchase' events act as updates; the new
    * key deterministically shifts by +1000 when value > 100. */
  def pkChange(spark: SparkSession, dir: String): DataFrame = {
    val upd = Tables.load(spark, dir, "events")
      .filter(col("event_type") === "purchase")
      .select(
        lit("U").as("_op"),
        lit(0L).as("_table"),
        col("event_id").as("_commit_lsn"),
        col("event_id").as("_start_lsn"),
        lit(0L).as("_tx_ordinal"),
        lit(0L).as("_schema_lsn"),
        struct(col("user_id").as("k")).as("before"),
        struct(when(col("value") > 100, col("user_id") + 1000)
          .otherwise(col("user_id")).as("k")).as("after"))
    ApplyOps.expandPkChanges(upd, Seq("k"))
      .select(col("_op").as("op"), col("before.k").as("old_k"),
        col("after.k").as("new_k"), col("_commit_lsn").as("event_id"),
        col("_sub").as("sub"))
      .orderBy("event_id", "sub")
  }

  val pkChangeSql: String = """
    WITH u AS (
      SELECT event_id, user_id AS old_k,
        CASE WHEN value > 100 THEN user_id + 1000 ELSE user_id END AS new_k
      FROM events WHERE event_type = 'purchase')
    SELECT 'U' AS op, old_k, new_k, event_id, CAST(0 AS BIGINT) AS sub
      FROM u WHERE old_k = new_k
    UNION ALL
    SELECT 'D' AS op, old_k, CAST(NULL AS BIGINT) AS new_k, event_id, CAST(0 AS BIGINT) AS sub
      FROM u WHERE old_k <> new_k
    UNION ALL
    SELECT 'U' AS op, CAST(NULL AS BIGINT) AS old_k, new_k, event_id, CAST(1 AS BIGINT) AS sub
      FROM u WHERE old_k <> new_k
    ORDER BY event_id, sub"""

  /** ST6 — TOAST partial-row coalesce: 'click' events carry an unchanged
    * (missing) value column; the applied value forward-fills from the most
    * recent present value per key in sequence order
    * (ApplyOps.coalescePartials; reference table_row.rs:68-143). Output:
    * final filled state per key. */
  def toastCoalesce(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(spark, dir, "events")
      .withColumn("v", when(col("event_type") =!= "click", col("value")))
      .select("user_id", "event_id", "v")
    val filled = ApplyOps.coalescePartials(ev, Seq("user_id"),
      Seq("event_id"), Seq("v"))
    ApplyOps.lastWriterWins(filled, Seq("user_id"), Seq("event_id"))
      .select("user_id", "event_id", "v")
      .orderBy("user_id")
  }

  val toastCoalesceSql: String = """
    SELECT user_id, event_id, v FROM (
      SELECT user_id, event_id,
        LAST_VALUE(CASE WHEN event_type <> 'click' THEN value END IGNORE NULLS)
          OVER (PARTITION BY user_id ORDER BY event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v,
        ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
      FROM events) t
    WHERE rn = 1 ORDER BY user_id"""

  /** ST1 — micro-batch planning by byte budget: deterministic batch
    * assignment from an exclusive prefix sum of payload sizes
    * (ApplyOps.planBatches; reference EventBatch apply.rs:633-696 +
    * batch_budget.rs). Output: per-batch row/byte accounting. */
  def batchPlan(spark: SparkSession, dir: String): DataFrame = {
    val sized = Tables.load(spark, dir, "events")
      .withColumn("sz", (length(col("props")) + lit(32)).cast(LongType))
      .select("event_id", "sz")
    ApplyOps.planBatches(sized, Seq("event_id"), "sz", 4096L)
      .groupBy(col("_batch_id").as("batch_id"))
      .agg(count(lit(1)).as("n"), sum("sz").as("bytes"))
      .orderBy("batch_id")
  }

  val batchPlanSql: String = """
    SELECT batch_id, COUNT(*) AS n, CAST(SUM(sz) AS BIGINT) AS bytes FROM (
      SELECT CAST(FLOOR((SUM(sz) OVER (ORDER BY event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - sz) / 4096) AS BIGINT) AS batch_id,
             sz
      FROM (SELECT event_id, CAST(LENGTH(props) + 32 AS BIGINT) AS sz FROM events) s) t
    GROUP BY batch_id ORDER BY batch_id"""

  /** ST4 — backfill↔stream handoff gate: each "table" (event_type bucket)
    * has a snapshot LSN; only events with commit_lsn >= snapshot pass
    * (ApplyOps.snapshotGate; reference apply.rs:2844-2867 — SURVEY calls
    * this the correctness heart). Snapshot LSN per table is derived
    * deterministically as floor((min+max)/2) of its event ids. */
  def snapshotGate(spark: SparkSession, dir: String): DataFrame = {
    val tblExpr = when(col("event_type") === "signup", 1L)
      .when(col("event_type") === "click", 2L)
      .when(col("event_type") === "view", 3L)
      .when(col("event_type") === "purchase", 4L)
      .otherwise(5L)
    val ev = Tables.load(spark, dir, "events")
      .withColumn("_table", tblExpr)
      .withColumn("_commit_lsn", col("event_id"))
    // gates are per-table metadata (a handful of rows) — driver-side, like
    // the reference's table-state map
    val gates = ev.groupBy("_table")
      .agg(floor((min("event_id") + max("event_id")) / 2.0).as("snap"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    ApplyOps.snapshotGate(ev, gates)
      .groupBy(col("_table").as("tbl"))
      .agg(count(lit(1)).as("n"), min("event_id").as("min_lsn"),
        max("event_id").as("max_lsn"))
      .orderBy("tbl")
  }

  val snapshotGateSql: String = """
    WITH e AS (
      SELECT event_id,
        CASE event_type WHEN 'signup' THEN 1 WHEN 'click' THEN 2
          WHEN 'view' THEN 3 WHEN 'purchase' THEN 4 ELSE 5 END AS tbl
      FROM events),
    g AS (
      SELECT tbl, CAST(FLOOR((MIN(event_id) + MAX(event_id)) / 2.0) AS BIGINT) AS snap
      FROM e GROUP BY tbl)
    SELECT e.tbl, COUNT(*) AS n, MIN(event_id) AS min_lsn, MAX(event_id) AS max_lsn
    FROM e JOIN g ON e.tbl = g.tbl
    WHERE e.event_id >= g.snap
    GROUP BY e.tbl ORDER BY e.tbl"""

  /** End-to-end pipeline (M2+M3 slice): backfill `customer` into a keyed
    * current-state GraftTable, then apply the `events` stream as four
    * sequential CDC micro-batches (upserts + deletes, merged by key with
    * last-writer-wins + the idempotent high-water mark), then read the
    * final state. The oracle expresses the same end state relationally.
    * Exercises: CurrentStateSink, GraftTable.merge (bucket-pruned
    * copy-on-write), ApplyOps.lastWriterWins, sequence keys. */
  def pipelineE2e(spark: SparkSession, dir: String): DataFrame = {
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-e2e").toString
    val sink = new CurrentStateSink(tmp, _ => Seq("key"), nBuckets = 16)

    val base = Tables.load(spark, dir, "customer").select(
      col("c_custkey").as("key"), col("c_acctbal").as("val"),
      col("c_name").as("name"))
    sink.writeTableRows("state", base)

    val ev = Tables.load(spark, dir, "events").select(
        col("user_id").as("key"), col("value").as("val"),
        lit(null).cast(StringType).as("name"),
        opExpr.as("_op"),
        col("event_id").as("_commit_lsn"), lit(0L).as("_tx_ordinal"))
      .localCheckpoint(eager = false) // read once, 5 batch filters reuse
    val maxId = ev.agg(max("_commit_lsn")).collect()(0).getLong(0)
    def batchOf(i: Int) =
      ev.filter(floor(col("_commit_lsn") * 4 / (maxId + 1)) === i)
    (0 until 4).foreach(i => sink.writeEvents("state", batchOf(i)))
    // replay the last batch — the high-water mark must make it a no-op
    sink.writeEvents("state", batchOf(3))

    sink.read(spark, "state").orderBy("key")
  }

  /** Full streaming path (S2/ST1-ST3): render the events table as a WAL
    * change log, stream it through the DSv2 graft-cdc source under a real
    * StreamingQuery (admission-capped micro-batches, LSN-offset
    * checkpointing), apply through the pipeline into a current-state
    * table, and return the drained final state. The time of this query at
    * bench SF ≈ end-to-end CDC events/sec (the reference's streaming
    * benchmark metric). The oracle is the relational LWW of the same
    * events. */
  def streamApply(spark: SparkSession, dir: String): DataFrame = {
    import graft.core.{ColumnSpec, SchemaRegistry, TableSchemaV}
    import graft.pipeline.{CdcPipeline, PipelineConfig, TableState}
    val tmp = java.nio.file.Files.createTempDirectory("graft-stream").toString

    // WAL from the events table: op mapping as elsewhere, PACKED payloads
    // (the live decoder's hot-path format — cells in schema order
    // (key, val), 0x1F-separated; see graft.core.PackedRow)
    val sep = lit(graft.core.PackedRow.Sep.toString)
    val wal = Tables.load(spark, dir, "events")
      .withColumn("op", opExpr)
      .select(col("event_id"), concat(
        col("event_id").cast(StringType), lit("\t0\t"), col("op"),
        lit("\t1\t"), col("event_id").cast(StringType), lit("\t0\t"),
        when(col("op") === "D",
          concat(lit("="), col("user_id"), sep, lit("\\N")))
          .otherwise(lit("\\N")),
        lit("\t"),
        when(col("op") =!= "D",
          concat(lit("="), col("user_id"), sep, col("value")))
          .otherwise(lit("\\N"))).as("line"))
      .orderBy("event_id").select("line")
    wal.coalesce(1).write.text(s"$tmp/wal")
    val part = new java.io.File(s"$tmp/wal").listFiles()
      .find(_.getName.endsWith(".txt")).get
    val log = s"$tmp/wal.log"
    java.nio.file.Files.move(part.toPath, java.nio.file.Paths.get(log))

    val registry = new SchemaRegistry
    registry.put(TableSchemaV(1L, "state", 0L, IndexedSeq(
      ColumnSpec("key", "int8", nullable = false, pkOrdinal = 1),
      ColumnSpec("val", "float8"))))
    val sink = new CurrentStateSink(s"$tmp/tables", _ => Seq("key"), 16)
    val pipeline = new CdcPipeline(spark,
      PipelineConfig(maxRowsPerTrigger = 50000, maxFillMs = 50,
        checkpointDir = s"$tmp/ckpt", stateDir = s"$tmp/state"),
      registry, sink, CdcPipeline.jsonDecode)
    pipeline.stateStore.force(1L, TableState.Ready)
    val q = pipeline.startStream(log)
    q.processAllAvailable()
    q.stop()
    sink.read(spark, "state").orderBy("key")
  }

  /** Full-SchemaDiff destination evolution (reference apply_schema_diff,
    * bigquery/core.rs:803-946; ordinal-keyed diff, etl/src/schema.rs:
    * 587-651): backfill `customer` as (key, val, name), then a
    * MID-STREAM DDL renames val→amount (same attnum) and DROPS name,
    * and every event lands under the NEW column. The oracle replays the
    * final state relationally — if the rename forked the column (the
    * old name-keyed add+drop behavior), pre-rename balances would
    * surface as NULL `amount` and the extra `val`/`name` columns would
    * fail the schema compare. */
  def pipelineRename(spark: SparkSession, dir: String): DataFrame = {
    import graft.core.{ColumnSpec, SchemaRegistry, TableSchemaV}
    import graft.pipeline.{CdcPipeline, PipelineConfig, TableState}
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-rename").toString

    val registry = new SchemaRegistry
    registry.put(TableSchemaV(1L, "state", 0L, IndexedSeq(
      ColumnSpec("key", "int8", nullable = false, pkOrdinal = 1,
        ordinal = 1),
      ColumnSpec("val", "float8", ordinal = 2),
      ColumnSpec("name", "text", ordinal = 3))))
    val sink = new CurrentStateSink(s"$tmp/tables", _ => Seq("key"), 16)
    sink.writeTableRows("state", Tables.load(spark, dir, "customer")
      .select(col("c_custkey").as("key"),
        col("c_acctbal").cast("double").as("val"),
        col("c_name").as("name")))

    // WAL: the RENAME+DROP Relation record at lsn 1 (pure-DDL commit),
    // then every event SHIFTED to lsn = event_id + 1 at schema version
    // 1, packed as the post-DDL column set (key, amount)
    val renameJson = """{"table":"state","cols":[""" +
      """{"name":"key","type":"int8","nullable":false,"pk":1,"ord":1},""" +
      """{"name":"amount","type":"float8","ord":2}]}"""
    val ddlLine = graft.sources.CdcLogSource.renderLine(
      "R", 1L, 1L, 1L, 0L, 1L, None, Some(renameJson))
    val sep = lit(graft.core.PackedRow.Sep.toString)
    val evLines = Tables.load(spark, dir, "events")
      .withColumn("op", opExpr)
      .withColumn("lsn", col("event_id") + 1)
      .select(col("lsn"), concat(
        col("lsn").cast(StringType), lit("\t0\t"), col("op"),
        lit("\t1\t"), col("lsn").cast(StringType), lit("\t1\t"),
        when(col("op") === "D",
          concat(lit("="), col("user_id"), sep, lit("\\N")))
          .otherwise(lit("\\N")),
        lit("\t"),
        when(col("op") =!= "D",
          concat(lit("="), col("user_id"), sep, col("value")))
          .otherwise(lit("\\N"))).as("line"))
    val wal = spark.range(1)
      .select(lit(1L).as("lsn"), lit(ddlLine).as("line"))
      .unionByName(evLines)
      .orderBy("lsn").select("line")
    wal.coalesce(1).write.text(s"$tmp/wal")
    val part = new java.io.File(s"$tmp/wal").listFiles()
      .find(_.getName.endsWith(".txt")).get
    val log = s"$tmp/wal.log"
    java.nio.file.Files.move(part.toPath, java.nio.file.Paths.get(log))

    val pipeline = new CdcPipeline(spark,
      PipelineConfig(maxRowsPerTrigger = 50000, maxFillMs = 50,
        checkpointDir = s"$tmp/ckpt", stateDir = s"$tmp/state"),
      registry, sink, CdcPipeline.jsonDecode)
    pipeline.stateStore.force(1L, TableState.Ready)
    val q = pipeline.startStream(log)
    q.processAllAvailable()
    q.stop()
    sink.read(spark, "state").orderBy("key")
  }

  /** D1/J2 — PRIMARY-KEY column rename mid-stream, with the DDL landing
    * in the MIDDLE of the event stream so pre-rename slices (old key
    * name `key`) and post-rename slices (`uid`) coexist in one run —
    * the destination applies the rename as a zero-movement mapping
    * commit, the sink re-derives its merge key from the registry, and
    * the pipeline aligns pre-rename slices to the new key name before
    * they merge (the reference renames ANY column, PK included:
    * bigquery/core.rs:803-946). Oracle: the same LWW replay as the
    * other d1 gates — a rename never changes values, only the output
    * column name. */
  def pipelinePkRename(spark: SparkSession, dir: String): DataFrame = {
    import graft.core.{ColumnSpec, SchemaRegistry, TableSchemaV}
    import graft.pipeline.{CdcPipeline, PipelineConfig, TableState}
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-pkrename").toString

    val registry = new SchemaRegistry
    registry.put(TableSchemaV(1L, "state", 0L, IndexedSeq(
      ColumnSpec("key", "int8", nullable = false, pkOrdinal = 1,
        ordinal = 1),
      ColumnSpec("val", "float8", ordinal = 2))))
    // registry-backed keysOf (the Replicator wiring): after the rename
    // registers, fresh table handles merge on the NEW key name
    val sink = new CurrentStateSink(s"$tmp/tables",
      name => registry.tables.flatMap(registry.latest)
        .find(_.tableName == name).map(_.primaryKey)
        .getOrElse(Seq("key")), 16)
    sink.writeTableRows("state", Tables.load(spark, dir, "customer")
      .select(col("c_custkey").as("key"),
        col("c_acctbal").cast("double").as("val")))

    // events at lsn 2*event_id+2 (even); the key-rename DDL at the odd
    // lsn 2*mid+3 splits the stream: event_id <= mid decodes at schema
    // 0 (old key name), event_id > mid at the renamed version
    val maxId = Tables.load(spark, dir, "events")
      .agg(max(col("event_id"))).collect()(0).getLong(0)
    val mid = maxId / 2
    val ddlLsn = 2 * mid + 3
    val renameJson = """{"table":"state","cols":[""" +
      """{"name":"uid","type":"int8","nullable":false,"pk":1,"ord":1},""" +
      """{"name":"val","type":"float8","ord":2}]}"""
    val ddlLine = graft.sources.CdcLogSource.renderLine(
      "R", 1L, ddlLsn, ddlLsn, 0L, ddlLsn, None, Some(renameJson))
    val sep = lit(graft.core.PackedRow.Sep.toString)
    val evLines = Tables.load(spark, dir, "events")
      .withColumn("op", opExpr)
      .withColumn("lsn", col("event_id") * 2 + 2)
      .withColumn("slsn",
        when(col("event_id") <= mid, lit(0L)).otherwise(lit(ddlLsn)))
      .select(col("lsn"), concat(
        col("lsn").cast(StringType), lit("\t0\t"), col("op"),
        lit("\t1\t"), col("lsn").cast(StringType), lit("\t"),
        col("slsn").cast(StringType), lit("\t"),
        when(col("op") === "D", concat(lit("="), col("user_id")))
          .otherwise(lit("\\N")),
        lit("\t"),
        when(col("op") =!= "D",
          concat(lit("="), col("user_id"), sep, col("value")))
          .otherwise(lit("\\N"))).as("line"))
    val wal = spark.range(1)
      .select(lit(ddlLsn).as("lsn"), lit(ddlLine).as("line"))
      .unionByName(evLines)
      .orderBy("lsn").select("line")
    wal.coalesce(1).write.text(s"$tmp/wal")
    val part = new java.io.File(s"$tmp/wal").listFiles()
      .find(_.getName.endsWith(".txt")).get
    val log = s"$tmp/wal.log"
    java.nio.file.Files.move(part.toPath, java.nio.file.Paths.get(log))

    val pipeline = new CdcPipeline(spark,
      PipelineConfig(maxRowsPerTrigger = 50000, maxFillMs = 50,
        checkpointDir = s"$tmp/ckpt", stateDir = s"$tmp/state"),
      registry, sink, CdcPipeline.jsonDecode)
    pipeline.stateStore.force(1L, TableState.Ready)
    val q = pipeline.startStream(log)
    q.processAllAvailable()
    q.stop()
    sink.read(spark, "state").orderBy("uid")
  }

  val pipelinePkRenameSql: String = """
    WITH last AS (
      SELECT user_id, event_type, value FROM (
        SELECT user_id, event_type, value,
          ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
        FROM events) t WHERE rn = 1)
    SELECT COALESCE(l.user_id, b.c_custkey) AS uid,
      CAST(CASE WHEN l.user_id IS NOT NULL THEN l.value
                ELSE b.c_acctbal END AS DOUBLE) AS val
    FROM customer b FULL OUTER JOIN last l ON b.c_custkey = l.user_id
    WHERE l.event_type IS NULL OR l.event_type <> 'error'
    ORDER BY uid"""

  val pipelineRenameSql: String = """
    WITH last AS (
      SELECT user_id, event_type, value FROM (
        SELECT user_id, event_type, value,
          ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
        FROM events) t WHERE rn = 1)
    SELECT COALESCE(l.user_id, b.c_custkey) AS key,
      CAST(CASE WHEN l.user_id IS NOT NULL THEN l.value
                ELSE b.c_acctbal END AS DOUBLE) AS amount
    FROM customer b FULL OUTER JOIN last l ON b.c_custkey = l.user_id
    WHERE l.event_type IS NULL OR l.event_type <> 'error'
    ORDER BY key"""

  val streamApplySql: String = """
    SELECT user_id AS key, value AS val FROM (
      SELECT user_id, value, event_type,
        ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
      FROM events) t
    WHERE rn = 1 AND event_type <> 'error'
    ORDER BY key"""

  val pipelineE2eSql: String = """
    WITH last AS (
      SELECT user_id, event_type, value FROM (
        SELECT user_id, event_type, value,
          ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
        FROM events) t WHERE rn = 1)
    SELECT COALESCE(l.user_id, b.c_custkey) AS key,
      CASE WHEN l.user_id IS NOT NULL THEN l.value ELSE b.c_acctbal END AS val,
      CASE WHEN l.user_id IS NOT NULL THEN CAST(NULL AS VARCHAR) ELSE b.c_name END AS name
    FROM customer b FULL OUTER JOIN last l ON b.c_custkey = l.user_id
    WHERE l.event_type IS NULL OR l.event_type <> 'error'
    ORDER BY key"""
}
