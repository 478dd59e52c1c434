package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables
import graft.sinks.{ChangelogSink, CurrentStateSink}

/** Sink-path queries: each runs a real sink end-to-end and emits a
  * result the DuckDB oracle can recompute relationally. */
object SinkQueries {
  private def dec92(c: String) = col(c).cast(DecimalType(9, 2))

  /** S1/D1 copy throughput: full snapshot backfill of `lineitem` into a
    * bucketed GraftTable (the reference's table-copy benchmark metric is
    * rows / copy-seconds — this query's bench time at sf0.1 is exactly
    * that for 600k rows), then read the loaded table back and aggregate.
    * The oracle aggregates the source directly, so any row lost or
    * duplicated by the copy path breaks the hash. */
  def copyThroughput(spark: SparkSession, dir: String): DataFrame = {
    val tmp = java.nio.file.Files.createTempDirectory("graft-copy").toString
    val sink = new CurrentStateSink(tmp,
      _ => Seq("l_orderkey", "l_linenumber"), nBuckets = 32)
    sink.writeTableRows("lineitem", Tables.load(spark, dir, "lineitem"))
    sink.read(spark, "lineitem")
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum(dec92("l_quantity")).cast(DoubleType).as("qty"),
        sum(dec92("l_extendedprice")).cast(DoubleType).as("price"))
      .orderBy("l_returnflag")
  }

  val copyThroughputSql: String = """
    SELECT l_returnflag, COUNT(*) AS n,
      CAST(SUM(CAST(l_quantity AS DECIMAL(9,2))) AS DOUBLE) AS qty,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(9,2))) AS DOUBLE) AS price
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""

  /** D3/D5 changelog shape: append the events stream as a changelog
    * (cdc_operation + sequence_number columns, offset-token high-water),
    * then read the `latest` current-state VIEW — the ClickHouse
    * ReplacingMergeTree-FINAL pattern. Oracle = relational LWW minus
    * deletes. */
  def changelogLatest(spark: SparkSession, dir: String): DataFrame = {
    val tmp = java.nio.file.Files.createTempDirectory("graft-clog").toString
    val sink = new ChangelogSink(tmp)
    val opExpr = when(col("event_type") === "signup", "I")
      .when(col("event_type") === "error", "D").otherwise("U")
    val ev = Tables.load(spark, dir, "events").select(
        col("user_id").as("key"), col("value").as("val"),
        opExpr.as("_op"), col("event_id").as("_commit_lsn"),
        lit(0L).as("_tx_ordinal"))
      .localCheckpoint(eager = false) // scanned by max-id + 3 writes
    // two appends + one replay of the first (high-water must ignore it)
    val mid = ev.agg(max("_commit_lsn")).collect()(0).getLong(0) / 2
    sink.writeEvents("state", ev.filter(col("_commit_lsn") <= mid))
    sink.writeEvents("state", ev.filter(col("_commit_lsn") > mid))
    sink.writeEvents("state", ev.filter(col("_commit_lsn") <= mid)) // replay
    sink.latest(spark, "state", Seq("key")).orderBy("key")
  }

  val changelogLatestSql: String = """
    SELECT user_id AS key, value AS val FROM (
      SELECT user_id, value, event_type,
        ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
      FROM events) t
    WHERE rn = 1 AND event_type <> 'error'
    ORDER BY key"""

  /** D4/time travel: backfill customer into a GraftTable (snapshot v0),
    * merge a CDC batch on top (v1), then read v0 back THROUGH the SQL
    * TVF `graft_table_version` — the oracle is the untouched source
    * table, so the result proves (a) snapshot isolation of manifest
    * commits (the merge didn't leak into v0) and (b) the SQL surface
    * resolves the same files as the programmatic reader. */
  def timeTravel(spark: SparkSession, dir: String): DataFrame = {
    val tmp = java.nio.file.Files.createTempDirectory("graft-tt").toString
    val sink = new CurrentStateSink(tmp, _ => Seq("key"), nBuckets = 8)
    sink.writeTableRows("state", Tables.load(spark, dir, "customer").select(
      col("c_custkey").as("key"), col("c_acctbal").as("val"),
      col("c_name").as("name")))
    val v0 = sink.tableFor("state").currentVersion.get
    // a merge on top must not disturb v0
    sink.writeEvents("state", Tables.load(spark, dir, "events").select(
      col("user_id").as("key"), col("value").as("val"),
      lit(null).cast(StringType).as("name"),
      when(col("event_type") === "error", "D").otherwise("U").as("_op"),
      col("event_id").as("_commit_lsn"), lit(0L).as("_tx_ordinal")))
    graft.GraftExtensions.install(spark)
    spark.sql(s"""SELECT key, val, name
      FROM graft_table_version('$tmp/state', $v0) ORDER BY key""")
  }

  val timeTravelSql: String = """
    SELECT c_custkey AS key, c_acctbal AS val, c_name AS name
    FROM customer ORDER BY key"""

  /** D4 row-level CDF: baseline load → CDC merge → `rowChangesSince`
    * between the two snapshots, through the SQL TVF. The oracle replays
    * the diff relationally: every surviving (non-error-final) event key
    * present in the baseline yields an update pre/post pair (post name
    * is null — updates don't carry it), error-final baseline keys
    * delete, new non-error keys insert; bucket-diff pruning must not
    * change the row set. */
  def rowCdf(spark: SparkSession, dir: String): DataFrame = {
    val tmp = java.nio.file.Files.createTempDirectory("graft-cdf").toString
    val sink = new CurrentStateSink(tmp, _ => Seq("key"), nBuckets = 8)
    sink.writeTableRows("state", Tables.load(spark, dir, "customer").select(
      col("c_custkey").as("key"), col("c_acctbal").as("val"),
      col("c_name").as("name")))
    val v0 = sink.tableFor("state").currentVersion.get
    sink.writeEvents("state", Tables.load(spark, dir, "events").select(
      col("user_id").as("key"), col("value").as("val"),
      lit(null).cast(StringType).as("name"),
      when(col("event_type") === "error", "D").otherwise("U").as("_op"),
      col("event_id").as("_commit_lsn"), lit(0L).as("_tx_ordinal")))
    graft.GraftExtensions.install(spark)
    spark.sql(s"""SELECT key, val, name, _change_type
      FROM graft_table_changes('$tmp/state', $v0)
      ORDER BY key, _change_type""")
  }

  val rowCdfSql: String = """
    WITH last AS (
      SELECT user_id, event_type, value FROM (
        SELECT user_id, event_type, value,
          ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
        FROM events) t WHERE rn = 1),
    base AS (SELECT c_custkey AS key, c_acctbal AS val, c_name AS name
             FROM customer)
    SELECT key, val, name, _change_type FROM (
      SELECT b.key, b.val, b.name, 'update_preimage' AS _change_type
      FROM base b JOIN last l ON l.user_id = b.key
      WHERE l.event_type <> 'error'
      UNION ALL
      SELECT b.key, l.value AS val, CAST(NULL AS VARCHAR) AS name,
        'update_postimage'
      FROM base b JOIN last l ON l.user_id = b.key
      WHERE l.event_type <> 'error'
      UNION ALL
      SELECT b.key, b.val, b.name, 'delete'
      FROM base b JOIN last l ON l.user_id = b.key
      WHERE l.event_type = 'error'
      UNION ALL
      SELECT l.user_id AS key, l.value AS val, CAST(NULL AS VARCHAR) AS name,
        'insert'
      FROM last l LEFT JOIN base b ON b.key = l.user_id
      WHERE b.key IS NULL AND l.event_type <> 'error') u
    ORDER BY key, _change_type"""

  /** D4/point lookup: the manifest-pruned single-key read (scans ONLY the
    * key's bucket — 1/nBuckets of the table). The oracle is a WHERE on
    * the source; any bucket-routing error (hash/type mismatch) returns
    * the wrong row set and breaks the hash. */
  def pointLookup(spark: SparkSession, dir: String): DataFrame = {
    val tmp = java.nio.file.Files.createTempDirectory("graft-pl").toString
    val sink = new CurrentStateSink(tmp, _ => Seq("key"), nBuckets = 8)
    sink.writeTableRows("state", Tables.load(spark, dir, "customer").select(
      col("c_custkey").as("key"), col("c_acctbal").as("val")))
    val t = sink.tableFor("state")
    Seq(1L, 7L, 13L).map(k => t.lookup(spark, Seq(k)))
      .reduce(_ unionAll _).orderBy("key")
  }

  val pointLookupSql: String = """
    SELECT c_custkey AS key, c_acctbal AS val FROM customer
    WHERE c_custkey IN (1, 7, 13) ORDER BY key"""

  /** SQL-catalog end-to-end: CREATE TABLE / INSERT INTO … SELECT / an
    * aggregate with a pushed filter — all through the
    * `spark.sql.catalog.*` plugin (DDL, V1-write append, DSv2 parquet
    * scan over the manifest). Oracle = the same relational aggregate on
    * the source table, so the entire catalog path (identifier
    * resolution → bucketed write → manifest-pinned scan) is
    * hash-gated. Catalog name is derived from the warehouse dir: Spark
    * caches catalog instances by name, and Bench reuses one session
    * across warmup + measured dirs. */
  def catalogSql(spark: SparkSession, dir: String): DataFrame = {
    val tmp = java.nio.file.Files.createTempDirectory("graft-cat").toString
    val cat = "graftwh" + (tmp.hashCode.toLong & 0xffffffL)
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.catalog.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", tmp)
    Tables.load(spark, dir, "customer").createOrReplaceTempView("customer_src")
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.main")
    spark.sql(s"""CREATE TABLE $cat.main.cust
      (c_custkey BIGINT, c_name STRING, c_acctbal DOUBLE, c_nationkey INT)
      PARTITIONED BY (bucket(16, c_custkey))""")
    spark.sql(s"""INSERT INTO $cat.main.cust
      SELECT c_custkey, c_name, c_acctbal, c_nationkey FROM customer_src""")
    // RENAME COLUMN on the now-populated table: the files keep c_acctbal
    // on disk, the manifest name mapping serves the new logical name —
    // the query below (filter + aggregate over the renamed column)
    // exercises the mapped scan path end-to-end
    spark.sql(s"ALTER TABLE $cat.main.cust RENAME COLUMN c_acctbal TO acctbal")
    spark.sql(s"""
      SELECT c_nationkey, COUNT(*) AS n,
        CAST(SUM(CAST(acctbal AS DECIMAL(12,2))) AS DOUBLE) AS bal
      FROM $cat.main.cust
      WHERE acctbal > 0
      GROUP BY c_nationkey ORDER BY c_nationkey""")
  }

  val catalogSqlSql: String = """
    SELECT c_nationkey, COUNT(*) AS n,
      CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS bal
    FROM customer
    WHERE c_acctbal > 0
    GROUP BY c_nationkey ORDER BY c_nationkey"""

  /** D5/external engine: the full CDC apply protocol against a REAL
    * external SQL engine (embedded Derby over JDBC) — backfill
    * (drop-for-copy + batched INSERT), two streamed batches applied by
    * set-based seq-guarded MERGE, a REPLAY of the first batch that the
    * engine-held offset cursor must filter to a no-op, then a POST-DDL
    * batch whose frame carries a new `etype` column (the pipeline's
    * schema-version split shape): the sink must ALTER TABLE ADD COLUMN
    * in the engine, inside the batch transaction, and apply. The result
    * is read back through spark.read.jdbc (partitioned on the key), so
    * every row travels the genuine wire both ways. Oracle = baseline
    * customers untouched by events + latest event value per key across
    * both epochs, with `etype` NULL for every row the post-DDL batch
    * didn't rewrite. */
  def jdbcApply(spark: SparkSession, dir: String): DataFrame = {
    val tmp = java.nio.file.Files.createTempDirectory("graft-jdbc").toString
    val sink = new graft.sinks.JdbcSink(s"jdbc:derby:$tmp/db;create=true",
      _ => Seq("key"))
    sink.startup(spark)
    sink.writeTableRows("state", Tables.load(spark, dir, "customer").select(
      col("c_custkey").as("key"), col("c_acctbal").as("val")))
    val ev = Tables.load(spark, dir, "events").select(
        col("user_id").as("key"), col("value").as("val"),
        when(col("event_type") === "error", "D").otherwise("U").as("_op"),
        col("event_id").as("_commit_lsn"), lit(0L).as("_tx_ordinal"))
      .localCheckpoint(eager = false) // scanned by max-id + 4 writes
    val maxId = ev.agg(max("_commit_lsn")).collect()(0).getLong(0)
    val mid = maxId / 2
    sink.writeEvents("state", ev.filter(col("_commit_lsn") <= mid))
    sink.writeEvents("state", ev.filter(col("_commit_lsn") > mid))
    sink.writeEvents("state", ev.filter(col("_commit_lsn") <= mid)) // replay
    // post-DDL epoch: 'click' events re-emitted above the prior high
    // water with doubled values and the NEW column populated
    val ddl = Tables.load(spark, dir, "events")
      .filter(col("event_type") === "click")
      .select(col("user_id").as("key"), (col("value") * 2).as("val"),
        col("event_type").as("etype"), lit("U").as("_op"),
        (col("event_id") + maxId).as("_commit_lsn"),
        lit(0L).as("_tx_ordinal"))
    sink.writeEvents("state", ddl)
    sink.read(spark, "state", partitionKey = Some("key"), partitions = 4)
      .orderBy("key")
  }

  val jdbcApplySql: String = """
    WITH mx AS (SELECT max(event_id) AS m FROM events),
    allev AS (
      SELECT user_id, event_id AS seq, value AS val,
        CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
        CAST(NULL AS VARCHAR) AS etype
      FROM events
      UNION ALL
      SELECT user_id, event_id + mx.m, value * 2, 'U', event_type
      FROM events, mx WHERE event_type = 'click'),
    last AS (
      SELECT user_id, op, val, etype FROM (
        SELECT user_id, op, val, etype,
          ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY seq DESC) AS rn
        FROM allev) t WHERE rn = 1)
    SELECT key, val, etype FROM (
      SELECT c.c_custkey AS key, c.c_acctbal AS val,
        CAST(NULL AS VARCHAR) AS etype
      FROM customer c LEFT JOIN last l ON l.user_id = c.c_custkey
      WHERE l.user_id IS NULL
      UNION ALL
      SELECT user_id AS key, val, etype FROM last
      WHERE op <> 'D') u
    ORDER BY key"""

  /** TPC-H Q6 shape: single-scan predicate-heavy aggregate — the pushdown
    * microbenchmark (every predicate must reach the parquet scan). */
  def q6Forecast(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01 00:00:00") &&
        col("l_shipdate") < lit("1997-01-01 00:00:00") &&
        col("l_discount").between(0.02, 0.06) &&
        col("l_quantity") < 24)
      .agg(sum(dec92("l_extendedprice") * col("l_discount").cast(DecimalType(3, 2)))
        .cast(DoubleType).as("revenue"),
        count(lit(1)).as("n"))

  val q6Sql: String = """
    SELECT
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(9,2)) * CAST(l_discount AS DECIMAL(3,2))) AS DOUBLE) AS revenue,
      COUNT(*) AS n
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.02 AND 0.06
      AND l_quantity < 24"""

  // ------------------------- merge-on-read write-path attribution (bench)

  /** Shared state for the op_sink_delta_* pair: one large base loaded
    * once per corpus dir into a copy-on-write table AND a merge-on-read
    * table (identical keys/buckets), so the two bench entries time the
    * SAME small-delta sync against each write mode. The delta rotates
    * its key residue class per call — every sample pays a genuine merge
    * (an identical replayed seq would no-op to ~zero). */
  private final class DeltaState(val cow: graft.sinks.GraftTable,
      val mor: graft.sinks.GraftTable) {
    val seq = new java.util.concurrent.atomic.AtomicLong(1L)
  }
  private val deltaState =
    new java.util.concurrent.ConcurrentHashMap[String, DeltaState]()

  private def deltaStateFor(spark: SparkSession, dir: String): DeltaState =
    deltaState.computeIfAbsent(dir, _ => {
      val root = java.nio.file.Files
        .createTempDirectory("graft-mor-op").toString
      // ×16-inflated base (disjoint shifted key spaces): large enough
      // that a full-bucket rewrite visibly costs more than a delta
      // append even at local SF — the ratio this pair demonstrates
      // GROWS linearly with base size (at 100 TB it is the difference
      // between rewriting terabytes per sync and appending megabytes)
      val li = Tables.load(spark, dir, "lineitem")
        .select((col("l_orderkey") * 8 + col("l_linenumber")).as("k0"),
          col("l_extendedprice").as("price"),
          concat(lit("c"), col("l_suppkey")).as("c"))
      val base = (0 until 16).map(i =>
        li.select((col("k0") + lit(i * 8000000L)).as("k"),
          col("price"), col("c"))).reduce(_ unionAll _)
      val cow = new graft.sinks.GraftTable(s"$root/cow", Seq("k"),
        nBuckets = 16)
      // threshold 0: this entry MEASURES the layered path — adaptive
      // admission must not silently turn it into a second CoW timer at
      // small SF (at sf0.1 the inflated base passes the default floor
      // anyway)
      val mor = new graft.sinks.GraftTable(s"$root/mor", Seq("k"),
        nBuckets = 16, mergeOnRead = true, morMinAffectedBytes = 0L)
      cow.overwrite(base)
      mor.overwrite(base)
      new DeltaState(cow, mor)
    })

  private def applyDelta(spark: SparkSession, dir: String,
      t: graft.sinks.GraftTable, seq: Long): DataFrame = {
    // ~2k-row delta spread across every bucket (the high-churn index
    // workload shape): upserts with per-call values + a delete stripe
    val batch = Tables.load(spark, dir, "lineitem")
      .select((col("l_orderkey") * 8 + col("l_linenumber")).as("k"),
        col("l_extendedprice").as("price"))
      .filter(col("k") % 1171 === lit(seq % 1100))
      .withColumn("c", concat(lit("v"), lit(seq)))
      .withColumn("_op", when(col("k") % 5 === 0, "D").otherwise("U"))
      .withColumn("_seq", lit(f"$seq%016x"))
    t.merge(batch)
    // bucket-pruned point probe: index tables are read via key lookups,
    // so the entry's read leg exercises the (layered) lookup path
    t.lookup(spark, Seq(8L * 1 + 1)).agg(count(lit(1)).as("n"))
  }

  /** Copy-on-write small-delta sync: every touched bucket rewrites —
    * at 16/16 buckets touched this is an O(base) parquet rewrite per
    * sync. The baseline the MoR entry is measured against. */
  def opSinkDeltaCow(spark: SparkSession, dir: String): DataFrame = {
    val st = deltaStateFor(spark, dir)
    applyDelta(spark, dir, st.cow, st.seq.incrementAndGet())
  }

  /** Merge-on-read small-delta sync: the same batch commits as a delta
    * layer (append upserts + key-only delete file) — write cost
    * O(delta) regardless of base size. The pair's timing gap is the
    * write-amplification the MoR mode removes for high-churn index
    * tables at 100 TB (every (layers ≥ MorMaxLayers)-th call pays the
    * amortized collapse, honestly included in the median). */
  def opSinkDeltaMor(spark: SparkSession, dir: String): DataFrame = {
    val st = deltaStateFor(spark, dir)
    applyDelta(spark, dir, st.mor, st.seq.incrementAndGet())
  }

  // --------------------- storage-partitioned-join attribution (bench)

  /** Shared state for the op_join_* pair: two co-bucketed graft catalog
    * tables built once per corpus dir — an ×8-inflated lineitem fact
    * (one row per (orderkey, line), with a 64-byte payload column that
    * must CROSS the join: narrow keys shuffle for free in one JVM, wide
    * rows are what a real exchange moves) and a key dim — both
    * PARTITIONED BY bucket(32, k). The pair times the SAME equi-join
    * aggregate with the SPJ report off (both sides exchange + sort) vs
    * on (zip-join of co-located buckets, zero exchanges): the gap is
    * the shuffle the key-grouped report removes, and it grows with
    * data volume — at 100 TB the exchange IS the join cost. */
  private val spjState =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def spjCatalogFor(spark: SparkSession, dir: String): String =
    spjState.computeIfAbsent(dir, _ => {
      val cat = s"opspj${math.abs(dir.hashCode)}"
      val root = java.nio.file.Files
        .createTempDirectory("graft-spj-op").toString
      spark.conf.set(s"spark.sql.catalog.$cat",
        "graft.catalog.GraftCatalog")
      spark.conf.set(s"spark.sql.catalog.$cat.root", root)
      spark.sql(s"CREATE NAMESPACE $cat.db")
      spark.sql(s"""CREATE TABLE $cat.db.fact
                    (k BIGINT, price DOUBLE, payload STRING)
                    PARTITIONED BY (bucket(32, k))""")
      spark.sql(s"""CREATE TABLE $cat.db.dim (k BIGINT, w BIGINT)
                    PARTITIONED BY (bucket(32, k))""")
      val li = Tables.load(spark, dir, "lineitem")
        .select((col("l_orderkey") * 8 + col("l_linenumber")).as("k0"),
          col("l_extendedprice").cast(DoubleType).as("price"))
      (0 until 8).map(i =>
        li.select((col("k0") + lit(i * 8000000L)).as("k"), col("price")))
        .reduce(_ unionAll _)
        .withColumn("payload",
          rpad(conv(col("k").cast("string"), 10, 16), 64, "x"))
        .createOrReplaceTempView("spj_src_fact")
      spark.sql(s"INSERT INTO $cat.db.fact SELECT * FROM spj_src_fact")
      spark.sql(
        s"""INSERT INTO $cat.db.dim
            SELECT DISTINCT k, k % 97 AS w FROM spj_src_fact""")
      cat
    })

  private def spjJoin(spark: SparkSession, dir: String,
      spjOn: Boolean): DataFrame = {
    val cat = spjCatalogFor(spark, dir)
    val confs = Seq(
      "spark.sql.sources.v2.bucketing.enabled" -> spjOn.toString,
      // broadcast off on BOTH entries: the pair compares shuffled vs
      // storage-partitioned SORT-MERGE joins, not broadcast planning
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // materialize INSIDE the conf window (physical planning reads the
      // SPJ conf at execution, not at sql()). MAX(payload) forces the
      // wide column THROUGH the join (no aggregate pushdown below a
      // join), so the shuffle variant pays the exchange's real freight.
      val row = spark.sql(
        s"""SELECT COUNT(*) AS n, SUM(a.price * b.w) AS s,
                   MAX(a.payload) AS p
            FROM $cat.db.fact a JOIN $cat.db.dim b ON a.k = b.k""")
        .collect()(0)
      val sp = spark; import sp.implicits._
      Seq((row.getLong(0), row.getDouble(1), row.getString(2)))
        .toDF("n", "s", "p")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  /** Conventional shuffled sort-merge join: both sides exchange on the
    * join key before merging — the baseline the SPJ entry is measured
    * against. */
  def opJoinShuffle(spark: SparkSession, dir: String): DataFrame =
    spjJoin(spark, dir, spjOn = false)

  /** Storage-partitioned join: the graft scans report bucket(32, k)
    * key-grouped partitioning, Spark proves both sides co-located via
    * the catalog bucket function, and the exchanges vanish
    * (plan-asserted in StoragePartitionedJoinSpec). */
  def opJoinSpj(spark: SparkSession, dir: String): DataFrame =
    spjJoin(spark, dir, spjOn = true)

  // ---------- composite-key SPJ auto-injection attribution (bench pair)

  /** Shared state for the op_join_composite_* pair: an ×8-inflated
    * COMPOSITE-key fact (k1, k2) with a 64-byte payload that must cross
    * the join, plus a key dim — both bucket(32, k1, k2). Unlike the
    * single-key pair, Spark cannot resolve the multi-reference bucket
    * transform here, so the shuffle-free plan exists ONLY through the
    * [[graft.plans.GraftSpjInjectRule]] auto-injected `_bucket`
    * equality: the pair's gap attributes the RULE's value, not just
    * SPJ's. */
  private val spjCompositeOpState =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def spjCompositeOpCatalogFor(spark: SparkSession,
      dir: String): String =
    spjCompositeOpState.computeIfAbsent(dir, _ => {
      val cat = s"opspjc${math.abs(dir.hashCode)}"
      val root = java.nio.file.Files
        .createTempDirectory("graft-spj-comp-op").toString
      spark.conf.set(s"spark.sql.catalog.$cat",
        "graft.catalog.GraftCatalog")
      spark.conf.set(s"spark.sql.catalog.$cat.root", root)
      spark.sql(s"CREATE NAMESPACE $cat.db")
      spark.sql(s"""CREATE TABLE $cat.db.fact
                    (k1 BIGINT, k2 INT, price DOUBLE, payload STRING)
                    PARTITIONED BY (bucket(32, k1, k2))""")
      spark.sql(s"""CREATE TABLE $cat.db.dim (k1 BIGINT, k2 INT, w BIGINT)
                    PARTITIONED BY (bucket(32, k1, k2))""")
      val li = Tables.load(spark, dir, "lineitem")
        .select(col("l_orderkey").as("k0"),
          col("l_linenumber").as("k2"),
          col("l_extendedprice").cast(DoubleType).as("price"))
      (0 until 8).map(i =>
        li.select((col("k0") + lit(i * 8000000L)).as("k1"), col("k2"),
          col("price")))
        .reduce(_ unionAll _)
        .createOrReplaceTempView("spj_comp_op_src")
      // the synthetic lineitem duplicates (orderkey, linenumber):
      // aggregate to one row per composite key before the keyed insert
      spark.sql(s"""INSERT INTO $cat.db.fact
        SELECT k1, k2, SUM(price),
               RPAD(CONV(CAST(k1 * 8 + k2 AS STRING), 10, 16), 64, 'x')
        FROM spj_comp_op_src GROUP BY k1, k2""")
      spark.sql(s"""INSERT INTO $cat.db.dim
        SELECT DISTINCT k1, k2, (k1 + k2) % 97 AS w
        FROM spj_comp_op_src""")
      cat
    })

  private def spjCompositeOpJoin(spark: SparkSession, dir: String,
      spjOn: Boolean): DataFrame = {
    val cat = spjCompositeOpCatalogFor(spark, dir)
    val confs = Seq(
      "spark.sql.sources.v2.bucketing.enabled" -> spjOn.toString,
      "spark.sql.requireAllClusterKeysForCoPartition" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // NO hand-written _bucket term anywhere: with spjOn the analyzer
      // rule injects it and the join zip-joins co-located buckets
      val row = spark.sql(
        s"""SELECT COUNT(*) AS n, SUM(a.price * b.w) AS s,
                   MAX(a.payload) AS p
            FROM $cat.db.fact a JOIN $cat.db.dim b
              ON a.k1 = b.k1 AND a.k2 = b.k2""")
        .collect()(0)
      val sp = spark; import sp.implicits._
      Seq((row.getLong(0), row.getDouble(1), row.getString(2)))
        .toDF("n", "s", "p")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  /** Baseline: composite-key equi-join with the SPJ report off — both
    * sides exchange + sort. */
  def opJoinCompositeShuffle(spark: SparkSession, dir: String): DataFrame =
    spjCompositeOpJoin(spark, dir, spjOn = false)

  /** The auto-injected plan: same query text, zero exchanges — the gap
    * vs the shuffle leg is what the analyzer rule buys composite-key
    * tables (plan-asserted in StoragePartitionedJoinSpec). */
  def opJoinCompositeAuto(spark: SparkSession, dir: String): DataFrame =
    spjCompositeOpJoin(spark, dir, spjOn = true)

  // --------------- composite-key SPJ auto-injection (correctness gate)

  private val spjCompositeState =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def spjCompositeCatalogFor(spark: SparkSession,
      dir: String): String =
    spjCompositeState.computeIfAbsent(dir, _ => {
      val cat = s"spjck${math.abs(dir.hashCode)}"
      val root = java.nio.file.Files
        .createTempDirectory("graft-spj-composite").toString
      spark.conf.set(s"spark.sql.catalog.$cat",
        "graft.catalog.GraftCatalog")
      spark.conf.set(s"spark.sql.catalog.$cat.root", root)
      spark.sql(s"CREATE NAMESPACE $cat.db")
      spark.sql(s"""CREATE TABLE $cat.db.qty
                    (k1 BIGINT, k2 INT, flag STRING, qty DECIMAL(12,2))
                    PARTITIONED BY (bucket(16, k1, k2))""")
      spark.sql(s"""CREATE TABLE $cat.db.price
                    (k1 BIGINT, k2 INT, price DECIMAL(12,2))
                    PARTITIONED BY (bucket(16, k1, k2))""")
      // the synthetic lineitem is NOT unique on (orderkey, linenumber)
      // — pre-aggregate per key so the keyed tables hold one row per
      // key and the join is exactly 1:1 (the oracle mirrors this)
      Tables.load(spark, dir, "lineitem")
        .select(col("l_orderkey").as("k1"), col("l_linenumber").as("k2"),
          col("l_returnflag").as("flag"),
          col("l_quantity").cast(DecimalType(9, 2)).as("qty"),
          col("l_extendedprice").cast(DecimalType(9, 2)).as("price"))
        .createOrReplaceTempView("spj_comp_src")
      spark.sql(s"""INSERT INTO $cat.db.qty
        SELECT k1, k2, MIN(flag),
               CAST(SUM(qty) AS DECIMAL(12,2))
        FROM spj_comp_src GROUP BY k1, k2""")
      spark.sql(s"""INSERT INTO $cat.db.price
        SELECT k1, k2, CAST(SUM(price) AS DECIMAL(12,2))
        FROM spj_comp_src GROUP BY k1, k2""")
      cat
    })

  /** Correctness gate for the composite-key SPJ auto-injection
    * ([[graft.plans.GraftSpjInjectRule]]): two graft catalog tables
    * bucketed by the composite key (l_orderkey, l_linenumber), joined
    * WITHOUT any hand-written `_bucket` term. The analyzer rule injects
    * the implied `_bucket = _bucket` equality and the join plans
    * shuffle-free (plan-asserted in StoragePartitionedJoinSpec); the
    * DuckDB oracle pins that the rewritten plan returns EXACTLY the
    * rows the plain join would — an injection bug (wrong attribute,
    * wrong count precondition) would drop rows and hash-mismatch. */
  def spjCompositeJoin(spark: SparkSession, dir: String): DataFrame = {
    val cat = spjCompositeCatalogFor(spark, dir)
    val confs = Seq(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.requireAllClusterKeysForCoPartition" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // materialize INSIDE the conf window (physical planning reads the
      // SPJ confs at execution)
      val sp = spark; import sp.implicits._
      spark.sql(
        s"""SELECT a.flag AS flag, COUNT(*) AS n,
                   CAST(SUM(a.qty * b.price) AS DOUBLE) AS total
            FROM $cat.db.qty a JOIN $cat.db.price b
              ON a.k1 = b.k1 AND a.k2 = b.k2
            GROUP BY a.flag ORDER BY a.flag""")
        .as[(String, Long, Double)].collect().toSeq
        .toDF("flag", "n", "total")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  val spjCompositeJoinSql: String = """
    WITH a AS (
      SELECT l_orderkey AS k1, l_linenumber AS k2,
             MIN(l_returnflag) AS flag,
             CAST(SUM(CAST(l_quantity AS DECIMAL(9,2)))
               AS DECIMAL(12,2)) AS qty
      FROM lineitem GROUP BY 1, 2),
    b AS (
      SELECT l_orderkey AS k1, l_linenumber AS k2,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(9,2)))
               AS DECIMAL(12,2)) AS price
      FROM lineitem GROUP BY 1, 2)
    SELECT a.flag AS flag, COUNT(*) AS n,
           CAST(SUM(a.qty * b.price) AS DOUBLE) AS total
    FROM a JOIN b ON a.k1 = b.k1 AND a.k2 = b.k2
    GROUP BY 1 ORDER BY 1"""
}
