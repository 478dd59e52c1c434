package graft.catalog

import graft.SparkSpec
import graft.sinks.GraftTable
import org.apache.spark.sql.functions._

/** SQL catalog surface: DDL (namespace/table lifecycle), DML (INSERT
  * INTO/OVERWRITE), scans with pushdown, ALTER evolution, and interop
  * with the CDC merge path + TVFs over the same storage. */
class GraftCatalogSpec extends SparkSpec {
  import spark.implicits._

  // eager: the conf must land before the first spark.sql in any test
  private val root: String = {
    val r = java.nio.file.Files.createTempDirectory("graft-cat").toString
    spark.conf.set("spark.sql.catalog.cat", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.cat.root", r)
    r
  }

  test("namespace + table DDL, INSERT INTO appends snapshots, OVERWRITE reloads") {
    spark.sql("CREATE NAMESPACE cat.cdc")
    spark.sql("""CREATE TABLE cat.cdc.users (id BIGINT, name STRING)
                 PARTITIONED BY (bucket(8, id))""")
    // identity came from the bucket transform
    val t = GraftTable.open(s"$root/cdc/users")
    assert(t.keyCols == Seq("id") && t.nBuckets == 8)
    assert(spark.sql("SELECT * FROM cat.cdc.users").count() == 0)

    spark.sql("INSERT INTO cat.cdc.users VALUES (1, 'ann'), (2, 'bob')")
    spark.sql("INSERT INTO cat.cdc.users VALUES (3, 'cat')")
    assert(spark.sql("SELECT * FROM cat.cdc.users").count() == 3)
    // each INSERT is one snapshot commit (v0 create + 2 appends), with
    // auto-expiry retaining the latest two for time travel
    assert(t.currentVersion.contains(2L) && t.versions.size == 2)

    spark.sql("INSERT OVERWRITE cat.cdc.users VALUES (9, 'zoe')")
    assert(spark.sql("SELECT id, name FROM cat.cdc.users")
      .as[(Long, String)].collect().toSet == Set((9L, "zoe")))

    assert(spark.sql("SHOW TABLES IN cat.cdc").collect()
      .map(_.getString(1)).toSet == Set("users"))
  }

  test("scan delegates to native parquet with filter pushdown") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS cat.scan")
    spark.sql("""CREATE TABLE cat.scan.ev (id BIGINT, v DOUBLE, pad STRING)
                 PARTITIONED BY (bucket(4, id))""")
    spark.sql(
      "INSERT INTO cat.scan.ev SELECT id, id * 0.5, repeat('x', 100) FROM range(1000)")
    val q = spark.sql("SELECT v FROM cat.scan.ev WHERE id = 7")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("EqualTo(id,7)"),
      s"filter not pushed to parquet:\n$plan")
    // column pruning reaches the scan: pad never leaves the files
    assert(plan.contains("ReadSchema") && !plan.contains("pad"),
      s"unused column not pruned:\n$plan")
    assert(q.as[Double].collect().toSeq == Seq(3.5))
  }

  test("ALTER TABLE ADD/DROP COLUMN evolves the pinned schema over old files") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS cat.ddl")
    spark.sql("""CREATE TABLE cat.ddl.t (id BIGINT, a STRING)
                 PARTITIONED BY (bucket(4, id))""")
    spark.sql("INSERT INTO cat.ddl.t VALUES (1, 'x')")
    spark.sql("ALTER TABLE cat.ddl.t ADD COLUMN b INT")
    // pre-DDL files surface the new column as null
    assert(spark.sql("SELECT id, a, b FROM cat.ddl.t")
      .as[(Long, String, Option[Int])].collect().toSet ==
      Set((1L, "x", None)))
    spark.sql("INSERT INTO cat.ddl.t VALUES (2, 'y', 7)")
    // the all-non-null second INSERT must NOT narrow b to required —
    // the pre-DDL file lacks b entirely and still has to read as null
    assert(GraftTable.open(s"$root/ddl/t").currentSchema.get("b").nullable)
    assert(spark.sql("SELECT sum(b) FROM cat.ddl.t").as[Long].head() == 7L)
    // dropping a non-key column hides it from reads
    spark.sql("ALTER TABLE cat.ddl.t DROP COLUMN a")
    assert(spark.sql("SELECT * FROM cat.ddl.t").columns.toSeq ==
      Seq("id", "b"))
    // bucket keys are load-bearing → refuse to drop
    intercept[Exception] { spark.sql("ALTER TABLE cat.ddl.t DROP COLUMN id") }
  }

  test("catalog tables ARE graft tables: CDC merge + TVF read the same storage") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS cat.mix")
    spark.sql("""CREATE TABLE cat.mix.state (id BIGINT, v STRING)
                 PARTITIONED BY (bucket(4, id))""")
    spark.sql("INSERT INTO cat.mix.state VALUES (1, 'a'), (2, 'b')")
    // a CDC merge through the SAME directory (the CurrentStateSink path)
    val t = GraftTable.open(s"$root/mix/state")
    t.merge(Seq((1L, "a2", "U", "01"), (2L, "", "D", "02"))
      .toDF("id", "v", "_op", "_seq"))
    assert(spark.sql("SELECT id, v FROM cat.mix.state")
      .as[(Long, String)].collect().toSet == Set((1L, "a2")))
    // the TVF sees the same snapshot
    graft.GraftExtensions.install(spark)
    assert(spark.sql(s"SELECT id, v FROM graft_table('$root/mix/state')")
      .as[(Long, String)].collect().toSet == Set((1L, "a2")))
  }

  test("time travel: VERSION AS OF pins a snapshot; writes to it refuse") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS cat.tt")
    spark.sql("""CREATE TABLE cat.tt.t (id BIGINT, v STRING)
                 PARTITIONED BY (bucket(2, id))""")
    spark.sql("INSERT INTO cat.tt.t VALUES (1, 'a')")          // v1
    spark.sql("INSERT INTO cat.tt.t VALUES (2, 'b')")          // v2
    assert(spark.sql("SELECT * FROM cat.tt.t VERSION AS OF 1").count() == 1)
    assert(spark.sql("SELECT * FROM cat.tt.t VERSION AS OF 2").count() == 2)
    assert(spark.sql("SELECT * FROM cat.tt.t").count() == 2)
    // TIMESTAMP AS OF now = latest snapshot
    assert(spark.sql(
      "SELECT * FROM cat.tt.t TIMESTAMP AS OF current_timestamp()").count() == 2)
    intercept[Exception] {
      spark.sql("INSERT INTO cat.tt.t VERSION AS OF 1 VALUES (9, 'x')") }
    // expired versions refuse cleanly
    intercept[Exception] {
      spark.sql("SELECT * FROM cat.tt.t VERSION AS OF 99").collect() }
  }

  test("DELETE FROM rewrites only matching buckets; null-cond rows survive") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS cat.del")
    spark.sql("""CREATE TABLE cat.del.t (id BIGINT, v DOUBLE)
                 PARTITIONED BY (bucket(4, id))""")
    spark.sql(
      "INSERT INTO cat.del.t SELECT id, IF(id % 10 = 0, NULL, id * 1.0) FROM range(100)")
    val vBefore = GraftTable.open(s"$root/del/t").currentVersion.get

    spark.sql("DELETE FROM cat.del.t WHERE id < 30 AND v > 5")
    // deleted: ids 6..29 except NULL-v multiples of 10 → 24 - 2 = 22 rows
    assert(spark.sql("SELECT count(*) FROM cat.del.t").as[Long].head() == 78L)
    // rows where the condition is NULL (v IS NULL) survived
    assert(spark.sql(
      "SELECT count(*) FROM cat.del.t WHERE v IS NULL").as[Long].head() == 10L)
    // one snapshot commit, not a full rewrite storm
    assert(GraftTable.open(s"$root/del/t").currentVersion.contains(vBefore + 1))
    // unconditional DELETE = truncate
    spark.sql("DELETE FROM cat.del.t")
    assert(spark.sql("SELECT count(*) FROM cat.del.t").as[Long].head() == 0L)
  }

  test("UPDATE and MERGE INTO via row-level operations preserve replay marks") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS cat.rl")
    spark.sql("""CREATE TABLE cat.rl.t (id BIGINT, v STRING, n INT)
                 PARTITIONED BY (bucket(4, id))""")
    spark.sql("INSERT INTO cat.rl.t VALUES (1, 'a', 10), (2, 'b', 20), (3, 'c', 30)")
    // seed a replay high-water through the CDC path
    val t = GraftTable.open(s"$root/rl/t")
    t.merge(Seq((3L, "c2", 31, "U", "0005"))
      .toDF("id", "v", "n", "_op", "_seq"))
    assert(t.readMeta().highWater == "0005")

    spark.sql("UPDATE cat.rl.t SET n = n + 1 WHERE v LIKE 'a%'")
    assert(spark.sql("SELECT id, n FROM cat.rl.t ORDER BY id")
      .as[(Long, Int)].collect().toSeq ==
      Seq((1L, 11), (2L, 20), (3L, 31)))
    // the CDC replay mark survived the row-level rewrite
    assert(t.readMeta().highWater == "0005")
    t.merge(Seq((3L, "stale", 0, "U", "0004"))
      .toDF("id", "v", "n", "_op", "_seq")) // ≤ hw → dropped
    assert(spark.sql("SELECT v FROM cat.rl.t WHERE id = 3")
      .as[String].head() == "c2")

    spark.sql("SELECT 4L AS id, 'd' AS v, 40 AS n").createOrReplaceTempView("src")
    spark.sql("""MERGE INTO cat.rl.t USING src ON cat.rl.t.id = src.id
                 WHEN MATCHED THEN UPDATE SET *
                 WHEN NOT MATCHED THEN INSERT *""")
    assert(spark.sql("SELECT count(*) FROM cat.rl.t").as[Long].head() == 4L)
    spark.sql("""MERGE INTO cat.rl.t USING src ON cat.rl.t.id = src.id
                 WHEN MATCHED THEN UPDATE SET n = src.n + 1""")
    assert(spark.sql("SELECT n FROM cat.rl.t WHERE id = 4")
      .as[Int].head() == 41)
    // no stranded staging dirs
    import scala.jdk.CollectionConverters._
    val leftovers = java.nio.file.Files.list(
        java.nio.file.Paths.get(s"$root/rl/t")).iterator().asScala
      .count(_.getFileName.toString.startsWith(".rowlevel-"))
    assert(leftovers == 0)
  }

  test("UPDATE / MERGE rewrite only matched buckets (runtime group filter)") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS cat.grp")
    spark.sql("""CREATE TABLE cat.grp.t (id BIGINT, v STRING)
                 PARTITIONED BY (bucket(8, id))""")
    spark.sql("INSERT INTO cat.grp.t SELECT id, concat('v', id) FROM range(64)")
    val t = GraftTable.open(s"$root/grp/t")
    def filesByBucket(): Map[Int, Set[String]] =
      t.filesOf(t.currentVersion.get)
        .groupBy(f => f.split("_bucket=")(1).split("/")(0).toInt)
        .view.mapValues(_.toSet).toMap
    val before = filesByBucket()
    assert(before.size > 4, s"want a multi-bucket table, got ${before.size}")

    // UPDATE one key: only that key's bucket may be rewritten
    spark.sql("UPDATE cat.grp.t SET v = 'updated' WHERE id = 7")
    val afterUpdate = filesByBucket()
    val changedU = before.keySet.filter(b =>
      before(b) != afterUpdate.getOrElse(b, Set.empty[String]))
    assert(changedU.size == 1,
      s"UPDATE WHERE id=7 rewrote buckets $changedU (want exactly 1)")
    assert(spark.sql("SELECT v FROM cat.grp.t WHERE id = 7")
      .as[String].head() == "updated")
    assert(spark.sql("SELECT count(*) FROM cat.grp.t").as[Long].head() == 64L)

    // MERGE with matched update + not-matched insert: matched bucket is
    // rewritten; the insert APPENDS to its home bucket (no other rewrite)
    spark.sql("SELECT * FROM VALUES (3L, 'merged'), (900L, 'new') AS s(id, v)")
      .createOrReplaceTempView("grp_src")
    spark.sql("""MERGE INTO cat.grp.t USING grp_src ON cat.grp.t.id = grp_src.id
                 WHEN MATCHED THEN UPDATE SET *
                 WHEN NOT MATCHED THEN INSERT *""")
    val afterMerge = filesByBucket()
    val rewritten = afterUpdate.keySet.filter(b =>
      afterMerge.get(b).forall(now =>
        !afterUpdate(b).forall(now.contains))) // lost an old file = rewritten
    assert(rewritten.size <= 2,
      s"MERGE on 2 keys rewrote buckets $rewritten (want ≤ 2)")
    assert(spark.sql("SELECT v FROM cat.grp.t WHERE id = 3")
      .as[String].head() == "merged")
    assert(spark.sql("SELECT v FROM cat.grp.t WHERE id = 900")
      .as[String].head() == "new")
    assert(spark.sql("SELECT count(*) FROM cat.grp.t").as[Long].head() == 65L)
    // strictly: every bucket neither matched nor inserted-into is untouched
    val touched = rewritten ++ afterMerge.keySet.filter(b =>
      afterMerge(b) != afterUpdate.getOrElse(b, Set.empty[String]))
    assert(touched.size <= 2,
      s"MERGE touched buckets $touched (want ≤ 2: one matched + one insert)")
  }

  test("row-level ops on an EMPTY table: no metadata column, safe full-replace") {
    // empty tables expose no _bucket partition column (nothing to infer
    // from) → requiredMetadataAttributes is empty and the rewrite takes
    // the replaceAll fallback; UPDATE/MERGE must still work
    spark.sql("CREATE NAMESPACE IF NOT EXISTS cat.empt")
    spark.sql("""CREATE TABLE cat.empt.t (id BIGINT, v STRING)
                 PARTITIONED BY (bucket(4, id))""")
    spark.sql("UPDATE cat.empt.t SET v = 'x' WHERE id = 1") // no-op
    assert(spark.sql("SELECT count(*) FROM cat.empt.t").as[Long].head() == 0L)
    spark.sql("SELECT 1L AS id, 'a' AS v").createOrReplaceTempView("empt_src")
    spark.sql("""MERGE INTO cat.empt.t USING empt_src ON cat.empt.t.id = empt_src.id
                 WHEN MATCHED THEN UPDATE SET *
                 WHEN NOT MATCHED THEN INSERT *""")
    assert(spark.sql("SELECT v FROM cat.empt.t WHERE id = 1")
      .as[String].head() == "a")
  }

  test("rename + drop + namespace listing") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS cat.life")
    spark.sql("""CREATE TABLE cat.life.t1 (id BIGINT)
                 PARTITIONED BY (bucket(2, id))""")
    spark.sql("INSERT INTO cat.life.t1 VALUES (5)")
    spark.sql("ALTER TABLE cat.life.t1 RENAME TO life.t2")
    assert(spark.sql("SELECT id FROM cat.life.t2").as[Long].head() == 5L)
    intercept[Exception] { spark.sql("SELECT * FROM cat.life.t1").collect() }
    spark.sql("DROP TABLE cat.life.t2")
    assert(spark.sql("SHOW TABLES IN cat.life").count() == 0)
    assert(spark.sql("SHOW NAMESPACES IN cat").collect()
      .map(_.getString(0)).contains("life"))
    spark.sql("DROP NAMESPACE cat.life")
  }

  test("native INSERT: single clustered exchange, one key-sorted file per bucket") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS cat.ins")
    spark.sql("""CREATE TABLE cat.ins.t (id BIGINT, v DOUBLE)
                 PARTITIONED BY (bucket(8, id))""")
    // plan shape: exactly ONE exchange — the write's required clustered
    // distribution; no second repartition inside the writer path
    val plan = spark.sql(
      "EXPLAIN FORMATTED INSERT INTO cat.ins.t SELECT id, id * 0.5 FROM range(1000)")
      .collect()(0).getString(0)
    val exchanges = "Exchange \\(\\d".r.findAllIn(plan).size // tree nodes only
    assert(exchanges == 1, s"want exactly 1 exchange in INSERT plan:\n$plan")
    assert(plan.contains("hashpartitioning(id"), plan)

    spark.sql("INSERT INTO cat.ins.t SELECT id, id * 0.5 FROM range(1000)")
    assert(spark.sql("SELECT count(*), sum(id) FROM cat.ins.t")
      .as[(Long, Long)].head() == ((1000L, 499500L)))
    val t = GraftTable.open(s"$root/ins/t")
    val byBucket = t.currentFilesByBucket
    // the clustered distribution pins partition id == bucket id → each
    // bucket holds exactly one file from one task
    assert(byBucket.size == 8 && byBucket.values.forall(_.size == 1),
      s"bucket layout: ${byBucket.view.mapValues(_.size).toMap}")
    // files are key-sorted (row-group skipping contract)
    val ids = spark.read.parquet(byBucket(0).head)
      .select("id").as[Long].collect()
    assert(ids.sameElements(ids.sorted), "bucket file not key-sorted")
  }

  test("ALTER guards: key retype, rename-with-data, namespace-vs-table drop") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS cat.guard")
    spark.sql("""CREATE TABLE cat.guard.t (id INT, v STRING)
                 PARTITIONED BY (bucket(4, id))""")
    // retyping the bucket key would re-route every existing key
    // (hash(5:INT) != hash(5L:BIGINT)) — refused even on empty tables
    val e1 = intercept[Exception] {
      spark.sql("ALTER TABLE cat.guard.t ALTER COLUMN id TYPE BIGINT")
    }
    assert(e1.getMessage.contains("bucket key"), e1.getMessage)
    // non-key retype on an empty table is fine; rename on an EMPTY table
    // is fine (no files carry the old name)
    spark.sql("ALTER TABLE cat.guard.t ALTER COLUMN v TYPE STRING")
    spark.sql("ALTER TABLE cat.guard.t RENAME COLUMN v TO w")
    assert(spark.sql("SELECT w FROM cat.guard.t").count() == 0)

    spark.sql("INSERT INTO cat.guard.t VALUES (1, 'x')")
    // with live data the rename goes through the manifest name mapping:
    // the file keeps 'w' on disk, the logical schema says 'u'
    spark.sql("ALTER TABLE cat.guard.t RENAME COLUMN w TO u")
    assert(spark.sql("SELECT u FROM cat.guard.t").as[String].head() == "x")
    // a NEW column may not take a name an existing column still uses on
    // disk — old files' 'w' values would leak into it
    val e2 = intercept[Exception] {
      spark.sql("ALTER TABLE cat.guard.t ADD COLUMN w STRING")
    }
    assert(e2.getMessage.contains("stored as 'w' on disk"), e2.getMessage)
    // renaming ANOTHER column onto an in-use physical name is refused too
    spark.sql("ALTER TABLE cat.guard.t ADD COLUMN extra STRING")
    val e3 = intercept[Exception] {
      spark.sql("ALTER TABLE cat.guard.t RENAME COLUMN extra TO w")
    }
    assert(e3.getMessage.contains("stored as 'w' on disk"), e3.getMessage)

    // DROP NAMESPACE aimed at a TABLE path must not delete the table
    intercept[Exception] {
      spark.sql("DROP NAMESPACE cat.guard.t CASCADE")
    }
    assert(spark.sql("SELECT count(*) FROM cat.guard.t").as[Long].head() == 1L)
  }

  test("ALTER guards: dropped-rename resurrection and narrowing retype refused") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS cat.guard2")
    spark.sql("""CREATE TABLE cat.guard2.t (id BIGINT, a STRING, n INT)
                 PARTITIONED BY (bucket(4, id))""")
    spark.sql("INSERT INTO cat.guard2.t VALUES (1, 'secret', 7)")
    spark.sql("ALTER TABLE cat.guard2.t RENAME COLUMN a TO b")
    spark.sql("ALTER TABLE cat.guard2.t DROP COLUMN b")
    // physical 'a' still holds the dropped column's values in old files:
    // re-adding 'a' must be refused, or SELECT a would resurrect them
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE cat.guard2.t ADD COLUMN a STRING")
    }
    assert(e.getMessage.contains("stored as 'a' on disk"), e.getMessage)
    // a fresh name is fine
    spark.sql("ALTER TABLE cat.guard2.t ADD COLUMN c STRING")
    assert(spark.sql("SELECT c FROM cat.guard2.t").as[Option[String]]
      .head().isEmpty)
    // retype with data: widening allowed, narrowing refused (old files
    // keep the old physical type; a narrowing read schema fails the
    // scan). SQL narrowing is already rejected by Spark's analyzer, so
    // exercise OUR guard through the direct TableCatalog API that
    // programmatic callers (and future analyzer relaxations) hit.
    spark.sql("ALTER TABLE cat.guard2.t ALTER COLUMN n TYPE BIGINT")
    assert(spark.sql("SELECT n FROM cat.guard2.t").as[Long].head() == 7L)
    import org.apache.spark.sql.connector.catalog.{Identifier, TableCatalog, TableChange}
    val cat = spark.sessionState.catalogManager.catalog("cat")
      .asInstanceOf[TableCatalog]
    val e2 = intercept[Exception] {
      cat.alterTable(Identifier.of(Array("guard2"), "t"),
        TableChange.updateColumnType(Array("c"),
          org.apache.spark.sql.types.IntegerType))
    }
    assert(e2.getMessage.contains("only widening"), e2.getMessage)
  }

  test("data skipping: key-range predicates prune whole files at the catalog scan") {
    import org.apache.spark.sql.execution.datasources.FilePartition
    spark.sql("CREATE NAMESPACE IF NOT EXISTS cat.skip")
    spark.sql("""CREATE TABLE cat.skip.t (id BIGINT, v STRING)
                 PARTITIONED BY (bucket(1, id))""")
    // three INSERT commits with disjoint id ranges → three files in the
    // single bucket, non-overlapping leading-key stats
    spark.sql("INSERT INTO cat.skip.t SELECT id, 'a' FROM range(0, 100)")
    spark.sql("INSERT INTO cat.skip.t SELECT id, 'b' FROM range(100, 200)")
    spark.sql("INSERT INTO cat.skip.t SELECT id, 'c' FROM range(200, 300)")
    def scannedFiles(sql: String): (Seq[String], Set[(Long, String)]) = {
      val df = spark.sql(sql)
      val rows = df.as[(Long, String)].collect().toSet
      val scans = df.queryExecution.executedPlan.collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
          b.inputPartitions.collect {
            case f: FilePartition =>
              f.files.map(_.urlEncodedPath).toSeq
            case g: org.apache.spark.sql.GraftBucketedScan.BucketPartition =>
              g.fp.files.map(_.urlEncodedPath).toSeq
          }.flatten
      }.flatten
      (scans, rows)
    }
    val (f1, r1) = scannedFiles("SELECT id, v FROM cat.skip.t WHERE id = 150")
    assert(r1 == Set((150L, "b")))
    assert(f1.distinct.size == 1, s"point query must scan 1 file: $f1")
    val (f2, r2) = scannedFiles(
      "SELECT id, v FROM cat.skip.t WHERE id >= 90 AND id < 110")
    assert(r2.size == 20 && r2((95L, "a")) && r2((105L, "b")))
    assert(f2.distinct.size == 2, s"range query must scan 2 files: $f2")
    // no key predicate → all files scanned, same results
    val (f3, r3) = scannedFiles("SELECT id, v FROM cat.skip.t WHERE v = 'c'")
    assert(r3.size == 100 && f3.distinct.size == 3)
  }

  test("aggregate pushdown reaches the parquet footers through the " +
      "wrapper chain (COUNT/MIN/MAX without reading data)") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS cat.aggpd")
    spark.sql("""CREATE TABLE cat.aggpd.t (id BIGINT, v DOUBLE)
                 PARTITIONED BY (bucket(4, id))""")
    spark.sql("INSERT INTO cat.aggpd.t SELECT id, id * 0.5 FROM range(1000)")
    withSqlConf("spark.sql.parquet.aggregatePushdown" -> "true") {
      val c = spark.sql("SELECT COUNT(*) FROM cat.aggpd.t")
      assert(c.as[Long].head() == 1000L)
      val cPlan = c.queryExecution.executedPlan.toString
      assert(cPlan.contains("PushedAggregation: [COUNT(*)]"),
        s"COUNT must be answered from footers:\n$cPlan")
      val mm = spark.sql("SELECT MIN(id), MAX(id) FROM cat.aggpd.t")
      assert(mm.as[(Long, Long)].head() == ((0L, 999L)))
      assert(mm.queryExecution.executedPlan.toString
        .contains("PushedAggregation: [MIN(id), MAX(id)]"))
      // a data filter disables the pushdown — results stay right
      val f = spark.sql("SELECT COUNT(*) FROM cat.aggpd.t WHERE v > 100")
      assert(f.as[Long].head() == 799L)
      assert(!f.queryExecution.executedPlan.toString
        .contains("PushedAggregation: [COUNT(*)]"))
    }
  }

  test("data skipping on STRING keys: truncated ASCII bounds prune " +
      "files; non-ASCII keys harvest nothing but stay correct") {
    import org.apache.spark.sql.execution.datasources.FilePartition
    spark.sql("CREATE NAMESPACE IF NOT EXISTS cat.skipstr")
    spark.sql("""CREATE TABLE cat.skipstr.t (doc_id STRING, v STRING)
                 PARTITIONED BY (bucket(1, doc_id))""")
    // three commits with doc-id ranges distinguishable INSIDE the
    // 16-char truncation window; full ids are >16 chars so the
    // truncated bounds are what actually prunes
    spark.sql("""INSERT INTO cat.skipstr.t
      SELECT concat('corpus-a-2024-doc-', lpad(CAST(id AS STRING), 4, '0')),
             'a' FROM range(0, 100)""")
    spark.sql("""INSERT INTO cat.skipstr.t
      SELECT concat('corpus-m-2024-doc-', lpad(CAST(id AS STRING), 4, '0')),
             'b' FROM range(0, 100)""")
    spark.sql("""INSERT INTO cat.skipstr.t
      SELECT concat('corpus-x-2024-doc-', lpad(CAST(id AS STRING), 4, '0')),
             'c' FROM range(0, 100)""")
    def scanned(sql: String): (Int, Long) = {
      val df = spark.sql(sql)
      val n = df.count()
      val files = df.queryExecution.executedPlan.collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
          b.inputPartitions.collect {
            case f: FilePartition =>
              f.files.map(_.urlEncodedPath).toSeq
            case g: org.apache.spark.sql.GraftBucketedScan.BucketPartition =>
              g.fp.files.map(_.urlEncodedPath).toSeq
          }.flatten
      }.flatten
      (files.distinct.size, n)
    }
    // point query: only the middle file's [lower, upper] contains the key
    val (f1, n1) = scanned("""SELECT * FROM cat.skipstr.t
      WHERE doc_id = 'corpus-m-2024-doc-0042'""")
    assert(n1 == 1 && f1 == 1, s"string point query must scan 1 file: $f1")
    // range query spanning two prefix groups
    val (f2, n2) = scanned("""SELECT * FROM cat.skipstr.t
      WHERE doc_id >= 'corpus-m' AND doc_id < 'corpus-y'""")
    assert(n2 == 200 && f2 == 2, s"string range must scan 2 files: $f2")
    // no doc_id predicate → all files
    val (f3, n3) = scanned("SELECT * FROM cat.skipstr.t WHERE v = 'c'")
    assert(n3 == 100 && f3 == 3)

    // non-ASCII keys: no bounds harvested (parquet byte order and Java
    // order can disagree past ASCII) — queries scan everything, stay right
    spark.sql("""CREATE TABLE cat.skipstr.u (doc_id STRING, v STRING)
                 PARTITIONED BY (bucket(1, doc_id))""")
    spark.sql("INSERT INTO cat.skipstr.u VALUES ('docü-1', 'x')")
    spark.sql("INSERT INTO cat.skipstr.u VALUES ('docü-2', 'y')")
    val t = graft.sinks.GraftTable.open(s"$root/skipstr/u")
    assert(t.currentFileStrStats.isEmpty,
      "non-ASCII bounds must not be harvested")
    val (f4, n4) = scanned(
      "SELECT * FROM cat.skipstr.u WHERE doc_id = 'docü-2'")
    assert(n4 == 1 && f4 == 2, "no stats → all files scanned, result right")
  }

  test("string-keyed point lookup prunes the bucket's file list on the " +
      "truncated bounds") {
    import graft.sinks.GraftTable
    val root = java.nio.file.Files
      .createTempDirectory("graft-strlookup").toString
    val t = new GraftTable(root, Seq("doc_id"), nBuckets = 1)
    import spark.implicits._
    t.overwrite((0 until 50).map(i =>
      (f"shard-a-doc-$i%04d-of-corpus", i)).toDF("doc_id", "v"))
    t.append((0 until 50).map(i =>
      (f"shard-q-doc-$i%04d-of-corpus", i)).toDF("doc_id", "v"))
    val hit = t.lookup(spark, Seq("shard-q-doc-0007-of-corpus"))
    assert(hit.as[(String, Int)].collect().toSeq ==
      Seq(("shard-q-doc-0007-of-corpus", 7)))
    assert(hit.inputFiles.length == 1,
      s"lookup must prune to 1 file, read ${hit.inputFiles.length}")
  }

  test("data skipping on a SECONDARY stats column (stats.cols property)") {
    import org.apache.spark.sql.execution.datasources.FilePartition
    spark.sql("CREATE NAMESPACE IF NOT EXISTS cat.skip2")
    spark.sql("""CREATE TABLE cat.skip2.t (id BIGINT, ts BIGINT, v STRING)
                 PARTITIONED BY (bucket(1, id))
                 TBLPROPERTIES ('stats.cols' = 'ts')""")
    // OVERLAPPING id ranges (no leading-key pruning possible) but
    // disjoint ts ranges — only the secondary column can prune
    spark.sql("""INSERT INTO cat.skip2.t
                 SELECT id, 10000 + id, 'a' FROM range(0, 100)""")
    spark.sql("""INSERT INTO cat.skip2.t
                 SELECT id + 100, 20000 + id, 'b' FROM range(0, 100)""")
    spark.sql("""INSERT INTO cat.skip2.t
                 SELECT id + 200, 30000 + id, 'c' FROM range(0, 100)""")
    def scanned(sql: String): (Int, Long) = {
      val df = spark.sql(sql)
      val n = df.count()
      val files = df.queryExecution.executedPlan.collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
          b.inputPartitions.collect {
            case f: FilePartition =>
              f.files.map(_.urlEncodedPath).toSeq
            case g: org.apache.spark.sql.GraftBucketedScan.BucketPartition =>
              g.fp.files.map(_.urlEncodedPath).toSeq
          }.flatten
      }.flatten
      (files.distinct.size, n)
    }
    val (f1, n1) = scanned(
      "SELECT * FROM cat.skip2.t WHERE ts >= 20000 AND ts < 20050")
    assert(n1 == 50 && f1 == 1, s"ts-range query must scan 1 file: $f1/$n1")
    val (f2, n2) = scanned("SELECT * FROM cat.skip2.t WHERE v = 'c'")
    assert(n2 == 100 && f2 == 3, s"no ts predicate scans all: $f2/$n2")
  }

  test("RENAME COLUMN with data: name mapping keeps every file generation readable") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS cat.ren")
    spark.sql("""CREATE TABLE cat.ren.t (id BIGINT, val STRING, n INT)
                 PARTITIONED BY (bucket(4, id))""")
    spark.sql("INSERT INTO cat.ren.t VALUES (1,'a',10),(2,'b',20),(3,'c',30)")
    val preRename = GraftTable.open(s"$root/ren/t").currentVersion.get

    spark.sql("ALTER TABLE cat.ren.t RENAME COLUMN val TO label")
    // pre-rename files (physical name 'val') read under the new name
    assert(spark.sql("SELECT label FROM cat.ren.t ORDER BY id")
      .as[String].collect().toSeq == Seq("a", "b", "c"))
    // filter pushdown on the renamed column still finds rows
    assert(spark.sql("SELECT id FROM cat.ren.t WHERE label = 'b'")
      .as[Long].head() == 2L)
    // time travel BEFORE the rename sees the old logical name (checked
    // here while the version is still inside the retention window)
    val old = spark.sql(s"SELECT * FROM cat.ren.t VERSION AS OF $preRename")
    assert(old.columns.contains("val") && !old.columns.contains("label"))
    assert(old.count() == 3)
    // post-rename writes coexist with pre-rename files (same on-disk name)
    spark.sql("INSERT INTO cat.ren.t VALUES (4,'d',40)")
    assert(spark.sql("SELECT label FROM cat.ren.t ORDER BY id")
      .as[String].collect().toSeq == Seq("a", "b", "c", "d"))
    // raw parquet carries the PHYSICAL name for both generations
    val t = GraftTable.open(s"$root/ren/t")
    assert(t.columnMapping == Map("label" -> "val"))
    t.currentFiles.foreach { f =>
      assert(spark.read.parquet(f).columns.contains("val"), f)
    }
    // row-level ops through the mapped scan (runtime bucket filter path)
    spark.sql("UPDATE cat.ren.t SET label = 'z' WHERE id = 1")
    spark.sql("DELETE FROM cat.ren.t WHERE label = 'c'")
    assert(spark.sql("SELECT label FROM cat.ren.t ORDER BY id")
      .as[String].collect().toSeq == Seq("z", "b", "d"))
    // CDC merge keeps working against the logical name
    t.merge(Seq((2L, "b2", 21, "U", "0005"))
      .toDF("id", "label", "n", "_op", "_seq"))
    assert(t.read(spark).orderBy("id").select("label")
      .as[String].collect().toSeq == Seq("z", "b2", "d"))
  }

  test("layered merge-on-read tables refuse raw catalog scans; the TVF " +
      "folds them; collapse restores SQL access") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS cat.mor")
    // build the table OUTSIDE the catalog with forced layers, then
    // register it — the only way a catalog table can be layered (every
    // catalog write path is copy-on-write)
    val t = new GraftTable(s"$root/mor/t", Seq("id"), nBuckets = 4,
      mergeOnRead = true, morMinAffectedBytes = 0L)
    t.overwrite((1L to 10L).map(i => (i, s"v$i")).toDF("id", "v"))
    t.merge(Seq((1L, "u1", "U"), (2L, "", "D"), (20L, "n", "I"))
      .toDF("id", "v", "_op")
      .withColumn("_seq", lit(f"${1L}%016x/${0L}%016x")))
    assert(t.hasLayers, "precondition: layered")
    // query the layered table through the catalog's DSv2 Table handle
    // (the path `SELECT * FROM cat.mor.t` resolves to)
    val sqlTable = new GraftSqlTable(t, "cat.mor.layered")
    val boom = intercept[IllegalStateException](
      sqlTable.newScanBuilder(
        new org.apache.spark.sql.util.CaseInsensitiveStringMap(
          java.util.Collections.emptyMap())))
    assert(boom.getMessage.contains("merge-on-read delta layers"))
    // the TVF folds layers and serves the correct rows
    graft.GraftExtensions.install(spark)
    val viaTvf = spark.sql(
      s"SELECT id, v FROM graft_table('${t.root}') ORDER BY id")
      .as[(Long, String)].collect().toSeq
    assert(viaTvf.head == (1L, "u1") && !viaTvf.exists(_._1 == 2L) &&
      viaTvf.last == (20L, "n"))
    // collapse restores raw-scan access with identical contents
    t.collapseLayers(spark)
    assert(!t.hasLayers)
    val builder = sqlTable.newScanBuilder(
      new org.apache.spark.sql.util.CaseInsensitiveStringMap(
        java.util.Collections.emptyMap()))
    assert(builder != null)
  }

  test("CREATE TABLE with keys/buckets properties instead of a transform") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS cat.props")
    spark.sql("""CREATE TABLE cat.props.t (a BIGINT, b BIGINT, v STRING)
                 TBLPROPERTIES ('keys'='a,b', 'buckets'='4')""")
    val t = GraftTable.open(s"$root/props/t")
    assert(t.keyCols == Seq("a", "b") && t.nBuckets == 4)
    spark.sql("INSERT INTO cat.props.t VALUES (1, 2, 'x')")
    assert(spark.sql("SELECT v FROM cat.props.t WHERE a=1 AND b=2")
      .as[String].head() == "x")
  }
}
