package graft

import graft.queries._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode

/** Physical-plan assertions: these pin the SCALE properties of the
  * declared plans (pushdown reached the scan, small dims broadcast, no
  * accidental cartesian products), so a regression that silently degrades
  * the 100 TB plan fails CI even while small-SF results stay correct. */
class PlanSpec extends SparkSpec {

  private def plan(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("snapshot scan pushes filter and prunes columns to the parquet scan (P1/P2)") {
    val p = plan(CoreQueries.snapshotScan(spark, sf()))
    assert(p.contains("PushedFilters: ["), p)
    assert(p.contains("LessThan(l_quantity"), p)
    // projection pruning: ReadSchema carries only the 4 selected columns
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).get
    assert(readSchema.contains("l_orderkey") && !readSchema.contains("l_shipdate"),
      readSchema)
  }

  test("q1 filter reaches the scan; aggregate is partial → final (map-side combine)") {
    val p = plan(CoreQueries.q1Agg(spark, sf()))
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThan(l_shipdate"), p)
    // two HashAggregates per grouping = partial + final
    assert("(?m)^\\(\\d+\\) HashAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("q3 join broadcasts the customer dimension (no shuffle of the small side)") {
    // no broadcast() hint in the query: the optimizer must choose the
    // broadcast from size estimates, so the same plan degrades to a
    // shuffled join past the 8 GiB broadcast limit instead of failing
    val p = plan(CoreQueries.q3Join(spark, sf()))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("BroadcastExchange"), p)
  }

  test("q5/q18 broadcast SF-scaling dims from size estimates, not forced hints") {
    // customer/supplier grow with SF; dropping the hints must not change
    // the small-SF plan (optimizer still broadcasts) while letting the
    // 100 TB plan fall back to shuffled joins
    val p5 = plan(MoreQueries.q5Join(spark, sf()))
    assert("BroadcastHashJoin".r.findAllIn(p5).size >= 4, p5)
    val p18 = plan(MoreQueries.q18TopOrders(spark, sf()))
    assert(p18.contains("BroadcastHashJoin"), p18)
  }

  test("asof_join plans as windows over one union — no inequality join") {
    // the naive formulation (key equality + time inequality + per-pair
    // max) would be a BroadcastNestedLoopJoin; the operator must stay an
    // equi-shuffled union + window at any scale
    val p = plan(JoinQueries.asofJoin(spark, sf()))
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("Window"), p)
  }

  test("range_join bins restore an equijoin — no nested-loop, no broadcast of a scaling side") {
    val p = plan(JoinQueries.rangeJoin(spark, sf()))
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("mix_domains: corpus is scanned once and never shuffled") {
    val p = plan(CurationQueries.mixDomains(spark, sf()))
    // the only joins are broadcasts of the metadata-scale rate table
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"), p)
  }

  test("vocab_stats: partial aggregation + TakeOrdered, no global sort") {
    val p = plan(TextQueries.vocabStats(spark, sf()))
    // both aggregation levels partial → final (map-side combine), and the
    // top-100 is a TakeOrdered, never a full Sort of the term aggregate
    assert("(?m)^\\(\\d+\\) HashAggregate".r.findAllIn(p).size >= 4, p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("pack_sequences: one shuffle (repartition by shard), sorted in-partition") {
    val p = plan(TextQueries.packSequences(spark, sf()))
    // exactly one exchange feeds the sequential pass; the final orderBy
    // of the gate query adds its own sort, but packing itself must not
    // shuffle more than the shard repartition
    val exchanges = "(?m)^\\(\\d+\\) Exchange".r.findAllIn(p).toSeq
    assert(exchanges.size <= 2, p) // shard repartition + gate orderBy range
    assert(p.contains("MapPartitions") || p.contains("SerializeFromObject"), p)
  }

  test("LWW dedup aggregates map-side before the key shuffle (one exchange)") {
    val ev = Tables.load(spark, sf(), "events")
      .select("user_id", "event_id", "value")
    val p = plan(graft.operators.ApplyOps.lastWriterWins(
      ev, Seq("user_id"), Seq("event_id")))
    // partial_max_by BEFORE the Exchange = map-side combine: the shuffle
    // carries one row per (partition, key), not the raw events
    assert(p.contains("partial_max_by"), p)
    assert("(?m)^\\(\\d+\\) Exchange".r.findAllIn(p).size == 1, p)
  }

  test("snapshot gate joins via broadcast (tiny gate map)") {
    import org.apache.spark.sql.functions._
    // _table must be non-constant or Catalyst folds away the equijoin key
    val ev = Tables.load(spark, sf(), "events")
      .withColumn("_table", col("user_id") % 2 + 1)
      .withColumn("_commit_lsn", col("event_id"))
    val p = plan(graft.operators.ApplyOps.snapshotGate(ev,
      Map(1L -> 10L, 2L -> 20L)))
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("jaccard pair join is an equijoin on the gram hash (no cartesian)") {
    val docs = Tables.load(spark, sf(), "documents")
    val p = plan(graft.operators.Dedup.ngramJaccardPairs(
      docs, "text", "doc_id", 3, 0.5))
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("IVF assignment is a pure projection: no exchange before the mean agg") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val corpus = (1L to 32L)
      .map(i => (i, Array.fill(4)(i.toFloat))).toDF("c_id", "c_vec")
    // the training loop's per-iteration assignment must not shuffle the
    // corpus: argmax over literal centroids is map-side codegen. Probe the
    // same listScores shape ivfTopK uses internally via a 1-iteration run.
    val p = plan(graft.operators.Similarity.ivfTopK(
      corpus.limit(2).select(col("c_id").as("q_id"), col("c_vec").as("q_vec")),
      corpus, k = 3, nLists = 4, nProbe = 2, iterations = 1))
    // the only Exchanges allowed: the list-id candidate join + final window
    // (search path) — NOT a per-assignment centroid crossJoin
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("cluster assignment is shuffle-free; semDeDup pairs meet on an equijoin") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val corpus = (1L to 32L)
      .map(i => (i, Array.fill(4)(i.toFloat))).toDF("id", "vec")
    val cents = Array(Array(1.0, 0, 0, 0), Array(0.0, 1, 0, 0))
    // assignment = pure projection through the kernel: ZERO exchanges —
    // clustering a 100 TB corpus is one read, no shuffle
    val pa = plan(graft.operators.Cluster.assign(corpus, "id", "vec", cents))
    assert(!"(?m)^\\(\\d+\\) Exchange".r.findAllIn(pa).hasNext, pa)
    // the within-cluster pair join is a cluster-id equijoin, never a
    // cartesian/BNLJ over the corpus
    val ps = plan(graft.operators.Cluster.semDeDup(
      corpus, "id", "vec", cents, threshold = 0.9))
    assert(!ps.contains("CartesianProduct"), ps)
    assert(!ps.contains("BroadcastNestedLoopJoin"), ps)
  }

  test("PPJoin prefix extraction is map-side (no shuffle before the gram join)") {
    val docs = Tables.load(spark, sf(), "documents")
    val p = plan(graft.operators.Dedup.ngramJaccardPairs(
      docs, "text", "doc_id", 3, 0.5))
    // hash-order prefixes come from sort_array+slice inside a Project —
    // no Window (rarity order is opt-in), so no extra shuffle+sort stage
    assert(!p.contains("Window"), p)
    // candidate generation joins on the gram hash — SortMergeJoin or
    // shuffled hash join on gh, never a nested loop
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("rollup plans one Expand + partial/final aggregate (no per-level rescans)") {
    val p = plan(AnalyticQueries.rollupStats(spark, sf()))
    // grouping sets materialize through ONE Expand over one scan — three
    // grouping levels must not become three scans/aggregations of lineitem
    assert("(?m)^\\(\\d+\\) Expand".r.findAllIn(p).size == 1, p)
    assert("(?m)^\\(\\d+\\) Scan parquet".r.findAllIn(p).size == 1, p)
    assert("(?m)^\\(\\d+\\) HashAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("GraftTable pinned-schema read plans without a footer sweep (scan carries manifest schema)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-plan2").toString
    val t = new graft.sinks.GraftTable(dir, Seq("id"), nBuckets = 4)
    t.overwrite((1L to 8L).map(i => (i, s"v$i")).toDF("id", "v"))
    val df = t.read(spark)
    // schema comes from the manifest, not file footers: ReadSchema shows
    // the pinned columns even before any action runs
    assert(df.schema.fieldNames.toSeq == Seq("id", "v"))
    val p = plan(df)
    assert(p.contains("ReadSchema"), p)
  }

  test("GraftTable bucket read prunes partitions at the scan (copy-on-write pruning)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-plan").toString
    val t = new graft.sinks.GraftTable(dir, Seq("id"), nBuckets = 8)
    t.overwrite((1L to 64L).map(i => (i, s"v$i")).toDF("id", "v"))
    // reading with a bucket predicate must hit PartitionFilters, i.e. a
    // merge touching one bucket scans 1/nBuckets of the table
    val df = spark.read.parquet(s"$dir/data").filter($"_bucket" === 3)
    val p = plan(df)
    assert(p.contains("PartitionFilters: [isnotnull(_bucket"), p)
    // post-pruning scan reads only bucket 3's file(s): the executed scan
    // reports one selected partition out of 8
    df.collect()
    val scan = df.queryExecution.executedPlan.collectLeaves().head
      .asInstanceOf[org.apache.spark.sql.execution.FileSourceScanExec]
    assert(scan.metrics("numFiles").value == 1, scan.metrics("numFiles").value)
  }

  test("bucketed tables join without a shuffle (co-located join at scale)") {
    import org.apache.spark.sql.functions._
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    // clear stale managed-table locations from crashed runs
    Seq("b_orders", "b_lineitem").foreach { t =>
      val p = java.nio.file.Paths.get("spark-warehouse", t)
      if (java.nio.file.Files.exists(p)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.deleteIfExists(_))
      }
    }
    Tables.load(spark, sf(), "orders")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("b_orders")
    Tables.load(spark, sf(), "lineitem")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("b_lineitem")
    // at tiny SF the optimizer would rightly broadcast; disable it to
    // observe the co-located plan big tables would get
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("b_lineitem").join(spark.table("b_orders"),
        col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus").count()
      val p = plan(joined)
      // both sides pre-bucketed on the join key → SortMergeJoin with NO
      // ShuffleExchange below it (the co-location story for repeated joins)
      assert(p.contains("SortMergeJoin"), p)
      assert(!p.contains("Exchange hashpartitioning(l_orderkey"), p)
      assert(!p.contains("Exchange hashpartitioning(o_orderkey"), p)
      assert(joined.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }

  test("cosine near-dup candidate dedup shuffles ids only (no vector payload)") {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val emb = Tables.load(spark, sf(), "embeddings")
    val q = graft.operators.Similarity.cosineNearDupPairs(
      emb, "vec_id", "embedding", threshold = 0.45, nPlanes = 4, nTables = 8)
    val root: SparkPlan = q.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    // the candidate-pair distinct: its shuffle must carry id columns
    // only — at 100 TB the embedding payload moves exactly twice (the
    // two verify joins), never through the pair-dedup exchange
    val distinctAggs = root.collect {
      case h: BaseAggregateExec
          if h.groupingExpressions.map(_.name).toSet == Set("id_a", "id_b")
            && h.aggregateExpressions.isEmpty => h
    }
    assert(distinctAggs.nonEmpty, root.toString)
    val dedupExchanges = distinctAggs.flatMap(_.collect {
      case e: ShuffleExchangeExec => e
    })
    assert(dedupExchanges.nonEmpty, root.toString)
    dedupExchanges.foreach { ex =>
      val vectorCols = ex.output.filter(a =>
        a.dataType.typeName.startsWith("array"))
      assert(vectorCols.isEmpty,
        s"pair-dedup exchange carries vectors: ${ex.output.mkString(",")}")
    }
  }

  test("IVF-PQ probe join carries codes, not vectors (compressed index)") {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    val emb = Tables.load(spark, sf(), "embeddings")
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val corpus = emb.select(col("vec_id").as("c_id"),
      col("embedding").as("c_vec"))
    val q = graft.operators.Similarity.ivfPqTopK(queries, corpus, k = 3,
      nLists = 8, nProbe = 2, m = 8, ks = 16, iterations = 1)
    val root: SparkPlan = q.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    // the list-id probe join streams the ENCODED corpus: its non-query
    // side must expose codes/rnorm, never the raw c_vec payload
    val probeJoins = root.collect {
      case j: BroadcastHashJoinExec
          if j.output.map(_.name).contains("_codes") => j
    }
    assert(probeJoins.nonEmpty, root.toString)
    probeJoins.foreach { j =>
      assert(!j.output.map(_.name).contains("c_vec"),
        s"probe join leaks raw vectors: ${j.output.map(_.name)}")
    }
  }

  test("decontamination joins on the gram equijoin; per-doc dedup is map-side") {
    import org.apache.spark.sql.functions.col
    val docs = Tables.load(spark, sf(), "documents")
    val p = plan(graft.operators.Contamination.sharedNgrams(
      docs.filter(col("doc_id") % 50 =!= 0),
      docs.filter(col("doc_id") % 50 === 0), "text", "doc_id", 4))
    // corpus×benchmark must be a gram equijoin, never an all-pairs join
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    // the corpus side dedupes n-grams inside array_distinct (map-side):
    // the ONLY distinct aggregation keys on the benchmark gram set, so
    // no corpus-wide (doc_id, gram) dedup exchange exists
    assert("(?m)^\\(\\d+\\) HashAggregate".r.findAllIn(p)
      .size <= 6, p) // bench distinct (partial+final) + final count (×2)
  }

  test("bm25: postings probe is an equijoin; only the one-row stats " +
      "frame nested-loops; index aggregates are partial → final") {
    val p = plan(TextQueries.bm25Search(spark, sf()))
    assert(!p.contains("CartesianProduct"), p)
    // the deliberate one-row corpus-stats broadcast is the ONLY
    // nested-loop join in the plan — everything data-sized meets on
    // hash equijoins
    val bnlj = "(?m)^\\(\\d+\\) BroadcastNestedLoopJoin".r
      .findAllIn(p).size
    assert(bnlj == 1, s"expected exactly the stats cross join: $bnlj\n$p")
    assert(p.contains("BroadcastHashJoin"), p)
    // tf/dl/df index aggregations map-side combine (partial + final)
    assert("(?m)^\\(\\d+\\) HashAggregate".r.findAllIn(p).size >= 6, p)
  }

  test("segment dedup: no cartesian; distinct-doc count and reassembly " +
      "aggregate partial → final") {
    val p = plan(TextQueries.dedupSegments(spark, sf()))
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert("(?m)^\\(\\d+\\) HashAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("brute-force ANN broadcasts the query side (corpus never shuffles)") {
    import org.apache.spark.sql.functions._
    val emb = Tables.load(spark, sf(), "embeddings")
    val queries = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val corpus = emb.select(col("vec_id").as("c_id"),
      col("embedding").as("c_vec"))
    val p = plan(graft.operators.Similarity.bruteForceTopK(queries, corpus, 5))
    assert(p.contains("BroadcastExchange"), p)
  }

  test("substring dedup: gram join is an equijoin; first-occurrence is a " +
      "partial→final min agg, never a window over the gram partition") {
    val docs = Tables.load(spark, sf(), "documents")
    val p = plan(graft.operators.Dedup
      .substringDedup(docs, "doc_id", "text", k = 6))
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    // the skew-safe property: first-occurrence is an AGGREGATE (min of
    // struct → partial→final SortAggregate, map-side combinable before
    // its exchange), and no Window appears anywhere — a row_number over
    // the gram partition would straggle on super-common grams
    assert(!p.contains("Window"), p)
    assert("(?m)^\\(\\d+\\) SortAggregate".r.findAllIn(p).size >= 2, p)
    assert("(?m)^\\(\\d+\\) ObjectHashAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("BPE pair counting: partial→final aggregate over the vocab, " +
      "single-row TakeOrdered pick (no global sort)") {
    import org.apache.spark.sql.functions._
    val docs = Tables.load(spark, sf(), "documents")
    val words = graft.operators.Bpe.wordCounts(docs, "text", "^[a-z0-9]+$")
    val pairs = words
      .select(col("cnt"), split(col("word"), "").as("syms"))
      .filter(size(col("syms")) >= 2)
      .select(col("cnt"), explode(expr(
        "transform(sequence(0, size(syms) - 2), " +
          "i -> struct(syms[i] AS l, syms[i + 1] AS r))")).as("p"))
      .groupBy(col("p.l").as("l"), col("p.r").as("r"))
      .agg(sum(col("cnt")).as("c"))
      .orderBy(desc("c"), asc("l"), asc("r")).limit(1)
    val p = plan(pairs)
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("DSIR: fitting reduces map-side (partial aggs); scoring+selection " +
      "is one shuffle-free scan into a TakeOrdered") {
    import org.apache.spark.sql.functions._
    val docs = Tables.load(spark, sf(), "documents")
    val raw = docs.filter(col("source") =!= "src0").select("doc_id", "text")
    val cfg = graft.operators.Select.Config()
    // distribution fit: explode → partial+final hash agg (map-side
    // combine bounds the shuffle at B rows per partition)
    val counts = raw.select(explode(graft.functions.GramBuckets(
        col("text"), cfg.n, cfg.buckets)).as("b"))
      .groupBy("b").agg(count(lit(1)))
    val pc = plan(counts)
    assert("(?m)^\\(\\d+\\) HashAggregate".r.findAllIn(pc).size >= 2, pc)
    // scoring + Gumbel top-k: the corpus is scanned ONCE, no joins, no
    // exchange other than the TakeOrdered's own singlePartition gather
    val lr = Array.fill(cfg.buckets)(1L)
    val p = plan(graft.operators.Select.resample(
      raw, "doc_id", "text", lr, cfg, k = 10, seed = 1L))
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin")
      && !p.contains("ShuffledHashJoin"), p)
    assert(!p.contains("Exchange hashpartitioning"), p)
  }

  test("heavy hitters recount: candidate filter sits under the " +
      "aggregation (≤k keys shuffle), no global sort") {
    import org.apache.spark.sql.functions._
    val docs = Tables.load(spark, sf(), "documents")
      .select(graft.functions.TextFunctions.tokens(col("text")).as("grams"))
    // the recount leg as built by HeavyHitters.exact for a known
    // candidate set — filter BEFORE explode-aggregation, partial+final
    val recount = docs.select(explode(col("grams")).as("term"))
      .filter(col("term").isInCollection(Seq("scan", "column", "window")))
      .groupBy("term").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > 100L)
    val p = plan(recount)
    assert("(?m)^\\(\\d+\\) HashAggregate".r.findAllIn(p).size >= 2, p)
    assert(p.contains("term IN") || p.contains("term#"), p)
    assert(!p.contains("Sort "), p)
  }
}
