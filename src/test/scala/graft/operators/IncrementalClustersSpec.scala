package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Pins the IncrementalClusters invariant: after every sync,
  * `readClusters == Dedup.connectedComponents(readPairs)` — component
  * merges (a new pair bridges two components), splits (a deleted
  * document was the cut vertex), pure insertions, and replayed deltas
  * all included. */
class IncrementalClustersSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(p: String) = Files.createTempDirectory(p).toString

  /** Apply a canonical pair-set transition to a mirrored pair table the
    * way IncrementalDedup's sync does (mirrored I rows for additions,
    * mirrored D rows for removals). */
  private def pairSync(pairs: graft.sinks.GraftTable,
      add: Seq[(Long, Long)], del: Seq[(Long, Long)], seq: String): Unit = {
    def mirrored(ps: Seq[(Long, Long)], op: String) = {
      val canon = ps.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      (canon ++ canon.map(p => (p._2, p._1)))
        .toDF("id_a", "id_b")
        .withColumn("sim",
          if (op == "I") lit(1.0) else lit(null).cast("double"))
        .withColumn("_op", lit(op))
    }
    pairs.merge(mirrored(add, "I").unionByName(mirrored(del, "D"))
      .withColumn("_seq", lit(seq)))
  }

  private def check(label: String, idRep: graft.sinks.GraftTable,
      pairs: graft.sinks.GraftTable): Unit = {
    val got = IncrementalClusters.readClusters(spark, idRep)
      .as[(Long, Long)].collect().toSet
    val canon = IncrementalDedup.readPairs(spark, pairs)
    val want =
      if (canon.columns.isEmpty || canon.isEmpty) Set.empty[(Long, Long)]
      else Dedup.connectedComponents(canon, "id_a", "id_b")
        .as[(Long, Long)].collect().toSet
    assert(got == want, s"$label:\n got  $got\n want $want")
  }

  test("merges, splits, and replay keep clusters == CC(pairs)") {
    val dir = tmp("ic")
    val pairs = IncrementalDedup.pairTable(s"$dir/pairs", 4)
    val idRep = IncrementalClusters.idRepTable(s"$dir/idrep", 4)
    val members = IncrementalClusters.membersTable(s"$dir/members", 4)
    def sync(ids: Seq[Long], seq: String) =
      IncrementalClusters.applyDelta(spark, idRep, members, pairs,
        ids.toDF("id"), "id", seq)

    // bootstrap: chain {1-2-3} and pair {10-11}
    pairSync(pairs, Seq((1L, 2L), (2L, 3L), (10L, 11L)), Nil, "01")
    sync(Seq(1L, 2L, 3L, 10L, 11L), "01")
    check("bootstrap", idRep, pairs)
    assert(IncrementalClusters.readClusters(spark, idRep)
      .as[(Long, Long)].collect().toSet ==
      Set((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (11L, 10L)))

    // MERGE: doc 3 gains a pair to 10 — both components collapse to 1
    pairSync(pairs, Seq((3L, 10L)), Nil, "02")
    sync(Seq(3L), "02")
    check("merge", idRep, pairs)
    assert(IncrementalClusters.readClusters(spark, idRep)
      .filter(col("id") === 11L).select("rep").as[Long].head() == 1L)

    // SPLIT: doc 2 (the 1-3 cut vertex) is deleted along with its pairs
    // AND the 3-10 bridge goes — 1 drops out entirely (no pairs left),
    // {3,10,11} keep a component
    pairSync(pairs, Nil, Seq((1L, 2L), (2L, 3L), (3L, 10L)), "03")
    sync(Seq(2L, 3L), "03")
    check("split", idRep, pairs)
    val after = IncrementalClusters.readClusters(spark, idRep)
      .as[(Long, Long)].collect().toSet
    assert(!after.exists(_._1 == 1L), s"1 must drop (no pairs): $after")
    assert(!after.exists(_._1 == 2L), s"2 must drop (deleted): $after")

    // replayed cluster sync (same seq): both tables no-op
    val v1 = (idRep.currentVersion, members.currentVersion)
    sync(Seq(2L, 3L), "03")
    assert((idRep.currentVersion, members.currentVersion) == v1)
    check("replay", idRep, pairs)
  }

  test("e2e with the text pair front: clusters follow IncrementalDedup " +
      "syncs on a real corpus slice") {
    val cfg = IncrementalDedup.Config()
    val docs = graft.Tables.load(spark, sf(), "documents")
      .select(col("doc_id"), col("text")).limit(300).localCheckpoint()
    val dir = tmp("ic-e2e")
    val bands = IncrementalDedup.bandTable(s"$dir/bands", 8)
    val pairs = IncrementalDedup.pairTable(s"$dir/pairs", 4)
    val idRep = IncrementalClusters.idRepTable(s"$dir/idrep", 4)
    val members = IncrementalClusters.membersTable(s"$dir/members", 4)

    // bootstrap
    IncrementalDedup.applyDelta(spark, bands, pairs, docs,
      docs.withColumn("_change_type", lit("insert")),
      "doc_id", "text", "01", cfg)
    IncrementalClusters.applyDelta(spark, idRep, members, pairs,
      docs.select(col("doc_id").as("id")), "id", "01")
    check("bootstrap", idRep, pairs)

    // mixed delta: clones insert (new pairs → merges), some docs delete
    val delCond = col("doc_id") % 31 === 0
    val clones = docs.filter(col("doc_id") % 9 === 0)
      .select((col("doc_id") + 500000L).as("doc_id"), col("text"))
    val changes = clones.withColumn("_change_type", lit("insert"))
      .unionByName(docs.filter(delCond)
        .withColumn("_change_type", lit("delete")))
    val corpus2 = docs.filter(!delCond).unionByName(clones)
    IncrementalDedup.applyDelta(spark, bands, pairs, corpus2, changes,
      "doc_id", "text", "02", cfg)
    IncrementalClusters.applyDelta(spark, idRep, members, pairs,
      changes.select(col("doc_id").as("id")).distinct(), "id", "02")
    check("mixed delta", idRep, pairs)
  }

  test("embed pair front: cluster syncs follow applyEmbedDelta — the " +
      "incremental SEMANTIC-dedup-clusters composition") {
    val ecfg = IncrementalDedup.EmbedConfig(threshold = 0.9, nPlanes = 4,
      nTables = 8)
    val dir = tmp("ic-embed")
    val bands = IncrementalDedup.bandTable(s"$dir/bands", 8)
    val pairs = IncrementalDedup.pairTable(s"$dir/pairs", 4)
    val idRep = IncrementalClusters.idRepTable(s"$dir/idrep", 4)
    val members = IncrementalClusters.membersTable(s"$dir/members", 4)
    def vec(d: Int, eps: Float): Array[Float] = {
      val v = Array.fill(8)(0.01f * d)
      v(d % 8) = 1.0f
      v((d + 3) % 8) = eps
      v
    }
    var state = Map.empty[Long, Array[Float]]
    var v = 0L
    def sync(next: Map[Long, Array[Float]]): Unit = {
      v += 1
      val prev = state
      val ins = (next.keySet -- prev.keySet).toSeq
        .map(id => (id, next(id), "insert"))
      val del = (prev.keySet -- next.keySet).toSeq
        .map(id => (id, prev(id), "delete"))
      val upd = (next.keySet & prev.keySet).toSeq
        .filter(id => !prev(id).sameElements(next(id)))
        .flatMap(id => Seq((id, prev(id), "update_preimage"),
          (id, next(id), "update_postimage")))
      IncrementalDedup.applyEmbedDelta(spark, bands, pairs,
        next.toSeq.toDF("vec_id", "embedding"),
        (ins ++ del ++ upd).toDF("vec_id", "embedding", "_change_type"),
        "vec_id", "embedding", f"$v%016x/0", ecfg)
      IncrementalClusters.applyDelta(spark, idRep, members, pairs,
        (ins ++ del ++ upd).map(_._1).distinct.toDF("id"), "id",
        f"$v%016x/0")
      state = next
      check(s"embed sync $v", idRep, pairs)
    }
    // bootstrap: {1,2} share direction 0, {3,4,5} direction 1
    sync(Map(1L -> vec(0, 0.01f), 2L -> vec(0, 0.02f),
      3L -> vec(1, 0.01f), 4L -> vec(1, 0.02f), 5L -> vec(1, 0.03f)))
    // 2 migrates to direction 1 → clusters merge
    sync(state + (2L -> vec(1, 0.04f)))
    // the direction-1 group loses members → split/shrink
    sync(state - 3L - 4L)
  }

  test("distributed-CC fallback (edge cap exceeded) produces the same " +
      "clustering as the driver union-find path") {
    // same transition applied through both CC paths — a chain that
    // merges, then a split — must land identical state
    def run(cap: Int): Set[(Long, Long)] = {
      val dir = tmp(s"ic-cap$cap")
      val pairs = IncrementalDedup.pairTable(s"$dir/pairs", 4)
      val idRep = IncrementalClusters.idRepTable(s"$dir/idrep", 4)
      val members = IncrementalClusters.membersTable(s"$dir/members", 4)
      val chain = (0L until 40L).map(i => (i, i + 1))
      pairSync(pairs, chain ++ Seq((100L, 101L)), Nil, "01")
      IncrementalClusters.applyDelta(spark, idRep, members, pairs,
        (0L to 101L).toDF("id"), "id", "01", localEdgeCap = cap)
      check(s"cap=$cap bootstrap", idRep, pairs)
      // split the chain at 20 and bridge 100 into the right half
      pairSync(pairs, Seq((41L, 100L)), Seq((20L, 21L)), "02")
      IncrementalClusters.applyDelta(spark, idRep, members, pairs,
        Seq(20L, 21L, 41L, 100L).toDF("id"), "id", "02",
        localEdgeCap = cap)
      check(s"cap=$cap churn", idRep, pairs)
      IncrementalClusters.readClusters(spark, idRep)
        .as[(Long, Long)].collect().toSet
    }
    val local = run(1 << 17) // everything fits the driver path
    val dist = run(1)        // every sync exceeds the cap → distributed
    assert(local == dist, s"paths diverge:\n local $local\n dist  $dist")
  }

  test("applyFeedBatch: corpus→pairs→clusters chain stays live over the " +
      "graft-row-follow stream (merge + split churn, replay, expiry)") {
    val cfg = IncrementalDedup.Config()
    val base = "the quick brown fox jumps over the lazy dog " +
      "while rain falls on the quiet village roof tonight"
    val other = "completely different words about spark shuffles " +
      "partitions codegen catalyst tungsten execution plans and buckets"
    val dir = tmp("ic-feed")
    val root = s"$dir/leader"
    val leader = new graft.sinks.GraftTable(root, Seq("doc_id"),
      nBuckets = 4, retainVersions = 2)
    val bands = IncrementalDedup.bandTable(s"$dir/bands", 16)
    val pairs = IncrementalDedup.pairTable(s"$dir/pairs", 4)
    val idRep = IncrementalClusters.idRepTable(s"$dir/idrep", 4)
    val members = IncrementalClusters.membersTable(s"$dir/members", 4)
    val ckpt = s"$dir/ckpt"
    def pass(): Unit = {
      val q = spark.readStream.format("graft-row-follow")
        .option("path", root).load()
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (df: DataFrame, _: Long) =>
          IncrementalClusters.applyFeedBatch(df, root, bands, pairs,
            idRep, members, "doc_id", "text", cfg)
        }
        .start()
      q.processAllAvailable()
      q.stop()
    }
    def clusters() = IncrementalClusters.readClusters(spark, idRep)
      .as[(Long, Long)].collect().toSet

    leader.overwrite(Seq(
      1L -> s"$base alpha", 2L -> s"$base beta",
      3L -> other).toDF("doc_id", "text"))
    pass()
    check("feed bootstrap", idRep, pairs)
    assert(clusters() == Set((1L, 1L), (2L, 1L)), clusters())

    // churn: 2 migrates clusters (splits {1,2}, joins {3}), 5 joins the
    // other cluster, 1 deletes — clusters must track per commit
    leader.merge(Seq(
        (2L, s"$other qq ww", "U", "0000000000000010/0"),
        (5L, s"$other zz", "I", "0000000000000011/0"),
        (1L, "", "D", "0000000000000012/0"))
      .toDF("doc_id", "text", "_op", "_seq"))
    pass()
    check("feed churn", idRep, pairs)
    assert(clusters() == Set((2L, 2L), (3L, 2L), (5L, 2L)), clusters())

    // no new commits → replayed pass no-ops the whole chain
    val v = (idRep.currentVersion, members.currentVersion)
    pass()
    assert((idRep.currentVersion, members.currentVersion) == v)

    // churn past retention (keep 2): expired checkpoint → full-refresh
    // feed must reset ALL FOUR state tables and re-bootstrap
    leader.merge(Seq((6L, s"$base gamma", "I", "13"))
      .toDF("doc_id", "text", "_op", "_seq"))
    leader.merge(Seq((7L, s"$base delta", "I", "14"))
      .toDF("doc_id", "text", "_op", "_seq"))
    leader.merge(Seq((8L, s"$other yy", "I", "15"))
      .toDF("doc_id", "text", "_op", "_seq"))
    pass()
    check("feed expiry rebuild", idRep, pairs)
    assert(clusters().groupBy(_._2).keySet.size == 2,
      s"two clusters after re-bootstrap: ${clusters()}")
  }

  test("affected-component reads are bucket-pruned (strict file subset)") {
    val dir = tmp("ic-probe")
    val pairs = IncrementalDedup.pairTable(s"$dir/pairs", 8)
    val idRep = IncrementalClusters.idRepTable(s"$dir/idrep", 8)
    val members = IncrementalClusters.membersTable(s"$dir/members", 8)
    // 200 two-member components spread across buckets
    val ps = (0L until 200L).map(i => (i * 2, i * 2 + 1))
    pairSync(pairs, ps, Nil, "01")
    IncrementalClusters.applyDelta(spark, idRep, members, pairs,
      (0L until 400L).toDF("id"), "id", "01")
    val allM = members.read(spark).inputFiles.length
    val probed = members.readForProbe(spark,
      Seq(0L).toDF("rep")).inputFiles.length
    assert(probed > 0 && probed < allM,
      s"members probe must scan a strict subset: $probed of $allM")
    val allR = idRep.read(spark).inputFiles.length
    val probedR = idRep.readForProbe(spark,
      Seq(7L).toDF("id")).inputFiles.length
    assert(probedR > 0 && probedR < allR,
      s"idRep probe must scan a strict subset: $probedR of $allR")
  }
}
