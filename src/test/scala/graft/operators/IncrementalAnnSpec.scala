package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Pins the IncrementalAnn invariant: after EVERY sync, searching the
  * maintained IVF index equals [[Similarity.ivfSearch]] over the
  * current corpus under the same (frozen) quantizer — inserts, list-
  * crossing updates, deletes, and replayed deltas included. */
class IncrementalAnnSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(p: String) = Files.createTempDirectory(p).toString

  // 4-dim toy space with 4 well-separated axis centroids
  private val centroids: Array[Array[Double]] =
    Array(Array(1, 0, 0, 0), Array(0, 1, 0, 0),
      Array(0, 0, 1, 0), Array(0, 0, 0, 1)).map(_.map(_.toDouble))

  private def vec(axis: Int, jitter: Double, id: Long): Seq[Float] = {
    val v = Array.fill(4)(jitter.toFloat * ((id % 3) - 1))
    v(axis) = 1.0f
    v.toSeq
  }

  private def corpusDf(state: Map[Long, Seq[Float]]): DataFrame =
    state.toSeq.toDF("id", "vec")

  private def changesDf(prev: Map[Long, Seq[Float]],
      next: Map[Long, Seq[Float]]): DataFrame = {
    val ins = (next.keySet -- prev.keySet).toSeq.map(id => (id, next(id), "insert"))
    val del = (prev.keySet -- next.keySet).toSeq.map(id => (id, prev(id), "delete"))
    val upd = (next.keySet & prev.keySet).toSeq
      .filter(id => prev(id) != next(id))
      .flatMap(id => Seq((id, prev(id), "update_preimage"),
        (id, next(id), "update_postimage")))
    (ins ++ del ++ upd).toDF("id", "vec", "_change_type")
  }

  test("index search equals from-scratch IVF through mutations + replay") {
    val lists = IncrementalAnn.listsTable(tmp("ia-lists"), 8)
    val cents = IncrementalAnn.centroidsTable(tmp("ia-cents"))
    var state = (1L to 40L).map(i =>
      i -> vec((i % 4).toInt, 0.05, i)).toMap

    val queries = (0 until 4).map(a =>
      (100L + a, vec(a, 0.02, 100L + a))).toDF("q_id", "q_vec")

    def check(label: String): Unit = {
      val got = IncrementalAnn.search(spark, lists, cents, queries,
          k = 5, nProbe = 2)
        .orderBy("q_id", "rank")
        .as[(Long, Long, Double, Int)].collect().toSeq
      val want = Similarity.ivfSearch(queries, corpusDf(state)
            .select(col("id").as("c_id"), col("vec").as("c_vec")),
          centroids, k = 5, nProbe = 2)
        .orderBy("q_id", "rank")
        .select(col("q_id"), col("c_id"), col("sim"), col("rank"))
        .as[(Long, Long, Double, Int)].collect().toSeq
      assert(got == want, s"$label:\n index $got\n batch $want")
    }

    IncrementalAnn.bootstrap(spark, lists, cents, corpusDf(state),
      "id", "vec", centroids, "0000000000000001/0")
    check("bootstrap")

    // mixed delta: inserts, a delete, an update that MOVES a vector to
    // another list, and an update that keeps the vector's list
    val next = state - 7L +
      (41L -> vec(2, 0.05, 41L)) +
      (8L -> vec(((8 % 4) + 1) % 4, 0.05, 8L)) + // axis flips → new list
      (9L -> vec((9 % 4).toInt, 0.09, 9L))       // same list, new jitter
    val delta = changesDf(state, next)
    IncrementalAnn.applyDelta(spark, lists, cents, delta, "id", "vec",
      "0000000000000002/0")
    state = next
    check("mixed delta")

    // replayed delta (same seq) must be a no-op
    val v2 = lists.currentVersion
    IncrementalAnn.applyDelta(spark, lists, cents, delta, "id", "vec",
      "0000000000000002/0")
    check("replayed delta")
    assert(lists.currentVersion == v2, "replay must not commit")

    // an unchanged-vector "update" writes nothing
    val noop = changesDf(state, state.map { case (k, v) => k -> v })
    assert(noop.isEmpty)
  }

  test("unchanged vectors produce no index writes") {
    val lists = IncrementalAnn.listsTable(tmp("ia-lists2"), 4)
    val cents = IncrementalAnn.centroidsTable(tmp("ia-cents2"))
    val state = (1L to 10L).map(i => i -> vec((i % 4).toInt, 0.05, i)).toMap
    IncrementalAnn.bootstrap(spark, lists, cents, corpusDf(state),
      "id", "vec", centroids, "0000000000000001/0")
    val v1 = lists.currentVersion
    // pre/post images identical for every row → net delta is empty
    val ch = state.toSeq.flatMap { case (id, v) =>
      Seq((id, v, "update_preimage"), (id, v, "update_postimage"))
    }.toDF("id", "vec", "_change_type")
    IncrementalAnn.applyDelta(spark, lists, cents, ch, "id", "vec",
      "0000000000000002/0")
    assert(lists.currentVersion == v1,
      "no-net delta must not commit a new snapshot")
  }

  test("lists are a real secondary index: probes prune buckets") {
    val lists = IncrementalAnn.listsTable(tmp("ia-lists3"), 8)
    val cents = IncrementalAnn.centroidsTable(tmp("ia-cents3"))
    val state = (1L to 200L).map(i => i -> vec((i % 4).toInt, 0.05, i)).toMap
    IncrementalAnn.bootstrap(spark, lists, cents, corpusDf(state),
      "id", "vec", centroids, "0000000000000001/0")
    val allFiles = lists.read(spark).inputFiles.length
    val probedFiles = lists.readForProbe(spark,
      Seq(0).toDF("list_id")).inputFiles.length
    assert(probedFiles > 0 && probedFiles < allFiles,
      s"probe must scan a strict subset: $probedFiles of $allFiles")
  }

  test("applyFeedBatch keeps the ANN index live over graft-row-follow " +
      "(checkpointed, replay-guarded, expiry keeps the quantizer)") {
    import graft.sinks.GraftTable
    val dir = tmp("ia-feed")
    val root = s"$dir/leader"
    val leader = new GraftTable(root, Seq("id"), nBuckets = 4,
      retainVersions = 2)
    val lists = IncrementalAnn.listsTable(s"$dir/lists", 8)
    val cents = IncrementalAnn.centroidsTable(s"$dir/cents")
    val ckpt = s"$dir/ckpt"
    def pass(): Unit = {
      val q = spark.readStream.format("graft-row-follow")
        .option("path", root).load()
        .writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (df: DataFrame, _: Long) =>
          IncrementalAnn.applyFeedBatch(df, root, lists, cents,
            "id", "vec")
        }
        .start()
      q.processAllAvailable()
      q.stop()
    }
    val queries = (0 until 4).map(a =>
      (100L + a, vec(a, 0.02, 100L + a))).toDF("q_id", "q_vec")
    def check(label: String): Unit = {
      val corpus = leader.read(spark)
        .select(col("id").as("c_id"), col("vec").as("c_vec"))
      val got = IncrementalAnn.search(spark, lists, cents, queries,
          k = 5, nProbe = 2).orderBy("q_id", "rank")
        .as[(Long, Long, Double, Int)].collect().toSeq
      val want = Similarity.ivfSearch(queries, corpus, centroids,
          k = 5, nProbe = 2).orderBy("q_id", "rank")
        .as[(Long, Long, Double, Int)].collect().toSeq
      assert(got == want, s"$label:\n index $got\n batch $want")
    }

    // quantizer persists FIRST (frozen); the feed then fills the lists
    import spark.implicits._
    cents.merge(centroids.zipWithIndex
      .map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("list_id", "centroid")
      .withColumn("_op", lit("I"))
      .withColumn("_seq", lit("0000000000000000/0")))
    leader.overwrite((1L to 20L).map(i =>
      (i, vec((i % 4).toInt, 0.05, i))).toDF("id", "vec"))
    pass(); check("bootstrap")

    // CDC-shaped commits: a list-crossing update, a delete, an insert
    leader.merge(Seq(
        (2L, vec(3, 0.05, 2L), "U", "0000000000000010/0"),
        (5L, vec(0, 0.0, 5L), "D", "0000000000000011/0"))
      .toDF("id", "vec", "_op", "_seq"))
    leader.append(Seq((30L, vec(1, 0.07, 30L))).toDF("id", "vec"))
    pass(); check("cdc delta")

    // no new commits → replayed pass is a no-op
    pass(); check("replay no-op")

    // churn past retention (keep 2): next pass opens full-refresh; the
    // lists reset + re-bootstrap but the frozen quantizer survives
    leader.merge(Seq((31L, vec(2, 0.05, 31L), "I", "12"))
      .toDF("id", "vec", "_op", "_seq"))
    leader.merge(Seq((1L, vec(1, 0.05, 1L), "U", "13"))
      .toDF("id", "vec", "_op", "_seq"))
    leader.merge(Seq((3L, vec(0, 0.0, 3L), "D", "14"))
      .toDF("id", "vec", "_op", "_seq"))
    pass(); check("after expiry full-refresh")
    assert(IncrementalAnn.loadCentroids(spark, cents).length ==
      centroids.length, "expiry must not drop the quantizer")
  }

  test("randomized mutation soak: invariant holds across 6 random syncs") {
    val rnd = new scala.util.Random(20260814L)
    def rvec(): Seq[Float] = {
      val v = Array.fill(4)((rnd.nextInt(21) - 10) / 100.0f)
      v(rnd.nextInt(4)) = 1.0f
      v.toSeq
    }
    val lists = IncrementalAnn.listsTable(tmp("ia-soak-l"), 8)
    val cents = IncrementalAnn.centroidsTable(tmp("ia-soak-c"))
    var state = (1L to 30L).map(i => i -> rvec()).toMap
    var nextId = 31L
    IncrementalAnn.bootstrap(spark, lists, cents, corpusDf(state),
      "id", "vec", centroids, f"${1L}%016x/0")
    val queries = (0 until 4).map(a =>
      (200L + a, vec(a, 0.03, 200L + a))).toDF("q_id", "q_vec")
    for (sync <- 2 to 7) {
      val next0 = state.flatMap { case (id, v) =>
        rnd.nextInt(10) match {
          case 0 | 1 => None                    // delete (p = .2)
          case 2 | 3 | 4 => Some(id -> rvec())  // update (p = .3)
          case _ => Some(id -> v)
        }
      }
      val inserts = (0 until rnd.nextInt(4)).map { _ =>
        val id = nextId; nextId += 1; id -> rvec()
      }
      val next = next0 ++ inserts
      IncrementalAnn.applyDelta(spark, lists, cents,
        changesDf(state, next), "id", "vec", f"${sync.toLong}%016x/0")
      state = next
      val got = IncrementalAnn.search(spark, lists, cents, queries,
          k = 5, nProbe = 2).orderBy("q_id", "rank")
        .as[(Long, Long, Double, Int)].collect().toSeq
      val want = Similarity.ivfSearch(queries, corpusDf(state)
            .select(col("id").as("c_id"), col("vec").as("c_vec")),
          centroids, k = 5, nProbe = 2).orderBy("q_id", "rank")
        .as[(Long, Long, Double, Int)].collect().toSeq
      assert(got == want, s"sync $sync (|corpus|=${state.size})")
    }
  }

  test("trained-quantizer bootstrap equals Similarity.ivfTopK") {
    val emb = graft.Tables.load(spark, sf(), "embeddings")
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    val (trained, _) = Similarity.trainCoarse(
      emb.select(col("id").as("c_id"), col("vec").as("c_vec")),
      "c_id", "c_vec", nLists = 8, iterations = 2)
    val lists = IncrementalAnn.listsTable(tmp("ia-lists4"), 8)
    val cents = IncrementalAnn.centroidsTable(tmp("ia-cents4"))
    IncrementalAnn.bootstrap(spark, lists, cents, emb, "id", "vec",
      trained, "0000000000000001/0")
    // the persisted quantizer round-trips bit-exactly
    val loaded = IncrementalAnn.loadCentroids(spark, cents)
    assert(loaded.length == trained.length &&
      loaded.zip(trained).forall { case (a, b) => a.sameElements(b) })
    val queries = emb.filter(col("id") < 5)
      .select(col("id").as("q_id"), col("vec").as("q_vec"))
    val got = IncrementalAnn.search(spark, lists, cents, queries,
        k = 10, nProbe = 3).orderBy("q_id", "rank")
      .as[(Long, Long, Double, Int)].collect().toSeq
    val want = Similarity.ivfTopK(queries,
        emb.select(col("id").as("c_id"), col("vec").as("c_vec")),
        k = 10, nLists = 8, nProbe = 3, iterations = 2)
      .orderBy("q_id", "rank")
      .as[(Long, Long, Double, Int)].collect().toSeq
    assert(got == want)
  }
}
