package graft.sinks

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Model-based test: a random sequence of table operations runs against
  * BOTH the real GraftTable and a driver-side reference model (key →
  * (value, seq) map with last-writer-wins semantics); after every step
  * the table's read must equal the model. Catches copy-on-write bucket
  * accounting, replay-guard, truncate-rewind, and maintenance bugs that
  * single-scenario tests miss. Deterministic seeds → reproducible. */
class GraftTableModelSpec extends SparkSpec {
  import spark.implicits._

  private final case class ModelRow(v: String, seq: String)

  private def runScenario(seed: Long, steps: Int,
      mergeOnRead: Boolean = false): Unit = {
    val rnd = new scala.util.Random(seed)
    val root = Files.createTempDirectory(s"graft-model-$seed").toString
    val t = new GraftTable(root, Seq("id"), nBuckets = 4,
      mergeOnRead = mergeOnRead)
    val model = scala.collection.mutable.Map.empty[Long, ModelRow]
    var highWater = ""
    var lsn = 0L
    // current logical name of the payload column: the rename op flips it
    // between "v" and "val" (metadata-only commits), and every consumer
    // below must keep tracking it — the rename/CDF/follow machinery run
    // differentially under the same random op stream
    var vCol = "v"

    // a downstream materialization maintained ONLY through changesSince
    // pulls — the CDF-lite consumer contract run differentially against
    // the same random op stream
    var followerVersion = -1L
    val follower = scala.collection.mutable.Map.empty[Long, (String, Int)]
    var sinceLastPull = 0
    def pullFollower(step: String): Unit = {
      val c = t.changesSince(spark, followerVersion)
      if (c.version < 0) { follower.clear(); followerVersion = -1L; return }
      val rows =
        if (c.rows.columns.isEmpty) Array.empty[(Long, String, Int)]
        else c.rows.select(col("id"), col(vCol), col("_bucket"))
          .as[(Long, String, Int)].collect()
      if (c.fullRefresh) follower.clear()
      else {
        val dead = rows.map(_._3).toSet ++ c.goneBuckets
        follower.filterInPlace { case (_, (_, b)) => !dead.contains(b) }
      }
      rows.foreach { case (id, v, b) => follower(id) = (v, b) }
      followerVersion = c.version
      val got = follower.map { case (k, (v, _)) => k -> v }.toMap
      val want = model.map { case (k, r) => k -> r.v }.toMap
      assert(got == want,
        s"seed=$seed follower diverged after $step: got=$got want=$want")
    }

    // a second consumer maintained ONLY by applying the ROW-LEVEL change
    // feed (rowChangesSince): insert/update_postimage put, delete
    // removes, preimages are informational; full refresh rebuilds —
    // the CDF contract run differentially against the same op stream
    var cdfVersion = -1L
    val cdfView = scala.collection.mutable.Map.empty[Long, String]
    var sinceCdfPull = 0
    def pullCdf(step: String): Unit = {
      val c = t.rowChangesSince(spark, cdfVersion)
      if (c.version < 0) { cdfView.clear(); cdfVersion = -1L; return }
      val rows =
        if (!c.rows.columns.contains("id")) Array.empty[(Long, String, String)]
        else c.rows.select(col("id"), col(vCol), col("_change_type"))
          .as[(Long, String, String)].collect()
      if (c.fullRefresh) cdfView.clear()
      rows.foreach {
        case (id, v, t) if t == "insert" || t == "update_postimage" =>
          cdfView(id) = v
        case (id, _, "delete") => cdfView.remove(id)
        case _ => () // update_preimage
      }
      cdfVersion = c.version
      val want = model.map { case (k, r) => k -> r.v }.toMap
      assert(cdfView.toMap == want,
        s"seed=$seed CDF view diverged after $step: " +
          s"got=${cdfView.toMap} want=$want")
    }

    def check(step: String): Unit = {
      val actual = t.read(spark)
      val got =
        if (actual.columns.isEmpty) Map.empty[Long, String]
        else actual.select(col("id"), col(vCol)).as[(Long, String)].collect().toMap
      val want = model.map { case (k, r) => k -> r.v }.toMap
      assert(got == want, s"seed=$seed after $step: got=$got want=$want")
      // follower pulls on a slower cadence than the writer commits —
      // diffs span several versions (and sometimes expire past retention)
      sinceLastPull += 1
      if (sinceLastPull >= 3 || rnd.nextInt(4) == 0) {
        sinceLastPull = 0
        pullFollower(step)
      }
      sinceCdfPull += 1
      if (sinceCdfPull >= 4 || rnd.nextInt(5) == 0) {
        sinceCdfPull = 0
        pullCdf(step)
      }
    }

    def seqOf(l: Long) = f"$l%016x/${0L}%016x"

    def applyToModel(rows: Seq[(Long, String, String, Long)]): Unit = {
      // LWW within the batch, replay-guard against the table high-water
      val fresh = rows.filter(r => highWater.isEmpty || seqOf(r._4) > highWater)
      if (fresh.isEmpty) return
      val perKey = fresh.groupBy(_._1).values.map(_.maxBy(_._4))
      perKey.foreach {
        case (id, _, "D", _) => model.remove(id)
        case (id, v, _, l) => model(id) = ModelRow(v, seqOf(l))
      }
      val m = fresh.map(_._4).max
      if (highWater.isEmpty || seqOf(m) > highWater) highWater = seqOf(m)
    }

    // Spark's bucket routing (pmod(murmur3, n)) for the model's ids,
    // under the bucket count CURRENTLY in force (the rebucket op flips
    // it) — one job per distinct count, reused by the replaceBuckets case
    var curBuckets = 4
    val bucketMaps = scala.collection.mutable.Map.empty[Int, Map[Long, Int]]
    def bucketOf(id: Long): Int = bucketMaps.getOrElseUpdate(curBuckets,
      spark.range(0, 5000)
        .select(col("id"),
          pmod(hash(col("id")), lit(curBuckets)).cast("int"))
        .as[(Long, Int)].collect().toMap)(id)

    var appendId = 1000L // appends use fresh ids: the model is a key map
    def mergeRandom(): Unit = {
      lsn += 1
      val rows = (1 to rnd.nextInt(6) + 1).map { _ =>
        val id = rnd.nextInt(12).toLong
        val op = if (rnd.nextInt(4) == 0) "D" else "U"
        (id, s"v$lsn-$id", op, lsn)
      }
      val deduped = rows.groupBy(_._1).values.map(_.maxBy(_._4)).toSeq
      t.merge(deduped.toDF("id", vCol, "_op", "lsn")
        .withColumn("_seq",
          format_string("%016x/%016x", col("lsn"), lit(0L))).drop("lsn"))
      applyToModel(rows)
    }

    (1 to steps).foreach { step =>
      rnd.nextInt(16) match {
        case i if i <= 5 => // merge a fresh batch (most common op)
          mergeRandom()
          check(s"merge@$lsn")
        case 6 => // replay an OLD lsn (must be a no-op)
          if (lsn > 0) {
            val old = rnd.nextLong(lsn) + 1
            val rows = Seq((rnd.nextInt(12).toLong, s"stale$old", "U", old))
            t.merge(rows.toDF("id", vCol, "_op", "lsn")
              .withColumn("_seq",
                format_string("%016x/%016x", col("lsn"), lit(0L))).drop("lsn"))
            applyToModel(rows) // replay-guard inside applyToModel drops it
            check(s"replay@$old")
          }
        case 7 => // truncate (rewinds the replay mark with the data)
          t.truncate()
          model.clear()
          highWater = ""
          check("truncate")
        case 8 => // data-identical maintenance: sometimes a z-order
          // rewrite first (degenerate 1-D curve — exercises the
          // range-partitioned write path under random state), sometimes
          // an adjacent-file merge (the layer-safe fragmentation pass)
          // with a random per-run budget
          if (rnd.nextInt(2) == 0)
            t.clusterBy(spark, "id", "id", filesPerBucket = 2)
          if (rnd.nextInt(2) == 0)
            t.mergeAdjacentFiles(spark, targetBytes = 1L << 20,
              maxCompactedFiles = 2 + rnd.nextInt(6))
          t.compact(spark, maxFiles = 1)
          t.vacuum(keep = 1)
          check("compact+vacuum")
        case 9 => // overwrite (backfill re-copy; resets the replay mark)
          lsn += 1
          val rows = (1 to rnd.nextInt(5) + 1)
            .map(_ => (rnd.nextInt(12).toLong, s"bf$lsn")).distinct
          val byId = rows.groupBy(_._1).map(_._2.head).toSeq
          t.overwrite(byId.toDF("id", vCol))
          model.clear()
          byId.foreach { case (id, v) => model(id) = ModelRow(v, "") }
          highWater = ""
          check(s"overwrite@$lsn")
        case 10 => // append (INSERT INTO path): fresh ids, mark untouched
          val rows = (1 to rnd.nextInt(4) + 1).map { _ =>
            appendId += 1; (appendId, s"ap$appendId")
          }
          t.append(rows.toDF("id", vCol))
          rows.foreach { case (id, v) => model(id) = ModelRow(v, "") }
          check(s"append@$appendId")
        case 11 => // SQL DELETE WHERE: bucket-pruned rewrite, mark untouched
          val bound = rnd.nextInt(12).toLong
          val n = t.deleteWhere(spark, col("id") < bound)
          val expect = model.keys.count(_ < bound)
          assert(n == expect, s"seed=$seed deleteWhere(<$bound): $n != $expect")
          model.filterInPlace { case (id, _) => id >= bound }
          check(s"delete<$bound")
        case 12 => // group commit: staged writes invisible, then atomic
          val preModel = model.toMap
          val preHw = highWater
          t.beginGroup()
          (1 to rnd.nextInt(3) + 1).foreach(_ => mergeRandom())
          // mid-group: readers still see the pre-group snapshot
          val mid =
            if (t.read(spark).columns.isEmpty) Map.empty[Long, String]
            else t.read(spark).select(col("id"), col(vCol))
              .as[(Long, String)].collect().toMap
          assert(mid == preModel.map { case (k, r) => k -> r.v },
            s"seed=$seed group staged writes leaked")
          if (rnd.nextInt(4) == 0) {
            t.abortGroup() // staged writes vanish
            model.clear(); model ++= preModel
            highWater = preHw
            check("group-abort")
          } else {
            t.commitGroup()
            check("group-commit")
          }
        case 13 => // replaceBuckets (row-level UPDATE/MERGE commit path):
          // replacement contents for a random bucket set = its surviving
          // rows with edits, plus fresh-key inserts that may hash OUTSIDE
          // the set (appended to their home buckets); replay mark survives
          val buckets = (0 to 3).filter(_ => rnd.nextBoolean()) match {
            case Nil => Seq(rnd.nextInt(4))
            case bs  => bs
          }
          val bset = buckets.toSet
          val edited = model.toSeq
            .filter { case (id, _) => bset(bucketOf(id)) }
            .flatMap { case (id, r) =>
              if (rnd.nextInt(5) == 0) None // row-level DELETE
              else if (rnd.nextInt(3) == 0) Some((id, r.v + "x")) // UPDATE
              else Some((id, r.v)) // survivor
            }
          val inserts = (0 until rnd.nextInt(3)).map { _ =>
            appendId += 1; (appendId, s"rb$appendId")
          }
          val rows = edited ++ inserts
          t.replaceBuckets(buckets,
            if (rows.isEmpty) spark.emptyDataset[(Long, String)]
              .toDF("id", vCol)
            else rows.toDF("id", vCol))
          model.filterInPlace { case (id, _) => !bset(bucketOf(id)) }
          rows.foreach { case (id, v) => model(id) = ModelRow(v, "") }
          check(s"replaceBuckets@${buckets.mkString("+")}")
        case 14 => // RENAME COLUMN (metadata-only commit): logical name
          // flips; data, replay mark, and both change feeds must carry
          if (t.currentSchema.exists(_.fieldNames.contains(vCol))) {
            val to = if (vCol == "v") "val" else "v"
            t.renameColumn(vCol, to)
            vCol = to
            check(s"rename->$to")
          }
        case 15 => // bucket-count evolution: data-identical layout flip;
          // every later write/probe and BOTH change-feed consumers must
          // track the new layout (changesSince re-tags every bucket,
          // the row CDF sees an empty maintenance window)
          val choices = Seq(2, 4, 8, 16).filterNot(_ == curBuckets)
          val n = choices(rnd.nextInt(choices.size))
          t.rebucket(spark, n)
          curBuckets = n
          check(s"rebucket->$n")
      }
    }
  }

  test("random op sequences match the reference model (3 seeds × 40 steps, " +
      "merge/replay/truncate/compact/overwrite/append/delete/group/replaceBuckets/rename)") {
    Seq(1L, 7L, 42L).foreach(runScenario(_, steps = 40))
    sys.env.get("GRAFT_FUZZ_SEEDS").foreach(n =>
      (100L until 100L + n.toLong).foreach(runScenario(_, steps = 30)))
  }

  test("the same random op streams hold under MERGE-ON-READ (delta " +
      "layers interleaving with rename/truncate/compact/rebucket/" +
      "replaceBuckets — the steady-state 100 TB destination shape)") {
    Seq(1L, 7L, 42L).foreach(runScenario(_, steps = 40,
      mergeOnRead = true))
  }
}
