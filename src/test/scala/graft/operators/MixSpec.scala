package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MixSpec extends SparkSpec {

  test("temperature mixing flattens head domains toward the tail " +
      "(tau < 1), is proportional at tau = 1, and is deterministic") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // skewed domains: 400 a's, 100 b's, 25 c's
    val df = ((1L to 400L).map(i => (i, "a")) ++
      (401L to 500L).map(i => (i, "b")) ++
      (501L to 525L).map(i => (i, "c"))).toDF("id", "dom")
    def shares(tau: Double): Map[String, Long] =
      Mix.sampleByTemperature(df, "dom", "id", tau, total = 200L)
        .groupBy("dom").count().as[(String, Long)].collect().toMap
    val t1 = shares(1.0)   // proportional: expected 152/38/10
    val t0 = shares(0.0)   // uniform target: ~67 each (c capped at 25)
    val th = shares(0.5)   // in between
    assert(t1("a").toDouble / t1("b") > 3.0, t1)
    assert(t0("a").toDouble <= t0("b") * 1.4, t0)
    assert(t0("c") == 25L, s"tiny domain keeps everything: $t0")
    assert(th("a") < t1("a") && th("a") > t0("a"), (t1, th, t0))
    // deterministic: the kept id set is a pure function of (id, counts)
    val k1 = Mix.sampleByTemperature(df, "dom", "id", 0.5, 200L)
      .select("id").as[Long].collect().toSet
    val k2 = Mix.sampleByTemperature(df.repartition(13), "dom", "id",
      0.5, 200L).select("id").as[Long].collect().toSet
    assert(k1 == k2)
  }
  import spark.implicits._

  private def corpus = Seq.tabulate(600) { i =>
    (i.toLong, s"d${i % 3}") // 200 docs per domain d0/d1/d2
  }.toDF("id", "dom")

  test("rates follow weights; selection is deterministic and repeatable") {
    val w = (d: org.apache.spark.sql.Column) =>
      when(d === "d0", 1).when(d === "d1", 2).otherwise(3)
    val s1 = Mix.sampleByDomain(corpus, "dom", "id", w, total = 120L)
    val s2 = Mix.sampleByDomain(corpus, "dom", "id", w, total = 120L)
    val ids1 = s1.select("id").as[Long].collect().toSet
    assert(ids1 == s2.select("id").as[Long].collect().toSet,
      "same inputs must give the identical sample")
    val byDom = s1.groupBy("dom").count().as[(String, Long)]
      .collect().toMap
    // expected 20/40/60 per domain; binomial spread is wide at n=200 —
    // assert the ordering and a loose band, not exact counts
    assert(byDom("d0") < byDom("d1") && byDom("d1") < byDom("d2"), byDom)
    assert(byDom.values.sum > 60 && byDom.values.sum < 200, byDom)
  }

  test("weight dominating the budget caps at keeping the whole domain") {
    val w = (d: org.apache.spark.sql.Column) =>
      when(d === "d0", 1000).otherwise(1)
    val s = Mix.sampleByDomain(corpus, "dom", "id", w, total = 600L)
    val byDom = s.groupBy("dom").count().as[(String, Long)]
      .collect().toMap
    // d0's raw rate ≈ 600·1000/(1002·200) ≈ 3 → capped at 1.0: all 200
    assert(byDom("d0") == 200L, byDom)
  }

  test("no shuffle of the corpus: rate table broadcasts") {
    val w = (_: org.apache.spark.sql.Column) => lit(1)
    val q = Mix.sampleByDomain(corpus, "dom", "id", w, total = 100L)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("stratifiedExact: exactly n per stratum, deterministic, hash-ordered") {
    val s1 = Mix.stratifiedExact(corpus, "dom", "id", n = 25)
    val byDom = s1.groupBy("dom").count().as[(String, Long)]
      .collect().toMap
    assert(byDom == Map("d0" -> 25L, "d1" -> 25L, "d2" -> 25L), byDom)
    val ids1 = s1.select("id").as[Long].collect().toSet
    val ids2 = Mix.stratifiedExact(corpus, "dom", "id", n = 25)
      .select("id").as[Long].collect().toSet
    assert(ids1 == ids2, "same inputs must give the identical sample")
    // the sample is the smallest-hash prefix: every kept row's hash is
    // <= every dropped row's hash within its stratum
    val all = corpus.select(col("dom"),
        pmod(col("id") * lit(2654435761L), lit(4294967296L)).as("h"),
        col("id")).as[(String, Long, Long)].collect()
    val kept = ids1
    all.groupBy(_._1).foreach { case (_, rows) =>
      val (in, out) = rows.partition(r => kept(r._3))
      assert(in.map(_._2).max <= out.map(_._2).min,
        "kept set must be the smallest-hash prefix")
    }
  }

  test("stratifiedExact: undersized strata keep everything; schema preserved") {
    val tiny = corpus.filter(col("id") < 40) // d0:14, d1:13, d2:13
    val s = Mix.stratifiedExact(tiny, "dom", "id", n = 25)
    assert(s.count() == 40L)
    assert(s.columns.toSeq == Seq("id", "dom"), s.columns.toSeq)
  }

  test("stratifiedExact: prefilter bounds the window input (broadcast, no corpus shuffle before filter)") {
    val q = Mix.stratifiedExact(corpus, "dom", "id", n = 10, oversample = 4.0)
    val plan = q.queryExecution.executedPlan.toString
    // rate thresholds join in as a broadcast; the only exchange feeding
    // the window sort is over the prefiltered survivors
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(plan.contains("RunningWindowFunction") || plan.contains("Window"), plan)
  }

  test("epochs: integer factors repeat exactly; fractions hit the hash share") {
    val f = (d: org.apache.spark.sql.Column) =>
      when(d === "d0", 0.0).when(d === "d1", 2.0).otherwise(1.5)
    val out = Mix.epochs(corpus, "dom", "id", f)
    val byDom = out.groupBy("dom").count().as[(String, Long)].collect().toMap
    assert(!byDom.contains("d0"), "factor 0 drops the domain")
    assert(byDom("d1") == 400L, "factor 2.0 repeats every doc exactly twice")
    // factor 1.5: 200 guaranteed + ~100 hash-selected seconds
    assert(byDom("d2") > 240 && byDom("d2") < 360, byDom)
    // epoch indices are dense per row: a doc with k copies has epochs 0..k-1
    val epochs = out.filter(col("dom") === "d1").groupBy("id")
      .agg(sort_array(collect_list("epoch")).as("e"))
      .select("e").as[Seq[Int]].collect()
    assert(epochs.forall(_ == Seq(0, 1)))
    // deterministic: re-running reproduces the identical expansion
    val a = out.select("id", "epoch").as[(Long, Int)].collect().sorted.toSeq
    val b = Mix.epochs(corpus, "dom", "id", f)
      .select("id", "epoch").as[(Long, Int)].collect().sorted.toSeq
    assert(a == b)
  }

  test("epochs: zero shuffles — pure map-side expansion") {
    val f = (_: org.apache.spark.sql.Column) => lit(1.7)
    val plan = Mix.epochs(corpus, "dom", "id", f)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"epochs must not shuffle:\n$plan")
  }

  test("splitAssign: driver-reference fates, proportions, determinism") {
    val w = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val ids = (0L until 5000L)
    val df = ids.map(i => (i, s"d${i % 3}")).toDF("id", "dom")
    val out = Mix.splitAssign(df, "id", seed = 42L, w)
    val got = out.select("id", "split").as[(Long, String)].collect().toMap
    // driver reference: same mixer, same thresholds
    val thrs = Mix.splitThresholds(w)
    ids.foreach { i =>
      val u32 = graft.functions.SplitMix64.compute(i ^ 42L) >>> 32
      val exp = w.zip(thrs).collectFirst {
        case ((name, _), t) if u32 < t => name
      }.get
      assert(got(i) == exp, s"id $i")
    }
    // hash-proportional within every stratum (loose 3σ-ish bounds)
    val byDomSplit = out.groupBy("dom", "split").count()
      .as[(String, String, Long)].collect()
      .map { case (d, s, c) => (d, s) -> c }.toMap
    for (d <- Seq("d0", "d1", "d2")) {
      val n = ids.count(i => s"d${i % 3}" == d).toDouble
      assert(math.abs(byDomSplit((d, "train")) / n - 0.8) < 0.05, d)
      assert(math.abs(byDomSplit.getOrElse((d, "val"), 0L) / n - 0.1) < 0.04, d)
    }
    // pure projection: no exchange in the plan
    val plan = Mix.splitAssign(df, "id", 42L, w)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"splitAssign must not shuffle:\n$plan")
  }

  test("splitAssign: top-of-keyspace rows get the last label, never null") {
    val w = Seq("a" -> 1.0, "b" -> 1.0, "c" -> 1.0) // 2^32/3 rounds down
    val df = (0L until 2000L).map(i => (i, "x")).toDF("id", "dom")
    val nulls = Mix.splitAssign(df, "id", 7L, w)
      .filter(col("split").isNull).count()
    assert(nulls == 0L)
  }
}
