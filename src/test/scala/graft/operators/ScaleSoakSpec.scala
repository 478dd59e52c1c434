package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Scale soaks for the iterative operators. What decides whether these
  * survive 100 TB is not the label values (other specs pin those) but
  * the ITERATION STRUCTURE: connected-components round counts must grow
  * O(log longest-chain) — not O(diameter) — and the incremental dedup
  * front must keep working when an adversarial corpus collapses every
  * row into one hot LSH bucket. These shapes are deliberately nastier
  * than anything in testdata: pure chains (worst diameter per edge),
  * hot hubs (worst single-key fan-in), and all-duplicate corpora
  * (worst bucket skew). */
class ScaleSoakSpec extends SparkSpec {
  import spark.implicits._

  test("connectedComponents rounds grow O(log chain length)") {
    // pure paths: the adversarial shape for label propagation — plain
    // min-label needs n−1 rounds, path halving must stay logarithmic
    val sizes = Seq(10, 13, 16) // log2 of chain length: 1k → 64k nodes
    val rounds = sizes.map { lg =>
      val n = 1L << lg
      val chain = spark.range(n - 1)
        .select(col("id").as("id_a"), (col("id") + 1).as("id_b"))
      val (labels, r) =
        Dedup.connectedComponentsStats(chain, "id_a", "id_b")
      val comps = labels.select("rep").distinct().count()
      assert(comps == 1L, s"chain n=$n split into $comps components")
      assert(labels.count() == n, s"chain n=$n lost nodes")
      r
    }
    rounds.zip(sizes).foreach { case (r, lg) =>
      assert(r <= 2 * lg, s"chain log2=$lg needed $r rounds (> 2·log)") }
    // 64× more nodes may cost only logarithmically more rounds
    assert(rounds.last - rounds.head <= 8,
      s"round growth not sub-linear across 64× scale-up: $rounds")
  }

  test("connectedComponents: 100k-leaf hot hub converges in O(1) rounds") {
    // one giant star — every leaf's only neighbor is the hub; the
    // neighbor-min aggregation must absorb the fan-in in one shot
    val star = spark.range(1L, 100001L)
      .select(lit(0L).as("id_a"), col("id").as("id_b"))
    val (labels, r) = Dedup.connectedComponentsStats(star, "id_a", "id_b")
    assert(r <= 3, s"star needed $r rounds")
    assert(labels.filter(col("rep") =!= 0L).count() == 0L)
    assert(labels.count() == 100001L)
  }

  test("incremental dedup survives an all-duplicates hot LSH bucket") {
    // every doc identical → every band row of every doc lands in the
    // SAME (band, bh) bucket and every pair verifies. Bucket pruning
    // degenerates (all probes hit one bucket) but must stay correct and
    // the pair table must carry the full quadratic mirror.
    val n = 120L
    val bands = IncrementalDedup.bandTable(
      Files.createTempDirectory("soak-bands").toString)
    val pairs = IncrementalDedup.pairTable(
      Files.createTempDirectory("soak-pairs").toString)
    val text = "identical duplicate text shared by every document " +
      "in this adversarial corpus shape"
    val corpus = spark.range(n)
      .select(col("id").as("doc_id"), lit(text).as("text"))
    val insert = corpus.withColumn("_change_type", lit("insert"))
    IncrementalDedup.applyDelta(spark, bands, pairs, corpus, insert,
      "doc_id", "text", seq = "1")
    val got = IncrementalDedup.readPairs(spark, pairs)
    assert(got.count() == n * (n - 1) / 2,
      "hot bucket must still yield the complete pair set")
    // one more identical doc: the delta touches ONE id but gains n pairs
    val corpus2 = spark.range(n + 1)
      .select(col("id").as("doc_id"), lit(text).as("text"))
    val delta = corpus2.filter(col("doc_id") === n)
      .withColumn("_change_type", lit("insert"))
    IncrementalDedup.applyDelta(spark, bands, pairs, corpus2, delta,
      "doc_id", "text", seq = "2")
    assert(IncrementalDedup.readPairs(spark, pairs).count() ==
      (n + 1) * n / 2)
  }

  test("shard balance holds at 1M sequential ids across 256 shards") {
    // sequential ids are the adversarial input for sharding (any
    // modulo/range scheme collapses or stripes); the mixer must spread
    // them near-uniformly. 1M rows / 256 shards → E = 3906 per shard,
    // binomial σ ≈ 62; ±6σ ⇒ ~10% band.
    val n = 1000000L
    val sizes = Shard.deterministic(spark.range(n).toDF("id"),
        "id", seed = 99L, shards = 256)
      .groupBy("shard").count()
      .select("count").as[Long].collect()
    assert(sizes.length == 256, "every shard populated")
    val e = n / 256.0
    assert(sizes.min > e * 0.9 && sizes.max < e * 1.1,
      s"imbalance beyond ±10%: min=${sizes.min} max=${sizes.max}")
    // positions stay dense at scale (spot-check the largest shard)
    val top = Shard.deterministic(spark.range(n).toDF("id"),
        "id", seed = 99L, shards = 256)
      .filter(col("shard") === 0).agg(
        count(lit(1)), min(col("pos")), max(col("pos")))
      .as[(Long, Long, Long)].head()
    assert(top._2 == 0L && top._3 == top._1 - 1, s"gapped positions: $top")
  }

  test("substringDedup survives a corpus-wide hot gram (20k occurrences " +
      "of one span; min-agg firsts, no window straggler)") {
    // every doc opens with the SAME 6-token span — the worst skew for
    // any per-gram partitioning; the first-occurrence aggregate must
    // stay map-side-combinable and the whole pass must stay correct
    val n = 20000L
    val docs = spark.range(n).select(col("id").as("doc_id"),
      concat(lit("alpha beta gamma delta epsilon zeta "),
        col("id").cast("string"), lit(" "),
        (col("id") + n).cast("string")).as("text"))
    val out = Dedup.substringDedup(docs, "doc_id", "text", k = 6).cache()
    assert(out.count() == n)
    // doc 0 holds the global first: nothing removed
    val d0 = out.filter(col("doc_id") === 0)
      .select("n_removed").as[Long].head()
    assert(d0 == 0L)
    // every other doc loses exactly the 6 covered prefix tokens and
    // keeps its unique 2-token tail
    val rest = out.filter(col("doc_id") > 0)
      .groupBy("n_removed").count().as[(Long, Long)].collect().toMap
    assert(rest == Map(6L -> (n - 1)), rest.toString)
    val tails = out.filter(col("doc_id") === 17)
      .select("text_dedup").as[String].head()
    assert(tails == s"17 ${17 + n}")
    out.unpersist()
  }

  test("BPE training is stable over a 200k-token corpus with the " +
      "checkpointed iteration frame (16 merges)") {
    val words = Seq("alpha", "beta", "gamma", "delta", "epsilon",
      "zeta", "eta", "theta", "iota", "kappa")
    val docs = spark.range(2000L).select(col("id").as("doc_id"),
      concat_ws(" ", (0 until 100).map(j =>
        element_at(typedLit(words), pmod(col("id") * 7 + j, lit(10))
          .cast("int") + 1)): _*).as("text"))
    val wc = Bpe.wordCounts(docs, "text", "^[a-z0-9]+$")
    val (rules, vocab) = Bpe.train(wc, merges = 16, checkpointEvery = 8)
    assert(rules.map(_.rank) == (1 to rules.length), "dense ranks")
    assert(rules.nonEmpty && rules.length <= 16)
    // counts are monotone non-increasing in rank? NOT guaranteed for
    // BPE in general — but reassembly invariance is:
    val bad = vocab.filter(
      concat_ws("", col("syms")) =!= col("word")).count()
    assert(bad == 0L, "every vocab word reassembles after 16 merges")
  }

  test("Misra-Gries heavy hitters stay exact and O(k)-bounded over a " +
      "2M-token Zipf-ish stream with millions of distinct cold keys") {
    // adversarial for the sketch: a huge cold tail constantly evicting,
    // hot keys only ~2x above the threshold — the regime where the
    // undercount bound actually bites. Exactness must survive anyway
    // because the recount is candidate-filtered, not sketch-valued.
    val k = 200
    val docs = spark.range(20000L).select(
      expr("""transform(sequence(0, 99), i ->
        CASE WHEN pmod(id * 100 + i, 97) < 10
             THEN concat('hot', pmod(id * 100 + i, 13))
             ELSE concat('cold', (id * 100 + i)) END)""").as("grams"))
      .localCheckpoint()
    val got = HeavyHitters.exact(docs, "grams", k)
      .as[(String, Long)].collect().toMap
    // exact reference from a plain aggregation
    val counts = docs.select(explode(col("grams")).as("t"))
      .groupBy("t").count().as[(String, Long)].collect()
    val n = counts.map(_._2).sum
    val want = counts.filter(_._2 > n / k).toMap
    assert(got == want, s"got ${got.size} want ${want.size}")
    assert(got.nonEmpty && got.keySet.forall(_.startsWith("hot")))
    // the sketch pass itself stays k-bounded on this stream
    val (summary, total) = docs.as[Seq[String]]
      .select(HeavyHitters.mgSummary(k).toColumn).head()
    assert(summary.size <= k && total == n)
  }
}
