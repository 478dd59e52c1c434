package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import scala.util.Random

/** Misra-Gries heavy hitters: the exact operator against a brute-force
  * reference on skewed random streams, the candidate-superset guarantee
  * of the sketch alone, and mergeability across partitionings. */
class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  private def refHeavy(tokens: Seq[String], k: Int)
      : Map[String, Long] = {
    val counts = tokens.groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    val n = tokens.size.toLong
    counts.filter(_._2 > n / k)
  }

  /** Zipf-ish skewed docs: a few hot tokens + a long random tail. */
  private def corpus(seed: Int, docs: Int): Seq[Seq[String]] = {
    val rnd = new Random(seed)
    Seq.fill(docs) {
      Seq.fill(20) {
        val r = rnd.nextInt(100)
        if (r < 30) s"hot${rnd.nextInt(3)}"
        else if (r < 55) s"warm${rnd.nextInt(12)}"
        else s"cold${rnd.nextInt(5000)}"
      }
    }
  }

  test("exact == brute force on skewed streams, across k and seeds") {
    for (seed <- 1 to 3; k <- Seq(5, 20, 100)) {
      val docs = corpus(seed, 400)
      val df = docs.toDF("grams")
      val got = HeavyHitters.exact(df, "grams", k)
        .as[(String, Long)].collect().toMap
      val want = refHeavy(docs.flatten, k)
      assert(got == want, s"seed=$seed k=$k")
    }
  }

  test("null token arrays are skipped, not NPEs") {
    val df = Seq(Some(Seq("a", "a", "a", "b")), None, Some(Seq("a")), None)
      .toDF("grams")
    val got = HeavyHitters.exact(df, "grams", 2)
      .as[(String, Long)].collect().toMap
    // N counts only non-null rows' tokens: 5 total, threshold 5/2=2
    assert(got == Map("a" -> 4L))
  }

  test("MG summary alone is a candidate superset with lower-bound " +
      "counts, whatever the partitioning") {
    val docs = corpus(7, 600)
    val exactCounts = docs.flatten.groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    val n = docs.flatten.size.toLong
    for (parts <- Seq(1, 7, 32)) {
      val (summary, total) = docs.toDF("grams").repartition(parts)
        .as[Seq[String]].select(HeavyHitters.mgSummary(25).toColumn)
        .head()
      assert(total == n)
      // superset: every true heavy hitter survives
      refHeavy(docs.flatten, 25).keySet.foreach(t =>
        assert(summary.contains(t), s"$t lost at parts=$parts"))
      // lower bounds: no counter exceeds the true count, undercount <= N/k
      summary.foreach { case (t, c) =>
        assert(c <= exactCounts(t), s"$t overcounted")
        assert(exactCounts(t) - c <= n / 25 + 1, s"$t undercount bound")
      }
      assert(summary.size <= 25)
    }
  }

  test("uniform stream with no heavy hitters returns empty") {
    val docs = (0 until 500).map(i => Seq(s"t${i % 250}"))
    val got = HeavyHitters.exact(docs.toDF("grams"), "grams", 100)
      .collect()
    assert(got.isEmpty) // each token has 2 of 500 <= N/k = 5
  }
}
