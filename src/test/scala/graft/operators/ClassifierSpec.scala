package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Quality-classifier training: planted-population separation,
  * bit-exact determinism across partitionings (the exact-decimal
  * gradient contract), and scoring-kernel agreement with a driver
  * reference. */
class ClassifierSpec extends SparkSpec {
  import spark.implicits._

  private val goodWords =
    Seq("theorem", "proof", "lemma", "analysis", "rigorous", "derivation")
  private val badWords =
    Seq("click", "subscribe", "buy", "cheap", "winner", "casino")

  private def doc(words: Seq[String], seed: Int, len: Int): String = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(len)(words(rnd.nextInt(words.size))).mkString(" ")
  }

  private def labeled(n: Int) =
    ((1 to n).map(i => (doc(goodWords, i, 12), 1)) ++
      (1 to n).map(i => (doc(badWords, 1000 + i, 12), 0)))
      .toDF("text", "label")

  test("training separates planted good/bad populations") {
    val model = Classifier.train(labeled(60), "text", "label",
      Classifier.Config(buckets = 512, iters = 25, lr = 4.0))
    val holdout = ((100 to 119).map(i => (doc(goodWords, i * 7, 10), 1)) ++
      (100 to 119).map(i => (doc(badWords, i * 11, 10), 0)))
      .toDF("text", "label")
    val scored = Classifier.classify(holdout, "text", model)
      .select(col("label"), col("keep")).as[(Int, Boolean)].collect()
    val correct = scored.count { case (y, keep) => keep == (y == 1) }
    assert(correct >= 38, s"holdout accuracy $correct/40")
    // scores actually separate, not just rank
    val means = Classifier.score(holdout, "text", model)
      .groupBy("label").agg(avg(col("score"))).as[(Int, Double)]
      .collect().toMap
    assert(means(1) > 0.8 && means(0) < 0.2, means)
  }

  test("training is bit-exact deterministic under any partitioning " +
      "(exact-decimal gradient aggregation)") {
    val base = labeled(40)
    val cfg = Classifier.Config(buckets = 256, iters = 8, lr = 3.0)
    val m1 = Classifier.train(base.repartition(1), "text", "label", cfg)
    val m2 = Classifier.train(base.repartition(17), "text", "label", cfg)
    val m3 = Classifier.train(base.orderBy(rand(42)).repartition(5),
      "text", "label", cfg)
    assert(m1.wMicros.toSeq == m2.wMicros.toSeq &&
      m1.biasMicros == m2.biasMicros)
    assert(m1.wMicros.toSeq == m3.wMicros.toSeq &&
      m1.biasMicros == m3.biasMicros)
    assert(m1.wMicros.exists(_ != 0L), "weights actually moved")
  }

  test("scoring kernel == driver reference (margin exact, score 6dp)") {
    val model = Classifier.Model(
      Array.tabulate(64)(b => (b * 37L) % 2001L - 1000L), 250000L,
      Classifier.Config(buckets = 64))
    val texts = Seq("alpha beta gamma", "x", "", "beta beta beta beta")
    val got = Classifier.score(texts.toDF("text"), "text", model)
      .select("margin_micros", "score").as[(Long, Double)].collect().toSeq
    def refBuckets(t: String) = {
      val toks = t.toLowerCase.split("\\s+").filter(_.nonEmpty)
      toks.sliding(2).filter(_.length == 2).map { g =>
        val s = g.mkString(" ")
        var h = 0L
        s.getBytes("UTF-8").foreach(c => h = h * 31L + (c & 0xffL))
        java.lang.Long.remainderUnsigned(h, 64L).toInt
      }.toSeq
    }
    val want = texts.map { t =>
      val m = refBuckets(t).map(model.wMicros).sum + model.biasMicros
      val s = BigDecimal(1.0 / (1.0 + math.exp(-m / 1e6)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      (m, s)
    }
    assert(got == want)
  }
}
