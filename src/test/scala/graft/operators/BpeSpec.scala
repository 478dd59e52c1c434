package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import scala.collection.mutable

class BpeSpec extends SparkSpec {
  import spark.implicits._

  /** Driver reference: same semantics as the operator (leftmost-greedy
    * merge pass per rule; count DESC then lexicographic tie-break). */
  private def refTrain(wc: Map[String, Long], merges: Int)
      : (Seq[(Int, String, String, Long)], Map[String, Seq[String]]) = {
    var vocab: Map[String, Seq[String]] = wc.map { case (w, _) =>
      w -> w.map(_.toString)
    }
    val rules = Seq.newBuilder[(Int, String, String, Long)]
    var rank = 1
    var stop = false
    while (rank <= merges && !stop) {
      val pc = mutable.Map.empty[(String, String), Long]
      for ((w, syms) <- vocab; i <- 0 until syms.length - 1)
        pc((syms(i), syms(i + 1))) = pc.getOrElse((syms(i), syms(i + 1)), 0L) + wc(w)
      if (pc.isEmpty) stop = true
      else {
        val bestC = pc.values.max
        val (l, r) = pc.collect { case (p, c) if c == bestC => p }.toSeq.min
        rules += ((rank, l, r, bestC))
        vocab = vocab.map { case (w, syms) =>
          val out = mutable.ArrayBuffer.empty[String]
          for (s <- syms)
            if (out.nonEmpty && out.last == l && s == r) out(out.length - 1) = l + r
            else out += s
          w -> out.toSeq
        }
        rank += 1
      }
    }
    (rules.result(), vocab)
  }

  private val corpus = Seq(
    (1L, "the cat sat on the mat"), (2L, "the cat ate the rat"),
    (3L, "a cat and a rat sat"), (4L, "banana bandana cabana"),
    (5L, "lowest newest widest lowly")).toDF("doc_id", "text")

  test("train matches the driver reference on a known corpus") {
    val words = Bpe.wordCounts(corpus, "text", "^[a-z0-9]+$")
    val (rules, vocab) = Bpe.train(words, merges = 8)
    val wc = words.as[(String, Long)].collect().toMap
    val (expRules, expVocab) = refTrain(wc, 8)
    assert(rules.map(r => (r.rank, r.left, r.right, r.count)) == expRules)
    val got = vocab.select("word", "syms").as[(String, Seq[String])]
      .collect().toMap
    assert(got == expVocab)
  }

  test("train matches the driver reference on random corpora") {
    val rnd = new scala.util.Random(20260814L)
    for (trial <- 1 to 5) {
      val alpha = "abcd"
      val words = (1 to 30).map { _ =>
        (1 to (1 + rnd.nextInt(8))).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
      }
      val text = (1 to 100).map(_ => words(rnd.nextInt(words.length))).mkString(" ")
      val df = Seq((1L, text)).toDF("doc_id", "text")
      val wcDf = Bpe.wordCounts(df, "text", "^[a-z0-9]+$")
      val (rules, _) = Bpe.train(wcDf, merges = 6)
      val (expRules, _) = refTrain(wcDf.as[(String, Long)].collect().toMap, 6)
      assert(rules.map(r => (r.rank, r.left, r.right, r.count)) == expRules,
        s"trial $trial")
    }
  }

  test("encodeWords (mapPartitions path) agrees with the trained vocab") {
    val words = Bpe.wordCounts(corpus, "text", "^[a-z0-9]+$")
    val (rules, vocab) = Bpe.train(words, merges = 8)
    val trained = vocab.select("word", "syms").as[(String, Seq[String])]
      .collect().toMap
    val encoded = Bpe.encodeWords(words.select("word"), "word", rules)
      .as[(String, Seq[String])].collect().toMap
    assert(encoded == trained)
    // subwords always reassemble to the word
    assert(encoded.forall { case (w, ss) => ss.mkString == w })
  }

  test("encodeWords splits by code point: non-BMP words match train") {
    // "𝕏" (U+1D54F) is a surrogate pair in UTF-16: a per-code-UNIT
    // split would feed encodeWords lone surrogates that never match
    // train's per-code-POINT symbolization
    val df = Seq((1L, "𝕏y𝕏y 𝕏y𝕏y a𝕏 a𝕏")).toDF("doc_id", "text")
    val words = Bpe.wordCounts(df, "text")
    val (rules, vocab) = Bpe.train(words, merges = 4)
    val trained = vocab.select("word", "syms").as[(String, Seq[String])]
      .collect().toMap
    val encoded = Bpe.encodeWords(words.select("word"), "word", rules)
      .as[(String, Seq[String])].collect().toMap
    assert(encoded == trained)
    assert(encoded.forall { case (w, ss) => ss.mkString == w })
  }

  test("distributed fallback (collectLimit=0) matches the local trainer") {
    val words = Bpe.wordCounts(corpus, "text", "^[a-z0-9]+$")
    val (rl, vl) = Bpe.train(words, merges = 8)
    val (rd, vd) = Bpe.train(words, merges = 8, collectLimit = 0L)
    assert(rl == rd)
    val local = vl.select("word", "syms").as[(String, Seq[String])]
      .collect().toMap
    val dist = vd.select("word", "syms").as[(String, Seq[String])]
      .collect().toMap
    assert(local == dist)
  }

  test("distributed fallback matches local on random corpora") {
    val rnd = new scala.util.Random(99L)
    for (trial <- 1 to 3) {
      val alpha = "abc"
      val wordsPool = (1 to 20).map { _ =>
        (1 to (1 + rnd.nextInt(6))).map(_ => alpha(rnd.nextInt(3))).mkString }
      val text = (1 to 60).map(_ => wordsPool(rnd.nextInt(wordsPool.length)))
        .mkString(" ")
      val wcDf = Bpe.wordCounts(Seq((1L, text)).toDF("doc_id", "text"),
        "text", "^[a-z0-9]+$")
      val (rl, _) = Bpe.train(wcDf, merges = 5)
      val (rd, _) = Bpe.train(wcDf, merges = 5, collectLimit = 0L)
      assert(rl == rd, s"trial $trial")
    }
  }

  test("minCount stops training early") {
    val df = Seq((1L, "ab ab cd")).toDF("doc_id", "text")
    val (rules, _) = Bpe.train(Bpe.wordCounts(df, "text"), merges = 8,
      minCount = 2L)
    // only (a,b) reaches count 2; (c,d) is 1 and must not be learned
    assert(rules.map(r => (r.left, r.right, r.count)) == Seq(("a", "b", 2L)))
  }

  test("real-corpus invariants: every vocab word reassembles; ranks dense") {
    val docs = graft.Tables.load(spark, sf(), "documents").limit(100)
    val words = Bpe.wordCounts(docs, "text", "^[a-z0-9]+$")
    val (rules, vocab) = Bpe.train(words, merges = 12)
    assert(rules.map(_.rank) == (1 to rules.length))
    assert(rules.map(r => (r.left, r.right)).distinct.length == rules.length)
    val bad = vocab.filter(
      concat_ws("", col("syms")) =!= col("word")).count()
    assert(bad == 0L)
    // merges actually compressed something
    assert(vocab.filter(size(col("syms")) < length(col("word"))).count() > 0L)
  }
}
