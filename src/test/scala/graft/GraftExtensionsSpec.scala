package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSessionExtensions

/** The SQL deployment surface: GraftExtensions.install registers the
  * engine's native expressions for plain-SQL use; the builder-time
  * extension class applies the same set via injectFunction. */
class GraftExtensionsSpec extends AnyFunSuite {

  test("install() exposes engine SQL functions on a running session") {
    val spark = SparkSpec.session
    GraftExtensions.install(spark)
    val row = spark.sql(
      """SELECT rolling_hash('abc') AS rh,
             size(ngram_hashes('a b c d', 2)) AS ng,
             vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS vd,
             hyperplane_sig(array(cast(1.0 as float)), 4) AS hs,
             size(gram_buckets('a b c d', 2, 64)) AS gb,
             word_ngrams('a b c', 2) AS wn""").head()
    assert(row.getLong(0) == graft.functions.RollingHash.compute("abc"))
    assert(row.getInt(1) == 3)
    assert(row.getDouble(2) == 11.0)
    assert(row.getLong(3) >= 0L && row.getLong(3) < 16L)
    assert(row.getInt(4) == 3)
    assert(row.getSeq[String](5) == Seq("a b", "b c"))
  }

  test("builder-time extension injects without error") {
    new GraftExtensions().apply(new SparkSessionExtensions)
  }

  test("graft_table / graft_table_version TVFs query snapshots from SQL") {
    val spark = SparkSpec.session
    import spark.implicits._
    GraftExtensions.install(spark)
    val root = java.nio.file.Files.createTempDirectory("tvf").toString + "/t"
    val t = new graft.sinks.GraftTable(root, Seq("id"), nBuckets = 4)
    t.overwrite(Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    t.merge(Seq((2L, "b2", "U", "0000000000000001/0000000000000000"),
      (3L, "c", "I", "0000000000000001/0000000000000001"))
      .toDF("id", "v", "_op", "_seq"))
    // current snapshot via SQL, no programmatic handle needed
    val cur = spark.sql(s"SELECT id, v FROM graft_table('$root') ORDER BY id")
      .as[(Long, String)].collect().toSeq
    assert(cur == Seq((1L, "a"), (2L, "b2"), (3L, "c")))
    // time travel to the pre-merge snapshot
    val v0 = t.versions.head
    val old = spark.sql(
      s"SELECT id, v FROM graft_table_version('$root', $v0) ORDER BY id")
      .as[(Long, String)].collect().toSeq
    assert(old == Seq((1L, "a"), (2L, "b")))
    // TVFs compose with ordinary SQL (joins, aggregates)
    assert(spark.sql(
      s"""SELECT count(*) FROM graft_table('$root') a
          JOIN graft_table('$root') b USING (id)""").head().getLong(0) == 3L)
  }

  test("graft_changelog / graft_changelog_latest TVFs read sink output") {
    val spark = SparkSpec.session
    import spark.implicits._
    GraftExtensions.install(spark)
    val dir = java.nio.file.Files.createTempDirectory("tvf-cl").toString
    val sink = new graft.sinks.ChangelogSink(dir)
    sink.writeEvents("users",
      Seq((1L, "a", "I", 1L, 0L), (2L, "b", "I", 1L, 1L),
        (1L, "a2", "U", 2L, 0L), (2L, "b", "D", 3L, 0L))
        .toDF("id", "v", "_op", "_commit_lsn", "_tx_ordinal"))
    assert(spark.sql(s"SELECT * FROM graft_changelog('$dir', 'users')")
      .count() == 4)
    val latest = spark.sql(
      s"""SELECT id, v FROM graft_changelog_latest('$dir', 'users', 'id')
          ORDER BY id""").as[(Long, String)].collect().toSeq
    assert(latest == Seq((1L, "a2")))
  }

  test("graft_search TVF queries a maintained incremental index from SQL") {
    import graft.functions.TextFunctions
    import graft.operators.{IncrementalIndex, Retrieval}
    import org.apache.spark.sql.functions._
    val spark = SparkSpec.session
    import spark.implicits._
    GraftExtensions.install(spark)
    val root = java.nio.file.Files.createTempDirectory("tvf-idx").toString
    val postings = IncrementalIndex.postingsTable(s"$root/postings", 8)
    val dlens = IncrementalIndex.docTable(s"$root/docs", 4)
    val stats = IncrementalIndex.statsTable(s"$root/stats")
    val corpus = Seq(
      (1L, "spark shuffles data across partitions"),
      (2L, "catalyst optimizes the logical plan"),
      (3L, "data partitions and data skew")).toDF("doc_id", "text")
      .select(col("doc_id"), TextFunctions.tokens(col("text")).as("toks"))
    IncrementalIndex.applyDelta(spark, postings, dlens, stats,
      corpus.withColumn("_change_type", lit("insert")),
      "doc_id", "toks", "0000000000000001/0")
    val got = spark.sql(
      s"SELECT rank, id, score FROM graft_search('$root', 'data partitions', 3)")
      .orderBy("rank").as[(Int, Long, Double)].collect().toSeq
    val want = Retrieval.bm25TopK(corpus, "doc_id", "toks",
        Seq((0L, "data partitions")).toDF("q_id", "qtext")
          .select(col("q_id"),
            TextFunctions.tokens(col("qtext")).as("q_toks")),
        "q_id", "q_toks", k = 3)
      .orderBy("rank").select("rank", "doc_id", "score")
      .as[(Int, Long, Double)].collect().toSeq
    assert(got == want, s"got $got want $want")
    // composes with plain SQL
    assert(spark.sql(s"SELECT count(*) FROM graft_search('$root', 'data', 10)")
      .head().getLong(0) > 0)
  }

  test("graft_ann TVF queries a maintained incremental ANN index from SQL") {
    import graft.operators.{IncrementalAnn, Similarity}
    import org.apache.spark.sql.functions._
    val spark = SparkSpec.session
    import spark.implicits._
    GraftExtensions.install(spark)
    val root = java.nio.file.Files.createTempDirectory("tvf-ann").toString
    val lists = IncrementalAnn.listsTable(s"$root/lists", 4)
    val cents = IncrementalAnn.centroidsTable(s"$root/cents")
    val centroids: Array[Array[Double]] =
      Array(Array(1.0, 0, 0), Array(0, 1.0, 0), Array(0, 0, 1.0))
    val corpus = (1L to 12L).map { i =>
      val v = Array.fill(3)(0.1f * ((i % 3) - 1)); v((i % 3).toInt) = 1f
      (i, v.toSeq)
    }.toDF("id", "vec")
    IncrementalAnn.bootstrap(spark, lists, cents, corpus, "id", "vec",
      centroids, "0000000000000001/0")
    val got = spark.sql(
      s"SELECT rank, c_id, sim FROM graft_ann('$root', '1.0, 0.05, 0.0', 4, 2)")
      .orderBy("rank").as[(Int, Long, Double)].collect().toSeq
    val want = IncrementalAnn.search(spark, lists, cents,
        Seq((0L, Seq(1.0f, 0.05f, 0.0f))).toDF("q_id", "q_vec"),
        k = 4, nProbe = 2)
      .orderBy("rank").select("rank", "c_id", "sim")
      .as[(Int, Long, Double)].collect().toSeq
    assert(got == want, s"got $got want $want")
    // composes with plain SQL
    assert(spark.sql(
      s"SELECT count(*) FROM graft_ann('$root', '0,1,0') WHERE sim > 0.5")
      .head().getLong(0) > 0)
  }

  test("splitmix64 / interleave2 scalar functions and the graft_chunks TVF") {
    val spark = SparkSpec.session
    import spark.implicits._
    GraftExtensions.install(spark)
    assert(spark.sql("SELECT splitmix64(42L)").head().getLong(0) ==
      graft.functions.SplitMix64.compute(42L))
    assert(spark.sql("SELECT interleave2(3L, 9L)").head().getLong(0) ==
      graft.functions.Interleave2.compute(3L, 9L))

    val root = java.nio.file.Files
      .createTempDirectory("ext-chunks").toString + "/t"
    val t = new graft.sinks.GraftTable(root, Seq("doc_id"), nBuckets = 2)
    t.overwrite(Seq(
      (1L, (1 to 40).map(i => s"t$i").mkString(" ")),
      (2L, "a b c")).toDF("doc_id", "text"))
    val got = spark.sql(
      s"""SELECT doc_id, chunk_id, start, n_tokens
          FROM graft_chunks('$root', 'doc_id', 'text', 16, 12)
          ORDER BY doc_id, chunk_id""")
      .as[(Long, Int, Long, Long)].collect().toSeq
    val want = graft.operators.Chunk.tokenWindows(
        t.read(spark), "doc_id", "text", 16, 12)
      .orderBy("doc_id", "chunk_id")
      .select("doc_id", "chunk_id", "start", "n_tokens")
      .as[(Long, Int, Long, Long)].collect().toSeq
    assert(got == want)
    assert(got.count(_._1 == 1L) == 3) // 40 toks, w=16 s=12 → 3 windows
  }
}
