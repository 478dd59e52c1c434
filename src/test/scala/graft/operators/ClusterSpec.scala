package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ClusterSpec extends SparkSpec {
  import spark.implicits._

  /** Three well-separated directions in 8-d with small deterministic
    * jitter — planted clusters any sane k-means must recover. */
  private def planted() = {
    val base = Seq(
      Array(10.0, 0, 0, 0, 0, 0, 0, 0),
      Array(0.0, 10, 0, 0, 0, 0, 0, 0),
      Array(0.0, 0, 10, 0, 0, 0, 0, 0))
    (0L until 90L).map { i =>
      val g = (i % 3).toInt
      val jit = base(g).zipWithIndex.map { case (x, d) =>
        (x + ((i * 7 + d * 3) % 5) * 0.1).toFloat }
      (i, jit.toSeq, g)
    }.toDF("id", "vec", "planted")
  }

  test("kmeans recovers planted clusters with perfect purity") {
    val df = planted()
    val (centroids, asg) = Cluster.kmeans(df, "id", "vec", k = 3,
      iterations = 5)
    assert(centroids.length == 3)
    // each planted group maps to exactly one learned cluster, 1:1
    val m = asg.join(df.select("id", "planted"), "id")
      .groupBy("planted").agg(collect_set("cluster").as("cs"))
      .as[(Int, Seq[Int])].collect().toMap
    assert(m.values.forall(_.size == 1), m)
    assert(m.values.flatten.toSet.size == 3, m)
    // members score near their centroid
    assert(asg.agg(min("sim")).head().getDouble(0) > 0.9)
  }

  test("assignment is partition-layout independent") {
    val df = planted()
    val (centroids, asg) = Cluster.kmeans(df, "id", "vec", k = 3,
      iterations = 3)
    val again = Cluster.assign(df.repartition(13), "id", "vec", centroids)
    val diff = asg.select($"id", $"cluster".as("c1"))
      .join(again.select($"id", $"cluster".as("c2")), "id")
      .filter($"c1" =!= $"c2").count()
    assert(diff == 0)
    // retraining from a different layout gives the same centroids
    val (centroids2, _) = Cluster.kmeans(df.repartition(7), "id", "vec",
      k = 3, iterations = 3)
    assert(centroids2.map(_.toSeq).toSeq == centroids.map(_.toSeq).toSeq)
  }

  test("kernel assignment agrees with brute-force cosine argmax") {
    val emb = graft.Tables.load(spark, sf(), "embeddings").limit(200)
    val centroids = emb.filter($"vec_id" < 6).orderBy("vec_id")
      .select(transform($"embedding", x => x.cast("double")))
      .collect().map(_.getSeq[Double](0).toArray)
    val viaKernel = Cluster.assign(emb, "vec_id", "embedding", centroids)
      .select($"vec_id", $"cluster", $"sim")
    val queries = emb.select($"vec_id".as("q_id"), $"embedding".as("q_vec"))
    val corpus = emb.filter($"vec_id" < 6)
      .select($"vec_id".as("c_id"), $"embedding".as("c_vec"))
    val viaBrute = Similarity.bruteForceTopK(queries, corpus, k = 1)
      .select($"q_id".as("vec_id"), $"c_id".cast("int").as("cluster"),
        $"sim")
    assert(viaKernel.except(viaBrute).isEmpty &&
      viaBrute.except(viaKernel).isEmpty)
  }

  test("semDeDup keeps one representative per planted near-dup group") {
    val df = planted()
    val (centroids, _) = Cluster.kmeans(df, "id", "vec", k = 3,
      iterations = 5)
    val out = Cluster.semDeDup(df, "id", "vec", centroids,
      threshold = 0.99)
    assert(out.count() == 90)
    // each planted direction is one semantic-duplicate group: its 30
    // members collapse to the group's smallest id
    val keepers = out.filter($"keep").select($"id").as[Long].collect().toSet
    assert(keepers == Set(0L, 1L, 2L), keepers)
    // reps are consistent: every row's rep is a keeper in its own cluster
    val badRep = out.as("o")
      .join(out.filter($"keep").select($"id".as("rep"),
        $"cluster".as("kc")), Seq("rep"))
      .filter($"cluster" =!= $"kc").count()
    assert(badRep == 0)
  }

  test("k larger than the corpus degrades to one centroid per point") {
    val df = planted().limit(5)
    val (centroids, asg) = Cluster.kmeans(df, "id", "vec", k = 16,
      iterations = 2)
    assert(centroids.length == 5)
    assert(asg.count() == 5)
    assert(asg.agg(countDistinct("cluster")).head().getLong(0) == 5L)
  }
}
