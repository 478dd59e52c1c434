package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{CentroidDot, NearestCentroids, VecDot}

/** Embedding clustering for corpus curation: spherical k-means over an
  * embedding column — the domain-discovery / corpus-partitioning step a
  * training-data pipeline runs before mixing (cluster-then-sample, the
  * SemDeDup / DataComp-style recipe: cluster the corpus, then balance
  * or prune per cluster).
  *
  * Reuses the IVF coarse quantizer's trainer ([[Similarity.trainCoarse]]):
  * deterministic seed-free init (k smallest-xxhash64 ids), Lloyd
  * iterations over a deterministic bounded sample (one sample pass, not
  * `iterations` corpus scans), DECIMAL per-dimension means (bit-identical
  * centroids on any partition layout), empty clusters keep their previous
  * centroid. Assignment is a pure projection through the
  * [[NearestCentroids]] kernel — centroids ride as task object data, so
  * clustering a 100 TB corpus is exactly one full read with ZERO
  * shuffles: no all-pairs, no crossJoin, no per-iteration corpus scans.
  */
object Cluster {

  /** Assign every row to its nearest centroid by cosine (first-max-wins
    * on exact ties = smallest cluster id, the [[NearestCentroids]] rule).
    * Returns (idCol, cluster: int [0-based centroid index], sim: double
    * [cosine to the assigned centroid, 6 dp]). The score is assembled
    * from the same left-to-right double folds the kernels use
    * (dot/(normC·normV)), so it is bit-identical to a brute-force
    * cosine against the centroid set. */
  def assign(corpus: DataFrame, idCol: String, vecCol: String,
      centroids: Array[Array[Double]]): DataFrame = {
    // k centroid norms as a plan-side array literal: k doubles (NOT k×d
    // — no constant-pool bloat at realistic k); folded left-to-right
    // like the kernel's own norm loops
    val norms = array(centroids.map(c =>
      lit(math.sqrt(c.foldLeft(0.0)((a, x) => a + x * x)))): _*)
    val vNorm = sqrt(VecDot(col(vecCol), col(vecCol)))
    corpus.select(col(idCol), col(vecCol))
      .withColumn("cluster",
        element_at(NearestCentroids(col(vecCol), centroids, 1), 1))
      .withColumn("sim", round(
        CentroidDot(col(vecCol), col("cluster"), centroids) /
          (element_at(norms, col("cluster") + 1) * vNorm), 6))
      .select(col(idCol), col("cluster"), col("sim"))
  }

  /** Spherical k-means: train `k` centroids ([[Similarity.trainCoarse]]
    * semantics), then assign the full corpus. Returns (centroids,
    * assignments as in [[assign]]). `k` effectively caps at the corpus
    * size (init takes the k smallest-hash rows). */
  def kmeans(corpus: DataFrame, idCol: String, vecCol: String, k: Int,
      iterations: Int): (Array[Array[Double]], DataFrame) = {
    val (centroids, _) =
      Similarity.trainCoarse(corpus, idCol, vecCol, k, iterations)
    (centroids, assign(corpus, idCol, vecCol, centroids))
  }

  /** SemDeDup (Abbas et al. 2023): semantic deduplication by clustering
    * then pruning near-identical embeddings WITHIN each cluster — the
    * published recipe's exact structure: candidate pairs are confined to
    * a cluster, so the quadratic term is Σ n_c², controlled by k (√N
    * clusters ⇒ ~N pairs total), never corpus-wide all-pairs. Duplicate
    * groups (cosine ≥ threshold, transitively) collapse to their
    * smallest id via [[Dedup.connectedComponents]] — `keep` marks the
    * group representative (and every singleton).
    *
    * Shuffle shape at scale: one corpus read, vectors move once into
    * their cluster partition for the pair join; the CC rounds exchange
    * (long, long) pairs only. Returns (idCol, cluster, rep, keep). */
  def semDeDup(corpus: DataFrame, idCol: String, vecCol: String,
      centroids: Array[Array[Double]], threshold: Double): DataFrame = {
    val asg = assign(corpus, idCol, vecCol, centroids)
    val clustered = corpus.select(col(idCol), col(vecCol))
      .join(asg.select(col(idCol), col("cluster")), idCol)
    // norms per row, not per within-cluster pair (Σ n_c² pairs):
    // Similarity.cosinePre — bit-identical scores
    val a = clustered.select(col("cluster"), col(idCol).as("id_a"),
      col(vecCol).as("_va"), Similarity.norm(col(vecCol)).as("_na"))
    val b = clustered.select(col("cluster"), col(idCol).as("id_b"),
      col(vecCol).as("_vb"), Similarity.norm(col(vecCol)).as("_nb"))
    val pairs = a.join(b, "cluster").filter(col("id_a") < col("id_b"))
      .filter(round(Similarity.cosinePre(col("_va"), col("_vb"),
        col("_na"), col("_nb")), 6) >= threshold)
      .select("id_a", "id_b")
    val reps = Dedup.connectedComponents(pairs, "id_a", "id_b")
      .withColumnRenamed("id", idCol)
    asg.select(col(idCol), col("cluster"))
      .join(reps, Seq(idCol), "left")
      .withColumn("rep", coalesce(col("rep"), col(idCol)))
      .withColumn("keep", col("rep") === col(idCol))
      .select(col(idCol), col("cluster"), col("rep"), col("keep"))
  }
}
