package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (Array[Float]) — the ANN
  * surface of a training-data pipeline.
  *
  * Scale design: brute-force top-k is the correctness baseline (one
  * broadcast of the query set, one pass over the corpus — already the
  * right plan when queries are few); the LSH-bucketed variant is the
  * 100 TB path: corpus hashed ONCE into hyperplane buckets
  * (shuffle-partitioned by bucket), probes only touch matching buckets —
  * an IVF-style inverted file where the coarse quantizer is a seeded
  * random-hyperplane signature, so it's deterministic and needs no
  * training step.
  *
  * All float math is done in double with a fixed left-to-right fold
  * (`aggregate` over `zip_with`) so scores are reproducible run-to-run.
  */
object Similarity {
  import graft.functions.{HyperplaneSig, VecDot}

  /** Dot product of two float-array columns, computed in double (native
    * kernel — see graft.functions.VecExprs). */
  def dot(a: Column, b: Column): Column = VecDot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** [[cosine]] with the two norms precomputed per ROW: a pair-scoring
    * join (cross join, candidate verify) evaluates [[cosine]] once per
    * PAIR, so each side's `sqrt(Σx²)` is recomputed |pairs| times —
    * at n² pair scale that triples the per-pair flops for values that
    * are row constants. Callers project `norm(v)` once on each side
    * before the join and score with this. The expression tree
    * `dot/(na·nb)` is UNCHANGED (same left-to-right double folds, same
    * division), so scores are bit-identical to [[cosine]] — pinned by
    * the unchanged oracle gates. */
  def cosinePre(a: Column, b: Column, na: Column, nb: Column): Column =
    dot(a, b) / (na * nb)

  /** Brute-force cosine top-k: for each query vector, the k nearest corpus
    * vectors. Queries are broadcast (small side); ranking is deterministic
    * via (rounded score desc, corpus id) ordering. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      qId: String = "q_id", qVec: String = "q_vec",
      cId: String = "c_id", cVec: String = "c_vec"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = corpus.withColumn("_cn", norm(col(cVec)))
      .crossJoin(broadcast(queries.withColumn("_qn", norm(col(qVec)))))
      .withColumn("sim",
        round(cosinePre(col(qVec), col(cVec), col("_qn"), col("_cn")), 6))
    val w = Window.partitionBy(col(qId))
      .orderBy(col("sim").desc, col(cId))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(qId), col(cId), col("sim"), col("rank"))
  }

  /** kNN label vote — the standard embedding-quality probe (classify
    * each query by the majority label of its k nearest neighbors,
    * self-match excluded): exact cosine ranking ([[bruteForceTopK]]
    * semantics — rounded-sim ordering, c_id tie-break), then majority
    * vote with ties broken toward the smaller label. Returns
    * (qId, pred, votes). This is the exact eval leg; at scale feed any
    * ANN topK's (qId, cId) pairs to [[voteNeighbors]] instead. */
  def knnClassify(queries: DataFrame, corpus: DataFrame, k: Int,
      qId: String = "q_id", qVec: String = "q_vec",
      cId: String = "c_id", cVec: String = "c_vec",
      labelCol: String = "label"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = corpus.withColumn("_cn", norm(col(cVec)))
      .crossJoin(broadcast(queries.withColumn("_qn", norm(col(qVec)))))
      .filter(col(qId) =!= col(cId))
      .withColumn("sim",
        round(cosinePre(col(qVec), col(cVec), col("_qn"), col("_cn")), 6))
    val w = Window.partitionBy(col(qId))
      .orderBy(col("sim").desc, col(cId))
    val neighbors = scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(qId), col(cId), col(labelCol))
    voteNeighbors(neighbors, qId, labelCol)
  }

  /** Majority vote over a (qId, …, labelCol) neighbor set: most votes
    * wins, exact ties prefer the smaller label. One aggregation + one
    * per-query argmax window — neighbor sets are k rows per query, so
    * both shuffles carry O(k · queries) rows. */
  def voteNeighbors(neighbors: DataFrame, qId: String,
      labelCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val votes = neighbors.groupBy(col(qId), col(labelCol))
      .agg(count(lit(1)).as("votes"))
    val w = Window.partitionBy(col(qId))
      .orderBy(col("votes").desc, col(labelCol))
    votes.withColumn("_rk", row_number().over(w)).filter(col("_rk") === 1)
      .select(col(qId), col(labelCol).as("pred"), col("votes"))
  }

  /** Random-hyperplane LSH signature (nPlanes bits) of a float-array
    * column: bit p = sign(v · plane_p), planes derived from fixed-seed
    * hashes (native kernel — graft.functions.HyperplaneSig). */
  def hyperplaneSig(vec: Column, nPlanes: Int, planeOffset: Int = 0): Column =
    HyperplaneSig(vec, nPlanes, planeOffset)

  /** LSH-bucketed ANN: corpus bucketed by hyperplane signature; each query
    * probes its own bucket plus all hamming-1 neighbor buckets (multi-probe
    * — recovers most near-misses at the boundary), then exact cosine ranks
    * within the probed set. Returns (q_id, c_id, sim, rank) like
    * [[bruteForceTopK]]; approximate recall, corpus-scan cost
    * ~ (nProbes/2^nPlanes) of brute force. */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int, nPlanes: Int,
      qId: String = "q_id", qVec: String = "q_vec",
      cId: String = "c_id", cVec: String = "c_vec"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bucketed = corpus.withColumn("bucket", hyperplaneSig(col(cVec), nPlanes))
      .withColumn("_cn", norm(col(cVec)))
    // query probes: own bucket + flip each bit once (hamming-1)
    val probes = queries.withColumn("sig", hyperplaneSig(col(qVec), nPlanes))
      .select(col(qId), col(qVec), norm(col(qVec)).as("_qn"), explode(array(
        (col("sig") +: (0 until nPlanes).map(p =>
          col("sig").bitwiseXOR(shiftleft(lit(1L), p)))): _*)).as("bucket"))
    val candidates = bucketed.join(broadcast(probes), "bucket")
    val scored = candidates
      .withColumn("sim",
        round(cosinePre(col(qVec), col(cVec), col("_qn"), col("_cn")), 6))
    val w = Window.partitionBy(col(qId))
      .orderBy(col("sim").desc, col(cId))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(qId), col(cId), col("sim"), col("rank"))
  }

  /** IVF (inverted-file) ANN: a coarse k-means quantizer is trained
    * deterministically (seed-free: init = the k corpus vectors with the
    * smallest xxhash64(id); fixed Lloyd iterations with index tie-break),
    * the corpus is assigned to its nearest centroid ("inverted list"),
    * and each query probes only the `nProbe` nearest lists — the classic
    * IVF-Flat layout. Centroids are k×d driver metadata (tiny);
    * assignment + search are pure DataFrame ops shuffle-partitioned by
    * list id. Returns (q_id, c_id, sim, rank).
    */
  /** nearest single list per row (train + index). */
  private def assign(vec: Column, centroids: Array[Array[Double]]):
      DataFrame => DataFrame = df =>
    df.withColumn("list_id",
      element_at(graft.functions.NearestCentroids(vec, centroids, 1), 1))
  /** nProbe nearest lists per row, exploded (search probes). */
  private def probeLists(vec: Column, centroids: Array[Array[Double]],
      n: Int): DataFrame => DataFrame = df =>
    df.withColumn("list_id",
      explode(graft.functions.NearestCentroids(vec, centroids, n)))

  /** Coarse-quantizer training: deterministic init + fixed Lloyd
    * iterations, on a deterministic SAMPLE (classic IVF trains on a
    * training subset, not the corpus): keep ids with
    * xxhash64(id) % mod == 0, mod sized for ≥ max(64·k, 4096) rows.
    * The sample is localCheckpointed ONCE, so the Lloyd loop scans the
    * small cached sample instead of re-reading the full corpus per
    * iteration — at 100 TB this turns `iterations` full passes into one
    * footer-only count + one sample pass; the full corpus is read once
    * more for the final assignment. When the corpus is no bigger than
    * the target (every test SF), mod = 1 and training sees every row —
    * bit-identical centroids to the unsampled formulation. Per-dimension
    * means sum in DECIMAL so centroids are bit-identical on any
    * cluster/partition layout; lists that lose all members keep their
    * previous centroid. Returns (centroids, the cached sample). */
  private[operators] def trainCoarse(corpus: DataFrame, cId: String,
      cVec: String,
      nLists: Int, iterations: Int): (Array[Array[Double]], DataFrame) = {
    val sampleTarget = math.max(64L * nLists, 4096L)
    val corpusN = corpus.count() // no filter → parquet footer count
    val mod = math.max(1L, corpusN / sampleTarget)
    val trainBase = corpus.select(col(cId), col(cVec))
    val trainSet =
      (if (mod > 1) trainBase.filter(pmod(xxhash64(col(cId)), lit(mod)) === 0)
       else trainBase).localCheckpoint()
    val init = trainSet
      .withColumn("_h", xxhash64(col(cId)))
      .orderBy("_h").limit(nLists)
      .select(transform(col(cVec), x => x.cast("double")).as("centroid"))
      .collect().map(_.getSeq[Double](0).toArray)
    var centroids = init
    (0 until iterations).foreach { _ =>
      val assigned = assign(col(cVec), centroids)(trainSet)
      val next = assigned
        .select(col("list_id"),
          posexplode(transform(col(cVec),
            x => x.cast("double").cast("decimal(28,12)"))))
        .groupBy("list_id", "pos")
        .agg(sum(col("col")).as("_s"), count(lit(1)).as("_n"))
        .collect()
      val updated = centroids.map(_.clone())
      next.foreach { r =>
        val li = r.getInt(0)
        val pos = r.getInt(1)
        val s = r.getDecimal(2)
        val n = r.getLong(3)
        updated(li)(pos) = s.doubleValue() / n
      }
      centroids = updated
    }
    (centroids, trainSet)
  }

  def ivfTopK(queries: DataFrame, corpus: DataFrame, k: Int, nLists: Int,
      nProbe: Int, iterations: Int = 5,
      qId: String = "q_id", qVec: String = "q_vec",
      cId: String = "c_id", cVec: String = "c_vec"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = corpus.sparkSession

    // Centroids are k×d driver metadata — carried by the NearestCentroids
    // kernel as plain object data (one serialization per task), so both
    // assignment and probing are pure projections (ZERO shuffle) with no
    // plan/constant-pool bloat at large k. The round-2 formulation
    // crossJoined a centroid frame and ranked with a window — a shuffle +
    // sort of the whole corpus PER Lloyd iteration; round 3 used typedLit
    // literals, which stop scaling around k ≈ 1024. The kernel's double
    // folds and smaller-id tie-breaks are bit-identical to both.

    val (centroids, _) = trainCoarse(corpus, cId, cVec, nLists, iterations)
    ivfSearch(queries, corpus, centroids, k, nProbe, qId, qVec, cId, cVec)
  }

  /** The search phase of [[ivfTopK]] with an EXPLICIT quantizer —
    * shared by the trained path above, [[IncrementalAnn]]'s invariant
    * checks, and fixed-centroid oracles. */
  def ivfSearch(queries: DataFrame, corpus: DataFrame,
      centroids: Array[Array[Double]], k: Int, nProbe: Int,
      qId: String = "q_id", qVec: String = "q_vec",
      cId: String = "c_id", cVec: String = "c_vec"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val indexed = assign(col(cVec), centroids)(
      corpus.select(col(cId), col(cVec), norm(col(cVec)).as("_cn")))
    val probed = probeLists(col(qVec), centroids, nProbe)(
      queries.select(col(qId), col(qVec), norm(col(qVec)).as("_qn")))
    val candidates = indexed.join(broadcast(probed), "list_id")
    val scored = candidates
      .withColumn("sim",
        round(cosinePre(col(qVec), col(cVec), col("_qn"), col("_cn")), 6))
    val w = Window.partitionBy(col(qId))
      .orderBy(col("sim").desc, col(cId))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(qId), col(cId), col("sim"), col("rank"))
  }

  /** Driver-side replica of the [[graft.functions.NearestCentroids]]
    * assignment rule (cosine score = dot/(normC·normV) with left-to-right
    * double folds, first-max-wins tie-break) — used to compute training
    * RESIDUALS for the sample on the driver with bit-identical list
    * assignment to the distributed encode pass. */
  private[operators] def nearestListOf(v: Array[Double],
      centroids: Array[Array[Double]]): Int = {
    var normV = 0.0
    var j = 0
    while (j < v.length) { normV += v(j) * v(j); j += 1 }
    normV = math.sqrt(normV)
    var best = -1
    var bestScore = 0.0
    var i = 0
    while (i < centroids.length) {
      val c = centroids(i)
      var normC = 0.0
      var acc = 0.0
      var k = 0
      while (k < c.length) {
        normC += c(k) * c(k)
        acc += v(k) * c(k)
        k += 1
      }
      val score = acc / (math.sqrt(normC) * normV)
      if (best < 0 || score > bestScore) { best = i; bestScore = score }
      i += 1
    }
    best
  }

  /** Deterministic per-subspace PQ codebook training, DRIVER-SIDE over
    * the bounded coarse-training sample (≤ a few thousand rows ≈ MBs —
    * the same sampling regime FAISS-style PQ trains in; the distributed
    * parts are encode and search). Callers feed RESIDUALS (vector minus
    * assigned coarse centroid — classic IVF-PQ). L2 k-means per
    * subspace: init = the `ks` subvectors of the sample rows with the
    * smallest xxhash64(id) (stable), assignment ties prefer the smaller
    * code, means fold in fixed id order, empty clusters keep their
    * previous codeword. */
  private[operators] def trainPqCodebooks(
      sample: Array[(Long, Array[Double])], m: Int, ks: Int,
      iterations: Int): Array[Array[Array[Double]]] = {
    require(sample.nonEmpty, "PQ training needs a non-empty sample")
    val d = sample.head._2.length
    require(d % m == 0, s"dim $d not divisible into $m subvectors")
    val dsub = d / m
    val byHash = sample.sortBy { case (id, _) =>
      (org.apache.spark.sql.catalyst.expressions.XXH64.hashLong(id, 42L), id)
    }
    val byId = sample.sortBy(_._1)
    Array.tabulate(m) { j =>
      def sub(v: Array[Double]): Array[Double] =
        java.util.Arrays.copyOfRange(v, j * dsub, (j + 1) * dsub)
      var cb = byHash.take(ks).map(s => sub(s._2))
      def nearest(x: Array[Double]): Int = {
        var best = 0
        var bestD = Double.MaxValue
        var c = 0
        while (c < cb.length) {
          var d2 = 0.0
          var i = 0
          while (i < dsub) {
            val diff = x(i) - cb(c)(i); d2 += diff * diff; i += 1 }
          if (d2 < bestD) { bestD = d2; best = c }
          c += 1
        }
        best
      }
      (0 until iterations).foreach { _ =>
        val sums = Array.fill(cb.length)(new Array[Double](dsub))
        val counts = new Array[Long](cb.length)
        byId.foreach { case (_, v) =>
          val x = sub(v)
          val c = nearest(x)
          counts(c) += 1
          var i = 0
          while (i < dsub) { sums(c)(i) += x(i); i += 1 }
        }
        cb = cb.zipWithIndex.map { case (w, c) =>
          if (counts(c) == 0) w
          else sums(c).map(_ / counts(c))
        }
      }
      cb
    }
  }

  /** IVF-PQ ANN — the memory-compressed 100 TB path: the inverted file
    * stores `m` small codes (+ a reconstruction norm) per vector instead
    * of `d` floats (e.g. 64-dim float → 8 codes ≈ 32× less candidate
    * payload through the probe join), candidates score against a
    * per-query ADC lookup table in O(m), and the top `k·refineFactor`
    * per query re-rank EXACTLY against their true vectors (the classic
    * refine step) — so returned sims are exact cosine values on an
    * approximate candidate set, directly comparable to [[ivfTopK]].
    * Codes quantize the RESIDUAL against the assigned coarse centroid
    * (Jégou et al. 2011): the codebooks model the small residual
    * distribution instead of the whole space, so reconstruction — and
    * hence the ADC shortlist — is tighter at the same m×ks budget. The
    * ADC score decomposes as dot(q, C_list) + Σ lut[codes] with the
    * centroid term computed once per probe row ([[graft.functions
    * .CentroidDot]]), still O(m) per candidate. Training: shared
    * sampled coarse quantizer + driver-side per-subspace residual
    * codebooks (deterministic end to end). */
  def ivfPqTopK(queries: DataFrame, corpus: DataFrame, k: Int, nLists: Int,
      nProbe: Int, m: Int, ks: Int = 16, iterations: Int = 3,
      refineFactor: Int = 4,
      qId: String = "q_id", qVec: String = "q_vec",
      cId: String = "c_id", cVec: String = "c_vec"): DataFrame = {
    import graft.functions.{CentroidDot, PqAdc, PqEncode, PqLut}
    import org.apache.spark.sql.expressions.Window
    val (coarse, trainSet) = trainCoarse(corpus, cId, cVec, nLists, iterations)
    val sample = trainSet
      .select(col(cId).cast("long"),
        transform(col(cVec), x => x.cast("double")))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    // training residuals: driver-side assignment replicates the encode
    // kernel's rule bit-for-bit (nearestListOf)
    val residuals = sample.map { case (id, v) =>
      val cl = coarse(nearestListOf(v, coarse))
      (id, Array.tabulate(v.length)(i => v(i) - cl(i)))
    }
    val books = trainPqCodebooks(residuals, m, ks, iterations)

    // --- encode: ONE corpus pass → (id, list, codes, recon norm);
    // vectors do not flow into the index
    val encoded = assign(col(cVec), coarse)(corpus.select(col(cId), col(cVec)))
      .withColumn("_enc", PqEncode(col(cVec), col("list_id"), books, coarse))
      .select(col(cId), col("list_id"),
        col("_enc.codes").as("_codes"), col("_enc.rnorm").as("_rnorm"))

    // --- search: probes + per-query LUT broadcast; ADC scores candidates
    // against dot(q, C_list) + residual lookup
    val probed = probeLists(col(qVec), coarse, nProbe)(
      queries.select(col(qId), col(qVec)))
      .withColumn("_lut", PqLut(col(qVec), books))
      .withColumn("_cdot", CentroidDot(col(qVec), col("list_id"), coarse))
      .withColumn("_qnorm", sqrt(dot(col(qVec), col(qVec))))
    val wAdc = Window.partitionBy(col(qId))
      .orderBy(col("_adc").desc, col(cId))
    val shortlist = encoded.join(broadcast(probed), "list_id")
      .withColumn("_adc",
        (col("_cdot") + PqAdc(col("_codes"), col("_lut"), ks)) /
        (col("_qnorm") * col("_rnorm")))
      .withColumn("_r", row_number().over(wAdc))
      .filter(col("_r") <= k * refineFactor)
      .select(col(qId), col(qVec), col("_qnorm"), col(cId))

    // --- refine: exact cosine on the shortlist only (id-keyed join
    // moves k·refineFactor vectors per query, not the corpus)
    val w = Window.partitionBy(col(qId))
      .orderBy(col("sim").desc, col(cId))
    shortlist.join(corpus.select(col(cId), col(cVec),
        norm(col(cVec)).as("_cn")), cId)
      .withColumn("sim",
        round(cosinePre(col(qVec), col(cVec), col("_qnorm"), col("_cn")), 6))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(qId), col(cId), col("sim"), col("rank"))
  }

  /** Embedding-cosine near-duplicate pairs (id_a < id_b, sim ≥ threshold)
    * via the same LSH buckets — pairs must share a bucket under at least
    * one of `nTables` independent hash tables (OR-amplification), then
    * exact cosine verifies. Sub-quadratic; the exact variant for oracle
    * checking is a plain self-join the caller can do at small SF. */
  def cosineNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, nPlanes: Int = 12, nTables: Int = 4): DataFrame = {
    // ONE corpus pass emits all tables' signatures (posexplode), not a
    // union of nTables scans — at 100 TB that is 1 read instead of 8.
    // Per-table planes: the offset keeps tables independent. Vectors are
    // projected OUT before the bucket join: the candidate pipeline
    // (join + dedup) shuffles only (tbl, bucket, id) triples — the
    // embedding payload moves exactly twice, in the two id-keyed verify
    // joins below (same shape as minhashLshPairs).
    val sigs = (0 until nTables).map(t =>
      hyperplaneSig(col(vecCol), nPlanes, t * nPlanes))
    val banded = df.select(col(idCol).as("id"),
        posexplode(array(sigs: _*)))
      .withColumnRenamed("pos", "tbl")
      .withColumnRenamed("col", "bucket")
    val a = banded.select(col("id").as("id_a"), col("tbl"), col("bucket"))
    val b = banded.select(col("id").as("id_b"), col("tbl"), col("bucket"))
    val candIds = a.join(b, Seq("tbl", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    val vecs = df.select(col(idCol).as("_v_id"), col(vecCol).as("_v_vec"),
      norm(col(vecCol)).as("_v_n"))
    candIds
      .join(vecs.withColumnsRenamed(
        Map("_v_id" -> "id_a", "_v_vec" -> "vec_a", "_v_n" -> "_n_a")), "id_a")
      .join(vecs.withColumnsRenamed(
        Map("_v_id" -> "id_b", "_v_vec" -> "vec_b", "_v_n" -> "_n_b")), "id_b")
      .withColumn("sim", round(
        cosinePre(col("vec_a"), col("vec_b"), col("_n_a"), col("_n_b")), 6))
      .filter(col("sim") >= threshold)
      .select("id_a", "id_b", "sim")
  }
}
