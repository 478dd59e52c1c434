package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Deduplication operators for training-data pipelines, each designed for
  * the 100 TB shape:
  *
  *   - exact: one hash-shuffle on normalized content (map-side combine).
  *   - n-gram Jaccard: inverted-index join (explode → equijoin on shingle
  *     → per-pair counters) — never an O(n²) cross join; candidate space
  *     is bounded by shared-shingle posting lists.
  *   - MinHash+LSH: signature → band buckets → equijoin per band; the
  *     classic sub-quadratic near-dup pipeline, all shuffle-partitioned by
  *     band hash.
  *   - SimHash: 64-bit signatures with banded hamming candidate join.
  *
  * All hashing uses Spark's codegen'd xxhash64 with fixed literal seeds —
  * deterministic across runs and cluster layouts.
  */
object Dedup {

  /** Normalized content key for exact dedup: lowercase, collapse
    * whitespace. */
  def normText(c: Column): Column =
    lower(trim(regexp_replace(c, "\\s+", " ")))

  /** Exact dedup: one representative (min id) per distinct normalized
    * content + cluster size. */
  def exact(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.groupBy(normText(col(textCol)).as("content_key"))
      .agg(min(col(idCol)).as("rep_id"), count(lit(1)).as("n_dups"))

  /** Word n-gram shingles (as single space-joined strings) of the
    * document's token sequence; distinct set. */
  def shingles(text: Column, n: Int): Column = {
    val toks = TextFunctions.tokens(text)
    val grams = transform(sequence(lit(1), size(toks) - n + 1),
      i => concat_ws(" ", slice(toks, i, lit(n))))
    array_distinct(when(size(toks) >= n, grams)
      .otherwise(array().cast("array<string>")))
  }

  /** Hashed shingle set: same set semantics as [[shingles]] but each
    * n-gram is reduced to a 64-bit hash via the native NGramHashes
    * expression (single byte-level pass — see its scaladoc for why the
    * array-expression formulation is ~1000× slower). Collisions are
    * ~|g|²/2⁶⁴ per doc pair: negligible, so Jaccard over the hashed sets
    * equals Jaccard over the string sets for oracle purposes. */
  def shingleHashes(text: Column, n: Int): Column =
    graft.functions.NGramHashes(text, n)

  /** Exact n-gram Jaccard near-dup pairs via inverted-index join.
    * Returns (id_a, id_b, jaccard) with id_a < id_b, jaccard ≥ threshold.
    * Jaccard is a ratio of integers — bit-exact, oracle-safe. */
  def ngramJaccardPairs(df: DataFrame, textCol: String, idCol: String,
      n: Int, threshold: Double): DataFrame = {
    // shingle sets computed ONCE (checkpoint) — they feed both join
    // branches and the size lookup; postings shuffle two longs per row
    val docs = df.select(col(idCol).as("id"),
      shingleHashes(col(textCol), n).as("sh"))
      .withColumn("sz", size(col("sh")))
      .filter(col("sz") > 0)
      .localCheckpoint(eager = false)
    val posting = docs.select(col("id"), explode(col("sh")).as("gh"))
    val a = posting.select(col("id").as("id_a"), col("gh"))
    val b = posting.select(col("id").as("id_b"), col("gh"))
    val inter = a.join(b, Seq("gh")).filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("inter"))
    // sizes re-attached via joins against the one-row-per-doc side; AQE
    // broadcasts it when small, shuffles on id at corpus scale
    val sizes = docs.select(col("id"), col("sz"))
    inter
      .join(sizes.select(col("id").as("id_a"), col("sz").as("sz_a")), "id_a")
      .join(sizes.select(col("id").as("id_b"), col("sz").as("sz_b")), "id_b")
      .withColumn("jaccard",
        col("inter").cast("double") /
          (col("sz_a") + col("sz_b") - col("inter")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** MinHash signature: for each of `numHashes` seeded hash functions,
    * min over the document's shingle hashes. Returns (id, sig array). */
  def minhashSignatures(df: DataFrame, textCol: String, idCol: String,
      n: Int, numHashes: Int): DataFrame = {
    val docs = df.select(col(idCol).as("id"),
        shingleHashes(col(textCol), n).as("sh"))
      .filter(size(col("sh")) > 0)
    val exploded = docs.select(col("id"), explode(col("sh")).as("g"))
    val aggs = (0 until numHashes).map(i =>
      min(xxhash64(lit(i), col("g"))).as(s"h$i"))
    exploded.groupBy("id").agg(aggs.head, aggs.tail: _*)
      .select(col("id"), array((0 until numHashes).map(i => col(s"h$i")): _*)
        .as("sig"))
  }

  /** MinHash + LSH near-dup pairs: band the signature (bands × rowsPerBand
    * = numHashes), bucket-join per band, then VERIFY candidates with exact
    * n-gram Jaccard (kills LSH false positives; recall governed by the
    * band curve 1-(1-j^r)^b). Returns (id_a, id_b, jaccard). */
  def minhashLshPairs(df: DataFrame, textCol: String, idCol: String,
      n: Int, numHashes: Int, bands: Int, threshold: Double): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val r = numHashes / bands
    // signatures feed 2 self-join branches — materialize once
    val sigs = minhashSignatures(df, textCol, idCol, n, numHashes)
      .localCheckpoint(eager = false)
    val banded = sigs.select(col("id"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        bIdx => hash(slice(col("sig"), bIdx * lit(r) + 1, lit(r))))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bh")
    val a = banded.select(col("id").as("id_a"), col("band"), col("bh"))
    val b = banded.select(col("id").as("id_b"), col("band"), col("bh"))
    val candidates = a.join(b, Seq("band", "bh"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()

    // verify: exact jaccard on the candidate pairs only; shingle sets feed
    // both sides of the pair join — materialize once
    val docs = df.select(col(idCol).as("id"),
        shingleHashes(col(textCol), n).as("sh"))
      .localCheckpoint(eager = false)
    val withA = candidates.join(docs.withColumnRenamed("id", "id_a")
      .withColumnRenamed("sh", "sh_a"), "id_a")
    val withB = withA.join(docs.withColumnRenamed("id", "id_b")
      .withColumnRenamed("sh", "sh_b"), "id_b")
    withB.withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** 64-bit SimHash over token hashes: bit i of the signature is the sign
    * of Σ_tokens (±1 depending on bit i of xxhash64(token)). Computed as
    * 64 codegen'd conditional sums in one aggregation — no UDAF, no
    * per-row object allocation. */
  def simhash(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val exploded = df.select(col(idCol).as("id"),
        explode(TextFunctions.tokens(col(textCol))).as("t"))
      .withColumn("h", xxhash64(col("t")))
    val bitSums = (0 until 64).map { i =>
      sum(when(shiftright(col("h"), i).bitwiseAND(1) === 1, 1)
        .otherwise(-1)).as(s"b$i")
    }
    val summed = exploded.groupBy("id").agg(bitSums.head, bitSums.tail: _*)
    val sig = (0 until 64).map { i =>
      when(col(s"b$i") > 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }.reduce((x, y) => x.bitwiseOR(y))
    summed.select(col("id"), sig.as("simhash"))
  }

  /** SimHash near-dup pairs with hamming distance ≤ maxDist, via banded
    * candidate generation: split the 64-bit signature into (maxDist+1)
    * chunks — any pair within maxDist must agree on ≥1 whole chunk
    * (pigeonhole), so candidates come from chunk-equality joins, then are
    * verified with bit_count(xor). */
  def simhashPairs(df: DataFrame, textCol: String, idCol: String,
      maxDist: Int): DataFrame = {
    val chunks = maxDist + 1
    val width = 64 / chunks
    val sigs = simhash(df, textCol, idCol)
    val banded = sigs.select(col("id"), col("simhash"),
      posexplode(array((0 until chunks).map { c =>
        shiftright(col("simhash"), c * width)
          .bitwiseAND((1L << width) - 1)
      }: _*)))
      .withColumnRenamed("pos", "chunk").withColumnRenamed("col", "cv")
    val a = banded.select(col("id").as("id_a"), col("simhash").as("s_a"),
      col("chunk"), col("cv"))
    val b = banded.select(col("id").as("id_b"), col("simhash").as("s_b"),
      col("chunk"), col("cv"))
    a.join(b, Seq("chunk", "cv")).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("s_a").bitwiseXOR(col("s_b"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxDist)
  }
}
