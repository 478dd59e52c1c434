package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{GramBuckets, GramWeightMicros, SplitMix64}

/** Data selection via importance resampling (DSIR — Xie et al. 2023,
  * "Data Selection for Language Models via Importance Resampling"): pick
  * the raw-corpus documents that look most like a small TARGET corpus,
  * by importance weight under hashed-n-gram bag-of-features language
  * models, sampled without replacement via Gumbel top-k.
  *
  *  1. '''Fit''' ([[fitLogRatioMicros]]): bucket-count distributions of
  *     the target (`p`) and raw (`q`) corpora over `B` hashed n-gram
  *     feature buckets, add-α smoothed; per-bucket log ratio
  *     `lr_b = ln p̂_b − ln q̂_b`, stored as INTEGER micro-nats.
  *  2. '''Score''' ([[importanceWeights]]): per raw document,
  *     `log w(d) = Σ_{gram g ∈ d} lr_{bucket(g)}` — one corpus scan
  *     through the [[graft.functions.GramWeightMicros]] kernel with the
  *     B-sized ratio table as task object data; LONG-sum arithmetic, so
  *     the weight is exact and order-independent (what lets the gate
  *     hash-compare it bit-for-bit against the DuckDB replay).
  *  3. '''Resample''' ([[resample]]): Gumbel top-k without replacement —
  *     `key(d) = log w(d) + G(d)` with `G = −ln(−ln U)` and `U` a
  *     deterministic (0,1) dyadic rational from
  *     `SplitMix64(id XOR seed)` (the [[Shard]] mixer, exactly
  *     oracle-replayable), selected via TakeOrdered (orderBy+limit — no
  *     global sort materialization).
  *
  * Scale shape at 100 TB: fitting is two corpus scans each reducing
  * map-side to ≤B rows (the only shuffles, B-bounded); scoring is a
  * pure scan (no joins — the ratio table is expression object data, the
  * centroid pattern); selection is top-k. No step shuffles or collects
  * document-scale data; the driver holds only the two B-sized count
  * arrays.
  */
object Select {

  /** Feature-space / smoothing parameters. Must match between fit and
    * score. `n`=2, `buckets`=4096 keeps the oracle replay cheap while
    * giving the classifier real resolution at test scale; production
    * scale would raise buckets (the paper uses 10k), which only grows
    * the two B-sized aggregates. */
  final case class Config(n: Int = 2, buckets: Int = 4096,
      alpha: Double = 1.0)

  /** Per-bucket gram-occurrence counts of `df[textCol]` as a dense
    * driver-side array (metadata-scale collect: ≤B rows). */
  def bucketCounts(df: DataFrame, textCol: String, cfg: Config)
      : Array[Long] = {
    val out = new Array[Long](cfg.buckets)
    df.select(explode(GramBuckets(col(textCol), cfg.n, cfg.buckets))
        .as("b"))
      .groupBy("b").agg(count(lit(1)).as("c"))
      .collect()
      .foreach(r => out(r.getInt(0)) = r.getLong(1))
    out
  }

  /** Fit the smoothed per-bucket log importance ratios, in micro-nats:
    * `floor((ln((p_b+α)/(P+αB)) − ln((q_b+α)/(Q+αB)))·1e6 + 0.5)`.
    * The integer scaling is deliberate: document weights become exact
    * integer sums, immune to cross-engine float-summation-order drift. */
  def fitLogRatioMicros(raw: DataFrame, target: DataFrame,
      textCol: String, cfg: Config): Array[Long] = {
    val q = bucketCounts(raw, textCol, cfg)
    val p = bucketCounts(target, textCol, cfg)
    val qDen = q.sum + cfg.alpha * cfg.buckets
    val pDen = p.sum + cfg.alpha * cfg.buckets
    Array.tabulate(cfg.buckets) { b =>
      val lr = math.log((p(b) + cfg.alpha) / pDen) -
        math.log((q(b) + cfg.alpha) / qDen)
      math.floor(lr * 1e6 + 0.5).toLong
    }
  }

  /** Score every raw document: adds `logw_micros` (LONG, exact) — the
    * 100 TB path is this one scan. */
  def importanceWeights(raw: DataFrame, textCol: String,
      lrMicros: Array[Long], n: Int): DataFrame =
    raw.withColumn("logw_micros",
      GramWeightMicros(col(textCol), n, lrMicros))

  /** The deterministic (0,1) uniform: top 53 bits of
    * `SplitMix64(id XOR seed)`, offset to the bin center — the exact
    * dyadic rational `(⌊u64/2^11⌋ + 0.5) / 2^53`, identical in IEEE
    * double on every engine. */
  def gumbel(id: Column, seed: Long): Column = {
    val u = (shiftrightunsigned(SplitMix64(id.bitwiseXOR(lit(seed))), 11)
      .cast("double") + lit(0.5)) / lit(9007199254740992.0)
    -log(-log(u))
  }

  /** Gumbel top-k resample: `k` raw documents without replacement with
    * probability proportional to their importance weight. Output keeps
    * `logw` (exact micro-nat quotient) and the selection key. */
  def resample(raw: DataFrame, idCol: String, textCol: String,
      lrMicros: Array[Long], cfg: Config, k: Int, seed: Long): DataFrame =
    importanceWeights(raw, textCol, lrMicros, cfg.n)
      .withColumn("logw", col("logw_micros") / lit(1e6))
      .withColumn("skey",
        col("logw") + gumbel(col(idCol).cast("long"), seed))
      .orderBy(desc("skey"), col(idCol))
      .limit(k)

  /** End-to-end: fit on (raw, target), score raw, Gumbel-top-k. */
  def dsir(raw: DataFrame, target: DataFrame, idCol: String,
      textCol: String, k: Int, seed: Long,
      cfg: Config = Config()): DataFrame =
    resample(raw, idCol, textCol,
      fitLogRatioMicros(raw, target, textCol, cfg), cfg, k, seed)
}
