package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Domain mixing: resample a corpus so domains contribute in target
  * proportions (the data-mixing step of a training pipeline — upweight
  * curated sources, downweight crawl). Scale-first design:
  *
  *  - Per-domain rates, not per-domain top-N: each row is kept iff a
  *    deterministic hash of its id clears the domain's threshold. A
  *    row's fate is a pure function of (id, domain rate) — one scan,
  *    embarrassingly parallel, no per-domain sort or window (a top-N
  *    would serialize every domain through one task at 100 TB).
  *  - The domain→rate table is metadata-scale (one row per domain) and
  *    broadcast; the corpus never shuffles at all.
  *  - The hash is a fixed multiplicative mix (Knuth 2654435761 mod
  *    2^32), NOT a seeded RNG: reproducible across engines and runs, so
  *    the exact sample is oracle-checkable and re-running a pipeline
  *    stage yields the same corpus.
  *
  * Rates follow `total · w_d / (W · n_d)` capped at 1 — expected sample
  * size ≈ `total` with domain d's share ∝ its weight, realized counts
  * binomial around the target (the standard rate-based mixing contract;
  * exact-count mixing needs the top-N sort this avoids).
  */
object Mix {

  /** The deterministic per-row selector in [0, 2^32): Knuth
    * multiplicative hash of a non-negative long id. The Long multiply
    * may wrap for ids above ~3.47e9, but the wrap is mod 2^64 and
    * 2^32 | 2^64, so `pmod(·, 2^32)` of the wrapped product equals the
    * exact product's low 32 bits — correct for EVERY non-negative id.
    * Oracle replays must avoid a checked BIGINT multiply (DuckDB raises
    * out-of-range where Java wraps): [[hashOrdSql]] widens to HUGEINT. */
  def hashOrd(id: Column): Column = pmod(id * lit(2654435761L),
    lit(4294967296L))

  /** [[hashOrd]] restated for DuckDB: the 128-bit multiply is exact, so
    * `% 2^32` matches the Spark side's wrap-immune low 32 bits at any
    * id, instead of erroring past ~3.47e9 as a BIGINT multiply would. */
  def hashOrdSql(idExpr: String): String =
    s"(CAST($idExpr AS HUGEINT) * 2654435761) % 4294967296"

  /** Sample `df` so each domain's expected contribution is
    * `total · weight / Σweights`, capped by availability. `weightExpr`
    * maps the domain column to a positive integer weight (an expression
    * so the oracle can restate it verbatim). Adds nothing, drops rows. */
  def sampleByDomain(df: DataFrame, domainCol: String, idCol: String,
      weightExpr: Column => Column, total: Long): DataFrame = {
    val counts = df.groupBy(col(domainCol)).agg(count(lit(1)).as("_n"))
      .withColumn("_w", weightExpr(col(domainCol)).cast("long"))
    val totW = counts.agg(sum(col("_w")).as("_tw"))
    // metadata-scale: |domains| rows, broadcast into the corpus scan
    val rates = counts.crossJoin(broadcast(totW))
      .select(col(domainCol),
        floor(least(lit(1.0),
          (lit(total) * col("_w")).cast("double") /
            (col("_tw") * col("_n")).cast("double")) * lit(4294967296.0))
          .cast("long").as("_thr"))
    df.join(broadcast(rates), domainCol)
      .filter(hashOrd(col(idCol)) < col("_thr"))
      .drop("_thr")
      .select(df.columns.map(col): _*)
  }

  /** Temperature-based mixture sampling — the T5/PaLM multilingual
    * recipe: domain weights derive from OBSERVED sizes raised to a
    * temperature, `w_d = n_d^τ` (τ < 1 flattens head domains so the
    * tail isn't drowned; τ = 1 is proportional = no-op; τ = 0 is
    * uniform), then rows keep/drop by the same deterministic
    * [[hashOrd]] thresholds as [[sampleByDomain]]. Same scale shape:
    * one |domains|-row aggregate broadcast into a single corpus scan,
    * nothing else moves. */
  def sampleByTemperature(df: DataFrame, domainCol: String, idCol: String,
      tau: Double, total: Long): DataFrame = {
    val counts = df.groupBy(col(domainCol)).agg(count(lit(1)).as("_n"))
      .withColumn("_w", pow(col("_n").cast("double"), lit(tau)))
    val totW = counts.agg(sum(col("_w")).as("_tw"))
    val rates = counts.crossJoin(broadcast(totW))
      .select(col(domainCol),
        floor(least(lit(1.0),
          lit(total.toDouble) * col("_w") /
            (col("_tw") * col("_n").cast("double"))) * lit(4294967296.0))
          .cast("long").as("_thr"))
    df.join(broadcast(rates), domainCol)
      .filter(hashOrd(col(idCol)) < col("_thr"))
      .drop("_thr")
      .select(df.columns.map(col): _*)
  }

  /** EXACT-count stratified sample: the `n` rows with the smallest
    * [[hashOrd]] per stratum (ties broken by id). Complements
    * [[sampleByDomain]] when realized counts must hit the target
    * exactly (eval set construction, per-source caps).
    *
    * Scale shape — two phases so the per-stratum sort never sees the
    * full corpus:
    *  1. rate prefilter: broadcast per-stratum thresholds targeting
    *     `oversample·n` expected survivors — one corpus scan, no
    *     shuffle, bounds every stratum's window input to O(n);
    *  2. `row_number` over (hash, id) within the survivors — the only
    *     shuffle, over ~`oversample·n·|strata|` rows, not the corpus.
    *
    * The top-n-by-hash rows clear the prefilter unless fewer than n
    * survivors exist at all (a binomial tail event vanishing in
    * oversample; those strata return the survivors they have). Both
    * phases are pure functions of (id, stratum counts), so an external
    * engine recomputes the identical sample row-for-row. Strata with
    * fewer than n rows keep everything. */
  def stratifiedExact(df: DataFrame, strataCol: String, idCol: String,
      n: Int, oversample: Double = 8.0): DataFrame = {
    require(n > 0 && oversample >= 1.0, "n > 0, oversample >= 1")
    val thr = floor(least(lit(1.0),
      lit(oversample * n) / col("_n").cast("double")) * lit(4294967296.0))
      .cast("long").as("_thr")
    val rates = df.groupBy(col(strataCol)).agg(count(lit(1)).as("_n"))
      .select(col(strataCol), thr)
    val pre = df.join(broadcast(rates), strataCol)
      .filter(hashOrd(col(idCol)) < col("_thr"))
    val w = Window.partitionBy(col(strataCol))
      .orderBy(hashOrd(col(idCol)), col(idCol))
    pre.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= n)
      .select(df.columns.map(col): _*)
  }

  /** Fractional-EPOCH upsampling — the other direction of mixing:
    * repeat high-value domains rather than thin the rest. A factor of
    * 1.7 means every row appears once and a deterministic 70% of rows
    * (by [[hashOrd]]) appear a second time — the standard way training
    * mixes express "2.25 epochs of books, 0.5 epochs of crawl".
    * `epoch` (0-based repeat index) is appended so downstream shuffles
    * (e.g. [[Shard.deterministic]] keyed by (id, epoch)) spread the
    * copies instead of co-locating them.
    *
    * Scale shape: zero shuffles — the factor is a pure expression of
    * the domain column, the repeat decision a pure function of (id,
    * factor), the expansion a per-row `explode(sequence)`. A factor of
    * 0 drops the domain entirely (rows with no repeats vanish). */
  def epochs(df: DataFrame, domainCol: String, idCol: String,
      factorExpr: Column => Column): DataFrame = {
    val f = factorExpr(col(domainCol)).cast("double")
    val frac = floor((f - floor(f)) * lit(4294967296.0)).cast("long")
    val reps = floor(f).cast("long") +
      when(hashOrd(col(idCol)) < frac, 1L).otherwise(0L)
    df.withColumn("_reps", reps)
      .filter(col("_reps") > 0)
      .withColumn("epoch",
        explode(sequence(lit(0), (col("_reps") - 1).cast("int"))))
      .drop("_reps")
  }

  /** Deterministic train/val/test SPLIT assignment: each row's fate is a
    * pure function of `(idCol, seed)` — reproducible across runs,
    * engines, and cluster layouts, and INDEPENDENT of [[hashOrd]]-based
    * sampling decisions (different mixer), so a row's sample fate never
    * correlates with its split. `weights` are (label, weight) in
    * declaration order; thresholds are cumulative weight fractions of
    * the 32-bit key space (driver-computed integer literals the oracle
    * restates verbatim; the last threshold is forced to 2³² so rounding
    * can't orphan the top of the key space). Zero shuffles — a pure
    * projection over the corpus scan. Stratification: hash-proportional
    * per stratum by construction; pair with [[stratifiedExact]] when
    * realized per-stratum counts must be exact. */
  def splitAssign(df: DataFrame, idCol: String, seed: Long,
      weights: Seq[(String, Double)]): DataFrame = {
    require(weights.nonEmpty && weights.forall(_._2 > 0),
      "weights must be positive")
    val thrs = splitThresholds(weights)
    val u32 = shiftrightunsigned(
      graft.functions.SplitMix64(col(idCol).bitwiseXOR(lit(seed))), 32)
    val label = weights.zip(thrs).reverse.foldLeft(lit(null).cast("string")) {
      case (els, ((name, _), thr)) => when(u32 < lit(thr), lit(name)).otherwise(els)
    }
    df.withColumn("split", label)
  }

  /** Cumulative integer thresholds in (0, 2³²] for [[splitAssign]] —
    * public so oracles restate the exact literals. */
  def splitThresholds(weights: Seq[(String, Double)]): Seq[Long] = {
    val total = weights.map(_._2).sum
    val cum = weights.scanLeft(0.0) { case (a, (_, w)) => a + w }.tail
      .map(c => math.floor(c / total * 4294967296.0).toLong)
    cum.init :+ 4294967296L
  }
}
