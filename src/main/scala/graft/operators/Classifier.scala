package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.{GramBuckets, GramWeightMicros}

/** Trainable document-quality classifier — the fastText-style linear
  * filter every production pretraining pipeline runs (label a few
  * thousand "good" vs "bad" documents, train a cheap linear model,
  * score the whole corpus): logistic regression over the SAME hashed
  * n-gram bag-of-features space as [[Select]] (DSIR), trained by
  * distributed full-batch gradient descent.
  *
  * Determinism is designed in, not hoped for:
  *
  *  - '''Weights are integer micro-nats''' (the [[Select]] trick): a
  *    document's margin is an exact LONG dot product via
  *    [[graft.functions.GramWeightMicros]] — so scoring is
  *    order-independent and replayable bit-for-bit by the DuckDB
  *    oracle.
  *  - '''Gradients aggregate in exact DECIMAL''': each document's
  *    residual `σ(margin) − y` rounds to 12 dp BEFORE the sum, so the
  *    per-bucket gradient is an exact decimal sum — identical under
  *    any partitioning or execution order (spec-pinned). Float sums
  *    over a corpus are the classic nondeterminism leak in distributed
  *    training; exact fixed-point aggregation closes it.
  *
  * Scale shape: one corpus pass per iteration, reducing map-side to
  * ≤B+1 gradient rows (the explode carries a 16-byte (bucket, decimal)
  * pair per gram occurrence into a hash agg); the driver holds only
  * the (B+1)-sized weight vector. Production practice trains on a
  * bounded labeled sample (this is a LABELED-data operator), then
  * [[score]] sweeps the 100 TB corpus as a pure scan — no joins, no
  * shuffle, the scoring kernel rides the weights as task object data.
  */
object Classifier {

  /** Feature space must match between train and score. `lr` is the
    * full-batch learning rate (per-iteration step on the mean
    * gradient). */
  final case class Config(n: Int = 2, buckets: Int = 1024,
      iters: Int = 20, lr: Double = 4.0)

  /** Model: per-bucket weights + bias, all in integer micro-nats. */
  final case class Model(wMicros: Array[Long], biasMicros: Long,
      cfg: Config)

  private def sigmoid(x: Double): Double = 1.0 / (1.0 + math.exp(-x))

  /** Train on a labeled frame (`labelCol` ∈ {0, 1}) by full-batch
    * gradient descent. Deterministic: same data → same model,
    * regardless of partitioning. */
  def train(labeled: DataFrame, textCol: String, labelCol: String,
      cfg: Config = Config()): Model = {
    val spark = labeled.sparkSession
    import spark.implicits._
    val docs = labeled.select(col(textCol).as("_t"),
        col(labelCol).cast("double").as("_y"))
      .localCheckpoint() // train passes re-scan; pin the input once
    val nDocs = docs.count().toDouble
    var w = new Array[Long](cfg.buckets)
    var bias = 0L
    for (_ <- 1 to cfg.iters) {
      val margin = (GramWeightMicros(col("_t"), cfg.n, w) +
        lit(bias)).cast("double") / lit(1e6)
      // residual rounded to fixed point BEFORE aggregation → the sums
      // below are exact decimals, order-independent
      val scored = docs.withColumn("_r",
        round(lit(1.0) / (lit(1.0) + exp(-margin)) - col("_y"), 12)
          .cast("decimal(26,12)"))
      val gradRows = scored
        .select(explode(GramBuckets(col("_t"), cfg.n, cfg.buckets))
          .as("b"), col("_r"))
        .groupBy("b").agg(sum(col("_r")).as("g"))
        .as[(Int, java.math.BigDecimal)].collect()
      val gBias = scored.agg(sum(col("_r")).as("g"))
        .as[java.math.BigDecimal].head()
      val step = cfg.lr / nDocs * 1e6
      w = w.clone() // the old array fed task closures; never mutate it
      gradRows.foreach { case (b, g) =>
        w(b) -= math.floor(g.doubleValue * step + 0.5).toLong
      }
      bias -= math.floor(
        (if (gBias == null) 0.0 else gBias.doubleValue) * step + 0.5).toLong
    }
    Model(w, bias, cfg)
  }

  /** Score every document: `score` = σ(margin) rounded to 6 dp,
    * `margin_micros` the exact integer margin. One pure scan. */
  def score(df: DataFrame, textCol: String, model: Model): DataFrame =
    df.withColumn("margin_micros",
        GramWeightMicros(col(textCol), model.cfg.n, model.wMicros) +
          lit(model.biasMicros))
      .withColumn("score", round(lit(1.0) /
        (lit(1.0) + exp(-col("margin_micros").cast("double") / lit(1e6))),
        6))

  /** [[score]] + a keep/drop label at the 0.5 boundary. */
  def classify(df: DataFrame, textCol: String, model: Model): DataFrame =
    score(df, textCol, model)
      .withColumn("keep", col("margin_micros") >= 0L)
}
