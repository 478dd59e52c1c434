package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval (range) join via fixed-width binning.
  *
  * Spark plans `point BETWEEN lo AND hi` with no equality key as a
  * BroadcastNestedLoopJoin — O(|L|·|R|) compared pairs and a broadcast
  * of one whole side; both are fatal at 100 TB. Binning restores an
  * EQUIJOIN: each interval is exploded to the fixed-width bins it
  * covers (O(width/binWidth + 1) rows), each point maps to exactly one
  * bin, and the bin equijoin (plus any caller equality keys) shuffles
  * hash-partitioned like any other join; a residual BETWEEN filter
  * removes same-bin non-overlaps. Each matching (point, interval) pair
  * meets in exactly ONE bin — the point's — so no post-join dedup is
  * needed.
  *
  * `binWidth` tunes replication vs selectivity: ~the median interval
  * width is the classic choice (≈2 rows per interval, bin populations
  * balanced). The same technique with both sides exploded handles
  * interval-overlap joins; points are the common case and keep one side
  * unreplicated.
  */
object RangeJoin {

  /** Join `points` to every interval in `intervals` containing the
    * point: `lo <= point <= hi` (inclusive both ends), optionally ANDed
    * with `extraKeys` equality. Column names must be distinct across
    * the sides apart from `extraKeys`. Numeric (double-compatible)
    * point/lo/hi columns. */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
      pointCol: String, loCol: String, hiCol: String, binWidth: Double,
      extraKeys: Seq[String] = Nil): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive: $binWidth")
    val p = points.withColumn("_bin",
      floor(col(pointCol) / binWidth).cast("long"))
    // hi < lo intervals match nothing; drop them before sequence() would
    // produce a descending bin range
    val iv = intervals.filter(col(hiCol) >= col(loCol))
      .withColumn("_bin", explode(sequence(
        floor(col(loCol) / binWidth).cast("long"),
        floor(col(hiCol) / binWidth).cast("long"))))
    p.join(iv, extraKeys :+ "_bin")
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("_bin")
  }
}
