package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("binned point-in-interval matches the naive BETWEEN join exactly") {
    val points = Seq.tabulate(200)(i => (i.toLong, i * 0.37))
      .toDF("pid", "x")
    val ivs = Seq.tabulate(40)(j =>
      (j.toLong, j * 1.9 - 0.5, j * 1.9 + 2.3)).toDF("iid", "lo", "hi")
    val got = RangeJoin.pointInInterval(points, ivs, "x", "lo", "hi",
        binWidth = 1.0)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    val want = points.join(ivs, col("x") >= col("lo") &&
        col("x") <= col("hi"))
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(got == want && want.nonEmpty)
  }

  test("inverted intervals (hi < lo) match nothing and do not explode") {
    val points = Seq((1L, 5.0)).toDF("pid", "x")
    val ivs = Seq((1L, 10.0, 0.0), (2L, 4.0, 6.0)).toDF("iid", "lo", "hi")
    val got = RangeJoin.pointInInterval(points, ivs, "x", "lo", "hi", 2.0)
      .select("iid").as[Long].collect().toSeq
    assert(got == Seq(2L))
  }

  test("extra equality keys AND with the range predicate") {
    val points = Seq((1L, "a", 5.0), (2L, "b", 5.0)).toDF("pid", "g", "x")
    val ivs = Seq(("a", 0.0, 10.0)).toDF("g", "lo", "hi")
    val got = RangeJoin.pointInInterval(points, ivs, "x", "lo", "hi", 5.0,
        extraKeys = Seq("g"))
      .select("pid").as[Long].collect().toSeq
    assert(got == Seq(1L))
  }
}
