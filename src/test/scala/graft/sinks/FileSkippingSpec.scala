package graft.sinks

import org.apache.spark.sql.{Column, GraftFileSkipping}
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Interval analysis used by both the catalog scan's manifest skipping
  * and `GraftTable.deleteWhere`'s discovery pruning. Conditions are
  * extracted exactly the way deleteWhere does it: analyze+optimize a
  * filter over the table schema, collect the catalyst Filter
  * conditions (literal casts folded). */
class FileSkippingSpec extends SparkSpec {

  // parquet-backed like the real table read: a Filter over a
  // LocalRelation would be folded away by ConvertToLocalRelation
  private lazy val table: org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-skip").toString
    Seq((1L, 2L, "a", 1.5)).toDF("k", "t", "name", "v")
      .write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir)
  }

  private def bounds(c: Column): Map[String, (Long, Long)] = {
    val conjuncts = table.filter(c).queryExecution.optimizedPlan.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
        f.condition
    }
    GraftFileSkipping.bounds(conjuncts)
  }

  test("equality and range conjunctions meet per column") {
    val b = bounds(col("k") === 5L && col("t") >= 10L && col("t") < 20L)
    assert(b("k") == ((5L, 5L)))
    assert(b("t") == ((10L, 20L)))
  }

  test("int literal against long column folds through the cast") {
    val b = bounds(col("k") === 5 && col("t") < 20)
    assert(b("k") == ((5L, 5L)))
    assert(b("t") == ((Long.MinValue, 20L)))
  }

  test("disjunctions and non-integral predicates constrain nothing") {
    assert(bounds(col("k") === 5L || col("k") === 9L).get("k").isEmpty)
    assert(bounds(col("name") === "x").isEmpty)
    assert(bounds(col("v") > 1.5).isEmpty)
  }

  test("IN list collapses to its envelope") {
    val b = bounds(col("k").isin(7L, 3L, 11L))
    assert(b("k") == ((3L, 11L)))
  }

  test("survives: disjoint interval prunes, overlap and missing stats keep") {
    val b = bounds(col("k") >= 100L && col("k") <= 200L)
    assert(!GraftFileSkipping.survives(Some(Map("k" -> ((0L, 99L)))), b))
    assert(GraftFileSkipping.survives(Some(Map("k" -> ((150L, 300L)))), b))
    assert(GraftFileSkipping.survives(Some(Map("other" -> ((0L, 1L)))), b))
    assert(GraftFileSkipping.survives(None, b))
  }

  test("reversed operand order normalizes (lit op col)") {
    val b = bounds(lit(10L) <= col("k") && lit(20L) > col("k"))
    assert(b("k") == ((10L, 20L)))
  }

  // ------------------------------------------------- string intervals

  private def strBounds(c: Column): Map[String, (String, Option[String])] = {
    val conjuncts = table.filter(c).queryExecution.optimizedPlan.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
        f.condition
    }
    GraftFileSkipping.strBounds(conjuncts)
  }

  test("string equality/range/IN produce bounds; meet intersects") {
    assert(strBounds(col("name") === "doc-42")("name") ==
      (("doc-42", Some("doc-42"))))
    val b = strBounds(col("name") >= "b" && col("name") < "f")
    assert(b("name") == (("b", Some("f"))))
    assert(strBounds(col("name").isin("m", "c", "x"))("name") ==
      (("c", Some("x"))))
    // long predicates never leak into string bounds and vice versa
    assert(strBounds(col("k") === 5L).isEmpty)
    assert(bounds(col("name") === "x").isEmpty)
  }

  test("survivesStr: disjoint prunes, overlap / missing stats keep, " +
      "truncated-inclusive bounds are honored") {
    val b = strBounds(col("name") === "doc-500")
    assert(!GraftFileSkipping.survivesStr(
      Some(Map("name" -> (("doc-000", "doc-499")))), b))
    assert(GraftFileSkipping.survivesStr(
      Some(Map("name" -> (("doc-400", "doc-999")))), b))
    assert(GraftFileSkipping.survivesStr(None, b))
    assert(GraftFileSkipping.survivesStr(Some(Map.empty), b))
    // file bounds are inclusive: a query exactly at the upper bound keeps
    assert(GraftFileSkipping.survivesStr(
      Some(Map("name" -> (("a", "doc-500")))), b))
    // unbounded-above query interval: > "zz" widens to >= "zz"
    val gt = strBounds(col("name") > "zz")
    assert(!GraftFileSkipping.survivesStr(
      Some(Map("name" -> (("a", "m")))), gt))
    assert(GraftFileSkipping.survivesStr(
      Some(Map("name" -> (("a", "zz")))), gt))
  }

  test("truncateUpper: pass-through, increment, walk-back, overflow") {
    import GraftTable.truncateUpper
    assert(truncateUpper("short") == Some("short"))
    assert(truncateUpper("abcdefghijklmnopXYZ") == Some("abcdefghijklmnoq"))
    // last truncated char is 0x7E '~' → increments to 0x7F
    assert(truncateUpper("abcdefghijklmno~Z") ==
      Some("abcdefghijklmno" + 0x7f.toChar))
    // 0x7F chars walk back to the first incrementable one
    val del = 0x7f.toChar
    assert(truncateUpper("ab" + del.toString * 15) ==
      Some("ac"))
    // nothing incrementable → no upper bound
    assert(truncateUpper(del.toString * 17).isEmpty)
  }
}
