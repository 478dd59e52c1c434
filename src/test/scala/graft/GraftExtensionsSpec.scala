package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSessionExtensions

/** The SQL deployment surface: GraftExtensions.install registers the
  * engine's native expressions for plain-SQL use; the builder-time
  * extension class applies the same set via injectFunction. */
class GraftExtensionsSpec extends AnyFunSuite {

  test("install() exposes engine SQL functions on a running session") {
    val spark = SparkSpec.session
    GraftExtensions.install(spark)
    val row = spark.sql(
      """SELECT rolling_hash('abc') AS rh,
             size(ngram_hashes('a b c d', 2)) AS ng,
             vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS vd,
             hyperplane_sig(array(cast(1.0 as float)), 4) AS hs""").head()
    assert(row.getLong(0) == graft.functions.RollingHash.compute("abc"))
    assert(row.getInt(1) == 3)
    assert(row.getDouble(2) == 11.0)
    assert(row.getLong(3) >= 0L && row.getLong(3) < 16L)
  }

  test("builder-time extension injects without error") {
    new GraftExtensions().apply(new SparkSessionExtensions)
  }
}
