package graft.functions

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The extensions class must make graft_dot resolvable in plain SQL with no
  * imperative registration. `spark.sql.extensions` is a STATIC conf read
  * from the SparkContext at its creation, so inside the shared-context test
  * JVM the spec exercises the equivalent builder.withExtensions path on a
  * fresh session (cleared default, reused context, restored afterwards). */
class GraftExtensionsSpec extends AnyFunSuite {

  test("withExtensions(GraftExtensions) injects graft_dot into a fresh session") {
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val spark = SparkSession.builder()
        .master("local[1]")
        .withExtensions(new GraftExtensions)
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      val got = spark.sql(
        "SELECT graft_dot(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d)) AS d")
        .head().getDouble(0)
      assert(got === (4.0 + 10.0 + 18.0))

      // The injected optimizer rule rewrites the declarative fold into the
      // codegen'd DotProduct — same values, and the optimized plan carries
      // graft_dot instead of an interpreted aggregate(zip_with(...)) tree.
      // (Non-foldable inputs: literal arrays would just constant-fold.)
      val base = spark.range(4).selectExpr(
        "id", "array(cast(id as double), 2.0d, 3.0d) AS a",
        "array(4.0d, cast(id as double), 6.0d) AS b")
      val fold = base.selectExpr("id",
        "aggregate(zip_with(a, b, (x, y) -> x * y), cast(0.0 as double), (acc, v) -> acc + v) AS d")
      val optimized = fold.queryExecution.optimizedPlan.toString
      assert(optimized.contains("graft_dot"), s"fold not rewritten:\n$optimized")
      assert(!optimized.contains("aggregate("), s"fold survived:\n$optimized")
      val direct = base.selectExpr("id", "graft_dot(a, b) AS d")
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      fold.collect().foreach(r => assert(r.getDouble(1) === direct(r.getLong(0))))

      // A fold that is NOT a dot product (acc - v) must be left alone.
      val other = base.selectExpr(
        "aggregate(zip_with(a, b, (x, y) -> x * y), cast(0.0 as double), (acc, v) -> acc - v) AS d")
      assert(!other.queryExecution.optimizedPlan.toString.contains("graft_dot"))
    } finally {
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}
