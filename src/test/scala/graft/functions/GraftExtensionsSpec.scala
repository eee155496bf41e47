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
    } finally {
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}
