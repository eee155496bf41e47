package graft

import org.apache.spark.sql.SparkSession

/** One shared session for all suites (sbt forks one test JVM); warehouse in
  * a temp dir so catalog tests never pollute the repo. */
object SharedSpark {
  lazy val spark: SparkSession = {
    val s = Sessions.builder("local[2]", 2)
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-wh").toString)
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}
