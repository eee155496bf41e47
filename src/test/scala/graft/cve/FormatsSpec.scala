package graft.cve

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark
import graft.operators.CveOps

/** Warehouse frames must survive round trips through every columnar/text
  * format the lake might use — parquet (the default), ORC, and JSON lines —
  * with schema and values intact. */
class FormatsSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  private lazy val cvss =
    Flatten.cvss(Flatten.readFeed(spark, CveOps.FixtureFeed))

  private def rows(df: DataFrame) =
    df.collect().map(_.toSeq.map(v => Option(v).map(_.toString).orNull)).toSet

  private def roundTrip(fmt: String): Unit = {
    val out = Files.createTempDirectory(s"fmt-$fmt").toString + "/cvss"
    cvss.write.format(fmt).save(out)
    val back = spark.read.format(fmt)
      .schema(cvss.schema) // JSON needs it (dates); no-op for columnar
      .load(out)
      .select(cvss.columns.map(org.apache.spark.sql.functions.col): _*)
    assert(back.schema === cvss.schema, s"$fmt schema drift")
    assert(rows(back) === rows(cvss), s"$fmt value drift")
  }

  test("parquet round trip")(roundTrip("parquet"))
  test("orc round trip")(roundTrip("orc"))
  test("json-lines round trip")(roundTrip("json"))
}
