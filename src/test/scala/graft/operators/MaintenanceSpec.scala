package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

class MaintenanceSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  test("compactParquet merges small files without changing content, original survives staging") {
    val src = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val dir = java.nio.file.Files.createTempDirectory("graft-compact").toString + "/docs"
    // The small-files shape: 40 part files for ~500 rows.
    src.repartition(40).write.parquet(dir)
    def partFiles() = new java.io.File(dir).listFiles()
      .filter(f => f.isFile && f.getName.startsWith("part-"))
    assert(partFiles().length >= 30)
    val beforeRows = spark.read.parquet(dir).count()
    val beforeHash = spark.read.parquet(dir)
      .agg(sum(expr("crc32(concat_ws('|', doc_id, text))"))).head().getLong(0)

    val (nBefore, nAfter) = Maintenance.compactParquet(spark, dir, 1L << 20)
    assert(nBefore === partFiles().length.max(nBefore)) // inventory was real
    assert(nAfter < nBefore)
    assert(partFiles().length === nAfter)
    assert(!new java.io.File(dir + ".compact-staging").exists())
    // content identical: same rows, same multiset hash
    assert(spark.read.parquet(dir).count() === beforeRows)
    val afterHash = spark.read.parquet(dir)
      .agg(sum(expr("crc32(concat_ws('|', doc_id, text))"))).head().getLong(0)
    assert(afterHash === beforeHash)
  }

  test("compactPartitioned compacts each leaf dir; partition column survives") {
    val src = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val dir = java.nio.file.Files.createTempDirectory("graft-compact-leaf").toString + "/docs"
    src.repartition(10).write.partitionBy("lang").parquet(dir)
    val beforeRows = spark.read.parquet(dir).groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val (nBefore, nAfter) = Maintenance.compactPartitioned(spark, dir, 1L << 20)
    assert(nAfter < nBefore)
    val afterRows = spark.read.parquet(dir).groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(afterRows === beforeRows) // per-partition content intact
  }

  test("compactParquet refuses a partitioned layout instead of flattening it") {
    val src = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val dir = java.nio.file.Files.createTempDirectory("graft-compact-part").toString + "/docs"
    src.write.partitionBy("lang").parquet(dir)
    val e = intercept[IllegalArgumentException] {
      Maintenance.compactParquet(spark, dir, 1L << 20)
    }
    assert(e.getMessage.contains("partition"))
    // untouched: partition dirs still present, reads fine
    assert(spark.read.parquet(dir).count() === src.count())
  }
}
