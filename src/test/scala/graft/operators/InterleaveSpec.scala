package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

import graft.{SharedSpark, SparkEntry}

/** q158 deterministic prefix-balanced interleave: the closed-form position
  * must equal an INDEPENDENT exact-rational sort of the stride keys (the
  * oracle mirrors the closed form, so formula bugs would hash-match — this
  * spec is the check the oracle can't be), every prefix must preserve the
  * source mixture to within the stride bound, and both must hold on a
  * corpus with UNEQUAL source sizes (the testdata's sources are all equal,
  * which would mask n_s-asymmetry bugs in the cross-multiplied
  * comparisons). */
class InterleaveSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  private val dir = "/root/testdata/sf0.001"

  /** Exact comparison of stride keys (2·rk−1)/(2·ns) by cross-
    * multiplication, ties broken by source name — the definition the
    * closed form claims to rank by. */
  private def independentPos(rows: Array[Row]): Map[Long, Long] = {
    val sorted = rows.sortWith { (x, y) =>
      val (rkx, nsx, sx) = (x.getLong(2), x.getLong(3), x.getString(1))
      val (rky, nsy, sy) = (y.getLong(2), y.getLong(3), y.getString(1))
      val lhs = (2 * rkx - 1) * nsy
      val rhs = (2 * rky - 1) * nsx
      if (lhs != rhs) lhs < rhs else sx < sy
    }
    sorted.zipWithIndex.map { case (r, i) => r.getLong(0) -> (i + 1L) }.toMap
  }

  private def check(rows: Array[Row], tolerance: Double): Unit = {
    val n = rows.length.toLong
    val pos = rows.map(_.getLong(4))
    assert(pos.min == 1L && pos.max == n && pos.distinct.length == n.toInt,
      "pos must be a permutation of 1..N")
    val expect = independentPos(rows)
    rows.foreach { r =>
      assert(r.getLong(4) == expect(r.getLong(0)),
        s"closed-form pos ${r.getLong(4)} != rational-sort pos " +
          s"${expect(r.getLong(0))} for doc ${r.getLong(0)}")
    }
    // Prefix parity at EVERY prefix: running per-source count stays within
    // `tolerance` of the proportional share k·ns/N.
    val ns = rows.groupBy(_.getString(1)).map { case (s, g) => s -> g.length.toLong }
    val bySrc = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
    rows.sortBy(_.getLong(4)).zipWithIndex.foreach { case (r, i) =>
      val k = i + 1
      bySrc(r.getString(1)) += 1
      ns.foreach { case (s, c) =>
        val dev = math.abs(bySrc(s) - k.toDouble * c / n)
        assert(dev <= tolerance, s"prefix $k source $s deviation $dev")
      }
    }
  }

  test("q158 equals the exact rational sort; every prefix is mixture-balanced") {
    check(SparkEntry.queries("q158_interleave_manifest")(spark, dir).collect(),
      tolerance = 1.0)
  }

  test("q158 on unequal source sizes: rational sort and parity still hold") {
    // Skew the corpus: drop 2 of 3 docs from some sources — source sizes
    // now differ ~3× so the cross-multiplied comparisons see genuinely
    // different denominators (and tie groups shrink). Modulus 3 is
    // coprime with the testdata's source = doc_id % 20 assignment, so the
    // cut lands uniformly INSIDE each source rather than deleting whole
    // sources.
    val tmp = Files.createTempDirectory("ilv").toString
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    docs.filter(
        !(col("source") < "src14" && col("doc_id") % 3 =!= 0))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val rows = SparkEntry.queries("q158_interleave_manifest")(spark, tmp).collect()
    assert(rows.map(_.getLong(3)).distinct.length > 1, "fixture must be skewed")
    // Stride discrepancy grows with source-count only through ties; the
    // per-source bound stays ~1 plus the tie slop across 20 sources.
    check(rows, tolerance = 2.0)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
  }

  private def col(n: String) = org.apache.spark.sql.functions.col(n)
}
