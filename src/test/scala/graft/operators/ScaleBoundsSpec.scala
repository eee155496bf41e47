package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SharedSpark, Tables}

/** Pins for the two VERDICT-r3 scale cliffs, now removed:
  *
  *  1. sequence packing's stage-2 prefix sum used a FIXED block size, so the
  *     offsets frame (one window partition + one broadcast) grew linearly
  *     with the corpus. Now BlockSize = ⌈√N⌉ is derived in-plan, so the
  *     block count — and with it the single-partition offsets window and its
  *     broadcast — is √N-bounded. Asserted at two scale factors, plus the
  *     growth RATE (blocks grow ~√rows, not ~rows).
  *
  *  2. the q60/q73 quality cut used exact `percentile`, whose aggregation
  *     buffer is a value→count map (~N/langs distinct doubles on one reducer
  *     per lang). Now the threshold is a bounded histogram median: the spec
  *     pins the histogram's accuracy contract (thr is the lower edge of the
  *     bucket holding the rank-⌈n/2⌉ order statistic, so the order statistic
  *     lies in [thr, thr + 1/K)) and that no Percentile aggregate remains in
  *     the executed plan.
  */
class ScaleBoundsSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  private def tokens(dir: String) =
    Tables.load(spark, dir, "documents")
      .select(col("doc_id"),
        size(split(trim(col("text")), " ")).cast("long").as("tokens"))

  private def blocksAndRows(dir: String): (Long, Long) = {
    val ps = TextOps.prefixSum(tokens(dir))
    val row = ps.agg(countDistinct("block"), count(lit(1))).head()
    (row.getLong(0), row.getLong(1))
  }

  test("prefixSum block count is √N-bounded at each sf and grows sub-linearly") {
    // documents has 500 rows at sf0.001/sf0.01 but 5000 at sf0.1 — use the
    // 10× span so the growth-rate assertion isn't vacuous.
    val (b1, n1) = blocksAndRows("/root/testdata/sf0.001")
    val (b2, n2) = blocksAndRows("/root/testdata/sf0.1")
    def bound(n: Long) = 2 * math.ceil(math.sqrt(n.toDouble)).toLong + 1
    assert(b1 <= bound(n1), s"sf0.001: $b1 blocks for $n1 rows exceeds 2*sqrt+1")
    assert(b2 <= bound(n2), s"sf0.01: $b2 blocks for $n2 rows exceeds 2*sqrt+1")
    // Growth rate: a fixed block size would make blocks scale with rows
    // (ratio ~n2/n1); the √N blocking keeps the squared block ratio within
    // the row ratio (with slack for doc_id-range raggedness).
    assert(b2.toDouble / b1 * (b2.toDouble / b1) <= 2.0 * n2 / n1,
      s"blocks grew linearly: $b1 -> $b2 while rows $n1 -> $n2")
  }

  test("prefixSum cum matches a driver-side running total (sf0.001)") {
    val got = TextOps.prefixSum(tokens("/root/testdata/sf0.001"))
      .select("doc_id", "tokens", "cum")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    var running = 0L
    got.foreach { case (id, t, cum) =>
      running += t
      assert(cum == running, s"doc $id: cum=$cum expected $running")
    }
  }

  test("histMedianThr brackets the rank-ceil(n/2) order statistic within 1/K") {
    val scored = TextOps.qualityScored(
      Tables.load(spark, "/root/testdata/sf0.01", "documents"))
    val thr = TextOps.histMedianThr(scored)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val byLang = scored.select("lang", "score").collect()
      .groupBy(_.getString(0))
    byLang.foreach { case (lang, rows) =>
      val v = rows.map(_.getDouble(1)).sorted
      val orderStat = v((v.length + 1) / 2 - 1)
      val t = thr(lang)
      assert(orderStat >= t && orderStat < t + 1.0 / TextOps.HistK,
        s"$lang: order statistic $orderStat outside [$t, ${t + 1.0 / TextOps.HistK})")
    }
  }

  test("quality-cut and quantile plans carry no exact Percentile aggregate (bounded state)") {
    Seq("q60_quality_filter", "q73_curation_pipeline", "q76_approx_quantile").foreach { q =>
      val plan = graft.SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
        .queryExecution.executedPlan.toString
      assert(!plan.toLowerCase.contains("percentile"),
        s"$q still plans an exact percentile aggregate")
    }
  }
}
