package graft.functions

import org.apache.spark.sql.functions.{col, udaf}
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** The Misra–Gries guarantee the q159 two-pass pattern leans on: above the
  * n/(k+1) line there are NO false negatives, at any partition/merge
  * order, with a vocabulary far larger than the sketch (the testdata's
  * ~100-word vocabulary fits inside K=256 entirely, so q159's oracle
  * compare alone would never exercise eviction — this spec does). */
class MisraGriesSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  // Deterministic Zipf-ish stream: word i appears ⌊20000/i⌋ times, vocab
  // 2000 ≫ k = 32; ~163k occurrences, exactly 4 words above n/(k+1).
  private lazy val data: IndexedSeq[String] =
    (1 to 2000).flatMap(i => Seq.fill(20000 / i)(s"w$i"))

  test("no false negatives above n/(k+1) at any merge order; verify pass recovers the exact set") {
    val n = data.size.toLong
    val k = 32
    val thr = n / (k + 1) + 1
    val exactCounts = data.groupBy(identity).map { case (w, g) => w -> g.size.toLong }
    val exact = exactCounts.filter(_._2 >= thr).keySet
    assert(exact.size >= 3 && exact.size < k, s"fixture degenerate: ${exact.size} heavies")

    for (parts <- Seq(1, 7, 32)) {
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(data.map(Tuple1(_)), parts)).toDF("w")
      val mg = udaf(new MisraGriesAggregator(k))
      val cand = df.agg(mg(col("w"))).head().getSeq[String](0).toSet
      assert(cand.size <= k, s"sketch exceeded k at parts=$parts: ${cand.size}")
      assert(exact.subsetOf(cand),
        s"false negative at parts=$parts: missing ${exact -- cand}")
      // The production second pass: exact counts of candidates only,
      // threshold strips merge-order-dependent false positives.
      val verified = cand.filter(w => exactCounts.getOrElse(w, 0L) >= thr)
      assert(verified == exact, s"verified set diverged at parts=$parts")
    }
  }

  test("reduce-path eviction: a buffer never holds more than k counters") {
    val agg = new MisraGriesAggregator(8)
    var buf = agg.zero
    data.take(20000).foreach { w => buf = agg.reduce(buf, w) }
    assert(buf.size <= 8)
  }
}
