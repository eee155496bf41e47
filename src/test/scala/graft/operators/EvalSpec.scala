package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.{SharedSpark, SparkEntry}

/** Filter/score-QA family (q153-q156) semantics. */
class EvalSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("binnedAuc equals brute-force tie-corrected pairwise AUC (with ties)") {
    import spark.implicits._
    // Scores on a 1/64 grid so AucBins quantization is EXACT — the binned
    // statistic must then equal the plain pairwise definition including
    // the deliberate cross-class ties at 10/64 and 20/64.
    val rows: Seq[(String, Double)] =
      Seq.tabulate(40)(i => ("en", ((i % 24) + 8) / 64.0)) ++
        Seq.tabulate(56)(i => ("de", (i % 28) / 64.0)) ++
        Seq(("en", 10 / 64.0), ("de", 10 / 64.0), ("en", 20 / 64.0), ("de", 20 / 64.0))
    val got = Eval.binnedAuc(rows.toDF("lang", "score"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .map(t => t._1 -> t).toMap
    for (pos <- Seq("en", "de")) {
      val p = rows.filter(_._1 == pos).map(_._2)
      val n = rows.filter(_._1 != pos).map(_._2)
      val wins = (for (a <- p; b <- n)
        yield if (a > b) 1.0 else if (a == b) 0.5 else 0.0).sum
      val expect = wins / (p.size.toDouble * n.size.toDouble)
      val (_, np, nn, auc) = got(pos)
      assert(np === p.size && nn === n.size)
      assert(math.abs(auc - expect) < 1e-12,
        s"$pos: binned $auc vs brute-force $expect")
    }
    // one-vs-rest AUCs of a 2-class problem are complements
    assert(math.abs(got("en")._4 + got("de")._4 - 1.0) < 1e-12)
  }

  test("single-class frame yields null AUC, not a division error") {
    import spark.implicits._
    val r = Eval.binnedAuc(Seq(("en", 0.5), ("en", 0.25)).toDF("lang", "score"))
      .collect()
    assert(r.length === 1 && r.head.isNullAt(3))
  }

  test("q156 shard manifest: shards in range, deterministic, shares sum to 1 per shard") {
    val q = SparkEntry.queries("q156_shard_manifest")
    val a = q(spark, dir).collect()
    val b = q(spark, dir).collect()
    assert(a.toSeq === b.toSeq, "hash sharding must be replay-identical")
    val shards = a.map(_.getLong(0)).toSet
    assert(shards.forall(s => s >= 0 && s < Eval.Shards))
    a.groupBy(_.getLong(0)).foreach { case (sh, rows) =>
      val sum = rows.map(_.getDouble(rows.head.fieldIndex("shard_share"))).sum
      assert(math.abs(sum - 1.0) < 1e-9, s"shard $sh shares sum to $sum")
    }
    // parity: hash sharding keeps every (shard, source) share within a
    // loose tolerance of the global share on the 600-doc fixture — the
    // audit column itself is what the operator reports.
    val maxDev = a.map(r => r.getDouble(r.fieldIndex("abs_dev"))).max
    assert(maxDev < 0.5, s"pathological mixture deviation $maxDev")
  }

  test("q157 drift: shares sum to 1 per slice, tv = half the L1, tv within [0, 1]") {
    val rows = SparkEntry.queries("q157_score_drift")(spark, dir).collect()
    def col(r: org.apache.spark.sql.Row, c: String) = r.getDouble(r.fieldIndex(c))
    assert(math.abs(rows.map(col(_, "share_a")).sum - 1.0) < 1e-12)
    assert(math.abs(rows.map(col(_, "share_b")).sum - 1.0) < 1e-12)
    val tv = col(rows.head, "tv")
    assert(rows.forall(r => math.abs(col(r, "tv") - tv) < 1e-15),
      "tv must be the same scalar on every row")
    assert(tv >= 0.0 && tv <= 1.0)
    // the exact-integer tv agrees with the double L1 within float tolerance
    assert(math.abs(tv - rows.map(col(_, "abs_diff")).sum / 2.0) < 1e-9)
  }

  test("q155 agreement cells partition the corpus and kappa is within [-1, 1]") {
    val r = SparkEntry.queries("q155_filter_agreement")(spark, dir).collect().head
    val n = r.getLong(r.fieldIndex("n"))
    val cells = Seq("n11", "n10", "n01", "n00").map(c => r.getLong(r.fieldIndex(c)))
    assert(cells.sum === n, s"cells ${cells} don't partition n=$n")
    val kappa = r.getDouble(r.fieldIndex("kappa"))
    assert(kappa >= -1.0 && kappa <= 1.0)
  }
}
