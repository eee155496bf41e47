package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SharedSpark, SparkEntry, Tables}

/** q195 Kneser–Ney bigram table: the fixed-point arithmetic must match a
  * scalar first-principles reference exactly, and the discounted mass
  * must behave like KN — every context keeps strictly less than the full
  * permille on its OBSERVED continuations (the reserved mass is what the
  * backoff distributes over unseen ones). */
class KnBigramSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("q195 == scalar KN reference (integer permille, D = 0.75) on the corpus") {
    val seqs = Tables.load(spark, sf, "documents")
      .select(split(trim(col("text")), " ").as("ws"))
      .collect().map(_.getSeq[String](0).toSeq)
    val big = scala.collection.mutable.Map.empty[(String, String), Long]
    seqs.foreach { ws =>
      ws.sliding(2).foreach {
        case Seq(a, b) => big((a, b)) = big.getOrElse((a, b), 0L) + 1
        case _ => ()
      }
    }
    val c1 = big.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val n1r = big.groupBy(_._1._1).view.mapValues(_.size.toLong).toMap
    val n1l = big.groupBy(_._1._2).view.mapValues(_.size.toLong).toMap
    val t = big.size.toLong
    val want = big.toSeq.sortBy(_._1).map { case ((w1, w2), c) =>
      val disc = ((4 * c - 3) * 250) / c1(w1)
      val back = (((750 * n1r(w1)) / c1(w1)) * ((1000 * n1l(w2)) / t)) / 1000
      (w1, w2, c, disc, back, disc + back)
    }
    val got = SparkEntry.queries("q195_kn_bigram")(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    assert(got === want && got.nonEmpty)
  }

  test("q195 KN mass: every context's observed-continuation mass stays under 1000 permille") {
    val rows = SparkEntry.queries("q195_kn_bigram")(spark, sf).collect()
    val byCtx = rows.groupBy(_.getString(0))
      .view.mapValues(_.map(_.getLong(5)).sum).toMap
    byCtx.foreach { case (w1, mass) =>
      assert(mass <= 1000L, s"context $w1 exceeds full mass: $mass")
      assert(mass > 0L, s"context $w1 has zero mass")
    }
    // the discount genuinely reserved mass somewhere (a context with > 1
    // continuation type cannot keep the full permille on observed pairs)
    assert(byCtx.values.exists(_ < 1000L))
  }
}
