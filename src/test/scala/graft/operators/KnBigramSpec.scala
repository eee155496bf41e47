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

  /** Scalar KN model from a set of word sequences: returns (p_kn table,
    * c1, n1r, n1l, T) so held-out scoring can reuse the exact legs. */
  private def scalarKn(seqs: Seq[Seq[String]])
      : (Map[(String, String), Long], Map[String, Long], Map[String, Long],
         Map[String, Long], Long) = {
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
    val p = big.toMap.map { case ((w1, w2), c) =>
      val disc = ((4 * c - 3) * 250) / c1(w1)
      val back = (((750 * n1r(w1)) / c1(w1)) * ((1000 * n1l(w2)) / t)) / 1000
      (w1, w2) -> (disc + back)
    }
    (p, c1, n1r, n1l, t)
  }

  private def corpusSeqs(pred: Long => Boolean): Seq[(Long, Seq[String])] =
    Tables.load(spark, sf, "documents")
      .select(col("doc_id"), split(trim(col("text")), " ").as("ws"))
      .collect().map(r => (r.getLong(0), r.getSeq[String](1).toSeq)).toSeq
      .filter(x => pred(x._1))

  test("q196 == scalar held-out KN scoring (backoff mass for unseen pairs, OOV only out-of-model)") {
    val (p, c1, n1r, n1l, t) =
      scalarKn(corpusSeqs(_ % TextOps.KnHold != 0).map(_._2))
    val want = corpusSeqs(_ % TextOps.KnHold == 0)
      .filter(_._2.length >= 2).sortBy(_._1).map { case (id, ws) =>
        val bgs = ws.sliding(2).collect { case Seq(a, b) => (a, b) }.toSeq
        val scored = bgs.map { case (a, b) =>
          if (p.contains((a, b))) (p((a, b)), 1L, 0L)
          else if (c1.contains(a) && n1l.contains(b))
            ((((750 * n1r(a)) / c1(a)) * ((1000 * n1l(b)) / t)) / 1000, 0L, 1L)
          else (0L, 0L, 0L)
        }
        val n = bgs.size.toLong
        val seen = scored.map(_._2).sum
        val bo = scored.map(_._3).sum
        (id, n, seen, bo, n - seen - bo, scored.map(_._1).sum / n)
      }
    val got = SparkEntry.queries("q196_lm_doc_score")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    assert(got === want && got.nonEmpty)
  }

  test("q196 backoff leg: an unseen pair with known margins earns the KN mass, exact fixture") {
    // The 31-token corpus can leave the held slice fully covered at a
    // given sf, so the smoothing leg (the q106-vs-q196 delta) is pinned
    // on a hand-computed fixture instead: train doc "a b c" → big
    // {(a,b), (b,c)}, c1(a)=c1(b)=1, n1r=1 each, n1l(b)=n1l(c)=1, T=2.
    //   held "a c q": (a,c) unseen pair, both margins known → backoff
    //     = (750·1/1) · (1000·1/2) / 1000 = 375; (c,q): c is not a
    //     context and q not a continuation → OOV 0. score = 375/2 = 187.
    //   held "a b c": both pairs seen, p = 250 + 375 = 625 each.
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-kn-fix")
    Seq((0L, "a c q", "en", "t"), (5L, "a b c", "en", "t"),
      (1L, "a b c", "en", "t"))
      .toDF("doc_id", "text", "lang", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("q196_lm_doc_score")(spark, dir.toString)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    assert(got === Seq(
      (0L, 2L, 0L, 1L, 1L, 187L),
      (5L, 2L, 2L, 0L, 0L, 625L)))
  }

  test("q197 == scalar lift reference; independence reads ~1000 permille on average") {
    val seqs = corpusSeqs(_ => true).map(_._2)
    val big = scala.collection.mutable.Map.empty[(String, String), Long]
    seqs.foreach(_.sliding(2).foreach {
      case Seq(a, b) => big((a, b)) = big.getOrElse((a, b), 0L) + 1
      case _ => ()
    })
    val cl = big.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val cr = big.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
    val n = big.values.sum
    val want = big.toSeq.filter(_._2 >= TextOps.MinColloc).sortBy(_._1)
      .map { case ((w1, w2), c) =>
        (w1, w2, c, cl(w1), cr(w2), ((c * 1000) * n) / (cl(w1) * cr(w2)))
      }
    val got = SparkEntry.queries("q197_collocations")(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    assert(got === want && got.nonEmpty)
    // sanity: lifts straddle independence (this corpus is near-random, so
    // both positive and negative associations must appear)
    assert(got.exists(_._6 > 1000L) && got.exists(_._6 < 1000L))
  }

  test("q198 zipf: ranks are the (c desc, w) total order and rf/deviation are exact products") {
    val rows = SparkEntry.queries("q198_zipf_audit")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.nonEmpty)
    assert(rows.map(_._1).toSeq === (1L to rows.length).toSeq)
    val resorted = rows.sortBy(x => (-x._3, x._2)).map(_._1).toSeq
    assert(resorted === (1L to rows.length).toSeq, "rank order broken")
    val ctop = rows.map(_._3).max
    rows.foreach { case (rnk, _, c, rf, dev) =>
      assert(rf == rnk * c && dev == (rnk * c * 1000) / ctop)
    }
    assert(rows.head._5 == 1000L, "rank-1 deviation is the law's constant")
  }

  test("q200 == q196's scores bucketed per source, cumulative consistent") {
    val srcOf = Tables.load(spark, sf, "documents")
      .select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val want = SparkEntry.queries("q196_lm_doc_score")(spark, sf).collect()
      .map(r => (srcOf(r.getLong(0)), r.getLong(5) / 100))
      .groupBy(identity).view.mapValues(_.length.toLong).toSeq
      .map { case ((s, b), n) => (s, b, n) }.sortBy(x => (x._1, x._2))
    val got = SparkEntry.queries("q200_lm_threshold_table")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(got.map(x => (x._1, x._2, x._3)).toSeq === want && got.nonEmpty)
    // cumulative really is the per-source running total
    got.groupBy(_._1).foreach { case (_, rows) =>
      var run = 0L
      rows.sortBy(_._2).foreach { r =>
        run += r._3
        assert(r._4 === run, s"cumulative broken at $r")
      }
    }
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
