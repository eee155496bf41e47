package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SharedSpark, SparkEntry, Tables}

/** q174 BPE vocabulary learning: the distributed pair-count + greedy
  * string-fold merge must agree with an INDEPENDENT scalar reference
  * (plain Scala maps over symbol vectors — the textbook get_stats /
  * merge_vocab shape) on both a hand fixture exercising overlap runs and
  * the real corpus, and be partitioning-invariant. */
class BpeSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  private val dir = "/root/testdata/sf0.001"

  /** Textbook reference: word-frequency dict, overlapping pair counts,
    * max-count (lexical min tiebreak) merge applied greedily left-to-right
    * non-overlapping. Returns (rnd, l, r, pcnt, n_tokens). */
  private def refBpe(words: Seq[String], rounds: Int)
      : Seq[(Long, String, String, Long, Long)] = {
    var wc: Vector[(Vector[String], Long)] = words
      .filter(w => w.nonEmpty && !w.contains("|"))
      .groupBy(identity).view
      .map { case (w, g) => (w.map(_.toString).toVector, g.size.toLong) }
      .toVector
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(Long, String, String, Long, Long)]
    var k = 1
    var done = false
    while (k <= rounds && !done) {
      val pc = scala.collection.mutable.Map.empty[(String, String), Long]
      wc.foreach { case (syms, c) =>
        syms.sliding(2).foreach {
          case Seq(a, b) => pc((a, b)) = pc.getOrElse((a, b), 0L) + c
          case _ => ()
        }
      }
      if (pc.isEmpty) done = true
      else {
        val ((l, r), cnt) = pc.toSeq.minBy { case ((a, b), c) => (-c, a, b) }
        wc = wc.map { case (syms, c) =>
          val nb = scala.collection.mutable.ArrayBuffer.empty[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
              nb += l + r; i += 2
            } else { nb += syms(i); i += 1 }
          }
          (nb.toVector, c)
        }
        out += ((k.toLong, l, r, cnt, wc.map { case (s, c) => s.size * c }.sum))
        k += 1
      }
    }
    out.toSeq
  }

  private def run(docs: org.apache.spark.sql.DataFrame, rounds: Int) =
    TextOps.bpeMerges(docs, rounds).orderBy("rnd").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4))).toSeq

  test("greedy overlap semantics: runs merge left-to-right, counts include overlaps") {
    import spark.implicits._
    // "aaaa aaa": pair (a,a) counts 3 + 2 = 5 (overlaps included); the
    // greedy merge leaves "aaaa"→[aa,aa] and "aaa"→[aa,a] (never [a,aa]).
    val docs = Seq((1L, "aaaa aaa")).toDF("doc_id", "text")
    val got = run(docs, 3)
    assert(got.head === ((1L, "a", "a", 5L, 4L)))
    // round 2 tie on count 1: (aa,a) < (aa,aa) lexically
    assert(got(1)._2 === "aa" && got(1)._3 === "a")
    assert(got === refBpe(Seq("aaaa", "aaa"), 3))
  }

  test("bpeMerges == the scalar reference on the real corpus, all rounds") {
    val docs = Tables.load(spark, dir, "documents")
    val words = docs.select(explode(split(trim(col("text")), " ")).as("w"))
      .filter(col("w") =!= "").collect().map(_.getString(0)).toSeq
    val want = refBpe(words, TextOps.BpeRounds)
    val got = run(docs, TextOps.BpeRounds)
    assert(got === want)
    assert(got.size === TextOps.BpeRounds, "fixture exhausted its pairs early")
    // merge counts are non-increasing only per learned pair family, but
    // token count must strictly decrease every round (each merge removes
    // pcnt-or-fewer, at least one, symbols)
    got.sliding(2).foreach {
      case Seq(a, b) => assert(b._5 < a._5, s"token count did not fall: $a -> $b")
      case _ => ()
    }
  }

  test("bpeMerges is partitioning-invariant") {
    val docs = Tables.load(spark, dir, "documents")
    assert(run(docs.repartition(13), 4) === run(docs, 4))
  }

  private def runLocal(docs: org.apache.spark.sql.DataFrame, rounds: Int) =
    TextOps.bpeMergesLocal(docs, rounds).orderBy("rnd").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4))).toSeq

  test("bpeMergesLocal == bpeMerges on fixture and corpus; prefixes nest; deep rounds exhaust cleanly") {
    import spark.implicits._
    val fx = Seq((1L, "aaaa aaa"), (2L, "banana bandana")).toDF("doc_id", "text")
    assert(runLocal(fx, 5) === run(fx, 5))
    val docs = Tables.load(spark, dir, "documents")
    val full = runLocal(docs, TextOps.BpeRounds)
    assert(full === run(docs, TextOps.BpeRounds))
    // The learner is incremental: an r-round run IS the 10-round prefix,
    // so the graded q174 rounds certify every fast-path prefix too.
    assert(runLocal(docs, 3) === full.take(3))
    // Tokenizer-depth rounds: learning continues past the graded 10 and
    // terminates when the pair supply is exhausted — at which point every
    // vocab word is a single symbol, so the final token count is exactly
    // the corpus word count.
    val deep = runLocal(docs, 100000)
    assert(deep.length > TextOps.BpeRounds)
    assert(deep.map(_._1) === (1L to deep.length).toSeq)
    val nWords = docs
      .select(explode(split(trim(col("text")), " ")).as("w"))
      .filter(col("w") =!= "" && !col("w").contains("|")).count()
    assert(deep.last._5 === nWords,
      "exhausted learner must leave one token per corpus word")
  }

  test("bpeMergesLocal tie-break uses code-point order (Spark's UTF8String binary order)") {
    import spark.implicits._
    // Two pairs tie on pcnt = 1; the left symbols straddle the one zone
    // where Java UTF-16 order and code-point order DISAGREE: U+1F600
    // (😀, UTF-16 lead surrogate D83D) sorts before U+E000 in UTF-16 but
    // after it by code point — and Spark's orderBy compares UTF8String
    // bytes, which is code-point order. Both learners must crown
    // (U+E000, a).
    val docs = Seq((1L, "😀a a")).toDF("doc_id", "text")
    val dist = run(docs, 1)
    val local = runLocal(docs, 1)
    assert(dist === local)
    assert(dist.head._2 === "", s"wrong tie-break winner: $dist")
  }

  /** Reference segmentation: replay refBpe's merges over a word's chars —
    * the subword count q175 must reproduce through the engine path. */
  private def refSegment(words: Seq[String], rounds: Int): Map[String, Long] = {
    var seg: Map[String, Vector[String]] = words.distinct
      .filter(w => w.nonEmpty && !w.contains("|"))
      .map(w => w -> w.map(_.toString).toVector).toMap
    refBpe(words, rounds).foreach { case (_, l, r, _, _) =>
      seg = seg.view.mapValues { syms =>
        val nb = scala.collection.mutable.ArrayBuffer.empty[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
            nb += l + r; i += 2
          } else { nb += syms(i); i += 1 }
        }
        nb.toVector
      }.toMap
    }
    seg.view.mapValues(_.size.toLong).toMap
  }

  test("q194 fertility == reference segmentation grouped by language") {
    val docs = Tables.load(spark, dir, "documents")
    val langWords = docs
      .select(col("lang"), split(trim(col("text")), " ").as("ws"))
      .collect()
      .map(r => r.getString(0) -> r.getSeq[String](1).filter(_.nonEmpty).toSeq)
    val seg = refSegment(langWords.flatMap(_._2).toSeq, TextOps.BpeRounds)
    val want = langWords.groupBy(_._1).view.mapValues { rows =>
      val ws = rows.flatMap(_._2).filter(seg.contains)
      val sub = ws.map(seg).sum
      (ws.size.toLong, sub, sub * 1000 / ws.size)
    }.toMap
    val got = SparkEntry.queries("q194_bpe_fertility")(spark, dir)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got === want && got.nonEmpty)
    // the audit's point: fertility is a small-integer permille ≥ 1000
    // (a word is at least one subword)
    assert(got.values.forall(_._3 >= 1000L))
  }

  test("q175 encode == per-word reference segmentation applied to every doc") {
    val docs = Tables.load(spark, dir, "documents")
    val docWords = docs
      .select(col("doc_id"), split(trim(col("text")), " ").as("ws"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).filter(_.nonEmpty).toSeq)
    val seg = refSegment(docWords.flatMap(_._2).toSeq, TextOps.BpeRounds)
    val want = docWords.map { case (id, ws) =>
      val covered = ws.filter(seg.contains)
      (id, covered.size.toLong, covered.map(seg).sum)
    }.filter(_._2 > 0).sortBy(_._1).toSeq
    val got = TextOps.bpeEncode(docs).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === want && got.nonEmpty)
    // the learned vocab genuinely compresses: fewer subword tokens than chars
    val chars = docWords.flatMap(_._2).map(_.length.toLong).sum
    assert(got.map(_._3).sum < chars)
  }
}
