package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.{SharedSpark, SparkEntry, Tables}

/** q148 cross-document exact-substring strip semantics + the q149
  * cluster-split leakage-free-by-construction guarantee. */
class CrossdocSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  private val span = (1 to 10).map(i => s"s$i").mkString(" ") // 10-word shared run

  test("crossdocStrip removes the later copy of a shared span, keeps the first intact") {
    import spark.implicits._
    val docs = Seq(
      (1L, s"alpha beta $span gamma delta epsilon zeta eta theta"),
      (2L, s"completely different prose here $span and more unrelated words follow now"),
      (3L, "short doc under eight words"),
      (4L, "pears apples plums cherries mangos kiwis grapes lemons limes oranges"))
      .toDF("doc_id", "text")
    val got = Dedup.crossdocStrip(docs).orderBy("doc_id").collect()
    val byId = got.map(r => r.getLong(0) -> (Option(r.getString(1)), r.getLong(2))).toMap
    // doc 1 is the earliest holder of every shared gram: untouched.
    assert(byId(1L) === (Some(s"alpha beta $span gamma delta epsilon zeta eta theta"), 0L))
    // doc 2 loses exactly the 10 span words (every position covered by a
    // duplicated 8-gram), keeps its own prose on both sides.
    assert(byId(2L)._1.get ===
      "completely different prose here and more unrelated words follow now")
    assert(byId(2L)._2 === 10L)
    // under-8-word and unrelated docs pass through with nothing removed.
    assert(byId(3L) === (Some("short doc under eight words"), 0L))
    assert(byId(4L)._2 === 0L)
  }

  test("a verbatim later copy strips to NULL; within-doc repeats of first-occurrence text survive") {
    import spark.implicits._
    val ownSpan = (1 to 10).map(i => s"t$i").mkString(" ")
    val original = s"intro words here $span closing words trail out"
    val docs = Seq(
      // doc 5 repeats ITS OWN span twice — cross-doc strip must not touch
      // it (q103's business), because doc 5 is the earliest holder.
      (5L, s"$ownSpan middle filler words $ownSpan"),
      (9L, original),
      (10L, original)) // exact later copy -> fully covered
      .toDF("doc_id", "text")
    val got = Dedup.crossdocStrip(docs).orderBy("doc_id").collect()
    val byId = got.map(r => r.getLong(0) -> (Option(r.getString(1)), r.getLong(2))).toMap
    assert(byId(5L)._2 === 0L)
    assert(byId(9L) === (Some(original), 0L))
    // doc 10: every position sits inside some 8-gram first seen in doc 9
    // (the span grams are first seen in doc 5, still earlier docs).
    assert(byId(10L)._1 === None)
    assert(byId(10L)._2 === original.split(" ").length.toLong)
  }

  test("q149 cluster split is leakage-free by construction: every verified near-dup pair lands in one split") {
    val dir = "/root/testdata/sf0.001"
    val split = SparkEntry.queries("q149_cluster_split")(spark, dir)
      .select(col("doc_id"), col("split"))
    val pairs = Dedup.jaccardPairs(Tables.load(spark, dir, "documents"))
      .select("a", "b")
    val crossSplit = pairs
      .join(split.select(col("doc_id").as("a"), col("split").as("pa")), Seq("a"))
      .join(split.select(col("doc_id").as("b"), col("split").as("pb")), Seq("b"))
      .filter(col("pa") =!= col("pb"))
      .count()
    assert(crossSplit === 0L)
    // and the split is non-degenerate: all three splits occur.
    val splits = split.select("split").distinct().collect().map(_.getString(0)).toSet
    assert(splits === Set("train", "val", "test"))
  }

  test("q150 budget cut: kept tokens fit the allocation and the next bucket would exceed it") {
    val dir = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("q150_budget_cut")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val alloc = r.getDouble(r.fieldIndex("alloc_tokens"))
      val cutB = r.getLong(r.fieldIndex("cut_b"))
      val keptT = r.getLong(r.fieldIndex("kept_tokens"))
      val keptD = r.getLong(r.fieldIndex("kept_docs"))
      val total = r.getLong(r.fieldIndex("t"))
      assert(keptT <= alloc, s"${r.getString(0)}: kept $keptT > alloc $alloc")
      assert(keptT <= total && keptD >= 0L && cutB >= 0L && cutB <= 4096L)
      // greedy maximality: unless everything fit (cut_b = 0 kept the whole
      // histogram), adding the next non-empty bucket below the cut must
      // blow the budget — pinned against the raw per-bucket sums.
      if (cutB > 0L && keptT < total) {
        val src = r.getString(r.fieldIndex("source"))
        val hist = graft.operators.TextOps.budgetHistogram(
            Tables.load(spark, dir, "documents"))
          .filter(col("source") === src && col("b") < cutB)
          .orderBy(col("b").desc)
          .select("tk").limit(1).collect()
        if (hist.nonEmpty)
          assert(keptT + hist.head.getLong(0) > alloc,
            s"$src: cut not maximal (next bucket still fits)")
      }
    }
  }
}
