package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** The batched decode boundary must be batching-invariant: results depend
  * only on each record, never on how the partition iterator was chunked. */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("decodeFeatures equals a record-at-a-time map regardless of batch shape") {
    import spark.implicits._
    val media = Multimodal.toMedia(spark, dir)
    val batched = Multimodal.decodeFeatures(media)
      .collect().map(f => f.doc_id -> (f.width, f.height, f.features.toSeq)).toMap
    val single = media.collect().map(Multimodal.decodeStub)
      .map(f => f.doc_id -> (f.width, f.height, f.features.toSeq)).toMap
    assert(batched === single)
    // repartitioning (different batch boundaries) changes nothing
    val repart = Multimodal.decodeFeatures(media.repartition(7))
      .collect().map(f => f.doc_id -> (f.width, f.height, f.features.toSeq)).toMap
    assert(repart === single)
  }

  test("JVM phash signature is bit-equal to the batch phashGrid for every corpus doc") {
    // The streaming path derives the signature in-row via
    // phashSignatureJvm; any divergence from the declarative phashGrid
    // (word split, md5 fold, bin minima, nibble pick) would silently break
    // stream-vs-batch dedup parity. Pin equality doc-by-doc, plus the
    // under-ShingleN and empty-bin edges.
    val docs = graft.Tables.load(spark, dir, "documents")
    val want = Multimodal.phashGrid(docs)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = docs.select("doc_id", "text").collect().flatMap { r =>
      Multimodal.phashSignatureJvm(r.getString(1)).map(r.getLong(0) -> _)
    }.toMap
    assert(got.size === want.size)
    assert(got === want)
    assert(Multimodal.phashSignatureJvm("one two") === None,
      "under-ShingleN docs must produce no signature, like the batch filter")
    // A 3-word doc has exactly one patch -> exactly one populated bin.
    val one = Multimodal.phashSignatureJvm("one two three").get
    assert(one.count(_ == '-') === 15)
    assert(Multimodal.phashHammingJvm(one, one) === 0)
  }

  test("phashGrid is a pure narrow scan: zero exchanges before the barrier") {
    // The codegen'd graft_phashsig computes the signature in-row; the
    // explode → groupBy(doc_id) formulation it replaced paid a corpus-wide
    // hash shuffle for row-local arithmetic. Any exchange reappearing here
    // is a regression to that shape.
    graft.StaticPlans {
      val plan = Multimodal.phashGrid(graft.Tables.load(spark, dir, "documents"))
        .queryExecution.executedPlan
      val exchanges = plan.collectWithSubqueries {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      assert(exchanges.isEmpty, s"signature build shuffles:\n$plan")
    }
  }

  test("q141 pigeonhole: band-blocking recall is exactly 1.0 at Hamming <= 3") {
    // 4 bands of 4 pixels: a pair differing in <= 3 positions must agree
    // on at least one whole band — every such sampled truth pair MUST be
    // blocked. A recall < 1.0 on any such row is a blocking-logic bug,
    // not a tuning matter.
    val rows = graft.SparkEntry.queries("q141_phash_calibration")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.filter(_._1 <= 3).foreach { case (h, n, b, rec) =>
      assert(b === n && rec === 1.0, s"pigeonhole violated at hamming=$h: $b/$n")
    }
    // And the tail exists: some sampled pair mass sits above the guarantee.
    assert(rows.exists(_._1 > 3), "sample produced no >3-hamming pairs — vacuous")
  }
}
