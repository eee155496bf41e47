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

  test("sub-band refinement is exact: any fan-in cap yields the same pair set") {
    // The r11 hot-bucket re-block (subBandRows) must be a COST lever, not
    // a recall knob: a pair at Hamming <= 3 sharing a band agrees exactly
    // on >= 1 complement sub-band (pigeonhole), so forcing EVERY bucket
    // through the refinement (cap = 0) and forcing NONE (cap = MaxValue,
    // the pre-r11 shape) must produce identical verified pairs.
    import org.apache.spark.sql.functions.col
    val bx = Multimodal.phashBandRows(
      Multimodal.phashGrid(graft.Tables.load(spark, dir, "documents"))
        .localCheckpoint(true))
    def pairSet(cap: Int) = Multimodal.phashCandidates(bx, cap)
      .select(col("a"), col("b"),
        Multimodal.phashHamming("pa", "pb").as("hamming"))
      .filter(col("hamming") <= Multimodal.PhashHamTau)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val refined = pairSet(0)
    val plain = pairSet(Int.MaxValue)
    assert(refined.nonEmpty, "no pairs at this sf — vacuous")
    assert(refined === plain)
  }

  test("q144 media consolidation matches a driver-side union-find over q136 pairs") {
    // The oracle grades q144 end-to-end; this pins the component labels
    // against an independent in-JVM union-find, so a CC regression is
    // caught at unit speed without DuckDB.
    val edges = graft.SparkEntry.queries("q136_phash_neardup")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(edges.nonEmpty)
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val want = edges.flatMap(e => Seq(e._1, e._2)).distinct
      .groupBy(find).map { case (_, vs) => vs.min -> vs.length }
    val got = graft.SparkEntry.queries("q144_phash_consolidate")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1).toInt).toMap
    assert(got === want)
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
