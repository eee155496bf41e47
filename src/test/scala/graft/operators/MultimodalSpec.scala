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
}
