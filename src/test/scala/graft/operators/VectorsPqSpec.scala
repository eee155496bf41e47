package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.{SharedSpark, SparkEntry}

/** q88's PQ-ADC is approximate BY DESIGN (unlike q83's near-lossless SQ8):
  * the oracle pins its determinism, this pins its usefulness — the re-rank
  * depth (PqRerank exact dots per query, corpus-size-independent) must
  * recover >= 4 of the exact top-5 on the fixtures. Random uniform vectors
  * are PQ's distortion worst case (no cluster structure for the codebooks
  * to exploit), so this bound is conservative for real embeddings; at the
  * bench scale (sf0.1, 2000 vecs) measured recall@5 is 1.0. */
class VectorsPqSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  private def recall5(sf: String): Int = {
    val pq = SparkEntry.queries("q88_pq_ann")(spark, sf)
      .collect().map(_.getLong(0)).toSet
    val ex = SparkEntry.queries("q25_knn_bruteforce")(spark, sf)
      .collect().map(_.getLong(0)).take(5).toSet
    (pq intersect ex).size
  }

  test("PQ-ADC recall@5 >= 0.8 vs exact brute force (sf0.001)") {
    assert(recall5("/root/testdata/sf0.001") >= 4)
  }

  test("PQ-ADC recall@5 >= 0.8 vs exact brute force (sf0.01)") {
    assert(recall5("/root/testdata/sf0.01") >= 4)
  }
}
