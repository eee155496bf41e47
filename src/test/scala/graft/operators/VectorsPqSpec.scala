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

  test("Lloyd codebook refinement: reconstruction MSE non-increasing per round") {
    import org.apache.spark.sql.functions._
    // 8 well-separated clusters in 16 dims (the VectorsRefineSpec shape):
    // stride seeds land poorly because cluster membership alternates with
    // vec_id, so Lloyd has real distance to close. The pinned property is
    // Lloyd's own monotone objective — per-round mean ||x − decode(code(x))||²
    // must not increase — which holds on ANY data, not just a lucky fixture.
    val emb = Vectors.withNormalized(
      spark.range(512).selectExpr(
        "id AS vec_id",
        s"""transform(sequence(0, 15), i ->
           |  CASE WHEN i = CAST(id % 8 AS INT) * 2 THEN 1.0e1 ELSE 0e0 END
           |  + (pmod(xxhash64(id, i), 1000) / 5.0e2 - 1.0e0)) AS e""".stripMargin))
      .select(col("vec_id"), col("en"))
    def mse(refine: Int): Double = {
      val cb = Vectors.pqCodebook(emb, refine)
      val rx = Vectors.pqDecode(Vectors.pqAssign(emb, cb), cb)
      emb.join(rx, Seq("vec_id"))
        .select(expr(
          "aggregate(zip_with(en, rx, (a, b) -> (a - b) * (a - b)), 0d, (s, v) -> s + v)")
          .as("e2"))
        .agg(avg("e2")).collect()(0).getDouble(0)
    }
    val m0 = mse(0); val m1 = mse(1); val m2 = mse(2)
    assert(m1 <= m0 + 1e-12, s"round 1 increased MSE: $m0 -> $m1")
    assert(m2 <= m1 + 1e-12, s"round 2 increased MSE: $m1 -> $m2")
    // On this clustered fixture refinement should actually bite, not tie.
    assert(m1 < m0 * 0.9, s"refinement did not improve: $m0 -> $m1")
  }

  test("fusion from the ANN store at probe-all + deep rerank == q161 bit-for-bit (VERDICT r13 #4)") {
    import org.apache.spark.sql.functions._
    // The exact limit of the ADC approximation: with every cell probed
    // AND the re-rank covering the whole corpus, denseRankedFrom's final
    // scores are the same floor(1e9·cos) bigints as denseRanked's, so
    // the fused ranking must equal q161 on every cell. (q173's GRADED
    // form runs the production depth against the ADC oracle twin — this
    // pin is the convergence argument that makes that depth a recall
    // knob rather than a semantic change.)
    val sf = "/root/testdata/sf0.001"
    val emb = Vectors.withNormalized(graft.Tables.embeddings(spark, sf))
      .select(col("vec_id"), col("en"))
    val scratch = graft.Scratch.dir("pqspec-fuse")
    IndexStore.saveIvfPqIndex(emb, scratch)
    val got = Vectors.rrfFused(TextOps.sparseRanked(spark, sf),
        IndexStore.denseRankedFrom(emb, scratch, probeCoarse = 1000000,
          rerank = 1000000))
      .orderBy("qid", "frk").collect().map(_.toSeq.toList).toList
    val want = SparkEntry.queries("q161_rrf_fusion")(spark, sf)
      .collect().map(_.toSeq.toList).toList
    assert(got === want && got.nonEmpty)
  }

  test("denseRankedFrom at small probeCoarse: bounded output, candidates only from probed cells") {
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val emb = Vectors.withNormalized(graft.Tables.embeddings(spark, sf))
      .select(col("vec_id"), col("en"))
    val scratch = graft.Scratch.dir("pqspec-probe")
    IndexStore.saveIvfPqIndex(emb, scratch)
    val dn = IndexStore.denseRankedFrom(emb, scratch, probeCoarse = 1)
    val rows = dn.collect()
    // Still ≤ RetrK per query, ranks contiguous from 1.
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.nonEmpty)
    byQ.foreach { case (q, rs) =>
      val rks = rs.map(_.getLong(1)).sorted.toList
      assert(rks === (1L to rks.size).toList, s"qid $q ranks: $rks")
      assert(rks.size <= TextOps.RetrK)
    }
    // Every hit's vector lives in SOME probed cell: with probeCoarse = 1
    // each query reads exactly one ccid partition, so hits ⊆ that cell.
    val cells = spark.read.parquet(s"$scratch/ivfpq/codes")
      .select(col("vec_id"), col("ccid").cast("long").as("ccid"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val coarse = spark.read.parquet(s"$scratch/ivfpq/coarse")
    val qCell = emb.filter(col("vec_id") < TextOps.RetrQ)
      .crossJoin(broadcast(coarse))
      .select(col("vec_id"), expr(
        """array_min(transform(cc, c ->
          |  struct(-graft_dot(en, c.cn) AS d, c.ccid AS ccid))).ccid""".stripMargin).as("ccid"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      assert(cells(r.getLong(2)) === qCell(r.getLong(0)),
        s"qid ${r.getLong(0)} hit ${r.getLong(2)} outside its probed cell")
    }
  }
}
