package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** Lloyd refinement of the IVF fine centroids: refine = 0 must be the
  * exact legacy index (the catalog queries' plans are unchanged), and on
  * clustered data refinement must not hurt single-probe recall@5. */
class VectorsRefineSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  /** 8 well-separated clusters in 16 dims: cluster centers are scaled
    * one-hot-ish axes, members are deterministic xxhash jitters around
    * them — stride seeding (every step-th vec_id) lands poorly because
    * cluster membership alternates with vec_id. */
  private def clustered(n: Int): DataFrame = {
    spark.range(n).selectExpr(
      "id AS vec_id",
      "CAST(id % 8 AS INT) AS g",
      s"""transform(sequence(0, 15), i ->
         |  CASE WHEN i = CAST(id % 8 AS INT) * 2 THEN 10.0 ELSE 0.0 END
         |  + (pmod(xxhash64(id, i), 1000) / 500.0 - 1.0)) AS e""".stripMargin)
      .select(col("vec_id"), col("e"))
  }

  /** Mean single-probe recall@5 vs brute force over the first `nq`
    * vectors as queries. */
  private def recall5(emb: DataFrame, refine: Int, nq: Int): Double = {
    val (assigned, _, _) = Vectors.ivfIndex(emb, refine)
    val a = assigned.localCheckpoint(true)
    val truth = (0L until nq).map { q =>
      val qn = emb.filter(col("vec_id") === q).select(col("en").as("qn"))
      q -> emb.filter(col("vec_id") =!= q).crossJoin(broadcast(qn))
        .select(col("vec_id"), Vectors.dot(col("en"), col("qn")).as("sim"))
        .orderBy(col("sim").desc, col("vec_id")).limit(5)
        .collect().map(_.getLong(0)).toSet
    }.toMap
    val hits = (0L until nq).map { q =>
      val qrow = a.filter(col("vec_id") === q)
        .select(col("cid").as("qcid"), col("en").as("qn"))
      val got = a.join(broadcast(qrow), col("cid") === col("qcid"))
        .filter(col("vec_id") =!= q)
        .select(col("vec_id"), Vectors.dot(col("en"), col("qn")).as("sim"))
        .orderBy(col("sim").desc, col("vec_id")).limit(5)
        .collect().map(_.getLong(0)).toSet
      (got intersect truth(q)).size / 5.0
    }
    hits.sum / nq
  }

  test("refine=0 index is identical to the legacy construction") {
    val emb = Vectors.withNormalized(
        graft.Tables.embeddings(spark, "/root/testdata/sf0.001"))
      .select(col("vec_id"), col("en"))
    val (a0, _, _) = Vectors.ivfIndex(emb)
    val (aDefault, _) = Vectors.ivfAssigned(emb)
    assert(a0.select("vec_id", "cid").collect().toSet ===
      aDefault.select("vec_id", "cid").collect().toSet)
  }

  test("recall@5 is non-decreasing with refine=1 on clustered data") {
    val emb = Vectors.withNormalized(clustered(400).withColumnRenamed("e", "e0")
        .select(col("vec_id"), col("e0").cast("array<double>").as("e")))
      .select(col("vec_id"), col("en")).localCheckpoint(true)
    val r0 = recall5(emb, refine = 0, nq = 16)
    val r1 = recall5(emb, refine = 1, nq = 16)
    info(f"recall@5: refine=0 $r0%.3f, refine=1 $r1%.3f")
    assert(r1 >= r0)
  }
}
