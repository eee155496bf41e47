package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** Similarity search over the `embeddings` table (`Array[Float]` vectors):
  * brute-force cosine top-k as the exact baseline, label-blocked cosine
  * near-dup, and an IVF-style bucketed ANN as the scale path.
  *
  * Float math discipline: vectors are cast to array<double> once at load
  * (exact promotion), dot products are a sequential left fold
  * (`functions.aggregate`), so an oracle computing the same left fold in
  * doubles reproduces results bit-for-bit — no tolerance windows needed.
  *
  * Scale posture: brute-force kNN against ONE query is a broadcast of the
  * query row + a scan (top-k via TakeOrderedAndProject — no full sort).
  * All-pairs near-dup is blocked (by label here; by LSH bucket in Dedup) so
  * the join never goes quadratic in the corpus. IVF probes one centroid
  * bucket: centroid assignment is a broadcast join of a tiny centroid table
  * against the scan, and the probe touches 1/k of the data.
  */
object Vectors {

  /** Sequential-fold dot product: ((0 + a0*b0) + a1*b1) + ... */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** DuckDB twin of `dot` (same left fold ⇒ same doubles). */
  private def dotSql(a: String, b: String): String =
    s"list_reduce([$a[i] * $b[i] for i in range(1, len($a) + 1)], (x, y) -> x + y)"

  private def cosineSql(a: String, b: String): String =
    s"(${dotSql(a, b)} / (sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)})))"

  /** Cosine near-dup report threshold for q33. */
  val NearDupTau = 0.45

  val defs: Seq[QueryDef] = Seq(

    // ── Brute-force cosine top-k (exact ANN baseline) ──
    QueryDef(
      "q25_knn_bruteforce",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        val q = emb.filter(col("vec_id") === 0).select(col("e").as("qe"))
        emb.filter(col("vec_id") =!= 0)
          .crossJoin(broadcast(q))
          .select(col("vec_id"), cosine(col("e"), col("qe")).as("sim"))
          .orderBy(col("sim").desc, col("vec_id"))
          .limit(10)
      },
      Some(s"""WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings WHERE vec_id = 0),
              |     v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings WHERE vec_id <> 0)
              |SELECT vec_id, ${cosineSql("e", "qe")} AS sim
              |FROM v, q ORDER BY sim DESC, vec_id LIMIT 10""".stripMargin)),

    // ── Embedding-cosine near-dup, blocked by label ──
    QueryDef(
      "q33_cosine_neardup",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir)
        val a = emb.select(col("vec_id").as("a"), col("e").as("ea"), col("label"))
        val b = emb.select(col("vec_id").as("b"), col("e").as("eb"), col("label"))
        a.join(b, Seq("label"))
          .filter(col("a") < col("b"))
          .withColumn("sim", cosine(col("ea"), col("eb")))
          .filter(col("sim") >= NearDupTau)
          .select("a", "b", "sim")
          .orderBy("a", "b")
      },
      Some(s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e, label FROM embeddings)
              |SELECT x.vec_id AS a, y.vec_id AS b, ${cosineSql("x.e", "y.e")} AS sim
              |FROM v x JOIN v y ON x.label = y.label AND x.vec_id < y.vec_id
              |WHERE ${cosineSql("x.e", "y.e")} >= $NearDupTau
              |ORDER BY a, b""".stripMargin)),

    // ── IVF-style ANN: assign to nearest centroid, probe one bucket ──
    QueryDef(
      "q34_ivf_ann",
      (s, dir) => {
        val emb = Tables.embeddings(s, dir).select(col("vec_id"), col("e"))
        // Deterministic seed centroids: the first 8 vectors by id.
        val cents = emb.filter(col("vec_id") < 8)
          .select(col("vec_id").as("cid"), col("e").as("ce"))
        val byVec = Window.partitionBy(col("vec_id")).orderBy(col("csim").desc, col("cid"))
        val assigned = emb.crossJoin(broadcast(cents))
          .withColumn("csim", cosine(col("e"), col("ce")))
          .withColumn("rk", row_number().over(byVec))
          .filter(col("rk") === 1)
          .select(col("vec_id"), col("e"), col("cid"))
        val qrow = assigned.filter(col("vec_id") === 0)
          .select(col("cid").as("qcid"), col("e").as("qe"))
        assigned.join(broadcast(qrow), col("cid") === col("qcid"))
          .filter(col("vec_id") =!= 0)
          .select(col("vec_id"), cosine(col("e"), col("qe")).as("sim"))
          .orderBy(col("sim").desc, col("vec_id"))
          .limit(5)
      },
      Some(s"""WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
              |c AS (SELECT vec_id AS cid, e AS ce FROM v WHERE vec_id < 8),
              |sims AS (SELECT v.vec_id, v.e, c.cid, ${cosineSql("v.e", "c.ce")} AS csim FROM v, c),
              |assigned AS (
              |  SELECT vec_id, e, cid FROM (
              |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cid) AS rk
              |    FROM sims) WHERE rk = 1),
              |q AS (SELECT cid AS qcid, e AS qe FROM assigned WHERE vec_id = 0)
              |SELECT a.vec_id, ${cosineSql("a.e", "q.qe")} AS sim
              |FROM assigned a, q WHERE a.cid = q.qcid AND a.vec_id <> 0
              |ORDER BY sim DESC, vec_id LIMIT 5""".stripMargin))
  )
}
