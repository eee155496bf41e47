package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
  * Perf: every vector is L2-normalized ONCE (one extra fold per vector),
  * after which cosine = a single dot fold per pair instead of three —
  * the pair side is where 100 TB work concentrates, so per-pair flops are
  * what matters. The fold runs interpreted (higher-order functions are not
  * codegen'd); a custom Catalyst Expression with doGenCode is the next rung
  * if the fold ever dominates a profile.
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

  /** Adds `en` = e / ||e||2 (per-element division, fold-order norm). */
  def withNormalized(df: DataFrame): DataFrame =
    df.withColumn("nrm", sqrt(dot(col("e"), col("e"))))
      .withColumn("en", transform(col("e"), x => x / col("nrm")))
      .drop("nrm")

  /** DuckDB twin of `dot` (same left fold ⇒ same doubles). */
  private def dotSql(a: String, b: String): String =
    s"list_reduce([$a[i] * $b[i] for i in range(1, len($a) + 1)], (x, y) -> x + y)"

  /** DuckDB twin of `withNormalized`: vn(vec_id, label, en). */
  private val normCte =
    s"""vn AS (
       |  SELECT vec_id, label, [x / nrm for x in e] AS en
       |  FROM (SELECT vec_id, label, e, sqrt(${dotSql("e", "e")}) AS nrm
       |        FROM (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings)))""".stripMargin

  /** Cosine near-dup report threshold for q33. */
  val NearDupTau = 0.45

  val defs: Seq[QueryDef] = Seq(

    // ── Brute-force cosine top-k (exact ANN baseline) ──
    QueryDef(
      "q25_knn_bruteforce",
      (s, dir) => {
        val emb = withNormalized(Tables.embeddings(s, dir))
        val q = emb.filter(col("vec_id") === 0).select(col("en").as("qn"))
        emb.filter(col("vec_id") =!= 0)
          .crossJoin(broadcast(q))
          .select(col("vec_id"), dot(col("en"), col("qn")).as("sim"))
          .orderBy(col("sim").desc, col("vec_id"))
          .limit(10)
      },
      Some(s"""WITH $normCte,
              |q AS (SELECT en AS qn FROM vn WHERE vec_id = 0)
              |SELECT vec_id, ${dotSql("en", "qn")} AS sim
              |FROM vn, q WHERE vec_id <> 0
              |ORDER BY sim DESC, vec_id LIMIT 10""".stripMargin)),

    // ── Embedding-cosine near-dup, blocked by label ──
    QueryDef(
      "q33_cosine_neardup",
      (s, dir) => {
        val emb = withNormalized(Tables.embeddings(s, dir))
        val a = emb.select(col("vec_id").as("a"), col("en").as("na"), col("label"))
        val b = emb.select(col("vec_id").as("b"), col("en").as("nb"), col("label"))
        a.join(b, Seq("label"))
          .filter(col("a") < col("b"))
          .withColumn("sim", dot(col("na"), col("nb")))
          .filter(col("sim") >= NearDupTau)
          .select("a", "b", "sim")
          .orderBy("a", "b")
      },
      Some(s"""WITH $normCte
              |SELECT a, b, sim FROM (
              |  SELECT x.vec_id AS a, y.vec_id AS b, ${dotSql("x.en", "y.en")} AS sim
              |  FROM vn x JOIN vn y ON x.label = y.label AND x.vec_id < y.vec_id)
              |WHERE sim >= $NearDupTau
              |ORDER BY a, b""".stripMargin)),

    // ── IVF-style ANN: assign to nearest centroid, probe one bucket ──
    QueryDef(
      "q34_ivf_ann",
      (s, dir) => {
        val emb = withNormalized(Tables.embeddings(s, dir)).select(col("vec_id"), col("en"))
        // Deterministic seed centroids: the first 8 vectors by id.
        val cents = emb.filter(col("vec_id") < 8)
          .select(col("vec_id").as("cid"), col("en").as("cn"))
        val byVec = Window.partitionBy(col("vec_id")).orderBy(col("csim").desc, col("cid"))
        val assigned = emb.crossJoin(broadcast(cents))
          .withColumn("csim", dot(col("en"), col("cn")))
          .withColumn("rk", row_number().over(byVec))
          .filter(col("rk") === 1)
          .select(col("vec_id"), col("en"), col("cid"))
        val qrow = assigned.filter(col("vec_id") === 0)
          .select(col("cid").as("qcid"), col("en").as("qn"))
        assigned.join(broadcast(qrow), col("cid") === col("qcid"))
          .filter(col("vec_id") =!= 0)
          .select(col("vec_id"), dot(col("en"), col("qn")).as("sim"))
          .orderBy(col("sim").desc, col("vec_id"))
          .limit(5)
      },
      Some(s"""WITH $normCte,
              |c AS (SELECT vec_id AS cid, en AS cn FROM vn WHERE vec_id < 8),
              |sims AS (SELECT vn.vec_id, vn.en, c.cid, ${dotSql("vn.en", "c.cn")} AS csim FROM vn, c),
              |assigned AS (
              |  SELECT vec_id, en, cid FROM (
              |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cid) AS rk
              |    FROM sims) WHERE rk = 1),
              |q AS (SELECT cid AS qcid, en AS qn FROM assigned WHERE vec_id = 0)
              |SELECT a.vec_id, ${dotSql("a.en", "q.qn")} AS sim
              |FROM assigned a, q WHERE a.cid = q.qcid AND a.vec_id <> 0
              |ORDER BY sim DESC, vec_id LIMIT 5""".stripMargin))
  )
}
