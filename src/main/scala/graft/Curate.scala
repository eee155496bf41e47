package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, TextOps}

/** End-to-end corpus curation as a CLI — the training-data twin of the
  * `graft.cve.Main` workflow tool. Chains the verified operator shapes
  * (q21 exact dedup, q22/q47/q58 near-dup keep-set, q61 redaction, q60
  * bounded-histogram quality cut, q51 √N-blocked packing) over any
  * `documents.parquet` corpus and lands a curated+packed parquet plus one
  * JSON stats line (also written to `<outDir>/stats.json`):
  *
  *   sbt "runMain graft.Curate <docsDir> <outDir> [tokenBudget]"
  *
  * Every stage is the library operator, not a reimplementation, so the
  * scale posture is exactly what the per-operator specs pin: one hash
  * window for exact dedup, bounded-bucket LSH pairs + pointer-jumping CC
  * for near-dups, codegen'd projections for redaction, groups×4096
  * histogram state for the cut, and a √N-bounded prefix sum for packing.
  */
object Curate {

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: Curate <docsDir> <outDir> [tokenBudget]")
    val budget = if (args.length > 2) args(2).toLong else 2048L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val spark = Sessions.builder(s"local[$cpus]", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    println(run(spark, args(0), args(1), budget))
    spark.stop()
  }

  /** Runs the pipeline; returns the JSON stats line. */
  def run(spark: SparkSession, docsDir: String, outDir: String,
      budget: Long): String = {
    val docs = spark.read.parquet(s"$docsDir/documents.parquet")
    val nIn = docs.count()

    // 1. Exact dedup: canonical word-multiset hash, min-id keeper (q21).
    val exact = docs
      .withColumn("h",
        md5(concat_ws(" ", sort_array(split(trim(col("text")), " ")))))
      .withColumn("keeper", min("doc_id").over(Window.partitionBy("h")))
      .filter(col("doc_id") === col("keeper"))
      .drop("h", "keeper")
      .localCheckpoint(true) // barrier: three downstream consumers
    val nExact = exact.count()

    // 2. Near-dup keep-set: inverted-index Jaccard pairs → connected
    //    components → keep the component label (its min doc_id) (q58).
    val edges = Dedup.jaccardPairs(exact).select("a", "b").persist()
    val comp = Dedup.connectedComponents(edges)
    edges.unpersist()
    val kept = exact
      .join(comp.select(col("v").as("doc_id"), col("lbl")), Seq("doc_id"), "left")
      .filter(col("lbl").isNull || col("lbl") === col("doc_id"))
      .drop("lbl")
    val nKept = kept.count()

    // 3. PII redaction: emails first (they contain digit runs), then digit
    //    runs — the q61 two-pass order, a pure codegen'd projection.
    val redacted = kept.withColumn("text",
      regexp_replace(
        regexp_replace(col("text"), TextOps.EmailRe, "<EMAIL>"),
        TextOps.NumRe, "<NUM>"))

    // 4. Quality cut at the per-language bounded-histogram median (q60).
    //    The scored frame fans out (threshold + filter join) — barrier it
    //    (the q54/q73 pattern).
    val scored = TextOps.qualityScored(redacted)
      .join(redacted.select(col("doc_id"),
        size(split(trim(col("text")), " ")).cast("long").as("tokens")), Seq("doc_id"))
      .localCheckpoint(true)
    val surv = scored
      .join(broadcast(TextOps.histMedianThr(scored.select("lang", "score"))), Seq("lang"))
      .filter(col("score") >= col("thr"))
      .select("doc_id", "tokens")

    // 5. Token-budget packing via the √N-blocked distributed prefix sum
    //    (q51) — pack_id = which budget-sized bin the doc starts in.
    val packed = TextOps.prefixSum(surv)
      .withColumn("pack_id", expr(s"(cum - tokens) div $budget"))
      .select("doc_id", "tokens", "pack_id")

    val out = redacted.join(packed, Seq("doc_id"))
    out.write.mode("overwrite").parquet(s"$outDir/curated.parquet")
    val written = spark.read.parquet(s"$outDir/curated.parquet")
    val nOut = written.count()
    val nPacks = written.agg(countDistinct("pack_id")).head().getLong(0)

    val json =
      s"""{"docs_in":$nIn,"after_exact_dedup":$nExact,"after_neardup":$nKept,"after_quality_cut":$nOut,"packs":$nPacks,"token_budget":$budget,"out":"$outDir/curated.parquet"}"""
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$outDir/stats.json"),
      (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    json
  }
}
