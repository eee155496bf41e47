package graft

import org.apache.spark.sql.SparkSession

/** Dataset-release bundle CLI — the artifacts a corpus PUBLISHER ships
  * beside the data, assembled from the catalog's oracle-graded release
  * operators in one pass:
  *
  *   sbt "runMain graft.Release bundle <docsDir> <outDir>"
  *
  * writes, under `<outDir>`:
  *   - `datasheet/`      q121 per-source dataset card (docs, tokens,
  *                       dup fraction, mean quality, language mix)
  *   - `kanon/`          q185 k-anonymity audit of the (lang × length
  *                       bucket) quasi-identifier grid
  *   - `generalize/`     q187 generalization ladder (the coarsening
  *                       decision table)
  *   - `release_counts/` q191 differentially-private released histogram
  *                       (geometric mechanism, sub-k cells suppressed)
  *   - `heavy_hitters/`  q159 exact heavy-hitter vocabulary (sketch +
  *                       exact recount)
  *   - `roots/`          q181 per-source Merkle roots — the integrity
  *                       commitment a consumer verifies against
  *
  * and prints ONE JSON summary line (docs, sources, exposure, the
  * smallest anonymous rung, root count). Every frame is the EXACT
  * DataFrame the harness grades against DuckDB (`SparkEntry.queries`),
  * so the bundle inherits the catalog's correctness gate; each is
  * catalog-sized output regardless of corpus size (the operators'
  * documented 100 TB shapes), so the bundle costs a handful of corpus
  * scans and writes kilobytes.
  */
object Release {

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val spark = Sessions.builder(s"local[$cpus]", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    println(run(spark, args.toList))
    spark.stop()
  }

  /** The bundle's (artifact dir → catalog query) manifest. */
  val Parts: Seq[(String, String)] = Seq(
    "datasheet" -> "q121_dataset_card",
    "kanon" -> "q185_kanon_audit",
    "generalize" -> "q187_kanon_generalize",
    "release_counts" -> "q191_dp_release",
    "heavy_hitters" -> "q159_heavy_hitters",
    "roots" -> "q181_merkle_roots")

  /** Runs one mode; returns the JSON summary line (testable seam). */
  def run(spark: SparkSession, args: List[String]): String = args match {
    case "bundle" :: docsDir :: outDir :: Nil =>
      Parts.foreach { case (sub, q) =>
        SparkEntry.queries(q)(spark, docsDir)
          .coalesce(1) // catalog-sized frames — one file per artifact
          .write.mode("overwrite").parquet(s"$outDir/$sub")
      }
      val kanon = spark.read.parquet(s"$outDir/kanon")
      val exposedCells = kanon.filter(kanon("exposed") === 1L).count()
      val ladder = spark.read.parquet(s"$outDir/generalize")
        .orderBy("bin_w").collect()
      // the release decision: the narrowest bucket width at which no
      // cell is exposed (-1 = even the widest rung exposes — publish
      // the DP counts only)
      val anonW = ladder.find(_.getAs[Long]("anonymous") == 1L)
        .map(_.getAs[Long]("bin_w")).getOrElse(-1L)
      val roots = spark.read.parquet(s"$outDir/roots").count()
      val card = spark.read.parquet(s"$outDir/datasheet")
      val docs = card.agg(org.apache.spark.sql.functions.sum("n_docs"))
        .head().getLong(0)
      val sources = card.select("source").distinct().count()
      val hh = spark.read.parquet(s"$outDir/heavy_hitters").count()
      s"""{"mode":"bundle","docs":$docs,"sources":$sources,""" +
        s""""exposed_cells":$exposedCells,"anonymous_bin_w":$anonW,""" +
        s""""heavy_hitters":$hh,"merkle_roots":$roots,"out":"$outDir"}"""

    case other => sys.error(
      s"usage: graft.Release bundle <docsDir> <outDir> (got $other)")
  }
}
