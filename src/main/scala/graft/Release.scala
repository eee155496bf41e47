package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Audit

/** Dataset-release bundle CLI — the artifacts a corpus PUBLISHER ships
  * beside the data, assembled from the catalog's oracle-graded release
  * operators in one pass:
  *
  *   sbt "runMain graft.Release bundle <docsDir> <outDir> [--dp-salt <s>]"
  *
  * writes, under `<outDir>`:
  *   - `datasheet/`      q121 per-source dataset card (docs, tokens,
  *                       dup fraction, mean quality, language mix)
  *   - `kanon/`          q185 k-anonymity audit of the (lang × length
  *                       bucket) quasi-identifier grid — PUBLICATION
  *                       form: exact counts of exposed (< k) cells are
  *                       suppressed to −1 (ADVICE r15: a sub-k cell's
  *                       exact count is precisely what k-anonymity says
  *                       must not ship; the flag itself is what a
  *                       datasheet reader needs)
  *   - `generalize/`     q187 generalization ladder (the coarsening
  *                       decision table)
  *   - `release_counts/` differentially-private released histogram
  *                       (q191's geometric mechanism) — PUBLICATION
  *                       form: noised with a RUN-SECRET salt (generated
  *                       per bundle, or `--dp-salt`; q191's committed
  *                       `DpSalt` would let any reader denoise), and
  *                       projected to (lang, len_bucket, released) only —
  *                       the exact n_docs and the noise column never ship
  *   - `heavy_hitters/`  q159 exact heavy-hitter vocabulary (sketch +
  *                       exact recount)
  *   - `roots/`          q181 per-source Merkle roots — the integrity
  *                       commitment a consumer verifies against
  *   - `pii/`            q163 per-source PII density audit
  *   - `len_quantiles/`  q180 per-source length quantiles (from the
  *                       persisted histogram ledger)
  *   - `shards/`         q156 dataloader shard manifest + mixture parity
  *   - `calibration/`    q154 quality-score reliability bins
  *   - `fertility/`      q194 tokenizer fertility by language (the BPE
  *                       equity number a multilingual consumer reads
  *                       before budgeting context windows)
  *   - `zipf/`           q198 rank–frequency audit (the distribution-
  *                       shape sanity table)
  *   - `kn_lm/`          q195 Kneser–Ney bigram LM table (the n-gram
  *                       model artifact consumers run perplexity/quality
  *                       filters with — vocab²-bounded)
  *
  * and prints ONE JSON summary line (docs, sources, exposure, the
  * smallest anonymous rung, root count, the dp salt — printed exactly
  * once so the publisher can retain the secret; it appears nowhere in
  * the written artifacts). Every UNPROJECTED frame is the EXACT
  * DataFrame the harness grades against DuckDB (`SparkEntry.queries`),
  * so the bundle inherits the catalog's correctness gate; the two
  * privacy projections keep their graded twins' cell grid and
  * suppression set bit-identical (ReleaseCliSpec pins both). Each
  * artifact is catalog-sized regardless of corpus size (the operators'
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

  /** The (artifact dir → catalog query) manifest for the artifacts that
    * ship EXACTLY as their graded frames (the privacy pair — kanon,
    * release_counts — ships projected; see `run`). */
  val Parts: Seq[(String, String)] = Seq(
    "datasheet" -> "q121_dataset_card",
    "generalize" -> "q187_kanon_generalize",
    "heavy_hitters" -> "q159_heavy_hitters",
    "roots" -> "q181_merkle_roots",
    "pii" -> "q163_pii_audit",
    "len_quantiles" -> "q180_len_quantiles_from_store",
    "shards" -> "q156_shard_manifest",
    "calibration" -> "q154_score_calibration",
    "fertility" -> "q194_bpe_fertility",
    "zipf" -> "q198_zipf_audit",
    "kn_lm" -> "q195_kn_bigram")

  /** Runs one mode; returns the JSON summary line (testable seam). */
  def run(spark: SparkSession, args: List[String]): String = args match {
    case "bundle" :: docsDir :: outDir :: rest =>
      val salt = rest match {
        case Nil => java.util.UUID.randomUUID().toString
        case "--dp-salt" :: s :: Nil => s
        case other => sys.error(
          s"usage: graft.Release bundle <docsDir> <outDir> [--dp-salt <s>] (got $other)")
      }
      // the salt interpolates into SQL text and the JSON summary — keep
      // it to a charset that is inert in both (UUIDs always pass)
      require(salt.matches("[A-Za-z0-9._:-]+"),
        s"--dp-salt must match [A-Za-z0-9._:-]+ (got: $salt)")
      def save(df: org.apache.spark.sql.DataFrame, sub: String): Unit =
        df.coalesce(1) // catalog-sized frames — one file per artifact
          .write.mode("overwrite").parquet(s"$outDir/$sub")
      Parts.foreach { case (sub, q) =>
        save(SparkEntry.queries(q)(spark, docsDir), sub)
      }
      // kanon, publication form: the grid and the exposed flags are
      // q185's exactly; an exposed cell's count is suppressed — its
      // exact smallness is the re-identification vector (ADVICE r15).
      save(SparkEntry.queries("q185_kanon_audit")(spark, docsDir)
        .select(col("lang"), col("len_bucket"),
          when(col("exposed") === 1L, lit(-1L)).otherwise(col("n_docs"))
            .as("n_docs"),
          when(col("exposed") === 1L, lit(-1L)).otherwise(col("n_sources"))
            .as("n_sources"),
          col("exposed")), "kanon")
      // release_counts, publication form: q191's mechanism keyed by the
      // run secret, released column only (n_docs/noise would invert the
      // mechanism exactly).
      save(Audit.dpRelease(Tables.load(spark, docsDir, "documents"), salt)
        .select("lang", "len_bucket", "released"), "release_counts")

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
      val docs = card.agg(sum("n_docs")).head().getLong(0)
      val sources = card.select("source").distinct().count()
      val hh = spark.read.parquet(s"$outDir/heavy_hitters").count()
      s"""{"mode":"bundle","docs":$docs,"sources":$sources,""" +
        s""""exposed_cells":$exposedCells,"anonymous_bin_w":$anonW,""" +
        s""""heavy_hitters":$hh,"merkle_roots":$roots,""" +
        s""""dp_salt":"$salt","out":"$outDir"}"""

    case other => sys.error(
      s"usage: graft.Release bundle <docsDir> <outDir> [--dp-salt <s>] (got $other)")
  }
}
