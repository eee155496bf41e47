package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, TextOps}

/** End-to-end corpus curation as a CLI — the training-data twin of the
  * `graft.cve.Main` workflow tool. Chains the verified operator shapes
  * (q21 exact dedup, q85 boilerplate strip, q103 within-doc self-rep strip,
  * q22/q47/q58 near-dup keep-set, q62 decontamination, q61 redaction,
  * q60 bounded-histogram quality cut,
  * q51 √N-blocked packing) over any `documents.parquet` corpus and lands a
  * curated+packed parquet plus one JSON stats line (also written to
  * `<outDir>/stats.json`):
  *
  *   sbt "runMain graft.Curate <docsDir> <outDir> [tokenBudget]
  *        [--extract-main] [--strip-boilerplate] [--bp-df N] [--strip-selfrep]
  *        [--bench <parquet>] [--contam-k N] [--tau X]"
  *
  * The optional transform stages are pipeline stages, all OFF by default
  * (the 5-stage default chain is unchanged — stress history stays
  * comparable):
  *   --extract-main        q193: treat each doc's text as a fetched page —
  *                         strip script/style, split on tags, keep only
  *                         blocks passing the length-density gate — as
  *                         stage 0, BEFORE everything (dedup hashes and
  *                         shingle sets must see prose, not tag chrome).
  *                         Pages whose main content extracts empty drop.
  *   --strip-boilerplate   q85: remove cross-document-frequent 8-gram
  *                         spans (df ≥ --bp-df, default 3) after exact
  *                         dedup, BEFORE near-dup/quality — so template
  *                         chrome neither glues unrelated docs into one
  *                         near-dup component nor inflates quality scores.
  *   --strip-selfrep       q103: the within-doc twin of the boilerplate
  *                         strip — remove every LATER occurrence of a
  *                         5-gram already seen earlier in the SAME doc,
  *                         after the cross-doc strip and BEFORE near-dup/
  *                         quality, so self-repetition loops neither
  *                         inflate shingle sets nor token counts. Zero
  *                         cross-document state: every stage doc-keyed.
  *   --strip-crossdoc      q148: span-granular cross-doc dedup AFTER the
  *                         near-dup keep-set — doc-granular dedup first,
  *                         exact-substring for the sub-threshold tail
  *                         (embedded quotes, forwarded blocks), the
  *                         published composition; the earliest surviving
  *                         copy keeps its span.
  *   --bench <parquet>     q62: drop docs sharing ≥ --contam-k (default 5)
  *                         distinct shingles with any doc of the held-out
  *                         eval set at <parquet> (a documents-shaped
  *                         table). The benchmark shingle set broadcasts;
  *                         the corpus side stays one narrow scan.
  *   --fuzzy-tau X         q114: ALSO drop docs containing ≥ X of any
  *                         single eval item's distinct shingle set — the
  *                         per-item containment decision, which catches
  *                         lightly-edited eval items whose pooled shared-
  *                         shingle count stays under --contam-k. Requires
  *                         --bench (the registry artifact keeps no per-item
  *                         sets). Same broadcast shapes as q114's pin.
  *   --registry <index>    q105: the same decontamination decision against
  *                         a PERSISTED registry artifact
  *                         (`graft.Index build-registry`) too big to
  *                         broadcast — bloom prefilter on the corpus side,
  *                         exact verify join after, so the dropped set is
  *                         identical to --bench on the registry's own
  *                         corpus (CurateSpec pins it). Mutually exclusive
  *                         with --bench.
  *   --lm-store <index>    q196's production form: score survivors against
  *                         the PERSISTED KN bigram LM (`Index build-lm` on
  *                         a frozen high-quality reference corpus — the
  *                         CCNet perplexity-filter arrangement) and drop
  *                         docs whose mean conditional predictability
  *                         reads below --lm-min permille (default 1 —
  *                         drop only fully-out-of-model text). Runs on
  *                         the pre-redaction surface, the same one the
  *                         reference LM saw; docs too short to form a
  *                         bigram never score and are kept (no evidence).
  *
  * Every stage is the library operator, not a reimplementation, so the
  * scale posture is exactly what the per-operator specs pin: one hash
  * window for exact dedup, broadcast boilerplate set + one keyed
  * re-assembly agg for the strip, bounded-bucket LSH pairs +
  * pointer-jumping CC for near-dups, broadcast benchmark shingles for
  * decontamination, codegen'd projections for redaction, groups×4096
  * histogram state for the cut, and a √N-bounded prefix sum for packing.
  */
object Curate {

  case class Config(
      docsDir: String,
      outDir: String,
      budget: Long = 2048L,
      extractMain: Boolean = false,
      stripBoilerplate: Boolean = false,
      boilerDf: Int = Dedup.BoilerDf,
      stripSelfrep: Boolean = false,
      stripCrossdoc: Boolean = false,
      benchPath: Option[String] = None,
      fuzzyTau: Option[Double] = None,
      registryPath: Option[String] = None,
      contamK: Int = Dedup.ContamK,
      tau: Double = Dedup.JaccardTau,
      lmStorePath: Option[String] = None,
      lmMin: Long = 1L)

  def main(args: Array[String]): Unit = {
    val cfg = parse(args.toList)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val spark = Sessions.builder(s"local[$cpus]", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    println(run(spark, cfg))
    spark.stop()
  }

  private def parse(args: List[String]): Config = {
    val usage = "usage: Curate <docsDir> <outDir> [tokenBudget] " +
      "[--extract-main] " +
      "[--strip-boilerplate] [--bp-df N] [--strip-selfrep] [--strip-crossdoc] " +
      "[--bench <parquet>] [--fuzzy-tau X] [--registry <index>] [--contam-k N] [--tau X] " +
      "[--lm-store <index>] [--lm-min P]"
    def loop(rest: List[String], cfg: Config): Config = rest match {
      case Nil => cfg
      case "--extract-main" :: t => loop(t, cfg.copy(extractMain = true))
      case "--strip-boilerplate" :: t => loop(t, cfg.copy(stripBoilerplate = true))
      case "--bp-df" :: v :: t => loop(t, cfg.copy(boilerDf = v.toInt))
      case "--strip-selfrep" :: t => loop(t, cfg.copy(stripSelfrep = true))
      case "--strip-crossdoc" :: t => loop(t, cfg.copy(stripCrossdoc = true))
      case "--bench" :: v :: t => loop(t, cfg.copy(benchPath = Some(v)))
      case "--fuzzy-tau" :: v :: t => loop(t, cfg.copy(fuzzyTau = Some(v.toDouble)))
      case "--registry" :: v :: t => loop(t, cfg.copy(registryPath = Some(v)))
      case "--contam-k" :: v :: t => loop(t, cfg.copy(contamK = v.toInt))
      case "--tau" :: v :: t => loop(t, cfg.copy(tau = v.toDouble))
      case "--lm-store" :: v :: t => loop(t, cfg.copy(lmStorePath = Some(v)))
      case "--lm-min" :: v :: t => loop(t, cfg.copy(lmMin = v.toLong))
      case v :: t if !v.startsWith("--") && cfg.budget == 2048L =>
        loop(t, cfg.copy(budget = v.toLong))
      case other => sys.error(s"$usage (unparsed: $other)")
    }
    args match {
      case docsDir :: outDir :: rest => loop(rest, Config(docsDir, outDir))
      case _ => sys.error(usage)
    }
  }

  /** Positional-compat entry (Stress, older callers): the 5-stage chain. */
  def run(spark: SparkSession, docsDir: String, outDir: String,
      budget: Long): String =
    run(spark, Config(docsDir, outDir, budget))

  /** Runs the pipeline; returns the JSON stats line. */
  def run(spark: SparkSession, cfg: Config): String = {
    val raw = spark.read.parquet(s"${cfg.docsDir}/documents.parquet")
    val nIn = raw.count()

    // 0. (optional) Markup main-content extraction (q193): the crawl
    //    pipeline's FIRST cleaning stage — every later stage must see
    //    prose, not tag chrome (dedup hashes, shingle sets, and token
    //    counts over raw markup measure the template, not the content).
    //    The doc's text IS the fetched page here; pages whose main
    //    content extracts to nothing drop out. Same fan-out barrier as
    //    the strip stages.
    //    Unlike the strip stages (whose cleaned text comes back from an
    //    AGGREGATION and must join), extraction is a pure per-row
    //    projection — text swaps in place: ONE corpus scan, no self-join.
    val docs =
      if (!cfg.extractMain) raw
      else raw
        .withColumn("text", TextOps.mainContentCol(col("text")))
        .filter(trim(col("text")) =!= "")
        .localCheckpoint(true)
    val nMain = if (cfg.extractMain) docs.count() else nIn

    // 1. Exact dedup: canonical word-multiset hash, min-id keeper (q21).
    val exact = docs
      .withColumn("h",
        md5(concat_ws(" ", sort_array(split(trim(col("text")), " ")))))
      .withColumn("keeper", min("doc_id").over(Window.partitionBy("h")))
      .filter(col("doc_id") === col("keeper"))
      .drop("h", "keeper")
      .localCheckpoint(true) // barrier: three downstream consumers
    val nExact = exact.count()

    // 2. (optional) Boilerplate strip (q85): replace text with the
    //    cover-stripped re-assembly; docs reduced to nothing drop out.
    //    Runs BEFORE near-dup so shared template chrome can't glue
    //    unrelated docs into one component. The cleaned frame fans out
    //    to every downstream stage — barrier it (the q54/q73 pattern).
    val stripped =
      if (!cfg.stripBoilerplate) exact
      else exact.drop("text")
        .join(Dedup.boilerplateStrip(exact, cfg.boilerDf)
            .filter(col("cleaned").isNotNull && trim(col("cleaned")) =!= "")
            .select(col("doc_id"), col("cleaned").as("text")),
          Seq("doc_id"))
        .localCheckpoint(true)
    val nStripped = if (cfg.stripBoilerplate) stripped.count() else nExact

    // 2b. (optional) Within-doc repeated-span strip (q103): the self-
    //     repetition twin of stage 2, composing at the same point — AFTER
    //     the cross-doc strip (boilerplate df counts must see original
    //     spans), BEFORE near-dup/quality, so repetition loops don't
    //     inflate shingle sets or token counts. Doc-keyed end to end (the
    //     q103 PlanSpec pin); same fan-out barrier as stage 2.
    val selfStripped =
      if (!cfg.stripSelfrep) stripped
      else stripped.drop("text")
        .join(TextOps.selfRepStrip(stripped)
            .filter(col("cleaned").isNotNull && trim(col("cleaned")) =!= "")
            .select(col("doc_id"), col("cleaned").as("text")),
          Seq("doc_id"))
        .localCheckpoint(true)
    val nSelf = if (cfg.stripSelfrep) selfStripped.count() else nStripped

    // 3. Near-dup keep-set: inverted-index Jaccard pairs → connected
    //    components → keep the component label (its min doc_id) (q58).
    val comp = Dedup.connectedComponents(
      Dedup.jaccardPairs(selfStripped, cfg.tau).select("a", "b"))
    val kept = selfStripped
      .join(comp.select(col("v").as("doc_id"), col("lbl")), Seq("doc_id"), "left")
      .filter(col("lbl").isNull || col("lbl") === col("doc_id"))
      .drop("lbl")
    val nKept = kept.count()

    // 3b. (optional) Cross-document exact-substring strip (q148): the
    //     span-granular pass AFTER doc-granular dedup — the published
    //     composition (Lee et al. 2022 run both): whole near-dup docs are
    //     already collapsed by stage 3, so what remains is sub-threshold
    //     embedded duplication (long quotes, forwarded blocks) in
    //     otherwise-distinct survivors; the earliest copy keeps its span.
    //     Running it BEFORE near-dup would gut the very shingle overlap
    //     stage 3 clusters on. Docs reduced to nothing drop out; same
    //     fan-out barrier as the other strip stages.
    val crossStripped =
      if (!cfg.stripCrossdoc) kept
      else kept.drop("text")
        .join(Dedup.crossdocStrip(kept)
            .filter(col("cleaned").isNotNull && trim(col("cleaned")) =!= "")
            .select(col("doc_id"), col("cleaned").as("text")),
          Seq("doc_id"))
        .localCheckpoint(true)
    val nCross = if (cfg.stripCrossdoc) crossStripped.count() else nKept

    // 4. (optional) Eval-set decontamination: drop docs sharing ≥ contamK
    //    distinct shingles with the held-out benchmark — q62's broadcast
    //    form (--bench) or q105's persisted-registry bloom-prefiltered
    //    form (--registry); same decision either way.
    require(cfg.benchPath.isEmpty || cfg.registryPath.isEmpty,
      "--bench and --registry are mutually exclusive")
    require(cfg.fuzzyTau.isEmpty || cfg.benchPath.isDefined,
      "--fuzzy-tau requires --bench (the registry keeps no per-item shingle sets)")
    val decon = (cfg.benchPath, cfg.registryPath) match {
      case (Some(bp), _) =>
        val bench = spark.read.parquet(bp)
        val exactDrop = Dedup.contaminatedDocs(crossStripped, bench, cfg.contamK)
        val drop = cfg.fuzzyTau match {
          case Some(ft) => exactDrop.union(
            Dedup.fuzzyContainmentPairs(crossStripped, bench, ft)
              .select("doc_id").distinct()).distinct()
          case None => exactDrop
        }
        crossStripped.join(drop, Seq("doc_id"), "left_anti")
      case (None, Some(rp)) =>
        crossStripped.join(
          operators.IndexStore.decontaminate(crossStripped, rp, cfg.contamK)
            .select("doc_id"),
          Seq("doc_id"), "left_anti")
      case (None, None) => crossStripped
    }
    val nDecon =
      if (cfg.benchPath.isDefined || cfg.registryPath.isDefined) decon.count()
      else nCross

    // 4b. (optional) Reference-LM perplexity filter (q196's production
    //     form, `IndexStore.lmScore`): mean KN conditional predictability
    //     against the persisted reference LM, drop below --lm-min
    //     permille. BEFORE redaction so the scored surface is the one the
    //     reference LM was built on (<EMAIL>/<NUM> sentinels would read
    //     as spurious OOV). Anti-join on the LOW scores: unscoreable
    //     docs (< 2 words) are kept — absence of evidence.
    val lmFiltered = cfg.lmStorePath match {
      case None => decon
      case Some(sp) =>
        decon.join(
          operators.IndexStore.lmScore(decon, sp)
            .filter(col("score_permille") < cfg.lmMin).select("doc_id"),
          Seq("doc_id"), "left_anti")
    }
    val nLm = if (cfg.lmStorePath.isDefined) lmFiltered.count() else nDecon

    // 5. PII redaction: emails first (they contain digit runs), then digit
    //    runs — the q61 two-pass order, a pure codegen'd projection.
    val redacted = lmFiltered.withColumn("text",
      regexp_replace(
        regexp_replace(col("text"), TextOps.EmailRe, "<EMAIL>"),
        TextOps.NumRe, "<NUM>"))

    // 6. Quality cut at the per-language bounded-histogram median (q60).
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

    // 7. Token-budget packing via the √N-blocked distributed prefix sum
    //    (q51) — pack_id = which budget-sized bin the doc starts in.
    val packed = TextOps.prefixSum(surv)
      .withColumn("pack_id", expr(s"(cum - tokens) div ${cfg.budget}"))
      .select("doc_id", "tokens", "pack_id")

    val out = redacted.join(packed, Seq("doc_id"))
    out.write.mode("overwrite").parquet(s"${cfg.outDir}/curated.parquet")
    val written = spark.read.parquet(s"${cfg.outDir}/curated.parquet")
    val nOut = written.count()
    val nPacks = written.agg(countDistinct("pack_id")).head().getLong(0)

    val json =
      s"""{"docs_in":$nIn,"after_extract_main":$nMain,"after_exact_dedup":$nExact,"after_boilerplate":$nStripped,"after_selfrep":$nSelf,"after_neardup":$nKept,"after_crossdoc":$nCross,"after_decontam":$nDecon,"after_lm_filter":$nLm,"after_quality_cut":$nOut,"packs":$nPacks,"token_budget":${cfg.budget},"out":"${cfg.outDir}/curated.parquet"}"""
    java.nio.file.Files.write(java.nio.file.Paths.get(s"${cfg.outDir}/stats.json"),
      (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    json
  }
}
