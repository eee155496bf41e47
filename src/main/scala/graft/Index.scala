package graft

import org.apache.spark.sql.functions._

import graft.operators.IndexStore

/** Standing-index workflow CLI — the persisted-state counterpart of
  * `graft.Curate` (and the dedup/ANN analogue of the reference's
  * load-once/query-many warehouse workflow, cve_manager.py:335-360 →
  * 387-504):
  *
  *   sbt "runMain graft.Index build-lsh  <docsDir> <indexPath>"
  *   sbt "runMain graft.Index dedupe     <batchDocsDir> <indexPath>
  *        [--out <dir>] [--append-kept]"
  *   sbt "runMain graft.Index build-ivf  <embDir> <indexPath> [--refine N]"
  *   sbt "runMain graft.Index append-ivf <embDir> <indexPath>"
  *   sbt "runMain graft.Index search     <indexPath> <vecId> <k> [--probe]"
  *   sbt "runMain graft.Index build-pq   <embDir> <indexPath> [--refine N]"
  *   sbt "runMain graft.Index append-pq  <embDir> <indexPath>"
  *   sbt "runMain graft.Index search-pq  <embDir> <indexPath> <vecId> <k>"
  *   sbt "runMain graft.Index build-pairs  <docsDir> <indexPath>"
  *   sbt "runMain graft.Index build-winnow <docsDir> <indexPath>"
  *   sbt "runMain graft.Index append-winnow <docsDir> <indexPath>"
  *   sbt "runMain graft.Index winnow-audit <indexPath> [--min-shared N]"
  *   sbt "runMain graft.Index winnow-check <batchDocsDir> <indexPath> [--min-shared N]"
  *   sbt "runMain graft.Index build-phash <docsDir> <indexPath>"
  *   sbt "runMain graft.Index phash-dedupe <batchDocsDir> <indexPath>
  *        [--out <dir>] [--append-kept]"
  *   sbt "runMain graft.Index phash-audit <indexPath>"
  *   sbt "runMain graft.Index phash-search <indexPath> <docId> <k>"
  *   sbt "runMain graft.Index consolidate-phash <docsDir> <indexPath>
  *        [--out <dir>]"
  *   sbt "runMain graft.Index append-pairs <docsDir> <indexPath>"
  *   sbt "runMain graft.Index audit      <indexPath> [--tau T] [--contain]"
  *   sbt "runMain graft.Index components <indexPath> [--tau T]"
  *   sbt "runMain graft.Index consolidate <docsDir> <indexPath>
  *        [--tau T] [--out <dir>]"
  *   sbt "runMain graft.Index build-registry <docsDir> <indexPath> [--est N]"
  *   sbt "runMain graft.Index decontam    <corpusDir> <indexPath>
  *        [--k K] [--out <dir>]"
  *   sbt "runMain graft.Index compact-grams <indexPath>"
  *   sbt "runMain graft.Index compact-lsh|compact-phash|compact-pq|
  *        compact-ivf|compact-winnow <indexPath>"
  *   sbt "runMain graft.Index build-ivfpq <embDir> <indexPath>"
  *   sbt "runMain graft.Index fused-search <docsDir> <embDir> <indexPath>
  *        [--probe N]"
  *   sbt "runMain graft.Index build-provenance <docsDir> <indexPath>"
  *   sbt "runMain graft.Index append-provenance <batchDocsDir> <indexPath>"
  *   sbt "runMain graft.Index provenance  <indexPath> [--out <dir>]"
  *   sbt "runMain graft.Index authority   <indexPath> [--out <dir>]"
  *   sbt "runMain graft.Index build-sketches <docsDir> <indexPath>"
  *   sbt "runMain graft.Index append-sketches <batchDocsDir> <indexPath>"
  *   sbt "runMain graft.Index sketch-report <indexPath>"
  *   sbt "runMain graft.Index cms-lookup <indexPath> <token>"
  *   sbt "runMain graft.Index compact-sketches <indexPath>"
  *   sbt "runMain graft.Index build-lm <docsDir> <indexPath>"
  *   sbt "runMain graft.Index append-lm <batchDocsDir> <indexPath>"
  *   sbt "runMain graft.Index lm-report <indexPath>"
  *   sbt "runMain graft.Index compact-lm <indexPath>"
  *   sbt "runMain graft.Index gc <indexPath>"
  *
  * `build-*` pays the one-time linear corpus cost; `dedupe` runs a crawl
  * batch against the standing LSH state (per-batch cost measured flat
  * across a 10× corpus — PERF.md `incdedup`), writes the verdict table,
  * and with `--append-kept` folds the kept docs' band/shingle rows back
  * into the index — the complete incremental-crawl loop. `search` probes
  * the persisted IVF index reading one coarse-cell partition; `search-pq`
  * ADC-scans the persisted position codes and re-ranks against the raw
  * vectors at <embDir> (the store holds only codes — PERF.md `pq`). Each
  * mode prints one JSON summary line.
  *
  * `build-pairs` persists the df-capped inverted index the pair-audit
  * family (q22/q87/q91/q93/q97, the q47/q58 edge set) re-derives per
  * query; `audit` then
  * runs the Jaccard (or containment) near-dup scan straight off the
  * bucket table — it never touches the corpus text at all.
  */
object Index {

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val spark = Sessions.builder(s"local[$cpus]", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    println(run(spark, args.toList))
    spark.stop()
  }

  /** Runs one mode; returns the JSON summary line (testable seam). */
  def run(spark: org.apache.spark.sql.SparkSession, args: List[String]): String =
    args match {
      case "build-lsh" :: docsDir :: path :: Nil =>
        val docs = spark.read.parquet(s"$docsDir/documents.parquet")
        val n = docs.count()
        IndexStore.saveLshIndex(docs, path)
        s"""{"mode":"build-lsh","docs":$n,"index":"$path"}"""

      case "dedupe" :: batchDir :: path :: rest =>
        val out = rest.sliding(2).collectFirst { case List("--out", v) => v }
        val appendKept = rest.contains("--append-kept")
        val batch = spark.read.parquet(s"$batchDir/documents.parquet")
          .localCheckpoint(true) // read once: verdicts + optional append
        val verdicts = IndexStore.incrementalDedup(batch,
            IndexStore.loadLshBands(spark, path),
            IndexStore.loadLshShingles(spark, path))
          .localCheckpoint(true) // decisions must precede the index append
        val nBatch = batch.count()
        val nDup = verdicts.filter(col("keep") === 0).count()
        out.foreach(o => verdicts.write.mode("overwrite").parquet(o))
        if (appendKept) {
          val kept = batch.join(
            verdicts.filter(col("keep") === 1).select("doc_id"), Seq("doc_id"))
          IndexStore.appendLshBatch(kept, path)
        }
        s"""{"mode":"dedupe","batch":$nBatch,"dups":$nDup,"kept":${nBatch - nDup},"appended":$appendKept${out.map(o => s""","out":"$o"""").getOrElse("")}}"""

      case "build-ivf" :: embDir :: path :: rest =>
        val refine = rest.sliding(2)
          .collectFirst { case List("--refine", v) => v.toInt }.getOrElse(0)
        val emb = loadEmb(spark, embDir)
        val n = emb.count()
        IndexStore.saveIvfIndex(emb, path, refine)
        s"""{"mode":"build-ivf","vectors":$n,"refine":$refine,"index":"$path"}"""

      case "append-ivf" :: embDir :: path :: Nil =>
        val emb = loadEmb(spark, embDir)
        val n = emb.count()
        IndexStore.appendIvfBatch(emb, path)
        s"""{"mode":"append-ivf","vectors":$n,"index":"$path"}"""

      case "build-pq" :: embDir :: path :: rest =>
        val refine = rest.sliding(2)
          .collectFirst { case List("--refine", v) => v.toInt }.getOrElse(0)
        val emb = loadEmb(spark, embDir)
        val n = emb.count()
        IndexStore.savePqIndex(emb, path, refine)
        s"""{"mode":"build-pq","vectors":$n,"refine":$refine,"index":"$path"}"""

      case "append-pq" :: embDir :: path :: Nil =>
        val emb = loadEmb(spark, embDir)
        val n = emb.count()
        IndexStore.appendPqBatch(emb, path)
        s"""{"mode":"append-pq","vectors":$n,"index":"$path"}"""

      case "search-pq" :: embDir :: path :: vecId :: k :: Nil =>
        val emb = loadEmb(spark, embDir)
        val hits = IndexStore.searchPq(emb, path, vecId.toLong, k.toInt)
          .collect()
          .map(r => s"""{"vec_id":${r.getLong(0)},"sim":${r.getDouble(1)}}""")
        s"""{"mode":"search-pq","query":$vecId,"k":$k,"hits":[${hits.mkString(",")}]}"""

      case "search" :: path :: vecId :: k :: rest if rest.forall(_ == "--probe") =>
        val probed = rest.contains("--probe")
        val df =
          if (probed) IndexStore.searchIvfProbed(spark, path, vecId.toLong, k.toInt)
          else IndexStore.searchIvf(spark, path, vecId.toLong, k.toInt)
        val hits = df.collect()
          .map(r => s"""{"vec_id":${r.getLong(0)},"sim":${r.getDouble(1)}}""")
        s"""{"mode":"search","query":$vecId,"k":$k,"probed":$probed,"hits":[${hits.mkString(",")}]}"""

      case "build-pairs" :: docsDir :: path :: Nil =>
        val docs = spark.read.parquet(s"$docsDir/documents.parquet")
        val n = docs.count()
        IndexStore.savePairIndex(docs, path)
        val nb = IndexStore.loadPairBuckets(spark, path).count()
        s"""{"mode":"build-pairs","docs":$n,"buckets":$nb,"index":"$path"}"""

      case "append-pairs" :: docsDir :: path :: Nil =>
        val batch = spark.read.parquet(s"$docsDir/documents.parquet")
        val n = batch.count()
        IndexStore.appendPairBatch(batch, path)
        val nb = IndexStore.loadPairBuckets(spark, path).count()
        s"""{"mode":"append-pairs","docs":$n,"buckets":$nb,"index":"$path"}"""

      case "build-winnow" :: docsDir :: path :: Nil =>
        val docs = spark.read.parquet(s"$docsDir/documents.parquet")
        val n = docs.count()
        IndexStore.saveWinnowIndex(docs, path)
        val nb = IndexStore.loadWinnowBuckets(spark, path).count()
        s"""{"mode":"build-winnow","docs":$n,"buckets":$nb,"index":"$path"}"""

      case "append-winnow" :: docsDir :: path :: Nil =>
        val batch = spark.read.parquet(s"$docsDir/documents.parquet")
        val n = batch.count()
        IndexStore.appendWinnowBatch(batch, path)
        val nb = IndexStore.loadWinnowBuckets(spark, path).count()
        s"""{"mode":"append-winnow","docs":$n,"buckets":$nb,"index":"$path"}"""

      case "build-grams" :: docsDir :: path :: Nil =>
        val docs = spark.read.parquet(s"$docsDir/documents.parquet")
        val n = docs.count()
        IndexStore.saveGramIndex(docs, path)
        val ng = IndexStore.loadGramIndex(spark, path).count()
        s"""{"mode":"build-grams","docs":$n,"grams":$ng,"index":"$path"}"""

      case "strip-batch" :: batchDir :: path :: rest =>
        val out = rest.sliding(2).collectFirst { case List("--out", v) => v }
        val appendKept = rest.contains("--append-kept")
        val batch = spark.read.parquet(s"$batchDir/documents.parquet")
          .localCheckpoint(true) // read once: strip + optional append
        val stripped = IndexStore.crossdocStripBatch(batch,
            IndexStore.loadGramIndex(spark, path))
          .localCheckpoint(true) // decisions must precede the index append
        val nBatch = batch.count()
        val nTouched = stripped.filter(col("n_removed") > 0).count()
        val nWords = stripped.agg(coalesce(sum("n_removed"), lit(0L)))
          .head().getLong(0)
        out.foreach(o => stripped.write.mode("overwrite").parquet(o))
        // --append-kept folds the batch's OWN gram mins into the standing
        // index so the next batch dedups against it; the stripped text is
        // the OUTPUT, the index keeps original-batch grams (the earliest
        // copy of each run stays findable).
        if (appendKept) IndexStore.appendGramBatch(batch, path)
        s"""{"mode":"strip-batch","batch":$nBatch,"docs_touched":$nTouched,"words_removed":$nWords,"appended":$appendKept${out.map(o => s""","out":"$o"""").getOrElse("")}}"""

      case "build-phash" :: docsDir :: path :: Nil =>
        val docs = spark.read.parquet(s"$docsDir/documents.parquet")
        val n = docs.count()
        IndexStore.savePhashIndex(docs, path)
        val ng = IndexStore.loadPhashGrid(spark, path).count()
        s"""{"mode":"build-phash","docs":$n,"signatures":$ng,"index":"$path"}"""

      case "phash-dedupe" :: batchDir :: path :: rest =>
        val out = rest.sliding(2).collectFirst { case List("--out", v) => v }
        val appendKept = rest.contains("--append-kept")
        val batch = spark.read.parquet(s"$batchDir/documents.parquet")
          .localCheckpoint(true) // read once: verdicts + optional append
        val verdicts = IndexStore.phashDedupBatch(batch, path)
          .localCheckpoint(true) // decisions must precede the index append
        val nBatch = batch.count()
        val nDup = verdicts.filter(col("keep") === 0).count()
        out.foreach(o => verdicts.write.mode("overwrite").parquet(o))
        if (appendKept) {
          val kept = batch.join(
            verdicts.filter(col("keep") === 1).select("doc_id"), Seq("doc_id"))
          IndexStore.appendPhashBatch(kept, path)
        }
        s"""{"mode":"phash-dedupe","batch":$nBatch,"dups":$nDup,"kept":${nBatch - nDup},"appended":$appendKept${out.map(o => s""","out":"$o"""").getOrElse("")}}"""

      case "phash-audit" :: path :: Nil =>
        val pairs = IndexStore.phashPairsFrom(spark, path)
        val stats = pairs
          .agg(count(lit(1)).as("pairs"),
            countDistinct(col("b")).as("dup_docs"),
            coalesce(max("hamming"), lit(0L)).as("max_hamming"))
          .head()
        // Bucket-heat meter (VERDICT r10 #1): how much of the band index
        // runs over the sub-band re-blocking threshold, and the residual
        // (band, sub-band) fan-in that actually bounds pairing cost now.
        val sat = IndexStore.phashIndexSaturation(spark, path).head()
        s"""{"mode":"phash-audit","pairs":${stats.getLong(0)},"dup_docs":${stats.getLong(1)},"max_hamming":${stats.getLong(2)},"total_buckets":${sat.getLong(0)},"hot_buckets":${sat.getLong(1)},"max_fan_in":${sat.getLong(2)},"hot_rows":${sat.getLong(4)},"max_sub_fan_in":${sat.getLong(5)},"saturation":${sat.getDouble(6)}}"""

      case "winnow-check" :: batchDir :: path :: rest =>
        val minShared = rest.sliding(2)
          .collectFirst { case List("--min-shared", v) => v.toInt }
          .getOrElse(operators.Dedup.WinnowMinShared)
        val batch = spark.read.parquet(s"$batchDir/documents.parquet")
        val n = batch.count()
        val pairs = IndexStore.winnowAuditBatch(batch, path, minShared)
        // countDistinct, not approx_count_distinct: these audit JSONs read as
        // exact tallies and the pair sets are audit-sized (ADVICE r9).
        val stats = pairs
          .agg(count(lit(1)).as("pairs"),
            countDistinct(col("b")).as("flagged"))
          .head()
        // The audit names its own blind-spot rate (VERDICT r9 #4): the
        // fraction of the batch's fingerprint hits that landed on stop
        // markers and so produced NO pair evidence. A growing saturation
        // means the index is going blind on exactly the most-copied runs.
        val sat = IndexStore.winnowBatchSaturation(batch, path).head()
        s"""{"mode":"winnow-check","batch":$n,"min_shared":$minShared,"pairs":${stats.getLong(0)},"flagged_batch_docs":${stats.getLong(1)},"fp_hits":${sat.getLong(0)},"stop_fp_hits":${sat.getLong(1)},"saturation":${sat.getDouble(2)}}"""

      case "winnow-audit" :: path :: rest =>
        val minShared = rest.sliding(2)
          .collectFirst { case List("--min-shared", v) => v.toInt }
          .getOrElse(operators.Dedup.WinnowMinShared)
        val pairs = operators.Dedup.winnowPairsFrom(
          IndexStore.loadWinnowBuckets(spark, path), minShared)
        val stats = pairs
          .agg(count(lit(1)).as("pairs"),
            countDistinct(col("b")).as("dup_docs"),
            coalesce(max("shared"), lit(0L)).as("max_shared"))
          .head()
        val sat = IndexStore.winnowIndexSaturation(spark, path).head()
        s"""{"mode":"winnow-audit","min_shared":$minShared,"pairs":${stats.getLong(0)},"dup_docs":${stats.getLong(1)},"max_shared":${stats.getLong(2)},"total_buckets":${sat.getLong(0)},"stop_buckets":${sat.getLong(1)},"saturation":${sat.getDouble(2)}}"""

      case "audit" :: path :: rest =>
        val contain = rest.contains("--contain")
        val tau = rest.sliding(2).collectFirst { case List("--tau", v) => v.toDouble }
          .getOrElse(if (contain) operators.Dedup.ContainTau else operators.Dedup.JaccardTau)
        val buckets = IndexStore.loadPairBuckets(spark, path)
        val pairs =
          if (contain) operators.Dedup.containmentPairsFrom(buckets, tau)
          else operators.Dedup.jaccardPairsFrom(buckets, tau)
        val stats = pairs
          .agg(count(lit(1)).as("pairs"),
            countDistinct(col("b")).as("dup_docs"),
            coalesce(max("jaccard"), lit(0.0)).as("max_j"))
          .head()
        s"""{"mode":"audit","metric":"${if (contain) "containment" else "jaccard"}","tau":$tau,"pairs":${stats.getLong(0)},"dup_docs":${stats.getLong(1)},"max_jaccard":${stats.getDouble(2)}}"""

      case "consolidate" :: docsDir :: path :: rest =>
        // q102's from-store form: provenance consolidation per near-dup
        // component, pairs read from the PERSISTED df-capped index instead
        // of re-mined (~95% of the in-query cost — PERF.md `consolidate`).
        // The corpus is touched once, for the doc_id-keyed metadata join.
        val out = rest.sliding(2).collectFirst { case List("--out", v) => v }
        val tau = rest.sliding(2).collectFirst { case List("--tau", v) => v.toDouble }
          .getOrElse(operators.Dedup.JaccardTau)
        val docs = spark.read.parquet(s"$docsDir/documents.parquet")
        val cons = operators.Dedup.consolidateFrom(
            IndexStore.loadPairBuckets(spark, path), docs, tau)
          .localCheckpoint(true) // stats + optional write read it twice
        val stats = cons.agg(count(lit(1)).as("n_components"),
            coalesce(sum("n_members"), lit(0L)).as("n_docs"),
            coalesce(max("n_members"), lit(0L)).as("largest"))
          .head()
        out.foreach(o => cons.write.mode("overwrite").parquet(o))
        s"""{"mode":"consolidate","tau":$tau,"n_components":${stats.getLong(0)},"n_docs":${stats.getLong(1)},"largest":${stats.getLong(2)}${out.map(o => s""","out":"$o"""").getOrElse("")}}"""

      case "phash-search" :: path :: docId :: k :: Nil =>
        // Point media search over the persisted signature index: the
        // query's band rows broadcast, the store read prunes to their
        // pfx partitions, neighbors at Hamming <= tau ranked.
        val hits = IndexStore.searchPhash(spark, path, docId.toLong, k.toInt)
          .collect()
        val hitJson = hits.map(r =>
          s"""{"doc_id":${r.getLong(0)},"hamming":${r.getLong(1)}}""").mkString(",")
        s"""{"mode":"phash-search","query":$docId,"k":$k,"hits":[$hitJson]}"""

      case "consolidate-phash" :: docsDir :: path :: rest =>
        // q144's from-store form: media-cluster consolidation with the
        // pair graph read from the persisted phash index (skipping the
        // signature build); corpus touched once for the metadata join.
        val out = rest.sliding(2).collectFirst { case List("--out", v) => v }
        val docs = spark.read.parquet(s"$docsDir/documents.parquet")
        val cons = IndexStore.phashConsolidateFrom(spark, path, docs)
          .localCheckpoint(true) // stats + optional write read it twice
        val stats = cons.agg(count(lit(1)).as("n_components"),
            coalesce(sum("n_members"), lit(0L)).as("n_docs"),
            coalesce(max("n_members"), lit(0L)).as("largest"))
          .head()
        out.foreach(o => cons.write.mode("overwrite").parquet(o))
        s"""{"mode":"consolidate-phash","n_components":${stats.getLong(0)},"n_docs":${stats.getLong(1)},"largest":${stats.getLong(2)}${out.map(o => s""","out":"$o"""").getOrElse("")}}"""

      case "build-registry" :: docsDir :: path :: rest =>
        // q105's one-time artifact: distinct shingle table + bloom sketch
        // of a benchmark/eval registry corpus.
        val est = rest.sliding(2).collectFirst { case List("--est", v) => v.toLong }
          .getOrElse(1L << 20)
        val docs = spark.read.parquet(s"$docsDir/documents.parquet")
        val n = docs.count()
        IndexStore.saveDecontamRegistry(docs, path, est)
        val ns = spark.read.parquet(s"$path/decontam/shingles").count()
        s"""{"mode":"build-registry","docs":$n,"shingles":$ns,"est":$est,"index":"$path"}"""

      case "decontam" :: corpusDir :: path :: rest =>
        // q105 off the store: bloom-prefiltered exact decontamination of a
        // corpus against the persisted registry artifact.
        val out = rest.sliding(2).collectFirst { case List("--out", v) => v }
        val k = rest.sliding(2).collectFirst { case List("--k", v) => v.toInt }
          .getOrElse(operators.Dedup.ContamK)
        val corpus = spark.read.parquet(s"$corpusDir/documents.parquet")
        val hits = IndexStore.decontaminate(corpus, path, k)
          .localCheckpoint(true) // stats + optional write read it twice
        val stats = hits.agg(count(lit(1)).as("n"),
            coalesce(max("n_shared"), lit(0L)).as("max_shared")).head()
        out.foreach(o => hits.write.mode("overwrite").parquet(o))
        s"""{"mode":"decontam","k":$k,"contaminated":${stats.getLong(0)},"max_shared":${stats.getLong(1)}${out.map(o => s""","out":"$o"""").getOrElse("")}}"""

      case "build-provenance" :: docsDir :: path :: Nil =>
        // q171/q172's one-time artifact: gram postings + min-doc index +
        // source map — ONE corpus gram scan; every later provenance or
        // authority read is store-only.
        val docs = spark.read.parquet(s"$docsDir/documents.parquet")
        val n = docs.count()
        IndexStore.saveProvenanceIndex(docs, path)
        val np = IndexStore.loadGramPostings(spark, path).count()
        s"""{"mode":"build-provenance","docs":$n,"postings":$np,"index":"$path"}"""

      case "append-provenance" :: batchDir :: path :: Nil =>
        val batch = spark.read.parquet(s"$batchDir/documents.parquet")
        val n = batch.count()
        IndexStore.appendProvenanceBatch(batch, path)
        val np = IndexStore.loadGramPostings(spark, path).count()
        s"""{"mode":"append-provenance","batch":$n,"postings":$np,"index":"$path"}"""

      case "build-sketches" :: docsDir :: path :: Nil =>
        // q178/q179's one-time artifact: the corpus-statistics ledger
        // (HLL registers + per-source CMS grids + word totals) — two
        // linear scans collapsing into kilobytes of mergeable state;
        // every later cardinality/frequency read is store-only.
        val docs = spark.read.parquet(s"$docsDir/documents.parquet")
        val n = docs.count()
        IndexStore.saveSketchIndex(docs, path)
        val regs = IndexStore.loadSketchRegisters(spark, path).count()
        val cells = IndexStore.loadSketchCells(spark, path).count()
        s"""{"mode":"build-sketches","docs":$n,"registers":$regs,"cells":$cells,"index":"$path"}"""

      case "append-sketches" :: batchDir :: path :: Nil =>
        // The crawl-loop update: the batch's grids land as new rows;
        // loaders fold (max/add), so the store answers for the union
        // immediately — no rewrite, no read-modify-write.
        val batch = spark.read.parquet(s"$batchDir/documents.parquet")
        val n = batch.count()
        IndexStore.appendSketchBatch(batch, path)
        val regs = IndexStore.loadSketchRegisters(spark, path).count()
        val cells = IndexStore.loadSketchCells(spark, path).count()
        s"""{"mode":"append-sketches","batch":$n,"registers":$regs,"cells":$cells,"index":"$path"}"""

      case "sketch-report" :: path :: Nil =>
        // Store-only statistics read: per-lang (+ MAX-merged '__all__')
        // distinct-5-gram estimates and per-source word mass — the
        // catalog-cost standing report, corpus text never touched.
        val reg = IndexStore.loadSketchRegisters(spark, path)
        val all = reg.groupBy("idx").agg(max("r").as("r"))
          .select(lit("__all__").as("grp"), col("idx"), col("r"))
        val est = operators.Audit.hllEstimate(reg.unionByName(all))
          .orderBy("grp").collect() // ≤ langs + 1 rows
          .map(r => s"""{"lang":"${r.getString(0)}","used":${r.getLong(1)},"est":${r.getDouble(2)},"regime":"${r.getString(3)}"}""")
          .mkString(",")
        val tot = IndexStore.loadSketchTotals(spark, path)
          .orderBy("source").collect() // ≤ |sources| rows
          .map(r => s"""{"source":"${r.getString(0)}","n_words":${r.getLong(1)}}""")
          .mkString(",")
        val lq = operators.Audit.lenQuantiles(
            IndexStore.loadSketchLens(spark, path))
          .orderBy("source").collect() // ≤ |sources| + 1 rows
          .map(r => s"""{"source":"${r.getString(0)}","n_docs":${r.getLong(1)},"q50":${r.getLong(3)},"q90":${r.getLong(5)}}""")
          .mkString(",")
        // Heavy-hitter leg: top candidates from the SUM-folded MG
        // summary (lower-bound counters; the exact-recount form is
        // q192's query — this is the standing glance).
        val hh = IndexStore.loadSketchMg(spark, path)
          .orderBy(col("c").desc, col("w")).limit(10).collect()
          .map(r => s"""{"w":${jstr(r.getString(0))},"c_lb":${r.getLong(1)}}""")
          .mkString(",")
        s"""{"mode":"sketch-report","grams":[$est],"words":[$tot],"lens":[$lq],"heavy_hitters":[$hh],"index":"$path"}"""

      case "build-lm" :: docsDir :: path :: Nil =>
        // q195/q199's standing artifact: the bigram TYPE table (the KN
        // LM's whole state — margins/continuations/total all derive from
        // it on read, so nothing can drift). One pair scan, vocab²-
        // bounded store.
        val docs = spark.read.parquet(s"$docsDir/documents.parquet")
        val n = docs.count()
        IndexStore.saveBigramLM(docs, path)
        val types = IndexStore.loadBigramLM(spark, path).count()
        s"""{"mode":"build-lm","docs":$n,"bigram_types":$types,"index":"$path"}"""

      case "append-lm" :: batchDir :: path :: Nil =>
        // The crawl-loop update: the batch's own (w1, w2, c) grid lands
        // as new rows; counts are sum-mergeable so readers fold —
        // served KN table == a full rebuild (IndexStoreSpec pins it).
        val batch = spark.read.parquet(s"$batchDir/documents.parquet")
        val n = batch.count()
        IndexStore.appendBigramBatch(batch, path)
        val types = IndexStore.loadBigramLM(spark, path).count()
        s"""{"mode":"append-lm","batch":$n,"bigram_types":$types,"index":"$path"}"""

      case "compact-lm" :: path :: Nil =>
        // Materialize the sum fold (file-count hygiene; readers fold
        // either way) — same staged rename-swap contract as the rest.
        val before = spark.read.parquet(s"$path/lm/bigrams").count()
        IndexStore.compactBigramLM(spark, path)
        val after = spark.read.parquet(s"$path/lm/bigrams").count()
        s"""{"mode":"compact-lm","rows_before":$before,"rows_after":$after,"index":"$path"}"""

      case "lm-report" :: path :: Nil =>
        // Store-only LM glance: type/token totals and the top conditional
        // continuations per the KN table — catalog cost, corpus never
        // re-read.
        val big = IndexStore.loadBigramLM(spark, path)
        val stats = big.agg(count(lit(1)).as("types"), sum("c").as("toks"))
          .head()
        val top = IndexStore.knFromStore(spark, path)
          .orderBy(col("p_kn_permille").desc, col("w1"), col("w2"))
          .limit(5).collect()
          .map(r => s"""{"w1":${jstr(r.getString(0))},"w2":${jstr(r.getString(1))},"p_kn_permille":${r.getLong(5)}}""")
          .mkString(",")
        s"""{"mode":"lm-report","bigram_types":${stats.getLong(0)},"bigram_tokens":${stats.getLong(1)},"top":[$top],"index":"$path"}"""

      case "cms-lookup" :: path :: token :: Nil =>
        // Point-frequency estimate for one token from the persisted
        // grid: D cell lookups, never a corpus query. An absent cell
        // estimates 0 (an untouched counter IS zero).
        import spark.implicits._
        val pb = operators.Audit.cmsRows(Seq(token).toDF("w"), "w")
        val cells = IndexStore.loadSketchCells(spark, path)
          .groupBy("j", "c").agg(sum("cc").as("cc"))
        val est = pb.join(cells, Seq("j", "c"), "left")
          .agg(min(coalesce(col("cc"), lit(0L))).as("est"))
          .head().getLong(0)
        s"""{"mode":"cms-lookup","token":${jstr(token)},"est":$est,"index":"$path"}"""

      case "gc" :: path :: Nil =>
        // Staged-swap retention sweep (VERDICT r15 #3): every compaction
        // and node rewrite stages through `<table>.compact`/`<table>.old`
        // siblings; a crash leaves them behind. `gc` applies the same
        // repair rule the swap entries apply (restore a stranded-only
        // copy, never delete it), then removes what is provably
        // superseded. Idempotent — re-running a crashed gc converges.
        val (restored, promoted, swept) = IndexStore.gcStaging(spark, path)
        s"""{"mode":"gc","restored":$restored,"promoted":$promoted,"swept":$swept,"index":"$path"}"""

      case "compact-sketches" :: path :: Nil =>
        // Materialize the max/add folds and rewrite each grid once —
        // file-count hygiene after a long crawl (readers fold either
        // way); same staged rename-swap contract as compact-grams.
        val before = spark.read.parquet(s"$path/sketch/registers").count()
        IndexStore.compactSketchIndex(spark, path)
        val after = spark.read.parquet(s"$path/sketch/registers").count()
        s"""{"mode":"compact-sketches","register_rows_before":$before,"register_rows_after":$after,"index":"$path"}"""

      case "build-ivfpq" :: embDir :: path :: Nil =>
        // The IVFADC layout (coarse routing over position codes) as a
        // standing artifact: q132/q173's build step, paid once.
        val emb = loadEmb(spark, embDir)
        val n = emb.count()
        IndexStore.saveIvfPqIndex(emb, path)
        val cells = spark.read.parquet(s"$path/ivfpq/codes")
          .select(col("ccid")).distinct().count()
        s"""{"mode":"build-ivfpq","vectors":$n,"cells":$cells,"index":"$path"}"""

      case "fused-search" :: docsDir :: embDir :: path :: rest =>
        // q173's read path as a CLI: hybrid retrieval for every query id,
        // sparse postings from <docsDir>, dense leg ADC-served from the
        // persisted IVFPQ store at <path> (probed cells only), RRF-fused.
        val probe = rest.sliding(2)
          .collectFirst { case List("--probe", v) => v.toInt }.getOrElse(3)
        val fused = operators.Vectors.rrfFused(
            operators.TextOps.sparseRanked(spark, docsDir),
            IndexStore.denseRankedFrom(loadEmb(spark, embDir), path,
              probeCoarse = probe))
          .orderBy("qid", "frk")
          .collect() // bounded: ≤ RetrQ · RetrK rows by construction
        val byQ = fused.groupBy(_.getLong(0)).toSeq.sortBy(_._1).map {
          case (qid, rows) =>
            val hits = rows.sortBy(_.getLong(1)).map { r =>
              s"""{"frk":${r.getLong(1)},"doc_id":${r.getLong(2)},"rrf":${r.getDouble(5)}}"""
            }.mkString(",")
            s"""{"qid":$qid,"hits":[$hits]}"""
        }.mkString(",")
        s"""{"mode":"fused-search","probe":$probe,"queries":[$byQ]}"""

      case "compact-grams" :: path :: Nil =>
        // The crawl loop's third verb: after N appends the gram index
        // holds up to N duplicate rows per re-seen gram and N files per
        // touched partition; compaction min-combines and rewrites once
        // (staged rename-swap: single-writer, crash-repairing; a racing
        // reader sees old or new, or briefly no table mid-swap — retry).
        // Covers the provenance extension's postings/sources when present.
        val before = IndexStore.loadGramIndex(spark, path).count()
        IndexStore.compactGramIndex(spark, path)
        val after = IndexStore.loadGramIndex(spark, path).count()
        s"""{"mode":"compact-grams","rows_before":$before,"rows_after":$after,"index":"$path"}"""

      case "compact-lsh" :: path :: Nil =>
        // File-count + sort hygiene after a run of `dedupe --append-kept`
        // batches (rows disjoint across appends — no merge math); same
        // staged rename-swap contract as compact-grams.
        val before = IndexStore.loadLshBands(spark, path).count()
        IndexStore.compactLshIndex(spark, path)
        val after = IndexStore.loadLshBands(spark, path).count()
        s"""{"mode":"compact-lsh","band_rows_before":$before,"band_rows_after":$after,"index":"$path"}"""

      case "compact-phash" :: path :: Nil =>
        val before = IndexStore.loadPhashBands(spark, path).count()
        IndexStore.compactPhashIndex(spark, path)
        val after = IndexStore.loadPhashBands(spark, path).count()
        s"""{"mode":"compact-phash","band_rows_before":$before,"band_rows_after":$after,"index":"$path"}"""

      case "compact-pq" :: path :: Nil =>
        val before = spark.read.parquet(s"$path/pq/codes").count()
        IndexStore.compactPqIndex(spark, path)
        val after = spark.read.parquet(s"$path/pq/codes").count()
        s"""{"mode":"compact-pq","codes_before":$before,"codes_after":$after,"index":"$path"}"""

      case "compact-ivf" :: path :: Nil =>
        val before = spark.read.parquet(s"$path/ivf/vectors").count()
        IndexStore.compactIvfIndex(spark, path)
        val after = spark.read.parquet(s"$path/ivf/vectors").count()
        s"""{"mode":"compact-ivf","vectors_before":$before,"vectors_after":$after,"index":"$path"}"""

      case "compact-winnow" :: path :: Nil =>
        val before = spark.read.parquet(s"$path/winnow/buckets").count()
        IndexStore.compactWinnowIndex(spark, path)
        val after = spark.read.parquet(s"$path/winnow/buckets").count()
        s"""{"mode":"compact-winnow","buckets_before":$before,"buckets_after":$after,"index":"$path"}"""

      case "provenance" :: path :: rest =>
        // q167's standing report, corpus never touched (q171's read path):
        // who shadows whom, straight off the persisted postings.
        val out = rest.sliding(2).collectFirst { case List("--out", v) => v }
        val mx = IndexStore.shadowMatrixFrom(spark, path)
          .localCheckpoint(true) // stats + optional write read it twice
        val stats = mx.agg(count(lit(1)).as("cells"),
            coalesce(sum("n_grams"), lit(0L)).as("n_grams"),
            coalesce(max("n_grams"), lit(0L)).as("max_cell"))
          .head()
        out.foreach(o => mx.write.mode("overwrite").parquet(o))
        s"""{"mode":"provenance","cells":${stats.getLong(0)},"n_grams":${stats.getLong(1)},"max_cell":${stats.getLong(2)}${out.map(o => s""","out":"$o"""").getOrElse("")}}"""

      case "authority" :: path :: rest =>
        // q172's read path: fixed-point source authority over the store's
        // shadow edges; node set from the persisted source map.
        val out = rest.sliding(2).collectFirst { case List("--out", v) => v }
        val rank = operators.Audit.authority(
            IndexStore.shadowMatrixFrom(spark, path)
              .select(col("src_later").as("src"), col("src_first").as("dst"),
                col("n_grams").as("w")),
            IndexStore.loadDocSources(spark, path).select("source").distinct())
          .localCheckpoint(true) // stats + optional write read it twice
        // headOption, not head: an empty store (build over an empty docs
        // dir) must answer sources:0, not crash opaquely (ADVICE r14).
        val top = rank.orderBy(col("authority").desc, col("source"))
          .limit(1).collect().headOption
        val n = rank.count()
        out.foreach(o => rank.write.mode("overwrite").parquet(o))
        val topJson = top.map(t =>
          s""","top":"${t.getString(0)}","top_rank":${t.getLong(1)}""").getOrElse("")
        s"""{"mode":"authority","sources":$n$topJson${out.map(o => s""","out":"$o"""").getOrElse("")}}"""

      case "components" :: path :: rest =>
        // q47/q58's workflow off the store: the edge set is the same
        // Jaccard pair scan (floor-free), then the pointer-jumping rounds.
        val tau = rest.sliding(2).collectFirst { case List("--tau", v) => v.toDouble }
          .getOrElse(operators.Dedup.JaccardTau)
        val comp = operators.Dedup.connectedComponents(
          operators.Dedup.jaccardPairsFrom(
            IndexStore.loadPairBuckets(spark, path), tau).select("a", "b"))
        val stats = comp.groupBy("lbl").count()
          .agg(count(lit(1)).as("n_components"),
            coalesce(sum("count"), lit(0L)).as("n_docs"),
            coalesce(max("count"), lit(0L)).as("largest"))
          .head()
        s"""{"mode":"components","tau":$tau,"n_components":${stats.getLong(0)},"n_docs":${stats.getLong(1)},"largest":${stats.getLong(2)}}"""

      case other => sys.error(
        s"usage: build-lsh|dedupe|build-ivf|append-ivf|search|build-pq|append-pq|search-pq|build-pairs|append-pairs|audit|build-winnow|append-winnow|winnow-audit|winnow-check|build-phash|phash-dedupe|phash-audit|phash-search|build-grams|strip-batch|compact-grams|compact-lsh|compact-phash|compact-pq|compact-ivf|compact-winnow|build-ivfpq|fused-search|build-provenance|append-provenance|provenance|authority|build-sketches|append-sketches|sketch-report|cms-lookup|compact-sketches|build-lm|append-lm|lm-report|compact-lm|gc|components|consolidate|consolidate-phash|build-registry|decontam ... (got $other)")
    }

  /** JSON string literal for ARBITRARY corpus text (ADVICE r15): unlike
    * the fixed-alphabet lang/source values interpolated elsewhere, a
    * heavy-hitter word or CLI token can contain quotes, backslashes, or
    * control characters — escape per RFC 8259 before interpolation. */
  private def jstr(s: String): String = Json.str(s)

  /** (vec_id, en) normalized from an embeddings.parquet dir — the load
    * every vector-index mode shares. */
  private def loadEmb(spark: org.apache.spark.sql.SparkSession,
      embDir: String): org.apache.spark.sql.DataFrame =
    operators.Vectors.withNormalized(
        spark.read.parquet(s"$embDir/embeddings.parquet")
          .select(col("vec_id"),
            col("embedding").cast("array<double>").as("e"), col("label")))
      .select(col("vec_id"), col("en"))
}
