package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Persisted index state for the incremental operators — the production
  * gap the r6 verdict named: q80 derives the standing corpus's LSH band
  * index in-query each run, and q34/q77/q81/q83 rebuild IVF centroids per
  * query. A real pipeline computes that state ONCE per corpus build and
  * has every subsequent batch / query reuse it, so the per-batch cost
  * depends on the BATCH, not on re-deriving the corpus.
  *
  * Layout (all plain parquet — portable, no metastore dependency):
  *
  *   <path>/lsh/bands/        (doc_id, bi, bh) partitioned by pfx (the
  *                            first 2 hex chars of bh: 256 dirs), rows
  *                            sorted by bh within partitions
  *   <path>/lsh/shingles/     (doc_id, s) DISTINCT per doc, sorted by
  *                            doc_id within partitions
  *   <path>/ivf/coarse/       the 1-row coarse-centroid array `cc`
  *   <path>/ivf/cells/        (ccid, fc) fine-centroid lists
  *   <path>/ivf/vectors/      (vec_id, en, cid) partitioned by ccid
  *   <path>/pairs/buckets/    (s, ds) the inverted index — one row per
  *                            DISTINCT shingle, ds its sorted doc_id set
  *                            capped at MaxDf + 1 (df-1 rows and over-cap
  *                            markers kept so batch merges stay correct;
  *                            audits read the [2, MaxDf] slice)
  *   <path>/lm/unigrams/      (w, c) the frozen reference unigram LM
  *   <path>/pq/codebook/      the 1-row per-subspace codebook `cb`
  *   <path>/pq/codes/         (vec_id, codes) PqM codeword ids per vector
  *   <path>/ivfpq/coarse/     routing copy of the coarse-centroid array
  *   <path>/ivfpq/codebook/   whole-corpus PQ codebook (1 row)
  *   <path>/ivfpq/codes/      (vec_id, codes) partitioned by ccid
  *   <path>/sketch/registers/ (grp, idx, r) per-lang HLL registers —
  *                            MAX-fold on load
  *   <path>/sketch/cells/     (source, j, c, cc) per-source CMS grids —
  *                            ADD-fold on load
  *   <path>/sketch/totals/    (source, n) per-source word totals —
  *                            ADD-fold on load
  *   <path>/sketch/lens/      (source, bin, cnt) fixed-bin doc-length
  *                            histogram — ADD-fold on load
  *   <path>/merkle/leaves/    (source, pos, h) per-doc digests, pos =
  *                            doc_id — append-only
  *   <path>/merkle/nodes/     (source, pos, h) upper tree, partitioned
  *                            by lvl (L1..L9) — rebuilt from leaf hashes
  *                            on append (n/15–n/4 rows; see Merkle.scala
  *                            on source interleaving)
  *
  * Scale posture:
  *   - Incremental dedup against the store joins the persisted band index
  *     to the (small) batch's bands on (pfx, bi, bh). The batch side is
  *     AQE-broadcast, so the corpus index NEVER shuffles; pfx is the
  *     partition column, so the batch's ≤ Bands·|batch| distinct prefixes
  *     dynamically prune the index read — per-batch shuffle volume is
  *     O(batch), per-batch IO is the pruned index slice plus one narrow
  *     corpus-shingle scan restricted (broadcast) to candidate docs.
  *   - State update is APPEND-ONLY: a kept batch's band/shingle rows land
  *     in the same partition layout (`appendLshBatch`), so corpus build
  *     cost is paid once, never per batch.
  *   - IVF search reads the two centroid tables (N^(1/4)-sized) and ONE
  *     ccid partition of the vector table (pruned by the partition
  *     column), then min/max row-group stats on the cid-sorted rows — a
  *     per-query read that shrinks as N^(3/4)/N of the corpus, vs the
  *     in-query q34 path that scans and assigns every vector per query.
  *
  * Reference: aatlasis/cve_manager keeps its analogous standing state (the
  * CVE warehouse) in PostgreSQL tables loaded once and queried repeatedly
  * (cve_manager.py:335-360 load, 387-504 query); this is that
  * load-once/query-many contract for the dedup/ANN state.
  */
object IndexStore {

  /** Store-build writer parallelism (VERDICT r14 #1). Hash-repartitioning
    * on the bare partition prefix funnels the FULL table through ≤|pfx|
    * writer tasks (64 for the gram stores, 17 for phash) — invisible at
    * sf0.1, a wall-clock scale-killer for a one-time 100 TB build (~1.5 TB
    * per task while the rest of the cluster idles). Builds instead
    * RANGE-partition on (pfx, <high-cardinality key>) at this explicit
    * width (`buildRepartition` — see there for why range, not hash), so
    * write parallelism tracks the cluster
    * (`spark.sql.shuffle.partitions`, the same sizing knob every other
    * shuffle here uses) while `partitionBy(pfx)` read-pruning is
    * untouched; each writer task holds a contiguous (pfx, key) range, so
    * file count tracks P + |pfx| and each file is internally sorted (the
    * explicit sort LEADS with pfx so the dynamic-partition writer adds no
    * sort of its own) — per-file row-group stats still serve point reads.
    * Compaction owns the file-count budget. */
  private def writeParallelism(spark: SparkSession): Int =
    spark.sessionState.conf.numShufflePartitions

  /** The widened build exchange: RANGE partition on (partition col, key)
    * at `writeParallelism` width. Range, not hash — a hash spread gives
    * every writer task rows of ~every pfx, so a P-task build emits up to
    * P·|pfx| files (8,192 at P=128 locally, ~10⁵ on a real cluster —
    * measured 3-4× slower than the old funnel at small scale on file
    * creation alone); contiguous ranges give each task ≤ 2 pfx
    * boundaries, so file count tracks P + |pfx| while parallelism tracks
    * the cluster. The follow-up sort within partitions still LEADS with
    * the partition column, so the dynamic-partition writer adds no sort
    * of its own and per-file row-group stats serve point reads. */
  private def buildRepartition(df: DataFrame, partCol: String,
      key: String): DataFrame =
    df.repartitionByRange(writeParallelism(df.sparkSession),
      col(partCol), col(key))

  // ── MinHash-LSH band index + shingle state ──

  /** Band rows with the partition prefix: (doc_id, bi, bh, pfx). pfx is
    * LETTER-PREFIXED ("p" + first 2 hex chars): Spark's partition-column
    * type inference unifies the column type across all partition values,
    * and a small index whose band hashes happened to produce only numeric
    * prefixes would otherwise come back as INT ("07" → 7 → "7"), silently
    * breaking the prefix equi-join against the batch's string pfx. */
  private def bandRows(docs: DataFrame): DataFrame =
    Dedup.bandExplode(Dedup.lshBands(Dedup.minhashSignatures(docs)))
      .withColumn("pfx", concat(lit("p"), substring(col("bh"), 1, 2)))

  /** Build the standing corpus's LSH state at `path` (one-time, linear:
    * the same zero-shuffle signature scan q23 uses, plus one distinct for
    * the shingle sets). */
  def saveLshIndex(docs: DataFrame, path: String): Unit = {
    buildRepartition(bandRows(docs), "pfx", "bh")
      .sortWithinPartitions("pfx", "bh", "bi", "doc_id")
      .write.mode("overwrite").partitionBy("pfx").parquet(s"$path/lsh/bands")
    // Repartition by doc_id BEFORE the set-dedup (r17, guide §2.4):
    // hashpartitioning(doc_id) satisfies the distinct's clustering
    // requirement on (doc_id, s), so the dedup aggregation reuses this
    // exchange and the old second full shuffle of the shingle table
    // (distinct by (doc_id, s), then repartition(doc_id) for read
    // locality) collapses to one. Same rows, same doc_id-clustered
    // layout for the candidate-restricted reads.
    Dedup.shinglesRaw(docs)
      .repartition(col("doc_id"))
      .distinct()
      .sortWithinPartitions("doc_id")
      .write.mode("overwrite").parquet(s"$path/lsh/shingles")
  }

  /** Append a (kept) batch's band + shingle rows into the standing state —
    * the per-batch state update; same layout, no rewrite of prior data. */
  def appendLshBatch(batch: DataFrame, path: String): Unit = {
    bandRows(batch)
      .sortWithinPartitions("bh", "bi", "doc_id")
      .write.mode("append").partitionBy("pfx").parquet(s"$path/lsh/bands")
    Dedup.shingles(batch)
      .write.mode("append").parquet(s"$path/lsh/shingles")
  }

  /** (doc_id, bi, bh, pfx) — pfx comes back as the partition column. */
  def loadLshBands(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path/lsh/bands")
      .select(col("doc_id"), col("bi").cast("int").as("bi"), col("bh"),
        col("pfx").cast("string").as("pfx"))

  def loadLshShingles(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path/lsh/shingles")

  /** q80's decision over PERSISTED state: dedupe `batch` against the
    * standing corpus's band index + shingle sets, and against earlier-id
    * batch docs — without re-pairing (or re-reading the text of) the
    * corpus. Returns (doc_id, dup_of, keep) for every batch doc, exactly
    * q80's contract; `IndexStoreSpec` pins the equivalence against the
    * in-query q80 result.
    *
    * The corpus side of the candidate join is the persisted index scan —
    * the batch side is small, AQE broadcasts it, and the join carries the
    * pfx partition column so the scan prunes to the batch's band-key
    * prefixes. Verification restricts corpus shingles to candidate docs
    * (broadcast) BEFORE any set operation — the q23/q80 narrowing. */
  def incrementalDedup(batch: DataFrame, corpusBands: DataFrame,
      corpusShingles: DataFrame): DataFrame = {
    val batchBx = bandRows(batch)
    val cb =
      if (corpusBands.columns.contains("pfx")) corpusBands
      else corpusBands.withColumn("pfx", concat(lit("p"), substring(col("bh"), 1, 2)))
    // a ≠ b: a replayed batch doc whose id already stands in the index
    // must not self-match at Jaccard 1 (the streaming twin's mid != id
    // rule — batch and stream agree on replays).
    val candCorpus = cb.as("x").join(batchBx.as("y"),
        col("x.pfx") === col("y.pfx") && col("x.bi") === col("y.bi") &&
          col("x.bh") === col("y.bh") && col("x.doc_id") =!= col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
    val candBatch = batchBx.as("x").join(batchBx.as("y"),
        col("x.bi") === col("y.bi") && col("x.bh") === col("y.bh") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
    val cand = candCorpus.unionByName(candBatch).distinct()
    // Persisted shingles are already distinct per doc; the batch brings its
    // raw shingles — verifyJaccard set-dedupes AFTER the candidate-doc
    // restriction either way.
    val sh = corpusShingles.unionByName(Dedup.shinglesRaw(batch))
    val dup = Dedup.verifyJaccard(cand, sh)
      .filter(col("jaccard") >= Dedup.IncTau)
      .groupBy(col("b").as("doc_id")).agg(min("a").as("dup_of"))
    batch.select("doc_id")
      .join(dup, Seq("doc_id"), "left")
      .select(col("doc_id"), col("dup_of"),
        when(col("dup_of").isNull, 1).otherwise(0).as("keep"))
  }

  // ── cross-document gram (exact-substring) index — q148's at-rest form ──

  /** Partition prefix for the gram index: letter-prefixed low-6-bits
    * bucket of the 60-bit gram hash (64 dirs). Letter prefix for the same
    * reason as the LSH pfx: numeric-looking partition values come back
    * type-inferred and break the string equi-join. */
  private def gramPfx: org.apache.spark.sql.Column =
    concat(lit("g"), pmod(col("gh"), lit(64L)).cast("string"))

  /** Build the standing corpus's gram→min-doc index at `path` (one-time,
    * linear — the q148 gram scan into a min() aggregation). Unlike the
    * in-query q148, the persisted index keeps EVERY distinct gram, not
    * just df>1 ones: a standing gram with a single occurrence can still
    * cover a future batch's copy of the same run. */
  def saveGramIndex(docs: DataFrame, path: String): Unit =
    buildRepartition(Dedup.gramRows(docs)
      .groupBy("gh").agg(min("doc_id").as("first_doc"))
      .withColumn("pfx", gramPfx), "pfx", "gh")
      .sortWithinPartitions("pfx", "gh")
      .write.mode("overwrite").partitionBy("pfx").parquet(s"$path/grams/index")

  /** Append a (kept) batch's gram mins — no rewrite of prior data. A gram
    * already present lands as a SECOND (gh, first_doc) row; readers take
    * min over matched rows (crossdocStripBatch), so appends never need a
    * compaction to stay correct. */
  def appendGramBatch(batch: DataFrame, path: String): Unit =
    Dedup.gramRows(batch)
      .groupBy("gh").agg(min("doc_id").as("first_doc"))
      .withColumn("pfx", gramPfx)
      .sortWithinPartitions("gh")
      .write.mode("append").partitionBy("pfx").parquet(s"$path/grams/index")

  /** (gh, first_doc, pfx) — pfx comes back as the partition column;
    * duplicate gh rows possible after appends (min-combine on read). */
  def loadGramIndex(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path/grams/index")
      .select(col("gh"), col("first_doc"), col("pfx").cast("string").as("pfx"))

  /** q148's decision over PERSISTED state: strip from `batch` every
    * CrossN-gram span whose first occurrence lives in the standing corpus
    * OR in an earlier-id batch doc — without re-scanning (or re-hashing)
    * the corpus text. Equivalent to crossdocStrip over standing ∪ batch
    * restricted to batch docs (IndexStoreSpec pins it). The batch's
    * distinct gram keys broadcast into the index scan (the corpus index
    * never shuffles; the join carries the pfx partition column so the
    * scan prunes to the batch's buckets); min-aggregation over MATCHED
    * rows only both shrinks the work to the batch's grams and absorbs
    * append-duplicate index rows. A replayed batch doc whose id already
    * stands in the index never self-covers: the strict doc_id > first_doc
    * guard is the a ≠ b rule of the LSH/phash twins. */
  def crossdocStripBatch(batch: DataFrame, index: DataFrame): DataFrame = {
    val n = Dedup.CrossN
    val bg = Dedup.gramRows(batch)
    val internal = bg.groupBy("gh").agg(min("doc_id").as("fd_b"))
    val idx =
      if (index.columns.contains("pfx")) index
      else index.withColumn("pfx", gramPfx)
    val bkeys = bg.select("gh").distinct().withColumn("pfx", gramPfx)
    val matched = idx.join(broadcast(bkeys), Seq("pfx", "gh"))
      .groupBy("gh").agg(min("first_doc").as("fd_s"))
    val fd = internal.join(matched, Seq("gh"), "left")
      .select(col("gh"),
        least(coalesce(col("fd_s"), col("fd_b")), col("fd_b")).as("first_doc"))
    val cov = bg.join(fd, Seq("gh"))
      .filter(col("doc_id") > col("first_doc"))
      .select(col("doc_id"), explode(expr(s"sequence(i, i + ${n - 1})")).as("ci"))
      .distinct()
    Dedup.stripCovered(batch, cov)
  }

  // ── provenance extension of the gram store (q167/q170's at-rest form) ──

  /** Persist the gram store WITH its provenance extension at `path`
    * (VERDICT r13 #1): alongside the gram→min-doc index,
    *
    *   <path>/grams/postings/  (gh, doc_id, cnt) — occurrence counts per
    *                           (gram, doc), the classic inverted-index
    *                           posting row, partitioned by the same
    *                           64-way gram pfx as the index
    *   <path>/docs/sources/    the slim (doc_id, source) map
    *
    * The corpus TEXT is gram-scanned exactly once: the postings write is
    * that scan, the gram index derives FROM the persisted postings (min
    * over posting doc_ids == min over raw occurrences), and the source
    * map is a two-column pruned metadata read. A store built here serves
    * q151's strip-batch AND the provenance/authority family — the
    * crawl-loop story where the matrix is a standing report, not a
    * per-query corpus re-scan. */
  def saveProvenanceIndex(docs: DataFrame, path: String): Unit = {
    // One gram scan, barrier'd (the appendProvenanceBatch discipline,
    // applied to the build in r17): both tables derive from the same
    // materialized postings frame — the pre-r17 build wrote postings,
    // then RE-READ the persisted table to derive the index, paying a
    // second store listing/decode plus re-aggregation of rows it had
    // just held. The barrier is postings-sized (same order as the range
    // exchange the write pays anyway) and spills to executor disk.
    val postings = Dedup.gramRows(docs)
      .groupBy("gh", "doc_id").agg(count(lit(1)).as("cnt"))
      .withColumn("pfx", gramPfx)
      .localCheckpoint(true)
    buildRepartition(postings, "pfx", "gh")
      .sortWithinPartitions("pfx", "gh", "doc_id")
      .write.mode("overwrite").partitionBy("pfx").parquet(s"$path/grams/postings")
    buildRepartition(postings
      .groupBy("gh").agg(min("doc_id").as("first_doc"))
      .withColumn("pfx", gramPfx), "pfx", "gh")
      .sortWithinPartitions("pfx", "gh")
      .write.mode("overwrite").partitionBy("pfx").parquet(s"$path/grams/index")
    // The slim (doc_id, source) map writes at the scan's own width — the
    // old repartition(8) added a shuffle AND funneled a 10^10-row map
    // through 8 writers at scale (r17, guide §2.4).
    docs.select(col("doc_id"), col("source"))
      .write.mode("overwrite").parquet(s"$path/docs/sources")
  }

  /** Append a batch's postings/index/source rows — no rewrite of prior
    * data (batch doc_ids disjoint from stored ids, as with every append
    * here). Index rows min-combine on read; posting rows are naturally
    * disjoint per (gh, doc_id). The batch text is gram-scanned exactly
    * once (the build path's scan-once discipline, ADVICE r14): the
    * postings frame is barrier'd (batch-sized) and the appended index
    * rows derive FROM it — min over posting doc_ids == min over raw
    * occurrences. */
  def appendProvenanceBatch(batch: DataFrame, path: String): Unit = {
    val postings = Dedup.gramRows(batch)
      .groupBy("gh", "doc_id").agg(count(lit(1)).as("cnt"))
      .withColumn("pfx", gramPfx)
      .localCheckpoint(true)
    postings
      .sortWithinPartitions("pfx", "gh", "doc_id")
      .write.mode("append").partitionBy("pfx").parquet(s"$path/grams/postings")
    postings
      .groupBy("gh").agg(min("doc_id").as("first_doc"))
      .withColumn("pfx", gramPfx)
      .sortWithinPartitions("pfx", "gh")
      .write.mode("append").partitionBy("pfx").parquet(s"$path/grams/index")
    batch.select(col("doc_id"), col("source"))
      .write.mode("append").parquet(s"$path/docs/sources")
  }

  /** Staged rename-swap rewrite of one store table — the shared core of
    * every compaction verb. The rewrite goes to a sibling
    * `<table>.compact` directory and is swapped in by two renames
    * (cur → old, compact → cur): the store is never read-and-overwritten
    * in one plan and no corpus-sized frame is ever held on the driver.
    * Contract (ADVICE r14): compaction is a SINGLE-WRITER maintenance
    * verb; a reader racing the swap sees either the old or the new table,
    * except for the brief window between the two renames where the table
    * path is absent (a racing read there fails and should retry). A crash
    * inside that window strands the only copy at `<table>.old` — every
    * swap entry REPAIRS that first (restore old → cur when cur is
    * missing), so re-running the interrupted compaction heals the store.
    * When `partCol` is set the rewrite range-partitions on
    * (partCol, sortCols.head) at `writeParallelism` width — build-parity
    * write fan-out and file-count shape (`buildRepartition`) — and the
    * sort leads with the partition column; otherwise a flat rewrite
    * sorted by `sortCols`, `parts` wide (0 = `writeParallelism`, the
    * cluster-tracking default). */
  private def swapRewrite(spark: SparkSession, tablePath: String,
      compacted: => DataFrame, sortCols: Seq[String],
      partCol: Option[String], parts: Int = 0,
      rangeKeyed: Boolean = false): Unit = {
    import org.apache.hadoop.fs.Path
    val conf = spark.sparkContext.hadoopConfiguration
    val cur = new Path(tablePath)
    val fs = cur.getFileSystem(conf)
    val tmp = new Path(tablePath + ".compact")
    val old = new Path(tablePath + ".old")
    if (!fs.exists(cur) && fs.exists(old))
      require(fs.rename(old, cur), s"crash recovery $old -> $cur failed")
    if (!fs.exists(cur)) return
    fs.delete(tmp, true); fs.delete(old, true)
    val w0 = partCol match {
      case Some(pc) =>
        buildRepartition(compacted, pc, sortCols.head)
          .sortWithinPartitions((pc +: sortCols).map(col): _*)
          .write.partitionBy(pc)
      case None =>
        // rangeKeyed: contiguous sortCols ranges per file, so per-file
        // min/max stats keep serving range predicates after the rewrite
        // (the merkle leaf table's tail-append path reads `pos >= floor`).
        // Width tracks the cluster (writeParallelism) but never EXCEEDS
        // the standing file count: compacting a table with fewer files
        // than shuffle partitions used to re-spread it WIDER — a file-
        // count increase from a verb whose contract is folding appends
        // (surfaced when the test session went 2 → 8 cores, r18).
        val nFiles = {
          val it = fs.listFiles(cur, true)
          var n = 0
          while (it.hasNext) {
            if (it.next().getPath.getName.startsWith("part-")) n += 1
          }
          n
        }
        val width = if (parts > 0) parts
          else math.max(1, math.min(writeParallelism(spark), nFiles - 1))
        val r =
          if (rangeKeyed) compacted.repartitionByRange(width,
            sortCols.map(col): _*)
          else compacted.repartition(width)
        (if (sortCols.isEmpty) r
         else r.sortWithinPartitions(sortCols.map(col): _*)).write
    }
    w0.mode("overwrite").parquet(tmp.toString)
    require(fs.rename(cur, old), s"swap $cur -> $old failed")
    require(fs.rename(tmp, cur), s"swap $tmp -> $cur failed")
    fs.delete(old, true)
  }

  /** Retention sweep for a store directory (`Index gc` — VERDICT r15 #3):
    * appends and compactions never delete, so what a long-lived store
    * accumulates is `swapRewrite`'s staged siblings after crashes —
    * `<table>.old` (a crash between the two renames strands the only
    * copy there) and `<table>.compact` (a crash before the first rename
    * strands the finished rewrite). The sweep applies the SAME repair
    * rule every swap entry applies, then deletes what is provably
    * superseded — nothing current is ever touched:
    *   - `<t>.old`  with `<t>` missing → RESTORE (rename to `<t>`): it
    *     is the only copy; deleting it would destroy the table.
    *   - `<t>.old`  with `<t>` present → delete (the swap completed; the
    *     old copy is superseded).
    *   - `<t>.compact` with `<t>` missing and no `<t>.old` → PROMOTE
    *     (not reachable from any single crash, but if found it is the
    *     only copy — same never-delete-the-last-copy rule).
    *   - `<t>.compact` with `<t>` present → delete (a staged rewrite
    *     that never swapped in, or one that completed).
    * Idempotent and crash-re-runnable: every action is one rename or one
    * delete, and re-running converges to a clean tree. Walks directories
    * only (parquet part files are never suffixed); store trees are a few
    * hundred dirs at most (pfx/lvl partitions), so the walk is a
    * metadata-only driver loop. Returns (restored, promoted, swept). */
  def gcStaging(spark: SparkSession, path: String): (Int, Int, Int) = {
    import org.apache.hadoop.fs.Path
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return (0, 0, 0)
    var restored = 0; var promoted = 0; var swept = 0
    def walk(dir: Path): Unit = {
      val kids = fs.listStatus(dir).filter(_.isDirectory)
      // repair .old FIRST: a .compact decision depends on whether the
      // base exists, and restoring .old is what makes it exist again
      kids.filter(_.getPath.getName.endsWith(".old")).foreach { st =>
        val base = new Path(dir,
          st.getPath.getName.stripSuffix(".old"))
        if (!fs.exists(base)) {
          require(fs.rename(st.getPath, base),
            s"gc restore ${st.getPath} -> $base failed")
          restored += 1
        } else { fs.delete(st.getPath, true); swept += 1 }
      }
      kids.filter(_.getPath.getName.endsWith(".compact")).foreach { st =>
        val base = new Path(dir,
          st.getPath.getName.stripSuffix(".compact"))
        if (!fs.exists(base)) {
          require(fs.rename(st.getPath, base),
            s"gc promote ${st.getPath} -> $base failed")
          promoted += 1
        } else { fs.delete(st.getPath, true); swept += 1 }
      }
      kids.filterNot(k => k.getPath.getName.endsWith(".old") ||
          k.getPath.getName.endsWith(".compact"))
        .foreach(k => walk(k.getPath))
    }
    walk(root)
    (restored, promoted, swept)
  }

  /** Compact the gram index — and, when present, the provenance
    * extension's postings and source map — after a run of appends (the
    * crawl loop's third verb). Appends keep the store CORRECT without
    * rewrites (duplicate gh index rows min-combine on read, posting rows
    * are disjoint per (gh, doc)), but each append adds one file per
    * touched pfx partition and one duplicate index row per re-seen gram,
    * so a long crawl's read amplification grows with BATCH COUNT.
    * Compaction rewrites each table once: index rows min-combined to one
    * row per gh, partitions re-sorted (restoring the row-group stats that
    * make point reads cheap), staged rename-swap (single-writer, crash-
    * repairing — see `swapRewrite`). Readers are unchanged: the rewrite
    * is exactly the read path's merge, materialized. */
  def compactGramIndex(spark: SparkSession, path: String): Unit = {
    swapRewrite(spark, s"$path/grams/index",
      loadGramIndex(spark, path)
        .groupBy("gh").agg(min("first_doc").as("first_doc"))
        .withColumn("pfx", gramPfx),
      Seq("gh"), Some("pfx"))
    swapRewrite(spark, s"$path/grams/postings",
      loadGramPostings(spark, path).select("gh", "doc_id", "cnt", "pfx"),
      Seq("gh", "doc_id"), Some("pfx"))
    swapRewrite(spark, s"$path/docs/sources",
      loadDocSources(spark, path).select("doc_id", "source"),
      Nil, None, parts = 8)
  }

  /** Compact the LSH store after a run of `appendLshBatch`es: band and
    * shingle rows are disjoint across appends (no merge math needed) —
    * compaction is pure file-count + sort hygiene, restoring one sorted
    * file set per partition so the band join's row-group stats and the
    * shingle scan's doc_id locality match a fresh build. Same staged
    * rename-swap contract as `compactGramIndex`. */
  def compactLshIndex(spark: SparkSession, path: String): Unit = {
    swapRewrite(spark, s"$path/lsh/bands",
      loadLshBands(spark, path).select("doc_id", "bi", "bh", "pfx"),
      Seq("bh", "bi", "doc_id"), Some("pfx"))
    swapRewrite(spark, s"$path/lsh/shingles",
      loadLshShingles(spark, path),
      Seq("doc_id"), None)
  }

  /** Compact the phash store after `appendPhashBatch`es — band rows and
    * grid rows are disjoint across appends; rewrite restores per-file
    * sort and one file set per partition. */
  def compactPhashIndex(spark: SparkSession, path: String): Unit = {
    swapRewrite(spark, s"$path/phash/bands",
      loadPhashBands(spark, path)
        .select("doc_id", "pixels", "bi", "key", "pfx"),
      Seq("key", "bi", "doc_id"), Some("pfx"))
    swapRewrite(spark, s"$path/phash/grid",
      loadPhashGrid(spark, path),
      Seq("doc_id"), None)
  }

  /** Compact the PQ code table after `appendPqBatch`es (codes are
    * disjoint per vec_id; the codebook is 1 row and never appended). */
  def compactPqIndex(spark: SparkSession, path: String): Unit =
    swapRewrite(spark, s"$path/pq/codes",
      spark.read.parquet(s"$path/pq/codes"),
      Seq("vec_id"), None)

  /** Compact the IVF vector table after `appendIvfBatch`es — restores the
    * (cid, vec_id) sort whose row-group stats `searchIvf`'s point reads
    * prune on, and one file set per ccid partition. */
  def compactIvfIndex(spark: SparkSession, path: String): Unit =
    swapRewrite(spark, s"$path/ivf/vectors",
      spark.read.parquet(s"$path/ivf/vectors")
        .select(col("vec_id"), col("en"), col("cid"),
          col("ccid").cast("long").as("ccid")),
      Seq("cid", "vec_id"), Some("ccid"))

  /** Compact the winnow bucket table. `appendWinnowBatch` is a keyed
    * MERGE that already rewrites the table (no per-append file growth) —
    * this verb exists for layout hygiene after external copies or to
    * re-fold a table written at a wider parallelism (the rewrite width
    * never exceeds the standing file count — see swapRewrite). */
  def compactWinnowIndex(spark: SparkSession, path: String): Unit =
    swapRewrite(spark, s"$path/winnow/buckets",
      spark.read.parquet(s"$path/winnow/buckets"),
      Seq("fp"), None)

  /** (gh, doc_id, cnt, pfx) — pfx comes back as the partition column. */
  def loadGramPostings(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path/grams/postings")
      .select(col("gh"), col("doc_id"), col("cnt"),
        col("pfx").cast("string").as("pfx"))

  /** The persisted (doc_id, source) map. */
  def loadDocSources(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path/docs/sources")

  /** q167's matrix answered FROM the persisted store — the corpus text is
    * never touched (IndexStoreSpec pins the executed plan to store scans
    * only): the min-combined gram index keys the covered-posting join
    * (gh-keyed, linear in postings — the one posting-sized shuffle), the
    * slim source map joins in by doc_id, and the output collapses to
    * ≤ |sources|² rows. Equivalent to `Audit.shadowMatrix` over the same
    * corpus: a unique gram's only posting is its own first_doc, so the
    * in-query df>1 index filter changes nothing, and sum(cnt) over
    * postings equals the per-occurrence count. */
  def shadowMatrixFrom(spark: SparkSession, path: String): DataFrame = {
    val fd = loadGramIndex(spark, path)
      .groupBy("gh").agg(min("first_doc").as("first_doc"))
    val cov = loadGramPostings(spark, path)
      .join(fd, Seq("gh"))
      .filter(col("doc_id") > col("first_doc"))
    val srcs = loadDocSources(spark, path)
    cov
      .join(srcs.select(col("doc_id"), col("source").as("src_later")),
        Seq("doc_id"))
      .join(srcs.select(col("doc_id").as("first_doc"),
        col("source").as("src_first")), Seq("first_doc"))
      .groupBy("src_later", "src_first")
      .agg(sum("cnt").as("n_grams"),
        countDistinct("doc_id").as("n_docs"),
        countDistinct("first_doc").as("n_first_docs"))
  }

  // ── perceptual-hash (q136) media signature index ──

  /** q136's band rows with the partition prefix — pfx is letter-prefixed
    * for the same partition-column type-inference reason as the LSH
    * index ("p" + first hex pixel of the band key; '-' pixels are safe:
    * the letter prefix keeps every value a string). */
  private def phashBandPfx(grid: DataFrame): DataFrame =
    Multimodal.phashBandRows(grid)
      .withColumn("pfx", concat(lit("p"), substring(col("key"), 1, 1)))

  /** Persist the standing corpus's perceptual-hash state at `path`:
    * band rows partitioned by key prefix (the search join prunes to the
    * batch's prefixes) + the signature grid for Hamming verification.
    * One-time, linear — the same single doc-keyed agg q136 pays. */
  def savePhashIndex(docs: DataFrame, path: String): Unit = {
    val grid = Multimodal.phashGrid(docs).localCheckpoint(true)
    buildRepartition(phashBandPfx(grid), "pfx", "key")
      .sortWithinPartitions("pfx", "key", "bi", "doc_id")
      .write.mode("overwrite").partitionBy("pfx").parquet(s"$path/phash/bands")
    grid.write.mode("overwrite").parquet(s"$path/phash/grid")
  }

  /** Fold a (kept) media batch's signature state into the standing index —
    * same layout, no rewrite of prior data. */
  def appendPhashBatch(batch: DataFrame, path: String): Unit = {
    val grid = Multimodal.phashGrid(batch).localCheckpoint(true)
    phashBandPfx(grid)
      .sortWithinPartitions("key", "bi", "doc_id")
      .write.mode("append").partitionBy("pfx").parquet(s"$path/phash/bands")
    grid.write.mode("append").parquet(s"$path/phash/grid")
  }

  /** (doc_id, pixels, bi, key, pfx) — pfx comes back as the partition
    * column (string by construction). */
  def loadPhashBands(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path/phash/bands")
      .select(col("doc_id"), col("pixels"), col("bi").cast("int").as("bi"),
        col("key"), col("pfx").cast("string").as("pfx"))

  def loadPhashGrid(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path/phash/grid")

  /** q136's pair search answered FROM the persisted index: band rows are
    * the store scan (the parquet write is the lineage barrier q136's
    * localCheckpoint provides in-query), hot buckets exactly re-blocked on
    * complement sub-bands (`Multimodal.phashCandidates`), pairs verified
    * by pixel Hamming. Bit-identical to q136 when the store holds the
    * same corpus. */
  def phashPairsFrom(spark: SparkSession, path: String): DataFrame =
    Multimodal.phashCandidates(
        loadPhashBands(spark, path).select("doc_id", "pixels", "bi", "key"))
      .select(col("a"), col("b"),
        Multimodal.phashHamming("pa", "pb").as("hamming"))
      .filter(col("hamming") <= Multimodal.PhashHamTau)

  /** Incremental media dedup (the q80 discipline for the phash index):
    * an incoming media batch audited against the standing signature index
    * AND earlier-id batch docs, without re-reading (or re-hashing) the
    * standing corpus. Returns (doc_id, dup_of, keep) for every batch doc
    * — dup_of = the smallest matching doc_id at Hamming ≤ PhashHamTau.
    * A batch doc whose id already stands in the index (a replay of an
    * --append-kept batch) is NOT its own dup: the a ≠ b guard mirrors the
    * streaming twin's mid != id rule, so batch and stream agree on
    * replays.
    *
    * Scale shape: the batch grid is small (AQE broadcasts it); the store
    * scan carries the pfx partition column so the candidate join prunes
    * to the batch's band-key prefixes. BOTH join sides carry complement
    * sub-band keys (`Multimodal.subBandRows` — exact at the verify
    * threshold by pigeonhole), so a hot standing bucket contributes only
    * the members that already agree with the batch doc on ≥ 7 pixels:
    * per-batch join output tracks true matches, not bucket heat (the
    * uncapped join paid |bucket| rows per batch hit — 2,148 at the 100×
    * growth stress, 10^6 for a viral media cluster). No distinct
    * materializes the candidate set: Hamming filters the joined rows
    * directly and the per-doc min aggregation folds duplicates map-side,
    * so the only corpus-side shuffle is the output-bound groupBy(b). The
    * grid table is never touched (signatures ride with the band rows). */
  def phashDedupBatch(batch: DataFrame, path: String): DataFrame = {
    val spark = batch.sparkSession
    val batchBx = Multimodal.subBandRows(
      phashBandPfx(Multimodal.phashGrid(batch).localCheckpoint(true)))
    val store = Multimodal.subBandRows(loadPhashBands(spark, path))
    val candCorpus = store.as("x").join(batchBx.as("y"),
        col("x.pfx") === col("y.pfx") && col("x.bi") === col("y.bi") &&
          col("x.key") === col("y.key") && col("x.sj") === col("y.sj") &&
          col("x.skey") === col("y.skey") &&
          col("x.doc_id") =!= col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("x.pixels").as("pa"),
        col("y.doc_id").as("b"), col("y.pixels").as("pb"))
    val candBatch = batchBx.as("x").join(batchBx.as("y"),
        col("x.bi") === col("y.bi") && col("x.key") === col("y.key") &&
          col("x.sj") === col("y.sj") && col("x.skey") === col("y.skey") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("x.pixels").as("pa"),
        col("y.doc_id").as("b"), col("y.pixels").as("pb"))
    val dup = candCorpus.unionByName(candBatch)
      .filter(Multimodal.phashHamming("pa", "pb") <= Multimodal.PhashHamTau)
      .groupBy(col("b").as("doc_id")).agg(min("a").as("dup_of"))
    batch.select("doc_id")
      .join(dup, Seq("doc_id"), "left")
      .select(col("doc_id"), col("dup_of"),
        when(col("dup_of").isNull, 1).otherwise(0).as("keep"))
  }

  /** Point search over the persisted phash index (the media family's
    * `searchIvf` twin): the query doc's ≤ k nearest standing neighbors at
    * Hamming ≤ PhashHamTau, ordered (hamming, doc_id). The query's pixels
    * load by id from the grid table (one lookup); its 4 band rows
    * broadcast into the band-table join, which carries the pfx partition
    * column so the store read prunes to ≤ 4 prefixes — a per-query read
    * that shrinks with the band-key space, never a corpus scan. Complete
    * at the threshold by pigeonhole (a ≤3-distant neighbor shares ≥ 1
    * band). */
  def searchPhash(spark: SparkSession, path: String, docId: Long,
      k: Int): DataFrame = {
    val q = loadPhashGrid(spark, path).filter(col("doc_id") === docId).limit(1)
    val qbx = Multimodal.phashBandRows(q)
      .select(col("pixels").as("qp"), col("bi"),
        col("key"), concat(lit("p"), substring(col("key"), 1, 1)).as("pfx"))
    loadPhashBands(spark, path).join(broadcast(qbx), Seq("pfx", "bi", "key"))
      .filter(col("doc_id") =!= docId)
      .select(col("doc_id"),
        Multimodal.phashHamming("pixels", "qp").as("hamming"))
      .groupBy("doc_id").agg(min("hamming").as("hamming"))
      .filter(col("hamming") <= Multimodal.PhashHamTau)
      .orderBy(col("hamming"), col("doc_id"))
      .limit(k)
  }

  /** q144 off the store (the q128 discipline for the media index): media
    * cluster consolidation — components + per-cluster provenance — with
    * the pair graph answered FROM the persisted phash index, skipping the
    * signature build. The corpus text is touched exactly once, by the
    * doc_id-keyed metadata join; bit-identical to `Multimodal
    * .phashConsolidate` on the same corpus (same capped-exact pair set). */
  def phashConsolidateFrom(spark: SparkSession, path: String,
      docs: DataFrame): DataFrame =
    Dedup.consolidateComponents(
      phashPairsFrom(spark, path).select("a", "b"), docs)

  /** Bucket-heat meter for the standing phash index (the r10 verdict's
    * saturation-meter ask, mirroring `winnowIndexSaturation`): how much of
    * the band index is over the `PhashFanInCap` re-blocking threshold, and
    * what residual fan-in the sub-band refinement leaves. One row:
    *   total_buckets / hot_buckets — band buckets, and those over the cap;
    *   max_fan_in — hottest raw band bucket (grows linearly with corpus
    *     heat: 23 → 235 → 2,148 across the 100× growth stress);
    *   hot_rows / total_rows, saturation — member rows living in hot
    *     buckets (the mass that pays the 4× sub-band explode) and their
    *     fraction;
    *   max_sub_fan_in — hottest (band, sub-band) bucket after ONE
    *     re-blocking level (the meter's cheap proxy; the search itself
    *     refines RECURSIVELY below the cap — `Multimodal.phashCandidates`
    *     — so pairing cost is bounded by the cap or the true-pair mass
    *     regardless). A residual hot sub-bucket is signature-near mass
    *     that genuinely belongs together (consolidate it via
    *     `Multimodal.phashConsolidate`) or grounds for a deeper signature
    *     (`graft_phashsig(w, 16, 2)`, q142). */
  def phashIndexSaturation(spark: SparkSession, path: String): DataFrame = {
    val bands = loadPhashBands(spark, path)
    val sizes = bands.groupBy("bi", "key").agg(count(lit(1)).as("bsz"))
    val base = sizes.agg(
      count(lit(1)).as("total_buckets"),
      coalesce(sum(when(col("bsz") > Multimodal.PhashFanInCap, 1L)
        .otherwise(0L)), lit(0L)).as("hot_buckets"),
      coalesce(max("bsz"), lit(0L)).as("max_fan_in"),
      coalesce(sum("bsz"), lit(0L)).as("total_rows"),
      coalesce(sum(when(col("bsz") > Multimodal.PhashFanInCap, col("bsz"))
        .otherwise(0L)), lit(0L)).as("hot_rows"))
    val hot = bands.join(sizes.filter(col("bsz") > Multimodal.PhashFanInCap),
      Seq("bi", "key"))
    val sub = Multimodal.subBandRows(hot)
      .groupBy("bi", "key", "sj", "skey").agg(count(lit(1)).as("ssz"))
      .agg(coalesce(max("ssz"), lit(0L)).as("max_sub_fan_in"))
    base.crossJoin(broadcast(sub))
      .select(col("total_buckets"), col("hot_buckets"), col("max_fan_in"),
        col("total_rows"), col("hot_rows"), col("max_sub_fan_in"),
        when(col("total_rows") === 0L, lit(0.0))
          .otherwise(col("hot_rows").cast("double") / col("total_rows"))
          .as("saturation"))
  }

  // ── df-capped inverted index (the pair-audit family's shared core) ──

  /** Persist the df-capped inverted index the whole pair-audit family
    * (q22 Jaccard, q87 containment, q91 edit-gate, q93/q97 profiles, the
    * q47/q58 connected-components edge set) re-derives per query — the ~2.5 s-at-sf0.1 "index floor" PERF.md
    * names. Build is the family's one corpus shuffle (shingle explode →
    * bounded capped-set aggregation), paid once per corpus build; each
    * audit then starts from the bucket scan. `ds` is stored sorted, so
    * pairs from the store are bit-identical to the in-query path
    * (IndexStoreSpec pins it). */
  def savePairIndex(docs: DataFrame, path: String): Unit =
    // Explicit spread at CLUSTER-TRACKING width (r17): the old
    // `repartition(32)` capped writers at 32 on a real cluster; a bare
    // write was tried first but AQE coalesces the small bucket agg to
    // ~1 file locally, which then SERIALIZES the expensive pair-mining
    // read (bucketPairs' explode parallelism = file count until its
    // first exchange — measured q127 +0.8 s drift-adjusted). The
    // round-robin spread keeps the read fan-out at cluster width at
    // every scale; its shuffle is bucket-table-sized, a fraction of the
    // mining it parallelizes.
    Dedup.allBuckets(docs)
      .repartition(writeParallelism(docs.sparkSession))
      .write.mode("overwrite").parquet(s"$path/pairs/buckets")

  /** The audit view — (s, ds) filtered to the informative [2, MaxDf]
    * band; feed to `Dedup.{jaccard,containment,inter}PairsFrom`. The
    * stored table additionally keeps df-1 rows and over-cap marker rows
    * (|ds| = MaxDf + 1) so `appendPairBatch` merges stay correct. */
  def loadPairBuckets(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path/pairs/buckets")
      .filter(size(col("ds")).between(2, Dedup.MaxDf))

  /** Fold a batch's shingles into the standing pair index. Unlike the
    * LSH band append this is a keyed MERGE (a shingle's bucket must
    * absorb the batch's ids), so it rewrites the bucket table — but it
    * never re-reads the standing corpus's TEXT: cost is one bucket-table
    * scan + the batch's own shingle aggregation, not a corpus re-shingle.
    * Merge math relies on dfs only growing: complete (≤ MaxDf) lists
    * union exactly; any side at the MaxDf + 1 marker keeps the merged
    * size ≥ MaxDf + 1, so over-cap buckets stay dropped (the truncation
    * keeps the smallest MaxDf + 1 ids — still a marker). Batch doc_ids
    * must be disjoint from stored ids, as with every append here.
    * Staged-swap write (the Maintenance pattern): a crash mid-merge
    * leaves the original table intact. */
  def appendPairBatch(batch: DataFrame, path: String): Unit =
    mergeCappedBuckets(Dedup.allBuckets(batch), s"$path/pairs/buckets", "s")

  /** Shared merge core of the capped-bucket index appends (pair + winnow):
    * union the batch's buckets into the stored table keyed by `key`,
    * re-cap at MaxDf + 1 (truncation keeps the smallest ids — an over-cap
    * marker stays a marker), staged-swap write. */
  private def mergeCappedBuckets(add: DataFrame, dstPath: String,
      key: String): Unit = {
    val spark = add.sparkSession
    import org.apache.hadoop.fs.Path
    val dst = new Path(dstPath)
    val stage = new Path(dstPath + "_stage")
    val fs = dst.getFileSystem(spark.sparkContext.hadoopConfiguration)
    spark.read.parquet(dst.toString)
      .unionByName(add)
      .groupBy(key)
      .agg(slice(sort_array(array_distinct(flatten(collect_list(col("ds"))))),
        1, Dedup.MaxDf + 1).as("ds"))
      // cluster-tracking spread (was a hard 32) — see savePairIndex (r17)
      .repartition(writeParallelism(spark))
      .write.mode("overwrite").parquet(stage.toString)
    fs.delete(dst, true)
    require(fs.rename(stage, dst), s"rename $stage -> $dst failed")
  }

  // ── Winnowed copy-detection index (q118's standing form) ──

  /** Persist the winnowed fingerprint inverted index — the pair index's
    * 2-3×-smaller at-rest sibling (window-min selection keeps ~2/(W+1) of
    * the grams, same ≥6-word shared-run guarantee). Same capped-bucket
    * layout and merge math as the pair index, keyed by fingerprint. */
  def saveWinnowIndex(docs: DataFrame, path: String): Unit =
    // Cluster-tracking spread — see savePairIndex (r17) for why a bare
    // write starves the pair-mining read's parallelism locally.
    Dedup.winnowAllBuckets(docs)
      .repartition(writeParallelism(docs.sparkSession))
      .write.mode("overwrite").parquet(s"$path/winnow/buckets")

  /** The audit view — feed to `Dedup.winnowPairsFrom`. */
  def loadWinnowBuckets(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path/winnow/buckets")
      .filter(size(col("ds")).between(2, Dedup.MaxDf))

  /** Fold a batch's winnowed fingerprints into the standing index —
    * never re-reads standing TEXT; batch ids must be disjoint. */
  def appendWinnowBatch(batch: DataFrame, path: String): Unit =
    mergeCappedBuckets(Dedup.winnowAllBuckets(batch),
      s"$path/winnow/buckets", "fp")

  /** Incremental winnow audit (the q80 discipline for the copy index):
    * (standing doc `a`, batch doc `b`, shared) pairs where an incoming
    * batch doc shares ≥ minShared selected fingerprints with a standing
    * doc — WITHOUT re-pairing the standing corpus or touching its text.
    * The batch side winnows in-memory and joins the persisted bucket
    * table on fingerprint, so candidate volume scales with the BATCH
    * (times the ≤MaxDf bucket fan-out), not with corpus². Batch-internal
    * pairs are the caller's `winnowPairs(batch)` if wanted — this audit
    * answers "what does the batch COPY from the standing corpus". */
  def winnowAuditBatch(batch: DataFrame, path: String,
      minShared: Int = Dedup.WinnowMinShared): DataFrame = {
    val spark = batch.sparkSession
    val bFps = Dedup.winnowFps(batch)
      .select(col("doc_id").as("b"), explode(col("fps")).as("fp"))
    // NOT loadWinnowBuckets: the [2, MaxDf] band is the PAIR-GEN view (a
    // pair needs two docs in one bucket). For a batch audit a size-1
    // standing bucket is fully informative — the batch doc IS the second
    // occurrence. Only the over-cap markers (stop-fingerprints, decided
    // by the STANDING corpus — the production-sane gate) are dropped.
    spark.read.parquet(s"$path/winnow/buckets")
      .filter(size(col("ds")) <= Dedup.MaxDf)
      .select(col("fp"), explode(col("ds")).as("a"))
      .join(bFps, Seq("fp"))
      .groupBy("a", "b").agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
  }

  /** The winnow audit's own blind-spot meter (VERDICT r9 #4): of the
    * batch's fingerprint hits against the standing index, what fraction
    * landed on over-cap STOP markers — hits `winnowAuditBatch` must drop,
    * so they produce no pair evidence? As the standing index grows,
    * popular runs cross MaxDf and the audit silently loses recall on
    * exactly the most-copied content; the r9 winnow stress measured
    * batch_pairs falling 5,427→1,877 at a 10× standing index for this
    * reason. A production audit must REPORT that rate, not hide it.
    * One row: (fp_hits, stop_fp_hits, saturation). Counting unit = one
    * (batch doc, fingerprint) match against a standing bucket of any
    * size — the same unit whose non-stop subset feeds the pair counts. */
  def winnowBatchSaturation(batch: DataFrame, path: String): DataFrame = {
    val spark = batch.sparkSession
    val bFps = Dedup.winnowFps(batch).select(explode(col("fps")).as("fp"))
    spark.read.parquet(s"$path/winnow/buckets")
      .select(col("fp"),
        when(size(col("ds")) > Dedup.MaxDf, 1L).otherwise(0L).as("is_stop"))
      .join(bFps, Seq("fp"))
      .agg(count(lit(1)).as("fp_hits"),
        coalesce(sum(col("is_stop")), lit(0L)).as("stop_fp_hits"))
      .select(col("fp_hits"), col("stop_fp_hits"),
        when(col("fp_hits") === 0L, lit(0.0))
          .otherwise(col("stop_fp_hits").cast("double") / col("fp_hits"))
          .as("saturation"))
  }

  /** Index-level saturation for the standing winnow store: the fraction
    * of stored buckets that have crossed into stop markers (|ds| >
    * MaxDf) — the at-rest twin of `winnowBatchSaturation`'s per-batch
    * hit-weighted rate. One row: (total_buckets, stop_buckets,
    * saturation). */
  def winnowIndexSaturation(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path/winnow/buckets")
      .agg(count(lit(1)).as("total_buckets"),
        coalesce(sum(when(size(col("ds")) > Dedup.MaxDf, 1L).otherwise(0L)),
          lit(0L)).as("stop_buckets"))
      .select(col("total_buckets"), col("stop_buckets"),
        when(col("total_buckets") === 0L, lit(0.0))
          .otherwise(col("stop_buckets").cast("double") / col("total_buckets"))
          .as("saturation"))

  // ── Decontamination registry state (q105's standing-artifact form) ──

  /** Persist the q105 registry artifact: the distinct shingle table plus
    * its serialized bloom sketch (one binary row). Built once per registry
    * version; every later decontamination scan prefilters against the
    * bloom literal and verifies against the shingle table without ever
    * touching registry TEXT again. The bloom row stores `est` alongside
    * the bytes so an append knows the sketch's sizing. */
  def saveDecontamRegistry(registry: DataFrame, path: String,
      est: Long = 1L << 20): Unit = {
    val spark = registry.sparkSession
    import spark.implicits._
    val (reg, bf) = Dedup.buildDecontamRegistry(registry, est)
    // write at the registry dedup's own cluster-wide width (the old
    // repartition(8) added a shuffle and funneled the writers — r17)
    reg.write.mode("overwrite")
      .parquet(s"$path/decontam/shingles")
    Seq((bf, est)).toDF("bf", "est").write.mode("overwrite")
      .parquet(s"$path/decontam/bloom")
  }

  /** q105 off the store: the bloom bytes load as one driver-side row into
    * the prefilter literal; the shingle table is the exact-verify join
    * side. Output ≡ the in-query `bloomDecontam` on the same registry
    * (IndexStoreSpec pins it — the bloom is rebuilt from the same est over
    * the same hashed values, so even the prefilter's pass set matches). */
  def decontaminate(corpus: DataFrame, path: String,
      k: Int = Dedup.ContamK): DataFrame = {
    val spark = corpus.sparkSession
    graft.functions.GraftFunctions.register(spark)
    val bf = spark.read.parquet(s"$path/decontam/bloom")
      .head().getAs[Array[Byte]]("bf")
    Dedup.bloomDecontamFrom(corpus,
      spark.read.parquet(s"$path/decontam/shingles"), bf, k)
  }

  // ── Unigram LM state (q84's reference-corpus form) ──

  /** Words of a documents frame, q84's exact tokenization. */
  private def words(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(split(trim(col("text")), " ")).as("w"))
      .filter(col("w") =!= "")

  /** Persist the unigram table of a REFERENCE corpus — the standing state
    * behind production familiarity scoring, where new documents are scored
    * against a frozen high-quality LM rather than against themselves. One
    * linear shuffle; the table is vocab-sized. */
  def saveUnigramLM(docs: DataFrame, path: String): Unit =
    words(docs).groupBy("w").agg(count(lit(1)).as("c"))
      .write.mode("overwrite").parquet(s"$path/lm/unigrams")

  /** q84's familiarity = (Σ_w count(w)) / n_words / total_words, with the
    * counts read from the PERSISTED LM instead of derived from the scored
    * corpus. Same integer-sum + sequential-division discipline as q84
    * (order-free, overflow-safe, hash-exact); scored against its own
    * corpus's LM it reproduces q84 bit-for-bit (IndexStoreSpec pins it).
    * Inner-join semantics like q84: words unseen in the LM don't
    * contribute to sumc OR n_words. The LM is vocab-sized — AQE broadcasts
    * it; the corpus side is one narrow scan + one doc-keyed aggregation. */
  def familiarity(docs: DataFrame, path: String): DataFrame = {
    val spark = docs.sparkSession
    val uni = spark.read.parquet(s"$path/lm/unigrams")
    val tot = uni.agg(sum("c").cast("long").as("tot"))
    words(docs).join(uni, Seq("w"))
      .groupBy("doc_id").agg(sum("c").as("sumc"), count(lit(1)).as("nw"))
      .crossJoin(broadcast(tot))
      .select(col("doc_id"), col("sumc"),
        expr("sumc / nw / tot").as("familiarity"))
  }

  // ── Bigram LM state (q195's standing form) ──

  /** Persist the bigram TYPE table — the KN LM's standing state (the
    * n-gram-LM sibling of `saveUnigramLM`): one corpus pair scan folded
    * to (w1, w2, c), vocab²-bounded. Counts are SUM-mergeable, so a
    * batch appends its own grid rows and readers fold — the sketch-store
    * ledger discipline (no read-modify-write, crash-safe by parquet
    * append). Margins, continuation-type counts, and the type total all
    * DERIVE from the folded table on read, so they can never drift from
    * the counts. */
  def saveBigramLM(docs: DataFrame, path: String): Unit =
    TextOps.knPairs(docs).groupBy("w1", "w2").agg(count(lit(1)).as("c"))
      .write.mode("overwrite").parquet(s"$path/lm/bigrams")

  /** Append a crawl batch's bigram grid (the batch's OWN fold — grid
    * rows, not pairs, cross the write). */
  def appendBigramBatch(batch: DataFrame, path: String): Unit =
    TextOps.knPairs(batch).groupBy("w1", "w2").agg(count(lit(1)).as("c"))
      .write.mode("append").parquet(s"$path/lm/bigrams")

  /** Materialize the read-side fold (file-count hygiene after a long
    * append history — the store is CORRECT without it). Staged write +
    * swap, the compaction discipline every other store uses. */
  def compactBigramLM(spark: SparkSession, path: String): Unit =
    swapRewrite(spark, s"$path/lm/bigrams",
      loadBigramLM(spark, path), Seq("w1", "w2"), None, parts = 4)

  /** The folded standing bigram table at `path`. */
  def loadBigramLM(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path/lm/bigrams")
      .groupBy("w1", "w2").agg(sum("c").as("c"))

  /** q195's KN table served FROM the store: legs re-derived from the
    * folded counts (localCheckpointed — three grid consumers), so a
    * store built+appended over slices of a corpus serves bit-identically
    * to the in-query learner on the union (IndexStoreSpec pins it; q199
    * grades it through q195's own oracle). */
  def knFromStore(spark: SparkSession, path: String): DataFrame = {
    val big = loadBigramLM(spark, path).localCheckpoint(true)
    val (lft, cont, types) = TextOps.knDerive(big)
    TextOps.knTable(big, lft, cont, types)
  }

  /** q196's production scoring form — the frozen-reference-LM arrangement
    * (CCNet): score `docs` by mean KN conditional predictability against
    * the PERSISTED bigram LM, never against themselves. Same output shape
    * and arithmetic as q196 (`TextOps.knScore` is the one shared tail);
    * scored against a store built on q196's train slice it reproduces
    * q196 bit-for-bit (IndexStoreSpec pins it). This is what
    * `Curate --lm-store` filters with. */
  def lmScore(docs: DataFrame, path: String): DataFrame = {
    val big = loadBigramLM(docs.sparkSession, path).localCheckpoint(true)
    val (lft, cont, types) = TextOps.knDerive(big)
    TextOps.knScore(docs, big, lft, cont, types)
  }

  // ── Corpus-statistics sketch store (q178/q179's at-rest form) ──

  /** Persist the standing corpus's SKETCH STATE at `path` — the bounded
    * grids the sketch-audit suite reads: per-lang HLL registers over
    * 5-grams (q160/q178's grid: grp, idx, r), per-source Count-Min cells
    * over words (q176/q177/q179's grids: source, j, c, cc), and
    * per-source word totals (source, n). Every table is GRID-BOUNDED
    * (≤ langs × 512 + sources × 8192 + sources rows at ANY corpus size —
    * the whole store is kilobytes while the corpus is terabytes) and
    * MERGEABLE: registers fold by MAX, cells and totals by ADDITION, so
    * `appendSketchBatch` just writes a batch's grids as new rows and the
    * loaders fold on read — no read-modify-write, crash-safe by plain
    * parquet-append semantics, and the store never needs compaction to
    * stay CORRECT (`compactSketchIndex` materializes the fold for
    * file-count hygiene after a long crawl). This is the crawl loop's
    * statistics ledger: distinct-gram cardinality, token frequencies,
    * and per-source attribution answerable at catalog cost forever, the
    * corpus text never re-read. */
  /** `mg = false` skips the Misra–Gries leg: the standing LEDGER (the
    * `Index build-sketches` CLI, appends, q192) always writes it, but a
    * query's one-shot scratch build should only pay for the legs it
    * serves (q178 registers, q179 cells+totals, q180 lens) — the mg leg
    * is the one typed-aggregator pass in the family. */
  /** Every table of the statistics ledger. */
  val SketchLegs: Set[String] = Set("registers", "cells", "totals", "lens", "mg")

  def saveSketchIndex(docs: DataFrame, path: String, mg: Boolean = true): Unit =
    writeSketch(docs, path, "overwrite",
      if (mg) SketchLegs else SketchLegs - "mg")

  /** Build only the named ledger tables (r17, guide §1.2: the from-store
    * catalog queries each SERVE one leg — q178 registers, q179
    * cells+totals, q180 lens, q192 mg+totals — so building the other
    * legs' corpus scans and writes inside those queries was work thrown
    * away; each leg is derived and persisted independently, so a
    * leg-restricted store is bit-identical on the legs it has. The CLI
    * build verb and appends still write every leg — `appendSketchBatch`
    * requires a full store (the mg gate) so partial stores stay
    * query-scratch only). */
  def saveSketchLegs(docs: DataFrame, path: String,
      legs: Set[String]): Unit = {
    require(legs.subsetOf(SketchLegs), s"unknown sketch legs: ${legs -- SketchLegs}")
    writeSketch(docs, path, "overwrite", legs)
  }

  /** Append a batch's sketch grids (each derived by the same one-scan
    * aggregations as the build — grids, not rows, cross the write).
    * Fails loudly on a store missing the mg leg (one built `mg = false`,
    * or persisted before the leg existed): appending would create an mg
    * table covering ONLY the appended batches while totals covers the
    * whole corpus, silently voiding q192's no-false-negatives guarantee —
    * the threshold derives from full n over partial candidate mass
    * (ADVICE r15). The base corpus isn't retained, so backfill is
    * impossible here; the fix is a rebuild. */
  def appendSketchBatch(batch: DataFrame, path: String): Unit = {
    requireSketchMg(batch.sparkSession, path)
    writeSketch(batch, path, "append", SketchLegs)
  }

  /** The mg-leg presence gate shared by every consumer that would
    * otherwise misread a partial summary as a corpus one. */
  private def requireSketchMg(spark: SparkSession, path: String): Unit = {
    import org.apache.hadoop.fs.Path
    val sketch = new Path(s"$path/sketch")
    val fs = sketch.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(sketch) && !fs.exists(new Path(s"$path/sketch/mg")))
      throw new IllegalStateException(
        s"sketch store at $path has no mg leg (built with mg = false or " +
          "persisted before the heavy-hitter leg existed); rebuild it " +
          "with `Index build-sketches` before appending or reading " +
          "heavy hitters — appending now would void the Misra-Gries " +
          "coverage guarantee (partial-mass candidates vs full-corpus n)")
  }

  private def writeSketch(docs: DataFrame, path: String,
      mode: String, legs: Set[String]): Unit = {
    // Grid-bounded tables; writer width is irrelevant here (the frames
    // are ≤ thousands of rows by construction — the one store family
    // where the VERDICT r14 #1 widening does not apply).
    if (legs("registers"))
      Audit.hllRegisters(Audit.gram5(docs), "lang", "g")
        .repartition(4).sortWithinPartitions("grp", "idx")
        .write.mode(mode).parquet(s"$path/sketch/registers")
    // The word-row barrier pays off only when the stream has 2+ consumers
    // among {cells, totals, mg}; a single-leg build streams it once.
    val wConsumers = Seq("cells", "totals", "mg").count(legs)
    lazy val w =
      if (wConsumers > 1) Audit.wordRows(docs).localCheckpoint(true)
      else Audit.wordRows(docs)
    if (legs("cells"))
      Audit.cmsCellsBy(w, "source", "w")
        .withColumnRenamed("grp", "source")
        .repartition(4).sortWithinPartitions("source", "j", "c")
        .write.mode(mode).parquet(s"$path/sketch/cells")
    if (legs("totals"))
      w.groupBy("source").agg(count(lit(1)).as("n"))
        .repartition(1)
        .write.mode(mode).parquet(s"$path/sketch/totals")
    if (legs("lens"))
      Audit.lenBins(docs)
        .repartition(1).sortWithinPartitions("source", "bin")
        .write.mode(mode).parquet(s"$path/sketch/lens")
    // The heavy-hitter leg: one ≤ MgK-entry Misra–Gries summary of the
    // word stream (bounded partial state per partition — the vocabulary
    // never shuffles), exploded to (w, c) rows in-plan (no driver pull).
    if (legs("mg")) {
      val agg = udaf(new graft.functions.MisraGriesCountsAggregator(Audit.MgK))
      w.agg(agg(col("w")).as("s"))
        .select(explode(col("s")).as(Seq("w", "c")))
        .repartition(1).sortWithinPartitions("w")
        .write.mode(mode).parquet(s"$path/sketch/mg")
    }
  }

  /** MAX-folded (grp, idx, r) registers — the fold IS the HLL merge, so
    * a store holding any number of appended batch grids loads as the
    * union corpus's registers (IndexStoreSpec pins append ≡ rebuild). */
  def loadSketchRegisters(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path/sketch/registers")
      .groupBy("grp", "idx").agg(max("r").as("r"))

  /** ADD-folded per-source CMS cells (source, j, c, cc) — CMS linearity:
    * summing appended grids is exactly the union corpus's grid. */
  def loadSketchCells(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path/sketch/cells")
      .groupBy("source", "j", "c").agg(sum("cc").as("cc"))

  /** ADD-folded per-source word totals (source, n). */
  def loadSketchTotals(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path/sketch/totals")
      .groupBy("source").agg(sum("n").as("n"))

  /** ADD-folded per-source doc-length histogram (source, bin, cnt) —
    * fixed LenBinW bins, so appended batch histograms sum to the union
    * corpus's histogram (q180's grid). */
  def loadSketchLens(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path/sketch/lens")
      .groupBy("source", "bin").agg(sum("cnt").as("cnt"))

  /** SUM-folded Misra–Gries summary (w, c). Pointwise counter sums ARE
    * the mergeable-summaries combine before its truncation step (Agarwal
    * et al. 2012), so the fold of any number of appended batch summaries
    * keeps the union guarantee — every word above n_union/(MgK+1) is
    * present, counters are lower bounds with the per-batch errors
    * adding. Skipping truncation on read can only WIDEN the candidate
    * superset (rows ≤ appends × MgK; `compactSketchIndex` re-truncates
    * the standing table back to ≤ MgK rows). */
  def loadSketchMg(spark: SparkSession, path: String): DataFrame = {
    requireSketchMg(spark, path) // loud rebuild hint, not a path error
    spark.read.parquet(s"$path/sketch/mg")
      .groupBy("w").agg(sum("c").as("c"))
  }

  /** Compact the sketch store: materialize the max/add folds and rewrite
    * each grid once (staged rename-swap, crash-repairing — `swapRewrite`).
    * Pure file-count hygiene — readers fold either way. */
  def compactSketchIndex(spark: SparkSession, path: String): Unit = {
    requireSketchMg(spark, path) // mg-less stores need a rebuild, not hygiene
    swapRewrite(spark, s"$path/sketch/registers",
      loadSketchRegisters(spark, path), Seq("grp", "idx"), None, parts = 4)
    swapRewrite(spark, s"$path/sketch/cells",
      loadSketchCells(spark, path), Seq("source", "j", "c"), None, parts = 4)
    swapRewrite(spark, s"$path/sketch/totals",
      loadSketchTotals(spark, path), Seq("source"), None, parts = 1)
    swapRewrite(spark, s"$path/sketch/lens",
      loadSketchLens(spark, path), Seq("source", "bin"), None, parts = 1)
    // mg: materialize the sum-fold AND re-apply the mergeable-summaries
    // truncation, so the standing table returns to ≤ MgK rows no matter
    // how many batches appended (candidates stay a superset of every
    // word above the union threshold — truncation only subtracts the
    // (MgK+1)-th largest counter, the PODS 2012 rule). The summary is
    // ≤ appends × MgK rows by construction, so the driver-side truncate
    // is catalog-sized.
    swapRewrite(spark, s"$path/sketch/mg", {
      val folded = scala.collection.mutable.HashMap.empty[String, Long]
      loadSketchMg(spark, path).collect()
        .foreach(r => folded.update(r.getString(0), r.getLong(1)))
      val kept = graft.functions.MisraGries.truncate(folded, Audit.MgK)
      import spark.implicits._
      kept.toSeq.toDF("w", "c")
    }, Seq("w"), None, parts = 1)
  }

  // ── Merkle integrity-tree state ──

  /** Leaf-table size gating `appendMerkleBatch`'s tail fast path — see
    * there. The measured local crossover is ~19 MB of leaves (500k docs:
    * forced-tail 3.2 s vs rebuild 4.2 s, and the gap only widens with n —
    * Stress `merkle`); 16 MB switches right at it. Any production tree
    * is far above. */
  val TailMinLeafBytes: Long = 16L << 20

  /** Persist the corpus's Merkle tree (Merkle.scala — q181/q184's
    * production surface and `Snapshot merkle-*`'s store): per-doc leaf
    * digests append-only at `merkle/leaves`, the upper levels at
    * `merkle/nodes` partitioned by lvl so a root read prunes to the
    * Levels partition and a proof's sibling fetch reads one level
    * partition per step. The one-time build pays the single corpus text
    * scan (leaf digests); everything above is hash-of-hash folds over
    * n/15–n/4 rows (Merkle.scala on source interleaving).
    * Widened-writer discipline for the leaf write (the
    * corpus-sized table); the upper tree is |pfx|-free and tiny. */
  def saveMerkleTree(docs: DataFrame, path: String): Unit = {
    val lv = Merkle.levels(docs)
    lv.head
      .repartitionByRange(writeParallelism(docs.sparkSession),
        col("source"), col("pos"))
      .sortWithinPartitions("source", "pos")
      .write.mode("overwrite").parquet(s"$path/merkle/leaves")
    writeNodes(lv, s"$path/merkle/nodes", swap = false)
  }

  private def writeNodes(lv: Seq[DataFrame], nodesPath: String,
      swap: Boolean): Unit = {
    val nodes = (1 to Merkle.Levels).map(l =>
      lv(l).withColumn("lvl", lit(s"L$l"))).reduce(_ unionByName _)
    if (swap)
      swapRewrite(lv.head.sparkSession, nodesPath, nodes,
        Seq("source", "pos"), Some("lvl"))
    else
      buildRepartition(nodes, "lvl", "pos")
        .sortWithinPartitions("lvl", "source", "pos")
        .write.mode("overwrite").partitionBy("lvl").parquet(nodesPath)
  }

  /** Append a batch's leaf digests (contract: batch doc_ids disjoint from
    * the stored corpus — the snapshot workflows allocate fresh ids, like
    * simulateRefresh's re-ingest) and bring the upper tree up to date.
    * The batch pays its own text scan; upper recompute reads hash rows,
    * never text, and swaps in atomically (`swapRewrite`, crash-repairing).
    *
    * Two recompute paths, chosen by the data (returned for the caller's
    * ledger row):
    *   - TAIL (true): when every batch id exceeds the stored max — the
    *     crawl norm, ids allocated monotonically — the affected node
    *     positions at level L form the contiguous range
    *     pos >= minNewId div 16^L, so the recompute reads the LEAF TAIL
    *     (one range predicate, row-group-pruned on the pos-sorted files)
    *     plus one boundary sibling group per level; untouched node rows
    *     are carried over by position. Append cost: O(batch) text +
    *     O(batch/15) recompute + the sub-linear nodes-table rewrite.
    *   - REBUILD (false): scattered new ids (still disjoint) re-fold the
    *     whole upper tree from the full leaf set — the simple invariant,
    *     one n-row hash scan. Also chosen for monotone batches while the
    *     leaf table is under `tailMinLeafBytes`: the tail path spends a
    *     ~flat ~3 s on its per-level boundary jobs, so below the measured
    *     local crossover (~19 MB of leaves ≈ 500k docs, Stress `merkle`)
    *     one cheap full scan wins; above it the tail's flat read beats
    *     the growing n-row scan forever.
    * MerkleSpec pins both paths ≡ a from-scratch build, bit-identically. */
  def appendMerkleBatch(batch: DataFrame, path: String,
      tailMinLeafBytes: Long = TailMinLeafBytes): Boolean = {
    val spark = batch.sparkSession
    val arity = Merkle.Arity
    val raw = Merkle.leafDigests(batch).localCheckpoint(true)
    if (raw.isEmpty) return true
    // Stored max BEFORE the leaf append decides the path (a pos-column
    // read over the leaf files, no text); the dir size is one FS stat.
    val stats = loadMerkleLeaves(spark, path)
      .agg(max("pos")).head()
    val oldMax = if (stats.isNullAt(0)) Long.MinValue else stats.getLong(0)
    val Row(minRaw: Long, maxRaw: Long) =
      raw.agg(min("pos"), max("pos")).head()
    // Replay idempotence (the streaming ledger sink's exactly-once leg):
    // ids already stored — a re-delivered epoch, or the overlap of a
    // crash between a leaf write and the node swap — are dropped by an
    // anti-join against the stored [min, max] leaf slice (row-group
    // pruned on the pos-sorted files). A fully-replayed batch is a leaf
    // no-op that still REFOLDS the upper tree below, repairing any
    // stale-nodes crash window instead of returning early.
    val newLeaves = (if (minRaw > oldMax) raw
      else {
        val stored = loadMerkleLeaves(spark, path)
          .filter(col("pos") >= minRaw && col("pos") <= maxRaw)
          .select(col("pos").cast("long").as("pos"))
        raw.join(stored, Seq("pos"), "left_anti").localCheckpoint(true)
      })
    val leafPath = new org.apache.hadoop.fs.Path(s"$path/merkle/leaves")
    val leafBytes = leafPath
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
      .getContentSummary(leafPath).getLength
    val anyFresh = !newLeaves.isEmpty
    if (anyFresh) {
      newLeaves
        .repartitionByRange(writeParallelism(spark),
          col("source"), col("pos"))
        .sortWithinPartitions("source", "pos")
        .write.mode("append").parquet(s"$path/merkle/leaves")
    }
    val minNew =
      if (anyFresh) newLeaves.agg(min("pos")).head().getLong(0) else minRaw
    val tail = minNew > oldMax && leafBytes >= tailMinLeafBytes
    if (!tail) {
      val leaves = loadMerkleLeaves(spark, path).localCheckpoint(true)
      val lv = (1 to Merkle.Levels).scanLeft(leaves)((prev, _) =>
        Merkle.foldLevel(prev).localCheckpoint(true))
      writeNodes(lv, s"$path/merkle/nodes", swap = true)
      return false
    }
    // Tail path: members at level 0 = the post-append leaf tail from the
    // boundary group's floor (covers the batch AND the stored leaves
    // sharing its first group).
    var members = loadMerkleLeaves(spark, path)
      .select(col("source"), col("pos").cast("long").as("pos"), col("h"))
      .filter(col("pos") >= (minNew / arity) * arity)
      .localCheckpoint(true)
    var minPos = minNew
    val perLevel = (1 to Merkle.Levels).map { l =>
      minPos = minPos / arity
      // All member groups are complete: children < the recompute floor
      // come from the stored level below (boundary slice), the rest are
      // just-refolded — so every folded parent (pos >= minPos) is exact.
      val folded = Merkle.foldLevel(members).localCheckpoint(true)
      val boundary = loadMerkleNodes(spark, path, l)
        .filter(col("pos") >= (minPos / arity) * arity &&
          col("pos") < minPos)
      members = boundary.unionByName(folded)
      (l, folded, minPos)
    }
    val nodes = perLevel.map { case (l, folded, mp) =>
      loadMerkleNodes(spark, path, l).filter(col("pos") < mp)
        .unionByName(folded).withColumn("lvl", lit(s"L$l"))
    }.reduce(_ unionByName _)
    swapRewrite(spark, s"$path/merkle/nodes", nodes,
      Seq("source", "pos"), Some("lvl"))
    true
  }

  /** The per-doc digest level: (source, pos = doc_id, h). */
  def loadMerkleLeaves(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path/merkle/leaves")

  /** One upper level (1..Merkle.Levels): the lvl partition filter prunes
    * the read to that level's files. */
  def loadMerkleNodes(spark: SparkSession, path: String,
      level: Int): DataFrame =
    spark.read.parquet(s"$path/merkle/nodes")
      .filter(col("lvl") === s"L$level")
      .select(col("source"), col("pos").cast("long").as("pos"), col("h"))

  /** All stored levels 0..Merkle.Levels as frames — the shape
    * `Merkle.driftLevels`/`Merkle.proofs` consume, so tree-vs-tree diff
    * and proof verification run store-only. */
  def loadMerkleLevels(spark: SparkSession, path: String): Seq[DataFrame] =
    loadMerkleLeaves(spark, path)
      .select(col("source"), col("pos").cast("long").as("pos"), col("h")) +:
      (1 to Merkle.Levels).map(l => loadMerkleNodes(spark, path, l))

  /** Compact the leaf table after a run of appends — pure file-count +
    * sort hygiene (leaf rows are disjoint across appends; no merge
    * math), staged rename-swap as everywhere. The nodes table rewrites
    * on every append and needs none. */
  def compactMerkleIndex(spark: SparkSession, path: String): Unit =
    swapRewrite(spark, s"$path/merkle/leaves",
      loadMerkleLeaves(spark, path).select("source", "pos", "h"),
      Seq("source", "pos"), None, rangeKeyed = true)

  // ── IVF index state ──

  /** Persist the q34/q77 two-level IVF index: coarse-centroid array (1
    * row), fine-cell lists (ccid-keyed), and the assigned corpus
    * partitioned by coarse cell with rows sorted by fine cell — so a probe
    * reads one ccid partition and, within it, the cid row groups its
    * min/max stats select. */
  def saveIvfIndex(emb: DataFrame, path: String, refine: Int = 0): Unit = {
    val (assigned, fineCells, coarseArr) = Vectors.ivfIndex(emb, refine)
    coarseArr.write.mode("overwrite").parquet(s"$path/ivf/coarse")
    fineCells.write.mode("overwrite").parquet(s"$path/ivf/cells")
    buildRepartition(assigned, "ccid", "vec_id")
      .sortWithinPartitions("ccid", "cid", "vec_id")
      .write.mode("overwrite").partitionBy("ccid").parquet(s"$path/ivf/vectors")
  }

  /** (assigned(vec_id, en, ccid, cid), fineCells, coarseArr) — the same
    * triple `Vectors.ivfIndex` builds in-query, read back from the store. */
  def loadIvfIndex(spark: SparkSession, path: String)
      : (DataFrame, DataFrame, DataFrame) = {
    val assigned = spark.read.parquet(s"$path/ivf/vectors")
      .select(col("vec_id"), col("en"), col("ccid").cast("long").as("ccid"),
        col("cid"))
    val cells = spark.read.parquet(s"$path/ivf/cells")
    val coarse = spark.read.parquet(s"$path/ivf/coarse")
    (assigned, cells, coarse)
  }

  /** q34's single-probe search over the PERSISTED index: the query vector
    * is looked up by id, its (ccid, cid) cell is scanned (partition prune
    * on ccid, row-group prune on cid), top-k by exact cosine. Bit-identical
    * to q34's in-query result for the same corpus — IndexStoreSpec pins
    * it. */
  def searchIvf(spark: SparkSession, path: String, queryVecId: Long,
      k: Int): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val (assigned, _, _) = loadIvfIndex(spark, path)
    val qrow = assigned.filter(col("vec_id") === queryVecId).limit(1)
      .select(col("ccid").as("qccid"), col("cid").as("qcid"),
        col("en").as("qn"))
    assigned.join(broadcast(qrow),
        col("ccid") === col("qccid") && col("cid") === col("qcid"))
      .filter(col("vec_id") =!= queryVecId)
      .select(col("vec_id"), Vectors.dot(col("en"), col("qn")).as("sim"))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(k)
  }

  /** q77's multi-probe search over the PERSISTED index: rank the loaded
    * coarse-centroid array, probe the top `probeCoarse` cells' fine
    * centroid lists, keep the top `probeFine` fine cells, scan only those
    * cells' vectors — every probe frame ≤probeFine rows, the corpus-side
    * work one broadcast join on cid plus ccid partition pruning.
    * Bit-identical to q77's in-query result for the same corpus
    * (IndexStoreSpec pins it at q77's nprobe parameters). */
  def searchIvfProbed(spark: SparkSession, path: String, queryVecId: Long,
      k: Int, probeCoarse: Int = Vectors.ProbeCoarse,
      probeFine: Int = Vectors.ProbeFine): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val (assigned, cells, coarse) = loadIvfIndex(spark, path)
    val qrow = assigned.filter(col("vec_id") === queryVecId).limit(1)
      .select(col("en").as("qn"))
    val topc = qrow.crossJoin(broadcast(coarse))
      .select(col("qn"), explode(col("cc")).as("c"))
      .select(col("c.ccid").as("ccid"),
        Vectors.dot(col("qn"), col("c.cn")).as("csim"))
      .orderBy(col("csim").desc, col("ccid"))
      .limit(probeCoarse)
      .select("ccid")
    val topf = broadcast(topc).join(cells, Seq("ccid"))
      .crossJoin(broadcast(qrow))
      .select(col("qn"), explode(col("fc")).as("f"))
      .select(col("f.cid").as("cid"),
        Vectors.dot(col("qn"), col("f.cn")).as("fsim"))
      .orderBy(col("fsim").desc, col("cid"))
      .limit(probeFine)
      .select("cid")
    assigned.join(broadcast(topf), Seq("cid"))
      .crossJoin(broadcast(qrow))
      .filter(col("vec_id") =!= queryVecId)
      .select(col("vec_id"), Vectors.dot(col("en"), col("qn")).as("sim"))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(k)
  }

  // ── PQ code state ──

  /** Persist q88's product-quantization state: the per-subspace codebook
    * (1 row, PqK·dim doubles) and the corpus as PqM codeword ids per
    * vector — the 4-bytes-of-codes-per-vector table a production ADC scan
    * actually reads (the raw vectors stay in their own store, touched only
    * for the constant-depth re-rank). `emb` must be (vec_id, en)
    * normalized (`Vectors.withNormalized`). */
  def savePqIndex(emb: DataFrame, path: String, refine: Int = 0): Unit = {
    val cb = Vectors.pqCodebook(emb, refine)
    cb.write.mode("overwrite").parquet(s"$path/pq/codebook")
    Vectors.pqAssign(emb, cb)
      .write.mode("overwrite").parquet(s"$path/pq/codes")
  }

  /** Append a batch's codes against the FROZEN codebook (the standard PQ
    * add — the codebook drifts only when the owner re-trains, which is
    * `savePqIndex`'s job). Per-batch cost = one narrow coding pass over
    * the batch, independent of the standing corpus size. */
  def appendPqBatch(emb: DataFrame, path: String): Unit = {
    val cb = emb.sparkSession.read.parquet(s"$path/pq/codebook")
    Vectors.pqAssign(emb, cb)
      .write.mode("append").parquet(s"$path/pq/codes")
  }

  /** Re-rank depth for the persisted ADC searches: `rerank` if positive,
    * else max(PqRerank, corpus/2000) — 0.05% of the code table. The r11 2M
    * certification measured WHY a constant depth fails at scale: a
    * 1000-copy near-dup cluster quantizes IDENTICALLY at PqK = 16, the
    * query's ADC score saturates in an 871-way tie at asim = 1.0, and the
    * deterministic vec_id tiebreak hands the constant-100 re-rank an
    * arbitrary id-slice of the tie — recall@5 was 0.0 at 2M vectors (1.0
    * at 200k). Depth must cover the tie width, which tracks the largest
    * duplicate cluster: 0.05% is ≥ the measured 871 at 2M and costs ~1k
    * exact dots against a 2M-row coded scan (noise). Unchanged (= 100) at
    * every harness SF, so the q88-parity pins and the q130/q132 oracles
    * (LIMIT 100) are unaffected. The orthogonal production lever: dedup
    * the corpus FIRST (q81 semdedup exists for exactly this mass). */
  private def autoRerank(spark: SparkSession, codesPath: String,
      rerank: Int): Int =
    if (rerank > 0) rerank
    else math.max(Vectors.PqRerank,
      (spark.read.parquet(codesPath).count() / 2000L).toInt)

  /** q88's ADC search over the PERSISTED codes: the approx scan reads ONLY
    * the codes table (decoded against the loaded 1-row codebook); `emb` is
    * touched for the query row and the re-rank candidates (depth
    * `autoRerank` — corpus-scaled, see there). Bit-identical to in-query
    * q88 for the same corpus at harness scale — IndexStoreSpec pins it. */
  def searchPq(emb: DataFrame, path: String, queryVecId: Long,
      k: Int, rerank: Int = 0): DataFrame = {
    val spark = emb.sparkSession
    graft.functions.GraftFunctions.register(spark)
    val rr = autoRerank(spark, s"$path/pq/codes", rerank)
    val cb = spark.read.parquet(s"$path/pq/codebook")
    val rx = Vectors.pqDecode(spark.read.parquet(s"$path/pq/codes"), cb)
    val qn = emb.filter(col("vec_id") === queryVecId).limit(1)
      .select(col("en").as("qn"))
    val cand = rx.filter(col("vec_id") =!= queryVecId)
      .crossJoin(broadcast(qn))
      .select(col("vec_id"), Vectors.dot(col("rx"), col("qn")).as("asim"))
      .orderBy(col("asim").desc, col("vec_id")).limit(rr)
    cand.join(emb, Seq("vec_id")).crossJoin(broadcast(qn))
      .select(col("vec_id"), Vectors.dot(col("en"), col("qn")).as("sim"))
      .orderBy(col("sim").desc, col("vec_id")).limit(k)
  }

  // ── IVFPQ: coarse routing over position codes (the IVFADC layout) ──

  /** Persist the combined IVF + PQ index: the coarse-centroid routing
    * array (1 row) plus the corpus's POSITION CODES partitioned by coarse
    * cell — the production ANN layout where a query reads only the probed
    * cells' codes (N^(3/4)-ish of a 4 B/vector table) instead of flat-
    * scanning either the vectors (q25) or all codes (`searchPq`). The
    * codebook is trained on the WHOLE corpus (same as `savePqIndex` — so
    * probing every cell reproduces the flat scan bit-for-bit, which is
    * the spec's equivalence pin); routing reuses `Vectors.ivfIndex`'s
    * coarse level. */
  def saveIvfPqIndex(emb: DataFrame, path: String): Unit = {
    val (assigned, _, coarseArr) = Vectors.ivfIndex(emb)
    coarseArr.write.mode("overwrite").parquet(s"$path/ivfpq/coarse")
    val cb = Vectors.pqCodebook(emb)
    cb.write.mode("overwrite").parquet(s"$path/ivfpq/codebook")
    buildRepartition(Vectors.pqAssign(emb, cb)
      .join(assigned.select("vec_id", "ccid"), Seq("vec_id")), "ccid", "vec_id")
      .sortWithinPartitions("ccid", "vec_id")
      .write.mode("overwrite").partitionBy("ccid")
      .parquet(s"$path/ivfpq/codes")
  }

  /** ADC search over the probed coarse cells only: rank the loaded coarse
    * array against the query, read the top `probeCoarse` cells' code
    * partitions (the ccid partition column prunes the scan — spec-pinned
    * PartitionFilters), decode + approx-score those codes, exact re-rank.
    * With `probeCoarse` >= the cell count this is bit-identical to
    * `searchPq` (same codebook, same codes, same re-rank) — IndexStoreSpec
    * pins that equivalence; at small probeCoarse it trades recall for a
    * per-query read that shrinks as cells/corpus. */
  def searchIvfPq(emb: DataFrame, path: String, queryVecId: Long, k: Int,
      probeCoarse: Int, rerank: Int = 0): DataFrame = {
    val spark = emb.sparkSession
    graft.functions.GraftFunctions.register(spark)
    val rr = autoRerank(spark, s"$path/ivfpq/codes", rerank)
    val coarse = spark.read.parquet(s"$path/ivfpq/coarse")
    val cb = spark.read.parquet(s"$path/ivfpq/codebook")
    val codes = spark.read.parquet(s"$path/ivfpq/codes")
      .select(col("vec_id"), col("codes"), col("ccid").cast("long").as("ccid"))
    val qn = emb.filter(col("vec_id") === queryVecId).limit(1)
      .select(col("en").as("qn"))
    val topc = qn.crossJoin(broadcast(coarse))
      .select(col("qn"), explode(col("cc")).as("c"))
      .select(col("c.ccid").as("ccid"),
        Vectors.dot(col("qn"), col("c.cn")).as("csim"))
      .orderBy(col("csim").desc, col("ccid"))
      .limit(probeCoarse)
      .select("ccid")
    val probedCodes = codes.join(broadcast(topc), Seq("ccid"))
      .select("vec_id", "codes")
    val rx = Vectors.pqDecode(probedCodes, cb)
    val cand = rx.filter(col("vec_id") =!= queryVecId)
      .crossJoin(broadcast(qn))
      .select(col("vec_id"), Vectors.dot(col("rx"), col("qn")).as("asim"))
      .orderBy(col("asim").desc, col("vec_id")).limit(rr)
    cand.join(emb, Seq("vec_id")).crossJoin(broadcast(qn))
      .select(col("vec_id"), Vectors.dot(col("en"), col("qn")).as("sim"))
      .orderBy(col("sim").desc, col("vec_id")).limit(k)
  }

  /** q161's dense leg served FROM the persisted IVFPQ store (VERDICT r13
    * #4): batched top-RetrK cosine retrieval for every query id
    * (< TextOps.RetrQ) — coarse array + codebook + the union of each
    * query's top-`probeCoarse` cells' code partitions are read; the flat
    * vector table never is (the raw vectors are touched only for the
    * bounded re-rank candidates). Per-query cell ranking is a Q×cells
    * catalog frame (the only rank window); the ADC scan decodes + scores
    * each probed cell's codes once per probing query (Q-bounded fan-out,
    * the flat scan's own Q·N dot cost profile) into fixed-point approx
    * scores, keeps top-`autoRerank` per query in bounded TopKAggregator
    * state, and the exact re-rank recomputes floor(1e9·cos) against the
    * raw vectors — the SAME scoring expression as `Vectors.denseRanked`.
    * At probe-all with `rerank` ≥ the corpus size the ranking (and
    * therefore the q173 fusion) is bit-identical to the flat scan
    * (VectorsPqSpec pins it); at the default depth it is the honest ADC
    * approximation, which is what q173's oracle twins in DuckDB (the
    * q132 discipline — an exact-parity grade at production depth would
    * demand re-ranking a corpus fraction, which is the flat scan again).
    * Returns (qid, rk, doc_id, score), rk ≤ RetrK, unordered. */
  def denseRankedFrom(emb: DataFrame, path: String, probeCoarse: Int,
      rerank: Int = 0): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val rr = autoRerank(spark, s"$path/ivfpq/codes", rerank)
    val coarse = spark.read.parquet(s"$path/ivfpq/coarse")
    val cb = spark.read.parquet(s"$path/ivfpq/codebook")
    val codes = spark.read.parquet(s"$path/ivfpq/codes")
      .select(col("vec_id"), col("codes"), col("ccid").cast("long").as("ccid"))
    val q = emb.filter(col("vec_id") < TextOps.RetrQ)
      .select(col("vec_id").as("qid"), col("en").as("qn"))
    val wc = Window.partitionBy("qid").orderBy(col("csim").desc, col("ccid"))
    val probedCells = q.crossJoin(broadcast(coarse))
      .select(col("qid"), explode(col("cc")).as("c"), col("qn"))
      .select(col("qid"), col("c.ccid").as("ccid"),
        Vectors.dot(col("qn"), col("c.cn")).as("csim"))
      .withColumn("cr", row_number().over(wc))
      .filter(col("cr") <= probeCoarse)
      .select("qid", "ccid")
    val cand = codes.join(broadcast(probedCells), Seq("ccid"))
      .join(broadcast(q), Seq("qid"))
      .filter(col("vec_id") >= TextOps.RetrQ)
      .crossJoin(broadcast(Vectors.pqNested(cb)))
      .select(col("qid"), col("vec_id"), expr(
        s"""cast(floor(1.0e9 * graft_dot(flatten(transform(
           |  sequence(0, ${Vectors.PqM - 1}), s -> cbn[s][codes[s]])), qn)) AS bigint)""".stripMargin).as("ascore"))
      // r18 (VERDICT r17 #7): graft_topk replaces the typed TopKAggregator
      // on BOTH the ADC cut and the exact re-rank — identical bounded
      // (score DESC, vec_id ASC) selection, no object boundary around the
      // aggregation (see TextOps.sparseRanked).
      .groupBy("qid")
      .agg(expr(s"graft_topk(ascore, vec_id, $rr)").as("top"))
      .select(col("qid"),
        explode(expr("transform(top, t -> t.doc_id)")).as("vec_id"))
    emb.join(broadcast(cand), Seq("vec_id"))
      .join(broadcast(q), Seq("qid"))
      .select(col("qid"), col("vec_id"),
        expr("cast(floor(1.0e9 * graft_dot(en, qn)) AS bigint)").as("sc"))
      .groupBy("qid")
      .agg(expr(s"graft_topk(sc, vec_id, ${TextOps.RetrK})").as("top"))
      .select(col("qid"), posexplode(col("top")))
      .select(col("qid"), (col("pos") + 1).cast("long").as("rk"),
        col("col.doc_id").as("doc_id"), col("col.score").as("score"))
  }

  /** Add a batch of vectors to a persisted IVF index WITHOUT rebuilding:
    * the batch is assigned against the FROZEN centroid structure (the
    * standard IVF add — centroids drift only when the owner re-trains,
    * which is `saveIvfIndex`/`ivfIndex(refine = n)`'s job) and appended
    * into the same ccid partition layout. Per-batch cost = one narrow
    * assignment pass over the BATCH plus the append — independent of the
    * standing corpus size, the same contract as `appendLshBatch`.
    * `emb` must be (vec_id, en) normalized like the original build
    * (`Vectors.withNormalized`). */
  def appendIvfBatch(emb: DataFrame, path: String): Unit = {
    val spark = emb.sparkSession
    graft.functions.GraftFunctions.register(spark)
    val cells = spark.read.parquet(s"$path/ivf/cells")
    val coarse = spark.read.parquet(s"$path/ivf/coarse")
    Vectors.assignWithIndex(emb, coarse, cells)
      .sortWithinPartitions("cid", "vec_id")
      .write.mode("append").partitionBy("ccid").parquet(s"$path/ivf/vectors")
  }
}
