package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** Corpus-integrity Merkle ledger — the audit family's VERIFICATION leg.
  *
  * q101/q104 diff snapshots by reading BOTH row sets; q167/q169 audit
  * content overlap. What none of them give a 100 TB pipeline is a way to
  * (a) certify "this corpus is bit-identical to the one we trained on",
  * (b) locate WHAT changed between two snapshots without re-reading
  * either, and (c) prove a single document's membership without shipping
  * the corpus. A Merkle tree over the document key space is the textbook
  * answer (Merkle 1979, public knowledge; the same structure every
  * content-addressed store and transparency log uses):
  *
  *   level 0: one node per document, pos = doc_id,
  *            h = md5(doc_id || ':' || text)
  *   level L: pos = child pos div Arity,
  *            h = md5(concat of child hashes in pos order)
  *   root:    the single level-`Levels` node per source
  *            (covers doc_id < Arity^Levels = 16^9 ≈ 6.9e10 — ids, not
  *            docs, size the tree, so sparse/renumbered corpora fit).
  *
  * Keying nodes by DOC_ID RANGES (not row_number ranks) is what makes the
  * structure incremental: an added/removed/changed doc perturbs exactly
  * one root-to-leaf path (Levels+1 nodes), where rank-positioned leaves
  * would shift every position after a removal and diverge the whole tree.
  *
  * Scale shape: the build is one narrow corpus scan into per-doc digests
  * (the 100 TB text is read ONCE, ever) followed by `Levels` aggregations
  * over shrinking frames. Upper-tree size depends on how sources share
  * the id space: n/15 rows when each source owns contiguous id blocks
  * (the production sharding norm), up to ~n/4 when sources interleave
  * ids finely (every 16-id leaf block then pays one node per source
  * present — the Stress `merkle` rows measure 0.24n on the 20-way
  * interleaved testdata). Either way it is hash rows, not text.
  * Diff/verify then run entirely on trees:
  * comparing two 100 TB snapshots reads ~2n hash rows and no
  * text; an inclusion proof reads Arity·Levels = 144 sibling rows. The
  * persisted form (`IndexStore.saveMerkleTree`, q184) is the production
  * surface; the in-query builds here are the oracle-graded verify half.
  *
  * Engine portability: md5 over `CAST(doc_id AS VARCHAR) || ':' || text`
  * and over in-order child-hash concatenation — both render identically
  * in Spark (`md5(concat(...))`, `md5(array_join(transform(array_sort(
  * collect_list(struct(pos, h))), m -> m.h), ''))`) and DuckDB
  * (`md5(string_agg(h, '' ORDER BY pos))`); `div` / `//` agree on the
  * non-negative ids (Tables contract).
  */
object Merkle {

  /** Children per node. 16 keeps proofs small (16·9 sibling rows) while
    * 9 levels cover 16^9 ≈ 6.9e10 ids — headroom over a 10^10-doc corpus. */
  val Arity = 16

  /** Fold rounds above the per-doc leaves; the root lives at this level. */
  val Levels = 9

  /** q183's deterministic probe set: doc_id % ProbeMod == 0. 17 is
    * coprime with the simulateRefresh arithmetic (7/11/13), so probe
    * membership never aliases snapshot-B's edit classes in specs. */
  val ProbeMod = 17L

  // ── probe panels ──
  //
  // `proofs` BROADCASTS its probe frame at every fold level, so the
  // caller owns the bound (VERDICT r15 #1): a panel must be
  // panel-sized, never corpus-fraction-sized, at production scale.

  /** The `%ProbeMod` panel — q183's GRADED instance. A corpus FRACTION
    * (1/mod of all docs): exactly right for oracle grading at catalog
    * scale, wrong as a production audit panel (at 10^10 docs it is a
    * ~600M-row broadcast) — production verification passes a bounded
    * panel (`probeSample` / an explicit id list) instead. */
  def probePanel(docs: DataFrame, mod: Long = ProbeMod): DataFrame =
    docs.filter(col("doc_id") % mod === 0)

  /** A bounded, deterministic n-doc panel: the n smallest docs by
    * md5(doc_id) — a hash order no adversary curating the corpus by id
    * ranges anticipates, yet reproducible run-to-run. Plans as a
    * TakeOrderedAndProject (per-partition top-n, no global sort), so the
    * panel is n rows BY CONSTRUCTION before it ever reaches `proofs`'
    * broadcast — the production spot-audit shape (MerkleSpec pins the
    * plan). */
  def probeSample(docs: DataFrame, n: Int): DataFrame =
    docs.orderBy(md5(col("doc_id").cast("string")), col("doc_id")).limit(n)

  /** The panel for an explicit id list (ids: any frame with a `doc_id`
    * column — an auditor's challenge set, a regulator's sample). The id
    * frame is the broadcast side of the membership join, so the corpus
    * is one pruned scan; the panel size is the id-list size. */
  def probeIds(docs: DataFrame, ids: DataFrame): DataFrame =
    docs.join(broadcast(ids.select(col("doc_id")).distinct()), Seq("doc_id"))

  // ── tree construction ──

  /** Level-0 nodes: one per document, keyed by doc_id. */
  def leafDigests(docs: DataFrame): DataFrame =
    docs.select(col("source"), col("doc_id").cast("long").as("pos"),
      md5(concat(col("doc_id").cast("string"), lit(":"), col("text"))).as("h"))

  /** In-order child-hash concatenation — md5 of it is the parent hash.
    * collect_list is merge-order-nondeterministic; array_sort on the
    * (pos, h) structs (pos unique) restores the total order before the
    * join, so the digest is partitioning-invariant (MerkleSpec pins it). */
  private[operators] def foldLevel(prev: DataFrame): DataFrame =
    prev.groupBy(col("source"), expr(s"pos div $Arity").as("pos"))
      .agg(collect_list(struct(col("pos"), col("h"))).as("mem"))
      .select(col("source"), col("pos"),
        md5(expr("array_join(transform(array_sort(mem), m -> m.h), '')"))
          .as("h"))

  /** All tree levels 0..Levels. With `checkpoint` (the default), every
    * level is localCheckpoint'd: drift/proof consume each level TWICE
    * (as the next fold's input and as a diff/sibling side), and without
    * the barrier Catalyst re-evaluates the whole chain below per
    * reference — the corpus scan would run O(Levels²) times (the
    * q150/q162 fan-out discipline; these QueryDefs are eagerByDesign).
    * Pass checkpoint = false for a single-consumer lazy chain (q181). */
  def levels(docs: DataFrame, checkpoint: Boolean = true): Seq[DataFrame] = {
    val l0raw = leafDigests(docs)
    val l0 = if (checkpoint) l0raw.localCheckpoint(true) else l0raw
    (1 to Levels).scanLeft(l0) { (prev, _) =>
      val f = foldLevel(prev)
      if (checkpoint) f.localCheckpoint(true) else f
    }
  }

  /** Per-source root + doc count, as one lazy chain (each level feeds
    * only the next fold, so no barrier is needed). */
  def roots(docs: DataFrame): DataFrame = {
    val root = levels(docs, checkpoint = false).last
    docs.groupBy("source").agg(count(lit(1)).as("n_docs"))
      .join(root.select(col("source"), col("h").as("root")), Seq("source"))
      .orderBy("source")
  }

  /** Per-(level, source) divergence between two snapshots' trees: node
    * counts on each side and the number of positions whose hashes differ
    * or exist on one side only. Localization is the point: one changed
    * doc is ONE divergent node per level, so the count at level 0 is the
    * exact changed/added/removed doc set (pos = doc_id) and shrinks
    * 16×-ish per level toward the root bit. */
  def drift(docsA: DataFrame, docsB: DataFrame): DataFrame =
    driftLevels(levels(docsA), levels(docsB))

  /** The tree-vs-tree comparison itself, over already-built (or
    * store-loaded — `IndexStore.loadMerkleLevels`) level frames: the
    * production `Snapshot merkle-diff` path, where neither corpus is
    * read at all. */
  def driftLevels(la: Seq[DataFrame], lb: Seq[DataFrame]): DataFrame = {
    val perLevel = (0 to Levels).map { l =>
      val a = la(l).select(col("source").as("asrc"), col("pos").as("apos"),
        col("h").as("ah"))
      val b = lb(l).select(col("source").as("bsrc"), col("pos").as("bpos"),
        col("h").as("bh"))
      a.join(b, col("asrc") === col("bsrc") && col("apos") === col("bpos"),
          "full_outer")
        .select(lit(l).cast("int").as("level"),
          coalesce(col("asrc"), col("bsrc")).as("source"),
          when(col("ah").isNull, lit(0L)).otherwise(lit(1L)).as("ia"),
          when(col("bh").isNull, lit(0L)).otherwise(lit(1L)).as("ib"),
          when(col("ah").isNull || col("bh").isNull ||
            col("ah") =!= col("bh"), lit(1L)).otherwise(lit(0L)).as("dv"))
    }
    perLevel.reduce(_ unionByName _)
      .groupBy("level", "source")
      .agg(sum("ia").as("n_a"), sum("ib").as("n_b"), sum("dv").as("n_div"))
      .orderBy("level", "source")
  }

  /** Inclusion proofs for the PROBE docs, verified end-to-end: recompute
    * the leaf digest from the document row, then fold up the tree using
    * ONLY the stored sibling group at each level (own-path node replaced
    * by the running recomputation), and compare against the stored root.
    * `ok` = 1 certifies both membership and sibling integrity with
    * Arity·Levels stored rows read per probe — the O(log n) audit.
    *
    * `probeDocs` is the panel — document rows, BOUNDED BY THE CALLER
    * (`probeSample`/`probeIds` for production, `probePanel` for the
    * graded instance): it is broadcast at each of the `Levels` sibling
    * joins, so its size is the query's driver/executor memory bound.
    * `lvls` must be the checkpointed `levels(...)` output (each level is
    * read as a sibling side here AND fed the next fold when built). */
  def proofs(probeDocs: DataFrame, lvls: Seq[DataFrame]): DataFrame = {
    var p = probeDocs
      .select(col("doc_id"), col("source"),
        col("doc_id").cast("long").as("pos"),
        md5(concat(col("doc_id").cast("string"), lit(":"), col("text")))
          .as("rh"))
    for (l <- 0 until Levels) {
      val t = lvls(l).select(col("source").as("tsrc"), col("pos").as("tpos"),
        col("h"))
      // Probe side broadcast: the tree level never shuffles; the matched
      // ≤ Arity rows per probe aggregate on the probe key.
      p = t.join(broadcast(p),
          col("tsrc") === col("source") &&
            expr(s"tpos div $Arity") === expr(s"pos div $Arity"))
        .withColumn("hh",
          when(col("tpos") === col("pos"), col("rh")).otherwise(col("h")))
        .groupBy(col("doc_id"), col("source"),
          expr(s"pos div $Arity").as("pos"))
        .agg(collect_list(struct(col("tpos").as("pos"), col("hh").as("h")))
          .as("mem"))
        .select(col("doc_id"), col("source"), col("pos"),
          md5(expr("array_join(transform(array_sort(mem), m -> m.h), '')"))
            .as("rh"))
    }
    p.join(lvls(Levels).select(col("source").as("rsrc"),
        col("h").as("root_stored")), col("rsrc") === col("source"))
      .select(col("doc_id"), col("source"),
        col("rh").as("root_rebuilt"), col("root_stored"),
        when(col("rh") === col("root_stored"), lit(1L)).otherwise(lit(0L))
          .as("ok"))
      .orderBy("doc_id")
  }

  // ── DuckDB oracle fragments ──

  /** The level chain as CTEs `<p>0..<p>Levels` over doc table/CTE `src`.
    * MATERIALIZED: drift/proof reference each level twice, and DuckDB
    * re-inlines non-materialized CTEs per reference (the q170 lesson). */
  private[operators] def levelCtes(src: String, p: String): String = {
    val sb = new StringBuilder
    sb.append(s"""${p}0 AS MATERIALIZED (
                 |  SELECT source, CAST(doc_id AS BIGINT) AS pos,
                 |         md5(CAST(doc_id AS VARCHAR) || ':' || text) AS h
                 |  FROM $src)""".stripMargin)
    for (l <- 1 to Levels)
      sb.append(s""",
                   |${p}$l AS MATERIALIZED (
                   |  SELECT source, pos // $Arity AS pos,
                   |         md5(string_agg(h, '' ORDER BY pos)) AS h
                   |  FROM ${p}${l - 1} GROUP BY source, pos // $Arity)""".stripMargin)
    sb.toString
  }

  /** simulateRefresh as a CTE — the exact q101 snapshot-B arithmetic. */
  private val refreshCte =
    """bdocs AS MATERIALIZED (
      |  SELECT doc_id, source,
      |         CASE WHEN doc_id % 7 = 0 THEN text || ' rev2' ELSE text END AS text
      |  FROM documents WHERE doc_id % 13 != 0
      |  UNION ALL
      |  SELECT doc_id + 10000000 AS doc_id, source, text || ' new' AS text
      |  FROM documents WHERE doc_id % 11 = 0)""".stripMargin

  private def rootsOracle: String =
    s"""WITH ${levelCtes("documents", "a")},
       |n AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs
       |      FROM documents GROUP BY source)
       |SELECT n.source, n.n_docs, a$Levels.h AS root
       |FROM n JOIN a$Levels USING (source) ORDER BY source""".stripMargin

  private def driftOracle: String = {
    val diffs = (0 to Levels).map { l =>
      s"""  SELECT $l AS level, coalesce(a.source, b.source) AS source,
         |         CASE WHEN a.h IS NULL THEN 0 ELSE 1 END AS ia,
         |         CASE WHEN b.h IS NULL THEN 0 ELSE 1 END AS ib,
         |         CASE WHEN a.h IS NULL OR b.h IS NULL OR a.h <> b.h
         |              THEN 1 ELSE 0 END AS dv
         |  FROM a$l a FULL OUTER JOIN b$l b
         |    ON a.source = b.source AND a.pos = b.pos""".stripMargin
    }.mkString("\n  UNION ALL\n")
    s"""WITH ${levelCtes("documents", "a")},
       |$refreshCte,
       |${levelCtes("bdocs", "b")},
       |lv AS (
       |$diffs)
       |SELECT level, source, CAST(sum(ia) AS BIGINT) AS n_a,
       |       CAST(sum(ib) AS BIGINT) AS n_b,
       |       CAST(sum(dv) AS BIGINT) AS n_div
       |FROM lv GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  }

  private def proofOracle: String = {
    val sb = new StringBuilder
    sb.append(s"""WITH ${levelCtes("documents", "a")},
                 |p0 AS (
                 |  SELECT doc_id, source, CAST(doc_id AS BIGINT) AS pos,
                 |         md5(CAST(doc_id AS VARCHAR) || ':' || text) AS rh
                 |  FROM documents WHERE doc_id % $ProbeMod = 0)""".stripMargin)
    for (l <- 0 until Levels)
      sb.append(s""",
                   |p${l + 1} AS (
                   |  SELECT p.doc_id, p.source, p.pos // $Arity AS pos,
                   |         md5(string_agg(CASE WHEN t.pos = p.pos THEN p.rh ELSE t.h END,
                   |                        '' ORDER BY t.pos)) AS rh
                   |  FROM p$l p JOIN a$l t
                   |    ON t.source = p.source AND t.pos // $Arity = p.pos // $Arity
                   |  GROUP BY p.doc_id, p.source, p.pos // $Arity)""".stripMargin)
    sb.append(s"""
                 |SELECT p.doc_id, p.source, p.rh AS root_rebuilt,
                 |       r.h AS root_stored,
                 |       CAST(CASE WHEN p.rh = r.h THEN 1 ELSE 0 END AS BIGINT) AS ok
                 |FROM p$Levels p JOIN a$Levels r ON r.source = p.source
                 |ORDER BY p.doc_id""".stripMargin)
    sb.toString
  }

  // ── catalog entries ──

  val defs: Seq[QueryDef] = Seq(

    // ── Per-source corpus digest: the Merkle roots ──
    QueryDef(
      "q181_merkle_roots",
      (s, dir) => {
        // The corpus's integrity fingerprint: one root per source. Equal
        // roots certify bit-identical (doc_id, text) content — the check
        // a training run records in its datasheet (q121) and a replica
        // re-derives before serving. One corpus text scan, then Levels
        // hash folds over 16×-shrinking frames (lazy single chain — no
        // barrier needed).
        Merkle.roots(Tables.load(s, dir, "documents"))
      },
      Some(rootsOracle)),

    // ── Snapshot drift localization on the trees ──
    QueryDef(
      "q182_merkle_drift",
      (s, dir) => {
        // Where q101 diffs two snapshots row-by-row (both corpora
        // re-read), this compares their TREES: per (level, source) node
        // counts and divergent positions. Level 0's n_div is the exact
        // changed/added/removed doc count (pos = doc_id); each level up
        // merges 16 children, so divergence shrinks toward the root and
        // a reader can descend from the root touching only divergent
        // subtrees — O(changed · Levels) hash reads to localize edits in
        // a 100 TB corpus, no text reads. In-query both trees are built
        // here (the verify half); production diffs two PERSISTED trees
        // (`Snapshot merkle-diff`).
        val docs = Tables.load(s, dir, "documents")
        Merkle.drift(docs, Dedup.simulateRefresh(docs))
      },
      Some(driftOracle)),

    // ── Inclusion proofs, verified against the root ──
    QueryDef(
      "q183_merkle_proof",
      (s, dir) => {
        // Membership certification for the deterministic probe set
        // (doc_id % ProbeMod): recompute each probe's leaf digest from
        // its text, fold up through the stored sibling groups (own-path
        // node replaced at every level), compare with the root. ok = 1
        // proves the doc is IN the corpus the root commits to, reading
        // Arity·Levels = 144 tree rows per probe — the spot-audit a
        // data consumer runs against a published root without the
        // corpus. The %ProbeMod panel is the GRADED instance (oracle-
        // enumerable); production audits pass a bounded panel
        // (probeSample / probeIds — see `proofs`' broadcast contract).
        val docs = Tables.load(s, dir, "documents")
        Merkle.proofs(Merkle.probePanel(docs), Merkle.levels(docs))
      },
      Some(proofOracle)),

    // ── Roots served from the persisted tree ──
    QueryDef(
      "q184_merkle_from_store",
      (s, dir) => {
        // q181's production form: the tree persists once
        // (`IndexStore.saveMerkleTree` — leaves append-only, upper
        // levels rebuilt from leaf hashes on append, sub-linear rows), and
        // every integrity read is store-only: roots from the level-9
        // partition, doc counts from the leaf partition, corpus text
        // untouched. Graded by q181's oracle — re-derived from text, so
        // the hash match proves the persist→read round trip commits to
        // exactly the corpus content.
        val scratch = graft.Scratch.dir("q184-store")
        IndexStore.saveMerkleTree(Tables.load(s, dir, "documents"), scratch)
        val leaves = IndexStore.loadMerkleLeaves(s, scratch)
        val root = IndexStore.loadMerkleNodes(s, scratch, Levels)
        leaves.groupBy("source").agg(count(lit(1)).as("n_docs"))
          .join(root.select(col("source"), col("h").as("root")),
            Seq("source"))
          .orderBy("source")
      },
      Some(rootsOracle))
  )
}
