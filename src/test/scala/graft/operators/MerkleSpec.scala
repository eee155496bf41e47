package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SharedSpark, Snapshot, Tables}

/** The Merkle integrity ledger's contracts (q181–q184, `Snapshot
  * merkle-*`): digests are partitioning-invariant, edits localize to one
  * root-to-leaf path, proofs accept exactly the committed corpus, and
  * the persisted tree serves/appends/compacts without drifting from the
  * in-query build. */
class MerkleSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  private val sf = "/root/testdata/sf0.001"
  private def docs = Tables.load(spark, sf, "documents")
  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-merkle-$tag").toString

  test("roots are invariant to input partitioning") {
    val a = Merkle.roots(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSeq
    val b = Merkle.roots(docs.repartition(7)).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSeq
    assert(a == b)
    assert(a.nonEmpty && a.map(_._3).distinct.size == a.size,
      "per-source roots must differ (distinct content)")
  }

  test("one edited doc diverges exactly one node per level — the localization contract") {
    val edited = docs.withColumn("text",
      when(col("doc_id") === 42, concat(col("text"), lit(" tampered")))
        .otherwise(col("text")))
    val d = Merkle.drift(docs, edited).collect()
    val src42 = docs.filter(col("doc_id") === 42).head().getAs[String]("source")
    for (l <- 0 to Merkle.Levels) {
      val rows = d.filter(_.getInt(0) == l)
      assert(rows.map(_.getLong(4)).sum == 1L, s"level $l: expected 1 divergent node")
      assert(rows.filter(_.getLong(4) > 0).map(_.getString(1)).toSeq == Seq(src42))
      // no adds/removes: node counts agree on every (level, source)
      rows.foreach(r => assert(r.getLong(2) == r.getLong(3)))
    }
  }

  test("refresh drift: level 0 is the exact edit arithmetic; divergence shrinks toward the root") {
    val d = Merkle.drift(docs, Dedup.simulateRefresh(docs)).collect()
    val Array(removed, changed, added) = docs.agg(
      sum(when(col("doc_id") % 13 === 0, 1L).otherwise(0L)),
      sum(when(col("doc_id") % 13 =!= 0 && col("doc_id") % 7 === 0, 1L)
        .otherwise(0L)),
      sum(when(col("doc_id") % 11 === 0, 1L).otherwise(0L)))
      .head().toSeq.map(_.asInstanceOf[Long]).toArray
    val perLevel = (0 to Merkle.Levels).map(l =>
      d.filter(_.getInt(0) == l).map(_.getLong(4)).sum)
    assert(perLevel.head == removed + changed + added)
    // Every divergent parent has >= 1 divergent child, so counts are
    // non-increasing up the tree — that monotone funnel is what makes
    // root-down descent O(changed · Levels).
    perLevel.sliding(2).foreach { case Seq(lo, hi) =>
      assert(hi <= lo, s"divergence grew up the tree: $perLevel") }
    assert(perLevel.last >= 1)
  }

  test("proofs accept the committed corpus and reject exactly a tampered doc") {
    val clean = Merkle.proofs(Merkle.probePanel(docs), Merkle.levels(docs))
      .collect()
    val expProbes = docs.filter(col("doc_id") % Merkle.ProbeMod === 0).count()
    assert(clean.length == expProbes && expProbes > 0)
    assert(clean.forall(_.getLong(4) == 1L))
    // Tree committed to a corpus where probe doc 34 differs: every other
    // probe's fold reproduces the tampered root (their own leaves agree
    // with the stored siblings), so ONLY doc 34's proof fails.
    val tampered = docs.withColumn("text",
      when(col("doc_id") === 34, concat(col("text"), lit(" x")))
        .otherwise(col("text")))
    val pf = Merkle.proofs(Merkle.probePanel(docs), Merkle.levels(tampered))
      .collect()
    assert(pf.filter(_.getLong(4) == 0L).map(_.getLong(0)).toSeq == Seq(34L))
  }

  test("bounded probe panels: sample/id-list panels verify; the broadcast side is panel-sized") {
    val lvls = Merkle.levels(docs)
    // A 100-doc sampled panel: exactly n probes, all proofs green.
    val sampled = Merkle.proofs(Merkle.probeSample(docs, 100), lvls).collect()
    assert(sampled.length == 100 && sampled.forall(_.getLong(4) == 1L))
    // Deterministic: same panel (same doc ids) on a re-evaluation.
    val again = Merkle.proofs(Merkle.probeSample(docs, 100), lvls).collect()
    assert(sampled.map(_.getLong(0)).toSeq == again.map(_.getLong(0)).toSeq)
    // Explicit id-list panel: exactly the requested docs.
    import spark.implicits._
    val ids = Seq(3L, 59L, 241L).toDF("doc_id")
    val listed = Merkle.proofs(Merkle.probeIds(docs, ids), lvls).collect()
    assert(listed.map(_.getLong(0)).toSeq.sorted == Seq(3L, 59L, 241L))
    assert(listed.forall(_.getLong(4) == 1L))
    // The scale contract (VERDICT r15 #1): what `proofs` broadcasts is
    // the PANEL, and a sampled panel is bounded BY CONSTRUCTION — the
    // broadcast subtree carries the top-n limit (TakeOrderedAndProject /
    // global limit), never a corpus-shaped scan-only branch.
    val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = Merkle.proofs(Merkle.probeSample(docs, 100),
        Merkle.levels(docs)).queryExecution.executedPlan
      val bcasts = plan.collect {
        case b: org.apache.spark.sql.execution.exchange.BroadcastExchangeExec => b
      }
      assert(bcasts.nonEmpty, "probe side must broadcast")
      // The FIRST fold level's broadcast is the raw panel — its subtree
      // must contain the limit that bounds it.
      assert(bcasts.exists(_.exists {
        case _: org.apache.spark.sql.execution.TakeOrderedAndProjectExec => true
        case _: org.apache.spark.sql.execution.GlobalLimitExec => true
        case _ => false
      }), s"no broadcast subtree carries the panel's top-n bound:\n$plan")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("store round trip serves the in-query tree; append ≡ rebuild bit-identically") {
    val full = tmp("full")
    IndexStore.saveMerkleTree(docs, full)
    val sr = IndexStore.loadMerkleNodes(spark, full, Merkle.Levels)
      .collect().map(r => (r.getString(0), r.getString(2))).toSeq.sorted
    val qr = Merkle.roots(docs).collect()
      .map(r => (r.getString(0), r.getString(2))).toSeq.sorted
    assert(sr == qr)
    // Scattered disjoint ids (%5 interleaves with the stored corpus) must
    // take the full-rebuild path; a monotone batch (all ids above the
    // stored max — the crawl norm) must take the tail fast path. Both
    // must land bit-identical to the from-scratch build.
    val inc = tmp("inc")
    IndexStore.saveMerkleTree(docs.filter(col("doc_id") % 5 =!= 0), inc)
    val scatterTail =
      IndexStore.appendMerkleBatch(docs.filter(col("doc_id") % 5 === 0), inc)
    assert(!scatterTail, "scattered ids must fall back to the full rebuild")
    val mono = tmp("mono")
    IndexStore.saveMerkleTree(docs.filter(col("doc_id") < 250), mono)
    // Gate forced open (tailMinLeafBytes = 0): a test-sized leaf table is
    // below the production crossover, and THIS path is the one under pin.
    val monoTail = IndexStore.appendMerkleBatch(
      docs.filter(col("doc_id") >= 250), mono, tailMinLeafBytes = 0L)
    assert(monoTail, "an all-above-max batch must take the tail path")
    val lf = IndexStore.loadMerkleLevels(spark, full)
    for (other <- Seq(inc, mono)) {
      val lo = IndexStore.loadMerkleLevels(spark, other)
      for (l <- 0 to Merkle.Levels) {
        val a = lf(l).collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSeq.sorted
        val b = lo(l).collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSeq.sorted
        assert(a == b, s"level $l diverged between full build and append path ($other)")
      }
    }
  }

  test("replayed append is a leaf no-op that still repairs the upper tree") {
    val p = tmp("replay")
    IndexStore.saveMerkleTree(docs.filter(col("doc_id") < 300), p)
    val batch = docs.filter(col("doc_id") >= 300)
    IndexStore.appendMerkleBatch(batch, p)
    val nLeaves = IndexStore.loadMerkleLeaves(spark, p).count()
    val before = IndexStore.loadMerkleNodes(spark, p, Merkle.Levels)
      .collect().map(r => (r.getString(0), r.getString(2))).toSeq.sorted
    // Re-delivered epoch (the foreachBatch restart window): every id is
    // already stored — the anti-join drops them all, the upper refold
    // still runs, nothing changes.
    IndexStore.appendMerkleBatch(batch, p)
    assert(IndexStore.loadMerkleLeaves(spark, p).count() == nLeaves,
      "replay duplicated leaf rows")
    val after = IndexStore.loadMerkleNodes(spark, p, Merkle.Levels)
      .collect().map(r => (r.getString(0), r.getString(2))).toSeq.sorted
    assert(after == before)
  }

  test("streaming ledger sink: micro-batches land in the tree == one-shot build") {
    val base = java.nio.file.Files.createTempDirectory("graft-merkle-stream")
    val treeDir = s"$base/tree"; val refDir = s"$base/ref"
    IndexStore.saveMerkleTree(docs.filter(col("doc_id") < 200), treeDir)
    // Two monotone-id micro-batches land through the sink.
    val streamDir = new java.io.File(s"$base/in"); streamDir.mkdirs()
    Seq(docs.filter(col("doc_id") >= 200 && col("doc_id") < 350),
      docs.filter(col("doc_id") >= 350)).zipWithIndex.foreach {
      case (df, i) =>
        val stage = new java.io.File(streamDir, s"stage_$i")
        df.coalesce(1).write.parquet(stage.getPath)
        val part = stage.listFiles().find(_.getName.startsWith("part-")).get
        val dest = new java.io.File(streamDir, s"$i.parquet")
        assert(part.renameTo(dest))
        dest.setLastModified((i + 1) * 1000000L)
    }
    val q = graft.streaming.Streams.merkleLedgerSink(
      graft.streaming.Streams.readDocsStream(spark, streamDir.getPath,
        "*.parquet", Some(1)),
      treeDir, s"$base/ckpt")
    q.awaitTermination()
    IndexStore.saveMerkleTree(docs, refDir)
    val a = IndexStore.loadMerkleLevels(spark, treeDir)
    val b = IndexStore.loadMerkleLevels(spark, refDir)
    for (l <- 0 to Merkle.Levels) {
      val x = a(l).collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSeq.sorted
      val y = b(l).collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSeq.sorted
      assert(x == y, s"level $l diverged between streamed ledger and one-shot build")
    }
  }

  test("CLI: build → root → diff localizes the refresh → verify → compact keeps verdicts") {
    val base = java.nio.file.Files.createTempDirectory("graft-merkle-cli")
    val docsA = s"$base/docsA"; val docsB = s"$base/docsB"
    val treeA = s"$base/treeA"; val treeB = s"$base/treeB"
    docs.write.parquet(s"$docsA/documents.parquet")
    Dedup.simulateRefresh(docs).write.parquet(s"$docsB/documents.parquet")

    val nSources = docs.select("source").distinct().count()
    val b1 = Snapshot.run(spark, List("merkle-build", docsA, treeA))
    assert(b1.contains(s""""sources":$nSources"""), b1)
    Snapshot.run(spark, List("merkle-build", docsB, treeB))

    val roots = Snapshot.run(spark, List("merkle-root", treeA))
    assert(roots.contains(s""""sources":$nSources"""), roots)
    assert(Snapshot.run(spark, List("merkle-root", s"$base/missing"))
      .contains(""""sources":0"""))

    // Tree-vs-tree diff reproduces the edit arithmetic without a corpus.
    val want = docs.agg(sum(when(col("doc_id") % 13 === 0, 1L)
      .otherwise(when(col("doc_id") % 7 === 0, 1L).otherwise(0L))) +
      sum(when(col("doc_id") % 11 === 0, 1L).otherwise(0L)))
      .head().getLong(0)
    val d = Snapshot.run(spark, List("merkle-diff", treeA, treeB))
    assert(d.contains(s""""changed_docs":$want"""), d)

    val v = Snapshot.run(spark, List("merkle-verify", docsA, treeA))
    assert(v.contains(""""failed":0"""), v)

    // Bounded production panels through the CLI: a sampled n-panel and
    // an explicit id-list parquet.
    val vn = Snapshot.run(spark,
      List("merkle-verify", docsA, treeA, "--probes", "25"))
    assert(vn.contains(""""probes":25""") && vn.contains(""""failed":0"""), vn)
    val idsPath = s"$base/probe-ids"
    docs.select("doc_id").orderBy("doc_id").limit(7)
      .write.parquet(idsPath)
    val vf = Snapshot.run(spark,
      List("merkle-verify", docsA, treeA, "--probes", idsPath))
    assert(vf.contains(""""probes":7""") && vf.contains(""""failed":0"""), vf)
    // malformed specs fail with the contract, not a NumberFormatException
    // or a silently-misrouted corpus-sized sample
    val e1 = intercept[RuntimeException] { Snapshot.run(spark,
      List("merkle-verify", docsA, treeA, "--probes", "0")) }
    assert(e1.getMessage.contains("neither a positive int"), e1.getMessage)
    val e2 = intercept[RuntimeException] { Snapshot.run(spark,
      List("merkle-verify", docsA, treeA, "--probes", "99999999999")) }
    assert(e2.getMessage.contains("neither a positive int"), e2.getMessage)
    // a digit-named EXISTING path (relative — an absolute path is never
    // an int) is ambiguous: refused, never silently sampled
    val digitDir = new java.io.File("31415926").getAbsoluteFile
    assert(digitDir.mkdir(), s"could not stage $digitDir")
    try {
      val e3 = intercept[RuntimeException] { Snapshot.run(spark,
        List("merkle-verify", docsA, treeA, "--probes", "31415926")) }
      assert(e3.getMessage.contains("both a count and an existing path"),
        e3.getMessage)
    } finally digitDir.delete()

    val c = Snapshot.run(spark, List("merkle-compact", treeA))
    assert(c.contains(""""mode":"merkle-compact""""), c)
    val v2 = Snapshot.run(spark, List("merkle-verify", docsA, treeA))
    assert(v2.contains(""""failed":0"""), v2)
  }
}
