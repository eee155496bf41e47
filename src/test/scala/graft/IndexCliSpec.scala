package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{IndexStore, Vectors}

/** The Index CLI must drive the complete incremental loop end-to-end:
  * build → dedupe (verdicts == q80) → append-kept (index grows by exactly
  * the kept docs' rows); and the IVF side: build → append assigns against
  * the FROZEN centroids → search still probes one cell. */
class IndexCliSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def tmp(tag: String): java.nio.file.Path =
    java.nio.file.Files.createTempDirectory(s"graft-idxcli-$tag")

  test("build-lsh → dedupe → --append-kept: the full incremental crawl loop") {
    val base = tmp("loop")
    val standingDir = base.resolve("standing"); val batchDir = base.resolve("batch")
    val idx = base.resolve("idx").toString
    val docs = Tables.load(spark, sf, "documents")
    docs.filter(col("doc_id") % 4 =!= 0)
      .write.parquet(s"$standingDir/documents.parquet")
    docs.filter(col("doc_id") % 4 === 0)
      .write.parquet(s"$batchDir/documents.parquet")

    val b = Index.run(spark, List("build-lsh", standingDir.toString, idx))
    assert(b.contains(""""mode":"build-lsh""""))

    val out = base.resolve("verdicts").toString
    val d = Index.run(spark,
      List("dedupe", batchDir.toString, idx, "--out", out, "--append-kept"))
    // Verdict table == q80 (the store path's equivalence, via the CLI).
    val got = spark.read.parquet(out)
      .collect().map(r => (r.getLong(0), Option(r.get(1)), r.getInt(2))).toSet
    val want = SparkEntry.queries("q80_incremental_dedup")(spark, sf)
      .collect().map(r => (r.getLong(0), Option(r.get(1)), r.getInt(2))).toSet
    assert(got === want)
    val nKept = want.count(_._3 == 1); val nDup = want.size - nKept
    assert(d.contains(s""""dups":$nDup""") && d.contains(s""""kept":$nKept"""))

    // --append-kept grew the index by exactly the kept docs' band rows.
    val bands = IndexStore.loadLshBands(spark, idx)
    assert(bands.filter(col("doc_id") % 4 === 0)
      .select("doc_id").distinct().count() === nKept)
    // Re-deduping a shifted copy of the kept batch against the grown index
    // flags every doc (its twin is now IN the index).
    val shifted = spark.read.parquet(s"$batchDir/documents.parquet")
      .join(spark.read.parquet(out).filter(col("keep") === 1).select("doc_id"),
        Seq("doc_id"))
      .withColumn("doc_id", -col("doc_id") - 1)
    val re = IndexStore.incrementalDedup(shifted,
      IndexStore.loadLshBands(spark, idx), IndexStore.loadLshShingles(spark, idx))
    assert(re.filter(col("keep") === 0).count() === nKept)
  }

  test("build-ivf → append-ivf assigns against frozen centroids; search probes the grown index") {
    val base = tmp("ivf")
    val standingDir = base.resolve("emb"); val idx = base.resolve("idx").toString
    val emb = Tables.embeddings(spark, sf)
    // standing = even vec_ids, batch = odd; both through the CLI seams.
    spark.read.parquet(s"$sf/embeddings.parquet")
      .filter(col("vec_id") % 2 === 0)
      .write.parquet(s"$standingDir/embeddings.parquet")
    val batchDir = base.resolve("embB")
    spark.read.parquet(s"$sf/embeddings.parquet")
      .filter(col("vec_id") % 2 === 1)
      .write.parquet(s"$batchDir/embeddings.parquet")

    Index.run(spark, List("build-ivf", standingDir.toString, idx))
    val (before, cells, coarse) = IndexStore.loadIvfIndex(spark, idx)
    val nBefore = before.count()
    Index.run(spark, List("append-ivf", batchDir.toString, idx))

    val (after, _, _) = IndexStore.loadIvfIndex(spark, idx)
    assert(after.count() === nBefore +
      spark.read.parquet(s"$batchDir/embeddings.parquet").count())
    // Appended vectors carry the same (ccid, cid) the frozen structure
    // assigns them — no centroid drift.
    val batchN = Vectors.withNormalized(
        spark.read.parquet(s"$batchDir/embeddings.parquet")
          .select(col("vec_id"), col("embedding").cast("array<double>").as("e"), col("label")))
      .select(col("vec_id"), col("en"))
    val expect = Vectors.assignWithIndex(batchN, coarse, cells)
      .select("vec_id", "ccid", "cid")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val stored = after.join(batchN.select("vec_id"), Seq("vec_id"))
      .select("vec_id", "ccid", "cid")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(stored === expect)

    // Search on an appended vector returns its cell-mates by exact cosine.
    val someOdd = expect.head._1
    val s = Index.run(spark, List("search", idx, someOdd.toString, "3"))
    assert(s.contains(""""mode":"search"""") && s.contains(""""hits":[{"""))
  }

  test("build-pairs → audit through the CLI matches the in-query pair family") {
    val base = tmp("pairs")
    val idx = base.resolve("idx").toString
    val b = Index.run(spark, List("build-pairs", sf, idx))
    assert(b.contains(""""mode":"build-pairs""""))

    val docs = Tables.load(spark, sf, "documents")
    val wantJ = operators.Dedup.jaccardPairs(docs).count()
    val a = Index.run(spark, List("audit", idx))
    assert(a.contains(s""""pairs":$wantJ"""), s"$a vs $wantJ jaccard pairs")
    assert(a.contains(""""metric":"jaccard""""))

    val wantC = operators.Dedup.containmentPairs(docs).count()
    val c = Index.run(spark, List("audit", idx, "--contain"))
    assert(c.contains(s""""pairs":$wantC"""), s"$c vs $wantC containment pairs")
    assert(c.contains(""""metric":"containment""""))

    // components off the store == q47's component structure in-query.
    val q47 = SparkEntry.queries("q47_dedup_components")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val k = Index.run(spark, List("components", idx))
    assert(k.contains(s""""n_components":${q47.map(_._2).distinct.length}"""), k)
    assert(k.contains(s""""n_docs":${q47.length}"""), k)

    // consolidate off the store == q102 BIT-IDENTICAL (stored buckets keep
    // `ds` sorted, so the mined pair set — and every consolidated row,
    // including the comma-joined source list and char sums — is the same).
    val outC = base.resolve("consolidated").toString
    val cons = Index.run(spark, List("consolidate", sf, idx, "--out", outC))
    val gotRows = spark.read.parquet(outC).orderBy("component")
      .collect().map(_.toSeq).toSeq
    val wantRows = SparkEntry.queries("q102_dup_consolidate")(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(gotRows === wantRows)
    assert(cons.contains(s""""n_components":${wantRows.size}"""), cons)
  }

  test("build-registry → decontam through the CLI == in-query q105") {
    val base = tmp("registry")
    val regDir = base.resolve("registry"); val corpusDir = base.resolve("corpus")
    val idx = base.resolve("idx").toString
    val docs = Tables.load(spark, sf, "documents")
    docs.filter(col("doc_id") % 4 === 0)
      .write.parquet(s"$regDir/documents.parquet")
    docs.filter(col("doc_id") % 4 =!= 0)
      .write.parquet(s"$corpusDir/documents.parquet")

    val b = Index.run(spark, List("build-registry", regDir.toString, idx))
    assert(b.contains(""""mode":"build-registry""""), b)

    val out = base.resolve("hits").toString
    val d = Index.run(spark, List("decontam", corpusDir.toString, idx, "--out", out))
    val got = spark.read.parquet(out)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = SparkEntry.queries("q105_bloom_decontam")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(want.nonEmpty)
    assert(got === want)
    assert(d.contains(s""""contaminated":${want.size}"""), d)
  }

  test("build-pq → search-pq through the CLI == in-query q88") {
    val base = tmp("pq")
    val idx = base.resolve("idx").toString
    val b = Index.run(spark, List("build-pq", sf, idx))
    assert(b.contains(""""mode":"build-pq""""))
    val s = Index.run(spark, List("search-pq", sf, idx, "0", "5"))
    val want = SparkEntry.queries("q88_pq_ann")(spark, sf)
      .collect()
      .map(r => s"""{"vec_id":${r.getLong(0)},"sim":${r.getDouble(1)}}""")
      .mkString(",")
    assert(s === s"""{"mode":"search-pq","query":0,"k":5,"hits":[$want]}""")
  }

  test("build-winnow → winnow-audit through the CLI == in-query q118") {
    val base = tmp("winnow")
    val idx = base.resolve("idx").toString
    val b = Index.run(spark, List("build-winnow", sf, idx))
    assert(b.contains(""""mode":"build-winnow""""), b)
    val want = SparkEntry.queries("q118_winnow_pairs")(spark, sf).collect()
    val a = Index.run(spark, List("winnow-audit", idx))
    assert(a.contains(s""""pairs":${want.length}"""), a)
    assert(a.contains(s""""max_shared":${want.map(_.getLong(2)).max}"""), a)
    // Incremental: append half the corpus onto the other half's index →
    // the audit still sees the identical pair count.
    val standingDir = base.resolve("standing"); val batchDir = base.resolve("batch")
    val docs = Tables.load(spark, sf, "documents")
    docs.filter(col("doc_id") % 4 =!= 0)
      .write.parquet(s"$standingDir/documents.parquet")
    docs.filter(col("doc_id") % 4 === 0)
      .write.parquet(s"$batchDir/documents.parquet")
    val idx2 = base.resolve("idx2").toString
    Index.run(spark, List("build-winnow", standingDir.toString, idx2))
    val chk = Index.run(spark,
      List("winnow-check", batchDir.toString, idx2))
    val wantCross = graft.operators.IndexStore.winnowAuditBatch(
      spark.read.parquet(s"$batchDir/documents.parquet"), idx2).count()
    assert(chk.contains(s""""pairs":$wantCross"""), chk)
    assert(wantCross > 0, "batch audit found no cross-partition dups")
    Index.run(spark, List("append-winnow", batchDir.toString, idx2))
    val a2 = Index.run(spark, List("winnow-audit", idx2))
    assert(a2.contains(s""""pairs":${want.length}"""), a2)
  }

  test("winnow saturation names the audit's blind-spot rate (VERDICT r9 #4)") {
    import spark.implicits._
    // 60 identical "popular" docs push every one of their fingerprints past
    // MaxDf(=50) into stop markers; 2 identical "rare" docs stay in the
    // informative band. A batch copying BOTH texts then hits stop buckets
    // with its popular fps (evidence the audit must DROP) and informative
    // buckets with its rare fps (evidence it keeps).
    val popular = (1 to 12).map(i => s"pop$i").mkString(" ")
    val rare = (1 to 15).map(i => s"rare$i").mkString(" ")
    val standing = ((1L to 60L).map(i => (i, popular)) ++
      Seq((101L, rare), (102L, rare))).toDF("doc_id", "text")
    val batch = Seq((1001L, popular), (1002L, rare)).toDF("doc_id", "text")

    val base = tmp("winnow-sat")
    val idx = base.resolve("idx").toString
    graft.operators.IndexStore.saveWinnowIndex(standing, idx)

    // Per-batch hit-weighted saturation: popular fps all land on stop
    // markers, rare fps all land on size-2 buckets — saturation strictly
    // between 0 and 1, and exactly kPop / (kPop + kRare).
    val kPop = graft.operators.Dedup.winnowFps(batch.filter($"doc_id" === 1001L))
      .select(explode($"fps")).count()
    val kRare = graft.operators.Dedup.winnowFps(batch.filter($"doc_id" === 1002L))
      .select(explode($"fps")).count()
    val sat = graft.operators.IndexStore.winnowBatchSaturation(batch, idx).head()
    assert(sat.getLong(0) === kPop + kRare)
    assert(sat.getLong(1) === kPop)
    assert(sat.getDouble(2) === kPop.toDouble / (kPop + kRare))
    assert(sat.getDouble(2) > 0.0 && sat.getDouble(2) < 1.0)

    // The dropped evidence is real: the popular batch doc (a verbatim copy
    // of 60 standing docs!) is invisible to the pair audit; only the rare
    // copy is flagged, against both rare standing docs.
    val pairs = graft.operators.IndexStore.winnowAuditBatch(batch, idx)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((101L, 1002L), (102L, 1002L)))

    // Both CLI audits surface the rate by name.
    val batchDir = base.resolve("batch")
    batch.write.parquet(s"$batchDir/documents.parquet")
    val chk = Index.run(spark, List("winnow-check", batchDir.toString, idx))
    assert(chk.contains(s""""stop_fp_hits":$kPop"""), chk)
    assert(chk.contains(""""saturation":0."""), chk)
    val aud = Index.run(spark, List("winnow-audit", idx))
    assert(aud.contains(""""stop_buckets":"""), aud)
    assert(aud.contains(""""saturation":0."""), aud)
    // Index-level rate: popular buckets are stop, rare buckets are not.
    val isat = graft.operators.IndexStore.winnowIndexSaturation(spark, idx).head()
    assert(isat.getLong(1) > 0L && isat.getLong(1) < isat.getLong(0))
    assert(isat.getDouble(2) > 0.0 && isat.getDouble(2) < 1.0)
  }

  test("build-phash → phash-dedupe → --append-kept: the media crawl loop") {
    val base = tmp("phash")
    val standingDir = base.resolve("standing"); val batchDir = base.resolve("batch")
    val idx = base.resolve("idx").toString
    val docs = Tables.load(spark, sf, "documents")
    docs.filter(col("doc_id") % 4 =!= 0)
      .write.parquet(s"$standingDir/documents.parquet")
    docs.filter(col("doc_id") % 4 === 0)
      .write.parquet(s"$batchDir/documents.parquet")

    val b = Index.run(spark, List("build-phash", standingDir.toString, idx))
    assert(b.contains(""""mode":"build-phash""""), b)

    // Reference verdicts from a standing-only twin index (the CLI call
    // below appends into idx, so the direct comparison needs its own).
    val idx2 = base.resolve("idx2").toString
    IndexStore.savePhashIndex(
      spark.read.parquet(s"$standingDir/documents.parquet"), idx2)
    val want = IndexStore.phashDedupBatch(
        spark.read.parquet(s"$batchDir/documents.parquet"), idx2)
      .collect().map(r => (r.getLong(0), Option(r.get(1)), r.getInt(2))).toSet
    assert(want.exists(_._3 == 0), "no near-dup media in the batch — vacuous fixture")

    val out = base.resolve("verdicts").toString
    val d = Index.run(spark,
      List("phash-dedupe", batchDir.toString, idx, "--out", out, "--append-kept"))
    val got = spark.read.parquet(out)
      .collect().map(r => (r.getLong(0), Option(r.get(1)), r.getInt(2))).toSet
    assert(got === want)
    val nKept = want.count(_._3 == 1); val nDup = want.size - nKept
    assert(d.contains(s""""dups":$nDup""") && d.contains(s""""kept":$nKept"""), d)

    // --append-kept grew the index by exactly the kept docs' signatures.
    assert(IndexStore.loadPhashGrid(spark, idx)
      .filter(col("doc_id") % 4 === 0).count() === nKept.toLong)

    // Full-corpus index audit == the q136 in-query pair scan; the r11
    // bucket-heat meter fields are present and internally consistent.
    val idx3 = base.resolve("idx3").toString
    Index.run(spark, List("build-phash", sf, idx3))
    val q136 = SparkEntry.queries("q136_phash_neardup")(spark, sf).collect()
    val a = Index.run(spark, List("phash-audit", idx3))
    assert(a.contains(s""""pairs":${q136.length}"""), a)
    assert(a.contains(s""""max_hamming":${q136.map(_.getLong(2)).max}"""), a)
    assert(a.contains(""""max_fan_in":""") && a.contains(""""saturation":"""), a)

    // phash-search point query == the pair table's neighbor list for that
    // doc (symmetric closure, ranked (hamming, id)) — derived from q136's
    // already-oracle-graded pairs, independent of searchPhash internals.
    val qDoc = q136.map(_.getLong(0)).min
    val wantNbrs = q136
      .flatMap(r => Seq((r.getLong(0), r.getLong(1), r.getLong(2)),
        (r.getLong(1), r.getLong(0), r.getLong(2))))
      .filter(_._1 == qDoc).map(t => (t._3, t._2)).sorted.take(3)
      .map { case (h, id) => s"""{"doc_id":$id,"hamming":$h}""" }
    assert(wantNbrs.nonEmpty, "query doc has no neighbors — vacuous")
    val psr = Index.run(spark, List("phash-search", idx3, qDoc.toString, "3"))
    assert(psr.contains(s"""\"hits\":[${wantNbrs.mkString(",")}]"""), psr)

    // consolidate-phash off the store == q144 BIT-IDENTICAL (same capped
    // exact pair set, same component labels, same provenance rollup).
    val outM = base.resolve("media-consolidated").toString
    val mc = Index.run(spark,
      List("consolidate-phash", sf, idx3, "--out", outM))
    val gotM = spark.read.parquet(outM).orderBy("component")
      .collect().map(_.toSeq).toSeq
    val wantM = SparkEntry.queries("q144_phash_consolidate")(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(gotM === wantM)
    assert(mc.contains(s""""n_components":${wantM.size}"""), mc)
  }

  test("build-grams → strip-batch → --append-kept: the exact-substring crawl loop") {
    val base = tmp("grams")
    val standingDir = base.resolve("standing"); val batchDir = base.resolve("batch")
    val idx = base.resolve("idx").toString
    val docs = Tables.load(spark, sf, "documents")
    docs.filter(col("doc_id") % 4 =!= 0)
      .write.parquet(s"$standingDir/documents.parquet")
    docs.filter(col("doc_id") % 4 === 0)
      .write.parquet(s"$batchDir/documents.parquet")

    val b = Index.run(spark, List("build-grams", standingDir.toString, idx))
    assert(b.contains(""""mode":"build-grams""""), b)

    val out = base.resolve("stripped").toString
    val s1 = Index.run(spark,
      List("strip-batch", batchDir.toString, idx, "--out", out, "--append-kept"))
    // Stripped table == q151 (the store path's equivalence, via the CLI).
    val got = spark.read.parquet(out)
      .collect().map(r => (r.getLong(0), Option(r.getString(1)), r.getLong(2))).toSet
    val want = SparkEntry.queries("q151_crossdoc_from_store")(spark, sf)
      .collect().map(r => (r.getLong(0), Option(r.getString(1)), r.getLong(2))).toSet
    assert(got === want)
    val nTouched = want.count(_._3 > 0)
    assert(s1.contains(s""""docs_touched":$nTouched"""), s1)

    // After --append-kept, a replay of the same batch strips NOTHING new
    // beyond what the full-corpus q148 would: its own grams min-combine to
    // itself (strict > guard), earlier-doc grams still strip.
    val s2 = Index.run(spark, List("strip-batch", batchDir.toString, idx))
    assert(s2.contains(s""""docs_touched":$nTouched"""), s2)
  }

  test("build-ivfpq → fused-search: hybrid retrieval off the standing ANN store == q173") {
    val base = tmp("fused")
    val idx = base.resolve("idx").toString
    val b = Index.run(spark, List("build-ivfpq", sf, idx))
    assert(b.contains(""""mode":"build-ivfpq""""), b)
    val out = Index.run(spark,
      List("fused-search", sf, sf, idx, "--probe", "1000000"))
    // Deterministic build over the same corpus ⇒ at probe-all + the
    // default depth the CLI's fused lists equal q173's rows exactly.
    val want = SparkEntry.queries("q173_fusion_from_store")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(5)))
    val expect = want.groupBy(_._1).toSeq.sortBy(_._1).map { case (qid, rows) =>
      val hits = rows.sortBy(_._2).map { case (_, frk, doc, rrf) =>
        s"""{"frk":$frk,"doc_id":$doc,"rrf":$rrf}"""
      }.mkString(",")
      s"""{"qid":$qid,"hits":[$hits]}"""
    }.mkString(",")
    assert(out.contains(s""""queries":[$expect]"""), s"got $out\nwant $expect")
  }

  test("build-provenance → append → provenance/authority: the crawl-loop reports (VERDICT r13 #1)") {
    val base = tmp("prov")
    val standingDir = base.resolve("standing"); val batchDir = base.resolve("batch")
    val idx = base.resolve("idx").toString
    val docs = Tables.load(spark, sf, "documents")
    docs.filter(col("doc_id") % 4 =!= 0)
      .write.parquet(s"$standingDir/documents.parquet")
    docs.filter(col("doc_id") % 4 === 0)
      .write.parquet(s"$batchDir/documents.parquet")

    val b = Index.run(spark, List("build-provenance", standingDir.toString, idx))
    assert(b.contains(""""mode":"build-provenance""""), b)
    val a = Index.run(spark, List("append-provenance", batchDir.toString, idx))
    assert(a.contains(""""mode":"append-provenance""""), a)

    // The standing report over the appended store == the in-query q167
    // over the full corpus — the crawl loop's whole point: matrix cells
    // identical, corpus text never re-read at report time.
    val outM = base.resolve("matrix").toString
    val p = Index.run(spark, List("provenance", idx, "--out", outM))
    val got = spark.read.parquet(outM)
      .collect().map(_.toSeq.toList).toSet
    val want = SparkEntry.queries("q167_strip_provenance")(spark, sf)
      .collect().map(_.toSeq.toList).toSet
    assert(got === want)
    assert(p.contains(s""""cells":${want.size}"""), p)

    // compact-grams between the append and the reads: the report must be
    // unchanged and the duplicate index rows gone.
    val c = Index.run(spark, List("compact-grams", idx))
    assert(c.contains(""""mode":"compact-grams""""), c)
    val cj = """"rows_before":(\d+),"rows_after":(\d+)""".r
      .findFirstMatchIn(c).get
    assert(cj.group(2).toLong <= cj.group(1).toLong, c)
    assert(IndexStore.shadowMatrixFrom(spark, idx)
      .collect().map(_.toSeq.toList).toSet === want)

    // authority over the same store == q170 over the full corpus.
    val outR = base.resolve("rank").toString
    val r = Index.run(spark, List("authority", idx, "--out", outR))
    val gotR = spark.read.parquet(outR)
      .collect().map(_.toSeq.toList).toSet
    val wantR = SparkEntry.queries("q170_source_authority")(spark, sf)
      .collect().map(_.toSeq.toList).toSet
    assert(gotR === wantR)
    val top = wantR.toList.sortBy(row =>
      (-row(1).asInstanceOf[Long], row(0).asInstanceOf[String])).head
    assert(r.contains(s""""top":"${top(0)}","top_rank":${top(1)}"""), r)
  }

  test("compact-lsh/phash/pq/ivf/winnow verbs: counts preserved through the rewrite") {
    val base = tmp("compact-verbs")
    val docs = Tables.load(spark, sf, "documents")
    val emb = Vectors.withNormalized(Tables.embeddings(spark, sf))
      .select(col("vec_id"), col("en"))
    def rx(mode: String, before: String, after: String, out: String): Unit = {
      assert(out.contains(s""""mode":"$mode""""), out)
      val m = (s""""$before":(\\d+),"$after":(\\d+)""").r
        .findFirstMatchIn(out).getOrElse(fail(s"no counts in $out"))
      assert(m.group(1).toLong === m.group(2).toLong,
        s"$mode changed row counts: $out")
      assert(m.group(1).toLong > 0L, s"$mode ran on an empty fixture: $out")
    }
    val lsh = base.resolve("lsh").toString
    IndexStore.saveLshIndex(docs.filter(col("doc_id") % 2 === 0), lsh)
    IndexStore.appendLshBatch(docs.filter(col("doc_id") % 2 === 1), lsh)
    rx("compact-lsh", "band_rows_before", "band_rows_after",
      Index.run(spark, List("compact-lsh", lsh)))

    val ph = base.resolve("phash").toString
    IndexStore.savePhashIndex(docs.filter(col("doc_id") % 2 === 0), ph)
    IndexStore.appendPhashBatch(docs.filter(col("doc_id") % 2 === 1), ph)
    rx("compact-phash", "band_rows_before", "band_rows_after",
      Index.run(spark, List("compact-phash", ph)))

    val pq = base.resolve("pq").toString
    IndexStore.savePqIndex(emb.filter(col("vec_id") % 2 === 0), pq)
    IndexStore.appendPqBatch(emb.filter(col("vec_id") % 2 === 1), pq)
    rx("compact-pq", "codes_before", "codes_after",
      Index.run(spark, List("compact-pq", pq)))

    val ivf = base.resolve("ivf").toString
    IndexStore.saveIvfIndex(emb.filter(col("vec_id") % 2 === 0), ivf)
    IndexStore.appendIvfBatch(emb.filter(col("vec_id") % 2 === 1), ivf)
    rx("compact-ivf", "vectors_before", "vectors_after",
      Index.run(spark, List("compact-ivf", ivf)))

    val wn = base.resolve("winnow").toString
    IndexStore.saveWinnowIndex(docs.filter(col("doc_id") % 2 === 0), wn)
    IndexStore.appendWinnowBatch(docs.filter(col("doc_id") % 2 === 1), wn)
    rx("compact-winnow", "buckets_before", "buckets_after",
      Index.run(spark, List("compact-winnow", wn)))
  }

  test("build-sketches → append → sketch-report/cms-lookup: the statistics ledger") {
    val base = tmp("sketch")
    val standingDir = base.resolve("standing"); val batchDir = base.resolve("batch")
    val idx = base.resolve("idx").toString
    val docs = Tables.load(spark, sf, "documents")
    docs.filter(col("doc_id") % 4 =!= 0)
      .write.parquet(s"$standingDir/documents.parquet")
    docs.filter(col("doc_id") % 4 === 0)
      .write.parquet(s"$batchDir/documents.parquet")

    val b = Index.run(spark, List("build-sketches", standingDir.toString, idx))
    assert(b.contains(""""mode":"build-sketches""""), b)
    val a = Index.run(spark, List("append-sketches", batchDir.toString, idx))
    assert(a.contains(""""mode":"append-sketches""""), a)

    // The appended store's report must carry the FULL corpus's register
    // estimates (append ≡ rebuild through the MAX-fold): per-lang rows +
    // the '__all__' merge, every estimate a positive finite double.
    val rep = Index.run(spark, List("sketch-report", idx))
    assert(rep.contains(""""mode":"sketch-report""""), rep)
    assert(rep.contains(""""lang":"__all__""""), rep)
    val langs = Tables.load(spark, sf, "documents")
      .select("lang").distinct().count()
    assert((""""lang":""".r.findAllIn(rep).size.toLong) === langs + 1, rep)
    // The length-quantile block serves q180's numbers per source + the
    // '__all__' row, all from the same store read.
    val srcs = Tables.load(spark, sf, "documents")
      .select("source").distinct().count()
    assert((""""n_docs":""".r.findAllIn(rep).size.toLong) === srcs + 1, rep)

    // cms-lookup: a token present in every doc estimates ≥ its exact
    // count (never-undercount), an absent token estimates a small
    // collision floor (bounded by 2n/W, and far below the heavy counts).
    val words = graft.operators.Audit.wordRows(docs)
    val (tok, exact) = {
      val r = words.groupBy("w").agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("w")).head()
      (r.getString(0), r.getLong(1))
    }
    val lk = Index.run(spark, List("cms-lookup", idx, tok))
    val est = """"est":(\d+)""".r.findFirstMatchIn(lk).get.group(1).toLong
    assert(est >= exact, lk)
    val n = words.count()
    val miss = Index.run(spark, List("cms-lookup", idx, "zz-not-a-token-zz"))
    val missEst = """"est":(\d+)""".r.findFirstMatchIn(miss).get.group(1).toLong
    assert(missEst <= 2 * n / graft.operators.Audit.CmsW, miss)

    // compact-sketches: report unchanged, raw register rows reduced.
    val c = Index.run(spark, List("compact-sketches", idx))
    val cj = """"register_rows_before":(\d+),"register_rows_after":(\d+)""".r
      .findFirstMatchIn(c).get
    assert(cj.group(2).toLong < cj.group(1).toLong, c)
    assert(Index.run(spark, List("sketch-report", idx)) === rep)
  }

  test("sketch-report escapes heavy-hitter words in JSON (quotes/backslashes in corpus text)") {
    import spark.implicits._
    val base = tmp("jesc")
    val docsDir = base.resolve("docs"); val idx = base.resolve("idx").toString
    // a corpus whose dominant words carry JSON-hostile characters
    val hostile = Seq.tabulate(40)(i =>
      (i.toLong, """he"llo back\slash he"llo""", "en", "s1")).toDF(
      "doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
    hostile.write.parquet(s"$docsDir/documents.parquet")
    Index.run(spark, List("build-sketches", docsDir.toString, idx))
    val rep = Index.run(spark, List("sketch-report", idx))
    assert(rep.contains("""{"w":"he\"llo""""), rep)
    assert(rep.contains("""back\\slash"""), rep)
    // cms-lookup echoes an arbitrary CLI token — escaped the same way
    val lk = Index.run(spark, List("cms-lookup", idx, """he"llo"""))
    assert(lk.contains(""""token":"he\"llo""""), lk)
  }

  test("gc sweeps staged swap leftovers, restores a stranded-only copy, preserves reads") {
    val base = tmp("gc")
    val docsDir = base.resolve("docs"); val idx = base.resolve("idx").toString
    Tables.load(spark, sf, "documents")
      .write.parquet(s"$docsDir/documents.parquet")
    Index.run(spark, List("build-sketches", docsDir.toString, idx))
    val rep = Index.run(spark, List("sketch-report", idx))

    // clean store: gc is a no-op
    val g0 = Index.run(spark, List("gc", idx))
    assert(g0.contains(""""restored":0,"promoted":0,"swept":0"""), g0)

    // crash BEFORE the first rename: a finished-but-unswapped .compact
    // beside an intact table → swept, table untouched
    val totals = new java.io.File(s"$idx/sketch/totals")
    val staged = new java.io.File(s"$idx/sketch/totals.compact")
    assert(staged.mkdirs())
    // crash BETWEEN the two renames: the only copy stranded at .old
    val cells = new java.io.File(s"$idx/sketch/cells")
    val old = new java.io.File(s"$idx/sketch/cells.old")
    assert(cells.renameTo(old))
    val g1 = Index.run(spark, List("gc", idx))
    assert(g1.contains(""""restored":1""") && g1.contains(""""swept":1"""), g1)
    assert(!staged.exists() && !old.exists() && cells.exists() && totals.exists())
    // the repaired store serves the identical report — nothing current
    // was deleted by the sweep
    assert(Index.run(spark, List("sketch-report", idx)) === rep)
    // idempotent: a re-run finds a clean tree
    val g2 = Index.run(spark, List("gc", idx))
    assert(g2.contains(""""restored":0,"promoted":0,"swept":0"""), g2)
  }

  test("build-lm → append-lm → lm-report/compact-lm: the standing KN LM loop") {
    val base = tmp("lm")
    val standingDir = base.resolve("standing"); val batchDir = base.resolve("batch")
    val idx = base.resolve("idx").toString
    val docs = Tables.load(spark, sf, "documents")
    docs.filter(col("doc_id") % 3 =!= 2)
      .write.parquet(s"$standingDir/documents.parquet")
    docs.filter(col("doc_id") % 3 === 2)
      .write.parquet(s"$batchDir/documents.parquet")

    val b = Index.run(spark, List("build-lm", standingDir.toString, idx))
    assert(b.contains(""""mode":"build-lm""""), b)
    val a = Index.run(spark, List("append-lm", batchDir.toString, idx))
    assert(a.contains(""""mode":"append-lm""""), a)

    // appended store serves the union's KN table == the in-query q195
    // learner over the whole corpus
    val want = SparkEntry.queries("q195_kn_bigram")(spark, sf)
      .collect().map(_.toSeq.toList).toList
    def served() = IndexStore.knFromStore(spark, idx)
      .orderBy("w1", "w2").collect().map(_.toSeq.toList).toList
    assert(served() === want && want.nonEmpty)

    // the report reads store-only and its type count is the folded one
    val rep = Index.run(spark, List("lm-report", idx))
    assert(rep.contains(""""mode":"lm-report""""), rep)
    assert(rep.contains(s""""bigram_types":${want.size}"""), rep)

    // compaction folds rows without changing the served table or report
    val c = Index.run(spark, List("compact-lm", idx))
    assert(c.contains(""""mode":"compact-lm""""), c)
    assert(served() === want)
    assert(Index.run(spark, List("lm-report", idx)) === rep)
  }
}
