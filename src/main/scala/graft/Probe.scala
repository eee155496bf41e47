package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev-only measurement harness (r17 optimization round): time the
  * SUB-STEPS of the heavy from-store catalog queries (store build vs
  * serve) so optimization targets the right half — guide §1 "measure
  * first" — and run in-JVM A/Bs of old-vs-new operator internals
  * (interleaved A-B-A-B so hour-scale box drift washes out; the r12
  * worktree-A/B protocol without the worktree). Not part of the driver
  * contract; never invoked by Bench or Verify.
  * Usage: Probe <sfDir> <stepPrefix...>
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val which = args.drop(1).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = Sessions.builder(s"local[$cpus]", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id * 2)").collect()
    Seq("documents", "embeddings").foreach { t =>
      spark.read.parquet(s"$sfDir/$t.parquet").limit(1).collect()
    }
    import graft.operators.{Audit, Dedup, IndexStore, TextOps, Vectors}

    def time(tag: String)(f: => Unit): Unit =
      if (which.isEmpty || which.exists(tag.startsWith)) {
        spark.sparkContext.setJobDescription(tag)
        val t0 = System.nanoTime()
        f
        println(f"PROBE $tag ${(System.nanoTime() - t0) / 1e9}%.3f s")
        spark.sparkContext.setJobDescription(null)
      }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def docs = Tables.load(spark, sfDir, "documents")

    // ── replicas of the PRE-r17 internals, for in-JVM A/B ──
    val P = spark.sessionState.conf.numShufflePartitions
    def gramPfx = concat(lit("g"), pmod(col("gh"), lit(64L)).cast("string"))
    def provBuildOld(path: String): Unit = {
      Dedup.gramRows(docs)
        .groupBy("gh", "doc_id").agg(count(lit(1)).as("cnt"))
        .withColumn("pfx", gramPfx)
        .repartitionByRange(P, col("pfx"), col("gh"))
        .sortWithinPartitions("pfx", "gh", "doc_id")
        .write.mode("overwrite").partitionBy("pfx").parquet(s"$path/grams/postings")
      IndexStore.loadGramPostings(spark, path)
        .groupBy("gh").agg(min("doc_id").as("first_doc"))
        .withColumn("pfx", gramPfx)
        .repartitionByRange(P, col("pfx"), col("gh"))
        .sortWithinPartitions("pfx", "gh")
        .write.mode("overwrite").partitionBy("pfx").parquet(s"$path/grams/index")
      docs.select(col("doc_id"), col("source"))
        .repartition(8)
        .write.mode("overwrite").parquet(s"$path/docs/sources")
    }
    def authorityOld(edges0: DataFrame, nodes0: DataFrame): DataFrame = {
      val RankRounds = Audit.RankRounds
      val RankScale = Audit.RankScale
      val ShareScale = Audit.ShareScale
      val edges = edges0.localCheckpoint(true)
      val nodes = nodes0.localCheckpoint(true)
      val outw = edges.groupBy("src").agg(sum("w").as("ow"))
      val esh = edges.join(outw, Seq("src"))
        .select(col("src"), col("dst"),
          expr(s"CASE WHEN ow <= ${ShareScale * ShareScale}" +
            s" THEN (w * $ShareScale) div ow" +
            s" ELSE w div (ow div $ShareScale) END").as("sh"))
        .localCheckpoint(true)
      val ncnt = nodes.agg(count(lit(1)).as("n"))
      var r = nodes.crossJoin(broadcast(ncnt))
        .select(col("source"), expr(s"$RankScale div n").as("r"))
        .localCheckpoint(true)
      for (_ <- 1 to RankRounds) {
        val dang = r.join(outw.select(col("src").as("source")),
            Seq("source"), "left_anti")
          .agg(coalesce(sum("r"), lit(0L)).as("dm"))
        val contrib = esh
          .join(r.select(col("source").as("src"), col("r").as("pr")), Seq("src"))
          .select(col("dst"), expr(s"(pr * sh) div $ShareScale").as("c"))
          .groupBy("dst").agg(sum("c").as("contrib"))
        r = nodes.crossJoin(broadcast(ncnt)).crossJoin(broadcast(dang))
          .join(contrib.select(col("dst").as("source"), col("contrib")),
            Seq("source"), "left")
          .select(col("source"), expr(
            s"(($RankScale div n) * 15) div 100" +
              s" + (85 * (coalesce(contrib, 0) + dm div n)) div 100").as("r"))
          .localCheckpoint(true)
      }
      val inw = edges.groupBy("dst").agg(sum("w").as("in_w"))
      r.join(inw.select(col("dst").as("source"), col("in_w")),
          Seq("source"), "left")
        .join(outw.select(col("src").as("source"), col("ow").as("out_w")),
          Seq("source"), "left")
        .select(col("source"), col("r").as("authority"),
          coalesce(col("in_w"), lit(0L)).as("in_w"),
          coalesce(col("out_w"), lit(0L)).as("out_w"))
    }

    // ── provenance build A/B (interleaved) ──
    (1 to 3).foreach { i =>
      time(s"prov.buildOld.$i") { provBuildOld(Scratch.dir("probe-provo")) }
      time(s"prov.buildNew.$i") {
        IndexStore.saveProvenanceIndex(docs, Scratch.dir("probe-provn"))
      }
    }
    val provPath = Scratch.dir("probe-prov-fixed")
    time("prov.build.fixed") { IndexStore.saveProvenanceIndex(docs, provPath) }
    (1 to 2).foreach { i =>
      time(s"prov.matrix.$i") {
        noop(IndexStore.shadowMatrixFrom(spark, provPath)
          .orderBy("src_later", "src_first"))
      }
    }
    // ── authority A/B (interleaved) over the same store-served edges ──
    def storeEdges = IndexStore.shadowMatrixFrom(spark, provPath)
      .select(col("src_later").as("src"), col("src_first").as("dst"),
        col("n_grams").as("w"))
    def storeNodes = IndexStore.loadDocSources(spark, provPath)
      .select("source").distinct()
    (1 to 3).foreach { i =>
      time(s"auth.old.$i") { noop(authorityOld(storeEdges, storeNodes).orderBy("source")) }
      time(s"auth.new.$i") { noop(Audit.authority(storeEdges, storeNodes).orderBy("source")) }
    }
    // ── sketch store: per-leg build costs (full vs legs) ──
    (1 to 2).foreach { i =>
      time(s"sketch.full.$i") {
        IndexStore.saveSketchIndex(docs, Scratch.dir("probe-sk"))
      }
      time(s"sketch.registers.$i") {
        IndexStore.saveSketchLegs(docs, Scratch.dir("probe-sk"), Set("registers"))
      }
      time(s"sketch.cellstotals.$i") {
        IndexStore.saveSketchLegs(docs, Scratch.dir("probe-sk"), Set("cells", "totals"))
      }
      time(s"sketch.lens.$i") {
        IndexStore.saveSketchLegs(docs, Scratch.dir("probe-sk"), Set("lens"))
      }
      time(s"sketch.mgtotals.$i") {
        IndexStore.saveSketchLegs(docs, Scratch.dir("probe-sk"), Set("mg", "totals"))
      }
    }
    // ── q135: LSH store build ──
    (1 to 2).foreach { i =>
      time(s"lsh.build.$i") {
        IndexStore.saveLshIndex(docs, Scratch.dir("probe-lsh"))
      }
    }
    // ── q173: IVFPQ store build vs fused read ──
    val emb = Vectors.withNormalized(Tables.embeddings(spark, sfDir))
      .select(col("vec_id"), col("en"))
    (1 to 2).foreach { i =>
      time(s"ivfpq.build.$i") {
        IndexStore.saveIvfPqIndex(emb, Scratch.dir("probe-ivfpq"))
      }
    }
    val ivfPath = Scratch.dir("probe-ivfpq-fixed")
    time("ivfpq.build.fixed") { IndexStore.saveIvfPqIndex(emb, ivfPath) }
    (1 to 2).foreach { i =>
      time(s"ivfpq.fused.$i") {
        noop(Vectors.rrfFused(TextOps.sparseRanked(spark, sfDir),
          IndexStore.denseRankedFrom(emb, ivfPath, probeCoarse = 1000000))
          .orderBy("qid", "frk"))
      }
      time(s"ivfpq.sparse.$i") {
        noop(TextOps.sparseRanked(spark, sfDir))
      }
      time(s"ivfpq.dense.$i") {
        noop(IndexStore.denseRankedFrom(emb, ivfPath, probeCoarse = 1000000))
      }
    }
    spark.stop()
  }
}
