package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev-only measurement harness (optimization rounds): time the SUB-STEPS
  * of heavy catalog queries and run in-JVM A/Bs of old-vs-new operator
  * internals (interleaved A-B-A-B so hour-scale box drift washes out).
  * Guide §1 "measure first". Not part of the driver contract; never
  * invoked by Bench or Verify.
  *
  * r18 probes: pqAssign pre-nesting, authority esh partitioning, the CC
  * loop's symmetric-frame barrier, the typed-vs-native top-k tail, and
  * the q123 truth/candidate decomposition.
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
    import graft.functions.GraftFunctions
    GraftFunctions.register(spark)

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
    def on(tag: String): Boolean = which.isEmpty || which.exists(tag.startsWith)

    // ── replicas of the PRE-r18 internals, for in-JVM A/B ──

    /** pqAssign as shipped in r17: per-row filter() scan of the FLAT
      * broadcast codebook, PqM times per vector. */
    def pqAssignOld(emb: DataFrame, cb: DataFrame): DataFrame = {
      import Vectors.PqM
      emb.crossJoin(broadcast(cb))
        .select(col("vec_id"), expr(
          s"""transform(sequence(0, ${PqM - 1}), s ->
             |  array_min(transform(
             |    filter(cb, c -> c.s = s),
             |    (c, i) -> struct(
             |      graft_dot(c.cn, c.cn)
             |        - 2.0e0 * graft_dot(slice(en, s * (size(en) div $PqM) + 1, size(en) div $PqM), c.cn) AS d,
             |      c.cid AS cid, i AS i))).i)""".stripMargin).as("codes"))
    }

    /** connectedComponents as shipped in r17: unionByName sym (edge
      * lineage read twice — caller persists), no standing partitioning. */
    def ccOld(edges0: DataFrame): DataFrame = {
      val edges = edges0.persist()
      val sym = edges.unionByName(
        edges.select(col("b").as("a"), col("a").as("b")))
      def barrier(df: DataFrame): DataFrame = df.localCheckpoint(true)
      var labels = barrier(sym.groupBy(col("a").as("v"))
        .agg(min("b").as("nb"))
        .select(col("v"), least(col("v"), col("nb")).as("lbl")))
      var converged = false
      var iter = 0
      while (!converged && iter < 30) {
        val nbrMin = sym.join(labels, sym("b") === labels("v"))
          .groupBy(sym("a").as("nv")).agg(min("lbl").as("nlbl"))
        val hop = labels.select(col("v").as("hv"), col("lbl").as("hlbl"))
        val next = barrier(labels
          .join(nbrMin, labels("v") === col("nv"), "left")
          .join(hop, labels("lbl") === col("hv"), "left")
          .select(labels("v"), least(col("lbl"),
            coalesce(col("nlbl"), col("lbl")),
            coalesce(col("hlbl"), col("lbl"))).as("lbl"),
            labels("lbl").as("old")))
        converged = next.agg(coalesce(
          max(when(col("lbl") < col("old"), lit(1)).otherwise(lit(0))),
          lit(0))).head().getInt(0) == 0
        labels = next.select("v", "lbl")
        iter += 1
      }
      edges.unpersist()
      require(converged, s"old CC not converged after $iter rounds")
      labels
    }

    /** authority as shipped in r17: esh checkpointed WITHOUT the src
      * pre-partitioning (round invariants already in the rank frame). */
    def authorityOldR17(edges0: DataFrame, nodes0: DataFrame): DataFrame = {
      val RankRounds = Audit.RankRounds
      val RankScale = Audit.RankScale
      val ShareScale = Audit.ShareScale
      val edges = edges0.localCheckpoint(true)
      val nodes = nodes0.localCheckpoint(true)
      val outw = edges.groupBy("src").agg(sum("w").as("ow")).localCheckpoint(true)
      val esh = edges.join(outw, Seq("src"))
        .select(col("src"), col("dst"),
          expr(s"CASE WHEN ow <= ${ShareScale * ShareScale}" +
            s" THEN (w * $ShareScale) div ow" +
            s" ELSE w div (ow div $ShareScale) END").as("sh"))
        .localCheckpoint(true)
      val ncnt = nodes.agg(count(lit(1)).as("n"))
      var r = nodes.crossJoin(broadcast(ncnt))
        .join(outw.select(col("src").as("source"), lit(true).as("hl")),
          Seq("source"), "left")
        .select(col("source"), expr(s"$RankScale div n").as("r"), col("n"),
          expr(s"(($RankScale div n) * 15) div 100").as("seed"),
          coalesce(col("hl"), lit(false)).as("haslinks"))
        .localCheckpoint(true)
      for (_ <- 1 to RankRounds) {
        val dang = r.filter(!col("haslinks"))
          .agg(coalesce(sum("r"), lit(0L)).as("dm"))
        val contrib = esh
          .join(r.select(col("source").as("src"), col("r").as("pr")), Seq("src"))
          .select(col("dst"), expr(s"(pr * sh) div $ShareScale").as("c"))
          .groupBy("dst").agg(sum("c").as("contrib"))
        r = r.crossJoin(broadcast(dang))
          .join(contrib.select(col("dst").as("source"), col("contrib")),
            Seq("source"), "left")
          .select(col("source"), expr(
            s"seed + (85 * (coalesce(contrib, 0) + dm div n)) div 100").as("r"),
            col("n"), col("seed"), col("haslinks"))
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

    /** sparseRanked tail as shipped in r17: typed groupByKey +
      * TopKAggregator (SerializeFromObject boundary). */
    def sparseRankedOld(): DataFrame = {
      import spark.implicits._
      val words = docs
        .select(col("doc_id"), explode(split(trim(col("text")), " ")).as("w"))
        .filter(col("w") =!= "")
      val cw = words.filter(col("doc_id") >= TextOps.RetrQ)
      val tf = cw.groupBy("doc_id", "w").agg(count(lit(1)).as("tfc"))
      val dl = cw.groupBy("doc_id").agg(count(lit(1)).as("nd"))
      val st = dl.agg(count(lit(1)).as("nn"), sum("nd").cast("long").as("tot"))
      val df = tf.groupBy("w").agg(count(lit(1)).as("dfc"))
      val qt = words.filter(col("doc_id") < TextOps.RetrQ)
        .select(col("doc_id").as("qid"), col("w")).distinct()
      val scored = tf.join(dl, Seq("doc_id"))
        .join(broadcast(qt), Seq("w"))
        .join(df, Seq("w"))
        .crossJoin(broadcast(st))
        .select(col("qid"), col("doc_id"), expr(
          """cast(floor(1.0e6 * ((nn - dfc + 5.0e-1) / (dfc + 5.0e-1))
            |  * (tfc * (1.2e0 + 1.0e0))
            |  / (tfc + 1.2e0 * (1.0e0 - 7.5e-1 + 7.5e-1 * nd / (tot / nn)))) AS bigint)"""
            .stripMargin).as("contrib"))
        .groupBy("qid", "doc_id").agg(sum("contrib").as("sc"))
        .as[(Long, Long, Long)]
      scored.groupByKey(_._1)
        .mapValues(t => graft.functions.Scored(t._2, t._3))
        .agg(new graft.functions.TopKAggregator(TextOps.RetrK).toColumn.name("top"))
        .flatMap { case (qid, items) =>
          items.zipWithIndex.map { case (it, i) => (qid, i + 1L, it.doc_id, it.score) }
        }
        .toDF("qid", "rk", "doc_id", "score")
    }

    // ── pqAssign A/B (q88/q130-q132/q173 builds) ──
    if (on("pq")) {
      val emb = Vectors.withNormalized(Tables.embeddings(spark, sfDir))
        .select(col("vec_id"), col("en"))
      val cb = Vectors.pqCodebook(emb).localCheckpoint(true)
      (1 to 3).foreach { i =>
        time(s"pq.assignOld.$i") { noop(pqAssignOld(emb, cb)) }
        time(s"pq.assignNew.$i") { noop(Vectors.pqAssign(emb, cb)) }
      }
      (1 to 2).foreach { i =>
        time(s"pq.ivfpqBuild.$i") {
          IndexStore.saveIvfPqIndex(emb, Scratch.dir("probe-ivfpq"))
        }
      }
    }

    // ── CC A/B on q47's real edge frame ──
    if (on("cc")) {
      val edges = Dedup.jaccardPairs(docs).select("a", "b")
      time("cc.edgesOnly") { noop(edges) }
      (1 to 3).foreach { i =>
        time(s"cc.old.$i") { noop(ccOld(edges).orderBy("v")) }
        time(s"cc.new.$i") { noop(Dedup.connectedComponents(edges).orderBy("v")) }
      }
    }

    // ── authority A/B over the store-served q172 edge frame ──
    if (on("auth")) {
      val provPath = Scratch.dir("probe-prov-fixed")
      time("auth.storeBuild") { IndexStore.saveProvenanceIndex(docs, provPath) }
      def storeEdges = IndexStore.shadowMatrixFrom(spark, provPath)
        .select(col("src_later").as("src"), col("src_first").as("dst"),
          col("n_grams").as("w"))
      def storeNodes = IndexStore.loadDocSources(spark, provPath)
        .select("source").distinct()
      (1 to 3).foreach { i =>
        time(s"auth.oldR17.$i") {
          noop(authorityOldR17(storeEdges, storeNodes).orderBy("source")) }
        time(s"auth.new.$i") {
          noop(Audit.authority(storeEdges, storeNodes).orderBy("source")) }
      }
    }

    // ── top-k tail A/B (q110 shape; the q161/q162/q173/q79 family) ──
    if (on("topk")) {
      (1 to 3).foreach { i =>
        time(s"topk.typedOld.$i") { noop(sparseRankedOld().orderBy("qid", "rk")) }
        time(s"topk.native.$i") {
          noop(TextOps.sparseRanked(spark, sfDir).orderBy("qid", "rk")) }
      }
    }

    // ── per-round plan evidence (plans/r18/{cc,auth}_round_{before,after})
    // — the catalog dumps can't show loop internals: every round sits
    // behind a localCheckpoint, so the final plan is one LogicalRDD. This
    // reconstructs ONE propagation/rank round over the old-vs-new standing
    // frames and writes its .explain("formatted"). ──
    if (on("roundplans")) {
      // The per-round joins broadcast their small side at sf0.1, which
      // hides the Exchange the big side would need at scale — the dumps
      // are taken with auto-broadcast OFF so the sort-merge shape (the
      // 100 TB shape) is what the plan shows. Production keeps AQE's
      // broadcast promotion; this is measurement configuration only.
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val shufN = spark.sessionState.conf.numShufflePartitions
      def dump(name: String, df: DataFrame): Unit =
        java.nio.file.Files.write(
          java.nio.file.Paths.get(s"/root/repo/plans/r18/$name.txt"),
          df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
            .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      // CC: old sym = plain union (no standing partitioning); new sym =
      // the exploded frame checkpointed hash-partitioned on join key b
      // (explicit count + AQE-off barrier — Sessions.checkpointPartitioned
      // — or the layout does not survive the checkpoint).
      val edges = Dedup.jaccardPairs(docs).select("a", "b").localCheckpoint(true)
      val symOld = edges.unionByName(
        edges.select(col("b").as("a"), col("a").as("b"))).localCheckpoint(true)
      val symNew = Sessions.checkpointPartitioned(edges
        .select(explode(array(
          struct(col("a"), col("b")),
          struct(col("b").as("a"), col("a").as("b")))).as("e"))
        .select(col("e.a").as("a"), col("e.b").as("b"))
        .repartition(shufN, col("b")))
      val labels = symNew.groupBy(col("a").as("v"))
        .agg(min("b").as("nb"))
        .select(col("v"), least(col("v"), col("nb")).as("lbl"))
        .localCheckpoint(true)
      def ccRound(sym: DataFrame): DataFrame = {
        val nbrMin = sym.join(labels, sym("b") === labels("v"))
          .groupBy(sym("a").as("nv")).agg(min("lbl").as("nlbl"))
        val hop = labels.select(col("v").as("hv"), col("lbl").as("hlbl"))
        labels.join(nbrMin, labels("v") === col("nv"), "left")
          .join(hop, labels("lbl") === col("hv"), "left")
          .select(labels("v"), least(col("lbl"),
            coalesce(col("nlbl"), col("lbl")),
            coalesce(col("hlbl"), col("lbl"))).as("lbl"),
            labels("lbl").as("old"))
      }
      dump("cc_round_before", ccRound(symOld))
      dump("cc_round_after", ccRound(symNew))
      // authority: one rank round over esh-old vs esh-new.
      val provPath = Scratch.dir("probe-prov-fixed")
      IndexStore.saveProvenanceIndex(docs, provPath)
      val aedges = IndexStore.shadowMatrixFrom(spark, provPath)
        .select(col("src_later").as("src"), col("src_first").as("dst"),
          col("n_grams").as("w")).localCheckpoint(true)
      val anodes = IndexStore.loadDocSources(spark, provPath)
        .select("source").distinct().localCheckpoint(true)
      val outw = aedges.groupBy("src").agg(sum("w").as("ow")).localCheckpoint(true)
      val ShareScale = Audit.ShareScale
      def eshOf(pre: Boolean): DataFrame = {
        val base = aedges.join(outw, Seq("src"))
          .select(col("src"), col("dst"),
            expr(s"CASE WHEN ow <= ${ShareScale * ShareScale}" +
              s" THEN (w * $ShareScale) div ow" +
              s" ELSE w div (ow div $ShareScale) END").as("sh"))
        if (pre) Sessions.checkpointPartitioned(
          base.repartition(shufN, col("src")))
        else base.localCheckpoint(true)
      }
      val ncnt = anodes.agg(count(lit(1)).as("n"))
      val r0 = anodes.crossJoin(broadcast(ncnt))
        .join(outw.select(col("src").as("source"), lit(true).as("hl")),
          Seq("source"), "left")
        .select(col("source"), expr(s"${Audit.RankScale} div n").as("r"), col("n"),
          expr(s"((${Audit.RankScale} div n) * 15) div 100").as("seed"),
          coalesce(col("hl"), lit(false)).as("haslinks"))
        .localCheckpoint(true)
      def authRound(esh: DataFrame): DataFrame = {
        val dang = r0.filter(!col("haslinks"))
          .agg(coalesce(sum("r"), lit(0L)).as("dm"))
        val contrib = esh
          .join(r0.select(col("source").as("src"), col("r").as("pr")), Seq("src"))
          .select(col("dst"), expr(s"(pr * sh) div $ShareScale").as("c"))
          .groupBy("dst").agg(sum("c").as("contrib"))
        r0.crossJoin(broadcast(dang))
          .join(contrib.select(col("dst").as("source"), col("contrib")),
            Seq("source"), "left")
          .select(col("source"), expr(
            s"seed + (85 * (coalesce(contrib, 0) + dm div n)) div 100").as("r"),
            col("n"), col("seed"), col("haslinks"))
      }
      dump("auth_round_before", authRound(eshOf(pre = false)))
      dump("auth_round_after", authRound(eshOf(pre = true)))
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      println("PROBE roundplans written")
    }

    // ── q123 decomposition: truth half vs candidate half ──
    if (on("q123")) {
      (1 to 2).foreach { i =>
        time(s"q123.truth.$i") { noop(Dedup.jaccardPairs(docs)) }
        time(s"q123.cand.$i") {
          noop(Dedup.lshCandidates(Dedup.lshBands(Dedup.minhashSignatures(docs)))) }
        time(s"q123.full.$i") {
          noop(SparkEntry.queries("q123_lsh_recall")(spark, sfDir)) }
      }
    }

    spark.stop()
  }
}
