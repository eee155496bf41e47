package graft
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val spark = Sessions.builder(s"local[$cpus]", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Session warm-up: absorb one-time JVM/codegen/file-index costs so each
    // query's number reflects its own plan, not whoever ran first.
    spark.range(1000000).selectExpr("sum(id * 2)").collect()
    Seq("lineitem", "orders", "customer", "part", "supplier", "nation",
      "region", "documents", "embeddings").foreach { t =>
      spark.read.parquet(s"$sfDir/$t.parquet").limit(1).collect()
    }
    // A failed query benches as -1 (sentinel) and lands in "errors" — a
    // crash at sf0.1 must be visible, never recorded as a fast timing.
    // toRdd.count() materializes EVERY output column: a plain count() lets
    // Catalyst prune the projected compute, so expensive expressions would
    // bench as free (caught when a simhash fold benched 0.4s but cost 60s
    // materialized).
    //
    // Aggregation rule: MIN of 3 interleaved passes per query. PERF.md
    // records a 44–49 s machine-load spread across single-pass runs — wider
    // than most round-over-round deltas — so a single sample can't tell a
    // regression from scheduler noise. Min-of-3 reports each plan's
    // least-contended run. Passes are interleaved (full catalog per pass,
    // catalog order) and every pass builds a FRESH DataFrame, so no
    // QueryExecution/shuffle output is ever reused across samples.
    // Optional args = query-name filter (local iteration on a subset);
    // default benches the full catalog, exactly as the driver invokes it.
    val names0 = SparkEntry.queries.keys.toSeq.sorted
    val names = if (args.isEmpty) names0 else names0.filter(args.toSet)
    require(names.nonEmpty, s"no catalog query matches ${args.mkString(", ")}")
    val passes = 3
    val samples = (1 to passes).map { _ =>
      names.map { name =>
        val fn = SparkEntry.queries(name)
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).queryExecution.toRdd.count(); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}"); false
          }
        val sec = (System.nanoTime() - t0) / 1e9
        name -> (if (ok) sec else -1.0)
      }.toMap
    }
    val results = names.map { name =>
      val vs = samples.map(_(name))
      // Any failed pass marks the query failed — a flaky crash must surface.
      (name, if (vs.exists(_ < 0)) -1.0 else vs.min, !vs.exists(_ < 0))
    }
    val qs = results.map { case (k, v, _) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errs = results.collect { case (k, _, false) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val nErr = results.count { case (_, _, ok) => !ok }
    // Machine state rides in the artifact so environment drift is self-
    // documenting: two rounds running, the CC/shingle heavies' ±1 s swings
    // were adjudicated by argument because the artifact couldn't show
    // whether the box was loaded (r8 verdict task 4b). loadavg is sampled
    // at run END — it includes our own load; what matters is comparability
    // across artifacts.
    val loadavg = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    val freeMb =
      try scala.io.Source.fromFile("/proc/meminfo").getLines()
        .collectFirst { case l if l.startsWith("MemAvailable:") =>
          l.split("\\s+")(1).toLong / 1024 }.getOrElse(-1L)
      catch { case _: Throwable => -1L }
    val machine =
      s"""{"loadavg":$loadavg,"mem_available_mb":$freeMb,"cpus":$cpus,"host_cores":${Runtime.getRuntime.availableProcessors}}"""
    // A run with ANY errored query has no valid total: summing the survivors
    // reads as a speedup over a clean run (r7 lesson). value=-1 sentinel +
    // failed flag + nonzero rc make a broken run unambiguous to automation.
    val total =
      if (nErr > 0) -1.0 else results.collect { case (_, v, true) => v }.sum
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","agg":"min_of_$passes","failed":${nErr > 0},"queries":$qs,"errors":$errs,"machine":$machine,"sf":"$sfDir"}"""
    println(json)
    // ALSO land the line in a file: three rounds of captured stdout
    // artifacts arrived truncated (BENCH_r0{3,4,5}.json lost q01-q13 and
    // the total), so the file is the canonical copy.
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "/root/repo/BENCH_LAST.json")
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
    if (nErr > 0) {
      System.err.println(s"[bench] $nErr queries FAILED — total invalid")
      sys.exit(1)
    }
  }
}
