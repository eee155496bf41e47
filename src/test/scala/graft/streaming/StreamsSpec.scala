package graft.streaming

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.scalatest.funsuite.AnyFunSuite

import graft.{SharedSpark, Tables}

/** Streaming results must agree with their batch twins on the same data. */
class StreamsSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  private val dir = "/root/testdata/sf0.001"

  /** events in the raw-nanos shape (ts = bigint epoch nanos) regardless of
    * which parquet generation is on disk (TIMESTAMP(NANOS) vs MICROS — see
    * Tables.events). Staged micro-batch files written from this frame carry
    * int64 ts, which readEventsStream's footer peek maps to the nanos path. */
  private def rawNanos = Tables.events(spark, dir)
    .select(col("event_id"), col("ts_ns").as("ts"), col("user_id"),
      col("event_type"), col("value"), col("props"))

  test("hourlyCounts (append + watermark) matches batch for all watermark-closed windows") {
    val got = Streams.runToMemory(spark,
      Streams.hourlyCounts(Streams.readEventsStream(spark, dir)), "hourly")
      .collect().map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap

    val ev = Tables.events(spark, dir)
    val batch = ev
      .groupBy(date_trunc("hour", col("ts")).as("h"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("sum_value"))
      .select(unix_micros(col("h")).as("hour_us"), col("event_type"), col("n"), col("sum_value"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap

    // Append mode emits a window once the watermark (max ts - 1h) passes its
    // end: every emitted window must match batch exactly, and every batch
    // window closed by the watermark must have been emitted.
    val maxTsUs = ev.agg(max(expr("ts_ns div 1000"))).head().getLong(0)
    val watermarkUs = maxTsUs - 3600L * 1000000L
    got.foreach { case (k, v) => assert(batch(k) === v, s"window $k diverges") }
    val mustEmit = batch.keys.filter { case (h, _) => h + 3600L * 1000000L < watermarkUs }
    mustEmit.foreach(k => assert(got.contains(k), s"closed window $k missing"))
    assert(got.nonEmpty && got.size < batch.size) // trailing windows held in state
  }

  test("stream-stream interval join matches the batch join") {
    val got = Streams.runToMemory(spark,
      Streams.purchaseErrorJoin(Streams.readEventsStream(spark, dir), 240), "ssjoin")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val ev = Tables.events(spark, dir)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts_ns").as("p_ns"), col("event_id").as("p_id"))
    val e = ev.filter(col("event_type") === "error")
      .select(col("user_id").as("e_user"), col("ts_ns").as("e_ns"), col("event_id").as("e_id"))
    val W = 240L * 60 * 1000000000L
    val batch = p.join(e, col("p_user") === col("e_user") &&
        col("e_ns") >= col("p_ns") && col("e_ns") <= col("p_ns") + W)
      .collect().map(r => (r.getAs[Long]("p_id"), r.getAs[Long]("e_id"))).toSet
    assert(got === batch)
    assert(got.nonEmpty)
  }

  /** Batch-oracle sessions via the lag/gap window formulation. */
  private def batchSessions(df: org.apache.spark.sql.DataFrame, gapMin: Int)
      : Set[(Long, Long, Long, Int)] = {
    val w = Window.partitionBy("user_id").orderBy("ts_us")
    df.selectExpr("user_id", "ts div 1000 AS ts_us")
      .withColumn("brk", when(
        col("ts_us") - lag("ts_us", 1).over(w) > gapMin * 60L * 1000000L, 1).otherwise(0))
      .withColumn("sid", sum("brk").over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("user_id", "sid")
      .agg(min("ts_us").as("st"), max("ts_us").as("en"), count(lit(1)).cast("int").as("n"))
      .select("user_id", "st", "en", "n")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
  }

  /** The last (open-ended) session per user — the only ones the stream may
    * legitimately still hold in state when it drains. */
  private def trailing(batch: Set[(Long, Long, Long, Int)]): Set[(Long, Long, Long, Int)] =
    batch.groupBy(_._1).values.map(_.maxBy(_._2)).toSet

  test("sessionize (flatMapGroupsWithState) matches the batch lag/gap formulation") {
    val gapMin = 30
    val got = Streams.sessionize(Streams.readEventsStream(spark, dir), gapMin)
    val gotSet = Streams.runToMemory(spark, got.toDF(), "sessions")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet

    val batch = batchSessions(rawNanos, gapMin)
    // Every emitted session is a real batch session (never split/merged),
    // and every gap-closed session was emitted; only still-open trailing
    // sessions may be held back in state.
    assert(gotSet.subsetOf(batch))
    assert((batch -- trailing(batch)).subsetOf(gotSet))
    assert(gotSet.nonEmpty)
  }

  /** Land frames as time-ordered parquet files in a temp dir (file N gets
    * mtime N so maxFilesPerTrigger=1 replays them as ordered micro-batches). */
  private def landBatches(frames: Seq[org.apache.spark.sql.DataFrame]): java.io.File = {
    val tmp = java.nio.file.Files.createTempDirectory("graft-mb").toFile
    tmp.deleteOnExit()
    frames.zipWithIndex.foreach { case (df, i) =>
      val stage = new java.io.File(tmp, s"stage_$i")
      df.coalesce(1).write.parquet(stage.getPath)
      val part = stage.listFiles().find(_.getName.startsWith("part-")).get
      val dest = new java.io.File(tmp, s"$i.parquet")
      assert(part.renameTo(dest))
      dest.setLastModified((i + 1) * 1000000L)
    }
    tmp
  }

  test("sessionize does not split sessions at micro-batch boundaries") {
    val gapMin = 30
    val raw = rawNanos // ts = LongType nanos
    val batch = batchSessions(raw, gapMin)
    // Split inside the longest session so at least one session is
    // guaranteed to straddle the file (= micro-batch) boundary.
    val longest = batch.maxBy(s => s._3 - s._2)
    val midNs = (longest._2 + longest._3) / 2 * 1000L

    // Two time-ordered files; maxFilesPerTrigger=1 -> one micro-batch each,
    // so sessions spanning midNs cross a batch boundary. The r2 sessionize
    // closed state at every batch end and split exactly these sessions.
    val tmp = landBatches(Seq(
      raw.filter(col("ts") <= midNs), raw.filter(col("ts") > midNs)))

    val got = Streams.sessionize(
      Streams.readEventsStream(spark, tmp.getPath, "*.parquet", Some(1)), gapMin)
    val gotSet = Streams.runToMemory(spark, got.toDF(), "sessions_mb")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet

    val spanning = batch.filter(s => s._2 <= midNs / 1000 && s._3 > midNs / 1000)
    assert(spanning.nonEmpty, "split point must actually cross sessions")
    assert(gotSet.subsetOf(batch)) // no session split at the batch boundary
    assert((batch -- trailing(batch)).subsetOf(gotSet))
  }

  test("hourlyCounts drops late rows once the watermark is in force (batch N+2)") {
    val raw = rawNanos
    val maxNs = raw.agg(max(col("ts"))).head().getLong(0)
    // Late-record FILTERING uses the previous batch's watermark while
    // EVICTION uses the current one (Spark keeps both), so a replay right
    // after the first batch is legitimately merged — the filter watermark
    // is still 0 then. Three batches pin the real contract:
    //   batch 0: all data (collects event-time stats);
    //   batch 1: a replay of the last 30 min — its windows end after the
    //     watermark, stay in state, are never emitted (invisible);
    //   batch 2: a replay > 2h older than the watermark — by now the
    //     filter watermark is max ts - 1h, so every row must be dropped;
    //     admitted rows would inflate windows emitted at this commit.
    val recent = raw.filter(col("ts") >= maxNs - 1800L * 1000000000L)
    val late = raw.filter(col("ts") < maxNs - 2L * 3600 * 1000000000L)
    assert(late.count() > 0 && recent.count() > 0)
    val tmp = landBatches(Seq(raw, recent, late))
    val got = Streams.runToMemory(spark,
      Streams.hourlyCounts(
        Streams.readEventsStream(spark, tmp.getPath, "*.parquet", Some(1))),
      "hourly_late")
      .collect().map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
    // every (window, type) key emitted exactly once, values = batch over
    // the ORIGINAL data only (the late replay contributed nothing)
    assert(got.map(_._1).distinct.length === got.length)
    val batch = Tables.events(spark, dir)
      .groupBy(date_trunc("hour", col("ts")).as("h"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("sum_value"))
      .select(unix_micros(col("h")), col("event_type"), col("n"), col("sum_value"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    got.foreach { case (k, v) => assert(batch(k) === v, s"window $k diverges") }
  }

  test("hourlyValueHistogram + histMedian match the batch twin; thresholds bracket the rank element") {
    val got = Streams.histMedian(
      Streams.runToMemory(spark,
        Streams.hourlyValueHistogram(Streams.readEventsStream(spark, dir)), "vhist"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getDouble(2)).toMap

    val ev = Tables.events(spark, dir)
    val batch = Streams.histMedian(Streams.batchValueHistogram(ev))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getDouble(2)).toMap

    // Same finisher over the streaming sink and the batch histogram: every
    // watermark-emitted window must agree exactly, every window closed by
    // the watermark must have been emitted, trailing windows stay in state.
    val maxTsUs = ev.agg(max(expr("ts_ns div 1000"))).head().getLong(0)
    val watermarkUs = maxTsUs - 3600L * 1000000L
    got.foreach { case (k, v) => assert(batch(k) === v, s"window $k diverges") }
    val mustEmit = batch.keys.filter { case (h, _) => h + 3600L * 1000000L < watermarkUs }
    mustEmit.foreach(k => assert(got.contains(k), s"closed window $k missing"))
    assert(got.nonEmpty && got.size < batch.size)

    // The threshold is the LOWER EDGE of the bucket holding rank ⌈n/2⌉, so
    // the rank element itself must sit in [thr, thr + bucket width) — the
    // cross-check that the bounded-state median means what it claims.
    val width = Streams.HistValueHi / graft.operators.TextOps.HistK
    val rankEl = ev
      .groupBy(unix_micros(date_trunc("hour", col("ts"))).as("hour_us"), col("event_type"))
      .agg(expr("sort_array(collect_list(value))[cast((count(*) + 1) div 2 as int) - 1]").as("v"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getDouble(2)).toMap
    got.foreach { case (k, thr) =>
      val v = rankEl(k)
      assert(thr <= v && v < thr + width, s"rank element $v outside [$thr, ${thr + width}) for $k")
    }
  }

  test("streaming exact dedup drops cross-batch duplicates; output keys = batch distinct") {
    val raw = rawNanos
    // The same file landed twice -> every key arrives again in a SECOND
    // micro-batch (maxFilesPerTrigger=1). A dedup that kept per-batch state
    // only would emit everything twice.
    val tmp = landBatches(Seq(raw, raw))
    val got = Streams.runToMemory(spark,
      Streams.dedupEvents(
        Streams.readEventsStream(spark, tmp.getPath, "*.parquet", Some(1))),
      "dedup_mb")
      .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("ts_ns"),
        r.getAs[String]("event_type")))
    // no key emitted twice
    assert(got.length === got.toSet.size)
    // emitted keys are exactly the batch-distinct keys (second arrivals are
    // duplicates within the watermark, or late — dropped either way)
    val batchKeys = raw.select(col("user_id"), col("ts").as("ts_ns"), col("event_type"))
      .distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(got.toSet === batchKeys)
  }

  test("streaming incremental LSH dedup across micro-batches matches q80") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    // Micro-batch 1 = the standing corpus (doc_id % 4 != 0), micro-batch 2
    // = the crawl batch (doc_id % 4 == 0) — the band index built by batch 1
    // must survive in state and dedupe batch 2 against it, reproducing
    // q80's (doc_id, dup_of, keep) exactly.
    val tmp = landBatches(Seq(
      docs.filter(col("doc_id") % 4 =!= 0), docs.filter(col("doc_id") % 4 === 0)))
    val verdicts = Streams.runToMemory(spark,
        Streams.incrementalDedupStream(
          Streams.readDocsStream(spark, tmp.getPath, "*.parquet", Some(1))).toDF(),
        "incdedup_mb")
      .filter(col("doc_id") % 4 === 0) // corpus-internal dups not under test
      .groupBy("doc_id").agg(min("dup_of").as("dup_of"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    val want = graft.SparkEntry.queries("q80_incremental_dedup")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), Option(r.get(1)).map(_.asInstanceOf[Long]), r.getInt(2)))
    assert(want.nonEmpty && want.exists(_._3 == 0), "fixture must contain dups")
    want.foreach {
      case (id, _, 1) => assert(!verdicts.contains(id), s"doc $id wrongly flagged")
      case (id, dupOf, _) => assert(verdicts.get(id) === dupOf, s"doc $id dup_of diverges")
    }
  }

  test("streaming phash dedup across micro-batches matches the q136 pair greedy") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    // Id-ordered micro-batches (ids < 250, then the rest): "earlier batch"
    // then coincides with "smaller id", so the stream's decision order is
    // exactly q136's a < b total order and per-doc min(dup_of) must equal
    // the greedy derived from the q136 pair table: dup_of(b) = min a with
    // Hamming <= PhashHamTau. Two batches pin that bucket state SURVIVES
    // the micro-batch boundary.
    val tmp = landBatches(Seq(
      docs.filter(col("doc_id") < 250), docs.filter(col("doc_id") >= 250)))
    val got = Streams.runToMemory(spark,
        Streams.phashDedupStream(
          Streams.readDocsStream(spark, tmp.getPath, "*.parquet", Some(1))).toDF(),
        "phash_mb")
      .groupBy("doc_id").agg(min("dup_of").as("dup_of"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    val pairs = graft.SparkEntry.queries("q136_phash_neardup")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val want = pairs.groupBy(_._2).map { case (b, rs) => b -> rs.map(_._1).min }
    assert(want.nonEmpty, "fixture must contain phash near-dups")
    // Cross-boundary evidence: at least one flagged doc's dup_of lives in
    // the earlier micro-batch.
    assert(want.exists { case (b, a) => b >= 250 && a < 250 },
      "no cross-batch pair — the state-survival claim would be vacuous")
    assert(got === want)
  }

  test("streaming crossdoc cover across micro-batches reconstructs q151's strip exactly") {
    import graft.operators.Dedup
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    // Micro-batch 1 = the standing corpus, micro-batch 2 = the crawl
    // batch: the gram→min-doc state built by batch 1 must survive and
    // cover batch 2's duplicated spans, so stripCovered over the emitted
    // starts reproduces the persisted-index q151 verbatim.
    val standing = docs.filter(col("doc_id") % 4 =!= 0)
    val batch = docs.filter(col("doc_id") % 4 === 0)
    val tmp = landBatches(Seq(standing, batch))
    val covers = Streams.runToMemory(spark,
        Streams.crossdocCoverStream(
          Streams.readDocsStream(spark, tmp.getPath, "*.parquet", Some(1))).toDF(),
        "crossdoc_mb")
      .filter(col("doc_id") % 4 === 0) // standing-internal covers not under test
    val cov = covers
      .select(col("doc_id"),
        explode(expr(s"sequence(i, i + ${Dedup.CrossN - 1})")).as("ci"))
      .distinct()
    val got = Dedup.stripCovered(batch, cov).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), Option(r.getString(1)), r.getLong(2)))
    val want = graft.SparkEntry.queries("q151_crossdoc_from_store")(spark, dir)
      .collect().map(r => (r.getLong(0), Option(r.getString(1)), r.getLong(2)))
    assert(want.exists(_._3 > 0), "fixture must contain cross-doc spans")
    assert(got.sameElements(want))
  }

  test("streaming provenance edges across micro-batches fold to q167's matrix exactly") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    // Id-ordered batches: the stream's standing min per gram equals the
    // corpus min at every point it attributes against.
    val b1 = docs.filter(col("doc_id") < 250)
    val b2 = docs.filter(col("doc_id") >= 250)
    val edges = Streams.runToMemory(spark,
      Streams.provenanceStream(
        Streams.readDocsStream(spark, landBatches(Seq(b1, b2)).getPath,
          "*.parquet", Some(1))).toDF(),
      "prov_mb")
    val got = edges.groupBy("src_later", "src_first")
      .agg(count(lit(1)).as("n_grams"),
        countDistinct("doc_id").as("n_docs"),
        countDistinct("first_doc").as("n_first_docs"))
      .collect().map(_.toSeq.toList).toSet
    val want = graft.SparkEntry.queries("q167_strip_provenance")(spark, dir)
      .collect().map(_.toSeq.toList).toSet
    assert(got === want && got.nonEmpty)
  }

  test("provenance replay: shadowMatrixFromEdges folds re-emissions to q167's exact matrix") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val b1 = docs.filter(col("doc_id") < 250)
    val b2 = docs.filter(col("doc_id") >= 250)
    // Batch 3 replays batch 2: every covered occurrence in b2 re-emits its
    // edge row (the documented at-least-once contract), so a naive count
    // fold overcounts — the (doc_id, i) keyed fold must not.
    val edges = Streams.runToMemory(spark,
      Streams.provenanceStream(
        Streams.readDocsStream(spark, landBatches(Seq(b1, b2, b2)).getPath,
          "*.parquet", Some(1))).toDF(),
      "prov_replay")
    val naive = edges.groupBy("src_later", "src_first")
      .agg(count(lit(1)).as("n_grams"))
      .agg(coalesce(sum("n_grams"), lit(0L))).head().getLong(0)
    val got = Streams.shadowMatrixFromEdges(edges)
      .collect().map(_.toSeq.toList).toSet
    val want = graft.SparkEntry.queries("q167_strip_provenance")(spark, dir)
      .collect().map(_.toSeq.toList).toSet
    val exactGrams = want.map(_(2).asInstanceOf[Long]).sum
    assert(naive > exactGrams,
      "fixture produced no re-emissions — the idempotence claim would be vacuous")
    assert(got === want && got.nonEmpty)
  }

  test("provenance stream state: one (min, source) per gram; replay updates nothing") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val b1 = docs.filter(col("doc_id") < 250)
    val b2 = docs.filter(col("doc_id") >= 250)
    val (_, meter) = Streams.runToMemoryMetered(spark,
      Streams.provenanceStream(
        Streams.readDocsStream(spark, landBatches(Seq(b1, b2, b1)).getPath,
          "*.parquet", Some(1))).toDF(),
      "prov_meter")
    val m = meter.sortBy(_.batch_id)
    assert(m.size === 3)
    assert(m(1).state_rows > m(0).state_rows)
    assert(m(2).state_rows === m(1).state_rows,
      s"replay grew provenance state: ${m.map(_.state_rows)}")
    assert(m(2).rows_updated === 0L,
      s"replay rewrote provenance state: ${m.map(_.rows_updated)}")
  }

  test("crossdoc gram state meter: growth across batches, replay updates nothing") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val b1 = docs.filter(col("doc_id") < 250)
    val b2 = docs.filter(col("doc_id") >= 250)
    val (_, meter) = Streams.runToMemoryMetered(spark,
      Streams.crossdocCoverStream(
        Streams.readDocsStream(spark, landBatches(Seq(b1, b2, b1)).getPath,
          "*.parquet", Some(1))).toDF(),
      "crossdoc_meter")
    assert(meter.size === 3)
    val m = meter.sortBy(_.batch_id)
    val rows = m.map(_.state_rows)
    assert(rows(1) > rows(0), s"planted gram growth not visible: $rows")
    // Replay of batch 1: every replayed gram's stored min is already ≤ the
    // arriving ids, so NOTHING is rewritten — rows flat, rows_updated 0.
    assert(rows(2) === rows(1), s"replay grew gram state: $rows")
    assert(m(2).rows_updated === 0L,
      s"replay rewrote gram state: ${m.map(_.rows_updated)}")
    assert(m(1).rows_updated > 0L)
  }

  test("score-drift twin: state bounded by the bin grid, cumulative counts exact, TV matches driver math") {
    val cb = graft.operators.Eval.CalBins
    val salts = 8
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val b1 = docs.filter(col("doc_id") < 250)
    val b2 = docs.filter(col("doc_id") >= 250)
    val (binsDf, meter) = Streams.runToMemoryMetered(spark,
      Streams.scoreDriftStream(
        Streams.readDocsStream(spark, landBatches(Seq(b1, b2)).getPath,
          "*.parquet", Some(1)), salts).toDF(),
      "drift_mb")

    // The monitor's whole point: state can NEVER exceed the key grid, no
    // matter how much stream flows through it.
    assert(meter.nonEmpty && meter.forall(_.state_rows <= cb.toLong * salts),
      s"state exceeded the CalBins × salts grid: ${meter.map(_.state_rows)}")

    def binned(df: org.apache.spark.sql.DataFrame) =
      graft.operators.TextOps.qualityScored(df)
        .withColumn("bin", least(floor(col("score") * cb), lit(cb - 1L)).cast("long"))
        .groupBy("bin").agg(count(lit(1)).as("n"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    // Reference = batch 1's distribution; the stream has seen b1 + b2.
    val ref = binned(b1)
    val all = binned(docs)
    val refDf = spark.createDataFrame(
      spark.sparkContext.parallelize(ref.toSeq.map(t => org.apache.spark.sql.Row(t._1, t._2))),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("bin", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("ref_n", org.apache.spark.sql.types.LongType))))
    val out = Streams.driftFromBins(binsDf, refDf).collect()

    // Per-bin cumulative counts must be EXACTLY the whole-corpus counts
    // (max-of-monotone fold across micro-batch emissions).
    out.foreach { r =>
      assert(r.getLong(r.fieldIndex("run_n")) === all.getOrElse(r.getLong(0), 0L),
        s"bin ${r.getLong(0)} cumulative count diverged")
    }
    // TV vs the exact driver-side integer computation.
    val bins = (ref.keySet ++ all.keySet).toSeq
    val rt = all.values.sum
    val ft = ref.values.sum
    val tvWant = bins.map(b =>
      math.abs(all.getOrElse(b, 0L) * ft - ref.getOrElse(b, 0L) * rt)).sum.toDouble /
      (2.0 * rt * ft)
    val tvGot = out.head.getDouble(out.head.fieldIndex("tv"))
    assert(out.forall(r => r.getDouble(r.fieldIndex("tv")) == tvGot),
      "tv must be one scalar")
    assert(math.abs(tvGot - tvWant) < 1e-15, s"tv $tvGot != driver $tvWant")
  }

  test("HLL register twin: grid-bounded state, estimate bit-equal to batch q160, replay is a state no-op") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val b1 = docs.filter(col("doc_id") < 250)
    val b2 = docs.filter(col("doc_id") >= 250)
    val (regsDf, meter) = Streams.runToMemoryMetered(spark,
      Streams.hllRegisterStream(
        Streams.readDocsStream(spark, landBatches(Seq(b1, b2, b1)).getPath,
          "*.parquet", Some(1))).toDF(),
      "hll_mb")

    // Register state can NEVER exceed the langs × m key grid.
    val langs = docs.select("lang").distinct().count()
    assert(meter.nonEmpty && meter.forall(_.state_rows <= langs * graft.operators.Audit.HllM),
      s"state exceeded the langs × m grid: ${meter.map(_.state_rows)}")

    // Replay of batch 1 is a no-op by ALGEBRA (max is idempotent): zero
    // state writes, zero emissions, rows flat.
    val m = meter.sortBy(_.batch_id)
    assert(m.size === 3)
    assert(m(1).rows_updated > 0L)
    assert(m(2).rows_updated === 0L, s"replay rewrote registers: ${m.map(_.rows_updated)}")
    assert(m(2).state_rows === m(1).state_rows)

    // Sink fold reproduces the batch q160 sketch columns EXACTLY —
    // including the MAX-merged '__all__' row (same registers ⇒ same
    // integer fold ⇒ bit-identical estimate).
    val got = Streams.hllFromRegisters(regsDf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val want = graft.SparkEntry.queries("q160_hll_distinct")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got === want)
  }

  test("CMS cell twin: constant-grid state, fold bit-equal to batch cells, replay double-counts by contract") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val b1 = docs.filter(col("doc_id") < 250)
    val b2 = docs.filter(col("doc_id") >= 250)
    val (cellsDf, meter) = Streams.runToMemoryMetered(spark,
      Streams.cmsCellStream(
        Streams.readDocsStream(spark, landBatches(Seq(b1, b2, b1)).getPath,
          "*.parquet", Some(1))).toDF(),
      "cms_mb")

    // Cell state can NEVER exceed the constant D × W grid.
    val grid = graft.operators.Audit.CmsD.toLong * graft.operators.Audit.CmsW
    assert(meter.nonEmpty && meter.forall(_.state_rows <= grid),
      s"state exceeded the D × W grid: ${meter.map(_.state_rows)}")

    // The latest-wins fold is the batch grid over everything ingested —
    // which by the documented at-least-once contract is docs + b1 AGAIN
    // (addition is not idempotent; the replay legitimately double-counts).
    def wordsOf(d: org.apache.spark.sql.DataFrame) = d
      .select(explode(split(trim(col("text")), " ")).as("w"))
      .filter(col("w") =!= "")
    val want = graft.operators.Audit.cmsCells(
      wordsOf(docs.unionAll(b1)), "w")
      .orderBy("j", "c").collect().toSeq
    val got = Streams.cmsFromCells(cellsDf)
      .orderBy("j", "c").collect().toSeq
    assert(got === want, "stream fold diverged from the batch grid")

    // Without the replay the fold after batch 2 equals the clean corpus
    // grid: re-fold only emissions from batches 0-1 (cc values are
    // cumulative, so filtering by batch is not possible post-hoc — instead
    // pin the clean parity on the b1-only prefix via the meter's growth
    // shape: batch 3's update count equals batch 1's, the replayed mass).
    val m = meter.sortBy(_.batch_id)
    assert(m.size === 3)
    assert(m(2).rows_updated === m(0).rows_updated,
      s"replayed batch must touch exactly the cells batch 1 touched: ${m.map(_.rows_updated)}")
  }

  test("bigram LM twin: vocab²-bounded state; fold lands as the store table and serves q195") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val b1 = docs.filter(col("doc_id") < 250)
    val b2 = docs.filter(col("doc_id") >= 250)
    val (cellsDf, meter) = Streams.runToMemoryMetered(spark,
      Streams.bigramCellStream(
        Streams.readDocsStream(spark, landBatches(Seq(b1, b2)).getPath,
          "*.parquet", Some(1))).toDF(),
      "lm_mb")

    // State can never exceed the observed bigram TYPE count — the LM
    // artifact itself, not the corpus.
    val types = graft.operators.TextOps.knPairs(docs)
      .distinct().count()
    assert(meter.nonEmpty && meter.forall(_.state_rows <= types),
      s"state exceeded the bigram type grid: ${meter.map(_.state_rows)}")

    // The latest-wins fold IS the batch TYPE table...
    val want = graft.operators.TextOps.knPairs(docs)
      .groupBy("w1", "w2").agg(count(lit(1)).as("c"))
      .orderBy("w1", "w2").collect().map(_.toSeq.toList).toList
    val folded = Streams.bigramsFromCells(cellsDf)
    assert(folded.orderBy("w1", "w2").collect()
      .map(_.toSeq.toList).toList === want,
      "stream fold diverged from the batch bigram table")

    // ...so landing it under a store path serves the KN table ≡ q195:
    // the crawl stream feeds the same standing state the batch builders
    // persist.
    val store = java.nio.file.Files
      .createTempDirectory("graft-lm-stream").toString
    folded.write.mode("overwrite").parquet(s"$store/lm/bigrams")
    val served = graft.operators.IndexStore.knFromStore(spark, store)
      .orderBy("w1", "w2").collect().map(_.toSeq.toList).toList
    val q195 = graft.SparkEntry.queries("q195_kn_bigram")(spark, dir)
      .collect().map(_.toSeq.toList).toList
    assert(served === q195 && served.nonEmpty)
  }

  test("length-histogram twin: grid-bounded state, fold bit-equal to batch lens") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val b1 = docs.filter(col("doc_id") < 250)
    val b2 = docs.filter(col("doc_id") >= 250)
    val (binsDf, meter) = Streams.runToMemoryMetered(spark,
      Streams.lenBinStream(
        Streams.readDocsStream(spark, landBatches(Seq(b1, b2)).getPath,
          "*.parquet", Some(1))).toDF(),
      "lens_mb")

    // State can never exceed the (source, occupied-bin) grid.
    val grid = graft.operators.Audit.lenBins(docs).count()
    assert(meter.nonEmpty && meter.forall(_.state_rows <= grid),
      s"state exceeded the lens grid: ${meter.map(_.state_rows)}")

    // The latest-wins fold is exactly the batch histogram over everything
    // ingested — which is the store's lens table for the same docs.
    val want = graft.operators.Audit.lenBins(docs)
      .orderBy("source", "bin").collect().toSeq
    val got = Streams.lensFromBins(binsDf)
      .orderBy("source", "bin").collect().toSeq
    assert(got === want, "stream fold diverged from the batch histogram")
  }

  test("k-anonymity twin: grid-bounded state, fold ≡ q185's audit (minus n_sources)") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val b1 = docs.filter(col("doc_id") < 250)
    val b2 = docs.filter(col("doc_id") >= 250)
    val (cellsDf, meter) = Streams.runToMemoryMetered(spark,
      Streams.kanonCellStream(
        Streams.readDocsStream(spark, landBatches(Seq(b1, b2)).getPath,
          "*.parquet", Some(1))).toDF(),
      "kanon_mb")

    // State can never exceed the QI grid.
    val grid = graft.SparkEntry.queries("q185_kanon_audit")(spark, dir).count()
    assert(meter.nonEmpty && meter.forall(_.state_rows <= grid),
      s"state exceeded the QI grid: ${meter.map(_.state_rows)}")

    // The fold is exactly q185's audit over everything ingested, minus
    // its n_sources column (the gate's gauge is the exposure flag).
    val want = graft.SparkEntry.queries("q185_kanon_audit")(spark, dir)
      .select("lang", "len_bucket", "n_docs", "exposed")
      .orderBy("lang", "len_bucket").collect().toSeq
    val got = Streams.kanonFromCells(cellsDf)
      .orderBy("lang", "len_bucket").collect().toSeq
    assert(got === want, "stream fold diverged from the q185 audit")
  }

  test("state meter tracks standing-index growth for both dedup twins; replays add nothing") {
    // VERDICT r10 #3: the LSH and phash twins hold NoTimeout state that
    // grows with the standing index BY DESIGN — the meter must show that
    // growth per micro-batch. Three staged batches: two disjoint doc
    // slices, then an exact REPLAY of the first. State rows must grow
    // across the first two batches (the planted index) and stay FLAT on
    // the replay (the r10-ADVICE dedup-on-append rule: re-delivered
    // (id, signature) entries are not re-appended).
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val b1 = docs.filter(col("doc_id") < 250)
    val b2 = docs.filter(col("doc_id") >= 250)
    val tmp = landBatches(Seq(b1, b2, b1))

    val (_, phashMeter) = Streams.runToMemoryMetered(spark,
      Streams.phashDedupStream(
        Streams.readDocsStream(spark, tmp.getPath, "*.parquet", Some(1))).toDF(),
      "phash_meter")
    assert(phashMeter.size === 3, s"expected 3 metered batches: $phashMeter")
    val pm = phashMeter.sortBy(_.batch_id)
    val pRows = pm.map(_.state_rows)
    assert(pRows(1) > pRows(0), s"planted growth not visible: $pRows")
    // Replay: no new buckets AND no duplicate member entries — rows flat,
    // and the no-op-update rule means NOTHING was rewritten (memory bytes
    // are not asserted: the HDFS-backed store's gauge counts retained
    // version maps, which advance per batch regardless of content).
    assert(pRows(2) === pRows(1), s"replay grew phash state: $pRows")
    assert(pm(2).rows_updated === 0L,
      s"replay rewrote state rows: ${pm.map(_.rows_updated)}")
    assert(pm(1).rows_updated > 0L)
    assert(phashMeter.forall(_.state_bytes > 0))

    val (_, lshMeter) = Streams.runToMemoryMetered(spark,
      Streams.incrementalDedupStream(
        Streams.readDocsStream(spark, landBatches(Seq(b1, b2, b1)).getPath,
          "*.parquet", Some(1))).toDF(),
      "lsh_meter")
    assert(lshMeter.size === 3)
    val lm = lshMeter.sortBy(_.batch_id)
    val lRows = lm.map(_.state_rows)
    assert(lRows(1) > lRows(0), s"planted growth not visible: $lRows")
    assert(lRows(2) === lRows(1), s"replay grew LSH state: $lRows")
    assert(lm(2).rows_updated === 0L,
      s"replay rewrote LSH state rows: ${lm.map(_.rows_updated)}")
  }

  test("streaming familiarity vs the persisted LM matches batch q86 across micro-batches") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    // Freeze q86's reference slice as the persisted LM, then stream the
    // WHOLE corpus through in two micro-batches: per-doc scores must equal
    // the batch q86 result bit-for-bit (stateless scoring — batch
    // boundaries can't matter).
    val lmPath = java.nio.file.Files.createTempDirectory("graft-lm-stream").toString
    graft.operators.IndexStore.saveUnigramLM(
      docs.filter(col("doc_id") % 5 === 0), lmPath)
    val tmp = landBatches(Seq(
      docs.filter(col("doc_id") % 2 === 0), docs.filter(col("doc_id") % 2 === 1)))
    val got = Streams.runToMemory(spark,
        Streams.familiarityStream(
          Streams.readDocsStream(spark, tmp.getPath, "*.parquet", Some(1)), lmPath),
        "familiarity_mb")
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    val want = graft.SparkEntry.queries("q86_reference_familiarity")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    assert(got.length === want.length)
    assert(got.sameElements(want))
  }

  test("streaming KN bigram scoring vs the persisted LM matches batch q196 across micro-batches") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    // Freeze q196's train slice as the persisted bigram LM, stream the
    // held-out slice through in two micro-batches: per-doc scores must
    // equal batch q196 bit-for-bit (stateless fold over broadcast maps —
    // batch boundaries can't matter).
    val lmPath = java.nio.file.Files
      .createTempDirectory("graft-knlm-stream").toString
    graft.operators.IndexStore.saveBigramLM(
      docs.filter(col("doc_id") % 5 =!= 0), lmPath)
    val held = docs.filter(col("doc_id") % 5 === 0)
    val tmp = landBatches(Seq(
      held.filter(col("doc_id") % 2 === 0), held.filter(col("doc_id") % 2 === 1)))
    val got = Streams.runToMemory(spark,
        Streams.lmScoreStream(
          Streams.readDocsStream(spark, tmp.getPath, "*.parquet", Some(1)), lmPath),
        "knscore_mb")
      .orderBy("doc_id")
      .collect().map(_.toSeq.toList).toList
    val want = graft.SparkEntry.queries("q196_lm_doc_score")(spark, dir)
      .collect().map(_.toSeq.toList).toList
    assert(got === want && got.nonEmpty)
  }

  test("lmScoreStream fails loudly past the single-row map-env type cap (VERDICT r16 #1)") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val lmPath = java.nio.file.Files
      .createTempDirectory("graft-knlm-cap").toString
    graft.operators.IndexStore.saveBigramLM(
      docs.filter(col("doc_id") % 5 =!= 0), lmPath)
    val tmp = landBatches(Seq(docs.filter(col("doc_id") % 5 === 0)))
    // The gate fires at STREAM CONSTRUCTION (one batch count of the
    // store's folded table), before any micro-batch runs, and points at
    // the scalable join-based batch scorer.
    val ex = intercept[IllegalArgumentException] {
      Streams.lmScoreStream(
        Streams.readDocsStream(spark, tmp.getPath, "*.parquet", Some(1)),
        lmPath, maxTypes = 1L)
    }
    assert(ex.getMessage.contains("join-based batch scorer"))
  }

  test("streaming anomaly flags are bit-identical to batch q109 for every finalized hour") {
    val raw = rawNanos
    val (minNs, maxNs) = {
      val r = raw.agg(min("ts"), max("ts")).head(); (r.getLong(0), r.getLong(1))
    }
    // Three time-ordered micro-batches; the watermark available to the
    // LAST data batch (max ts of the first two thirds − lateness)
    // finalizes ~2/3 of the hours. NoTimeout FMGWS is not invoked by
    // no-data batches, so hours finalized only by the final watermark
    // stay un-emitted — by design (they emit when the next day's data
    // arrives in production).
    val cut1 = minNs + (maxNs - minNs) / 3
    val cut2 = minNs + 2 * (maxNs - minNs) / 3
    val tmp = landBatches(Seq(
      raw.filter(col("ts") <= cut1),
      raw.filter(col("ts") > cut1 && col("ts") <= cut2),
      raw.filter(col("ts") > cut2)))

    val got = Streams.runToMemory(spark,
        Streams.anomalyStream(
          Streams.readEventsStream(spark, tmp.getPath, "*.parquet", Some(1)),
          "2 hours").toDF(), "anom_mb")
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(4), r.getDouble(5), r.getInt(6)))
      .toMap
    // Batch q109 emits (event_type, hr, c, mean_c, z, is_anomaly) — no n
    // column; compare the shared fields.
    val want = graft.SparkEntry.queries("q109_event_anomaly")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getInt(5)))
      .toMap

    assert(got.nonEmpty, "no hours finalized — lateness/split mismatch")
    // Every emitted row is bit-identical to the batch query's row.
    got.foreach { case (k, v) =>
      assert(want.contains(k), s"stream emitted an hour batch never saw: $k")
      assert(want(k) === v, s"mismatch at $k")
    }
    // Coverage: every batch row whose hour closed under the last DATA
    // batch's watermark (max ts of the first two files − lateness, 1 s
    // slack for ms truncation) was emitted.
    val maxNs2 = raw.filter(col("ts") <= cut2).agg(max("ts")).head().getLong(0)
    val wmMs = maxNs2 / 1000000L - 2L * 3600 * 1000
    val mustHave = want.keySet.filter { case (_, h) =>
      (h + 1) * 3600000L < wmMs - 1000 }
    assert(mustHave.nonEmpty)
    assert(mustHave.subsetOf(got.keySet),
      s"missing finalized hours: ${mustHave -- got.keySet}")
  }

  test("streaming debounce verdict counts match batch q115 across three micro-batches") {
    val raw = rawNanos
    val (minNs, maxNs) = {
      val r = raw.agg(min("ts"), max("ts")).head(); (r.getLong(0), r.getLong(1))
    }
    val cut1 = minNs + (maxNs - minNs) / 3
    val cut2 = minNs + 2 * (maxNs - minNs) / 3
    val tmp = landBatches(Seq(
      raw.filter(col("ts") <= cut1),
      raw.filter(col("ts") > cut1 && col("ts") <= cut2),
      raw.filter(col("ts") > cut2)))

    val got = Streams.runToMemory(spark,
        Streams.debounceStream(
          Streams.readEventsStream(spark, tmp.getPath, "*.parquet", Some(1))).toDF(),
        "debounce_mb")
      .groupBy("user_id", "event_type")
      .agg(count(lit(1)).as("n_events"), sum("bounced").as("n_dropped"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap

    val want = graft.SparkEntry.queries("q115_debounce")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getLong(4)))
      .toMap

    assert(got.nonEmpty && got.keySet === want.keySet,
      s"key sets differ: ${(got.keySet diff want.keySet) ++ (want.keySet diff got.keySet)}")
    want.foreach { case (k, v) =>
      assert(got(k) === v, s"count mismatch at $k: got ${got(k)}, want $v")
    }
    // The staged corpus genuinely exercises the bounce path.
    assert(want.values.map(_._2).sum > 0, "no bounces in the staged data")
  }

  test("streaming CDC apply over two micro-batches matches batch applyChangeset") {
    import graft.operators.Dedup
    val docs = Tables.load(spark, dir, "documents")
    val snapA = Dedup.snapshotDigest(docs)
    val delta = Dedup.simulateChangeset(docs)

    // Split the delta into two time-ordered micro-batches: upserts first,
    // deletes second — so at least the deleted keys see their state seeded
    // from the INITIAL snapshot, not from an in-stream upsert, and keys
    // both inserted and never touched again prove versioning works.
    val tmp = landBatches(Seq(
      delta.filter(col("op") === "upsert"), delta.filter(col("op") === "delete")))
    val changesSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("source", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("h", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("op", org.apache.spark.sql.types.StringType)))
    val changesStream = spark.readStream.schema(changesSchema)
      .option("pathGlobFilter", "*.parquet").option("maxFilesPerTrigger", 1)
      .parquet(tmp.getPath)

    val emitted = Streams.runToMemory(spark,
        Streams.applyChangesetStream(changesStream, snapA).toDF(), "cdc_mb")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2),
        Option(r.getString(3)), Option(r.getString(4))))

    // Reconstruct the final snapshot: initial rows overridden by each
    // key's max-version emission (untouched keys emit nothing).
    val last = emitted.groupBy(_._1).map { case (_, es) => es.maxBy(_._2) }
    val overridden = last.map(e => e._1 -> (e._3, e._4, e._5)).toMap
    val initRows = snapA.collect()
      .map(r => r.getLong(0) -> (r.getString(1), Option(r.getString(2)))).toMap
    val finalRows: Set[(Long, String, Option[String])] =
      (initRows.keySet ++ overridden.keySet).flatMap { id =>
        overridden.get(id) match {
          case Some((present, src, h)) =>
            if (present) Some((id, src.orNull, h)) else None
          case None =>
            val (src, h) = (initRows(id)._1, initRows(id)._2)
            Some((id, src, h))
        }
      }

    val want = Dedup.applyChangeset(snapA, delta).collect()
      .map(r => (r.getLong(0), r.getString(1), Option(r.getString(2)))).toSet
    assert(want.nonEmpty)
    assert(finalRows === want)
  }

  test("empty-dir fallback fails loudly when a MICROS file lands (VERDICT r9 #5)") {
    // Stream constructed on an EMPTY dir -> eventsSchema guesses the NANOS
    // generation. An int64-MICROS file landing afterwards used to read its
    // micros silently as 1000x-off "nanos"; the fallback guard must instead
    // fail the query with a named, actionable error on first contact.
    val tmp = java.nio.file.Files.createTempDirectory("graft-empty-micros").toFile
    tmp.deleteOnExit()
    val stream = Streams.readEventsStream(spark, tmp.getPath) // fallback baked here
    val prev = spark.conf.get("spark.sql.parquet.outputTimestampType")
    try {
      // The real MICROS generation is int64 TIMESTAMP_MICROS (pyarrow-style),
      // not Spark's default INT96 — write it exactly so.
      spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      val stage = new java.io.File(tmp, "stage")
      Tables.events(spark, dir).limit(200)
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value"), col("props"))
        .coalesce(1).write.parquet(stage.getPath)
      val part = stage.listFiles().find(_.getName.startsWith("part-")).get
      assert(part.renameTo(new java.io.File(tmp, "events.parquet")))
    } finally spark.conf.set("spark.sql.parquet.outputTimestampType", prev)

    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      Streams.runToMemory(spark,
        stream.select(col("event_id"), col("ts_ns")), "fallback_micros")
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else String.valueOf(t.getMessage) +: messages(t.getCause)
    assert(messages(e).exists(_.contains("MICROS-generation file landed")),
      messages(e).mkString(" | "))
  }

  test("empty-dir fallback passes a NANOS file through untouched") {
    // The guess being guarded is also the guess being USED: a genuine
    // nanos-generation file landing after an empty-dir start must stream
    // through the same guard without a scratch.
    val tmp = java.nio.file.Files.createTempDirectory("graft-empty-nanos").toFile
    tmp.deleteOnExit()
    val stream = Streams.readEventsStream(spark, tmp.getPath)
    val stage = new java.io.File(tmp, "stage")
    rawNanos.limit(200).coalesce(1).write.parquet(stage.getPath)
    val part = stage.listFiles().find(_.getName.startsWith("part-")).get
    assert(part.renameTo(new java.io.File(tmp, "events.parquet")))

    val got = Streams.runToMemory(spark,
      stream.select(col("event_id"), col("ts_ns")), "fallback_nanos")
    assert(got.count() === 200L)
    val want = rawNanos.limit(200).select(col("event_id"), col("ts").as("ts_ns"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.collect().map(r => (r.getLong(0), r.getLong(1))).toSet === want)
  }
}
