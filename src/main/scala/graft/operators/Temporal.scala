package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.{QueryDef, Tables}

/** Time-oriented operators over the `events` table: tumbling-window
  * aggregation, as-of join, and a bucketed range join.
  *
  * All time comparisons run on exact epoch-nanos bigints (`ts_ns`, see
  * Tables.events) so semantics are identical to an engine that keeps full
  * nanosecond timestamps. Emitted times are epoch-micros bigints.
  */
object Temporal {

  /** Scalable backward (inclusive) as-of left join.
    *
    * Single-shuffle formulation: union the right rows *under* the left rows,
    * one window pass per key carries the most recent right-side values
    * forward, then keep only left rows. No per-row point lookups, no range
    * join blowup — at 100 TB this is one shuffle on the join key plus a
    * linear sorted scan per partition (same cost as any sort-merge join).
    *
    * Right side must be unique per (key, time); ties at equal time match the
    * right row (inclusive), mirroring e.g. DuckDB's `ASOF JOIN ... ON l.t >= r.t`.
    *
    * Values are carried as ONE struct per right row, so a right-side value
    * column that is legitimately NULL is preserved from the matched row
    * (true ASOF semantics) instead of being skipped for an older row's value.
    */
  def asofLeft(
      left: DataFrame, right: DataFrame,
      key: String, time: String, valueCols: Seq[String]): DataFrame = {
    val leftOnly = left.columns.filterNot(c => c == key || c == time).toSeq
    val carryType = right.select(struct(valueCols.map(col): _*)).schema.head.dataType
    val l = left.select(
      (Seq(key, time) ++ leftOnly).map(col)
        :+ lit(null).cast(carryType).as("__carry") :+ lit(1).as("__tag"): _*)
    val r = right.select(
      Seq(col(key), col(time)) ++ leftOnly.map(c => lit(null).as(c))
        :+ struct(valueCols.map(col): _*).as("__carry") :+ lit(0).as("__tag"): _*)
    val w = Window.partitionBy(col(key))
      .orderBy(col(time), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("__carry", last(col("__carry"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)
      .select(
        (Seq(key, time) ++ leftOnly).map(col)
          ++ valueCols.map(c => col(s"__carry.$c").as(c)): _*)
  }

  /** Histogram resolution for `histQuantiles` — same power-of-two bucket
    * count as TextOps.HistK (exact-double edges k/K over the group range),
    * giving a ≤(mx−mn)/4096 quantile granularity with O(1)-in-the-corpus
    * aggregation state. Declared ABOVE `defs`, which interpolates it into
    * q76's oracle SQL at object init (CLAUDE.md: object-init order). */
  val QuantK: Int = TextOps.HistK

  /** q115 debounce window: an event arriving less than this many
    * microseconds after the previous event of its (user, type) key is a
    * bounce. 1 hour — at the testdata's arrival rates ~2% of events
    * collapse, the retry-storm regime this models. */
  val DebounceGapUs = 3600000000L

  val defs: Seq[QueryDef] = Seq(

    // ── Tumbling time-bucket aggregation (streaming's batch twin) ──
    QueryDef(
      "q20_time_bucket",
      (s, dir) => {
        Tables.events(s, dir)
          .groupBy(date_trunc("hour", col("ts")).as("hour_start"), col("event_type"))
          .agg(
            count(lit(1)).as("n"),
            sum(col("value").cast(DecimalType(18, 2))).cast("double").as("sum_value"))
          .withColumn("hour_us", unix_micros(col("hour_start")))
          .drop("hour_start")
          .orderBy("hour_us", "event_type")
      },
      Some("""SELECT epoch_us(date_trunc('hour', ts)) AS hour_us, event_type,
             |       count(*) AS n,
             |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
             |FROM events GROUP BY 1, 2 ORDER BY hour_us, event_type""".stripMargin)),

    // ── As-of join: each purchase matched to the user's latest prior signup ──
    QueryDef(
      "q30_asof_join",
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val signups = ev.filter(col("event_type") === "signup")
          .groupBy(col("user_id"), col("ts_ns"))
          .agg(max(col("event_id")).as("s_id"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts_ns"))
        asofLeft(purchases, signups, "user_id", "ts_ns", Seq("s_id"))
          .select(col("event_id"), col("user_id"), expr("ts_ns div 1000").as("ts_us"), col("s_id"))
          .orderBy("event_id")
      },
      Some("""WITH s AS (SELECT user_id, ts, max(event_id) AS s_id FROM events
             |           WHERE event_type = 'signup' GROUP BY user_id, ts),
             |     p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase')
             |SELECT p.event_id, p.user_id, epoch_us(p.ts) AS ts_us, s.s_id
             |FROM p ASOF LEFT JOIN s ON p.user_id = s.user_id AND p.ts >= s.ts
             |ORDER BY p.event_id""".stripMargin)),

    // ── Bucketed range join: purchases within 5 min before each error ──
    QueryDef(
      "q31_range_count",
      (s, dir) => {
        // Scale posture: a raw inequality join is O(n·m) per user; instead
        // bucket both sides by floor(ts / window) and equi-join on
        // (user, bucket) with each probe row exploded into the 2 buckets its
        // window can span, then apply the exact range predicate. Shuffle is
        // on (user, bucket) — skew-free, linear, AQE-friendly.
        val W = 300L * 1000000000L // 5 min in nanos
        val ev = Tables.events(s, dir)
        val errors = ev.filter(col("event_type") === "error")
          .select(col("event_id").as("e_id"), col("user_id"), col("ts_ns").as("e_ts"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id").as("p_user"), col("ts_ns").as("p_ts"))
        val eb = errors.withColumn("bucket", expr(s"e_ts div $W"))
        val pb = purchases.withColumn(
          "bucket", explode(array(expr(s"p_ts div $W"), expr(s"p_ts div $W + 1"))))
        val counts = eb.join(pb,
            eb("user_id") === pb("p_user") && eb("bucket") === pb("bucket") &&
              pb("p_ts") <= eb("e_ts") && pb("p_ts") >= eb("e_ts") - W)
          .groupBy(col("e_id")).agg(count(lit(1)).as("n"))
        errors.join(counts, Seq("e_id"), "left")
          .select(col("e_id"), coalesce(col("n"), lit(0L)).as("n_purchases"))
          .orderBy("e_id")
      },
      Some("""SELECT e.event_id AS e_id, count(p.event_id) AS n_purchases
             |FROM (SELECT * FROM events WHERE event_type = 'error') e
             |LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
             |  ON e.user_id = p.user_id AND p.ts <= e.ts
             |     AND p.ts >= e.ts - INTERVAL 5 MINUTE
             |GROUP BY e.event_id ORDER BY e_id""".stripMargin)),

    // ── Salted two-stage aggregation (skew-mitigation pattern) ──
    QueryDef(
      "q49_salted_agg",
      (s, dir) => {
        // A hot key would overload its reducer in a one-shot groupBy; the
        // salt spreads each key over 16 partial groups, the second stage
        // merges 16 rows per key. Count/DECIMAL-sum are associative, so the
        // result is exactly the plain groupBy (which IS the oracle).
        val ev = Tables.events(s, dir)
        ev.withColumn("salt", pmod(col("event_id"), lit(16)))
          .groupBy("user_id", "salt")
          .agg(count(lit(1)).as("pn"),
            sum(col("value").cast(DecimalType(18, 2))).as("ps"))
          .groupBy("user_id")
          .agg(sum("pn").as("n"), sum("ps").cast("double").as("sum_value"))
          .orderBy("user_id")
      },
      Some("""SELECT user_id, count(*) AS n,
             |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
             |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // ── Funnel: first signup → first subsequent purchase per user ──
    QueryDef(
      "q57_funnel",
      (s, dir) => {
        // Two conditional aggregations over ONE shuffle each: the user's
        // first signup, then the first purchase at-or-after it. No
        // per-user sequence materialization — min() under a predicate is
        // all a 2-step funnel needs, and partial aggregation keeps it
        // map-side combining at any scale.
        val ev = Tables.events(s, dir)
        val first = ev.groupBy("user_id")
          .agg(min(when(col("event_type") === "signup", col("ts_ns"))).as("s_ns"))
          .filter(col("s_ns").isNotNull)
        val conv = ev.filter(col("event_type") === "purchase")
          .join(first, Seq("user_id"))
          .filter(col("ts_ns") >= col("s_ns"))
          .groupBy("user_id").agg(min("ts_ns").as("p_ns"))
        first.join(conv, Seq("user_id"), "left")
          .select(col("user_id"),
            expr("s_ns div 1000").as("s_us"),
            expr("p_ns div 1000").as("p_us"),
            col("p_ns").isNotNull.as("converted"))
          .orderBy("user_id")
      },
      Some("""WITH first AS (
             |  SELECT user_id, min(CASE WHEN event_type = 'signup' THEN ts END) AS s_ts
             |  FROM events GROUP BY user_id HAVING s_ts IS NOT NULL),
             |conv AS (
             |  SELECT e.user_id, min(e.ts) AS p_ts
             |  FROM events e JOIN first f ON e.user_id = f.user_id
             |  WHERE e.event_type = 'purchase' AND e.ts >= f.s_ts
             |  GROUP BY e.user_id)
             |SELECT f.user_id, epoch_us(f.s_ts) AS s_us, epoch_us(c.p_ts) AS p_us,
             |       c.p_ts IS NOT NULL AS converted
             |FROM first f LEFT JOIN conv c ON f.user_id = c.user_id
             |ORDER BY f.user_id""".stripMargin)),

    // ── RANGE-frame window: rolling 1-hour per-user sum over event time ──
    QueryDef(
      "q75_rolling_range",
      (s, dir) => {
        // The RANGE frame surface (value-based bounds, peers included —
        // q16/q67 cover ROWS frames): each event's trailing-hour spend per
        // user. Keyed by user_id, ordered by epoch-micros BIGINT, so the
        // frame bound is pure integer arithmetic in both engines; the
        // summed value goes through exact DECIMAL accumulation.
        val w = Window.partitionBy("user_id").orderBy(col("ts_us"))
          .rangeBetween(-3600000000L, 0)
        Tables.events(s, dir)
          .select(col("event_id"), col("user_id"),
            expr("ts_ns div 1000").as("ts_us"),
            col("value").cast(DecimalType(18, 2)).as("v"))
          .withColumn("hour_sum", sum("v").over(w).cast("double"))
          .select("event_id", "user_id", "ts_us", "hour_sum")
          .orderBy("event_id")
      },
      Some("""SELECT event_id, user_id, ts_us,
             |       CAST(sum(v) OVER (PARTITION BY user_id ORDER BY ts_us
             |            RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) AS DOUBLE) AS hour_sum
             |FROM (SELECT event_id, user_id, epoch_ns(ts) // 1000 AS ts_us,
             |             CAST(value AS DECIMAL(18,2)) AS v
             |      FROM events)
             |ORDER BY event_id""".stripMargin)),

    // ── JSON property extraction from a string column (no schema'd read) ──
    QueryDef(
      "q74_json_extract",
      (s, dir) => {
        // events.props is a JSON STRING — the "semi-structured column in a
        // relational table" shape. get_json_object is a codegen'd path
        // walk, so extraction is a narrow scan; the filter on the
        // extracted value stays in the same stage (no UDF, no re-parse).
        Tables.events(s, dir)
          .withColumn("k",
            get_json_object(col("props"), "$.k").cast("long"))
          .filter(col("k") > 90)
          .select("event_id", "event_type", "k")
          .orderBy("event_id")
      },
      Some("""SELECT event_id, event_type, k FROM (
             |  SELECT event_id, event_type,
             |         CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
             |  FROM events)
             |WHERE k > 90 ORDER BY event_id""".stripMargin)),

    // ── Gap-based sessionization, batch formulation (lag → break → cumsum) ──
    QueryDef(
      "q67_sessions",
      (s, dir) => {
        // The batch twin of streaming/Streams.sessionize, as an oracled
        // query: a 30-min silence starts a new session. Both windows are
        // keyed by user_id (shuffled, never concentrated) with an explicit
        // ROWS frame and a (ts_ns, event_id) total order, so the cumsum is
        // engine-deterministic even under timestamp ties.
        val GapNs = 30L * 60 * 1000000000L
        val w = Window.partitionBy("user_id").orderBy("ts_ns", "event_id")
        Tables.events(s, dir)
          .withColumn("brk",
            when(col("ts_ns") - lag("ts_ns", 1).over(w) > GapNs, 1).otherwise(0))
          .withColumn("sid",
            sum("brk").over(w.rowsBetween(Window.unboundedPreceding, 0)))
          .groupBy("user_id", "sid")
          .agg(expr("min(ts_ns) div 1000").as("s_us"),
            expr("max(ts_ns) div 1000").as("e_us"),
            count(lit(1)).as("n_events"))
          .select("user_id", "s_us", "e_us", "n_events")
          .orderBy("user_id", "s_us")
      },
      Some("""WITH e AS (
             |  SELECT user_id, event_id, epoch_ns(ts) AS ts_ns FROM events),
             |b AS (
             |  SELECT user_id, event_id, ts_ns,
             |         CASE WHEN ts_ns - lag(ts_ns, 1) OVER
             |                (PARTITION BY user_id ORDER BY ts_ns, event_id)
             |              > 1800000000000 THEN 1 ELSE 0 END AS brk
             |  FROM e),
             |sids AS (
             |  SELECT user_id, ts_ns,
             |         CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts_ns, event_id
             |              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid
             |  FROM b)
             |SELECT user_id, min(ts_ns) // 1000 AS s_us, max(ts_ns) // 1000 AS e_us,
             |       count(*) AS n_events
             |FROM sids GROUP BY user_id, sid
             |ORDER BY user_id, s_us""".stripMargin)),

    // ── Retention cohorts: users active N days after their first day ──
    QueryDef(
      "q66_retention",
      (s, dir) => {
        // The third classic event-analytics shape next to sessions (q16/
        // streaming) and funnels (q57): cohort = a user's first active day,
        // retention(cohort, age) = fraction of the cohort active age days
        // later. Day ids are pure integer div on epoch nanos (portable,
        // no tz). Three keyed aggregations, all partial+final; the cohort
        // size frame is day-cardinality small and joins broadcast under
        // AQE — nothing here touches more than (user, day) distinct rows.
        val d = Tables.events(s, dir)
          .select(col("user_id"), expr("ts_ns div 86400000000000").as("day"))
          .distinct()
        val c = d.groupBy("user_id").agg(min("day").as("cohort_day"))
        val sz = c.groupBy("cohort_day").agg(count(lit(1)).as("n_cohort"))
        d.join(c, Seq("user_id"))
          .withColumn("age", col("day") - col("cohort_day"))
          .groupBy("cohort_day", "age").agg(count(lit(1)).as("n_active"))
          .join(sz, Seq("cohort_day"))
          .withColumn("retention", col("n_active") / col("n_cohort").cast("double"))
          .select("cohort_day", "age", "n_active", "retention")
          .orderBy("cohort_day", "age")
      },
      Some("""WITH d AS (
             |  SELECT DISTINCT user_id, epoch_ns(ts) // 86400000000000 AS day FROM events),
             |c AS (SELECT user_id, min(day) AS cohort_day FROM d GROUP BY user_id),
             |sz AS (SELECT cohort_day, count(*) AS n_cohort FROM c GROUP BY cohort_day)
             |SELECT c.cohort_day, d.day - c.cohort_day AS age, count(*) AS n_active,
             |       count(*) / CAST(sz.n_cohort AS DOUBLE) AS retention
             |FROM d JOIN c USING (user_id) JOIN sz USING (cohort_day)
             |GROUP BY c.cohort_day, d.day - c.cohort_day, sz.n_cohort
             |ORDER BY cohort_day, age""".stripMargin)),

    // ── Exact percentiles per group (sort-based; engine extension) ──
    QueryDef(
      "q50_percentiles",
      (s, dir) => {
        // Exact linear-interpolated percentiles (one shuffle on the group
        // key, per-group sort). For 100 TB dashboards the approximate
        // mergeable-sketch twin is q76_approx_quantile — exact is the
        // oracle-checkable reference point.
        Tables.events(s, dir)
          .groupBy("event_type")
          .agg(
            expr("percentile(value, 0.25)").as("q25"),
            expr("percentile(value, 0.5)").as("q50"),
            expr("percentile(value, 0.9)").as("q90"))
          .orderBy("event_type")
      },
      Some("""SELECT event_type,
             |       quantile_cont(value, 0.25) AS q25,
             |       quantile_cont(value, 0.5) AS q50,
             |       quantile_cont(value, 0.9) AS q90
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // ── Bounded-state approximate quantiles (the 100 TB form of q50) ──
    QueryDef(
      "q76_approx_quantile",
      (s, dir) => {
        // The scale-safe percentile surface named in SURVEY §7.5:
        // `histQuantiles` generalizes TextOps.histMedianThr to arbitrary
        // ranks — an equi-width K-bucket histogram over each group's
        // [min, max], quantile_p = lower bucket edge at rank ⌈p·n/100⌉.
        // Aggregation state is ≤ groups × K counters (partial+final
        // mergeable), NO exact Percentile aggregate anywhere in the plan
        // (pinned by ScaleBoundsSpec), and every arithmetic step is
        // IEEE-deterministic in both engines, so unlike a GK sketch the
        // result is hash-green against an independent oracle. The
        // sketch-flavored twin (`approxQuantileSketch`, Spark's mergeable
        // approx_percentile) carries its rank-error contract in
        // ApproxQuantileSpec at test scale — cross-engine a sketch is not
        // bit-reproducible, so it can't be THE oracled surface.
        histQuantiles(
            Tables.events(s, dir).select("event_type", "value"),
            "event_type", "value", Seq(25, 50, 90))
          .orderBy("event_type")
      },
      Some(s"""WITH ev AS (SELECT event_type, value FROM events),
              |rng AS (SELECT event_type, min(value) AS mn, max(value) AS mx
              |        FROM ev GROUP BY event_type),
              |hist AS (
              |  SELECT ev.event_type, mn, mx,
              |         CASE WHEN mx = mn THEN 0
              |              ELSE least(CAST(floor((value - mn) / (mx - mn) * $QuantK) AS BIGINT), ${QuantK - 1}) END AS b,
              |         count(*) AS c
              |  FROM ev JOIN rng USING (event_type)
              |  GROUP BY ev.event_type, mn, mx, b),
              |hcum AS (
              |  SELECT event_type, mn, mx, b, c,
              |         CAST(sum(c) OVER (PARTITION BY event_type ORDER BY b ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
              |         CAST(sum(c) OVER (PARTITION BY event_type) AS BIGINT) AS n
              |  FROM hist),
              |sel AS (
              |  SELECT event_type, mn, mx,
              |         min(CASE WHEN cum >= (n * 25 + 99) // 100 THEN b END) AS b25,
              |         min(CASE WHEN cum >= (n * 50 + 99) // 100 THEN b END) AS b50,
              |         min(CASE WHEN cum >= (n * 90 + 99) // 100 THEN b END) AS b90
              |  FROM hcum GROUP BY event_type, mn, mx)
              |SELECT event_type,
              |       mn + b25 * (mx - mn) / $QuantK AS q25,
              |       mn + b50 * (mx - mn) / $QuantK AS q50,
              |       mn + b90 * (mx - mn) / $QuantK AS q90
              |FROM sel ORDER BY event_type""".stripMargin)),

    // ── Ingest-rate anomaly detection (trailing-window z-score) ──
    QueryDef(
      "q109_event_anomaly",
      (s, dir) => {
        // The ingest monitor a pipeline runs on its event/crawl firehose:
        // per (event_type, hour) arrival counts scored against the
        // trailing 24 hours' mean/σ — a z-spike means a broken upstream, a
        // crawler loop, or a bot flood, all of which poison the training
        // mix if they ship. Sums are INTEGER (counts and squared counts —
        // exact, order-free); the only doubles are the final mean/σ/z
        // chain, identical in both engines, with the σ = 0 plateau mapped
        // to z = 0 explicitly (a constant-rate window has no spike by
        // definition — and avoids a 0/0 NaN divergence).
        //
        // 100 TB shape: the corpus collapses FIRST into the (type, hour)
        // aggregate — types × hours rows, partial+final — and the window
        // runs over THAT bounded frame keyed by type (never over raw
        // events); warm-up hours (n < 24/2) are excluded, not zero-padded.
        val hourly = Tables.events(s, dir)
          .groupBy(col("event_type"), expr("ts_ns div 3600000000000").as("hr"))
          .agg(count(lit(1)).as("c"))
        val w = Window.partitionBy("event_type").orderBy("hr")
          .rowsBetween(-24, -1)
        hourly.select(col("event_type"), col("hr"), col("c"),
            count(col("c")).over(w).as("n"),
            sum(col("c")).over(w).as("sm"),
            sum(col("c") * col("c")).over(w).as("sq"))
          .filter(col("n") >= 12)
          .select(col("event_type"), col("hr"), col("c"),
            expr("sm / n").as("mean_c"),
            expr("""CASE WHEN sq * n = sm * sm THEN 0e0
                   |     ELSE (c - sm / n) / sqrt((sq - sm * sm / n) / n) END""".stripMargin)
              .as("z"),
            expr("""CASE WHEN sq * n <> sm * sm AND
                   |          abs((c - sm / n) / sqrt((sq - sm * sm / n) / n)) > 3.0e0
                   |     THEN 1 ELSE 0 END""".stripMargin).as("is_anomaly"))
          .orderBy("event_type", "hr")
      },
      Some("""WITH hourly AS (
             |  SELECT event_type, epoch_us(ts) // 3600000000 AS hr, count(*) AS c
             |  FROM events GROUP BY 1, 2),
             |win AS (
             |  SELECT event_type, hr, c,
             |         CAST(count(c) OVER w AS BIGINT) AS n,
             |         CAST(sum(c) OVER w AS BIGINT) AS sm,
             |         CAST(sum(c * c) OVER w AS BIGINT) AS sq
             |  FROM hourly
             |  WINDOW w AS (PARTITION BY event_type ORDER BY hr
             |               ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING))
             |SELECT event_type, hr, c,
             |       sm / n AS mean_c,
             |       CASE WHEN sq * n = sm * sm THEN 0e0
             |            ELSE (c - sm / n) / sqrt((sq - sm * sm / n) / n) END AS z,
             |       CASE WHEN sq * n <> sm * sm AND
             |                 abs((c - sm / n) / sqrt((sq - sm * sm / n) / n)) > 3.0e0
             |            THEN 1 ELSE 0 END AS is_anomaly
             |FROM win WHERE n >= 12
             |ORDER BY event_type, hr""".stripMargin)),

    // ── Debounce: collapse rapid-fire repeats per (user, event_type) ──
    QueryDef(
      "q115_debounce",
      (s, dir) => {
        // Bot bursts, double-clicks, and retry storms arrive as the same
        // (user, type) event repeated within seconds; a training pipeline
        // debounces them so per-user activity features count INTENTS, not
        // retries. Rule: an event < DebounceGapUs after the PREVIOUS event
        // of its key (kept or not — the lag form, deterministic and
        // window-expressible; a kept-anchored form needs a sequential scan)
        // is a bounce. Output: per-key arrival vs post-debounce counts.
        //
        // 100 TB shape: ONE shuffle, keyed by the (user, type) partition
        // key the window needs anyway, then a partial+final count on the
        // same key — the q57/q66 accepted per-entity-window shape; per-key
        // row counts are user-activity-bounded, never corpus-wide. Ties
        // are totally ordered by (us, event_id), so the lag is
        // deterministic under any partitioning (PlanSpec pin on the
        // window key).
        val ev = Tables.events(s, dir).withColumn("us", expr("ts_ns div 1000"))
        val w = Window.partitionBy("user_id", "event_type").orderBy("us", "event_id")
        ev.withColumn("gap", col("us") - lag("us", 1).over(w))
          .withColumn("bounced",
            when(col("gap").isNotNull && col("gap") < DebounceGapUs, 1L).otherwise(0L))
          .groupBy("user_id", "event_type")
          .agg(count(lit(1)).as("n_events"), sum("bounced").as("n_dropped"))
          .withColumn("n_kept", col("n_events") - col("n_dropped"))
          .select("user_id", "event_type", "n_events", "n_kept", "n_dropped")
          .orderBy("user_id", "event_type")
      },
      Some(s"""WITH g AS (
              |  SELECT user_id, event_type,
              |         epoch_us(ts) - lag(epoch_us(ts)) OVER (
              |           PARTITION BY user_id, event_type
              |           ORDER BY epoch_us(ts), event_id) AS gap
              |  FROM events)
              |SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n_events,
              |       CAST(count(*) - sum(CASE WHEN gap IS NOT NULL AND gap < $DebounceGapUs
              |                                THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
              |       CAST(sum(CASE WHEN gap IS NOT NULL AND gap < $DebounceGapUs
              |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped
              |FROM g GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin))
,
    // ── Ingestion-completeness audit: day gaps per event type ──
    QueryDef(
      "q125_ingest_gaps",
      (s, dir) => {
        // The "did the feed skip a day" monitor: per (event_type, day),
        // arrival counts plus the gap to the type's PREVIOUS active day —
        // gap_days > 1 marks a hole (a dead upstream, a dropped
        // partition) that silently biases any time-sliced training mix.
        //
        // 100 TB shape: the corpus collapses FIRST to the types × days
        // partial+final aggregate; the lag window runs over THAT bounded
        // frame keyed by type (the q109 agg-under-window shape, PlanSpec
        // pin). Day is epoch-derived integer arithmetic — portable, no
        // timestamp emitted.
        val daily = Tables.events(s, dir)
          .groupBy(col("event_type"), expr("ts_ns div 86400000000000").as("day"))
          .agg(count(lit(1)).as("c"))
        val w = Window.partitionBy("event_type").orderBy("day")
        daily.select(col("event_type"), col("day"), col("c"),
            (col("day") - lag("day", 1).over(w)).as("gap_days"))
          .withColumn("is_gap",
            when(col("gap_days").isNotNull && col("gap_days") > 1, 1).otherwise(0))
          .orderBy("event_type", "day")
      },
      Some("""WITH daily AS (
             |  SELECT event_type, epoch_us(ts) // 86400000000 AS day, CAST(count(*) AS BIGINT) AS c
             |  FROM events GROUP BY 1, 2)
             |SELECT event_type, day, c,
             |       day - lag(day) OVER (PARTITION BY event_type ORDER BY day) AS gap_days,
             |       CASE WHEN day - lag(day) OVER (PARTITION BY event_type ORDER BY day) > 1
             |            THEN 1 ELSE 0 END AS is_gap
             |FROM daily ORDER BY event_type, day""".stripMargin))
  )

  /** Bounded-state approximate quantiles per group, at arbitrary ranks:
    * the generalization of `TextOps.histMedianThr` from p=50 over [0,1] to
    * any percentile list over any value range (VERDICT r4/r5 "what's
    * wrong #1" fix).
    *
    * Two scan-speed passes: (1) per-group min/max (partial+final agg,
    * broadcast back — the group frame is dashboard-sized); (2) equi-width
    * K-bucket counts, again partial+final. The per-group histogram
    * (≤ K rows) then yields quantile_p = lower edge of the bucket holding
    * the rank-⌈p·n/100⌉ order statistic, so the true order statistic lies
    * in [q_p, q_p + (mx−mn)/K) — the accuracy contract ApproxQuantileSpec
    * pins. State never exceeds groups × K counters at ANY corpus size, vs
    * exact `percentile` whose buffer holds every distinct value.
    *
    * Determinism: bucket index and edge reconstruction use only IEEE
    * add/sub/mul/div on exact inputs — bit-identical across engines, so
    * the result is hash-comparable to an independent SQL oracle (a GK /
    * KLL / t-digest sketch is not). Output: (group, q<p>...) one column
    * per requested percentile. */
  def histQuantiles(rows: DataFrame, groupCol: String, valueCol: String,
      pcts: Seq[Int]): DataFrame = {
    require(pcts.nonEmpty && pcts.forall(p => p >= 1 && p <= 100),
      s"percentiles must be integral in [1,100]: $pcts")
    val K = QuantK
    val v = col(valueCol)
    val ranges = rows.groupBy(groupCol).agg(min(v).as("mn"), max(v).as("mx"))
    val hist = rows.join(broadcast(ranges), Seq(groupCol))
      .withColumn("b", when(col("mx") === col("mn"), lit(0L)).otherwise(
        least(floor((v - col("mn")) / (col("mx") - col("mn")) * K), lit(K - 1L))))
      .groupBy(col(groupCol), col("mn"), col("mx"), col("b"))
      .agg(count(lit(1)).as("c"))
    val wc = Window.partitionBy(groupCol).orderBy("b")
      .rowsBetween(Window.unboundedPreceding, 0)
    val hcum = hist
      .withColumn("cum", sum("c").over(wc))
      .withColumn("n", sum("c").over(Window.partitionBy(groupCol)))
    val bs = pcts.map { p =>
      min(when(col("cum") >= expr(s"(n * $p + 99) div 100"), col("b"))).as(s"b$p")
    }
    hcum.groupBy(col(groupCol), col("mn"), col("mx"))
      .agg(bs.head, bs.tail: _*)
      .select(col(groupCol) +: pcts.map { p =>
        (col("mn") + col(s"b$p") * (col("mx") - col("mn")) / K).as(s"q$p")
      }: _*)
  }

  /** Sketch-only quantile surface: Spark's mergeable Greenwald-Khanna
    * `approx_percentile`, O(accuracy · log n) state, and — the point — NO
    * exact Percentile aggregate anywhere in its plan (both pinned by
    * ApproxQuantileSpec). The sketch's rank-error guarantee (≤ n/accuracy
    * ranks) is cross-checked against exact order statistics in the spec at
    * test scale; at 100 TB only this sketch side ever runs. Not oracled:
    * GK merge results are engine- and merge-order-specific, so a DuckDB
    * hash comparison would be meaningless — `histQuantiles` (q76) is the
    * deterministic oracled twin. */
  def approxQuantileSketch(rows: DataFrame, groupCol: String,
      valueCol: String, probs: Seq[Double], accuracy: Int = 10000): DataFrame =
    rows.groupBy(groupCol).agg(
      expr(s"approx_percentile($valueCol, array(${probs.mkString(", ")}), $accuracy)")
        .as("qs"))
}
