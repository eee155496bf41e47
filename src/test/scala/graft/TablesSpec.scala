package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampType}
import org.scalatest.funsuite.AnyFunSuite

/** Pins the events-loader contract across testdata generations: `events.ts`
  * has shipped as parquet TIMESTAMP(NANOS) (reads as bigint under the
  * session's nanosAsLong conf) and TIMESTAMP(MICROS) (reads as a timestamp).
  * Tables.events must expose the SAME `(ts timestamp, ts_ns bigint)` shape
  * for either — the round-7 driver run broke 11 queries when the generation
  * switched and the loader assumed the nanos shape. */
class TablesSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("events exposes (ts timestamp, ts_ns bigint) on the on-disk generation") {
    val ev = Tables.events(spark, dir)
    assert(ev.schema("ts").dataType === TimestampType)
    assert(ev.schema("ts_ns").dataType === LongType)
    // ts and ts_ns describe the same instant: micros(ts) * 1000 == ts_ns
    // when the file is MICROS; ts == truncation of ts_ns when NANOS.
    val bad = ev.filter(expr("unix_micros(ts) != ts_ns div 1000")).count()
    assert(bad === 0L)
    assert(ev.filter(col("ts_ns").isNull || col("ts").isNull).count() === 0L)
  }

  test("events epochs are non-negative (div-vs-floor bucket contract)") {
    // Day/hour/gap buckets pair Spark `div` (truncates toward zero) with
    // DuckDB `//` (floors) — identical only for ts_ns >= 0. A testdata
    // regeneration with pre-1970 instants must fail HERE, by name, rather
    // than as an off-by-one-day hash mismatch in q115/q125 (ADVICE r9).
    val minNs = Tables.events(spark, dir).agg(min("ts_ns")).head().getLong(0)
    assert(minNs >= 0L,
      s"events.ts_ns has pre-1970 instants (min=$minNs): div/floor bucketing " +
        "diverges between Spark and DuckDB on negative epochs")
  }

  test("events handles the bigint-ts generation (nanos read shape) identically") {
    // Stage an events.parquet whose ts is a raw int64 — byte-for-byte what a
    // TIMESTAMP(NANOS) file looks like to a nanosAsLong session. Include a
    // sub-microsecond remainder so truncation (not rounding) is pinned.
    val tmp = java.nio.file.Files.createTempDirectory("graft-evgen").toString
    val src = Tables.events(spark, dir).limit(1000)
      .select(col("event_id"), (col("ts_ns") + lit(777L)).as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
    src.write.parquet(s"$tmp/events.parquet")

    val ev = Tables.events(spark, tmp)
    assert(ev.schema("ts").dataType === TimestampType)
    assert(ev.schema("ts_ns").dataType === LongType)
    // exact nanos preserved, ts is the micros-floor of ts_ns
    val bad = ev.filter(expr("ts_ns % 1000 != 777 or unix_micros(ts) != ts_ns div 1000"))
      .count()
    assert(bad === 0L)
    assert(ev.count() === 1000L)
  }

  test("events handles a tz-adjusted TIMESTAMP generation (third plausible shape)") {
    // A generator switch to tz-adjusted micros (isAdjustedToUTC=true — also
    // how legacy INT96 surfaces) reads back as TimestampType, not NTZ. The
    // loader must take the micros branch, not fall through to an error.
    val tmp = java.nio.file.Files.createTempDirectory("graft-evtz").toString
    Tables.events(spark, dir).limit(500)
      .select(col("event_id"), col("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
      .write.parquet(s"$tmp/events.parquet")
    val ev = Tables.events(spark, tmp)
    assert(ev.schema("ts").dataType === TimestampType)
    assert(ev.schema("ts_ns").dataType === LongType)
    assert(ev.filter(expr("unix_micros(ts) != ts_ns div 1000")).count() === 0L)
    assert(ev.count() === 500L)
  }

  test("an unknown events.ts generation fails loudly with a named error") {
    // r7 lesson: a silent fallback branch turns a testdata regeneration into
    // quietly-wrong queries. A FOURTH generation (here: ts as string) must
    // fail at load with an actionable message, not mis-normalize.
    val tmp = java.nio.file.Files.createTempDirectory("graft-evbad").toString
    Tables.events(spark, dir).limit(10)
      .select(col("event_id"), col("ts").cast("string").as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
      .write.parquet(s"$tmp/events.parquet")
    val e = intercept[RuntimeException] { Tables.events(spark, tmp) }
    assert(e.getMessage.contains("unsupported type"))
    assert(e.getMessage.contains("normalizeEventsTs"))
  }

  test("schema cache invalidates when the file is regenerated in-JVM") {
    // The exact r7 drift scenario under a long-lived JVM: the same path is
    // regenerated with a DIFFERENT ts generation; the loader must branch on
    // the fresh footer, not the cached one.
    val tmp = java.nio.file.Files.createTempDirectory("graft-evregen").toString
    val src = Tables.events(spark, dir).limit(100)
    src.select(col("event_id"), col("ts_ns").as("ts"), col("user_id"),
        col("event_type"), col("value"), col("props"))
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    assert(Tables.events(spark, tmp).filter(col("ts_ns") % 1000 =!= 0).count() >= 0L)
    Thread.sleep(1100) // ensure a distinct directory mtime across FS granularities
    src.select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"), col("props"))
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val ev2 = Tables.events(spark, tmp)
    assert(ev2.schema("ts").dataType === TimestampType)
    assert(ev2.count() === 100L)
    assert(ev2.filter(expr("unix_micros(ts) != ts_ns div 1000")).count() === 0L)
  }
}
