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
}
