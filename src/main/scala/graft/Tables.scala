package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver testdata (TESTDATA.md): TPC-H-ish parquet tables at
  * `/root/testdata/sf{0.001,0.01,0.1}/<name>.parquet`.
  *
  * Scale posture: plain `spark.read.parquet` keeps the scan declarative so
  * Catalyst pushes filters/projections into the parquet reader
  * (`PushedFilters`/`ReadSchema`); at cluster scale the same call fans out to
  * one task per row-group split with the vectorized reader.
  */
object Tables {

  /** Parquet footer schemas, inferred once per path+mtime then reused: every
    * `spark.read.parquet` without an explicit schema launches a footer-read
    * job at DATAFRAME CONSTRUCTION time, so each catalog query paid one
    * driver-side job before its real action (JobCountSpec pins the zero-job
    * contract). The key carries the file's MODIFICATION TIME (one cheap
    * driver-side FS stat, no Spark job), so a testdata regeneration under a
    * long-lived JVM — the exact drift that broke the r7 driver run when
    * `events.ts` switched parquet types — invalidates the entry instead of
    * branching on the stale generation's footer. */
  private val schemaCache =
    scala.collection.concurrent.TrieMap.empty[String, org.apache.spark.sql.types.StructType]

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    val hp = new org.apache.hadoop.fs.Path(path)
    val mtime = hp.getFileSystem(spark.sessionState.newHadoopConf())
      .getFileStatus(hp).getModificationTime
    val schema = schemaCache.getOrElseUpdate(s"$path@$mtime",
      spark.read.parquet(path).schema)
    spark.read.schema(schema).parquet(path)
  }

  /** `events.ts` has shipped as BOTH parquet TIMESTAMP(NANOS) and
    * TIMESTAMP(MICROS) across testdata generations, so the loader branches on
    * the footer type instead of assuming either:
    *   - NANOS reads as a raw bigint under the session's
    *     `spark.sql.legacy.parquet.nanosAsLong=true` (set once in
    *     Sessions.builder; without it the scan fails [PARQUET_TYPE_ILLEGAL]);
    *   - MICROS (no tz) reads as TIMESTAMP_NTZ — normalized to TimestampType
    *     under the UTC session, then `ts_ns = unix_micros(ts) * 1000`, which
    *     is bit-identical to DuckDB's `epoch_ns(ts)` on the same file.
    * Either way the exposed shape is the same:
    *   - `ts_ns` — exact epoch nanos (bigint), used for all comparisons so
    *     Spark-side semantics match an engine (DuckDB) that keeps full nanos;
    *   - `ts`   — TimestampType (micros precision) for calendar ops.
    *
    * CONTRACT: `ts_ns >= 0` (post-1970 instants). Every day/hour/gap bucket
    * downstream pairs Spark `div` (truncates toward zero) with DuckDB `//`
    * (floors) — identical ONLY on non-negative operands; a pre-1970
    * timestamp would silently bucket one day apart between engines
    * (ADVICE r9 on q115/q125). TablesSpec pins min(ts_ns) >= 0 on the
    * on-disk generation so a testdata regeneration that violates the
    * assumption fails a named spec instead of a hash compare.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    require(spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") == "true",
      "build the session via graft.Sessions (needs spark.sql.legacy.parquet.nanosAsLong=true)")
    normalizeEventsTs(load(spark, dir, "events"))
  }

  /** Normalizes a raw events frame to the `(ts timestamp, ts_ns bigint)`
    * contract, branching on the footer-derived type of `ts`. ONE definition
    * shared with `Streams.readEventsStream` so batch and streaming can't
    * drift. An UNKNOWN type fails loudly with a named error — the r7 driver
    * run taught us a silent fallback branch turns a testdata regeneration
    * into 11 quietly-wrong queries; a third generation must fail with an
    * actionable message instead (TablesSpec pins this). */
  def normalizeEventsTs(raw: DataFrame): DataFrame =
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => // TIMESTAMP(NANOS) as bigint
        raw.withColumnRenamed("ts", "ts_ns")
          .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
      // TIMESTAMP(MICROS): NTZ (no-tz annotation) or tz-adjusted (also how
      // legacy INT96 surfaces). Under the UTC session both cast losslessly.
      case org.apache.spark.sql.types.TimestampNTZType |
           org.apache.spark.sql.types.TimestampType =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
          .withColumn("ts_ns", expr("unix_micros(ts) * 1000"))
      case other => sys.error(
        s"events.ts has unsupported type $other: known generations are " +
          "TIMESTAMP(NANOS) (bigint under nanosAsLong) and TIMESTAMP(MICROS) " +
          "(ntz or tz-adjusted, incl. legacy INT96). The testdata generator " +
          "changed again — extend Tables.normalizeEventsTs for the new type.")
    }

  /** Embeddings with the vector cast float->double once, up front, so all
    * downstream arithmetic is double-precision (bit-compatible with a
    * double-math oracle; float32 promotion is exact). */
  def embeddings(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"), col("label"))
}
