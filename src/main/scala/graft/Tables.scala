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

  /** Parquet footer schemas, inferred once per path then reused: every
    * `spark.read.parquet` without an explicit schema launches a footer-read
    * job at DATAFRAME CONSTRUCTION time, so each catalog query paid one
    * driver-side job before its real action (JobCountSpec pins the zero-job
    * contract). Keyed by path — a different sf dir infers fresh. */
  private val schemaCache =
    scala.collection.concurrent.TrieMap.empty[String, org.apache.spark.sql.types.StructType]

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    val schema = schemaCache.getOrElseUpdate(path, spark.read.parquet(path).schema)
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
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    require(spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") == "true",
      "build the session via graft.Sessions (needs spark.sql.legacy.parquet.nanosAsLong=true)")
    val raw = load(spark, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => // TIMESTAMP(NANOS) as bigint
        raw.withColumnRenamed("ts", "ts_ns")
          .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
      case _ => // TIMESTAMP(MICROS): TIMESTAMP_NTZ or TIMESTAMP
        raw.withColumn("ts", col("ts").cast("timestamp"))
          .withColumn("ts_ns", expr("unix_micros(ts) * 1000"))
    }
  }

  /** Embeddings with the vector cast float->double once, up front, so all
    * downstream arithmetic is double-precision (bit-compatible with a
    * double-math oracle; float32 promotion is exact). */
  def embeddings(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"), col("label"))
}
