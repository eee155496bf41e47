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

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's parquet reader
    * rejects outright ([PARQUET_TYPE_ILLEGAL]). The session must be built with
    * `spark.sql.legacy.parquet.nanosAsLong=true` (set once at construction in
    * Sessions.builder — not mutated here, so reads are order-independent):
    *   - `ts_ns` — exact epoch nanos (bigint), used for all comparisons so
    *     Spark-side semantics match an engine (DuckDB) that keeps full nanos;
    *   - `ts`   — micros-truncated TimestampType for calendar ops.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    require(spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") == "true",
      "build the session via graft.Sessions (needs spark.sql.legacy.parquet.nanosAsLong=true)")
    load(spark, dir, "events")
      .withColumnRenamed("ts", "ts_ns")
      .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
  }

  /** Embeddings with the vector cast float->double once, up front, so all
    * downstream arithmetic is double-precision (bit-compatible with a
    * double-math oracle; float32 promotion is exact). */
  def embeddings(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"), col("label"))
}
