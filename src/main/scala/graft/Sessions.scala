package graft

import org.apache.spark.sql.SparkSession

/** Single place where harness sessions are built, so session-wide config
  * (timezone, shuffle partitions, the events-table nanos conf) is set once at
  * construction instead of mutated mid-flight by loaders.
  */
object Sessions {

  /** Session-wide configs every entry point needs:
    *   - UTC so date math is engine-portable;
    *   - `nanosAsLong`: `events.ts` is parquet TIMESTAMP(NANOS), which the
    *     vectorized reader otherwise rejects ([PARQUET_TYPE_ILLEGAL]); reading
    *     it as a raw bigint keeps exact nanos (see Tables.events).
    */
  def builder(master: String, shufflePartitions: Int): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")

  def local(cpus: Int): SparkSession = builder(s"local[$cpus]", cpus).getOrCreate()

  /** CLI sessions persist the catalog across JVM invocations via the Hive
    * metastore (Derby under the working dir) — the in-memory catalog keeps
    * table data files but loses the metadata at JVM exit. */
  def localWithCatalog(cpus: Int): SparkSession =
    builder(s"local[$cpus]", cpus).enableHiveSupport().getOrCreate()
}
