package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine operator exposed through the driver contract
  * (SparkEntry.queries / SparkEntry.oracleSql).
  *
  * @param name   stable key, `qNN_description`
  * @param impl   (session, testdata dir) => result DataFrame. Every impl ends
  *               in an explicit total-order `orderBy` (SURVEY.md §7.4(6)) so
  *               the driver's hash compare is deterministic.
  * @param oracle equivalent DuckDB SQL over views named after the parquet
  *               tables, or None for ops not expressible in SQL (driver then
  *               records a weaker rows-only check).
  */
final case class QueryDef(
    name: String,
    impl: (SparkSession, String) => DataFrame,
    oracle: Option[String])
