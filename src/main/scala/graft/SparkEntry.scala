package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{Audit, CveOps, Dedup, Eval, Maintenance, Merkle, Multimodal, Relational, Temporal, TextOps, Vectors}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator from SURVEY.md §2 (plus the training-data-pipeline
  * extensions) is one `QueryDef` in the operator modules; this object just
  * aggregates them into the maps the driver consumes.
  */
object SparkEntry {

  /** All registered operators, in catalog order. */
  val all: Seq[QueryDef] =
    Relational.defs ++ Temporal.defs ++ Dedup.defs ++ TextOps.defs ++
      Vectors.defs ++ Multimodal.defs ++ Eval.defs ++ Audit.defs ++
      Merkle.defs ++ Maintenance.defs ++ CveOps.defs

  // toMap would silently drop a duplicated qNN name (and its correctness
  // row); fail fast instead.
  require(all.map(_.name).distinct.size == all.size,
    s"duplicate query names: ${all.map(_.name).diff(all.map(_.name).distinct).mkString(", ")}")

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * EP3 shape: filtered join view (SURVEY.md §3). */
  def entry(spark: SparkSession): DataFrame =
    Relational.joinView(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(d => d.name -> d.impl).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.collect { case QueryDef(n, _, Some(sql)) => n -> sql }.toMap
}
