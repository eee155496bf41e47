package graft.cve

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's five query families (cve_manager.py:387-577) as pure
  * DataFrame functions over the flattened warehouse. All predicates are
  * typed Column expressions (the reference concatenated user input into SQL
  * strings — an injection-prone artifact, not semantics; SURVEY.md §2.2).
  */
object Queries {

  /** EP2 point report, statement 1 (cve_manager.py:400): the 10 cvss report
    * fields for CVEs whose id contains `cveArg`. */
  def byCve(cvss: DataFrame, cveArg: String): DataFrame =
    cvss.filter(col("cve").contains(cveArg))
      .select("cve", "vector_string_3", "base_score_3", "base_severity_3",
        "vector_string", "base_score", "severity", "description",
        "published_date", "last_modified_date")

  /** EP2 statement 2 (cve_manager.py:411): weakness labels for a CVE. */
  def problemsFor(problems: DataFrame, cveArg: String): DataFrame =
    problems.filter(col("cve").contains(cveArg))

  /** EP2 last statement (cve_manager.py:424): vulnerable platform URIs. */
  def cpesFor(cpe: DataFrame, cveArg: String): DataFrame =
    cpe.filter(col("cve").contains(cveArg) && col("vulnerable") === "True")
      .select("cpe23uri")

  /** The J2 lookup join (cve_manager.py:411-423): strip the `{C,W,E,-}`
    * char-set prefix (lstrip semantics — `NVD-CWE-noinfo` survives intact,
    * SURVEY.md §7.4(3)), look up all-digit keys in the cwe dimension, fall
    * back to the raw label. The reference's N+1 round-trips collapse into
    * one broadcast-hash join (cwe ≈ 1k rows — always broadcast). */
  def cweLookup(problems: DataFrame, cwe: DataFrame): DataFrame = {
    val stripped = regexp_replace(col("problem"), "^[CWE-]+", "")
    problems
      .withColumn("cwe_key",
        when(stripped.rlike("^[0-9]+$"), stripped.cast("int")))
      .join(broadcast(cwe.select(col("cwe_id").as("cwe_key"), col("name"))),
        Seq("cwe_key"), "left")
      .select(col("cve"), col("problem"),
        coalesce(col("name"), col("problem")).as("resolved"))
  }

  /** Score/date listing (cve_manager.py:430-448): inclusive disjunctive
    * threshold over both score generations (nulls drop out of the OR),
    * optional inclusive date floor. */
  def byScoreDate(cvss: DataFrame, score: Double, date: Option[String]): DataFrame = {
    val scored = cvss.filter(
      col("base_score_3") >= score || col("base_score") >= score)
    date.fold(scored) { dt =>
      val floored = scored.filter(col("published_date") >= to_date(lit(dt)))
      // Redundant-but-implied year predicate: on the pub_year-partitioned
      // warehouse table it becomes a static partition filter (whole year
      // directories pruned at planning time); on unpartitioned frames it's
      // a no-op the optimizer folds away.
      if (cvss.columns.contains("pub_year"))
        floored.filter(col("pub_year") >= year(to_date(lit(dt))))
      else floored
    }.select("cve", "base_score_3", "vector_string_3", "base_score",
      "vector_string", "published_date")
  }

  /** EP3 (cve_manager.py:475-530): filtered listing over the cvss_vs_cpes
    * view. Catalyst pushes the cpe23uri substring below the join to the cpe
    * side and the score/date predicates to the cvss side. */
  def byCpe(view: DataFrame, cpeArg: String, score: Double,
      date: Option[String]): DataFrame = {
    val base = view.filter(
      col("cpe23uri").contains(cpeArg) &&
        (col("base_score_3") >= score || col("base_score") >= score))
    date.fold(base)(dt => base.filter(col("published_date") >= to_date(lit(dt))))
      .select("cpe23uri", "cve", "base_score_3", "base_score", "published_date")
  }

  /** CWE info point lookup (cve_manager.py:533-577): all 7 catalog columns. */
  def byCwe(cwe: DataFrame, id: Int): DataFrame =
    cwe.filter(col("cwe_id") === id)
}
