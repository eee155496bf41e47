package graft

import graft.operators.Dedup

/** Corpus-snapshot workflow CLI — the production surface for the
  * q101/q104 family (the lake-scale analogue of the reference's
  * truncate-and-reload refresh, cve_manager.py:335-360, replaced here by
  * audited incremental snapshots):
  *
  *   sbt "runMain graft.Snapshot write <docsDir> <snapDir>"
  *   sbt "runMain graft.Snapshot diff  <snapDirA> <snapDirB>"
  *   sbt "runMain graft.Snapshot apply <snapDir> <changesDir> <outSnapDir>"
  *
  * `write` digests a documents directory into a bucketed-by-doc_id
  * manifest (`Dedup.writeSnapshot` — one shuffle paid at write time so
  * every later diff/apply pays none on the snapshot side). `diff` is the
  * nightly refresh audit: per-(source, status) counts between two at-rest
  * manifests, exchange-free on the join (SnapshotDiffSpec). `apply`
  * MERGEs a CDC changeset parquet — rows (doc_id, source, h, op) with op
  * upsert|delete — into a manifest and writes the result as a NEW
  * bucketed manifest (never in place: a crash mid-apply leaves the
  * source snapshot intact, and the output re-buckets for the next cycle).
  * Each mode prints one JSON summary line.
  */
object Snapshot {

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val spark = Sessions.builder(s"local[$cpus]", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    println(run(spark, args.toList))
    spark.stop()
  }

  /** Runs one mode; returns the JSON summary line (testable seam). */
  def run(spark: org.apache.spark.sql.SparkSession, args: List[String]): String =
    args match {
      case "write" :: docsDir :: snapDir :: Nil =>
        val docs = spark.read.parquet(s"$docsDir/documents.parquet")
        val name = tableName(snapDir)
        Dedup.writeSnapshot(docs, name, snapDir)
        val n = spark.table(name).count()
        s"""{"mode":"write","docs":$n,"snapshot":"$snapDir"}"""

      case "diff" :: dirA :: dirB :: Nil =>
        val rows = Dedup.snapshotDiff(spark, dirA, dirB).collect()
        val cells = rows.map(r =>
          s"""{"source":"${r.getString(0)}","status":"${r.getString(1)}","n":${r.getLong(2)}}""")
        val changed = rows.filter(_.getString(1) != "unchanged").map(_.getLong(2)).sum
        s"""{"mode":"diff","changed_docs":$changed,"cells":[${cells.mkString(",")}]}"""

      case "apply" :: snapDir :: changesDir :: outDir :: Nil =>
        val name = tableName(snapDir)
        Dedup.registerSnapshot(spark, name, snapDir)
        val changes = spark.read.parquet(changesDir)
        val applied = Dedup.applyChangeset(spark.table(name), changes)
        val outName = tableName(outDir)
        Dedup.writeDigest(applied, outName, outDir)
        val n = spark.table(outName).count()
        val nc = changes.count()
        s"""{"mode":"apply","changes":$nc,"docs_out":$n,"snapshot":"$outDir"}"""

      case other => sys.error(s"usage: write|diff|apply ... (got $other)")
    }

  /** Stable catalog name per directory (same derivation as snapshotDiff's
    * internal registrations, so repeated runs re-register cleanly). */
  private def tableName(dir: String): String =
    s"graft_snap_cli_${(dir.hashCode.toLong & 0xffffffffL).toHexString}"
}
