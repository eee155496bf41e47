package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Dataset-maintenance operators. The reference's only maintenance verbs
  * are truncate/reload (cve_manager.py's -tr path); a lake-scale engine
  * also needs COMPACTION: streaming sinks and fine-grained ingest leave
  * thousands of small part files per partition, and at 100 TB the file
  * count — not the bytes — becomes the scan bottleneck (driver-side
  * listing, per-file open cost, tiny row groups defeating column pruning).
  */
object Maintenance {

  /** Compact a parquet dataset directory to ~`targetBytes` output files.
    *
    * Sizing comes from the file inventory (sum of part-file lengths), the
    * rewrite is a `coalesce` — NO shuffle: coalesce only merges input
    * splits, so compaction costs one read + one write of the data, the
    * floor for any rewrite. Data lands in a staging dir first and is
    * swapped in afterwards, so a crash mid-write leaves the original
    * intact; the swap itself (delete originals + rename staged files) is
    * not transactional — production tables would layer a table format's
    * commit protocol on top, the operator here is the rewrite engine
    * underneath it.
    *
    * Returns (partFilesBefore, partFilesAfter). */
  def compactParquet(spark: SparkSession, dir: String, targetBytes: Long): (Int, Int) = {
    require(targetBytes > 0, "targetBytes must be positive")
    val p = new Path(dir)
    // Raw FS: same ChecksumFileSystem ':'/crc-shadow hazard as
    // Warehouse.writeSingleCsv, and crc shadows of deleted parts would
    // otherwise linger next to the swapped-in files.
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration) match {
      case c: org.apache.hadoop.fs.ChecksumFileSystem => c.getRawFileSystem
      case f => f
    }
    def parts() = fs.listStatus(p)
      .filter(s => s.isFile && s.getPath.getName.startsWith("part-"))
    val before = parts()
    // A partition-dir layout has NO top-level part files; reading through
    // it and renaming staged files into the root would flatten the
    // partition columns into a corrupt mixed layout. Compact each leaf
    // partition directory individually instead.
    require(before.nonEmpty,
      s"$dir has no top-level part files (partitioned layout or empty); " +
        "compact leaf partition directories individually")
    val total = before.map(_.getLen).sum
    val n = math.max(1, math.ceil(total.toDouble / targetBytes).toInt)
    val staging = new Path(dir + ".compact-staging")
    fs.delete(staging, true)
    // Executes the read fully into staging BEFORE any original is touched.
    spark.read.parquet(dir).coalesce(n)
      .write.mode(SaveMode.Overwrite).parquet(staging.toString)
    before.foreach(s => fs.delete(s.getPath, false))
    fs.listStatus(staging)
      .filter(_.getPath.getName.startsWith("part-"))
      .foreach { s =>
        val dest = new Path(p, s.getPath.getName)
        require(fs.rename(s.getPath, dest), s"rename ${s.getPath} -> $dest failed")
      }
    fs.delete(staging, true)
    (before.length, parts().length)
  }

  /** Compact every LEAF partition directory of a partition-dir dataset
    * (`lang=en/`, `year=2024/month=1/`, ...) independently — partition
    * values stay directory-encoded, so each leaf is just a flat parquet
    * dir and `compactParquet` applies as-is. Driver-side recursion is one
    * `listStatus` per directory (the same cost any scan's file index
    * pays); the rewrites themselves are per-leaf Spark jobs, so partition
    * count scales the number of small jobs, never one job's size.
    *
    * Returns (partFilesBefore, partFilesAfter) summed over leaves. */
  /** Bits per dimension for `zorderWrite` (256 equi-depth buckets). */
  val ZBits = 8

  /** Multi-dimensional data-layout clustering — the OPTIMIZE ZORDER BY
    * shape. Rewrites `df` into `nFiles` parquet files clustered on the
    * interleaved-bit z-value of two columns, so file-level min/max stats
    * prune selective predicates on EITHER dimension (a layout sorted by
    * one column prunes only that column: any predicate on the other hits
    * every file). Bucket ids are EQUI-DEPTH (approxQuantile boundaries —
    * robust to skew, where linear min/max scaling would starve the dense
    * range); z interleaves the two 8-bit ids, then the write
    * range-partitions + sorts by z — each output file covers one compact
    * z-range, i.e. a small rectangle of (ca, cb) space.
    *
    * Scale: the quantile pass is one approx-sketch aggregation; the
    * rewrite is one range-shuffle + local sort, the floor for any
    * re-layout. At 100 TB this runs per partition (compose with
    * `compactPartitioned`'s leaf walk) rather than corpus-wide.
    * ZorderSpec measures the pruning claim by footer stats: the z layout
    * admits strictly fewer files than a single-sorted layout for box and
    * cross-dimension predicates. */
  def zorderWrite(df: DataFrame, ca: String, cb: String, dir: String,
      nFiles: Int): Unit = {
    val qs = (1 until (1 << ZBits)).map(_.toDouble / (1 << ZBits)).toArray
    def bucket(c: String): Column = {
      val bounds = df.stat.approxQuantile(c, qs, 0.001).toSeq
      aggregate(typedlit(bounds), lit(0L),
        (acc, b) => acc + when(col(c).cast("double") >= b, 1L).otherwise(0L))
    }
    df.withColumn("_za", bucket(ca)).withColumn("_zb", bucket(cb))
      .withColumn("_zv", expr(
        s"""aggregate(sequence(0, ${ZBits - 1}), 0L, (acc, i) ->
           |  acc + shiftleft(cast(shiftright(_za, i) & 1 AS bigint), 2 * i + 1)
           |      + shiftleft(cast(shiftright(_zb, i) & 1 AS bigint), 2 * i))""".stripMargin))
      .repartitionByRange(nFiles, col("_zv"))
      .sortWithinPartitions("_zv")
      .drop("_za", "_zb", "_zv")
      .write.mode(SaveMode.Overwrite).parquet(dir)
  }

  def compactPartitioned(spark: SparkSession, dir: String, targetBytes: Long): (Int, Int) = {
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def leaves(p: Path): Seq[Path] = {
      val children = fs.listStatus(p)
      val dirs = children.filter(_.isDirectory).map(_.getPath)
        .filterNot(_.getName.endsWith(".compact-staging"))
      if (dirs.isEmpty) Seq(p)
      else dirs.toIndexedSeq.flatMap(leaves)
    }
    val results = leaves(root)
      .filter(l => fs.listStatus(l).exists(s =>
        s.isFile && s.getPath.getName.startsWith("part-")))
      .map(l => compactParquet(spark, l.toString, targetBytes))
    (results.map(_._1).sum, results.map(_._2).sum)
  }
}
