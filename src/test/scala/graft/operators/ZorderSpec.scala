package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SharedSpark, Tables}

/** `Maintenance.zorderWrite`'s pruning claim, measured by footer stats: a
  * layout sorted by ONE column prunes only that column (any predicate on
  * the other dimension intersects every file's min/max), while the
  * z-ordered layout keeps each file to a small rectangle of the 2-D value
  * space, so file-level stats prune selective predicates on EITHER
  * dimension. The file census below is exactly what a parquet reader's
  * row-group/file skipping evaluates. */
class ZorderSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  private val dir = "/root/testdata/sf0.01"
  private val NFiles = 16

  private def partFiles(d: String): Seq[java.io.File] =
    new java.io.File(d).listFiles().toSeq
      .filter(f => f.isFile && f.getName.startsWith("part-"))

  /** Files whose [min, max] on `c` intersects [lo, hi] — the set a
    * stats-pruning scan must open. */
  private def filesHit(d: String, c: String, lo: Double, hi: Double): Int =
    partFiles(d).count { f =>
      val r = spark.read.parquet(f.getPath)
        .agg(min(col(c)).cast("double"), max(col(c)).cast("double")).head()
      !(r.getDouble(1) < lo || r.getDouble(0) > hi)
    }

  test("z-order prunes BOTH dimensions; a single-sorted layout prunes one") {
    val base = java.nio.file.Files.createTempDirectory("graft-zorder")
    val ev = Tables.events(spark, dir).select(col("user_id"), col("value"))

    val linear = s"$base/linear"
    ev.repartitionByRange(NFiles, col("user_id"))
      .sortWithinPartitions("user_id")
      .write.parquet(linear)
    val zdir = s"$base/z"
    Maintenance.zorderWrite(ev, "user_id", "value", zdir, NFiles)

    // Content parity: the re-layout moved rows, never changed them.
    val (n0, s0) = { val r = ev.agg(count(lit(1)), sum("value")).head()
      (r.getLong(0), r.getDouble(1)) }
    val rz = spark.read.parquet(zdir).agg(count(lit(1)), sum("value")).head()
    assert(rz.getLong(0) === n0)
    assert(math.abs(rz.getDouble(1) - s0) < 1e-6 * math.abs(s0))

    // Middle-eighth box on each dimension.
    val mm = ev.agg(min("user_id").cast("double"), max("user_id").cast("double"),
      min("value"), max("value")).head()
    def eighth(lo: Double, hi: Double): (Double, Double) = {
      val w = hi - lo; (lo + w * 7 / 16, lo + w * 9 / 16)
    }
    val (uLo, uHi) = eighth(mm.getDouble(0), mm.getDouble(1))
    val (vLo, vHi) = eighth(mm.getDouble(2), mm.getDouble(3))

    val nLin = partFiles(linear).size
    val nZ = partFiles(zdir).size
    // The user-sorted layout cannot prune a value predicate: every file
    // spans ~the full value range.
    assert(filesHit(linear, "value", vLo, vHi) === nLin,
      "fixture violates the premise — value should be uncorrelated with user order")
    // The z layout prunes BOTH single-dimension predicates...
    val zU = filesHit(zdir, "user_id", uLo, uHi)
    val zV = filesHit(zdir, "value", vLo, vHi)
    assert(zU < nZ, s"z layout did not prune user_id ($zU of $nZ files)")
    assert(zV < nZ, s"z layout did not prune value ($zV of $nZ files)")
    // ...and the 2-D box opens fewer files than either layout's worst
    // dimension (the whole point of interleaving).
    val zBox = partFiles(zdir).count { f =>
      val r = spark.read.parquet(f.getPath)
        .agg(min(col("user_id")).cast("double"), max(col("user_id")).cast("double"),
          min("value"), max("value")).head()
      !(r.getDouble(1) < uLo || r.getDouble(0) > uHi) &&
        !(r.getDouble(3) < vLo || r.getDouble(2) > vHi)
    }
    assert(zBox <= math.min(zU, zV))
    assert(zBox < nLin, s"2-D box on z layout should beat the unprunable dimension ($zBox vs $nLin)")
  }
}
