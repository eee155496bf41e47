package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SharedSpark, SparkEntry, Tables}

/** Count-Min family (q176/q177): grid bounds, linearity (the merge
  * algebra a sharded deployment relies on), the never-undercount
  * guarantee, and partitioning invariance. */
class CmsSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def words = Tables.load(spark, dir, "documents")
    .select(col("source"), explode(split(trim(col("text")), " ")).as("w"))
    .filter(col("w") =!= "")

  test("cells grid is bounded at D x W rows with exact total mass") {
    val cells = Audit.cmsCells(words, "w")
    assert(cells.count() <= Audit.CmsD.toLong * Audit.CmsW)
    // Every occurrence lands in exactly one bucket per row: per-j mass
    // equals the word count, for every j.
    val n = words.count()
    val perJ = cells.groupBy("j").agg(sum("cc").as("m")).collect()
    assert(perJ.length === Audit.CmsD)
    perJ.foreach(r => assert(r.getLong(1) === n, s"j=${r.getLong(0)}"))
  }

  test("linearity: per-source cells sum to the global grid bit-for-bit") {
    // THE mergeable-sketch contract: shards combine by cell-wise
    // addition, so q177's per-source grids ARE q176's global sketch.
    val global = Audit.cmsCells(words, "w")
      .orderBy("j", "c").collect().toSeq
    val summed = Audit.cmsCellsBy(words, "source", "w")
      .groupBy("j", "c").agg(sum("cc").as("cc"))
      .orderBy("j", "c").collect().toSeq
    assert(global === summed)
  }

  test("cells are partitioning-invariant") {
    val a = Audit.cmsCells(words, "w").orderBy("j", "c").collect().toSeq
    val b = Audit.cmsCells(words.repartition(7), "w")
      .orderBy("j", "c").collect().toSeq
    assert(a === b)
  }

  test("q176: estimate never undercounts and equals exact when no collision") {
    val rows = SparkEntry.queries("q176_cms_freq")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val cnt = r.getLong(1); val est = r.getLong(2); val over = r.getLong(3)
      assert(est >= cnt, s"${r.getString(0)}: est $est < exact $cnt")
      assert(over === est - cnt)
      assert(r.getLong(5) == 0L || r.getLong(5) == 1L)
    }
  }

  test("q177: per-source estimates never undercount; rows cover srcs x hh") {
    val rows = SparkEntry.queries("q177_cms_source_share")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(3) >= r.getLong(2),
        s"${r.getString(0)}/${r.getString(1)}: est < exact")
    }
    val nSrc = Tables.load(spark, dir, "documents")
      .select("source").distinct().count()
    val nHh = SparkEntry.queries("q176_cms_freq")(spark, dir).count()
    assert(rows.length.toLong === nSrc * nHh)
  }

  test("q176/q177 agree: summing per-source exacts reproduces global counts") {
    val shares = SparkEntry.queries("q177_cms_source_share")(spark, dir)
      .groupBy("w").agg(sum("exact_src").as("cnt"))
      .orderBy("w").collect().toSeq.map(r => (r.getString(0), r.getLong(1)))
    val global = SparkEntry.queries("q176_cms_freq")(spark, dir)
      .select("w", "cnt")
      .orderBy("w").collect().toSeq.map(r => (r.getString(0), r.getLong(1)))
    assert(shares === global)
  }
}
