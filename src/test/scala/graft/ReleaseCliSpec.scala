package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Audit

/** The Release CLI assembles the publishable bundle from the catalog's
  * own oracle-graded frames: the exact parts must be bit-equal to their
  * queries, and the privacy pair (kanon, release_counts) must keep its
  * graded twins' grid and suppression set while never shipping the
  * columns that would invert the protection (ADVICE r15 / VERDICT r15
  * #4 + #6). */
class ReleaseCliSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("bundle: exact artifacts bit-equal to their catalog queries; summary consistent") {
    val out = java.nio.file.Files.createTempDirectory("graft-release").toString
    val json = Release.run(spark, List("bundle", sf, out))
    assert(json.contains(""""mode":"bundle""""))

    // every exact artifact IS its catalog query's frame
    Release.Parts.foreach { case (sub, q) =>
      val want = SparkEntry.queries(q)(spark, sf)
      val sorted = want.columns.toSeq
      val got = spark.read.parquet(s"$out/$sub")
        .select(sorted.map(col): _*)
        .orderBy(sorted.map(col): _*)
        .collect().map(_.toSeq.toList).toList
      val exp = want
        .orderBy(sorted.map(col): _*)
        .collect().map(_.toSeq.toList).toList
      assert(got === exp && got.nonEmpty, s"artifact $sub drifted from $q")
    }

    // summary fields tie out to the artifacts
    val docs = Tables.load(spark, sf, "documents")
    assert(json.contains(s""""docs":${docs.count()}"""))
    assert(json.contains(
      s""""sources":${docs.select("source").distinct().count()}"""))
    val kanon = SparkEntry.queries("q185_kanon_audit")(spark, sf).collect()
    assert(json.contains(
      s""""exposed_cells":${kanon.count(_.getAs[Long]("exposed") == 1L)}"""))
    val ladder = SparkEntry.queries("q187_kanon_generalize")(spark, sf)
      .collect()
    val anonW = ladder.sortBy(_.getAs[Long]("bin_w"))
      .find(_.getAs[Long]("anonymous") == 1L)
      .map(_.getAs[Long]("bin_w")).getOrElse(-1L)
    assert(json.contains(s""""anonymous_bin_w":$anonW"""))

    // kanon publication form: same grid and exposed flags as q185;
    // exposed cells ship n_docs = n_sources = -1 (never the exact sub-k
    // counts), unexposed cells ship the exact counts
    def kanonRows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("lang", "len_bucket").collect().map(r => (
        r.getAs[String]("lang"), r.getAs[Long]("len_bucket"),
        r.getAs[Long]("n_docs"), r.getAs[Long]("n_sources"),
        r.getAs[Long]("exposed")))
    val shippedKanon = kanonRows(spark.read.parquet(s"$out/kanon"))
    val gradedKanon = kanonRows(SparkEntry.queries("q185_kanon_audit")(spark, sf))
    assert(shippedKanon.length === gradedKanon.length)
    assert(gradedKanon.exists(_._5 == 1L),
      "fixture must have at least one exposed cell or the pin is vacuous")
    shippedKanon.zip(gradedKanon).foreach { case (s0, g) =>
      assert((s0._1, s0._2, s0._5) === ((g._1, g._2, g._5)), "grid/flag drift")
      if (g._5 == 1L) assert(s0._3 === -1L && s0._4 === -1L,
        s"exposed cell shipped its counts: $s0")
      else assert(s0._3 === g._3 && s0._4 === g._4)
    }

    // release_counts publication form: (lang, len_bucket, released) ONLY
    val rc = spark.read.parquet(s"$out/release_counts")
    assert(rc.columns.toSeq.sorted === Seq("lang", "len_bucket", "released"))

    // the generated run salt is printed once and reproduces the artifact
    val salt = """"dp_salt":"([^"]+)"""".r.findFirstMatchIn(json).get.group(1)
    assert(salt.nonEmpty && salt != Audit.DpSalt,
      "generated salt must not be the repo-committed constant")
    val replay = Audit.dpRelease(docs, salt)
      .select("lang", "len_bucket", "released")
      .orderBy("lang", "len_bucket").collect().map(_.toSeq.toList).toList
    val shipped = rc.orderBy("lang", "len_bucket")
      .select("lang", "len_bucket", "released")
      .collect().map(_.toSeq.toList).toList
    assert(replay === shipped)
  }

  test("--dp-salt: custom-salt bundle differs from q191 only in noise; suppression set identical") {
    val out = java.nio.file.Files.createTempDirectory("graft-release-salt").toString
    val json = Release.run(spark, List("bundle", sf, out, "--dp-salt", "run-secret.17"))
    assert(json.contains(""""dp_salt":"run-secret.17""""), json)

    val shipped = spark.read.parquet(s"$out/release_counts")
      .orderBy("lang", "len_bucket").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val graded = SparkEntry.queries("q191_dp_release")(spark, sf)
      .orderBy("lang", "len_bucket").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getAs[Long]("n_docs"),
        r.getAs[Long]("released")))

    // same cell grid, same suppression set (released = -1 exactly on the
    // sub-k cells q191 suppresses); unsuppressed cells differ from the
    // exact count only by the salt-keyed noise, floored at 0
    assert(shipped.map(s0 => (s0._1, s0._2)).toSeq ===
      graded.map(g => (g._1, g._2)).toSeq)
    shipped.zip(graded).foreach { case (s0, g) =>
      if (g._4 == -1L) assert(s0._3 === -1L, s"suppression drift at $s0")
      else assert(s0._3 >= 0L, s"negative released count at $s0")
    }
    // the custom salt reproduces the artifact through the shared seam
    val replay = Audit.dpRelease(Tables.load(spark, sf, "documents"),
        "run-secret.17")
      .orderBy("lang", "len_bucket").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getAs[Long]("released")))
    assert(replay.toSeq === shipped.toSeq)

    // a quote-bearing or otherwise SQL/JSON-hostile salt is rejected
    assertThrows[IllegalArgumentException] {
      Release.run(spark, List("bundle", sf, out, "--dp-salt", "bad'salt"))
    }
  }
}
