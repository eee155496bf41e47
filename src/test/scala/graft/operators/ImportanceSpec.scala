package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.{SharedSpark, SparkEntry}

/** q152 importance selection semantics: docs written in the TARGET slice's
  * vocabulary must outrank mixed docs, which outrank out-of-vocabulary
  * docs (ratio 0). */
class ImportanceSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  test("target-vocabulary docs rank first; fully-OOV-of-target docs score 0") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-imp").toString
    val t = (1 to 12).map(i => s"t$i")   // target vocabulary
    val u = (1 to 12).map(i => s"u$i")   // background vocabulary
    // ids 0 and 50 are the target slice (doc_id % 50 == 0).
    Seq(
      (0L, t.mkString(" ")),
      (50L, t.reverse.mkString(" ")),
      (1L, t.mkString(" ")),                                    // pure target vocab
      (2L, (t.take(6) ++ u.take(6)).mkString(" ")),             // half target
      (3L, u.mkString(" ")))                                    // no target words
      .map { case (id, tx) => (id, tx, "en", "web", tx.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val rows = SparkEntry.queries("q152_importance_select")(spark, dir).collect()
    val ratio = rows.map(r => r.getLong(0) -> r.getDouble(r.fieldIndex("ratio"))).toMap
    assert(ratio(1L) > ratio(2L), s"pure-target doc must outrank mixed: $ratio")
    assert(ratio(2L) > ratio(3L), s"mixed doc must outrank OOV: $ratio")
    assert(ratio(3L) === 0.0, "no target words -> sumt 0 -> ratio 0")
    // the manifest is ratio-descending with doc_id tiebreak
    val order = rows.map(_.getLong(0)).toSeq
    assert(order.take(3).toSet === Set(0L, 50L, 1L),
      s"target-vocab docs must lead the manifest: $order")
  }
}
