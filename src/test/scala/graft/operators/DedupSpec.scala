package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** connectedComponents must converge fast on deep graphs (the pointer-jump
  * guarantee) and label every component by its min vertex. */
class DedupSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  test("path graph of diameter 99 converges (O(log d) pointer jumping)") {
    import spark.implicits._
    // chain 0-1-2-...-99 plus a separate triangle {1000,1001,1002}
    val edges = ((0L until 99L).map(i => (i, i + 1)) ++
      Seq((1000L, 1001L), (1001L, 1002L), (1000L, 1002L))).toDF("a", "b")
    val got = Dedup.connectedComponents(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((0L to 99L).forall(got(_) === 0L))
    assert(Seq(1000L, 1001L, 1002L).forall(got(_) === 1000L))
  }

  test("isolated pairs label independently") {
    import spark.implicits._
    val edges = Seq((5L, 3L), (10L, 20L)).toDF("a", "b")
    val got = Dedup.connectedComponents(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(3L -> 3L, 5L -> 3L, 10L -> 10L, 20L -> 10L))
  }
}
