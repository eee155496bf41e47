package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** Deterministic as-of edge cases, incl. the NULL-value-carry regression:
  * a matched right row whose value is NULL must surface that NULL, not an
  * older row's value. */
class TemporalSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  test("asofLeft: inclusive match, NULL value preserved from the matched row") {
    import spark.implicits._
    val right = Seq(
      (1, 10L, Integer.valueOf(7)),
      (1, 20L, null.asInstanceOf[Integer]), // latest at t>=20 — must win as NULL
      (2, 5L, Integer.valueOf(3))
    ).toDF("k", "t", "v")
    val left = Seq((1, 10L, 100L), (1, 25L, 101L), (2, 4L, 102L), (3, 9L, 103L))
      .toDF("k", "t", "event_id")
    val got = Temporal.asofLeft(left, right, "k", "t", Seq("v"))
      .collect().map(r => r.getLong(2) -> Option(r.get(3))).toMap
    assert(got(100L) === Some(7))   // tie at t=10 matches inclusively
    assert(got(101L) === None)      // matched row's NULL carried, not 7
    assert(got(102L) === None)      // nothing at or before t=4
    assert(got(103L) === None)      // unseen key
  }
}
