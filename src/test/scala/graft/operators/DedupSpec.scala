package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** connectedComponents must converge fast on deep graphs (the pointer-jump
  * guarantee) and label every component by its min vertex. */
class DedupSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  test("containment flags a strict-subset dup that Jaccard misses") {
    import spark.implicits._
    // Doc 2 is doc 1's opening paragraph verbatim inside ~10× more prose:
    // every shingle of 2 appears in 1, so containment = 1.0, but Jaccard
    // = |2|/|1| ≈ 0.1 — at q22's tau it is borderline noise, and any
    // higher symmetric threshold drops it entirely. Doc 4 repeats doc 1's
    // tail prose so the tail's shingles clear the df >= 2 informative
    // filter (sizes are measured over informative shingles — without a
    // second witness the tail would vanish from doc 1's size and Jaccard
    // would read 1.0 too). Doc 3 is unrelated.
    val small = (1 to 12).map(i => s"w$i").mkString(" ")
    val big = (1 to 100).map(i => s"w$i").mkString(" ")
    val tail = (13 to 100).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, big), (2L, small), (3L, "x1 x2 x3 x4 x5"), (4L, tail))
      .toDF("doc_id", "text")
    val got = Dedup.containmentPairs(docs, tau = 0.9)
      .select("a", "b", "jaccard", "containment")
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2))
    assert(got.map(t => (t._1, t._2)).toSeq === Seq((1L, 2L), (1L, 4L)))
    val (_, _, j, c) = got.head
    assert(c === 1.0)       // all 10 of doc 2's shingles are in doc 1
    assert(j < 0.15)        // symmetric score can't see the subset-dup
  }

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

  test("convergence check adds no join job per round (fewer jobs than the join+isEmpty formulation)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val edges = (0L until 15L).map(i => (i, i + 1)).toDF("a", "b")

    def countJobs(work: () => Unit): Int = {
      val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.incrementAndGet()
      }
      spark.sparkContext.addSparkListener(listener)
      try { work(); Thread.sleep(500) } // listener bus is async; drain
      finally spark.sparkContext.removeSparkListener(listener)
      jobs.get()
    }

    // The r2 formulation: identical propagation loop, but convergence via a
    // second join + isEmpty against the previous labels — the per-round
    // overhead the rewrite removed. Reconstructed here as the baseline so
    // the assertion self-calibrates instead of pinning a brittle job total.
    def oldStyle(): Unit = {
      val sym = edges.unionByName(edges.select(col("b").as("a"), col("a").as("b")))
      var labels = sym.select(col("a").as("v")).distinct()
        .withColumn("lbl", col("v")).localCheckpoint(true)
      var converged = false
      var iter = 0
      while (!converged && iter < 30) {
        val nbrMin = sym.join(labels, sym("b") === labels("v"))
          .groupBy(sym("a").as("nv")).agg(min("lbl").as("nlbl"))
        val hop = labels.select(col("v").as("hv"), col("lbl").as("hlbl"))
        val next = labels
          .join(nbrMin, labels("v") === col("nv"), "left")
          .join(hop, labels("lbl") === col("hv"), "left")
          .select(labels("v"), least(col("lbl"),
            coalesce(col("nlbl"), col("lbl")),
            coalesce(col("hlbl"), col("lbl"))).as("lbl"))
          .localCheckpoint(true)
        converged = next.join(labels.withColumnRenamed("lbl", "old"), Seq("v"))
          .filter(col("lbl") < col("old")).isEmpty
        labels = next
        iter += 1
      }
      labels.collect()
    }

    val newJobs = countJobs(() => Dedup.connectedComponents(edges).collect())
    val oldJobs = countJobs(() => oldStyle())
    assert(newJobs < oldJobs,
      s"expected fewer jobs than the join+isEmpty formulation: new=$newJobs old=$oldJobs")
  }

  test("best-of-group keeps the higher-quality same-vocabulary copy, not the lower doc_id") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // Same vocabulary {alpha beta gamma}, different repetition: doc 2's
    // longer rendering scores higher on the q72 length term, so it must
    // beat doc 1 despite the larger doc_id. Doc 3 is a singleton. The
    // testdata contains no vocab-dups, so this is the discrimination case
    // the oracle can't exercise.
    val docs = Seq(
      (1L, "alpha beta gamma"),
      (2L, "alpha beta gamma alpha beta gamma alpha beta gamma"),
      (3L, "delta epsilon zeta eta theta completely different words here")
    ).toDF("doc_id", "text")
    val scored = docs
      .withColumn("h",
        md5(concat_ws(" ", sort_array(array_distinct(split(trim(col("text")), " "))))))
      .withColumn("n_words", size(split(trim(col("text")), " ")).cast("long"))
      .withColumn("score", expr("3.0e-1 * least(n_words / 1.0e2, 1.0e0)"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("h").orderBy(col("score").desc, col("doc_id"))
    val kept = scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") === 1).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(2L, 3L)) // quality wins over doc_id order
  }

  test("reliable=true requires a checkpoint dir, then converges identically") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    if (spark.sparkContext.getCheckpointDir.isEmpty) {
      intercept[IllegalArgumentException] {
        Dedup.connectedComponents(edges, reliable = true)
      }
    }
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    spark.sparkContext.setCheckpointDir(dir)
    val got = Dedup.connectedComponents(edges, reliable = true)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }
}
