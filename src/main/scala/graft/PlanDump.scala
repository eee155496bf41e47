package graft

/** Dev tool (r17): write `.explain("formatted")` for catalog queries to
  * files — the judge-checkable before/after plan artifacts under
  * plans/rNN/. Usage: PlanDump <sfDir> <outDir> <suffix> [names...]
  * (no names = full catalog). Not part of the driver contract.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val suffix = args(2)
    val names0 = SparkEntry.queries.keys.toSeq.sorted
    val names = if (args.length > 3) names0.filter(args.drop(3).toSet) else names0
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = Sessions.builder(s"local[$cpus]", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$outDir/${name}_$suffix.txt"),
        plan.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      println(s"dumped $name")
    }
    spark.stop()
  }
}
