package graft
import org.apache.spark.sql.SparkSession
/** Dev tool: print formatted physical plan + timing for one query. */
object Explain {
  def main(args: Array[String]): Unit = {
    val Array(name, sfDir) = args.take(2)
    val spark = Sessions.local(8)
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.explain("formatted")
    val t0 = System.nanoTime()
    println(s"count=${df.count()} in ${(System.nanoTime()-t0)/1e9}s")
    val t1 = System.nanoTime()
    println(s"count2=${df.count()} in ${(System.nanoTime()-t1)/1e9}s")
    spark.stop()
  }
}
