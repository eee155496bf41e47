package graft.cve

import java.io.{ByteArrayOutputStream, File}
import java.util.zip.ZipInputStream

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Source side of EP1 (cve_manager.py:172-245): feed enumeration/download
  * (S1/S2), directory scan (S3), and the zip→JSON source (S4).
  *
  * Scale posture: each per-year feed zip is one `binaryFiles` partition —
  * unzip + parse run distributed, one task per file, and the items never
  * accumulate in driver memory (the reference holds ALL years in one Python
  * list, cve_manager.py:245 — its scalability cliff).
  */
object Ingest {

  val FeedIndexUrl = "https://nvd.nist.gov/vuln/data-feeds#JSON_FEED"
  val FeedBaseUrl = "https://nvd.nist.gov/feeds/json/cve/1.1/"
  val FeedNamePattern = "nvdcve-1\\.1-[0-9]*\\.json\\.zip".r

  /** S3: non-recursive directory scan, filenames sorted descending (newest
    * year first, cve_manager.py:233-234). Order only affected the
    * reference's print sequence — relational results are set-ordered. */
  def listFeedFiles(dir: String): Seq[String] = {
    val d = new File(dir)
    Option(d.listFiles()).getOrElse(Array.empty)
      .filter(_.isFile).map(_.getName).sorted.reverse.toSeq
  }

  /** S1+S2: enumerate feed zips from the public NVD index page and stream
    * them to `dir` (cve_manager.py:172-201). Plain driver-side JDK HTTP —
    * not a Spark op; in an air-gapped environment this reports the failure
    * and the pipeline proceeds from already-landed files. */
  def downloadFeeds(dir: String, year: Option[String]): Either[String, Seq[String]] = {
    new File(dir).mkdirs()
    try {
      val client = java.net.http.HttpClient.newHttpClient()
      def get(url: String) = client.send(
        java.net.http.HttpRequest.newBuilder(java.net.URI.create(url)).build(),
        java.net.http.HttpResponse.BodyHandlers.ofByteArray())
      val names = year match {
        case Some(y) => Seq(s"nvdcve-1.1-$y.json.zip")
        case None =>
          val index = new String(get(FeedIndexUrl).body(), "UTF-8")
          FeedNamePattern.findAllIn(index).toSeq.distinct
      }
      Right(names.map { n =>
        val bytes = get(FeedBaseUrl + n).body()
        java.nio.file.Files.write(new File(dir, n).toPath, bytes)
        n
      })
    } catch {
      case e: Exception => Left(s"download unavailable (${e.getClass.getSimpleName}): ${e.getMessage}")
    }
  }

  /** S4 (zip path): distributed zip→JSON. Reads the FIRST zip member of each
    * archive (cve_manager.py:237-239) as one JSON document string, then
    * applies the explicit feed schema. One task per archive. */
  def readZippedFeeds(spark: SparkSession, pathGlob: String): DataFrame = {
    import spark.implicits._
    val docs = spark.sparkContext.binaryFiles(pathGlob).map { case (_, pds) =>
      val zin = new ZipInputStream(pds.open())
      try {
        zin.getNextEntry // first member only, like the reference
        val out = new ByteArrayOutputStream()
        val buf = new Array[Byte](1 << 16)
        var n = zin.read(buf)
        while (n >= 0) { out.write(buf, 0, n); n = zin.read(buf) }
        new String(out.toByteArray, "UTF-8")
      } finally zin.close()
    }.toDS()
    spark.read.schema(NvdSchema.feed).json(docs)
  }

  /** S4+S6: read every feed in a directory — extracted `.json` files and/or
    * `.json.zip` archives — as ONE DataFrame (the reference's union-all
    * accumulation, cve_manager.py:245, via multi-path read + unionByName). */
  def readFeedDir(spark: SparkSession, dir: String): DataFrame = {
    val files = listFeedFiles(dir)
    val jsons = files.filter(_.endsWith(".json")).map(f => s"$dir/$f")
    val zips = files.filter(_.endsWith(".zip"))
    val parts = Seq(
      if (jsons.nonEmpty) Some(Flatten.readFeed(spark, jsons: _*)) else None,
      if (zips.nonEmpty) Some(readZippedFeeds(spark, s"$dir/*.zip")) else None
    ).flatten
    require(parts.nonEmpty, s"no .json or .json.zip feed files in $dir")
    parts.reduce(_ unionByName _)
  }
}
