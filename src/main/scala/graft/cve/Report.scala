package graft.cve

import org.apache.spark.sql.{DataFrame, Row}

/** S11: the stdout report sink — the reference's formatted prints
  * (cve_manager.py:402-429,436-446,494-504,546-566), driven from collected
  * rows. Point reports collect ≤1 row; listings stream through
  * `toLocalIterator` so the driver never materializes a full result set.
  */
object Report {

  private def fmt(v: Any): String = v match {
    case null => "None"
    case d: java.sql.Date => d.toString
    case x => x.toString
  }

  /** EP2 point report (cve_manager.py:402-410). */
  def cveReport(cvssRow: Option[Row], problems: DataFrame, cpes: DataFrame,
      out: String => Unit = println): Unit = {
    cvssRow match {
      case None => out("CVE not found")
      case Some(r) =>
        out(s"CVE:\t\t\t ${fmt(r.get(0))}")
        out(s"CVSSv3.x Attack vector:  ${fmt(r.get(1))}")
        out(s"CVSSv3.x Base Score:\t ${fmt(r.get(2))} ${fmt(r.get(3))}")
        out(s"CVSSv2.x Attack vector:  ${fmt(r.get(4))}")
        out(s"CVSSv2.x Base Score:\t ${fmt(r.get(5))} ${fmt(r.get(6))}")
        out("Description:")
        out(fmt(r.get(7)))
        out(s"\nPubished Date:\t\t ${fmt(r.get(8))}")
        out(s"Last Modified Date:\t ${fmt(r.get(9))}")
    }
    out("\nRelated Common Weakness Enumerations (CWE)")
    out("-------------------------------------------")
    // Only labels whose lstrip('CWE-') is all-digits are printed — the
    // reference silently skips the rest, e.g. NVD-CWE-noinfo
    // (cve_manager.py:416-424). lstrip strips the leading CHARACTER SET
    // {C,W,E,-}, hence dropWhile, not stripPrefix.
    problems.toLocalIterator().forEachRemaining { r =>
      val problem = fmt(r.getAs[Any]("problem"))
      val stripped = problem.dropWhile(c => "CWE-".indexOf(c) >= 0)
      if (stripped.nonEmpty && stripped.forall(_.isDigit)) {
        val resolved = fmt(r.getAs[Any]("resolved"))
        out(if (resolved == problem) problem else s"$problem $resolved")
      }
    }
    out("\nRelated Common Platform Enumerations (CPE)")
    out("-------------------------------------------")
    cpes.toLocalIterator().forEachRemaining(r => out(fmt(r.get(0))))
  }

  /** Score/date listing header + rows (cve_manager.py:436-446). */
  def scoreDateListing(rows: DataFrame, withDate: Boolean,
      out: String => Unit = println): Unit = {
    out(if (withDate)
      "CVE \t\tCVSSv3.x Score CVSSv3.x Vector String \t\t\tCVSSv2 Score CVSSv2 Vector String\t\t\t Published Date"
    else
      "CVE \t\tCVSSv3.x Score CVSSv3.x Vector String \t\t\tCVSSv2 Score CVSSv2 Vector String")
    rows.toLocalIterator().forEachRemaining { r =>
      val n = if (withDate) 6 else 5
      out((0 until n).map(i => fmt(r.get(i))).mkString(" "))
    }
  }

  /** CPE listing (cve_manager.py:494-504). */
  def cpeListing(rows: DataFrame, withDate: Boolean,
      out: String => Unit = println): Unit = {
    out(if (withDate) "CPE\t\t\t\t\t\t\tCVE\t\tCVSSv3.x CVSSv2\t Published Date"
        else "CPE\t\t\t\t\t\t\tCVE\t\tCVSSv3.x CVSSv2")
    rows.toLocalIterator().forEachRemaining { r =>
      val base = s"${fmt(r.get(0))} ${fmt(r.get(1))} ${fmt(r.get(2))} \t ${fmt(r.get(3))}"
      out(if (withDate) s"$base \t ${fmt(r.get(4))}" else base)
    }
  }

  /** CWE info report (cve_manager.py:546-568). */
  def cweReport(row: Option[Row], requested: String,
      out: String => Unit = println): Unit = row match {
    case None => out(s"CWE-$requested not found")
    case Some(r) =>
      out(s"CWE-${fmt(r.get(0))}")
      out("========")
      out(fmt(r.get(1)))
      if (r.get(2) != null) out(fmt(r.get(2)))
      if (r.get(3) != null) out(fmt(r.get(3)))
      if (r.get(4) != null) {
        out("\nModes of Introduction"); out("--------------------"); out(fmt(r.get(4)))
      }
      if (r.get(5) != null) {
        out("\nCommon Consequences"); out("--------------------"); out(fmt(r.get(5)))
      }
      if (r.get(6) != null) {
        out("\nPotential Mitigations"); out("--------------------"); out(fmt(r.get(6)))
      }
  }
}
