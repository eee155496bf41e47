package graft

import java.nio.file.{Files, Path}
import java.util.concurrent.ConcurrentLinkedQueue

/** Scratch directories for the from-store QueryDefs (q127–q135, q139,
  * q143): each catalog pass builds a full index copy at plan construction,
  * and before r11 those dirs were never deleted — a 143-query bench repeat
  * left a parquet index per from-store query in /tmp (r10 ADVICE #2). One
  * JVM-exit hook sweeps every dir handed out here; in-run accumulation is
  * bounded by the catalog (each query creates exactly one dir per pass),
  * and a crashed run cleans up on the next JVM's exit at the same paths
  * only if re-created — so the hook deletes what THIS process made,
  * never another run's live data.
  */
object Scratch {

  private val issued = new ConcurrentLinkedQueue[Path]

  @volatile private var hooked = false

  private def ensureHook(): Unit = if (!hooked) synchronized {
    if (!hooked) {
      Runtime.getRuntime.addShutdownHook(new Thread(() =>
        issued.forEach(deleteRecursively(_))))
      hooked = true
    }
  }

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      val walk = Files.walk(p)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(f => try Files.delete(f) catch { case _: Exception => () })
      finally walk.close()
    }

  /** A fresh temp dir registered for recursive deletion at JVM exit. */
  def dir(tag: String): String = {
    ensureHook()
    val p = Files.createTempDirectory(s"graft-$tag")
    issued.add(p)
    p.toString
  }
}
