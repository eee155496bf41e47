package graft

/** Single Derby system home for the whole test JVM, claimed lazily BEFORE
  * the first engine boot (Derby reads `derby.system.home` once, at boot):
  * keeps `derby.log` out of the repo without per-suite global-state races.
  * Every test database URL still uses an ABSOLUTE path, so the property
  * only governs log placement — a relative-path URL in some future suite
  * would resolve here, which is why none exist (grep `jdbc:derby:`).
  */
object DerbyTestHome {
  lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("derby-home").toString
    System.setProperty("derby.system.home", d)
    d
  }

  /** Absolute URL for a fresh embedded database; claims the shared home
    * first so the engine can't boot without it. */
  def freshDbUrl(name: String): String = {
    dir
    val base = java.nio.file.Files.createTempDirectory(name).toString
    s"jdbc:derby:$base/$name;create=true"
  }
}
