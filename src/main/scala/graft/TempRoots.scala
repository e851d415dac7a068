package graft

/** Registry of driver-local TEMP directories holding fixture state
  * (bench/verify cluster stores, staged stream sources) — deleted on
  * JVM exit. A REAL warehouse persists this state under its catalog
  * root; only the harness fixtures live in temp space, and without the
  * hook every run leaves full persisted stores behind. */
object TempRoots {
  private val roots = new scala.collection.mutable.ArrayBuffer[String]()

  locally {
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      roots.synchronized(roots.foreach { r =>
        scala.util.Try(org.apache.commons.io.FileUtils
          .deleteDirectory(new java.io.File(r)))
      })))
  }

  /** Create and register a fresh temp directory. */
  def create(prefix: String): String = {
    val p = java.nio.file.Files.createTempDirectory(prefix).toString
    roots.synchronized(roots += p)
    p
  }
}
