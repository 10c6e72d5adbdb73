package graft.util

/** Temp directory with recursive delete at JVM exit — the shared
  * scaffolding of the memoized per-corpus index builds (LSH band
  * index, span index): one home for the cleanup logic, so a fix to
  * eviction or deletion can't silently miss a copy.
  */
object TempDirs {
  def createWithCleanup(prefix: String): String = {
    val d = java.nio.file.Files.createTempDirectory(prefix).toString
    sys.addShutdownHook {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(new java.io.File(d))
    }
    d
  }
}
