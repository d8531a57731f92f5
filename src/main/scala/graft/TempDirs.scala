package graft

/** Session-lifetime temp directories, reclaimed at JVM exit.
  *
  * Graded roundtrip queries materialize real sinks (changelog populates,
  * streaming file sinks, staged stream inputs) into temp dirs per
  * invocation — and Bench invokes each query 3×. Registering every dir
  * here bounds the on-disk footprint to one session; without it repeated
  * bench/verify runs steadily fill /tmp with dataset copies.
  */
object TempDirs {
  private val dirs = new java.util.concurrent.ConcurrentLinkedQueue[java.nio.file.Path]()
  private lazy val hook: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def rm(p: java.nio.file.Path): Unit = {
        if (java.nio.file.Files.isDirectory(p)) {
          val s = java.nio.file.Files.list(p)
          try s.forEach(rm) finally s.close() // unclosed streams hold FDs
        }
        java.nio.file.Files.deleteIfExists(p)
      }
      dirs.forEach(d => try rm(d) catch { case scala.util.control.NonFatal(_) => () })
    }))

  /** Create a temp directory deleted at JVM exit. */
  def create(prefix: String): java.nio.file.Path = {
    hook
    val d = java.nio.file.Files.createTempDirectory(prefix)
    dirs.add(d)
    d
  }

  /** Delete every directory created so far, now instead of at JVM exit —
    * for loop harnesses (Bench) where drive queries re-create their temp
    * sinks every pass and the pile-up otherwise lives until shutdown.
    * Only call between queries, never while one may still read its sink. */
  def sweep(): Unit = {
    def rm(p: java.nio.file.Path): Unit = {
      if (java.nio.file.Files.isDirectory(p)) {
        val s = java.nio.file.Files.list(p)
        try s.forEach(rm) finally s.close()
      }
      java.nio.file.Files.deleteIfExists(p)
    }
    var d = dirs.poll()
    while (d != null) {
      try rm(d) catch { case scala.util.control.NonFatal(_) => () }
      d = dirs.poll()
    }
  }
}
