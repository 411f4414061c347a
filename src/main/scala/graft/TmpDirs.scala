package graft

/** Per-JVM-unique scratch root for query bodies that persist artifacts
  * (the IVF index queries q167/q169/q171/q176/q192/q194, probe tools).
  *
  * Round-8 verdict item 1: fixed `/tmp/graft_*` paths made two concurrent
  * JVMs (a second `sbt test`, a CI with parallel checkouts) corrupt each
  * other's on-disk state mid-run. Every path is now unique per process;
  * the whole root is removed on JVM exit. Within one JVM the paths are
  * STABLE, so a query invoked twice in a session still exercises its
  * build-if-absent/overwrite logic exactly as before. */
object TmpDirs {
  lazy val root: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_run_")
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      try {
        val walk = java.nio.file.Files.walk(dir)
        try walk.sorted(java.util.Comparator.reverseOrder())
          .forEach(p => { java.nio.file.Files.deleteIfExists(p); () })
        finally walk.close()
      } catch { case _: Throwable => () }))
    dir.toString
  }

  def path(name: String): String = s"$root/$name"
}
