package graft

/** JVM-lifetime temp directories with shutdown-hook cleanup.
  *
  * Per-JVM caches of derived artifacts (the docs-index oracle build in
  * [[graft.operators.IndexOps]], the partitioned ANN layouts in
  * [[graft.operators.Similarity]]) materialize under a temp dir that is
  * only valid for this JVM — register them here so repeated bench /
  * verify runs do not accumulate stray `graft-*` directories on the box.
  * At real scale these artifacts live at persistent, caller-chosen
  * locations instead (every builder takes an explicit dir for that), so
  * the hook is a local-mode concern only.
  */
object TempDirs {

  private val registered =
    new java.util.concurrent.ConcurrentLinkedQueue[java.nio.file.Path]

  Runtime.getRuntime.addShutdownHook(new Thread(() => {
    registered.forEach(deleteRecursively)
  }, "graft-tempdir-cleanup"))

  /** Create a temp directory deleted on normal JVM exit. */
  def create(prefix: String): String = {
    val p = java.nio.file.Files.createTempDirectory(prefix)
    registered.add(p)
    p.toString
  }

  private def deleteRecursively(p: java.nio.file.Path): Unit = {
    import java.nio.file.{Files, Path}
    if (Files.exists(p)) {
      val walk = Files.walk(p)
      try {
        walk.sorted(java.util.Comparator.reverseOrder[Path]())
          .forEach(f => try Files.deleteIfExists(f) catch { case _: Exception => () })
      } finally walk.close()
    }
  }
}
