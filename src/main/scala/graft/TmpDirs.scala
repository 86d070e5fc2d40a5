package graft

/** Temp directories that remove themselves at JVM exit.
  *
  * Registry queries (GraftSession scratch tables for the x-family DML
  * suite), specs, and demo mains all allocate tmpdir scratch; before
  * r17 every allocation stranded one directory per JVM forever — the
  * ADVICE r16 IndexCache leak, one class wider (a Verify + Bench round
  * leaves ~20 `graft_q*`/`graft*` dirs behind). Paths registered here
  * are deleted recursively by one shutdown hook: their lifetime equals
  * the JVM's, which is exactly the lifetime of everything that can
  * reference them (per-JVM registry caches, per-run scratch tables).
  * Deletion of a path that was never created, or was already removed
  * by its owner, is a no-op.
  */
object TmpDirs {
  private val created = java.util.concurrent.ConcurrentHashMap
    .newKeySet[java.nio.file.Path]()

  locally {
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      created.forEach(p => deleteRec(p.toFile))
    }, "graft-tmpdir-cleanup"))
  }

  /** Create a self-cleaning temp directory; returns its String path. */
  def create(prefix: String): String = createPath(prefix).toString

  /** Create a self-cleaning temp directory as a `Path`. */
  def createPath(prefix: String): java.nio.file.Path =
    register(java.nio.file.Files.createTempDirectory(prefix))

  /** Register an existing (or future) path for deletion at JVM exit. */
  def register(p: java.nio.file.Path): java.nio.file.Path = {
    created.add(p)
    p
  }

  private[graft] def deleteRec(f: java.io.File): Unit = {
    Option(f.listFiles()).getOrElse(Array.empty[java.io.File])
      .foreach(deleteRec)
    f.delete(); ()
  }
}
