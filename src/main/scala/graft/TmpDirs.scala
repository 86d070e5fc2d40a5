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
      created.forEach { p =>
        // one entry's failure must not silently abandon the rest —
        // report and keep sweeping
        try deleteRec(p.toFile)
        catch {
          case e: Throwable =>
            System.err.println(s"[tmpdirs] cleanup failed for $p: $e")
        }
      }
    }, "graft-tmpdir-cleanup"))
  }

  /** Create a self-cleaning temp directory; returns its String path. */
  def create(prefix: String): String = createPath(prefix).toString

  /** Create a self-cleaning temp directory as a `Path`. Names embed a
    * `_gtmp_p<pid>_` marker so a directory stranded by an ABNORMAL
    * exit (kill -9, JVM halt mid-hook — the exit hook never ran) is
    * swept by the next JVM's first create() instead of leaking
    * forever. The marker string is unique to this registry, so the
    * sweep can never touch a foreign tmpdir entry. */
  def createPath(prefix: String): java.nio.file.Path = {
    sweepDead
    register(java.nio.file.Files.createTempDirectory(
      prefix + "_gtmp_p" + ProcessHandle.current().pid() + "_"))
  }

  /** Once per JVM: delete tmpdir entries carrying the marker of a pid
    * that no longer exists (never this JVM's, never a live JVM's). */
  private lazy val sweepDead: Unit = sweepDeadNow()

  private[graft] def sweepDeadNow(): Unit = {
    val marker = "_gtmp_p(\\d+)_".r
    val me = ProcessHandle.current().pid()
    val tmp = new java.io.File(sys.props("java.io.tmpdir"))
    // Prefix-scoped listing (ADVICE r17): only entries that can carry
    // the marker are even considered, so the sweep is O(our entries)
    // on a shared-host tmpdir, not O(all entries).
    Option(tmp.listFiles((_, name) => name.contains("_gtmp_p")))
      .getOrElse(Array.empty[java.io.File])
      .foreach { f =>
        val dead = marker.findFirstMatchIn(f.getName)
          .flatMap(m => m.group(1).toLongOption)
          .exists(p => p != me && !ProcessHandle.of(p).isPresent)
        if (dead) deleteRec(f)
      }
  }

  /** Register an existing (or future) path for deletion at JVM exit. */
  def register(p: java.nio.file.Path): java.nio.file.Path = {
    created.add(p)
    p
  }

  private[graft] def deleteRec(f: java.io.File): Unit = {
    // NEVER traverse through a symlink (ADVICE r17, hardened r19): the
    // sweep also runs over shared-/tmp dirs this process did not
    // create, and a planted symlink inside a marker-named dir must be
    // unlinked as an ENTRY, not followed into its target. r19 (ADVICE):
    // the old isSymbolicLink-then-listFiles guard was TOCTOU-racy (an
    // entry swapped dir→link between check and traversal was still
    // followed) and its exists()-gated retry skipped dangling links.
    // Files.walkFileTree does not follow links at all — a link is
    // visited as a FILE (its own attributes) and unlinked — so the
    // no-traversal guarantee holds per-entry at visit time, and
    // visitFileFailed still unlinks entries whose attributes can't be
    // read (dangling links).
    import java.nio.file.{FileVisitResult, Files, LinkOption, Path,
      SimpleFileVisitor}
    def sweep(): Unit = {
      val root = f.toPath
      if (Files.notExists(root, LinkOption.NOFOLLOW_LINKS)) return
      Files.walkFileTree(root, new SimpleFileVisitor[Path] {
        private def rm(p: Path): FileVisitResult = {
          try Files.deleteIfExists(p)
          catch { case _: java.io.IOException => () } // keep sweeping
          FileVisitResult.CONTINUE
        }
        override def visitFile(
            p: Path,
            a: java.nio.file.attribute.BasicFileAttributes) = rm(p)
        override def visitFileFailed(p: Path, e: java.io.IOException) =
          rm(p)
        override def postVisitDirectory(p: Path, e: java.io.IOException) =
          rm(p)
      })
      ()
    }
    try sweep()
    catch { case _: java.io.IOException => () }
    // a sidecar can appear between a directory's listing and its rmdir
    // (e.g. a LocalFileSystem .crc written by a racing shutdown hook) —
    // one retry pass covers it; a still-failing path stays for the
    // dead-pid sweep rather than looping at JVM exit
    if (java.nio.file.Files.exists(f.toPath,
        java.nio.file.LinkOption.NOFOLLOW_LINKS)) {
      try sweep()
      catch { case _: java.io.IOException => () }
    }
    ()
  }
}
