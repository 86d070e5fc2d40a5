package graft.queries

/** Shared build-once registry for persisted serving indexes (e17 SQ8,
  * e18 IVF-ADC, d29 MinHash-LSH).
  *
  * ConcurrentHashMap because its computeIfAbsent runs the mapping
  * function AT MOST ONCE per key and blocks concurrent callers until it
  * returns — Scala's TrieMap.getOrElseUpdate evaluates the by-name
  * builder OUTSIDE the atomic insert, so two first callers could both
  * run the overwrite build while one of them scans (ADVICE r13).
  */
object IndexCache {
  private val built =
    new java.util.concurrent.ConcurrentHashMap[String, Unit]()

  /** Run `build` exactly once per JVM for `path`, then return. Every
    * build logs its wall-clock split to stderr (`[tag] index build N s`)
    * so a driver bench headline dominated by a one-off index build is
    * self-explaining from the BENCH tail — the d29 pattern, generalized
    * (VERDICT r16 #6). Serve-side cost is then the query's remainder. */
  def ensure(path: String, tag: String = "index")(build: => Unit): Unit =
    built.computeIfAbsent(path, _ => {
      val t0 = System.nanoTime()
      build
      System.err.println(
        f"[$tag] index build ${(System.nanoTime() - t0) / 1e9}%.2f s")
      ()
    })

  /** Tmpdir location for a persisted index over the corpus at `dir`:
    * `prefix` + collision-free corpus key. The key is the SHA-256 of
    * the resolved absolute path (a 32-bit String.hashCode could
    * silently alias two corpora onto one persisted index — ADVICE
    * r13), suffixed with this JVM's pid: the registry above is
    * per-JVM, so a path shared ACROSS JVMs would let a second process
    * overwrite-build the index while the first is scanning it (ADVICE
    * r14 — a latent flake whenever bench/verify runs overlap).
    * Pid-scoping makes the on-disk lifetime match the registry's, at
    * the cost of one rebuild per process — exactly the per-JVM
    * build-once contract already claimed.
    *
    * Pid-scoping also means every exited JVM strands its directories,
    * and a signature-family bump (lsh v1→v2, r16) strands the whole
    * old family (ADVICE r16) — so each `path` call first sweeps the
    * prefix's sibling directories whose owning JVM is dead (any
    * version: a dead pid's directory is unreachable by construction).
    * Directories owned by LIVE other JVMs are never touched, so a
    * concurrent bench/verify at an older HEAD keeps its index. */
  def path(prefix: String, dir: String): String = {
    built.computeIfAbsent("sweep:" + prefix, _ => sweepStale(prefix))
    val p = new java.io.File(sys.props("java.io.tmpdir"),
      prefix + "_" + corpusKey(dir)).getPath
    // primary cleanup: this JVM removes its own indexes at exit (the
    // dead-pid sweep above remains the backstop for crashed JVMs)
    graft.TmpDirs.register(java.nio.file.Paths.get(p))
    p
  }

  /** Delete tmpdir siblings of `prefix` (same family stem, any
    * version suffix) owned by a pid that no longer exists. Names
    * without a parseable `_p<pid>` tail are left alone. */
  private def sweepStale(prefix: String): Unit = {
    val stem = prefix.replaceAll("_v\\d+$", "")
    val me = ProcessHandle.current().pid()
    val tmp = new java.io.File(sys.props("java.io.tmpdir"))
    Option(tmp.listFiles()).getOrElse(Array.empty[java.io.File])
      .foreach { f =>
        val n = f.getName
        val pid = "_p(\\d+)$".r.findFirstMatchIn(n)
          .flatMap(m => m.group(1).toLongOption)
        val dead = pid.exists(p =>
          p != me && !ProcessHandle.of(p).isPresent)
        if (n.startsWith(stem + "_") && dead) graft.TmpDirs.deleteRec(f)
      }
  }

  private def corpusKey(dir: String): String = {
    val abs = new java.io.File(dir).getAbsolutePath
    val d = java.security.MessageDigest.getInstance("SHA-256")
      .digest(abs.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    d.take(16).map(b => f"$b%02x").mkString +
      "_p" + ProcessHandle.current().pid()
  }
}
