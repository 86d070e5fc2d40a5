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

  /** Run `build` exactly once per JVM for `path`, then return. */
  def ensure(path: String)(build: => Unit): Unit =
    built.computeIfAbsent(path, _ => { build; () })

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
    * build-once contract already claimed. */
  def path(prefix: String, dir: String): String =
    new java.io.File(sys.props("java.io.tmpdir"),
      prefix + "_" + corpusKey(dir)).getPath

  private def corpusKey(dir: String): String = {
    val abs = new java.io.File(dir).getAbsolutePath
    val d = java.security.MessageDigest.getInstance("SHA-256")
      .digest(abs.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    d.take(16).map(b => f"$b%02x").mkString +
      "_p" + ProcessHandle.current().pid()
  }
}
