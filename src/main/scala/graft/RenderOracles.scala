package graft

/** Renders `SparkEntry.oracleSql` to a JSON file WITHOUT running any
  * query — the cold-stash path a driver-side harness may take
  * (CORRECTNESS_r09 failed exactly the stash-dependent oracles because
  * of it). With the persisted literal snapshot on the classpath
  * ([[OracleLiterals.ResourcePath]], committed under
  * `src/main/resources`), the SQL rendered here is byte-identical to
  * what [[Verify]] renders after a full run; `tools/check.py
  * --render-first` pins that property against the whole registry.
  *
  * Usage: `java -cp ... graft.RenderOracles /path/to/oracle_sql.json`
  */
object RenderOracles {
  def main(args: Array[String]): Unit = {
    val Array(outPath) = args
    val p = java.nio.file.Paths.get(outPath)
    if (p.getParent != null) java.nio.file.Files.createDirectories(p.getParent)
    Verify.writeOracleSql(p)
    println(s"[render-oracles] wrote ${SparkEntry.oracleSql.size} oracle " +
      s"SQL entries to $outPath (stash cold — literals came from the " +
      "persisted classpath snapshot where present)")
  }
}
