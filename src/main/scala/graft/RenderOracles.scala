package graft

/** Renders `SparkEntry.oracleSql` to a JSON file WITHOUT running any
  * query — the cold-stash path a driver-side harness may take
  * (CORRECTNESS_r09 failed exactly the stash-dependent oracles because
  * of it). The literals come from the COMPILED-IN
  * [[OracleLiteralsSnapshot]] (committed source — present on any
  * classpath that can run this main, unlike the resource file, which a
  * bare `sbt compile` does not copy; CORRECTNESS_r10), so the SQL
  * rendered here is byte-identical to what [[Verify]] renders after a
  * full run; `tools/check.py --render-first --no-resource` pins that
  * property against the whole registry with the resource deleted.
  *
  * Usage: `java -cp ... graft.RenderOracles /path/to/oracle_sql.json`
  */
object RenderOracles {
  def main(args: Array[String]): Unit = {
    val Array(outPath) = args
    // a flag mistaken for the output path once littered the repo with a
    // file named '--list' (ADVICE r11) — fail fast instead
    require(!outPath.startsWith("-"),
      s"output path looks like a CLI flag: '$outPath'")
    val p = java.nio.file.Paths.get(outPath)
    if (p.getParent != null) java.nio.file.Files.createDirectories(p.getParent)
    Verify.writeOracleSql(p)
    println(s"[render-oracles] wrote ${SparkEntry.oracleSql.size} oracle " +
      s"SQL entries to $outPath (stash cold — literals came from the " +
      "persisted classpath snapshot where present)")
  }
}
