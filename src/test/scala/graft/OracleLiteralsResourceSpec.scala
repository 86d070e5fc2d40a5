package graft

/** Pins the COMMITTED literal snapshot against freshly computed models
  * at sf0.01, the driver's verify scale — across BOTH channels:
  *
  *   - the COMPILED-IN [[OracleLiteralsSnapshot]] (what a cold oracle
  *     render consumes on ANY classpath that can call
  *     `SparkEntry.oracleSql` — the primary channel since VERDICT r10
  *     proved a resource file can miss the driver's render classpath);
  *   - the committed resource `src/main/resources/graft/
  *     oracle_literals.b64` (the secondary refresh channel).
  *
  * If a model definition, the corpus hashing, or the literal rendering
  * ever changes without regenerating the snapshot, a cold render would
  * inject STALE literals and every stash-dependent oracle would fail —
  * this spec turns that into a red test instead. Regeneration is
  * deterministic on any host (exact integer counts + StrictMath.log +
  * BigDecimal HALF_UP): `sbt "runMain graft.SnapshotGen"` then commit
  * the regenerated source + resource.
  */
class OracleLiteralsResourceSpec extends SparkSpec {

  private val sf001 = "/root/testdata/sf0.01"

  // reuse the EXACT decode path a cold render uses — a private copy here
  // could drift from the wire format and validate with stale parsing
  private def decodeSnapshot(text: String): Map[String, String] =
    OracleLiterals.decode(text)

  private def compiledText: String = {
    val t = OracleLiterals.compiledText
    assert(t.isDefined,
      "compiled snapshot is EMPTY — run graft.SnapshotGen and commit " +
        OracleLiterals.SourcePath)
    t.get
  }

  test("compiled snapshot == freshly computed sf0.01 models, all keys") {
    // building these queries stashes their literal fragments (models
    // collect bounded metadata — a few small Spark jobs)
    for (q <- SnapshotGen.StashQueries)
      SparkEntry.queries(q)(spark, sf001)
    val snap = decodeSnapshot(compiledText)
    for (k <- SnapshotGen.StashKeys) {
      // read the in-process stash DIRECTLY: OracleLiterals.get falls
      // back to the persisted snapshot, which would mask a query build
      // that stopped stashing — exactly the regression this spec exists
      // to catch
      val fresh = OracleLiterals.stashed(k)
      assert(fresh.isDefined, s"$k: query build did not stash a literal")
      assert(snap.contains(k), s"$k: not in the compiled snapshot")
      assert(fresh.get == snap(k),
        s"$k: compiled snapshot is STALE — run graft.SnapshotGen and " +
          s"commit (fresh model differs)\nfresh:     " +
          s"${fresh.get.take(200)}…\ncompiled: ${snap(k).take(200)}…")
    }
  }

  test("committed resource (secondary channel) matches the compiled snapshot") {
    val p = java.nio.file.Paths.get(
      "src/main/resources/graft/oracle_literals.b64")
    assert(java.nio.file.Files.exists(p),
      s"committed literal snapshot missing: $p")
    assert(java.nio.file.Files.readString(p) == compiledText,
      "src/main/resources/graft/oracle_literals.b64 drifted from the " +
        "compiled OracleLiteralsSnapshot — run graft.SnapshotGen and " +
        "commit both")
  }
}
