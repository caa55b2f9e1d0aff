package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Registry integrity: a duplicate query key silently DROPS a query
  * (Scala Map literals keep the last entry; Registry.all's toMap keeps
  * the last group) — exactly how round 7's q_text_repetition collision
  * shadowed the original query until the battery count was audited.
  * Scala cannot see a Map literal's duplicates after construction, so
  * this spec counts the `"…" -> QueryDef(` key literals in each query
  * group's SOURCE and requires the constructed map to be the same size,
  * plus cross-group key uniqueness.
  */
class RegistrySpec extends AnyFunSuite {

  private val srcDir = java.nio.file.Paths.get("src/main/scala/graft/queries")
  // a key literal mapping to a QueryDef( literal OR a named QueryDef val
  // (PipelineQueries' corpusReport); query keys all start with q
  private val keyRe = """"(q[A-Za-z0-9_]*)"\s*->\s*(QueryDef\(|\w+,)""".r

  test("no query group's Map literal drops a duplicated key") {
    assume(java.nio.file.Files.isDirectory(srcDir), "source tree present")
    val fileFor = Map[QueryGroup, String](
      AnalyticsQueries -> "AnalyticsQueries.scala",
      HashDbQueries -> "HashDbQueries.scala",
      DedupQueries -> "DedupQueries.scala",
      TextQueries -> "TextQueries.scala",
      SimilarityQueries -> "SimilarityQueries.scala",
      EventQueries -> "EventQueries.scala",
      MultimodalQueries -> "MultimodalQueries.scala",
      PipelineQueries -> "PipelineQueries.scala")
    assert(fileFor.keySet == Registry.groups.toSet,
      "every registry group must be covered by this audit")
    fileFor.foreach { case (group, file) =>
      val src = new String(java.nio.file.Files.readAllBytes(
        srcDir.resolve(file)), java.nio.charset.StandardCharsets.UTF_8)
      val keys = keyRe.findAllMatchIn(src).map(_.group(1)).toSeq
      val dupes = keys.groupBy(identity).filter(_._2.size > 1).keys
      assert(dupes.isEmpty, s"$file declares duplicate keys: $dupes")
      assert(keys.size == group.defs.size,
        s"$file declares ${keys.size} QueryDef keys but the map holds " +
          s"${group.defs.size} — a duplicate key dropped a query")
    }
  }

  test("query keys are unique across groups") {
    val perGroup = Registry.groups.map(_.defs.keySet)
    val total = perGroup.map(_.size).sum
    assert(total == Registry.all.size,
      s"cross-group key collision: $total declared vs " +
        s"${Registry.all.size} registered")
  }

  test("SURVEY.md's generated coverage block matches the Registry — " +
    "re-run `sbt \"runMain graft.tools.CoverageGen\"` after adding a query") {
    // the diff half of the registry-driven §2.0 generation: the committed
    // block must equal what CoverageGen would emit right now, so the
    // battery listing can never drift from the code
    import graft.tools.CoverageGen
    val p = java.nio.file.Paths.get("SURVEY.md")
    assume(java.nio.file.Files.exists(p), "SURVEY.md present")
    val text = new String(java.nio.file.Files.readAllBytes(p),
      java.nio.charset.StandardCharsets.UTF_8)
    assert(text.contains(CoverageGen.Begin),
      "SURVEY.md lacks the generated coverage block markers")
    val committed = text.substring(
      text.indexOf(CoverageGen.Begin) + CoverageGen.Begin.length,
      text.indexOf(CoverageGen.End)).trim
    assert(committed == CoverageGen.block.trim,
      "SURVEY.md's generated block is stale — run " +
        "`sbt \"runMain graft.tools.CoverageGen\"` and commit the diff")
  }

  test("every registered query name appears LITERALLY in SURVEY.md and " +
    "BASELINE.md — the coverage docs can't abbreviate names out of a grep") {
    // the generalization of the duplicate-key gate: registry ↔ docs
    // parity stays mechanically checkable (a literal grep must find
    // 100% of registered names — abbreviated families like
    // "q_events_… / _sessions" once hid four queries)
    Seq("SURVEY.md", "BASELINE.md").foreach { doc =>
      val p = java.nio.file.Paths.get(doc)
      assume(java.nio.file.Files.exists(p), s"$doc present")
      val text = new String(java.nio.file.Files.readAllBytes(p),
        java.nio.charset.StandardCharsets.UTF_8)
      val missing = Registry.all.keySet.filterNot(text.contains).toSeq.sorted
      assert(missing.isEmpty,
        s"$doc is missing registered query names (write them out in " +
          s"full, not as abbreviations): $missing")
    }
  }
}
