package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import graft.queries.Registry

/** Generates the machine-readable half of SURVEY.md §2.0 — the registered
  * query battery — straight from [[graft.queries.Registry]], so the
  * coverage doc can never drift from the code (the round-7 verdict's
  * "registry-driven §2.0 generation" item: 200+ hand-maintained rows were
  * one abbreviation away from hiding queries from a literal grep).
  *
  * The generated block lives between BEGIN/END markers inside SURVEY.md;
  * everything outside the markers stays hand-written. RegistrySpec asserts
  * the committed block equals [[block]] verbatim (the CI diff check), so a
  * query added without re-running `sbt "runMain graft.tools.CoverageGen"`
  * fails the build rather than silently missing from the docs.
  */
object CoverageGen {

  val Begin = "<!-- BEGIN GENERATED: registry coverage " +
    "(sbt \"runMain graft.tools.CoverageGen\" - do not edit by hand) -->"
  val End = "<!-- END GENERATED: registry coverage -->"

  /** The generated markdown between the markers (exclusive). Deterministic:
    * groups in registry order, names sorted within a group.
    */
  def block: String = {
    val groups = Registry.groups.map { g =>
      val name = g.getClass.getSimpleName.stripSuffix("$")
      val keys = g.defs.keys.toSeq.sorted
      val rowsOnly = g.defs.filter(_._2.oracle.isEmpty).keys.toSeq.sorted
      (name, keys, rowsOnly)
    }
    val total = groups.map(_._2.size).sum
    val noOracle = groups.map(_._3.size).sum
    val header =
      s"""#### Registered query battery (generated from the Registry)
         |
         |**$total registered queries** across ${groups.size} groups;
         |${total - noOracle} DuckDB-oracle-gated (rows+schema+hash), $noOracle rows-only.
         |Names marked ° have no oracle SQL and get the driver's weaker
         |rows-only check.
         |
         || group | n | queries |
         ||---|---|---|""".stripMargin
    val rows = groups.map { case (name, keys, rowsOnly) =>
      val marked = keys.map(k =>
        if (rowsOnly.contains(k)) s"`$k`°" else s"`$k`")
      s"| $name | ${keys.size} | ${marked.mkString(", ")} |"
    }
    (header +: rows).mkString("\n")
  }

  /** Rewrites SURVEY.md's generated block in place (inserting it at the
    * end of §2.0, just before the `### 2.1` heading, if absent).
    */
  def main(args: Array[String]): Unit = {
    val path = Paths.get(args.headOption.getOrElse("SURVEY.md"))
    val text = new String(Files.readAllBytes(path), StandardCharsets.UTF_8)
    val wrapped = s"$Begin\n$block\n$End"
    val out =
      if (text.contains(Begin)) {
        val pre = text.substring(0, text.indexOf(Begin))
        val post = text.substring(text.indexOf(End) + End.length)
        pre + wrapped + post
      } else {
        val anchor = "### 2.1 "
        val i = text.indexOf(anchor)
        require(i >= 0, s"no $anchor heading in $path to anchor insertion")
        text.substring(0, i) + wrapped + "\n\n" + text.substring(i)
      }
    Files.write(path, out.getBytes(StandardCharsets.UTF_8))
    println(s"wrote generated coverage block (${Registry.all.size} queries) to $path")
  }
}
