package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestBase

class RegistrySpec extends AnyFunSuite with SparkTestBase {

  test("no duplicate query names across groups (Map flattening would drop them)") {
    val names = Registry.groups.flatMap(_.defs.keys)
    val dups = names.groupBy(identity).filter(_._2.size > 1).keys
    assert(dups.isEmpty, s"duplicate query names: $dups")
    assert(Registry.all.size == names.size)
  }

  test("every oracle belongs to a registered query and oracle coverage is high") {
    val oracled = Registry.all.count(_._2.oracle.isDefined)
    assert(oracled >= 88, s"oracle coverage regressed: $oracled")
    assert(Registry.all.size >= 89)
    // at most ONE query may lack an oracle (the multi-digest rows-only
    // exception) — a second one means someone forgot to write theirs
    assert(Registry.all.size - oracled <= 1,
      "a new query landed without a DuckDB oracle")
    // SparkEntry contract: oracleSql keys ⊆ queries keys
    assert(graft.SparkEntry.oracleSql.keySet.subsetOf(graft.SparkEntry.queries.keySet))
  }

  test("every query builds a non-empty plan against sf0.001 lazily") {
    // analysis-time sanity: every builder produces a resolvable DataFrame
    Registry.all.foreach { case (name, q) =>
      val df = q.build(spark, sf())
      assert(df.schema.fields.nonEmpty, s"$name yields an empty schema")
    }
  }
}
