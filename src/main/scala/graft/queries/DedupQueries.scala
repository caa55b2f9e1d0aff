package graft.queries

object DedupQueries extends QueryGroup {
  val defs: Map[String, QueryDef] = Map()
}
