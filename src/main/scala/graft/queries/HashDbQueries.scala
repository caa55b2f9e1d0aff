package graft.queries

object HashDbQueries extends QueryGroup {
  val defs: Map[String, QueryDef] = Map()
}
