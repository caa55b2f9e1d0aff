package graft.queries

object TextQueries extends QueryGroup {
  val defs: Map[String, QueryDef] = Map()
}
