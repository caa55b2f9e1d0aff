package graft.queries

object EventQueries extends QueryGroup {
  val defs: Map[String, QueryDef] = Map()
}
