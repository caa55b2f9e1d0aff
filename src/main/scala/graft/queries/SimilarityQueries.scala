package graft.queries

object SimilarityQueries extends QueryGroup {
  val defs: Map[String, QueryDef] = Map()
}
