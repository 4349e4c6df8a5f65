package graft.queries

/**
 * LLM-training-data extension operators (dedup, similarity search, text
 * analysis) as oracle-checkable queries — populated incrementally; see
 * graft.ext.
 */
object ExtQueries {
  def defs: Seq[QueryDef] = Seq.empty
}
