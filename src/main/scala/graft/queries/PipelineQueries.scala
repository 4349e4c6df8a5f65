package graft.queries

/**
 * The five reference pipelines (SURVEY §3) re-expressed over the fixture
 * tables as end-to-end oracle-checkable queries — populated incrementally;
 * see graft.pipelines.
 */
object PipelineQueries {
  def defs: Seq[QueryDef] = Seq.empty
}
