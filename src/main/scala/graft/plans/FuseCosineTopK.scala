package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, IntegerType, LongType, NumericType}

import graft.functions.CosineSimilarity

/**
 * Optimizer rule that recognizes the DECLARATIVE cosine top-k pattern —
 * what a user writes with plain DataFrame code (score every pair against
 * a broadcast probe side, rank per probe, keep k):
 *
 *   Project [probe, id, score]
 *   +- Filter (rn <= k)
 *      +- Window [row_number() over (partition by probe
 *                                    order by score desc, id asc) as rn]
 *         +- [WindowGroupLimit]                        (inserted by Spark)
 *            +- Project [probe, id,
 *                        round(graft_cosine(vec, pvec) + 1e-9, 6) as score]
 *               +- Join Cross|Inner (no condition)
 *                  :- vectors                           (outputs id, vec)
 *                  +- probes                            (outputs probe, pvec)
 *
 * and rewrites it to the fused [[CosineTopK]] operator: one bounded-buffer
 * pass over the vectors, no Exchange, no Window — the user keeps the
 * declarative form, the engine plans the operator a 100 TB scan needs.
 * This is the whole-plan twin of Spark's own InferWindowGroupLimit: that
 * rule bounds the sort, this one deletes the scored-pair shuffle entirely.
 *
 * The match is deliberately exact on semantics it must preserve: the
 * round(+1e-9, 6) score (what [[CosineTopKExec.round6]] replicates),
 * row_number (not rank — exactly-k), (score desc, id asc) order with the
 * id tiebreak, LONG ids, and a condition-free inner/cross join. Anything
 * else is left for Catalyst to plan normally. Known contract divergence
 * (inherited from [[CosineTopK]], documented there): zero-norm vectors
 * score NULL declaratively and sort last; the fused operator skips them —
 * identical output whenever each probe has ≥ k non-degenerate candidates.
 *
 * Injected by `graft.functions.GraftExtensions`
 * (`SparkSessionExtensions.injectOptimizerRule`), which also installs
 * [[GraftStrategy]] so the fused node always has a physical plan.
 */
object FuseCosineTopK extends Rule[LogicalPlan] {

  /** The Spark-inserted WindowGroupLimit (if any) between Window and its
    * input is subsumed by the fused operator. */
  private def stripGroupLimit(plan: LogicalPlan): LogicalPlan = plan match {
    case wgl: WindowGroupLimit => wgl.child
    case other => other
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case outer @ Project(outProj,
          Filter(LessThanOrEqual(rnRef: AttributeReference, Literal(k: Int, IntegerType)),
            Window(
              Seq(rnAlias @ Alias(WindowExpression(RowNumber(), wspec), _)),
              Seq(partAttr: AttributeReference),
              Seq(SortOrder(scoreRef1: AttributeReference, Descending, NullsLast, _),
                  SortOrder(idRef1: AttributeReference, Ascending, NullsFirst, _)),
              wchild, _)))
        if k > 0 && rnRef.exprId == rnAlias.exprId &&
          // the surviving projection uses only the three fused outputs
          outer.references.subsetOf(AttributeSet(Seq(partAttr, idRef1, scoreRef1))) =>
      stripGroupLimit(wchild) match {
        case Project(scoreProj, join @ Join(jLeft, jRight, Cross | Inner, None, _))
            if wspec.partitionSpec == Seq(partAttr) =>
          val fused = tryFuse(k, outProj, partAttr, idRef1, scoreRef1,
            scoreProj, jLeft, jRight)
          fused.map(Project(outProj, _)).getOrElse(outer)
        case _ => outer
      }
  }

  /** Validate the scoring projection and assemble the fused node; None
    * leaves the original plan untouched. */
  private def tryFuse(k: Int, outProj: Seq[NamedExpression],
                      partAttr: AttributeReference, idAttr: AttributeReference,
                      scoreAttr: AttributeReference,
                      scoreProj: Seq[NamedExpression],
                      jLeft: LogicalPlan, jRight: LogicalPlan): Option[CosineTopK] = {
    // the score column must be round(cosine(l, r) + 1e-9, 6) with one
    // argument from each join side
    val scored = scoreProj.collectFirst {
      case a @ Alias(Round(Add(CosineSimilarity(x: AttributeReference,
            y: AttributeReference), Literal(nudge: Double, DoubleType), _),
          Literal(6, IntegerType), _), _)
          if a.exprId == scoreAttr.exprId && nudge == 1e-9 => (x, y)
    }
    scored.flatMap { case (x, y) =>
      val sides: Option[(AttributeReference, AttributeReference)] =
        if (jLeft.outputSet.contains(x) && jRight.outputSet.contains(y)) Some((x, y))
        else if (jLeft.outputSet.contains(y) && jRight.outputSet.contains(x)) Some((y, x))
        else None
      sides.flatMap { case (vecAttr, pvecAttr) =>
      val typesOk =
        idAttr.dataType == LongType && partAttr.dataType == LongType &&
        vecAttr.dataType.isInstanceOf[ArrayType] &&
        vecAttr.dataType.asInstanceOf[ArrayType].elementType.isInstanceOf[NumericType] &&
        pvecAttr.dataType.isInstanceOf[ArrayType] &&
        pvecAttr.dataType.asInstanceOf[ArrayType].elementType.isInstanceOf[NumericType]
      // probe id must come from the probe side, vector id from the scan
      // side, and both must pass through the scoring projection untouched
      val passthrough =
        scoreProj.forall {
          case _: AttributeReference => true
          case a: Alias => a.exprId == scoreAttr.exprId
          case _ => false
        } &&
        jRight.outputSet.contains(partAttr) && jLeft.outputSet.contains(idAttr)
      if (typesOk && passthrough) {
        Some(CosineTopK(k,
          output = Seq(partAttr, idAttr, scoreAttr),
          left = Project(Seq(idAttr, vecAttr), jLeft),
          right = Project(Seq(partAttr, pvecAttr), jRight)))
      } else None
      }
    }
  }
}
