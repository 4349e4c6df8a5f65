package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeSet, GenericInternalRow, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types._

/**
 * Whole-operator top-k cosine scoring — SURVEY §2.10 escalation path (c):
 * a custom logical node + [[GraftStrategy]] + [[CosineTopKExec]] physical
 * operator, the step past the codegen'd
 * [[graft.functions.CosineSimilarity]] expression.
 *
 * The declarative form ([[graft.ext.Similarity.bruteForceTopK]]) plans
 *   scan → score every (vector, probe) → Exchange on probe → Window
 *   row_number → filter rn <= k
 * which shuffles |vectors| × |probes| scored triples. This operator fuses
 * score + select into ONE pass: each partition keeps a bounded
 * (score desc, id asc) buffer of size k per probe, then the
 * partitions × probes × k survivors — kilobytes, independent of table
 * size — merge in a single narrow task. No exchange, no window, nothing
 * row-count-shaped ever moves.
 *
 * Binary node: `left` is the vectors relation projected to (id LONG,
 * vec ARRAY<numeric>), `right` the probes projected to (probe_id LONG,
 * probe_vec ARRAY<numeric>). The probe side is collected at execution —
 * the same driver materialization a broadcast build side pays — so the
 * node composes with any probe sub-plan and is reachable by the
 * [[FuseCosineTopK]] optimizer rule, not just the programmatic API.
 *
 * Semantics match bruteForceTopK exactly: sequential-sum double cosine
 * (the [[graft.functions.CosineSimilarity]] arithmetic), HALF_UP 6-digit
 * rounding WITH the +1e-9 nudge before ranking, (score desc, id asc)
 * total order, exactly k rows per probe. Zero-norm vectors score NULL
 * there and are skipped here.
 */
case class CosineTopK(k: Int, output: Seq[Attribute],
                      left: LogicalPlan, right: LogicalPlan) extends BinaryNode {
  // the output attributes are minted by this operator (or adopted from the
  // matched pattern by FuseCosineTopK), not computed from child columns —
  // declare them produced or the analyzer flags them missing
  override def producedAttributes: AttributeSet = AttributeSet(output)
  // no expression here references the children's columns, so without this
  // the optimizer's ColumnPruning inserts an empty Project below (e.g.
  // under a count(*)) and execution loses the columns it reads positionally
  override def references: AttributeSet = left.outputSet ++ right.outputSet
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): CosineTopK =
    copy(left = newLeft, right = newRight)
}

/** Bounded top-k buffer over (score desc, id asc): sorted insertion into
  * flat arrays — k is small, so binary search + memmove beats a heap's
  * constant factor and emits already in output order. */
private[graft] final class TopKBuffer(k: Int) {
  private val scores = new Array[Double](k)
  private val ids = new Array[Long](k)
  private var n = 0

  @inline private def better(s1: Double, i1: Long, s2: Double, i2: Long): Boolean =
    s1 > s2 || (s1 == s2 && i1 < i2)

  def offer(score: Double, id: Long): Unit = {
    if (n == k && !better(score, id, scores(n - 1), ids(n - 1))) return
    var lo = 0; var hi = n
    while (lo < hi) {
      val m = (lo + hi) >>> 1
      if (better(score, id, scores(m), ids(m))) hi = m else lo = m + 1
    }
    val last = if (n < k) n else k - 1
    var i = last
    while (i > lo) { scores(i) = scores(i - 1); ids(i) = ids(i - 1); i -= 1 }
    scores(lo) = score; ids(lo) = id
    if (n < k) n += 1
  }

  def foreach(f: (Double, Long) => Unit): Unit = {
    var i = 0
    while (i < n) { f(scores(i), ids(i)); i += 1 }
  }
}

object CosineTopKExec {
  /** Sequential-sum cosine, identical arithmetic to the codegen'd
    * CosineSimilarity expression; NaN marks the zero-norm (NULL) case. */
  def cosine(a: Array[Double], b: Array[Double]): Double = {
    val n = math.min(a.length, b.length)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a(i); val y = b(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) Double.NaN else dot / denom
  }

  /** Sum of squares of the first `n` elements. The accumulator sequence
    * (`acc += x*x` left to right) is the same add sequence [[cosine]]'s
    * `na`/`nb` accumulators execute, so hoisting it out of the per-pair
    * loop is bit-identical IEEE arithmetic, not an approximation. */
  @inline def sumSq(a: Array[Double], n: Int): Double = {
    var s = 0.0; var i = 0
    while (i < n) { val x = a(i); s += x * x; i += 1 }
    s
  }

  /** Dot product of the first `n` elements — the only per-(row, probe)
    * work left once both norms are precomputed. */
  @inline def dotN(a: Array[Double], b: Array[Double], n: Int): Double = {
    var s = 0.0; var i = 0
    while (i < n) { s += a(i) * b(i); i += 1 }
    s
  }

  /** Spark-identical round(x + 1e-9, 6): shortest-decimal HALF_UP. */
  def round6(x: Double): Double =
    java.math.BigDecimal.valueOf(x + 1e-9)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Copy row's array column 1 (numeric elements) into a double array;
    * NULL elements contribute 0.0, matching CosineSimilarity. */
  private[plans] def vecOf(row: InternalRow, elemIsFloat: Boolean): Array[Double] = {
    val ad = row.getArray(1)
    val v = new Array[Double](ad.numElements())
    var i = 0
    while (i < v.length) {
      v(i) = if (ad.isNullAt(i)) 0.0
             else if (elemIsFloat) ad.getFloat(i).toDouble
             else ad.getDouble(i)
      i += 1
    }
    v
  }

  /** [[vecOf]] into a caller-owned scratch buffer (grown on demand):
    * returns the element count; the hot path makes zero allocations per
    * row. */
  private[plans] def vecInto(row: InternalRow, elemIsFloat: Boolean,
                             scratch: Array[Double]): (Array[Double], Int) = {
    val ad = row.getArray(1)
    val n = ad.numElements()
    val v = if (n <= scratch.length) scratch else new Array[Double](n)
    var i = 0
    while (i < n) {
      v(i) = if (ad.isNullAt(i)) 0.0
             else if (elemIsFloat) ad.getFloat(i).toDouble
             else ad.getDouble(i)
      i += 1
    }
    (v, n)
  }
}

/**
 * Physical fused cosine top-k. On columnar input (evaluated, declined):
 * the vector child is a projection (id cast + element cast) over the
 * scan, and ProjectExec is row-based, so `executeColumnar` is never
 * offered here — consuming parquet batches directly would mean folding
 * the projection into this operator and re-implementing its casts
 * against ColumnarBatch. The kernel is already dot-only with
 * precomputed norms, a reused scratch buffer, and zero per-row
 * allocation; the remaining row-iterator overhead is the
 * UnsafeRow array-header decode, a small fraction of the measured
 * 0.26 s at sf0.1 — not worth a second input path that would fork the
 * operator's correctness surface.
 */
case class CosineTopKExec(k: Int, output: Seq[Attribute],
                          left: SparkPlan, right: SparkPlan) extends BinaryExecNode {
  import CosineTopKExec._

  override def producedAttributes: AttributeSet = AttributeSet(output)

  override protected def doExecute(): RDD[InternalRow] = {
    val leftIsFloat =
      left.output(1).dataType.asInstanceOf[ArrayType].elementType == FloatType
    val rightIsFloat =
      right.output(1).dataType.asInstanceOf[ArrayType].elementType == FloatType
    // the probe side is driver-collected exactly like a broadcast build
    // side — small by contract (it parameterizes the scoring pass)
    val probeRows = right.executeCollect()
    val pIds = new Array[Long](probeRows.length)
    val pVecs = new Array[Array[Double]](probeRows.length)
    var pi = 0
    probeRows.foreach { r =>
      if (!r.isNullAt(0) && !r.isNullAt(1)) {
        pIds(pi) = r.getLong(0)
        pVecs(pi) = vecOf(r, rightIsFloat)
        pi += 1
      }
    }
    val nProbes = pi
    val kk = k
    // pass 1 (map-side, the only pass over the data): bounded buffers.
    // The kernel is restructured so the per-(row, probe) loop is
    // dot-only: probe norms are computed ONCE here, the row norm once
    // per row, and rows are read into a reused scratch buffer — same
    // accumulator sequences as `cosine`, so bit-identical results with
    // ~1/3 the flops and zero per-row allocation.
    val pNorms = Array.tabulate(nProbes)(p => sumSq(pVecs(p), pVecs(p).length))
    val partials: RDD[(Int, Double, Long)] = left.execute().mapPartitions { iter =>
      val bufs = Array.fill(nProbes)(new TopKBuffer(kk))
      var scratch = new Array[Double](64)
      iter.foreach { row =>
        if (!row.isNullAt(0) && !row.isNullAt(1)) {
          val id = row.getLong(0)
          val (v, vLen) = vecInto(row, leftIsFloat, scratch)
          if (v.length > scratch.length) scratch = v
          val naFull = sumSq(v, vLen)
          var p = 0
          while (p < nProbes) {
            val pv = pVecs(p)
            val n = math.min(vLen, pv.length)
            // norms cover exactly the first n elements `cosine` would
            // sum; the precomputed full-length values apply whenever the
            // pairing doesn't truncate that side (always, for the usual
            // equal-dim corpus)
            val na = if (n == vLen) naFull else sumSq(v, n)
            val nb = if (n == pv.length) pNorms(p) else sumSq(pv, n)
            val denom = math.sqrt(na) * math.sqrt(nb)
            if (denom != 0.0) {
              val s = dotN(v, pv, n) / denom
              if (!s.isNaN) bufs(p).offer(round6(s), id)
            }
            p += 1
          }
        }
      }
      val out = Array.newBuilder[(Int, Double, Long)]
      var p = 0
      while (p < bufs.length) {
        val pp = p
        bufs(pp).foreach((s, id) => out += ((pp, s, id)))
        p += 1
      }
      out.result().iterator
    }
    // pass 2: merge partitions × probes × k survivors in one task.
    // shuffle = true is load-bearing: a NARROW coalesce(1) fuses the
    // scoring pass into the single merge task (CoalescedRDD computes its
    // parents sequentially in one task), silently serializing the whole
    // O(|vectors|×|probes|) kernel on one core no matter how many input
    // splits the scan yields (measured r14: the entire fused-kNN family
    // ran 1-task). The shuffle boundary moves only the bounded partials
    // — partitions × probes × k triples, kilobytes — and restores
    // map-side parallelism; merge content is order-invariant (total
    // order on (score desc, id asc), one row per id), so the output is
    // bit-identical.
    partials.coalesce(1, shuffle = true).mapPartitions { iter =>
      val bufs = Array.fill(nProbes)(new TopKBuffer(kk))
      iter.foreach { case (p, s, id) => bufs(p).offer(s, id) }
      val proj = UnsafeProjection.create(Array[DataType](LongType, LongType, DoubleType))
      val row = new GenericInternalRow(3)
      val res = Array.newBuilder[InternalRow]
      var p = 0
      while (p < bufs.length) {
        bufs(p).foreach { (s, id) =>
          row.update(0, pIds(p)); row.update(1, id); row.update(2, s)
          res += proj(row).copy()
        }
        p += 1
      }
      res.result().iterator
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): CosineTopKExec =
    copy(left = newLeft, right = newRight)
}

/** Planner strategy mapping the logical node to the physical operator;
  * installed per-session through the public `experimental.extraStrategies`
  * hook or via `spark.sql.extensions=graft.functions.GraftExtensions`
  * (`SparkSessionExtensions.injectPlannerStrategy`). */
object GraftStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case n: CosineTopK =>
      CosineTopKExec(n.k, n.output, planLater(n.left), planLater(n.right)) :: Nil
    case _ => Nil
  }

  def install(spark: org.apache.spark.sql.SparkSession): Unit = synchronized {
    val exp = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].experimental
    if (!exp.extraStrategies.contains(this))
      exp.extraStrategies = exp.extraStrategies :+ this
  }
}
