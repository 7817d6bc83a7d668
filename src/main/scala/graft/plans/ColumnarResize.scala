package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.execution.vectorized.OnHeapColumnVector
import org.apache.spark.sql.types.{IntegerType, LongType}
import org.apache.spark.sql.vectorized.{ColumnVector, ColumnarBatch}

/** The COLUMNAR multimodal map path (SURVEY §4.2 rung (c) in full:
  * custom LogicalPlan + SparkStrategy + columnar SparkPlan; VERDICT r12
  * missing #6): the mapPartitions twin `multimodal_resize` processes one
  * Row at a time; production multimodal pipelines process columnar
  * batches (the `mapInArrow` shape — in Scala Spark, an operator with
  * `supportsColumnar = true` consuming [[ColumnarBatch]]es, the same
  * vectorized batch layout Arrow interop uses). The planner's transition
  * rule (ApplyColumnarRulesAndInsertTransitions) inserts RowToColumnar /
  * ColumnarToRow around this node automatically, so the exec only ever
  * sees whole batches — zero per-row iterator overhead inside the
  * kernel, and the boundary a real media decode/resize library (which
  * wants contiguous buffers) plugs into.
  *
  * The transform is bit-identical to `multimodal_resize`'s box filter:
  * each 4-byte block of the binary payload averaged to one output
  * "pixel" (integer floor mean, trailing partial block averaged over its
  * real length), reduced to (n_bytes, n_out, first_px, checksum).
  */
case class ColumnarResizePlan(child: LogicalPlan,
    override val output: Seq[Attribute] = ColumnarResizePlan.freshOutput())
    extends UnaryNode {
  // output rides as a case-class PARAMETER, not a computed val: optimizer
  // transforms copy the node (withNewChildInternal → copy), and a
  // computed val would mint fresh exprIds on every copy, orphaning every
  // downstream reference (measured: ATTRIBUTE_NOT_FOUND on the first
  // sort above this node)
  override protected def withNewChildInternal(newChild: LogicalPlan): ColumnarResizePlan =
    copy(child = newChild)
  // the output attributes are PRODUCED here, not forwarded from the child
  // — without this the analyzer's missingInput check rejects the node
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(output)
}

object ColumnarResizePlan {
  /** One fresh attribute set per NODE CONSTRUCTION (not per copy). */
  def freshOutput(): Seq[Attribute] = Seq(
    AttributeReference("doc_id", LongType, nullable = false)(),
    AttributeReference("n_bytes", IntegerType, nullable = false)(),
    AttributeReference("n_out", IntegerType, nullable = false)(),
    AttributeReference("first_px", LongType, nullable = false)(),
    AttributeReference("checksum", LongType, nullable = false)())
}

/** Plans [[ColumnarResizePlan]] as [[ColumnarResizeExec]]. Attached either
  * via `spark.experimental.extraStrategies` (the vanilla driver session —
  * GraftBridge.addStrategy) or injectPlannerStrategy in [[GraftExtensions]]. */
object ColumnarResizeStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case p: ColumnarResizePlan =>
      // Fail at PLAN time, not mid-task, if a future caller wires in a
      // child whose first two columns aren't the (doc_id BIGINT,
      // payload BINARY) layout the exec reads positionally (ADVICE r13).
      val types = p.child.output.take(2).map(_.dataType)
      require(types == Seq(LongType, org.apache.spark.sql.types.BinaryType),
        s"ColumnarResizePlan child must lead with (BIGINT, BINARY), got $types")
      ColumnarResizeExec(planLater(p.child), p.output) :: Nil
    case _ => Nil
  }
}

/** Columnar physical operator: consumes input [[ColumnarBatch]]es
  * (doc_id BIGINT, payload BINARY), emits output batches of the resize
  * summary. Map-only and partition-preserving — no shuffle, the same
  * 100 TB contract as the row twin, minus the per-row iterator. */
case class ColumnarResizeExec(child: SparkPlan, output: Seq[Attribute])
    extends UnaryExecNode {

  override def supportsColumnar: Boolean = true

  override def outputPartitioning: org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] =
    throw new IllegalStateException(
      "ColumnarResizeExec is columnar-only — the planner inserts ColumnarToRow above it")

  override protected def doExecuteColumnar(): RDD[ColumnarBatch] = {
    val outSchema = org.apache.spark.sql.types.StructType(
      output.map(a => org.apache.spark.sql.types.StructField(a.name, a.dataType, a.nullable)))
    child.executeColumnar().map { batch =>
      val n = batch.numRows()
      val ids = batch.column(0)
      val pays = batch.column(1)
      val out = OnHeapColumnVector.allocateColumns(n, outSchema)
      var r = 0
      while (r < n) {
        // Null gate (ADVICE r13/r14): the node declares non-nullable output
        // and the one internal call site feeds non-null encodes; a null
        // doc_id/payload from a future consumer FAILS FAST with a named
        // error pointing at this row, instead of an unattributed NPE from
        // deep inside the batch loop. (Deliberately not a silent
        // empty-payload summary: a null here means the upstream contract
        // was broken, and masking it would corrupt dedup/quality stats
        // downstream.)
        if (ids.isNullAt(r) || pays.isNullAt(r))
          throw new IllegalArgumentException(
            s"ColumnarResizeExec: null doc_id/payload at batch row $r — " +
              "the resize contract requires non-null inputs (filter upstream)")
        val id = ids.getLong(r)
        val bytes = pays.getBinary(r)
        val nOut = (bytes.length + 3) / 4
        var ck = 0L
        var first = -1L
        var blk = 0
        while (blk < nOut) {
          val from = blk * 4
          val to = math.min(from + 4, bytes.length)
          var sum = 0L
          var i = from
          while (i < to) { sum += bytes(i) & 0xff; i += 1 }
          val px = sum / (to - from) // integer floor mean
          if (blk == 0) first = px
          ck = (ck + px * (blk + 1L)) % 997L
          blk += 1
        }
        out(0).putLong(r, id)
        out(1).putInt(r, bytes.length)
        out(2).putInt(r, nOut)
        out(3).putLong(r, first)
        out(4).putLong(r, ck)
        r += 1
      }
      new ColumnarBatch(out.asInstanceOf[Array[ColumnVector]], n)
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): ColumnarResizeExec =
    copy(child = newChild)
}
