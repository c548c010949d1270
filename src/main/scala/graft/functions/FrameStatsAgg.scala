package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.types._

/** ONE-PASS sliding-frame stats: (cents sum, min, max) of a double
  * column in a single declarative aggregate with a 3-field buffer.
  *
  * Why one aggregate instead of `sum().over(w)` + `min().over(w)` +
  * `max().over(w)`: Spark's SlidingWindowFunctionFrame RE-AGGREGATES
  * the whole frame for every output row, once PER AGGREGATE PROCESSOR
  * — three separate window aggregates over a k=60 frame cost three
  * full frame replays per row (3·k buffer-row reads and generated-
  * projection updates each). Measured on the 100M-event decade
  * (SCALING.md round 14): 116.9 s as three DECIMAL/double frame
  * aggregates, 103.9 s with the sum routed through long cents but
  * still three processors, vs the r11-basis 55.1 s for the ONE-
  * aggregate collect_list form (one replay, but it allocates a k-array
  * per row and re-scans it). This aggregate is the best of both: ONE
  * frame replay per row, no per-row allocation — three scalar buffer
  * fields updated by one generated projection.
  *
  * Semantics match the per-stat forms exactly: null inputs are skipped
  * (all-null frame ⇒ all-null struct fields); the sum accumulates
  * Spark-cast-faithful integer cents ([[CentsArraySum.cents]] — the
  * caller divides by 100.0, which equals Decimal(18,2).toDouble);
  * min/max are plain double Least/Greatest with Spark's null-skipping.
  * Non-finite values contribute cents 0 to the sum (the cast-to-null →
  * sum-skips equivalence) and propagate into min/max like any double —
  * identical to the collect_list + CentsArraySum/array_min/array_max
  * path it replaces above the window-array artifact's size gate. */
case class FrameStatsAgg(value: Expression) extends DeclarativeAggregate {

  override def children: Seq[Expression] = Seq(value)
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("cs", LongType),
    StructField("mn", DoubleType),
    StructField("mx", DoubleType)))

  private lazy val cs = AttributeReference("cs", LongType)()
  private lazy val mn = AttributeReference("mn", DoubleType)()
  private lazy val mx = AttributeReference("mx", DoubleType)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] = Seq(cs, mn, mx)

  override lazy val initialValues: Seq[Expression] = Seq(
    Literal.create(null, LongType),
    Literal.create(null, DoubleType),
    Literal.create(null, DoubleType))

  override lazy val updateExpressions: Seq[Expression] = Seq(
    If(IsNull(value), cs,
      Add(Coalesce(Seq(cs, Literal(0L))), CentsValue(value))),
    // Least/Greatest skip nulls: null value keeps the buffer, null
    // buffer takes the value — exactly min()/max()'s update
    Least(Seq(mn, value)),
    Greatest(Seq(mx, value)))

  override lazy val mergeExpressions: Seq[Expression] = Seq(
    If(And(IsNull(cs.left), IsNull(cs.right)), Literal.create(null, LongType),
      Add(Coalesce(Seq(cs.left, Literal(0L))), Coalesce(Seq(cs.right, Literal(0L))))),
    Least(Seq(mn.left, mn.right)),
    Greatest(Seq(mx.left, mx.right)))

  override lazy val evaluateExpression: Expression = CreateNamedStruct(Seq(
    Literal("cs"), cs, Literal("mn"), mn, Literal("mx"), mx))

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): FrameStatsAgg =
    copy(value = newChildren.head)
}

// NEGATIVE RESULT (round 15), recorded so it is not retried: a sibling
// "FrameSum2Agg" (struct of two long sums in one buffer, for the
// two-moment indicators: Bollinger/breakout Σcents+Σcents², RSI
// Σgain+Σloss) measured STRICTLY WORSE than two plain sum().over(w)
// calls at the 100M-event decade — bollinger 74.1 → 86.7 s warm, RSI
// 31.5 → 400 s (solo JVMs, both directions, artifacts in SCALING.md
// round 15). Two reasons, established by the A/B: (1) WindowExec
// groups ALL aggregates sharing one frame spec into a single
// AggregateProcessor pass — "one replay per aggregate" is per FRAME,
// not per function, so there was no replay to save; (2) Catalyst
// extracts the children of built-in window aggregates into the
// pre-window projection (evaluated once per input row), while the
// custom aggregate's children were re-evaluated inside every frame
// update — k× per output row, catastrophic when the child is a
// decimal multiply (the RSI 12.7× regression). FrameStatsAgg above
// stands on its own committed A/B (SCALING.md round 14: 86.0 s vs
// 103.9/116.9 for the three-builtin forms on this host class) and its
// call site passes a bare column reference, so neither failure mode
// applies to it.
