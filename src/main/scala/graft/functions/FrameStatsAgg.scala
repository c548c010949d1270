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

/** ONE-PASS pair of long frame sums: struct(s1, s2) = (sum(a), sum(b))
  * in a single declarative aggregate with a 2-field long buffer.
  *
  * Same motivation as [[FrameStatsAgg]], for the indicator shapes that
  * need TWO sums over one frame rather than (sum, min, max) of one
  * column: Bollinger/breakout need Σcents and Σcents² for the rolling
  * moments, RSI needs Σgain and Σloss. As two `sum().over(w)` calls
  * Spark plans two aggregate processors and SlidingWindowFunctionFrame
  * replays the whole k-row frame once PER PROCESSOR per output row;
  * folding both into one aggregate halves the frame replays (the
  * dominant cost of the event-scale indicator family at the generated
  * decades — SCALING.md round 14 established replay count, not stat
  * kind, as the wall).
  *
  * Null semantics match `sum(LONG)` slot-for-slot: null inputs are
  * skipped, an all-null (or empty) frame yields a null slot. Callers
  * pass already-long expressions (cents conversions), so every update
  * is a bare long add — no allocation, fully codegen-friendly. */
case class FrameSum2Agg(a: Expression, b: Expression) extends DeclarativeAggregate {

  override def children: Seq[Expression] = Seq(a, b)
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("s1", LongType),
    StructField("s2", LongType)))

  private lazy val s1 = AttributeReference("s1", LongType)()
  private lazy val s2 = AttributeReference("s2", LongType)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] = Seq(s1, s2)

  override lazy val initialValues: Seq[Expression] = Seq(
    Literal.create(null, LongType),
    Literal.create(null, LongType))

  override lazy val updateExpressions: Seq[Expression] = Seq(
    If(IsNull(a), s1, Add(Coalesce(Seq(s1, Literal(0L))), a)),
    If(IsNull(b), s2, Add(Coalesce(Seq(s2, Literal(0L))), b)))

  override lazy val mergeExpressions: Seq[Expression] = Seq(
    If(And(IsNull(s1.left), IsNull(s1.right)), Literal.create(null, LongType),
      Add(Coalesce(Seq(s1.left, Literal(0L))), Coalesce(Seq(s1.right, Literal(0L))))),
    If(And(IsNull(s2.left), IsNull(s2.right)), Literal.create(null, LongType),
      Add(Coalesce(Seq(s2.left, Literal(0L))), Coalesce(Seq(s2.right, Literal(0L))))))

  override lazy val evaluateExpression: Expression = CreateNamedStruct(Seq(
    Literal("s1"), s1, Literal("s2"), s2))

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): FrameSum2Agg =
    copy(a = newChildren(0), b = newChildren(1))
}
