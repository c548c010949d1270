package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Bounded top-k-by-key buffer for [[TopKByAgg]]: the k rows with the
  * LARGEST (ord1, ord2) key, parallel-array storage, O(k) replace-min
  * insertion (k is last-5-style small). */
final class TopKBuf(val k: Int) extends Serializable {
  var n = 0
  val o1 = new Array[Long](k)
  val o2 = new Array[Long](k)
  val v  = new Array[Double](k)

  @inline private def less(a1: Long, a2: Long, b1: Long, b2: Long): Boolean =
    a1 < b1 || (a1 == b1 && a2 < b2)

  def insert(a: Long, b: Long, x: Double): Unit = {
    if (n < k) { o1(n) = a; o2(n) = b; v(n) = x; n += 1 }
    else {
      var mi = 0
      var i = 1
      while (i < n) { if (less(o1(i), o2(i), o1(mi), o2(mi))) mi = i; i += 1 }
      if (less(o1(mi), o2(mi), a, b)) { o1(mi) = a; o2(mi) = b; v(mi) = x }
    }
  }

  /** Values ordered by (ord1, ord2) DESCENDING — newest first for
    * time-ordered keys. Compares via [[less]] rather than arithmetic
    * negation: negating Long.MinValue overflows back to itself, which
    * would sort an extreme key as LARGEST instead of smallest. */
  def sortedValuesDesc: Array[Double] =
    (0 until n).sortWith((a, b) => less(o1(b), o2(b), o1(a), o2(a)))
      .map(v).toArray

  /** Full (ord1, ord2, value) entries, same descending order — for
    * callers that must RE-MERGE buffers later (e.g. stateful streaming
    * state carrying its ordering keys across micro-batches). */
  def sortedEntriesDesc: IndexedSeq[(Long, Long, Double)] =
    (0 until n).sortWith((a, b) => less(o1(b), o2(b), o1(a), o2(a)))
      .map(i => (o1(i), o2(i), v(i)))
}

/** Last-k / top-k as ONE custom aggregate (SURVEY §7.3 preference (b)):
  * keeps the VALUES of the k rows with the largest (ord1, ord2) ordering
  * key, emitted newest-first.
  *
  * This is the two-phase fix for the low-cardinality-series window skew:
  * `row_number().over(partitionBy(series).orderBy(ts desc))` sorts EVERY
  * row of a series in one task just to keep k. As an associative,
  * commutative aggregate, partial aggregation applies — each map task
  * reduces its slice to a k-row buffer, only k×partitions tiny buffers
  * shuffle, and no task ever sorts a whole series. Reference semantics:
  * `prices[-5:]` (stream_consumer.py:51).
  *
  * ord1 may be TimestampType or LongType (both are a long internally);
  * ord2 is the unique tiebreaker (event_id), so the result is
  * deterministic.
  */
case class TopKByAgg(
    ord1: Expression,
    ord2: Expression,
    value: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuf] {

  override def children: Seq[Expression] = Seq(ord1, ord2, value)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def createAggregationBuffer(): TopKBuf = new TopKBuf(k)

  override def update(buf: TopKBuf, input: InternalRow): TopKBuf = {
    val a = ord1.eval(input)
    val b = ord2.eval(input)
    val x = value.eval(input)
    if (a != null && b != null && x != null)
      buf.insert(a.asInstanceOf[Long], b.asInstanceOf[Long],
        x.asInstanceOf[Double])
    buf
  }

  override def merge(a: TopKBuf, b: TopKBuf): TopKBuf = {
    var i = 0
    while (i < b.n) { a.insert(b.o1(i), b.o2(i), b.v(i)); i += 1 }
    a
  }

  override def eval(buf: TopKBuf): Any =
    new GenericArrayData(buf.sortedValuesDesc)

  override def serialize(buf: TopKBuf): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + buf.n * 24)
    bb.putInt(buf.k).putInt(buf.n)
    var i = 0
    while (i < buf.n) {
      bb.putLong(buf.o1(i)).putLong(buf.o2(i)).putDouble(buf.v(i))
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuf = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new TopKBuf(bb.getInt())
    val n = bb.getInt()
    var i = 0
    while (i < n) { buf.insert(bb.getLong(), bb.getLong(), bb.getDouble()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKByAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKByAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): TopKByAgg =
    copy(ord1 = cs(0), ord2 = cs(1), value = cs(2))
}
