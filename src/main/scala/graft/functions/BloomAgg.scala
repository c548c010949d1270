package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType}

/** BLOOM FILTER as a custom aggregate + membership expression — the
  * runtime-filter pattern (a semi-join reduced to a fixed-size bitset)
  * made explicit and portable. Spark's own optimizer injects the same
  * shape behind `spark.sql.optimizer.runtime.bloomFilter.enabled` when
  * statistics line up; owning the operator makes the pruning
  * unconditional, deterministic, and reusable against ANY key-carrying
  * side (including sources Spark cannot see statistics for).
  *
  * Layout: `numBits` (a power of two) bits in long words; each input
  * key (a 64-bit hash computed upstream, e.g. xxhash64) sets
  * `numHashes` positions derived by the double-hashing scheme
  * h_i = h1 + i·h2 (Kirsch–Mitzenmacher: two mixes simulate k
  * independent hash functions). Update is branch-free bit sets; merge
  * is wordwise OR — associative and commutative, so map-side partial
  * aggregation applies and only one bitset per partition shuffles.
  *
  * At the default 2^20 bits / 4 hashes the filter is 128 KiB — small
  * enough to broadcast anywhere — and holds ~1% false positives at
  * ~150k distinct keys (FPR ≈ (1 − e^{−kn/m})^k). False positives are
  * SAFE by construction: the consumer re-joins exactly afterwards, the
  * bloom only prunes what the join would drop anyway.
  */
case class BloomAgg(
    child: Expression,
    numBits: Int,
    numHashes: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require((numBits & (numBits - 1)) == 0 && numBits >= 64,
    s"numBits must be a power of two >= 64, got $numBits")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](numBits / 64)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) BloomBits.set(buf, v.asInstanceOf[Long], numHashes)
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = serialize(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(o: Int): BloomAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BloomAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): BloomAgg =
    copy(child = cs.head)
}

/** Shared bit arithmetic — one definition so the setter and the probe
  * can never drift apart. */
object BloomBits {
  /** Second independent mix of the upstream 64-bit hash (splitmix64
    * finalizer with a different stir than the input hash). */
  @inline def mix(h: Long): Long = {
    var z = h + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  @inline def set(words: Array[Long], hash: Long, numHashes: Int): Unit = {
    val mask = words.length * 64 - 1
    val h2 = mix(hash) | 1L // odd step → full-period probing on 2^k bits
    var i = 0
    while (i < numHashes) {
      val bit = ((hash + i * h2) & mask).toInt
      words(bit >> 6) |= 1L << (bit & 63)
      i += 1
    }
  }

  @inline def contains(bytes: Array[Byte], hash: Long, numHashes: Int): Boolean = {
    val numBits = bytes.length * 8
    val mask = numBits - 1
    val h2 = mix(hash) | 1L
    var i = 0
    while (i < numHashes) {
      val bit = ((hash + i * h2) & mask).toInt
      // big-endian long words, as ByteBuffer.putLong wrote them
      val word = bit >> 6
      val byteInWord = 7 - ((bit & 63) >> 3)
      val b = bytes(word * 8 + byteInWord)
      if (((b >> (bit & 7)) & 1) == 0) return false
      i += 1
    }
    true
  }
}

/** Membership probe against a [[BloomAgg]] bitset (binary column,
  * usually broadcast as a 1-row cross join). Codegen'd: the generated
  * filter calls the same static [[BloomBits.contains]] the interpreted
  * path uses, so the probe stays inside whole-stage codegen on the
  * probe side's scan; numHashes must match the builder's. */
case class BloomMightContain(left: Expression, right: Expression,
    numHashes: Int)
  extends BinaryExpression {

  override def dataType: DataType = BooleanType

  override def nullSafeEval(bloom: Any, hash: Any): Any =
    BloomBits.contains(bloom.asInstanceOf[Array[Byte]],
      hash.asInstanceOf[Long], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, h) =>
      s"${ev.value} = graft.functions.BloomBits.contains($b, $h, $numHashes);")

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): BloomMightContain =
    copy(left = l, right = r)
}
