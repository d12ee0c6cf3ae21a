package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{DataType, LongType}

/** Bounded KMV (k-minimum-values) state: the k smallest DISTINCT
  * 60-bit hashes seen so far. Insert is O(log k); memory is O(k)
  * regardless of group cardinality — the property that makes the
  * sketch viable where an exact distinct would shuffle the whole
  * vocabulary. */
final class KmvState(val k: Int) {
  val set = new java.util.TreeSet[java.lang.Long]()
  def insert(h: Long): Unit =
    if (set.size < k) { set.add(h); () }
    else if (h < set.last()) { if (set.add(h)) { set.pollLast(); () } }
  def merge(o: KmvState): Unit = {
    val it = o.set.iterator()
    while (it.hasNext) insert(it.next())
  }
}

/** Mergeable distinct-count sketch over a BIGINT hash column —
  * deterministic KMV rather than HLL, so a SQL engine re-derives the
  * EXACT same estimate from the same hashes (row_number window to the
  * k-th smallest): the sketch stays inside the cross-engine
  * correctness gate, which no randomized-register sketch can.
  *
  * Estimate: exact size while < k distinct hashes were seen;
  * otherwise (k-1) * 2^60 div h_k with h_k the k-th smallest distinct
  * hash (hashes must be uniform in [0, 2^60), e.g. 15-hex-digit md5
  * prefixes). The division is exact integer arithmetic (BigInt, both
  * operands positive, truncating — identical to HUGEINT `//`).
  *
  * Scale: partial-aggregable — map-side partials carry at most k
  * longs per group and merges are bounded unions, so a billion-row
  * group contributes k*8 bytes to the shuffle where count_distinct
  * would shuffle every distinct value. */
case class KmvDistinctAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvState] {

  require(k >= 2 && k <= 65536, "k must be in 2..65536")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"kmv_distinct hash must be BIGINT, got ${child.dataType.sql}")

  override def createAggregationBuffer(): KmvState = new KmvState(k)

  override def update(buf: KmvState, input: InternalRow): KmvState = {
    val v = child.eval(input)
    if (v != null) buf.insert(v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: KmvState, other: KmvState): KmvState = {
    buf.merge(other); buf
  }

  private val pow60 = BigInt(1) << 60

  override def eval(buf: KmvState): Any =
    if (buf.set.size < k) buf.set.size.toLong
    else (BigInt(k - 1) * pow60 / BigInt(buf.set.last())).toLong

  override def serialize(buf: KmvState): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.set.size)
    bb.putInt(buf.set.size)
    val it = buf.set.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): KmvState = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val st = new KmvState(k)
    var i = 0
    while (i < n) { st.insert(bb.getLong); i += 1 }
    st
  }

  override def withNewMutableAggBufferOffset(o: Int): KmvDistinctAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KmvDistinctAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): KmvDistinctAgg = copy(child = cs.head)
  override def prettyName: String = "kmv_distinct"
}

object KmvSketch {
  /** KMV distinct-count estimate of a BIGINT hash column (see
    * [[KmvDistinctAgg]]). Use as an aggregate: df.groupBy(...)
    * .agg(kmv_distinct(col("h"), 64)). */
  def kmv_distinct(hash: Column, k: Int): Column =
    GraftColumnBridge.column(
      KmvDistinctAgg(GraftColumnBridge.expression(hash), k)
        .toAggregateExpression())
}
