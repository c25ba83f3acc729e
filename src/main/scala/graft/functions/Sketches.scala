package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.types._

/** Mergeable sketch aggregates for cardinality work at scale.
  *
  * `kmv_distinct(hash60, k)` — K-Minimum-Values distinct-count estimator
  * (Bar-Yossef et al. 2002): keep the k smallest DISTINCT 60-bit hashes;
  * with fewer than k distinct hashes the count is exact, otherwise
  * estimate (k-1) * 2^60 / h_k from the k-th smallest hash h_k. State is
  * O(k) longs per group regardless of input cardinality — the property
  * that matters at 100 TB, where exact count-distinct shuffles every
  * distinct value and this shuffles at most k longs per partial.
  *
  * Chosen over HyperLogLog deliberately: KMV on an engine-portable hash
  * (md5-prefix, `Dedup.hash60` — identical in Spark and DuckDB) is fully
  * DETERMINISTIC and replayable by the driver's DuckDB oracle via a
  * row_number window, so the sketch gets a hash-match correctness row,
  * not a weaker rows-only check. Same update/merge/eval algebra as any
  * mergeable sketch: partial per partition, merge across, one eval.
  */
object Sketches {
  /** Hash domain: `Dedup.hash60` yields [0, 2^60). */
  val HashSpan: Double = 1152921504606846976L.toDouble // 2^60
}

/** Bounded sorted set of the k smallest distinct hashes. */
final class KmvBuf(val k: Int) extends Serializable {
  val set: java.util.TreeSet[java.lang.Long] = new java.util.TreeSet[java.lang.Long]()
  def add(h: Long): Unit = {
    if (set.size < k) { set.add(h); () }
    else if (h < set.last && !set.contains(h)) { set.add(h); set.pollLast(); () }
  }
  def mergeIn(o: KmvBuf): Unit = {
    val it = o.set.iterator(); while (it.hasNext) add(it.next())
  }
}

/** `kmv_distinct(hash, k)`: distinct-count estimate (exact below k). */
case class KmvDistinct(
    hash: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends GraftTypedAgg[KmvBuf] {

  private lazy val k = {
    val n = foldToInt(kExpr, "kmv_distinct")
    require(n >= 2, s"kmv_distinct needs k >= 2, got $n")
    n
  }
  override def prettyName: String = "kmv_distinct"
  override def children: Seq[Expression] = Seq(hash, kExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = DoubleType
  override def createAggregationBuffer(): KmvBuf = new KmvBuf(k)
  override def update(b: KmvBuf, input: InternalRow): KmvBuf = {
    def checked(h: Long): KmvBuf = {
      // the (k-1)*2^60/h_k estimator assumes hashes uniform on [0, 2^60)
      // (Dedup.hash60's domain); a signed 64-bit hash (e.g. xxhash64)
      // would silently dominate the k-smallest set with negative values
      // and drive the estimate negative — fail loudly instead
      require(h >= 0 && h < Sketches.HashSpan.toLong,
        s"kmv_distinct expects hashes in [0, 2^60) (Dedup.hash60 domain), got $h")
      b.add(h); b
    }
    hash.eval(input) match {
      case null       => b
      case h: Long    => checked(h)
      case h: Integer => checked(h.longValue)
      case other => throw new IllegalArgumentException(
        s"kmv_distinct expects an integer hash column, got $other")
    }
  }
  override def merge(b: KmvBuf, o: KmvBuf): KmvBuf = { b.mergeIn(o); b }
  override def eval(b: KmvBuf): Any =
    if (b.set.size < k) b.set.size.toDouble
    else (k - 1).toDouble * Sketches.HashSpan / b.set.last.toDouble

  override def serialize(b: KmvBuf): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + 8 * b.set.size)
    bb.putInt(b.k).putInt(b.set.size)
    val it = b.set.iterator(); while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }
  override def deserialize(bytes: Array[Byte]): KmvBuf = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new KmvBuf(bb.getInt)
    var n = bb.getInt
    while (n > 0) { buf.set.add(bb.getLong); n -= 1 }
    buf
  }
  override def withNewMutableAggBufferOffset(o: Int): ImperativeAggregate = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ImperativeAggregate = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(hash = c(0), kExpr = c(1))
}
