package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The ML-oriented aggregate family of the reference engine
  * (`top*`, `topn_frequency`, `top1_ratio`, `*_cate`, `*_cate_where`,
  * `top_n_{key,value}_*_cate_where`, `top_n_{key,value}_ratio_cate`),
  * re-expressed as native Catalyst `TypedImperativeAggregate`s so they
  * run distributed (partial update + merge across partitions) in both
  * `GROUP BY` and `OVER` window frames.
  *
  * Output contract (reference: src/runtime/operators/window/top/README.md
  * "Common Output Format"):
  *  - CSV strings; key/metric pairs as `key:metric`.
  *  - `top(value, n)`: CSV of values desc, duplicates preserved.
  *  - `top1_ratio`: Float64.
  *  - `*_cate`: parts sorted lexicographically by the formatted
  *    `"cate:value"` string (reference: cate/accumulator.rs:282-295).
  *  - top-n orderings: KeyDesc = key desc; MetricDesc = metric desc then
  *    key desc (reference: top/heap.rs:47-63).
  */
abstract class GraftTypedAgg[T <: AnyRef] extends TypedImperativeAggregate[T] {
  protected def foldToInt(e: Expression, name: String): Int = {
    require(e.foldable, s"$name requires a literal n")
    e.eval(InternalRow.empty) match {
      case n: Number => n.intValue()
      case other     => throw new IllegalArgumentException(s"$name: bad n literal $other")
    }
  }
}

/** Count-map buffer shared by top / topn_frequency / top1_ratio. */
final class CountMapBuf extends Serializable {
  val m: mutable.HashMap[SV, Long] = mutable.HashMap.empty
  def add(sv: SV, c: Long = 1L): Unit = m.update(sv, m.getOrElse(sv, 0L) + c)
  def mergeIn(o: CountMapBuf): Unit = o.m.foreach { case (k, v) => add(k, v) }
}

/** Shuffle codec for count-map-buffered aggregates (BufCodec, not Java
  * serialization: every partial/final hop pays this per group). */
trait CountMapSer { self: TypedImperativeAggregate[CountMapBuf] =>
  final override def serialize(b: CountMapBuf): Array[Byte] = BufCodec.writeCountMap(b)
  final override def deserialize(bytes: Array[Byte]): CountMapBuf = BufCodec.readCountMap(bytes)
}

/** `top(value, n)`: top n values desc, duplicates preserved, CSV. */
case class TopValues(
    value: Expression,
    nExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends GraftTypedAgg[CountMapBuf] with CountMapSer {

  private lazy val n = foldToInt(nExpr, "top")
  override def prettyName: String = "top"
  override def children: Seq[Expression] = Seq(value, nExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = StringType
  override def createAggregationBuffer(): CountMapBuf = new CountMapBuf
  override def update(b: CountMapBuf, input: InternalRow): CountMapBuf = {
    SV.fromCatalyst(value.eval(input), value.dataType).foreach(b.add(_)); b
  }
  override def merge(b: CountMapBuf, o: CountMapBuf): CountMapBuf = { b.mergeIn(o); b }
  override def eval(b: CountMapBuf): Any = {
    val sorted = b.m.toSeq.sortBy(_._1)(SV.Desc)
    val out = new mutable.ArrayBuffer[String](n)
    var remaining = n
    val it = sorted.iterator
    while (remaining > 0 && it.hasNext) {
      val (sv, cnt) = it.next()
      var i = math.min(cnt, remaining.toLong)
      val s = sv.format
      while (i > 0) { out += s; i -= 1; remaining -= 1 }
    }
    UTF8String.fromString(out.mkString(","))
  }
  override def withNewMutableAggBufferOffset(o: Int): ImperativeAggregate = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ImperativeAggregate = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(value = c(0), nExpr = c(1))
}

/** `distinct_count(value)`: exact distinct count as DOUBLE (the batch /
  * WindowExec twin of the streaming engine's `distinct_count` kind —
  * Spark has no COUNT(DISTINCT) OVER, this aggregate supplies it). */
case class DistinctCount(
    value: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends GraftTypedAgg[CountMapBuf] with CountMapSer {

  override def prettyName: String = "distinct_count"
  override def children: Seq[Expression] = Seq(value)
  override def nullable: Boolean = false
  override def dataType: DataType = DoubleType
  override def createAggregationBuffer(): CountMapBuf = new CountMapBuf
  override def update(b: CountMapBuf, input: InternalRow): CountMapBuf = {
    SV.fromCatalyst(value.eval(input), value.dataType).foreach(b.add(_)); b
  }
  override def merge(b: CountMapBuf, o: CountMapBuf): CountMapBuf = { b.mergeIn(o); b }
  override def eval(b: CountMapBuf): Any = b.m.size.toDouble
  override def withNewMutableAggBufferOffset(o: Int): ImperativeAggregate = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ImperativeAggregate = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(value = c(0))
}

/** The one exact-median walk shared by this batch UDAF and the streaming
  * engine's `median` kind (SlidingWindows.finish) — engine-vs-batch
  * parity depends on the two paths computing identically. */
object MedianMath {
  /** Median of a (value -> count) multiset; null when empty; even totals
    * average the two middles (quantile_cont(0.5) on discrete rows). */
  def exact(m: Iterable[(Double, Long)]): Any =
    if (m.isEmpty) null
    else {
      val sorted = m.toSeq.sortBy(_._1)
      val n = sorted.iterator.map(_._2).sum
      def valueAt(pos: Long): Double = {
        var seen = 0L
        val it = sorted.iterator
        while (it.hasNext) {
          val (v, c) = it.next()
          seen += c
          if (seen >= pos) return v
        }
        sorted.last._1
      }
      if (n % 2 == 1) valueAt(n / 2 + 1)
      else (valueAt(n / 2) + valueAt(n / 2 + 1)) / 2.0
    }
}

/** `graft_median(value)`: exact median as DOUBLE, from the same count-map
  * state (even counts average the two middle values — quantile_cont(0.5)
  * on discrete rows). Registered under its OWN name, not over the builtin:
  * Spark's `median` refuses window frames, so frames call graft_median,
  * while plain GROUP BY keeps builtin semantics (DECIMAL stays DECIMAL,
  * non-numeric columns still fail at analysis). The engine's `median`
  * window kind and this UDAF share MedianMath for batch/engine parity. */
case class MedianValue(
    value: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends GraftTypedAgg[CountMapBuf] with CountMapSer {

  override def prettyName: String = "graft_median"
  override def children: Seq[Expression] = Seq(value)
  override def nullable: Boolean = true
  override def dataType: DataType = DoubleType
  override def createAggregationBuffer(): CountMapBuf = new CountMapBuf
  override def update(b: CountMapBuf, input: InternalRow): CountMapBuf = {
    SV.fromCatalyst(value.eval(input), value.dataType).foreach {
      case sv @ (_: SV.LongV | _: SV.DblV) => b.add(sv)
      case other => throw new IllegalArgumentException(
        s"median needs a numeric column, got $other")
    }
    b
  }
  override def merge(b: CountMapBuf, o: CountMapBuf): CountMapBuf = { b.mergeIn(o); b }
  override def eval(b: CountMapBuf): Any = {
    def dbl(sv: SV): Double = sv match {
      case SV.LongV(v) => v.toDouble
      case SV.DblV(v)  => v
      case _           => Double.NaN
    }
    MedianMath.exact(b.m.iterator.map { case (sv, c) => (dbl(sv), c) }.toSeq)
  }
  override def withNewMutableAggBufferOffset(o: Int): ImperativeAggregate = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ImperativeAggregate = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(value = c(0))
}

/** `topn_frequency(value, n)`: top n values by frequency desc (ties: value desc), CSV. */
case class TopNFrequency(
    value: Expression,
    nExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends GraftTypedAgg[CountMapBuf] with CountMapSer {

  private lazy val n = foldToInt(nExpr, "topn_frequency")
  override def prettyName: String = "topn_frequency"
  override def children: Seq[Expression] = Seq(value, nExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = StringType
  override def createAggregationBuffer(): CountMapBuf = new CountMapBuf
  override def update(b: CountMapBuf, input: InternalRow): CountMapBuf = {
    SV.fromCatalyst(value.eval(input), value.dataType).foreach(b.add(_)); b
  }
  override def merge(b: CountMapBuf, o: CountMapBuf): CountMapBuf = { b.mergeIn(o); b }
  override def eval(b: CountMapBuf): Any = {
    val sorted = b.m.toSeq.sortWith { case ((k1, c1), (k2, c2)) =>
      if (c1 != c2) c1 > c2 else SV.cmp(k1, k2) > 0
    }
    UTF8String.fromString(sorted.take(n).map(_._1.format).mkString(","))
  }
  override def withNewMutableAggBufferOffset(o: Int): ImperativeAggregate = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ImperativeAggregate = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(value = c(0), nExpr = c(1))
}

/** `top1_ratio(value)`: freq(top-1 value) / total non-null rows, Float64. */
case class Top1Ratio(
    value: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends GraftTypedAgg[CountMapBuf] with CountMapSer {

  override def prettyName: String = "top1_ratio"
  override def children: Seq[Expression] = Seq(value)
  override def nullable: Boolean = true
  override def dataType: DataType = DoubleType
  override def createAggregationBuffer(): CountMapBuf = new CountMapBuf
  override def update(b: CountMapBuf, input: InternalRow): CountMapBuf = {
    SV.fromCatalyst(value.eval(input), value.dataType).foreach(b.add(_)); b
  }
  override def merge(b: CountMapBuf, o: CountMapBuf): CountMapBuf = { b.mergeIn(o); b }
  override def eval(b: CountMapBuf): Any = {
    if (b.m.isEmpty) null
    else {
      val total = b.m.valuesIterator.sum
      val top = b.m.valuesIterator.max
      top.toDouble / total.toDouble
    }
  }
  override def withNewMutableAggBufferOffset(o: Int): ImperativeAggregate = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ImperativeAggregate = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(value = c(0))
}

// ---------------------------------------------------------------------------
// cate family
// ---------------------------------------------------------------------------

sealed trait AggKind extends Serializable
object AggKind {
  case object Sum extends AggKind
  case object Avg extends AggKind
  case object Count extends AggKind
  case object Min extends AggKind
  case object Max extends AggKind
  val all: Seq[(String, AggKind)] =
    Seq("sum" -> Sum, "avg" -> Avg, "count" -> Count, "min" -> Min, "max" -> Max)
}

/** Per-category base accumulator (sum/count/min/max cover all kinds). */
final class BaseAcc extends Serializable {
  var count: Long = 0L
  var sum: Double = 0.0
  var min: SV = _
  var max: SV = _
  def add(v: SV): Unit = {
    count += 1; sum += SV.toDouble(v)
    if (min == null || SV.cmp(v, min) < 0) min = v
    if (max == null || SV.cmp(v, max) > 0) max = v
  }
  def mergeIn(o: BaseAcc): Unit = {
    count += o.count; sum += o.sum
    if (o.min != null && (min == null || SV.cmp(o.min, min) < 0)) min = o.min
    if (o.max != null && (max == null || SV.cmp(o.max, max) > 0)) max = o.max
  }
  def result(kind: AggKind): Option[SV] =
    if (count == 0) None
    else kind match {
      case AggKind.Sum   => Some(SV.DblV(sum))
      case AggKind.Avg   => Some(SV.DblV(sum / count))
      case AggKind.Count => Some(SV.LongV(count))
      case AggKind.Min   => Some(min)
      case AggKind.Max   => Some(max)
    }
}

final class CateMapBuf extends Serializable {
  val m: mutable.HashMap[SV, BaseAcc] = mutable.HashMap.empty
  def acc(cate: SV): BaseAcc = m.getOrElseUpdate(cate, new BaseAcc)
  def mergeIn(o: CateMapBuf): Unit = o.m.foreach { case (k, a) => acc(k).mergeIn(a) }
}

sealed trait CateOutputMode extends Serializable
object CateOutputMode {
  /** `x_cate` / `x_cate_where`: all categories, parts sorted lexicographically. */
  case object SortedCsv extends CateOutputMode
  /** `top_n_key_x_cate_where`: top n categories by key desc. */
  case object TopNKey extends CateOutputMode
  /** `top_n_value_x_cate_where`: top n by aggregate value desc, then key desc. */
  case object TopNValue extends CateOutputMode
}

/** Covers `{sum,avg,count,min,max}_cate[_where]` and
  * `top_n_{key,value}_{sum,avg,count,min,max}_cate_where`.
  * Rows where `cate` is null, or `cond` (when present) is not true, are ignored.
  */
case class CateAgg(
    kind: AggKind,
    mode: CateOutputMode,
    value: Expression,
    cond: Option[Expression],
    cate: Expression,
    nExpr: Option[Expression],
    fnName: String,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends GraftTypedAgg[CateMapBuf] {

  override def serialize(b: CateMapBuf): Array[Byte] = BufCodec.writeCateMap(b)
  override def deserialize(bytes: Array[Byte]): CateMapBuf = BufCodec.readCateMap(bytes)

  private lazy val n = nExpr.map(foldToInt(_, fnName)).getOrElse(Int.MaxValue)
  override def prettyName: String = fnName
  override def children: Seq[Expression] = Seq(value) ++ cond.toSeq ++ Seq(cate) ++ nExpr.toSeq
  override def nullable: Boolean = false
  override def dataType: DataType = StringType
  override def createAggregationBuffer(): CateMapBuf = new CateMapBuf

  override def update(b: CateMapBuf, input: InternalRow): CateMapBuf = {
    val condOk = cond.forall { c => c.eval(input) == true }
    if (condOk) {
      SV.fromCatalyst(cate.eval(input), cate.dataType).foreach { cateKey =>
        val a = b.acc(cateKey)
        SV.fromCatalyst(value.eval(input), value.dataType).foreach(a.add)
      }
    }
    b
  }
  override def merge(b: CateMapBuf, o: CateMapBuf): CateMapBuf = { b.mergeIn(o); b }

  override def eval(b: CateMapBuf): Any = {
    val entries: Seq[(SV, SV)] = b.m.toSeq.flatMap { case (k, a) =>
      a.result(kind).map(r => (k, r))
    }
    val parts: Seq[String] = mode match {
      case CateOutputMode.SortedCsv =>
        entries.map { case (k, r) => s"${k.format}:${r.format}" }.sorted
      case CateOutputMode.TopNKey =>
        entries.sortBy(_._1)(SV.Desc).take(n).map { case (k, r) => s"${k.format}:${r.format}" }
      case CateOutputMode.TopNValue =>
        entries.sortWith { case ((k1, r1), (k2, r2)) =>
          val c = SV.cmp(r1, r2)
          if (c != 0) c > 0 else SV.cmp(k1, k2) > 0
        }.take(n).map { case (k, r) => s"${k.format}:${r.format}" }
    }
    UTF8String.fromString(parts.mkString(","))
  }
  override def withNewMutableAggBufferOffset(o: Int): ImperativeAggregate = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ImperativeAggregate = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression = {
    var i = 0
    val v = c(i); i += 1
    val co = cond.map { _ => val x = c(i); i += 1; x }
    val ca = c(i); i += 1
    val ne = nExpr.map { _ => val x = c(i); i += 1; x }
    copy(value = v, cond = co, cate = ca, nExpr = ne)
  }
}

/** Per-category ratio buffer: total (value & cate non-null) and matched (cond true). */
final class RatioBuf extends Serializable {
  val m: mutable.HashMap[SV, Array[Long]] = mutable.HashMap.empty // [total, matched]
  def acc(cate: SV): Array[Long] = m.getOrElseUpdate(cate, Array(0L, 0L))
  def mergeIn(o: RatioBuf): Unit = o.m.foreach { case (k, v) =>
    val a = acc(k); a(0) += v(0); a(1) += v(1)
  }
}

/** `top_n_{key,value}_ratio_cate(value, cond, cate, n)`: per category,
  * matched/total ratio; top n by key desc (`key`) or ratio desc then key desc
  * (`value`). Reference: top/accumulators/ratio.rs.
  */
case class RatioCate(
    byValue: Boolean,
    value: Expression,
    cond: Expression,
    cate: Expression,
    nExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends GraftTypedAgg[RatioBuf] {

  override def serialize(b: RatioBuf): Array[Byte] = BufCodec.writeRatio(b)
  override def deserialize(bytes: Array[Byte]): RatioBuf = BufCodec.readRatio(bytes)

  private lazy val n = foldToInt(nExpr, prettyName)
  override def prettyName: String = if (byValue) "top_n_value_ratio_cate" else "top_n_key_ratio_cate"
  override def children: Seq[Expression] = Seq(value, cond, cate, nExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = StringType
  override def createAggregationBuffer(): RatioBuf = new RatioBuf
  override def update(b: RatioBuf, input: InternalRow): RatioBuf = {
    val vOpt = SV.fromCatalyst(value.eval(input), value.dataType)
    if (vOpt.nonEmpty) {
      SV.fromCatalyst(cate.eval(input), cate.dataType).foreach { cateKey =>
        val a = b.acc(cateKey)
        a(0) += 1
        if (cond.eval(input) == true) a(1) += 1
      }
    }
    b
  }
  override def merge(b: RatioBuf, o: RatioBuf): RatioBuf = { b.mergeIn(o); b }
  override def eval(b: RatioBuf): Any = {
    val entries: Seq[(SV, Double)] = b.m.toSeq.collect {
      case (k, a) if a(0) > 0 => (k, a(1).toDouble / a(0).toDouble)
    }
    val picked =
      if (byValue) entries.sortWith { case ((k1, r1), (k2, r2)) =>
        if (r1 != r2) r1 > r2 else SV.cmp(k1, k2) > 0
      }.take(n)
      else entries.sortBy(_._1)(SV.Desc).take(n)
    UTF8String.fromString(
      picked.map { case (k, r) => s"${k.format}:${SV.formatFloat(r)}" }.mkString(","))
  }
  override def withNewMutableAggBufferOffset(o: Int): ImperativeAggregate = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ImperativeAggregate = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(value = c(0), cond = c(1), cate = c(2), nExpr = c(3))
}
