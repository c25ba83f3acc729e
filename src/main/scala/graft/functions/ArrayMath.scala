package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Codegen'd integer-array kernels for the similarity/dedup paths.
  *
  * The composable alternative — `aggregate(zip_with(a, b, _ * _), ...)` —
  * is evaluated through interpreted lambda dispatch per element, which is
  * the dominant per-candidate cost when scoring embeddings (a corpus x
  * queries scan evaluates one dot product per candidate pair). This
  * expression is a tight generated loop over the two `ArrayData` buffers
  * inside whole-stage codegen. Results are bit-identical to the
  * higher-order form (same exact integer arithmetic; quantized components
  * are <= 10^4 and dims <= 10^3, so the accumulator can't overflow).
  */
case class DotLong(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def isLongArray(t: DataType): Boolean = t match {
      case ArrayType(LongType, _) => true // element nulls are callers' contract
      case _                      => false
    }
    if (isLongArray(left.dataType) && isLongArray(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"dot_long needs two array<bigint> args, got ${left.dataType} and ${right.dataType}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "dot_long"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L; var i = 0
    while (i < n) { acc += x.getLong(i) * y.getLong(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // freshName per instance: several kernels commonly share one codegen
      // scope (the LSH bucket expressions sum 8-16 dots in one projection),
      // and fixed locals would collide -> Janino failure -> interpreted mode.
      val n = ctx.freshName("n"); val acc = ctx.freshName("acc"); val i = ctx.freshName("i")
      s"""
      int $n = java.lang.Math.min($a.numElements(), $b.numElements());
      long $acc = 0L;
      for (int $i = 0; $i < $n; $i++) { $acc += $a.getLong($i) * $b.getLong($i); }
      ${ev.value} = $acc;"""
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DotLong =
    copy(left = newLeft, right = newRight)
}

/** All `numHashes` MinHash mins of one shingle-hash array in ONE tight
  * generated loop: `mins[j] = min over x of (a(j)*x + b(j)) % p`.
  *
  * The composable form — `numHashes` separate
  * `array_min(transform(sh, x -> (a*x+b)%p))` columns — re-walks the
  * shingle array once per hash through interpreted lambda dispatch:
  * shingles x hashes lambda invocations per ROW, the dominant cost of
  * the streaming dedup path (18.7 s of a 5k-doc sf0.1 replay). Here the
  * generated inner loop does the same shingles x hashes multiplies as
  * plain long arithmetic. Bit-identical results (same exact integer
  * expression; coefficients and hashes are < 2^31 so a*x can't overflow
  * a long).
  */
case class MinHashSig(child: Expression, a: Seq[Long], b: Seq[Long], p: Long)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  // Seq (not Array) coefficients: case-class equality on Array is
  // reference identity, which would break semanticEquals/canonicalization
  // and silently defeat subexpression elimination and exchange reuse for
  // any plan containing the signature twice.

  require(a.length == b.length && a.nonEmpty, "coefficient arrays must match")

  @transient private lazy val aArr: Array[Long] = a.toArray
  @transient private lazy val bArr: Array[Long] = b.toArray

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      // element nulls are callers' contract (same as DotLong): the
      // shingle-hash expression never produces them; a null slot read
      // through getLong would fold b(j)%p into every min
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"minhash_sig needs array<bigint>, got $t")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override protected def nullSafeEval(input: Any): Any = {
    val sh = input.asInstanceOf[ArrayData]
    val h = aArr.length
    val mins = Array.fill(h)(Long.MaxValue)
    var i = 0
    while (i < sh.numElements()) {
      val x = sh.getLong(i)
      var j = 0
      while (j < h) {
        val v = (aArr(j) * x + bArr(j)) % p
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("mhA", aArr, "long[]")
    val bRef = ctx.addReferenceObj("mhB", bArr, "long[]")
    nullSafeCodeGen(ctx, ev, sh => {
      val mins = ctx.freshName("mins"); val i = ctx.freshName("i")
      val j = ctx.freshName("j"); val x = ctx.freshName("x"); val v = ctx.freshName("v")
      s"""
      long[] $mins = new long[$aRef.length];
      java.util.Arrays.fill($mins, Long.MAX_VALUE);
      for (int $i = 0; $i < $sh.numElements(); $i++) {
        long $x = $sh.getLong($i);
        for (int $j = 0; $j < $aRef.length; $j++) {
          long $v = ($aRef[$j] * $x + $bRef[$j]) % ${p}L;
          if ($v < $mins[$j]) $mins[$j] = $v;
        }
      }
      ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);"""
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** `array<bigint>` -> BINARY, big-endian longs — the shuffle-compact ride
  * for wide signature arrays: a Dataset encoder carries `Seq[Long]` as
  * boxed objects (the streaming MinHash replay pushed ~10M boxed longs
  * per pass — 16 band rows x 128 mins per doc); a byte array rides as one
  * memcpy. Decoders read fixed 8-byte blocks — same values, no boxing.
  */
case class PackLongsBE(child: Expression)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"pack_longs needs array<bigint>, got $t")
    }
  override def dataType: DataType = org.apache.spark.sql.types.BinaryType
  override def prettyName: String = "pack_longs"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val out = new Array[Byte](arr.numElements() * 8)
    var i = 0
    while (i < arr.numElements()) {
      val v = arr.getLong(i)
      var j = 0
      while (j < 8) { out(i * 8 + j) = (v >>> (56 - 8 * j)).toByte; j += 1 }
      i += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val out = ctx.freshName("out"); val i = ctx.freshName("i")
      val v = ctx.freshName("v"); val j = ctx.freshName("j")
      s"""
      byte[] $out = new byte[$arr.numElements() * 8];
      for (int $i = 0; $i < $arr.numElements(); $i++) {
        long $v = $arr.getLong($i);
        for (int $j = 0; $j < 8; $j++) {
          $out[$i * 8 + $j] = (byte) ($v >>> (56 - 8 * $j));
        }
      }
      ${ev.value} = $out;"""
    })

  override protected def withNewChildInternal(newChild: Expression): PackLongsBE =
    copy(child = newChild)
}

/** `array<bigint>` -> BINARY, big-endian 4-byte values — [[PackLongsBE]]
  * narrowed for arrays whose values provably fit 32 bits (MinHash mins
  * are `(a*x+b) % P31 < 2^31`): half the shuffle/state bytes of the
  * 8-byte pack, and 4-byte-group equality is value equality (guide §2.3
  * "narrower types", safe because the mod-P fold bounds the domain).
  * Values outside [0, 2^32) would alias — callers own that contract.
  */
case class PackIntsBE(child: Expression)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"pack_ints needs array<bigint>, got $t")
    }
  override def dataType: DataType = org.apache.spark.sql.types.BinaryType
  override def prettyName: String = "pack_ints"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val out = new Array[Byte](arr.numElements() * 4)
    var i = 0
    while (i < arr.numElements()) {
      val v = arr.getLong(i)
      var j = 0
      while (j < 4) { out(i * 4 + j) = (v >>> (24 - 8 * j)).toByte; j += 1 }
      i += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val out = ctx.freshName("out"); val i = ctx.freshName("i")
      val v = ctx.freshName("v"); val j = ctx.freshName("j")
      s"""
      byte[] $out = new byte[$arr.numElements() * 4];
      for (int $i = 0; $i < $arr.numElements(); $i++) {
        long $v = $arr.getLong($i);
        for (int $j = 0; $j < 4; $j++) {
          $out[$i * 4 + $j] = (byte) ($v >>> (24 - 8 * $j));
        }
      }
      ${ev.value} = $out;"""
    })

  override protected def withNewChildInternal(newChild: Expression): PackIntsBE =
    copy(child = newChild)
}

object ArrayMath {

  /** Exact integer dot product of two array<long> columns. */
  def dotLong(a: Column, b: Column): Column =
    ColumnBridge.column(DotLong(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Exact squared L2 norm of an array<long> column. */
  def norm2Long(a: Column): Column = dotLong(a, a)

  /** All MinHash mins of an array<long> shingle-hash column in one
    * codegen'd pass. */
  def minhashSig(sh: Column, a: Seq[Long], b: Seq[Long], p: Long): Column =
    ColumnBridge.column(MinHashSig(ColumnBridge.expression(sh), a.toIndexedSeq, b.toIndexedSeq, p))

  def packLongs(c: Column): Column =
    ColumnBridge.column(PackLongsBE(ColumnBridge.expression(c)))

  def packInts(c: Column): Column =
    ColumnBridge.column(PackIntsBE(ColumnBridge.expression(c)))
}
