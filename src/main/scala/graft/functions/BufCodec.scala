package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.nio.charset.StandardCharsets

/** Hand-rolled binary codec for the ML-aggregate buffers.
  *
  * Every partial/final hop of a distributed aggregation serializes the
  * buffer once per group, so the wire format matters on wide shuffles:
  * `ObjectOutputStream` writes class descriptors and handles per object
  * (~10x the payload for small maps, plus reflection cost). This codec
  * writes exactly the entries: a tag byte per scalar, fixed-width
  * numerics, length-prefixed UTF-8 strings.
  */
object BufCodec {

  private def writeSV(o: DataOutputStream, sv: SV): Unit = sv match {
    case SV.LongV(v) => o.writeByte(0); o.writeLong(v)
    case SV.DblV(v)  => o.writeByte(1); o.writeDouble(v)
    case SV.StrV(v)  =>
      o.writeByte(2)
      val b = v.getBytes(StandardCharsets.UTF_8)
      o.writeInt(b.length); o.write(b)
    case SV.BoolV(v) => o.writeByte(3); o.writeBoolean(v)
  }

  private def readSV(i: DataInputStream): SV = i.readByte() match {
    case 0 => SV.LongV(i.readLong())
    case 1 => SV.DblV(i.readDouble())
    case 2 =>
      val b = new Array[Byte](i.readInt()); i.readFully(b)
      SV.StrV(new String(b, StandardCharsets.UTF_8))
    case 3 => SV.BoolV(i.readBoolean())
    case t => throw new IllegalStateException(s"bad SV tag $t")
  }

  private def out(): (ByteArrayOutputStream, DataOutputStream) = {
    val bos = new ByteArrayOutputStream(64)
    (bos, new DataOutputStream(bos))
  }

  def writeCountMap(b: CountMapBuf): Array[Byte] = {
    val (bos, o) = out()
    o.writeInt(b.m.size)
    b.m.foreach { case (sv, c) => writeSV(o, sv); o.writeLong(c) }
    o.flush(); bos.toByteArray
  }

  def readCountMap(bytes: Array[Byte]): CountMapBuf = {
    val i = new DataInputStream(new ByteArrayInputStream(bytes))
    val b = new CountMapBuf
    var n = i.readInt()
    while (n > 0) { b.m.update(readSV(i), i.readLong()); n -= 1 }
    b
  }

  private def writeBaseAcc(o: DataOutputStream, a: BaseAcc): Unit = {
    o.writeLong(a.count); o.writeDouble(a.sum)
    o.writeBoolean(a.min != null); if (a.min != null) writeSV(o, a.min)
    o.writeBoolean(a.max != null); if (a.max != null) writeSV(o, a.max)
  }

  private def readBaseAcc(i: DataInputStream): BaseAcc = {
    val a = new BaseAcc
    a.count = i.readLong(); a.sum = i.readDouble()
    if (i.readBoolean()) a.min = readSV(i)
    if (i.readBoolean()) a.max = readSV(i)
    a
  }

  def writeCateMap(b: CateMapBuf): Array[Byte] = {
    val (bos, o) = out()
    o.writeInt(b.m.size)
    b.m.foreach { case (sv, a) => writeSV(o, sv); writeBaseAcc(o, a) }
    o.flush(); bos.toByteArray
  }

  def readCateMap(bytes: Array[Byte]): CateMapBuf = {
    val i = new DataInputStream(new ByteArrayInputStream(bytes))
    val b = new CateMapBuf
    var n = i.readInt()
    while (n > 0) { b.m.update(readSV(i), readBaseAcc(i)); n -= 1 }
    b
  }

  def writeRatio(b: RatioBuf): Array[Byte] = {
    val (bos, o) = out()
    o.writeInt(b.m.size)
    b.m.foreach { case (sv, a) => writeSV(o, sv); o.writeLong(a(0)); o.writeLong(a(1)) }
    o.flush(); bos.toByteArray
  }

  def readRatio(bytes: Array[Byte]): RatioBuf = {
    val i = new DataInputStream(new ByteArrayInputStream(bytes))
    val b = new RatioBuf
    var n = i.readInt()
    while (n > 0) { b.m.update(readSV(i), Array(i.readLong(), i.readLong())); n -= 1 }
    b
  }
}
