package graft

import java.nio.ByteBuffer
import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.serving.{ShardLog, ShardLogReader}

/** Unit pins on THE shard-log protocol implementation itself (both
  * serving classes consume it): framing, torn/corrupt tails, the
  * compaction fence ordering, and the reader's reset-and-retry path.
  */
class ShardLogSpec extends AnyFunSuite {

  private def tmp(): String = GraftSession.tempDir("graft_shardlog_")

  test("eachRecord treats a recLen near Int.MaxValue as a torn tail, not an overflow") {
    val good = ShardLog.frame(Array[Byte](1, 2, 3))
    val corrupt = ByteBuffer.allocate(4).putInt(Int.MaxValue - 2).array()
    val bytes = good ++ corrupt ++ Array[Byte](9, 9, 9, 9)
    var seen = List.empty[Seq[Byte]]
    // pos + 4 + recLen overflows Int; the long-arithmetic bounds check
    // must stop cleanly at the corrupt prefix instead of copyOfRange
    // throwing on a negative range
    ShardLog.eachRecord(bytes) { (_, rec) => seen ::= rec.toSeq }
    assert(seen == List(Seq[Byte](1, 2, 3)))
  }

  test("append/frame/eachRecord roundtrip with positions") {
    val root = tmp()
    val recs = Seq("alpha", "bee", "c").map(_.getBytes("UTF-8"))
    ShardLog.append(root, 3, "t.log", recs.flatMap(ShardLog.frame).toArray)
    val log = ShardLog.shardDir(root, 3).resolve("t.log")
    val seen = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    ShardLog.eachRecord(Files.readAllBytes(log)) { (pos, rec) =>
      seen += ((pos, new String(rec, "UTF-8")))
    }
    assert(seen.map(_._2).toSeq == Seq("alpha", "bee", "c"))
    // positions are the length-prefix offsets
    assert(seen.map(_._1).toSeq == Seq(0L, 9L, 16L))
  }

  test("compact bumps gen AFTER the move: a reader observing the new gen sees the new file") {
    val root = tmp()
    (1 to 3).foreach(i => ShardLog.append(root, 0, "t.log",
      ShardLog.frame(s"v$i".getBytes("UTF-8"))))
    assert(ShardLog.genOf(root, 0) == 0L)
    var sawDuringRewrite = -1L
    ShardLog.compact(root, 0, "t.log") { bytes =>
      // inside the rewrite (before move+bump): gen must still be old —
      // the r9 advisory bug bumped first, making a length-equal rewrite
      // permanently invisible to a reader that consumed the gen early
      sawDuringRewrite = ShardLog.genOf(root, 0)
      ShardLog.frame("only".getBytes("UTF-8"))
    }
    assert(sawDuringRewrite == 0L)
    assert(ShardLog.genOf(root, 0) == 1L)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    ShardLog.eachRecord(Files.readAllBytes(
      ShardLog.shardDir(root, 0).resolve("t.log"))) { (_, r) =>
      out += new String(r, "UTF-8")
    }
    assert(out.toSeq == Seq("only"))
  }

  test("reader tails deltas, resets on compaction, and retries once on decode failure") {
    val root = tmp()
    val reader = new ShardLogReader(root, 1, "t.log")
    var state = scala.collection.mutable.ArrayBuffer.empty[String]
    def drain(): Unit =
      reader.refresh(0)(() => state.clear()) { recs =>
        recs.foreach { case (_, r) => state += new String(r, "UTF-8") }
      }
    ShardLog.append(root, 0, "t.log", ShardLog.frame("a".getBytes))
    drain(); assert(state.toSeq == Seq("a"))
    ShardLog.append(root, 0, "t.log", ShardLog.frame("b".getBytes))
    drain(); assert(state.toSeq == Seq("a", "b")) // delta only, no re-read
    ShardLog.compact(root, 0, "t.log")(_ => ShardLog.frame("z".getBytes))
    drain(); assert(state.toSeq == Seq("z")) // gen fence: full reset
    // a consumer decode failure takes the reset-and-retry-once path:
    // first delivery throws, the retry reparses from zero and succeeds
    ShardLog.append(root, 0, "t.log", ShardLog.frame("q".getBytes))
    var threw = false
    reader.refresh(0)(() => state.clear()) { recs =>
      if (!threw) { threw = true; throw new java.io.IOException("simulated race") }
      recs.foreach { case (_, r) => state += new String(r, "UTF-8") }
    }
    assert(threw && state.toSeq == Seq("z", "q"))
  }

  test("torn tail: reader does not advance past an incomplete record until completed") {
    val root = tmp()
    val reader = new ShardLogReader(root, 1, "t.log")
    val state = scala.collection.mutable.ArrayBuffer.empty[String]
    def drain(): Unit =
      reader.refresh(0)(() => state.clear()) { recs =>
        recs.foreach { case (_, r) => state += new String(r, "UTF-8") }
      }
    val full = ShardLog.frame("hello".getBytes)
    ShardLog.append(root, 0, "t.log", full.take(6)) // prefix + 2 payload bytes
    drain(); assert(state.isEmpty)
    ShardLog.append(root, 0, "t.log", full.drop(6)) // completion
    drain(); assert(state.toSeq == Seq("hello"))
  }
}
