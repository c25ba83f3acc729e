package graft

import org.apache.spark.sql.SparkSession
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup
import graft.serving.{ShardedFeatureStore, ShardedServingBuffer}
import graft.streaming.SlidingWindows
import graft.streaming.SlidingWindows.{AggSpec, RangeMs, RowsN}

/** Property-based pins over the pure engine kernels: each property runs
  * against MANY generated inputs (deterministic scalacheck seeds — the
  * suite is reproducible), catching the edge shapes fixed-fixture specs
  * miss. Raw scalacheck generators driven by explicit seeds; a failure
  * prints the seed index for replay.
  */
class PropertySpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def sample[T](g: Gen[T], seed: Long): T =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  // ---- minhash kernel == plain-Scala reference ------------------------

  /** Scala reimplementation of the shingle/hash/LCG-min contract the
    * codegen'd kernel and the explode+agg pass both implement. */
  private def referenceSignature(text: String, k: Int, numHashes: Int): Seq[Long] = {
    val P = Dedup.P31
    val n = math.max(text.length - (k - 1), 1)
    val xs = (1 to n).map { i =>
      val sub = text.substring(i - 1, math.min(i - 1 + k, text.length))
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(sub.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        .take(4).map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex, 16) % P
    }
    Dedup.minhashCoeffs(numHashes).map { case (a, b) =>
      xs.iterator.map(x => (a * x + b) % P).min
    }
  }

  test("codegen'd minhash signature == plain-Scala reference on random texts") {
    import spark.implicits._
    val genText = Gen.chooseNum(0, 60).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(Gen.alphaNumChar, Gen.const(' '), Gen.const('é')))
        .map(_.mkString))
    val texts = (1L to 40L).map(sample(genText, _))
    val got = texts.toDF("t")
      .select(Dedup.signatureCol("t", k = 5, numHashes = 16).as("sig"))
      .collect().map(_.getSeq[Long](0))
    texts.zip(got).zipWithIndex.foreach { case ((t, g), i) =>
      assert(g == referenceSignature(t, 5, 16), s"seed ${i + 1} text '$t'")
    }
  }

  // ---- point evaluation == direct frame computation -------------------

  test("evalAtPoint matches direct frame computation for random rows and frames") {
    val genRows = for {
      n <- Gen.chooseNum(1, 40)
      rows <- Gen.listOfN(n, for {
        ts <- Gen.chooseNum(0L, 5000L)
        v <- Gen.chooseNum(-20, 20)
      } yield (ts, Array(v.toDouble), Array.empty[String]))
    } yield rows.sortBy(_._1)
    val kinds = Seq("sum", "count", "avg", "min", "max", "median", "distinct_count")

    for (seed <- 1L to 30L) {
      val rows = sample(genRows, seed)
      val at = sample(Gen.chooseNum(0L, 6000L), seed + 1000)
      val frame: SlidingWindows.Frame =
        if (seed % 2 == 0) RangeMs(sample(Gen.chooseNum(1L, 3000L), seed + 2000))
        else RowsN(sample(Gen.chooseNum(1, 10), seed + 3000))
      val upTo = rows.filter(_._1 <= at)
      val inFrame = frame match {
        case RangeMs(len) => upTo.filter(_._1 >= at - len)
        case RowsN(nr)    => upTo.takeRight(nr + 1)
      }
      val vs = inFrame.map(_._2(0))
      if (vs.nonEmpty) {
        val specs = kinds.map(kk => AggSpec(kk, kk, frame))
        val got = SlidingWindows.evalAtPoint(rows, specs, at, presorted = true)
        val expect: Seq[Any] = Seq(
          vs.sum, vs.length.toLong, vs.sum / vs.length, vs.min, vs.max,
          graft.functions.MedianMath.exact(
            vs.groupBy(identity).map { case (v, g) => v -> g.length.toLong }),
          vs.distinct.length.toLong)
        got.zip(expect).zip(kinds).foreach { case ((g, e), kk) =>
          def d(x: Any) = x.asInstanceOf[Number].doubleValue()
          assert(g != null && math.abs(d(g) - d(e)) < 1e-9,
            s"seed $seed kind $kk at=$at frame=$frame: got $g want $e (vs=$vs)")
        }
      }
    }
  }

  // ---- serving codecs roundtrip ---------------------------------------

  test("sharded row codec roundtrips random keys, values and null strings") {
    val genRow = for {
      key <- Gen.chooseNum(0, 24).flatMap(n => Gen.listOfN(n,
        Gen.oneOf(Gen.alphaNumChar, Gen.const('ß'), Gen.const(' '))).map(_.mkString))
      ts <- Gen.chooseNum(Long.MinValue / 2, Long.MaxValue / 2)
      nv <- Gen.chooseNum(0, 5)
      nums <- Gen.listOfN(nv, Gen.chooseNum(-1e12, 1e12))
      ns <- Gen.chooseNum(0, 3)
      strs <- Gen.listOfN(ns, Gen.oneOf(
        Gen.const(null: String), Gen.alphaNumStr.map(_.take(12))))
    } yield (key, (ts, nums.toArray, strs.toArray))
    for (seed <- 1L to 60L) {
      val (key, row) = sample(genRow, seed)
      val rec = ShardedServingBuffer.encodeRow(key, row)
      val buf = java.nio.ByteBuffer.wrap(rec)
      val recLen = buf.getInt
      assert(recLen == rec.length - 4, s"seed $seed length prefix")
      val (k2, r2) = ShardedServingBuffer.decodeRow(
        java.util.Arrays.copyOfRange(rec, 4, rec.length))
      assert(k2 == key, s"seed $seed key")
      assert(r2._1 == row._1 && r2._2.toSeq == row._2.toSeq &&
        r2._3.toSeq == row._3.toSeq, s"seed $seed row")
    }
  }

  test("shardOf is stable, in range, and equals the Spark-side expression on random keys") {
    import spark.implicits._
    import org.apache.spark.sql.functions.expr
    val genKey = Gen.chooseNum(0, 30).flatMap(n => Gen.listOfN(n,
      Gen.oneOf(Gen.alphaNumChar, Gen.const('-'), Gen.const('_'),
        Gen.const('.'), Gen.const('ü'))).map(_.mkString))
    val keys = (1L to 80L).map(sample(genKey, _)).distinct
    for (n <- Seq(1, 3, 8, 64)) {
      keys.foreach { k =>
        val s = ShardedFeatureStore.shardOf(k, n)
        assert(s >= 0 && s < n, s"key '$k' shards $n")
        assert(s == ShardedFeatureStore.shardOf(k, n), "stability")
      }
      val sparkSide = keys.toDF("k").withColumn("s", expr(
          s"CAST(conv(substring(md5(k), 1, 8), 16, 10) AS BIGINT) % $n"))
        .collect().map(r => r.getString(0) -> r.getLong(1).toInt).toMap
      keys.foreach(k =>
        assert(sparkSide(k) == ShardedFeatureStore.shardOf(k, n), s"'$k' @ $n"))
    }
  }

  test("PNG/BMP encode->decode round-trips random pixel planes exactly") {
    import graft.operators.Multimodal
    val genDims = for {
      w <- Gen.chooseNum(1, 40); h <- Gen.chooseNum(1, 40)
    } yield (w, h)
    for (seed <- 1L to 12L) {
      val (w, h) = sample(genDims, seed)
      val px = sample(Gen.listOfN(3 * w * h, Gen.chooseNum(0, 255)), seed + 1000).toArray
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var p = 0
      while (p < w * h) {
        img.setRGB(p % w, p / w, (px(3 * p) << 16) | (px(3 * p + 1) << 8) | px(3 * p + 2))
        p += 1
      }
      val expect = Array.tabulate(3)(c =>
        (0 until w * h).map(i => px(3 * i + c).toLong).sum)
      for (fmt <- Seq("png", "bmp")) {
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, fmt, bos)
        val Some((f, w2, h2, sums)) = Multimodal.decodeImage(bos.toByteArray)
        assert(f == fmt && w2 == w && h2 == h, s"seed $seed $fmt dims")
        assert(sums.toSeq == expect.toSeq, s"seed $seed $fmt channel sums")
      }
      // random NN resize target preserves the pixel-selection arithmetic
      val (w3, h3) = sample(genDims, seed + 2000)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      val Some(resized) = Multimodal.resizeImage(bos.toByteArray, w3, h3)
      val Some((_, rw, rh, rsums)) = Multimodal.decodeImage(resized)
      assert(rw == w3 && rh == h3)
      val rexpect = new Array[Long](3)
      for (y <- 0 until h3; x <- 0 until w3; c <- 0 until 3) {
        val sy = (y.toLong * h / h3).toInt; val sx = (x.toLong * w / w3).toInt
        rexpect(c) += px(3 * (sy * w + sx) + c).toLong
      }
      assert(rsums.toSeq == rexpect.toSeq, s"seed $seed resize ${w}x$h->${w3}x$h3")
    }
  }

  test("AIFF/AU encode->decode round-trips random PCM16 sample planes exactly") {
    // the audio counterpart of the image round-trip above (VERDICT r11
    // stretch): random 16-bit planes through the JDK's own encoders,
    // then Multimodal.decodeAudio must replay rate/channels/count and
    // the exact sum of absolute samples — both containers are lossless
    // big-endian PCM, so any drift is a parser bug, not codec loss
    import graft.operators.Multimodal
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    val genShape = for {
      channels <- Gen.chooseNum(1, 2)
      rate <- Gen.oneOf(8000, 16000, 44100)
      frames <- Gen.chooseNum(5, 400)
    } yield (channels, rate, frames)
    for (seed <- 1L to 12L) {
      val (channels, rate, frames) = sample(genShape, seed)
      val n = frames * channels
      val samples = sample(Gen.listOfN(n,
        Gen.chooseNum(Short.MinValue.toInt, Short.MaxValue.toInt)), seed + 3000)
      val pcm = java.nio.ByteBuffer.allocate(2 * n) // both containers: big-endian
      samples.foreach(s => pcm.putShort(s.toShort))
      val expectSum = samples.map(s => math.abs(s).toLong).sum
      val fmt = new AudioFormat(rate.toFloat, 16, channels, true, true)
      for ((fileType, name) <- Seq(
          AudioFileFormat.Type.AIFF -> "aiff", AudioFileFormat.Type.AU -> "au")) {
        val ais = new AudioInputStream(
          new java.io.ByteArrayInputStream(pcm.array()), fmt, frames.toLong)
        val bos = new java.io.ByteArrayOutputStream()
        AudioSystem.write(ais, fileType, bos)
        val Some((container, rate2, ch2, n2, sum2)) =
          Multimodal.decodeAudio(bos.toByteArray)
        assert(container == name && rate2 == rate && ch2 == channels,
          s"seed $seed $name header: got ($container, $rate2, $ch2)")
        assert(n2 == n, s"seed $seed $name sample count: $n2 != $n")
        assert(sum2 == expectSum, s"seed $seed $name sumAbs: $sum2 != $expectSum")
      }
    }
  }
}
