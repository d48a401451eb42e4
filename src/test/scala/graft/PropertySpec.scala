package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.Codecs

/** Property-based invariants for the pure (non-Spark) kernels: codec
  * round-trips over arbitrary payloads, hash-fold congruences, resize
  * dimension laws. These run without a SparkSession, so hundreds of
  * random cases cost milliseconds. (Raw ScalaCheck — the scalatestplus
  * bridge isn't on the offline classpath.)
  */
class PropertySpec extends AnyFunSuite {

  private def check(prop: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  private val dims = for {
    w <- Gen.choose(1, 24)
    h <- Gen.choose(1, 24)
  } yield (w, h)

  test("BMP encode/decode round-trips for arbitrary dimensions and pixels") {
    check(Prop.forAll(dims) { case (w, h) =>
      val px = Array.tabulate[Byte](w * h * 3)(i => ((i * 131 + w * 7 + h) % 256).toByte)
      val back = Codecs.decodeBmp(Codecs.encodeBmp(Codecs.Image(w, h, px)))
      back.width == w && back.height == h && back.pixels.sameElements(px)
    })
  }

  test("PNG encode/decode round-trips for arbitrary dimensions and pixels") {
    check(Prop.forAll(dims) { case (w, h) =>
      val px = Array.tabulate[Byte](w * h * 3)(i => ((i * 193 + w * 11 + h) % 256).toByte)
      val back = Codecs.decodePng(Codecs.encodePng(Codecs.Image(w, h, px)))
      back.width == w && back.height == h && back.pixels.sameElements(px)
    })
  }

  test("GIF encode/decode round-trips: random, repetitive, and dict-reset-forcing inputs") {
    // random bytes (low compressibility), small alphabets (deep dict
    // chains + KwKwK), and sizes past 4096 entries (forces the CLEAR-on-
    // full reset and every code-width bump 9→12)
    val gen = for {
      n <- Gen.oneOf(Gen.choose(1, 300), Gen.choose(6000, 24000))
      alphabet <- Gen.oneOf(2, 3, 17, 256)
      seed <- Gen.choose(0, 1 << 20)
    } yield (n, alphabet, seed)
    check(Prop.forAll(gen) { case (n, alphabet, seed) =>
      val data = Array.tabulate[Byte](n)(i => (((i * 2654435761L + seed) >>> 7) % alphabet).toByte)
      val w = math.max(1, math.min(n, 255))
      val h = (n + w - 1) / w
      val padded = java.util.Arrays.copyOf(data, w * h)
      val img = Codecs.Gif(w, h, Codecs.GrayPalette, padded)
      val back = Codecs.decodeGif(Codecs.encodeGif(img))
      back.width == w && back.height == h &&
        back.indices.sameElements(padded) && back.palette.sameElements(Codecs.GrayPalette)
    })
  }

  test("AVI container round-trips frame payloads byte-exactly (incl. odd-length padding)") {
    import graft.multimodal.Avi
    val frameGen = Gen.choose(1, 600).map(n =>
      Array.tabulate[Byte](n)(i => (i * 31 + n).toByte)) // odd+even lengths
    check(Prop.forAll(Gen.nonEmptyListOf(frameGen), Gen.choose(1, 60)) { (frames, fps) =>
      val back = Avi.decode(Avi.encode(Avi.Video(48, 16, fps, frames)))
      back.width == 48 && back.height == 16 && back.fps == fps &&
        back.frames.length == frames.length &&
        back.frames.zip(frames).forall { case (a, b) => a.sameElements(b) }
    })
  }

  test("GIF LZW actually compresses repetitive input") {
    val img = Codecs.Gif(100, 100, Codecs.GrayPalette, new Array[Byte](100 * 100))
    val enc = Codecs.encodeGif(img)
    assert(enc.length < 100 * 100 / 4, s"10000 constant pixels encoded to ${enc.length} bytes")
  }

  test("WAV encode/decode round-trips; energy matches the direct sum") {
    check(Prop.forAll(
      Gen.listOfN(200, Gen.choose(Short.MinValue.toInt, Short.MaxValue.toInt)),
      Gen.choose(8000, 48000)) { (xs, rate) =>
      val samples = xs.map(_.toShort).toArray
      val back = Codecs.decodeWav(Codecs.encodeWav(Codecs.Audio(rate, samples)))
      back.sampleRate == rate && back.samples.sameElements(samples) &&
        Codecs.energy(back) == samples.foldLeft(0L)((a, s) => a + s.toLong * s)
    })
  }

  test("resizeNearest output dims are exact; identity resize is the identity") {
    check(Prop.forAll(dims, dims) { case ((w, h), (w2, h2)) =>
      val img = Codecs.Image(w, h,
        Array.tabulate[Byte](w * h * 3)(i => (i % 251).toByte))
      val r = Codecs.resizeNearest(img, w2, h2)
      r.width == w2 && r.height == h2 && r.pixels.length == w2 * h2 * 3 &&
        Codecs.resizeNearest(img, w, h).pixels.sameElements(img.pixels)
    })
  }

  test("frameRms frame count and range laws") {
    check(Prop.forAll(Gen.choose(1, 5000), Gen.choose(1, 512)) { (n, frame) =>
      val a = Codecs.Audio(16000, Array.tabulate[Short](n)(i => (i * 37 % 65536 - 32768).toShort))
      val rms = Codecs.frameRms(a, frame)
      rms.length == (n + frame - 1) / frame && rms.forall(r => r >= 0.0 && r <= 32768.0)
    })
  }

  test("CdcBoundaries interpreted eval == reference per-window fold for arbitrary unicode") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    val (w, b, m, dv) = (8, 31L, 1000000007L, 64L)
    def reference(s: String): Seq[Int] = {
      val cps = s.codePoints().toArray
      (w to cps.length).filter { p =>
        cps.slice(p - w, p).foldLeft(0L)((h, c) => (h * b + c) % m) % dv == 0
      }
    }
    val pieceGen = Gen.frequency(
      8 -> Gen.alphaNumChar.map(_.toString),
      2 -> Gen.oneOf(" ", "é", "ß", "中", "😀", "Ж")) // 😀 = astral (surrogate pair)
    check(Prop.forAll(Gen.listOf(pieceGen).map(_.mkString)) { s =>
      // interpreted path (nullSafeEval) — the DataFrame specs cover codegen
      val expr = graft.functions.CdcBoundaries(Literal(s), w, b, m, dv)
      val got = expr.eval(null).asInstanceOf[ArrayData].toIntArray().toSeq
      got == reference(s)
    })
  }

  test("rolling-hash reference fold: congruent seeds agree; prefix property holds") {
    def fold(s: String, seed: Long): Long = {
      var h = java.lang.Math.floorMod(seed, 1000000007L)
      s.foreach(c => h = (h * 31 + c.toLong) % 1000000007L)
      h
    }
    check(Prop.forAll(Gen.asciiPrintableStr, Gen.choose(0L, 1000000006L)) { (s, seed) =>
      // congruence: seed and seed + mod produce the same hash, and
      // incrementality: hash(s + c) is one fold step from hash(s) —
      // the property that makes the rolling form usable for chunking
      val c = 'x'
      fold(s, seed) == fold(s, seed + 1000000007L) &&
        fold(s + c, seed) == (fold(s, seed) * 31 + c.toLong) % 1000000007L
    })
  }

  test("winnowing guarantee: any shared substring of length >= w+k-1 selects a common anchor") {
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.types.StringType
    import org.apache.spark.unsafe.types.UTF8String
    // the SIGMOD'03 threshold claim the exact-substring tier's lossless
    // pruning rests on, checked as a pure-eval property over random
    // hosts: k=20, w=21 -> t=40, shared spans of 40..90 chars pasted at
    // arbitrary offsets must select at least one COMMON k-gram anchor
    val k = 20; val w = 21
    val expr = graft.functions.WinnowAnchors(
      BoundReference(0, StringType, nullable = true), k, w, 31L, 1000000007L)
    def anchorsOf(s: String): Set[String] = {
      val ps = expr.eval(org.apache.spark.sql.catalyst.InternalRow(UTF8String.fromString(s)))
        .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toIntArray()
      // ASCII generators: 1-based code-point position == string index + 1
      ps.map(p => s.substring(p - 1, p - 1 + k)).toSet
    }
    val lowerStr = Gen.choose(0, 60).flatMap(n => Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))
    val gen = for {
      span <- Gen.choose(w + k - 1, 90).flatMap(n => Gen.listOfN(n, Gen.alphaNumChar).map(_.mkString))
      pa <- lowerStr; sa <- lowerStr
      pb <- lowerStr; sb <- lowerStr
    } yield (pa + span + sa, pb + span + sb, span)
    check(Prop.forAll(gen) { case (hostA, hostB, span) =>
      val aa = anchorsOf(hostA)
      val ab = anchorsOf(hostB)
      // validity: every anchor is a real in-range k-gram of its host
      val valid = aa.forall(_.length == k) && ab.forall(_.length == k)
      // the guarantee: a common anchor content exists; stronger, at
      // least one common anchor lies INSIDE the shared span itself
      val common = aa & ab
      valid && common.exists(span.contains)
    })
  }

  test("Luhn detects every single-digit error (the PII card stage's checksum)") {
    // the classic property the mod-10 scheme was designed for: mutate
    // any ONE digit of a valid number and validity must flip off. Pure
    // integer reimplementation of PiiFns.luhnValid's fold; PiiSpec pins
    // the Column fold == plants, SqlSurfaceSpec pins SQL == Column, so
    // this transitively covers all three renderings.
    def luhnSum(digits: String): Int =
      digits.reverse.zipWithIndex.map { case (ch, idx) =>
        val d = ch - '0'
        if (idx % 2 == 1) { val dd = d * 2; if (dd > 9) dd - 9 else dd } else d
      }.sum
    val gen = for {
      n <- Gen.choose(12, 18)
      body <- Gen.listOfN(n, Gen.choose(0, 9)).map(_.mkString)
      pos <- Gen.choose(0, n) // mutation position incl. the check digit
      delta <- Gen.choose(1, 9)
    } yield (body, pos, delta)
    check(Prop.forAll(gen) { case (body, pos, delta) =>
      val check = (10 - luhnSum(body + "0") % 10) % 10
      val card = body + check.toString
      val mutated = card.updated(pos, (((card(pos) - '0') + delta) % 10 + '0').toChar)
      luhnSum(card) % 10 == 0 && luhnSum(mutated) % 10 != 0
    })
  }

  test("WARC shard mux/demux round-trips arbitrary unicode payload sets (incl. CRLF runs and empties)") {
    import graft.sources.Warc
    // piece pool biased toward the framing's own alphabet: CRLF pairs,
    // bare CR/LF, header-grammar fragments, multibyte — the payload may
    // contain anything the container uses as structure
    val piece = Gen.oneOf(
      Gen.asciiPrintableStr.map(_.take(12)), Gen.const("\r\n"),
      Gen.const("\r\n\r\n"), Gen.const("Content-Length: 7"),
      Gen.const("WARC/1.0"), Gen.const("数据"), Gen.const(""), Gen.const("\n"))
    val doc = for {
      id <- Gen.choose(0L, 1000000L)
      parts <- Gen.listOf(piece)
    } yield (id, parts.mkString)
    check(Prop.forAll(Gen.listOf(doc)) { docs =>
      val recs = Warc.parseShard(Warc.buildShard(docs))
      recs.size == docs.size && docs.zip(recs).forall { case ((id, text), r) =>
        val bytes = text.getBytes("UTF-8")
        r.url == Warc.recordUrl(id) && r.contentLength == bytes.length &&
          java.util.Arrays.equals(r.payload, bytes)
      }
    })
  }

  test("HTTP message wrap/parse round-trips arbitrary bodies byte-exactly") {
    import graft.sources.Warc
    val body = Gen.listOf(Gen.oneOf(
      Gen.asciiPrintableStr.map(_.take(10)), Gen.const("\r\n\r\n"),
      Gen.const("Content-Length: 3"), Gen.const("多字节"))).map(_.mkString)
    check(Prop.forAll(body) { b =>
      val r = Warc.parseHttp(Warc.httpMessage(b).getBytes("UTF-8"))
      r.status == 200 && r.body == b
    })
  }
}
