package graft

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop, Properties}

/** Property-based pinning of the native hash kernels (ScalaCheck runs
  * these as a test framework alongside ScalaTest): the kernels are
  * evaluated DIRECTLY as catalyst expressions — no Spark session, no
  * jobs — so hundreds of generated cases cost milliseconds. Each
  * property states the semantic contract the oracle SQL and the LSH
  * math rely on. */
object KernelProperties extends Properties("graft.kernels") {
  import graft.functions.HashExpressions._

  private def md5Ref(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    java.nio.ByteBuffer.wrap(d).getLong
  }

  private def evalMd5Long(s: String): Long =
    Md5Long(Literal.create(s, StringType)).eval().asInstanceOf[Long]

  property("md5Long = first 8 big-endian MD5 bytes, any unicode") =
    Prop.forAll { (s: String) => evalMd5Long(s) == md5Ref(s) }

  // BMP chars without surrogates: java String windows == codepoint
  // windows, so the reference below can slice with plain substring
  private val bmpChar: Gen[Char] = Gen.frequency(
    8 -> Gen.alphaNumChar, 2 -> Gen.oneOf('é', 'ü', 'ß', '中', '文', ' '))
  private val bmpString: Gen[String] =
    Gen.listOf(bmpChar).map(_.mkString)

  property("md5 shingle hashes = md5Long of every n-char window") =
    Prop.forAll(bmpString, Gen.chooseNum(1, 6)) { (s, n) =>
      val got = ShingleHashes(Literal.create(s, StringType), n, ModeMd5)
        .eval().asInstanceOf[ArrayData].toLongArray().toSet
      val ref = (0 to s.length - n)
        .map(i => evalMd5Long(s.substring(i, i + n))).toSet
      got == ref
    }

  private def minhash(hs: Seq[Long], k: Int): Seq[Long] =
    MinHashFromHashes(
      Literal.create(hs, ArrayType(LongType, containsNull = false)), k)
      .eval().asInstanceOf[ArrayData].toLongArray().toSeq

  property("minhash: componentwise monotone under union, order-blind") =
    Prop.forAll(Gen.nonEmptyListOf(Gen.long), Gen.listOf(Gen.long),
      Gen.chooseNum(1, 32)) { (a, b, k) =>
      val sa = minhash(a, k)
      val sab = minhash(a ++ b, k)
      val perm = minhash(scala.util.Random.shuffle(a), k)
      sab.indices.forall(i => sab(i) <= sa(i)) && perm == sa
    }

  property("minhash of a superset never RAISES any component (LSH " +
    "containment direction)") =
    Prop.forAll(Gen.nonEmptyListOf(Gen.long), Gen.chooseNum(1, 16)) {
      (a, k) =>
        val half = a.take(math.max(1, a.length / 2))
        val sHalf = minhash(half, k)
        val sAll = minhash(a, k)
        sAll.indices.forall(i => sAll(i) <= sHalf(i))
    }

  private def simhash(tokens: Seq[String]): Long =
    SimHash64(
      Literal.create(tokens, ArrayType(StringType)), ModeMd5)
      .eval().asInstanceOf[Long]

  property("simhash: token-order invariant; empty tokens = 0") =
    Prop.forAll(Gen.listOf(Gen.alphaNumStr)) { tokens =>
      simhash(scala.util.Random.shuffle(tokens)) == simhash(tokens) &&
        simhash(Nil) == 0L
    }

  property("simhash: a strict-majority token dominates the fingerprint") =
    Prop.forAll(Gen.alphaNumStr, Gen.listOf(Gen.alphaNumStr)) {
      (tok, others) =>
        // tok repeated |others|+1 times outvotes every bit of the rest
        val tokens = List.fill(others.length + 1)(tok) ++ others
        simhash(scala.util.Random.shuffle(tokens)) == evalMd5Long(tok)
    }

  // ------------------------------------------------------------ otsu split

  private val otsuSample: Gen[Array[Double]] = Gen.chooseNum(2, 40)
    .flatMap(n => Gen.listOfN(n,
      Gen.chooseNum(-50.0, 50.0).map(x => math.rint(x * 4) / 4)))
    .map(_.toArray)

  // chunked-encode an arbitrary BMP string at arbitrary CHAR-aligned
  // split points (each size header = that piece's UTF-8 OCTET count —
  // the RFC 9112 rule the multi-byte chars here exercise), with random
  // extensions and a trailer: the decoder must return the original.
  // Char-aligned because dechunking runs AFTER readWarc's UTF-8
  // decode — a chunk boundary tearing a multi-byte char is lossy at
  // the decode step itself (the documented binary-payload boundary),
  // not a decoder defect.
  property("dechunkOne inverts char-aligned chunk framing, octet sizes") =
    Prop.forAll(bmpString, Gen.chooseNum(0L, Long.MaxValue)) {
      (s, seed) =>
        val rng = new scala.util.Random(seed)
        val sb = new StringBuilder
        var i = 0
        while (i < s.length) {
          val take = math.min(1 + rng.nextInt(7), s.length - i)
          val piece = s.substring(i, i + take)
          sb.append(piece.getBytes(
            java.nio.charset.StandardCharsets.UTF_8).length.toHexString)
          if (rng.nextBoolean()) sb.append(";x=1")
          sb.append("\r\n").append(piece).append("\r\n")
          i += take
        }
        sb.append("0\r\n")
        if (rng.nextBoolean()) sb.append("X-Trailer: t\r\n")
        sb.append("\r\n")
        graft.sources.Warc.dechunkOne(sb.toString).contains(s)
    }

  property("otsu: ratio in (0,1), mean_diff > 0, order-blind") =
    Prop.forAll(otsuSample) { m =>
      val (md, sl, su, r) = graft.analysis.Features.otsuSplit(m)
      val flat = m.distinct.length < 2
      if (flat) md.isNaN
      else {
        val shuffled = scala.util.Random.shuffle(m.toList).toArray
        val again = graft.analysis.Features.otsuSplit(shuffled)
        md > 0 && r > 0 && r < 1 && sl >= 0 && su >= 0 &&
          (md, sl, su, r) == again
      }
    }

  private def poissonRef(u: Double, lam: Double): Int = {
    var term = math.exp(-lam); var cum = term
    if (u < cum) return 0
    var k = 1
    while (k <= 16) {
      term = term * lam / k; cum += term
      if (u < cum) return k
      k += 1
    }
    17
  }

  property("md5PoissonWeights: element r = md5 uniform of prefix|r|seed " +
      "through the exact CDF chain; bounded; deterministic") =
    Prop.forAll(Gen.alphaNumStr, Gen.chooseNum(1, 12),
        Gen.chooseNum(1, 100).map(_ / 100.0)) { (prefix, reps, lam) =>
      val expr = Md5PoissonWeights(Literal.create(prefix, StringType),
        Literal.create(lam, DoubleType), reps, 42L)
      val got = expr.eval().asInstanceOf[ArrayData].toIntArray().toSeq
      val ref = (0 until reps).map { r =>
        poissonRef((md5Ref(s"$prefix|$r|42") >>> 11).toDouble /
          9007199254740992.0, lam)
      }
      got == ref && got.forall(w => w >= 0 && w <= 17) &&
        got == expr.eval().asInstanceOf[ArrayData].toIntArray().toSeq
    }

  property("otsu: split position invariant under positive affine map") =
    Prop.forAll(otsuSample,
        Gen.oneOf(0.5, 1.0, 1.5, 2.0, 2.5, 3.0),
        Gen.chooseNum(-40, 40).map(_ / 4.0)) { (m, a, b) =>
      val flat = m.distinct.length < 2
      flat || {
        // Otsu's argmax key (σ_b²/σ²) is affine-INVARIANT: x -> a·x + b
        // scales numerator and denominator by a² alike, so the class
        // RATIO (the split position) must not move. Quarter-grid samples
        // + the 5-decimal argmax rounding keep fp noise from flipping
        // near-tied splits under the transform.
        val r1 = graft.analysis.Features.otsuSplit(m)._4
        val r2 = graft.analysis.Features.otsuSplit(
          m.map(x => a * x + b))._4
        math.abs(r1 - r2) < 1e-12
      }
    }

  // ---- vector kernels (the contract every ANN/outlier oracle replays)

  private val vecGen: Gen[List[Double]] =
    Gen.nonEmptyListOf(Gen.chooseNum(-1000, 1000).map(_ / 64.0))

  private def arrLit(v: List[Double]) =
    Literal.create(ArrayData.toArrayData(v.toArray),
      ArrayType(DoubleType))

  private def evalDot(a: List[Double], b: List[Double]): Double =
    graft.functions.VectorExpressions.DotProduct(arrLit(a), arrLit(b))
      .eval().asInstanceOf[Double]

  private def evalCos(a: List[Double], b: List[Double]): Double =
    graft.functions.VectorExpressions.CosineSimilarity(arrLit(a), arrLit(b))
      .eval().asInstanceOf[Double]

  property("dot = STRICT left-to-right double fold (the list_dot_product" +
      " contract the oracles rely on)") =
    Prop.forAll(vecGen) { a =>
      val b = a.reverse
      val ref = a.zip(b).foldLeft(0.0) { case (acc, (x, y)) =>
        acc + x * y }
      evalDot(a, b) == ref
    }

  property("cosine = dot/(sqrt(aa)·sqrt(bb)) bit-exact; zero norm → 0; " +
      "bit-exact symmetric") =
    Prop.forAll(vecGen) { a =>
      val b = a.map(x => -x / 2.0 + 1.0)
      val aa = evalDot(a, a); val bb = evalDot(b, b)
      val expected =
        if (math.sqrt(aa) * math.sqrt(bb) == 0) 0.0
        else evalDot(a, b) / (math.sqrt(aa) * math.sqrt(bb))
      val zeros = List.fill(a.length)(0.0)
      evalCos(a, b) == expected &&
        evalCos(a, b) == evalCos(b, a) &&
        evalCos(a, zeros) == 0.0
    }

  // ------------------------- unicode normalization kernels (round 7)

  import org.apache.spark.unsafe.types.UTF8String
  private def nfcK(s: String): String =
    graft.functions.NormalizeExpression.nfc(
      UTF8String.fromString(s)).toString
  private def foldK(s: String): String =
    graft.functions.NormalizeExpression.foldAccents(
      UTF8String.fromString(s)).toString

  private val accented: Gen[String] = Gen.listOf(Gen.frequency(
    6 -> Gen.alphaNumChar.map(_.toString),
    2 -> Gen.oneOf("é", "é", "Å", "Å", "ü", "ñ", "ø", "ß"),
    1 -> Gen.oneOf(" ", "中", "м", "́"))).map(_.mkString)

  property("nfc is idempotent and length-bounded") =
    Prop.forAll(accented) { s =>
      val once = nfcK(s)
      nfcK(once) == once && once.length <= s.length
    }

  property("foldAccents: idempotent; composed ≡ decomposed input; " +
      "no combining marks survive") =
    Prop.forAll(accented) { s =>
      val f = foldK(s)
      foldK(f) == f &&
        foldK(nfcK(s)) == f &&
        f.codePoints().toArray.forall(cp =>
          Character.getType(cp) != Character.NON_SPACING_MARK)
    }

  property("foldAccents preserves mark-free text verbatim") =
    Prop.forAll(Gen.listOf(Gen.oneOf(
      Gen.alphaNumChar.map(_.toString), Gen.oneOf("ø", "ß", " ", "中")))
      .map(_.mkString)) { s =>
      foldK(s) == s
    }

  property("deflateSize counts REAL raw-deflate bytes: a fresh deflate " +
      "of the same input matches the count and inflates back losslessly") =
    Prop.forAll { (s: String) =>
      val n = graft.functions.TextStatsExpression
        .DeflateSize(Literal.create(s, StringType))
        .eval().asInstanceOf[Int]
      val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val d = new java.util.zip.Deflater(6, true)
      d.setInput(bytes); d.finish()
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      d.end()
      val comp = out.toByteArray
      val inf = new java.util.zip.Inflater(true)
      inf.setInput(comp)
      val back = new java.io.ByteArrayOutputStream()
      while (!inf.finished()) back.write(buf, 0, inf.inflate(buf))
      inf.end()
      n == comp.length && back.toByteArray.sameElements(bytes)
    }

  property("deflateSize exploits repetition: x·16 compresses to less " +
      "than 4× one copy (+ constant), for non-trivial x") =
    Prop.forAll(Gen.listOfN(24, Gen.alphaNumChar).map(_.mkString)) { x =>
      def sz(t: String) = graft.functions.TextStatsExpression
        .DeflateSize(Literal.create(t, StringType))
        .eval().asInstanceOf[Int]
      sz(x * 16) <= 4 * sz(x) + 16
    }
}
