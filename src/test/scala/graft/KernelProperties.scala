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
}
