package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.GraftSqlBridge.{column, expression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the dedup hash kernels.
  *
  * The composed-builtin formulations (`transform(seq(0,k-1), i ->
  * array_min(transform(shingles, s -> xxhash64(s,i))))`) are correct but
  * evaluate in the interpreted HOF path: k·|arr| boxed expression-tree
  * evaluations per row. These expressions do the same math in one tight
  * JVM loop per row — same shape as Spark's own `XxHash64` expression —
  * which is 1-2 orders of magnitude faster on realistic documents.
  * `CodegenFallback` keeps them usable inside whole-stage-codegen'd plans
  * (the surrounding operators still fuse; per-row work here dwarfs the
  * boxing boundary).
  */
object HashExpressions {

  /** xxhash64 of a UTF8String with an explicit seed — same kernel Spark's
    * `xxhash64()` uses, so behavior/stability matches the SQL surface. */
  @inline private[functions] def hashString(s: UTF8String, seed: Long): Long =
    org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
      s, StringType, seed)

  /** Hash mode for the dedup kernels: `Xx` (xxhash64/murmur3 — the fast
    * production default) or `Md5` (first 8 bytes of MD5, big-endian
    * signed). Md5 exists so the DuckDB oracle can reproduce signatures
    * bit-for-bit: `('0x' || substr(md5(s), 1, 16))::UBIGINT` yields the
    * identical 64-bit value. Same collision story (uniform 64-bit), ~3×
    * slower per hash. */
  val ModeXx = "xx"
  val ModeMd5 = "md5"

  private val md5Digest =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }
  private val md5Out = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](16)
  }

  /** First 8 bytes of MD5 of a byte range, big-endian, as a signed long —
    * exactly DuckDB's `('0x' || substr(md5(s),1,16))::UBIGINT`
    * reinterpreted signed. Digests into a reused thread-local buffer: the
    * shingle hot loop calls this per window, so no per-call allocation. */
  private[functions] def md5Long64(bytes: Array[Byte], off: Int,
      len: Int): Long = {
    val d = md5Digest.get()
    val h = md5Out.get()
    d.reset()
    d.update(bytes, off, len)
    d.digest(h, 0, 16)
    ((h(0) & 0xffL) << 56) | ((h(1) & 0xffL) << 48) |
      ((h(2) & 0xffL) << 40) | ((h(3) & 0xffL) << 32) |
      ((h(4) & 0xffL) << 24) | ((h(5) & 0xffL) << 16) |
      ((h(6) & 0xffL) << 8) | (h(7) & 0xffL)
  }

  private[functions] def md5Long64(bytes: Array[Byte]): Long =
    md5Long64(bytes, 0, bytes.length)

  /** md5-derived 64-bit hash of a string column (oracle-reproducible). */
  case class Md5Long(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override def nullIntolerant: Boolean = true
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
    override def nullSafeEval(input: Any): Any =
      md5Long64(input.asInstanceOf[UTF8String].getBytes)
  }

  /** Distinct 64-bit hash values of every `n`-gram shingle of a string.
    * Mode `xx` (default) hashes the n-BYTE windows directly off the
    * UTF8String bytes (murmur3 hi/lo pair — the shingle strings are never
    * materialized); mode `md5` hashes the n-CHARACTER windows with
    * [[md5Long64]], matching DuckDB
    * `('0x' || substr(md5(substr(nt, i, n)), 1, 16))::UBIGINT` so the
    * oracle reproduces signatures exactly (bytes == chars on ASCII; md5
    * mode uses characters because SQL `substr` does). Downstream set
    * operations (Jaccard via array_intersect) on the 64-bit hashes are
    * equivalent to operating on the shingles themselves up to hash
    * collisions (~2⁻⁶⁴). */
  case class ShingleHashes(child: Expression, n: Int, mode: String = ModeXx)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullIntolerant: Boolean = true
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
    override def nullSafeEval(input: Any): Any = {
      val s = input.asInstanceOf[UTF8String]
      if (mode == ModeMd5) {
        val bytes = s.getBytes
        val ascii = bytes.length == s.numChars()
        val m =
          (if (ascii) bytes.length else s.numChars()) - n + 1
        if (m <= 0) return new GenericArrayData(Array.emptyLongArray)
        val seen = new java.util.HashSet[Long](m * 2)
        val out = new Array[Long](m)
        var cnt = 0
        var i = 0
        while (i < m) {
          // ASCII fast path: a char window IS a byte window — digest
          // straight off the backing array, zero per-window allocation
          val h =
            if (ascii) md5Long64(bytes, i, n)
            else md5Long64(s.substring(i, i + n).getBytes)
          if (seen.add(h)) { out(cnt) = h; cnt += 1 }
          i += 1
        }
        new GenericArrayData(java.util.Arrays.copyOf(out, cnt))
      } else {
        val bytes = s.getBytes
        val m = bytes.length - n + 1
        if (m <= 0) return new GenericArrayData(Array.emptyLongArray)
        val seen = new java.util.HashSet[Long](m * 2)
        val out = new Array[Long](m)
        var cnt = 0
        var i = 0
        while (i < m) {
          val h = org.apache.spark.unsafe.hash.Murmur3_x86_32.hashUnsafeBytes2(
            bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + i,
            n, 42).toLong << 32 |
            (org.apache.spark.unsafe.hash.Murmur3_x86_32.hashUnsafeBytes2(
              bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + i,
              n, 1042).toLong & 0xffffffffL)
          if (seen.add(h)) { out(cnt) = h; cnt += 1 }
          i += 1
        }
        new GenericArrayData(java.util.Arrays.copyOf(out, cnt))
      }
    }
  }

  /** Every `stride`-th length-`n` character window of a string with its
    * 0-based CODEPOINT offset: array<struct<pos:int, h:bigint>> — the
    * position-carrying sibling of [[ShingleHashes]] for duplicated-span
    * detection (positions are needed to merge hits back into substring
    * spans). Mode `md5` hashes the window's UTF-8 bytes with
    * [[md5Long64]], matching DuckDB
    * `('0x' || substr(md5(substr(text, i, n)), 1, 16))::UBIGINT` for ANY
    * input (both sides extract by codepoint and hash the UTF-8 bytes);
    * mode `xx` (production default) murmur-hashes the same window bytes.
    * ASCII fast path digests straight off the backing byte array;
    * non-ASCII walks codepoint boundaries once (O(len)). */
  case class WindowHashes(child: Expression, n: Int, stride: Int = 1,
      mode: String = ModeXx)
      extends UnaryExpression with CodegenFallback {
    require(n > 0 && stride > 0, "window length and stride must be positive")
    override def dataType: DataType = ArrayType(StructType(Seq(
      StructField("pos", IntegerType, nullable = false),
      StructField("h", LongType, nullable = false))), containsNull = false)
    override def nullIntolerant: Boolean = true
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
    private def hashBytes(b: Array[Byte], off: Int, len: Int): Long =
      if (mode == ModeMd5) md5Long64(b, off, len)
      else
        org.apache.spark.unsafe.hash.Murmur3_x86_32.hashUnsafeBytes2(
          b, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + off,
          len, 42).toLong << 32 |
          (org.apache.spark.unsafe.hash.Murmur3_x86_32.hashUnsafeBytes2(
            b, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + off,
            len, 1042).toLong & 0xffffffffL)
    override def nullSafeEval(input: Any): Any = {
      val s = input.asInstanceOf[UTF8String]
      val bytes = s.getBytes
      val ascii = bytes.length == s.numChars()
      if (ascii) {
        val m = bytes.length - n + 1
        if (m <= 0) return new GenericArrayData(Array.empty[Any])
        val cnt = (m + stride - 1) / stride
        val out = new Array[Any](cnt)
        var i = 0; var k = 0
        while (i < m) {
          out(k) = org.apache.spark.sql.catalyst.InternalRow(
            i, hashBytes(bytes, i, n))
          k += 1; i += stride
        }
        new GenericArrayData(out)
      } else {
        // one O(len) walk records each codepoint's byte offset
        val str = s.toString
        val cps = str.codePointCount(0, str.length)
        val m = cps - n + 1
        if (m <= 0) return new GenericArrayData(Array.empty[Any])
        val byteOff = new Array[Int](cps + 1)
        var ci = 0; var bi = 0; var cp = 0
        while (ci < str.length) {
          byteOff(cp) = bi
          val c = str.codePointAt(ci)
          bi += utf8Len(c); ci += Character.charCount(c); cp += 1
        }
        byteOff(cps) = bytes.length
        val cnt = (m + stride - 1) / stride
        val out = new Array[Any](cnt)
        var i = 0; var k = 0
        while (i < m) {
          out(k) = org.apache.spark.sql.catalyst.InternalRow(
            i, hashBytes(bytes, byteOff(i), byteOff(i + n) - byteOff(i)))
          k += 1; i += stride
        }
        new GenericArrayData(out)
      }
    }
    private def utf8Len(cp: Int): Int =
      if (cp < 0x80) 1 else if (cp < 0x800) 2
      else if (cp < 0x10000) 3 else 4
  }

  /** k-element MinHash signature from an array<long> of element hashes:
    * out(i) = min over elements of (a_i·h + b_i) — one multiply-add per
    * (element, i) instead of k string hashes per element. The (a_i, b_i)
    * family is a fixed seeded LCG sequence (odd multipliers), so
    * signatures are stable across runs and partitions. */
  case class MinHashFromHashes(child: Expression, k: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullIntolerant: Boolean = true
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
    @transient private lazy val (as, bs) = MinHashFromHashes.family(k)
    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val out = Array.fill[Long](k)(Long.MaxValue)
      var j = 0
      while (j < n) {
        val h = arr.getLong(j)
        var i = 0
        while (i < k) {
          val g = as(i) * h + bs(i)
          if (g < out(i)) out(i) = g
          i += 1
        }
        j += 1
      }
      new GenericArrayData(out)
    }
  }

  object MinHashFromHashes {
    /** Deterministic (a_i odd, b_i) pairs from a fixed-seed generator. */
    def family(k: Int): (Array[Long], Array[Long]) = {
      val rng = new java.util.Random(0x5DEECE66DL)
      val as = Array.fill(k)(rng.nextLong() | 1L)
      val bs = Array.fill(k)(rng.nextLong())
      (as, bs)
    }
  }

  /** 64-bit SimHash of an array<string> of tokens: bit b of the result is
    * set iff more token-hashes have bit b set than unset. Token hash is
    * xxhash64 seed 42 (`xx`, default) or [[md5Long64]] (`md5`,
    * oracle-reproducible). */
  case class SimHash64(child: Expression, mode: String = ModeXx)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override def nullIntolerant: Boolean = true
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val votes = new Array[Int](64)
      var j = 0
      while (j < n) {
        if (!arr.isNullAt(j)) {
          val h =
            if (mode == ModeMd5) md5Long64(arr.getUTF8String(j).getBytes)
            else hashString(arr.getUTF8String(j), 42L)
          var b = 0
          while (b < 64) {
            if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
            b += 1
          }
        }
        j += 1
      }
      var out = 0L
      var b = 0
      while (b < 64) { if (votes(b) > 0) out |= (1L << b); b += 1 }
      out
    }
  }

  /** All `reps` Poisson-bootstrap multiplicities of one SF² pair in a
    * single pass (SF2Relational.bootstrapped). Element r equals the
    * composed-Column formulation it replaces:
    *
    *   u_r = shiftrightunsigned(Md5Long(concat_ws("|", prefix, r, seed)),
    *         11) / 2^53
    *   w_r = inverse Poisson CDF of u_r at λ, as the unrolled chain
    *         t₀ = exp(−λ); t_k = t_{k−1}·λ/k; c_k = c_{k−1} + t_k;
    *         first k with u < c_k, truncated at 17
    *
    * byte-for-byte (key bytes: `prefix|r|seed` == the concat_ws) and
    * float-op-for-float-op (the loop accumulates in exactly the chain's
    * order, so the DuckDB oracle's lateral-alias replay keeps matching).
    * Fusing matters because the Column form re-derives the whole uniform
    * subtree (concat + interpreted md5) and every prefix term inside each
    * of the 18 WHEN branches — measured ~2× the entire bootstrap query
    * cost at sf0.1 — where this loop hashes once and accumulates 17
    * terms. */
  case class Md5PoissonWeights(left: Expression, right: Expression,
      reps: Int, seed: Long)
      extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
      with CodegenFallback {
    require(reps >= 1, s"reps must be >= 1, got $reps")
    override def dataType: DataType =
      ArrayType(IntegerType, containsNull = false)
    override def nullIntolerant: Boolean = true
    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): Expression = copy(l, r)
    @transient private lazy val suffixes: Array[Array[Byte]] =
      Array.tabulate(reps)(r => s"|$r|$seed".getBytes(
        java.nio.charset.StandardCharsets.UTF_8))
    override def nullSafeEval(p: Any, l: Any): Any = {
      val pre = p.asInstanceOf[UTF8String].getBytes
      val lam = l.asInstanceOf[Double]
      val t0 = math.exp(-lam)
      val d = md5Digest.get()
      val h = md5Out.get()
      val out = new Array[Int](reps)
      var r = 0
      while (r < reps) {
        d.reset()
        d.update(pre)
        d.update(suffixes(r))
        d.digest(h, 0, 16)
        val hl = ((h(0) & 0xffL) << 56) | ((h(1) & 0xffL) << 48) |
          ((h(2) & 0xffL) << 40) | ((h(3) & 0xffL) << 32) |
          ((h(4) & 0xffL) << 24) | ((h(5) & 0xffL) << 16) |
          ((h(6) & 0xffL) << 8) | (h(7) & 0xffL)
        val u = (hl >>> 11).toDouble / 9007199254740992.0 // 2^53
        var w = 17
        var term = t0
        var cum = t0
        if (u < cum) w = 0
        else {
          var k = 1
          while (k <= 16 && w == 17) {
            term = term * lam / k
            cum += term
            if (u < cum) w = k
            k += 1
          }
        }
        out(r) = w
        r += 1
      }
      new GenericArrayData(out)
    }
  }

  def md5PoissonWeights(prefix: Column, lam: Column, reps: Int,
      seed: Long): Column =
    column(Md5PoissonWeights(expression(prefix), expression(lam), reps, seed))

  def shingleHashes(text: Column, n: Int, mode: String = ModeXx): Column =
    column(ShingleHashes(expression(text), n, mode))

  def windowHashes(text: Column, n: Int, stride: Int = 1,
      mode: String = ModeXx): Column =
    column(WindowHashes(expression(text), n, stride, mode))

  def minhashFromHashes(hashes: Column, k: Int): Column =
    column(MinHashFromHashes(expression(hashes), k))

  def simhash64(tokens: Column, mode: String = ModeXx): Column =
    column(SimHash64(expression(tokens), mode))

  def md5Long(text: Column): Column = column(Md5Long(expression(text)))
}
