package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** MurmurHash3 x86_32 with caller-chosen seed (the reference uses
  * python `mmh3.hash` = seed 0; Spark's builtin `hash()` is murmur3
  * seed 42 with different tail handling, so IDs would drift —
  * SURVEY §2.4 H1-H3 hard part 1).
  *
  * Public algorithm (Austin Appleby, MurmurHash3.cpp, public domain);
  * verified against the published SMHasher test vectors in
  * HashingSpec.
  */
object Murmur3 {
  def hash32(data: Array[Byte], seed: Int): Int = {
    val c1 = 0xcc9e2d51
    val c2 = 0x1b873593
    var h = seed
    val n = data.length & ~3
    var i = 0
    while (i < n) {
      var k = (data(i) & 0xff) | ((data(i + 1) & 0xff) << 8) |
        ((data(i + 2) & 0xff) << 16) | ((data(i + 3) & 0xff) << 24)
      k *= c1
      k = Integer.rotateLeft(k, 15)
      k *= c2
      h ^= k
      h = Integer.rotateLeft(h, 13)
      h = h * 5 + 0xe6546b64
      i += 4
    }
    var k = 0
    val rem = data.length & 3
    if (rem >= 3) k ^= (data(n + 2) & 0xff) << 16
    if (rem >= 2) k ^= (data(n + 1) & 0xff) << 8
    if (rem >= 1) {
      k ^= data(n) & 0xff
      k *= c1
      k = Integer.rotateLeft(k, 15)
      k *= c2
      h ^= k
    }
    h ^= data.length
    h ^= h >>> 16
    h *= 0x85ebca6b
    h ^= h >>> 13
    h *= 0xc2b2ae35
    h ^= h >>> 16
    h
  }

  def hash32Utf8(s: UTF8String, seed: Int): Int = hash32(s.getBytes, seed)
}

/** Catalyst expression: murmur3_x86_32(input, seed) → INT (signed,
  * mmh3-compatible). Accepts STRING (hashed as UTF-8 bytes) or BINARY.
  * Generates a static call so it stays inside whole-stage codegen. */
case class Murmur3Seed(child: Expression, seed: Int)
    extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType | BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"murmur3 requires STRING or BINARY input, got $other")
    }
  override def nullSafeEval(v: Any): Any = v match {
    case s: UTF8String => Murmur3.hash32Utf8(s, seed)
    case b: Array[Byte] => Murmur3.hash32(b, seed)
  }
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val m = "graft.functions.Murmur3"
    child.dataType match {
      case StringType =>
        defineCodeGen(ctx, ev, c => s"$m.hash32Utf8($c, $seed)")
      case _ =>
        defineCodeGen(ctx, ev, c => s"$m.hash32($c, $seed)")
    }
  }
  override protected def withNewChildInternal(c: Expression): Murmur3Seed =
    copy(child = c)
}

/** Deterministic ID / hash expressions (SURVEY §2.4).
  *
  * H1 `docId`:    "DOC_" + upper-hex8(mmh3(bytes) & 0xFFFFFFFF)
  *                (`text_processor.py:175-178`)
  * H2 `chunkId`:  s"$docId_${lower-hex8(mmh3(chunk))}"
  *                (`text_processor.py:181-185`)
  * H4 md5 entry hash: builtin `md5` (`producer_graph.py:109`)
  * H5 `uuid5`:    RFC 4122 v5 (SHA-1, DNS namespace) — Qdrant point ids
  *                (`services/database.py:260-268`)
  * H6 `slug`:     ascii-fold, lower, non-alnum runs → '-'
  *                (`gatekeeper_logic.py:60-67`)
  */
object Hashing {

  import org.apache.spark.sql.graftbridge.ColumnBridge

  def murmur3(c: Column, seed: Int = 0): Column =
    ColumnBridge.column(Murmur3Seed(ColumnBridge.expression(c), seed))

  /** Zero-padded hex8 of the unsigned 32-bit murmur3 value. */
  private def hex8(c: Column): Column =
    lpad(lower(hex(murmur3(c).cast("long").bitwiseAND(0xFFFFFFFFL))), 8, "0")

  /** H1: document id from raw content (string or binary column). */
  def docId(content: Column): Column =
    concat(lit("DOC_"), upper(hex8(content)))

  /** H2: chunk id = document id + murmur3 hex8 of the chunk text. */
  def chunkId(documentId: Column, chunk: Column): Column =
    concat(documentId, lit("_"), hex8(chunk))

  /** H3: content hash in markdown-splitter metadata (upper hex8). */
  def contentHash(chunk: Column): Column = upper(hex8(chunk))

  /** H5: RFC 4122 UUIDv5 over the DNS namespace (SHA-1 based —
    * `java.util.UUID.nameUUIDFromBytes` is v3/md5 and would not
    * match, so this is hand-rolled). */
  private val DnsNamespace: Array[Byte] = Array(
    0x6b, 0xa7, 0xb8, 0x10, 0x9d, 0xad, 0x11, 0xd1,
    0x80, 0xb4, 0x00, 0xc0, 0x4f, 0xd4, 0x30, 0xc8).map(_.toByte)

  def uuid5Jvm(name: String): String = {
    val md = java.security.MessageDigest.getInstance("SHA-1")
    md.update(DnsNamespace)
    md.update(name.getBytes("UTF-8"))
    val d = md.digest()
    d(6) = ((d(6) & 0x0f) | 0x50).toByte // version 5
    d(8) = ((d(8) & 0x3f) | 0x80).toByte // RFC 4122 variant
    val hex = d.take(16).map(b => f"${b & 0xff}%02x").mkString
    s"${hex.substring(0, 8)}-${hex.substring(8, 12)}-" +
      s"${hex.substring(12, 16)}-${hex.substring(16, 20)}-" +
      hex.substring(20, 32)
  }

  val uuid5Udf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((s: String) => if (s == null) null else uuid5Jvm(s))

  def uuid5(c: Column): Column = uuid5Udf(c)

  /** Minimal BLAKE2b (RFC 7693, unkeyed) — the JDK has no Blake2
    * provider and the reference's slug suffix is
    * `blake2b(text, digest_size=4)` (`gatekeeper_logic.py:66`).
    * Message length is capped well below 2^64 so only the low
    * counter word is tracked. */
  private object Blake2b {
    private val IV = Array(
      0x6a09e667f3bcc908L, 0xbb67ae8584caa73bL, 0x3c6ef372fe94f82bL,
      0xa54ff53a5f1d36f1L, 0x510e527fade682d1L, 0x9b05688c2b3e6c1fL,
      0x1f83d9abfb41bd6bL, 0x5be0cd19137e2179L)
    private val Sigma: Array[Array[Int]] = Array(
      Array(0,1,2,3,4,5,6,7,8,9,10,11,12,13,14,15),
      Array(14,10,4,8,9,15,13,6,1,12,0,2,11,7,5,3),
      Array(11,8,12,0,5,2,15,13,10,14,3,6,7,1,9,4),
      Array(7,9,3,1,13,12,11,14,2,6,5,10,4,0,15,8),
      Array(9,0,5,7,2,4,10,15,14,1,11,12,6,8,3,13),
      Array(2,12,6,10,0,11,8,3,4,13,7,5,15,14,1,9),
      Array(12,5,1,15,14,13,4,10,0,7,6,3,9,2,8,11),
      Array(13,11,7,14,12,1,3,9,5,0,15,4,8,6,2,10),
      Array(6,15,14,9,11,3,0,8,12,2,13,7,1,4,10,5),
      Array(10,2,8,4,7,6,1,5,15,11,9,14,3,12,13,0),
      Array(0,1,2,3,4,5,6,7,8,9,10,11,12,13,14,15),
      Array(14,10,4,8,9,15,13,6,1,12,0,2,11,7,5,3))

    private def le64(b: Array[Byte], off: Int): Long = {
      var x = 0L
      var i = 7
      while (i >= 0) { x = (x << 8) | (b(off + i) & 0xffL); i -= 1 }
      x
    }

    private def g(v: Array[Long], a: Int, b: Int, c: Int, d: Int,
        x: Long, y: Long): Unit = {
      v(a) = v(a) + v(b) + x
      v(d) = java.lang.Long.rotateRight(v(d) ^ v(a), 32)
      v(c) = v(c) + v(d)
      v(b) = java.lang.Long.rotateRight(v(b) ^ v(c), 24)
      v(a) = v(a) + v(b) + y
      v(d) = java.lang.Long.rotateRight(v(d) ^ v(a), 16)
      v(c) = v(c) + v(d)
      v(b) = java.lang.Long.rotateRight(v(b) ^ v(c), 63)
    }

    def hash(input: Array[Byte], digestSize: Int): Array[Byte] = {
      val h = IV.clone()
      h(0) ^= 0x01010000L ^ digestSize.toLong
      def compress(block: Array[Byte], t: Long, last: Boolean): Unit = {
        val m = Array.tabulate(16)(i => le64(block, i * 8))
        val v = new Array[Long](16)
        System.arraycopy(h, 0, v, 0, 8)
        System.arraycopy(IV, 0, v, 8, 8)
        v(12) ^= t
        if (last) v(14) = ~v(14)
        var r = 0
        while (r < 12) {
          val s = Sigma(r)
          g(v, 0, 4, 8, 12, m(s(0)), m(s(1)))
          g(v, 1, 5, 9, 13, m(s(2)), m(s(3)))
          g(v, 2, 6, 10, 14, m(s(4)), m(s(5)))
          g(v, 3, 7, 11, 15, m(s(6)), m(s(7)))
          g(v, 0, 5, 10, 15, m(s(8)), m(s(9)))
          g(v, 1, 6, 11, 12, m(s(10)), m(s(11)))
          g(v, 2, 7, 8, 13, m(s(12)), m(s(13)))
          g(v, 3, 4, 9, 14, m(s(14)), m(s(15)))
          r += 1
        }
        var i = 0
        while (i < 8) { h(i) ^= v(i) ^ v(i + 8); i += 1 }
      }
      val n = input.length
      val fullBlocks = if (n == 0) 0 else (n - 1) / 128
      var i = 0
      while (i < fullBlocks) {
        compress(input.slice(i * 128, (i + 1) * 128),
          (i + 1) * 128L, last = false)
        i += 1
      }
      val lastBlock = new Array[Byte](128)
      if (n > 0) System.arraycopy(input, fullBlocks * 128, lastBlock, 0,
        n - fullBlocks * 128)
      compress(lastBlock, n.toLong, last = true)
      val out = new Array[Byte](digestSize)
      var j = 0
      while (j < digestSize) {
        out(j) = ((h(j / 8) >>> (8 * (j % 8))) & 0xff).toByte
        j += 1
      }
      out
    }
  }

  /** H6 string core (`gatekeeper_logic.py:60-67`): NFKD normalize,
    * drop non-ASCII, lowercase, strip, collapse non-alnum runs to
    * '-', strip '-', then `{slug[:50]}-{blake2b4(slug)}` — the
    * collision-resistant suffix + truncation the reference uses. */
  def slugJvm(text: String): String = {
    if (text == null) return null
    val ascii = java.text.Normalizer
      .normalize(text, java.text.Normalizer.Form.NFKD)
      .filter(_ < 128)
    val base = ascii.toLowerCase.strip
      .replaceAll("[^a-z0-9]+", "-")
      .replaceAll("(^-+|-+$)", "")
    val suffix = Blake2b.hash(base.getBytes("UTF-8"), 4)
      .map(b => f"${b & 0xff}%02x").mkString
    s"${base.take(50)}-$suffix"
  }

  val slugUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((s: String) => slugJvm(s))

  /** H6: collision-resistant URL slug (NFKD ascii fold + blake2b
    * suffix, truncated at 50 chars like the reference). */
  def slug(c: Column): Column = slugUdf(c)

  /** H7: per-job trace id — uuid4 truncated to 8 chars
    * (`utils/trace_utils.py:70-72`). Non-deterministic by design;
    * excluded from hash-checked outputs. */
  def traceId(): Column = substring(expr("uuid()"), 1, 8)
}
