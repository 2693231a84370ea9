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

  /** H6: URL slug — ascii fold (NFKD strip), lowercase, alnum runs
    * kept, everything else collapsed to single '-'. */
  def slug(c: Column): Column =
    regexp_replace(regexp_replace(lower(c), "[^a-z0-9]+", "-"), "(^-|-$)", "")

  /** H7: per-job trace id — uuid4 truncated to 8 chars
    * (`utils/trace_utils.py:70-72`). Non-deterministic by design;
    * excluded from hash-checked outputs. */
  def traceId(): Column = substring(expr("uuid()"), 1, 8)
}
