package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Hash-compatibility tests (SURVEY §5: "determinism of ids (H1-H5 —
  * hash-compatibility tests against recorded reference values)").
  *
  * Murmur3 vectors: the empty/seeded cases are the published SMHasher
  * verification values; the string cases were recorded from
  * `mmh3.hash` semantics (seed 0, signed 32-bit, UTF-8 bytes) that
  * `text_processor.py:175-185` relies on.
  */
class HashingSpec extends SparkTestBase {

  test("murmur3 x86_32 matches published SMHasher vectors") {
    assert(Murmur3.hash32(Array.empty[Byte], 0) === 0)
    assert(Murmur3.hash32(Array.empty[Byte], 1) === 0x514E28B7)
    assert(Murmur3.hash32("aaaa".getBytes("UTF-8"), 0x9747b28c) === 0x5A97808A)
    assert(Murmur3.hash32("Hello, world!".getBytes("UTF-8"), 0x9747b28c)
      === 0x24884CBA)
  }

  test("murmur3 seed-0 matches recorded mmh3 reference values") {
    val expected = Map(
      "a" -> 1009084850,
      "ab" -> -1681926305,
      "abc" -> -1277324294,
      "abcd" -> 1139631978,
      "hello world" -> 1586663183,
      "passage: [DOC_1234] body text" -> 1149503713,
      "The quick brown fox jumps over the lazy dog" -> 776992547)
    expected.foreach { case (s, v) =>
      assert(Murmur3.hash32(s.getBytes("UTF-8"), 0) === v, s"input=$s")
    }
  }

  test("murmur3 seed-0 handles multibyte UTF-8 like mmh3") {
    val expected = Map(
      "café" -> 605818632,
      "日本語テキスト" -> -423053779,
      "émoji 🎉 test" -> -1157475659)
    expected.foreach { case (s, v) =>
      assert(Murmur3.hash32(s.getBytes("UTF-8"), 0) === v, s"input=$s")
    }
    // and through the expression path (UTF8String bytes)
    import spark.implicits._
    val got = expected.keys.toSeq.toDF("s")
      .select(col("s"), Hashing.murmur3(col("s")))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(got === expected)
  }

  test("murmur3 expression evaluates in a plan (codegen path)") {
    import spark.implicits._
    val df = Seq("a", "ab", "abc", "hello world").toDF("s")
      .withColumn("h", Hashing.murmur3(col("s")))
    val got = df.collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(got === Map("a" -> 1009084850, "ab" -> -1681926305,
      "abc" -> -1277324294, "hello world" -> 1586663183))
  }

  test("docId / chunkId formats match the reference layout") {
    import spark.implicits._
    // DOC_ + upper hex8 of unsigned value: 'ab' → 0x9BBFD75F
    val row = Seq(("ab", "chunk text")).toDF("content", "chunk")
      .select(
        Hashing.docId(col("content")).as("doc"),
        Hashing.chunkId(Hashing.docId(col("content")), col("chunk")).as("cid"),
        Hashing.contentHash(col("chunk")).as("ch"))
      .head()
    assert(row.getString(0) === "DOC_9BBFD75F")
    assert(row.getString(1).startsWith("DOC_9BBFD75F_"))
    assert(row.getString(1).length === "DOC_9BBFD75F_".length + 8)
    assert(row.getString(2).matches("[0-9A-F]{8}"))
  }

  test("uuid5 matches RFC 4122 DNS-namespace reference values") {
    assert(Hashing.uuid5Jvm("python.org")
      === "886313e1-3b8a-5372-9b90-0c9aee199e5d")
    assert(Hashing.uuid5Jvm("chunk-123")
      === "9e6ddd0f-ea97-5e0d-b1ac-872895b52005")
    assert(Hashing.uuid5Jvm("DOC_4E82D6F5_9a1b2c3d")
      === "c19e6241-5467-55da-b8b7-a21da4517432")
  }

  test("slug matches the reference format: NFKD ascii fold + " +
      "blake2b-4 suffix + 50-char cap (gatekeeper_logic.py:60-67)") {
    import spark.implicits._
    // vectors recorded from the reference algorithm
    val got = Seq("Hello, World!  2024", "--x--", "Caf\u00e9 Menu",
      "x" * 80).toDF("s")
      .select(Hashing.slug(col("s"))).as[String].collect()
    assert(got(0) === "hello-world-2024-a48cbf92")
    assert(got(1) === "x-b1ba07e5")
    assert(got(2) === "cafe-menu-236fea32")   // NFKD folds the accent
    assert(got(3) === ("x" * 50) + "-01adf0f9") // truncated, suffix on full
  }
}
