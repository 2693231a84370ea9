package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** WebDataset-style tar-shard source: the de-facto container format
  * for multimodal training corpora (a corpus = many `.tar` shards;
  * a sample = the members sharing one basename prefix, e.g.
  * `00042.jpg` + `00042.txt` + `00042.json`). The reference ingests
  * loose files from a staging dir (S1); at 100 TB the same corpus
  * arrives as tar shards, so the engine reads them natively:
  * shard-parallel (one `binaryFile` row per shard → members explode
  * per partition — the S2 page-explode shape), members stay opaque
  * BINARY columns for the multimodal operators.
  *
  * The parser is minimal POSIX ustar (the subset `tar -c` and the
  * WebDataset writer emit), pure JDK: 512-byte headers, octal size
  * field, data padded to 512, terminated by zero blocks; GNU long
  * names (typeflag 'L') are honored. Damaged trailers end the walk
  * instead of throwing — corpus shards are routinely truncated. */
object TarShards {

  /** (name, bytes) of every regular-file member. */
  private[operators] def entries(
      tar: Array[Byte]): Vector[(String, Array[Byte])] = {
    val out = Vector.newBuilder[(String, Array[Byte])]
    if (tar == null) return out.result()
    var o = 0
    var pendingLongName: Option[String] = None
    def octal(off: Int, len: Int): Long = {
      var v = 0L
      var i = off
      val end = off + len
      while (i < end) {
        val c = tar(i)
        if (c >= '0' && c <= '7') v = (v << 3) + (c - '0')
        i += 1
      }
      v
    }
    while (o + 512 <= tar.length && tar(o) != 0) {
      val rawName = {
        var e = o
        while (e < o + 100 && tar(e) != 0) e += 1
        new String(tar, o, e - o, "UTF-8")
      }
      val size = octal(o + 124, 12)
      val typeflag = tar(o + 156).toChar
      val dataStart = o + 512
      val dataEnd = dataStart + size
      if (size < 0 || dataEnd > tar.length) return out.result()
      typeflag match {
        case 'L' => // GNU long-name block: payload is the real name
          pendingLongName = Some(new String(tar, dataStart,
            size.toInt, "UTF-8").takeWhile(_ != 0))
        case '0' | 0 =>
          val name = pendingLongName.getOrElse(rawName)
          pendingLongName = None
          out += ((name, java.util.Arrays.copyOfRange(
            tar, dataStart, dataEnd.toInt)))
        case _ => // dirs, links, pax headers: skip payload
          pendingLongName = None
      }
      o = dataStart + (((size + 511) / 512) * 512).toInt
    }
    out.result()
  }

  private val MemberSchema = StructType(Seq(
    StructField("shard", StringType, nullable = false),
    StructField("member", StringType, nullable = false),
    StructField("bytes", BinaryType)))

  /** One row per tar member across every `*.tar` under `dir`:
    * (shard, member, bytes). Shard-parallel: the binaryFile scan
    * distributes shards; each task explodes only its own shards'
    * members (no shuffle — the S2 page-explode shape). */
  def readMembers(spark: SparkSession, dir: String): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(MemberSchema)
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.tar").load(dir)
      .select(col("path"), col("content"))
      .flatMap { r =>
        val shard = r.getString(0)
        entries(r.getAs[Array[Byte]](1)).map { case (n, b) =>
          Row(shard, n, b)
        }
      }(enc)
  }

  /** WebDataset sample assembly: members grouped by their basename
    * prefix (the part before the FIRST '.' of the file name, dirs
    * stripped), one row per sample with an extension→bytes map —
    * `00042.jpg`+`00042.txt` become sample "00042" with keys
    * jpg/txt. The group-by is per-shard local in the common layout
    * (a sample never spans shards), but the aggregation is keyed on
    * (shard, sample) so a misbehaving writer still assembles
    * correctly — at the cost of the one hash exchange. */
  def readSamples(spark: SparkSession, dir: String): DataFrame = {
    val m = readMembers(spark, dir)
      .withColumn("_base",
        element_at(split(col("member"), "/"), -1))
      .withColumn("sample", substring_index(col("_base"), ".", 1))
      .withColumn("ext",
        when(col("_base").contains("."),
          expr("substring(_base, instr(_base, '.') + 1)"))
          .otherwise(lit("")))
    m.groupBy(col("shard"), col("sample"))
      .agg(map_from_entries(array_sort(
        collect_list(struct(col("ext"), col("bytes"))))).as("members"))
  }
}
