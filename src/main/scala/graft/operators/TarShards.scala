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

  /** WebDataset tar-shard SINK — the write side of [[readSamples]]:
    * each sample's ext→bytes members become `<sample>.<ext>` tar
    * entries, samples are md5-bucketed into `shards` shards
    * (deterministic, no RNG, engine-portable — the [[Split]] device)
    * and each task streams its shards' tars to
    * `<dir>/shard-NNNNN.tar` in one pass (sorted by (shard, sample),
    * so memory holds one member at a time, never a shard).
    *
    * Headers are POSIX ustar with zeroed mtime/uid/gid and fixed
    * mode, so shard bytes are BIT-REPRODUCIBLE: writing the same
    * corpus twice yields identical files — the property downstream
    * caching/dedup layers rely on. Round-trip and determinism are
    * spec-pinned (TarShardsSpec).
    *
    * Input schema: (sample STRING, members MAP<STRING, BINARY>) —
    * [[readSamples]]' output minus the shard column. */
  def writeShards(samples: DataFrame, dir: String,
      shards: Int): Unit = {
    val n = math.max(shards, 1)
    samples
      .select(col("sample").cast("string").as("sample"),
        col("members"))
      // fail FAST with a usable message instead of an opaque task
      // NPE (null sample) or a silently-wrong read-back (a dotted
      // sample key would re-split at the wrong '.' in readSamples)
      .withColumn("sample",
        when(col("sample").isNull, raise_error(
          lit("writeShards: null sample key")))
          .when(col("sample").contains("."), raise_error(concat(
            lit("writeShards: sample key must not contain '.' " +
              "(dots separate the extension): "), col("sample"))))
          .otherwise(col("sample")))
      .withColumn("_shard", pmod(
        conv(substring(md5(col("sample")), 1, 8), 16, 10).cast("long"),
        lit(n.toLong)).cast("int"))
      .repartition(n, col("_shard"))
      .sortWithinPartitions(col("_shard"), col("sample"))
      .foreachPartition { rows: Iterator[Row] =>
        val conf = new org.apache.hadoop.conf.Configuration()
        val base = new org.apache.hadoop.fs.Path(dir)
        val fs = base.getFileSystem(conf)
        var current = -1
        var out: java.io.OutputStream = null
        def close(): Unit = if (out != null) {
          out.write(new Array[Byte](1024)) // two zero trailer blocks
          out.close()
          out = null
        }
        while (rows.hasNext) {
          val r = rows.next()
          val sample = r.getString(0)
          val members = r.getMap[String, Array[Byte]](1)
          val shard = r.getInt(2)
          if (shard != current) {
            close()
            current = shard
            out = fs.create(new org.apache.hadoop.fs.Path(base,
              f"shard-$shard%05d.tar"), true)
          }
          members.toSeq.sortBy(_._1).foreach { case (ext, bytes) =>
            val name = if (ext.isEmpty) sample else s"$sample.$ext"
            out.write(ustarHeader(name,
              if (bytes == null) 0 else bytes.length))
            if (bytes != null) {
              out.write(bytes)
              val pad = (512 - bytes.length % 512) % 512
              if (pad > 0) out.write(new Array[Byte](pad))
            }
          }
        }
        close()
      }
  }

  /** POSIX ustar header: zeroed mtime/uid/gid, mode 0644, typeflag
    * '0' — every varying field is a pure function of (name, size) so
    * output bytes are reproducible. Names longer than 100 bytes are
    * rejected (WebDataset sample keys are short by construction). */
  private[operators] def ustarHeader(name: String,
      size: Long): Array[Byte] = {
    val nameB = name.getBytes("UTF-8")
    require(nameB.length <= 100, s"member name too long: $name")
    val h = new Array[Byte](512)
    System.arraycopy(nameB, 0, h, 0, nameB.length)
    def octal(v: Long, off: Int, len: Int): Unit = {
      val s = java.lang.Long.toOctalString(v)
      // an overflowing field would silently truncate the LAST octal
      // digit and desync every later 512-byte block — reject instead
      // (12-octal-digit size field caps members at 8 GiB - 1)
      require(s.length <= len - 1,
        s"ustar field overflow: $v does not fit $len octal bytes")
      val padded = ("0" * (len - 1 - s.length)) + s
      System.arraycopy(padded.getBytes("US-ASCII"), 0, h, off,
        len - 1) // trailing NUL stays zero
    }
    octal(420, 100, 8)  // mode 0644
    octal(0, 108, 8)    // uid
    octal(0, 116, 8)    // gid
    octal(size, 124, 12)
    octal(0, 136, 12)   // mtime
    java.util.Arrays.fill(h, 148, 156, ' '.toByte) // chksum spaces
    h(156) = '0'        // typeflag: regular file
    System.arraycopy("ustar".getBytes("US-ASCII"), 0, h, 257, 5)
    h(263) = '0'; h(264) = '0' // version "00" (magic NUL at 262)
    val sum = h.map(_ & 0xff).sum
    val chk = java.lang.Long.toOctalString(sum)
    val chkPadded = ("0" * (6 - chk.length)) + chk
    System.arraycopy(chkPadded.getBytes("US-ASCII"), 0, h, 148, 6)
    h(154) = 0; h(155) = ' '
    h
  }
}
