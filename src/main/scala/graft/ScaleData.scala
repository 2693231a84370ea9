package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Materialize a K×-scaled copy of a testdata directory (default
  * 10× ≈ "sf1" from sf0.1) so the FULL registry bench can run at a
  * larger scale — the testdata root is read-only, so the scaled
  * tables land under a caller-chosen writable dir.
  *
  * Scaling follows TPC-H semantics: region/nation (fixed dimensions)
  * copy through; every fact/corpus table replicates K times with its
  * PRIMARY keys offset per replica and its FOREIGN keys into scaled
  * tables offset consistently (so join fan-outs stay realistic —
  * K× customers each keep their order history, K× orders keep their
  * line items). nation/region keys are NOT offset (fixed dims).
  * Corpus replicas follow the ScaleBench device: replica r of a
  * document appends a replica token (new content, same statistics);
  * replica r of an embedding perturbs component 1 by 0.01·r (new
  * vector, same geometry); events shift replica r by r days so
  * stream span grows with volume.
  *
  * Usage: runMain graft.ScaleData <srcDir> <outDir> [k]
  */
object ScaleData {

  private def replicate(base: DataFrame, k: Int)(
      mk: (DataFrame, Int) => DataFrame): DataFrame =
    (0 until k).map(r => mk(base, r)).reduce(_ unionByName _)

  def main(args: Array[String]): Unit = {
    val src = args(0)
    val out = args(1)
    val k = if (args.length > 2) args(2).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = GraftSession.build(s"local[$cpus]", cpus.toInt)
    def rd(t: String) = spark.read.parquet(s"$src/$t.parquet")
    def wr(df: DataFrame, t: String): Unit =
      df.write.mode("overwrite").parquet(s"$out/$t.parquet")
    val M = 100000000L // key offset stride per replica

    // fixed dimensions: straight copies
    wr(rd("region"), "region")
    wr(rd("nation"), "nation")

    wr(replicate(rd("customer"), k) { (b, r) =>
      b.select((col("c_custkey") + lit(r * M)).as("c_custkey"),
        concat(col("c_name"), lit(s"#$r")).as("c_name"),
        col("c_nationkey"), col("c_acctbal"), col("c_mktsegment"))
    }, "customer")

    wr(replicate(rd("supplier"), k) { (b, r) =>
      b.select((col("s_suppkey") + lit(r * M)).as("s_suppkey"),
        concat(col("s_name"), lit(s"#$r")).as("s_name"),
        col("s_nationkey"), col("s_acctbal"))
    }, "supplier")

    wr(replicate(rd("part"), k) { (b, r) =>
      b.select((col("p_partkey") + lit(r * M)).as("p_partkey"),
        concat(col("p_name"), lit(s" v$r")).as("p_name"),
        col("p_brand"), col("p_type"), col("p_size"),
        col("p_retailprice"))
    }, "part")

    wr(replicate(rd("orders"), k) { (b, r) =>
      b.select((col("o_orderkey") + lit(r * M)).as("o_orderkey"),
        (col("o_custkey") + lit(r * M)).as("o_custkey"),
        col("o_orderstatus"), col("o_totalprice"),
        col("o_orderdate"), col("o_orderpriority"))
    }, "orders")

    wr(replicate(rd("lineitem"), k) { (b, r) =>
      b.select((col("l_orderkey") + lit(r * M)).as("l_orderkey"),
        (col("l_partkey") + lit(r * M)).as("l_partkey"),
        (col("l_suppkey") + lit(r * M)).as("l_suppkey"),
        col("l_linenumber"), col("l_quantity"),
        col("l_extendedprice"), col("l_discount"), col("l_tax"),
        col("l_returnflag"), col("l_linestatus"), col("l_shipdate"))
    }, "lineitem")

    wr(replicate(rd("events"), k) { (b, r) =>
      b.select((col("event_id") + lit(r * M)).as("event_id"),
        (col("ts") + expr(s"INTERVAL $r DAYS")).as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
    }, "events")

    wr(replicate(rd("documents"), k) { (b, r) =>
      val text =
        if (r == 0) col("text")
        else concat(col("text"), lit(s" replica$r"))
      b.select((col("doc_id") + lit(r * M)).as("doc_id"),
        text.as("text"), col("lang"), col("source"),
        length(text).cast(b.schema("n_chars").dataType)
          .as("n_chars"))
    }, "documents")

    wr(replicate(rd("embeddings"), k) { (b, r) =>
      val emb =
        if (r == 0) col("embedding")
        else concat(
          array((element_at(col("embedding"), 1) +
            lit(0.01f * r)).cast("float")),
          slice(col("embedding"), 2, Int.MaxValue))
      b.select((col("vec_id") + lit(r * M)).as("vec_id"),
        emb.cast("array<float>").as("embedding"), col("label"))
    }, "embeddings")

    println(s"""{"scaled":"$out","k":$k}""")
    spark.stop()
  }
}
