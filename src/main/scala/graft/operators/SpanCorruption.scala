package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** T5-style span corruption (Raffel et al. 2020 §3.1.4) — the
  * denoising-objective data materialization for seq2seq pretraining:
  * ~`noiseRate` of each document's tokens, in multi-token spans, are
  * replaced by numbered sentinels in the INPUT and emitted after
  * their sentinels as the TARGET.
  *
  * Deterministic sampling: the corpus is tiled into fixed
  * `spanLen`-token blocks and block (doc, pos div spanLen) is noised
  * when its md5-prefix hash lands under `noiseRate` — expected
  * coverage = noiseRate with mean span length spanLen, the T5
  * defaults (0.15, 3), trading T5's geometric span lengths for a
  * hash-replayable fixed length (adjacent noised blocks merge into
  * longer spans, so realized lengths still vary). Every decision is
  * a pure function of (doc, pos), so the oracle replays the exact
  * input/target strings.
  *
  * Shapes: one token explode; noise runs found by the classic
  * gaps-and-islands window (pos − dense-rank over noised positions,
  * per doc — bounded by document length); strings rebuilt with an
  * order-preserving sorted-struct aggregation. No joins, no driver
  * state; embarrassingly parallel across documents.
  *
  * Output: (idCol, n_tokens, n_masked, n_spans, input_text,
  * target_text), sentinels rendered `<extra_id_K>` per doc in span
  * order. Documents with no noised block pass through with an empty
  * target. */
object SpanCorruption {

  def corrupt(docs: DataFrame, idCol: String, textCol: String,
      noiseRate: Double = 0.15, spanLen: Int = 3): DataFrame = {
    require(noiseRate > 0 && noiseRate < 1 && spanLen >= 1,
      s"0 < noiseRate < 1, spanLen >= 1 ($noiseRate, $spanLen)")
    val permille = math.round(noiseRate * 1000).toInt
    val toks = docs.select(col(idCol).as("doc"),
      posexplode(filter(split(col(textCol), " "),
        x => length(x) > 0)).as(Seq("pos", "w")))
    val noised = toks.withColumn("blk",
        expr(s"pos div $spanLen"))
      .withColumn("noise",
        conv(substring(md5(concat(lit("span:"), col("doc"), lit(":"),
          col("blk"))), 1, 8), 16, 10).cast("long") % 1000 <
          permille)
    // islands: consecutive noised positions share (pos - seq) where
    // seq numbers the doc's noised tokens in order
    val wNoise = Window.partitionBy(col("doc"))
      .orderBy(col("pos"))
    val runs = noised
      .withColumn("nseq",
        sum(when(col("noise"), 1).otherwise(0)).over(wNoise))
      .withColumn("island",
        when(col("noise"), col("pos") - col("nseq")))
    // span index K per doc: dense rank of island id — non-noised
    // rows (null island) must sort LAST so island 1..S rank cleanly
    val wIsland = Window.partitionBy(col("doc"))
      .orderBy(col("island").asc_nulls_last)
    val spans = runs
      .withColumn("k",
        when(col("noise"), dense_rank().over(wIsland) - 1))
    // first noised token of an island carries the sentinel
    val wPos = Window.partitionBy(col("doc"), col("island"))
      .orderBy(col("pos"))
    val pieces = spans
      .withColumn("first",
        col("noise") && row_number().over(wPos) === 1)
      .withColumn("sentinel",
        concat(lit("<extra_id_"), col("k"), lit(">")))
      .withColumn("inPiece",
        when(!col("noise"), col("w"))
          .otherwise(when(col("first"), col("sentinel"))))
      .withColumn("tgtPiece",
        when(col("noise"),
          when(col("first"), concat(col("sentinel"), lit(" "),
            col("w"))).otherwise(col("w"))))
    def joined(piece: Column): Column =
      array_join(transform(
        array_sort(collect_list(when(piece.isNotNull,
          struct(col("pos"), piece.as("p"))))),
        x => x.getField("p")), " ")
    pieces.groupBy(col("doc").as(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("noise"), 1L).otherwise(0L)).as("n_masked"),
        countDistinct(when(col("noise"), col("island")))
          .as("n_spans"),
        joined(col("inPiece")).as("input_text"),
        joined(col("tgtPiece")).as("target_text"))
      .orderBy(col(idCol))
  }
}
