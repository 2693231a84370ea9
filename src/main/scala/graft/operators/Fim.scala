package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fill-in-the-middle (FIM) data materialization (Bavarian et al.
  * 2022, "Efficient Training of Language Models to Fill in the
  * Middle"): a `fimRate` fraction of documents is split into
  * (prefix, middle, suffix) at two uniform character cuts and
  * re-rendered with sentinel tokens so an autoregressive model
  * learns infilling; the rest pass through verbatim. Of the
  * transformed docs, a `spmRate` fraction uses SPM sentinel order
  * (suffix before prefix), the rest PSM — the paper's 50/50 joint
  * training mix.
  *
  * Determinism (the oracle replays every decision): transform /
  * mode / both cut points are md5-prefix hashes of the document id
  * under distinct salts (`fim:r`, `fim:s`, `fim:a`, `fim:b`), the
  * same `conv(substr(md5, 1, 8), 16, 10)` device as
  * [[SpanCorruption]]; cuts are mod (n+1) so empty prefix / middle /
  * suffix are all reachable, as in the paper's character-level
  * random splits.
  *
  * Shape: one narrow projection — no explode, no join, no shuffle
  * beyond the final presentation sort; embarrassingly parallel and
  * codegen-friendly (substr + concat + md5 only), so it streams at
  * scan speed over a 100 TB corpus.
  *
  * Output: (idCol, mode ∈ {plain, psm, spm}, cut_lo, cut_hi,
  * n_chars, rendered, rendered_md5). */
object Fim {

  private def h(salt: String, id: Column): Column =
    conv(substring(md5(concat(lit(s"fim:$salt:"), id)), 1, 8), 16, 10)
      .cast("long")

  def transform(docs: DataFrame, idCol: String, textCol: String,
      fimRate: Double = 0.5, spmRate: Double = 0.5): DataFrame = {
    require(fimRate >= 0 && fimRate <= 1 && spmRate >= 0 &&
      spmRate <= 1, s"rates in [0,1] ($fimRate, $spmRate)")
    val fimPm = math.round(fimRate * 1000).toInt
    val spmPm = math.round(spmRate * 1000).toInt
    val id = col(idCol)
    val t = col(textCol)
    val n = length(t)
    val c1 = h("a", id) % (n + 1)
    val c2 = h("b", id) % (n + 1)
    val lo = least(c1, c2)
    val hi = greatest(c1, c2)
    val prefix = t.substr(lit(1), lo)
    val middle = t.substr(lo + 1, hi - lo)
    val suffix = t.substr(hi + 1, n - hi)
    val doFim = h("r", id) % 1000 < fimPm
    val doSpm = h("s", id) % 1000 < spmPm
    val psm = concat(lit("<fim_prefix>"), prefix,
      lit("<fim_suffix>"), suffix, lit("<fim_middle>"), middle)
    val spm = concat(lit("<fim_suffix>"), suffix,
      lit("<fim_prefix>"), prefix, lit("<fim_middle>"), middle)
    docs.select(
        id,
        when(!doFim, lit("plain"))
          .when(doSpm, lit("spm")).otherwise(lit("psm")).as("mode"),
        when(doFim, lo).otherwise(lit(null)).cast("long")
          .as("cut_lo"),
        when(doFim, hi).otherwise(lit(null)).cast("long")
          .as("cut_hi"),
        n.cast("long").as("n_chars"),
        when(!doFim, t).when(doSpm, spm).otherwise(psm)
          .as("rendered"))
      .withColumn("rendered_md5", md5(col("rendered")))
  }
}
