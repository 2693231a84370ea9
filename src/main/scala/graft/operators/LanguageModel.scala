package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** Statistical language-model quality scoring for training-data
  * pipelines (builder brief extension; the CCNet device — Wenzek et
  * al. 2020 §4.3 — of ranking a corpus by LM perplexity, with the LM
  * here trained on the corpus itself instead of an external KenLM, so
  * the whole signal stays inside the engine and is oracle-checkable).
  *
  * Model: add-one-smoothed bigram LM over whitespace tokens.
  * For each in-document bigram (w1, w2):
  *
  *   surprisal = −ln( (c(w1,w2) + 1) / (c(w1) + V) )
  *
  * where c(·) are corpus counts and V the corpus vocabulary size. A
  * document's score is its mean bigram surprisal — high values mean
  * improbable word sequences (boilerplate soup, OCR noise, wrong-
  * language text), the rows a perplexity filter drops first.
  *
  * Float parity (the [[graft.queries.Tables]] discipline): each ln is
  * truncated to 9 decimals (`floor(ln·1e9)/1e9` — JVM `Math.log` and
  * any libm agree far beyond 9 digits, so the truncation is
  * engine-portable), and the per-document sum goes through an exact
  * DECIMAL(18,9) cast so parallel partial aggregation cannot reorder
  * IEEE additions.
  *
  * Scale: the token stream is exploded once (size ≈ corpus tokens);
  * the bigram/unigram count tables are vocabulary-sized and join back
  * to the stream as hash joins on the word keys; the vocabulary size
  * is a one-row broadcast. The per-document window (`lead`) shuffles
  * the stream once on the document id — the same exchange the final
  * per-document aggregate needs, so Catalyst reuses the partitioning.
  * Nothing here is quadratic and no state lives on the driver.
  */
object LanguageModel {

  /** Truncated natural log, identical across engines at 9 decimals. */
  private def ln9(x: Column): Column =
    floor(log(x) * lit(1e9)).cast("double") / lit(1e9)

  /** Per-document mean bigram surprisal under the corpus-trained
    * add-one bigram LM. Documents with fewer than two tokens have no
    * bigrams and are absent from the result (inner-join semantics —
    * a perplexity filter has nothing to say about them).
    *
    * Output: (idCol, n_bigrams, mean_surprisal), ordered by idCol.
    */
  def bigramSurprisal(df: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val toks = df
      .select(col(idCol).as("doc"),
        posexplode(split(col(textCol), " ")).as(Seq("pos", "w")))
    val uni = toks.groupBy(col("w").as("uw"))
      .agg(count(lit(1)).as("cu"))
    // |vocabulary| = row count of the unigram table — same value as
    // COUNT(DISTINCT w) over the stream, one token-stream scan fewer.
    val voc = uni.agg(count(lit(1)).as("v"))
    val perDoc = Window.partitionBy(col("doc")).orderBy(col("pos"))
    val bigrams = toks
      .withColumn("w2", lead(col("w"), 1).over(perDoc))
      .filter(col("w2").isNotNull)
      .select(col("doc"), col("w").as("w1"), col("w2"))
    val bi = bigrams.groupBy(col("w1").as("b1"), col("w2").as("b2"))
      .agg(count(lit(1)).as("cb"))
    val scored = bigrams
      .join(bi, col("w1") === col("b1") && col("w2") === col("b2"))
      .join(uni, col("w1") === col("uw"))
      .crossJoin(broadcast(voc))
      .withColumn("s", -ln9((col("cb") + 1).cast("double") /
        (col("cu") + col("v")).cast("double")))
    scored
      .groupBy(col("doc").as(idCol))
      .agg(
        count(lit(1)).as("n_bigrams"),
        (sum(col("s").cast(DecimalType(18, 9))).cast("double") /
          count(lit(1))).as("mean_surprisal"))
      .orderBy(col(idCol))
  }
}
