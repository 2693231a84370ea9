package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Subword tokenizers behind the [[Tokenizer]] trait (SURVEY §7 hard
  * part 2: chunk budgets are tokenizer-dependent; the reference counts
  * tokens with the e5 HF tokenizer, `text_utils.py:142-147`,
  * `text_processor.py:188-234`).
  *
  * Only token COUNTS and boundaries matter for chunk budgeting, so
  * neither implementation needs id vocabularies — WordPiece needs the
  * token set, byte-level BPE needs only the merge table. Both load
  * from the standard HF file formats (`vocab.txt`, `merges.txt`) so a
  * user can point them at a real model's files.
  */
object Tokenizers {

  /** WordPiece (the algorithm behind BERT-family tokenizers,
    * including e5's): lowercase + punctuation-split pre-tokenization,
    * then greedy longest-prefix matching against the vocab with `##`
    * continuation pieces; words with no match become `[UNK]`. */
  class WordPieceTokenizer(vocab: Set[String],
      lowercase: Boolean = true, unk: String = "[UNK]",
      maxCharsPerWord: Int = 100) extends Tokenizer {

    private def preTokenize(s: String): Array[String] = {
      val t = if (lowercase) s.toLowerCase else s
      // split on whitespace, then isolate punctuation (BERT basic
      // tokenizer behavior)
      t.split("\\s+").filter(_.nonEmpty).flatMap { w =>
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        val cur = new StringBuilder
        w.foreach { c =>
          if (c.isLetterOrDigit) cur.append(c)
          else {
            if (cur.nonEmpty) { out += cur.toString; cur.clear() }
            out += c.toString
          }
        }
        if (cur.nonEmpty) out += cur.toString
        out
      }
    }

    private def wordPieces(w: String): Seq[String] = {
      if (w.length > maxCharsPerWord) return Seq(unk)
      val pieces = scala.collection.mutable.ArrayBuffer.empty[String]
      var start = 0
      while (start < w.length) {
        var end = w.length
        var found: String = null
        while (found == null && end > start) {
          val sub = (if (start > 0) "##" else "") + w.substring(start, end)
          if (vocab.contains(sub)) found = sub else end -= 1
        }
        if (found == null) return Seq(unk)
        pieces += found
        start = end
      }
      pieces.toSeq
    }

    def tokenize(s: String): Array[String] =
      preTokenize(s).flatMap(wordPieces)

    /** Join pieces, fusing `##` continuations back onto their word. */
    def detokenize(tokens: Seq[String]): String = {
      val sb = new StringBuilder
      tokens.foreach { t =>
        if (t.startsWith("##")) sb.append(t.substring(2))
        else {
          if (sb.nonEmpty) sb.append(' ')
          sb.append(t)
        }
      }
      sb.toString
    }
  }

  object WordPieceTokenizer {
    /** HF `vocab.txt`: one token per line. */
    def fromVocabFile(path: String): WordPieceTokenizer =
      new WordPieceTokenizer(
        scala.io.Source.fromFile(path, "UTF-8").getLines()
          .map(_.trim).filter(_.nonEmpty).toSet)
  }

  /** Byte-level BPE (the GPT-2 family algorithm): each pre-token's
    * UTF-8 bytes map to printable unicode symbols, then adjacent
    * pairs merge greedily in merge-table rank order. Pre-tokenization
    * here is whitespace-run splitting with the GPT-2 convention of a
    * leading `Ġ` (space marker) on non-initial words. */
  class ByteLevelBpeTokenizer(merges: Seq[(String, String)])
      extends Tokenizer {

    private val rank: Map[(String, String), Int] =
      merges.zipWithIndex.toMap

    private def byteToChar = ByteLevelBpeTokenizer.byteToChar
    private def charToByte = ByteLevelBpeTokenizer.charToByte

    private def bpe(word: Seq[String]): Seq[String] = {
      var parts = word
      var done = parts.length < 2
      while (!done) {
        val pairs = parts.zip(parts.tail)
        val best = pairs.filter(rank.contains).sortBy(rank).headOption
        best match {
          case None => done = true
          case Some((a, b)) =>
            val out = scala.collection.mutable.ArrayBuffer.empty[String]
            var i = 0
            while (i < parts.length) {
              if (i < parts.length - 1 && parts(i) == a &&
                  parts(i + 1) == b) {
                out += (a + b); i += 2
              } else { out += parts(i); i += 1 }
            }
            parts = out.toSeq
            done = parts.length < 2
        }
      }
      parts
    }

    def tokenize(s: String): Array[String] = {
      val words = s.split("\\s+").filter(_.nonEmpty)
      words.zipWithIndex.flatMap { case (w, i) =>
        val marked = (if (i > 0) " " else "") + w
        val symbols = marked.getBytes("UTF-8")
          .map(b => byteToChar(b & 0xff).toString).toSeq
        bpe(symbols)
      }
    }

    /** Reverse the byte↔unicode mapping; the `Ġ` space markers
      * restore the original word separation. */
    def detokenize(tokens: Seq[String]): String = {
      val bytes = tokens.flatMap(_.map(charToByte(_)))
      new String(bytes.toArray, "UTF-8")
    }
  }

  object ByteLevelBpeTokenizer {
    /** GPT-2 byte→unicode table: printable bytes map to themselves,
      * the rest shift into the U+0100 range. */
    private[operators] val byteToChar: Array[Char] = {
      val printable =
        (('!' to '~') ++ ('¡' to '¬') ++ ('®' to 'ÿ'))
          .map(_.toInt).toSet
      val table = new Array[Char](256)
      var shift = 0
      (0 until 256).foreach { b =>
        if (printable.contains(b)) table(b) = b.toChar
        else { table(b) = (256 + shift).toChar; shift += 1 }
      }
      table
    }
    private[operators] val charToByte: Map[Char, Byte] =
      byteToChar.zipWithIndex.map { case (c, b) => c -> b.toByte }.toMap

    /** HF `merges.txt`: optional `#version` header, then one
      * space-separated pair per line in rank order. */
    def fromMergesFile(path: String): ByteLevelBpeTokenizer =
      new ByteLevelBpeTokenizer(
        scala.io.Source.fromFile(path, "UTF-8").getLines()
          .map(_.trim)
          .filter(l => l.nonEmpty && !l.startsWith("#"))
          .map { l =>
            val Array(a, b) = l.split(" ", 2)
            (a, b)
          }.toSeq)
  }

  /** BPE TRAINING (Sennrich et al. 2016 §3.2, byte-level/GPT-2
    * variant — the merges this learns drive [[ByteLevelBpeTokenizer]]
    * directly): repeatedly merge the most frequent adjacent symbol
    * pair, counting pair frequency over word TYPES weighted by their
    * corpus frequency.
    *
    * Architecture — the same split every single-node trainer
    * (HF tokenizers, sentencepiece) uses, distributed where it
    * matters: the ONLY corpus-sized step is the word-frequency
    * aggregation (one explode + one count shuffle with map-side
    * combine over 100 TB); the merge loop then runs on the driver
    * over the frequency-pruned TYPE table (top `maxTypes` by count —
    * vocabulary-sized, not corpus-sized; the dropped tail's mass is
    * negligible by Zipf, and pruning is how production trainers
    * bound this too). Loop cost: O(numMerges · Σ type lengths),
    * independent of corpus size.
    *
    * Words are marked with the GPT-2 leading-space convention before
    * byte→unicode mapping (document-initial words unmarked, the rest
    * `Ġ`-prefixed), so learned merges compose with
    * [[ByteLevelBpeTokenizer.tokenize]]'s pre-tokenization exactly.
    * Pair counts count every adjacency (overlaps included);
    * ties break by (count desc, pair lexicographic asc) — a total
    * order, so training is deterministic for a given corpus. */
  def trainBpe(df: DataFrame, textCol: String, numMerges: Int,
      maxTypes: Int = 100000): Seq[(String, String)] = {
    val marked = df
      .select(posexplode(split(col(textCol), "\\s+"))
        .as(Seq("i", "w")))
      .filter(length(col("w")) > 0)
      .select(when(col("i") === 0, col("w"))
        .otherwise(concat(lit(" "), col("w"))).as("w"))
    val types = marked.groupBy(col("w"))
      .agg(count(lit(1)).as("c"))
      .orderBy(desc("c"), col("w"))
      .limit(maxTypes)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))

    var syms: Array[(Array[String], Long)] = types.map { case (w, c) =>
      (w.getBytes("UTF-8")
        .map(b => ByteLevelBpeTokenizer.byteToChar(b & 0xff).toString),
        c)
    }
    def mergeOnce(ss: Array[String], p: (String, String)): Array[String] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < ss.length) {
        if (i < ss.length - 1 && ss(i) == p._1 && ss(i + 1) == p._2) {
          out += (p._1 + p._2); i += 2
        } else { out += ss(i); i += 1 }
      }
      out.toArray
    }
    val merges = Seq.newBuilder[(String, String)]
    var k = 0
    var exhausted = false
    while (k < numMerges && !exhausted) {
      val counts =
        scala.collection.mutable.HashMap.empty[(String, String), Long]
      syms.foreach { case (ss, c) =>
        var i = 0
        while (i < ss.length - 1) {
          val p = (ss(i), ss(i + 1))
          counts.update(p, counts.getOrElse(p, 0L) + c)
          i += 1
        }
      }
      if (counts.isEmpty) exhausted = true
      else {
        val best = counts.toSeq
          .minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += best
        syms = syms.map { case (ss, c) => (mergeOnce(ss, best), c) }
        k += 1
      }
    }
    merges.result()
  }
}
