package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.UnigramTable

/** Unigram-LM (SentencePiece-style) tokenizer TRAINING — the other half
  * of the tokenizer-training surface next to [[BpeTrain]] (Kudo 2018,
  * "Subword Regularization"; the `spm_train --model_type=unigram`
  * path every Llama-family pipeline reproduces). North-star extension:
  * the reference consumes trained tokenizers
  * (diagnostic_group_pipeline_with_api.py:49-69), this produces one.
  *
  * Same scale discipline as BPE: training never needs the corpus, only
  * the WORD-FREQUENCY TABLE. One distributed pass (explode +
  * map-side-combined groupBy) produces the vocab-bounded word table;
  * seeding and EM run DRIVER-LOCAL on it — zero Spark jobs beyond the
  * single corpus scan, at any corpus size.
  *
  * The algorithm, pinned step by step so a DuckDB oracle can unroll it
  * exactly (hard-EM / Viterbi-EM — the standard deterministic variant
  * of SentencePiece's E-step, chosen over forward-backward expectations
  * because its arithmetic is IEEE-reproducible across engines):
  *
  *  1. SEED: every substring of length 1..`maxPieceLen` of every word
  *     (words capped at `maxWordLen` characters for training — the
  *     spm_train `max_sentencepiece_length`-style cap that bounds
  *     enumeration), weighted by word frequency; keep the top
  *     `seedSize` by (count desc, piece asc in code-point order) PLUS
  *     every single character (the closure that keeps all words
  *     segmentable — SentencePiece's required-chars rule).
  *  2. E-STEP: Viterbi-segment each word under piece probabilities
  *     cnt/total ([[UnigramTable]] — exact-integer inputs, pinned
  *     association, code-point tie-breaks).
  *  3. M-STEP + PRUNE: piece usage counts from the Viterbi
  *     segmentations (frequency-weighted); keep the top `pruneTo` by
  *     (usage desc, piece asc) plus all single characters (usage 0
  *     allowed — probability-0 pieces lose every later tie by
  *     construction of the tie-break).
  *  4. Repeat 2–3 `emIters` times. Output = final (piece, usage).
  */
object UnigramLm {

  final case class Config(maxPieceLen: Int = 4, seedSize: Int = 60,
                          pruneTo: Int = 40, emIters: Int = 2,
                          maxWordLen: Int = 12)

  private def cpCompare(a: String, b: String): Int = {
    val la = a.length; val lb = b.length
    var i = 0
    while (i < la && i < lb) {
      val ca = a.codePointAt(i); val cb = b.codePointAt(i)
      if (ca != cb) return Integer.compare(ca, cb)
      i += Character.charCount(ca)
    }
    Integer.compare(la, lb)
  }

  /** (count desc, piece asc code-point) — the pinned selection order. */
  private def topBy(m: Map[String, Long], k: Int): Seq[(String, Long)] =
    m.toSeq.sortWith { case ((pa, ca), (pb, cb)) =>
      if (ca != cb) ca > cb else cpCompare(pa, pb) < 0
    }.take(k)

  /** The ONE distributed pass: corpus → word-frequency table — the
    * SAME pass as BPE training (capped top-M collect, see
    * [[BpeTrain.MaxVocab]]), delegated so the cap semantics can never
    * diverge between the two tokenizer trainers.
    */
  def collectWordFreq(docs: DataFrame, textCol: String,
                      maxVocab: Int = BpeTrain.MaxVocab): Array[(String, Long)] =
    BpeTrain.collectWordFreq(docs, textCol, maxVocab)

  /** Driver-local seeding + hard-EM on the collected word table.
    * @return final vocabulary as (piece, usage), in (usage desc,
    *         piece asc) order, plus the usage total for scoring.
    */
  private[graft] def trainLocal(wordFreq: Array[(String, Long)],
                                cfg: Config): (Seq[(String, Long)], Long) = {
    val words = wordFreq.filter(_._1.length <= cfg.maxWordLen)
    // seed counts: all substrings length 1..maxPieceLen, freq-weighted
    val subCounts = scala.collection.mutable.HashMap.empty[String, Long]
    words.foreach { case (w, f) =>
      var st = 0
      while (st < w.length) {
        var l = 1
        while (l <= cfg.maxPieceLen && st + l <= w.length) {
          val p = w.substring(st, st + l)
          subCounts.update(p, subCounts.getOrElse(p, 0L) + f)
          l += 1
        }
        st += 1
      }
    }
    val seedTop = topBy(subCounts.toMap, cfg.seedSize)
    val seedTopSet = seedTop.map(_._1).toSet
    var vocab: Seq[(String, Long)] = seedTop ++
      subCounts.toSeq.filter { case (p, _) =>
        p.length == 1 && !seedTopSet(p) }.sortWith((a, b) => cpCompare(a._1, b._1) < 0)
    var iter = 0
    while (iter < cfg.emIters) {
      val total = vocab.map(_._2).sum
      val table = new UnigramTable(vocab, total, cfg.maxPieceLen)
      val usage = scala.collection.mutable.HashMap.empty[String, Long]
      words.foreach { case (w, f) =>
        val seg = table.segmentWord(w)
        if (seg != null && seg.nonEmpty)
          seg.split(" ").foreach(p =>
            usage.update(p, usage.getOrElse(p, 0L) + f))
      }
      val top = topBy(usage.toMap, cfg.pruneTo)
      val topSet = top.map(_._1).toSet
      val keptChars = vocab.collect {
        case (p, _) if p.length == 1 && !topSet(p) =>
          (p, usage.getOrElse(p, 0L))
      }.sortWith((a, b) => cpCompare(a._1, b._1) < 0)
      vocab = top ++ keptChars
      iter += 1
    }
    val sorted = vocab.sortWith { case ((pa, ca), (pb, cb)) =>
      if (ca != cb) ca > cb else cpCompare(pa, pb) < 0
    }
    (sorted, sorted.map(_._2).sum)
  }

  /** Train on a corpus: one distributed word-count pass, driver-local
    * EM. Deterministic — a pure function of the corpus.
    */
  def train(docs: DataFrame, textCol: String,
            cfg: Config = Config()): (Seq[(String, Long)], Long) =
    trainLocal(collectWordFreq(docs, textCol), cfg)

  /** Tokenize a corpus with a trained unigram vocabulary: posexploded
    * words through the codegen'd [[graft.functions.UnigramSegment]]
    * Viterbi expression — one shuffle-free projection, the table
    * shipped once per executor via the codegen reference mechanism.
    * `pieces` is null for words containing characters the training
    * corpus never saw.
    */
  def encode(docs: DataFrame, idCol: String, textCol: String,
             vocab: Seq[(String, Long)], total: Long,
             maxPieceLen: Int = Config().maxPieceLen): DataFrame = {
    val table = new UnigramTable(vocab, total, maxPieceLen)
    docs
      .select(col(idCol), posexplode(
        filter(split(trim(col(textCol)), "\\s+"), w => w =!= ""))
        .as(Seq("word_pos", "__word")))
      .select(col(idCol), col("word_pos").cast("long").as("word_pos"),
        graft.functions.UnigramSegment(col("__word"), table).as("pieces"))
  }
}
