package graft.ops

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** A1 — model accuracy evaluation (SURVEY.md §2.5; reference:
  * model_accuracy, mvp_pipe.py:65-68 — the only aggregate in the repo).
  *
  * Two forms:
  *  - [[accuracyCol]]: a pure-expression form (avg of a 0/1 indicator) that
  *    stays inside whole-stage codegen and is what production code should
  *    use;
  *  - [[Accuracy]]: a typed `Aggregator[(pred, truth), (hits, total), Double]`
  *    demonstrating the custom-UDAF seam for metrics Spark lacks. Partial
  *    aggregation (map-side combine) is automatic — each partition reduces
  *    to an 16-byte buffer before the single-stage shuffle.
  */
object Metrics {

  def accuracyCol(pred: Column, truth: Column): Column =
    avg(when(pred === truth, 1.0).otherwise(0.0))

  object Accuracy extends Aggregator[(String, String), (Long, Long), Double] {
    def zero: (Long, Long) = (0L, 0L)
    def reduce(b: (Long, Long), a: (String, String)): (Long, Long) =
      (b._1 + (if (a._1 != null && a._1 == a._2) 1L else 0L), b._2 + 1L)
    def merge(b1: (Long, Long), b2: (Long, Long)): (Long, Long) =
      (b1._1 + b2._1, b1._2 + b2._2)
    def finish(b: (Long, Long)): Double =
      if (b._2 == 0L) 0.0 else b._1.toDouble / b._2
    def bufferEncoder: Encoder[(Long, Long)] = Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Column form of the typed aggregator, usable in `df.agg(...)`. */
  def accuracyUdaf(pred: Column, truth: Column): Column =
    udaf(Accuracy, Encoders.tuple(Encoders.STRING, Encoders.STRING))
      .apply(pred, truth)
}
