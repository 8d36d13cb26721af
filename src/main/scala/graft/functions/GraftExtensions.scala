package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graft.Shims

/** SparkSessionExtensions entry point: registers graft's custom
  * expressions for SQL use, so
  *
  *   spark.sql("SELECT dot_product(a.embedding, b.embedding) ...")
  *
  * resolves to the codegen'd [[DotProduct]]. Activate with
  *   .config("spark.sql.extensions", "graft.functions.GraftExtensions")
  * or `.withExtensions(new GraftExtensions)` — the standard plug-in seam
  * for engine extensions (no fork, survives Spark upgrades).
  *
  * Besides the native expression, the Column-composition operators are
  * exposed as SQL functions too (graft_redact / graft_quality /
  * graft_tokens / graft_lang / graft_fingerprint): each call site
  * expands at analysis time into the same built-in expression tree the
  * Scala API builds, so SQL users get identical (codegen'd,
  * Catalyst-optimizable) semantics with no UDF tax.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  /** One-arg Column-composition function as a SQL registration. Arity is
    * validated up front (Spark's standard WRONG_NUM_ARGS analysis error),
    * not left to a NoSuchElementException on `head` or silent dropping of
    * extra arguments.
    */
  private def colFn(name: String,
                    f: org.apache.spark.sql.Column => org.apache.spark.sql.Column)
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    new FunctionIdentifier(name),
    new ExpressionInfo("graft.ops", name),
    (children: Seq[Expression]) => {
      if (children.length != 1) Shims.wrongNumArgs(name, 1, children.length)
      Shims.resolvedExpression(f(Shims.column(children.head)))
    })

  /** Shared by the injector below and GraftExtensionsSpec's live-registry
    * path (a running session can't replay build-time extensions).
    */
  private[graft] def sqlFunctions
      : Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (new FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (children: Seq[Expression]) => {
        if (children.length != 2) Shims.wrongNumArgs("dot_product", 2, children.length)
        DotProduct(children(0), children(1))
      }),
    colFn("graft_redact", graft.ops.Curation.redact),
    colFn("graft_quality", graft.ops.TextAnalysis.qualityScore),
    colFn("graft_tokens", graft.ops.TextAnalysis.tokenCountRegex),
    colFn("graft_lang", c => graft.ops.TextAnalysis.predictLang(c)),
    colFn("graft_fingerprint", graft.ops.TextOps.fingerprint),
    // greedy WordPiece pieces (fixture vocab) over normalized text —
    // SQL surface of graft.ops.Truncate.subwordPieces
    colFn("graft_wordpiece", c => graft.ops.Truncate.subwordPieces(c)),
    // round-6 curation/quality signals
    colFn("graft_hash_bucket", graft.ops.Curation.hashBucket),
    colFn("graft_strip_markup", graft.ops.Curation.stripMarkup),
    colFn("graft_dup_words", graft.ops.TextAnalysis.dupWordFrac),
    colFn("graft_top_bigram", graft.ops.TextAnalysis.topBigramFrac))

  override def apply(ext: SparkSessionExtensions): Unit = {
    sqlFunctions.foreach(ext.injectFunction)
    // whole-operator seam: plans graft.plans.AsOfJoinPlan nodes
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
  }
}
