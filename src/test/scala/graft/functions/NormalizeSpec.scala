package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class NormalizeSpec extends SparkSpec {
  import spark.implicits._

  // explicit escapes, never raw chars: source/tooling charset drift
  // would silently change what is being tested
  private val deco = "Cafe\u0301"    // e + combining acute (5 chars)
  private val comp = "Caf\u00e9"     // precomposed é (4 chars)

  test("nfc composes decomposed sequences; idempotent on composed text") {
    val df = Seq(deco, comp, "No\u0308el", "plain ascii").toDF("t")
    val got = df.select(Normalize.nfc($"t").as("n"),
        length($"t").as("raw"), length(Normalize.nfc($"t")).as("nl"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2)))
    assert(got(0) == ((comp, 5, 4)), s"${got(0)}")
    assert(got(1) == ((comp, 4, 4)))
    assert(got(2) == (("N\u00f6el", 5, 4)))
    assert(got(3) == (("plain ascii", 11, 11)))
    assert(got(0)._1 == got(1)._1, "decomposed and composed unify")
  }

  test("nfkc additionally folds compatibility variants (ligature, " +
      "fullwidth digit) that nfc preserves") {
    val t = "\ufb01le \uff15x" // fi-ligature + fullwidth 5
    val r = Seq(t).toDF("t")
      .select(Normalize.nfc($"t"), Normalize.nfkc($"t")).head()
    assert(r.getString(0) == t, "NFC keeps compatibility chars")
    assert(r.getString(1) == "file 5x", s"NFKC folds them: ${r.getString(1)}")
  }

  test("null propagates; expression stays native (no UDF in the plan)") {
    val df = Seq(Option("a"), None).toDF("t")
    val got = df.select(Normalize.nfc($"t")).collect().map(_.isNullAt(0))
    assert(got.toSeq == Seq(false, true))
    val plan = df.select(Normalize.nfc($"t")).queryExecution
      .executedPlan.toString
    assert(!plan.contains("ScalaUDF") && !plan.contains("BatchEvalPython"),
      plan)
  }
}
