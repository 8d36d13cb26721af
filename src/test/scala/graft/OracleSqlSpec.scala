package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the preconditions of the `AS MATERIALIZED` oracle rewrite
  * (SparkEntry.oracleSql): the regex exempts `WINDOW w AS (` by a
  * single-space uppercase same-line lookbehind, so every oracle must
  * keep its WINDOW clauses in exactly that shape — one named window per
  * clause, uppercase keyword, same line. A second window in one clause
  * (`WINDOW w AS (...), v AS (...)`) would be rewritten into invalid
  * SQL and surface as a phantom correctness failure at the driver.
  */
class OracleSqlSpec extends AnyFunSuite {

  test("no transformed oracle corrupts a WINDOW clause") {
    val bad = "WINDOW\\s+\\w+\\s+AS\\s+MATERIALIZED".r
    for ((name, sql) <- SparkEntry.oracleSql)
      assert(bad.findFirstIn(sql).isEmpty,
        s"$name: WINDOW clause was rewritten to MATERIALIZED")
  }

  test("no raw oracle uses a shape the rewrite can't protect") {
    // same-line only: a CTE following the window clause on the NEXT
    // line (this repo's stripMargin style) is not a second window
    val multiWindow = "(?i)window [^\\n]*\\)[ \\t]*,[ \\t]*\\w+ as \\(".r
    val lowerOrSplitWindow = "(?i)window\\s+\\w+\\s+as\\s+\\(".r
    for (q <- SparkEntry.registry; sql <- q.oracle) {
      assert(multiWindow.findFirstIn(sql).isEmpty,
        s"${q.name}: multi-window WINDOW clause — the MATERIALIZED " +
          "rewrite would corrupt the second window; use two queries' " +
          "windows inline or separate WINDOW clauses per query")
      for (m <- lowerOrSplitWindow.findAllIn(sql))
        assert(m.startsWith("WINDOW ") && !m.contains("\n"),
          s"${q.name}: WINDOW clause must be uppercase, single-space, " +
            s"same-line for the rewrite's lookbehind (got: $m)")
    }
  }

  test("every CTE in every transformed oracle is materialized") {
    // the inverse guard: a CTE the rewrite MISSED (e.g. unusual
    // whitespace) silently reverts to inline evaluation and the
    // driver's compare budget regresses — catch the drift here
    val unmat = "(?<!WINDOW )\\b\\w+ AS \\(".r
    for ((name, sql) <- SparkEntry.oracleSql)
      assert(unmat.findFirstIn(sql).isEmpty,
        s"$name: CTE left unmaterialized after the rewrite")
  }

  test("column-list CTEs (the rewrite's known-uncovered shape) are all " +
      "tiny VALUES constant tables") {
    // `name(col, ...) AS (` does not match the rewrite regex (the token
    // before AS is `)`, not \w+), so these CTEs stay unmaterialized —
    // and the previous inverse guard, built from the SAME shape, was
    // blind to them too. That is acceptable ONLY while every such CTE
    // is a constant `(VALUES ...)` table (weights, quantile probes,
    // literal vocab rows): inlining a literal table per reference costs
    // nothing. A column-list CTE wrapping a real SELECT would re-run
    // its upstream per reference — flag it here so it gets rewritten
    // into the `name AS (SELECT ... FROM (VALUES ...) t(col))` shape
    // the materializer covers.
    // Two-step on purpose: the MATCH is loose (any `name(cols) AS (`,
    // whatever the body starts with) and the VALUES check runs on the
    // text AFTER the match — a one-regex version that required the
    // body to start with `\w+` silently SKIPPED bodies opening with a
    // comment, a nested paren, or a quoted identifier, i.e. exactly
    // the shapes it existed to flag.
    val colListCte = "(?is)\\b\\w+\\s*\\([^()]*\\)\\s+AS\\s+\\(".r
    for ((name, sql) <- SparkEntry.oracleSql;
         m <- colListCte.findAllMatchIn(sql)) {
      val body = sql.substring(m.end).dropWhile(_.isWhitespace)
      assert(body.toUpperCase.startsWith("VALUES"),
        s"$name: column-list CTE with a non-VALUES body is invisible " +
          s"to the MATERIALIZED rewrite (body starts: ${body.take(30)})")
    }
  }
}
