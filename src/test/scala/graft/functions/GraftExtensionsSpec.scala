package graft.functions

import graft.SparkSpec

class GraftExtensionsSpec extends SparkSpec {

  private def registerAll(): Unit = {
    // the injector path (used when the session is built with
    // spark.sql.extensions) must accept every registration
    new GraftExtensions().apply(new org.apache.spark.sql.SparkSessionExtensions)
    // the shared test session already exists, so register on its live
    // function registry (withExtensions only applies at build time)
    new GraftExtensions().sqlFunctions.foreach { case (id, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(id.funcName, builder, "scala_udf")
    }
  }

  test("dot_product is callable from SQL once registered") {
    registerAll()
    val v = spark.sql(
      "SELECT dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
      .collect()(0).getDouble(0)
    assert(v == 11.0)
  }

  test("column-composition operators are callable from SQL with API parity") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    registerAll()
    val row = spark.sql(
      """SELECT graft_redact('mail a@b.co ref 1234567') AS r,
        |       graft_tokens('one two, three') AS t,
        |       graft_fingerprint('  Some Text  ') AS f""".stripMargin)
      .collect()(0)
    assert(row.getString(0) == "mail <EMAIL> ref <ID>")
    assert(row.getLong(1) == 4L) // "one", "two", ",", "three"
    val viaApi = Seq("  Some Text  ").toDF("t")
      .select(graft.ops.TextOps.fingerprint(col("t"))).collect()(0).getString(0)
    assert(row.getString(2) == viaApi)
  }

  test("graft_wordpiece tokenizes from SQL with API parity") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    registerAll()
    val viaSql = spark.sql("SELECT graft_wordpiece('Theme PLAYING!') AS p")
      .collect()(0).getSeq[String](0)
    val viaApi = Seq("Theme PLAYING!").toDF("t")
      .select(graft.ops.Truncate.subwordPieces(col("t")))
      .collect()(0).getSeq[String](0)
    assert(viaSql == viaApi)
    assert(viaSql == Seq("the", "##m", "##e", "p", "##l", "##a", "##y", "##ing"))
  }

  test("round-6 signals are callable from SQL with API parity") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    registerAll()
    val row = spark.sql(
      """SELECT graft_hash_bucket('42') AS hb,
        |       graft_strip_markup('<p>Hi &amp; bye</p>') AS sm,
        |       graft_dup_words('a a b') AS dw,
        |       graft_top_bigram('x y x y x y') AS tb""".stripMargin)
      .collect()(0)
    val api = Seq("42").toDF("t")
      .select(graft.ops.Curation.hashBucket(col("t"))).collect()(0).getLong(0)
    assert(row.getLong(0) == api)
    assert(row.getString(1) == "Hi & bye")
    assert(math.abs(row.getDouble(2) - (1.0 - 2.0 / 3)) < 1e-12)
    // "x y" appears 3 times among 5 bigrams of 6 words: 3*2/6 = 1.0
    assert(row.getDouble(3) == 1.0)
  }

  test("wrong arity is a WRONG_NUM_ARGS analysis error, not a builder crash") {
    registerAll()
    val e1 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_redact()").collect()
    }
    assert(e1.getMessage.contains("graft_redact"))
    val e2 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_redact('a', 'b')").collect()
    }
    assert(e2.getMessage.contains("graft_redact"))
    val e3 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT dot_product(array(1.0D))").collect()
    }
    assert(e3.getMessage.contains("dot_product"))
  }
}
