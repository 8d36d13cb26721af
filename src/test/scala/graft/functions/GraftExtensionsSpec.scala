package graft.functions

import graft.SparkSpec

class GraftExtensionsSpec extends SparkSpec {

  test("dot_product is callable from SQL once registered") {
    // the injector path (used when the session is built with
    // spark.sql.extensions) must accept the registration
    new GraftExtensions().apply(new org.apache.spark.sql.SparkSessionExtensions)
    // the shared test session already exists, so register on its live
    // function registry (withExtensions only applies at build time)
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_product", exprs => DotProduct(exprs.head, exprs(1)), "scala_udf")
    val v = spark.sql(
      "SELECT dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
      .collect()(0).getDouble(0)
    assert(v == 11.0)
  }
}
