package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.{Column, DataFrame}

/** [[MomentMatrix]]'s exactness contract: BIT-EQUAL to the explode +
  * decimal-sum Column formulation (the form the DuckDB oracles replay)
  * on every cell — products, means, count — including negative values,
  * sub-2^-27 magnitudes (the HALF_UP slow path), float and double
  * element types, and null vectors (skipped ⇒ filtered-relation
  * aggregation in the same pass).
  */
class MomentMatrixSpec extends SparkSpec {
  import spark.implicits._

  private val Scale = java.lang.Math.scalb(1.0, 50)

  /** The reference Column formulation — pcaTopComponent's original
    * moment pass, verbatim (explode upper-triangle decimal products +
    * posexplode decimal means + count), assembled into MomentMatrix's
    * output layout [products, means, count].
    */
  private def reference(df: DataFrame, vecCol: String,
                        dims: Int): Seq[java.math.BigDecimal] = {
    val v = col(vecCol)
    val dec19 = DecimalType(19, 0)
    def intFactor(x: Column): Column = (x.cast("double") * Scale).cast(dec19)
    val pairTerms = flatten(transform(v, (xi, i) =>
      transform(slice(v, i + lit(1), lit(dims) - i), (xj, jj) =>
        struct(i.cast("int").as("i"), (i + jj).cast("int").as("j"),
          (intFactor(xi) * intFactor(xj)).as("t")))))
    val products = df.select(explode(pairTerms).as("s"))
      .groupBy(col("s.i").as("i"), col("s.j").as("j"))
      .agg(sum(col("s.t")).as("m")).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getDecimal(2)).toMap
    val dec0 = DecimalType(38, 0)
    val meanRows = df.select(posexplode(v).as(Seq("__i", "__x")))
      .groupBy(col("__i"))
      .agg(sum((col("__x").cast("double") * Scale).cast(dec0)).as("m"),
        count(lit(1)).as("n")).collect()
    val means = meanRows.map(r => r.getInt(0) -> r.getDecimal(1)).toMap
    val n = meanRows.head.getLong(2)
    val cells = for (i <- 0 until dims; j <- i until dims)
      yield products((i, j))
    (cells ++ (0 until dims).map(means(_)) :+
      java.math.BigDecimal.valueOf(n)).toSeq
  }

  private def agg(df: DataFrame, vec: Column,
                  dims: Int): Seq[java.math.BigDecimal] =
    df.agg(MomentMatrix.momentMatrix(vec, dims).as("m"))
      .collect()(0).getSeq[java.math.BigDecimal](0)

  private def assertBitEqual(a: Seq[java.math.BigDecimal],
                             b: Seq[java.math.BigDecimal]): Unit = {
    assert(a.length == b.length, s"${a.length} vs ${b.length} cells")
    for (((x, y), k) <- a.zip(b).zipWithIndex)
      assert(x.compareTo(y) == 0, s"cell $k: $x != $y")
  }

  test("bit-equal to the Column formulation on the embeddings fixture") {
    val emb = graft.core.Tables.embeddings(spark, SparkSpec.Sf0001)
    assertBitEqual(agg(emb, col("embedding"), 16),
      reference(emb.select(slice(col("embedding"), 1, 16).as("v")), "v", 16))
  }

  test("bit-equal on adversarial values: negatives, tiny sub-2^-27 " +
      "magnitudes (HALF_UP slow path), zeros, double elements") {
    val rows = Seq(
      Seq(1.5, -2.25, 1e-9, 0.0),
      Seq(-3.75e-10, 4.0, -0.5, 7.0e-9),
      Seq(0.0, 0.0, 123.456, -1e-12),
      Seq(2.0e-8, -2.0e-8, 1.0, -1.0))
    val df = rows.toDF("v")
    assertBitEqual(agg(df, col("v"), 4), reference(df, "v", 4))
  }

  test("null vectors are skipped: when(filter, vec) equals a filtered pass") {
    val emb = graft.core.Tables.embeddings(spark, SparkSpec.Sf0001)
      .select(col("vec_id"), slice(col("embedding"), 1, 8).as("v"))
    val oneScan = agg(emb, when(col("vec_id") % 3 === 0, col("v")), 8)
    val filtered = agg(emb.filter(col("vec_id") % 3 === 0), col("v"), 8)
    assertBitEqual(oneScan, filtered)
    // count cell really reflects the filter
    assert(oneScan.last.longValueExact() ==
      emb.filter(col("vec_id") % 3 === 0).count())
  }

  test("bit-equal for |x·2^50| in [2^53, 2^63): integral doubles whose " +
      "shortest repr is NOT the exact integer (the toLong fast path " +
      "diverges there and must route through the toString slow path)") {
    // x = 1024 stages y = 2^60 = 1152921504606846976 exactly, but
    // Double.toString(y) round-trips through "1.15292150460684698E18"
    // → Spark's Decimal cast yields ...980; toLong would yield ...976.
    val rows = Seq(
      Seq(1024.0, 16.125, -512.75, 9.0),
      Seq(100.5, -1023.0, 8.0, 777.777),
      Seq(-64.0, 256.0, 1000.001, -8.0))
    val df = rows.toDF("v")
    assertBitEqual(agg(df, col("v"), 4), reference(df, "v", 4))
  }

  test("null ELEMENTS stage as zero on both array layouts — bit-equal " +
      "to the Column formulation's null-term skipping") {
    // Option rows → GenericArrayData in the local relation (the layout
    // that NPEs if the accessor is hit without an isNullAt check);
    // round-tripping through parquet exercises UnsafeArrayData too.
    val rows = Seq(
      Seq[Option[Double]](Some(1.5), None, Some(2.0), Some(-0.25)),
      Seq[Option[Double]](None, Some(3.5), Some(1e-9), None),
      Seq[Option[Double]](Some(-2.0), Some(0.5), None, Some(4.0)))
    val df = rows.toDF("v")
    val expected = reference(df, "v", 4)
    assertBitEqual(agg(df, col("v"), 4), expected)
    val pq = java.nio.file.Files.createTempDirectory("mmnull").toString
    df.write.mode("overwrite").parquet(pq)
    assertBitEqual(agg(spark.read.parquet(pq), col("v"), 4), expected)
  }

  test("DOCUMENTED seam: a dimension null in EVERY row yields 0 cells " +
      "(the Column form's sum() over all-null terms yields NULL — a " +
      "NULL moment would poison the downstream eigensolve)") {
    val rows = Seq(
      Seq[Option[Double]](Some(1.0), None, Some(2.0)),
      Seq[Option[Double]](Some(3.0), None, Some(-1.0)))
    val out = agg(rows.toDF("v"), col("v"), 3)
    // layout: products (0,0),(0,1),(0,2),(1,1),(1,2),(2,2), means 0..2, n
    val zeros = Seq(1, 3, 4, 7) // every cell touching dim 1
    zeros.foreach(i => assert(out(i).signum == 0,
      s"cell $i of an all-null dimension must be 0, got ${out(i)}"))
    // (0,2) cell untouched by the null dim: (1·2 + 3·(−1))·2^100 = −2^100
    val expect02 = new java.math.BigDecimal(
      java.math.BigInteger.ONE.shiftLeft(100).negate())
    assert(out(2).compareTo(expect02) == 0, s"(0,2) cell: ${out(2)}")
  }

  test("element staging is loud past |x| ~ 8192 (no silent toLong " +
      "saturation) and rejects non-float/double arrays at analysis") {
    // x = 8500: x*2^50 ~ 9.57e18 > Long.Max — Double.toLong would
    // silently clamp; the bounds-checked fast path must fall to the
    // slow path, whose longValueExact throws
    val df = Seq(Seq(8500.0, 0.0)).toDF("v")
    val e = intercept[Exception] { agg(df, col("v"), 2) }
    assert(e.toString.contains("ArithmeticException") ||
      e.isInstanceOf[ArithmeticException], e.toString)
    // and the old formulation's implicit cast is gone: wrong element
    // types fail analysis loudly instead of reinterpreting bytes
    val ints = Seq(Seq(1, 2)).toDF("v")
    val ae = intercept[org.apache.spark.sql.AnalysisException] {
      agg(ints, col("v"), 2)
    }
    assert(ae.getMessage.contains("moment_matrix") ||
      ae.getMessage.contains("DATATYPE"), ae.getMessage)
  }

  test("loud overflow, not silent wraparound, past the documented bound") {
    // n·max|x|²·2^100 beyond 128 bits: one row of huge values repeated
    val big = Seq.fill(4)(8000.0) // 8000·2^50 ≈ 2^63 per factor
    val df = Seq.fill(3)(big).toDF("v")
    val e = intercept[Exception] {
      agg(df, col("v"), 4)
    }
    assert(e.toString.contains("ArithmeticException") ||
      Option(e.getCause).exists(_.isInstanceOf[ArithmeticException]) ||
      e.isInstanceOf[ArithmeticException], e.toString)
  }
}
