package graft.ops

import java.nio.file.Files
import graft.SparkSpec
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  private def parquetFiles(dir: String): Seq[String] = {
    val d = new java.io.File(dir)
    d.listFiles().map(_.getPath).filter(_.endsWith(".parquet")).toSeq.sorted
  }

  test("compactParquet rewrites a many-small-files dir to the sized count") {
    val in = Files.createTempDirectory("graft_compact_in").toString
    val out = Files.createTempDirectory("graft_compact_out").toString
    val df = (1 to 10000).map(i => (i.toLong, s"row$i")).toDF("id", "s")
    df.repartition(64).write.mode("overwrite").parquet(in)
    assert(parquetFiles(in).size == 64)
    val bytes = Layout.sizeOnDisk(spark, in)
    val target = bytes / 3
    Layout.compactParquet(spark, in, out, targetFileBytes = target)
    // expected count via the same ceil-div the operator uses (hardcoding
    // 4 would break whenever bytes % 3 == 0 lands the division exactly)
    val expected = ((bytes + target - 1) / target).toInt
    assert(parquetFiles(out).size == expected)
    assert(spark.read.parquet(out).count() == 10000)
    assert(spark.read.parquet(out).agg(sum("id")).head().getLong(0)
      == (1 to 10000).map(_.toLong).sum)
  }

  test("zOrderedParquet: files cover small (x,y) rectangles; x-sort leaves y unpruned") {
    val zOut = Files.createTempDirectory("graft_z_out").toString
    val xOut = Files.createTempDirectory("graft_x_out").toString
    // uniform 64x64 grid — every (x, y) once
    val grid = (0 until 64).flatMap(x => (0 until 64).map(y => (x.toLong, y.toLong)))
      .toDF("x", "y")
    Layout.zOrderedParquet(grid, zOut, numFiles = 8, "x", "y")
    Layout.sortedParquet(grid, xOut, numFiles = 8, Seq("x"))

    def boxes(dir: String): Seq[(Long, Long, Long, Long)] =
      parquetFiles(dir).map { f =>
        val r = spark.read.parquet(f)
          .agg(min("x"), max("x"), min("y"), max("y")).head()
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      }
    def avgArea(bs: Seq[(Long, Long, Long, Long)]): Double =
      bs.map { case (x0, x1, y0, y1) =>
        (x1 - x0 + 1).toDouble * (y1 - y0 + 1) }.sum / bs.size

    val zBoxes = boxes(zOut)
    val xBoxes = boxes(xOut)
    // x-sorted files span the ENTIRE y domain — a y-only filter prunes
    // NOTHING (this is the failure mode z-order exists to fix)
    assert(xBoxes.forall { case (_, _, y0, y1) => y0 == 0L && y1 == 63L })
    // z-ordered files cover bounded rectangles (ideal eighths are 16x32;
    // allow range-sampler boundary slop), so BOTH dimensions prune:
    assert(avgArea(zBoxes) < 4096 * 0.5, s"z-order boxes too loose: $zBoxes")
    // a y-only range filter (y in [0,7]) skips a real fraction of z-files
    val yHitZ = zBoxes.count { case (_, _, y0, _) => y0 <= 7 }
    assert(yHitZ <= 6, s"y-filter should prune z-files: hits $yHitZ of 8")
    assert(xBoxes.count { case (_, _, y0, _) => y0 <= 7 } == xBoxes.size)
    // and a point query is prunable to a minority of z-files
    val hit = zBoxes.count { case (x0, x1, y0, y1) =>
      x0 <= 5 && 5 <= x1 && y0 <= 5 && 5 <= y1 }
    assert(hit <= zBoxes.size / 2, s"corner point hits $hit of ${zBoxes.size}")
    assert(spark.read.parquet(zOut).count() == 4096)
  }

  test("sortedParquet: each output file covers a disjoint key range") {
    val out = Files.createTempDirectory("graft_sorted_out").toString
    val df = (1 to 8000).map(i => ((i * 2654435761L) % 100000, i))
      .toDF("k", "v")
    Layout.sortedParquet(df, out, numFiles = 4, sortCols = Seq("k"))
    val files = parquetFiles(out)
    assert(files.size == 4)
    val ranges = files.map { f =>
      val r = spark.read.parquet(f).agg(min("k"), max("k")).head()
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    // disjoint + ordered: every file's min is above the previous file's max
    ranges.sliding(2).foreach {
      case Seq((_, hiA), (loB, _)) => assert(hiA <= loB)
      case _ =>
    }
    assert(spark.read.parquet(out).count() == 8000)
  }

  test("orc sink/source roundtrip with predicate pushdown at the scan") {
    val out = Files.createTempDirectory("graft_orc").toString
    val df = (1 to 1000).map(i => (i.toLong, s"s$i")).toDF("id", "s")
    Sinks.orc(df, out)
    val back = graft.core.Tables.orc(spark, out).filter($"id" > 990)
    assert(back.count() == 10)
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThan(id,990)"))
  }

  test("jsonLines sink/source roundtrip preserves rows and schema") {
    val out = Files.createTempDirectory("graft_jsonl").toString
    val df = Seq((1L, "a", 1.5), (2L, "b", -0.25), (3L, null, 0.0))
      .toDF("id", "s", "x")
    Sinks.jsonLines(df, out)
    val back = graft.core.Tables.jsonLines(spark, out, df.schema)
    // JSON scans mark every field nullable; compare names + types
    assert(back.schema.map(f => (f.name, f.dataType))
      == df.schema.map(f => (f.name, f.dataType)))
    assert(back.orderBy("id").collect().toSeq == df.orderBy("id").collect().toSeq)
  }
}
