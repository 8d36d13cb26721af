package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SectionsSpec extends SparkSpec {
  import spark.implicits._

  private val report =
    "CLINICAL: stuff GROSS DESCRIPTION: a 3cm specimen MICROSCOPIC: cells " +
      "DIAGNOSIS: carcinoma COMMENT: see addendum ADDENDUM: revised"

  test("createSections extracts clinical sections and flattens to columns") {
    val df = Seq((1L, report)).toDF("msgid", "msg")
    val out = Sections.createSections(df, "msg").collect()(0)
    assert(out.getAs[String]("gross") == "a 3cm specimen")
    assert(out.getAs[String]("micro") == "cells")
    assert(out.getAs[String]("diagnosis") == "carcinoma")
    assert(out.getAs[String]("diagnosis_comment") == "see addendum")
    assert(out.getAs[String]("addendum") == "revised")
    assert(out.getAs[String]("part_of_report") == "diag_or_add")
    assert(out.getAs[String]("filtered_message") == "carcinoma see addendum revised")
  }

  test("fallback domains: gross_or_micro then entire report (reference :53-61)") {
    val df = Seq(
      (1L, "GROSS DESCRIPTION: only gross here"),
      (2L, "no section headers at all")).toDF("msgid", "msg")
    val out = Sections.createSections(df, "msg").orderBy("msgid").collect()
    assert(out(0).getAs[String]("part_of_report") == "gross_or_micro")
    assert(out(0).getAs[String]("filtered_message") == "only gross here")
    assert(out(1).getAs[String]("part_of_report") == "entire report")
    // nothing matched: filtered_message falls back to the whole text
    assert(out(1).getAs[String]("filtered_message") == "no section headers at all")
  }

  test("compileSpecs reads the per-authority pattern column (T3)") {
    val dim = Seq(("gross", "G:(.*?)E", "x"), ("micro", "M:(.*?)E", "y"))
      .toDF("parent_category", "nha", "fha")
    val specs = Sections.compileSpecs(dim, "nha")
    assert(specs == Seq(Sections.SectionSpec("gross", "G:(.*?)E"),
      Sections.SectionSpec("micro", "M:(.*?)E")))
    val out = Sections.createSections(
      Seq((1L, "G: g E M: m E")).toDF("msgid", "msg"), "msg", specs).collect()(0)
    assert(out.getAs[String]("gross") == "g")
    assert(out.getAs[String]("micro") == "m")
    // no diagnosis/addendum specs -> gross bucket wins
    assert(out.getAs[String]("part_of_report") == "gross_or_micro")
  }
}
