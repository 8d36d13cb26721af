package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class WordPieceSpec extends SparkSpec {
  import spark.implicits._

  private def pieces(texts: String*): Seq[Seq[String]] =
    texts.toDF("t").select(WordPiece.tokenize($"t").as("p"))
      .as[Seq[String]].collect().toSeq

  test("greedy max-munch takes the longest piece at every position") {
    // "the" beats "th"/"t"; "##ing" beats "##i"
    assert(pieces("theme playing") ==
      Seq(Seq("the", "##m", "##e", "p", "##l", "##a", "##y", "##ing")))
  }

  test("single-letter fallback covers any alpha word; multi-word input flattens") {
    assert(pieces("zq ab") == Seq(Seq("z", "##q", "a", "##b")))
    assert(pieces("") == Seq(Seq.empty[String]))
    assert(pieces("   ") == Seq(Seq.empty[String]))
  }

  test("a position with no matching piece turns the WHOLE word into [UNK]") {
    val custom = Seq("ab", "x", "##cd")
    val got = Seq("abcd", "abce", "x", "x abcd")
      .toDF("t").select(WordPiece.tokenize($"t", custom).as("p"))
      .as[Seq[String]].collect().toSeq
    assert(got == Seq(
      Seq("ab", "##cd"),
      Seq("[UNK]"), // 'ab' matches but 'ce' has no continuation -> whole word UNK
      Seq("x"),
      Seq("x", "ab", "##cd")))
  }

  test("null input stays null; non-string input is an analysis error") {
    val out = Seq[(Long, Option[String])]((1L, None)).toDF("id", "t")
      .select(WordPiece.tokenize($"t")).collect()(0)
    assert(out.isNullAt(0))
    val err = intercept[org.apache.spark.sql.AnalysisException] {
      Seq(1L).toDF("x").select(WordPiece.tokenize($"x")).collect()
    }
    assert(err.getMessage.contains("wordpiece") ||
      err.getMessage.toLowerCase.contains("data type mismatch"))
  }

  test("normalize: ASCII-fold before case-fold, non-letters collapse to spaces") {
    val got = Seq("Héllo,  WORLD!9x").toDF("t")
      .select(WordPiece.normalize($"t")).as[String].collect()(0)
    assert(got == "hllo world x")
  }

  test("interpreted eval agrees with the codegen'd path") {
    val df = Seq("the theme of things", "reaction to nothing").toDF("t")
    val viaCodegen = df.select(WordPiece.tokenize($"t").as("p"))
      .as[Seq[String]].collect().toSeq
    // force interpreted evaluation through the expression directly
    val expr = WordPieceTokenize(
      org.apache.spark.sql.catalyst.expressions.BoundReference(0,
        org.apache.spark.sql.types.StringType, nullable = true),
      WordPiece.FixtureVocab)
    val viaEval = Seq("the theme of things", "reaction to nothing").map { s =>
      expr.eval(org.apache.spark.sql.catalyst.InternalRow(
        org.apache.spark.unsafe.types.UTF8String.fromString(s)))
        .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toObjectArray(org.apache.spark.sql.types.StringType)
        .map(_.toString).toSeq
    }
    assert(viaCodegen == viaEval)
  }

  test("loadVocab + real-shape vocab.txt: HF format, order, CRLF, parity") {
    // BERT-family-shaped vocab: specials first (positional ids), single
    // chars + continuations (full alpha coverage), real multi-char pieces
    // the hand-walked cases rely on, and letter-pair padding to >1k
    // entries — the size/shape of a real checkpoint's vocab.txt slice.
    val pairs = for (a <- 'a' to 'z'; b <- 'a' to 'z') yield s"$a$b"
    val vocab: Seq[String] =
      Seq("[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]") ++
        ('a' to 'z').map(_.toString) ++ ('a' to 'z').map(c => s"##$c") ++
        Seq("play", "##ing", "##believ", "##able", "token", "##izer") ++
        pairs ++ pairs.take(300).map(p => s"##$p")
    assert(vocab.size >= 1000, s"fixture must be real-shape, got ${vocab.size}")

    val f = java.io.File.createTempFile("vocab", ".txt")
    f.deleteOnExit()
    val w = new java.io.PrintWriter(f, "UTF-8")
    try vocab.foreach(p => w.print(p + "\r\n")) // Windows-written checkpoint
    finally w.close()

    val loaded = WordPiece.loadVocab(f.getAbsolutePath)
    assert(loaded == vocab) // order preserved (HF ids are positional), CRs stripped
    assert(loaded.head == "[PAD]" && loaded(1) == "[UNK]")

    val got = Seq("unbelievable playing tokenizer", "[CLS]", "x9z")
      .toDF("t").select(WordPiece.tokenize($"t", loaded).as("p"))
      .as[Seq[String]].collect().toSeq
    // hand-walked max-munch: "un"(pair) beats "u"; "##believ" beats "##be";
    // "##able" beats "##ab"; "play" beats "pl"; "##ing" beats "##in";
    // "token" beats "to"; "##izer" beats "##iz"
    assert(got(0) == Seq("un", "##believ", "##able",
      "play", "##ing", "token", "##izer"))
    // a special token in the vocab passes through as one piece
    assert(got(1) == Seq("[CLS]"))
    // a char with no continuation piece (digit) turns the word into [UNK]
    assert(got(2) == Seq("[UNK]"))
  }

  test("subword truncation keeps first/last budget pieces per the T5 branch") {
    val df = Seq(("entire report", "the theme of things keeps on going and going"),
        ("gross_or_micro", "the theme of things keeps on going and going"))
      .toDF("part", "t")
    val got = df.select(
        graft.ops.Truncate.truncateSubword($"t", $"part", 5).as("cut"),
        graft.ops.Truncate.subwordCount($"t").as("n"))
      .as[(String, Int)].collect().toSeq
    val full = pieces("the theme of things keeps on going and going").head
    assert(got(0)._2 == full.length && full.length > 5)
    assert(got(0)._1 == full.takeRight(5).mkString(" ")) // entire report -> keep last
    assert(got(1)._1 == full.take(5).mkString(" ")) // sectioned -> keep first
  }
}
