package graft

import org.apache.spark.sql.functions._

import graft.tokenize.Tokenizer

/** The pure-Scala tokenizer and the Catalyst column tokenizer must be
  * the same function — every other guarantee hangs on this
  * (SURVEY §7.2).
  */
class TokenizerSpec extends SparkSpec {

  test("basics: lowercase, split, min length, stop words") {
    assert(Tokenizer.tokenize("The Fast KEY order!") sameElements
      Array("fast", "key", "order"))
    assert(Tokenizer.tokenize("a an of in ab xy") sameElements Array.empty[String])
    assert(Tokenizer.tokenize("hyphen-split under_score dot.sep") sameElements
      Array("hyphen", "split", "under", "score", "dot", "sep"))
    assert(Tokenizer.tokenize("") sameElements Array.empty[String])
    assert(Tokenizer.tokenize(null) sameElements Array.empty[String])
    assert(Tokenizer.tokenize("numbers 123 42x ok99") sameElements
      Array("numbers", "123", "42x", "ok99"))
    // reference domain stop words are also dropped (app.py:853-855)
    assert(Tokenizer.tokenize("randomized controlled trial results") sameElements
      Array("results"))
  }

  test("column expression == pure function on generated + edge texts") {
    import spark.implicits._
    val texts = graft.gen.TranscriptGen.localCorpus(40).map(_.text) ++ Seq(
      "", "   ", "a-b-c", "THE THE THE", "x".repeat(100),
      "mixed CASE with-hyphens and_underscores 123 7seas",
      "!!!", "tab\tsep newline\nsep")
    val viaCol = texts.toDF("text")
      .select(Tokenizer.tokensCol(col("text")).as("toks"))
      .collect()
      .map(_.getSeq[String](0))
    texts.zip(viaCol).foreach { case (t, got) =>
      assert(got == Tokenizer.tokenize(t).toSeq, s"mismatch on: '$t'")
    }
  }
}
