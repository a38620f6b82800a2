package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ml.Unigram
import graft.ml.Unigram.UnigramModel

/** Unigram-LM tokenizer: Viterbi segmentation against hand-built models,
  * learner behavior on corpora with known structure, determinism,
  * persistence round-trip, expression-vs-scalar parity. */
class UnigramSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("encodeWord picks the max-log-probability segmentation (hand-checked " +
    "Viterbi); longest piece wins exact ties; unknown singles fall back") {
    val m = UnigramModel(IndexedSeq(
      ("ab", -1.0), ("a", -2.0), ("b", -2.0), ("c", -1.0), ("abc", -5.0)))
    // "abc": ab+c = -2  vs  a+b+c = -5  vs  abc = -5  → ["ab", "c"]
    assert(Unigram.encodeWord("abc", m).toSeq == Seq("ab", "c"))
    // "ab": ab = -1  vs  a+b = -4  → ["ab"]
    assert(Unigram.encodeWord("ab", m).toSeq == Seq("ab"))
    // exact tie: model where "xy" = -4 and x+y = -2 + -2 = -4 → longest wins
    val tie = UnigramModel(IndexedSeq(("x", -2.0), ("y", -2.0), ("xy", -4.0)))
    assert(Unigram.encodeWord("xy", tie).toSeq == Seq("xy"))
    // unknown single code point segments as itself (coverage guarantee)
    assert(Unigram.encodeWord("azb", m).toSeq == Seq("a", "z", "b"))
    assert(Unigram.encodeWord("", m).isEmpty)
  }

  test("encodeWord never splits a surrogate pair: astral code points are " +
    "single fallback pieces") {
    val m = UnigramModel(IndexedSeq(("ok", -1.0)))
    val emoji = new String(Character.toChars(0x1F600))
    val got = Unigram.encodeWord("ok" + emoji + "ok", m).toSeq
    assert(got == Seq("ok", emoji, "ok"))
  }

  test("learnPieces: a dominant repeated word becomes one piece; singles " +
    "always covered; vocab bounded; deterministic across runs") {
    val wc = Seq(("hello", 500L), ("help", 40L), ("hero", 30L), ("x", 5L))
    val m1 = Unigram.learnPieces(wc, vocabSize = 30, maxPieceLen = 6)
    val m2 = Unigram.learnPieces(wc, vocabSize = 30, maxPieceLen = 6)
    assert(m1 == m2, "learner must be deterministic")
    assert(m1.pieces.size <= 30)
    val pieceSet = m1.pieces.map(_._1).toSet
    // every single code point of the corpus survives (required-chars rule)
    "helopxr".foreach(c => assert(pieceSet.contains(c.toString), s"single $c"))
    // the dominant word segments into ONE piece under the learned model
    assert(Unigram.encodeWord("hello", m1).toSeq == Seq("hello"))
    // piece log-probs are finite and negative; dominant piece outranks rare
    m1.pieces.foreach { case (p, lp) =>
      assert(lp < 0 && !lp.isInfinite && !lp.isNaN, s"$p -> $lp")
    }
    val lp = m1.pieces.toMap
    assert(lp("hello") > lp("x"), "frequency order must survive into probs")
  }

  test("learnPieces prunes to the multi-piece budget but never drops singles") {
    val wc = Seq(("aaab", 10L), ("aaba", 9L), ("abaa", 8L), ("bbbb", 7L))
    val m = Unigram.learnPieces(wc, vocabSize = 5, maxPieceLen = 4)
    assert(m.pieces.size <= 5)
    val ps = m.pieces.map(_._1).toSet
    assert(ps.contains("a") && ps.contains("b"))
  }

  test("vocab/tokenIds: <unk>=0, pieces in model order; ids round-trip") {
    val m = UnigramModel(IndexedSeq(("ab", -1.0), ("a", -2.0), ("b", -2.5)))
    assert(m.vocab == IndexedSeq("<unk>", "ab", "a", "b"))
    assert(m.tokenIds.get("ab") == 1 && m.tokenIds.get("b") == 3)
    assert(m.tokenIds.get("zz") == null)
  }

  test("persistence round-trip is lossless (Double.toString exactness)") {
    val wc = Seq(("hello", 500L), ("world", 300L), ("hell", 20L))
    val m = Unigram.learnPieces(wc, vocabSize = 40)
    val rt = Unigram.parseUnigramFile(Unigram.writeUnigramFile(m).linesIterator)
    assert(rt == m)
  }

  test("unigram_encode / unigram_encode_ids expressions match the scalar " +
    "encoder per word and are partitioning-invariant") {
    val docs = Seq(
      (1L, "hello world hello"),
      (2L, "help the hero"),
      (3L, ""),
      (4L, "hello, world! 42")).toDF("doc_id", "text")
    val m = Unigram.learnPieces(
      Seq(("hello", 500L), ("world", 300L), ("help", 40L), ("hero", 30L),
        ("the", 200L), ("42", 10L), (",", 50L), ("!", 50L)),
      vocabSize = 60)
    val bc = spark.sparkContext.broadcast(m)
    def scalarEncode(text: String): Seq[String] = {
      val p = java.util.regex.Pattern.compile(
        graft.operators.TextOps.bpeTokenPattern)
      val mt = p.matcher(text)
      val out = scala.collection.mutable.ArrayBuffer[String]()
      while (mt.find()) out ++= Unigram.encodeWord(mt.group(), m)
      out.toSeq
    }
    for (parts <- Seq(1, 7)) {
      val got = docs.repartition(parts)
        .select(col("doc_id"),
          graft.operators.TextOps.unigramTokenize(col("text"), bc).as("p"),
          graft.operators.TextOps.unigramTokenizeIds(col("text"), bc).as("i"))
        .as[(Long, Seq[String], Seq[Int])].collect().sortBy(_._1)
      got.foreach { case (id, pieces, ids) =>
        val want = scalarEncode(
          docs.where(col("doc_id") === id).select("text").as[String].head())
        assert(pieces == want, s"doc $id pieces")
        assert(ids == want.map(t =>
          Option(m.tokenIds.get(t)).map(_.intValue).getOrElse(0)), s"doc $id ids")
      }
    }
  }

  test("whole-stage codegen and interpreted paths agree") {
    val docs = Seq((1L, "hello hero help"), (2L, "unseen glyphs éé"))
      .toDF("doc_id", "text")
    val m = Unigram.learnPieces(
      Seq(("hello", 100L), ("hero", 50L), ("help", 40L)), vocabSize = 30)
    val bc = spark.sparkContext.broadcast(m)
    val expr = graft.operators.TextOps.unigramTokenize(col("text"), bc)
    val on = spark.conf.get("spark.sql.codegen.wholeStage")
    val a = docs.select(col("doc_id"), expr.as("p"))
      .as[(Long, Seq[String])].collect().toMap
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val b = docs.select(col("doc_id"), expr.as("p"))
        .as[(Long, Seq[String])].collect().toMap
      assert(a == b)
    } finally spark.conf.set("spark.sql.codegen.wholeStage", on)
  }
}
