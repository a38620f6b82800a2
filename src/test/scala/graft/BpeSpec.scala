package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.BpeExpressions
import graft.ml.Bpe
import graft.operators.TextOps

/** Learned BPE tokenizer: merge learning pinned against the hand-computed
  * classic corpus (Sennrich et al. 2016 §3.2 example shape), the apply loop
  * against the hand-derived encoding, the Catalyst expression against the
  * scalar apply, and determinism under repartitioning. */
class BpeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // the classic BPE teaching corpus: word counts low:5 lower:2 newest:6 widest:3
  private val classicCounts: Seq[(String, Long)] =
    Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))

  test("learnMerges reproduces the hand-computed merge sequence on the " +
    "classic corpus (ties broken pair-lexicographic)") {
    // pair counts round 1: es=9 st=9 we=8 lo=7 ow=7 ne=6 ew=6 wi=3 id=3 de=3 er=2
    // → (e,s) on the es/st tie; then (es,t)=9; then lo/ow tie → (l,o); then (lo,w)=7
    val model = Bpe.learnMerges(classicCounts, numMerges = 4)
    assert(model.merges == IndexedSeq(
      ("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w")))
  }

  test("learnMerges stops when no pair repeats (singleton corpus exhausts)") {
    val model = Bpe.learnMerges(Seq(("ab", 1L), ("cd", 1L)), numMerges = 10)
    assert(model.merges.isEmpty, "count-1 pairs are noise, not merge rules")
    // a repeated word keeps merging until it is one symbol, then stops
    val m2 = Bpe.learnMerges(Seq(("aaa", 3L)), numMerges = 10)
    assert(m2.merges.size == 2) // (a,a) then (aa,a) — nothing left to merge
  }

  test("encodeWord applies merges by rank: 'lowest' → [low, est] under the " +
    "classic model (the textbook result)") {
    val model = Bpe.learnMerges(classicCounts, numMerges = 4)
    assert(BpeExpressions.encodeWord("lowest", model).toSeq == Seq("low", "est"))
    assert(BpeExpressions.encodeWord("low", model).toSeq == Seq("low"))
    // unseen symbols pass through as code points
    assert(BpeExpressions.encodeWord("xyz", model).toSeq == Seq("x", "y", "z"))
    assert(BpeExpressions.encodeWord("", model).toSeq == Seq.empty)
  }

  test("bpe_encode expression: pre-tokenizes like bpeTokenPattern, encodes " +
    "per word, concatenates in order; matches the scalar apply row-for-row") {
    val model = Bpe.learnMerges(classicCounts, numMerges = 4)
    val bc = spark.sparkContext.broadcast(model)
    val texts = Seq(
      (1L, "the lowest low"),
      (2L, "newest, widest! 42"),
      (3L, ""),
      (4L, "lower\tnewest lower"))
    val got = texts.toDF("id", "text")
      .select(col("id"), TextOps.bpeTokenize(col("text"), bc).as("toks"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val pat = graft.operators.TextOps.bpeTokenPattern.r
    texts.foreach { case (id, text) =>
      val expect = pat.findAllIn(text).toSeq
        .flatMap(w => BpeExpressions.encodeWord(w, model).toSeq)
      assert(got(id) == expect, s"row $id")
    }
    // digits and punctuation tokenize individually (pre-tokenizer contract)
    assert(got(2L).containsSlice(Seq(",")) && got(2L).containsSlice(Seq("4", "2")))
  }

  test("learn is partitioning-invariant and end-to-end deterministic " +
    "(distributed word count → bounded top-k → driver merges)") {
    val docs = Seq.tabulate(60)(i =>
      (i.toLong, s"low lower newest widest doc$i newest low")).toDF("doc_id", "text")
    def run(parts: Int): IndexedSeq[(String, String)] =
      Bpe.learn(docs.repartition(parts), "text", numMerges = 8,
        maxWords = 1000, minCount = 2L).merges
    val m1 = run(1)
    assert(m1.nonEmpty)
    assert(run(7) == m1, "merges must not depend on partitioning")
    // the learned model round-trips through a broadcast + the expression
    val bc = spark.sparkContext.broadcast(Bpe.BpeModel(m1))
    val n = docs.select(TextOps.bpeTokenize(col("text"), bc).as("t"))
      .selectExpr("size(t) AS n").as[Int].collect()
    assert(n.forall(_ > 0))
  }

  test("token-id encoding: vocab = <unk> + sorted alphabet + merge products; " +
    "ids round-trip through vocab; out-of-alphabet code points → 0") {
    val model = Bpe.learnMerges(classicCounts, numMerges = 4)
    // alphabet of {low, lower, newest, widest}: d e i l n o r s t w
    assert(model.alphabet == IndexedSeq("d", "e", "i", "l", "n", "o", "r", "s", "t", "w"))
    assert(model.vocab.take(1) == IndexedSeq("<unk>"))
    assert(model.vocab.drop(11) == IndexedSeq("es", "est", "lo", "low"))
    val bc = spark.sparkContext.broadcast(model)
    val got = Seq((1L, "lowest xyz"), (2L, "né")).toDF("id", "text")
      .select(col("id"), TextOps.bpeTokenizeIds(col("text"), bc).as("ids"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    // "lowest" → [low, est]; "xyz": x,y ∉ alphabet → 0, z ∉ alphabet → 0
    val v = model.vocab
    assert(got(1L).map(i => v(i)) ==
      Seq("low", "est", "<unk>", "<unk>", "<unk>"))
    assert(got(1L).take(2) == Seq(v.indexOf("low"), v.indexOf("est")))
    // é is out-of-alphabet → <unk>; n is in-alphabet
    assert(got(2L).map(i => v(i)) == Seq("n", "<unk>"))
  }

  test("model persistence: writeBpeFile → parseBpeFile round-trips merges, " +
    "alphabet, vocab and the encoding itself") {
    val model = Bpe.learnMerges(classicCounts, numMerges = 4)
    val text = Bpe.writeBpeFile(model)
    assert(text.linesIterator.next().startsWith("#graft-bpe"))
    val back = Bpe.parseBpeFile(text.linesIterator)
    assert(back.merges == model.merges)
    assert(back.alphabet == model.alphabet)
    assert(back.vocab == model.vocab)
    assert(BpeExpressions.encodeWord("lowest", back).toSeq == Seq("low", "est"))
    // an empty model (no merges learned) round-trips too
    val empty = Bpe.parseBpeFile(Bpe.writeBpeFile(
      Bpe.BpeModel(IndexedSeq.empty, IndexedSeq("a", "b"))).linesIterator)
    assert(empty.merges.isEmpty && empty.alphabet == IndexedSeq("a", "b"))
    // malformed inputs fail loudly
    intercept[IllegalArgumentException](Bpe.parseBpeFile(Iterator("not a model")))
    intercept[IllegalArgumentException](
      Bpe.parseBpeFile(Iterator("#graft-bpe v1", "a b c")))
  }

  test("property (seeded): over random corpora — token concat reconstructs " +
    "the word, every token is vocab-resolvable, persistence round-trips, " +
    "training-alphabet words never hit <unk>") {
    val rnd = new scala.util.Random(4242)
    (0 until 30).foreach { _ =>
      val alphaSize = 2 + rnd.nextInt(6)
      val alpha = ('a' to 'z').take(alphaSize).map(_.toString)
      val words = (0 until 4 + rnd.nextInt(12)).map { _ =>
        ((0 until 1 + rnd.nextInt(8)).map(_ => alpha(rnd.nextInt(alphaSize))).mkString,
          1L + rnd.nextInt(20))
      }.groupBy(_._1).map { case (w, cs) => (w, cs.map(_._2).sum) }.toSeq
      val model = Bpe.learnMerges(words, numMerges = rnd.nextInt(12))
      // persistence round-trip preserves everything
      val back = Bpe.parseBpeFile(Bpe.writeBpeFile(model).linesIterator)
      assert(back.merges == model.merges && back.alphabet == model.alphabet)
      // encode of arbitrary words over (and off) the alphabet
      (0 until 10).foreach { _ =>
        val w = (0 until 1 + rnd.nextInt(10))
          .map(_ => alpha(rnd.nextInt(alphaSize))).mkString
        val toks = BpeExpressions.encodeWord(w, model)
        assert(toks.mkString == w, s"concat must reconstruct '$w'")
        toks.foreach { t =>
          val id = model.tokenIds.get(t)
          assert(id != null && id > 0,
            s"token '$t' of in-alphabet word '$w' must resolve to a non-<unk> id")
          assert(model.vocab(id) == t, s"vocab($id) must be '$t'")
        }
      }
    }
  }

  test("non-BMP code points are single symbols end-to-end (surrogate pair " +
    "never split by learner or apply)") {
    val emoji = new String(Character.toChars(0x1F600))
    val model = Bpe.learnMerges(Seq((emoji + "a", 5L)), numMerges = 2)
    assert(model.merges == IndexedSeq((emoji, "a")))
    assert(BpeExpressions.encodeWord(emoji + "a", model).toSeq == Seq(emoji + "a"))
  }

  test("incremental learner == full-recount learner (randomized twin, " +
    "char-level and byte-level): identical merge sequences and alphabets") {
    val rnd = new scala.util.Random(20260817)
    (0 until 40).foreach { trial =>
      val alphaSize = 2 + rnd.nextInt(5)
      val alpha = ('a' to 'z').take(alphaSize).map(_.toString) ++
        (if (trial % 3 == 0) Seq("é", new String(Character.toChars(0x1F600))) else Nil)
      val words = (0 until 3 + rnd.nextInt(20)).map { _ =>
        ((0 until 1 + rnd.nextInt(9))
          .map(_ => alpha(rnd.nextInt(alpha.size))).mkString,
          1L + rnd.nextInt(30))
      }.groupBy(_._1).map { case (w, cs) => (w, cs.map(_._2).sum) }.toSeq
      val n = rnd.nextInt(15)
      val byteLevel = trial % 2 == 1
      val fast = Bpe.learnMerges(words, n, byteLevel)
      val slow = Bpe.learnMergesRecount(words, n, byteLevel)
      assert(fast.merges == slow.merges,
        s"trial $trial (byteLevel=$byteLevel, n=$n): merge sequences diverge\n" +
          s"  words: $words\n  fast: ${fast.merges}\n  slow: ${slow.merges}")
      assert(fast.alphabet == slow.alphabet && fast.byteLevel == slow.byteLevel)
    }
  }

  test("incremental learner matches recount on the classic corpus at every " +
    "merge budget (exhaustive prefix check)") {
    (0 to 12).foreach { n =>
      assert(Bpe.learnMerges(classicCounts, n).merges ==
        Bpe.learnMergesRecount(classicCounts, n).merges, s"numMerges=$n")
    }
  }

  test("byte-level model: emoji/CJK/accents encode with ZERO <unk> ids, " +
    "tokens reconstruct the word's bytes, persistence round-trips byteLevel") {
    val nasty = "café 世界 " + new String(Character.toChars(0x1F600)) +
      " naïve ctrl"
    val corpus = Seq((nasty + " the the lowest", 3L), ("lowest low", 5L))
      .flatMap { case (t, c) =>
        graft.operators.TextOps.bpeTokenPattern.r.findAllIn(t).map((_, c)) }
      .groupBy(_._1).map { case (w, cs) => (w, cs.map(_._2).sum) }.toSeq
    val model = Bpe.learnMerges(corpus, numMerges = 12, byteLevel = true)
    assert(model.byteLevel && model.alphabet.size == 256)
    // id of raw byte b is 1 + b (fixed byte-order alphabet)
    assert(model.vocab(1 + 'a'.toInt) == "a")
    val pat = graft.operators.TextOps.bpeTokenPattern.r
    pat.findAllIn(nasty).foreach { w =>
      val toks = BpeExpressions.encodeWord(w, model)
      // concatenated tokens reconstruct the word's byte-symbol string
      assert(toks.mkString == Bpe.byteSyms(w).mkString, s"word '$w'")
      toks.foreach { t =>
        val id = model.tokenIds.get(t)
        assert(id != null && id > 0, s"byte-level token '$t' must never be <unk>")
      }
    }
    // expression path: no id 0 anywhere on out-of-alphabet-heavy text
    val bc = spark.sparkContext.broadcast(model)
    val ids = Seq((1L, nasty)).toDF("id", "text")
      .select(TextOps.bpeTokenizeIds(col("text"), bc).as("ids"))
      .selectExpr("ids").as[Seq[Int]].head()
    assert(ids.nonEmpty && !ids.contains(0),
      s"byte-level id stream must be <unk>-free, got $ids")
    // persistence round trip keeps byteLevel, alphabet, merges and encoding
    val back = Bpe.parseBpeFile(Bpe.writeBpeFile(model).linesIterator)
    assert(back.byteLevel && back.alphabet == model.alphabet &&
      back.merges == model.merges)
    assert(BpeExpressions.encodeWord("lowest", back).toSeq ==
      BpeExpressions.encodeWord("lowest", model).toSeq)
  }

  test("merge symbols beginning with '#' survive the merges.txt round trip " +
    "(header parsing is positional, not comment-stripping)") {
    val model = Bpe.BpeModel(
      IndexedSeq(("#", "x"), ("#x", "y"), ("#alphabet", "z")),
      IndexedSeq("#", "x", "y", "z", "#alphabet"))
    val back = Bpe.parseBpeFile(Bpe.writeBpeFile(model).linesIterator)
    assert(back.merges == model.merges, "'#'-headed merges must not be " +
      "dropped as comments (rank shift would corrupt every token id)")
    assert(back.alphabet == model.alphabet)
  }
}
