package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Curation, Dedup, TextOps}

/**
 * End-to-end composition of the curation operators — the library's answer to
 * "can I build a real training-data pipeline from these parts?": boilerplate
 * removal → exact dedup → Bloom-prefiltered decontamination → LM scoring →
 * deterministic split → example packing, as ONE DataFrame program. Each
 * planted artifact (shared footer, exact copies, a benchmark leak) must be
 * handled by its stage, every stage's output must feed the next without
 * adapters, and the whole chain must be deterministic end-to-end.
 */
class CurationPipelineSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val benchSentence = "the held out benchmark sentence about rare topics"

  private def mkCorpus() = {
    val words = Array("alpha", "bravo", "charlie", "delta", "echo", "foxtrot",
      "golf", "hotel", "india", "juliet", "kilo", "lima")
    def body(i: Long): String =
      (0 until 12).map(j => words(((i * 7 + j * 5) % words.length).toInt))
        .mkString(" ")
    val base = (0L until 40L).map(i => (i, s"${body(i)}\nunique line $i"))
    val dupes = Seq((100L, base(3)._2), (101L, base(7)._2)) // exact copies
    val leak = Seq((200L, s"$benchSentence\nunique line 200"))
    (base ++ dupes ++ leak).map { case (id, t) =>
      // every doc carries the hot footer; pair-wise repeated "unique line"
      // copies stay under the minDocs=3 boilerplate threshold
      (id, t + "\n(c) example corp footer")
    }.toDF("doc_id", "text")
  }

  test("composed pipeline: boilerplate → exact dedup → Bloom decontamination " +
    "→ LM scoring → split → pack; every plant handled; chain deterministic") {
    def run(): (Set[Long], Map[Long, String], Set[(Long, String)], Long) = {
      val corpus = mkCorpus()
      val clean = Curation
        .removeBoilerplateLines(corpus, "doc_id", "text", minDocs = 3L)
        .select(col("doc_id"), col("clean_text").as("text"))
      val deduped = Dedup.exactDedup(clean, "doc_id", "text")
      val bench = Seq((999L, benchSentence)).toDF("bench_id", "bench_text")
      val kept = Dedup.decontaminateBloom(deduped, bench, "doc_id", "bench_id",
        "text", "bench_text", shingleN = 3, threshold = 0.8)
      val lm = TextOps.bigramLm(kept, "text")
      val scores = TextOps.lmScore(kept, "doc_id", "text", lm)
        .select("doc_id", "cross_entropy").as[(Long, Double)].collect()
      lm.release()
      val splits = kept.select(col("doc_id"),
        Curation.splitAssign(col("doc_id")).as("split"))
        .as[(Long, String)].collect().toSet
      val packed = TextOps.packSequences(kept, "doc_id", "text",
        seqLen = 16, numShards = 4)
      val texts = kept.as[(Long, String)].collect().toMap
      assert(scores.length == texts.size && scores.forall(s =>
        java.lang.Double.isFinite(s._2)), "every survivor gets a finite score")
      (texts.keySet, texts, splits, packed.count())
    }

    val (ids, texts, splits, nPacked) = run()
    // boilerplate stage: the footer is gone from every survivor, structure kept
    assert(texts.values.forall(!_.contains("(c) example corp footer")))
    assert(texts(0L).contains("unique line 0"))
    // dedup stage: exact copies collapsed to the min-id representative
    assert(ids.contains(3L) && ids.contains(7L))
    assert(!ids.contains(100L) && !ids.contains(101L))
    // decontamination stage: the benchmark leak is dropped
    assert(!ids.contains(200L))
    assert(ids == (0L until 40L).toSet)
    // split + pack run off the same surviving set
    assert(splits.map(_._1) == ids && splits.forall(s =>
      Set("train", "val", "test").contains(s._2)))
    assert(nPacked == ids.size, "packing places every surviving doc once")
    // end-to-end determinism
    assert((ids, texts, splits, nPacked) == run())
  }
}
