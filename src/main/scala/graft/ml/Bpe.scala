package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Byte-pair-encoding tokenizer learning (Sennrich et al. 2016; the GPT-2
 * pre-tokenizer shape). The reference has no text side — this closes the gap
 * between `TextOps.tokenCountBpe`'s regex ESTIMATE and model-ingestible
 * tokens for the training-data pipeline brief.
 *
 * Shape at scale: the corpus-wide work is ONE distributed aggregate (word →
 * count over the pre-tokenized corpus, shuffling (word, count) pairs, never
 * text). Merge learning then runs driver-side over the top-`maxWords`
 * word-count table — the standard implementation (BPE learners operate on
 * word frequencies, not the corpus; a 50k-word Zipf head covers ~99% of
 * token mass), and the same sanctioned bounded-model-load pattern as the
 * k-means centroid collects. The learned model ships back to executors in a
 * broadcast consumed by the native `bpe_encode` expression
 * (graft.functions.BpeExpressions) — driver-state expression doctrine, no
 * giant literals in the plan.
 */
object Bpe {

  /** Ordered merge table (rank = position) + the training alphabet. Ships in
    * a Spark broadcast; the derived lookup maps are rebuilt lazily once per
    * executor. */
  case class BpeModel(merges: IndexedSeq[(String, String)],
                      alphabet: IndexedSeq[String] = IndexedSeq.empty)
      extends Serializable {
    /** (a + ' ' + b) → rank; the apply loop's hot lookup. */
    @transient lazy val ranks: java.util.HashMap[String, Integer] = {
      val m = new java.util.HashMap[String, Integer](merges.size * 2)
      var i = 0
      while (i < merges.size) {
        m.put(merges(i)._1 + " " + merges(i)._2, Integer.valueOf(i))
        i += 1
      }
      m
    }

    /** Token-id vocabulary: `<unk>` at id 0, then the training alphabet
      * (code points, sorted), then merge products by rank — every symbol
      * [[graft.functions.BpeExpressions.encodeWord]] can emit for in-alphabet
      * text has an id; out-of-alphabet code points map to `<unk>`. */
    @transient lazy val vocab: IndexedSeq[String] =
      "<unk>" +: (alphabet ++ merges.map(m => m._1 + m._2))

    /** token → id; distinct merge paths yielding the same string (e.g.
      * (a,bc) and (ab,c) both → "abc") keep the FIRST (lowest) id. */
    @transient lazy val tokenIds: java.util.HashMap[String, Integer] = {
      val m = new java.util.HashMap[String, Integer](vocab.size * 2)
      var i = 0
      while (i < vocab.size) {
        m.putIfAbsent(vocab(i), Integer.valueOf(i))
        i += 1
      }
      m
    }
  }

  /** Split into code-point symbols (a surrogate pair is ONE symbol — same
    * code-point semantics as the pre-tokenizer regex). */
  private[graft] def codePointSyms(w: String): Array[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String](w.length)
    var i = 0
    while (i < w.length) {
      val n = Character.charCount(w.codePointAt(i))
      out += w.substring(i, i + n)
      i += n
    }
    out.toArray
  }

  /** Merge every adjacent (a, b) occurrence in `syms`, left to right. */
  private def mergeAll(syms: Array[String], a: String, b: String): Array[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
    var j = 0
    while (j < syms.length) {
      if (j < syms.length - 1 && syms(j) == a && syms(j + 1) == b) {
        out += a + b; j += 2
      } else { out += syms(j); j += 1 }
    }
    out.toArray
  }

  /**
   * Classic BPE merge learning over a word-frequency table: `numMerges`
   * rounds of (count adjacent symbol pairs weighted by word count → merge
   * the most frequent pair everywhere). Deterministic: ties broken by pair
   * (a, b) lexicographic ascending. Stops early when no pair occurs twice.
   * O(numMerges · Σ word lengths) — driver-side over the bounded vocabulary,
   * seconds at the documented maxWords cap.
   */
  def learnMerges(wordCounts: Seq[(String, Long)], numMerges: Int): BpeModel = {
    require(numMerges >= 0, s"numMerges must be >= 0, got $numMerges")
    var words = wordCounts.map { case (w, c) => (codePointSyms(w), c) }.toArray
    val alphabet = words.iterator.flatMap(_._1).toSeq.distinct.sorted.toIndexedSeq
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var done = false
    while (merges.size < numMerges && !done) {
      val pairCounts = new java.util.HashMap[(String, String), Long]()
      words.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length - 1) {
          pairCounts.merge((syms(i), syms(i + 1)), c, (x, y) => x + y)
          i += 1
        }
      }
      var best: (String, String) = null
      var bestCount = 1L // a pair seen once is noise, not a merge rule
      val it = pairCounts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val cmp = java.lang.Long.compare(e.getValue, bestCount)
        if (cmp > 0 || (cmp == 0 && best != null &&
            Ordering[(String, String)].lt(e.getKey, best))) {
          best = e.getKey; bestCount = e.getValue
        }
      }
      if (best == null) done = true
      else {
        merges += best
        words = words.map { case (syms, c) => (mergeAll(syms, best._1, best._2), c) }
      }
    }
    BpeModel(merges.toIndexedSeq, alphabet)
  }

  /**
   * Serialize a model in the standard merges.txt shape (one merge per line,
   * space-separated pair, rank = line order) plus a `#alphabet` header so the
   * token-id vocabulary survives the round trip. Symbols can never contain
   * whitespace ([[graft.operators.TextOps.bpeTokenPattern]] excludes it), so
   * space-separated is unambiguous.
   */
  def writeBpeFile(model: BpeModel): String =
    ("#graft-bpe v1" ::
      ("#alphabet" +: model.alphabet).mkString(" ") ::
      model.merges.map(m => m._1 + " " + m._2).toList).mkString("\n")

  /** Parse [[writeBpeFile]] output back into a [[BpeModel]]. */
  def parseBpeFile(lines: Iterator[String]): BpeModel = {
    val it = lines.map(_.trim).filter(_.nonEmpty)
    require(it.hasNext, "empty BPE model file")
    val header = it.next()
    require(header.startsWith("#graft-bpe"), s"not a graft BPE file: '$header'")
    var alphabet: IndexedSeq[String] = IndexedSeq.empty
    val merges = scala.collection.immutable.IndexedSeq.newBuilder[(String, String)]
    it.foreach { line =>
      if (line.startsWith("#alphabet"))
        alphabet = line.split(" ").iterator.drop(1).filter(_.nonEmpty).toIndexedSeq
      else if (!line.startsWith("#")) {
        val sep = line.indexOf(' ')
        require(sep > 0 && sep < line.length - 1 && line.indexOf(' ', sep + 1) < 0,
          s"malformed merge line: '$line'")
        merges += ((line.substring(0, sep), line.substring(sep + 1)))
      }
    }
    BpeModel(merges.result(), alphabet)
  }

  /**
   * Learn a BPE model from a document corpus: pre-tokenize with
   * [[graft.operators.TextOps.bpeTokenPattern]] (letter runs / digits /
   * punctuation glyphs — the same splitter `bpe_encode` applies), aggregate
   * word counts distributed, keep the top `maxWords` by (count desc, word
   * asc) — a TakeOrderedAndProject, partial top-k per partition, bounded
   * collect — and learn merges driver-side.
   */
  def learn(df: DataFrame, textCol: String, numMerges: Int,
            maxWords: Int = 50000, minCount: Long = 2L): BpeModel = {
    require(maxWords > 0, s"maxWords must be positive, got $maxWords")
    val wc = df
      .select(explode(regexp_extract_all(col(textCol),
        lit(graft.operators.TextOps.bpeTokenPattern), lit(0))).as("__w"))
      .groupBy(col("__w"))
      .agg(count(lit(1)).as("__c"))
      .where(col("__c") >= minCount)
      .orderBy(col("__c").desc, col("__w"))
      .limit(maxWords)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
    learnMerges(wc.toSeq, numMerges)
  }
}
