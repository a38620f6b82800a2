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
    * executor. `byteLevel` models symbolize words as UTF-8 BYTES via the
    * GPT-2 byte↔char table ([[byteToSym]]) instead of code points — the
    * alphabet is all 256 byte symbols, so encoding NEVER emits `<unk>`
    * (emoji / rare scripts keep full fidelity in the id stream). */
  case class BpeModel(merges: IndexedSeq[(String, String)],
                      alphabet: IndexedSeq[String] = IndexedSeq.empty,
                      byteLevel: Boolean = false)
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
      * (code points, sorted; for byte-level models the 256 byte symbols in
      * BYTE order, so id(byte b) = 1 + b), then merge products by rank —
      * every symbol [[graft.functions.BpeExpressions.encodeWord]] can emit
      * for in-alphabet text has an id; out-of-alphabet code points map to
      * `<unk>` (impossible for byte-level models). */
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

  /** GPT-2's byte↔unicode table (Radford et al. 2019, encoder.py
    * `bytes_to_unicode`): the 188 printable/latin-1 bytes map to their own
    * code points, the remaining 68 (controls, space, DEL, soft hyphen) to
    * U+0100+n in byte order — 256 DISTINCT, non-whitespace, single-char
    * symbols. Mapping bytes away from whitespace keeps the merges.txt
    * space-separated serialization unambiguous. */
  private[graft] val byteToSym: Array[String] = {
    val direct = ((33 to 126) ++ (161 to 172) ++ (174 to 255)).toSet
    var n = 0
    Array.tabulate(256) { b =>
      if (direct(b)) String.valueOf(b.toChar)
      else { val s = String.valueOf((256 + n).toChar); n += 1; s }
    }
  }

  /** The full byte-level alphabet, in byte order (id of byte b = 1 + b under
    * [[BpeModel.vocab]]). Fixed — independent of the training corpus, so
    * byte-level token ids are stable across models with equal merges. */
  private[graft] val byteAlphabet: IndexedSeq[String] = byteToSym.toIndexedSeq

  /** UTF-8 byte symbolization of a word (GPT-2 byte-level pretokens). */
  private[graft] def byteSyms(w: String): Array[String] = {
    val bytes = w.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    Array.tabulate(bytes.length)(i => byteToSym(bytes(i) & 0xff))
  }

  private def initialSyms(w: String, byteLevel: Boolean): Array[String] =
    if (byteLevel) byteSyms(w) else codePointSyms(w)

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
   * rounds of (pick the most frequent adjacent symbol pair → merge it
   * everywhere). Deterministic: ties broken by pair (a, b) lexicographic
   * ascending. Stops early when no pair occurs twice.
   *
   * INCREMENTAL (the production shape — a real tokenizer is 32k–50k merges,
   * and a per-merge full recount is O(numMerges · Σ|word|), hours of driver
   * CPU at that size): maintains pair → count and pair → containing-words
   * indexes plus a lazy max-heap; each merge touches ONLY the words that
   * contain the merged pair (decrement their old adjacencies, re-segment,
   * increment the new ones). Heap entries are validated against the live
   * count on pop — stale-high entries re-enter at their current count
   * BEFORE the next pop, so the (count desc, pair asc) selection order is
   * exactly the full-recount learner's ([[learnMergesRecount]] stays as the
   * parity twin; BpeSpec asserts identical merges on randomized corpora).
   */
  def learnMerges(wordCounts: Seq[(String, Long)], numMerges: Int,
                  byteLevel: Boolean = false): BpeModel = {
    require(numMerges >= 0, s"numMerges must be >= 0, got $numMerges")
    // words with non-positive counts contribute nothing to any pair count —
    // skip them outright (the recount learner weights them by c ≤ 0 too)
    val in = wordCounts.filter(_._2 > 0L)
    val words: Array[Array[String]] =
      in.map { case (w, _) => initialSyms(w, byteLevel) }.toArray
    val freq: Array[Long] = in.map(_._2).toArray
    val alphabet: IndexedSeq[String] =
      if (byteLevel) byteAlphabet
      else wordCounts.iterator.flatMap(w => initialSyms(w._1, byteLevel))
        .toSeq.distinct.sorted.toIndexedSeq

    type Pair = (String, String)
    val pairOrd: Ordering[Pair] = Ordering.Tuple2(Ordering.String, Ordering.String)
    val pairCount = new java.util.HashMap[Pair, java.lang.Long]()
    val pairWords = new java.util.HashMap[Pair, java.util.HashSet[Integer]]()
    // count desc, then pair lexicographic asc — the recount learner's order
    val heap = new java.util.PriorityQueue[(Long, Pair)](64,
      new java.util.Comparator[(Long, Pair)] {
        override def compare(x: (Long, Pair), y: (Long, Pair)): Int = {
          val c = java.lang.Long.compare(y._1, x._1)
          if (c != 0) c else pairOrd.compare(x._2, y._2)
        }
      })

    def inc(p: Pair, c: Long, wi: Int, push: Boolean): Unit = {
      val nc = pairCount.merge(p, c, (x, y) => x + y)
      var s = pairWords.get(p)
      if (s == null) { s = new java.util.HashSet[Integer](); pairWords.put(p, s) }
      s.add(Integer.valueOf(wi))
      if (push && nc >= 2L) heap.add((nc.longValue, p))
    }
    def dec(p: Pair, c: Long, wi: Int): Unit = {
      val cur = pairCount.get(p)
      if (cur == null) return // the just-merged pair itself, already dropped
      val nc = cur - c
      if (nc <= 0L) { pairCount.remove(p); pairWords.remove(p) }
      else {
        pairCount.put(p, java.lang.Long.valueOf(nc))
        val s = pairWords.get(p)
        if (s != null) { s.remove(Integer.valueOf(wi)); () }
      }
    }

    var wi = 0
    while (wi < words.length) {
      val syms = words(wi); val c = freq(wi)
      var i = 0
      while (i < syms.length - 1) {
        inc((syms(i), syms(i + 1)), c, wi, push = false); i += 1
      }
      wi += 1
    }
    pairCount.forEach((p, c) => if (c >= 2L) { heap.add((c.longValue, p)); () })

    val merges = scala.collection.mutable.ArrayBuffer.empty[Pair]
    var done = false
    while (merges.size < numMerges && !done) {
      // pop until a live entry: recorded == current count. A stale-high
      // entry (count has since decreased) re-enters at its CURRENT count
      // before the next pop, so a lex-smaller pair tied at that count still
      // wins — selection order matches the full recount exactly.
      var best: Pair = null
      var polling = true
      while (polling) {
        val e = heap.poll()
        if (e == null) polling = false
        else {
          val cur = pairCount.get(e._2)
          if (cur == null || cur < 2L) () // dead or sub-threshold: drop
          else if (cur.longValue == e._1) { best = e._2; polling = false }
          else heap.add((cur.longValue, e._2))
        }
      }
      if (best == null) done = true
      else {
        merges += best
        val affected = pairWords.remove(best)
        pairCount.remove(best)
        if (affected != null) {
          val it = affected.iterator()
          while (it.hasNext) {
            val w = it.next().intValue
            val syms = words(w); val c = freq(w)
            var i = 0
            while (i < syms.length - 1) { dec((syms(i), syms(i + 1)), c, w); i += 1 }
            val merged = mergeAll(syms, best._1, best._2)
            words(w) = merged
            i = 0
            while (i < merged.length - 1) {
              inc((merged(i), merged(i + 1)), c, w, push = true); i += 1
            }
          }
        }
      }
    }
    BpeModel(merges.toIndexedSeq, alphabet, byteLevel)
  }

  /** The textbook full-recount learner — O(numMerges · Σ|word|), kept as
    * [[learnMerges]]' parity oracle (BpeSpec runs both on randomized corpora
    * and asserts identical merge sequences). Never call this for production
    * vocabulary sizes. */
  private[graft] def learnMergesRecount(wordCounts: Seq[(String, Long)],
      numMerges: Int, byteLevel: Boolean = false): BpeModel = {
    require(numMerges >= 0, s"numMerges must be >= 0, got $numMerges")
    val alphabet: IndexedSeq[String] =
      if (byteLevel) byteAlphabet
      else wordCounts.iterator.flatMap(w => initialSyms(w._1, byteLevel))
        .toSeq.distinct.sorted.toIndexedSeq
    // same non-positive-count skip as the incremental learner (exact parity)
    var words = wordCounts.filter(_._2 > 0L)
      .map { case (w, c) => (initialSyms(w, byteLevel), c) }.toArray
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
    BpeModel(merges.toIndexedSeq, alphabet, byteLevel)
  }

  /**
   * Serialize a model in the standard merges.txt shape (one merge per line,
   * space-separated pair, rank = line order) behind a fixed header block:
   * `#graft-bpe v1`, an optional `#bytelevel` marker, then the `#alphabet`
   * line. Header lines are POSITIONAL — [[parseBpeFile]] recognizes them
   * only at the top of the file, so merge pairs whose first symbol begins
   * with '#' (hashtags in externally tokenized word tables) round-trip as
   * merges, never as comments. Symbols can never contain whitespace
   * ([[graft.operators.TextOps.bpeTokenPattern]] excludes it; the byte
   * table maps whitespace bytes away), so space-separated is unambiguous.
   */
  def writeBpeFile(model: BpeModel): String = {
    val header =
      "#graft-bpe v1" ::
        (if (model.byteLevel) List("#bytelevel") else Nil) :::
        ((("#alphabet" +: model.alphabet).mkString(" ")) :: Nil)
    (header ::: model.merges.map(m => m._1 + " " + m._2).toList).mkString("\n")
  }

  /** Parse [[writeBpeFile]] output back into a [[BpeModel]]. The header
    * block (`#bytelevel`, `#alphabet`) is consumed positionally right after
    * the version line; every following non-empty line MUST be a merge pair —
    * including lines starting with '#'. */
  def parseBpeFile(lines: Iterator[String]): BpeModel = {
    val it = lines.map(_.trim).filter(_.nonEmpty).buffered
    require(it.hasNext, "empty BPE model file")
    val header = it.next()
    require(header.startsWith("#graft-bpe"), s"not a graft BPE file: '$header'")
    val byteLevel = it.hasNext && it.head == "#bytelevel"
    if (byteLevel) it.next()
    var alphabet: IndexedSeq[String] = IndexedSeq.empty
    if (it.hasNext && (it.head == "#alphabet" || it.head.startsWith("#alphabet "))) {
      alphabet = it.next().split(" ").iterator.drop(1).filter(_.nonEmpty).toIndexedSeq
    }
    val merges = scala.collection.immutable.IndexedSeq.newBuilder[(String, String)]
    it.foreach { line =>
      val sep = line.indexOf(' ')
      require(sep > 0 && sep < line.length - 1 && line.indexOf(' ', sep + 1) < 0,
        s"malformed merge line: '$line'")
      merges += ((line.substring(0, sep), line.substring(sep + 1)))
    }
    BpeModel(merges.result(), alphabet, byteLevel)
  }

  /**
   * Learn a BPE model from a document corpus: pre-tokenize with
   * [[graft.operators.TextOps.bpeTokenPattern]] (letter runs / digits /
   * punctuation glyphs — the same splitter `bpe_encode` applies), aggregate
   * word counts distributed, keep the top `maxWords` by (count desc, word
   * asc) — a TakeOrderedAndProject, partial top-k per partition, bounded
   * collect — and learn merges driver-side. `byteLevel = true` learns a
   * GPT-2-style byte-level model (words symbolized as UTF-8 bytes; the
   * id stream never contains `<unk>`).
   */
  def learn(df: DataFrame, textCol: String, numMerges: Int,
            maxWords: Int = 50000, minCount: Long = 2L,
            byteLevel: Boolean = false): BpeModel = {
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
    learnMerges(wc.toSeq, numMerges, byteLevel)
  }
}
