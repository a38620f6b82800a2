package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.ml.Bpe.BpeModel

/**
 * Native Catalyst expression applying a learned BPE merge table
 * (graft.ml.Bpe) to text: pre-tokenize with the same regex as
 * `TextOps.bpeTokenPattern`, then per word repeatedly merge the
 * lowest-ranked adjacent symbol pair until none applies. The merge table
 * rides in a Spark broadcast (driver-state expression doctrine — a learned
 * vocabulary of 10⁴–10⁵ merges must not be plan literals), the per-word
 * loop is compiled Scala, and a per-thread LRU memoizes encoded words —
 * corpora are Zipf-distributed, so the head words hit the cache almost
 * always and the merge loop runs only on the tail.
 */
object BpeExpressions {

  private val preTokenizer = java.util.regex.Pattern.compile(
    graft.operators.TextOps.bpeTokenPattern)

  /** Apply the merge table to one word: repeatedly find the lowest-rank
    * adjacent pair and merge ALL its occurrences (classic BPE apply —
    * mirrors the learner's merge order exactly). Byte-level models
    * symbolize the word as UTF-8 bytes (GPT-2 table) first — every start
    * symbol is then in the 256-symbol alphabet, so ids never hit `<unk>`. */
  def encodeWord(word: String, model: BpeModel): Array[String] = {
    var syms =
      if (model.byteLevel) graft.ml.Bpe.byteSyms(word)
      else graft.ml.Bpe.codePointSyms(word)
    val ranks = model.ranks
    var go = syms.length >= 2
    while (go) {
      var bestRank = Int.MaxValue
      var bestA: String = null
      var bestB: String = null
      var i = 0
      while (i < syms.length - 1) {
        val r = ranks.get(syms(i) + " " + syms(i + 1))
        if (r != null && r.intValue < bestRank) {
          bestRank = r.intValue; bestA = syms(i); bestB = syms(i + 1)
        }
        i += 1
      }
      if (bestA == null) go = false
      else {
        val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
        var j = 0
        while (j < syms.length) {
          if (j < syms.length - 1 && syms(j) == bestA && syms(j + 1) == bestB) {
            out += bestA + bestB; j += 2
          } else { out += syms(j); j += 1 }
        }
        syms = out.toArray
        if (syms.length < 2) go = false
      }
    }
    syms
  }

  // Per-thread LRU of word → encoded symbols. Keyed by model identity (one
  // broadcast deserializes once per executor, so `ne` detects a different
  // model); ThreadLocal because an interpreted Expression instance may be
  // shared across tasks while generated classes are per-task — both are
  // single-threaded per thread.
  private val maxCacheEntries = 8192
  private val cacheTl =
    new ThreadLocal[(AnyRef, java.util.LinkedHashMap[String, Array[String]])]()

  def encodeWordCached(word: String, model: BpeModel): Array[String] = {
    var entry = cacheTl.get()
    if (entry == null || (entry._1 ne model)) {
      val lru = new java.util.LinkedHashMap[String, Array[String]](1024, 0.75f, true) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[String, Array[String]]): Boolean =
          size() > maxCacheEntries
      }
      entry = (model, lru)
      cacheTl.set(entry)
    }
    val hit = entry._2.get(word)
    if (hit != null) hit
    else {
      val enc = encodeWord(word, model)
      entry._2.put(word, enc)
      enc
    }
  }

  /** Static bridge for codegen: text → all BPE tokens in document order. */
  def bpeEncodeEval(text: UTF8String, model: BpeModel): ArrayData = {
    val m = preTokenizer.matcher(text.toString)
    val out = new java.util.ArrayList[Any]()
    while (m.find()) {
      val toks = encodeWordCached(m.group(), model)
      var i = 0
      while (i < toks.length) { out.add(UTF8String.fromString(toks(i))); i += 1 }
    }
    new GenericArrayData(out.toArray)
  }

  /** Static bridge for codegen: text → token IDS (model.vocab positions,
    * `<unk>`=0 for out-of-alphabet code points) — the model-ingestible form. */
  def bpeEncodeIdsEval(text: UTF8String, model: BpeModel): ArrayData = {
    val ids = model.tokenIds
    val m = preTokenizer.matcher(text.toString)
    val out = new java.util.ArrayList[Any]()
    while (m.find()) {
      val toks = encodeWordCached(m.group(), model)
      var i = 0
      while (i < toks.length) {
        val id = ids.get(toks(i))
        out.add(if (id == null) Integer.valueOf(0) else id)
        i += 1
      }
    }
    new GenericArrayData(out.toArray)
  }

  case class BpeEncode(child: Expression, model: Broadcast[BpeModel])
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def prettyName: String = "bpe_encode"

    @transient private lazy val m: BpeModel = model.value

    override def nullSafeEval(text: Any): Any =
      bpeEncodeEval(text.asInstanceOf[UTF8String], m)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val bcRef = ctx.addReferenceObj("bpeBc", model,
        classOf[Broadcast[BpeModel]].getName)
      val mdl = ctx.addMutableState("graft.ml.Bpe.BpeModel", "bpeModel",
        v => s"$v = (graft.ml.Bpe.BpeModel) $bcRef.value();")
      val cls = BpeExpressions.getClass.getName.stripSuffix("$") + "$.MODULE$"
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = $cls.bpeEncodeEval($c, $mdl);")
    }

    override protected def withNewChildInternal(c: Expression): BpeEncode =
      copy(child = c)
  }

  case class BpeEncodeIds(child: Expression, model: Broadcast[BpeModel])
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def prettyName: String = "bpe_encode_ids"

    @transient private lazy val m: BpeModel = model.value

    override def nullSafeEval(text: Any): Any =
      bpeEncodeIdsEval(text.asInstanceOf[UTF8String], m)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val bcRef = ctx.addReferenceObj("bpeBc", model,
        classOf[Broadcast[BpeModel]].getName)
      val mdl = ctx.addMutableState("graft.ml.Bpe.BpeModel", "bpeModel",
        v => s"$v = (graft.ml.Bpe.BpeModel) $bcRef.value();")
      val cls = BpeExpressions.getClass.getName.stripSuffix("$") + "$.MODULE$"
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = $cls.bpeEncodeIdsEval($c, $mdl);")
    }

    override protected def withNewChildInternal(c: Expression): BpeEncodeIds =
      copy(child = c)
  }

  def bpe_encode(text: Column, model: Broadcast[BpeModel]): Column =
    GraftBridge.column(BpeEncode(GraftBridge.expression(text), model))

  def bpe_encode_ids(text: Column, model: Broadcast[BpeModel]): Column =
    GraftBridge.column(BpeEncodeIds(GraftBridge.expression(text), model))
}
