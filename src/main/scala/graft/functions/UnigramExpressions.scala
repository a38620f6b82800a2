package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.ml.Unigram
import graft.ml.Unigram.UnigramModel

/**
 * Native Catalyst expression applying a learned unigram-LM piece vocabulary
 * (graft.ml.Unigram, the SentencePiece algorithm) to text: pre-tokenize with
 * the same regex as `TextOps.bpeTokenPattern`, then Viterbi-segment each
 * word into the max-log-probability piece sequence. Same doctrine as
 * [[BpeExpressions]]: the model rides in a Spark broadcast (a 10⁴-piece
 * vocabulary must not be plan literals), the per-word DP is compiled Scala,
 * and a per-thread LRU memoizes segmented words — Zipf head words hit the
 * cache, the Viterbi loop runs only on the tail.
 */
object UnigramExpressions {

  private val preTokenizer = java.util.regex.Pattern.compile(
    graft.operators.TextOps.bpeTokenPattern)

  // Per-thread LRU of word → pieces, keyed by model identity (one broadcast
  // deserializes once per executor, so `ne` detects a different model).
  private val maxCacheEntries = 8192
  private val cacheTl =
    new ThreadLocal[(AnyRef, java.util.LinkedHashMap[String, Array[String]])]()

  def encodeWordCached(word: String, model: UnigramModel): Array[String] = {
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
      val enc = Unigram.encodeWord(word, model)
      entry._2.put(word, enc)
      enc
    }
  }

  /** Static bridge for codegen: text → all pieces in document order. */
  def unigramEncodeEval(text: UTF8String, model: UnigramModel): ArrayData = {
    val m = preTokenizer.matcher(text.toString)
    val out = new java.util.ArrayList[Any]()
    while (m.find()) {
      val toks = encodeWordCached(m.group(), model)
      var i = 0
      while (i < toks.length) { out.add(UTF8String.fromString(toks(i))); i += 1 }
    }
    new GenericArrayData(out.toArray)
  }

  /** Static bridge for codegen: text → piece IDS (model.vocab positions,
    * `<unk>`=0 for out-of-vocabulary single code points). */
  def unigramEncodeIdsEval(text: UTF8String, model: UnigramModel): ArrayData = {
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

  case class UnigramEncode(child: Expression, model: Broadcast[UnigramModel])
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def prettyName: String = "unigram_encode"

    @transient private lazy val m: UnigramModel = model.value

    override def nullSafeEval(text: Any): Any =
      unigramEncodeEval(text.asInstanceOf[UTF8String], m)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val bcRef = ctx.addReferenceObj("unigramBc", model,
        classOf[Broadcast[UnigramModel]].getName)
      val mdl = ctx.addMutableState("graft.ml.Unigram.UnigramModel", "unigramModel",
        v => s"$v = (graft.ml.Unigram.UnigramModel) $bcRef.value();")
      val cls = UnigramExpressions.getClass.getName.stripSuffix("$") + "$.MODULE$"
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = $cls.unigramEncodeEval($c, $mdl);")
    }

    override protected def withNewChildInternal(c: Expression): UnigramEncode =
      copy(child = c)
  }

  case class UnigramEncodeIds(child: Expression, model: Broadcast[UnigramModel])
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def prettyName: String = "unigram_encode_ids"

    @transient private lazy val m: UnigramModel = model.value

    override def nullSafeEval(text: Any): Any =
      unigramEncodeIdsEval(text.asInstanceOf[UTF8String], m)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val bcRef = ctx.addReferenceObj("unigramBc", model,
        classOf[Broadcast[UnigramModel]].getName)
      val mdl = ctx.addMutableState("graft.ml.Unigram.UnigramModel", "unigramModel",
        v => s"$v = (graft.ml.Unigram.UnigramModel) $bcRef.value();")
      val cls = UnigramExpressions.getClass.getName.stripSuffix("$") + "$.MODULE$"
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = $cls.unigramEncodeIdsEval($c, $mdl);")
    }

    override protected def withNewChildInternal(c: Expression): UnigramEncodeIds =
      copy(child = c)
  }

  def unigram_encode(text: Column, model: Broadcast[UnigramModel]): Column =
    GraftBridge.column(UnigramEncode(GraftBridge.expression(text), model))

  def unigram_encode_ids(text: Column, model: Broadcast[UnigramModel]): Column =
    GraftBridge.column(UnigramEncodeIds(GraftBridge.expression(text), model))
}
