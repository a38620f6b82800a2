package graft

import org.apache.spark.unsafe.types.UTF8String

/** Round-8 diagnostic: raw single-thread cost of the shingle kernels over
  * the actual sf0.1 documents (no Spark execution — direct eval calls). */
object ProfileShingles {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val texts = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .select("text").collect().map(_.getString(0))
    spark.stop()
    println(s"docs=${texts.length} totalChars=${texts.map(_.length).sum}")
    val u = texts.map(UTF8String.fromString)
    import graft.functions.TextExpressions
    (1 to 3).foreach { rep =>
      var t0 = System.nanoTime()
      var acc = 0L
      u.foreach { t => acc += TextExpressions.shinglesEval(t, 3, true).numElements() }
      val tStr = (System.nanoTime() - t0) / 1e6
      t0 = System.nanoTime()
      u.foreach { t => acc += TextExpressions.shinglesHashedEval(t, 3, true).numElements() }
      val tHash = (System.nanoTime() - t0) / 1e6
      t0 = System.nanoTime()
      u.foreach { t => acc += TextExpressions.minhashBundleEval(t, 3, true, 64)
        .asInstanceOf[org.apache.spark.sql.catalyst.expressions.GenericInternalRow]
        .getArray(0).numElements() }
      val tMh = (System.nanoTime() - t0) / 1e6
      t0 = System.nanoTime()
      u.foreach { t => acc += t.toString.split("\\s+").length }
      val tSplit = (System.nanoTime() - t0) / 1e6
      println(f"rep$rep shingles=${tStr}%.1fms hashed=${tHash}%.1fms minhashBundle=${tMh}%.1fms bareSplit=${tSplit}%.1fms acc=$acc")
    }
  }
}
