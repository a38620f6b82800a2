package graft

import org.apache.spark.sql.functions._

/** Round-8 evidence: on-disk bytes of the persisted MinHash signature
  * history, hashed-shingle (array<long>) vs the former string-shingle
  * format, on the real sf0.1 documents. */
object ProfileSigBytes {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]").config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .select("doc_id", "text")
    val base = java.nio.file.Files.createTempDirectory("sigbytes")
    // current format: hashed sh + sig
    graft.operators.Dedup.minhashSignatures(docs, "doc_id", "text", 3, 64)
      .write.mode("overwrite").parquet(base.resolve("hashed").toString)
    // former format: string shingles + sig (reconstructed)
    val str = docs.select(col("doc_id"),
        graft.functions.TextExpressions.word_shingles(col("text"), 3,
          distinct = true).as("sh"))
      .where(size(col("sh")) > 0)
      .withColumn("sig", graft.operators.TextOps.minhashSignature(col("sh"), 64))
    str.write.mode("overwrite").parquet(base.resolve("strings").toString)
    def du(p: String): Long = {
      val d = new java.io.File(p)
      d.listFiles.filter(_.isFile).map(_.length).sum
    }
    val corpus = new java.io.File("/root/testdata/sf0.1/documents.parquet").length
    println(s"corpus_parquet_bytes=$corpus")
    // in-memory (cache/exchange) footprint of the sh column alone
    def cachedBytes(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val c = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
      c.count()
      val info = spark.sparkContext.getRDDStorageInfo
        .maxBy(_.memSize)
      println(s"${name}_cached_bytes=${info.memSize}")
      c.unpersist(blocking = true)
    }
    cachedBytes(spark.read.parquet(base.resolve("strings").toString).select("doc_id", "sh"), "sh_strings")
    cachedBytes(spark.read.parquet(base.resolve("hashed").toString).select("doc_id", "sh"), "sh_hashed")
    println(s"history_strings_bytes=${du(base.resolve("strings").toString)}")
    println(s"history_hashed_bytes=${du(base.resolve("hashed").toString)}")
    spark.stop()
  }
}
