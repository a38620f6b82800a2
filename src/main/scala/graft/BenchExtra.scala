package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Round-8 micro-bench (guide §1.4): noop-sink isolation of sub-stages of
 * the expensive queries, so optimization targets the measured component and
 * not a guess. NOT part of the driver contract — graft.Bench is the frozen
 * harness; numbers from here are cited in OPTIMIZATION_r08.md only.
 *
 * Usage: BenchExtra [sfDir] [cpus] — defaults sf0.1 / 32.
 */
object BenchExtra {
  private def time[T](name: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[extra] $name%-48s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
    r
  }
  private def noop(df: DataFrame): Unit =
    df.write.mode("overwrite").format("noop").save()

  def main(args: Array[String]): Unit = {
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = if (args.length > 1) args(1).toInt else 32
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", (2L * 1024 * 1024).toString)
      .config("spark.sql.files.openCostInBytes", (128L * 1024).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.{Dedup, TextOps}

    // warmup
    spark.read.parquet(s"$sf/documents.parquet").count()
    noop(SparkEntry.queries("q_dedup_groups")(spark, sf))

    def docsWithDupes(maxDocs: Long): DataFrame = {
      val docs = spark.read.parquet(s"$sf/documents.parquet")
        .where(col("doc_id") < maxDocs)
        .repartition(spark.sparkContext.defaultParallelism)
      docs.select("doc_id", "text").unionByName(
        docs.where(col("doc_id") < 20)
          .select((col("doc_id") + 1000000).as("doc_id"),
            concat(col("text"), lit(" extra")).as("text")))
    }

    (1 to 3).foreach { rep =>
      println(s"--- rep $rep")
      val docs = docsWithDupes(500L)
      time("shingle+hash only (noop)") {
        noop(docs.select(col("doc_id"),
          graft.functions.TextExpressions.word_shingles_hashed(col("text"), 3,
            distinct = true).as("sh")))
      }
      val pairs = time("ngramJaccardPairs (checkpointed)") {
        Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.6)
      }
      time("connectedComponents over pairs") {
        noop(Dedup.connectedComponents(pairs))
      }
      time("q_dedup_groups end-to-end") {
        noop(SparkEntry.queries("q_dedup_groups")(spark, sf))
      }
      time("q_dedup_keep_best end-to-end") {
        noop(SparkEntry.queries("q_dedup_keep_best")(spark, sf))
      }
      time("q_langid_nb end-to-end") {
        noop(SparkEntry.queries("q_langid_nb")(spark, sf))
      }
      val docsFull = spark.read.parquet(s"$sf/documents.parquet")
        .repartition(spark.sparkContext.defaultParallelism)
        .select(col("doc_id"), col("lang"), concat(col("text"),
          lit(" qx"), col("lang"), lit(" qx"), col("lang"),
          lit(" qx"), col("lang")).as("text"))
      val model = time("nbLangModel (train)") {
        TextOps.nbLangModel(docsFull, "lang", "text", n = 3, k = 1.0)
      }
      time("nbLangId (score)") {
        noop(TextOps.nbLangId(docsFull, "doc_id", "text", model))
      }
      model.release()
      time("q_sb_trigram end-to-end") {
        noop(SparkEntry.queries("q_sb_trigram")(spark, sf))
      }
      val lm = time("stupidBackoffLm (train)") {
        TextOps.stupidBackoffLm(
          spark.read.parquet(s"$sf/documents.parquet")
            .repartition(spark.sparkContext.defaultParallelism), "text")
      }
      time("sbScore (score)") {
        noop(TextOps.sbScore(
          spark.read.parquet(s"$sf/documents.parquet")
            .repartition(spark.sparkContext.defaultParallelism),
          "doc_id", "text", lm))
      }
      lm.release()
    }
    spark.stop()
  }
}
