package graft

import java.nio.file.{Files, Paths}

/**
 * Round-8 optimization evidence dumper: writes `.explain("formatted")` for
 * every declared headline query to plans/r08/<query>_<tag>.txt. The dedup
 * operators eagerly checkpoint their pair output (the executed plan tops out
 * at `Scan ExistingRDD`), so dumps run with the interior-plan flag — the
 * same device PlanDump uses — to keep the candidate-generation shapes on
 * record. Usage: PlanDumpR08 <before|after> [query,query,...]
 */
object PlanDumpR08 {
  def main(args: Array[String]): Unit = {
    val tag = if (args.nonEmpty) args(0) else "before"
    val only: Option[Set[String]] =
      if (args.length > 1) Some(args(1).split(',').map(_.trim).toSet) else None
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]").config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.001"
    val outDir = Paths.get("/root/repo/plans/r08")
    Files.createDirectories(outDir)
    val skip = Set.empty[String] // image queries dump fine on sf0.001
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, mk) =>
      if (only.forall(_.contains(name)) && !skip.contains(name)) {
        try {
          graft.operators.Dedup.explainInterior.withValue(true) {
            val df = mk(spark, sf)
            val s = df.queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode)
            Files.writeString(outDir.resolve(s"${name}_$tag.txt"), s)
          }
          println(s"dumped $name")
        } catch {
          case e: Throwable =>
            System.err.println(s"FAILED $name: ${e.getMessage}")
        }
      }
    }
    spark.stop()
  }
}
