package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Round-8 diagnostic: per-stage wall/task breakdown of one declared query
  * (jobs, stages, task time, shuffle bytes) so optimization targets the
  * measured stage. Usage: ProfileStages <query> [sfDir] [cpus]. */
object ProfileStages {
  def main(args: Array[String]): Unit = {
    val q = args(0)
    val sf = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = if (args.length > 2) args(2).toInt else 32
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", (2L * 1024 * 1024).toString)
      .config("spark.sql.files.openCostInBytes", (128L * 1024).toString)
      .config("spark.ui.enabled", "false")
      .config("spark.buffer.pageSize",
        sys.env.getOrElse("GRAFT_PAGE_SIZE", "67108864"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup (JIT + codegen)
    SparkEntry.queries(q)(spark, sf).write.mode("overwrite").format("noop").save()

    case class St(name: String, submitted: Long, var completed: Long = 0L,
                  var taskTimeMs: Long = 0L, var tasks: Int = 0,
                  var shufRead: Long = 0L, var shufWrite: Long = 0L,
                  var cpuMs: Long = 0L, var deserMs: Long = 0L, var gcMs: Long = 0L)
    val stages = scala.collection.concurrent.TrieMap.empty[Int, St]
    var jobs = 0
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs += 1
      override def onStageSubmitted(s: SparkListenerStageSubmitted): Unit =
        stages(s.stageInfo.stageId) = St(
          s.stageInfo.rddInfos.sortBy(_.id).map(r => r.name.trim).distinct
            .mkString("<-").take(140),
          System.currentTimeMillis())
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        stages.get(sc.stageInfo.stageId).foreach { st =>
          st.completed = System.currentTimeMillis()
          st.tasks = sc.stageInfo.numTasks
          st.taskTimeMs = sc.stageInfo.taskMetrics.executorRunTime
          st.shufRead = sc.stageInfo.taskMetrics.shuffleReadMetrics.totalBytesRead
          st.shufWrite = sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten
          st.cpuMs = sc.stageInfo.taskMetrics.executorCpuTime / 1000000L
          st.deserMs = sc.stageInfo.taskMetrics.executorDeserializeTime
          st.gcMs = sc.stageInfo.taskMetrics.jvmGCTime
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    SparkEntry.queries(q)(spark, sf).write.mode("overwrite").format("noop").save()
    val wall = (System.nanoTime() - t0) / 1e9
    Thread.sleep(500) // let listener drain
    println(f"== $q wall ${wall}%.3f s, $jobs jobs, ${stages.size} stages")
    stages.toSeq.sortBy(_._1).foreach { case (id, st) =>
      println(f"stage $id%4d wall=${(st.completed - st.submitted)}%5d ms " +
        f"taskTime=${st.taskTimeMs}%6d ms tasks=${st.tasks}%3d " +
        f"cpu=${st.cpuMs}%6d deser=${st.deserMs}%5d gc=${st.gcMs}%4d " +
        f"sr=${st.shufRead}%8d sw=${st.shufWrite}%8d  ${st.name}")
    }
    spark.stop()
  }
}
