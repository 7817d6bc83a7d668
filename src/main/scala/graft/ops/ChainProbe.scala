package graft.ops
import org.apache.spark.sql.SparkSession
import graft.{Tables => T}

/** Scratch profiling main for the MinHash chain (r15, temporary). */
object ChainProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.local.dir", "/dev/shm/graft-spark-local")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    def cpu(): Double = osBean.getProcessCpuTime / 1e9
    // per-stage task metrics
    val stageCpu = new java.util.concurrent.ConcurrentHashMap[Int, (Long, Long, Long)]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = e.taskMetrics
        if (m != null) stageCpu.merge(e.stageId,
          (m.executorCpuTime / 1000000, m.executorRunTime, 1L),
          (a, b) => (a._1 + b._1, a._2 + b._2, a._3 + b._3))
      }
    })
    spark.range(1000000).selectExpr("sum(id)").collect()
    val jitBean = java.lang.management.ManagementFactory.getCompilationMXBean
    def noop(tag: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      stageCpu.clear()
      val t0 = System.nanoTime(); val c0 = cpu(); val j0 = jitBean.getTotalCompilationTime
      val n = df.queryExecution.toRdd.count()
      println(f"[chain] $tag%-30s wall=${(System.nanoTime() - t0) / 1e9}%7.2f cpu=${cpu() - c0}%7.1f jitMs=${jitBean.getTotalCompilationTime - j0}%8d rows=$n")
      stageCpu.forEach((sid, v) =>
        println(f"[chain]    stage $sid%4d cpuMs=${v._1}%9d runMs=${v._2}%9d tasks=${v._3}%4d"))
    }
    for (r <- 1 to 5)
      noop(s"distinct r$r")(TextSim.shingleTids(spark, sfDir).distinct())
    spark.stop()
  }
}
