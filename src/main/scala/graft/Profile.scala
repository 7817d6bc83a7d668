package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Perf-triage main: runs the named queries (args) `SPARK_GRAFT_REPS` times
  * each in one warmed session and prints wall + process-CPU + task metrics
  * per rep — the cold−warm gap is one-shot driver work (analysis + Janino
  * codegen), the warm floor is real execution, and the CPU column tells
  * compute apart from under-parallelized wall. Session config mirrors Bench
  * (r15: shuffle parts 8, AQE off, /dev/shm local dirs, FAIR) so numbers
  * are comparable with the bench artifacts. Usage:
  *   sbt "runMain graft.Profile dedup_embed_cosine sim_topk_pairs_lsh"
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder0 = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTS", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.scheduler.mode", "FAIR")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "4096")
    val spark = {
      val shm = Paths.get("/dev/shm")
      (if (Files.isDirectory(shm) && Files.isWritable(shm))
        builder0.config("spark.local.dir", "/dev/shm/graft-spark-local")
      else builder0).getOrCreate()
    }
    spark.sparkContext.setLogLevel("WARN")
    Log.quietBoundedWindowWarn()
    Log.quietFairPoolWarn()
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
      case b: com.sun.management.OperatingSystemMXBean => Some(b)
      case _ => None
    }
    def procCpu(): Double = osBean.map(_.getProcessCpuTime / 1e9).getOrElse(-1.0)
    val aTasks = new java.util.concurrent.atomic.AtomicLong
    val aCpuNs = new java.util.concurrent.atomic.AtomicLong
    val aRunMs = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = e.taskMetrics
        if (m != null) {
          aTasks.incrementAndGet(); aCpuNs.addAndGet(m.executorCpuTime)
          aRunMs.addAndGet(m.executorRunTime)
        }
      }
    })
    spark.range(1000000).selectExpr("sum(id)").collect()
    for (name <- args) {
      val fn = SparkEntry.queries(name)
      for (r <- 1 to reps) {
        val t0 = System.nanoTime(); val c0 = procCpu()
        val k0 = aTasks.get(); val tc0 = aCpuNs.get(); val tr0 = aRunMs.get()
        fn(spark, sfDir).queryExecution.toRdd.count()
        val w = (System.nanoTime() - t0) / 1e9
        println(f"[profile] $name%-28s rep$r wall=$w%7.2f cpu=${procCpu() - c0}%7.1f " +
          f"tasks=${aTasks.get() - k0}%6d taskCpu=${(aCpuNs.get() - tc0) / 1e9}%7.1f " +
          f"taskRun=${(aRunMs.get() - tr0) / 1e3}%7.1f")
      }
    }
    spark.stop()
  }
}
