package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Plan-dump main (r15 deliverable): writes `.explain("formatted")` output
  * for the named queries to <outDir>/<name>_<tag>.txt. Session config
  * mirrors Bench (shuffle parts from input size, AQE off, /dev/shm local
  * dirs) so the captured plans are the ones the bench actually executes.
  * Usage: sbt "runMain graft.Plans plans/r15 before q1 q2 ..."
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val tag = args(1)
    val names = args.drop(2)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder0 = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTS", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "false")
    val spark = {
      val shm = Paths.get("/dev/shm")
      (if (Files.isDirectory(shm) && Files.isWritable(shm))
        builder0.config("spark.local.dir", "/dev/shm/graft-spark-local")
      else builder0).getOrCreate()
    }
    spark.sparkContext.setLogLevel("WARN")
    Log.quietBoundedWindowWarn()
    new java.io.File(outDir).mkdirs()
    for (name <- names) {
      val fn = SparkEntry.queries(name)
      try {
        val df = fn(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.writeString(Paths.get(s"$outDir/${name}_$tag.txt"), txt)
        println(s"[plans] wrote $outDir/${name}_$tag.txt (${txt.length} chars)")
      } catch { case e: Throwable =>
        System.err.println(s"[plans] $name failed: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
