package graft
import org.apache.spark.sql.SparkSession

/** Perf-triage main: runs the named queries (args) `SPARK_GRAFT_REPS` times
  * each in one warmed session and prints cold/warm wall per rep — the
  * cold−warm gap is one-shot driver work (analysis + Janino codegen), the
  * warm floor is real execution. Usage:
  *   sbt "runMain graft.Profile dedup_embed_cosine sim_topk_pairs_lsh"
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Log.quietBoundedWindowWarn()
    spark.range(1000000).selectExpr("sum(id)").collect()
    for (name <- args) {
      val fn = SparkEntry.queries(name)
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[profile] $name%-28s ${times.map(t => f"$t%.2f").mkString(" ")}")
    }
    spark.stop()
  }
}
