package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    // Builder-side convenience (driver always passes exactly 2 args): an
    // optional comma-separated query filter for fast targeted re-verify.
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").toSet) else None
    def keep(name: String): Boolean = only.forall(_.contains(name))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder0 = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    // tmpfs local dirs when available — the Bench r13 rationale (shuffle
    // FILE metadata ops dominate tiny stages; /tmp is ext4 here)
    val builder = {
      val shm = Paths.get("/dev/shm")
      if (Files.isDirectory(shm) && Files.isWritable(shm))
        builder0.config("spark.local.dir", "/dev/shm/graft-spark-local")
      else builder0
    }
    val spark = builder
      // FAIR across per-query pools — the Bench r7 lesson applies here
      // too: an iterative query's many 1-task jobs would otherwise queue
      // behind another worker's wide scan.
      .config("spark.scheduler.mode", "FAIR")
      // AQE off, as in Bench (r12): at sf0.01 every AQE stage
      // materialization is a separate job submission serializing on the
      // single DAG-scheduler event loop — pure overhead against the
      // driver's verify time budget. Results are AQE-invariant.
      .config("spark.sql.adaptive.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Log.quietBoundedWindowWarn()
    Log.quietFairPoolWarn()
    new java.io.File(outDir).mkdirs()
    // Small worker pool (r11): 404 sequential queries spend most of their
    // wall on one-core driver work (analysis + codegen compile) while 31
    // cores idle — the Bench pipelining argument. 4 workers keep the gate
    // ~3× faster without the contention distortion a wide pool adds (this
    // main is correctness-only; timings don't matter here). Results are
    // independent per query (distinct output dirs), so ordering is free.
    val threads = sys.env.getOrElse("SPARK_GRAFT_VERIFY_THREADS", "4").toInt
    val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
    val futures = SparkEntry.queries.filter(q => keep(q._1)).toSeq.map {
      case (name, fn) =>
        pool.submit(new Runnable {
          def run(): Unit = {
            spark.sparkContext.setLocalProperty("spark.scheduler.pool", name)
            try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
              .parquet(s"$outDir/$name")
            catch { case e: Throwable =>
              System.err.println(s"[verify] $name failed: ${e.getMessage}")
            }
          }
        })
    }
    futures.foreach(_.get())
    pool.shutdown()
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // Self-contained oracles: prepend a CTE binding each referenced table
    // to its parquet file, so the SQL runs whether or not the harness
    // creates views for bare table names (SURVEY §7.4.2 — the binding
    // behavior was unobservable in round 1). If the harness DOES bind
    // views, the CTEs harmlessly shadow them with identical data; unused
    // CTEs are free in DuckDB. Paths interpolate from the sfDir the
    // harness itself passed, so they track its scale factor.
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    val absSf = new java.io.File(sfDir).getAbsolutePath
    def selfContained(sql: String): String = {
      val used = tables.filter(t => s"\\b$t\\b".r.findFirstIn(sql).isDefined)
      if (used.isEmpty) sql
      else {
        val ctes = used.map(t =>
          s"$t AS (SELECT * FROM read_parquet('$absSf/$t.parquet'))").mkString(", ")
        val trimmed = sql.trim
        // WITH RECURSIVE must stay the clause head; table CTEs merge after
        // it (RECURSIVE marks the whole clause, non-recursive CTEs are fine)
        val recRe = "(?is)^WITH\\s+RECURSIVE\\s+".r
        recRe.findFirstIn(trimmed) match {
          case Some(m) => s"WITH RECURSIVE $ctes, ${trimmed.drop(m.length)}"
          case None =>
            if (trimmed.take(5).equalsIgnoreCase("WITH "))
              s"WITH $ctes, ${trimmed.drop(5)}"
            else s"WITH $ctes $trimmed"
        }
      }
    }
    // ALWAYS the full oracle map, filter or not (ADVICE r6): a filtered
    // re-verify into a reused outDir would otherwise truncate
    // oracle_sql.json next to stale full-run parquet, silently masking
    // every unfiltered query from a compare keyed off the JSON.
    // Oracles.materialize first (body CTEs → MATERIALIZED, VERDICT r10 #1:
    // DuckDB's exponential CTE inlining starved the driver's compare and
    // zeroed CORRECTNESS_r10), then selfContained wraps with PLAIN
    // table-binding CTEs (inlining those keeps parquet pushdown).
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(selfContained(Oracles.materialize(v)))}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
