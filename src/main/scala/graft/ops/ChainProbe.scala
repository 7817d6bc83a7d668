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
          (m.executorCpuTime / 1000000, m.executorRunTime + m.executorDeserializeTime, 1L),
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
    import org.apache.spark.sql.functions._
    def kmeansLoop(tag: String, persist: Boolean, fan: Boolean): Unit = {
      stageCpu.clear()
      val t0 = System.nanoTime(); val c0 = cpu(); val j0 = jitBean.getTotalCompilationTime
      var e = graft.Tables.embeddings(spark, sfDir)
        .select(col("vec_id"), col("embedding"))
      if (fan) e = e.transform(T.fanOut(_, col("vec_id")))
      if (persist) e = e.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      var cent: Seq[(Long, Array[Float])] = e.where(col("vec_id") < 10)
        .select(col("vec_id"), col("embedding"))
        .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toSeq.sortBy(_._1)
      for (_ <- 1 to 10) {
        val best = least(cent.map { case (cid, emb) =>
          struct(
            graft.functions.Vec.l2Cols(spark, col("embedding"), typedLit(emb)).as("d"),
            lit(cid).as("cid"))
        }: _*)
        val next = e
          .select(col("embedding"), best.getField("cid").as("cid"))
          .groupBy("cid")
          .agg(array((1 to 64).map(i =>
            avg(element_at(col("embedding"), i).cast("double")).cast("float")): _*).as("c_emb"))
        cent = next.collect()
          .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toSeq.sortBy(_._1)
      }
      if (persist) e.unpersist(blocking = false)
      println(f"[chain] $tag%-30s wall=${(System.nanoTime() - t0) / 1e9}%7.2f cpu=${cpu() - c0}%7.1f jitMs=${jitBean.getTotalCompilationTime - j0}%8d")
      var tot = 0L; var totR = 0L; var totN = 0L
      stageCpu.forEach((_, v) => { tot += v._1; totR += v._2; totN += v._3 })
      println(f"[chain]    total stage cpuMs=$tot%9d runPlusDeserMs=$totR%9d tasks=$totN%5d")
    }
    // per-task fixed-cost probes
    val base = spark.range(0, 3200000, 1, 32)
    for (r <- 1 to 3)
      noop(s"32 tasks sum r$r")(base.selectExpr("sum(id) AS s"))
    val wide = spark.range(0, 3200000, 1, 320)
    for (r <- 1 to 3)
      noop(s"320 tasks sum r$r")(wide.selectExpr("sum(id) AS s"))
    val d = T.lineitem(spark, sfDir)
      .select(col("l_quantity").cast("double").as("x"),
        col("l_extendedprice").cast("double").as("y"))
      .transform(T.fanOut(_))
    for (r <- 1 to 3)
      noop(s"5 xsum moments r$r")(d.agg(T.xsum(col("x")).as("sx"), T.xsum(col("y")).as("sy"),
        T.xsum(col("x") * col("x")).as("sxx"),
        T.xsum(col("x") * col("y")).as("sxy"),
        T.xsum(col("y") * col("y")).as("syy")))
    spark.stop()
  }
}
