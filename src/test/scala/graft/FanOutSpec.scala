package graft

import org.apache.spark.sql.functions._

/** Pins the r15 optimization internals: the data-sized fanOut width and
  * the session-pinned lineitem fit frame (OPTIMIZATION_r15.md #2/#3).
  * These helpers sit under ~200 call sites, so a silent width or value
  * drift would move the whole registry at once — the specs make both
  * contracts explicit. */
class FanOutSpec extends SparkSpec {

  test("fanOut width: a tiny table fans to the session shuffle width, not parallelism") {
    // sf0.001 lineitem is far under one scan split, so the pre-r15 width
    // would have been defaultParallelism (8 here — masked by shuffle
    // partitions also being 8), and at 32 cores it measured 32 near-empty
    // partitions whose per-task fixed cost dominated (62 -> 17.7 CPU-s on
    // the kmeans loop). The contract: width = min(parallelism,
    // spark.sql.shuffle.partitions) when the data justifies fewer tasks.
    val df = Tables.lineitem(spark, sf).select(col("l_quantity"))
    val fanned = Tables.fanOut(df)
    val expected = math.min(
      spark.sparkContext.defaultParallelism,
      spark.sessionState.conf.numShufflePartitions)
    assert(fanned.rdd.getNumPartitions === expected)
  }

  test("fanOut width: data large relative to maxPartitionBytes passes through unrepartitioned") {
    // shrink maxPartitionBytes so the fixture's plan statistics estimate
    // >= parallelism scan tasks — fanOut must then be a no-op (the 100 TB
    // behavior, where the scan's own partitioning flows through)
    val prev = spark.conf.getOption("spark.sql.files.maxPartitionBytes")
    try {
      spark.conf.set("spark.sql.files.maxPartitionBytes", "1024")
      val df = Tables.lineitem(spark, sf).select(col("l_quantity"))
      val fanned = Tables.fanOut(df)
      // no-op = same logical plan object chain, no Repartition node
      assert(!fanned.queryExecution.optimizedPlan.toString.contains("Repartition"),
        "fanOut must not repartition data that already feeds enough tasks")
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.files.maxPartitionBytes", v)
        case None => spark.conf.unset("spark.sql.files.maxPartitionBytes")
      }
    }
  }

  test("lineitemFit: projections from the pinned frame equal direct projections") {
    // the IRLS/GLM/forest families project (x, y) off the pinned frame;
    // the values (not the partitioning) must be exactly the direct scan's
    val direct = Tables.lineitem(spark, sf)
      .select(col("l_quantity").cast("double").as("x"),
        col("l_extendedprice").cast("double").as("y"))
    val pinned = Tables.lineitemFit(spark, sf)
      .select(col("l_quantity").cast("double").as("x"),
        col("l_extendedprice").cast("double").as("y"))
    assert(pinned.count() === direct.count())
    assert(pinned.exceptAll(direct).isEmpty && direct.exceptAll(pinned).isEmpty)
    // and the exact-wire moments — what every fit consumes — are bit-equal
    def moments(df: org.apache.spark.sql.DataFrame) =
      df.agg(Tables.xsum(col("x")), Tables.xsum(col("y")),
        Tables.xsum(col("x") * col("y"))).collect()(0)
    assert(moments(pinned) === moments(direct))
  }
}
