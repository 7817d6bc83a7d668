package graft

import org.apache.spark.sql.functions._

/** Semantic pins for the r10-cont estimator/graph/text additions. */
class EstimatorSpec extends SparkSpec {

  private def q(name: String) =
    SparkEntry.queries(name)(spark, sf)

  test("ml_quantile_regression: q=0.9 intercept trail climbs strictly above OLS") {
    val t = q("ml_quantile_regression").collect().sortBy(_.getAs[Int]("round"))
    assert(t.length == 4)
    val icpts = t.map(_.getAs[Double]("intercept"))
    for (k <- 1 until icpts.length)
      assert(icpts(k) > icpts(k - 1),
        s"round $k intercept ${icpts(k)} must exceed round ${k - 1}'s ${icpts(k - 1)}" +
          " — the q=0.9 line climbs above the mean line")
  }

  test("ml_gamma_glm: null-model warm start, slope stabilizes across IRLS steps") {
    val t = q("ml_gamma_glm").collect().sortBy(_.getAs[Int]("round"))
    assert(t.length == 3)
    assert(t(0).getAs[Double]("slope") == 0.0, "round 0 is the null model")
    val mu0 = t(0).getAs[Double]("mu_at_zero")
    assert(mu0 > 0, "gamma mean must be positive")
    // IRLS contraction: step 2 moves the slope less than step 1 did
    val d1 = math.abs(t(1).getAs[Double]("slope") - t(0).getAs[Double]("slope"))
    val d2 = math.abs(t(2).getAs[Double]("slope") - t(1).getAs[Double]("slope"))
    assert(d2 <= d1, s"slope step sizes must contract: |Δ2|=$d2 > |Δ1|=$d1")
  }

  test("graph_label_prop: communities PARTITION the point set") {
    val hist = q("graph_label_prop").collect()
    val covered = hist.map(r => r.getAs[Long]("size") * r.getAs[Long]("n_communities")).sum
    val total = Tables.embeddings(spark, sf).count()
    assert(covered == total,
      s"community sizes cover $covered of $total points — must partition exactly")
    assert(hist.exists(r => r.getAs[Long]("size") > 1),
      "propagation must merge at least one neighborhood")
  }

  test("text_vocab_growth: cumulative vocab is the running sum and matches the bigram count") {
    val rows = q("text_vocab_growth").collect()
    var running = 0L
    for (r <- rows) {
      running += r.getAs[Long]("new_bigrams")
      assert(r.getAs[Long]("cum_vocab") == running, "cum_vocab must telescope")
    }
    val distinctBigrams = Tables.documents(spark, sf)
      .select(col("doc_id"), posexplode(split(col("text"), " ")))
      .where(col("col") =!= "")
      .select(col("doc_id"), col("pos"), col("col").as("t"))
      .as("a")
      .join(
        Tables.documents(spark, sf)
          .select(col("doc_id"), posexplode(split(col("text"), " ")))
          .where(col("col") =!= "")
          .select(col("doc_id"), (col("pos") - 1).as("pos"), col("col").as("t2"))
          .as("b"),
        Seq("doc_id", "pos"))
      .select(concat(col("t"), lit(" "), col("t2"))).distinct().count()
    assert(running == distinctBigrams,
      s"final cum_vocab $running must equal the distinct bigram count $distinctBigrams")
  }

  test("ml_cox_ph and ml_gamma_glm trails are finite (no exp overflow on the wire)") {
    for (name <- Seq("ml_cox_ph", "ml_gamma_glm")) {
      val rows = q(name).collect()
      for (r <- rows; i <- 0 until r.length if r.get(i).isInstanceOf[Double]) {
        val v = r.getDouble(i)
        assert(!v.isNaN && !v.isInfinite, s"$name column $i is $v")
      }
    }
  }
}
