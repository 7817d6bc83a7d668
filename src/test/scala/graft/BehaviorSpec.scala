package graft

import org.apache.spark.sql.functions._

/** Semantic pins for the Behavior catalog (event-series analytics). */
class BehaviorSpec extends SparkSpec {

  test("win_sessionize: sessions PARTITION the event stream") {
    val sess = ops.Behavior.entries.find(_.name == "win_sessionize").get
      .fn(spark, sf)
    val total = Tables.events(spark, sf).count()
    val r = sess.agg(
      sum(col("n_events")).as("ev"),
      min(col("session_seq")).as("minSeq"),
      sum(when(col("duration_us") < 0, 1).otherwise(0)).as("negDur"))
      .collect()(0)
    assert(r.getLong(0) == total, "every event must land in exactly one session")
    assert(r.getLong(1) == 1L, "session ids are 1-based per user")
    assert(r.getLong(2) == 0L, "durations are non-negative")
    // per-user session ids are CONSECUTIVE 1..k (the running-break-count
    // construction can't skip): max(seq) == count(distinct seq) per user
    val gaps = sess.groupBy("user_id")
      .agg(max("session_seq").as("mx"), countDistinct("session_seq").as("k"))
      .where(col("mx") =!= col("k")).count()
    assert(gaps == 0, "session ids must be consecutive per user")
  }

  test("ml_changepoint_cusum: C_n returns to ~0 and exactly one argmax day flagged") {
    val df = ops.Behavior.entries.find(_.name == "ml_changepoint_cusum").get
      .fn(spark, sf).collect()
    assert(df.nonEmpty)
    val last = df.last.getAs[Double]("cusum")
    assert(math.abs(last) < 1e-5, s"C_n = $last must telescope to ~0")
    val flagged = df.count(_.getAs[Int]("is_changepoint") == 1)
    // bit-identical doubles: the max is attained at least once; ties are
    // theoretically possible but not present in the fixture
    assert(flagged == 1, s"expected exactly 1 changepoint, got $flagged")
    val mx = df.map(r => math.abs(r.getAs[Double]("cusum"))).max
    val flaggedVal = math.abs(
      df.find(_.getAs[Int]("is_changepoint") == 1).get.getAs[Double]("cusum"))
    assert(flaggedVal == mx, "flagged day must carry the max |CUSUM|")
  }

  test("ml_acf: 7 lags, every autocorrelation in [-1, 1]") {
    val rows = ops.Behavior.entries.find(_.name == "ml_acf").get
      .fn(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("lag")).toSeq == (1L to 7L),
      "lags 1..7 exactly once each")
    for (r <- rows) {
      val a = r.getAs[Double]("acf")
      assert(math.abs(a) <= 1.000001, s"lag ${r.getAs[Long]("lag")}: |acf| = $a > 1")
    }
    // n_pairs shrinks by exactly 1 per lag (contiguous daily series)
    val m = rows.map(r => r.getAs[Long]("lag") -> r.getAs[Long]("n_pairs")).toMap
    for (l <- 2L to 7L) assert(m(l) == m(l - 1) - 1)
  }

  test("ml_cox_ph: one-row fit, hazard ratio consistent with beta") {
    val r = ops.Behavior.entries.find(_.name == "ml_cox_ph").get
      .fn(spark, sf).collect()
    assert(r.length == 1)
    val b2 = r(0).getAs[Double]("beta_step2")
    val hr = r(0).getAs[Double]("hazard_ratio")
    assert(!b2.isNaN && !b2.isInfinite, "Newton step must stay finite")
    // hazard_ratio is REAL-collapsed exp(beta2) rounded at 6dp — re-derive
    // from the ROUNDED beta2 only approximately (1e-4 slack for the 6dp
    // round on beta2 itself)
    assert(math.abs(hr - math.exp(b2)) < 1e-4,
      s"hazard_ratio $hr vs exp(beta2) ${math.exp(b2)}")
  }
}
