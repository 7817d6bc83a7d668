package graft

import org.apache.spark.sql.functions._

/** Semantic pins for the Curation catalog and the round's other new rows —
  * invariants an oracle hash-diff can't localize.
  */
class CurationSpec extends SparkSpec {

  private def q(name: String) =
    SparkEntry.queries(name)(spark, sf)

  test("join_bloom_filter: no false negatives, filter actually prunes") {
    val r = q("join_bloom_filter").collect()(0)
    val nBuild = r.getAs[Long]("n_build_keys")
    val nProbe = r.getAs[Long]("n_probe")
    val nPass = r.getAs[Long]("n_bloom_pass")
    val nExact = r.getAs[Long]("n_exact")
    val nFp = r.getAs[Long]("n_false_pos")
    assert(nExact <= nPass, "a Bloom filter can never miss a real key")
    assert(nFp == nPass - nExact && nFp >= 0)
    assert(nPass <= nProbe)
    assert(nBuild > 0 && nExact == nBuild,
      "every build custkey exists in customer (FK) so exact == build keys")
  }

  test("dedup_semantic: members partition into dups + kept, per cluster") {
    val bad = q("dedup_semantic")
      .where(col("n_members") =!= col("n_dup") + col("n_kept")
        || col("n_dup") < 0 || col("n_kept") < 1).count()
    assert(bad == 0, "every cluster keeps >= 1 member and counts must add up")
  }

  test("text_edit_distance: distance bounded by the longer prefix, sim <= 1") {
    val bad = q("text_edit_distance")
      .where(col("lev") < 0 || col("lev") > greatest(col("la"), col("lb"))
        || col("sim") > 1.0).count()
    assert(bad == 0)
  }

  test("text_bleu: precisions and BLEU in [0,1], BLEU <= brevity-capped p1") {
    val rows = q("text_bleu").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val p1 = r.getAs[Double]("p1"); val p2 = r.getAs[Double]("p2")
      val b = r.getAs[Double]("bleu2")
      assert(p1 >= 0 && p1 <= 1 && p2 >= 0 && p2 <= 1)
      assert(b >= 0 && b <= 1)
      // the geometric mean of (p1, p2) is <= max(p1, p2); bp <= 1
      assert(b <= math.max(p1, p2) + 1e-9)
    }
  }

  test("text_rouge_n: recalls in [0,1] and rouge1 >= rouge2 - tolerance holds on fixture") {
    val bad = q("text_rouge_n")
      .where(col("rouge1") < 0 || col("rouge1") > 1
        || col("rouge2") < 0 || col("rouge2") > 1).count()
    assert(bad == 0)
  }

  test("text_dedup_curve: yield is monotone non-increasing in the threshold") {
    val rows = q("text_dedup_curve").orderBy("t").collect()
    val pairs = rows.map(_.getAs[Long]("n_pairs"))
    assert(pairs.zip(pairs.drop(1)).forall { case (a, b) => a >= b },
      s"pair counts ${pairs.mkString(",")} must not increase with the threshold")
  }

  test("multimodal_dedup: payloads = distinct + removable") {
    val r = q("multimodal_dedup").collect()(0)
    assert(r.getAs[Long]("n_payloads") ==
      r.getAs[Long]("n_distinct") + r.getAs[Long]("n_removable"))
    assert(r.getAs[Long]("n_dup_groups") <= r.getAs[Long]("n_removable") ||
      r.getAs[Long]("n_dup_groups") == 0)
  }

  test("ml_matthews_corrcoef: confusion covers the EVAL_N sample, mcc in [-1,1]") {
    val r = q("ml_matthews_corrcoef").collect()(0)
    val total = r.getAs[Long]("tp") + r.getAs[Long]("fp") +
      r.getAs[Long]("fn") + r.getAs[Long]("tn")
    assert(total > 0 && total <= 200, "bounded by EVAL_N")
    val mcc = r.getAs[Double]("mcc")
    assert(mcc >= -1.0 && mcc <= 1.0)
    val ba = r.getAs[Double]("bal_acc")
    assert(ba >= 0.0 && ba <= 1.0)
  }

  test("ml_fowlkes_mallows: FMI in (0,1]") {
    val v = q("ml_fowlkes_mallows").collect()(0).getAs[Double]("fmi")
    assert(v > 0 && v <= 1.0)
  }

  test("ml_calinski_harabasz: scatters positive and CH consistent with them") {
    val r = q("ml_calinski_harabasz").collect()(0)
    val n = r.getAs[Long]("n"); val k = r.getAs[Long]("k")
    val bss = r.getAs[Double]("bss")
    val wss = r.getAs[Double]("wss")
    val ch = r.getAs[Double]("ch")
    assert(bss > 0 && wss > 0 && k > 1 && n > k)
    val expect = (bss / (k - 1)) / (wss / (n - k))
    assert(math.abs(ch - expect) < 1e-4)
  }

  test("ml_davies_bouldin: radii positive, DB index equals the mean of nothing smaller than any r_max") {
    val rows = q("ml_davies_bouldin").collect()
    assert(rows.nonEmpty)
    val db = rows.head.getAs[Double]("db_index")
    rows.foreach { r =>
      assert(r.getAs[Double]("radius") > 0)
      assert(r.getAs[Double]("r_max") > 0)
      assert(db > 0)
    }
  }

  test("ml_gmm_predict: components partition lineitem") {
    val rows = q("ml_gmm_predict").collect()
    val total = Tables.lineitem(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n")).sum == total)
    rows.foreach { r =>
      val mp = r.getAs[Double]("mean_post")
      assert(mp >= 0.0 && mp <= 1.0)
    }
  }

  test("ml_spectral_cluster: two non-empty clusters") {
    val rows = q("ml_spectral_cluster").collect()
    assert(rows.length == 2)
    assert(rows.forall(_.getAs[Long]("n") > 0))
  }

  test("ml_tweedie_glm: positive mean at x=0, distinct from the Poisson fit") {
    val tw = q("ml_tweedie_glm").collect()(0)
    assert(tw.getAs[Double]("mu_at_zero") > 0)
    val po = q("ml_poisson_glm").collect()(0)
    // same data, different variance function: the fits agree in sign but
    // not bit-for-bit (both model E[quantity|discount])
    assert(tw.getAs[Double]("intercept") > 0 && po.getAs[Double]("intercept") > 0)
  }

  test("ml_quality_classifier: accuracy beats coin flip floor and is a valid rate") {
    val r = q("ml_quality_classifier").collect()(0)
    val acc = r.getAs[Double]("train_acc")
    assert(acc > 0.0 && acc <= 1.0)
    assert(r.getAs[Long]("n") == Tables.documents(spark, sf).count())
  }

  test("ml_als_round: factorization reconstructs better than the zero model") {
    val r = q("ml_als_round").collect()(0)
    val rmse = r.getAs[Double]("rmse")
    assert(rmse >= 0)
    // zero-model RMSE = sqrt(mean r^2) over the same cells
    val cells = Tables.events(spark, sf)
      .groupBy("user_id", "event_type").agg(count(lit(1)).as("r"))
    val z = cells.agg(sqrt(avg(col("r") * col("r")))).collect()(0).getDouble(0)
    assert(rmse < z, s"ALS rmse $rmse must beat the zero model $z")
  }

  test("graph_bfs: histogram covers only hops -1..3 and counts the pair-graph vertices") {
    val rows = q("graph_bfs").collect()
    val dists = rows.map(_.getAs[Int]("dist")).toSet
    assert(dists.subsetOf(Set(-1, 0, 1, 2, 3)))
    val total = rows.map(_.getAs[Long]("n_vertices")).sum
    assert(total > 0)
  }

  test("graph_modularity and graph_assortativity land in their defined ranges") {
    val q1 = q("graph_modularity").collect()(0)
    val m = q1.getAs[Double]("modularity")
    assert(m >= -1.0 && m <= 1.0)
    val q2 = q("graph_assortativity").collect()(0)
    val a = q2.getAs[Double]("assortativity")
    assert(a >= -1.0 && a <= 1.0)
  }

  test("stream_topk_hitters: ranks 1..3, counts non-increasing within a window") {
    val rows = q("stream_topk_hitters").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => { val k = r.getAs[Int]("rk"); k >= 1 && k <= 3 }))
    rows.groupBy(_.getAs[Long]("win_start_us")).foreach { case (_, ws) =>
      val byRank = ws.sortBy(_.getAs[Int]("rk")).map(_.getAs[Long]("n"))
      assert(byRank.zip(byRank.drop(1)).forall { case (a, b) => a >= b })
    }
  }

  test("ml_kmeans_weighted: weight mass >= member count (weights are >= 1)") {
    val rows = q("ml_kmeans_weighted").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("wsum") >= r.getAs[Long]("n").toDouble)
    }
  }

  test("ml_forecast_backtest: 3 folds, abs_err consistent with its operands") {
    val rows = q("ml_forecast_backtest").collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      val e = r.getAs[Double]("abs_err")
      val want = math.abs(r.getAs[Long]("actual") - r.getAs[Double]("forecast"))
      assert(e >= 0 && math.abs(e - want) < 1e-5)
    }
  }

  test("ml_tsne_kl: P sums to ~1 and KL(P||Q) is non-negative") {
    val r = q("ml_tsne_kl").collect()(0)
    assert(math.abs(r.getAs[Double]("p_sum") - 1.0) < 1e-3)
    // Gibbs' inequality: KL >= 0 for distributions; Q here is a proper
    // distribution over the SAME directed-pair support as P, so the
    // inequality must hold up to the REAL-collapse rounding of ln.
    assert(r.getAs[Double]("kl") >= -1e-6)
  }

  test("ml_dtw_distance: non-negative and bounded by the diagonal (L1) alignment") {
    val r = q("ml_dtw_distance").collect()(0)
    val dtw = r.getAs[Double]("dtw"); val n = r.getAs[Long]("n_days")
    assert(dtw >= 0 && n > 0)
    // The diagonal path (i,i) is an admissible warping path, so
    // DTW <= Σ_i |x_i - y_i|. Re-derive the capped series here.
    val l1 = Tables.events(spark, sf)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("xa"),
           sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("xb"))
      .orderBy("day").limit(n.toInt)
      .selectExpr("abs(CAST(xa AS DOUBLE) - CAST(xb AS DOUBLE)) AS d")
      .agg(sum(col("d"))).collect()(0).getDouble(0)
    assert(dtw <= l1 + 1e-6, s"dtw=$dtw must be <= diagonal L1=$l1")
  }

  test("ml_ewma_control: limits symmetric around the center, widening in t") {
    val rows = q("ml_ewma_control").collect()
    assert(rows.nonEmpty)
    // ucl - lcl = 2 * 3 sigma hw(t), and hw(t) is strictly increasing
    val widths = rows.map(r => r.getAs[Double]("ucl") - r.getAs[Double]("lcl"))
    assert(widths.forall(_ > 0))
    assert(widths.zip(widths.drop(1)).forall { case (a, b) => a <= b + 1e-9 })
    // the EWMA statistic stays finite and the flag matches the bounds
    rows.foreach { r =>
      val z = r.getAs[Double]("ewma")
      val out = r.getAs[Int]("out_of_control")
      val in = z <= r.getAs[Double]("ucl") + 1e-9 && z >= r.getAs[Double]("lcl") - 1e-9
      assert(out == (if (in) 0 else 1))
    }
  }

  test("ml_friedman_test: chi2 non-negative and bounded by the rank extreme") {
    val r = q("ml_friedman_test").collect()(0)
    val n = r.getAs[Long]("n"); val k = r.getAs[Int]("k")
    val f = r.getAs[Double]("friedman_chi2")
    assert(f >= -1e-6)
    // perfect ordering every day gives the maximum n(k-1) statistic
    assert(f <= n * (k - 1) + 1e-6)
  }

  test("ml_hurst_exponent: H in (0, 1] for a real series, R/S positive") {
    val r = q("ml_hurst_exponent").collect()(0)
    Seq("rs_5", "rs_10", "rs_15").foreach(c =>
      assert(r.getAs[Double](c) > 0))
    val h = r.getAs[Double]("hurst")
    assert(h > -0.5 && h < 1.5, s"R/S Hurst estimate wildly out of range: $h")
  }

  test("text_ttr: ratios in (0,1], every source present") {
    val rows = q("text_ttr").collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      val t = r.getAs[Double]("avg_ttr")
      assert(t > 0 && t <= 1.0 + 1e-9)
      assert(r.getAs[Double]("avg_root_ttr") > 0)
    }
  }

  test("graph_pagerank_personalized: only non-seeds emitted, ranks descending") {
    val rows = q("graph_pagerank_personalized").collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Long]("v") % 10 != 0))
    val ps = rows.map(_.getAs[Double]("ppr"))
    assert(ps.zip(ps.drop(1)).forall { case (a, b) => a >= b - 1e-12 })
  }

  test("ml_lift_table: deciles partition the corpus, rates average to base") {
    val rows = q("ml_lift_table").collect()
    assert(rows.length == 10)
    val n = rows.map(_.getAs[Long]("n_rows")).sum
    val pos = rows.map(_.getAs[Long]("n_pos")).sum
    assert(n > 0 && pos > 0 && pos <= n)
    // Σ decile_rate * decile_n = total positives; lift weighted-avgs to 1
    val wl = rows.map(r =>
      r.getAs[Double]("lift") * r.getAs[Long]("n_rows")).sum / n
    assert(math.abs(wl - 1.0) < 1e-3)
  }

  test("text_char_entropy: entropies bounded by ln(alphabet), lengths positive") {
    val rows = q("text_char_entropy").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val h = r.getAs[Double]("avg_entropy")
      assert(h >= -1e-9 && h < 6.0, "char entropy can't exceed ln(|alphabet|)")
      assert(r.getAs[Double]("avg_len") > 0)
    }
  }

  test("ml_ransac: exactly one winner with the max consensus") {
    val rows = q("ml_ransac").collect()
    assert(rows.nonEmpty)
    assert(rows.count(_.getAs[Int]("is_best") == 1) == 1)
    val maxIn = rows.map(_.getAs[Long]("n_inliers")).max
    val best = rows.find(_.getAs[Int]("is_best") == 1).get
    assert(best.getAs[Long]("n_inliers") == maxIn)
    rows.foreach { r =>
      val f = r.getAs[Double]("inlier_frac")
      assert(f >= 0 && f <= 1)
    }
  }

  test("ml_cuped: adjusted means shift, variance reduction in [0,1)") {
    val rows = q("ml_cuped").collect()
    assert(rows.length == 2)
    rows.foreach { r =>
      val vr = r.getAs[Double]("variance_reduction")
      assert(vr >= 0 && vr < 1.0, s"rho^2 must be in [0,1), got $vr")
      assert(r.getAs[Long]("n") > 0)
    }
  }

  test("ml_theil_sen: robust slope lies within the pairwise-slope range") {
    val r = q("ml_theil_sen").collect()(0)
    assert(r.getAs[Long]("n_pairs") > 0)
    val ts = r.getAs[Double]("theil_sen_slope")
    assert(!ts.isNaN && !r.getAs[Double]("ols_slope").isNaN)
  }

  test("ml_mann_kendall: S bounded by pair count, Z sign matches S") {
    val r = q("ml_mann_kendall").collect()(0)
    val n = r.getAs[Long]("n"); val s = r.getAs[Long]("s")
    assert(math.abs(s) <= n * (n - 1) / 2)
    val z = r.getAs[Double]("z")
    assert(s.sign == 0 && z == 0.0 || s.sign == math.signum(z).toLong
      || z == 0.0)
  }

  test("ml_conformal_interval: calibration coverage >= 90% by construction") {
    val r = q("ml_conformal_interval").collect()(0)
    val nc = r.getAs[Long]("n_cal"); val k = r.getAs[Long]("k")
    assert(nc > 0 && k >= 1 && k <= nc)
    assert(r.getAs[Double]("coverage_cal") >= 0.9 - 1e-9,
      "the k-th smallest score covers >= k/n_cal >= 0.9 of calibration")
    assert(math.abs(r.getAs[Double]("interval_width") -
      2 * r.getAs[Double]("qhat")) < 1e-5)
  }

  test("ml_doubly_robust: AIPW components internally consistent") {
    val r = q("ml_doubly_robust").collect()(0)
    val mt = r.getAs[Double]("mean_treated_dr")
    val mc = r.getAs[Double]("mean_control_dr")
    val ate = r.getAs[Double]("ate_aipw")
    assert(!mt.isNaN && !mc.isNaN)
    assert(math.abs(ate - (mt - mc)) < 1e-5)
    assert(r.getAs[Long]("n") > 0)
  }

  test("ml_propensity_ipw: weighted means finite, n positive") {
    val r = q("ml_propensity_ipw").collect()(0)
    assert(r.getAs[Long]("n") > 0)
    val mt = r.getAs[Double]("mean_treated_ipw")
    val mc = r.getAs[Double]("mean_control_ipw")
    val ate = r.getAs[Double]("ate_ipw")
    assert(!mt.isNaN && !mc.isNaN)
    assert(math.abs(ate - (mt - mc)) < 1e-5)
  }

  test("ml_seasonal_strength: both strengths in [0,1], full-window rows only") {
    val r = q("ml_seasonal_strength").collect()(0)
    val ft = r.getAs[Double]("f_trend"); val fs = r.getAs[Double]("f_seasonal")
    assert(ft >= 0 && ft <= 1.0 + 1e-9)
    assert(fs >= 0 && fs <= 1.0 + 1e-9)
    // 30 fixture days - 6 window-edge days
    assert(r.getAs[Long]("n_full") >= 1)
  }

  test("ml_frequent_itemsets: pair support bounded by either item's support") {
    val rows = q("ml_frequent_itemsets").collect()
    val singles = rows.filter(_.getAs[Int]("size") == 1)
      .map(r => r.getAs[String]("itemset") -> r.getAs[Long]("n_baskets")).toMap
    val pairs = rows.filter(_.getAs[Int]("size") == 2)
    assert(singles.size == 5 && pairs.length == 10)
    pairs.foreach { r =>
      val Array(a, b) = r.getAs[String]("itemset").split('+')
      val nab = r.getAs[Long]("n_baskets")
      assert(nab <= math.min(singles(a), singles(b)),
        "monotonicity: supp(ab) <= min(supp(a), supp(b))")
    }
    rows.foreach(r => assert(r.getAs[Double]("support") > 0
      && r.getAs[Double]("support") <= 1))
  }

  test("ml_assoc_rules: confidence in (0,1], lift consistent both directions") {
    val rows = q("ml_assoc_rules").collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      val c = r.getAs[Double]("confidence")
      assert(c > 0 && c <= 1.0 + 1e-9)
      assert(r.getAs[Double]("lift") > 0)
    }
    // lift is symmetric: lift(a->b) == lift(b->a) up to rounding
    val lifts = rows.map(r => (r.getAs[String]("ante"),
      r.getAs[String]("cons")) -> r.getAs[Double]("lift")).toMap
    lifts.foreach { case ((a, b), l) =>
      assert(math.abs(l - lifts((b, a))) < 1e-5) }
  }

  test("ml_knn_k_sweep: three k rows, same eval set, k=5 matches the shared wire") {
    val rows = q("ml_knn_k_sweep").collect()
    assert(rows.map(_.getAs[Int]("k")).toSeq == Seq(1, 3, 5))
    val ns = rows.map(_.getAs[Long]("n_eval")).distinct
    assert(ns.length == 1, "every k scores the identical evaluation sample")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_correct") <= r.getAs[Long]("n_eval"))
      val a = r.getAs[Double]("accuracy")
      assert(a >= 0 && a <= 1)
    }
    // k=5 prefix vote must reproduce ml_accuracy_score's shared wire
    val acc5 = rows.find(_.getAs[Int]("k") == 5).get.getAs[Double]("accuracy")
    val shared = q("ml_accuracy_score").collect()(0).getAs[Double]("accuracy")
    assert(math.abs(acc5 - shared) < 1e-9,
      s"k=5 sweep accuracy $acc5 != shared-wire accuracy $shared")
  }

  test("ml_mcnemar: discordant counts bounded by n, stat consistent") {
    val r = q("ml_mcnemar").collect()(0)
    val n = r.getAs[Long]("n"); val b = r.getAs[Long]("b")
    val c = r.getAs[Long]("c")
    assert(b >= 0 && c >= 0 && b + c <= n)
    val st = r.getAs[Double]("mcnemar")
    if (b + c == 0) assert(st == 0.0)
    else assert(math.abs(st -
      math.pow(math.abs(b.toDouble - c) - 1, 2) / (b + c)) < 1e-5)
  }

  test("ml_hopkins: H in [0,1] with both sample sets non-empty") {
    val r = q("ml_hopkins").collect()(0)
    assert(r.getAs[Long]("m_probes") == 20)
    assert(r.getAs[Long]("m_samples") >= 1)
    val h = r.getAs[Double]("hopkins")
    assert(h >= 0 && h <= 1.0 + 1e-9)
  }

  test("ml_kmeans_knee: exactly one knee, flagged at the max diff") {
    val rows = q("ml_kmeans_knee").collect()
    assert(rows.length == 5)
    assert(rows.count(_.getAs[Int]("is_knee") == 1) == 1)
    val maxDiff = rows.map(_.getAs[Double]("kneedle_diff")).max
    val knee = rows.find(_.getAs[Int]("is_knee") == 1).get
    assert(math.abs(knee.getAs[Double]("kneedle_diff") - maxDiff) < 1e-9)
  }

  test("ml_cramers_v: V in [0,1] and consistent with its chi2") {
    val r = q("ml_cramers_v").collect()(0)
    val v = r.getAs[Double]("cramers_v"); val chi2 = r.getAs[Double]("chi2")
    val n = r.getAs[Long]("n"); val md = r.getAs[Int]("min_dim")
    assert(v >= 0 && v <= 1.0 + 1e-9)
    assert(math.abs(v * v * n * md - chi2) < 1e-2 * math.max(chi2, 1.0))
  }

  test("ml_bartlett: statistic non-negative, correction factor > 1") {
    val r = q("ml_bartlett").collect()(0)
    assert(r.getAs[Double]("bartlett") >= -1e-6)
    assert(r.getAs[Double]("correction") > 1.0)
  }

  test("ml_kendall_tau: |tau| <= 1 and C + D <= n0") {
    val r = q("ml_kendall_tau").collect()(0)
    val c = r.getAs[Long]("concordant"); val d = r.getAs[Long]("discordant")
    val n0 = r.getAs[Long]("n0")
    assert(c >= 0 && d >= 0 && c + d <= n0)
    val t = r.getAs[Double]("tau_b")
    assert(t >= -1.0 - 1e-9 && t <= 1.0 + 1e-9)
  }

  test("agg_weighted_median: integral quantity in domain, positive mass") {
    val r = q("agg_weighted_median").collect()(0)
    val m = r.getAs[Double]("weighted_median")
    assert(m >= 1.0 && m <= 50.0 && m == math.floor(m),
      "l_quantity domain is integral 1..50")
    assert(r.getAs[Double]("total_weight") > 0)
  }

  test("ml_pacf: lag-1 PACF equals lag-1 ACF, all values in [-1, 1]") {
    val pacf = q("ml_pacf").collect()
      .map(r => r.getAs[Long]("lag") -> r.getAs[Double]("pacf")).toMap
    assert(pacf.size == 3)
    pacf.values.foreach(v => assert(v >= -1.0 - 1e-6 && v <= 1.0 + 1e-6))
    // Durbin-Levinson base case: phi_11 = rho_1 — cross-query pin vs ml_acf
    val acf1 = q("ml_acf").collect()
      .find(_.getAs[Long]("lag") == 1).get.getAs[Double]("acf")
    assert(math.abs(pacf(1L) - acf1) < 1e-6)
  }

  test("ml_granger_f: restricted SSR >= unrestricted, F >= 0") {
    val r = q("ml_granger_f").collect()(0)
    val u = r.getAs[Double]("ssr_unrestricted")
    val rr = r.getAs[Double]("ssr_restricted")
    assert(u >= 0 && rr >= u - 1e-6,
      "adding a regressor can never increase the training SSR")
    assert(r.getAs[Double]("f_stat") >= -1e-9)
  }

  test("ml_kmeans_minibatch: eta is the streaming-count schedule, 10 centers") {
    val rows = q("ml_kmeans_minibatch").collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      val nb = r.getAs[Long]("nb"); val eta = r.getAs[Double]("eta")
      assert(nb >= 1)
      assert(math.abs(eta - nb.toDouble / (nb + 100.0)) < 1e-6)
      assert(eta > 0 && eta < 1)
    }
  }

  test("text_js_divergence: bounded by ln 2, norm in [0, 1]") {
    val r = q("text_js_divergence").collect()(0)
    val j = r.getAs[Double]("jsd"); val jn = r.getAs[Double]("jsd_norm")
    assert(j >= -1e-9 && j <= math.log(2.0) + 1e-6)
    assert(jn >= -1e-9 && jn <= 1.0 + 1e-6)
    assert(math.abs(jn - j / math.log(2.0)) < 1e-5)
  }

  test("ml_isolation_forest: scores in (0,1), inverse-monotone in path length") {
    val rows = q("ml_isolation_forest").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val sc = r.getAs[Double]("iforest"); val pl = r.getAs[Double]("path_len")
      assert(sc > 0 && sc < 1, s"score $sc out of (0,1)")
      assert(pl >= 3.0 - 1e-9, "every point descends all 3 levels")
    }
    // s = 2^(-E[h]/c(n)) is strictly decreasing in E[h]: the top-20
    // (sorted by score desc) must be sorted by path_len asc.
    val pls = rows.map(_.getAs[Double]("path_len"))
    assert(pls.zip(pls.drop(1)).forall { case (a, b) => a <= b + 1e-9 })
  }

  test("graph_harmonic_centrality: probes in the seed class, harmonic consistent") {
    val rows = q("graph_harmonic_centrality").collect()
    assert(rows.nonEmpty && rows.length <= 3)
    rows.foreach { r =>
      assert(r.getAs[Long]("seed") % 10 == 0)
      val n1 = r.getAs[Long]("n1"); val n2 = r.getAs[Long]("n2")
      val n3 = r.getAs[Long]("n3")
      val h = r.getAs[Double]("harmonic")
      assert(math.abs(h - (n1 + n2 / 2.0 + n3 / 3.0)) < 1e-6)
      assert(h <= n1 + n2 + n3)
    }
  }

  test("ml_hdbscan_membership: memberships are probabilities, entropy bounded by ln k") {
    val rows = q("ml_hdbscan_membership").collect()
    assert(rows.nonEmpty)
    val k = rows.map(_.getAs[Long]("flat")).distinct.length
    rows.foreach { r =>
      val m = r.getAs[Double]("m_top"); val ent = r.getAs[Double]("entropy")
      assert(m > 0 && m <= 1.0 + 1e-9)
      assert(m >= 1.0 / k - 1e-9, "argmax membership can't be below uniform")
      assert(ent >= -1e-6 && ent <= math.log(k.toDouble) + 1e-6)
    }
  }
}
