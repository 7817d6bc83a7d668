package graft.ops

import graft.{QueryDef, Tables => T}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Regression-diagnostics catalog — the residual-analysis tests a
  * statsmodels/cuML user runs AFTER the ml_linreg_* family fits: normality
  * of residuals (Jarque–Bera), serial correlation (Durbin–Watson), and
  * heteroskedasticity (Breusch–Pagan). [R] dask-cuml itself stops at the
  * fit; these are the standard post-fit checks from the same public
  * literature (Jarque & Bera 1980; Durbin & Watson 1950; Breusch & Pagan
  * 1979) that complete the regression story next to ml_ab_ttest /
  * ml_bartlett / ml_ks_test.
  *
  * Scale shape: every query is one or two map-side-combined moment passes
  * over lineitem (or a daily aggregate of orders) — sufficient statistics
  * only, nothing quadratic, no driver-side math beyond broadcasting a
  * one-row coefficient frame back into the scoring pass (the
  * ml_linreg_multi_predict coef_-broadcast shape).
  *
  * Determinism: moment sums ride the exact decimal wire ([[T.xsum]]); the
  * closed-form coefficient and moment-expansion expressions are SHARED
  * TEXT between the Spark selectExpr chain and the DuckDB oracle, so both
  * engines execute the same IEEE double sequence on hash-equal inputs.
  */
object Diagnostics {

  /** Simple-OLS closed form (extendedprice on quantity) — the
    * ml_linreg_fit textbook expressions, re-derived here from this
    * catalog's own moments CTE so each oracle stays self-contained. */
  private val bTxt = "(n * sxy - sx * sy) / (n * sxx - sx * sx)"
  private val aTxt = s"(sy - ($bTxt) * sx) / n"

  /** Residuals are scaled ×1e-4 before powering: l_extendedprice reaches
    * ~1.05e5, so raw r⁴ would overflow the DECIMAL(30,12) exact wire's 18
    * integer digits at any SF, while skewness/kurtosis (and the aux-R² of
    * Breusch–Pagan) are scale-invariant. 1e-4 is the same (inexact) double
    * in both engines, so the multiply rounds identically. */
  private val residTxt = "(y - ((a) + (b) * q)) * 1e-4"

  /** Central-moment expansion from raw residual power sums — shared text;
    * the cancellation the expansion introduces is bounded because the
    * scaled residuals are O(10). */
  private val muTxt = "s1 / n"
  private val m2Txt = "s2 / n - mu * mu"
  private val m3Txt = "s3 / n - 3e0 * mu * (s2 / n) + 2e0 * mu * mu * mu"
  private val m4Txt =
    "s4 / n - 4e0 * mu * (s3 / n) + 6e0 * mu * mu * (s2 / n) - 3e0 * mu * mu * mu * mu"

  /** Daily-trend residual for the Durbin–Watson series: y and t are exact
    * BIGINTs (daily order counts, row index), so the residual doubles are
    * bit-identical cross-engine without any decimal wire. */
  private val dwResidTxt = "CAST(y AS DOUBLE) - ((a) + (b) * CAST(t AS DOUBLE))"

  val entries: Seq[QueryDef] = Seq(

    QueryDef(
      "ml_jarque_bera",
      // Jarque–Bera residual-normality test: JB = n/6·(S² + E²/4) with S
      // the residual skewness and E the excess kurtosis. Pass 1 aggregates
      // the OLS sufficient statistics (5 exact sums); the solved (a, b)
      // one-row frame is broadcast into pass 2, which accumulates the four
      // residual power sums on the exact wire. S and E close over shared
      // text; JB is computed FROM THE 6-dp-ROUNDED S/E so the headline
      // statistic is a function of already-hash-equal values.
      (s, dir) => {
        val m = T.lineitem(s, dir).agg(
          count(lit(1)).cast("double").as("n"),
          T.xsum(col("l_quantity")).as("sx"),
          T.xsum(col("l_extendedprice")).as("sy"),
          T.xsum(col("l_quantity") * col("l_quantity")).as("sxx"),
          T.xsum(col("l_quantity") * col("l_extendedprice")).as("sxy"))
        val coef = m.selectExpr("n", s"$aTxt AS a", s"$bTxt AS b")
        T.lineitem(s, dir)
          .select(col("l_quantity").cast("double").as("q"),
            col("l_extendedprice").cast("double").as("y"))
          .transform(T.fanOut(_))
          .crossJoin(broadcast(coef))
          .select(expr(residTxt).as("r"))
          .agg(count(lit(1)).cast("double").as("n"),
            T.xsum(col("r")).as("s1"),
            T.xsum(col("r") * col("r")).as("s2"),
            T.xsum(col("r") * col("r") * col("r")).as("s3"),
            T.xsum(col("r") * col("r") * col("r") * col("r")).as("s4"))
          .selectExpr("n", "s1", "s2", "s3", "s4", s"$muTxt AS mu")
          .selectExpr("n", "mu",
            s"$m2Txt AS m2", s"$m3Txt AS m3", s"$m4Txt AS m4")
          .selectExpr("n",
            "round(m3 / (sqrt(m2) * m2), 6) AS skewness",
            "round(m4 / (m2 * m2) - 3e0, 6) AS excess_kurtosis")
          .selectExpr("CAST(n AS BIGINT) AS n", "skewness", "excess_kurtosis",
            "round(n / 6e0 * (skewness * skewness + excess_kurtosis * excess_kurtosis / 4e0), 4) AS jb")
      },
      Some(s"""WITH m AS (SELECT CAST(count(*) AS DOUBLE) AS n,
                   ${T.sqlXsum("l_quantity")} AS sx,
                   ${T.sqlXsum("l_extendedprice")} AS sy,
                   ${T.sqlXsum("l_quantity * l_quantity")} AS sxx,
                   ${T.sqlXsum("l_quantity * l_extendedprice")} AS sxy
                 FROM lineitem),
               c AS (SELECT n, $aTxt AS a, $bTxt AS b FROM m),
               l AS (SELECT CAST(l_quantity AS DOUBLE) AS q,
                   CAST(l_extendedprice AS DOUBLE) AS y
                 FROM lineitem),
               p AS (SELECT CAST(count(*) AS DOUBLE) AS n,
                   ${T.sqlXsum(residTxt.replace("(a)", "c.a").replace("(b)", "c.b"))} AS s1,
                   ${T.sqlXsum(s"($residTxt) * ($residTxt)".replace("(a)", "c.a").replace("(b)", "c.b"))} AS s2,
                   ${T.sqlXsum(s"($residTxt) * ($residTxt) * ($residTxt)".replace("(a)", "c.a").replace("(b)", "c.b"))} AS s3,
                   ${T.sqlXsum(s"($residTxt) * ($residTxt) * ($residTxt) * ($residTxt)".replace("(a)", "c.a").replace("(b)", "c.b"))} AS s4
                 FROM l CROSS JOIN c),
               mu AS (SELECT n, s1, s2, s3, s4, $muTxt AS mu FROM p),
               cm AS (SELECT n, mu, $m2Txt AS m2, $m3Txt AS m3, $m4Txt AS m4
                 FROM mu),
               sk AS (SELECT n,
                   round(m3 / (sqrt(m2) * m2), 6) AS skewness,
                   round(m4 / (m2 * m2) - 3e0, 6) AS excess_kurtosis
                 FROM cm)
               SELECT CAST(n AS BIGINT) AS n, skewness, excess_kurtosis,
                 round(n / 6e0 * (skewness * skewness + excess_kurtosis * excess_kurtosis / 4e0), 4) AS jb
               FROM sk""")),

    QueryDef(
      "ml_durbin_watson",
      // Durbin–Watson serial-correlation statistic on the detrended daily
      // order series: DW = Σ(r_t − r_{t−1})² / Σr_t² over the ~2.4k-day
      // aggregate. The corpus-scale work is ONE map-side-combined daily
      // count; the trend fit is exact-integer sufficient statistics
      // (t, y are BIGINTs) closed over shared double text, and the lag
      // window runs on the bounded day-range rows (the ml_acf discipline).
      // DW ≈ 2(1 − ρ₁); the companion rho1 column reads the test the way
      // a practitioner does.
      (s, dir) => {
        val daily = T.orders(s, dir)
          .groupBy(col("o_orderdate").as("day"))
          .agg(count(lit(1)).as("y"))
          .withColumn("t", row_number().over(Window.orderBy("day")))
        val m = daily.agg(
          count(lit(1)).cast("double").as("n"),
          sum(col("t")).cast("double").as("sx"),
          sum(col("y")).cast("double").as("sy"),
          sum(col("t") * col("t")).cast("double").as("sxx"),
          sum(col("t") * col("y")).cast("double").as("sxy"))
        val coef = m.selectExpr("n", s"$aTxt AS a", s"$bTxt AS b")
        val r = daily.crossJoin(broadcast(coef))
          .selectExpr("t", s"$dwResidTxt AS r")
          .withColumn("rp", lag(col("r"), 1).over(Window.orderBy("t")))
        r.agg(count(lit(1)).as("n_days"),
            T.xsum(expr("CASE WHEN rp IS NULL THEN 0e0 ELSE (r - rp) * (r - rp) END")).as("num"),
            T.xsum(col("r") * col("r")).as("den"))
          .selectExpr("n_days", "round(num / den, 6) AS dw",
            "round(1e0 - (num / den) / 2e0, 6) AS rho1")
      },
      Some(s"""WITH daily AS (SELECT o_orderdate AS day, count(*) AS y
                 FROM orders GROUP BY 1),
               idx AS (SELECT y, row_number() OVER (ORDER BY day) AS t
                 FROM daily),
               m AS (SELECT CAST(count(*) AS DOUBLE) AS n,
                   CAST(sum(t) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy,
                   CAST(sum(t * t) AS DOUBLE) AS sxx,
                   CAST(sum(t * y) AS DOUBLE) AS sxy
                 FROM idx),
               c AS (SELECT $aTxt AS a, $bTxt AS b FROM m),
               r AS (SELECT t, $dwResidTxt AS r
                 FROM idx CROSS JOIN c),
               lg AS (SELECT r, lag(r, 1) OVER (ORDER BY t) AS rp FROM r)
               SELECT count(*) AS n_days,
                 round(${T.sqlXsum("CASE WHEN rp IS NULL THEN 0e0 ELSE (r - rp) * (r - rp) END")}
                   / ${T.sqlXsum("r * r")}, 6) AS dw,
                 round(1e0 - (${T.sqlXsum("CASE WHEN rp IS NULL THEN 0e0 ELSE (r - rp) * (r - rp) END")}
                   / ${T.sqlXsum("r * r")}) / 2e0, 6) AS rho1
               FROM lg""")),

    QueryDef(
      "ml_breusch_pagan",
      // Breusch–Pagan heteroskedasticity LM test: regress the squared
      // (scaled) OLS residuals u = r² on the regressor and report
      // LM = n·R²_aux (χ²₁ under homoskedasticity). Same two-pass shape as
      // ml_jarque_bera — the second pass accumulates the aux-regression
      // sufficient statistics (Σu, Σu², Σxu) alongside nothing else; the
      // aux R² closes over shared text and LM is derived from the
      // 6-dp-rounded R² so the headline is a function of hash-equal parts.
      (s, dir) => {
        val m = T.lineitem(s, dir).agg(
          count(lit(1)).cast("double").as("n"),
          T.xsum(col("l_quantity")).as("sx"),
          T.xsum(col("l_extendedprice")).as("sy"),
          T.xsum(col("l_quantity") * col("l_quantity")).as("sxx"),
          T.xsum(col("l_quantity") * col("l_extendedprice")).as("sxy"))
        val coef = m.selectExpr("n", s"$aTxt AS a", s"$bTxt AS b")
        T.lineitem(s, dir)
          .select(col("l_quantity").cast("double").as("q"),
            col("l_extendedprice").cast("double").as("y"))
          .transform(T.fanOut(_))
          .crossJoin(broadcast(coef))
          .selectExpr("q", s"($residTxt) * ($residTxt) AS u")
          .agg(count(lit(1)).cast("double").as("n"),
            T.xsum(col("q")).as("sx"),
            T.xsum(col("q") * col("q")).as("sxx"),
            T.xsum(col("u")).as("su"),
            T.xsum(col("u") * col("u")).as("suu"),
            T.xsum(col("q") * col("u")).as("sxu"))
          .selectExpr("n",
            """round((n * sxu - sx * su) * (n * sxu - sx * su)
              / ((n * sxx - sx * sx) * (n * suu - su * su)), 6) AS r2_aux""")
          .selectExpr("CAST(n AS BIGINT) AS n", "r2_aux",
            "round(n * r2_aux, 4) AS bp_lm")
      },
      Some(s"""WITH m AS (SELECT CAST(count(*) AS DOUBLE) AS n,
                   ${T.sqlXsum("l_quantity")} AS sx,
                   ${T.sqlXsum("l_extendedprice")} AS sy,
                   ${T.sqlXsum("l_quantity * l_quantity")} AS sxx,
                   ${T.sqlXsum("l_quantity * l_extendedprice")} AS sxy
                 FROM lineitem),
               c AS (SELECT n, $aTxt AS a, $bTxt AS b FROM m),
               l AS (SELECT CAST(l_quantity AS DOUBLE) AS q,
                   CAST(l_extendedprice AS DOUBLE) AS y
                 FROM lineitem),
               ux AS (SELECT q,
                   (${residTxt.replace("(a)", "c.a").replace("(b)", "c.b")})
                     * (${residTxt.replace("(a)", "c.a").replace("(b)", "c.b")}) AS u
                 FROM l CROSS JOIN c),
               p AS (SELECT CAST(count(*) AS DOUBLE) AS n,
                   ${T.sqlXsum("q")} AS sx, ${T.sqlXsum("q * q")} AS sxx,
                   ${T.sqlXsum("u")} AS su, ${T.sqlXsum("u * u")} AS suu,
                   ${T.sqlXsum("q * u")} AS sxu
                 FROM ux),
               r2 AS (SELECT n,
                   round((n * sxu - sx * su) * (n * sxu - sx * su)
                     / ((n * sxx - sx * sx) * (n * suu - su * su)), 6) AS r2_aux
                 FROM p)
               SELECT CAST(n AS BIGINT) AS n, r2_aux,
                 round(n * r2_aux, 4) AS bp_lm
               FROM r2"""))
  )
}
