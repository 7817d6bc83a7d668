package graft.ops

import graft.{QueryDef, Tables => T}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series smoothing (r7) — the cuML HoltWinters surface, as far as a
  * deterministic cross-engine contract can carry it: simple exponential
  * smoothing over the daily event series with α = 1/2.
  *
  * Why α = 1/2: the recurrence level_t = α·y_t + (1−α)·level_{t−1} unrolls
  * to a weighted sum whose weights (1−α)^k are EXACT powers of two — so
  * the whole computation stays rounding-free: u_t = y_t·2^t is exact
  * BIGINT, the running sum U_t is exact BIGINT, and the final
  * level_t = 0.5^{t+1}·(U_t − u_1) + 0.5^{t−1}·y_1 multiplies an exactly
  * represented integer by a power of two (an exponent shift, no mantissa
  * rounding) and performs ONE IEEE add. No pow() ulp hazard (libm pow is
  * exact on powers of two), no decimal wire needed.
  *
  * Scale: the heavy step is the daily count aggregation (map-side
  * combined); the smoothing itself runs on the ~30 aggregated rows, so the
  * single-partition window is bounded by the date range, not the corpus
  * (the agg_approx_quantile offset-window discipline). The 2^t encoding
  * bounds t ≤ 62 − log2(max daily count); t here is ≤ 31 days and counts
  * ≤ ~2^21 at any tested SF — a 100 TB deployment would shard the series
  * per key and re-base t per window, as the comment contract states.
  */
object Forecast {

  val entries: Seq[QueryDef] = Seq(

    QueryDef(
      "ml_holtwinters",
      // Daily event volume, smoothed: (day, y = count, level = SES state
      // after that day). t is the row index over observed days (gap-proof),
      // so level_1 = y_1 and each later level is the textbook recurrence,
      // verified exactly by the closed form both engines evaluate.
      (s, dir) => {
        val daily = T.events(s, dir)
          .groupBy(to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("y"))
        val wIdx = Window.orderBy("day")
        val wCum = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
        val wAll = Window.partitionBy()
        daily
          .withColumn("t", row_number().over(wIdx))
          .withColumn("u", col("y") * expr("CAST(pow(2, t) AS BIGINT)"))
          .withColumn("cu", sum(col("u")).over(wCum))
          .withColumn("u1", sum(when(col("t") === 1, col("u"))).over(wAll))
          .withColumn("y1", sum(when(col("t") === 1, col("y"))).over(wAll))
          .select(col("day"), col("y"),
            round(expr(
              "pow(0.5, t + 1) * CAST(cu - u1 AS DOUBLE) + pow(0.5, t - 1) * CAST(y1 AS DOUBLE)"
            ), 6).as("level"))
          .orderBy("day")
      },
      Some("""WITH daily AS (SELECT CAST(ts AS DATE) AS day, count(*) AS y
                             FROM events GROUP BY 1),
                idx AS (SELECT day, y, row_number() OVER (ORDER BY day) AS t
                        FROM daily),
                u AS (SELECT *, y * CAST(pow(2, t) AS BIGINT) AS u FROM idx),
                c AS (SELECT *,
                    sum(u) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cu,
                    sum(CASE WHEN t = 1 THEN u END) OVER () AS u1,
                    sum(CASE WHEN t = 1 THEN y END) OVER () AS y1
                  FROM u)
              SELECT day, y,
                round(pow(0.5, t + 1) * CAST(cu - u1 AS DOUBLE)
                      + pow(0.5, t - 1) * CAST(y1 AS DOUBLE), 6) AS level
              FROM c ORDER BY day"""))
  )
}
