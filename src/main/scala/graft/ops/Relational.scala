package graft.ops

import graft.{QueryDef, Tables => T}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scans, projections, filters, joins, sorts, limits, set operations
  * (SURVEY.md §2.1–2.3, §2.6–2.7). All declarative DataFrame plans: filters
  * and projections reach the parquet scan via Catalyst pushdown; dimension
  * joins are explicitly broadcast; big joins shuffle on their equi-keys.
  */
object Relational {

  val entries: Seq[QueryDef] = Seq(
    // ------------------------------------------------------------ §2.1 scans
    QueryDef(
      "scan_parquet",
      (s, dir) => T.lineitem(s, dir).agg(count(lit(1)).as("n_rows")),
      Some("SELECT count(*) AS n_rows FROM lineitem")),

    QueryDef(
      "scan_pruned_pushdown",
      // 2-column projection + selective predicate: both must reach the scan
      // (ReadSchema prunes to 3 cols, PushedFilters carries l_quantity < 5).
      // ORACLE FORM: the trailing total-order ORDER BY exists only for the
      // hash-match contract (SURVEY 7.3.3). PRODUCTION FORM: emit unsorted
      // scan output (sort, if needed, belongs to the sink write) — the
      // range-shuffle over full output would dominate at 100 TB.
      (s, dir) => T.lineitem(s, dir)
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .where(col("l_quantity") < 5)
        .orderBy("l_orderkey", "l_linenumber"),
      Some("""SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
              WHERE l_quantity < 5 ORDER BY l_orderkey, l_linenumber""")),

    // --------------------------------------------------- §2.2 project/filter
    QueryDef(
      "project_expr",
      // ORACLE FORM: total-order ORDER BY per the hash-match contract.
      // PRODUCTION FORM: a projection never sorts — at 100 TB this is a
      // pure map stage fused into the scan by whole-stage codegen.
      (s, dir) => T.lineitem(s, dir).select(
        col("l_orderkey"), col("l_linenumber"),
        round(col("l_extendedprice") * (lit(1) - col("l_discount")), 6).as("revenue"),
        round(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax")), 6).as("charge"),
        col("l_quantity").cast("int").as("qty_int")
      ).orderBy("l_orderkey", "l_linenumber"),
      Some("""SELECT l_orderkey, l_linenumber,
                round(l_extendedprice * (1 - l_discount), 6) AS revenue,
                round(l_extendedprice * (1 - l_discount) * (1 + l_tax), 6) AS charge,
                CAST(l_quantity AS INT) AS qty_int
              FROM lineitem ORDER BY l_orderkey, l_linenumber""")),

    QueryDef(
      "filter_pred",
      (s, dir) => T.orders(s, dir)
        .where(col("o_orderstatus").isin("F", "O")
          && col("o_totalprice").between(10000, 20000)
          && (col("o_orderpriority").like("1-%") || col("o_orderpriority").like("5-%")))
        .select("o_orderkey", "o_totalprice", "o_orderpriority")
        .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders
              WHERE o_orderstatus IN ('F','O')
                AND o_totalprice BETWEEN 10000 AND 20000
                AND (o_orderpriority LIKE '1-%' OR o_orderpriority LIKE '5-%')
              ORDER BY o_orderkey""")),

    QueryDef(
      "filter_null_safe",
      // The fixtures are NULL-free, so NULLs are manufactured with nullif and
      // then exercised with IS NOT NULL / coalesce / null-safe equality.
      (s, dir) => T.customer(s, dir)
        .select(
          col("c_custkey"),
          coalesce(nullif(col("c_mktsegment"), lit("BUILDING")), lit("(none)")).as("seg"),
          (nullif(col("c_mktsegment"), lit("FURNITURE")) <=> lit("MACHINERY")).as("is_mach"))
        .where(nullif(col("c_mktsegment"), lit("AUTOMOBILE")).isNotNull)
        .orderBy("c_custkey"),
      Some("""SELECT c_custkey,
                coalesce(nullif(c_mktsegment, 'BUILDING'), '(none)') AS seg,
                nullif(c_mktsegment, 'FURNITURE') IS NOT DISTINCT FROM 'MACHINERY' AS is_mach
              FROM customer
              WHERE nullif(c_mktsegment, 'AUTOMOBILE') IS NOT NULL
              ORDER BY c_custkey""")),

    // ------------------------------------------------------------ §2.3 joins
    QueryDef(
      "join_inner_hash",
      // Fact ⋈ fact-sized equi-join: shuffles both sides on the key (at
      // 100 TB: co-locate with bucketing on custkey to kill this shuffle).
      // ORACLE FORM: the global ORDER BY of the full join output is for
      // hash-match determinism only; PRODUCTION FORM stops at the join —
      // an all-data range-shuffle sort after it would be the bottleneck.
      (s, dir) => {
        val o = T.orders(s, dir); val c = T.customer(s, dir)
        o.join(c, o("o_custkey") === c("c_custkey"))
          .select(o("o_orderkey"), c("c_name"), o("o_totalprice"))
          .orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey, c_name, o_totalprice
              FROM orders JOIN customer ON o_custkey = c_custkey
              ORDER BY o_orderkey""")),

    QueryDef(
      "join_broadcast_dim",
      // Star-schema dims (nation 25, region 5 rows) are broadcast: no shuffle
      // of the fact side, plan must show BroadcastHashJoin.
      (s, dir) => {
        val c = T.customer(s, dir); val n = T.nation(s, dir); val r = T.region(s, dir)
        c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
          .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
          .groupBy(r("r_name"), n("n_name"))
          .agg(count(lit(1)).as("n_cust"), T.dsum(c("c_acctbal")).as("sum_bal"))
          .orderBy("r_name", "n_name")
      },
      Some(s"""SELECT r_name, n_name, count(*) AS n_cust,
                 ${T.sqlDsum("c_acctbal")} AS sum_bal
               FROM customer
                 JOIN nation ON c_nationkey = n_nationkey
                 JOIN region ON n_regionkey = r_regionkey
               GROUP BY r_name, n_name ORDER BY r_name, n_name""")),

    QueryDef(
      "join_left_outer",
      (s, dir) => {
        val c = T.customer(s, dir); val o = T.orders(s, dir)
        c.join(o, c("c_custkey") === o("o_custkey"), "left")
          .groupBy(c("c_custkey"))
          .agg(count(o("o_orderkey")).as("n_orders"))
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, count(o_orderkey) AS n_orders
              FROM customer LEFT JOIN orders ON c_custkey = o_custkey
              GROUP BY c_custkey ORDER BY c_custkey""")),

    QueryDef(
      "join_semi",
      (s, dir) => {
        val c = T.customer(s, dir)
        val big = T.orders(s, dir).where(col("o_totalprice") > 200000)
        c.join(big, c("c_custkey") === big("o_custkey"), "left_semi")
          .select("c_custkey", "c_name").orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, c_name FROM customer
              WHERE EXISTS (SELECT 1 FROM orders
                            WHERE o_custkey = c_custkey AND o_totalprice > 200000)
              ORDER BY c_custkey""")),

    QueryDef(
      "join_anti",
      (s, dir) => {
        val c = T.customer(s, dir); val o = T.orders(s, dir)
        c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
          .select("c_custkey", "c_name").orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, c_name FROM customer
              WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
              ORDER BY c_custkey""")),

    QueryDef(
      "join_multiway_star",
      // TPC-H Q5-shaped 5-way star: Catalyst reorders, AQE converts the dim
      // sides to broadcasts at runtime; revenue summed exactly via decimal.
      (s, dir) => {
        val r = T.region(s, dir); val n = T.nation(s, dir); val c = T.customer(s, dir)
        val o = T.orders(s, dir); val l = T.lineitem(s, dir)
        l.join(o, l("l_orderkey") === o("o_orderkey"))
          .join(c, o("o_custkey") === c("c_custkey"))
          .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
          .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
          .groupBy(r("r_name"), n("n_name"))
          .agg(
            T.dsum(l("l_extendedprice") * (lit(1) - l("l_discount"))).as("revenue"),
            count(lit(1)).as("n_items"))
          .orderBy("r_name", "n_name")
      },
      Some(s"""SELECT r_name, n_name,
                 ${T.sqlDsum("l_extendedprice * (1 - l_discount)")} AS revenue,
                 count(*) AS n_items
               FROM lineitem
                 JOIN orders   ON l_orderkey = o_orderkey
                 JOIN customer ON o_custkey = c_custkey
                 JOIN nation   ON c_nationkey = n_nationkey
                 JOIN region   ON n_regionkey = r_regionkey
               GROUP BY r_name, n_name ORDER BY r_name, n_name""")),

    QueryDef(
      "join_theta_range",
      // Per-user event pairs within 5 minutes: equi on user_id + range on
      // the micros timeline. Spark plans the equi key as the join key and
      // the range as a post-join filter (SMJ/SHJ on user_id) — the
      // distributed shape that holds at 100 TB because the quadratic blowup
      // is confined to a single user's partition.
      (s, dir) => {
        val e = T.events(s, dir).select(
          col("user_id"), col("event_id"),
          unix_micros(col("ts").cast("timestamp")).as("us"))
        val a = e.select(col("user_id"), col("event_id").as("id_a"), col("us").as("us_a"))
        val b = e.select(col("user_id").as("user_b"), col("event_id").as("id_b"), col("us").as("us_b"))
        a.join(b, col("user_id") === col("user_b")
            && col("id_a") < col("id_b")
            && col("us_b") >= col("us_a")
            && col("us_b") - col("us_a") <= 300L * 1000000L)
          .select(col("user_id"), col("id_a"), col("id_b"),
            (col("us_b") - col("us_a")).as("delta_us"))
          .orderBy("user_id", "id_a", "id_b")
      },
      Some("""SELECT a.user_id, a.event_id AS id_a, b.event_id AS id_b,
                b.us - a.us AS delta_us
              FROM (SELECT user_id, event_id, epoch_us(ts) AS us FROM events) a
              JOIN (SELECT user_id, event_id, epoch_us(ts) AS us FROM events) b
                ON a.user_id = b.user_id AND a.event_id < b.event_id
               AND b.us >= a.us AND b.us - a.us <= 300000000
              ORDER BY a.user_id, id_a, id_b""")),

    QueryDef(
      "join_interval_bucket",
      // The range join with NO equi key (r6 second half): every
      // error–purchase pair within ±5 min across ALL users. join_theta_range
      // leans on user_id to confine the quadratic; with no equi key Spark
      // would plan a BroadcastNestedLoopJoin — a full O(n·m) scan at any
      // scale. The fix is the standard interval-bucket trick (the 1-d
      // sibling of ml_dbscan's grid): bucket the timeline into
      // window-width cells, have the probe side emit its cell ± 1, and
      // equi-join ON THE CELL — any |Δ| ≤ W pair differs by ≤ 1 cell, so
      // candidates are complete, each pair meets exactly once (at the home
      // side's cell), and the exact |Δ| ≤ W predicate decides membership.
      // The cell id is a shuffle key with ~uniform occupancy — the plan
      // scales like an ordinary equi-join at 100 TB.
      (s, dir) => {
        val W = 300L * 1000000L
        val e = T.events(s, dir).select(
          col("event_id"), col("event_type"),
          unix_micros(col("ts").cast("timestamp")).as("us"))
        val err = e.where(col("event_type") === "error")
          .select(col("event_id").as("err_id"), col("us").as("us_e"),
            explode(array(expr(s"us DIV $W") - 1, expr(s"us DIV $W"),
              expr(s"us DIV $W") + 1)).as("cell"))
        val pur = e.where(col("event_type") === "purchase")
          .select(col("event_id").as("pur_id"), col("us").as("us_p"),
            expr(s"us DIV $W").as("cell"))
        err.join(pur, "cell")
          .where(abs(col("us_p") - col("us_e")) <= W)
          .select(col("err_id"), col("pur_id"), (col("us_p") - col("us_e")).as("delta_us"))
          .orderBy("err_id", "pur_id")
      },
      Some("""SELECT e.event_id AS err_id, p.event_id AS pur_id,
                p.us - e.us AS delta_us
              FROM (SELECT event_id, epoch_us(ts) AS us FROM events
                    WHERE event_type = 'error') e
              JOIN (SELECT event_id, epoch_us(ts) AS us FROM events
                    WHERE event_type = 'purchase') p
                ON abs(p.us - e.us) <= 300000000
              ORDER BY err_id, pur_id""")),

    QueryDef(
      "join_asof",
      // As-of join: for each 'error' event, the most recent prior-or-equal
      // 'click' of the same user. Spark has no native ASOF — the idiomatic
      // form is equi-join on user + range predicate + windowed argmax
      // (row_number over (click.us DESC, click.id DESC)). DuckDB does have
      // native ASOF JOIN, but its tie-breaking on equal timestamps is
      // unspecified, so the oracle uses the same windowed form. At 100 TB
      // the range join stays partition-local on user_id; a sort-merge
      // within user partitions (mapPartitions over sorted buckets) is the
      // declared scale-up if per-user click counts explode.
      (s, dir) => {
        val e = T.events(s, dir).select(
          col("user_id"), col("event_id"), col("event_type"),
          unix_micros(col("ts").cast("timestamp")).as("us"))
        val err = e.where(col("event_type") === "error")
          .select(col("user_id"), col("event_id").as("err_id"), col("us").as("err_us"))
        val clk = e.where(col("event_type") === "click")
          .select(col("user_id").as("user_c"), col("event_id").as("click_id"), col("us").as("click_us"))
        val w = Window.partitionBy(col("err_id"))
          .orderBy(col("click_us").desc, col("click_id").desc)
        err.join(clk, col("user_id") === col("user_c") && col("click_us") <= col("err_us"))
          .withColumn("rn", row_number().over(w))
          .where(col("rn") === 1)
          .select(col("user_id"), col("err_id"), col("err_us"),
            col("click_id"), (col("err_us") - col("click_us")).as("lag_us"))
          .orderBy("user_id", "err_id")
      },
      Some("""SELECT user_id, err_id, err_us, click_id, lag_us FROM (
                SELECT e.user_id, e.event_id AS err_id, e.us AS err_us,
                  c.event_id AS click_id, e.us - c.us AS lag_us,
                  row_number() OVER (PARTITION BY e.event_id
                                     ORDER BY c.us DESC, c.event_id DESC) AS rn
                FROM (SELECT * FROM (SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events) x
                      WHERE event_type = 'error') e
                JOIN (SELECT * FROM (SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events) y
                      WHERE event_type = 'click') c
                  ON e.user_id = c.user_id AND c.us <= e.us) t
              WHERE rn = 1 ORDER BY user_id, err_id""")),

    QueryDef(
      "join_asof_nearest",
      // merge_asof(direction='nearest') — the remaining as-of direction
      // next to join_asof's backward: each error matches the click of the
      // same user CLOSEST in time, either side. Same partition-local
      // equi-join shape (user_id is the shuffle key; per-user pair cost);
      // the pick is row_number over (|Δt|, click_us, click_id) — ties at
      // equal distance break toward the PRIOR click then the smaller id
      // (deterministic where pandas/cudf leave it unspecified). lag_us is
      // SIGNED: negative = the match is a later click (forward). Same
      // 100 TB scale-up note as join_asof (sorted per-user buckets).
      (s, dir) => {
        val e = T.events(s, dir).select(
          col("user_id"), col("event_id"), col("event_type"),
          unix_micros(col("ts").cast("timestamp")).as("us"))
        val err = e.where(col("event_type") === "error")
          .select(col("user_id"), col("event_id").as("err_id"), col("us").as("err_us"))
        val clk = e.where(col("event_type") === "click")
          .select(col("user_id").as("user_c"), col("event_id").as("click_id"), col("us").as("click_us"))
        val w = Window.partitionBy(col("err_id"))
          .orderBy(abs(col("click_us") - col("err_us")), col("click_us"), col("click_id"))
        err.join(clk, col("user_id") === col("user_c"))
          .withColumn("rn", row_number().over(w))
          .where(col("rn") === 1)
          .select(col("user_id"), col("err_id"), col("err_us"), col("click_id"),
            (col("err_us") - col("click_us")).as("lag_us"),
            when(col("click_us") <= col("err_us"), lit("backward"))
              .otherwise(lit("forward")).as("direction"))
          .orderBy("user_id", "err_id")
      },
      Some("""SELECT user_id, err_id, err_us, click_id, lag_us, direction FROM (
                SELECT e.user_id, e.event_id AS err_id, e.us AS err_us,
                  c.event_id AS click_id, e.us - c.us AS lag_us,
                  CASE WHEN c.us <= e.us THEN 'backward' ELSE 'forward' END AS direction,
                  row_number() OVER (PARTITION BY e.event_id
                                     ORDER BY abs(c.us - e.us), c.us, c.event_id) AS rn
                FROM (SELECT * FROM (SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events) x
                      WHERE event_type = 'error') e
                JOIN (SELECT * FROM (SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events) y
                      WHERE event_type = 'click') c
                  ON e.user_id = c.user_id) t
              WHERE rn = 1 ORDER BY user_id, err_id""")),

    QueryDef(
      "join_asof_tolerance",
      // merge_asof(tolerance=...) — the third pandas/cudf as-of knob next
      // to direction: a backward match only counts within a 10-minute
      // window (stale matches are WORSE than no match in feature
      // engineering, the tolerance's whole point). LEFT join keeps
      // unmatched errors with a NULL click — the pandas contract — so the
      // output row count equals the error count regardless of tolerance.
      // Same partition-local equi-join shape as join_asof.
      (s, dir) => {
        val TOL = 600L * 1000000L // 10 min in micros
        val e = T.events(s, dir).select(
          col("user_id"), col("event_id"), col("event_type"),
          unix_micros(col("ts").cast("timestamp")).as("us"))
        val err = e.where(col("event_type") === "error")
          .select(col("user_id"), col("event_id").as("err_id"), col("us").as("err_us"))
        val clk = e.where(col("event_type") === "click")
          .select(col("user_id").as("user_c"), col("event_id").as("click_id"), col("us").as("click_us"))
        val w = Window.partitionBy(col("err_id"))
          .orderBy(col("click_us").desc, col("click_id").desc)
        err.join(clk,
            col("user_id") === col("user_c") &&
              col("click_us") <= col("err_us") &&
              col("click_us") >= col("err_us") - lit(TOL), "left")
          .withColumn("rn", row_number().over(w))
          .where(col("rn") === 1)
          .select(col("user_id"), col("err_id"), col("err_us"),
            col("click_id"), (col("err_us") - col("click_us")).as("lag_us"))
          .orderBy("user_id", "err_id")
      },
      Some("""SELECT user_id, err_id, err_us, click_id, lag_us FROM (
                SELECT e.user_id, e.event_id AS err_id, e.us AS err_us,
                  c.event_id AS click_id, e.us - c.us AS lag_us,
                  row_number() OVER (PARTITION BY e.event_id
                                     ORDER BY c.us DESC, c.event_id DESC) AS rn
                FROM (SELECT * FROM (SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events) x
                      WHERE event_type = 'error') e
                LEFT JOIN (SELECT * FROM (SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events) y
                      WHERE event_type = 'click') c
                  ON e.user_id = c.user_id AND c.us <= e.us
                     AND c.us >= e.us - 600000000) t
              WHERE rn = 1 ORDER BY user_id, err_id""")),

    QueryDef(
      "join_asof_forward",
      // merge_asof(direction='forward') — completes the pandas/cudf
      // direction trio (backward = join_asof, nearest = join_asof_nearest,
      // VERDICT r11 missing #3): each error matches the EARLIEST click of
      // the same user at-or-after the error. Identical partition-local
      // equi-join shape (user_id the shuffle key); pick = row_number over
      // (click_us ASC, click_id ASC) within the at-or-after range. lead_us
      // ≥ 0 by construction. Same 100 TB scale-up note as join_asof
      // (sort-merge within per-user sorted buckets if per-user click
      // counts explode).
      (s, dir) => {
        val e = T.events(s, dir).select(
          col("user_id"), col("event_id"), col("event_type"),
          unix_micros(col("ts").cast("timestamp")).as("us"))
        val err = e.where(col("event_type") === "error")
          .select(col("user_id"), col("event_id").as("err_id"), col("us").as("err_us"))
        val clk = e.where(col("event_type") === "click")
          .select(col("user_id").as("user_c"), col("event_id").as("click_id"), col("us").as("click_us"))
        val w = Window.partitionBy(col("err_id"))
          .orderBy(col("click_us").asc, col("click_id").asc)
        err.join(clk, col("user_id") === col("user_c") && col("click_us") >= col("err_us"))
          .withColumn("rn", row_number().over(w))
          .where(col("rn") === 1)
          .select(col("user_id"), col("err_id"), col("err_us"),
            col("click_id"), (col("click_us") - col("err_us")).as("lead_us"))
          .orderBy("user_id", "err_id")
      },
      Some("""SELECT user_id, err_id, err_us, click_id, lead_us FROM (
                SELECT e.user_id, e.event_id AS err_id, e.us AS err_us,
                  c.event_id AS click_id, c.us - e.us AS lead_us,
                  row_number() OVER (PARTITION BY e.event_id
                                     ORDER BY c.us ASC, c.event_id ASC) AS rn
                FROM (SELECT * FROM (SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events) x
                      WHERE event_type = 'error') e
                JOIN (SELECT * FROM (SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events) y
                      WHERE event_type = 'click') c
                  ON e.user_id = c.user_id AND c.us >= e.us) t
              WHERE rn = 1 ORDER BY user_id, err_id""")),

    // ----------------------------------------------------- §2.6 sorts/limits
    QueryDef(
      "sort_multi_key",
      // Sorting IS this operator's semantics (range-shuffle + per-partition
      // external sort with spill is exactly what a 100 TB global sort does);
      // nothing here is oracle-only overhead.
      (s, dir) => T.customer(s, dir)
        .select(
          col("c_custkey"),
          nullif(col("c_mktsegment"), lit("BUILDING")).as("seg"),
          col("c_acctbal"))
        .orderBy(col("seg").asc_nulls_first, col("c_acctbal").desc, col("c_custkey").asc),
      Some("""SELECT c_custkey, nullif(c_mktsegment, 'BUILDING') AS seg, c_acctbal
              FROM customer
              ORDER BY seg ASC NULLS FIRST, c_acctbal DESC, c_custkey ASC""")),

    QueryDef(
      "topk_limit",
      // Global top-k: Spark plans TakeOrderedAndProject — per-partition heap
      // + driver merge, no full sort (exactly what you want at 100 TB).
      (s, dir) => T.lineitem(s, dir)
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(col("l_extendedprice").desc, col("l_orderkey").asc, col("l_linenumber").asc)
        .limit(100),
      Some("""SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
              ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC
              LIMIT 100""")),

    // --------------------------------------------------------- §2.7 set ops
    QueryDef(
      "set_union_all",
      // ORACLE FORM: ORDER BY for the hash compare. PRODUCTION FORM: bag
      // union is metadata-only (no shuffle, partitions concatenated) — a
      // sort after it would turn a free operator into an all-data shuffle.
      (s, dir) => {
        val e = T.events(s, dir)
        e.where(col("event_type") === "click").select("event_id", "event_type")
          .unionByName(
            e.where(col("event_type") === "purchase").select("event_id", "event_type"))
          .orderBy("event_id")
      },
      Some("""SELECT event_id, event_type FROM events WHERE event_type = 'click'
              UNION ALL
              SELECT event_id, event_type FROM events WHERE event_type = 'purchase'
              ORDER BY event_id""")),

    QueryDef(
      "set_union_distinct",
      (s, dir) => {
        val c = T.customer(s, dir); val o = T.orders(s, dir)
        c.where(col("c_mktsegment") === "BUILDING").select("c_custkey")
          .union(o.where(col("o_totalprice") > 150000)
            .select(col("o_custkey").as("c_custkey")))
          .distinct()
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
              UNION
              SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 150000
              ORDER BY c_custkey""")),

    QueryDef(
      "set_intersect",
      (s, dir) => {
        val c = T.customer(s, dir); val o = T.orders(s, dir)
        c.where(col("c_mktsegment") === "BUILDING").select("c_custkey")
          .intersect(o.where(col("o_totalprice") > 150000)
            .select(col("o_custkey").as("c_custkey")))
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
              INTERSECT
              SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 150000
              ORDER BY c_custkey""")),

    QueryDef(
      "set_except",
      (s, dir) => {
        val o = T.orders(s, dir)
        o.select(col("o_custkey").as("c_custkey")).distinct()
          .except(o.where(col("o_totalprice") > 150000)
            .select(col("o_custkey").as("c_custkey")))
          .orderBy("c_custkey")
      },
      Some("""SELECT DISTINCT o_custkey AS c_custkey FROM orders
              EXCEPT
              SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 150000
              ORDER BY c_custkey"""))
  )
}
