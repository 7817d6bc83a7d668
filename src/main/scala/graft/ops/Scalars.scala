package graft.ops

import graft.{QueryDef, Tables => T}
import org.apache.spark.sql.functions._

/** Scalar function surface (SURVEY.md §2.8): string / regex / date / math /
  * conditional / array / json / struct expressions. Everything is a built-in
  * `org.apache.spark.sql.functions` call — codegen'd, stays inside
  * whole-stage codegen, no UDFs in the hot path. Cross-engine rules per
  * SURVEY §7.3: POSIX-simple regexes, no day-of-week, round(,6) on doubles,
  * explicit casts on JSON values.
  */
object Scalars {

  val entries: Seq[QueryDef] = Seq(
    QueryDef(
      "fn_string",
      (s, dir) => T.customer(s, dir).select(
        col("c_custkey"),
        upper(col("c_name")).as("up_name"),
        substring(col("c_name"), 1, 8).as("pfx"),
        concat(col("c_mktsegment"), lit("/"), col("c_name")).as("seg_name"),
        length(col("c_name")).as("name_len"),
        regexp_replace(col("c_name"), lit("Customer"), lit("Cust")).as("short_name"),
        lpad(col("c_custkey").cast("string"), 10, "0").as("key_pad"))
        .orderBy("c_custkey"),
      Some("""SELECT c_custkey,
                upper(c_name) AS up_name,
                substr(c_name, 1, 8) AS pfx,
                c_mktsegment || '/' || c_name AS seg_name,
                length(c_name) AS name_len,
                replace(c_name, 'Customer', 'Cust') AS short_name,
                lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS key_pad
              FROM customer ORDER BY c_custkey""")),

    QueryDef(
      "fn_like_regex",
      // POSIX-simple pattern only (SURVEY §7.3 rule 6): engines agree on
      // [a-z]+ classes and capture groups, diverge on exotic syntax.
      (s, dir) => T.part(s, dir)
        .where(col("p_name").like("%bolt%") || col("p_name").like("small%"))
        .select(
          col("p_partkey"),
          col("p_name"),
          regexp_extract(col("p_name"), "^([a-z]+) ([a-z]+)$", 1).as("adjective"),
          regexp_extract(col("p_name"), "^([a-z]+) ([a-z]+)$", 2).as("noun"))
        .orderBy("p_partkey"),
      Some("""SELECT p_partkey, p_name,
                coalesce(regexp_extract(p_name, '^([a-z]+) ([a-z]+)$', 1), '') AS adjective,
                coalesce(regexp_extract(p_name, '^([a-z]+) ([a-z]+)$', 2), '') AS noun
              FROM part
              WHERE p_name LIKE '%bolt%' OR p_name LIKE 'small%'
              ORDER BY p_partkey""")),

    QueryDef(
      "fn_date_extract",
      // year/month/quarter/date_trunc only — dayofweek numbering differs
      // across engines (Spark 1=Sunday, DuckDB dow 0=Sunday).
      (s, dir) => T.orders(s, dir)
        .groupBy(
          year(col("o_orderdate")).as("yr"),
          quarter(col("o_orderdate")).as("qtr"),
          month(col("o_orderdate")).as("mth"))
        .agg(count(lit(1)).as("n_orders"), T.dsum(col("o_totalprice")).as("sum_price"))
        .orderBy("yr", "qtr", "mth"),
      Some(s"""SELECT CAST(year(o_orderdate) AS INT) AS yr,
                 CAST(quarter(o_orderdate) AS INT) AS qtr,
                 CAST(month(o_orderdate) AS INT) AS mth,
                 count(*) AS n_orders, ${T.sqlDsum("o_totalprice")} AS sum_price
               FROM orders GROUP BY 1, 2, 3 ORDER BY yr, qtr, mth""")),

    QueryDef(
      "fn_math",
      // Per-row double math is order-independent (§7.3 rule 2); round(,6)
      // absorbs ULP noise. ln/pow/sqrt on strictly positive inputs.
      (s, dir) => T.lineitem(s, dir).select(
        col("l_orderkey"), col("l_linenumber"),
        round(abs(col("l_extendedprice") - col("l_quantity") * lit(1000)), 6).as("adiff"),
        ceil(col("l_quantity") / 7).cast("long").as("q7"),
        floor(col("l_extendedprice") / 100).cast("long").as("p100"),
        round(log(col("l_extendedprice") + 1), 6).as("ln_price"),
        round(pow(col("l_discount") + 1, 2), 6).as("disc_sq"),
        round(sqrt(col("l_quantity")), 6).as("sqrt_qty"))
        .orderBy("l_orderkey", "l_linenumber"),
      Some("""SELECT l_orderkey, l_linenumber,
                round(abs(l_extendedprice - l_quantity * 1000), 6) AS adiff,
                CAST(ceil(l_quantity / 7) AS BIGINT) AS q7,
                CAST(floor(l_extendedprice / 100) AS BIGINT) AS p100,
                round(ln(l_extendedprice + 1), 6) AS ln_price,
                round(pow(l_discount + 1, 2), 6) AS disc_sq,
                round(sqrt(l_quantity), 6) AS sqrt_qty
              FROM lineitem ORDER BY l_orderkey, l_linenumber""")),

    QueryDef(
      "fn_case_when",
      (s, dir) => T.orders(s, dir).select(
        col("o_orderkey"),
        when(col("o_totalprice") >= 250000, "whale")
          .when(col("o_totalprice") >= 100000, "big")
          .when(col("o_totalprice") >= 25000, "mid")
          .otherwise("small").as("bucket"))
        .groupBy("bucket").agg(count(lit(1)).as("n"))
        .orderBy("bucket"),
      Some("""SELECT CASE WHEN o_totalprice >= 250000 THEN 'whale'
                          WHEN o_totalprice >= 100000 THEN 'big'
                          WHEN o_totalprice >= 25000  THEN 'mid'
                          ELSE 'small' END AS bucket,
                count(*) AS n
              FROM orders GROUP BY 1 ORDER BY bucket""")),

    QueryDef(
      "fn_array_explode",
      // split → explode → count: the map side of every text pipeline. At
      // 100 TB the shuffle key is the term (bounded vocab) — fine.
      (s, dir) => T.documents(s, dir)
        .select(explode(split(col("text"), " ")).as("term"))
        .where(col("term") =!= "")
        .groupBy("term").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("term").asc)
        .limit(100),
      Some("""SELECT term, count(*) AS n
              FROM (SELECT unnest(string_split(text, ' ')) AS term FROM documents) t
              WHERE term <> ''
              GROUP BY term ORDER BY n DESC, term ASC LIMIT 100""")),

    QueryDef(
      "fn_array_ops",
      // Array surface over real ArrayType(Float) embeddings: size,
      // element_at, slice+sort, contains-free (float equality is useless).
      (s, dir) => T.embeddings(s, dir)
        .where(col("vec_id") < 100)
        .select(
          col("vec_id"),
          size(col("embedding")).as("dim"),
          round(element_at(col("embedding"), 1).cast("double"), 6).as("e1"),
          round(element_at(col("embedding"), 64).cast("double"), 6).as("e64"),
          round(array_max(col("embedding")).cast("double"), 6).as("emax"),
          round(array_min(col("embedding")).cast("double"), 6).as("emin"))
        .orderBy("vec_id"),
      Some("""SELECT vec_id, len(embedding) AS dim,
                round(CAST(embedding[1] AS DOUBLE), 6) AS e1,
                round(CAST(embedding[64] AS DOUBLE), 6) AS e64,
                round(CAST(list_max(embedding) AS DOUBLE), 6) AS emax,
                round(CAST(list_min(embedding) AS DOUBLE), 6) AS emin
              FROM embeddings WHERE vec_id < 100 ORDER BY vec_id""")),

    QueryDef(
      "fn_json_extract",
      // events.props is a JSON string {"k": <int>}. get_json_object is a
      // codegen'd path extraction; both sides cast to INT explicitly
      // (DuckDB json_extract returns JSON-typed values).
      (s, dir) => T.events(s, dir)
        .select(get_json_object(col("props"), "$.k").cast("int").as("k"),
          col("value"))
        .groupBy("k")
        .agg(count(lit(1)).as("n"), T.dsum(col("value")).as("sum_value"))
        .orderBy("k"),
      Some(s"""SELECT CAST(json_extract(props, '$$.k') AS INT) AS k,
                 count(*) AS n, ${T.sqlDsum("value")} AS sum_value
               FROM events GROUP BY 1 ORDER BY k""")),

    QueryDef(
      "fn_struct_nested",
      // Struct construction + nested field access. The struct lives INSIDE
      // the plan (built, then fields re-extracted with dot paths — the
      // operator under test); the WIRE carries only scalars. Round 2 wrote
      // the struct itself to parquet and the driver's compare crashed
      // sorting the resulting dict column ("unhashable type: 'dict'"), so
      // nested types never go on the wire.
      (s, dir) => T.customer(s, dir)
        .where(col("c_custkey") < 500)
        .select(
          col("c_custkey"),
          struct(
            col("c_name").as("name"),
            col("c_mktsegment").as("segment"),
            col("c_acctbal").cast(T.money).cast("double").as("bal")).as("info"))
        .select(
          col("c_custkey"),
          col("info.name").as("info_name"),
          col("info.segment").as("info_segment"),
          col("info.bal").as("info_bal"))
        .orderBy("c_custkey"),
      Some("""WITH s AS (
                SELECT c_custkey,
                  struct_pack(name := c_name, segment := c_mktsegment,
                              bal := CAST(CAST(c_acctbal AS DECIMAL(18,4)) AS DOUBLE)) AS info
                FROM customer WHERE c_custkey < 500)
              SELECT c_custkey, info.name AS info_name,
                     info.segment AS info_segment, info.bal AS info_bal
              FROM s ORDER BY c_custkey""")),

    QueryDef(
      "fn_ffill",
      // dask/cudf ffill surface (r6 second half): forward-fill the last
      // purchase value over each user's event timeline — value is only
      // meaningful on purchase rows (manufactured NULLs elsewhere, the
      // fixture has none), so the window carries it forward with
      // last(…, ignoreNulls). Deterministic order (ts, event_id);
      // per-user bounded running window — the standard gaps-and-carry
      // shape at any scale. Values pass through untouched (no
      // arithmetic), so the compare is exact.
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        T.events(s, dir)
          .select(col("user_id"), col("event_id"), col("ts"),
            when(col("event_type") === "purchase", col("value")).as("pv"))
          .select(col("user_id"), col("event_id"),
            last(col("pv"), ignoreNulls = true).over(w).as("last_purchase"))
          .orderBy("user_id", "event_id")
      },
      Some("""SELECT user_id, event_id,
                last_value(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
                  OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_purchase
              FROM events ORDER BY user_id, event_id""")),

    QueryDef(
      "fn_date_arith",
      // Date ARITHMETIC next to fn_date_extract's field extraction:
      // add_months / last_day / datediff / month bucketing — the calendar
      // ops a reporting layer leans on. All computed on the DATE lattice
      // (casts pin the type: Spark date_trunc returns TIMESTAMP, DuckDB
      // returns DATE — the cast makes both a DATE; day arithmetic is
      // exact integer calendar math in both engines, no timezone
      // dependence for date-typed values). Bounded: one row per order
      // month with calendar-derived columns + counts.
      (s, dir) => T.orders(s, dir)
        .selectExpr("CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start",
          "CAST(o_orderdate AS DATE) AS d")
        .selectExpr("month_start", "d",
          "datediff(d, month_start) AS day_in_month")
        .groupBy("month_start")
        .agg(count(lit(1)).as("n_orders"),
          max(col("day_in_month")).as("max_day_in_month"))
        .selectExpr("month_start", "n_orders", "max_day_in_month",
          "last_day(month_start) AS month_end",
          "add_months(month_start, 1) AS next_month_start",
          "datediff(last_day(month_start), month_start) + 1 AS days_in_month")
        .orderBy("month_start"),
      Some("""WITH o AS (SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
                   CAST(o_orderdate AS DATE) AS d
                 FROM orders),
                 g AS (SELECT month_start, count(*) AS n_orders,
                     max(date_diff('day', month_start, d)) AS max_day_in_month
                   FROM o GROUP BY month_start)
               SELECT month_start, n_orders,
                 CAST(max_day_in_month AS INT) AS max_day_in_month,
                 last_day(month_start) AS month_end,
                 CAST(month_start + INTERVAL 1 MONTH AS DATE) AS next_month_start,
                 CAST(date_diff('day', month_start, last_day(month_start)) + 1 AS INT) AS days_in_month
               FROM g ORDER BY month_start""")),

    QueryDef(
      "fn_bitwise",
      // Bitwise scalar + aggregate surface — masks, shifts, popcount, and
      // the bit_and/bit_or/bit_xor aggregates (the id-packing / bitmap /
      // flag-word toolbox): per-row ops are exact integer arithmetic
      // identical in both engines; the only textual divergence is XOR's
      // spelling (Spark `^` vs DuckDB `xor()` — DuckDB's `^` is POWER, a
      // classic cross-engine trap worth pinning). Grouped by id mod 8 —
      // map-side-combinable, bounded 8-row output.
      (s, dir) => T.events(s, dir)
        .selectExpr("event_id % 8 AS g",
          "event_id & 1023 AS masked",
          "shiftleft(event_id, 3) AS shl",
          "shiftright(event_id, 2) AS shr",
          "event_id ^ 21845 AS xored",
          "bit_count(event_id) AS pc")
        .groupBy("g")
        .agg(count(lit(1)).as("n"),
          expr("bit_and(masked)").as("mask_and"),
          expr("bit_or(masked)").as("mask_or"),
          expr("bit_xor(xored)").as("xor_agg"),
          sum(col("pc")).cast("long").as("popcount_sum"),
          max(col("shl")).as("max_shl"), min(col("shr")).as("min_shr"))
        .orderBy("g"),
      Some("""SELECT event_id % 8 AS g, count(*) AS n,
                bit_and(event_id & 1023) AS mask_and,
                bit_or(event_id & 1023) AS mask_or,
                bit_xor(xor(event_id, 21845)) AS xor_agg,
                CAST(sum(bit_count(event_id)) AS BIGINT) AS popcount_sum,
                max(event_id << 3) AS max_shl,
                min(event_id >> 2) AS min_shr
              FROM events GROUP BY g ORDER BY g"""))
  )
}
