package graft.ops

import graft.{QueryDef, Tables => T}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reshaping + curation surface (r6, second half): the wide↔long pivots of
  * the dask/cudf DataFrame API (`pivot_table` / `melt`), the `mode`
  * aggregate, and two LLM-pipeline curation primitives — deterministic
  * stratified sampling (corpus rebalancing) and text normalization (the
  * canonicalization pass that runs before every exact-dedup job).
  *
  * Scale notes:
  * - pivot_wide: a pivot with an EXPLICIT value list is one ordinary
  *   hash-aggregation (each pivot cell is a conditional agg column) — no
  *   second pass, no distinct-values job, map-side combinable. Leaving the
  *   value list implicit would add a driver collect of the distinct keys;
  *   production pivots should always pin the list.
  * - unpivot_long: Spark's `unpivot` is a Generate (row-expansion) over
  *   already-aggregated rows — output = rows × metrics, zero shuffle.
  * - agg_mode: two-phase — count per (group, value) with partial agg, then
  *   one narrow window argmax; never collects value sets.
  * - sample_stratified: per-row affine-hash thinning, embarrassingly
  *   parallel, reproducible under repartitioning (the `random_state`
  *   contract, as ml_train_test_split).
  * - text_normalize: per-row regex chain, embarrassingly parallel.
  */
object Reshape {

  // Affine sampling hash — distinct constants from the minhash/split
  // families so strata don't correlate with other hash-derived ops.
  private val P = T.HASH_P
  // r6 review: 48271 collided with Pipeline.FA on the SAME doc_id key,
  // making the sampling bucket a constant shift of the train/test-split
  // hash (it only looked independent because every rate is a multiple of
  // 100). 69621 (Fishman–Moore) is used by no other family in the repo.
  private val SA = 69621L
  private val SB = 11213L

  /** Per-language sampling rates in per-mille (corpus rebalancing: keep
    * most English, thin the rest — the FineWeb-style language mix step). */
  private val RATES: Seq[(String, Int)] =
    Seq("en" -> 600, "fr" -> 300, "de" -> 300, "es" -> 300, "zh" -> 100)

  val entries: Seq[QueryDef] = Seq(

    QueryDef(
      "pivot_wide",
      // cudf/dask pivot_table analog: returnflag × linestatus quantity
      // matrix. The EXPLICIT value list (F, O — the fixture's full domain)
      // keeps this a single hash-aggregate: Spark compiles each cell to
      // `sum(CASE WHEN linestatus = v THEN qty END)`, exactly the oracle's
      // text. Exact-decimal cell sums (Tables.dsum discipline).
      (s, dir) => T.lineitem(s, dir)
        .groupBy("l_returnflag")
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(T.dsum(col("l_quantity")).as("qty"), count(lit(1)).as("n"))
        .withColumnRenamed("F_qty", "f_qty").withColumnRenamed("F_n", "f_n")
        .withColumnRenamed("O_qty", "o_qty").withColumnRenamed("O_n", "o_n")
        // r6 review: Spark's pivot leaves count cells of EMPTY (group,
        // value) combos NULL while the oracle's count(CASE…) yields 0 —
        // the fixtures populate all six combos, but real TPC-H data has
        // empty ones (linestatus 'O' implies returnflag 'N'). The sum
        // cells stay NULL on both sides (sum over nothing is NULL).
        .select(col("l_returnflag"), col("f_qty"),
          coalesce(col("f_n"), lit(0L)).as("f_n"),
          col("o_qty"), coalesce(col("o_n"), lit(0L)).as("o_n"))
        .orderBy("l_returnflag"),
      Some(s"""SELECT l_returnflag,
                 ${T.sqlDsum("CASE WHEN l_linestatus = 'F' THEN l_quantity END")} AS f_qty,
                 count(CASE WHEN l_linestatus = 'F' THEN 1 END) AS f_n,
                 ${T.sqlDsum("CASE WHEN l_linestatus = 'O' THEN l_quantity END")} AS o_qty,
                 count(CASE WHEN l_linestatus = 'O' THEN 1 END) AS o_n
               FROM lineitem GROUP BY l_returnflag
               ORDER BY l_returnflag""")),

    QueryDef(
      "unpivot_long",
      // The inverse reshape (dask/cudf melt): per-flag metric columns →
      // (flag, metric, value) rows via Spark's native `unpivot`, a Generate
      // over the 3 aggregated rows — the wide aggregate is computed once,
      // the melt itself is shuffle-free.
      (s, dir) => T.lineitem(s, dir)
        .groupBy("l_returnflag")
        .agg(
          T.dsum(col("l_quantity")).as("sum_qty"),
          T.dsum(col("l_extendedprice")).as("sum_price"),
          T.dsum(col("l_discount")).as("sum_disc"))
        .unpivot(
          Array(col("l_returnflag")),
          Array(col("sum_qty"), col("sum_price"), col("sum_disc")),
          "metric", "value")
        .orderBy("l_returnflag", "metric"),
      Some(s"""WITH a AS (SELECT l_returnflag,
                   ${T.sqlDsum("l_quantity")} AS sum_qty,
                   ${T.sqlDsum("l_extendedprice")} AS sum_price,
                   ${T.sqlDsum("l_discount")} AS sum_disc
                 FROM lineitem GROUP BY l_returnflag)
               SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS value FROM a
               UNION ALL
               SELECT l_returnflag, 'sum_price', sum_price FROM a
               UNION ALL
               SELECT l_returnflag, 'sum_disc', sum_disc FROM a
               ORDER BY l_returnflag, metric""")),

    QueryDef(
      "agg_mode",
      // cudf Series.mode analog: modal order priority per order status.
      // Two-phase: (status, priority) counts (partial-agg shuffle on the
      // pair), then a per-status window argmax with a DETERMINISTIC
      // tie-break (count DESC, priority ASC) — engines may not share an
      // arbitrary-tie mode, so the tie order is part of the contract.
      (s, dir) => {
        val w = Window.partitionBy(col("o_orderstatus"))
          .orderBy(col("n").desc, col("o_orderpriority").asc)
        T.orders(s, dir)
          .groupBy("o_orderstatus", "o_orderpriority")
          .agg(count(lit(1)).as("n"))
          .withColumn("rn", row_number().over(w)).where(col("rn") === 1)
          .select(col("o_orderstatus"), col("o_orderpriority").as("mode_priority"), col("n"))
          .orderBy("o_orderstatus")
      },
      Some("""SELECT o_orderstatus, mode_priority, n FROM (
                SELECT o_orderstatus, o_orderpriority AS mode_priority, count(*) AS n,
                  row_number() OVER (PARTITION BY o_orderstatus
                    ORDER BY count(*) DESC, o_orderpriority ASC) AS rn
                FROM orders GROUP BY o_orderstatus, o_orderpriority) t
              WHERE rn = 1 ORDER BY o_orderstatus""")),

    QueryDef(
      "sample_stratified",
      // Deterministic stratified sampling: per-language keep rates (RATES,
      // per-mille), membership decided by an affine hash of doc_id — no
      // rand(), so the sample is reproducible across runs, partitionings
      // and engines (what dask's random_state actually promises), and the
      // filter is a map-side predicate a scan can push at 100 TB. Output:
      // per-stratum audit row (population, sample size, achieved rate).
      (s, dir) => {
        val bucket = ((lit(SA) * col("doc_id") + lit(SB)) % lit(P)) % lit(1000)
        val rate = RATES.foldLeft(lit(0)) { case (acc, (l, r)) =>
          when(col("lang") === l, lit(r)).otherwise(acc) }
        T.documents(s, dir)
          .select(col("lang"), when(bucket < rate, 1).otherwise(0).as("keep"))
          .groupBy("lang")
          .agg(count(lit(1)).as("n_docs"), sum(col("keep")).as("n_sampled"))
          .select(col("lang"), col("n_docs"), col("n_sampled"),
            round(col("n_sampled").cast("double") / col("n_docs"), 6).as("rate"))
          .orderBy("lang")
      },
      Some(s"""WITH k AS (SELECT lang,
                   CASE WHEN (($SA * doc_id + $SB) % $P) % 1000 <
                     (CASE ${RATES.map { case (l, r) => s"WHEN lang = '$l' THEN $r" }.mkString(" ")} ELSE 0 END)
                   THEN 1 ELSE 0 END AS keep
                 FROM documents)
               SELECT lang, count(*) AS n_docs, CAST(sum(keep) AS BIGINT) AS n_sampled,
                 round(CAST(sum(keep) AS DOUBLE) / count(*), 6) AS rate
               FROM k GROUP BY lang ORDER BY lang""")),

    QueryDef(
      "text_normalize",
      // Canonicalization before exact-dedup: lowercase → strip everything
      // outside [a-z0-9 ] → collapse runs of spaces → trim. Per-row regex
      // chain, embarrassingly parallel, pushdown-friendly. The fixture
      // corpus is pure ASCII (verified), so Java and RE2 regex semantics
      // coincide on these classes; a production pass would add a Unicode
      // NFC step in front (no cross-engine builtin to pin it against).
      // Output carries the normalized text itself plus a changed flag, so
      // the compare pins the exact transform, not a summary of it.
      (s, dir) => T.documents(s, dir)
        .select(col("doc_id"), T.normText(col("text")).as("norm_text"), col("text"))
        .select(col("doc_id"), col("norm_text"),
          length(col("norm_text")).as("n_norm"),
          when(col("norm_text") === col("text"), 0).otherwise(1).as("changed"))
        .orderBy("doc_id"),
      Some(s"""SELECT doc_id, norm_text, length(norm_text) AS n_norm,
                CASE WHEN norm_text = text THEN 0 ELSE 1 END AS changed
              FROM (SELECT doc_id, text, ${T.sqlNormText("text")} AS norm_text
                    FROM documents) t
              ORDER BY doc_id""")),

    QueryDef(
      "ml_label_encode",
      // cuml.preprocessing LabelEncoder [R] (r7): dense 0-based ids over
      // the sorted distinct label domain. The label domain is the SMALL
      // side by definition (it's a category column), so the id assignment
      // is a window over the aggregated distinct rows — bounded, like the
      // mode argmax; the full-corpus transform is then a broadcast join
      // against this table (the fit artifact IS this table). Emits the
      // fitted mapping with per-label support.
      (s, dir) => {
        val w = Window.orderBy(col("lang"))
        T.documents(s, dir)
          .groupBy("lang").agg(count(lit(1)).as("n_docs"))
          .withColumn("label_id", row_number().over(w) - 1)
          .select(col("lang"), col("label_id"), col("n_docs"))
          .orderBy("lang")
      },
      Some("""SELECT lang,
                CAST(row_number() OVER (ORDER BY lang) - 1 AS INT) AS label_id,
                n_docs
              FROM (SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang) t
              ORDER BY lang""")),

    QueryDef(
      "ml_onehot",
      // cuml.preprocessing OneHotEncoder [R] (r7): indicator columns over
      // the EXPLICIT category list (the pivot_wide discipline — an
      // implicit list would add a distinct-values driver job). The
      // transform is a pure map pass; this row emits its per-source
      // column sums (the verifiable aggregate of the 0/1 matrix), plus an
      // `n_other` catch-all so a category outside the pinned list is
      // counted loudly instead of dropped silently.
      (s, dir) => {
        val langs = Seq("de", "en", "es", "fr", "zh")
        val hots = langs.map(l =>
          sum(when(col("lang") === l, 1L).otherwise(0L)).as(s"n_$l"))
        val other = sum(when(!col("lang").isin(langs: _*), 1L).otherwise(0L)).as("n_other")
        T.documents(s, dir)
          .groupBy("source")
          .agg(hots.head, (hots.tail :+ other): _*)
          .orderBy("source")
      },
      Some {
        val cols = Seq("de", "en", "es", "fr", "zh").map(l =>
          s"CAST(sum(CASE WHEN lang = '$l' THEN 1 ELSE 0 END) AS BIGINT) AS n_$l").mkString(",\n                ")
        s"""SELECT source, $cols,
                CAST(sum(CASE WHEN lang NOT IN ('de','en','es','fr','zh') THEN 1 ELSE 0 END) AS BIGINT) AS n_other
              FROM documents GROUP BY source ORDER BY source"""
      }),

    QueryDef(
      "ml_label_binarize",
      // cuml.dask.preprocessing LabelBinarizer [R] — the LABEL-side
      // binarizer next to ml_onehot's feature-side sums: the actual 0/1
      // indicator matrix in long form (doc, class, ind) for the bounded
      // doc_id < 20 sample, over the same explicit category list. Long
      // form IS the distributed encoding (a wide dynamic-schema pivot
      // would bake |classes| into the plan); inverse_transform is the
      // per-doc argmax, pinned in MicroSpec. Pure map over a pruned scan —
      // the class list is literal, no distinct-values job.
      (s, dir) => {
        val spark = s
        import spark.implicits._
        val classes = Seq("de", "en", "es", "fr", "zh").toDF("class")
        T.documents(s, dir).where(col("doc_id") < 20)
          .select(col("doc_id"), col("lang"))
          .crossJoin(broadcast(classes))
          .select(col("doc_id"), col("lang"), col("class"),
            when(col("lang") === col("class"), 1L).otherwise(0L).as("ind"))
          .orderBy("doc_id", "class")
      },
      Some("""SELECT doc_id, lang, class, CAST(CASE WHEN lang = class
                THEN 1 ELSE 0 END AS BIGINT) AS ind
              FROM documents CROSS JOIN (
                SELECT unnest(['de','en','es','fr','zh']) AS class) c
              WHERE doc_id < 20 ORDER BY doc_id, class"""))
  )
}
