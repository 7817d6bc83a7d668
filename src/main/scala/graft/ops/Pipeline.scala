package graft.ops

import graft.{QueryDef, Tables => T}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Extended LLM-training-data pipeline operators beyond the SURVEY §2
  * inventory (builder-prompt mandate: language-ID, quality scoring,
  * fingerprinting, ANN scale path, multimodal binary plumbing). Each is a
  * first-class `queries` entry; all but the two *-by-design exceptions
  * carry DuckDB oracles.
  */
object Pipeline {

  // Affine mixing constants for the fingerprint (same deterministic-hash
  // discipline as dedup_minhash: engine hash() functions differ, arithmetic
  // doesn't).
  private val P = T.HASH_P
  private val FA = 48271L
  private val FB = 16807L

  /** text_pmi_collocations / ml_woe_iv shared ratio texts (exact-integer
    * counts in, one double division chain + REAL-collapsed ln out —
    * DuckDB's FLOAT is an alias of REAL, so the text is shared verbatim). */
  private val pmiTxt =
    "CAST(CAST(ln((CAST(c12 AS DOUBLE) / np) / " +
      "((CAST(c1 AS DOUBLE) / n) * (CAST(c2 AS DOUBLE) / n))) AS FLOAT) AS DOUBLE)"
  private val woeTxt =
    "CAST(CAST(ln((CAST(n_good AS DOUBLE) / gt) / " +
      "(CAST(n_bad AS DOUBLE) / bt)) AS FLOAT) AS DOUBLE)"

  /** p^0.3 as exp(0.3·ln p), both transcendentals REAL-collapsed — pow()
    * has no cross-engine bit contract; this composition does. */
  private val tempPowTxt =
    "CAST(CAST(exp(0.3e0 * CAST(CAST(ln(p) AS FLOAT) AS DOUBLE)) AS FLOAT) AS DOUBLE)"

  /** PII patterns for text_pii_redact — deliberately LOOKAROUND-FREE so
    * Java regex (Spark) and RE2 (DuckDB) match identically; applied in a
    * fixed order (email → ipv4 → phone) so both engines see the same
    * intermediate text. private[graft] because MicroSpec drives them over
    * a synthetic fixture WITH PII (the corpus has none by construction —
    * the registered row proves the zeros, the spec proves the machinery). */
  private[graft] val PII_EMAIL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private[graft] val PII_IPV4 =
    "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  private[graft] val PII_PHONE = "\\+[0-9][0-9 ()-]{6,}[0-9]"

  /** The sequential redaction column text_pii_redact and MicroSpec share. */
  private[graft] def piiRedact(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, lit(PII_EMAIL), lit("<EMAIL>")),
        lit(PII_IPV4), lit("<IP>")),
      lit(PII_PHONE), lit("<PHONE>"))

  /** Porter stemmer steps 1a–1c as a named expression cascade — EXACT,
    * including the measure m and the context-dependent y vowel/consonant
    * rule, via a positional vowel/consonant ENCODING column: the token is
    * mapped to {a=vowel, b=consonant}^len (y at start = consonant, y after
    * vowel = consonant, y after consonant = vowel — Porter's cons()), so
    * every condition (contains-vowel, m = count of 'ab' adjacencies, the
    * *o cvc shape 'bab', double-consonant endings) reads off aligned
    * substrings. Step 1a's rewrites are pure truncations, which keeps the
    * encoding aligned without re-encoding; after 1b the only length changes
    * are the tracked undouble/+e, re-aligned in `enc2`. Steps 2–5 (the
    * derivational suffix tables) are the same CASE/measure shape, omitted
    * — step 1 is the inflectional layer the reference stemmer's tests
    * exercise most.
    *
    * The ONLY engine divergence is regexp_replace's global flag (Spark is
    * global by default, DuckDB needs 'g'); every other step is shared
    * verbatim text, so the CASE/substr arithmetic is identical. */
  private[graft] def porterSteps(spark: Boolean): Seq[(String, String)] = {
    def rr(e: String, p: String, r: String) =
      if (spark) s"regexp_replace($e, '$p', '$r')"
      else s"regexp_replace($e, '$p', '$r', 'g')"
    Seq(
      "ln0" -> "length(tok)",
      "e1" -> rr("tok", "[aeiou]", "a"),
      "e2" -> rr("e1", "^y", "Y"),
      "e3" -> rr("e2", "ay", "aY"),
      "e4" -> rr("e3", "y", "a"),
      "e5" -> rr("e4", "Y", "b"),
      "enc" -> rr("e5", "[^ab]", "b"),
      "t1" -> """CASE WHEN tok LIKE '%sses' THEN substr(tok, 1, ln0 - 2)
                  WHEN tok LIKE '%ies' THEN substr(tok, 1, ln0 - 2)
                  WHEN tok LIKE '%ss' THEN tok
                  WHEN tok LIKE '%s' AND ln0 > 1 THEN substr(tok, 1, ln0 - 1)
                  ELSE tok END""",
      "l1" -> "length(t1)",
      "enc1" -> "substr(enc, 1, l1)",
      "d2" -> """CASE WHEN t1 LIKE '%eed' THEN 0
                  WHEN t1 LIKE '%ed' AND substr(enc1, 1, l1 - 2) LIKE '%a%' THEN 2
                  WHEN t1 LIKE '%ing' AND substr(enc1, 1, l1 - 3) LIKE '%a%' THEN 3
                  ELSE 0 END""",
      "eedcut" -> """CASE WHEN t1 LIKE '%eed' AND
                  (l1 - 3 - length(replace(substr(enc1, 1, l1 - 3), 'ab', 'x'))) > 0
                  THEN 1 ELSE 0 END""",
      "ls" -> "l1 - d2 - eedcut",
      "st" -> "substr(t1, 1, ls)",
      "encs" -> "substr(enc1, 1, ls)",
      "ms" -> "ls - length(replace(encs, 'ab', 'x'))",
      "t2" -> """CASE WHEN d2 = 0 THEN st
                  WHEN st LIKE '%at' OR st LIKE '%bl' OR st LIKE '%iz' THEN st || 'e'
                  WHEN ls >= 2 AND substr(st, ls, 1) = substr(st, ls - 1, 1)
                       AND substr(encs, ls, 1) = 'b'
                       AND substr(st, ls, 1) NOT IN ('l', 's', 'z')
                  THEN substr(st, 1, ls - 1)
                  WHEN ms = 1 AND encs LIKE '%bab'
                       AND substr(st, ls, 1) NOT IN ('w', 'x', 'y')
                  THEN st || 'e'
                  ELSE st END""",
      "lt2" -> "length(t2)",
      "enc2" -> """CASE WHEN lt2 = ls - 1 THEN substr(encs, 1, ls - 1)
                    WHEN lt2 = ls + 1 THEN encs || 'a'
                    ELSE encs END""",
      "stem" -> """CASE WHEN t2 LIKE '%y' AND substr(enc2, 1, lt2 - 1) LIKE '%a%'
                    THEN substr(t2, 1, lt2 - 1) || 'i' ELSE t2 END""")
  }


  /** The SQ8 quantize-then-rank chain of ml_knn_sq8 (q_id, rn, n_id, d2),
    * top-5 per query — shared with ml_recall_at_k, which measures this
    * approximation against the exact kNN inside a registered query. */
  private[ops] def sq8Knn(s: SparkSession, dir: String): DataFrame = {
    val ex = T.embeddings(s, dir)
      .transform(T.fanOut(_, col("vec_id")))
      .select(col("vec_id"), posexplode(col("embedding")))
      .selectExpr("vec_id", "pos + 1 AS i", "CAST(col AS DOUBLE) AS x")
    val st = ex.groupBy("i").agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
    val xq = ex.join(broadcast(st), "i")
      .selectExpr("vec_id", "i",
        "CASE WHEN mx > mn THEN mn + floor((x - mn) / (mx - mn) * 255) * (mx - mn) / 255 ELSE x END AS xr")
    val qv = xq.where(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("i"), col("xr").as("qx"))
    val nv = xq.select(col("vec_id").as("n_id"), col("i"), col("xr").as("nx"))
    val d = qv.join(nv, "i").where(col("n_id") =!= col("q_id"))
      .groupBy("q_id", "n_id")
      .agg(T.xsum((col("qx") - col("nx")) * (col("qx") - col("nx"))).as("d2"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("d2"), col("n_id"))
    d.withColumn("rn", row_number().over(w)).where(col("rn") <= 5)
  }

  /** Oracle CTE prefix of [[sq8Knn]], ending in sq5(q_id, rn, n_id, d2). */
  private[ops] val sqlSq8Ctes: String =
    """ex AS (SELECT vec_id,
           generate_subscripts(CAST(embedding AS DOUBLE[]), 1) AS i,
           unnest(CAST(embedding AS DOUBLE[])) AS x
         FROM embeddings),
         st AS (SELECT i, min(x) AS mn, max(x) AS mx FROM ex GROUP BY i),
         xq AS (SELECT vec_id, i,
             CASE WHEN mx > mn THEN mn + floor((x - mn) / (mx - mn) * 255) * (mx - mn) / 255 ELSE x END AS xr
           FROM ex JOIN st USING (i)),
         qv AS (SELECT vec_id AS q_id, i, xr AS qx FROM xq WHERE vec_id < 10),
         dd AS (SELECT q_id, n.vec_id AS n_id,
             CAST(sum(CAST(((qx - n.xr) * (qx - n.xr)) AS DECIMAL(30,12))) AS DOUBLE) AS d2
           FROM qv JOIN xq n USING (i) WHERE n.vec_id <> q_id
           GROUP BY q_id, n.vec_id),
         sq5 AS (SELECT q_id, rn, n_id, d2 FROM (
             SELECT q_id, n_id, d2,
               row_number() OVER (PARTITION BY q_id ORDER BY d2, n_id) AS rn
             FROM dd) t
           WHERE rn <= 5)"""

  /** Shared oracle of the 4:1 box-filter resize — multimodal_resize (the
    * mapPartitions row twin) and multimodal_resize_columnar (the custom
    * columnar SparkPlan) compute the identical summary, so they share the
    * oracle text verbatim (one semantics, two execution boundaries). */
  private[ops] val sqlResizeOracle: String =
    """WITH d AS (SELECT doc_id, text, length(text) AS len
                FROM documents WHERE doc_id < 100),
                b AS (SELECT doc_id,
                        CAST((i - 1) // 4 AS BIGINT) AS blk,
                        unicode(substr(text, CAST(i AS INT), 1)) AS byte
                      FROM (SELECT doc_id, text,
                              unnest(generate_series(1, length(text))) AS i
                            FROM d) x),
                px AS (SELECT doc_id, blk,
                         CAST(CAST(sum(byte) AS HUGEINT) // count(*) AS BIGINT) AS px
                       FROM b GROUP BY doc_id, blk),
                agg AS (SELECT doc_id,
                          CAST(count(*) AS INT) AS n_out,
                          CAST(max(CASE WHEN blk = 0 THEN px END) AS BIGINT) AS first_px,
                          CAST(sum(CAST(px * (blk + 1) AS HUGEINT)) % 997 AS BIGINT) AS checksum
                        FROM px GROUP BY doc_id)
              SELECT d.doc_id, CAST(d.len AS INT) AS n_bytes,
                coalesce(a.n_out, 0) AS n_out,
                coalesce(a.first_px, -1) AS first_px,
                coalesce(a.checksum, 0) AS checksum
              FROM d LEFT JOIN agg a USING (doc_id)
              ORDER BY d.doc_id"""

  /** The per-dim PQ frame + one-Lloyd-round trained codebook and code
    * table of ml_knn_pq (M = 2 subspaces × 16 codes), factored out (r13)
    * so ml_index_pq_save_load can roundtrip the SAME artifacts through
    * parquet. cb1: (m, code, j, c); codes: (n_id, m, code). */
  private[graft] def pqTrain(s: SparkSession, dir: String): (DataFrame, DataFrame) =
    // session-memoized pinned (the r13 shared-frame discipline): both PQ
    // rows train the same codebooks; the second consumer pays nothing
    T.frameCache("pqTrainPinned", s, dir) {
      val (cb, cd) = pqTrainCompute(s, dir)
      (T.pin(cb), T.pin(cd))
    }

  private def pqTrainCompute(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val vd = T.freeze(T.embeddings(s, dir)
      .transform(T.fanOut(_, col("vec_id")))
      .select(col("vec_id"), posexplode(col("embedding")))
      .toDF("vec_id", "p", "xf")
      .selectExpr("vec_id", "CAST(p div 32 AS INT) AS m",
        "CAST(p % 32 AS INT) AS j", "CAST(xf AS DOUBLE) AS x"))
    val cb0 = vd.where(col("vec_id") < 16)
      .selectExpr("CAST(vec_id AS INT) AS code", "m", "j", "x AS c")
    // r14 wire swap (VERDICT r13 #1d — the PQ train was the registry's
    // single most expensive memo at 124 cpu-s): the encode join amplifies
    // the per-dim frame 16× (one candidate distance per code), and the
    // per-row DECIMAL(30,12) cast was the whole cost of that pass. The
    // long-lane sumE12L wire (see Tables) is a drop-in here: addends
    // (x−c)² of unit-scale embedding floats sit far inside its
    // |addend| < 9e3 bound and groups are 32 rows. d2 values move in the
    // last ulps, but BOTH engines run the identical new text (the oracle
    // below swaps with it), so the (d2, code) rank — the only consumer —
    // stays cross-engine agreed.
    def encode(cb: DataFrame): DataFrame = {
      val aw = Window.partitionBy(col("vec_id"), col("m"))
        .orderBy(col("d2"), col("code"))
      vd.join(broadcast(cb), Seq("m", "j"))
        .groupBy("vec_id", "m", "code")
        .agg(T.sumE12L((col("x") - col("c")) * (col("x") - col("c"))).as("d2e"))
        .selectExpr("vec_id", "m", "code", s"${T.bitsE12("d2e")} AS d2")
        .withColumn("rn", row_number().over(aw)).where(col("rn") === 1)
        .select(col("vec_id"), col("m"), col("code"))
    }
    val cb1 = T.freeze(vd.join(encode(cb0), Seq("vec_id", "m"))
      .groupBy("m", "code", "j")
      .agg(T.sumE12L(col("x")).as("sxe"), count(lit(1)).as("nx"))
      .selectExpr("m", "code", "j", s"${T.bitsE12("sxe")} / nx AS c"))
    (cb1, encode(cb1).withColumnRenamed("vec_id", "n_id"))
  }

  /** ADC top-5 through a PQ codebook + code table (reloaded or
    * in-session): the query LUT is the only pass touching raw floats. */
  private[graft] def pqAdcSearch(s: SparkSession, dir: String,
      cb1: DataFrame, codes: DataFrame): DataFrame = {
    val vd = T.embeddings(s, dir)
      .transform(T.fanOut(_, col("vec_id")))
      .select(col("vec_id"), posexplode(col("embedding")))
      .toDF("vec_id", "p", "xf")
      .selectExpr("vec_id", "CAST(p div 32 AS INT) AS m",
        "CAST(p % 32 AS INT) AS j", "CAST(xf AS DOUBLE) AS x")
    val lut = vd.where(col("vec_id") < 10)
      .selectExpr("vec_id AS q_id", "m", "j", "x")
      .join(broadcast(cb1), Seq("m", "j"))
      .groupBy("q_id", "m", "code")
      // same long-lane wire as the train's encode — the oracle's distCte
      // text is shared by both, so the swap must be too
      .agg(T.sumE12L((col("x") - col("c")) * (col("x") - col("c"))).as("d2e"))
      .selectExpr("q_id", "m", "code", s"${T.bitsE12("d2e")} AS d2m")
    val kw = Window.partitionBy(col("q_id")).orderBy(col("dhat"), col("n_id"))
    codes.join(broadcast(lut), Seq("m", "code"))
      .where(col("q_id") =!= col("n_id"))
      .groupBy("q_id", "n_id")
      .agg(max(when(col("m") === 0, col("d2m"))).as("d20"),
        max(when(col("m") === 1, col("d2m"))).as("d21"))
      .selectExpr("q_id", "n_id", "sqrt(d20 + d21) AS dhat")
      .withColumn("rn", row_number().over(kw)).where(col("rn") <= 5)
      .select(col("q_id"), col("rn"), col("n_id"),
        round(col("dhat"), 6).as("dist_adc"))
      .orderBy("q_id", "rn")
  }

  /** Oracle of the PQ train + ADC top-5 chain — shared verbatim by
    * ml_knn_pq and ml_index_pq_save_load (one semantics, with and
    * without the parquet artifact boundary). */
  private[ops] lazy val sqlPqAdcOracle: String = {
    def distCte(name: String, cb: String, filter: String): String =
      s"""$name AS (SELECT vec_id, m, code, ${T.sqlBitsE12("d2e")} AS d2
            FROM (SELECT v.vec_id, v.m, c.code,
                ${T.sqlSumE12L("(v.x - c.c) * (v.x - c.c)")} AS d2e
              FROM vd v JOIN $cb c ON c.m = v.m AND c.j = v.j$filter
              GROUP BY v.vec_id, v.m, c.code) de)"""
    def encCte(name: String, dist: String): String =
      s"""$name AS (SELECT vec_id, m, code FROM (
              SELECT *, row_number() OVER (PARTITION BY vec_id, m
                ORDER BY d2, code) AS rn FROM $dist) t
            WHERE rn = 1)"""
    s"""WITH vd AS (SELECT vec_id,
               CAST((p1 - 1) // 32 AS INT) AS m,
               CAST((p1 - 1) % 32 AS INT) AS j,
               CAST(xf AS DOUBLE) AS x
             FROM (SELECT vec_id, generate_subscripts(embedding, 1) AS p1,
                     unnest(embedding) AS xf FROM embeddings) t),
             cb0 AS (SELECT CAST(vec_id AS INT) AS code, m, j, x AS c
                     FROM vd WHERE vec_id < 16),
             ${distCte("dd0", "cb0", "")},
             ${encCte("enc0", "dd0")},
             cb1 AS (SELECT m, code, j, ${T.sqlBitsE12("sxe")} / nx AS c
               FROM (SELECT a.m, a.code, v.j,
                   ${T.sqlSumE12L("v.x")} AS sxe, count(*) AS nx
                 FROM vd v JOIN enc0 a ON a.vec_id = v.vec_id AND a.m = v.m
                 GROUP BY a.m, a.code, v.j) cbx),
             ${distCte("dd1", "cb1", "")},
             ${encCte("codes", "dd1")},
             ${distCte("lutd", "cb1", " WHERE v.vec_id < 10")},
             adc AS (SELECT l.vec_id AS q_id, cd.vec_id AS n_id,
                 max(CASE WHEN l.m = 0 THEN l.d2 END) AS d20,
                 max(CASE WHEN l.m = 1 THEN l.d2 END) AS d21
               FROM codes cd JOIN lutd l
                 ON l.m = cd.m AND l.code = cd.code
               WHERE l.vec_id <> cd.vec_id
               GROUP BY l.vec_id, cd.vec_id)
           SELECT q_id, rn, n_id, round(dhat, 6) AS dist_adc FROM (
             SELECT q_id, n_id, sqrt(d20 + d21) AS dhat,
               row_number() OVER (PARTITION BY q_id
                 ORDER BY sqrt(d20 + d21), n_id) AS rn
             FROM adc) r
           WHERE rn <= 5 ORDER BY q_id, rn"""
  }

  /** The three persistable artifacts of the IVF+SQ8 vector index —
    * centroids (cid, c_emb), codebook (i, mn, mx), codes (vec_id, cid,
    * i, code) — shared by ml_index_save_load's build side and its
    * MicroSpec in-session twin. The codes table IS the index payload:
    * 1 byte/dim logical width (stored as the exact BIGINT code), cell
    * id attached so a probe join partition-prunes it at scale. */
  private[graft] def ivfSq8IndexFrames(s: SparkSession, dir: String)
      : (DataFrame, DataFrame, DataFrame) =
    ivfSq8IndexFramesOn(s, T.embeddings(s, dir))

  /** [[ivfSq8IndexFrames]] over an explicit corpus frame — the TRAIN
    * corpus and the indexed corpus coincide for the full-corpus rows, but
    * ml_index_incremental trains on the base partition only (the faiss
    * add() contract: new batches are encoded by the frozen quantizer,
    * never retrained into it). */
  private[graft] def ivfSq8IndexFramesOn(s: SparkSession, e: DataFrame)
      : (DataFrame, DataFrame, DataFrame) = {
    val cent = e.where(col("vec_id") < 10)
      .select(col("vec_id").as("cid"), col("embedding").as("c_emb"))
    // pinned: the exploded per-dim frame feeds the codebook aggregate AND
    // the code table (r13 — one explode, two consumers)
    val ex = T.pin(e.transform(T.fanOut(_, col("vec_id")))
      .select(col("vec_id"), posexplode(col("embedding")))
      .selectExpr("vec_id", "pos + 1 AS i", "CAST(col AS DOUBLE) AS x"))
    val codebook = ex.groupBy("i").agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
    val aw = Window.partitionBy(col("vec_id")).orderBy(col("d"), col("cid"))
    val cells = e.transform(T.fanOut(_, col("vec_id")))
      .crossJoin(broadcast(cent))
      .select(col("vec_id"), col("cid"),
        graft.functions.Vec.l2(s, "embedding", "c_emb").as("d"))
      .withColumn("rn", row_number().over(aw)).where(col("rn") === 1)
      .select(col("vec_id"), col("cid"))
    val codes = ex.join(broadcast(codebook), "i").join(cells, "vec_id")
      .selectExpr("vec_id", "cid", "i",
        "CASE WHEN mx > mn THEN CAST(floor((x - mn) / (mx - mn) * 255) AS BIGINT) ELSE 0L END AS code")
    (cent, codebook, codes)
  }

  /** Encode a vector batch against a FROZEN quantizer (the faiss add()
    * primitive, shared by ml_index_incremental and its MicroSpec twin):
    * assign each vector to its nearest centroid, quantize each dim with
    * the per-dim (mn, mx) codebook — the identical expressions
    * [[ivfSq8IndexFramesOn]] uses at build time, so codes never depend on
    * which batch a vector arrived in. Map-shaped at scale: both index
    * sides are broadcast, the batch is never shuffled. */
  private[graft] def ivfSq8Encode(s: SparkSession, batch: DataFrame,
      cent: DataFrame, codebook: DataFrame): DataFrame = {
    val aw = Window.partitionBy(col("vec_id")).orderBy(col("d"), col("cid"))
    val cells = batch.crossJoin(broadcast(cent))
      .select(col("vec_id"), col("cid"),
        graft.functions.Vec.l2(s, "embedding", "c_emb").as("d"))
      .withColumn("rn", row_number().over(aw)).where(col("rn") === 1)
      .select(col("vec_id"), col("cid"))
    batch.select(col("vec_id"), posexplode(col("embedding")))
      .selectExpr("vec_id", "pos + 1 AS i", "CAST(col AS DOUBLE) AS x")
      .join(broadcast(codebook), "i").join(cells, "vec_id")
      .selectExpr("vec_id", "cid", "i",
        "CASE WHEN mx > mn THEN CAST(floor((x - mn) / (mx - mn) * 255) AS BIGINT) ELSE 0L END AS code")
  }

  /** IVF-probed SQ8 search THROUGH the index artifacts only: the database
    * side touches nothing but (centroids, codebook, codes) — exactly what
    * a deploy reloads — while queries come from the raw corpus. Probe 3
    * cells per query (exact query-to-centroid distance), reconstruct
    * candidates from their stored codes (x̂ = mn + code·(mx−mn)/255 — the
    * identical double ops SQ8 quantization produced, so reloaded ≡
    * in-session bit-for-bit), rank by the exact-decimal-wire d². */
  private[graft] def ivfSq8Search(s: SparkSession, dir: String,
      cent: DataFrame, codebook: DataFrame, codes: DataFrame): DataFrame = {
    val e = T.embeddings(s, dir)
    val qw = Window.partitionBy(col("q_id")).orderBy(col("qd"), col("cid"))
    val probes = e.where(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      .crossJoin(broadcast(cent))
      .select(col("q_id"), col("cid"),
        graft.functions.Vec.l2(s, "q_emb", "c_emb").as("qd"))
      .withColumn("prb", row_number().over(qw)).where(col("prb") <= 3)
      .select(col("q_id"), col("cid"))
    val recon = codes.join(broadcast(codebook), "i")
      .selectExpr("vec_id", "cid", "i",
        "CASE WHEN mx > mn THEN mn + CAST(code AS DOUBLE) * (mx - mn) / 255 ELSE mn END AS xr")
    val qv = recon.where(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("i"), col("xr").as("qx"))
    val nv = recon.select(col("vec_id").as("n_id"), col("cid"), col("i"), col("xr").as("nx"))
    val kw = Window.partitionBy(col("q_id")).orderBy(col("d2"), col("n_id"))
    probes.join(nv, "cid").where(col("n_id") =!= col("q_id"))
      .join(qv, Seq("q_id", "i"))
      .groupBy("q_id", "n_id")
      .agg(T.xsum((col("qx") - col("nx")) * (col("qx") - col("nx"))).as("d2"))
      .withColumn("rn", row_number().over(kw)).where(col("rn") <= 5)
      .select(col("q_id"), col("rn"), col("n_id"), round(col("d2"), 6).as("d2"))
      .orderBy("q_id", "rn")
  }

  // ---- BPE trainer internals (shared by text_bpe_merge / text_bpe_apply,
  // r11 — VERDICT r10 #5 asked for an apply/encode twin; sharing the
  // dataflow makes "apply reproduces the trainer's segmentation" true by
  // construction on the Spark side, and MicroSpec re-proves it end-to-end
  // against a driver-side greedy re-segmentation). Contracts documented at
  // the text_bpe_merge QueryDef: the vocab is (word, freq) — corpus
  // scanned once — and a segmentation rides a chr(31)-separator-wrapped
  // string so one replace() per round IS greedy non-overlapping merging.
  // bpeVocab carries wd so the apply twin can join segmentations back to
  // per-source word counts; the trainer ignores the column.

  private def bpeVocab(s: SparkSession, dir: String): DataFrame =
    T.documents(s, dir)
      .transform(T.fanOut(_, col("doc_id")))
      .select(explode(expr("filter(split(text, ' '), t -> t <> '')")).as("wd"))
      .where(length(col("wd")) >= 2)
      .groupBy("wd").agg(count(lit(1)).as("freq"))
      .select(col("wd"), col("freq"), expr(
        "chr(31) || regexp_replace(wd, '(.)', concat('$1', chr(31)))").as("seg"))

  private def bpePairCounts(seg: DataFrame): DataFrame =
    seg.select(col("freq"),
        expr("filter(split(seg, chr(31)), x -> x <> '')").as("syms"))
      .where(size(col("syms")) >= 2)
      .select(col("freq"), explode(expr(
        "transform(sequence(1, size(syms) - 1), i -> " +
          "struct(element_at(syms, i) AS p1, element_at(syms, i + 1) AS p2))"))
        .as("pr"))
      .groupBy(col("pr.p1").as("p1"), col("pr.p2").as("p2"))
      .agg(sum(col("freq")).as("n"))

  private def bpeRanked(cnt: DataFrame, round: Int): DataFrame =
    cnt.withColumn("rank", row_number().over(
        Window.orderBy(col("n").desc, col("p1").asc, col("p2").asc)))
      .withColumn("round", lit(round))

  private def bpeWinner(rk: DataFrame): DataFrame =
    broadcast(rk.where(col("rank") === 1)
      .select(col("p1").as("w1"), col("p2").as("w2")))

  private def bpeMerge(seg: DataFrame, win: DataFrame): DataFrame =
    seg.crossJoin(win)
      .withColumn("seg", expr(
        "replace(seg, chr(31) || w1 || chr(31) || w2 || chr(31), " +
          "chr(31) || w1 || w2 || chr(31))"))
      .drop("w1", "w2")

  val entries: Seq[QueryDef] = Seq(

    QueryDef(
      "text_porter_stem",
      // cuml.preprocessing.text.stem PorterStemmer [R] over the corpus
      // vocabulary: the 40 most frequent all-alpha tokens with their
      // Porter step-1 stems (see porterSteps — the measure/encoding
      // machinery is exact, not a regex approximation). Scale: the
      // stemmer is a pure per-row expression chain (at 100 TB it maps
      // over the token stream); here it is applied AFTER the top-k so the
      // registered query's cascade runs on 40 rows — the heavy step is
      // the map-side-combined vocabulary count, and top-40 plans as
      // TakeOrderedAndProject, no global sort, no window.
      (s, dir) => {
        val top = T.documents(s, dir).transform(T.fanOut(_, col("doc_id")))
          .select(explode(split(col("text"), " ")).as("t"))
          .select(lower(col("t")).as("tok"))
          .where(col("tok").rlike("^[a-z]+$"))
          .groupBy("tok").agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("tok")).limit(40)
        porterSteps(spark = true)
          .foldLeft(top.toDF()) { case (df, (nm, ex)) =>
            df.selectExpr("*", s"$ex AS $nm") }
          .select(col("tok"), col("stem"), col("n"))
          .orderBy(col("n").desc, col("tok"))
      },
      Some {
        val ctes = porterSteps(spark = false).zipWithIndex.map {
          case ((nm, ex), i) => s"c${i + 1} AS (SELECT *, $ex AS $nm FROM c$i)"
        }
        s"""WITH tk AS (SELECT lower(t) AS tok FROM (
                 SELECT unnest(string_split(text, ' ')) AS t FROM documents) u
               WHERE regexp_matches(lower(t), '^[a-z]+$$')),
             c0 AS (SELECT tok, count(*) AS n FROM tk GROUP BY tok
                    ORDER BY n DESC, tok LIMIT 40),
             ${ctes.mkString(",\n             ")}
           SELECT tok, stem, n FROM c${porterSteps(spark = false).size}
           ORDER BY n DESC, tok"""
      }),

    QueryDef(
      "text_quality",
      // Quality scoring: the heuristics a curation pipeline filters on —
      // length, token shape, stopword coverage. Pure per-row expressions
      // (map-only; fuses into the scan at any scale) + a bounded per-source
      // aggregate.
      (s, dir) => {
        val toks = filter(split(col("text"), " "), t => t =!= "")
        val stop = array(Seq("the", "a", "data", "row", "value").map(lit): _*)
        val nTok = size(toks)
        val nStop = size(filter(toks, t => array_contains(stop, t)))
        T.documents(s, dir)
          .select(col("source"), col("n_chars"), nTok.as("n_tok"),
            round(col("n_chars").cast("double") / nTok, 6).as("avg_tok_len"),
            round(nStop.cast("double") / nTok, 6).as("stop_ratio"))
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            T.davg(col("n_tok")).as("avg_tokens"),
            T.davg(col("avg_tok_len")).as("avg_tok_len"),
            T.davg(col("stop_ratio")).as("avg_stop_ratio"))
          .orderBy("source")
      },
      Some(s"""WITH d AS (SELECT source, n_chars,
                 len(list_filter(string_split(text, ' '), t -> t <> '')) AS n_tok,
                 round(CAST(n_chars AS DOUBLE) /
                   len(list_filter(string_split(text, ' '), t -> t <> '')), 6) AS avg_tok_len,
                 round(CAST(len(list_filter(string_split(text, ' '),
                     t -> list_contains(['the','a','data','row','value'], t))) AS DOUBLE) /
                   len(list_filter(string_split(text, ' '), t -> t <> '')), 6) AS stop_ratio
               FROM documents)
               SELECT source, count(*) AS n_docs,
                 ${T.sqlDavg("n_tok")} AS avg_tokens,
                 ${T.sqlDavg("avg_tok_len")} AS avg_tok_len,
                 ${T.sqlDavg("stop_ratio")} AS avg_stop_ratio
               FROM d GROUP BY source ORDER BY source""")),

    QueryDef(
      "text_readability",
      // Flesch reading ease (Flesch 1948; the readability gate next to
      // text_quality's shape heuristics): 206.835 − 1.015·(words/sentence)
      // − 84.6·(syllables/word), with syllables estimated as maximal vowel
      // runs per word (the standard dictionary-free approximation) and a
      // floor of 1 for vowel-less tokens / period-less docs. Pure per-row
      // expressions fused into the scan (map-only at any scale) + one
      // bounded per-source aggregate on the decimal wire. Sentence count =
      // '.!?' occurrences via translate (no regex needed); the only regex
      // work is the per-word vowel-run collapse, where Spark's global
      // regexp_replace pairs with DuckDB's 'g' flag (the piiSql
      // discipline).
      (s, dir) => {
        T.documents(s, dir)
          .select(col("source"),
            expr("filter(split(text, ' '), t -> t <> '')").as("ts"),
            greatest(lit(1),
              length(col("text")) - length(translate(col("text"), ".!?", "")))
              .cast("long").as("sents"))
          .where(size(col("ts")) >= 1)
          .selectExpr("source", "CAST(size(ts) AS BIGINT) AS w", "sents",
            "aggregate(transform(ts, t -> CAST(greatest(1, length(" +
              "regexp_replace(regexp_replace(lower(t), '[aeiouy]+', 'V'), '[^V]', '')" +
              ")) AS BIGINT)), CAST(0 AS BIGINT), (a, x) -> a + x) AS syl")
          .selectExpr("source",
            "CAST(w AS DOUBLE) / sents AS wps",
            "CAST(syl AS DOUBLE) / w AS spw")
          .selectExpr("source", "wps", "spw",
            "206.835 - 1.015 * wps - 84.6 * spw AS flesch")
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            T.davg(col("wps")).as("avg_words_per_sentence"),
            T.davg(col("spw")).as("avg_syllables_per_word"),
            T.davg(col("flesch")).as("avg_flesch"))
          .orderBy("source")
      },
      Some(s"""WITH d AS (SELECT source,
                   list_filter(string_split(text, ' '), t -> t <> '') AS ts,
                   CAST(greatest(1, length(text)
                     - length(translate(text, '.!?', ''))) AS BIGINT) AS sents
                 FROM documents),
               c AS (SELECT source, CAST(len(ts) AS BIGINT) AS w, sents,
                   list_reduce(list_prepend(CAST(0 AS BIGINT),
                     list_transform(ts, t -> CAST(greatest(1, length(
                       regexp_replace(regexp_replace(lower(t), '[aeiouy]+', 'V', 'g'),
                         '[^V]', '', 'g'))) AS BIGINT))),
                     (a, x) -> a + x) AS syl
                 FROM d WHERE len(ts) >= 1),
               r AS (SELECT source,
                   CAST(w AS DOUBLE) / sents AS wps,
                   CAST(syl AS DOUBLE) / w AS spw
                 FROM c),
               f AS (SELECT source, wps, spw,
                   206.835 - 1.015 * wps - 84.6 * spw AS flesch
                 FROM r)
               SELECT source, count(*) AS n_docs,
                 ${T.sqlDavg("wps")} AS avg_words_per_sentence,
                 ${T.sqlDavg("spw")} AS avg_syllables_per_word,
                 ${T.sqlDavg("flesch")} AS avg_flesch
               FROM f GROUP BY source ORDER BY source""")),

    QueryDef(
      "text_pii_redact",
      // PII redaction — the pretraining-curation pass every shipped corpus
      // runs (emails / IPv4 / phone numbers → typed placeholders) with its
      // per-source audit: docs scanned, match counts per type (counted on
      // the ORIGINAL text — audit semantics), docs touched, and the net
      // character delta of the redacted corpus. Map-only regexes fused
      // into the scan; the audit is one bounded aggregate — the shape
      // holds at 100 TB because nothing but the per-source counters ever
      // shuffles. The fixture corpus is synthetic word-salad with zero
      // PII by construction, so every count is 0 and delta is 0 — the
      // row PROVES the zeros against the oracle running the same RE2/Java
      // compatible patterns; MicroSpec redacts a fixture that DOES contain
      // all three types and pins the placeholders land.
      (s, dir) => {
        val red = piiRedact(col("text"))
        T.documents(s, dir).select(col("source"),
            regexp_count(col("text"), lit(PII_EMAIL)).as("ne"),
            regexp_count(col("text"), lit(PII_IPV4)).as("ni"),
            regexp_count(col("text"), lit(PII_PHONE)).as("np"),
            length(col("text")).as("len_orig"), length(red).as("len_red"))
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            sum(col("ne")).as("n_emails"),
            sum(col("ni")).as("n_ips"),
            sum(col("np")).as("n_phones"),
            sum(when(col("ne") + col("ni") + col("np") > 0, 1L)
              .otherwise(0L)).as("docs_redacted"),
            sum((col("len_orig") - col("len_red")).cast("long")).as("chars_delta"))
          .orderBy("source")
      },
      Some(s"""WITH d AS (SELECT source,
                 len(regexp_extract_all(text, '$PII_EMAIL')) AS ne,
                 len(regexp_extract_all(text, '$PII_IPV4')) AS ni,
                 len(regexp_extract_all(text, '$PII_PHONE')) AS np,
                 length(text) AS len_orig,
                 length(regexp_replace(regexp_replace(regexp_replace(text,
                   '$PII_EMAIL', '<EMAIL>', 'g'),
                   '$PII_IPV4', '<IP>', 'g'),
                   '$PII_PHONE', '<PHONE>', 'g')) AS len_red
               FROM documents)
               SELECT source, count(*) AS n_docs,
                 CAST(sum(ne) AS BIGINT) AS n_emails,
                 CAST(sum(ni) AS BIGINT) AS n_ips,
                 CAST(sum(np) AS BIGINT) AS n_phones,
                 CAST(sum(CASE WHEN ne + ni + np > 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS docs_redacted,
                 CAST(sum(len_orig - len_red) AS BIGINT) AS chars_delta
               FROM d GROUP BY source ORDER BY source""")),

    QueryDef(
      "text_langid",
      // Language-ID, n-gram-profile heuristic: learn each language's top-20
      // character trigrams from the corpus (train on the labeled column),
      // score every doc by profile overlap, predict argmax, report the
      // confusion matrix. Two bounded aggregates + one broadcast-able
      // profile join — the scalable shape of every fastText-style LID pass.
      (s, dir) => {
        val docs = T.documents(s, dir)
        // tri feeds both the profile build and the scoring join. r6: NO
        // persist — on the fixture both consumers live in ONE DAG and
        // ReuseExchange dedups the fanOut repartition exchange (pinned by
        // PlanSpec), so only the cheap map-side explode runs twice; the r5
        // persist forced a full materialization of the exploded trigram
        // stream into the block store plus a driver collect/createDataFrame
        // detour (measured cold: 3.6 s → ~2.3 s). At REAL scale fanOut
        // no-ops (no exchange to reuse) and each branch scans the corpus —
        // deliberately so: two streaming passes over source parquet is the
        // correct 100 TB trade, vs caching an exploded trigram stream
        // (several × corpus size) which an engine must never do. The
        // profile is the only state worth keeping: ≤ 20·n_langs rows.
        // Plan hygiene (r5, as dedup_minhash): repartition fans the trigram
        // work past the fixture's 1-task scan; the trigrams are built in
        // one map-side transform and explode_outer'd (explode's inferred
        // non-empty filter would re-evaluate the transform inside the scan
        // stage).
        // length >= 3 on BOTH sides: Spark's sequence(1, n < 1) counts
        // DOWN (bogus grams) while DuckDB's generate_series is empty — the
        // same sub-n-gram guard as udtf_generator/dedup_ngram_jaccard
        val tri = docs
          .transform(T.fanOut(_, col("doc_id")))
          .where(length(col("text")) >= 3)
          .select(col("doc_id"), col("lang"),
            explode_outer(expr(
              "transform(sequence(1, length(text) - 2), i -> substring(text, i, 3))")).as("g"))
        val prof = tri.groupBy(col("lang").as("p_lang"), col("g"))
          .agg(count(lit(1)).as("cnt"))
          .withColumn("rk", row_number().over(
            Window.partitionBy(col("p_lang")).orderBy(col("cnt").desc, col("g").asc)))
          .where(col("rk") <= 20)
          .select(col("p_lang"), col("g"))
        val scored = tri.join(broadcast(prof), "g")
          .groupBy("doc_id", "lang", "p_lang")
          .agg(count(lit(1)).as("hits"))
        val pick = Window.partitionBy(col("doc_id"))
          .orderBy(col("hits").desc, col("p_lang").asc)
        scored.withColumn("rn", row_number().over(pick))
          .where(col("rn") === 1)
          .groupBy(col("lang"), col("p_lang").as("pred"))
          .agg(count(lit(1)).as("n"))
          .orderBy("lang", "pred")
      },
      Some("""WITH tri AS (
                SELECT doc_id, lang, substr(text, CAST(pos AS INT), 3) AS g
                FROM (SELECT doc_id, lang, text,
                        unnest(generate_series(1, length(text) - 2)) AS pos
                      FROM documents WHERE length(text) >= 3) x),
              prof AS (
                SELECT p_lang, g FROM (
                  SELECT lang AS p_lang, g, count(*) AS cnt,
                    row_number() OVER (PARTITION BY lang ORDER BY count(*) DESC, g ASC) AS rk
                  FROM tri GROUP BY lang, g) t
                WHERE rk <= 20),
              scored AS (
                SELECT doc_id, lang, p_lang, count(*) AS hits
                FROM tri JOIN prof USING (g)
                GROUP BY doc_id, lang, p_lang),
              pick AS (
                SELECT lang, p_lang AS pred,
                  row_number() OVER (PARTITION BY doc_id ORDER BY hits DESC, p_lang ASC) AS rn
                FROM scored)
              SELECT lang, pred, count(*) AS n
              FROM pick WHERE rn = 1
              GROUP BY lang, pred ORDER BY lang, pred""")),

    QueryDef(
      "text_fingerprint",
      // Document fingerprinting: position-weighted affine hash over the
      // token stream — f(d) = Σ_i (tid_i · w_i) mod P with tid = the
      // full-length rolling-hash term id (Tables.polyTid, < P by
      // construction) and w_i = (FA·i + FB) mod P. Map + one groupBy(doc) —
      // the O(n) dedup/citation-tracking primitive. r6: the stateless id
      // replaces the denseIds vocab (global distinct + range-sort + join);
      // the whole query is one embarrassingly-parallel map pass + one
      // map-side-combined groupBy, the honest 100 TB shape. Both product
      // factors are < P, so each term stays < 2⁶² at ANY document length
      // and ANY code point.
      (s, dir) => {
        T.documents(s, dir)
          .transform(T.fanOut(_, col("doc_id"))) // 1-row-group fixture scan
          .select(col("doc_id"), posexplode(filter(split(col("text"), " "), t => t =!= "")))
          .toDF("doc_id", "pos", "term")
          .groupBy("doc_id")
          .agg((sum((T.polyTid("term")
            * (((lit(FA) * col("pos")) + lit(FB)) % lit(P))) % lit(P)) % lit(P))
            .as("fingerprint"))
          .groupBy("fingerprint")
          .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("first_doc"))
          .where(col("n_docs") > 1)
          .orderBy("fingerprint")
      },
      Some(s"""WITH toks AS (
                 SELECT doc_id, (pos - 1) AS pos, term FROM (
                   SELECT doc_id,
                     generate_subscripts(list_filter(string_split(text, ' '), t -> t <> ''), 1) AS pos,
                     unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS term
                   FROM documents) x),
               fp AS (SELECT doc_id,
                        -- CAST: DuckDB sum(int) is HUGEINT → BIGINT on the wire
                        CAST((sum(((${T.sqlPolyTid("term")}) * (($FA * pos + $FB) % $P)) % $P) % $P) AS BIGINT) AS fingerprint
                      FROM toks GROUP BY doc_id)
               SELECT fingerprint, count(*) AS n_docs, min(doc_id) AS first_doc
               FROM fp GROUP BY fingerprint HAVING count(*) > 1
               ORDER BY fingerprint""")),

    QueryDef(
      "ml_knn_ivf",
      // The ANN scale path for ml_knn (SURVEY §4.2 declared it; this builds
      // it): IVF coarse quantization. Cells = centroids (vec_id < 10);
      // every vector is assigned to its nearest cell ONCE (O(n·K)); each
      // query probes its nprobe=3 nearest cells and ranks only vectors in
      // those cells — candidate set ~ nprobe/K of the data instead of all
      // of it. At 100 TB: repartition by cell id and the probe join becomes
      // partition-pruned. Exact same deterministic arithmetic in DuckDB, so
      // the approximate result itself is oracle-checked.
      (s, dir) => {
        val e = T.embeddings(s, dir)
        val cent = e.where(col("vec_id") < 10)
          .select(col("vec_id").as("cid"), col("embedding").as("c_emb"))
        val dist = graft.functions.Vec.l2(s, "embedding", "c_emb")
        // assignment: nearest cell per vector
        val aw = Window.partitionBy(col("vec_id")).orderBy(col("d"), col("cid"))
        val assigned = e.transform(T.fanOut(_, col("vec_id")))
          .crossJoin(broadcast(cent))
          .select(col("vec_id"), col("embedding"), col("cid"), dist.as("d"))
          .withColumn("rn", row_number().over(aw)).where(col("rn") === 1)
          .select(col("vec_id").as("n_id"), col("embedding").as("n_emb"), col("cid"))
        // probes: 3 nearest cells per query
        val qw = Window.partitionBy(col("q_id")).orderBy(col("qd"), col("cid"))
        val probes = e.where(col("vec_id") < 20)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
          .crossJoin(broadcast(cent))
          .select(col("q_id"), col("q_emb"), col("cid"),
            graft.functions.Vec.l2(s, "q_emb", "c_emb").as("qd"))
          .withColumn("prb", row_number().over(qw)).where(col("prb") <= 3)
          .select(col("q_id"), col("q_emb"), col("cid"))
        // rank candidates within probed cells only
        val kw = Window.partitionBy(col("q_id")).orderBy(col("d"), col("n_id"))
        probes.join(assigned, "cid")
          .where(col("q_id") =!= col("n_id"))
          .select(col("q_id"), col("n_id"),
            graft.functions.Vec.l2(s, "q_emb", "n_emb").as("d"))
          .withColumn("rn", row_number().over(kw)).where(col("rn") <= 5)
          .select(col("q_id"), col("rn"), col("n_id"), round(col("d"), 6).as("dist"))
          .orderBy("q_id", "rn")
      },
      Some("""WITH cent AS (SELECT vec_id AS cid, embedding AS c_emb FROM embeddings WHERE vec_id < 10),
               assigned AS (
                 -- row_number (d, cid) tie-break mirrors Spark's window
                 -- (ADVICE r3: arg_min ties are unspecified in DuckDB)
                 SELECT n_id, n_emb, cid FROM (
                   SELECT e.vec_id AS n_id, e.embedding AS n_emb, c.cid,
                     row_number() OVER (PARTITION BY e.vec_id
                       ORDER BY list_distance(CAST(e.embedding AS DOUBLE[]), CAST(c.c_emb AS DOUBLE[])), c.cid) AS rn
                   FROM embeddings e CROSS JOIN cent c) t
                 WHERE rn = 1),
               probes AS (
                 SELECT q_id, q_emb, cid FROM (
                   SELECT e.vec_id AS q_id, e.embedding AS q_emb, c.cid,
                     row_number() OVER (PARTITION BY e.vec_id
                       ORDER BY list_distance(CAST(e.embedding AS DOUBLE[]), CAST(c.c_emb AS DOUBLE[])), c.cid) AS prb
                   FROM embeddings e CROSS JOIN cent c
                   WHERE e.vec_id < 20) t
                 WHERE prb <= 3)
              SELECT q_id, rn, n_id, dist FROM (
                SELECT p.q_id, a.n_id,
                  round(list_distance(CAST(p.q_emb AS DOUBLE[]), CAST(a.n_emb AS DOUBLE[])), 6) AS dist,
                  row_number() OVER (PARTITION BY p.q_id
                    ORDER BY list_distance(CAST(p.q_emb AS DOUBLE[]), CAST(a.n_emb AS DOUBLE[])), a.n_id) AS rn
                FROM probes p JOIN assigned a USING (cid)
                WHERE p.q_id <> a.n_id) r
              WHERE rn <= 5 ORDER BY q_id, rn""")),

    QueryDef(
      "ml_ivf_nprobe_sweep",
      // The IVF tuning curve — recall@5 AND scanned-fraction per nprobe ∈
      // {1, 2, 3}: the table every ANN deployment produces before picking
      // its operating point (faiss's nprobe sweep), here oracle-checked
      // because the arithmetic is deterministic end-to-end. One cell
      // assignment pass (frozen — three probe depths reuse it), one
      // brute-force exact top-5 over the bounded query sample as ground
      // truth, and the probe-depth dimension fans out as a 3-row
      // broadcast, so the sweep costs ONE candidate join, not three.
      // scan_frac is the cost axis (fraction of the corpus ranked);
      // recall_at_5 is the quality axis — monotone in nprobe by
      // construction, which the oracle would catch drifting.
      (s, dir) => {
        val e = T.embeddings(s, dir)
        val n = e.agg(count(lit(1)).as("n_corpus"))
        val cent = e.where(col("vec_id") < 10)
          .select(col("vec_id").as("cid"), col("embedding").as("c_emb"))
        val aw = Window.partitionBy(col("vec_id")).orderBy(col("d"), col("cid"))
        val assigned = T.freeze(e.transform(T.fanOut(_, col("vec_id")))
          .crossJoin(broadcast(cent))
          .select(col("vec_id"), col("embedding"), col("cid"),
            graft.functions.Vec.l2(s, "embedding", "c_emb").as("d"))
          .withColumn("rn", row_number().over(aw)).where(col("rn") === 1)
          .select(col("vec_id").as("n_id"), col("embedding").as("n_emb"), col("cid")))
        val queries = e.where(col("vec_id") < 20)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
        val qw = Window.partitionBy(col("q_id")).orderBy(col("qd"), col("cid"))
        val probed = queries.crossJoin(broadcast(cent))
          .select(col("q_id"), col("q_emb"), col("cid"),
            graft.functions.Vec.l2(s, "q_emb", "c_emb").as("qd"))
          .withColumn("prb", row_number().over(qw)).where(col("prb") <= 3)
        val nps = s.sql("SELECT * FROM VALUES (1), (2), (3) AS t(np)")
        val cand = probed.crossJoin(broadcast(nps)).where(col("prb") <= col("np"))
          .join(assigned, "cid").where(col("q_id") =!= col("n_id"))
          .select(col("np"), col("q_id"),  col("n_id"),
            graft.functions.Vec.l2(s, "q_emb", "n_emb").as("d"))
        val kw = Window.partitionBy(col("np"), col("q_id"))
          .orderBy(col("d"), col("n_id"))
        val ivf5 = cand.withColumn("rn", row_number().over(kw))
          .where(col("rn") <= 5).select("np", "q_id", "n_id")
        val ew = Window.partitionBy(col("q_id")).orderBy(col("d"), col("n_id"))
        val exact5 = queries
          .crossJoin(e.select(col("vec_id").as("n_id"), col("embedding").as("n_emb"))
            .transform(T.fanOut(_)))
          .where(col("q_id") =!= col("n_id"))
          .select(col("q_id"), col("n_id"),
            graft.functions.Vec.l2(s, "q_emb", "n_emb").as("d"))
          .withColumn("rn", row_number().over(ew))
          .where(col("rn") <= 5).select(col("q_id"), col("n_id"), lit(1).as("hit"))
        val nq = queries.agg(count(lit(1)).as("nq"))
        val scans = cand.groupBy("np", "q_id").agg(count(lit(1)).as("nc"))
          .crossJoin(broadcast(n))
          .groupBy("np")
          .agg(T.davg(expr("CAST(nc AS DOUBLE) / n_corpus")).as("scan_frac"))
        ivf5.join(exact5, Seq("q_id", "n_id"), "left")
          .groupBy("np")
          .agg(sum(coalesce(col("hit"), lit(0))).as("hits"))
          .crossJoin(broadcast(nq))
          .join(scans, "np")
          .selectExpr("np AS nprobe", "CAST(nq AS BIGINT) AS n_queries",
            "round(CAST(hits AS DOUBLE) / (5 * nq), 6) AS recall_at_5",
            "scan_frac")
          .orderBy("nprobe")
      },
      Some("""WITH n AS (SELECT count(*) AS n_corpus FROM embeddings),
               cent AS (SELECT vec_id AS cid, embedding AS c_emb
                        FROM embeddings WHERE vec_id < 10),
               assigned AS (SELECT n_id, n_emb, cid FROM (
                   SELECT e.vec_id AS n_id, e.embedding AS n_emb, c.cid,
                     row_number() OVER (PARTITION BY e.vec_id
                       ORDER BY list_distance(CAST(e.embedding AS DOUBLE[]), CAST(c.c_emb AS DOUBLE[])), c.cid) AS rn
                   FROM embeddings e CROSS JOIN cent c) t
                 WHERE rn = 1),
               q AS (SELECT vec_id AS q_id, embedding AS q_emb
                     FROM embeddings WHERE vec_id < 20),
               probed AS (SELECT q_id, q_emb, cid, prb FROM (
                   SELECT q.q_id, q.q_emb, c.cid,
                     row_number() OVER (PARTITION BY q.q_id
                       ORDER BY list_distance(CAST(q.q_emb AS DOUBLE[]), CAST(c.c_emb AS DOUBLE[])), c.cid) AS prb
                   FROM q CROSS JOIN cent c) t
                 WHERE prb <= 3),
               cand AS (SELECT np, p.q_id, a.n_id,
                   list_distance(CAST(p.q_emb AS DOUBLE[]), CAST(a.n_emb AS DOUBLE[])) AS d
                 FROM probed p
                 CROSS JOIN (VALUES (1), (2), (3)) nps(np)
                 JOIN assigned a USING (cid)
                 WHERE p.prb <= np AND p.q_id <> a.n_id),
               ivf5 AS (SELECT np, q_id, n_id FROM (
                   SELECT np, q_id, n_id,
                     row_number() OVER (PARTITION BY np, q_id
                       ORDER BY d, n_id) AS rn
                   FROM cand) t
                 WHERE rn <= 5),
               exact5 AS (SELECT q_id, n_id, 1 AS hit FROM (
                   SELECT q.q_id, e.vec_id AS n_id,
                     row_number() OVER (PARTITION BY q.q_id
                       ORDER BY list_distance(CAST(q.q_emb AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])), e.vec_id) AS rn
                   FROM q CROSS JOIN embeddings e
                   WHERE q.q_id <> e.vec_id) t
                 WHERE rn <= 5),
               nq AS (SELECT count(*) AS nq FROM q),
               scans AS (SELECT np,
                   round(CAST(sum(CAST((CAST(nc AS DOUBLE) / n_corpus) AS DECIMAL(18,4))) AS DOUBLE) / count(*), 6) AS scan_frac
                 FROM (SELECT np, q_id, count(*) AS nc
                       FROM cand GROUP BY np, q_id) c CROSS JOIN n
                 GROUP BY np),
               hits AS (SELECT np,
                   CAST(sum(coalesce(hit, 0)) AS BIGINT) AS hits
                 FROM ivf5 LEFT JOIN exact5 USING (q_id, n_id)
                 GROUP BY np)
               SELECT np AS nprobe, CAST(nq AS BIGINT) AS n_queries,
                 round(CAST(hits AS DOUBLE) / (5 * nq), 6) AS recall_at_5,
                 scan_frac
               FROM hits CROSS JOIN nq JOIN scans USING (np)
               ORDER BY nprobe""")),

    QueryDef(
      "ml_knn_pq",
      // (body shared with ml_index_pq_save_load through pqTrain /
      // pqAdcSearch — one semantics, with and without the parquet
      // artifact boundary)
      // Product quantization — the OTHER half of the FAISS/cuML IVF-PQ
      // index family next to ml_knn_ivf's coarse cells and ml_knn_sq8's
      // scalar codes: the 64-dim space splits into M = 2 subspaces of 32
      // dims, each subspace trains a 16-entry codebook by ONE Lloyd round
      // (seed = the first 16 corpus subvectors, assign, recenter — the
      // ml_kmeans_update dataflow per subspace; more rounds iterate the
      // same two aggregations), and every vector stores only its 2
      // nearest-code ids — 2 bytes instead of 256, the compression that
      // makes billion-vector indexes RAM-resident. Query-time is
      // ASYMMETRIC distance computation (ADC): one bounded per-query
      // lookup table d²(q_m, code) (|queries|·M·16 rows, broadcast), then
      // every coded vector's distance is TWO lookups — the scan never
      // touches raw floats, which is the PQ bandwidth win. Dims stay
      // EXPLODED through the distance passes (the sq8 per-dim equi-join
      // both engines share) with d² on the exact decimal wire, and the
      // trained centroids are ratios of exact sums — so every code
      // assignment, the LUT, and the final ranking are bit-deterministic
      // and the approximate result itself is oracle-checked end-to-end.
      // At 100 TB the train runs on a bounded sample (cuML's fit [R]
      // does exactly that) and the encode/ADC passes stay map-shaped.
      (s, dir) => {
        val (cb1, codes) = pqTrain(s, dir)
        pqAdcSearch(s, dir, cb1, codes)
      },
      Some(sqlPqAdcOracle)),

    QueryDef(
      "ml_index_pq_save_load",
      // PQ-codebook persistence (the second half of the vector-index
      // deploy boundary next to ml_index_save_load's IVF+SQ8 artifacts —
      // faiss serializes exactly these two): the trained subspace
      // codebooks (m, code, j, c) and the 2-byte-per-vector code table
      // (n_id, m, code) are EXPORTED as parquet, re-READ in fresh scans,
      // and the ADC search runs THROUGH the reloaded artifacts — only
      // the query LUT ever touches raw floats, which is what makes the
      // reloaded index self-sufficient. Codebook doubles are exact
      // ratios of exact sums and codes are ints, so parquet round-trips
      // losslessly and the reloaded search is bit-identical to
      // ml_knn_pq's in-session one — MicroSpec pins that equality; the
      // oracle re-derives the same index from raw data (shared text
      // with ml_knn_pq: one semantics, with and without the boundary).
      (s, dir) => {
        val base = s"/tmp/graft_io/pqindex_${dir.replaceAll("[^A-Za-z0-9.]", "_")}"
        val (cb1, codes) = pqTrain(s, dir)
        cb1.coalesce(1).write.mode(org.apache.spark.sql.SaveMode.Overwrite)
          .parquet(s"$base/codebooks")
        codes.coalesce(4).write.mode(org.apache.spark.sql.SaveMode.Overwrite)
          .parquet(s"$base/codes")
        pqAdcSearch(s, dir,
          s.read.parquet(s"$base/codebooks"),
          s.read.parquet(s"$base/codes"))
      },
      Some(sqlPqAdcOracle)),

    QueryDef(
      "ml_knn_sq8",
      // The SQ8 scalar-quantizer half of cuML's ivfsq ANN method [R]:
      // per-DIMENSION 8-bit uniform quantization (codebook = 64 (min, max)
      // pairs from one bounded aggregate — 1 byte/dim instead of 4, the
      // 4× memory/bandwidth win that makes billion-vector indexes fit),
      // then kNN on the RECONSTRUCTED values x̂ = mn + code·(mx−mn)/255.
      // Registered as the quantizer's accuracy surface: brute-force over
      // the quantized corpus for 10 queries, so the approximation itself
      // is oracle-checked (recall vs the exact ml_knn pinned in
      // MicroSpec); composing with ml_knn_ivf's probe join gives the full
      // ivfsq. Dims are kept EXPLODED through the distance pass — the
      // per-dim equi-join both engines share verbatim — and d² rides the
      // exact decimal wire (order-free), so ranking is deterministic.
      // The mx > mn guard keeps a constant dimension at its exact value.
      (s, dir) => sq8Knn(s, dir)
        .select(col("q_id"), col("rn"), col("n_id"),
          round(sqrt(col("d2")), 6).as("dist"))
        .orderBy("q_id", "rn"),
      Some(s"""WITH $sqlSq8Ctes
               SELECT q_id, rn, n_id, round(sqrt(d2), 6) AS dist
               FROM sq5 ORDER BY q_id, rn""")),

    QueryDef(
      "ml_recall_at_k",
      // Recall@5 of the SQ8 quantized index against the EXACT kNN — the
      // ANN-quality measurement AS A REGISTERED QUERY (the number an
      // index-tuning run tracks per deploy, not just a test assertion):
      // both rankings computed in one dataflow — the exact side is the
      // codegen'd VecL2Dist broadcast×stream pass, the approximate side
      // the shared sq8Knn chain — joined on (q_id, n_id) membership; each
      // query's recall is the matched fraction of its top-5. Oracle
      // recomputes both chains (list_distance ↔ VecL2Dist is the
      // ml_knn-proven pairing). The overall mean is MicroSpec-pinned
      // against the ml_knn_sq8 test's floor.
      (s, dir) => {
        val e = T.embeddings(s, dir)
        val q = e.where(col("vec_id") < 10)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
        val cand = e.transform(T.fanOut(_, col("vec_id")))
          .select(col("vec_id").as("n_id"), col("embedding").as("n_emb"))
        val w = Window.partitionBy(col("q_id")).orderBy(col("d"), col("n_id"))
        val exact = cand.crossJoin(broadcast(q))
          .where(col("q_id") =!= col("n_id"))
          .select(col("q_id"), col("n_id"),
            graft.functions.Vec.l2(s, "q_emb", "n_emb").as("d"))
          .withColumn("rn", row_number().over(w)).where(col("rn") <= 5)
          .select(col("q_id"), col("n_id")).withColumn("hit", lit(1L))
        sq8Knn(s, dir).select(col("q_id"), col("n_id"))
          .join(exact, Seq("q_id", "n_id"), "left")
          .groupBy("q_id")
          .agg((sum(coalesce(col("hit"), lit(0L))).cast("double") / 5).as("recall"))
          .selectExpr("q_id", "round(recall, 2) AS recall_at_5")
          .orderBy("q_id")
      },
      Some(s"""WITH $sqlSq8Ctes,
                 exact AS (SELECT q_id, n_id FROM (
                     SELECT q.vec_id AS q_id, e.vec_id AS n_id,
                       row_number() OVER (PARTITION BY q.vec_id
                         ORDER BY list_distance(CAST(q.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])), e.vec_id) AS rn
                     FROM embeddings q CROSS JOIN embeddings e
                     WHERE q.vec_id < 10 AND q.vec_id <> e.vec_id) t
                   WHERE rn <= 5),
                 j AS (SELECT s.q_id,
                     CASE WHEN e.n_id IS NOT NULL THEN 1 ELSE 0 END AS hit
                   FROM sq5 s LEFT JOIN exact e
                     ON e.q_id = s.q_id AND e.n_id = s.n_id)
               SELECT q_id,
                 round(CAST(sum(hit) AS DOUBLE) / 5, 2) AS recall_at_5
               FROM j GROUP BY q_id ORDER BY q_id""")),

    QueryDef(
      "ml_index_save_load",
      // Vector-INDEX persistence roundtrip (VERDICT r12 missing #3 — the
      // deploy boundary a 100 TB ANN pipeline actually ships, faiss's
      // write_index/read_index): the IVF+SQ8 index artifacts — centroids,
      // the 64-entry (min, max) SQ8 codebook, and the per-vector code
      // table (cell id + 8-bit codes, the 4×-smaller payload that IS the
      // index) — are EXPORTED as three parquet datasets, re-READ in fresh
      // scans, and the probe-pruned search runs THROUGH the reloaded
      // artifacts only (the database side never touches raw embeddings).
      // Parquet round-trips doubles and int64 codes losslessly, so the
      // reloaded search is bit-identical to the in-session one — MicroSpec
      // pins that equality; this row proves the boundary end-to-end
      // against the oracle, which re-derives the same index from raw data.
      // Output: top-5 per query by reconstructed d² (exact decimal wire).
      (s, dir) => {
        val base = s"/tmp/graft_io/vecindex_${dir.replaceAll("[^A-Za-z0-9.]", "_")}"
        val (cent, codebook, codes) = ivfSq8IndexFrames(s, dir)
        // narrow artifact writes: centroids/codebook are K- and dim-sized,
        // codes ~n·64 rows — 32-way writes paid more in task/file fixed
        // cost than the data is worth; a real deploy partitions codes by
        // cell id instead
        cent.coalesce(1).write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(s"$base/centroids")
        codebook.coalesce(1).write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(s"$base/codebook")
        codes.coalesce(4).write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(s"$base/codes")
        ivfSq8Search(s, dir,
          s.read.parquet(s"$base/centroids"),
          s.read.parquet(s"$base/codebook"),
          s.read.parquet(s"$base/codes"))
      },
      Some("""WITH ex AS (SELECT vec_id,
                   generate_subscripts(CAST(embedding AS DOUBLE[]), 1) AS i,
                   unnest(CAST(embedding AS DOUBLE[])) AS x
                 FROM embeddings),
               st AS (SELECT i, min(x) AS mn, max(x) AS mx FROM ex GROUP BY i),
               cent AS (SELECT vec_id AS cid, embedding AS c_emb
                        FROM embeddings WHERE vec_id < 10),
               cells AS (SELECT vec_id, cid FROM (
                   SELECT e.vec_id, c.cid,
                     row_number() OVER (PARTITION BY e.vec_id
                       ORDER BY list_distance(CAST(e.embedding AS DOUBLE[]),
                                              CAST(c.c_emb AS DOUBLE[])), c.cid) AS rn
                   FROM embeddings e CROSS JOIN cent c) t
                 WHERE rn = 1),
               codes AS (SELECT ex.vec_id, cells.cid, ex.i,
                   CASE WHEN mx > mn
                     THEN CAST(floor((x - mn) / (mx - mn) * 255) AS BIGINT)
                     ELSE 0 END AS code
                 FROM ex JOIN st USING (i)
                 JOIN cells ON cells.vec_id = ex.vec_id),
               recon AS (SELECT vec_id, cid, i,
                   CASE WHEN mx > mn
                     THEN mn + CAST(code AS DOUBLE) * (mx - mn) / 255
                     ELSE mn END AS xr
                 FROM codes JOIN st USING (i)),
               probes AS (SELECT q_id, cid FROM (
                   SELECT e.vec_id AS q_id, c.cid,
                     row_number() OVER (PARTITION BY e.vec_id
                       ORDER BY list_distance(CAST(e.embedding AS DOUBLE[]),
                                              CAST(c.c_emb AS DOUBLE[])), c.cid) AS prb
                   FROM embeddings e CROSS JOIN cent c
                   WHERE e.vec_id < 10) t
                 WHERE prb <= 3),
               qv AS (SELECT vec_id AS q_id, i, xr AS qx
                      FROM recon WHERE vec_id < 10),
               dd AS (SELECT p.q_id, n.vec_id AS n_id,
                   CAST(sum(CAST((qv.qx - n.xr) * (qv.qx - n.xr) AS DECIMAL(30,12))) AS DOUBLE) AS d2
                 FROM probes p
                 JOIN recon n ON n.cid = p.cid AND n.vec_id <> p.q_id
                 JOIN qv ON qv.q_id = p.q_id AND qv.i = n.i
                 GROUP BY p.q_id, n.vec_id)
              SELECT q_id, rn, n_id, round(d2, 6) AS d2 FROM (
                SELECT q_id, n_id, d2,
                  row_number() OVER (PARTITION BY q_id ORDER BY d2, n_id) AS rn
                FROM dd) t
              WHERE rn <= 5 ORDER BY q_id, rn""")),

    QueryDef(
      "ml_index_incremental",
      // The faiss add() path (VERDICT r14 missing #1 — the vector twin of
      // dedup_incremental's refresh shape): a persisted IVF+SQ8 index built
      // and TRAINED on the base corpus only (vec_id % 10 ≠ 7) ingests a new
      // vector batch (vec_id % 10 = 7) WITHOUT retraining — the new batch
      // is assigned to the RELOADED centroids and encoded with the RELOADED
      // per-dim codebook, old codes are never recomputed or rewritten, and
      // the batch lands as its own immutable parquet segment next to the
      // base one (a parquet append-mode write would duplicate rows on
      // re-run; segment-per-batch is also how real stores ingest — the
      // merged index is the union of reloaded segments). The search then
      // runs THROUGH the merged artifacts only; is_new marks neighbors
      // served from the ingested batch, proving they are reachable.
      // Because add() never touches the quantizer, the merged index is
      // BIT-IDENTICAL to encoding the full corpus with the base-trained
      // quantizer in one shot — MicroSpec pins that equality (the
      // dedup_incremental discipline), and the oracle re-derives exactly
      // that: train on base, encode all, search.
      (s, dir) => {
        val base = s"/tmp/graft_io/vecindex_incr_${dir.replaceAll("[^A-Za-z0-9.]", "_")}"
        val e = T.embeddings(s, dir)
        val (cent, codebook, codes) =
          ivfSq8IndexFramesOn(s, e.where(col("vec_id") % 10 =!= 7))
        cent.coalesce(1).write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(s"$base/centroids")
        codebook.coalesce(1).write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(s"$base/codebook")
        codes.coalesce(4).write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(s"$base/codes")
        // --- the ingest: everything below reads the RELOADED artifacts
        val rCent = s.read.parquet(s"$base/centroids")
        val rCb = s.read.parquet(s"$base/codebook")
        val batch = e.where(col("vec_id") % 10 === 7)
          .transform(T.fanOut(_, col("vec_id")))
        ivfSq8Encode(s, batch, rCent, rCb)
          .coalesce(1).write.mode(org.apache.spark.sql.SaveMode.Overwrite)
          .parquet(s"$base/codes_b1")
        val merged = s.read.parquet(s"$base/codes")
          .unionByName(s.read.parquet(s"$base/codes_b1"))
        ivfSq8Search(s, dir, rCent, rCb, merged)
          .selectExpr("q_id", "rn", "n_id", "d2",
            "CAST(CASE WHEN n_id % 10 = 7 THEN 1 ELSE 0 END AS INT) AS is_new")
      },
      Some("""WITH bse AS (SELECT * FROM embeddings WHERE vec_id % 10 <> 7),
               ex AS (SELECT vec_id,
                   generate_subscripts(CAST(embedding AS DOUBLE[]), 1) AS i,
                   unnest(CAST(embedding AS DOUBLE[])) AS x
                 FROM bse),
               st AS (SELECT i, min(x) AS mn, max(x) AS mx FROM ex GROUP BY i),
               cent AS (SELECT vec_id AS cid, embedding AS c_emb
                        FROM bse WHERE vec_id < 10),
               axe AS (SELECT vec_id,
                   generate_subscripts(CAST(embedding AS DOUBLE[]), 1) AS i,
                   unnest(CAST(embedding AS DOUBLE[])) AS x
                 FROM embeddings),
               cells AS (SELECT vec_id, cid FROM (
                   SELECT e.vec_id, c.cid,
                     row_number() OVER (PARTITION BY e.vec_id
                       ORDER BY list_distance(CAST(e.embedding AS DOUBLE[]),
                                              CAST(c.c_emb AS DOUBLE[])), c.cid) AS rn
                   FROM embeddings e CROSS JOIN cent c) t
                 WHERE rn = 1),
               codes AS (SELECT axe.vec_id, cells.cid, axe.i,
                   CASE WHEN mx > mn
                     THEN CAST(floor((x - mn) / (mx - mn) * 255) AS BIGINT)
                     ELSE 0 END AS code
                 FROM axe JOIN st USING (i)
                 JOIN cells ON cells.vec_id = axe.vec_id),
               recon AS (SELECT vec_id, cid, i,
                   CASE WHEN mx > mn
                     THEN mn + CAST(code AS DOUBLE) * (mx - mn) / 255
                     ELSE mn END AS xr
                 FROM codes JOIN st USING (i)),
               probes AS (SELECT q_id, cid FROM (
                   SELECT e.vec_id AS q_id, c.cid,
                     row_number() OVER (PARTITION BY e.vec_id
                       ORDER BY list_distance(CAST(e.embedding AS DOUBLE[]),
                                              CAST(c.c_emb AS DOUBLE[])), c.cid) AS prb
                   FROM embeddings e CROSS JOIN cent c
                   WHERE e.vec_id < 10) t
                 WHERE prb <= 3),
               qv AS (SELECT vec_id AS q_id, i, xr AS qx
                      FROM recon WHERE vec_id < 10),
               dd AS (SELECT p.q_id, n.vec_id AS n_id,
                   CAST(sum(CAST((qv.qx - n.xr) * (qv.qx - n.xr) AS DECIMAL(30,12))) AS DOUBLE) AS d2
                 FROM probes p
                 JOIN recon n ON n.cid = p.cid AND n.vec_id <> p.q_id
                 JOIN qv ON qv.q_id = p.q_id AND qv.i = n.i
                 GROUP BY p.q_id, n.vec_id)
              SELECT q_id, rn, n_id, round(d2, 6) AS d2,
                CAST(CASE WHEN n_id % 10 = 7 THEN 1 ELSE 0 END AS INT) AS is_new
              FROM (
                SELECT q_id, n_id, d2,
                  row_number() OVER (PARTITION BY q_id ORDER BY d2, n_id) AS rn
                FROM dd) t
              WHERE rn <= 5 ORDER BY q_id, rn""")),

    QueryDef(
      "text_fuzzy_terms",
      // Vocabulary typo/variant detection — edit-distance pairing over
      // the TOP-100 terms (the monitored slice; at corpus scale the
      // candidate generation is an LSH over character n-grams, this
      // bounded top-k is what a quality dashboard actually renders):
      // both engines implement classic unit-cost Levenshtein, so the
      // integer distances agree exactly; pairs at distance ≤ 2 with both
      // terms' frequencies — the "merge these tokens?" review queue.
      // Plan: one vocab count + TakeOrdered top-100 + a 100×100 bounded
      // self-join (never the raw vocabulary squared).
      (s, dir) => {
        val top = T.documents(s, dir).transform(T.fanOut(_, col("doc_id")))
          .selectExpr("explode(filter(split(text, ' '), t -> t <> '')) AS t")
          .select(lower(col("t")).as("term"))
          .groupBy("term").agg(count(lit(1)).as("cnt"))
          .orderBy(col("cnt").desc, col("term")).limit(100)
        val a = top.select(col("term").as("term_a"), col("cnt").as("cnt_a"))
        val b = top.select(col("term").as("term_b"), col("cnt").as("cnt_b"))
        a.crossJoin(broadcast(b))
          .where(col("term_a") < col("term_b"))
          .select(col("term_a"), col("term_b"), col("cnt_a"), col("cnt_b"),
            levenshtein(col("term_a"), col("term_b")).as("edit_dist"))
          .where(col("edit_dist") <= 2)
          .orderBy("edit_dist", "term_a", "term_b")
      },
      Some("""WITH tk AS (SELECT lower(t) AS term FROM (
                   SELECT unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS t
                   FROM documents) x),
                 top AS (SELECT term, count(*) AS cnt FROM tk GROUP BY term
                         ORDER BY cnt DESC, term LIMIT 100),
                 p AS (SELECT a.term AS term_a, b.term AS term_b,
                     a.cnt AS cnt_a, b.cnt AS cnt_b,
                     CAST(levenshtein(a.term, b.term) AS INT) AS edit_dist
                   FROM top a CROSS JOIN top b
                   WHERE a.term < b.term)
               SELECT term_a, term_b, cnt_a, cnt_b, edit_dist
               FROM p WHERE edit_dist <= 2
               ORDER BY edit_dist, term_a, term_b""")),

    QueryDef(
      "ml_mrr",
      // Mean Reciprocal Rank — the third retrieval-evaluation headline
      // next to recall@k and NDCG: the position of the FIRST same-label
      // hit per query, scored 1/rank (0 if no hit in the top-20 probe
      // depth). Same cosine ranking pass as ml_ndcg; the metric reduces
      // to one min-over-relevant aggregate — at any scale this is the
      // cheapest of the three to monitor per deploy. The overall MRR is
      // emitted as its own row (q_id = -1) so the summary a dashboard
      // reads is part of the oracle-checked result, not a client-side
      // afterthought.
      (s, dir) => {
        val e = T.embeddings(s, dir).select(col("vec_id"), col("label"),
          col("embedding"),
          sqrt(graft.functions.Vec.dot(s, "embedding", "embedding")).as("nrm"))
        val q = e.where(col("vec_id") < 10)
          .select(col("vec_id").as("q_id"), col("label").as("q_lbl"),
            col("embedding").as("q_emb"), col("nrm").as("q_nrm"))
        val cand = e.transform(T.fanOut(_, col("vec_id")))
          .select(col("vec_id").as("n_id"), col("label").as("n_lbl"),
            col("embedding").as("n_emb"), col("nrm").as("n_nrm"))
        val cos = graft.functions.Vec.dot(s, "q_emb", "n_emb") / (col("q_nrm") * col("n_nrm"))
        val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("n_id"))
        val perQ = cand.crossJoin(broadcast(q))
          .where(col("q_id") =!= col("n_id"))
          .select(col("q_id"), col("q_lbl"), col("n_lbl"), col("n_id"), cos.as("sim"))
          .withColumn("rn", row_number().over(w)).where(col("rn") <= 20)
          .groupBy("q_id")
          .agg(min(when(col("n_lbl") === col("q_lbl"), col("rn"))).as("first_hit"))
          .selectExpr("q_id", "first_hit",
            "CASE WHEN first_hit IS NULL THEN 0e0 ELSE 1e0 / first_hit END AS rr")
        perQ.selectExpr("q_id", "first_hit", "round(rr, 6) AS rr")
          .unionAll(perQ.agg(T.xsum(col("rr")).as("s"), count(lit(1)).as("n"))
            .selectExpr("CAST(-1 AS BIGINT) AS q_id", "CAST(NULL AS INT) AS first_hit",
              "round(s / n, 6) AS rr"))
          .orderBy("q_id")
      },
      Some(s"""WITH ranked AS (SELECT q_id, q_lbl, n_lbl, rn FROM (
                   SELECT q.vec_id AS q_id, q.label AS q_lbl, e.label AS n_lbl,
                     row_number() OVER (PARTITION BY q.vec_id
                       ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])) DESC, e.vec_id) AS rn
                   FROM embeddings q CROSS JOIN embeddings e
                   WHERE q.vec_id < 10 AND q.vec_id <> e.vec_id) t
                 WHERE rn <= 20),
                 perq AS (SELECT q_id,
                     CAST(min(CASE WHEN n_lbl = q_lbl THEN rn END) AS INT) AS first_hit
                   FROM ranked GROUP BY q_id),
                 rrs AS (SELECT q_id, first_hit,
                     CASE WHEN first_hit IS NULL THEN 0e0 ELSE 1e0 / first_hit END AS rr
                   FROM perq)
               SELECT q_id, first_hit, round(rr, 6) AS rr FROM rrs
               UNION ALL
               SELECT CAST(-1 AS BIGINT), CAST(NULL AS INT),
                 round(${T.sqlXsum("rr")} / count(*), 6)
               FROM rrs
               ORDER BY q_id""")),

    QueryDef(
      "ml_ndcg",
      // NDCG@10 for label-relevance retrieval — the ranking-quality
      // metric of the embedding search stack: rank all candidates by
      // cosine (the ml_knn_cosine pairing: codegen'd VecDot ↔ DuckDB
      // list_cosine_similarity), relevance = same-label indicator,
      // DCG = Σ rel/log2(pos+1) over the top-10, IDCG = the all-relevant
      // ideal over the same 10 positions (every label class holds ≥ 10
      // vectors, so the truncated ideal is exact). Logs are
      // lnR-collapsed; sums ride the exact wire. Output per query:
      // same-label hits in the top-10 + NDCG.
      (s, dir) => {
        val e = T.embeddings(s, dir).select(col("vec_id"), col("label"),
          col("embedding"),
          sqrt(graft.functions.Vec.dot(s, "embedding", "embedding")).as("nrm"))
        val q = e.where(col("vec_id") < 10)
          .select(col("vec_id").as("q_id"), col("label").as("q_lbl"),
            col("embedding").as("q_emb"), col("nrm").as("q_nrm"))
        val cand = e.transform(T.fanOut(_, col("vec_id")))
          .select(col("vec_id").as("n_id"), col("label").as("n_lbl"),
            col("embedding").as("n_emb"), col("nrm").as("n_nrm"))
        val cos = graft.functions.Vec.dot(s, "q_emb", "n_emb") / (col("q_nrm") * col("n_nrm"))
        val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("n_id"))
        cand.crossJoin(broadcast(q))
          .where(col("q_id") =!= col("n_id"))
          .select(col("q_id"), col("q_lbl"), col("n_lbl"), col("n_id"), cos.as("sim"))
          .withColumn("rn", row_number().over(w)).where(col("rn") <= 10)
          .selectExpr("q_id",
            "CASE WHEN n_lbl = q_lbl THEN 1 ELSE 0 END AS rel",
            "1e0 / (CAST(CAST(ln(CAST(rn + 1 AS DOUBLE)) AS FLOAT) AS DOUBLE) / CAST(CAST(ln(2e0) AS FLOAT) AS DOUBLE)) AS gain")
          .groupBy("q_id")
          .agg(sum(col("rel")).cast("long").as("n_rel_top10"),
            T.xsum(col("rel") * col("gain")).as("dcg"),
            T.xsum(col("gain")).as("idcg"))
          .selectExpr("q_id", "n_rel_top10", "round(dcg / idcg, 6) AS ndcg_at_10")
          .orderBy("q_id")
      },
      Some("""WITH ranked AS (SELECT q_id, rel, rn FROM (
                   SELECT q.vec_id AS q_id,
                     CASE WHEN e.label = q.label THEN 1 ELSE 0 END AS rel,
                     row_number() OVER (PARTITION BY q.vec_id
                       ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])) DESC, e.vec_id) AS rn
                   FROM embeddings q CROSS JOIN embeddings e
                   WHERE q.vec_id < 10 AND q.vec_id <> e.vec_id) t
                 WHERE rn <= 10),
                 g AS (SELECT q_id, rel,
                     1e0 / (CAST(CAST(ln(CAST(rn + 1 AS DOUBLE)) AS REAL) AS DOUBLE) / CAST(CAST(ln(2e0) AS REAL) AS DOUBLE)) AS gain
                   FROM ranked)
               SELECT q_id, CAST(sum(rel) AS BIGINT) AS n_rel_top10,
                 round(CAST(sum(CAST((rel * gain) AS DECIMAL(30,12))) AS DOUBLE) /
                       CAST(sum(CAST(gain AS DECIMAL(30,12))) AS DOUBLE), 6) AS ndcg_at_10
               FROM g GROUP BY q_id ORDER BY q_id""")),

    QueryDef(
      "ml_train_test_split",
      // dask-ml/cuml train_test_split analog, the shape a 100 TB training
      // pipeline actually uses: a DETERMINISTIC hash split (no RNG to
      // disagree over, reproducible across reruns and engines, stable
      // under repartitioning — the properties random_state promises and a
      // distributed sample() doesn't keep): doc → train iff
      // (a·doc_id + b) mod p mod 100 < 80. Emits the per-split per-lang
      // profile (count + mean length) — the stratification check run
      // right after every split. Pure map + bounded agg, one pass.
      (s, dir) => T.documents(s, dir)
        .select(col("lang"), col("n_chars"),
          when((lit(FA) * col("doc_id") + lit(FB)) % lit(P) % 100 < 80, lit("train"))
            .otherwise(lit("test")).as("split"))
        .groupBy("split", "lang")
        .agg(count(lit(1)).as("n"), T.davg(col("n_chars")).as("avg_chars"))
        .orderBy("split", "lang"),
      Some(s"""SELECT CASE WHEN ($FA * doc_id + $FB) % $P % 100 < 80
                 THEN 'train' ELSE 'test' END AS split,
                 lang, count(*) AS n, ${T.sqlDavg("n_chars")} AS avg_chars
               FROM documents GROUP BY 1, 2 ORDER BY split, lang""")),

    QueryDef(
      "ml_group_kfold",
      // sklearn GroupKFold, hash flavor — the CV splitter that keeps all
      // rows of one GROUP (here: supplier) inside a single fold, the
      // leakage guard when rows within a group are correlated (the same
      // reason a dedup'd corpus splits by document, not by line). Fold =
      // affine hash of l_suppkey (family 999983/101159 — disjoint from
      // every other registered family), so group-disjointness holds BY
      // CONSTRUCTION at any scale and the assignment survives
      // repartitioning. One pass, bounded output: per fold the group
      // count, row count, and the stratification profile a splitter audit
      // checks (mean price — folds should look alike).
      (s, dir) => T.lineitem(s, dir)
        .select(((lit(999983L) * col("l_suppkey") + lit(101159L))
          % lit(P) % 5).as("fold"),
          col("l_suppkey"), col("l_extendedprice"))
        .groupBy("fold")
        .agg(countDistinct(col("l_suppkey")).as("n_groups"),
          count(lit(1)).as("n_rows"),
          T.davg(col("l_extendedprice")).as("avg_price"))
        .orderBy("fold"),
      Some(s"""SELECT (999983 * l_suppkey + 101159) % $P % 5 AS fold,
                 count(DISTINCT l_suppkey) AS n_groups, count(*) AS n_rows,
                 ${T.sqlDavg("l_extendedprice")} AS avg_price
               FROM lineitem GROUP BY 1 ORDER BY fold""")),

    QueryDef(
      "text_sampling_temperature",
      // Temperature-scaled language sampling (the mT5/XLM-R α-sampling
      // rule, Conneau et al. 2020): w_l ∝ p_l^α with α = 0.3 upweights
      // tail languages so a multilingual pretraining mix isn't swallowed
      // by the head — THE knob next to text_domain_mix when the corpus
      // spans languages. p_l from exact per-lang token counts (one
      // map-side-combined pass); p^α computed as exp(α·ln p) with BOTH
      // transcendentals REAL-collapsed (no pow() cross-engine contract
      // needed); the normalizer is a bounded-window exact sum. Output
      // per lang: share, temperature weight, and the upsample factor a
      // sampler applies.
      (s, dir) => {
        val w = Window.partitionBy()
        T.documents(s, dir)
          .transform(T.fanOut(_, col("doc_id")))
          .select(col("lang"),
            expr("CAST(size(filter(split(text, ' '), t -> t <> '')) AS BIGINT)").as("nt"))
          .groupBy("lang").agg(sum(col("nt")).as("n_tokens"))
          .withColumn("nn", sum(col("n_tokens")).over(w))
          .selectExpr("lang", "n_tokens",
            "CAST(n_tokens AS DOUBLE) / nn AS p")
          .selectExpr("lang", "n_tokens", "p", s"$tempPowTxt AS pw")
          .withColumn("z", sum(col("pw").cast(T.exact)).over(w).cast("double"))
          .selectExpr("lang", "n_tokens", "round(p, 6) AS share",
            "round(pw / z, 6) AS weight",
            "round((pw / z) / p, 4) AS upsample_factor")
          .orderBy("lang")
      },
      Some(s"""WITH d AS (SELECT lang,
                   CAST(len(list_filter(string_split(text, ' '), t -> t <> '')) AS BIGINT) AS nt
                 FROM documents),
               g AS (SELECT lang, CAST(sum(nt) AS BIGINT) AS n_tokens
                 FROM d GROUP BY lang),
               p AS (SELECT lang, n_tokens,
                   CAST(n_tokens AS DOUBLE) / (SELECT sum(n_tokens) FROM g) AS p
                 FROM g),
               t AS (SELECT lang, n_tokens, p, $tempPowTxt AS pw FROM p),
               z AS (SELECT lang, n_tokens, p, pw,
                   CAST(sum(CAST(pw AS DECIMAL(30,12))) OVER () AS DOUBLE) AS z
                 FROM t)
               SELECT lang, n_tokens, round(p, 6) AS share,
                 round(pw / z, 6) AS weight,
                 round((pw / z) / p, 4) AS upsample_factor
               FROM z ORDER BY lang""")),

    QueryDef(
      "text_entropy_rate",
      // Bigram entropy rate H(w₂|w₁) = −Σ p(w₁,w₂)·ln p(w₂|w₁) — the
      // information-theoretic summary of the corpus's bigram LM (Shannon
      // 1951's printed-English estimate; the number text_bigram_backoff's
      // per-source NLL generalizes corpus-wide), with its perplexity
      // eᴴ — "effective branching factor per token". Bigrams come from
      // one per-doc array pass (no self-join); c(w₁,·) predecessor
      // totals from a second bounded aggregate joined back on w₁ (vocab
      // shuffle — Heaps' law, no broadcast); counts exact, ln/exp
      // REAL-collapsed, sum on the exact wire.
      (s, dir) => {
        val bg = T.documents(s, dir)
          .transform(T.fanOut(_, col("doc_id")))
          .select(expr("filter(split(text, ' '), t -> t <> '')").as("ts"))
          .where(size(col("ts")) >= 2)
          .selectExpr(
            "explode(transform(sequence(1, size(ts) - 1), i -> struct(ts[i - 1] AS w1, ts[i] AS w2))) AS b")
          .selectExpr("b.w1 AS w1", "b.w2 AS w2")
          .groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
        val pred = bg.groupBy("w1").agg(sum(col("c12")).as("c1"))
        val tot = bg.agg(sum(col("c12")).as("nn"))
        bg.join(pred, "w1").crossJoin(broadcast(tot))
          .agg(first(col("nn")).as("n_bigrams"),
            countDistinct(col("w1")).as("n_predecessors"),
            T.xsum(expr(
              "-(CAST(c12 AS DOUBLE) / nn) * CAST(CAST(ln(CAST(c12 AS DOUBLE) / c1) AS FLOAT) AS DOUBLE)")).as("h"))
          .selectExpr("CAST(n_bigrams AS BIGINT) AS n_bigrams",
            "n_predecessors", "round(h, 6) AS entropy_rate",
            "round(CAST(CAST(exp(h) AS FLOAT) AS DOUBLE), 4) AS perplexity")
      },
      Some(s"""WITH tk AS (SELECT list_filter(string_split(text, ' '), t -> t <> '') AS ts
                 FROM documents),
               bg AS (SELECT b['w1'] AS w1, b['w2'] AS w2, count(*) AS c12
                 FROM (SELECT unnest(list_transform(generate_series(1, len(ts) - 1),
                     i -> {'w1': ts[i], 'w2': ts[i + 1]})) AS b
                   FROM tk WHERE len(ts) >= 2) x
                 GROUP BY 1, 2),
               pred AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1
                 FROM bg GROUP BY w1),
               tot AS (SELECT CAST(sum(c12) AS BIGINT) AS nn FROM bg),
               ag AS (SELECT any_value(nn) AS n_bigrams,
                   count(DISTINCT bg.w1) AS n_predecessors,
                   ${T.sqlXsum("-(CAST(c12 AS DOUBLE) / nn) * CAST(CAST(ln(CAST(c12 AS DOUBLE) / c1) AS FLOAT) AS DOUBLE)")} AS h
                 FROM bg JOIN pred ON pred.w1 = bg.w1 CROSS JOIN tot)
               SELECT CAST(n_bigrams AS BIGINT) AS n_bigrams,
                 n_predecessors, round(h, 6) AS entropy_rate,
                 round(CAST(CAST(exp(h) AS FLOAT) AS DOUBLE), 4) AS perplexity
               FROM ag""")),

    QueryDef(
      "text_pmi_collocations",
      // PMI collocation mining (Church & Hanks 1990) — the word-
      // association pass a corpus-analysis pipeline runs next to
      // text_keywords/text_zipf: pointwise mutual information of ORDERED
      // token pairs co-occurring within a ±2 window,
      // PMI = ln(p(w1,w2)/(p(w1)p(w2))), reported for pairs seen ≥ 5
      // times. Scale shape: the pair space is a per-doc positional
      // self-join bounded to 2 pairs/token (the ml_acf lag-join
      // discipline — never a doc-wide product), unigram and pair counts
      // are map-side-combined integer aggregates, and the probability
      // ratio is computed in doubles (no c12·N² integer blowup at corpus
      // scale). ln is REAL-collapsed; counts are exact — the PMI text is
      // shared verbatim. Output: top-30 collocations.
      (s, dir) => {
        val tok = T.documents(s, dir)
          .transform(T.fanOut(_, col("doc_id")))
          .select(col("doc_id"), posexplode(
            expr("filter(split(text, ' '), t -> t <> '')")))
          .toDF("doc_id", "p", "w")
        val uni = tok.groupBy(col("w")).agg(count(lit(1)).as("c"))
        val tot = uni.agg(sum(col("c")).cast("double").as("n"))
        val pairs = tok.select(col("doc_id"), col("p").as("pa"), col("w").as("w1"))
          .join(tok.select(col("doc_id"), col("p").as("pb"), col("w").as("w2")),
            Seq("doc_id"))
          .where(col("pb") - col("pa") >= 1 && col("pb") - col("pa") <= 2)
          .groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
        val np = pairs.agg(sum(col("c12")).cast("double").as("np"))
        pairs.where(col("c12") >= 5)
          .join(uni.select(col("w").as("w1"), col("c").as("c1")), "w1")
          .join(uni.select(col("w").as("w2"), col("c").as("c2")), "w2")
          .crossJoin(broadcast(tot)).crossJoin(broadcast(np))
          .selectExpr("w1", "w2", "c12",
            s"round($pmiTxt, 6) AS pmi")
          .orderBy(col("pmi").desc, col("w1"), col("w2")).limit(30)
      },
      Some(s"""WITH tok AS (SELECT doc_id,
                   generate_subscripts(list_filter(string_split(text, ' '),
                     t -> t <> ''), 1) AS p,
                   unnest(list_filter(string_split(text, ' '),
                     t -> t <> '')) AS w
                 FROM documents),
               uni AS (SELECT w, count(*) AS c FROM tok GROUP BY w),
               tot AS (SELECT CAST(sum(c) AS DOUBLE) AS n FROM uni),
               pr AS (SELECT a.w AS w1, b.w AS w2, count(*) AS c12
                 FROM tok a JOIN tok b ON a.doc_id = b.doc_id
                   AND b.p - a.p BETWEEN 1 AND 2
                 GROUP BY 1, 2),
               np AS (SELECT CAST(sum(c12) AS DOUBLE) AS np FROM pr)
               SELECT w1, w2, c12, round($pmiTxt, 6) AS pmi
               FROM pr
               JOIN uni u1 ON u1.w = pr.w1
               JOIN uni u2 ON u2.w = pr.w2
               CROSS JOIN tot CROSS JOIN np
               WHERE c12 >= 5
               ORDER BY pmi DESC, w1, w2 LIMIT 30"""
        .replace("c1 AS DOUBLE", "u1.c AS DOUBLE")
        .replace("c2 AS DOUBLE", "u2.c AS DOUBLE"))),

    QueryDef(
      "ml_woe_iv",
      // Weight-of-evidence / information value (the credit-scoring
      // feature-screening standard; Siddiqi 2006) for quantity binned
      // 5-wide against the price>20k event label: WoE_i =
      // ln((good_i/G)/(bad_i/B)), IV = Σ(good_i/G − bad_i/B)·WoE_i. One
      // map-side-combined pass builds the bounded bin table; totals and
      // the IV sum are 5-row windows. All counts exact integers, the
      // ratio/ln algebra is shared text with REAL-collapsed ln — the
      // uniform 1–50 quantity keeps every bin populated so no
      // zero-count guard is needed (and the oracle would catch one).
      (s, dir) => {
        val b = T.lineitem(s, dir)
          .selectExpr("least(4, CAST(floor(l_quantity / 10) AS INT)) AS bin",
            "CASE WHEN l_extendedprice > 20000 THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS bad")
          .groupBy("bin")
          .agg(count(lit(1)).as("n"), sum(col("bad")).as("n_bad"))
          .selectExpr("bin", "n", "n - n_bad AS n_good", "n_bad")
        val w = Window.partitionBy()
        b.withColumn("gt", sum(col("n_good")).over(w))
          .withColumn("bt", sum(col("n_bad")).over(w))
          .selectExpr("bin", "n_good", "n_bad",
            s"$woeTxt AS woe",
            s"(CAST(n_good AS DOUBLE) / gt - CAST(n_bad AS DOUBLE) / bt) * ($woeTxt) AS iv_term")
          .withColumn("iv_total",
            sum(col("iv_term").cast(T.exact)).over(Window.partitionBy())
              .cast("double"))
          .selectExpr("bin", "n_good", "n_bad", "round(woe, 6) AS woe",
            "round(iv_term, 6) AS iv_term", "round(iv_total, 6) AS iv_total")
          .orderBy("bin")
      },
      Some(s"""WITH r AS (SELECT
                   least(4, CAST(floor(l_quantity / 10) AS INT)) AS bin,
                   CASE WHEN l_extendedprice > 20000 THEN 1 ELSE 0 END AS bad
                 FROM lineitem),
               b AS (SELECT bin, count(*) AS n,
                   CAST(sum(bad) AS BIGINT) AS n_bad
                 FROM r GROUP BY bin),
               g AS (SELECT bin, n - n_bad AS n_good, n_bad,
                   sum(n - n_bad) OVER () AS gt, sum(n_bad) OVER () AS bt
                 FROM b),
               t AS (SELECT bin, n_good, n_bad, $woeTxt AS woe,
                   (CAST(n_good AS DOUBLE) / gt - CAST(n_bad AS DOUBLE) / bt)
                     * ($woeTxt) AS iv_term
                 FROM g)
               SELECT CAST(bin AS INT) AS bin,
                 CAST(n_good AS BIGINT) AS n_good, n_bad,
                 round(woe, 6) AS woe, round(iv_term, 6) AS iv_term,
                 round(CAST(sum(CAST(iv_term AS DECIMAL(30,12))) OVER () AS DOUBLE), 6) AS iv_total
               FROM t ORDER BY bin""")),

    QueryDef(
      "ml_time_series_split",
      // sklearn TimeSeriesSplit — expanding-window CV over the daily
      // order series, the only split that respects temporal causality
      // (random K-fold would train on the future): 5 day-quantile buckets,
      // split k trains on buckets < k and tests on bucket k, scored with
      // the train-mean naive forecast (the baseline every backtest
      // reports). The corpus-scale work is ONE daily aggregate; per-bucket
      // exact integer moments cumulate over a 5-row window (the
      // ml_learning_curve discipline — K splits cost one pass), and only
      // the bounded test-bucket day rows join back for the MAE.
      (s, dir) => {
        val daily = T.orders(s, dir)
          .groupBy(col("o_orderdate").as("day"))
          .agg(count(lit(1)).as("y"))
          .withColumn("t", row_number().over(Window.orderBy("day")))
          .withColumn("nn", count(lit(1)).over(Window.partitionBy()))
          .withColumn("g", expr("((t - 1) * 5) div nn"))
        val bm = daily.groupBy("g")
          .agg(count(lit(1)).as("ng"), sum(col("y")).as("syg"))
        val wCum = Window.orderBy("g")
          .rowsBetween(Window.unboundedPreceding, 0)
        val splits = bm
          .withColumn("cn", sum(col("ng")).over(wCum))
          .withColumn("cs", sum(col("syg")).over(wCum))
          .where(col("g") >= 1)
          .selectExpr("g", "ng AS test_days", "cn - ng AS train_days",
            "CAST(cs - syg AS DOUBLE) / CAST(cn - ng AS DOUBLE) AS train_mean")
        daily.join(splits, "g")
          .groupBy("g")
          .agg(first(col("train_days")).as("train_days"),
            first(col("test_days")).as("test_days"),
            first(col("train_mean")).as("train_mean"),
            (T.xsum(abs(col("y") - col("train_mean")))
              / count(lit(1))).as("mae"))
          .selectExpr("CAST(g AS INT) AS split", "train_days", "test_days",
            "round(train_mean, 6) AS train_mean", "round(mae, 6) AS test_mae")
          .orderBy("split")
      },
      Some(s"""WITH daily AS (SELECT o_orderdate AS day, count(*) AS y
                 FROM orders GROUP BY 1),
               idx AS (SELECT y,
                   row_number() OVER (ORDER BY day) AS t,
                   count(*) OVER () AS nn
                 FROM daily),
               bk AS (SELECT y, ((t - 1) * 5) // nn AS g FROM idx),
               bm AS (SELECT g, count(*) AS ng, sum(y) AS syg
                 FROM bk GROUP BY g),
               cum AS (SELECT g, ng, syg,
                   sum(ng) OVER (ORDER BY g ROWS BETWEEN UNBOUNDED PRECEDING
                     AND CURRENT ROW) AS cn,
                   sum(syg) OVER (ORDER BY g ROWS BETWEEN UNBOUNDED PRECEDING
                     AND CURRENT ROW) AS cs
                 FROM bm),
               sp AS (SELECT g, ng AS test_days, cn - ng AS train_days,
                   CAST(cs - syg AS DOUBLE) / CAST(cn - ng AS DOUBLE) AS train_mean
                 FROM cum WHERE g >= 1)
               SELECT CAST(sp.g AS INT) AS split,
                 CAST(train_days AS BIGINT) AS train_days,
                 test_days,
                 round(train_mean, 6) AS train_mean,
                 round(${T.sqlXsum("abs(y - train_mean)")} / count(*), 6) AS test_mae
               FROM bk JOIN sp ON bk.g = sp.g
               GROUP BY sp.g, train_days, test_days, train_mean
               ORDER BY split""")),

    QueryDef(
      "ml_learning_curve",
      // sklearn/dask-ml learning_curve in the moment form a 100 TB
      // pipeline can afford: nested 25/50/75/100% training subsets via a
      // deterministic affine hash on (l_orderkey, l_linenumber)
      // (multipliers 69621/30269 — disjoint from BOTH existing hash
      // families, the r7 sample_stratified collision lesson), per-bucket
      // exact-decimal OLS moments from ONE pass, cumulated over the 4-row
      // bounded frame (decimal addition is order-free), then the 1-feature
      // closed-form fit + the SSE moment identity per fraction — 4 fits,
      // zero extra data passes. The curve a training run consults before
      // paying for more data. Model: extendedprice ~ quantity (the
      // ml_linreg_fit feature pair, so the 100% row cross-checks it).
      (s, dir) => {
        val w = Window.orderBy(col("g"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        T.lineitem(s, dir)
          .select(((lit(69621L) * col("l_orderkey") + lit(30269L) * col("l_linenumber")) % lit(P) % 4).as("g"),
            col("l_quantity").cast("double").as("x"),
            col("l_extendedprice").cast("double").as("y"))
          .groupBy("g")
          .agg(count(lit(1)).as("ng"), T.xsumD(col("x")).as("sxg"),
            T.xsumD(col("y")).as("syg"), T.xsumD(col("x") * col("x")).as("sxxg"),
            T.xsumD(col("x") * col("y")).as("sxyg"), T.xsumD(col("y") * col("y")).as("syyg"))
          // 4-row frame: the window is bounded by the bucket count, not data
          .select(col("g"), sum(col("ng")).over(w).as("n"),
            sum(col("sxg")).over(w).cast("double").as("sx"),
            sum(col("syg")).over(w).cast("double").as("sy"),
            sum(col("sxxg")).over(w).cast("double").as("sxx"),
            sum(col("sxyg")).over(w).cast("double").as("sxy"),
            sum(col("syyg")).over(w).cast("double").as("syy"))
          .selectExpr("CAST((g + 1) * 25 AS INT) AS frac", "n",
            "CAST(n AS DOUBLE) AS nd", "sx", "sy", "sxx", "sxy", "syy")
          .selectExpr("frac", "n", "nd", "sx", "sy", "sxx", "sxy", "syy",
            "(nd * sxy - sx * sy) / (nd * sxx - sx * sx) AS slope")
          .selectExpr("frac", "n", "nd", "sx", "sy", "sxx", "sxy", "syy", "slope",
            "(sy - slope * sx) / nd AS icept")
          .selectExpr("frac", "n",
            "round(slope, 6) AS slope", "round(icept, 6) AS intercept",
            "round(sqrt((syy + nd * icept * icept + slope * slope * sxx - 2 * icept * sy - 2 * slope * sxy + 2 * icept * slope * sx) / nd), 6) AS rmse_train")
          .orderBy("frac")
      },
      Some(s"""WITH b AS (SELECT
                   (69621 * l_orderkey + 30269 * l_linenumber) % $P % 4 AS g,
                   CAST(l_quantity AS DOUBLE) AS x,
                   CAST(l_extendedprice AS DOUBLE) AS y
                 FROM lineitem),
                 m AS (SELECT g, count(*) AS ng, ${T.sqlXsumD("x")} AS sxg,
                     ${T.sqlXsumD("y")} AS syg, ${T.sqlXsumD("x * x")} AS sxxg,
                     ${T.sqlXsumD("x * y")} AS sxyg, ${T.sqlXsumD("y * y")} AS syyg
                   FROM b GROUP BY g),
                 c AS (SELECT g,
                     CAST(sum(ng) OVER w AS BIGINT) AS n,
                     CAST(sum(sxg) OVER w AS DOUBLE) AS sx,
                     CAST(sum(syg) OVER w AS DOUBLE) AS sy,
                     CAST(sum(sxxg) OVER w AS DOUBLE) AS sxx,
                     CAST(sum(sxyg) OVER w AS DOUBLE) AS sxy,
                     CAST(sum(syyg) OVER w AS DOUBLE) AS syy
                   FROM m WINDOW w AS (ORDER BY g ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
                 f0 AS (SELECT CAST((g + 1) * 25 AS INT) AS frac, n,
                     CAST(n AS DOUBLE) AS nd, sx, sy, sxx, sxy, syy FROM c),
                 f1 AS (SELECT *,
                     (nd * sxy - sx * sy) / (nd * sxx - sx * sx) AS slope FROM f0),
                 f2 AS (SELECT *, (sy - slope * sx) / nd AS icept FROM f1)
               SELECT frac, n, round(slope, 6) AS slope,
                 round(icept, 6) AS intercept,
                 round(sqrt((syy + nd * icept * icept + slope * slope * sxx - 2 * icept * sy - 2 * slope * sxy + 2 * icept * slope * sx) / nd), 6) AS rmse_train
               FROM f2 ORDER BY frac""")),

    QueryDef(
      "text_token_count",
      // Token counting, both ways a data pipeline meters text: whitespace
      // words and a BPE-ish lexer regex (letter runs | digit runs | single
      // punctuation — the pre-tokenization split of GPT-style BPE
      // vocabularies). Pure per-row map + one bounded groupBy(source);
      // the regex class is shared verbatim by Java and RE2 regex engines.
      (s, dir) => {
        val ws = size(filter(split(col("text"), " "), t => t =!= ""))
        val bpe = size(expr("regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]', 0)"))
        T.documents(s, dir)
          .select(col("source"), ws.as("n_ws"), bpe.as("n_bpe"))
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_ws")).as("ws_tokens"),
            sum(col("n_bpe")).as("bpe_tokens"),
            T.davg(col("n_bpe").cast("double") / col("n_ws")).as("bpe_per_word"))
          .orderBy("source")
      },
      Some(s"""WITH d AS (SELECT source,
                  len(list_filter(string_split(text, ' '), t -> t <> '')) AS n_ws,
                  len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS n_bpe
                FROM documents)
              SELECT source, count(*) AS n_docs,
                CAST(sum(n_ws) AS BIGINT) AS ws_tokens,
                CAST(sum(n_bpe) AS BIGINT) AS bpe_tokens,
                ${T.sqlDavg("CAST(n_bpe AS DOUBLE) / n_ws")} AS bpe_per_word
              FROM d GROUP BY source ORDER BY source""")),

    QueryDef(
      "text_bigram_freq",
      // Bigram frequency table — the n-gram LM building block under
      // text_langid's trigram profiles, as its own corpus-analysis row:
      // tokens exploded WITH their raw split position, adjacency = a
      // doc-local equi-join on (doc_id, pos+1) — the collocated-join
      // shape (shuffle key doc_id, positions join within the group;
      // at scale the token table is the inverted index both engines
      // already build for tf-idf). Empty tokens (split artifacts) are
      // excluded from both sides but POSITIONS stay raw, so adjacency is
      // identical cross-engine by construction. Output: the 30 most
      // frequent bigrams (count desc, bigram asc — fully deterministic).
      (s, dir) => {
        val toks = T.documents(s, dir).transform(T.fanOut(_, col("doc_id")))
          .select(col("doc_id"), posexplode(split(col("text"), " ")))
          .where(col("col") =!= "")
          .select(col("doc_id"), col("pos"), col("col").as("term"))
        val a = toks.select(col("doc_id"), col("pos"), col("term").as("t1"))
        val b = toks.select(col("doc_id"), (col("pos") - 1).as("pos"),
          col("term").as("t2"))
        a.join(b, Seq("doc_id", "pos"))
          .select(concat(col("t1"), lit(" "), col("t2")).as("bigram"))
          .groupBy("bigram").agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("bigram").asc)
          .limit(30)
      },
      Some("""WITH tk AS (SELECT doc_id,
                  generate_subscripts(string_split(text, ' '), 1) AS pos,
                  unnest(string_split(text, ' ')) AS term
                FROM documents),
                tf AS (SELECT doc_id, pos, term FROM tk WHERE term <> ''),
                bg AS (SELECT a.term || ' ' || b.term AS bigram
                  FROM tf a JOIN tf b
                    ON a.doc_id = b.doc_id AND b.pos = a.pos + 1)
              SELECT bigram, count(*) AS n
              FROM bg GROUP BY bigram
              ORDER BY n DESC, bigram ASC LIMIT 30""")),

    QueryDef(
      "multimodal_frame_sample",
      // Frame sampling over an opaque binary column — the video/audio
      // "every Nth frame" shape with the Spark plumbing REAL: payload bytes
      // are chunked into 64-byte frames inside mapPartitions (map-only,
      // partition-preserving, zero shuffle) and every 4th frame is sampled,
      // byte-summed, and checksummed. The fixture corpus is pure ASCII
      // (verified), so the DuckDB oracle reproduces the BYTE arithmetic
      // from character arithmetic — the checksum proves the decode loop
      // actually read the right bytes, not just the right lengths.
      (s, dir) => {
        val media = T.documents(s, dir)
          .where(col("doc_id") < 100)
          .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
        val outSchema = StructType(Seq(
          StructField("doc_id", LongType),
          StructField("n_frames", IntegerType),
          StructField("n_sampled", IntegerType),
          StructField("sampled_bytes", LongType),
          StructField("checksum", LongType)))
        media.mapPartitions { it =>
          val F = 64; val STRIDE = 4
          it.map { r =>
            val id = r.getLong(0)
            val bytes = r.getAs[Array[Byte]](1)
            val n = bytes.length
            val nF = (n + F - 1) / F
            val nS = (nF + STRIDE - 1) / STRIDE
            var sampled = 0L; var cs = 0L
            var k = 0
            while (k < nF) {
              if (k % STRIDE == 0) {
                val st = k * F; val en = math.min(st + F, n)
                var i = st
                while (i < en) { cs += bytes(i) & 0xff; i += 1 }
                sampled += en - st
              }
              k += 1
            }
            Row(id, nF, nS, sampled, cs % 997L)
          }
        }(org.apache.spark.sql.Encoders.row(outSchema))
          .orderBy("doc_id")
      },
      Some("""WITH d AS (SELECT doc_id, text, length(text) AS len
                FROM documents WHERE doc_id < 100),
                pos AS (SELECT doc_id, i, unicode(substr(text, CAST(i AS INT), 1)) AS b
                        FROM (SELECT doc_id, text,
                                unnest(generate_series(1, length(text))) AS i
                              FROM d) x),
                samp AS (SELECT doc_id, count(*) AS sampled_bytes,
                           CAST(coalesce(sum(b), 0) % 997 AS BIGINT) AS checksum
                         FROM pos WHERE (((i - 1) // 64) % 4) = 0
                         GROUP BY doc_id)
              SELECT d.doc_id,
                CAST((len + 63) // 64 AS INT) AS n_frames,
                CAST(((len + 63) // 64 + 3) // 4 AS INT) AS n_sampled,
                coalesce(samp.sampled_bytes, 0) AS sampled_bytes,
                coalesce(samp.checksum, 0) AS checksum
              FROM d LEFT JOIN samp USING (doc_id)
              ORDER BY doc_id""")),

    QueryDef(
      "multimodal_decode",
      // Multimodal binary-column plumbing: the image/audio decode shape
      // with the Spark side REAL (this container has no media libraries —
      // builder-prompt mandate). The binary payload is synthesized from
      // text (encode), carried through a typed (binary, struct metadata)
      // schema, and decoded per partition via mapPartitions — the exact
      // plumbing a real decoder UDF needs: opaque bytes in, fixed-schema
      // features out, no shuffle (map-only, partition-preserving).
      //
      // TOY CODEC (r4, VERDICT #6 — replaces the unverifiable byte-stat
      // stub): each payload byte is read as a nibble-packed RLE symbol —
      // value = b >> 4, run length = b & 15 — and the decoder reports the
      // expanded length, the value-weighted sum, and a mod-997 checksum.
      // Swap the while-loop for codec.decode(payload) in production; the
      // schema/partitioning/batch plumbing is unchanged. All-integer
      // arithmetic, and the fixture corpus is pure ASCII, so DuckDB
      // reproduces the BYTE stream from character codes and the row is
      // fully hash-checked (was: the suite's one rows-only entry).
      (s, dir) => {
        val media = T.documents(s, dir)
          .where(col("doc_id") < 100)
          .select(
            col("doc_id"),
            encode(col("text"), "UTF-8").as("payload"),
            struct(col("lang").as("modality"), col("n_chars").as("declared_len")).as("meta"))
        val outSchema = StructType(Seq(
          StructField("doc_id", LongType),
          StructField("n_bytes", IntegerType),
          StructField("decoded_len", LongType),
          StructField("decoded_sum_mod", LongType),
          StructField("first_byte", IntegerType)))
        media.mapPartitions { it =>
          // --- toy codec (stands in for codec.decode(payload) -> tensor) ---
          it.map { r =>
            val id = r.getLong(0)
            val bytes = r.getAs[Array[Byte]](1)
            var dl = 0L; var ds = 0L
            var i = 0
            while (i < bytes.length) {
              val b = bytes(i) & 0xff
              dl += b & 15                  // run length: low nibble
              ds += (b >> 4).toLong * (b & 15) // run value × run length
              i += 1
            }
            Row(id, bytes.length, dl, ds % 997L,
              if (bytes.isEmpty) -1 else bytes(0) & 0xff)
          }
        }(org.apache.spark.sql.Encoders.row(outSchema))
          .orderBy("doc_id")
      },
      Some("""WITH d AS (SELECT doc_id, text, length(text) AS len
                FROM documents WHERE doc_id < 100),
                b AS (SELECT doc_id, unicode(substr(text, CAST(i AS INT), 1)) AS byte
                      FROM (SELECT doc_id, text,
                              unnest(generate_series(1, length(text))) AS i
                            FROM d) x),
                agg AS (SELECT doc_id,
                          CAST(sum(byte % 16) AS BIGINT) AS decoded_len,
                          CAST(sum((byte // 16) * (byte % 16)) % 997 AS BIGINT) AS decoded_sum_mod
                        FROM b GROUP BY doc_id)
              SELECT d.doc_id, CAST(d.len AS INT) AS n_bytes,
                coalesce(a.decoded_len, 0) AS decoded_len,
                coalesce(a.decoded_sum_mod, 0) AS decoded_sum_mod,
                CAST(CASE WHEN d.len = 0 THEN -1
                          ELSE unicode(substr(d.text, 1, 1)) END AS INT) AS first_byte
              FROM d LEFT JOIN agg a USING (doc_id)
              ORDER BY d.doc_id""")),

    QueryDef(
      "text_count_vectorize",
      // cuml.dask.feature_extraction.text CountVectorizer [R] (r7): the
      // fitted vocabulary — top-20 terms by document frequency with dense
      // vocab ids, document frequency, and total term frequency. One
      // token pass, shuffle key = term (map-side combined), then the rank
      // window runs over a 20-row TakeOrdered result — the vocabulary is
      // the SMALL side by construction (min_df in the real API bounds it),
      // so the id assignment is bounded work at any corpus size.
      // Deterministic: rank by (df desc, term asc) — no hash order leaks.
      (s, dir) => {
        val tf = T.documents(s, dir).transform(T.fanOut(_, col("doc_id")))
          .select(col("doc_id"),
            explode(filter(split(col("text"), " "), t => t =!= "")).as("term"))
          .groupBy("term")
          .agg(countDistinct(col("doc_id")).as("df"), count(lit(1)).as("tf"))
        val top = tf.orderBy(col("df").desc, col("term").asc).limit(20)
        top.withColumn("vocab_id",
            row_number().over(Window.orderBy(col("df").desc, col("term").asc)) - 1)
          .select(col("vocab_id"), col("term"), col("df"), col("tf"))
          .orderBy("vocab_id")
      },
      Some("""WITH tk AS (SELECT doc_id,
                  unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS term
                FROM documents),
                tf AS (SELECT term, count(DISTINCT doc_id) AS df, count(*) AS tf
                       FROM tk GROUP BY term),
                top AS (SELECT * FROM tf ORDER BY df DESC, term ASC LIMIT 20)
              SELECT CAST(row_number() OVER (ORDER BY df DESC, term ASC) - 1 AS INT) AS vocab_id,
                term, df, tf
              FROM top ORDER BY vocab_id""")),

    QueryDef(
      "text_hashing_tf",
      // cuml.dask.feature_extraction.text HashingVectorizer [R] (r7): the
      // stateless sibling of CountVectorizer — term → feature bucket by
      // the shared polynomial hash mod 64, NO vocabulary job at all (the
      // property that makes it the 100 TB default: zero fit state, pure
      // map + one bounded 64-group aggregate). Emits each non-empty
      // bucket's distinct-term load and total count — the collision
      // profile a fixed-width feature space trades for statelessness.
      (s, dir) => {
        T.documents(s, dir).transform(T.fanOut(_, col("doc_id")))
          .select(col("doc_id"),
            explode(filter(split(col("text"), " "), t => t =!= "")).as("term"))
          .select(col("doc_id"), (T.polyTid("term") % 64).as("bucket"))
          .groupBy("bucket")
          .agg(count(lit(1)).as("tf"), countDistinct(col("doc_id")).as("df"))
          .orderBy("bucket")
      },
      Some(s"""WITH tk AS (SELECT doc_id,
                  unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS term
                FROM documents),
                h AS (SELECT doc_id, ${T.sqlPolyTid("term")} % 64 AS bucket FROM tk)
              SELECT bucket, count(*) AS tf, count(DISTINCT doc_id) AS df
              FROM h GROUP BY bucket ORDER BY bucket""")),

    QueryDef(
      "multimodal_resize",
      // The image-RESIZE shape over an opaque binary column (completes the
      // builder-prompt's decode/feature-extract/resize/frame-sample
      // quartet): the payload is box-filtered 4:1 — each 4-byte block
      // averaged to one output "pixel" (integer floor mean; the trailing
      // partial block averages over its real length). mapPartitions,
      // map-only, partition-preserving, fixed output schema — swap the
      // block loop for the real resampler in production; the plumbing
      // (opaque bytes in, fixed-width summary out, zero shuffle) is what
      // scales. ASCII fixture ⇒ the oracle reproduces byte arithmetic
      // from character codes; all-integer, fully hash-checked.
      (s, dir) => {
        val media = T.documents(s, dir)
          .where(col("doc_id") < 100)
          .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
        val outSchema = StructType(Seq(
          StructField("doc_id", LongType),
          StructField("n_bytes", IntegerType),
          StructField("n_out", IntegerType),
          StructField("first_px", LongType),
          StructField("checksum", LongType)))
        media.mapPartitions { it =>
          it.map { r =>
            val id = r.getLong(0)
            val bytes = r.getAs[Array[Byte]](1)
            val nOut = (bytes.length + 3) / 4
            var ck = 0L; var first = -1L
            var blk = 0
            while (blk < nOut) {
              val from = blk * 4
              val to = math.min(from + 4, bytes.length)
              var sum = 0L
              var i = from
              while (i < to) { sum += bytes(i) & 0xff; i += 1 }
              val px = sum / (to - from) // integer floor mean
              if (blk == 0) first = px
              ck = (ck + px * (blk + 1L)) % 997L
              blk += 1
            }
            Row(id, bytes.length, nOut, first, ck)
          }
        }(org.apache.spark.sql.Encoders.row(outSchema))
          .orderBy("doc_id")
      },
      Some(sqlResizeOracle)),

    QueryDef(
      "multimodal_resize_columnar",
      // The COLUMNAR twin of multimodal_resize (VERDICT r12 missing #6 —
      // the mapInArrow-shaped batch boundary, in Scala Spark terms): the
      // identical 4:1 box filter, but executed by the custom columnar
      // operator graft.plans.ColumnarResizeExec — a supportsColumnar
      // SparkPlan consuming whole ColumnarBatches (the planner inserts
      // RowToColumnar/ColumnarToRow transitions automatically; MicroSpec
      // pins both the transitions and row-twin equality). Same oracle
      // text as the row twin: one semantics, two execution boundaries.
      // Strategy attachment is the public experimental hook on the
      // driver's vanilla session; extension-built sessions get it from
      // GraftExtensions.injectPlannerStrategy.
      (s, dir) => {
        import org.apache.spark.sql.graftbridge.GraftBridge
        GraftBridge.addStrategy(s, graft.plans.ColumnarResizeStrategy)
        val media = T.documents(s, dir)
          .where(col("doc_id") < 100)
          .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
        GraftBridge.ofRows(s,
            graft.plans.ColumnarResizePlan(GraftBridge.logicalPlan(media)))
          .orderBy("doc_id")
      },
      Some(sqlResizeOracle)),

    QueryDef(
      "multimodal_feature_extract",
      // The FEATURE-EXTRACTION shape over an opaque binary column: a
      // fixed-width feature vector per payload (here a 16-bin byte
      // histogram — the stand-in for an embedding model's output), reduced
      // to its audit features: integer mean byte (×100), dominant bin
      // (argmax, ties to the LOWEST bin — deterministic), and the
      // dominant bin's count. Same real plumbing contract as the decode/
      // resize rows: bytes in, fixed schema out, map-only, no shuffle.
      (s, dir) => {
        val media = T.documents(s, dir)
          .where(col("doc_id") < 100)
          .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
        val outSchema = StructType(Seq(
          StructField("doc_id", LongType),
          StructField("n_bytes", IntegerType),
          StructField("mean_byte_x100", LongType),
          StructField("dominant_bin", IntegerType),
          StructField("dominant_count", LongType)))
        media.mapPartitions { it =>
          it.map { r =>
            val id = r.getLong(0)
            val bytes = r.getAs[Array[Byte]](1)
            val hist = new Array[Long](16)
            var sum = 0L
            var i = 0
            while (i < bytes.length) {
              val b = bytes(i) & 0xff
              hist(b >> 4) += 1
              sum += b
              i += 1
            }
            var best = 0
            var j = 1
            while (j < 16) { if (hist(j) > hist(best)) best = j; j += 1 }
            val mean = if (bytes.isEmpty) -1L else sum * 100L / bytes.length
            Row(id, bytes.length, mean,
              if (bytes.isEmpty) -1 else best,
              if (bytes.isEmpty) 0L else hist(best))
          }
        }(org.apache.spark.sql.Encoders.row(outSchema))
          .orderBy("doc_id")
      },
      Some("""WITH d AS (SELECT doc_id, text, length(text) AS len
                FROM documents WHERE doc_id < 100),
                b AS (SELECT doc_id,
                        unicode(substr(text, CAST(i AS INT), 1)) AS byte
                      FROM (SELECT doc_id, text,
                              unnest(generate_series(1, length(text))) AS i
                            FROM d) x),
                hist AS (SELECT doc_id, byte // 16 AS bin, count(*) AS c
                         FROM b GROUP BY doc_id, bin),
                dom AS (SELECT doc_id, bin, c FROM (
                          SELECT doc_id, bin, c,
                            row_number() OVER (PARTITION BY doc_id
                              ORDER BY c DESC, bin ASC) AS rn
                          FROM hist) t WHERE rn = 1),
                s AS (SELECT doc_id,
                        CAST(CAST(sum(byte) AS HUGEINT) * 100 // count(*) AS BIGINT) AS mean_byte_x100
                      FROM b GROUP BY doc_id)
              SELECT d.doc_id, CAST(d.len AS INT) AS n_bytes,
                coalesce(s.mean_byte_x100, -1) AS mean_byte_x100,
                CAST(coalesce(dom.bin, -1) AS INT) AS dominant_bin,
                coalesce(dom.c, 0) AS dominant_count
              FROM d LEFT JOIN s USING (doc_id) LEFT JOIN dom USING (doc_id)
              ORDER BY d.doc_id"""))
  ,

    QueryDef(
      "text_repetition",
      // The Gopher/MassiveText repetition filter: fraction of word-trigram
      // occurrences that are repeats of an earlier trigram in the SAME
      // document — the signal that catches boilerplate, keyword stuffing,
      // and decoding loops, which length/stopword heuristics (text_quality)
      // miss. Trigrams are built as a PURE MAP over the token array
      // (transform over sequence — no self-join, no window; the
      // text_langid idiom), then two doc-local map-side-combinable
      // aggregations: per-(doc, gram) counts, then per-doc
      // dup_ratio = (total − distinct)/total. Per-source rollup + a
      // flagged count at the 0.1 threshold the curation pass would drop.
      // Docs under 3 tokens carry no trigram and are excluded on BOTH
      // engines (the sequence(1, n<1)-counts-down guard, as text_langid).
      // Scale: every stage groups on (doc_id, …) or source — no global
      // state, no shuffle wider than the corpus token stream.
      (s, dir) => {
        T.documents(s, dir)
          .transform(T.fanOut(_, col("doc_id")))
          .selectExpr("doc_id", "source",
            "filter(split(text, ' '), t -> t <> '') AS toks")
          .where(size(col("toks")) >= 3)
          .selectExpr("doc_id", "source",
            "explode(transform(sequence(1, size(toks) - 2), i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1), ' ', element_at(toks, i + 2)))) AS gram")
          .groupBy("doc_id", "source", "gram")
          .agg(count(lit(1)).as("cnt"))
          .groupBy("doc_id", "source")
          .agg(sum(col("cnt")).as("total"), count(lit(1)).as("dist"))
          .select(col("source"),
            ((col("total") - col("dist")).cast("double") / col("total")).as("dup_ratio"))
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            round(T.xsum(col("dup_ratio")) / count(lit(1)), 6).as("avg_dup_ratio"),
            sum(when(col("dup_ratio") > 0.1, 1L).otherwise(0L)).as("n_flagged"))
          .orderBy("source")
      },
      Some(s"""WITH tk AS (SELECT doc_id, source,
                   list_filter(string_split(text, ' '), t -> t <> '') AS toks
                 FROM documents),
                 g AS (SELECT doc_id, source,
                     toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2] AS gram
                   FROM (SELECT doc_id, source, toks,
                           unnest(generate_series(1, len(toks) - 2)) AS i
                         FROM tk WHERE len(toks) >= 3) x),
                 pc AS (SELECT doc_id, source, gram, count(*) AS cnt
                        FROM g GROUP BY doc_id, source, gram),
                 pd AS (SELECT doc_id, source,
                     CAST(sum(cnt) - count(*) AS DOUBLE) / CAST(sum(cnt) AS DOUBLE) AS dup_ratio
                   FROM pc GROUP BY doc_id, source)
               SELECT source, count(*) AS n_docs,
                 round(${T.sqlXsum("dup_ratio")} / count(*), 6) AS avg_dup_ratio,
                 CAST(sum(CASE WHEN dup_ratio > 0.1 THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged
               FROM pd GROUP BY source ORDER BY source""")),

    QueryDef(
      "text_unigram_lm",
      // The CCNet perplexity-proxy quality score: train a unigram LM on
      // the corpus itself (term → count, one map-side-combined aggregate),
      // then score every document by its mean negative log-likelihood
      // under that LM — high NLL = rare-token-heavy = the gibberish /
      // OCR-noise bucket a curation pipeline routes to quarantine. The
      // vocabulary join is a PLAIN shuffled equi-join on term, NOT a
      // broadcast: Heaps' law puts the vocab of a 100 TB corpus far past
      // broadcast size, and the per-term logp is computed ONCE in the
      // (bounded-cardinality) vocab aggregate, never per token. In-domain
      // by construction (every token is in the vocab), so no OOV smoothing
      // term is needed — the scoring is exact.
      // Determinism: logp REAL-collapsed per TERM (the lnR discipline);
      // per-doc sums ride the exact decimal wire; the doc NLL is one
      // deterministic division.
      (s, dir) => {
        val tok = T.documents(s, dir)
          .transform(T.fanOut(_, col("doc_id")))
          .selectExpr("doc_id", "source",
            "explode(filter(split(text, ' '), t -> t <> '')) AS t")
          .select(col("doc_id"), col("source"), lower(col("t")).as("term"))
        val ntot = tok.agg(count(lit(1)).as("n_tok_total"))
        val vocab = tok.groupBy("term").agg(count(lit(1)).as("cnt"))
          .crossJoin(broadcast(ntot))
          .selectExpr("term",
            "CAST(CAST(ln(CAST(cnt AS DOUBLE) / n_tok_total) AS FLOAT) AS DOUBLE) AS logp")
        tok.join(vocab, "term")
          .groupBy("doc_id", "source")
          .agg((T.xsum(-col("logp")) / count(lit(1))).as("nll"))
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            round(T.xsum(col("nll")) / count(lit(1)), 6).as("avg_nll"),
            round(max(col("nll")), 6).as("max_nll"))
          .orderBy("source")
      },
      Some(s"""WITH tok AS (SELECT doc_id, source, lower(t) AS term FROM (
                   SELECT doc_id, source,
                     unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS t
                   FROM documents) x),
                 ntot AS (SELECT count(*) AS n_tok_total FROM tok),
                 vocab AS (SELECT term,
                     CAST(CAST(ln(CAST(count(*) AS DOUBLE) / any_value(n_tok_total)) AS REAL) AS DOUBLE) AS logp
                   FROM tok CROSS JOIN ntot GROUP BY term),
                 pd AS (SELECT doc_id, source,
                     ${T.sqlXsum("-logp")} / count(*) AS nll
                   FROM tok JOIN vocab USING (term)
                   GROUP BY doc_id, source)
               SELECT source, count(*) AS n_docs,
                 round(${T.sqlXsum("nll")} / count(*), 6) AS avg_nll,
                 round(max(nll), 6) AS max_nll
               FROM pd GROUP BY source ORDER BY source""")),

    QueryDef(
      "text_js_divergence",
      // Jensen–Shannon divergence between the unigram distributions of
      // two corpus halves (sources split by numeric-suffix parity) — THE
      // domain-shift number a data-mixing run tracks: symmetric, bounded
      // by ln 2, zero iff the halves speak the same unigram language
      // (Lin 1991). One tokenize pass → per-term conditional counts →
      // JSD = ½Σ p·ln(p/m) + ½Σ q·ln(q/m) with m = (p+q)/2, zero-count
      // terms contributing only their present side (the 0·ln0 = 0
      // convention). Scale: term-keyed groupBy (vocab-sized, SHUFFLED
      // not broadcast — the unigram_lm Heaps'-law argument); the two
      // token totals broadcast as one row; ln REAL-collapsed, sums on
      // the exact-decimal wire. Output: vocab size, both token totals,
      // jsd and jsd/ln2.
      (s, dir) => {
        val tok = T.documents(s, dir)
          .transform(T.fanOut(_, col("doc_id")))
          .selectExpr("CAST(substring(source, 4) AS INT) % 2 AS grp",
            "explode(filter(split(text, ' '), t -> t <> '')) AS t")
          .select(col("grp"), lower(col("t")).as("term"))
        val cnt = tok.groupBy("term").agg(
          sum(when(col("grp") === 0, 1L).otherwise(0L)).as("ca"),
          sum(when(col("grp") === 1, 1L).otherwise(0L)).as("cb"))
        val tot = cnt.agg(sum(col("ca")).as("na"), sum(col("cb")).as("nb"))
        val terms = cnt.crossJoin(broadcast(tot))
          .selectExpr("ca", "cb",
            "CAST(ca AS DOUBLE) / na AS p", "CAST(cb AS DOUBLE) / nb AS q")
          .selectExpr("ca", "cb", "p", "q", "(p + q) / 2e0 AS m")
          .selectExpr(
            "CASE WHEN ca > 0 THEN p * CAST(CAST(ln(p / m) AS FLOAT) AS DOUBLE) ELSE 0e0 END AS tp",
            "CASE WHEN cb > 0 THEN q * CAST(CAST(ln(q / m) AS FLOAT) AS DOUBLE) ELSE 0e0 END AS tq")
        terms.agg(count(lit(1)).as("n_terms"),
            T.xsum(col("tp")).as("kp"), T.xsum(col("tq")).as("kq"))
          .crossJoin(broadcast(tot))
          .selectExpr("n_terms", "na AS n_tok_a", "nb AS n_tok_b",
            "round((kp + kq) / 2e0, 6) AS jsd",
            "round(((kp + kq) / 2e0) / 6.931471805599453e-1, 6) AS jsd_norm")
      },
      Some(s"""WITH tok AS (SELECT
                     CAST(substr(source, 4) AS INT) % 2 AS grp,
                     lower(unnest(list_filter(string_split(text, ' '), t -> t <> ''))) AS term
                   FROM documents),
                 cnt AS (SELECT term,
                     CAST(sum(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ca,
                     CAST(sum(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT) AS cb
                   FROM tok GROUP BY term),
                 tot AS (SELECT CAST(sum(ca) AS BIGINT) AS na,
                     CAST(sum(cb) AS BIGINT) AS nb FROM cnt),
                 pq AS (SELECT ca, cb,
                     CAST(ca AS DOUBLE) / na AS p, CAST(cb AS DOUBLE) / nb AS q
                   FROM cnt CROSS JOIN tot),
                 tm AS (SELECT ca, cb, p, q, (p + q) / 2e0 AS m FROM pq),
                 kl AS (SELECT
                     CASE WHEN ca > 0 THEN p * CAST(CAST(ln(p / m) AS REAL) AS DOUBLE) ELSE 0e0 END AS tp,
                     CASE WHEN cb > 0 THEN q * CAST(CAST(ln(q / m) AS REAL) AS DOUBLE) ELSE 0e0 END AS tq
                   FROM tm),
                 agg AS (SELECT count(*) AS n_terms,
                     ${T.sqlXsum("tp")} AS kp, ${T.sqlXsum("tq")} AS kq
                   FROM kl)
               SELECT n_terms, na AS n_tok_a, nb AS n_tok_b,
                 round((kp + kq) / 2e0, 6) AS jsd,
                 round(((kp + kq) / 2e0) / 6.931471805599453e-1, 6) AS jsd_norm
               FROM agg CROSS JOIN tot""")),

    QueryDef(
      "text_ttr",
      // Lexical diversity per source — type-token ratio (the classic
      // vocabulary-richness number a curation dashboard tracks next to
      // text_quality; templated/boilerplate sources show up as LOW TTR):
      // per doc TTR = |distinct terms| / |tokens|, rolled up per source
      // with the root-TTR (Guiraud's R = types/√tokens, the
      // length-robust variant). One tokenize pass → (doc, term) counts →
      // per-doc then per-source bounded reductions; ratios of exact
      // BIGINTs, √ uncollapsed (IEEE-exact).
      (s, dir) => {
        val tok = T.documents(s, dir)
          .transform(T.fanOut(_, col("doc_id")))
          .selectExpr("doc_id", "source",
            "explode(filter(split(text, ' '), t -> t <> '')) AS t")
          .select(col("doc_id"), col("source"), lower(col("t")).as("term"))
        val perDoc = tok.groupBy("doc_id", "source")
          .agg(count(lit(1)).as("n_tok"),
            countDistinct(col("term")).as("n_typ"))
          .selectExpr("source",
            "CAST(n_typ AS DOUBLE) / n_tok AS ttr",
            "CAST(n_typ AS DOUBLE) / sqrt(CAST(n_tok AS DOUBLE)) AS rttr")
        perDoc.groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            round(T.xsum(col("ttr")) / count(lit(1)), 6).as("avg_ttr"),
            round(T.xsum(col("rttr")) / count(lit(1)), 6).as("avg_root_ttr"))
          .orderBy("source")
      },
      Some(s"""WITH tok AS (SELECT doc_id, source,
                     lower(unnest(list_filter(string_split(text, ' '), t -> t <> ''))) AS term
                   FROM documents),
                 pd AS (SELECT source,
                     CAST(count(DISTINCT term) AS DOUBLE) / count(*) AS ttr,
                     CAST(count(DISTINCT term) AS DOUBLE) / sqrt(CAST(count(*) AS DOUBLE)) AS rttr
                   FROM tok GROUP BY doc_id, source)
               SELECT source, count(*) AS n_docs,
                 round(${T.sqlXsum("ttr")} / count(*), 6) AS avg_ttr,
                 round(${T.sqlXsum("rttr")} / count(*), 6) AS avg_root_ttr
               FROM pd GROUP BY source ORDER BY source""")),

    QueryDef(
      "text_char_entropy",
      // Per-document CHARACTER entropy — the compression-ratio proxy a
      // curation pipeline thresholds on (low-entropy docs are repeated
      // boilerplate/padding; the zlib-ratio filter's statistics without
      // the codec): H(doc) = ln L − (Σ_c n_c·ln n_c)/L over the doc's
      // char counts, reported as a 0.25-nat histogram with per-bucket
      // mean length. Two vertex-keyed aggregations ((doc, char) counts,
      // then per-doc reduction over its ≤alphabet rows); ln
      // REAL-collapsed per term, per-doc sums exact — the unigram_lm
      // determinism discipline at char granularity.
      (s, dir) => {
        // ADVICE r10 #1: Spark's sequence(1, 0) counts DOWN to [1, 0]
        // (two empty-char rows per empty doc) where DuckDB's
        // generate_series(1, 0) is empty — guard the degenerate doc out
        // BEFORE the transform, mirroring Dedup.ngramJaccard's
        // size(ts) >= 3 guard; the oracle carries the same predicate.
        val cc = T.documents(s, dir)
          .transform(T.fanOut(_, col("doc_id")))
          .where(length(col("text")) >= 1)
          .select(col("doc_id"),
            explode(expr(
              "transform(sequence(1, length(text)), i -> substring(text, i, 1))")).as("ch"))
          .groupBy("doc_id", "ch").agg(count(lit(1)).as("nc"))
        val ent = cc.groupBy("doc_id")
          .agg(sum(col("nc")).as("len"),
            T.xsum(expr(
              "nc * CAST(CAST(ln(CAST(nc AS DOUBLE)) AS FLOAT) AS DOUBLE)")).as("snl"))
          .selectExpr("doc_id", "len",
            "CAST(CAST(ln(CAST(len AS DOUBLE)) AS FLOAT) AS DOUBLE) - snl / len AS h")
        ent.selectExpr("floor(h / 25e-2) * 25e-2 AS h_bucket", "h", "len")
          .groupBy("h_bucket")
          .agg(count(lit(1)).as("n_docs"),
            round(T.xsum(col("h")) / count(lit(1)), 6).as("avg_entropy"),
            round(T.xsum(col("len")) / count(lit(1)), 6).as("avg_len"))
          .orderBy("h_bucket")
      },
      Some(s"""WITH cc AS (SELECT doc_id, ch, count(*) AS nc FROM (
                   SELECT doc_id,
                     unnest(list_transform(generate_series(1, length(text)),
                       i -> substring(text, CAST(i AS INT), 1))) AS ch
                   FROM documents WHERE length(text) >= 1) t
                 GROUP BY doc_id, ch),
                 ent AS (SELECT doc_id, CAST(sum(nc) AS BIGINT) AS len,
                     ${T.sqlXsum("nc * CAST(CAST(ln(CAST(nc AS DOUBLE)) AS REAL) AS DOUBLE)")} AS snl
                   FROM cc GROUP BY doc_id),
                 h AS (SELECT doc_id, len,
                     CAST(CAST(ln(CAST(len AS DOUBLE)) AS REAL) AS DOUBLE) - snl / len AS h
                   FROM ent)
               SELECT floor(h / 25e-2) * 25e-2 AS h_bucket,
                 count(*) AS n_docs,
                 round(${T.sqlXsum("h")} / count(*), 6) AS avg_entropy,
                 round(${T.sqlXsum("len")} / count(*), 6) AS avg_len
               FROM h GROUP BY 1 ORDER BY 1""")),

    QueryDef(
      "text_zipf",
      // Zipf's-law diagnostic — the corpus-statistics check next to
      // text_langid/text_quality: OLS of ln(freq) on ln(rank) over the
      // TOP-100 vocabulary terms; a natural corpus fits slope ≈ −1, and a
      // synthetic/templated corpus (like this fixture) shows up precisely
      // by deviating — the curation signal. One map-side-combined vocab
      // count, top-100 via TakeOrderedAndProject (never a global sort or
      // an unbounded window — the rank is assigned AFTER the top-k, over
      // 100 rows), then the closed-form fit on the bounded frame. ln is
      // REAL-collapsed (lnR); the fit arithmetic is the shared learning-
      // curve moment text.
      (s, dir) => {
        val top = T.documents(s, dir).transform(T.fanOut(_, col("doc_id")))
          .selectExpr("explode(filter(split(text, ' '), t -> t <> '')) AS t")
          .select(lower(col("t")).as("term"))
          .groupBy("term").agg(count(lit(1)).as("cnt"))
          .orderBy(col("cnt").desc, col("term")).limit(100)
        val rw = Window.orderBy(col("cnt").desc, col("term"))
        top.withColumn("rank", row_number().over(rw))
          .selectExpr(
            "CAST(CAST(ln(CAST(rank AS DOUBLE)) AS FLOAT) AS DOUBLE) AS lx",
            "CAST(CAST(ln(CAST(cnt AS DOUBLE)) AS FLOAT) AS DOUBLE) AS ly")
          .agg(count(lit(1)).cast("double").as("nd"),
            T.xsum(col("lx")).as("sx"), T.xsum(col("ly")).as("sy"),
            T.xsum(col("lx") * col("lx")).as("sxx"),
            T.xsum(col("lx") * col("ly")).as("sxy"),
            T.xsum(col("ly") * col("ly")).as("syy"))
          .selectExpr("*",
            "(nd * sxy - sx * sy) / (nd * sxx - sx * sx) AS slope")
          .selectExpr("*", "(sy - slope * sx) / nd AS icept",
            "((nd * sxy - sx * sy) * (nd * sxy - sx * sy)) / ((nd * sxx - sx * sx) * (nd * syy - sy * sy)) AS r2")
          .selectExpr("CAST(nd AS BIGINT) AS n_terms",
            "round(slope, 6) AS zipf_slope",
            "round(icept, 6) AS intercept", "round(r2, 6) AS r2")
      },
      Some(s"""WITH tk AS (SELECT lower(t) AS term FROM (
                   SELECT unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS t
                   FROM documents) x),
                 top AS (SELECT term, count(*) AS cnt FROM tk GROUP BY term
                         ORDER BY cnt DESC, term LIMIT 100),
                 rkd AS (SELECT cnt,
                     row_number() OVER (ORDER BY cnt DESC, term) AS rank
                   FROM top),
                 lg AS (SELECT
                     CAST(CAST(ln(CAST(rank AS DOUBLE)) AS REAL) AS DOUBLE) AS lx,
                     CAST(CAST(ln(CAST(cnt AS DOUBLE)) AS REAL) AS DOUBLE) AS ly
                   FROM rkd),
                 m AS (SELECT CAST(count(*) AS DOUBLE) AS nd,
                     ${T.sqlXsum("lx")} AS sx, ${T.sqlXsum("ly")} AS sy,
                     ${T.sqlXsum("lx * lx")} AS sxx, ${T.sqlXsum("lx * ly")} AS sxy,
                     ${T.sqlXsum("ly * ly")} AS syy
                   FROM lg),
                 s1 AS (SELECT *, (nd * sxy - sx * sy) / (nd * sxx - sx * sx) AS slope FROM m),
                 s2 AS (SELECT *, (sy - slope * sx) / nd AS icept,
                     ((nd * sxy - sx * sy) * (nd * sxy - sx * sy)) / ((nd * sxx - sx * sx) * (nd * syy - sy * sy)) AS r2
                   FROM s1)
               SELECT CAST(nd AS BIGINT) AS n_terms,
                 round(slope, 6) AS zipf_slope,
                 round(icept, 6) AS intercept, round(r2, 6) AS r2
               FROM s2""")),

    QueryDef(
      "text_pack_sequences",
      // GPT-style SEQUENCE PACKING audit — the step between curation and
      // the trainer: documents concatenate per source in doc_id order and
      // split into fixed 512-token context windows (documents straddle
      // boundaries — the standard pretraining packing, zero padding
      // inside the stream). Emits the packing efficiency a pipeline logs:
      // windows needed, fill ratio of the allocated window space, and the
      // max documents starting in one window (the attention-mask
      // fragmentation signal). Dataflow: ONE token-count map + ONE
      // prefix-sum window per source (ordered by doc_id — at scale the
      // per-source streams are the partitions and this is a per-partition
      // running total) + two bounded aggregations. All integer
      // arithmetic: token counts exact, window index = cumsum div 512 —
      // no float anywhere before the final ratio.
      (s, dir) => {
        val d = T.documents(s, dir).transform(T.fanOut(_, col("doc_id")))
          .select(col("doc_id"), col("source"),
            expr("CAST(size(filter(split(text, ' '), t -> t <> '')) AS BIGINT)").as("tok"))
        val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val packed = d
          .withColumn("cumb", coalesce(sum(col("tok")).over(w), lit(0L)))
          .withColumn("win", expr("cumb div 512"))
        val perWin = packed.groupBy("source", "win")
          .agg(count(lit(1)).as("dw"))
          .groupBy("source").agg(max(col("dw")).as("max_docs_per_window"))
        packed.groupBy("source")
          .agg(count(lit(1)).as("n_docs"), sum(col("tok")).as("total_tokens"))
          .join(perWin, "source")
          .selectExpr("source", "n_docs", "total_tokens",
            "(total_tokens + 511) div 512 AS n_windows",
            "round(CAST(total_tokens AS DOUBLE) / (((total_tokens + 511) div 512) * 512e0), 6) AS fill_ratio",
            "max_docs_per_window")
          .orderBy("source")
      },
      Some("""WITH d AS (SELECT doc_id, source,
                   CAST(len(list_filter(string_split(text, ' '), t -> t <> '')) AS BIGINT) AS tok
                 FROM documents),
                 p AS (SELECT *, coalesce(sum(tok) OVER (PARTITION BY source
                     ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING
                     AND 1 PRECEDING), 0) AS cumb FROM d),
                 pw AS (SELECT source, cumb // 512 AS win, count(*) AS dw
                        FROM p GROUP BY source, cumb // 512),
                 mx AS (SELECT source, max(dw) AS max_docs_per_window
                        FROM pw GROUP BY source),
                 ag AS (SELECT source, count(*) AS n_docs,
                     CAST(sum(tok) AS BIGINT) AS total_tokens
                   FROM p GROUP BY source)
               SELECT ag.source, n_docs, total_tokens,
                 CAST((total_tokens + 511) // 512 AS BIGINT) AS n_windows,
                 round(CAST(total_tokens AS DOUBLE) / (((total_tokens + 511) // 512) * 512e0), 6) AS fill_ratio,
                 max_docs_per_window
               FROM ag JOIN mx USING (source) ORDER BY ag.source""")),

    QueryDef(
      "text_domain_mix",
      // Data-MIXTURE reweighting (the DoReMi/multilingual-sampling step a
      // pretraining pipeline runs over its domain shares): per source the
      // exact token share p_i, and the temperature-rebalanced sampling
      // weight w_i = p_i^α / Σ_j p_j^α at α = 1/2 — upweights small
      // domains, the standard smoothing between proportional (α=1) and
      // uniform (α=0). Dataflow: one token-count aggregation to 20 source
      // rows, then bounded global windows over those rows (the
      // post-aggregation bounded-window pattern — never a data-sized
      // single partition). Determinism: counts exact; p is one shared
      // double divide; sqrt is correctly-rounded IEEE; the α-mass sum
      // runs as DECIMAL(30,12) so its order can't matter.
      (s, dir) => {
        val w = Window.partitionBy()
        T.documents(s, dir).transform(T.fanOut(_, col("doc_id")))
          .select(col("source"),
            expr("CAST(size(filter(split(text, ' '), t -> t <> '')) AS BIGINT)").as("tok"))
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"), sum(col("tok")).as("n_tokens"))
          .withColumn("tt", sum(col("n_tokens")).over(w))
          .withColumn("p", expr("CAST(n_tokens AS DOUBLE) / tt"))
          .withColumn("sq", expr("sqrt(p)"))
          .withColumn("ws", sum(expr("CAST(sq AS DECIMAL(30,12))")).over(w))
          .selectExpr("source", "n_docs", "n_tokens",
            "round(p, 6) AS token_share",
            "round(sq / CAST(ws AS DOUBLE), 6) AS mix_weight")
          .orderBy("source")
      },
      Some("""WITH d AS (SELECT source,
                   CAST(len(list_filter(string_split(text, ' '), t -> t <> '')) AS BIGINT) AS tok
                 FROM documents),
                 ag AS (SELECT source, count(*) AS n_docs,
                     CAST(sum(tok) AS BIGINT) AS n_tokens
                   FROM d GROUP BY source),
                 sh AS (SELECT *, CAST(n_tokens AS DOUBLE)
                     / sum(n_tokens) OVER () AS p FROM ag),
                 sq AS (SELECT *, sqrt(p) AS sq FROM sh),
                 ws AS (SELECT *, sum(CAST(sq AS DECIMAL(30,12))) OVER () AS ws FROM sq)
               SELECT source, n_docs, n_tokens,
                 round(p, 6) AS token_share,
                 round(sq / CAST(ws AS DOUBLE), 6) AS mix_weight
               FROM ws ORDER BY source""")),

    QueryDef(
      "text_bpe_merge",
      // ITERATED BPE training, 3 unrolled merge rounds (r10 — VERDICT r9
      // #5: round 1 alone was just pair counting; real tokenizer training
      // re-segments with the winning pair and repeats). The trainer runs
      // on the WORD-FREQUENCY VOCAB, not the corpus — the classic BPE
      // optimization and the 100 TB design: one corpus pass builds
      // (word, freq), every merge round then iterates over the vocab
      // table (≪ corpus) with freq-weighted pair counts. Segmentations
      // ride a separator-wrapped string (chr(31) between symbols, also at
      // both ends), so the merge is ONE shared-text `replace` per round:
      // replacing '␟p1␟p2␟' with '␟p1p2␟' is exactly greedy left-to-right
      // non-overlapping pair merging (both engines' replace() scans left
      // to right and never rescans the replacement — e.g. winner (a,a) on
      // "aaa" gives (aa,a)), and the full-symbol separators make a
      // multi-char symbol atomic (winner (b,c) cannot fire inside symbol
      // "ab"). Each round's winner is the (n DESC, p1, p2) top-1, kept
      // IN-PLAN as a broadcast one-row frame — no driver collect. Output:
      // the merge table — top-5 freq-weighted pairs per round. Exact
      // integer counting end-to-end.
      (s, dir) => {
        val seg1 = T.freeze(bpeVocab(s, dir))
        val c1 = T.freeze(bpeRanked(bpePairCounts(seg1), 1))
        val seg2 = bpeMerge(seg1, bpeWinner(c1))
        val c2 = T.freeze(bpeRanked(bpePairCounts(seg2), 2))
        val seg3 = bpeMerge(seg2, bpeWinner(c2))
        val c3 = bpeRanked(bpePairCounts(seg3), 3)
        Seq(c1, c2, c3).reduce(_ unionAll _)
          .where(col("rank") <= 5)
          .select(col("round"), col("rank"), col("p1"), col("p2"), col("n"))
          .orderBy("round", "rank")
      },
      Some {
        def pairCtes(r: Int, segSrc: String): String =
          s"""sy$r AS (SELECT freq,
                 list_filter(string_split(seg, chr(31)), x -> x <> '') AS syms
               FROM $segSrc),
             pr$r AS (SELECT freq, syms[CAST(i AS INT)] AS p1,
                 syms[CAST(i AS INT) + 1] AS p2
               FROM (SELECT freq, syms, unnest(generate_series(1, len(syms) - 1)) AS i
                     FROM sy$r WHERE len(syms) >= 2) x),
             c$r AS (SELECT round, rank, p1, p2, n FROM (
                 SELECT $r AS round, p1, p2, CAST(sum(freq) AS BIGINT) AS n,
                   row_number() OVER (ORDER BY sum(freq) DESC, p1 ASC, p2 ASC) AS rank
                 FROM pr$r GROUP BY p1, p2) t),
             w$r AS (SELECT p1 AS w1, p2 AS w2 FROM c$r WHERE rank = 1)"""
        def mergeCte(r: Int, prev: String): String =
          s"""seg$r AS (SELECT freq,
                 replace(seg, chr(31) || w1 || chr(31) || w2 || chr(31),
                   chr(31) || w1 || w2 || chr(31)) AS seg
               FROM $prev, w${r - 1})"""
        s"""WITH wd AS (SELECT unnest(list_filter(string_split(text, ' '),
                     t -> t <> '')) AS wd
                 FROM documents),
                 seg1 AS (SELECT count(*) AS freq,
                     chr(31) || regexp_replace(wd, '(.)', '\\1' || chr(31), 'g') AS seg
                   FROM wd WHERE length(wd) >= 2 GROUP BY wd),
                 ${pairCtes(1, "seg1")},
                 ${mergeCte(2, "seg1")},
                 ${pairCtes(2, "seg2")},
                 ${mergeCte(3, "seg2")},
                 ${pairCtes(3, "seg3")}
               SELECT round, rank, p1, p2, n
               FROM (SELECT * FROM c1 UNION ALL SELECT * FROM c2
                     UNION ALL SELECT * FROM c3) z
               WHERE rank <= 5 ORDER BY round, rank"""
      }),

    QueryDef(
      "text_unigram_train",
      // SentencePiece-style UNIGRAM-LM tokenizer training (Kudo 2018,
      // "Subword regularization" §3 — the other trainer family next to
      // BPE; VERDICT r14 #7): seed piece scores from freq-weighted
      // substring counts (the paper's seed vocabulary step), ONE hard-EM
      // round — every vocab word is re-segmented to its MAXIMUM-
      // LIKELIHOOD piece sequence, then piece probabilities re-estimate
      // from the winning segmentations — and the learned top-20 pieces
      // emit with their refit probabilities. Like the BPE trainer this
      // runs on the (word, freq) VOCAB, never the corpus (Heaps' law —
      // the one corpus pass is the word count), which is the 100 TB
      // shape. The Viterbi step is DECLARATIVE: a word of length n has
      // 2^(n-1) cut masks; each mask's boundary list / gap list / piece
      // list derive by pure array expressions, masks with any piece
      // longer than 4 chars are dropped (list_max of the gaps), and the
      // per-mask likelihood is an ORDER-FREE exact sum — each piece's
      // −ln(p) is REAL-collapsed once, cast to DECIMAL(30,12) (the xsum
      // wire), and summed exactly, so the (score, mask) argmin is
      // bit-portable with no float-accumulation-order hazard. Words are
      // capped at 12 chars (mask space 2^11; longer words would need the
      // paper's lattice DP — loud cap, like BAND_CAP) and at ≥ 2 chars
      // (the BPE trainer's vocab convention). Output ranks are integer
      // arithmetic (count DESC, piece ASC), so the emitted probabilities
      // are exact ratios round-tripped at 6 dp.
      (s, dir) => {
        val words = T.documents(s, dir)
          .transform(T.fanOut(_, col("doc_id")))
          .select(explode(expr("filter(split(text, ' '), t -> t <> '')")).as("wd"))
          .where(length(col("wd")).between(2, 12))
          .groupBy("wd").agg(count(lit(1)).as("freq"))
        // seed piece counts: every substring of length 1..4, each
        // occurrence counted, freq-weighted
        val pc = words
          .withColumn("st", explode(expr("sequence(1, length(wd))")))
          .withColumn("ln", explode(expr("sequence(1, least(4, length(wd) - st + 1))")))
          .select(expr("substring(wd, st, ln)").as("piece"), col("freq"))
          .groupBy("piece").agg(sum(col("freq")).as("cnt"))
        val tot = pc.agg(sum(col("cnt")).as("total"))
        val pw = pc.crossJoin(broadcast(tot))
          .selectExpr("piece",
            "CAST(-CAST(CAST(ln(CAST(cnt AS DOUBLE) / total) AS FLOAT) AS DOUBLE) AS DECIMAL(30,12)) AS w")
        // all valid segmentations: mask bit j-1 = cut after char j. The
        // bit tests are integer shifts (r15: the first form used
        // floor(mask / pow(2, j-1)) — double math per bit per mask; the
        // shift is the same predicate in integer ops), and the pieces of
        // a (wd, mask) derive by a pure expression [segPieces] so the
        // winning mask's pieces can be RE-DERIVED from (wd, mask) alone
        // instead of re-running the full 2^(n-1) enumeration a second
        // time for the refit (r15: `sr` was consumed by both the scoring
        // pass and the refit join, and a lazy frame referenced twice runs
        // twice — the refit only needs the 1-winner-per-word rows;
        // before/after in OPTIMIZATION_r15.md).
        def segPieces(df: DataFrame): DataFrame = df
          .withColumn("bnd", expr(
            "concat(array(0), filter(sequence(1, length(wd) - 1), " +
              "j -> (shiftright(mask, j - 1) & CAST(1 AS BIGINT)) = 1), array(length(wd)))"))
          .withColumn("gaps", expr(
            "transform(sequence(1, size(bnd) - 1), k -> element_at(bnd, k + 1) - element_at(bnd, k))"))
          .where(expr("array_max(gaps) <= 4"))
          .withColumn("k", explode(expr("sequence(1, size(gaps))")))
          .selectExpr("wd", "freq", "mask",
            "substring(wd, element_at(bnd, k) + 1, element_at(gaps, k)) AS piece")
        val sr = segPieces(words.withColumn("mask", explode(expr(
          "sequence(CAST(0 AS BIGINT), CAST(pow(2, length(wd) - 1) AS BIGINT) - 1)"))))
        val best = sr.join(pw, "piece")
          .groupBy("wd", "mask").agg(sum(col("w")).as("score"))
          .withColumn("rn", row_number().over(
            Window.partitionBy(col("wd")).orderBy(col("score").asc, col("mask").asc)))
          .where(col("rn") === 1).select("wd", "mask")
        // refit over the WINNING segmentation only: one mask per word, so
        // re-deriving its pieces is O(vocab), not O(vocab × 2^n)
        val mc = segPieces(words.join(best, "wd"))
          .groupBy("piece").agg(sum(col("freq")).as("n"))
        val t2 = mc.agg(sum(col("n")).as("total2"))
        mc.withColumn("rank", row_number().over(
            Window.orderBy(col("n").desc, col("piece").asc)))
          .where(col("rank") <= 20)
          .crossJoin(broadcast(t2))
          .selectExpr("rank", "piece", "n",
            "round(CAST(n AS DOUBLE) / total2, 6) AS prob")
          .orderBy("rank")
      },
      Some("""WITH wv AS (SELECT wd, count(*) AS freq FROM (
                   SELECT unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS wd
                   FROM documents) x
                 WHERE length(wd) BETWEEN 2 AND 12 GROUP BY wd),
               pc AS (SELECT piece, CAST(sum(freq) AS BIGINT) AS cnt FROM (
                   SELECT substr(wd, CAST(st AS INT), CAST(ln AS INT)) AS piece, freq
                   FROM (SELECT wd, freq, st,
                           unnest(generate_series(1, least(4, length(wd) - st + 1))) AS ln
                         FROM (SELECT wd, freq,
                                 unnest(generate_series(1, length(wd))) AS st
                               FROM wv) a) b) c
                 GROUP BY piece),
               tot AS (SELECT sum(cnt) AS total FROM pc),
               pw AS (SELECT piece,
                   CAST(-CAST(CAST(ln(CAST(cnt AS DOUBLE) / total) AS FLOAT) AS DOUBLE) AS DECIMAL(30,12)) AS w
                 FROM pc CROSS JOIN tot),
               mk AS (SELECT wd, freq,
                   unnest(generate_series(CAST(0 AS BIGINT), CAST(pow(2, length(wd) - 1) AS BIGINT) - 1)) AS mask
                 FROM wv),
               sg AS (SELECT wd, freq, mask, bnd,
                   list_transform(generate_series(1, len(bnd) - 1),
                     k -> bnd[CAST(k AS INT) + 1] - bnd[CAST(k AS INT)]) AS gaps
                 FROM (SELECT wd, freq, mask,
                         list_concat(list_concat([CAST(0 AS BIGINT)],
                           list_filter(generate_series(CAST(1 AS BIGINT), CAST(length(wd) AS BIGINT) - 1),
                             j -> CAST(floor(mask / pow(2, j - 1)) AS BIGINT) % 2 = 1)),
                           [CAST(length(wd) AS BIGINT)]) AS bnd
                       FROM mk) s0),
               sr AS (SELECT wd, freq, mask,
                   substr(wd, CAST(bnd[CAST(k AS INT)] AS INT) + 1, CAST(gaps[CAST(k AS INT)] AS INT)) AS piece
                 FROM (SELECT wd, freq, mask, bnd, gaps,
                         unnest(generate_series(1, len(gaps))) AS k
                       FROM sg WHERE list_max(gaps) <= 4) x),
               sc AS (SELECT wd, mask, sum(w) AS score
                 FROM sr JOIN pw USING (piece) GROUP BY wd, mask),
               bst AS (SELECT wd, mask FROM (
                   SELECT wd, mask, row_number() OVER (PARTITION BY wd
                     ORDER BY score ASC, mask ASC) AS rn FROM sc) t
                 WHERE rn = 1),
               mc AS (SELECT piece, CAST(sum(freq) AS BIGINT) AS n
                 FROM sr JOIN bst USING (wd, mask) GROUP BY piece),
               t2 AS (SELECT sum(n) AS total2 FROM mc)
              SELECT rank, piece, n,
                round(CAST(n AS DOUBLE) / total2, 6) AS prob
              FROM (SELECT piece, n, row_number() OVER (ORDER BY n DESC, piece ASC) AS rank
                    FROM mc) r CROSS JOIN t2
              WHERE rank <= 20 ORDER BY rank""")),

    QueryDef(
      "text_bpe_apply",
      // BPE APPLY/ENCODE (r11 — VERDICT r10 #5: the trainer's missing
      // twin): re-segment the corpus with text_bpe_merge's LEARNED merge
      // table (all 3 round winners, applied in training order) and meter
      // each source in learned-BPE tokens — the number a tokenizer-aware
      // data pipeline actually budgets with, next to text_token_count's
      // regex-lexer metering. The encode exploits the same vocab
      // factorization as the trainer: merges apply per DISTINCT word
      // (shared bpeVocab/bpeMerge dataflow — the apply provably replays
      // the trainer's segmentation because it IS the trainer's
      // segmentation, extended by the round-3 winner the trainer counts
      // but never applies), and the corpus metering is a (word → n_syms)
      // equi-join against per-source word counts. The lexicon join is
      // SHUFFLED, not broadcast — Heaps' law makes a 100 TB vocabulary
      // unbroadcastable (the text_unigram_lm scale note); single-char
      // words sit outside the trainer's vocab (length ≥ 2) and encode as
      // exactly 1 token via the left-join coalesce. Per-round freeze =
      // the dedup_cluster loop discipline (each seg level is referenced
      // by both the next pair count and the next merge — unfrozen, the
      // logical plan doubles per round).
      (s, dir) => {
        val seg1 = T.freeze(bpeVocab(s, dir))
        val seg2 = T.freeze(bpeMerge(seg1, bpeWinner(bpeRanked(bpePairCounts(seg1), 1))))
        val seg3 = T.freeze(bpeMerge(seg2, bpeWinner(bpeRanked(bpePairCounts(seg2), 2))))
        val seg4 = bpeMerge(seg3, bpeWinner(bpeRanked(bpePairCounts(seg3), 3)))
        val lex = seg4.selectExpr("wd",
          "CAST(size(filter(split(seg, chr(31)), x -> x <> '')) AS BIGINT) AS nsym")
        val swc = T.documents(s, dir)
          .transform(T.fanOut(_, col("doc_id")))
          .select(col("source"),
            explode(expr("filter(split(text, ' '), t -> t <> '')")).as("wd"))
          .groupBy("source", "wd").agg(count(lit(1)).as("cnt"))
        swc.join(lex, Seq("wd"), "left")
          .groupBy("source")
          .agg(sum(col("cnt")).as("n_words"),
            sum(col("cnt") * coalesce(col("nsym"), lit(1L))).as("n_tokens_bpe"))
          .selectExpr("source", "n_words", "n_tokens_bpe",
            "round(CAST(n_tokens_bpe AS DOUBLE) / n_words, 6) AS tokens_per_word")
          .orderBy("source")
      },
      Some {
        // trainer chain with wd carried through each seg level (the apply
        // needs the word → final-segmentation lexicon; the trainer oracle
        // drops wd after seg1)
        def pairCtes(r: Int): String =
          s"""sy$r AS (SELECT freq,
                 list_filter(string_split(seg, chr(31)), x -> x <> '') AS syms
               FROM seg$r),
             pr$r AS (SELECT freq, syms[CAST(i AS INT)] AS p1,
                 syms[CAST(i AS INT) + 1] AS p2
               FROM (SELECT freq, syms, unnest(generate_series(1, len(syms) - 1)) AS i
                     FROM sy$r WHERE len(syms) >= 2) x),
             w$r AS (SELECT p1 AS w1, p2 AS w2 FROM (
                 SELECT p1, p2,
                   row_number() OVER (ORDER BY sum(freq) DESC, p1 ASC, p2 ASC) AS rank
                 FROM pr$r GROUP BY p1, p2) t
               WHERE rank = 1)"""
        def mergeCte(r: Int): String =
          s"""seg$r AS (SELECT wd, freq,
                 replace(seg, chr(31) || w1 || chr(31) || w2 || chr(31),
                   chr(31) || w1 || w2 || chr(31)) AS seg
               FROM seg${r - 1}, w${r - 1})"""
        s"""WITH tok AS (SELECT source,
                     unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS wd
                   FROM documents),
                 swc AS (SELECT source, wd, count(*) AS cnt
                         FROM tok GROUP BY source, wd),
                 seg1 AS (SELECT wd, count(*) AS freq,
                     chr(31) || regexp_replace(wd, '(.)', '\\1' || chr(31), 'g') AS seg
                   FROM tok WHERE length(wd) >= 2 GROUP BY wd),
                 ${pairCtes(1)},
                 ${mergeCte(2)},
                 ${pairCtes(2)},
                 ${mergeCte(3)},
                 ${pairCtes(3)},
                 ${mergeCte(4)},
                 lex AS (SELECT wd,
                     CAST(len(list_filter(string_split(seg, chr(31)),
                       x -> x <> '')) AS BIGINT) AS nsym
                   FROM seg4)
               SELECT source, CAST(sum(cnt) AS BIGINT) AS n_words,
                 CAST(sum(cnt * coalesce(nsym, 1)) AS BIGINT) AS n_tokens_bpe,
                 round(CAST(sum(cnt * coalesce(nsym, 1)) AS DOUBLE) / sum(cnt), 6) AS tokens_per_word
               FROM swc LEFT JOIN lex USING (wd)
               GROUP BY source ORDER BY source"""
      }),

    QueryDef(
      "text_chunk_overlap",
      // RAG-style overlapping chunking — the retrieval-corpus prep step
      // next to text_pack_sequences' trainer packing: each document is
      // cut into 32-token windows with stride 24 (8-token overlap, the
      // context-bridging convention), chunks start at token offsets 0,
      // 24, 48, … while the offset is inside the document, and the final
      // chunk is allowed short (a trailing fragment is still retrievable
      // context). Dataflow: ONE token-count map + ONE bounded
      // explode of the per-doc offset sequence (⌈n/stride⌉ rows per doc —
      // linear in corpus tokens, never quadratic) + one aggregation per
      // source. All integer arithmetic until the final ratios. Emits the
      // numbers a chunking run logs: chunk count, mean chunk tokens, and
      // the index-inflation factor (chunked tokens / raw tokens — the
      // storage price of the overlap).
      (s, dir) => {
        val d = T.documents(s, dir).transform(T.fanOut(_, col("doc_id")))
          .select(col("doc_id"), col("source"),
            expr("CAST(size(filter(split(text, ' '), t -> t <> '')) AS BIGINT)").as("tok"))
          .where(col("tok") > 0)
        val chunks = d.select(col("doc_id"), col("source"), col("tok"),
            explode(expr("sequence(0, CAST(tok - 1 AS BIGINT), 24)")).as("off"))
          .select(col("doc_id"), col("source"),
            least(col("tok") - col("off"), lit(32L)).as("ctok"))
        chunks.groupBy("source")
          .agg(countDistinct(col("doc_id")).as("n_docs"),
            count(lit(1)).as("n_chunks"),
            sum(col("ctok")).as("chunk_tokens"))
          .join(d.groupBy("source").agg(sum(col("tok")).as("raw_tokens")), "source")
          .selectExpr("source", "n_docs", "n_chunks",
            "round(CAST(chunk_tokens AS DOUBLE) / n_chunks, 6) AS avg_chunk_tokens",
            "round(CAST(chunk_tokens AS DOUBLE) / raw_tokens, 6) AS inflation")
          .orderBy("source")
      },
      Some("""WITH d AS (SELECT doc_id, source,
                   CAST(len(list_filter(string_split(text, ' '), t -> t <> '')) AS BIGINT) AS tok
                 FROM documents),
                 dd AS (SELECT * FROM d WHERE tok > 0),
                 ch AS (SELECT doc_id, source,
                     least(tok - off, 32) AS ctok
                   FROM (SELECT doc_id, source, tok,
                       unnest(generate_series(0, tok - 1, 24)) AS off
                     FROM dd) x),
                 ag AS (SELECT source, count(DISTINCT doc_id) AS n_docs,
                     count(*) AS n_chunks,
                     CAST(sum(ctok) AS BIGINT) AS chunk_tokens
                   FROM ch GROUP BY source),
                 rw AS (SELECT source, CAST(sum(tok) AS BIGINT) AS raw_tokens
                        FROM dd GROUP BY source)
               SELECT source, n_docs, n_chunks,
                 round(CAST(chunk_tokens AS DOUBLE) / n_chunks, 6) AS avg_chunk_tokens,
                 round(CAST(chunk_tokens AS DOUBLE) / raw_tokens, 6) AS inflation
               FROM ag JOIN rw USING (source) ORDER BY source""")),

    QueryDef(
      "text_perplexity_bucket",
      // CCNet's head/middle/tail split — the step AFTER text_unigram_lm's
      // scoring: rank every document by its LM negative log-likelihood
      // and cut the corpus into perplexity terciles (head = fluent,
      // middle, tail = quarantine candidates; CCNet routes each third to
      // a different training-mix weight). Shares text_unigram_lm's exact
      // dataflow for the per-doc NLL (shuffled vocab join, term-level
      // REAL-collapsed logp, exact-decimal doc sums); the tercile is
      // ntile(3) over (nll, doc_id) — a deterministic total order, so the
      // bucket boundary cannot float between engines. The single
      // unpartitioned ntile window runs over the POST-AGGREGATION per-doc
      // NLL table (one row per document, the documented bounded-window
      // pattern; at 100 TB the split would come from approx quantiles of
      // the same table). Output: per (bucket, lang) doc counts and NLL
      // range — the mix-table a curation run feeds back into sampling.
      (s, dir) => {
        val tok = T.documents(s, dir)
          .transform(T.fanOut(_, col("doc_id")))
          .selectExpr("doc_id", "lang",
            "explode(filter(split(text, ' '), t -> t <> '')) AS t")
          .select(col("doc_id"), col("lang"), lower(col("t")).as("term"))
        val ntot = tok.agg(count(lit(1)).as("n_tok_total"))
        val vocab = tok.groupBy("term").agg(count(lit(1)).as("cnt"))
          .crossJoin(broadcast(ntot))
          .selectExpr("term",
            "CAST(CAST(ln(CAST(cnt AS DOUBLE) / n_tok_total) AS FLOAT) AS DOUBLE) AS logp")
        val nll = tok.join(vocab, "term")
          .groupBy("doc_id", "lang")
          .agg((T.xsum(-col("logp")) / count(lit(1))).as("nll"))
        val tw = Window.orderBy(col("nll"), col("doc_id"))
        nll.withColumn("bucket", ntile(3).over(tw))
          .groupBy("bucket", "lang")
          .agg(count(lit(1)).as("n_docs"),
            round(min(col("nll")), 6).as("min_nll"),
            round(max(col("nll")), 6).as("max_nll"))
          .orderBy("bucket", "lang")
      },
      Some(s"""WITH tok AS (SELECT doc_id, lang, lower(t) AS term FROM (
                   SELECT doc_id, lang,
                     unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS t
                   FROM documents) x),
                 ntot AS (SELECT count(*) AS n_tok_total FROM tok),
                 vocab AS (SELECT term,
                     CAST(CAST(ln(CAST(count(*) AS DOUBLE) / any_value(n_tok_total)) AS REAL) AS DOUBLE) AS logp
                   FROM tok CROSS JOIN ntot GROUP BY term),
                 pd AS (SELECT doc_id, lang,
                     ${T.sqlXsum("-logp")} / count(*) AS nll
                   FROM tok JOIN vocab USING (term)
                   GROUP BY doc_id, lang),
                 bk AS (SELECT *, ntile(3) OVER (ORDER BY nll, doc_id) AS bucket
                        FROM pd)
               SELECT bucket, lang, count(*) AS n_docs,
                 round(min(nll), 6) AS min_nll,
                 round(max(nll), 6) AS max_nll
               FROM bk GROUP BY bucket, lang ORDER BY bucket, lang""")),

    QueryDef(
      "text_keywords",
      // Corpus keyword extraction — each document's single strongest
      // TF-IDF term (the degenerate-but-distributed core of RAKE/KeyBERT
      // pipelines), rolled up to the top-20 corpus keywords by how many
      // documents elect them. The per-doc argmax is a doc-keyed window
      // (never global); df comes from one distinct aggregate; the tf·idf
      // weight REAL-collapses its ln exactly like text_tfidf so the
      // argmax ordering is bit-stable cross-engine. Output bounded at 20
      // — the tag cloud a curation dashboard renders.
      (s, dir) => {
        val dt = T.documents(s, dir)
          .transform(T.fanOut(_, col("doc_id")))
          .selectExpr("doc_id",
            "explode(filter(split(text, ' '), t -> t <> '')) AS term")
        val ntot = T.documents(s, dir).agg(count(lit(1)).as("n_total"))
        val dfx = dt.distinct().groupBy("term").agg(count(lit(1)).as("df"))
        val tf = dt.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
        val w = Window.partitionBy(col("doc_id"))
          .orderBy(col("w").desc, col("term"))
        tf.join(dfx, "term").crossJoin(broadcast(ntot))
          .selectExpr("doc_id", "term",
            "CAST(CAST(tf * ln(CAST(n_total AS DOUBLE) / df) AS FLOAT) AS DOUBLE) AS w")
          .withColumn("rn", row_number().over(w)).where(col("rn") === 1)
          .groupBy("term").agg(count(lit(1)).as("n_docs_rank1"))
          .orderBy(col("n_docs_rank1").desc, col("term")).limit(20)
      },
      Some("""WITH dt AS (SELECT doc_id, t AS term FROM (
                   SELECT doc_id,
                     unnest(list_filter(string_split(text, ' '), t -> t <> '')) AS t
                   FROM documents) x),
                 ntot AS (SELECT count(*) AS n_total FROM documents),
                 dfx AS (SELECT term, count(*) AS df
                         FROM (SELECT DISTINCT doc_id, term FROM dt) u
                         GROUP BY term),
                 tf AS (SELECT doc_id, term, count(*) AS tf
                        FROM dt GROUP BY doc_id, term),
                 wt AS (SELECT doc_id, term,
                     CAST(CAST(tf * ln(CAST(n_total AS DOUBLE) / df) AS REAL) AS DOUBLE) AS w
                   FROM tf JOIN dfx USING (term) CROSS JOIN ntot),
                 top1 AS (SELECT doc_id, term FROM (
                     SELECT *, row_number() OVER (PARTITION BY doc_id
                       ORDER BY w DESC, term) AS rn FROM wt) t
                   WHERE rn = 1)
               SELECT term, count(*) AS n_docs_rank1
               FROM top1 GROUP BY term
               ORDER BY n_docs_rank1 DESC, term LIMIT 20""")),

    QueryDef(
      "text_quality_funnel",
      // Rejection FUNNEL over an ordered rule pipeline — the accounting a
      // curation run ships next to its filters (C4: Raffel et al. 2020;
      // Gopher: Rae et al. 2021 report exactly this "docs removed per
      // rule" table). Each document is attributed to the FIRST rule it
      // fails (funnel semantics, not independent marginals): 1 min-token
      // floor, 2 mean-token-length band, 3 symbol-ratio cap, 4 stopword
      // presence, 5 top-unigram repetition cap. Thresholds are tuned so
      // the fixture exercises real rejections on rules 1/2/4/5 while rule
      // 3 proves its zero (the corpus is symbol-free by construction —
      // same discipline as text_pii_redact). Dataflow: rules 1–4 are
      // map-only expressions fused into the scan; rule 5's top-unigram
      // share is one doc+term-keyed aggregate (map-side combined) joined
      // back on doc_id; the funnel itself is a bounded per-source window
      // over 5 post-aggregation rows per source — nothing but per-source
      // counters ever shuffles, so the shape holds at 100 TB. The full
      // source×rule grid comes from a broadcast 5-row rule dimension so
      // zero-rejection stages still land in the report.
      (s, dir) => {
        val docs = T.documents(s, dir).transform(T.fanOut(_, col("doc_id")))
        val base = docs.selectExpr("doc_id", "source",
          "size(filter(split(text, ' '), t -> t <> '')) AS n_tok",
          "CAST(n_chars AS DOUBLE) / size(filter(split(text, ' '), t -> t <> '')) AS atl",
          "CAST(length(regexp_replace(text, '[a-zA-Z0-9 ]', '')) AS DOUBLE) / length(text) AS symr",
          "size(filter(transform(filter(split(text, ' '), t -> t <> ''), t -> lower(t)), " +
            "t -> array_contains(array('the','a','data','row','value'), t))) AS n_stop")
        val rep = docs
          .selectExpr("doc_id", "explode(filter(split(text, ' '), t -> t <> '')) AS t")
          .select(col("doc_id"), lower(col("t")).as("term"))
          .groupBy("doc_id", "term").agg(count(lit(1)).as("n"))
          .groupBy("doc_id").agg(max(col("n")).as("max_n"))
        val staged = base.join(rep, "doc_id").selectExpr("source",
          """CASE WHEN n_tok < 16 THEN 1
                  WHEN atl < 3e0 OR atl > 6e0 THEN 2
                  WHEN symr > 1e-1 THEN 3
                  WHEN n_stop < 1 THEN 4
                  WHEN CAST(max_n AS DOUBLE) / n_tok > 2e-1 THEN 5
                  ELSE 6 END AS stage""")
        val rej = staged.where(col("stage") <= 5)
          .groupBy("source", "stage").agg(count(lit(1)).as("n_rejected"))
        val rules = s.sql(
          "SELECT * FROM VALUES (1, 'min_tokens'), (2, 'avg_tok_len'), " +
            "(3, 'symbol_ratio'), (4, 'stopword_hit'), (5, 'repetition') " +
            "AS t(stage, rule)")
        val w = Window.partitionBy(col("source")).orderBy(col("stage"))
        docs.groupBy("source").agg(count(lit(1)).as("n_docs"))
          .crossJoin(broadcast(rules))
          .join(rej, Seq("source", "stage"), "left")
          .na.fill(0L, Seq("n_rejected"))
          .withColumn("n_surviving",
            col("n_docs") - sum(col("n_rejected")).over(w))
          .select(col("source"), col("stage"), col("rule"),
            col("n_rejected"), col("n_surviving"))
          .orderBy("source", "stage")
      },
      Some("""WITH base AS (SELECT doc_id, source,
                   len(list_filter(string_split(text, ' '), t -> t <> '')) AS n_tok,
                   CAST(n_chars AS DOUBLE) /
                     len(list_filter(string_split(text, ' '), t -> t <> '')) AS atl,
                   CAST(length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g')) AS DOUBLE) /
                     length(text) AS symr,
                   len(list_filter(list_transform(
                       list_filter(string_split(text, ' '), t -> t <> ''), t -> lower(t)),
                     t -> list_contains(['the','a','data','row','value'], t))) AS n_stop
                 FROM documents),
                 tok AS (SELECT doc_id,
                     lower(unnest(list_filter(string_split(text, ' '), t -> t <> ''))) AS term
                   FROM documents),
                 rep AS (SELECT doc_id, max(n) AS max_n FROM (
                     SELECT doc_id, term, count(*) AS n FROM tok GROUP BY doc_id, term) c
                   GROUP BY doc_id),
                 st AS (SELECT source,
                     CASE WHEN n_tok < 16 THEN 1
                          WHEN atl < 3e0 OR atl > 6e0 THEN 2
                          WHEN symr > 1e-1 THEN 3
                          WHEN n_stop < 1 THEN 4
                          WHEN CAST(max_n AS DOUBLE) / n_tok > 2e-1 THEN 5
                          ELSE 6 END AS stage
                   FROM base JOIN rep USING (doc_id)),
                 rej AS (SELECT source, stage, count(*) AS n_rejected
                   FROM st WHERE stage <= 5 GROUP BY source, stage),
                 rules AS (SELECT * FROM (VALUES (1, 'min_tokens'), (2, 'avg_tok_len'),
                     (3, 'symbol_ratio'), (4, 'stopword_hit'), (5, 'repetition'))
                   t(stage, rule)),
                 tot AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY source),
                 grid AS (SELECT source, n_docs, stage, rule,
                     coalesce(n_rejected, CAST(0 AS BIGINT)) AS n_rejected
                   FROM tot CROSS JOIN rules LEFT JOIN rej USING (source, stage))
               SELECT source, stage, rule, n_rejected,
                 CAST(n_docs - sum(n_rejected) OVER (PARTITION BY source ORDER BY stage)
                   AS BIGINT) AS n_surviving
               FROM grid ORDER BY source, stage""")),

    QueryDef(
      "text_bigram_backoff",
      // HELD-OUT bigram LM scoring with Stupid Backoff (Brants et al.
      // 2007, "Large Language Models in Machine Translation" — the
      // backoff designed FOR distributed corpus-scale counting: no
      // discounting pass, score S(v|u) = c(uv)/c(u) when the bigram was
      // seen in training, else λ·P(v) with λ = 0.4). Train on the even
      // source-parity half, score the odd half — held-out, so backoff
      // genuinely fires on unseen bigrams (training on the scored corpus
      // itself, as text_unigram_lm does for its in-domain proxy, would
      // make the backoff arm dead code). Unseen-unigram OOV falls back to
      // the add-one-smoothed unigram (c(v)+1)/(N+V) so every bigram gets
      // a finite score. Dataflow: bigrams are built map-side per document
      // (adjacent-pair transform over the token array — no window, no
      // self-join); train counts and eval occurrences meet in
      // vocab-keyed SHUFFLED equi-joins (the unigram_lm Heaps'-law
      // argument: a 100 TB bigram table is far past broadcast size); the
      // two scalars (N, V) broadcast as one row. Determinism: ln of the
      // per-key score REAL-collapsed per (u,v); occurrence-weighted sums
      // ride the exact-decimal wire. Output per eval source: docs,
      // bigram occurrences, backoff rate, avg NLL.
      (s, dir) => {
        val half = T.documents(s, dir).transform(T.fanOut(_, col("doc_id")))
          .selectExpr("doc_id", "source",
            "CAST(substring(source, 4) AS INT) % 2 AS grp",
            "transform(filter(split(text, ' '), t -> t <> ''), t -> lower(t)) AS w")
        // size(w) >= 2 guard BEFORE the pair transform: Spark's
        // sequence(1, 0) counts DOWN to [1, 0] (the text_char_entropy
        // lesson), which would fabricate null-edged pairs for one-token
        // docs; DuckDB's generate_series(1, 0) is empty. Same predicate
        // on both engines keeps the bigram sets identical.
        val big = half.where(expr("size(w) >= 2"))
          .selectExpr("doc_id", "source", "grp",
          "explode(transform(sequence(1, size(w) - 1), i -> struct(w[i-1] AS u, w[i] AS v))) AS b")
          .selectExpr("doc_id", "source", "grp", "b.u AS u", "b.v AS v")
        val tuni = half.where(col("grp") === 0)
          .selectExpr("explode(w) AS v").groupBy("v").agg(count(lit(1)).as("cv"))
        val tbig = big.where(col("grp") === 0)
          .groupBy("u", "v").agg(count(lit(1)).as("cb"))
        val tcu = tbig.groupBy("u").agg(sum(col("cb")).as("cu"))
        val tot = tuni.agg(sum(col("cv")).as("nu"), count(lit(1)).as("vs"))
        val el = big.where(col("grp") === 1)
          .groupBy("source", "u", "v").agg(count(lit(1)).as("ne"))
        val scored = el
          .join(tbig, Seq("u", "v"), "left")
          .join(tcu, Seq("u"), "left")
          .join(tuni, Seq("v"), "left")
          .crossJoin(broadcast(tot))
          .selectExpr("source", "ne", "cb IS NULL AS backed",
            """CAST(CAST(ln(CASE WHEN cb IS NOT NULL
                 THEN CAST(cb AS DOUBLE) / cu
                 ELSE 4e-1 * (CAST(coalesce(cv, 0L) AS DOUBLE) + 1e0) / (nu + vs)
               END) AS FLOAT) AS DOUBLE) AS lns""")
        scored.groupBy("source").agg(
            sum(col("ne")).as("n_bigrams"),
            round(T.xsum(when(col("backed"), col("ne")).otherwise(lit(0L))
              .cast("double")) / sum(col("ne")), 6).as("backoff_rate"),
            round(T.xsum(-col("lns") * col("ne")) / sum(col("ne")), 6).as("avg_nll"))
          .join(half.where(col("grp") === 1).groupBy("source")
            .agg(count(lit(1)).as("n_docs")), "source")
          .select(col("source"), col("n_docs"), col("n_bigrams"),
            col("backoff_rate"), col("avg_nll"))
          .orderBy("source")
      },
      Some(s"""WITH half AS (SELECT doc_id, source,
                   CAST(substr(source, 4) AS INT) % 2 AS grp,
                   list_transform(list_filter(string_split(text, ' '), t -> t <> ''),
                     t -> lower(t)) AS w
                 FROM documents),
                 big AS (SELECT doc_id, source, grp,
                     w[CAST(i AS INT)] AS u, w[CAST(i AS INT) + 1] AS v
                   FROM (SELECT doc_id, source, grp, w,
                       unnest(generate_series(1, len(w) - 1)) AS i
                     FROM half WHERE len(w) >= 2) x),
                 tuni AS (SELECT v, count(*) AS cv FROM (
                     SELECT unnest(w) AS v FROM half WHERE grp = 0) x GROUP BY v),
                 tbig AS (SELECT u, v, count(*) AS cb FROM big WHERE grp = 0 GROUP BY u, v),
                 tcu AS (SELECT u, CAST(sum(cb) AS BIGINT) AS cu FROM tbig GROUP BY u),
                 tot AS (SELECT CAST(sum(cv) AS BIGINT) AS nu, count(*) AS vs FROM tuni),
                 el AS (SELECT source, u, v, count(*) AS ne
                   FROM big WHERE grp = 1 GROUP BY source, u, v),
                 scored AS (SELECT source, ne, tbig.cb IS NULL AS backed,
                     CAST(CAST(ln(CASE WHEN tbig.cb IS NOT NULL
                         THEN CAST(tbig.cb AS DOUBLE) / tcu.cu
                         ELSE 4e-1 * (CAST(coalesce(tuni.cv, 0) AS DOUBLE) + 1e0) / (tot.nu + tot.vs)
                       END) AS REAL) AS DOUBLE) AS lns
                   FROM el LEFT JOIN tbig USING (u, v)
                     LEFT JOIN tcu USING (u)
                     LEFT JOIN tuni USING (v)
                     CROSS JOIN tot),
                 agg AS (SELECT source,
                     CAST(sum(ne) AS BIGINT) AS n_bigrams,
                     round(${T.sqlXsum("CASE WHEN backed THEN CAST(ne AS DOUBLE) ELSE 0e0 END")}
                       / sum(ne), 6) AS backoff_rate,
                     round(${T.sqlXsum("-lns * ne")} / sum(ne), 6) AS avg_nll
                   FROM scored GROUP BY source),
                 nd AS (SELECT source, count(*) AS n_docs FROM half WHERE grp = 1 GROUP BY source)
               SELECT source, n_docs, n_bigrams, backoff_rate, avg_nll
               FROM agg JOIN nd USING (source) ORDER BY source"""))
  )
}
