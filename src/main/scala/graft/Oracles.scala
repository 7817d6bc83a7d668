package graft

/** Oracle-SQL hardening shared by [[Verify]] (and mirrored in
  * tools/compare.py): rewrite every top-level CTE head `name AS (` to
  * `name AS MATERIALIZED (` before the text reaches DuckDB.
  *
  * Why (VERDICT r10 #1): DuckDB 1.0 INLINES non-MATERIALIZED CTEs at every
  * reference. An iterative oracle whose round k references round k−1 more
  * than once (PIC/pagerank/PCA-power chains: the centering CTE feeds both
  * the norm CTE and the update CTE) therefore expands to a 2^rounds
  * expression tree — `ml_spectral_embed`'s oracle measured 15+ minutes
  * inlined at sf0.01 vs 0.06 s materialized, bit-identical rows. A
  * driver-side time budget on the oracle pass zeroes the whole round's
  * correctness artifact (the empty CORRECTNESS_r10.json), so the rewrite
  * is applied CENTRALLY to every oracle rather than hand-maintained in 15
  * texts: MATERIALIZED is a pure evaluation-strategy hint (each CTE is
  * computed once into a temp, exactly Spark's shuffle-reuse semantics for
  * the same dataflow), never a semantics change, and at the sf0.01 compare
  * scale materializing an always-referenced oracle CTE costs microseconds.
  *
  * The table-binding CTEs [[Verify]] prepends (`t AS (SELECT * FROM
  * read_parquet(...))`) are deliberately left PLAIN: materializing those
  * would force a full-width table read where inlining lets DuckDB push
  * projection/filters into the parquet scan — and unused plain bindings
  * are pruned for free. So Verify applies [[materialize]] to the oracle
  * BODY first, then wraps with plain bindings.
  *
  * Scanner, not regex: oracle texts contain single-quoted literals,
  * `--` line comments (some with parens/quotes inside), and table-function
  * aliases like `unnest(...) AS u(x)` where a blind `AS (` regex would
  * corrupt the SQL. The scanner walks the top-level CTE list structurally:
  * identifier [ `(` cols `)` ] `AS` [`[NOT] MATERIALIZED`] `(` balanced
  * body `)` [`,` → next]. A `WITH RECURSIVE` clause head is returned
  * untouched (DuckDB treats the whole clause as potentially recursive;
  * materialization of a self-referencing CTE is not meaningful).
  */
object Oracles {

  /** Scanner outcome — surfaced to RegistrySpec so the guard can tell
    * "scanner handled this text" apart from "scanner gave up" (a silent
    * give-up on a hazard oracle would resurrect the r10 failure). */
  private[graft] sealed trait Scan
  private[graft] case object NotWith extends Scan       // no CTE clause
  private[graft] case object Unparseable extends Scan   // bail — rewrite nothing
  private[graft] final case class Points(ps: Seq[Int]) extends Scan

  def materialize(sql: String): String = scan(sql) match {
    case Points(inserts) if inserts.nonEmpty =>
      val sb = new StringBuilder(sql)
      inserts.reverse.foreach(p => sb.insert(p, "MATERIALIZED "))
      sb.toString
    case _ => sql
  }

  /** Walk the top-level CTE list; `Points` carries the positions (before
    * each CTE body's `(`) where `MATERIALIZED ` must be inserted — empty
    * when every CTE is already materialized, so `materialize` is
    * idempotent. */
  private[graft] def scan(sql: String): Scan = {
    val n = sql.length
    var i = skipWsAndComments(sql, 0)
    if (!matchesKeyword(sql, i, "WITH")) return NotWith
    i = skipWsAndComments(sql, i + 4)
    // WITH RECURSIVE: the clause may mix genuinely recursive CTEs with
    // plain ones. The plain ones STILL need materializing — worse than the
    // flat chains, a plain CTE referenced from inside a recursive body
    // (ml_pca_*'s `FROM it, gmat WHERE k < 20`) is re-inlined and
    // re-EVALUATED on every iteration step (measured: the 64×64 Gram
    // aggregation ×20 steps = 50–105 s/oracle at sf0.01; materialized
    // ~1 s). DuckDB 1.0 accepts `AS MATERIALIZED` on the non-recursive
    // members of a RECURSIVE clause (verified); self-referencing CTEs are
    // detected by name and left plain.
    val recursive = matchesKeyword(sql, i, "RECURSIVE")
    if (recursive) i = skipWsAndComments(sql, i + 9)
    val out = Seq.newBuilder[Int]
    var done = false
    while (!done) {
      // CTE name (plain or "quoted" identifier)
      val nameStart = i
      val afterName = skipIdentifier(sql, i)
      if (afterName == i) return Unparseable
      val cteName = sql.substring(nameStart, afterName).stripPrefix("\"").stripSuffix("\"")
      i = skipWsAndComments(sql, afterName)
      // optional column list
      if (i < n && sql.charAt(i) == '(') {
        i = skipBalanced(sql, i)
        i = skipWsAndComments(sql, i)
      }
      if (!matchesKeyword(sql, i, "AS")) return Unparseable
      i = skipWsAndComments(sql, i + 2)
      var already = false
      if (matchesKeyword(sql, i, "NOT")) {
        i = skipWsAndComments(sql, i + 3); already = true // NOT MATERIALIZED: respect
      }
      if (matchesKeyword(sql, i, "MATERIALIZED")) {
        i = skipWsAndComments(sql, i + 12); already = true
      }
      if (i >= n || sql.charAt(i) != '(') return Unparseable
      val bodyOpen = i
      i = skipBalanced(sql, i)
      // in a RECURSIVE clause, a CTE whose body names itself must stay
      // plain (conservative word-boundary check on the body text — a
      // false positive merely skips one materialization)
      val selfRef = recursive && {
        val body = sql.substring(bodyOpen, i)
        ("(?i)(?<![A-Za-z0-9_\"])" + java.util.regex.Pattern.quote(cteName) +
          "(?![A-Za-z0-9_\"])").r.findFirstIn(body).isDefined
      }
      if (!already && !selfRef) out += bodyOpen
      i = skipWsAndComments(sql, i)
      if (i < n && sql.charAt(i) == ',') i = skipWsAndComments(sql, i + 1)
      else done = true // main SELECT follows
    }
    Points(out.result())
  }

  private def matchesKeyword(s: String, i: Int, kw: String): Boolean =
    i + kw.length <= s.length &&
      s.regionMatches(true, i, kw, 0, kw.length) &&
      (i + kw.length == s.length || !isIdentChar(s.charAt(i + kw.length)))

  private def isIdentChar(c: Char): Boolean =
    c.isLetterOrDigit || c == '_'

  private def skipIdentifier(s: String, start: Int): Int = {
    var i = start
    if (i < s.length && s.charAt(i) == '"') { // quoted identifier
      i += 1
      while (i < s.length && s.charAt(i) != '"') i += 1
      i + 1
    } else {
      while (i < s.length && isIdentChar(s.charAt(i))) i += 1
      i
    }
  }

  private def skipWsAndComments(s: String, start: Int): Int = {
    var i = start
    var moved = true
    while (moved) {
      moved = false
      while (i < s.length && s.charAt(i).isWhitespace) { i += 1; moved = true }
      if (i + 1 < s.length && s.charAt(i) == '-' && s.charAt(i + 1) == '-') {
        while (i < s.length && s.charAt(i) != '\n') i += 1
        moved = true
      }
    }
    i
  }

  /** From an opening `(`, return the index just past its matching `)`,
    * skipping single-quoted strings (with '' escapes), double-quoted
    * identifiers, and `--` comments. */
  private def skipBalanced(s: String, open: Int): Int = {
    var i = open + 1
    var depth = 1
    while (i < s.length && depth > 0) {
      s.charAt(i) match {
        case '(' => depth += 1; i += 1
        case ')' => depth -= 1; i += 1
        case '\'' =>
          i += 1
          var in = true
          while (i < s.length && in) {
            if (s.charAt(i) == '\'') {
              if (i + 1 < s.length && s.charAt(i + 1) == '\'') i += 2
              else { i += 1; in = false }
            } else i += 1
          }
        case '"' =>
          i += 1
          while (i < s.length && s.charAt(i) != '"') i += 1
          i += 1
        case '-' if i + 1 < s.length && s.charAt(i + 1) == '-' =>
          while (i < s.length && s.charAt(i) != '\n') i += 1
        case _ => i += 1
      }
    }
    i
  }
}
