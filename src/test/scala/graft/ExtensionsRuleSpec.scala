package graft

import org.apache.spark.sql.SparkSession

/** SparkSessionExtensions showcase (SURVEY §4.2 rung (c)): the
  * FuseVecKernels optimizer rule rewrites the declarative HOF dot
  * product into the codegen VecDot kernel — same bits, fused loop.
  */
class ExtensionsRuleSpec extends SparkSpec {

  private val hofDot =
    "aggregate(zip_with(a, b, (x, y) -> x * y), CAST(0 AS DOUBLE), (acc, v) -> acc + v) AS d"

  test("FuseVecKernels: HOF dot product fuses to vec_dot, values unchanged") {
    val base = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    // new session on the SAME SparkContext, extension injected the way a
    // user would (builder.withExtensions / spark.sql.extensions)
    val s2 = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    try {
      assert(s2 ne base, "extension session must be a fresh SparkSession")
      val sq = s2
      import sq.implicits._
      // typed-Dataset source: the encoder types the arrays
      // ARRAY<DOUBLE NOT NULL> (dense — the guard's requirement) and the
      // range-backed plan is not a LocalRelation, so ConvertToLocalRelation
      // cannot eagerly evaluate the projection before the rule fires
      val df = s2.range(1)
        .map(_ => (Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0)))
        .toDF("a", "b").selectExpr(hofDot)
      val opt = df.queryExecution.optimizedPlan.toString
      assert(opt.contains("vec_dot"), s"rule did not fire:\n$opt")
      assert(df.collect().head.getDouble(0) == 32.0)

      // parquet recipe: parquet list elements ALWAYS surface nullable, so
      // the guard (correctly) skips the raw read — the documented densify
      // (transform + coalesce) types the element NOT NULL and re-arms the
      // rule. This is the path production embedding tables take.
      val dir = java.nio.file.Files.createTempDirectory("graft_ext").toString
      Seq((Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0)))
        .toDF("a", "b").write.mode("overwrite").parquet(dir)
      val raw = s2.read.parquet(dir).selectExpr(hofDot)
      assert(!raw.queryExecution.optimizedPlan.toString.contains("vec_dot"),
        "nullable-element arrays must not be fused")
      assert(raw.collect().head.getDouble(0) == 32.0)
      val dense = s2.read.parquet(dir)
        .selectExpr("transform(a, x -> coalesce(x, CAST(0 AS DOUBLE))) AS a",
          "transform(b, x -> coalesce(x, CAST(0 AS DOUBLE))) AS b")
        .selectExpr(hofDot)
      val optDense = dense.queryExecution.optimizedPlan.toString
      assert(optDense.contains("vec_dot"), s"densified read did not fuse:\n$optDense")
      assert(dense.collect().head.getDouble(0) == 32.0)

      // single-array squared norm (the Preprocess sparkNorm shape) fuses
      // to the UNARY VecNormSq (ADVICE r11: the old VecDot(a, a) rewrite
      // duplicated the child expression — evaluated twice per row)
      val norm = s2.range(1)
        .map(_ => Tuple1(Array(1.0, 2.0, 3.0))).toDF("a")
        .selectExpr("aggregate(a, CAST(0 AS DOUBLE), (acc, x) -> acc + x * x) AS n2")
      val optNorm = norm.queryExecution.optimizedPlan.toString
      assert(optNorm.contains("vec_normsq"), s"norm fold did not fuse:\n$optNorm")
      assert(norm.collect().head.getDouble(0) == 14.0)

      // length MISMATCH (ADVICE r11): zip_with null-pads the shorter
      // array so the HOF yields null — the fused kernel must yield null
      // too, not loop past the shorter array. Fused and unfused agree.
      val mism = s2.range(1)
        .map(_ => (Array(1.0, 2.0, 3.0), Array(4.0, 5.0)))
        .toDF("a", "b").selectExpr(hofDot)
      assert(mism.queryExecution.optimizedPlan.toString.contains("vec_dot"),
        "mismatched-length (but dense) arrays still fuse — null semantics are the kernel's")
      assert(mism.collect().head.isNullAt(0),
        "fused dot over unequal lengths must be null (the zip_with pad contract)")

      // the extension session resolves the kernel family in PLAIN SQL —
      // no imperative Vec.register call (ADVICE r11 docstring fix)
      val sqlDot = s2.sql(
        "SELECT graft_vec_dot(array(1d, 2d), array(3d, 4d)) AS d," +
          " graft_vec_normsq(array(3d, 4d)) AS n2")
        .collect().head
      assert(sqlDot.getDouble(0) == 11.0 && sqlDot.getDouble(1) == 25.0)

      // the custom GENERATOR resolves in plain SQL on the extension
      // session too (r13: the real Generate-node UDTF, VERDICT r12 #5) —
      // including the lateral view form and the zero-row guards
      val tris = s2.sql("SELECT tri FROM VALUES ('abcd'), ('xy'), (NULL) t(s)" +
          " LATERAL VIEW graft_trigrams(s) g AS tri")
        .collect().map(_.getString(0)).toSeq
      assert(tris == Seq("abc", "bcd"), s"generator emitted $tris")
    } finally {
      SparkSession.setActiveSession(base)
      SparkSession.setDefaultSession(base)
    }

    // the vanilla session runs the same query INTERPRETED — no rewrite,
    // same value (the rule is an optimization, not a semantics change)
    val sv = base
    import sv.implicits._
    val dirV = java.nio.file.Files.createTempDirectory("graft_extv").toString
    Seq((Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0)))
      .toDF("a", "b").write.mode("overwrite").parquet(dirV)
    val dfv = base.read.parquet(dirV).selectExpr(hofDot)
    assert(!dfv.queryExecution.optimizedPlan.toString.contains("vec_dot"))
    assert(dfv.collect().head.getDouble(0) == 32.0)
  }
}
