package graft

import org.apache.spark.sql.functions._

/** Invariant pins for the r8 ensemble-contract closures (Boost.scala +
  * ml_umap_transform): properties the estimator CONTRACTS guarantee, which
  * an oracle hash-diff can't localize when they break.
  */
class BoostSpec extends SparkSpec {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("ml_gbm_fit: train MSE is non-increasing across boosting rounds") {
    val rows = q("ml_gbm_fit").orderBy("round").collect()
    assert(rows.length == 4, s"expected intercept + 3 rounds, got ${rows.length}")
    val mses = rows.map(_.getDouble(5))
    assert(mses.sliding(2).forall { case Array(a, b) => b <= a + 1e-9 },
      s"MSE trail not non-increasing: ${mses.mkString(", ")}")
    // round 0 is the intercept: null split, left == right == mean(y)
    assert(rows.head.isNullAt(2))
    assert(rows.head.getDouble(3) == rows.head.getDouble(4))
    // every boosting round picked a real candidate from one of the grids
    val grids = Set(10.0, 25.0, 40.0, 0.02, 0.05, 0.08)
    assert(rows.tail.forall(r => grids.contains(r.getDouble(2))))
  }

  test("ml_rf_proba: percent bins partition the corpus and bound their means") {
    val rows = q("ml_rf_proba").collect()
    val total = Tables.lineitem(spark, sf).count()
    assert(rows.map(_.getLong(1)).sum == total)
    rows.foreach { r =>
      val b = r.getLong(0); val mp = r.getDouble(2)
      assert(b >= 0 && b <= 99, s"bucket $b out of range")
      // the bucket IS floor(p*100): its mean must stay inside the bin
      assert(mp >= b / 100.0 - 1e-6 && mp < (b + 1) / 100.0 + 1e-6,
        s"bucket $b mean_proba $mp outside its bin")
      val ar = r.getDouble(3)
      assert(ar >= 0.0 && ar <= 1.0)
    }
  }

  test("mtry: each shard bans one feature and every feature is banned somewhere") {
    // the affine mask behind ml_rf_predict/_proba/_regress/_importance
    // (r10): banned(shard) = (shard * 104729 + 11) % 3 — verify through the
    // SHARED expression text, per shard, that exactly one feature fails the
    // predicate and that all three features are banned across the forest
    import spark.implicits._
    val rows = (0 to 7).flatMap(s =>
      Seq("quantity", "discount", "tax").map(f => (s, f)))
      .toDF("shard", "feature")
      .where(expr(s"NOT (${graft.ops.Supervised.mtryExpr})"))
      .collect().map(r => (r.getInt(0), r.getString(1)))
    assert(rows.length == 8, s"expected 1 banned feature per shard: $rows")
    assert(rows.map(_._1).toSet == (0 to 7).toSet)
    assert(rows.map(_._2).toSet == Set("quantity", "discount", "tax"),
      s"mask never bans some feature: ${rows.map(_._2).toSet}")
    // and the fitted classifier forest actually reflects it: with tax
    // banned in some shards, the level-1 winners can't all be one feature
    val votes = q("ml_rf_predict").collect()
    assert(votes.map(_.getLong(1)).sum == Tables.lineitem(spark, sf).count())
  }

  test("ml_rf_importance: gini gains are non-negative and bounded") {
    val rows = q("ml_rf_importance").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val imp = r.getDouble(1)
      // weighted gini gain of an argmin split is >= 0 (gini concavity);
      // per-tree total gain <= root impurity <= 0.5, so the 8-tree mean
      // summed over features stays below 0.5 too
      assert(imp >= -1e-9 && imp <= 0.5, s"${r.getString(0)} importance $imp")
    }
  }

  test("ml_shap_kernel: efficiency — attributions sum to f(x) - E[f]") {
    val rows = q("ml_shap_kernel").collect()
    assert(rows.length == 9, s"expected 3 points x 3 features, got ${rows.length}")
    // the emitted audit column IS the efficiency residue; rounded at 6 dp
    // it must be numerically zero for every point
    rows.foreach { r =>
      assert(math.abs(r.getDouble(3)) <= 2e-6,
        s"point ${r.getInt(0)} efficiency gap ${r.getDouble(3)}")
    }
    // phi magnitudes are bounded by the model's output range (leaf rates
    // in [0,1]): no single attribution can exceed max f - min f
    rows.foreach(r => assert(math.abs(r.getDouble(2)) <= 1.0))
  }

  test("ml_tree_depth3: child node populations partition their parent") {
    val rows = q("ml_tree_depth3").collect()
      .map(r => r.getString(0) -> (r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
      .toMap
    assert(rows.keySet == Set("root", "L", "R", "LL", "LR", "RL", "RR"))
    // node X splits (nl, posl | nr, posr); its children's totals must be
    // exactly those counts — the recursion tags rows, it never loses any
    def tot(n: String) = { val (nl, pl, nr, pr) = rows(n); (nl + nr, pl + pr) }
    for ((parent, side, child) <- Seq(
        ("root", 0, "L"), ("root", 1, "R"),
        ("L", 0, "LL"), ("L", 1, "LR"), ("R", 0, "RL"), ("R", 1, "RR"))) {
      val (nl, pl, nr, pr) = rows(parent)
      val exp = if (side == 0) (nl, pl) else (nr, pr)
      assert(tot(child) == exp, s"$child totals ${tot(child)} != $parent side-$side $exp")
    }
  }

  test("ml_umap_transform: embeddings stay in the training layout's hull") {
    val rows = q("ml_umap_transform").collect()
    assert(rows.length == 15)
    val tr = Tables.embeddings(spark, sf).where(col("vec_id") < 30)
      .select(element_at(col("embedding"), 1).cast("double"),
        element_at(col("embedding"), 2).cast("double"))
      .collect().map(r => (r.getDouble(0), r.getDouble(1)))
    val (xs, ys) = (tr.map(_._1), tr.map(_._2))
    rows.foreach { r =>
      val (x, y) = (r.getDouble(1), r.getDouble(2))
      // a convex combination of training coords cannot leave their bbox
      assert(x >= xs.min - 1e-6 && x <= xs.max + 1e-6, s"x $x outside hull")
      assert(y >= ys.min - 1e-6 && y <= ys.max + 1e-6, s"y $y outside hull")
    }
  }
}
