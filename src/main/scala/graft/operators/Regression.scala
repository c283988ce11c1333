package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed linear / ridge regression via normal equations.
  *
  * The 100 TB shape: a least-squares fit over n rows needs only the
  * D×D Gram matrix XᵀX and the D-vector Xᵀy — O(D²) sufficient
  * statistics computed in ONE map-side-combined aggregation pass over
  * the data (no iteration, no per-row driver traffic). The driver then
  * solves the tiny D×D system (D is tens of features; the solve is
  * microseconds). This is the classic scalable-analytics split: the
  * cluster reduces the data to sufficient statistics, the driver does
  * the O(D³) linear algebra — the same bounded-sync-point pattern as
  * the k-means centroid step ([[graft.operators.IvfIndex]]).
  *
  * Exactness: every product is routed through DecimalType before the
  * sum, so the aggregation is order-independent and the oracle replay
  * is bit-equal (the repo-wide decimal-routing discipline).
  */
object Regression {

  /** Sufficient statistics for y ~ X: one tidy row per upper-triangle
    * Gram entry (`xtx_i_j`, i ≤ j) and per moment vector entry
    * (`xty_i`), value = exact decimal sum cast back to double.
    * `features(0)` is typically `lit(1)` (the intercept), making
    * `xtx_0_0` the row count and `xty_0` the sum of y. One hash-agg
    * over the whole relation; output is O(D²) rows. */
  def sufficientStats(df: DataFrame, features: Seq[Column], y: Column,
      scale: Int = 8): DataFrame = {
    val dec = (c: Column) => c.cast(s"decimal(38,$scale)")
    val aggs =
      (for {
        i <- features.indices
        j <- features.indices if i <= j
      } yield sum(dec(features(i) * features(j)))
        .cast("double").as(s"xtx_${i}_$j")) ++
      features.indices.map(i =>
        sum(dec(features(i) * y)).cast("double").as(s"xty_$i"))
    val wide = df.agg(aggs.head, aggs.tail: _*)
    // unpivot the single wide row to (term, value) — stable tidy shape
    val cols = wide.columns
    wide.select(explode(array(cols.map(c =>
        struct(lit(c).as("term"), col(c).as("value"))): _*)).as("e"))
      .select(col("e.term").as("term"), col("e.value").as("value"))
      .orderBy(col("term"))
  }

  /** Solve (XᵀX + λI)·w = Xᵀy by Gaussian elimination with partial
    * pivoting. `xtx` is the full symmetric matrix (mirror the upper
    * triangle before calling). Driver-side: D is small by contract. */
  def solveRidge(xtx: Array[Array[Double]], xty: Array[Double],
      lambda: Double = 0.0): Array[Double] = {
    val d = xty.length
    require(xtx.length == d && xtx.forall(_.length == d),
      s"xtx must be ${d}x$d")
    val a = Array.tabulate(d, d)((i, j) =>
      xtx(i)(j) + (if (i == j) lambda else 0.0))
    val b = xty.clone()
    var col = 0
    while (col < d) {
      var p = col
      var r = col + 1
      while (r < d) { if (math.abs(a(r)(col)) > math.abs(a(p)(col))) p = r; r += 1 }
      require(math.abs(a(p)(col)) > 1e-12,
        s"singular normal matrix at column $col — add ridge lambda")
      if (p != col) { val t = a(p); a(p) = a(col); a(col) = t
        val tb = b(p); b(p) = b(col); b(col) = tb }
      r = col + 1
      while (r < d) {
        val f = a(r)(col) / a(col)(col)
        if (f != 0.0) {
          var c = col
          while (c < d) { a(r)(c) -= f * a(col)(c); c += 1 }
          b(r) -= f * b(col)
        }
        r += 1
      }
      col += 1
    }
    val w = new Array[Double](d)
    var i = d - 1
    while (i >= 0) {
      var s = b(i)
      var j = i + 1
      while (j < d) { s -= a(i)(j) * w(j); j += 1 }
      w(i) = s / a(i)(i)
      i -= 1
    }
    w
  }

  /** Convenience: collect [[sufficientStats]] output (O(D²) rows) and
    * solve. The only driver transfer is the statistics relation. */
  def fit(stats: DataFrame, d: Int, lambda: Double = 0.0): Array[Double] = {
    val m = stats.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val xtx = Array.tabulate(d, d) { (i, j) =>
      val (a, b) = (math.min(i, j), math.max(i, j))
      m(s"xtx_${a}_$b")
    }
    solveRidge(xtx, Array.tabulate(d)(i => m(s"xty_$i")), lambda)
  }
}
