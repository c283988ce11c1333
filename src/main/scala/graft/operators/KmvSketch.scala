package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** KMV (k-minimum-values, a.k.a. theta) distinct-count sketch with
  * set-operation estimators — the mergeable-summary complement of the
  * HLL column (q125): HLL unions cheaply but cannot intersect; the KMV
  * sample supports UNION and INTERSECTION estimates from the sketches
  * alone (Beyer et al., "On synopses for distinct-value estimation
  * under multiset operations", SIGMOD 2007 — the same estimator family
  * behind the DataSketches theta sketch).
  *
  * Sketch = the k smallest values of a uniform hash of the key set.
  * With kth(S) the k-th smallest retained hash and M the hash modulus:
  *
  *  - |S| ≈ (k-1) * M / kth(S)           (when |S| ≥ k; exact below k)
  *  - θ = min(kth(A), kth(B)); |A∩B| ≈ |{h ∈ skA ∩ skB : h ≤ θ}| * M / θ
  *  - merge(A, B) = k smallest of (skA ∪ skB)  — a valid KMV sketch of
  *    A ∪ B, because every retained hash of the union is ≤ both inputs'
  *    retention thresholds.
  *
  * 100 TB posture: per-set state is k longs NO MATTER the corpus size;
  * building a sketch is one distinct-shuffle + a distributed top-k
  * (TakeOrdered — no global sort); every set-op above touches ONLY
  * sketch contents (≤ k rows, broadcast-scale). A daily-partition →
  * cross-source overlap report reads KBs of sketches, not the raw keys.
  *
  * Hash choice (learned the hard way — see Pipeline15's scaladoc): a
  * mod-p polynomial/affine hash of structured integer keys has
  * provably bad local discrepancy (translate-structured key sets put
  * far too few / too many points in the bottom-k window — measured 43%
  * error on ScaleGen's +1e9-remapped keys where md5 reads 0.5%). The
  * portable uniform hash here is the first 60 bits of md5 of the key's
  * decimal string, mod M — bit-identical in every engine with a
  * standard md5 (the DuckDB oracle replays it exactly), and codegen'd
  * end-to-end on the Spark side (md5/substring/conv are built-ins).
  */
object KmvSketch {

  /** Hash modulus (prime, < 2^31 so all estimator arithmetic stays in
    * BIGINT range: (k-1)*M < 2^62 for any practical k). */
  val M = 1000000007L

  /** Uniform [0, M) hash of a key column: first 15 hex chars (60 bits)
    * of md5 of the decimal string, mod M. */
  def uniformHash(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 15), 16, 10)
      .cast("long") % M

  /** The sketch of a key column: ≤ k rows, single column `h`, the k
    * smallest distinct hash values. TakeOrdered (distributed heap
    * top-k), never a global sort. */
  def sketch(df: DataFrame, key: Column, k: Int): DataFrame = {
    require(k >= 2, s"KmvSketch: k must be >= 2, got $k")
    df.select(uniformHash(key).as("h")).distinct()
      .orderBy(col("h")).limit(k)
  }

  /** One-row summary (n, kth) of a sketch: retained size and the
    * retention threshold (max retained hash). */
  def stats(sk: DataFrame): DataFrame =
    sk.agg(count(lit(1)).cast("long").as("n"), max(col("h")).as("kth"))

  /** Distinct-count estimate from (n, kth) columns (given by NAME so
    * the division is integral `div`, not fractional `/`): exact when
    * the sketch is not full (n < k), else (k-1)*M div kth. */
  def estimate(nName: String, kthName: String, k: Int): Column =
    expr(s"CASE WHEN $nName < $k THEN $nName" +
      s" ELSE ${(k - 1).toLong * M} div $kthName END")

  /** Merged sketch of the UNION of the underlying sets. */
  def merge(skA: DataFrame, skB: DataFrame, k: Int): DataFrame =
    skA.union(skB).distinct().orderBy(col("h")).limit(k)
}
