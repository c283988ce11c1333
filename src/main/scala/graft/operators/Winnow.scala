package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Winnowing document fingerprints — the local-minimum rolling-hash
  * selection of Schleimer, Wilkerson & Aiken, "Winnowing: Local
  * Algorithms for Document Fingerprinting" (SIGMOD 2003; the MOSS
  * algorithm). Per document: hash every k-token gram with the portable
  * rolling hash, slide a w-hash window, keep each window's minimum.
  * Guarantees: any shared run of w + k - 1 tokens produces at least
  * one shared fingerprint, while only ~2/(w+1) of the hashes are kept
  * — an 8-32× smaller inverted index than full shingling at the same
  * detection granularity. No reference counterpart (north-star scope).
  *
  * Scale shape: fingerprint selection is one map-side typed kernel
  * (tokenize → k-gram hashes → windowed minima → per-doc dedup, all in
  * one JVM pass, no shuffle). The pair match is an equi-join on the
  * fingerprint — sub-quadratic because posting lists are winnowed —
  * with a document-frequency cap that drops degenerate boilerplate
  * fingerprints (the classic hot-key guard for corpus-scale joins).
  */
object Winnow {

  /** Distinct (docId, fp) winnowed fingerprints. Docs with fewer than
    * k tokens emit none; docs with 1..w-1 k-gram hashes emit the
    * minimum of what they have (standard short-doc convention). */
  def fingerprints(df: DataFrame, docId: String, text: Column,
      k: Int = 4, w: Int = 4): DataFrame = {
    require(k >= 1 && w >= 1, "k and w must be >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(docId).cast("long"), text.cast("string"))
      .as[(Long, String)]
      .flatMap { case (id, t) =>
        val toks = if (t == null) Array.empty[String]
          else t.split(" ").filter(_.nonEmpty)
        val m = toks.length - k + 1
        if (m <= 0) Iterator.empty
        else {
          val hs = new Array[Long](m)
          val sb = new StringBuilder
          var i = 0
          while (i < m) {
            sb.clear()
            var o = 0
            while (o < k) {
              if (o > 0) sb.append('_')
              sb.append(toks(i + o)); o += 1
            }
            hs(i) = TextFunctions.polyHashJvm(sb.toString)
            i += 1
          }
          val out = new java.util.HashSet[Long]()
          if (m < w) {
            var mn = hs(0); var j = 1
            while (j < m) { if (hs(j) < mn) mn = hs(j); j += 1 }
            out.add(mn)
          } else {
            var j = 0
            while (j <= m - w) {
              var mn = hs(j); var o = 1
              while (o < w) { if (hs(j + o) < mn) mn = hs(j + o); o += 1 }
              out.add(mn)
              j += 1
            }
          }
          val ib = Iterator.newBuilder[(Long, Long)]
          out.forEach(fp => ib += ((id, fp)))
          ib.result()
        }
      }.toDF(docId, "fp")
  }

  /** Document pairs sharing at least `minShared` winnowed fingerprints
    * (fingerprints appearing in more than `dfCap` documents are
    * dropped first — boilerplate guard). Output: docId_a, docId_b,
    * n_shared. */
  def sharedPairs(df: DataFrame, docId: String, text: Column,
      k: Int = 4, w: Int = 4, minShared: Int = 2, dfCap: Int = 1000)
      : DataFrame = {
    // the winnowing kernel feeds the df-cap aggregate AND both sides
    // of the self-join — persist it once, release after eagerly
    // materializing the (small) verified pair output (the same cache
    // discipline as the sibling dedup/ANN operators)
    val fps = fingerprints(df, docId, text, k, w)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val kept = fps.groupBy(col("fp"))
      .agg(count(lit(1)).as("dfc"))
      .filter(col("dfc") <= dfCap)
      .select(col("fp"))
    val f = fps.join(kept, Seq("fp")).select(col("fp"), col(docId))
    val out = f.toDF("fp", docId + "_a")
      .join(f.toDF("fp", docId + "_b"), Seq("fp"))
      .filter(col(docId + "_a") < col(docId + "_b"))
      .groupBy(col(docId + "_a"), col(docId + "_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
      .localCheckpoint(true)
    fps.unpersist()
    out
  }
}
