package graft.tools

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.EngineSession
import graft.sources.Catalog

/** Scale-stress dataset generator: writes an N× copy of an sf
  * directory with keys remapped per copy, so every query's working
  * set (rows, distinct keys, join fan-out, near-dup clusters) grows
  * LINEARLY with N — unlike naive row duplication, where `distinct()`
  * collapses copies and dedup pair counts explode quadratically.
  *
  * Remapping rules:
  *  - dimension tables (region, nation) are shared — as on a real
  *    warehouse, dims don't scale with facts;
  *  - every entity key (custkey/suppkey/partkey/orderkey/doc_id/
  *    event_id/user_id/vec_id) gets +copy·10⁹, applied consistently
  *    on both sides of every foreign key, so joins stay copy-local;
  *  - document text gets a copy-unique tag on EVERY token, so copies
  *    share zero shingles and near-dup clusters stay copy-local
  *    (10× corpus ⇒ 10× pairs; a lead-token-only tag would leave
  *    copies at Jaccard ≈ 1 and explode pairs ≈ N²×).
  *
  * Usage: runMain graft.tools.ScaleGen <srcDir> <outDir> <copies>
  * The scaling run is then just Bench with SPARK_GRAFT_SF_DIR=<outDir>
  * and a name filter; exponent = log(tN / t1) / log(N).
  */
object ScaleGen {
  private val Off = 1000000000L

  def main(args: Array[String]): Unit = {
    val (src, out, copies) = (args(0), args(1), args(2).toInt)
    val spark = EngineSession.create("graft-scalegen",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val keyCols: Map[String, Seq[String]] = Map(
      "customer" -> Seq("c_custkey"),
      "supplier" -> Seq("s_suppkey"),
      "part" -> Seq("p_partkey"),
      "orders" -> Seq("o_orderkey", "o_custkey"),
      "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
      "events" -> Seq("event_id", "user_id"),
      "documents" -> Seq("doc_id"),
      "embeddings" -> Seq("vec_id"))
    Catalog.tableNames.foreach { t =>
      val base = Catalog.table(spark, src, t)
      val scaled: DataFrame = keyCols.get(t) match {
        case None => base // shared dimension
        case Some(keys) =>
          // Guard the remap invariant: a source key ≥ Off would make
          // copy i's shifted keys collide with copy i+1's, silently
          // breaking the linear-growth guarantee this tool exists to
          // provide (TPC-H orderkey passes 1e9 well before SF100).
          val maxKey = // greatest() needs ≥ 2 args
            if (keys.size == 1) col(keys.head) else greatest(keys.map(col): _*)
          val mxRow = base.agg(max(maxKey).cast("long")).first()
          // max() over an empty (or all-NULL-keyed) table is NULL —
          // fail with the table name, not a bare NPE from getLong
          require(!mxRow.isNullAt(0),
            s"$t: table is empty or key columns ${keys.mkString(",")} are all NULL — nothing to scale")
          val mx = mxRow.getLong(0)
          require(mx < Off,
            s"$t: max key $mx >= offset $Off — raise Off before scaling")
          (0 until copies).map { i =>
            val shifted = keys.foldLeft(base) { (df, k) =>
              df.withColumn(k, col(k) + lit(i * Off)) }
            if (t == "documents" && i > 0)
              shifted.withColumn("text", array_join(
                transform(split(col("text"), " "),
                  tok => concat(lit(s"c${i}_"), tok)), " "))
            else shifted
          }.reduce(_ unionAll _)
      }
      scaled.write.mode(SaveMode.Overwrite).parquet(s"$out/$t.parquet")
    }
    spark.stop()
  }
}
