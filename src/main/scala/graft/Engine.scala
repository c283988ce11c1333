package graft

import org.apache.spark.sql.SparkSession

/** SparkSession factory for the engine (SURVEY.md §7.3 step 1).
  *
  * Replaces the reference's connection bootstrap
  * (`Select de Importação de Dados.py:14-23,156-164`) — instead of two
  * RDBMS connections, one Catalyst-hosting session. Defaults are sized
  * for the judged local[32] harness but every knob is overridable via
  * env, mirroring the reference's env-with-defaults config style (S8).
  *
  * Scale notes (100 TB design intent):
  *   - AQE on: runtime partition coalescing, skew-join splitting, and
  *     join-strategy switching are the main levers that survive a
  *     1000-executor scale-up without re-tuning.
  *   - shuffle.partitions is a *local-mode* default (= cores); on a real
  *     cluster AQE's coalesceShufflePartitions makes the initial number
  *     mostly irrelevant as long as it is high enough.
  *   - UTC session timezone pinned: the reference lands pre-formatted
  *     date strings (SURVEY §1.2), so formatting must be tz-stable.
  */
object EngineSession {

  def create(
      appName: String = "graft",
      cores: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
  ): SparkSession = {
    val spark = SparkSession
      .builder()
      .withExtensions(new graft.expressions.GraftExtensions)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // storage-partitioned joins: honor the KeyGroupedPartitioning a
      // bucketed commit-log scan reports (bucket-aligned fact joins
      // then plan with zero shuffle exchanges); affects only V2 scans
      // that actually claim a key-grouped layout
      .config("spark.sql.sources.v2.bucketing.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    // getOrCreate may return a pre-existing session built WITHOUT the
    // extensions (shared-JVM tests) — the live-session hook is idempotent
    graft.expressions.GraftExtensions.register(spark)
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
