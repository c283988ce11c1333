package graft

import java.sql.DriverManager

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.IdempotentInsert
import graft.sources.{DerbyDialect, Jdbc}

/** Live-database integration of the reference's core transfer contract
  * (`Select de Importação de Dados.py:161-164,192,213-230`): partitioned
  * JDBC extract → transform → auto-DDL → batched idempotent insert →
  * re-run inserts zero. Runs against embedded Apache Derby (in-memory,
  * the RDBMS available in this sandbox) through the same connector code
  * paths a PostgreSQL target uses, via the dialect seam
  * ([[graft.sources.SqlDialect]]). */
class JdbcIntegrationSpec extends AnyFunSuite {

  System.setProperty("derby.system.home", "/tmp/derby-it")
  private val url = "jdbc:derby:memory:graftit;create=true"

  lazy val spark: SparkSession = SparkSession.builder()
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("extract → transform → upsert round-trip on a live JDBC database") {
    val boot = DriverManager.getConnection(url)
    try {
      // --- source table: 100 rows keyed 1..100 ---------------------
      Jdbc.executeDdl(boot, Seq(
        "CREATE TABLE SRC (ID INTEGER NOT NULL PRIMARY KEY, " +
          "AMOUNT DECIMAL(12,2) NOT NULL, NOTE VARCHAR(64))"),
        DerbyDialect)
      val ins = boot.prepareStatement(
        "INSERT INTO SRC (ID, AMOUNT, NOTE) VALUES (?, ?, ?)")
      (1 to 100).foreach { i =>
        ins.setInt(1, i)
        ins.setBigDecimal(2, new java.math.BigDecimal(s"$i.25"))
        ins.setString(3, s"note_$i")
        ins.addBatch()
      }
      ins.executeBatch(); ins.close()

      // --- S1/S2: partitioned parallel extract ---------------------
      val props = new java.util.Properties()
      val src = Jdbc.read(spark, url, "SRC", props,
        partitionColumn = Some("ID"), bounds = Some((1L, 100L)),
        numPartitions = 4, fetchSize = 10)
      assert(src.rdd.getNumPartitions == 4)
      assert(src.count() == 100)

      // --- transform (R-side shape: filter + projection) -----------
      val transformed = src
        .filter(col("ID") <= 60)
        .select(col("ID").as("id"), col("AMOUNT").as("amount"),
          upper(col("NOTE")).as("note"))

      // --- S5: auto-DDL for the target, executed live --------------
      val ddl = Jdbc.ddlFor("GRAFT_ETL", "TGT", transformed.schema,
        primaryKey = Seq("id"), dialect = DerbyDialect)
      Jdbc.executeDdl(boot, ddl, DerbyDialect)
      // idempotent at the DDL level too (Derby lacks IF NOT EXISTS —
      // the dialect's already-exists states absorb the second run)
      Jdbc.executeDdl(boot, ddl, DerbyDialect)

      def targetCount(): Int = {
        val rs = boot.createStatement()
          .executeQuery("SELECT COUNT(*) FROM \"GRAFT_ETL\".\"TGT\"")
        rs.next(); val n = rs.getInt(1); rs.close(); n
      }

      // --- S3/S4: batched idempotent insert ------------------------
      IdempotentInsert.intoJdbc(transformed, url, "GRAFT_ETL.TGT",
        keys = Seq("id"), props, batchSize = 16, dialect = DerbyDialect)
      assert(targetCount() == 60)

      // S4 law: the SAME load re-run inserts zero
      IdempotentInsert.intoJdbc(transformed, url, "GRAFT_ETL.TGT",
        keys = Seq("id"), props, batchSize = 16, dialect = DerbyDialect)
      assert(targetCount() == 60)

      // delta load overlapping the first: only unseen keys land, and
      // already-present rows are NOT updated (first-writer-wins,
      // SELECT.py:146-148)
      val delta = src
        .select(col("ID").as("id"), col("AMOUNT").as("amount"),
          lower(col("NOTE")).as("note")) // different payload for old keys
      IdempotentInsert.intoJdbc(delta, url, "GRAFT_ETL.TGT",
        keys = Seq("id"), props, batchSize = 16, dialect = DerbyDialect)
      assert(targetCount() == 100)
      val rs = boot.createStatement().executeQuery(
        "SELECT \"note\" FROM \"GRAFT_ETL\".\"TGT\" WHERE \"id\" = 1")
      rs.next()
      assert(rs.getString(1) == "NOTE_1") // first write kept, not lowercased
      rs.close()
    } finally boot.close()
  }

  test("intra-batch duplicate keys are suppressed, not errored") {
    val conn = DriverManager.getConnection(url)
    try {
      import spark.implicits._
      val dup = Seq((200, "a"), (200, "b"), (201, "c"))
        .toDF("id", "note")
      Jdbc.executeDdl(conn,
        Jdbc.ddlFor("GRAFT_ETL", "DUPT", dup.schema, Seq("id"),
          DerbyDialect), DerbyDialect)
      // single partition so both id=200 rows ride one batch
      IdempotentInsert.intoJdbc(dup.coalesce(1), url, "GRAFT_ETL.DUPT",
        keys = Seq("id"), new java.util.Properties(), batchSize = 100,
        dialect = DerbyDialect)
      val rs = conn.createStatement()
        .executeQuery("SELECT COUNT(*) FROM \"GRAFT_ETL\".\"DUPT\"")
      rs.next()
      assert(rs.getInt(1) == 2) // one row per key
      rs.close()
    } finally conn.close()
  }
}
