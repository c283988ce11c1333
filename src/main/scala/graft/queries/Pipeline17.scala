package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.Multimodal
import graft.sources.Catalog

/** Round-9 additions, part 4 — the inference half of tokenizer
  * training, and content-level dedup for the image modality:
  *
  *  - q159 BPE tokenizer APPLICATION: q157 learns the merge table;
  *    this query applies the learned merges corpus-wide and accounts
  *    for the compression they buy, per source (docs, tokens before /
  *    after, tokens saved). Application is embarrassingly map-side —
  *    the loop's only shuffles are the per-round pair counts during
  *    learning, and the final small per-source aggregate; at 100 TB
  *    the apply pass streams each partition once per learned merge
  *    with nothing crossing the wire.
  *  - q160 PERCEPTUAL near-dup pairs over DECODED image features —
  *    the multimodal sibling of q16 minhash / q43 simhash text dedup:
  *    decode payloads ([[Multimodal.FakeCodec]], exact integer
  *    arithmetic the oracle replays via ascii()), derive an
  *    aHash-style sign-bit fingerprint (each feature dim vs the
  *    asset's mean), bucket by (fingerprint, length block) so
  *    candidate generation is a bucket-local equi-join — never an
  *    all-pairs self-join — and verify candidates by relative L1
  *    distance (≤ 1% of feature mass). Exact duplicate payloads land
  *    at l1 = 0; near-identical ones well inside the gate; unrelated
  *    same-bucket collisions die in the verify.
  *
  * Plus the commit-log read surface under the DuckDB hash gate:
  *  - q161 the DSv2 connector (snapshot + versionAsOf time travel);
  *  - q162 the append change feed (per-version deltas from manifests);
  *  - q163 row-level DML — copy-on-write DELETE + UPDATE with the
  *    recorded change-data feed (insert/delete/update_preimage/
  *    update_postimage) and the final state verified side by side.
  */
object Pipeline17 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Catalog.table(s, dir, name)

  private val Rounds = 3
  private val Dims = Multimodal.FakeCodec.FeatDims

  private def stageDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_${tag}_").toString

  private def rmStage(s: SparkSession, stage: String): Unit = {
    val fs = org.apache.hadoop.fs.FileSystem
      .get(s.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(stage), true): Unit
  }

  private def pairsOf(df: DataFrame, textCol: String): DataFrame =
    df.select(TextFunctions.tokens(col(textCol)).as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(toks)-1)," +
          " i -> struct(toks[i-1] AS w1, toks[i] AS w2))")).as("p"))
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q159_bpe_apply" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), col("source"), col("text"))
      var cur = docs.select(col("doc_id"), col("source"),
        col("text").as("mtext"))
      for (_ <- 1 to Rounds) {
        val best = pairsOf(cur, "mtext")
          .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("cnt"))
          .orderBy(col("cnt").desc, col("w1"), col("w2"))
          .limit(1).collect()(0)
        val (w1, w2) = (best.getString(0), best.getString(1))
        cur = cur.select(col("doc_id"), col("source"),
          regexp_replace(col("mtext"),
            lit(s"\\b$w1 $w2\\b"), lit(s"${w1}_$w2")).as("mtext"))
      }
      val before = docs.groupBy(col("source")).agg(
        count(lit(1)).as("n_docs"),
        sum(size(TextFunctions.tokens(col("text"))).cast("long"))
          .as("toks_before"))
      val after = cur.groupBy(col("source")).agg(
        sum(size(TextFunctions.tokens(col("mtext"))).cast("long"))
          .as("toks_after"))
      before.join(after, "source")
        .withColumn("toks_saved", col("toks_before") - col("toks_after"))
        .orderBy(col("source"))
    }),

    // The DSv2 connector under the oracle: two appends build a
    // commit-log table from date-sliced lineitem; the CURRENT
    // snapshot and a versionAsOf=1 time travel are both read back
    // through `format("commitlog")` and aggregated side by side. The
    // oracle recomputes both frames from raw lineitem — a hash match
    // proves the manifest resolution, segment union, and time travel
    // are content-exact through Spark's standard connector API.
    "q161_commitlog_dsv2" -> ((s, dir) => {
      val stage = stageDir("q161_cl")
      val tbl = s"$stage/tbl"
      val li = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_quantity"), col("l_returnflag"),
          col("l_shipdate"))
      val cut = lit("1996-01-01").cast("timestamp")
      graft.sources.CommitLog.append(s, tbl,
        li.filter(col("l_shipdate") < cut))
      graft.sources.CommitLog.append(s, tbl,
        li.filter(col("l_shipdate") >= cut))
      def read(opts: (String, String)*): DataFrame =
        opts.foldLeft(s.read.format("commitlog").option("path", tbl))(
          (r, kv) => r.option(kv._1, kv._2)).load()
      def agg(df: DataFrame, n: String, q: String): DataFrame =
        df.groupBy(col("l_returnflag")).agg(
          count(lit(1)).as(n),
          sum(col("l_quantity").cast("decimal(30,6)")).cast("double")
            .as(q))
      val out = agg(read(), "n_total", "qty_total")
        .join(agg(read("versionAsOf" -> "1"), "n_v1", "qty_v1"),
          Seq("l_returnflag"), "left")
        .select(col("l_returnflag"), col("n_total"), col("qty_total"),
          coalesce(col("n_v1"), lit(0L)).as("n_v1"),
          coalesce(col("qty_v1"), lit(0.0)).as("qty_v1"))
        .orderBy(col("l_returnflag"))
        .localCheckpoint(true)
      rmStage(s, stage)
      out
    }),

    // The change feed under the oracle: three date-sliced appends,
    // then CommitLog.changes reconstructs each version's delta purely
    // from manifests; per-delta aggregates tagged with their version
    // hash-match the oracle's recomputation of the same slices from
    // raw lineitem — proving the feed yields exactly the rows each
    // version added, no leakage across versions.
    "q162_commitlog_changefeed" -> ((s, dir) => {
      val stage = stageDir("q162_cf")
      val tbl = s"$stage/tbl"
      val li = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_quantity"), col("l_returnflag"),
          col("l_shipdate"))
      val c1 = lit("1996-01-01").cast("timestamp")
      val c2 = lit("1997-01-01").cast("timestamp")
      graft.sources.CommitLog.append(s, tbl,
        li.filter(col("l_shipdate") < c1))
      graft.sources.CommitLog.append(s, tbl,
        li.filter(col("l_shipdate") >= c1 && col("l_shipdate") < c2))
      graft.sources.CommitLog.append(s, tbl,
        li.filter(col("l_shipdate") >= c2))
      val out = graft.sources.CommitLog.changes(s, tbl, afterVersion = 0L)
        .map { case (v, delta) =>
          delta.groupBy(col("l_returnflag")).agg(
            count(lit(1)).as("n_rows"),
            sum(col("l_quantity").cast("decimal(30,6)")).cast("double")
              .as("qty_sum"))
            .withColumn("version", lit(v))
        }
        .reduce(_ unionByName _)
        .select(col("version"), col("l_returnflag"), col("n_rows"),
          col("qty_sum"))
        .orderBy(col("version"), col("l_returnflag"))
        .localCheckpoint(true)
      rmStage(s, stage)
      out
    }),

    // Row-level DML under the oracle: two appends build the table,
    // then a copy-on-write DELETE and a copy-on-write UPDATE commit
    // versions 3 and 4; the full change feed (insert / delete /
    // update_preimage / update_postimage, tagged with commit versions)
    // AND the final table state are aggregated side by side. The
    // oracle recomputes every slice from raw lineitem with static
    // predicates — a hash match proves the touched-segment rewrite,
    // the recorded change images, and the delete→update sequencing
    // (the update sees the post-delete state) are all content-exact.
    "q163_commitlog_dml" -> ((s, dir) => {
      val stage = stageDir("q163_dml")
      val tbl = s"$stage/tbl"
      val li = t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_quantity"), col("l_returnflag"),
          col("l_shipdate"))
      val cut = lit("1996-01-01").cast("timestamp")
      val old = lit("1995-06-01").cast("timestamp")
      // the first bulk append is cached and zero-copy cloned — the
      // clone's v1 is CDC-equivalent to the original append v1
      // (changeFeed classes 'clone' with 'append'), so the feed's
      // version numbering is unchanged; the incremental append and
      // the DML under measurement run per-run on the clone
      val base = StagedBases.cachedBase[String]("li_pre96", dir) { b =>
        graft.sources.CommitLog.append(s, b,
          li.filter(col("l_shipdate") < cut))
        b
      }
      graft.sources.CommitLog.cloneTable(s, base, tbl)
      graft.sources.CommitLog.append(s, tbl,
        li.filter(col("l_shipdate") >= cut))
      graft.sources.CommitLog.delete(s, tbl,
        col("l_returnflag") === "R" && col("l_shipdate") < old)
      graft.sources.CommitLog.update(s, tbl, col("l_quantity") > 30,
        Map("l_quantity" -> (col("l_quantity") * 2)))
      def agg(g: org.apache.spark.sql.RelationalGroupedDataset): DataFrame =
        g.agg(count(lit(1)).as("n_rows"),
          sum(col("l_quantity").cast("decimal(30,6)")).cast("double")
            .as("qty_sum"))
      val feed = agg(graft.sources.CommitLog.changeFeed(s, tbl, 0L)
        .groupBy(col("_commit_version").as("version"),
          col("_change_type").as("ctype"), col("l_returnflag")))
      val fin = agg(graft.sources.CommitLog.read(s, tbl)
          .groupBy(col("l_returnflag")))
        .withColumn("version", lit(99L))
        .withColumn("ctype", lit("final"))
      val out = feed.unionByName(fin)
        .select(col("version"), col("ctype"), col("l_returnflag"),
          col("n_rows"), col("qty_sum"))
        .orderBy(col("version"), col("ctype"), col("l_returnflag"))
        .localCheckpoint(true)
      rmStage(s, stage)
      out
    }),

    "q160_phash_image_dedup" -> ((s, dir) => {
      val meta = Multimodal.decodeMeta(
        Multimodal.assetsFromDocuments(s, dir), batchSize = 64).toDF()
      val featC: Seq[Column] =
        (0 until Dims).map(d => col("feat").getItem(d).as(s"f$d"))
      val total = (0 until Dims).map(d => col(s"f$d")).reduce(_ + _)
      val base = meta
        .select(Seq(col("asset_id"), col("n_bytes")) ++ featC: _*)
        .withColumn("total", total)
        .withColumn("mean", expr(s"total div $Dims"))
        .withColumn("phash", (0 until Dims).map(d =>
          when(col(s"f$d") >= col("mean"), lit(1L << d))
            .otherwise(lit(0L))).reduce(_ + _))
        .withColumn("lenb", expr("n_bytes div 128"))
      def side(tag: String): DataFrame =
        base.select(Seq(col("asset_id").as(s"asset_$tag"),
          col("phash"), col("lenb"), col("total").as(s"total_$tag")) ++
          (0 until Dims).map(d => col(s"f$d").as(s"$tag$d")): _*)
      val l1 = (0 until Dims).map(d =>
        abs(col(s"a$d") - col(s"b$d"))).reduce(_ + _)
      side("a").join(side("b"), Seq("phash", "lenb"))
        .filter(col("asset_a") < col("asset_b"))
        .withColumn("l1", l1)
        .filter(col("l1") * 100 <= col("total_a"))
        .select(col("asset_a"), col("asset_b"), col("l1"))
        .orderBy(col("asset_a"), col("asset_b"))
    })
  )

  private def tokCount(c: String): String =
    s"CAST(len(list_filter(string_split($c, ' '), t_ -> t_ <> '')) AS BIGINT)"

  private def featSql(d: Int): String =
    s"""CAST(COALESCE(list_sum(list_transform(
       |    list_filter(range(1, length(text) + 1),
       |      i_ -> (i_ - 1) % $Dims = $d),
       |    i_ -> ascii(text[i_]))), 0) AS BIGINT) AS f$d""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "q159_bpe_apply" -> {
      def toks(src: String, out: String): String =
        s"""$out AS (SELECT list_filter(string_split(mtext, ' '),
           |    t_ -> t_ <> '') AS toks FROM $src)""".stripMargin
      def bestOf(tokCte: String, out: String): String =
        s"""$out AS MATERIALIZED (
           |  SELECT w1, w2 FROM (
           |    SELECT w1, w2, COUNT(*) AS cnt FROM (
           |      SELECT unnest(list_slice(toks, 1, len(toks)-1)) AS w1,
           |             unnest(list_slice(toks, 2, len(toks))) AS w2
           |      FROM $tokCte WHERE len(toks) >= 2)
           |    GROUP BY w1, w2)
           |  ORDER BY cnt DESC, w1, w2 LIMIT 1)""".stripMargin
      def applied(src: String, best: String, out: String): String =
        s"""$out AS MATERIALIZED (
           |  SELECT doc_id, source, regexp_replace(mtext,
           |      '\\b' || w1 || ' ' || w2 || '\\b',
           |      w1 || '_' || w2, 'g') AS mtext
           |  FROM $src, $best)""".stripMargin
      s"""WITH d1 AS MATERIALIZED (
         |  SELECT doc_id, source, text AS mtext FROM documents),
         |${toks("d1", "t1")},
         |${bestOf("t1", "b1")},
         |${applied("d1", "b1", "d2")},
         |${toks("d2", "t2")},
         |${bestOf("t2", "b2")},
         |${applied("d2", "b2", "d3")},
         |${toks("d3", "t3")},
         |${bestOf("t3", "b3")},
         |${applied("d3", "b3", "d4")},
         |bef AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |    CAST(SUM(${tokCount("text")}) AS BIGINT) AS toks_before
         |  FROM documents GROUP BY source),
         |aft AS (SELECT source,
         |    CAST(SUM(${tokCount("mtext")}) AS BIGINT) AS toks_after
         |  FROM d4 GROUP BY source)
         |SELECT source, n_docs, toks_before, toks_after,
         |  toks_before - toks_after AS toks_saved
         |FROM bef JOIN aft USING (source)
         |ORDER BY source""".stripMargin
    },

    "q161_commitlog_dsv2" ->
      """WITH cur AS (
        |  SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n_total,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE)
        |      AS qty_total
        |  FROM lineitem GROUP BY l_returnflag),
        |v1 AS (
        |  SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n_v1,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE)
        |      AS qty_v1
        |  FROM lineitem
        |  WHERE l_shipdate < TIMESTAMP '1996-01-01 00:00:00'
        |  GROUP BY l_returnflag)
        |SELECT cur.l_returnflag, n_total, qty_total,
        |  COALESCE(n_v1, 0) AS n_v1,
        |  COALESCE(qty_v1, 0.0) AS qty_v1
        |FROM cur LEFT JOIN v1 USING (l_returnflag)
        |ORDER BY cur.l_returnflag""".stripMargin,

    "q162_commitlog_changefeed" -> {
      def slice(v: Int, pred: String): String =
        s"""SELECT CAST($v AS BIGINT) AS version, l_returnflag,
           |  CAST(COUNT(*) AS BIGINT) AS n_rows,
           |  CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE)
           |    AS qty_sum
           |FROM lineitem WHERE $pred GROUP BY l_returnflag""".stripMargin
      s"""${slice(1, "l_shipdate < TIMESTAMP '1996-01-01 00:00:00'")}
         |UNION ALL
         |${slice(2, "l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'" +
           " AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'")}
         |UNION ALL
         |${slice(3, "l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'")}
         |ORDER BY version, l_returnflag""".stripMargin
    },

    "q163_commitlog_dml" -> {
      val del = "l_returnflag = 'R' AND " +
        "l_shipdate < TIMESTAMP '1995-06-01 00:00:00'"
      def slice(v: Int, ctype: String, pred: String,
          qty: String = "l_quantity"): String =
        s"""SELECT CAST($v AS BIGINT) AS version, '$ctype' AS ctype,
           |  l_returnflag, CAST(COUNT(*) AS BIGINT) AS n_rows,
           |  CAST(SUM(CAST($qty AS DECIMAL(30,6))) AS DOUBLE) AS qty_sum
           |FROM lineitem WHERE $pred GROUP BY l_returnflag""".stripMargin
      Seq(
        slice(1, "insert",
          "l_shipdate < TIMESTAMP '1996-01-01 00:00:00'"),
        slice(2, "insert",
          "l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'"),
        slice(3, "delete", del),
        slice(4, "update_preimage", s"NOT ($del) AND l_quantity > 30"),
        slice(4, "update_postimage", s"NOT ($del) AND l_quantity > 30",
          qty = "l_quantity * 2"),
        slice(99, "final", s"NOT ($del)",
          qty = "CASE WHEN l_quantity > 30 THEN l_quantity * 2 " +
            "ELSE l_quantity END")
      ).mkString("", "\nUNION ALL\n",
        "\nORDER BY version, ctype, l_returnflag")
    },

    "q160_phash_image_dedup" -> {
      val fsum = (0 until Dims).map(d => s"f$d").mkString(" + ")
      val bits = (0 until Dims).map(d =>
        s"(CASE WHEN f$d >= mean THEN ${1L << d} ELSE 0 END)")
        .mkString(" + ")
      val l1 = (0 until Dims).map(d => s"abs(a.f$d - b.f$d)")
        .mkString(" + ")
      s"""WITH f AS (
         |  SELECT doc_id AS asset_id,
         |    CAST(length(text) AS BIGINT) AS n_bytes,
         |    ${(0 until Dims).map(featSql).mkString(",\n    ")}
         |  FROM documents),
         |e AS (SELECT *, ($fsum) AS total,
         |    ($fsum) // $Dims AS mean FROM f),
         |p AS (SELECT asset_id, total,
         |    CAST($bits AS BIGINT) AS phash,
         |    n_bytes // 128 AS lenb,
         |    ${(0 until Dims).map(d => s"f$d").mkString(", ")}
         |  FROM e)
         |SELECT a.asset_id AS asset_a, b.asset_id AS asset_b,
         |  CAST($l1 AS BIGINT) AS l1
         |FROM p a JOIN p b
         |  ON a.phash = b.phash AND a.lenb = b.lenb
         |  AND a.asset_id < b.asset_id
         |WHERE ($l1) * 100 <= a.total
         |ORDER BY asset_a, asset_b""".stripMargin
    }
  )
}
