package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis scalar functions for training-data pipelines
  * (north-star scope; no reference counterpart — SURVEY §2.4 last row).
  *
  * Everything here is built from codegen'd higher-order functions
  * (`transform`/`filter`/`aggregate`) — no UDFs — so the hot path stays
  * inside whole-stage codegen at 100 TB.
  *
  * Cross-engine determinism: hashes are polynomial-rolling over ASCII
  * codes in exact BIGINT arithmetic mod 1e9+7, an algorithm any SQL
  * engine (the DuckDB oracle included) reproduces bit-for-bit. For a
  * production corpus you would swap in `xxhash64` (native, faster) —
  * the operators take the hash as a pluggable Column.
  */
object TextFunctions {

  val HashMod = 1000000007L
  val HashBase = 131L

  /** Whitespace tokenizer: non-empty tokens of a space-separated text. */
  def tokens(text: Column): Column =
    filter(split(text, " "), t => t =!= "")

  /** Portable polynomial rolling hash of a string:
    * fold(chars) h -> (h * 131 + ascii(c)) mod 1e9+7. */
  def polyHash(s: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      graft.expressions.PolyHashFP(
        org.apache.spark.sql.GraftColumnBridge.expression(s)))

  /** The interpreted HOF twin of [[polyHash]] — kept as the executable
    * specification the native expression is law-pinned against
    * (ExpressionSpec); ~6× slower per row, don't use on hot paths. */
  def polyHashHof(s: Column): Column =
    aggregate(
      transform(sequence(lit(1), length(s)),
        i => ascii(s.substr(i, lit(1)))),
      lit(0L),
      (h, c) => (h * lit(HashBase) + c) % lit(HashMod))

  /** Document fingerprint = rolling hash of the whole text (exact-dedup
    * key; two byte-identical documents collide with certainty, unrelated
    * ones with probability ~1e-9). */
  def fingerprint(text: Column): Column = polyHash(text)

  /** JVM twin of [[polyHash]] — same code-point fold, same constants,
    * identical output on ALL inputs (delegates to the shared
    * [[graft.expressions.PolyHashKernel]]; surrogate pairs fold as one
    * code point, matching `ascii()`/the oracle). Use via
    * [[fingerprints]] on hot paths: the HOF form is interpreted per
    * character (~2 s per 5 000 × 550-char corpus pass). */
  def polyHashJvm(s: String): Long =
    graft.expressions.PolyHashKernel.hashString(s)

  /** (docId, fingerprint) via the kernel — map-side, no shuffle.
    * NULL text → NULL fingerprint, matching the SQL [[polyHash]]. */
  def fingerprints(df: org.apache.spark.sql.DataFrame, docId: String,
      text: Column): org.apache.spark.sql.DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(org.apache.spark.sql.functions.col(docId).cast("long"),
        text.cast("string"))
      .as[(Long, String)]
      .map { case (id, t) =>
        (id, if (t == null) null
          else java.lang.Long.valueOf(polyHashJvm(t)): java.lang.Long)
      }
      .toDF(docId, "fingerprint")
  }

  /** Number of tokens matching a fixed word list (with multiplicity). */
  def wordListHits(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isInCollection(words)))

  /** One-pass JVM kernel for the q14 text-stats projection: token
    * count, regex-run count, distinct tokens, average token length,
    * stopword ratio, composite quality, fingerprint — all per document
    * in a single `mapPartitions` sweep, no shuffle. The HOF expression
    * form (`aggregate`/`transform` per character) is interpreted and
    * dominated the honest (materialized) bench; this kernel computes
    * the SAME arithmetic — integer counts, then IEEE double ops in the
    * same association order as the SQL — so the DuckDB oracle still
    * hash-matches bit-for-bit. */
  def textStats(df: org.apache.spark.sql.DataFrame, docId: String,
      text: Column, stopwords: Seq[String])
      : org.apache.spark.sql.DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val stopSet = stopwords.toSet
    df.select(org.apache.spark.sql.functions.col(docId).cast("long"),
        text.cast("string"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val re = java.util.regex.Pattern.compile("[a-z]{3,}")
        it.map { case (id, t) =>
          if (t == null) {
            // NULL text → all-NULL stats row, matching the column-
            // expression form this kernel replaced (split/size/
            // regexp_count all null-propagate)
            (id, None: Option[Long], None: Option[Long],
              None: Option[Long], None: Option[Double],
              None: Option[Double], None: Option[Double],
              None: Option[Long])
          } else {
          val toks = t.split(" ").filter(_.nonEmpty)
          val nt = toks.length.toLong
          val m = re.matcher(t)
          var nRegex = 0L
          while (m.find()) nRegex += 1
          val uniq = new java.util.HashSet[String]()
          var sumLen = 0L
          var stop = 0L
          toks.foreach { tok =>
            uniq.add(tok)
            sumLen += tok.length
            if (stopSet.contains(tok)) stop += 1
          }
          val nu = uniq.size.toLong
          if (nt == 0L) {
            // zero-token text (empty/whitespace-only): SQL divide-by-
            // zero yields NULL under non-ANSI Spark and the DuckDB
            // oracle's NULLIF guard — emit None, not JVM NaN
            (id, Some(nt), Some(nRegex), Some(nu), None: Option[Double],
              None: Option[Double], None: Option[Double],
              Some(polyHashJvm(t)))
          } else {
          val ntD = nt.toDouble
          val avgLen = sumLen.toDouble / ntD
          val stopRatio = stop.toDouble / ntD
          val quality =
            (nu.toDouble / ntD) * 0.3 +
              (1.0 - stop.toDouble / ntD) * 0.4 +
              (math.min(nt, 100L).toDouble / 100.0) * 0.3
          (id, Some(nt), Some(nRegex), Some(nu), Some(avgLen),
            Some(stopRatio), Some(quality), Some(polyHashJvm(t)))
          }
          }
        }
      }
      .toDF(docId, "n_tokens", "n_regex_tokens", "n_uniq",
        "avg_token_len", "stop_ratio", "quality", "fingerprint")
  }

  /** One-pass repetition statistics per document — the within-doc
    * repetition quality signals of the public Gopher/MassiveText
    * filtering recipe (Rae et al. 2021, §A1.1: duplicated n-gram
    * fraction, repeated-token runs). Map-side kernel, no shuffle:
    * (n_trigrams, distinct_trigrams, dup_frac, max_token_run).
    * dup_frac is NULL when the doc has no trigram (divide-by-zero
    * NULLs like the oracle; the session is ANSI so a bare SQL divide
    * would error instead). NULL text → all-NULL row. */
  def repetitionStats(df: org.apache.spark.sql.DataFrame, docId: String,
      text: org.apache.spark.sql.Column)
      : org.apache.spark.sql.DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(org.apache.spark.sql.functions.col(docId).cast("long"),
        text.cast("string"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, t) =>
        if (t == null) {
          (id, None: Option[Long], None: Option[Long],
            None: Option[Double], None: Option[Long])
        } else {
          val toks = t.split(" ").filter(_.nonEmpty)
          val m = math.max(0, toks.length - 2)
          val seen = new java.util.HashSet[String]()
          val sb = new StringBuilder
          var i = 0
          while (i < m) {
            sb.clear()
            sb.append(toks(i)).append('_').append(toks(i + 1))
              .append('_').append(toks(i + 2))
            seen.add(sb.toString)
            i += 1
          }
          val distinct = seen.size.toLong
          val dupFrac =
            if (m == 0) None
            else Some((m - distinct).toDouble / m.toDouble)
          var best = if (toks.isEmpty) 0L else 1L
          var run = 1L
          var j = 1
          while (j < toks.length) {
            if (toks(j) == toks(j - 1)) { run += 1; if (run > best) best = run }
            else run = 1
            j += 1
          }
          (id, Some(m.toLong), Some(distinct), dupFrac, Some(best))
        }
      })
      .toDF(docId, "n_trigrams", "distinct_trigrams", "dup_frac",
        "max_token_run")
  }

  /** BPE-style PRE-tokenization counts — the segmentation every
    * byte-pair tokenizer (GPT-2 pre-tokenizer regex family) applies
    * before merges: maximal runs of letters, digits, and
    * other-non-space characters each become one pre-token. Token
    * budgeting at corpus scale runs on these counts (merges only ever
    * split WITHIN a pre-token, so the pre-token count lower-bounds and
    * tracks the real BPE token count).
    *
    * One map-side kernel pass (single character sweep per document, no
    * regex engine, no shuffle). NULL text → all-NULL row;
    * chars_per_pretok is NULL for zero pre-tokens (oracle NULL-divide
    * parity — the session is ANSI). Oracle replays the same classes
    * via three class-regex extract counts: the classes partition
    * non-space characters, so `n_pretok = n_alpha + n_num + n_other`
    * in both engines. */
  def preTokenStats(df: org.apache.spark.sql.DataFrame, docId: String,
      text: org.apache.spark.sql.Column)
      : org.apache.spark.sql.DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(org.apache.spark.sql.functions.col(docId).cast("long"),
        text.cast("string"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, t) =>
        if (t == null) {
          (id, None: Option[Long], None: Option[Long],
            None: Option[Long], None: Option[Long],
            None: Option[Double])
        } else {
          // character classes: 0 = space, 1 = alpha, 2 = digit, 3 = other
          def cls(c: Char): Int =
            if (c == ' ') 0
            else if ((c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')) 1
            else if (c >= '0' && c <= '9') 2
            else 3
          var nAlpha = 0L; var nNum = 0L; var nOther = 0L
          var prev = 0
          var i = 0
          while (i < t.length) {
            val k = cls(t.charAt(i))
            if (k != 0 && k != prev) {
              if (k == 1) nAlpha += 1
              else if (k == 2) nNum += 1
              else nOther += 1
            }
            prev = k
            i += 1
          }
          val total = nAlpha + nNum + nOther
          val cpp =
            if (total == 0L) None
            else Some(t.length.toDouble / total.toDouble)
          (id, Some(total), Some(nAlpha), Some(nNum), Some(nOther), cpp)
        }
      })
      .toDF(docId, "n_pretok", "n_alpha", "n_num", "n_other",
        "chars_per_pretok")
  }

  /** Language marker lists over the corpus vocabulary — a disjoint
    * stopword partition per language, the classic n-gram/stopword
    * language-ID heuristic scaled down to the synthetic corpus. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "fast", "key", "order", "big"),
    "de" -> Seq("sort", "table", "scan", "merge", "window"),
    "es" -> Seq("part", "small", "hash", "column", "line"),
    "fr" -> Seq("join", "batch", "stream", "spark", "agg"),
    "zh" -> Seq("group", "query", "row", "data", "value", "vector"))
}
