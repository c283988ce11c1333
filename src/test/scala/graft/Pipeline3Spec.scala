package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Decontaminate, Mixing, SequencePacker, Winnow}

/** Unit contracts for the round-3 training-pipeline operators
  * (decontamination, epoch mixing, sequence packing, winnowing) —
  * hand fixtures verifying the algorithmic guarantees the oracle
  * queries rely on. */
class Pipeline3Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("decontaminate: only docs sharing a full k-gram with bench are flagged") {
    import spark.implicits._
    val run = "a b c d e f g h" // 8 tokens = exactly one 8-gram
    val train = Seq(
      (1L, s"x y $run z"),     // contains the benchmark 8-gram
      (2L, "a b c d e f g x"), // 7-token overlap only — clean
      (3L, "totally unrelated text with eight tokens here")
    ).toDF("doc_id", "text")
    val bench = Seq((100L, s"$run tail tokens")).toDF("doc_id", "text")
    val got = Decontaminate.overlap(train, bench, "doc_id", col("text"), k = 8)
      .orderBy("doc_id").collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(1L))
    assert(got.head.getLong(1) == 1L) // one shared 8-gram
    assert(got.head.getLong(2) == 1L) // one benchmark doc
  }

  test("epoch mixing: full copies + deterministic fractional copy, stable") {
    import spark.implicits._
    val df = (0L until 200L).map(i =>
      (i, if (i % 2 == 0) "hi" else "lo")).toDF("doc_id", "lang")
    val weights = Map("hi" -> 250, "lo" -> 50) // 2.5 and 0.5 epochs
    val out = Mixing.epochMix(df, "doc_id", "lang", weights)
    val counts = out.groupBy("doc_id").count()
      .join(df, "doc_id").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("lang"),
        r.getAs[Long]("count"))).toSeq
    // hi docs: 2 or 3 copies; lo docs: absent from counts or 1 copy
    assert(counts.filter(_._2 == "hi").forall(c => c._3 == 2 || c._3 == 3))
    assert(counts.filter(_._2 == "lo").forall(_._3 == 1))
    // fractional rate realized: hi extras ≈ half, lo kept ≈ half
    val hiExtra = counts.count(c => c._2 == "hi" && c._3 == 3)
    val loKept = counts.count(_._2 == "lo")
    assert(hiExtra > 25 && hiExtra < 75, s"hi extras: $hiExtra")
    assert(loKept > 25 && loKept < 75, s"lo kept: $loKept")
    // determinism: identical output on re-run (no RNG)
    val again = Mixing.epochMix(df, "doc_id", "lang", weights)
    assert(out.exceptAll(again).isEmpty && again.exceptAll(out).isEmpty)
    // epochs are 0-based and dense per doc
    val epochs = out.filter(col("doc_id") === 0).select("epoch")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(epochs == epochs.indices.map(_.toLong))
  }

  test("sequence packing: per-shard running offsets and straddle spans") {
    import spark.implicits._
    // one shard → deterministic manual layout; doc 2 has 0 tokens
    val df = Seq(
      (1L, ("t " * 10).trim), // 10 tokens, start 0,  seqs 0..0
      (2L, "   "),          // excluded
      (3L, ("t " * 60).trim), // 60 tokens, start 10, seqs 0..1 (L=64)
      (4L, ("t " * 5).trim)   // 5 tokens,  start 70, seqs 1..1
    ).toDF("doc_id", "text")
    val got = SequencePacker.packPlan(df, "doc_id", col("text"),
      seqLen = 64, nShards = 1).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("start_off"), r.getAs[Long]("seq_first"),
        r.getAs[Long]("seq_last"))).toSeq
    assert(got == Seq(
      (1L, 10L, 0L, 0L, 0L),
      (3L, 60L, 10L, 0L, 1L), // straddles the 64-token cut
      (4L, 5L, 70L, 1L, 1L)))
  }

  test("packSequences: streaming fold equals local per-shard concat-and-chunk") {
    import spark.implicits._
    // deterministic single-shard layout, L=4
    val df1 = Seq((1L, "a b c"), (2L, "d e"), (3L, "f"))
      .toDF("doc_id", "text")
    val got1 = SequencePacker
      .packSequences(df1, "doc_id", col("text"), seqLen = 4, nShards = 1)
      .orderBy("seq_id").collect()
      .map(r => (r.getAs[Long]("seq_id"), r.getAs[Long]("n_tokens"),
        r.getAs[String]("seq_text"))).toSeq
    assert(got1 == Seq((0L, 4L, "a b c d"), (1L, 2L, "e f")))

    // multi-shard law vs a local replay of the same hash + packing
    val docs = (0L until 60L).map(i =>
      (i, (0 until (i % 7).toInt + 1).map(j => s"t${i}_$j").mkString(" ")))
    val df = docs.toDF("doc_id", "text")
    val n = 3
    val got = SequencePacker
      .packSequences(df, "doc_id", col("text"), seqLen = 5, nShards = n)
      .collect()
      .map(r => (r.getAs[Long]("shard"), r.getAs[Long]("seq_id")) ->
        (r.getAs[Long]("n_tokens"), r.getAs[String]("seq_text"))).toMap
    def shardOf(id: Long) =
      (id % 1000000007L * 2654435761L + 12345L) % 1000000007L % n
    val expect = docs.groupBy { case (id, _) => shardOf(id) }
      .flatMap { case (s, ds) =>
        val stream = ds.sortBy(_._1)
          .flatMap(_._2.split(" ").filter(_.nonEmpty))
        stream.grouped(5).zipWithIndex.map { case (chunk, i) =>
          (s, i.toLong) -> (chunk.length.toLong, chunk.mkString(" "))
        }
      }
    assert(got == expect, s"got ${got.size} vs expect ${expect.size}")
  }

  test("winnow: shared run of w+k-1 tokens guarantees a shared fingerprint") {
    import spark.implicits._
    // k=4, w=4: any shared run of 7 tokens must yield a shared fp
    val run = "q w e r t y u" // 7 tokens
    val df = Seq(
      (1L, s"aa bb cc $run dd"),
      (2L, s"xx $run yy zz"),
      (3L, "no overlap with anything else at all")
    ).toDF("doc_id", "text")
    val fps = Winnow.fingerprints(df, "doc_id", col("text"), k = 4, w = 4)
    val f1 = fps.filter(col("doc_id") === 1).select("fp")
      .collect().map(_.getLong(0)).toSet
    val f2 = fps.filter(col("doc_id") === 2).select("fp")
      .collect().map(_.getLong(0)).toSet
    val f3 = fps.filter(col("doc_id") === 3).select("fp")
      .collect().map(_.getLong(0)).toSet
    assert((f1 & f2).nonEmpty, "guaranteed shared fingerprint missing")
    assert((f1 & f3).isEmpty && (f2 & f3).isEmpty)
    // winnowing is a sampling: strictly fewer fps than k-gram hashes
    val full1 = graft.operators.FuzzyDedup
      .shingles(df.filter(col("doc_id") === 1), "doc_id", col("text"),
        k = 4, cache = false).count()
    assert(f1.size < full1, s"winnowed ${f1.size} vs full $full1")
    // short doc (fewer than w hashes): exactly the minimum survives
    val short = Seq((9L, "a b c d e")).toDF("doc_id", "text") // 2 hashes
    val sf = Winnow.fingerprints(short, "doc_id", col("text"), k = 4, w = 4)
      .collect()
    assert(sf.length == 1)
  }

  test("winnow sharedPairs: near-identical docs pair up, df-cap drops boilerplate") {
    import spark.implicits._
    val body = (1 to 30).map(i => s"tok$i").mkString(" ")
    val df = Seq(
      (1L, body),
      (2L, body + " extra"),       // near-identical to 1
      (3L, "completely different content here with many various words"),
      (4L, "another unrelated document body entirely distinct tokens")
    ).toDF("doc_id", "text")
    val pairs = Winnow.sharedPairs(df, "doc_id", col("text"),
      k = 4, w = 4, minShared = 2, dfCap = 1000)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(pairs == Seq((1L, 2L)))
    // dfCap = 1 drops every fingerprint shared by 2+ docs → no pairs
    val capped = Winnow.sharedPairs(df, "doc_id", col("text"),
      k = 4, w = 4, minShared = 2, dfCap = 1)
    assert(capped.isEmpty)
  }
}
