package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test => ScalaCheckTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, FuzzyDedup, IdempotentInsert, RangeJoin}

/** Property-based laws (SURVEY §5.2 item 3) over randomly generated
  * small frames: upsert idempotence, latest-per-key extremality,
  * top-k bounds, Jaccard bounds, salted-join equivalence. Run inline
  * under ScalaTest so the shared SparkSession is reused. */
class LawsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def check(name: String, prop: Prop): Unit = {
    val params = ScalaCheckTest.Parameters.default
      .withMinSuccessfulTests(12).withWorkers(1)
    val res = ScalaCheckTest.check(params, prop)
    assert(res.passed, s"$name: ${res.status}")
  }

  private val rowsGen: Gen[List[(Int, Int, String)]] =
    Gen.listOfN(40, for {
      k <- Gen.choose(0, 6)
      v <- Gen.choose(0, 1000)
      p <- Gen.alphaStr.map(_.take(4))
    } yield (k, v, p))

  test("upsert law: second application of newRows inserts nothing") {
    import spark.implicits._
    check("upsert", Prop.forAll(rowsGen, rowsGen) { (inc, exist) =>
      val incoming = inc.toDF("id_a", "id_b", "v")
      val existing = exist.toDF("id_a", "id_b", "v")
      val keys = Seq("id_a", "id_b")
      val first = IdempotentInsert.newRows(incoming, existing, keys)
      val after = existing.select(keys.map(col): _*)
        .union(first.select(keys.map(col): _*))
      IdempotentInsert.newRows(incoming, after, keys).count() == 0L
    })
  }

  test("mergeIntoParquet: refresh semantics - insert new, replace changed, keep rest") {
    import spark.implicits._
    val path = java.nio.file.Files
      .createTempDirectory("graft_merge").toString + "/t"
    // first load: bootstrap
    val v1 = Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("id", "k", "v")
    assert(IdempotentInsert.mergeIntoParquet(spark, v1, path, Seq("id"))
      == ((2L, 0L)))
    // second load: id 2 changed, id 3 new, id 1 absent (kept)
    val v2 = Seq((2L, "b", 99.0), (3L, "c", 30.0)).toDF("id", "k", "v")
    assert(IdempotentInsert.mergeIntoParquet(spark, v2, path, Seq("id"))
      == ((1L, 1L)))
    val got = spark.read.parquet(path).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got == Map(1L -> 10.0, 2L -> 99.0, 3L -> 30.0))
    // idempotence: replaying the same load changes nothing but counts
    // as replacement (refresh ALWAYS lands the latest payload)
    assert(IdempotentInsert.mergeIntoParquet(spark, v2, path, Seq("id"))
      == ((0L, 2L)))
    assert(spark.read.parquet(path).count() == 3)
    // intra-batch duplicate keys collapse deterministically (greatest
    // payload struct wins) before the merge
    val dup = Seq((9L, "x", 1.0), (9L, "z", 2.0)).toDF("id", "k", "v")
    IdempotentInsert.mergeIntoParquet(spark, dup, path, Seq("id"))
    val nine = spark.read.parquet(path).filter(col("id") === 9)
      .collect().map(r => (r.getString(1), r.getDouble(2))).toSeq
    assert(nine == Seq(("z", 2.0)))
  }

  test("latestPerKey: exactly one row per key, the max-ordered one") {
    import spark.implicits._
    check("latestPerKey", Prop.forAll(rowsGen) { rows =>
      rows.isEmpty || {
        val df = rows.toDF("k", "v", "p")
        // make the order key unique per key to match R5's determinism
        val uniq = df.dropDuplicates("k", "v")
        val got = Dedup.latestPerKey(uniq, Seq(col("k")), Seq(col("v").desc))
          .collect().map(r => (r.getInt(0), r.getInt(1))).toMap
        val expect = rows.map(r => (r._1, r._2)).distinct
          .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).max }
        got == expect
      }
    })
  }

  test("topKPerGroup: at most k rows per key and they are the top set") {
    import spark.implicits._
    check("topK", Prop.forAll(rowsGen, Gen.choose(1, 5)) { (rows, k) =>
      rows.isEmpty || {
        val df = rows.toDF("k", "v", "p").dropDuplicates("k", "v")
        val got = Dedup.topKPerGroup(df, Seq(col("k")),
          Seq(col("v").desc), k)
          .collect().map(r => (r.getInt(0), r.getInt(1)))
          .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
        val expect = rows.map(r => (r._1, r._2)).distinct
          .groupBy(_._1).map { case (key, vs) =>
            key -> vs.map(_._2).sorted(Ordering[Int].reverse).take(k).toSet
          }
        got == expect
      }
    })
  }

  test("jaccard pairs: bounds and intersection caps hold") {
    import spark.implicits._
    val docGen = Gen.listOfN(10, for {
      id <- Gen.choose(0L, 9L)
      words <- Gen.listOfN(12, Gen.oneOf("a", "b", "c", "d", "e", "f"))
    } yield (id, words.mkString(" ")))
    check("jaccard", Prop.forAll(docGen) { docs =>
      val df = docs.distinctBy(_._1).toDF("doc_id", "text")
      val sh = FuzzyDedup.shingles(df, "doc_id", col("text"), cache = false)
      val pairs = FuzzyDedup.jaccardPairs(sh, "doc_id").collect()
      pairs.forall { r =>
        val inter = r.getAs[Long]("inter")
        val na = r.getAs[Long]("n_a"); val nb = r.getAs[Long]("n_b")
        val j = r.getAs[Double]("jaccard")
        inter >= 1 && inter <= math.min(na, nb) && j > 0.0 && j <= 1.0 &&
          r.getAs[Long]("doc_id_a") < r.getAs[Long]("doc_id_b")
      }
    })
  }

  test("winnow law: fps ⊆ k-gram hashes, count ≤ windows, shared-run guarantee") {
    import spark.implicits._
    val vocab = Seq("a", "b", "c", "d", "e", "f", "g", "h")
    val docGen = Gen.listOfN(6, for {
      id <- Gen.choose(0L, 5L)
      words <- Gen.listOfN(16, Gen.oneOf(vocab))
    } yield (id, words.mkString(" ")))
    val (k, w) = (3, 4)
    check("winnow", Prop.forAll(docGen) { docs =>
      val d = docs.distinctBy(_._1)
      val df = d.toDF("doc_id", "text")
      val fps = graft.operators.Winnow
        .fingerprints(df, "doc_id", col("text"), k, w)
        .collect().map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      d.forall { case (id, text) =>
        val toks = text.split(" ").filter(_.nonEmpty)
        val m = toks.length - k + 1
        val hs = (0 until m).map(i =>
          graft.functions.TextFunctions
            .polyHashJvm(toks.slice(i, i + k).mkString("_"))).toSet
        val got = fps.getOrElse(id, Set.empty)
        // selected fingerprints are a subset of the k-gram hashes and
        // respect the window count bound
        got.subsetOf(hs) && got.nonEmpty == (m > 0) &&
          got.size <= math.max(1, m - w + 1)
      }
    })
  }

  test("sequence packing law: offsets are exact prefix sums per shard") {
    import spark.implicits._
    val docGen = Gen.listOfN(20, for {
      id <- Gen.choose(0L, 40L)
      n <- Gen.choose(0, 9)
    } yield (id, Seq.fill(n)("t").mkString(" ")))
    check("packing", Prop.forAll(docGen) { docs =>
      val d = docs.distinctBy(_._1)
      val df = d.toDF("doc_id", "text")
      val got = graft.operators.SequencePacker
        .packPlan(df, "doc_id", col("text"), seqLen = 8, nShards = 3)
        .collect().map(r => (r.getLong(0), r.getAs[Long]("shard"),
          r.getAs[Long]("n_tokens"), r.getAs[Long]("start_off"),
          r.getAs[Long]("seq_first"), r.getAs[Long]("seq_last")))
      // local replay: per shard, docs in id order, running offset
      val byShard = got.groupBy(_._2)
      byShard.values.forall { rows =>
        val sorted = rows.sortBy(_._1)
        var off = 0L
        sorted.forall { case (_, _, nt, start, sf, sl) =>
          val ok = start == off && sf == start / 8 &&
            sl == (start + nt - 1) / 8 && nt > 0
          off += nt
          ok
        }
      } && got.forall(_._3 > 0) // zero-token docs excluded
    })
  }

  test("epoch mixing law: copy counts equal the local weight formula") {
    import spark.implicits._
    val docGen = Gen.listOfN(25, for {
      id <- Gen.choose(0L, 60L)
      lang <- Gen.oneOf("x", "y", "z")
    } yield (id, lang))
    val weights = Map("x" -> 170, "y" -> 60, "z" -> 0)
    check("mixing", Prop.forAll(docGen) { docs =>
      val d = docs.distinctBy(_._1)
      val df = d.toDF("doc_id", "lang")
      val got = graft.operators.Mixing
        .epochMix(df, "doc_id", "lang", weights)
        .groupBy("doc_id").count().collect()
        .map(r => r.getLong(0) -> r.getAs[Long]("count")).toMap
      d.forall { case (id, lang) =>
        val wp = weights(lang)
        val u = (id * 1103515245L + 12345L) % 1000000007L % 100L
        val expect = wp / 100 + (if (u < wp % 100) 1 else 0)
        got.getOrElse(id, 0L) == expect.toLong
      }
    })
  }

  test("connectedComponents law: equals local union-find on random graphs") {
    import spark.implicits._
    val graphGen: Gen[(List[Long], List[(Long, Long)])] = for {
      n <- Gen.choose(1, 14)
      nodes = (0L until n.toLong).toList
      m <- Gen.choose(0, 12)
      edges <- Gen.listOfN(m, for {
        a <- Gen.choose(0L, n - 1L); b <- Gen.choose(0L, n - 1L)
      } yield (a, b))
    } yield (nodes, edges.filter(e => e._1 != e._2))
    check("components", Prop.forAll(graphGen) { case (ns, es) =>
      // local union-find ground truth
      val parent = scala.collection.mutable.Map(ns.map(n => n -> n): _*)
      def find(x: Long): Long =
        if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
      es.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expect = ns.map(n => n -> find(n)).toMap
      val got =
        if (es.isEmpty) // no pairs → everyone their own component
          graft.operators.Components.connectedComponents(
            ns.toDF("id"), "id",
            Seq.empty[(Long, Long)].toDF("a", "b"), "a", "b")
        else graft.operators.Components.connectedComponents(
          ns.toDF("id"), "id", es.toDF("a", "b"), "a", "b")
      got.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap == expect
    })
  }

  test("sessionize law: equals local gap scan on random event streams") {
    import spark.implicits._
    val evGen: Gen[List[(Long, Long, Long)]] = for {
      n <- Gen.choose(1, 30)
      evs <- Gen.listOfN(n, for {
        u <- Gen.choose(1L, 3L)
        ms <- Gen.choose(0L, 5000L) // millisecond-aligned (Timestamp ctor)
      } yield (u, ms * 1000))
    } yield evs.zipWithIndex.map { case ((u, us), i) => (i.toLong, u, us) }
    val gap = 700L * 1000 // 700 ms in micros
    check("sessionize", Prop.forAll(evGen) { evs =>
      val df = evs.map { case (e, u, us) =>
        (e, u, new java.sql.Timestamp(us / 1000), 1.0) }
        .toDF("event_id", "user_id", "ts", "value")
      val got = graft.operators.Sessionize
        .sessions(df, "user_id", "ts", gap, col("event_id"), col("value"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) ->
          (r.getAs[Long]("session_start_us"), r.getAs[Long]("session_end_us"),
            r.getAs[Long]("n_events"))).toMap
      // local reference: sort by (ts, event_id), split on gap > threshold
      val expect = evs.groupBy(_._2).flatMap { case (u, es) =>
        val sorted = es.sortBy(e => (e._3, e._1))
        val sessions = sorted.foldLeft(List.empty[List[(Long, Long, Long)]]) {
          case (acc, e) => acc match {
            case cur :: rest if e._3 - cur.head._3 <= gap =>
              (e :: cur) :: rest // cur.head is the session's LAST event
            case _ => List(e) :: acc
          }
        }.reverse
        sessions.zipWithIndex.map { case (ses, i) =>
          (u, (i + 1).toLong) ->
            (ses.map(_._3).min, ses.map(_._3).max, ses.size.toLong)
        }
      }
      got == expect
    })
  }

  test("saltedJoin returns exactly the plain join result") {
    import spark.implicits._
    check("salt", Prop.forAll(rowsGen, rowsGen, Gen.choose(1, 8)) {
      (l, r, salt) =>
        val left = l.toDF("k", "lv", "lp")
        val right = r.map(t => (t._1, t._2)).distinct.toDF("k", "rv")
        val plain = left.join(right, Seq("k")).collect()
          .map(_.toString).sorted.toSeq
        val salted = RangeJoin.saltedJoin(left, right, Seq("k"), salt)
          .collect().map(_.toString).sorted.toSeq
        salted == plain
    })
  }

  test("skyline law: frontier2d equals brute-force dominance filter") {
    import spark.implicits._
    val ptsGen: Gen[List[(Int, Int, Int)]] =
      Gen.listOfN(35, for {
        id <- Gen.choose(0, 1000000)
        x <- Gen.choose(0, 8) // small domains force ties on both axes
        y <- Gen.choose(0, 8)
      } yield (id, x, y))
    check("skyline", Prop.forAll(ptsGen) { pts =>
      val df = pts.toDF("id", "x", "y")
      val got = graft.operators.Skyline.frontier2d(df, "x", "y")
        .select("id", "x", "y").as[(Int, Int, Int)]
        .collect().sorted.toSeq
      val want = pts.filter { case (_, x, y) =>
        !pts.exists { case (_, qx, qy) =>
          qx <= x && qy <= y && (qx < x || qy < y)
        }
      }.sorted
      got == want
    })
  }

  test("setsim law: prefix-filtered jaccardJoin equals brute force") {
    import spark.implicits._
    val setsGen: Gen[List[(Int, Int)]] =
      Gen.listOfN(60, for {
        k <- Gen.choose(0, 9) // ~10 sets
        tok <- Gen.choose(0, 24) // sparse AND dense overlaps arise
      } yield (k, tok))
    check("setsim", Prop.forAll(setsGen, Gen.choose(1, 4)) { (rows, tn) =>
      val td = 5
      val df = rows.toDF("k", "tok")
      // pin BOTH physical paths (prefix-filtered and index count join)
      // against brute force, at thresholds on both sides of the auto
      // crossover
      val Seq(got, gotIdx) = Seq("prefix", "index").map { strat =>
        graft.operators.SetSimJoin
          .jaccardJoin(df, "k", "tok", tn, td, strategy = strat)
          .select("k1", "k2", "inter").as[(Int, Int, Long)]
          .collect().sorted.toSeq
      }
      val sets = rows.groupBy(_._1).map { case (k, v) =>
        k -> v.map(_._2).toSet
      }
      val want = (for {
        (k1, a) <- sets; (k2, b) <- sets if k1 < k2
        inter = (a & b).size
        if td * inter >= tn * (a.size + b.size - inter)
      } yield (k1, k2, inter.toLong)).toSeq.sorted
      got == want && gotIdx == want
    })
  }
}
