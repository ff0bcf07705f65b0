package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.{col, split}
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import scala.jdk.CollectionConverters._

import graft.validate.Validator

/** Property-based invariants over generated occurrence tables
  * (SURVEY.md §5.2 item 4):
  *  - vocabulary arithmetic: recognised + unrecognised + nulls == record_count
  *    (the reference's derivation at validate.py:313);
  *  - coordinate counts: invalid = populated − valid ≥ 0 and bounded;
  *  - column_counts never exceed record_count;
  *  - reports are invariant under row permutation.
  *
  * Generators are driven with fixed seeds (no scalatestplus bridge in the
  * offline dependency set), so failures reproduce exactly.
  */
class PropertySpec extends AnyFunSuite {
  private def spark = TestSpark.spark

  private val vocabVal = Gen.oneOf(
    Some("HumanObservation"), Some("PreservedSpecimen"), Some("GIBBERISH"),
    Some("nonsense"), None)
  private val coordVal = Gen.oneOf(
    Some("40.5"), Some("-91.2"), Some("91"), Some("-90"), Some("banana"),
    None, Some("179.9"), Some("181"))

  private val tableGen: Gen[List[(Option[String], Option[String], Option[String])]] =
    Gen.listOfN(12, for {
      b <- vocabVal; lat <- coordVal; lon <- coordVal
    } yield (b, lat, lon))

  private def sample(seed: Long) =
    tableGen.apply(Gen.Parameters.default, Seed(seed)).get

  private val schema = StructType(Seq(
    StructField("basisOfRecord", StringType),
    StructField("decimalLatitude", StringType),
    StructField("decimalLongitude", StringType)))

  private def validate(rows: Seq[(Option[String], Option[String], Option[String])]) =
    Validator.validateOccurrence(spark.createDataFrame(
      rows.map { case (b, la, lo) => Row(b.orNull, la.orNull, lo.orNull) }.asJava,
      schema))

  test("vocab arithmetic + coordinate bounds + column_counts bounds hold on generated tables") {
    (1L to 15L).foreach { seed =>
      val r = validate(sample(seed))
      val n = r.record_count
      r.vocabReports.filter(_.has_field).foreach { v =>
        val nulls = n - r.column_counts(v.field)
        assert(v.recognised_count + v.unrecognised_count + nulls == n,
          s"seed=$seed vocab arithmetic")
        assert(v.non_matching_values.size <= 10)
      }
      val c = r.coordinates_report.get
      assert(c.invalid_decimal_latitude_count >= 0)
      assert(c.invalid_decimal_longitude_count >= 0)
      assert(c.invalid_decimal_latitude_count <= r.column_counts("decimalLatitude"))
      r.column_counts.values.foreach(v => assert(v >= 0 && v <= n))
    }
  }

  test("histogram driver collects stay bounded: high-cardinality year throws, topValues caps") {
    import org.apache.spark.sql.functions.{col, concat, lit}
    val n = 100000
    val wide = spark.range(n).select(col("id").cast("string").as("year"))
    // generate() must refuse, not silently truncate or OOM the driver
    val e = intercept[IllegalStateException](graft.validate.Breakdowns.generate(wide))
    assert(e.getMessage.contains("HistogramMaxGroups"), e.getMessage)
    // topValues is the documented scale path: bounded output regardless of
    // input cardinality
    val topDf = spark.range(n)
      .select(concat(lit("sp_"), col("id").cast("string")).as("scientificName"))
    val top = graft.validate.Breakdowns.topValues(topDf, "scientificName", 20)
    assert(top.size == 20)
  }

  test("hash split + stratified sample are invariant to input order and partitioning") {
    import org.apache.spark.sql.functions.col
    val docs = graft.ops.Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "lang", "n_chars", "text")
    def splits(df: org.apache.spark.sql.DataFrame) =
      graft.ops.Pipeline.hashSplit(df).select("doc_id", "split")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // reversed order, different partitioning — identical assignment
    assert(splits(docs) == splits(docs.orderBy(col("doc_id").desc).repartition(7)))
    def sample(df: org.apache.spark.sql.DataFrame) =
      graft.ops.Pipeline.stratifiedSample(df, "lang", 5)
        .select("lang", "rnk", "doc_id")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(sample(docs) == sample(docs.orderBy(col("n_chars")).repartition(3)))
  }

  test("tfidf, funnel, and corpusKeep are invariant to input order and partitioning") {
    import org.apache.spark.sql.functions.col
    val docs = graft.ops.Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "lang", "n_chars", "text")
    def tfidf(df: org.apache.spark.sql.DataFrame) =
      graft.ops.TextAnalysis.tfidfTopTerms(df)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(tfidf(docs) == tfidf(docs.orderBy(col("text")).repartition(7)))
    def keep(df: org.apache.spark.sql.DataFrame) =
      graft.ops.Dedup.corpusKeep(df).select("doc_id")
        .collect().map(_.getLong(0)).toSet
    assert(keep(docs) == keep(docs.orderBy(col("doc_id").desc).repartition(3)))
    val ev = graft.ops.Tables.events(spark, "/root/testdata/sf0.001")
    def fun(df: org.apache.spark.sql.DataFrame) =
      graft.ops.Events.funnel(df).collect().head.toSeq
    assert(fun(ev) == fun(ev.orderBy(col("ts").desc).repartition(5)))
  }

  test("cluster closure equals in-memory union-find on random edge sets") {
    val ss = TestSpark.spark
    import ss.implicits._
    val edgeGen = Gen.listOfN(40, for {
      a <- Gen.choose(0L, 24L); b <- Gen.choose(0L, 24L) if a != b
    } yield (math.min(a, b), math.max(a, b)))
    (1L to 5L).foreach { seed =>
      val edges = edgeGen.apply(Gen.Parameters.default, Seed(seed)).get.distinct
      // reference: classic union-find with path compression
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = edges.flatMap(e => Seq(e._1, e._2)).distinct
        .map(n => n -> find(n)).toMap
      val got = graft.ops.Dedup.clusters(edges.toDF("doc_a", "doc_b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected, s"seed=$seed edges=$edges")
    }
  }

  test("asofJoin equals the per-row latest-preceding reference on random event sets") {
    val ss = TestSpark.spark
    import ss.implicits._
    val evGen = Gen.listOfN(60, for {
      user <- Gen.choose(1L, 4L)
      t <- Gen.choose(0L, 50L)
      purchase <- Gen.oneOf(true, false)
    } yield (user, t, purchase))
    (1L to 3L).foreach { seed =>
      val raw = evGen.apply(Gen.Parameters.default, Seed(seed)).get
        .zipWithIndex.map { case ((u, t, p), i) => (i.toLong, u, t, p, i * 1.5) }
      val df = raw.toDF("event_id", "user_id", "t", "is_purchase", "value")
      val right = df.filter(org.apache.spark.sql.functions.col("is_purchase"))
      val got = graft.ops.ScaleOps.asofJoin(df, right, key = Seq("user_id"),
        time = "t", tieBreak = "event_id", rightVals = Seq("value"))
        .collect().map(r => r.getAs[Long]("event_id") ->
          Option(r.getAs[Any]("asof_value"))).toMap
      // reference: latest purchase with pt <= t (right rows at equal time
      // sort before every left row of that time — inclusive semantics),
      // ties at equal pt broken by max event_id
      val expected = raw.map { case (id, u, t, _, _) =>
        val prior = raw.filter { case (_, pu, pt, pp, _) => pp && pu == u && pt <= t }
        id -> prior.sortBy(p => (p._3, p._1)).lastOption.map(_._5)
      }.toMap
      assert(got == expected, s"seed=$seed")
    }
  }

  test("report is invariant under row permutation") {
    (1L to 5L).foreach { seed =>
      val rows = sample(seed)
      val a = validate(rows)
      val b = validate(new scala.util.Random(seed).shuffle(rows))
      assert(a == b, s"seed=$seed")
    }
  }

  test("pagerank conserves mass and matches a driver-side reference on random graphs") {
    val ss = TestSpark.spark
    import ss.implicits._
    val edgeGen = Gen.listOfN(25, for {
      a <- Gen.choose(1L, 12L); b <- Gen.choose(1L, 12L) if a != b
    } yield (math.min(a, b), math.max(a, b)))
    (1L to 3L).foreach { seed =>
      val edges = edgeGen.apply(Gen.Parameters.default, Seed(seed)).get.distinct
      val got = graft.ops.Graph.pagerank(edges.toDF("src", "dst"), iters = 3)
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      // driver-side reference of the same FIXED-POINT damped iteration —
      // pure integer arithmetic, compared EXACTLY (the engine spec is
      // deterministic, so the test demands bit equality, not tolerance)
      val sym = edges.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      val deg = sym.groupBy(_._1).view.mapValues(_.size.toLong).toMap
      val n = deg.size.toLong
      var pr = deg.keys.map(_ -> graft.ops.Graph.PrScale / n).toMap
      (1 to 3).foreach { _ =>
        val mass = sym.groupBy(_._2).view.mapValues(
          _.map { case (srcN, _) => pr(srcN) / deg(srcN) }.sum).toMap
        pr = pr.keys.map(k =>
          k -> (graft.ops.Graph.PrScale / 100 * 15 / n + 85 * mass(k) / 100)).toMap
      }
      val expected = pr.view.mapValues(_ * n).toMap
      assert(got.keySet == expected.keySet, s"seed=$seed")
      got.foreach { case (k, v) =>
        assert(v == expected(k), s"seed=$seed node=$k $v vs ${expected(k)}")
      }
      // mass conserved up to the documented < in-degree × 1e-12 floor loss
      assert(math.abs(got.values.sum.toDouble / n / 1e12 - 1.0) < 1e-9, s"seed=$seed mass")
    }
  }

  test("weighted-sample is bit-stable across runs with per-stratum volumes " +
    "near the rarest-stratum target") {
    // NOTE: membership is a pure function of (doc_id, own-stratum rate),
    // but the rate itself is corpus-global (min over ALL strata), so
    // sampling per-stratum sub-corpora independently would NOT compose —
    // each sub-corpus would keep everything. What IS guaranteed, and
    // checked here: rerun determinism and the target volume envelope.
    val ss = TestSpark.spark
    import ss.implicits._
    (1L to 3L).foreach { seed =>
      val rng = new scala.util.Random(seed)
      val docs = (1L to 120L).map(i => (i, if (rng.nextBoolean()) "en" else "de"))
      val df = docs.toDF("doc_id", "lang")
      // drive THE production operator (repo rule: tests never reimplement)
      def sample(d: org.apache.spark.sql.DataFrame) =
        graft.ops.Pipeline.weightedUniformSample(d)
          .select(org.apache.spark.sql.functions.col("lang"),
            org.apache.spark.sql.functions.col("doc_id"))
      val all = sample(df).collect().map(r => (r.getString(0), r.getLong(1))).toSet
      // rerunning on the same frame is bit-stable
      val again = sample(df).collect().map(r => (r.getString(0), r.getLong(1))).toSet
      assert(all == again, s"seed=$seed determinism")
      // per-lang sampled fraction lands near mn/n (hash uniformity sanity)
      val counts = docs.groupBy(_._2).view.mapValues(_.size).toMap
      val mn = counts.values.min
      counts.foreach { case (lang, n) =>
        val kept = all.count(_._1 == lang)
        assert(kept <= n && kept >= 0)
        assert(math.abs(kept - mn.toDouble * 1.0) <= math.max(8.0, 0.5 * mn),
          s"seed=$seed lang=$lang kept=$kept target=$mn")
      }
    }
  }

  test("bfsDepth equals driver-side BFS shortest hop counts on random graphs") {
    val ss = TestSpark.spark
    import ss.implicits._
    val edgeGen = Gen.listOfN(30, for {
      a <- Gen.choose(0L, 19L); b <- Gen.choose(0L, 19L) if a != b
    } yield (a, b))
    (1L to 5L).foreach { seed =>
      val edges = edgeGen.apply(Gen.Parameters.default, Seed(seed)).get.distinct
      val seeds = edges.flatMap(e => Seq(e._1, e._2)).distinct.filter(_ % 5 == 0)
      // reference: plain queue BFS over the symmetrized adjacency
      val adj = (edges ++ edges.map(e => (e._2, e._1)))
        .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
      val dist = scala.collection.mutable.Map[Long, Long](seeds.map(_ -> 0L): _*)
      var frontier = seeds
      for (d <- 1L to 3L) {
        frontier = frontier.flatMap(n => adj.getOrElse(n, Nil))
          .distinct.filterNot(dist.contains)
        frontier.foreach(n => dist(n) = d)
      }
      val got = graft.ops.Graph.bfsDepth(edges.toDF("src", "dst"),
        seeds.toDF("node"), rounds = 3)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == dist.toMap, s"seed=$seed edges=$edges seeds=$seeds")
    }
  }

  test("phash Hamming distance is monotone-ish in edit count and zero on copies") {
    val ss = TestSpark.spark
    import ss.implicits._
    def docs(rows: (Long, String)*) = rows.toSeq.toDF("doc_id", "text")
    val base = (0 until 60).map(i => s"tok$i")
    def edited(k: Int): String =
      base.zipWithIndex.map { case (t, i) => if (i < k) s"ED$i" else t }.mkString(" ")
    // distance to the unedited doc after k block edits, computed via the
    // public phash60 column (no band/cut so large distances stay visible)
    val frame = docs((0L -> base.mkString(" ")) +: (1 to 5).map(k =>
      (k.toLong, edited(k * 6))): _*)
      .select(col("doc_id"),
        graft.ops.Multimodal.phash60(split(col("text"), " ")).as("ph"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(frame(0L), frame(0L)) == 0)
    val dists = (1 to 5).map(k => ham(frame(0L), frame(k.toLong)))
    // each step edits 6 more of the 60 blocks → expected ~half of the
    // touched bits flip; require broad monotone growth, not exact counts
    assert(dists.head <= dists.last, s"dists=$dists")
    assert(dists.last >= 10, s"5×6 block edits should flip many bits: $dists")
    assert(dists.head <= 8, s"6 block edits should flip few bits: $dists")
  }

  test("normalize_scrub equals the builtin regex chain it fused (adversarial strings)") {
    import org.apache.spark.sql.functions._
    // the exact chain text_normalize_scrub ran before r14 — kept here as
    // the semantic pin the native expression must match forever
    val norm = trim(regexp_replace(
      regexp_replace(lower(col("text")), "[0-9]+", "0"), "\\s+", " "))
    val adversarial = Seq(
      "", " ", "\t\n\f\r", "007", "a1b22c333d", "  12  34  ",
      "MIXED Case 42Text", "0", "tab\tsep\nnl", "trailing 99 ",
      " leading", "unicode Ä 12 ß 3", "no digits here", "1 2 3 4 5",
      "a" * 300 + "9" * 5 + " end", "real\u00A0nbsp is not java ws 7",
      "vertical\u000Btab is java ws 8",
      "multi   spaces\t\tand\r\nCRLF 10x20")
    val df = spark.createDataFrame(
      adversarial.zipWithIndex.map { case (t, i) => Row(i.toLong, t) }.asJava,
      StructType(Seq(StructField("id", org.apache.spark.sql.types.LongType),
        StructField("text", StringType))))
    import graft.functions.NormalizeScrub.normalizeScrub
    val rows = df.select(col("id"),
      expr("size(regexp_extract_all(text, '[0-9]+', 0))").cast("long").as("runs_re"),
      norm.as("norm_re"),
      normalizeScrub(col("text")).as("ns"))
      .select(col("id"), col("runs_re"), col("norm_re"),
        col("ns.n_digit_runs").as("runs_ns"), col("ns.norm").as("norm_ns"))
      .collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("runs_re") == r.getAs[Long]("runs_ns"),
        s"digit runs diverge on ${adversarial(r.getAs[Long]("id").toInt)}: $r")
      assert(r.getAs[String]("norm_re") == r.getAs[String]("norm_ns"),
        s"norm diverges on ${adversarial(r.getAs[Long]("id").toInt)}: $r")
    }
  }

  test("bpe_token_counts equals the regex-materializing chain it fused (adversarial strings)") {
    import org.apache.spark.sql.functions._
    // the exact expressions text_token_bpe ran before r15 — the semantic
    // pin the single-pass byte scanner must match forever, on inputs
    // chosen to stress run boundaries, code-point width, and the empty
    // cases: multi-byte symbols (each ONE token at code-point
    // granularity), combining marks, surrogate-pair emoji, controls,
    // leading/trailing/consecutive spaces, and run alternations
    val adversarial = Seq(
      "", " ", "   ", "a", "1", "?", "a1", "1a", "a 1 ?", "abc123def",
      "a!b@c#d$", "tab\tnl\ncr\r", "é", "éé12éé", "αβγ 42 δ",
      "naïve café 7", "é combining", "😀 emoji 1",
      "ends with space ", " starts", "a  b   c", "123 456!789",
      "x" * 500 + "9" * 9 + "!" * 3, " nbsp7 ")
    val df = spark.createDataFrame(
      adversarial.zipWithIndex.map { case (t, i) => Row(i.toLong, t) }.asJava,
      StructType(Seq(StructField("id", org.apache.spark.sql.types.LongType),
        StructField("text", StringType))))
    import graft.functions.BpeTokenCounts.bpeTokenCounts
    val rows = df.select(col("id"),
      expr("size(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]', 0))")
        .cast("long").as("bpe_re"),
      expr("size(split(text, ' '))").cast("long").as("ws_re"),
      bpeTokenCounts(col("text")).as("tc"))
      .select(col("id"), col("bpe_re"), col("ws_re"),
        col("tc.n_bpe_tokens").as("bpe_ns"), col("tc.n_ws_tokens").as("ws_ns"))
      .collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("bpe_re") == r.getAs[Long]("bpe_ns"),
        s"bpe counts diverge on ${adversarial(r.getAs[Long]("id").toInt)}: $r")
      assert(r.getAs[Long]("ws_re") == r.getAs[Long]("ws_ns"),
        s"ws counts diverge on ${adversarial(r.getAs[Long]("id").toInt)}: $r")
    }
  }

  test("token_freq_stats equals the quadratic distinct×filter lambda it replaced") {
    import org.apache.spark.sql.functions._
    import graft.functions.TokenFreqStats.tokenFreqStats
    val gen = Gen.listOfN(40, Gen.oneOf("a", "b", "ab", "the", "x y", "", "z"))
    val arrays = (1L to 8L).map(seed =>
      gen.apply(Gen.Parameters.default, Seed(seed)).get) :+
      List("only") :+ List("t", "t", "t") :+
      List("a", null, "a", null, "b") :+ List(null, null)
    val df = spark.createDataFrame(
      arrays.zipWithIndex.map { case (a, i) => Row(i.toLong, a.toArray.toSeq) }.asJava,
      StructType(Seq(StructField("id", org.apache.spark.sql.types.LongType),
        StructField("bg", org.apache.spark.sql.types.ArrayType(StringType)))))
    val rows = df.select(col("id"),
      size(col("bg")).cast("long").as("n_q"),
      expr("size(array_distinct(bg))").cast("long").as("d_q"),
      expr("array_max(transform(array_distinct(bg), x -> size(filter(bg, y -> y = x))))")
        .cast("long").as("m_q"),
      tokenFreqStats(col("bg")).as("fs"))
      .collect()
    rows.foreach { r =>
      val fs = r.getStruct(r.fieldIndex("fs"))
      assert(r.getAs[Long]("n_q") == fs.getLong(0), r)
      assert(r.getAs[Long]("d_q") == fs.getLong(1), r)
      assert(r.getAs[Long]("m_q") == fs.getLong(2), r)
    }
  }
}
