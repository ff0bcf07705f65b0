package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.GraftQuery

/** Executable parity doctrine: the repo's cross-engine idioms (md5-60
  * hashing, integer `div`, cents rounding, floor-log2 via bin-length,
  * week offsets, 6-dp integer-derived ratios) are enforced by convention
  * in every oracle — this spec turns the convention into an INVARIANT by
  * fuzzing a seeded random frame through each idiom on BOTH engines
  * (Spark in-process, DuckDB via the driver-side python binding) and
  * asserting value-exact equality row by row.
  *
  * DuckDB is a driver-side tool, not a library dependency: the spec
  * shells out to `python3 -c "import duckdb; ..."` over the same parquet
  * file Spark reads, and CANCELS (not fails) where the binding is absent
  * so `sbt test` stays green on a bare JVM host.
  */
class CrossEngineFuzzSpec extends AnyFunSuite {
  private def spark = TestSpark.spark

  private lazy val duckdbAvailable: Boolean =
    try new ProcessBuilder("python3", "-c", "import duckdb").start().waitFor() == 0
    catch { case _: java.io.IOException => false }

  /** Seeded fuzz frame: non-negative BIGINTs (the doctrine's `div`/flog2
    * domain) with boundary values planted, a 1..9 divisor, a millis-grid
    * DOUBLE of both signs (cents-rounding half-boundaries land exactly),
    * random ASCII tokens, and ordered date pairs (week offsets are
    * non-negative by construction, like every cohort derivation).
    */
  private lazy val fuzzDir: String = {
    val rnd = new scala.util.Random(42)
    val dir = java.nio.file.Files.createTempDirectory("graft_fuzz").toString
    val boundary = Seq(0L, 1L, 2L, 3L, 7L, 8L, 255L, 256L,
      Int.MaxValue.toLong, (1L << 40) - 1, 1L << 40)
    val rows = (0 until 300).map { i =>
      val k = if (i < boundary.size) boundary(i)
        else rnd.nextLong(1L << 41)
      val b = 1L + rnd.nextInt(9)
      // grid of thousandths: x.xx5 values hit the round-half boundary
      val v = (rnd.nextInt(10000001) - 5000000) / 1000.0
      val s = (0 until (1 + rnd.nextInt(12)))
        .map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
      val base = java.time.LocalDate.of(2023, 1, 1).plusDays(rnd.nextInt(800))
      // UTC-pinned timestamp at a random second of `base`'s day — the
      // epoch-arithmetic idioms operate on the stored micros, so both
      // engines must see the identical int64 regardless of reader tz
      val ts = java.sql.Timestamp.from(base.atStartOfDay(java.time.ZoneOffset.UTC)
        .plusSeconds(rnd.nextInt(86400)).toInstant)
      (i.toLong, k, b, v, s, java.sql.Date.valueOf(base),
        java.sql.Date.valueOf(base.plusDays(rnd.nextInt(400))), ts)
    }
    val s = spark
    import s.implicits._
    rows.toDF("id", "k", "b", "v", "s", "d1", "d2", "ts")
      .coalesce(1).write.mode("overwrite").parquet(dir)
    dir
  }

  /** Runs `expr` (one scalar per row, ordered by id) in DuckDB over the
    * fuzz parquet and returns the values as strings.
    */
  private def duck(expr: String): Seq[String] = {
    val py =
      s"""import duckdb
         |for (x,) in duckdb.sql(
         |    "SELECT $expr FROM '$fuzzDir/*.parquet' ORDER BY id").fetchall():
         |    print(x)""".stripMargin
    val p = new ProcessBuilder("python3", "-c", py).redirectErrorStream(true).start()
    val out = new String(p.getInputStream.readAllBytes(), "UTF-8")
    require(p.waitFor() == 0, s"duckdb failed for [$expr]:\n${out.take(2000)}")
    out.linesIterator.toSeq
  }

  /** Asserts the Spark column equals the DuckDB expression on every fuzz
    * row. `double = true` compares IEEE values after exact round-trip
    * parsing (python repr and java toString both print shortest-exact).
    */
  private def parity(name: String, sparkCol: org.apache.spark.sql.Column,
      duckExpr: String, double: Boolean = false): Unit = {
    assume(duckdbAvailable, "python3 duckdb binding not present on this host")
    val sv = spark.read.parquet(fuzzDir).orderBy(col("id"))
      .select(sparkCol.as("x")).collect().map(r => r.get(0))
    val dv = duck(duckExpr)
    assert(sv.length == dv.length, s"$name: row counts differ")
    sv.zip(dv).zipWithIndex.foreach { case ((a, b), i) =>
      if (double)
        assert(a.asInstanceOf[Double] == b.toDouble, s"$name row $i: spark=$a duck=$b")
      else
        assert(a.toString == b, s"$name row $i: spark=$a duck=$b")
    }
  }

  test("h60 hash idiom: native md5hash60 == DuckDB hex-prefix cast, including mod buckets") {
    import graft.functions.Md5Hash60.md5hash60
    parity("h60", md5hash60(col("s")), GraftQuery.h60Sql("s"))
    parity("h60 mod", pmod(md5hash60(col("s")), lit(8L)),
      s"(${GraftQuery.h60Sql("s")}) % 8")
  }

  test("integer div idiom: Spark `div` == DuckDB `//` on the non-negative domain") {
    parity("div", expr("k div b"), "k // b")
    parity("div const", expr("k div 100000"), "k // 100000")
  }

  test("cents idiom: CAST(round(v * 100) AS BIGINT) agrees at half boundaries, both signs") {
    parity("cents", expr("CAST(round(v * 100) AS BIGINT)"),
      "CAST(round(v * 100) AS BIGINT)")
  }

  test("floor-log2 idiom: length(bin(k + 1)) - 1 agrees (no float log on either engine)") {
    parity("flog2", (length(bin(col("k") + 1)) - 1).cast("long"),
      "CAST(length(bin(k + 1)) - 1 AS BIGINT)")
  }

  test("week-offset idiom: datediff div 7 agrees on ordered date pairs") {
    parity("weeks", expr("datediff(d2, d1) div 7").cast("long"),
      "CAST(date_diff('day', d1, d2) // 7 AS BIGINT)")
  }

  test("6-dp ratio idiom: round on an integer-derived ratio agrees bit-for-bit IN DOMAIN") {
    // FUZZ-DISCOVERED BOUNDARY (seed 42, row 12): at |x| ≈ 3.5e11 the
    // 6-dp grid spacing (1e-6) falls below the double's ulp (~6e-5
    // there), 6-dp rounding becomes ill-defined, and the engines'
    // conventions diverge in the last digit. The idiom's PORTABLE DOMAIN
    // is |x| < ~2^31 (ulp < 5e-7) — every registered 6-dp ratio
    // (averages, shares, per-mille rates) lives far inside it. The
    // modulus below pins the domain; widening it re-finds the divergence.
    parity("ratio6", round((col("k") % lit(1L << 31)).cast("double") / col("b"), 6),
      s"round(CAST(k % ${1L << 31} AS DOUBLE) / b, 6)", double = true)
  }

  test("bigint-keyed hash idiom: cast-to-string + salt formats identically before md5") {
    // every hash split / arm assignment / shard key rides
    // h60(numeric_id::VARCHAR || ':salt') — parity requires the engines'
    // BIGINT→string renderings to agree byte-for-byte (no sign, width,
    // or scientific-notation surprises) before the digest ever runs
    import graft.functions.Md5Hash60.md5hash60
    parity("h60 bigint", md5hash60(concat(col("k").cast("string"), lit(":arrival"))),
      GraftQuery.h60Sql("k::VARCHAR || ':arrival'"))
    parity("h60 bigint mod", pmod(md5hash60(col("k").cast("string")), lit(100L)),
      s"(${GraftQuery.h60Sql("k::VARCHAR")}) % 100")
  }

  test("epoch-micros idiom: unix_micros buckets == epoch_us buckets off the stored int64") {
    // the events family derives seconds/hours from integer epoch
    // arithmetic precisely so no extract()/timezone surface exists —
    // pin that the stored parquet micros round-trip identically
    parity("epoch sec", expr("unix_micros(ts) div 1000000"),
      "epoch_us(ts) // 1000000")
    parity("epoch hour-of-day", expr("unix_micros(ts) div 3600000000 % 24"),
      "epoch_us(ts) // 3600000000 % 24")
  }

  test("token canonicalization idiom: split + sort + join agrees on ASCII token bags") {
    // dedup_exact_canonical's fingerprint shape: both engines must
    // byte-order ASCII tokens identically and rejoin with the same
    // separator; the crafted bag has a duplicate and a reversed token
    parity("canon", expr("array_join(array_sort(split(s || ' ' || reverse(s) || ' ' || s, ' ')), ' ')"),
      "array_to_string(list_sort(string_split(s || ' ' || reverse(s) || ' ' || s, ' ')), ' ')")
  }

  /** Runs a single-row aggregate `expr` in DuckDB over the fuzz parquet. */
  private def duckAgg(expr: String): String = {
    val py =
      s"""import duckdb
         |print(duckdb.sql("SELECT $expr FROM '$fuzzDir/*.parquet'").fetchone()[0])""".stripMargin
    val p = new ProcessBuilder("python3", "-c", py).redirectErrorStream(true).start()
    val out = new String(p.getInputStream.readAllBytes(), "UTF-8")
    require(p.waitFor() == 0, s"duckdb failed for [$expr]:\n${out.take(2000)}")
    out.trim
  }

  test("money-sum idiom: sum of exact integer cents + one division agrees, any order") {
    assume(duckdbAvailable, "python3 duckdb binding not present on this host")
    // the Money doctrine's SUM level (the q_salted_join sf1 fix): the
    // compared value is an exact integer sum followed by ONE division —
    // order-free by integer associativity, then a single correctly-
    // rounded IEEE op. Spark side deliberately runs under a shuffled
    // 7-partition repartition so its summation order differs from
    // DuckDB's sequential scan — parity must hold anyway.
    val sparkV = spark.read.parquet(fuzzDir).repartition(7)
      .agg((sum(expr("CAST(round(v * 100) AS BIGINT)")) / 100.0).as("x"))
      .head().getDouble(0)
    val duckV = duckAgg(
      "CAST(sum(CAST(round(v * 100) AS BIGINT)) AS BIGINT) / 100.0").toDouble
    assert(sparkV == duckV, s"spark=$sparkV duck=$duckV")
  }

  test("money-sum idiom: long→double conversion parity PAST 2^53 (sf100-class sums)") {
    assume(duckdbAvailable, "python3 duckdb binding not present on this host")
    // at sf100-class volumes a revenue-unit sum exceeds 2^53; the final
    // BIGINT → DOUBLE conversion then loses low bits — identically on
    // both engines (round-to-nearest-even in the JVM and in C++), so the
    // emitted double still hash-matches. k*1024 sums to ~3e17 > 2^53.
    val sparkV = spark.read.parquet(fuzzDir).repartition(7)
      .agg((sum(col("k") * 1024) / 10000.0).as("x")).head().getDouble(0)
    val duckV = duckAgg("CAST(sum(k * 1024) AS BIGINT) / 10000.0").toDouble
    assert(sparkV == duckV, s"spark=$sparkV duck=$duckV")
    // and the sum really is past 2^53 — otherwise this test pins nothing
    val total = spark.read.parquet(fuzzDir)
      .agg(sum(col("k") * 1024)).head().getLong(0)
    assert(total > (1L << 53), s"fuzz sum $total no longer exceeds 2^53")
  }
}
