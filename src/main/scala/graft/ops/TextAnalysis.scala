package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import Tables._

/** Text-analysis operators over the `documents` table: token statistics,
  * quality scoring, language identification, and content fingerprinting.
  *
  * Everything is per-row scalar work (codegen'd built-ins — split, filter,
  * regexp_extract_all, md5) followed by at most one bounded aggregation, so
  * the plans are embarrassingly parallel scans at any scale: no shuffle at
  * all for the per-document queries.
  *
  * Ratios divide two exactly-computed integers per row, so the doubles are
  * bit-identical across engines; `round(..., 6)` guards the residue.
  */
object TextAnalysis {

  /** Stopword profiles for the frequency-based language scorer. On real
    * corpora these separate languages sharply; the synthetic testdata shares
    * one vocabulary across langs, so the scorer mostly exercises plumbing.
    */
  val Profiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein"),
    "es" -> Seq("el", "la", "de", "que", "y", "los", "un"),
    "fr" -> Seq("le", "les", "et", "des", "une", "du", "est"))

  private def inList(vals: Seq[String]): String =
    vals.map(v => s"x = '$v'").mkString(" OR ")

  /** Spark-side: tokens-in-profile count (codegen'd higher-order filter). */
  private def profileCountExpr(vals: Seq[String]): String =
    s"size(filter(split(text, ' '), x -> ${inList(vals)}))"

  private def profileCountSql(vals: Seq[String]): String =
    s"len(list_filter(string_split(text, ' '), x -> ${inList(vals)}))"

  /** Symbol-wrapper delimiter for [[bpeTrain]]'s string encoding (chr(1):
    * absent from [a-z]+ words by construction).
    */
  private val BpeD = "\u0001"

  /** BPE vocabulary trainer: `rounds` iterations of the classic merge loop
    * (count adjacent symbol pairs → adopt the most frequent pair as a new
    * symbol → re-segment), returning the learned merge table
    * (round, lhs, rhs, pair_count) — the artifact a tokenizer build ships.
    *
    * Distributed shape: the working set is the DISTINCT-WORD relation
    * (symbol-sequence, corpus frequency) — the standard trainer reduction,
    * which caps state at the corpus vocabulary regardless of corpus size —
    * and each round is ONE pair-count shuffle plus a 1-row top-pair
    * collect (a scalar crossing to the driver, same discipline as the
    * k-means codebook in [[graft.ops.Similarity]]), with a per-round
    * localCheckpoint truncating lineage exactly like [[Graph.pagerank]].
    *
    * The re-segmentation trick: a word's symbol sequence is encoded as a
    * single string with every symbol wrapped in chr(1) delimiters
    * ("ab","c" → ␁ab␁␁c␁), so merging pair (a,b) is a LITERAL
    * `replace(ws, ␁a␁␁b␁ → ␁ab␁)` — string replace scans left-to-right
    * over non-overlapping occurrences, which is precisely BPE's greedy
    * merge order ([a,a,a] → [aa,a]), and the per-symbol double delimiter
    * keeps adjacent merge sites independent ([a,b,a,b] merges both). Both
    * engines share these replace semantics, so the oracle replays the
    * same rounds as unrolled CTEs. Ties on pair count break
    * deterministically by (lhs, rhs) ascending on both sides.
    */
  def bpeTrain(docs: DataFrame, rounds: Int = 8): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    bpeTrainMerges(docs, rounds).toDF("round", "lhs", "rhs", "pair_count")
  }

  /** The merge list behind [[bpeTrain]], for callers that APPLY the learned
    * merges ([[bpeEncode]]) rather than ship the table.
    */
  def bpeTrainMerges(docs: DataFrame, rounds: Int = 8): Seq[(Long, String, String, Long)] = {
    var words = docs
      .select(explode(expr("regexp_extract_all(lower(text), '[a-z]+', 0)")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .select(regexp_replace(col("w"), lit("(.)"), lit(BpeD + "$1" + BpeD)).as("ws"),
        col("cnt"))
      .localCheckpoint(true)
    val merges = Seq.newBuilder[(Long, String, String, Long)]
    var r = 1
    var exhausted = false
    while (r <= rounds && !exhausted) {
      val top = words
        .select(col("cnt"), split(btrim(col("ws"), lit(BpeD)), BpeD + BpeD).as("syms"))
        .select(col("cnt"),
          explode(arrays_zip(col("syms"),
            slice(col("syms"), lit(2), greatest(size(col("syms")) - 1, lit(0)))
              .as("nxt"))).as("p"))
        .filter(col("p.nxt").isNotNull)
        .groupBy(col("p.syms").as("a"), col("p.nxt").as("b"))
        .agg(sum(col("cnt")).as("pc"))
        .orderBy(desc("pc"), asc("a"), asc("b"))
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (a, b, pc) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((r.toLong, a, b, pc))
        words = words
          .select(replace(col("ws"), lit(BpeD + a + BpeD + BpeD + b + BpeD),
            lit(BpeD + a + b + BpeD)).as("ws"), col("cnt"))
          .localCheckpoint(true)
        r += 1
      }
    }
    merges.result()
  }

  /** Tokenize the corpus with a learned merge list: per word, the same
    * wrapped-string encoding as the trainer, then the merges applied as a
    * CHAIN OF LITERAL replace()s — `rounds` codegen'd string ops fused
    * into the scan, no joins, no shuffle until the per-doc count. Symbol
    * count falls out of the encoding arithmetically (delimiters/2), so
    * re-splitting isn't needed. Returns (doc_id, n_words, n_tokens).
    */
  def bpeEncode(docs: DataFrame, merges: Seq[(String, String)]): DataFrame = {
    val ws = merges.foldLeft(
      regexp_replace(col("w"), lit("(.)"), lit(BpeD + "$1" + BpeD))) {
      case (acc, (a, b)) =>
        replace(acc, lit(BpeD + a + BpeD + BpeD + b + BpeD), lit(BpeD + a + b + BpeD))
    }
    docs
      .select(col("doc_id"),
        explode(expr("regexp_extract_all(lower(text), '[a-z]+', 0)")).as("w"))
      .select(col("doc_id"),
        ((length(ws) - length(replace(ws, lit(BpeD), lit("")))) / lit(2))
          .cast("long").as("n_sym"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"), sum(col("n_sym")).as("n_tokens"))
      .orderBy(col("doc_id"))
  }

  /** The [[bpeTrain]] oracle: `rounds` unrolled CTE rounds of the same
    * pair-count → top-1 → replace loop (DuckDB's `replace`/`list_zip`
    * /`regexp_replace` mirror the engine semantics; see bpeTrain's doc).
    */
  /** The shared trainer CTE chain (w0 … w`rounds`, with per-round pair
    * counts p_k and adopted merges t_k), used by both oracle builders.
    */
  private def bpeCtesSql(rounds: Int): String = {
    val perRound = (1 to rounds).map { k =>
      s"""p$k AS (
         |  SELECT z[1] AS a, z[2] AS b, CAST(sum(cnt) AS BIGINT) AS pc FROM (
         |    SELECT cnt, unnest(list_zip(syms, syms[2:])) AS z FROM (
         |      SELECT cnt, str_split(trim(ws, chr(1)), chr(1)||chr(1)) AS syms
         |      FROM w${k - 1}))
         |  WHERE z[2] IS NOT NULL GROUP BY 1, 2),
         |t$k AS (SELECT a, b, pc FROM p$k ORDER BY pc DESC, a, b LIMIT 1),
         |w$k AS (
         |  SELECT replace(ws, chr(1)||a||chr(1)||chr(1)||b||chr(1),
         |                 chr(1)||a||b||chr(1)) AS ws, cnt
         |  FROM w${k - 1} CROSS JOIN t$k)""".stripMargin
    }.mkString(",\n")
    s"""wcnt AS (
       |  SELECT w, count(*) AS cnt FROM (
       |    SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
       |    FROM documents) GROUP BY w),
       |w0 AS (
       |  SELECT regexp_replace(w, '(.)', chr(1)||'\\1'||chr(1), 'g') AS ws, cnt
       |  FROM wcnt),
       |$perRound""".stripMargin
  }

  private[ops] def bpeTrainOracleSql(rounds: Int): String = {
    val emit = (1 to rounds)
      .map(k => s"SELECT CAST($k AS BIGINT) AS round, a AS lhs, b AS rhs, pc AS pair_count FROM t$k")
      .mkString("\nUNION ALL ")
    s"""WITH ${bpeCtesSql(rounds)}
       |$emit
       |ORDER BY round""".stripMargin
  }

  /** The [[bpeEncode]] oracle: the trainer CTEs feed the learned merges
    * back in as scalar subqueries, applied as the same nested literal
    * replace chain over every word of every document.
    */
  private[ops] def bpeEncodeOracleSql(rounds: Int): String = {
    // coalesce('') guards merge exhaustion: on a corpus whose pairs run
    // out before `rounds`, t_k is EMPTY, the scalar subquery is NULL, and
    // a bare replace(ws, NULL, NULL) would NULL-poison every document.
    // With '' the pattern degenerates to four consecutive chr(1)s, which
    // no wrapped string contains (delimiter runs are length ≤ 2), so the
    // exhausted rounds are no-ops — matching the engine, which applies
    // only the merges actually learned.
    val chain = (1 to rounds).foldLeft("ws0") { (acc, k) =>
      s"""replace($acc,
         |  chr(1)||coalesce((SELECT a FROM t$k), '')||chr(1)||chr(1)||coalesce((SELECT b FROM t$k), '')||chr(1),
         |  chr(1)||coalesce((SELECT a FROM t$k), '')||coalesce((SELECT b FROM t$k), '')||chr(1))""".stripMargin
    }
    s"""WITH ${bpeCtesSql(rounds)},
       |docw AS (
       |  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
       |  FROM documents),
       |enc AS (
       |  SELECT doc_id, $chain AS ws FROM (
       |    SELECT doc_id, regexp_replace(w, '(.)', chr(1)||'\\1'||chr(1), 'g') AS ws0
       |    FROM docw))
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
       |  CAST(sum((len(ws) - len(replace(ws, chr(1), ''))) // 2) AS BIGINT) AS n_tokens
       |FROM enc GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  /** TF-IDF top-`k` terms per document over a (doc_id, text) frame.
    * Powers the `text_tfidf_top_terms` query AND is callable directly (the
    * unit tests drive THIS function). Tokenize once; ONE shuffle for
    * per-(doc, term) counts, ONE for document frequency; corpus size joins
    * in as a broadcast single-row frame; top-k per doc is the BOUNDED
    * slice∘array_sort∘collect_list aggregation — never a corpus-wide
    * ranked window. Ranking compares the ROUNDED score (ties on the term)
    * so cross-engine float residue cannot reorder.
    */
  def tfidfTopTerms(docs: DataFrame, k: Int = 3): DataFrame = {
    val toks = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
    val tf = toks.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    // document frequency FROM tf: tf already holds exactly one row per
    // distinct (doc, term), so df = its per-term row count — aggregating
    // the (small) tf frame replaces a second explode + corpus-wide
    // distinct shuffle of the raw token stream
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val ndocs = broadcast(docs.agg(count(lit(1)).as("n")))
    val scored = tf.join(dfreq, Seq("term")).crossJoin(ndocs)
      .select(col("doc_id"), col("term"),
        round(col("tf") * log(col("n").cast("double") / col("df")), 6).as("tfidf"))
    scored.groupBy(col("doc_id"))
      .agg(expr(
        s"slice(array_sort(collect_list(struct(-tfidf AS ns, term, tfidf))), 1, $k)")
        .as("__top"))
      .select(col("doc_id"), explode(col("__top")).as("t"))
      .select(col("doc_id"), col("t.term").as("term"), col("t.tfidf").as("tfidf"))
      .orderBy(col("doc_id"), col("term"))
  }

  /** BM25 top-k retrieval (Okapi with Lucene's `ln(1 + …)` idf, so every
    * score is positive) for a bounded query set derived from the corpus
    * itself: the 6 highest-document-frequency terms paired into 3 two-term
    * queries (rank by df DESC with term tie-break, qid = pair index).
    *
    * Scale shape: tokenize once; ONE shuffle for per-(doc, term) counts;
    * df aggregated FROM the tf frame (the tfidf discipline — no second
    * corpus-wide distinct); corpus stats (N, Σdl) ride a broadcast 1-row
    * frame and the 6-term query set a broadcast probe frame, so the tf
    * stream shrinks to query-term postings BEFORE the doc-length join.
    * The per-query top-k is the bounded-heap [[graft.functions.ExactTopKLong]]
    * aggregate over a composite integer key (score_micro · 2³³ + inverted
    * doc_id — exact while doc_id < 2³³ and score < ~9.4e8 micro-units,
    * both orders of magnitude above this corpus), NOT a ranked window: a
    * window's per-query full sort is exactly what a 100 TB retrieval
    * fan-out cannot afford, while the heap ships k rows per partition.
    *
    * Parity: scores stay floating only INSIDE one fixed expression tree
    * (identical associativity on the DuckDB side; the 2-term sum is
    * commutative so partial-agg order cannot perturb it) and are fixed to
    * integer micro-units by `round(sum(c) * 1000000)` before any ranking
    * or output — the hash gate sees only BIGINTs.
    */
  def bm25TopK(docs: DataFrame, k: Int = 10): DataFrame = {
    val toks = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
    val tf = toks.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    // 3 two-term queries from the top-6 df terms: TakeOrdered pulls the
    // bounded head, then a 6-ROW single-partition window assigns qid — a
    // bounded frame, same class as the whitelisted 1-row crossJoins.
    val queryTerms = dfreq.orderBy(col("df").desc, col("term")).limit(6)
      .withColumn("qid", expr("CAST((row_number() OVER (ORDER BY df DESC, term) - 1) div 2 AS BIGINT)"))
    val dl = docs.select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("dl"))
    val tot = broadcast(dl.agg(sum(col("dl")).cast("long").as("sum_dl"),
      count(lit(1)).as("n_docs")))
    val comp = tf.join(broadcast(queryTerms), Seq("term"))
      .join(dl, Seq("doc_id"))
      .crossJoin(tot)
      .select(col("qid"), col("doc_id"),
        (log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))) *
          (col("tf") * lit(2.2)) /
          (col("tf") + lit(1.2) * (lit(1.0) - lit(0.75) + lit(0.75) *
            col("dl").cast("double") / (col("sum_dl").cast("double") / col("n_docs")))))
          .as("c"))
    val S = 1L << 33
    comp.groupBy(col("qid"), col("doc_id"))
      .agg(expr("CAST(round(sum(c) * 1000000) AS BIGINT)").as("score_micro"))
      .select(col("qid"),
        (col("score_micro") * lit(S) + (lit(S - 1) - col("doc_id"))).as("v"))
      .groupBy(col("qid"))
      .agg(graft.functions.ExactTopK.exactTopKLong(col("v"), k).as("top"))
      .select(col("qid"), posexplode(col("top")).as(Seq("i", "v")))
      .select(col("qid"), (col("i") + 1).cast("long").as("rk"),
        (lit(S - 1) - (col("v") % lit(S))).as("doc_id"),
        expr("shiftright(v, 33)").as("score_micro"))
      .orderBy(col("qid"), col("rk"))
  }

  /** Top-k adjacent-pair collocations ranked by lift
    * c_xy·N / (c_x·c_y) — PMI without the log (log is monotone, so the
    * ranking is identical and no cross-engine log() FP hazard exists).
    * All products are exact BIGINTs < 2^53, so the single IEEE division
    * and the DESC sort on it are bit-identical across engines; ties
    * break on the bigram text. Two count shuffles (unigram, bigram) +
    * two vocab-sized equi-joins; the 1-row token total broadcasts.
    */
  def pmiPairs(docs: DataFrame, minCount: Int, topK: Int): DataFrame = {
    val t = docs.select(split(col("text"), " ").as("t"))
    val uni = t.select(explode(col("t")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
    val tot = broadcast(uni.agg(sum(col("c")).cast("long").as("n_tok")))
    val exact = (col("c_xy") * col("n_tok")).cast("double") /
      (col("c_x") * col("c_y")).cast("double")
    t.filter(size(col("t")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(t) - 1)," +
          " i -> concat(element_at(t, i), ' ', element_at(t, i + 1)))")).as("bigram"))
      .groupBy(col("bigram")).agg(count(lit(1)).as("c_xy"))
      .filter(col("c_xy") >= minCount)
      .withColumn("w1", split(col("bigram"), " ").getItem(0))
      .withColumn("w2", split(col("bigram"), " ").getItem(1))
      .join(uni.select(col("w").as("w1"), col("c").as("c_x")), "w1")
      .join(uni.select(col("w").as("w2"), col("c").as("c_y")), "w2")
      .crossJoin(tot)
      .orderBy(exact.desc, col("bigram")).limit(topK)
      .select(col("bigram"), col("c_xy"), col("c_x"), col("c_y"),
        round(exact, 6).as("lift"))
  }

  def queries: Seq[GraftQuery] = Seq(

    // BOILERPLATE detection — the pre-training scrub for repeated site
    // chrome/license headers: a doc's 3-shingles that occur in more than
    // 10% of the corpus (document frequency, not raw count) are
    // boilerplate; emitted per doc as exact integer counts (total
    // distinct shingles, boilerplate shingles). The frequency threshold
    // compares as INTEGERS (10·df > ndocs). Shapes: the doc-frequency
    // pass is one shingle-keyed groupBy over the distinct (doc, shingle)
    // relation ([[graft.ops.Dedup.shingles3]] — one definition), the
    // >10%-of-docs FREQUENT set it yields is tiny by Zipf and
    // BROADCASTS back as a membership flag — the decontamination
    // semi-join shape — so the data-sized relation is never
    // re-exchanged on the shingle key.
    GraftQuery.of("text_boilerplate_flags",
      s"""WITH ${graft.ops.Dedup.shinglesSqlCte},
         |ds AS (SELECT DISTINCT doc_id, shingle FROM sh),
         |df AS (SELECT shingle, count(*) AS df FROM ds GROUP BY 1),
         |nd AS (SELECT count(*) AS ndocs FROM documents)
         |SELECT ds.doc_id,
         |  CAST(count(*) AS BIGINT) AS n_shingles,
         |  CAST(count(CASE WHEN 10 * df.df > nd.ndocs THEN 1 END) AS BIGINT)
         |    AS n_boiler
         |FROM ds JOIN df USING (shingle) CROSS JOIN nd
         |GROUP BY ds.doc_id ORDER BY ds.doc_id""".stripMargin) { (s, d) =>
      val docs = documents(s, d)
      val ds = graft.ops.Dedup.shingles3(docs).distinct()
      val nd = broadcast(docs.agg(count(lit(1)).as("ndocs")))
      // Only the FREQUENT set (df in >10% of docs — tiny by Zipf, and
      // SF-invariant under replica scaling) ever needs to meet the
      // per-doc rollup, so it broadcasts back as a membership flag: the
      // 10⁸-row (doc, shingle) relation is never re-exchanged or sorted
      // on the shingle key for the join. (A shingle-partitioned window
      // variant was measured at the 100× SF and REJECTED: 54.9 s vs the
      // old data-sized join-back's 24.1 — WindowExec's per-group buffers
      // lose badly on ~10⁸ mostly-singleton shingle groups.)
      val freq = ds.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
        .crossJoin(nd).filter(lit(10) * col("df") > col("ndocs"))
        .select(col("shingle"), lit(1).as("__f"))
      ds.join(broadcast(freq), Seq("shingle"), "left")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_shingles"),
          count(col("__f")).as("n_boiler"))
        .orderBy(col("doc_id"))
    },

    // Token statistics: counts, distinct counts, mean token length.
    GraftQuery.of("text_token_stats",
      """SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |  CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct,
        |  CAST(n_chars AS BIGINT) AS n_chars,
        |  round(CAST(len(replace(text, ' ', '')) AS DOUBLE)
        |        / len(string_split(text, ' ')), 6) AS avg_token_len
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      documents(s, d).select(
        col("doc_id"),
        expr("size(split(text, ' '))").cast("long").as("n_tokens"),
        expr("size(array_distinct(split(text, ' ')))").cast("long").as("n_distinct"),
        col("n_chars").cast("long").as("n_chars"),
        round(length(regexp_replace(col("text"), " ", "")).cast("double") /
          expr("size(split(text, ' '))"), 6).as("avg_token_len"))
        .orderBy(col("doc_id"))
    },

    // Quality scoring: length score, type-token ratio, stopword ratio,
    // digit/whitespace character ratios, composite quality score.
    GraftQuery.of("text_quality", {
      val stops = profileCountSql(Seq("the", "a", "and", "of", "to"))
      s"""SELECT doc_id,
         |  round(least(n_chars / 500.0, 1.0), 6) AS len_score,
         |  round(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
         |        / len(string_split(text, ' ')), 6) AS type_token_ratio,
         |  round(CAST($stops AS DOUBLE)
         |        / len(string_split(text, ' ')), 6) AS stopword_ratio,
         |  round(CAST(len(regexp_extract_all(text, '[0-9]')) AS DOUBLE) / n_chars, 6)
         |    AS digit_ratio,
         |  round(CAST(len(regexp_extract_all(text, ' ')) AS DOUBLE) / n_chars, 6)
         |    AS space_ratio
         |FROM documents ORDER BY doc_id""".stripMargin
    }) { (s, d) =>
      val nTokens = expr("size(split(text, ' '))")
      documents(s, d).select(
        col("doc_id"),
        round(least(col("n_chars") / 500.0, lit(1.0)), 6).as("len_score"),
        round(expr("size(array_distinct(split(text, ' ')))").cast("double") / nTokens, 6)
          .as("type_token_ratio"),
        round(expr(profileCountExpr(Seq("the", "a", "and", "of", "to"))).cast("double") /
          nTokens, 6).as("stopword_ratio"),
        round(expr("size(regexp_extract_all(text, '[0-9]', 0))").cast("double") /
          col("n_chars"), 6).as("digit_ratio"),
        round(expr("size(regexp_extract_all(text, ' ', 0))").cast("double") /
          col("n_chars"), 6).as("space_ratio"))
        .orderBy(col("doc_id"))
    },

    // Language identification: CJK character detection, then stopword-profile
    // argmax with a fixed preference order (en > de > es > fr) on ties.
    GraftQuery.of("text_langid", {
      val scores = Profiles.map { case (l, vs) => s"${profileCountSql(vs)} AS s_$l" }
        .mkString(",\n    ")
      s"""WITH scored AS (
         |  SELECT doc_id, lang,
         |    len(regexp_extract_all(text, '[^\\x00-\\x7F]')) AS n_nonascii,
         |    n_chars,
         |    $scores
         |  FROM documents)
         |SELECT doc_id,
         |  CASE WHEN n_nonascii * 10 > n_chars * 3 THEN 'zh'
         |       WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr THEN 'en'
         |       WHEN s_de >= s_es AND s_de >= s_fr THEN 'de'
         |       WHEN s_es >= s_fr THEN 'es'
         |       ELSE 'fr' END AS pred_lang,
         |  lang AS actual_lang
         |FROM scored ORDER BY doc_id""".stripMargin
    }) { (s, d) =>
      val scored = documents(s, d).select(
        (Seq(col("doc_id"), col("lang"), col("n_chars"),
          expr("size(regexp_extract_all(text, '[^\\\\x00-\\\\x7F]', 0))").as("n_nonascii")) ++
          Profiles.map { case (l, vs) => expr(profileCountExpr(vs)).as(s"s_$l") }): _*)
      scored.select(
        col("doc_id"),
        when(col("n_nonascii") * 10 > col("n_chars") * 3, "zh")
          .when(col("s_en") >= col("s_de") && col("s_en") >= col("s_es") &&
            col("s_en") >= col("s_fr"), "en")
          .when(col("s_de") >= col("s_es") && col("s_de") >= col("s_fr"), "de")
          .when(col("s_es") >= col("s_fr"), "es")
          .otherwise("fr").as("pred_lang"),
        col("lang").as("actual_lang"))
        .orderBy(col("doc_id"))
    },

    // Document fingerprints: set-hash, multiset-hash, and a 60-bit integer
    // fingerprint (first 15 md5 hex chars) for compact storage/joins.
    GraftQuery.of("text_fingerprint",
      s"""SELECT doc_id,
         |  md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' '))
         |    AS fp_set,
         |  md5(array_to_string(list_sort(string_split(text, ' ')), ' ')) AS fp_multiset,
         |  CAST(${GraftQuery.h60Sql("text")} AS BIGINT) AS fp64
         |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      documents(s, d).select(
        col("doc_id"),
        md5(concat_ws(" ", expr("array_sort(array_distinct(split(text, ' ')))")))
          .as("fp_set"),
        md5(concat_ws(" ", expr("array_sort(split(text, ' '))"))).as("fp_multiset"),
        graft.functions.Md5Hash60.md5hash60(col("text")).as("fp64"))
        .orderBy(col("doc_id"))
    },

    // Rabin rolling-hash document fingerprint (order-sensitive, unlike the
    // bag fingerprints above); native codegen'd expression. The DuckDB
    // oracle replays the exact recurrence h ← (h·B mod M) + byte (mod M)
    // as a list_reduce fold with a HUGEINT intermediate product (the
    // corpus is printable-ASCII, so ord(char) == UTF-8 byte; Spark hashes
    // the cast-to-binary UTF-8 bytes).
    GraftQuery.of("text_rolling_fp", {
      val M = graft.functions.RollingHash61.Mod
      val B = graft.functions.RollingHash61.Base
      s"""SELECT doc_id,
         |  CASE WHEN len(text) = 0 THEN 0 ELSE list_reduce(
         |    list_transform(range(1, len(text) + 1), i -> ord(substr(text, i, 1))::BIGINT),
         |    (a, b) -> ((a::HUGEINT * $B % $M + b) % $M)::BIGINT) END AS rolling_fp
         |FROM documents ORDER BY doc_id""".stripMargin
    }) { (s, d) =>
      documents(s, d).select(
        col("doc_id"),
        graft.functions.RollingHash61.rollingHash61(col("text")).as("rolling_fp"))
        .orderBy(col("doc_id"))
    },

    // Content-defined chunking cut points (CDC dedup primitive): positions
    // where the 16-byte windowed Rabin hash lands on the mask. The Spark
    // side is the O(n) rolling native expression; the oracle replays the
    // same cut set linearly (r12, the dedup_cdc_chunks rewrite applied
    // here too — the naive per-window fold was O(n·16) interpreted
    // lambdas and the 4th-heaviest sf10 replay at 348 s):
    //   H_i = Σ_{j=i-15..i} c_j·B^(i-j)  =  B^i · Σ c_j·B^(-j)   (mod M)
    // one per-char term c_j·IB^j (IB = B⁻¹ mod M, M prime), a 16-row
    // windowed SUM per doc, one final modular product. Each term is a
    // residue < 2^61, so a 16-term window sum reaches 16·(2^61−1) ≈ 2^65
    // — past BIGINT, inside HUGEINT, which is why the accumulator is
    // HUGEINT; & 63 ≡ % 64 on the non-negative residue. Cut POSITIONS
    // are provably the same set.
    GraftQuery.of("text_cdc_chunks", {
      val M = graft.functions.RollingHash61.Mod
      val B = graft.functions.RollingHash61.Base
      val IB = graft.functions.RollingHash61.BaseInv
      s"""WITH RECURSIVE pw(j, pb, pib) AS (
         |  SELECT 0::BIGINT, 1::HUGEINT, 1::HUGEINT
         |  UNION ALL
         |  SELECT j + 1, (pb * $B) % $M, (pib * $IB) % $M
         |  FROM pw WHERE j < (SELECT max(len(text)) FROM documents)
         |), chars AS (
         |  SELECT doc_id, i, ord(substr(text, i, 1))::HUGEINT AS c
         |  FROM (SELECT doc_id, text, unnest(range(1, len(text) + 1)) AS i
         |        FROM documents)
         |), hashes AS (
         |  SELECT doc_id, i,
         |    ((SUM((c * pib) % $M) OVER (PARTITION BY doc_id ORDER BY i
         |        ROWS BETWEEN 15 PRECEDING AND CURRENT ROW) % $M) * pb) % $M AS h
         |  FROM chars JOIN pw ON pw.j = chars.i
         |), cl AS (
         |  SELECT doc_id, list(i ORDER BY i) AS cuts
         |  FROM hashes WHERE i >= 16 AND (h % 64) = 0
         |  GROUP BY doc_id)
         |SELECT d.doc_id,
         |  CAST(coalesce(len(cl.cuts), 0) AS BIGINT) AS n_cuts,
         |  coalesce(array_to_string(cl.cuts, ','), '') AS cuts_str
         |FROM documents d LEFT JOIN cl USING (doc_id)
         |ORDER BY doc_id""".stripMargin
    }) { (s, d) =>
      documents(s, d).select(
        col("doc_id"),
        graft.functions.CdcBoundaries.cdcBoundaries(
          graft.functions.CdcBoundaries.asciiOnly(col("text"), col("doc_id")), 16, 63)
          .as("cuts"))
        .select(col("doc_id"),
          size(col("cuts")).cast("long").as("n_cuts"),
          expr("array_join(transform(cuts, x -> cast(x as string)), ',')").as("cuts_str"))
        .orderBy(col("doc_id"))
    },

    // BPE-ish token counting: letter runs / digit runs / single symbols —
    // the pre-tokenization regex shape BPE tokenizers apply before
    // merges. Engine side is the single-pass counting native
    // ([[graft.functions.BpeTokenCounts]] — the regex form materialized
    // one UTF8String per token, ~10⁸ allocations at the 100× SF, only to
    // take the array's length); the ORACLE keeps the regex formulation,
    // so the native's run/single-code-point partition is hash-verified
    // against an independent engine at every SF, and PropertySpec pins
    // equality against Spark's own regexp_extract_all on adversarial
    // inputs.
    GraftQuery.of("text_token_bpe",
      """SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS BIGINT)
        |    AS n_bpe_tokens,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws_tokens
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      documents(s, d)
        .select(col("doc_id"),
          graft.functions.BpeTokenCounts.bpeTokenCounts(col("text")).as("tc"))
        .select(col("doc_id"),
          col("tc.n_bpe_tokens").as("n_bpe_tokens"),
          col("tc.n_ws_tokens").as("n_ws_tokens"))
        .orderBy(col("doc_id"))
    },

    // Per-language/source corpus histogram (A12-style over documents).
    GraftQuery.of("text_corpus_summary",
      """SELECT lang, source, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
        |  CAST(min(n_chars) AS BIGINT) AS min_chars,
        |  CAST(max(n_chars) AS BIGINT) AS max_chars
        |FROM documents GROUP BY lang, source ORDER BY lang, source""".stripMargin) { (s, d) =>
      documents(s, d).groupBy(col("lang"), col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).cast("long").as("total_chars"),
          min(col("n_chars")).cast("long").as("min_chars"),
          max(col("n_chars")).cast("long").as("max_chars"))
        .orderBy(col("lang"), col("source"))
    },

    // TF-IDF top terms per document — the classic salient-term extractor
    // (keyword indexing, near-dup explanation, topic drift monitoring).
    // Scale shape: tokenize once, ONE shuffle for per-(doc, term) counts,
    // ONE for document frequency; the corpus size joins in as a broadcast
    // single-row frame; the top-3 per doc is a BOUNDED aggregation (the
    // same slice∘array_sort∘collect_list shape as the IVF probe
    // assignment), never a corpus-wide ranked window. Ranking compares the
    // ROUNDED score on both sides, so cross-engine float residue cannot
    // reorder; ties break on the term.
    GraftQuery.of("text_tfidf_top_terms",
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
        |), tf AS (
        |  SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2
        |), df AS (
        |  SELECT term, count(DISTINCT doc_id) AS df FROM toks GROUP BY 1
        |), n AS (SELECT count(*) AS n FROM documents
        |), scored AS (
        |  SELECT tf.doc_id, tf.term,
        |    round(tf.tf * ln(CAST(n.n AS DOUBLE) / df.df), 6) AS tfidf
        |  FROM tf JOIN df USING (term) CROSS JOIN n
        |), ranked AS (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rk FROM scored)
        |SELECT doc_id, term, tfidf FROM ranked WHERE rk <= 3
        |ORDER BY doc_id, term""".stripMargin) { (s, d) =>
      tfidfTopTerms(documents(s, d))
    },

    // The full BPE merge LOOP (not just the candidate ranking below): 8
    // driver-steered rounds of count-pairs → adopt-top-merge → re-segment
    // over the distinct-word working set, emitting the learned merge
    // table. The oracle unrolls the identical 8 rounds as CTEs — every
    // pair count, tie-break, and greedy re-segmentation is replayed and
    // hash-compared, so the loop's fixpoint behavior (merged symbols
    // feeding later rounds' counts) is what's verified, not a summary.
    GraftQuery.of("text_bpe_train", bpeTrainOracleSql(8)) { (s, d) =>
      bpeTrain(documents(s, d), 8)
    },

    // Train → APPLY: tokenize the corpus with the 8 learned merges and
    // emit per-document word/token counts — the composition a tokenizer
    // build actually ships (the merge table alone is inert). The encode
    // pass is 8 literal replaces fused into one codegen'd scan; the
    // oracle re-derives the same merges in its CTEs and applies them as
    // scalar-subquery replaces, so train and apply are verified TOGETHER.
    GraftQuery.of("text_bpe_encode", bpeEncodeOracleSql(8)) { (s, d) =>
      val docs = documents(s, d)
      bpeEncode(docs, bpeTrainMerges(docs, 8).map(m => (m._2, m._3)))
    },

    // Corpus-wide top-20 bigrams — the vocabulary-building/merge-candidate
    // primitive of BPE-style tokenizer training. One explode + ONE
    // count shuffle; top-20 selection is a total order on (cnt DESC,
    // bigram), so the cut is deterministic on both engines even with ties
    // at the boundary. Docs with fewer than two tokens are filtered BEFORE
    // the transform (Spark's sequence(1, 0) would count DOWN, not empty).
    GraftQuery.of("text_bigram_topk",
      """WITH t AS (SELECT string_split(text, ' ') AS t FROM documents),
        |bg AS (
        |  SELECT unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1]))
        |    AS bigram
        |  FROM t WHERE len(t) >= 2)
        |SELECT bigram, count(*) AS cnt FROM bg
        |GROUP BY 1 ORDER BY cnt DESC, bigram LIMIT 20""".stripMargin) { (s, d) =>
      documents(s, d)
        .select(split(col("text"), " ").as("t"))
        .filter(size(col("t")) >= 2)
        .select(explode(expr(
          "transform(sequence(1, size(t) - 1)," +
            " i -> concat(element_at(t, i), ' ', element_at(t, i + 1)))")).as("bigram"))
        .groupBy(col("bigram")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("bigram")).limit(20)
    },

    // PMI-style collocation mining — the phrase-detection primitive
    // (word2vec phrase pass, tokenizer vocab seeding, MWE extraction):
    // rank adjacent pairs by lift = P(xy) / (P(x)·P(y)), i.e. how much
    // more often the pair co-occurs than independence predicts. The lift
    // is computed WITHOUT logs as the exact integer ratio
    // c_xy·N / (c_x·c_y) — PMI's log is monotone, so the ranking is
    // identical and the cross-engine FP-tie hazard of log() never
    // arises; all products stay far below 2^53, so the one IEEE division
    // is bit-identical on both engines, and 6 dp rounding of an
    // integer-derived ratio is stable. ORDER BY uses the UNROUNDED
    // quotient (ties broken by bigram), so the top-20 cut is the same
    // set on both engines. Two count shuffles (unigrams, bigrams) + two
    // vocab-sized equi-joins; the 1-row token total broadcasts.
    GraftQuery.of("text_pmi_top_pairs",
      """WITH t AS (SELECT string_split(text, ' ') AS t FROM documents),
        |tok AS (SELECT unnest(t) AS w FROM t),
        |uni AS (SELECT w, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY 1),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_tok FROM tok),
        |bg AS (
        |  SELECT unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1]))
        |    AS bigram
        |  FROM t WHERE len(t) >= 2),
        |bgc AS (
        |  SELECT bigram, CAST(count(*) AS BIGINT) AS c_xy FROM bg
        |  GROUP BY 1 HAVING count(*) >= 5)
        |SELECT bigram, c_xy, u1.c AS c_x, u2.c AS c_y,
        |  round(CAST(c_xy * n_tok AS DOUBLE) / CAST(u1.c * u2.c AS DOUBLE), 6)
        |    AS lift
        |FROM bgc, tot, uni u1, uni u2
        |WHERE u1.w = string_split(bigram, ' ')[1]
        |  AND u2.w = string_split(bigram, ' ')[2]
        |ORDER BY CAST(c_xy * n_tok AS DOUBLE) / CAST(u1.c * u2.c AS DOUBLE) DESC,
        |  bigram LIMIT 20""".stripMargin) { (s, d) =>
      pmiPairs(documents(s, d), minCount = 5, topK = 20)
    },

    // Within-document repetition signal — the boilerplate/spam filter real
    // pipelines apply before training: fraction of bigrams taken by the
    // single most repeated bigram, plus the distinct-bigram ratio. Pure
    // per-row scalar work (quadratic only in the DOCUMENT's distinct
    // bigrams); ratios divide two exact integers so 6dp rounding is
    // bit-identical across engines. Docs with < 2 tokens are excluded
    // (no bigrams to measure).
    GraftQuery.of("text_repetition_ratio",
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |bg AS (
        |  SELECT doc_id,
        |    list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1]) AS bg
        |  FROM t WHERE len(t) >= 2)
        |SELECT doc_id,
        |  CAST(len(bg) AS BIGINT) AS n_bigrams,
        |  round(CAST(list_max(list_transform(list_distinct(bg),
        |      x -> len(list_filter(bg, y -> y = x)))) AS DOUBLE) / len(bg), 6)
        |    AS top_bigram_frac,
        |  round(CAST(len(list_distinct(bg)) AS DOUBLE) / len(bg), 6)
        |    AS distinct_bigram_ratio
        |FROM bg ORDER BY doc_id""".stripMargin) { (s, d) =>
      // r14: the per-row frequency summary runs as ONE hash pass
      // (token_freq_stats) instead of the quadratic
      // array_distinct × filter lambda re-scan — same integers, same
      // divisions, oracle untouched (~24 s → ~2 s at sf10)
      import graft.functions.TokenFreqStats.tokenFreqStats
      documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("t"))
        .filter(size(col("t")) >= 2)
        .withColumn("bg", expr(
          "transform(sequence(1, size(t) - 1)," +
            " i -> concat(element_at(t, i), ' ', element_at(t, i + 1)))"))
        .select(col("doc_id"), tokenFreqStats(col("bg")).as("fs"))
        .select(col("doc_id"),
          col("fs.n").as("n_bigrams"),
          round(col("fs.max_count").cast("double") / col("fs.n"), 6)
            .as("top_bigram_frac"),
          round(col("fs.n_distinct").cast("double") / col("fs.n"), 6)
            .as("distinct_bigram_ratio"))
        .orderBy(col("doc_id"))
    },

    // Canonicalization scrub — the normalization pass real dedup pipelines
    // run BEFORE exact/fuzzy matching: lowercase, mask digit runs to a
    // single '0' (so "v2.1" and "v3.4" canonicalize together), collapse
    // whitespace runs, trim. Emits the normalized fingerprint (h60) the
    // downstream exact-dedup groupBy would key on. Pure per-row scalar
    // work, no shuffle. DuckDB's regexp_replace is first-match-only by
    // default, hence the explicit 'g' flag (Spark's is always global).
    GraftQuery.of("text_normalize_scrub",
      s"""SELECT doc_id,
         |  CAST(len(regexp_extract_all(text, '[0-9]+')) AS BIGINT) AS n_digit_runs,
         |  CAST(len(norm) AS BIGINT) AS norm_len,
         |  CAST(${GraftQuery.h60Sql("norm")} AS BIGINT) AS norm_fp64
         |FROM (
         |  SELECT doc_id, text,
         |    trim(regexp_replace(regexp_replace(lower(text), '[0-9]+', '0', 'g'),
         |                        '\\s+', ' ', 'g')) AS norm
         |  FROM documents)
         |ORDER BY doc_id""".stripMargin) { (s, d) =>
      // r14: the 4-pass regex chain (2× regexp_replace + regexp_extract_all
      // + trim, each a Matcher walk with an intermediate copy) fused into
      // ONE native single-pass expression — semantics pinned to the
      // builtins (see NormalizeScrub's Scaladoc), result proven identical
      // by the unchanged oracle at every SF + PropertySpec's adversarial
      // equality test against the builtin chain itself
      import graft.functions.NormalizeScrub.normalizeScrub
      documents(s, d)
        .select(col("doc_id"), normalizeScrub(col("text")).as("ns"))
        .select(col("doc_id"),
          col("ns.n_digit_runs").as("n_digit_runs"),
          length(col("ns.norm")).cast("long").as("norm_len"),
          graft.functions.Md5Hash60.md5hash60(col("ns.norm")).as("norm_fp64"))
        .orderBy(col("doc_id"))
    },

    // Gopher-style RULE GATE (Rae et al. '21 §A1.1 / Dolma's heuristic
    // filters) — the boolean quality gates production corpora apply
    // before any model-based scoring: word-count bounds, mean-word-length
    // band, minimum distinct stopwords, type-token-ratio floor, and the
    // conjunctive keep flag. Every threshold compares in CROSS-MULTIPLIED
    // integers (10·Σlen ≥ 40·n, 2·distinct ≥ n) — no FP ratio ever
    // materializes, so the booleans are bit-stable across engines. One
    // scan, pure per-row scalar work; the keep flag feeds the same
    // LeftAnti discipline as pipeline_clean_corpus at 100 TB.
    GraftQuery.of("text_gopher_rules",
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |m AS (
        |  SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_words,
        |    CAST(list_sum(list_transform(toks, x -> len(x))) AS BIGINT) AS sum_len,
        |    CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct,
        |    CAST(len(list_distinct(list_filter(toks,
        |      x -> x IN ('the','a','and','of','to')))) AS BIGINT) AS n_stop
        |  FROM t)
        |SELECT doc_id, n_words,
        |  n_words >= 40 AND n_words <= 10000 AS r_word_count,
        |  10 * sum_len >= 40 * n_words AND 10 * sum_len <= 100 * n_words
        |    AS r_mean_word_len,
        |  n_stop >= 2 AS r_stopwords,
        |  2 * n_distinct >= n_words AS r_type_token,
        |  (n_words >= 40 AND n_words <= 10000)
        |    AND (10 * sum_len >= 40 * n_words AND 10 * sum_len <= 100 * n_words)
        |    AND n_stop >= 2 AND 2 * n_distinct >= n_words AS keep
        |FROM m ORDER BY doc_id""".stripMargin) { (s, d) =>
      val nWords = col("n_words")
      val rWc = nWords >= 40 && nWords <= 10000
      val rMwl = col("sum_len") * 10 >= nWords * 40 && col("sum_len") * 10 <= nWords * 100
      val rStop = col("n_stop") >= 2
      val rTtr = col("n_distinct") * 2 >= nWords
      documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .select(col("doc_id"),
          size(col("toks")).cast("long").as("n_words"),
          expr("aggregate(toks, 0L, (acc, x) -> acc + length(x))").as("sum_len"),
          expr("size(array_distinct(toks))").cast("long").as("n_distinct"),
          expr("size(array_distinct(filter(toks, x -> x IN ('the','a','and','of','to'))))")
            .cast("long").as("n_stop"))
        .select(col("doc_id"), nWords,
          rWc.as("r_word_count"), rMwl.as("r_mean_word_len"),
          rStop.as("r_stopwords"), rTtr.as("r_type_token"),
          (rWc && rMwl && rStop && rTtr).as("keep"))
        .orderBy(col("doc_id"))
    },

    // Zipf freq-of-freq — the vocabulary-curve diagnostic (how many
    // distinct tokens occur exactly k times) that tells a corpus builder
    // whether the token distribution is natural-language-shaped or
    // degenerate. Two cascading integer aggregations, each strictly
    // narrowing (tokens → distinct tokens → distinct frequencies), both
    // with map-side partial combine.
    GraftQuery.of("text_zipf_histogram",
      """WITH tok AS (SELECT unnest(string_split(text, ' ')) AS t FROM documents),
        |freq AS (SELECT t, count(*) AS f FROM tok WHERE t <> '' GROUP BY 1)
        |SELECT CAST(f AS BIGINT) AS occurrences, CAST(count(*) AS BIGINT) AS n_tokens
        |FROM freq GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      documents(s, d)
        .select(explode(split(col("text"), " ")).as("t"))
        .filter(col("t") =!= "")
        .groupBy(col("t")).agg(count(lit(1)).as("occurrences"))
        .groupBy(col("occurrences")).agg(count(lit(1)).as("n_tokens"))
        .orderBy(col("occurrences"))
    },

    // VOCABULARY GROWTH (Heaps' law) — distinct-token count as a function
    // of corpus prefix size, at 10 decile cuts over doc_id order: the
    // curve a corpus planner reads to predict how much NEW vocabulary
    // (entities, code identifiers, morphology) more data buys. Shape:
    // one token explode → min(doc_id) per token (ONE shuffle, the
    // first-occurrence relation) → broadcast 10-row cut dimension →
    // per-cut count. The prefix re-scan never happens — first-occurrence
    // inverts "vocab at cut k" into "tokens first seen before cut k".
    GraftQuery.of("text_vocab_growth",
      """WITH n AS (SELECT count(*) AS nd FROM documents),
        |fo AS (
        |  SELECT tok, min(doc_id) AS first_doc FROM (
        |    SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
        |  WHERE tok <> '' GROUP BY 1),
        |cuts AS (SELECT k, (k * nd) // 10 AS cut
        |  FROM n, unnest(range(1, 11)) t(k))
        |SELECT CAST(k AS BIGINT) AS decile, CAST(cut AS BIGINT) AS n_docs,
        |  CAST(count(*) FILTER (WHERE first_doc < cut) AS BIGINT) AS vocab
        |FROM fo, cuts GROUP BY k, cut ORDER BY decile""".stripMargin) { (s, d) =>
      val fo = documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        .filter(col("tok") =!= "")
        .groupBy(col("tok")).agg(min(col("doc_id")).as("first_doc"))
      val cuts = broadcast(documents(s, d).agg(count(lit(1)).as("nd"))
        .select(explode(expr("sequence(1, 10)")).as("k"), col("nd"))
        .select(col("k"), expr("(k * nd) div 10").as("cut")))
      fo.crossJoin(cuts)
        .groupBy(col("k"), col("cut"))
        .agg(sum(when(col("first_doc") < col("cut"), 1L).otherwise(0L)).as("vocab"))
        .select(col("k").cast("long").as("decile"), col("cut").cast("long").as("n_docs"),
          col("vocab"))
        .orderBy(col("decile"))
    },

    // RAG CHUNKING — the retrieval-prep operator every RAG/embedding
    // pipeline runs first: each document sliced into overlapping
    // fixed-token windows (32 tokens, stride 24 → 8-token overlap, so no
    // boundary sentence is lost to a cut). Pure integer slicing
    // arithmetic: chunk k covers tokens [k·24+1, k·24+32], chunk count =
    // 1 + ceil((n−32)/24) for n>32 — both engines replay the same
    // windows, and each chunk ships its 60-bit content fingerprint (the
    // id an embedding/dedup stage keys on) rather than the text itself.
    // One explode over a per-doc bounded sequence — no shuffle at all
    // before the output sort.
    GraftQuery.of("text_rag_chunks", {
      val h = GraftQuery.h60Sql("array_to_string(t[s:s+31], ' ')")
      s"""WITH toks AS (
         |  SELECT doc_id, string_split(text, ' ') AS t,
         |    len(string_split(text, ' ')) AS n FROM documents),
         |k AS (
         |  SELECT doc_id, t, n, unnest(range(0,
         |    CASE WHEN n <= 32 THEN 1 ELSE 1 + (n - 32 + 23) // 24 END)) AS ci
         |  FROM toks),
         |c AS (SELECT doc_id, ci, ci * 24 + 1 AS s, t, n FROM k)
         |SELECT doc_id, CAST(ci AS BIGINT) AS chunk_idx,
         |  CAST(least(32, n - ci * 24) AS BIGINT) AS n_chunk_tokens,
         |  CAST($h AS BIGINT) AS chunk_fp
         |FROM c ORDER BY doc_id, chunk_idx""".stripMargin
    }) { (s, d) =>
      import graft.functions.Md5Hash60.md5hash60
      documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("t"))
        .withColumn("n", size(col("t")))
        .select(col("doc_id"), col("t"), col("n"), explode(expr(
          "sequence(0, CASE WHEN n <= 32 THEN 0 ELSE (n - 32 + 23) div 24 END)"))
          .as("ci"))
        .select(col("doc_id"), col("ci").cast("long").as("chunk_idx"),
          least(lit(32), col("n") - col("ci") * 24).cast("long").as("n_chunk_tokens"),
          md5hash60(expr("array_join(slice(t, ci * 24 + 1, 32), ' ')")).as("chunk_fp"))
        .orderBy(col("doc_id"), col("chunk_idx"))
    },

    // INVERTED INDEX build — the retrieval artifact (term → document
    // posting list) behind corpus search, RAG indexing, and audit lookups.
    // One explode + DISTINCT collapses (term, doc) repeats map-side, a
    // per-term window caps the materialized posting list at the first 20
    // doc_ids (the window partitions by TERM, so the sort is bounded by
    // document frequency and embarrassingly parallel across terms — never
    // corpus-global), and one term-keyed aggregate emits total df next to
    // the capped list. The cap is the load-bearing scale choice: stopword
    // terms have df ≈ corpus size, and an uncapped collect per term is the
    // classic inverted-index OOM; df carries the true count the cap hides.
    // Postings are a comma-joined string (typed arrays don't hash-compare
    // portably through the driver's pandas gate).
    GraftQuery.of("text_inverted_index",
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
        |td AS (SELECT DISTINCT term, doc_id FROM tok WHERE term <> ''),
        |agg AS (SELECT term, count(*) AS df,
        |  list_aggregate(list_sort(list(doc_id))[1:20], 'string_agg', ',') AS postings
        |  FROM td GROUP BY 1)
        |SELECT term, CAST(df AS BIGINT) AS df, postings
        |FROM agg WHERE df >= 5 ORDER BY term""".stripMargin) { (s, d) =>
      val byTerm = org.apache.spark.sql.expressions.Window
        .partitionBy(col("term")).orderBy(col("doc_id"))
      documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
        .filter(col("term") =!= "")
        .distinct()
        .withColumn("__rn", row_number().over(byTerm))
        .groupBy(col("term"))
        .agg(count(lit(1)).as("df"),
          concat_ws(",", expr(
            "transform(array_sort(collect_list(CASE WHEN __rn <= 20 THEN doc_id END)), x -> CAST(x AS STRING))"))
            .as("postings"))
        .filter(col("df") >= 5)
        .orderBy(col("term"))
    },

    // N-gram novelty — per-document count of 8-grams that also occur in
    // ANOTHER document (shared_grams / n_grams is the memorization /
    // near-dup signal training pipelines threshold on). The exploded gram
    // stream pre-aggregates to (gram, doc_id, occurrences) — map-side
    // partial combine collapses within-doc repeats BEFORE any exchange —
    // then one gram-partitioned window counts distinct docs per gram and
    // a doc-keyed rollup weighs each gram by its occurrence count. Three
    // narrowing shuffles, no join of the full gram stream. docs_with > 1
    // — not the raw count — makes a gram repeated WITHIN one document
    // count as novel, matching cross-document contamination semantics.
    GraftQuery.of("text_ngram_novelty",
      """WITH docs AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |g AS (SELECT doc_id, list_aggregate(toks[i:i+7], 'string_agg', ' ') AS gram
        |  FROM docs, unnest(range(1, len(toks) - 6)) t(i) WHERE len(toks) >= 8),
        |df AS (SELECT gram, count(DISTINCT doc_id) AS docs_with FROM g GROUP BY 1)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
        |  CAST(sum(CASE WHEN docs_with > 1 THEN 1 ELSE 0 END) AS BIGINT) AS shared_grams
        |FROM g JOIN df USING (gram) GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      val byGram = org.apache.spark.sql.expressions.Window.partitionBy(col("gram"))
      documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .filter(size(col("toks")) >= 8)
        .select(col("doc_id"), explode(expr(
          "transform(sequence(1, size(toks) - 7), i -> array_join(slice(toks, i, 8), ' '))"))
          .as("gram"))
        .groupBy(col("gram"), col("doc_id"))
        .agg(count(lit(1)).as("occ"))
        .withColumn("docs_with", count(lit(1)).over(byGram))
        .groupBy(col("doc_id"))
        .agg(sum(col("occ")).as("n_grams"),
          sum(when(col("docs_with") > 1, col("occ")).otherwise(lit(0L)))
            .as("shared_grams"))
        .orderBy(col("doc_id"))
    },

    // PII redaction — the scrub pass a training corpus runs before anything
    // else ships: match emails / phone numbers / IPv4 literals, count them,
    // and rewrite each to a typed placeholder. The synthetic corpus carries
    // no PII, so the registered query first WEAVES deterministic PII spans
    // into each row (from doc_id/source — same construction on both
    // engines); the redaction itself is the generic three-regex cascade a
    // real corpus would get. The regexes stay in the Java∩RE2 common
    // subset ([...] classes, {m,n}, \., word chars — no lookaround, no \b
    // digit-boundary subtleties) so both engines match identical spans.
    // Pure per-row scalar work: one scan, no shuffle, codegen'd regexps.
    GraftQuery.of("text_pii_redact",
      s"""WITH p AS (
         |  SELECT doc_id,
         |    substr(text, 1, 40) || ' reach ' || source || '.' ||
         |      CAST(doc_id AS VARCHAR) || '@mail.example.com or +1-555-' ||
         |      CAST(doc_id % 900 + 100 AS VARCHAR) || CAST(doc_id % 10 AS VARCHAR) ||
         |      ' from 10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.1 thanks'
         |      AS pii_text
         |  FROM documents),
         |r AS (
         |  SELECT doc_id, pii_text,
         |    regexp_replace(regexp_replace(regexp_replace(pii_text,
         |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}', '<EMAIL>', 'g'),
         |      '[+][0-9]{1,2}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g'),
         |      '([0-9]{1,3}[.]){3}[0-9]{1,3}', '<IP>', 'g') AS red
         |  FROM p)
         |SELECT doc_id,
         |  CAST(len(regexp_extract_all(pii_text,
         |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}')) AS BIGINT) AS n_email,
         |  CAST(len(regexp_extract_all(pii_text,
         |    '[+][0-9]{1,2}-[0-9]{3}-[0-9]{4}')) AS BIGINT) AS n_phone,
         |  CAST(len(regexp_extract_all(red,
         |    '([0-9]{1,3}[.]){3}[0-9]{1,3}')) AS BIGINT) AS n_ip,
         |  CAST(len(red) AS BIGINT) AS red_len,
         |  CAST(${GraftQuery.h60Sql("red")} AS BIGINT) AS red_fp64
         |FROM r ORDER BY doc_id""".stripMargin) { (s, d) =>
      val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}"
      val phoneRe = "[+][0-9]{1,2}-[0-9]{3}-[0-9]{4}"
      val ipRe = "([0-9]{1,3}[.]){3}[0-9]{1,3}"
      documents(s, d)
        .select(col("doc_id"),
          concat(
            substring(col("text"), 1, 40), lit(" reach "), col("source"), lit("."),
            col("doc_id").cast("string"), lit("@mail.example.com or +1-555-"),
            (col("doc_id") % 900 + 100).cast("string"),
            (col("doc_id") % 10).cast("string"),
            lit(" from 10."), (col("doc_id") % 256).cast("string"),
            lit(".0.1 thanks")).as("pii_text"))
        .withColumn("red",
          regexp_replace(regexp_replace(regexp_replace(col("pii_text"),
            emailRe, "<EMAIL>"), phoneRe, "<PHONE>"), ipRe, "<IP>"))
        .select(col("doc_id"),
          expr(s"size(regexp_extract_all(pii_text, '$emailRe', 0))")
            .cast("long").as("n_email"),
          expr(s"size(regexp_extract_all(pii_text, '$phoneRe', 0))")
            .cast("long").as("n_phone"),
          // n_ip counts on the REDACTED text (must be 0: proves the phone
          // suffix / IP overlap cascade left no residual IPv4 match)
          expr(s"size(regexp_extract_all(red, '$ipRe', 0))")
            .cast("long").as("n_ip"),
          length(col("red")).cast("long").as("red_len"),
          graft.functions.Md5Hash60.md5hash60(col("red")).as("red_fp64"))
        .orderBy(col("doc_id"))
    },

    // Hashed-feature linear classifier inference — the fastText/DCLM-style
    // model-based quality score applied corpus-wide: every token hashes
    // into a signed integer weight ((h60 mod 2001) − 1000 ∈ [−1000,1000] —
    // a fixed pseudo-model, standing in for trained weights shipped as a
    // lookup), a document's logit is the exact BIGINT sum, and the gate
    // keeps positive logits. Integer end-to-end: no FP summation-order
    // hazard; score emitted as numerator/denominator (sum_w, n_toks)
    // exactly like the Q8/Q14 ratio discipline. Per-row higher-order
    // aggregate — one scan, zero shuffles, no exploded token stream at all.
    GraftQuery.of("text_classifier_score",
      """SELECT doc_id,
        |  CAST(coalesce(list_sum(list_transform(string_split(text, ' '),
        |    t -> (('0x' || substr(md5(t), 1, 15))::UBIGINT % 2001)::BIGINT - 1000)),
        |    0) AS BIGINT) AS sum_w,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks,
        |  coalesce(list_sum(list_transform(string_split(text, ' '),
        |    t -> (('0x' || substr(md5(t), 1, 15))::UBIGINT % 2001)::BIGINT - 1000)),
        |    0) > 0 AS keep
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      val sumW = expr(
        """aggregate(split(text, ' '), 0L, (acc, t) ->
          |  acc + CAST(conv(substr(md5(t), 1, 15), 16, 10) AS BIGINT) % 2001 - 1000)"""
          .stripMargin)
      documents(s, d)
        .select(col("doc_id"), sumW.as("sum_w"),
          size(split(col("text"), " ")).cast("long").as("n_toks"))
        .withColumn("keep", col("sum_w") > 0)
        .orderBy(col("doc_id"))
    },

    // In-corpus bigram language-model scoring — the CCNet/KenLM quality
    // gate's hash-checkable core: train the LM (bigram → corpus count) and
    // score every document by its average bigram log-frequency, all in one
    // engine pass. EXACT INTEGERS: log2 is floored via the binary-string
    // length (`len(bin(c)) - 1` — identical on both engines, no float log
    // ever exists), the per-doc average is integer-`div` milli-units. A
    // doc whose bigrams are corpus-common scores high (familiar prose); a
    // doc of rare/garbled transitions scores low — the same ordering a
    // perplexity filter produces, with floor-log2 granularity. Shape at
    // 100 TB: the LM is ONE gram-keyed count shuffle (map-side combined,
    // state = distinct bigrams, the same envelope as tfidf's DF table);
    // scoring re-joins the gram stream to the LM gram-keyed (equi-join,
    // never all-pairs) and collapses doc-keyed. A pre-trained LM swaps the
    // first CTE for a lookup table; the scoring join is unchanged.
    GraftQuery.of("text_lm_bigram_score",
      """WITH docs AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |g AS (SELECT doc_id, toks[i] || ' ' || toks[i+1] AS gram
        |  FROM docs, unnest(range(1, len(toks))) t(i) WHERE len(toks) >= 2),
        |lm AS (SELECT gram, count(*) AS c FROM g GROUP BY 1),
        |sc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
        |    CAST(sum(len(bin(c)) - 1) AS BIGINT) AS sum_flog2
        |  FROM g JOIN lm USING (gram) GROUP BY 1)
        |SELECT d.doc_id,
        |  CAST(coalesce(s.n_bigrams, 0) AS BIGINT) AS n_bigrams,
        |  CAST(coalesce(s.sum_flog2, 0) AS BIGINT) AS sum_flog2,
        |  CAST(coalesce((s.sum_flog2 * 1000) // s.n_bigrams, 0) AS BIGINT) AS score_milli
        |FROM docs d LEFT JOIN sc s USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin) { (s, d) =>
      val docs = documents(s, d)
      // LM train + score share ONE gram-keyed exchange: the stream
      // pre-aggregates to (gram, doc_id, occ) — map-side combine — and
      // a gram-partitioned window sums occ into the corpus count c, so
      // the gram strings cross the wire once and the tokenize+explode
      // subtree is planned once. The prior groupBy(gram) + join-back
      // shuffled the gram strings twice and re-ran the explode on both
      // join inputs (24.6 s at the 100× SF). Each occurrence contributes
      // floor(log2 c) = len(bin(c)) − 1, so the per-doc rollup weighs
      // the per-(gram, doc) row by occ.
      val byGram = org.apache.spark.sql.expressions.Window.partitionBy(col("gram"))
      val scored = docs
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .filter(size(col("toks")) >= 2)
        .select(col("doc_id"), explode(expr(
          "transform(sequence(1, size(toks) - 1), i -> array_join(slice(toks, i, 2), ' '))"))
          .as("gram"))
        .groupBy(col("gram"), col("doc_id"))
        .agg(count(lit(1)).as("occ"))
        .withColumn("c", sum(col("occ")).over(byGram))
        .groupBy(col("doc_id"))
        .agg(sum(col("occ")).as("n_bigrams"),
          sum(col("occ") * (length(bin(col("c"))) - 1)).cast("long").as("sum_flog2"))
      docs.select(col("doc_id")).join(scored, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
          coalesce(col("sum_flog2"), lit(0L)).as("sum_flog2"),
          coalesce(expr("(sum_flog2 * 1000) div n_bigrams"), lit(0L)).as("score_milli"))
        .orderBy(col("doc_id"))
    },

    // BM25 top-10 retrieval over a corpus-derived bounded query set — the
    // lexical half of hybrid retrieval (RAG corpus construction, dedup
    // explanation, eval-set mining). The oracle replays the identical
    // expression tree and ranks with a window; the engine side ranks with
    // the bounded-heap exact-top-k aggregate over a composite integer key
    // (see bm25TopK's Scaladoc for the scale argument). Scores cross the
    // hash gate as integer micro-units only.
    GraftQuery.of("text_bm25_topk",
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
        |), tf AS (
        |  SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2
        |), dfreq AS (
        |  SELECT term, count(*) AS df FROM tf GROUP BY 1
        |), q AS (
        |  SELECT term, df,
        |    (row_number() OVER (ORDER BY df DESC, term) - 1) // 2 AS qid
        |  FROM dfreq ORDER BY df DESC, term LIMIT 6
        |), dl AS (
        |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS dl
        |  FROM documents
        |), tot AS (
        |  SELECT CAST(sum(dl) AS BIGINT) AS sum_dl, count(*) AS n_docs FROM dl
        |), comp AS (
        |  SELECT q.qid, tf.doc_id,
        |    ln(1 + (n_docs - df + 0.5) / (df + 0.5)) *
        |      (tf * 2.2) /
        |      (tf + 1.2 * (1 - 0.75 + 0.75 *
        |        CAST(dl AS DOUBLE) / (CAST(sum_dl AS DOUBLE) / n_docs))) AS c
        |  FROM tf JOIN q USING (term) JOIN dl USING (doc_id) CROSS JOIN tot
        |), scored AS (
        |  SELECT qid, doc_id,
        |    CAST(round(sum(c) * 1000000) AS BIGINT) AS score_micro
        |  FROM comp GROUP BY 1, 2
        |), r AS (
        |  SELECT qid, doc_id, score_micro, row_number() OVER (
        |    PARTITION BY qid ORDER BY score_micro DESC, doc_id) AS rk
        |  FROM scored)
        |SELECT CAST(qid AS BIGINT) AS qid, CAST(rk AS BIGINT) AS rk,
        |  doc_id, score_micro
        |FROM r WHERE rk <= 10 ORDER BY qid, rk""".stripMargin) { (s, d) =>
      bm25TopK(documents(s, d), 10)
    })
}
