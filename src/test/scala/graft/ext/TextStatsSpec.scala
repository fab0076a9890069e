package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextStatsSpec extends SparkSpec {
  import spark.implicits._

  test("textStats: counts and quality composite") {
    val df = Seq((1L, "the cat sat on the mat")).toDF("doc_id", "text")
    val r = TextStats.textStats(df, "text", "doc_id").collect()(0)
    assert(r.getInt(1) == 22)            // n_chars
    assert(r.getInt(2) == 6)             // n_tokens
    assert(r.getInt(4) == 3)             // the, on, the
    assert(math.abs(r.getDouble(5) - 0.5) < 1e-12)
    val q = 0.5 * 0.3 + math.min(1.0, 6.0 / 50.0) * 0.5 + 1.0 * 0.2
    assert(math.abs(r.getDouble(6) - q) < 1e-12)
  }

  test("curationFunnel: monotone stage counts with a known composition") {
    // ≥30 words, mean word length ≥3, stopword hits, all-alpha → passes
    val good = "the quick brown foxes jumped over those lazy sleeping dogs " * 4
    val df = Seq(
      (1L, good),                          // survives everything
      (2L, good),                          // dup of 1 → drops at dedup
      (3L, "def f(x): return {x == 1}; " * 6), // code → drops at code gate
      (4L, "too short")                    // fails gopher word count
    ).toDF("doc_id", "text")
    val out = TextStats.curationFunnel(df, "text", "doc_id").collect()
      .map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(out("raw") == 4L)
    assert(out("deduped") == 3L)           // doc 2 removed
    assert(out("non_code") == 2L)          // doc 3 removed
    assert(out("quality_kept") == 1L)      // doc 4 removed
  }

  test("tokenizerFertility: per-lang exact token/word sums and ratio") {
    // "don't stop" → BPE-ish tokens [don, ', t, stop] = 4 over 2 words
    val df = Seq((1L, "don't stop", "en"), (2L, "ok", "en"), (3L, "uno dos", "es"))
      .toDF("doc_id", "text", "lang")
    val out = TextStats.tokenizerFertility(df, "text", "lang").collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out("en").getLong(1) == 2L)              // n_docs
    assert(out("en").getLong(2) == 5L)              // don,',t,stop + ok
    assert(out("en").getLong(3) == 3L)              // 2 + 1 words
    assert(out("en").getDouble(4) == 5.0 / 3.0)
    assert(out("es").getDouble(4) == 1.0)
  }

  test("codeDetect: code scores above the line, prose below, empty text null") {
    val df = Seq(
      (1L, "def f(x): return x + g(y) == z;"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "")
    ).toDF("doc_id", "text")
    val out = TextStats.codeDetect(df, "text", "doc_id").collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getBoolean(5), "code sample must classify as code")
    assert(!out(2L).getBoolean(5), "prose must not classify as code")
    assert(out(2L).getLong(1) == 0L)          // no structural symbols
    assert(out(3L).isNullAt(4) && out(3L).isNullAt(5)) // no evidence → null
  }

  test("sourceCard: per-source rollup with cross-source duplicate counting") {
    val df = Seq(
      (1L, "the quick brown fox", "en", "a"),
      (2L, "The  Quick   Brown Fox", "en", "a"),  // normalizes equal to 1
      (3L, "uno dos tres", "es", "a"),
      (4L, "the quick brown fox", "en", "b")      // cross-source dup of 1
    ).toDF("doc_id", "text", "lang", "source")
    val out = TextStats.sourceCard(df, "text", "source", "lang").collect()
      .map(r => r.getString(0) -> r).toMap
    val a = out("a")
    assert(a.getLong(1) == 3L)                       // n_docs
    // split(" ") counts empty tokens in runs: doc 2 has 7, matching the
    // oracle's len(string_split(...)) convention
    assert(a.getLong(2) == 4L + 7L + 3L)             // total_tokens
    assert(math.abs(a.getDouble(4) - 2.0 / 3.0) < 1e-15)  // pct_en
    assert(math.abs(a.getDouble(5) - 2.0 / 3.0) < 1e-15)  // dup_rate: docs 1,2
    val b = out("b")
    assert(b.getLong(1) == 1L && b.getDouble(5) == 1.0)   // dup via source a
  }

  test("readability: hand-computed Flesch components") {
    // "The cat sat. It ran!" → words 5, sentence runs 2,
    // syllables: the=1 cat=1 sat.=1 it=1 ran!=1 → 5
    val df = Seq((1L, "The cat sat. It ran!")).toDF("doc_id", "text")
    val r = TextStats.readability(df, "text", "doc_id").collect()(0)
    assert(r.getLong(1) == 5L && r.getLong(2) == 2L && r.getLong(3) == 5L)
    val expect = 206.835 - 1.015 * (5.0 / 2.0) - 84.6 * (5.0 / 5.0)
    assert(r.getDouble(4) == expect)
    // no sentence punctuation → floor at 1; multi-vowel-group word
    val r2 = TextStats.readability(
      Seq((1L, "banana understanding")).toDF("doc_id", "text"), "text", "doc_id")
      .collect()(0)
    // ba-na-na: a,a,a = 3 groups; u,e,a,i = 4 groups
    assert(r2.getLong(2) == 1L && r2.getLong(3) == 7L)
  }

  test("textStats: EMPTY text must not abort the scan (ANSI 0/0) — quality null like the oracle") {
    // n_chars=0 made the digit-ratio term divide 0/0, which under ANSI
    // (Spark 4 default) kills the whole job for one bad document. DuckDB
    // division by zero yields NULL, so null quality is also oracle parity.
    val df = Seq((1L, ""), (2L, "   "), (3L, "the cat"), (4L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val rows = TextStats.textStats(df, "text", "doc_id").collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(rows(1L).isNullAt(6), "empty text → null quality")
    assert(rows(4L).isNullAt(6), "null text → null quality")
    assert(!rows(3L).isNullAt(6), "real text keeps its score")
    // whitespace-only: split("   ") has tokens, n_chars=3 > 0 → defined
    assert(!rows(2L).isNullAt(6))
  }

  test("gopherRules: metrics and per-rule verdicts, empty text never aborts") {
    val longGood = (Seq("the", "a", "of", "and") ++ Seq.fill(30)("word")).mkString(" ")
    val df = Seq(
      (1L, longGood),                 // 34 words, all alpha, 4 stop hits
      (2L, "tiny text"),              // fails word count
      (3L, ""),                       // empty: symbol_ratio NULL, passes false
      (4L, (Seq.fill(30)("@@@@") ++ Seq("the", "a")).mkString(" ")) // symbol+alpha fail
    ).toDF("doc_id", "text")
    val rows = TextStats.gopherRules(df, "text", "doc_id").collect()
      .map(r => r.getLong(0) -> r).toMap
    val g = rows(1L)
    assert(g.getInt(1) == 34)
    assert(g.getBoolean(6) && g.getBoolean(7) && g.getBoolean(8) &&
      g.getBoolean(9) && g.getBoolean(10) && g.getBoolean(11), s"good doc passes: $g")
    assert(!rows(2L).getBoolean(6) && !rows(2L).getBoolean(11))
    assert(rows(3L).isNullAt(3), "empty text → null symbol ratio")
    assert(!rows(3L).getBoolean(11), "NULL symbol rule absorbed by false word rule")
    val bad = rows(4L)
    assert(!bad.getBoolean(8) && !bad.getBoolean(9) && !bad.getBoolean(11))
  }

  test("freqSpectrum: frequency-of-frequencies on a known corpus") {
    val df = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")
    val out = TextStats.freqSpectrum(df, "text").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 2L -> 2L)) // c once; a,b twice
  }

  test("perplexityBuckets: tertiles partition docs by LM score, order-consistent") {
    // 6 docs: three built from one repeated common pair (high bigram
    // prob), three from unique-pair salad (low). Buckets must respect
    // the score ordering: every head score >= every middle >= every tail.
    val df = Seq(
      (1L, "aa bb aa bb aa bb aa bb"), (2L, "aa bb aa bb aa bb"),
      (3L, "aa bb aa bb"), (4L, "cc dd ee ff gg hh"),
      (5L, "ii jj kk ll mm nn"), (6L, "oo pp qq rr ss tt")).toDF("doc_id", "text")
    val out = TextStats.perplexityBuckets(df, "text", "doc_id").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getString(2)))
    assert(out.length == 6)
    def scores(b: String) = out.filter(_._3 == b).map(_._2)
    // ≥-edge semantics: ties AT an edge all land in the higher bucket
    // (the three identical salad scores legally share one bucket), so
    // assert the ordering invariant, not fixed tertile sizes.
    assert(scores("head").nonEmpty)
    assert(out.map(_._3).distinct.length >= 2, s"buckets degenerate: ${out.mkString(";")}")
    for (h <- scores("head"); m <- scores("middle")) assert(h >= m)
    for (m <- scores("middle"); t <- scores("tail")) assert(m >= t)
    for (h <- scores("head"); t <- scores("tail")) assert(h >= t)
    // the most repetitive doc (lowest perplexity) is head; the salad
    // docs never outrank it
    val byId = out.map(r => r._1 -> r._3).toMap
    assert(byId(1L) == "head", s"most repetitive doc is head: $byId")
    assert(!Seq(byId(4L), byId(5L), byId(6L)).contains("head"))
  }

  test("langId: marker hits pick the language; no hits → und") {
    val df = Seq(
      (1L, "the fast query"),
      (2L, "der hund und die katze"),
      (3L, "xyzzy qwerty")).toDF("doc_id", "text")
    val out = TextStats.langId(df, "text", "doc_id").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "en")
    assert(out(2L) == "de")
    assert(out(3L) == "und")
  }

  test("langPred native kernel matches the HOF spelling, incl. ties and empties") {
    val texts = Seq(
      "the fast query", "der hund und die katze", "xyzzy qwerty",
      "de de le le",            // es/zh/fr tie territory
      "la la",                  // es vs fr tie → DESC rule
      "", "   ", "the  a",      // empty-token edge cases (split limit -1)
      "le shi bu wo de la que und nicht")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val both = df.select(col("doc_id"),
      TextStats.langPred(col("text")).as("native"),
      TextStats.langPredHof(col("text")).as("hof")).collect()
    both.foreach { r =>
      assert(r.getString(1) == r.getString(2),
        s"doc ${r.getLong(0)}: native=${r.getString(1)} hof=${r.getString(2)}")
    }
  }

  test("fingerprint: equal for equal text, different for different") {
    val df = Seq((1L, "a b c"), (2L, "a b c"), (3L, "a b d")).toDF("doc_id", "text")
    val fps = TextStats.fingerprint(df, "text", "doc_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fps(1L) == fps(2L))
    assert(fps(1L) != fps(3L))
  }

  test("piiScan counts emails, dashed phones, and long digit runs") {
    import spark.implicits._
    val docs = Seq(
      (1L, "contact Bob.Smith@example.com or call 555-123-4567 today"),
      (2L, "account 123456789012 flagged"),
      (3L, "perfectly clean text with the number 42")
    ).toDF("doc_id", "text")
    val out = TextStats.piiScan(docs, "text", "doc_id").collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getInt(3), r.getBoolean(4)))).toMap
    assert(out(1L) == ((1, 1, 0, true)))
    assert(out(2L) == ((0, 0, 1, true)))
    assert(out(3L) == ((0, 0, 0, false)))
  }

  test("repetition: looped text scores high, unique text zero, short text null") {
    import spark.implicits._
    val df = Seq(
      (1L, "a b c a b c a b c"),   // 7 trigram windows, 3 distinct
      (2L, "one two three four"),  // 2 windows, both distinct
      (3L, "too short")            // < 3 tokens
    ).toDF("doc_id", "text")
    val out = TextStats.repetition(df, "text", "doc_id").collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getLong(1) == 7 && out(1L).getLong(2) == 3)
    assert(math.abs(out(1L).getDouble(3) - (1.0 - 3.0 / 7)) < 1e-15)
    assert(out(2L).getDouble(3) == 0.0)
    assert(out(3L).getLong(1) == 0 && out(3L).isNullAt(3))
  }

  test("pii redact replaces emails, phones, and long digit runs; clean text untouched") {
    import spark.implicits._
    val df = Seq(
      (1L, "Contact Bob.Smith+x@Example.ORG or 555-123-4567; acct 123456789 ok"),
      (2L, "clean text")).toDF("doc_id", "text")
    val out = TextStats.piiRedact(df, "text", "doc_id").collect()
    assert(out(0).getString(1) == "contact [EMAIL] or [PHONE]; acct [ID_LIKE] ok")
    assert(out(1).getString(1) == "clean text")
  }

  test("token histogram buckets by BPE token count, integer arithmetic") {
    import spark.implicits._
    val df = Seq(
      (1L, "a b c"),                                                     // 3 → bucket 0
      (2L, "one two three four five six seven eight nine ten elf zwo"),  // 12 → bucket 10
      (3L, "x")                                                          // 1 → bucket 0
    ).toDF("doc_id", "text")
    val got = TextStats.tokenHistogram(df, "text").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toSeq
    assert(got == Seq(0L -> 2L, 10L -> 1L))
  }

  test("curation report: dup flags from one content-group window, min-id survivor") {
    import spark.implicits._
    val df = Seq(
      (1L, "the a fast"), (2L, "the a fast"),  // content dup pair → survivor 1
      (3L, "unique words here")
    ).toDF("doc_id", "text")
    val out = TextStats.curationReport(df, "text", "doc_id").collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getBoolean(4) && out(1L).getBoolean(5))   // dup + survivor
    assert(out(2L).getBoolean(4) && !out(2L).getBoolean(5))  // dup, not survivor
    assert(!out(3L).getBoolean(4) && out(3L).getBoolean(5))  // unique is its own survivor
    assert(out(1L).getInt(1) == 3)                           // n_tokens
    assert(out(1L).getString(3) == "en")                     // marker argmax
  }

  test("keyword search: integer score, hit count, id tiebreak, word boundaries") {
    import spark.implicits._
    val df = Seq(
      (1L, "spark join spark"),   // score 3, 2 terms
      (2L, "query"),              // score 1
      (3L, "nothing here"),       // dropped
      (4L, "query"),              // score 1 — tie with 2, later id
      (5L, "sparkle queryx")      // boundary: must NOT match
    ).toDF("doc_id", "text")
    val out = TextStats.keywordSearch(df, "text", "doc_id",
      Seq("spark", "query", "join"), 10).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L, 4L))
    assert(out(0).getLong(1) == 3L && out(0).getInt(2) == 2)
    assert(out(1).getLong(1) == 1L && out(1).getInt(2) == 1)
  }

  test("tfidf top-k ranks by rational idf with deterministic term ties") {
    val docs = graft.Tables.documents(spark, Sf)
    val rows = TextStats.tfidfTopK(docs, "text", "doc_id", 3).collect()
    val perDoc = rows.groupBy(_.getLong(0))
    assert(perDoc.size == docs.count(), "every document gets a top-k")
    perDoc.values.foreach { rs =>
      assert(rs.map(_.getInt(1)).sorted.sameElements(1 to 3))
    }
    // direct recomputation for the lowest-id document
    val texts = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val n = texts.length
    val dfreq = texts.flatMap(_._2.split(" ").distinct)
      .groupBy(identity).view.mapValues(_.length).toMap
    val (id0, t0) = texts.minBy(_._1)
    val top = t0.split(" ").groupBy(identity).view.mapValues(_.length).toSeq
      .map { case (term, tf) =>
        (term, tf.toDouble * ((n + 1).toDouble / (dfreq(term) + 1).toDouble)) }
      .sortBy { case (term, s) => (-s, term) }.take(3)
    val got = rows.filter(_.getLong(0) == id0).sortBy(_.getInt(1))
      .map(r => (r.getString(2), r.getDouble(3))).toSeq
    assert(got == top)
  }

  test("vocabTopK: exact counts, count-desc token-asc order, k limit") {
    val df = Seq("the cat sat", "the dog sat", "a cat!").toDF("text")
    val rows = TextStats.vocabTopK(df, "text", 3).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    // counts: the:2 cat:2 sat:2 dog:1 a:1 !:1 → top3 ties break token-asc
    assert(rows.toSeq == Seq(("cat", 2L), ("sat", 2L), ("the", 2L)))
  }

  test("bigramLogProb: repeated phrases score higher than shuffled garble") {
    val docs = graft.Tables.documents(spark, Sf)
    val out = TextStats.bigramLogProb(docs, "text", "doc_id").collect()
    // every doc with ≥2 tokens scores; all logprobs are negative
    assert(out.forall(r => r.getLong(1) >= 1 && r.getDouble(2) < 0.0))
    // a corpus-frequent bigram scores above an unseen-word pairing
    val df = Seq((1L, "the quick fox the quick fox the quick fox"),
      (2L, "zqzq wxwx vbvb nmnm zqzq wxwx")).toDF("doc_id", "text")
    val s = TextStats.bigramLogProb(df, "text", "doc_id").collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(s(1L) > s(2L), s"frequent phrases must outscore garble: $s")
    // partitioning invariance (ordered per-doc sums)
    val a = TextStats.bigramLogProb(docs.repartition(7), "text", "doc_id").collect()
      .map(r => (r.getLong(0), r.getDouble(2))).toMap
    assert(out.forall(r => a(r.getLong(0)) == r.getDouble(2)))
  }

  test("hashEmbed: counts conserve token mass, 64 buckets, partition-invariant") {
    val docs = graft.Tables.documents(spark, Sf)
    val out = TextStats.hashEmbed(docs, "text", "doc_id").collect()
    assert(out.length == docs.count())
    val vecs = out.map(r => r.getLong(0) -> r.getString(1).split(",").map(_.toInt))
    assert(vecs.forall(_._2.length == 64))
    // Σ bucket counts per doc == that doc's BPE token count
    val tokCounts = TextStats.tokenCount(docs, "text", "doc_id").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    vecs.foreach { case (id, v) => assert(v.sum == tokCounts(id), s"doc $id") }
    // stateless and deterministic under any layout
    val again = TextStats.hashEmbed(docs.repartition(9), "text", "doc_id").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.forall(r => again(r.getLong(0)) == r.getString(1)))
  }

  test("bpePairs: adjacent-pair counts match a naive recount; 1-token docs drop") {
    val df = Seq("the cat the cat", "the cat", "solo").toDF("text")
    val rows = TextStats.bpePairs(df, "text", 10).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    // pairs: (the,cat)×3, (cat,the)×1; "solo" has no pair
    assert(rows == Map(("the", "cat") -> 3L, ("cat", "the") -> 1L))
    // order: count desc, then token asc; k bounds the output
    val top1 = TextStats.bpePairs(df, "text", 1).collect()
    assert(top1.length == 1 && top1(0).getString(0) == "the")
    // corpus-level: total pair mass = Σ max(len−1, 0) over BPE tokens
    val docs = graft.Tables.documents(spark, Sf)
    val total = TextStats.bpePairs(docs, "text", Int.MaxValue)
      .agg(sum("n")).collect()(0).getLong(0)
    val expected = docs.select(
        greatest(size(regexp_extract_all(lower(col("text")),
          lit(TextStats.BpeTokenPattern), lit(0))) - 1, lit(0)).as("m"))
      .agg(sum("m")).collect()(0).getLong(0)
    assert(total == expected)
  }

  test("bm25: tf raises, saturates, and length normalizes; rare term outweighs common") {
    val df = Seq(
      (1L, "spark spark spark spark spark spark filler filler"),  // high tf
      (2L, "spark filler filler filler filler filler filler x"),  // tf=1, same dl
      (3L, "spark " + Seq.fill(60)("pad").mkString(" ")),         // tf=1, long doc
      (4L, "join filler filler filler filler filler filler xx"),  // rare term (df=1)
      (5L, "no terms here at all just words"))
      .toDF("doc_id", "text")
    val out = TextStats.bm25Search(df, "text", "doc_id",
        Seq("spark", "join"), 10).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(!out.contains(5L), "zero-hit docs drop")
    assert(out(1L) > out(2L), "higher tf scores higher")
    assert(out(1L) < out(2L) * 6, "tf saturation: 6x tf is far less than 6x score")
    assert(out(2L) > out(3L), "longer doc is penalized at equal tf")
    // 'join' appears in 1 of 5 docs, 'spark' in 3 of 5 → rare-term idf
    // dominates at equal tf and comparable length
    assert(out(4L) > out(2L), "rarer term outweighs common term")
  }

  test("bm25: n_terms_hit counts distinct matched terms; ranking deterministic") {
    val df = Seq(
      (1L, "spark join query"),
      (2L, "spark spark spark")).toDF("doc_id", "text")
    val rows = TextStats.bm25Search(df, "text", "doc_id",
      Seq("spark", "query", "join"), 10).collect()
    val hits = rows.map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(hits(1L) == 3 && hits(2L) == 1)
    assert(rows.head.getLong(0) == 1L, "three distinct terms outrank repeated one")
  }
}
