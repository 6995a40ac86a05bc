package graft

import graft.functions.{FastText, FastVec}
import org.apache.spark.sql.functions._

/** graft_bpe_count must agree EXACTLY with the regex definition it fuses
  * (`size(regexp_extract_all(s, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0))`) — that
  * regex is the x7 oracle, so any divergence is a correctness bug, not a
  * perf tradeoff.
  */
class FastTextSpec extends SparkSpec {
  import spark.implicits._

  private val tricky = Seq(
    "",
    " ",
    "    ",
    "hello world",
    "abc123def",
    "a1b2 c3!d4?",
    "!!!",
    "...a...",
    "MIXED Case 42",
    "tabs\tand\nnewlines count as punctuation",
    "héllo wörld",          // non-ASCII letters → single-char tokens
    "emoji 😀 ok", // supplementary code point (4-byte UTF-8)
    "ß sharp",
    "trailing space ",
    " leading",
    "double  space",
    "1234567890",
    "x")

  test("bpe count equals the regex-lexer count on tricky strings") {
    FastVec.register(spark)
    val df = tricky.toDF("text")
      .select(
        col("text"),
        FastText.bpeCount(lower(col("text"))).as("fused"),
        size(expr(
          "regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)"))
          .as("regex"))
    val rows = df.collect()
    rows.foreach { r =>
      assert(r.getInt(1) == r.getInt(2),
        s"mismatch on ${r.getString(0)}: fused=${r.getInt(1)} regex=${r.getInt(2)}")
    }
  }

  test("whitespace-token arithmetic equals size(split)") {
    val df = tricky.toDF("text")
      .select(
        col("text"),
        (length(col("text")) - length(translate(col("text"), " ", "")) + 1)
          .as("arith"),
        size(split(col("text"), " ")).as("split_sz"))
    df.collect().foreach { r =>
      assert(r.getInt(1) == r.getInt(2), s"ws mismatch on '${r.getString(0)}'")
    }
  }

  test("x15: weighted merge-pair counts equal a Scala brute force over the " +
    "raw corpus, and the top-30 is its true prefix") {
    val docs = Tables.table(spark, "/root/testdata/sf0.001", "documents")
      .select("text").as[String].collect()
    val brute = scala.collection.mutable.Map.empty[(String, String), Long]
    docs.flatMap(_.split(" ", -1)).foreach { w =>
      (0 until w.length - 1).foreach { i =>
        val k = (w.substring(i, i + 1), w.substring(i + 1, i + 2))
        brute(k) = brute.getOrElse(k, 0L) + 1L
      }
    }
    val expected = brute.toSeq
      .sortBy { case ((c1, c2), f) => (-f, c1, c2) }.take(30)
      .map { case ((c1, c2), f) => (c1, c2, f) }
    val got = graft.queries.TextAnalysis.x15BpePairs
      .fn(spark, "/root/testdata/sf0.001")
      .as[(String, String, Long)].collect().toSeq
    assert(got == expected)
  }

  test("x16: per-doc detector counts match the injected footer arithmetic, " +
    "and no email/IP/long-digit-run shape survives redaction") {
    val rows = graft.queries.TextAnalysis.x16PiiScrub
      .fn(spark, "/root/testdata/sf0.001")
      .as[(Long, Int, Int, Int, String)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (docId, nEmails, nIps, nRuns, red) =>
      assert(nEmails == 1, s"doc $docId emails $nEmails")
      assert(nIps == 1 + (docId % 3).toInt, s"doc $docId ips $nIps")
      assert(nRuns == 1, s"doc $docId runs $nRuns")
      assert(!red.contains("@"), s"doc $docId leaks an email")
      assert(!"[0-9]{7,}".r.findFirstIn(red).isDefined, s"doc $docId leaks digits")
      assert(!"[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}".r
        .findFirstIn(red).isDefined, s"doc $docId leaks an IP")
      assert(red.contains("<EMAIL>") && red.contains("<IP>") && red.contains("<NUM>"))
    }
  }

  test("x17: the vocab curve reconciles with a brute-force prefix replay — " +
    "cumulative types per decile equal the distinct-type count of the " +
    "corpus prefix, and the curve is monotone") {
    val sf = "/root/testdata/sf0.001"
    val rows = graft.queries.TextAnalysis.x17VocabGrowth.fn(spark, sf)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(rows.map(_._1).toSeq == (0L to 9L))
    val docs = Tables.table(spark, sf, "documents")
      .select("doc_id", "text").as[(Long, String)].collect().sortBy(_._1)
    val n = docs.length
    rows.foreach { case (bucket, _, _, cumTokens, vocab, _) =>
      // prefix = all docs whose decile <= bucket
      val prefix = docs.filter { case (id, _) => math.min(9L, id * 10 / n) <= bucket }
      val toks = prefix.flatMap(_._2.split(" ", -1))
      assert(cumTokens == toks.length.toLong, s"bucket $bucket cum tokens")
      assert(vocab == toks.distinct.length.toLong, s"bucket $bucket vocab")
    }
    val vocabs = rows.map(_._5)
    assert(vocabs.zip(vocabs.tail).forall { case (a, b) => a <= b }, "vocab not monotone")
  }

  test("graft_ngrams equals the posexplode + lead-window bigram stream " +
    "on the real corpus and on tricky strings") {
    FastVec.register(spark)
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.table(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id").cast("string").as("id"), col("text"))
      .unionByName(tricky.zipWithIndex
        .map { case (t, i) => (s"t$i", t) }.toDF("id", "text"))
    // The r12-replaced formulation, kept here as the semantic pin: every
    // (id, bg, multiplicity) must match exactly — NgramArray keeps
    // duplicates and position order, unlike graft_shingles.
    val w = Window.partitionBy("id").orderBy("pos")
    val windowed = docs
      .select(col("id"), posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
      .select(col("id"),
        concat_ws(" ", col("tok"), lead(col("tok"), 1).over(w)).as("bg"),
        lead(col("tok"), 1).over(w).isNotNull.as("_full"))
      .filter(col("_full"))
      .groupBy("id", "bg").count()
    val fused = docs
      .select(col("id"), explode(FastText.ngrams(col("text"), 2)).as("bg"))
      .groupBy("id", "bg").count()
    assert(windowed.exceptAll(fused).count() == 0)
    assert(fused.exceptAll(windowed).count() == 0)
    // the split(bg, " ", 2) pair recovery used by x11/x25 is lossless
    val pairs = docs
      .select(col("id"), explode(FastText.ngrams(col("text"), 2)).as("bg"))
      .select((split(col("bg"), " ", 2).getItem(0) ===
        split(col("bg"), " ", 2)(0)).as("ok"),
        (concat_ws(" ", split(col("bg"), " ", 2).getItem(0),
          split(col("bg"), " ", 2).getItem(1)) === col("bg")).as("rt"))
    assert(pairs.filter(!col("rt")).count() == 0)
  }

  test("null input → null count") {
    FastVec.register(spark)
    val r = Seq[Option[String]](None).toDF("text")
      .select(FastText.bpeCount(col("text"))).collect()
    assert(r.head.isNullAt(0))
  }
}
