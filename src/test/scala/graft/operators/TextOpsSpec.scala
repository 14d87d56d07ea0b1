package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class TextOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column, text: String)(implicit e: org.apache.spark.sql.Encoder[T]): T =
    Seq(text).toDF("text").select(c.as("v")).as[T].head()

  test("tokenCount handles whitespace runs and empties") {
    assert(one[Int](TextOps.tokenCount(col("text")), "  a  b\tc ") == 3)
    assert(one[Int](TextOps.tokenCount(col("text")), "") == 0)
    assert(one[Int](TextOps.tokenCount(col("text")), "   ") == 0)
    assert(one[Int](TextOps.tokenCount(col("text")), "word") == 1)
  }

  test("punctCount counts only punctuation chars") {
    assert(one[Int](TextOps.punctCount(col("text")), "a, b. c! d? e; f:") == 6)
    assert(one[Int](TextOps.punctCount(col("text")), "no punct here") == 0)
  }

  test("stopwordRatio is fraction of stopword tokens") {
    assert(one[Double](TextOps.stopwordRatio(col("text")), "the cat and a dog") == 0.6)
  }

  test("langId: CJK wins; marker words pick the language; en default") {
    assert(one[String](TextOps.langId(col("text")), "中文文本") == "zh")
    assert(one[String](TextOps.langId(col("text")), "le chat est une merveille") == "fr")
    assert(one[String](TextOps.langId(col("text")), "el perro es una maravilla") == "es")
    assert(one[String](TextOps.langId(col("text")), "der hund ist und das haus") == "de")
    assert(one[String](TextOps.langId(col("text")), "the dog is a marvel") == "en")
    assert(one[String](TextOps.langId(col("text")), "nothing special") == "en")
  }

  test("fingerprint: equal texts agree, prefix-shifted texts share shingle minima") {
    val a = one[String](TextOps.fingerprint(col("text")), "abcdefghijklmnopqrstuvwxyz0123456789")
    val b = one[String](TextOps.fingerprint(col("text")), "abcdefghijklmnopqrstuvwxyz0123456789")
    assert(a == b && a.length == 32)
    // short text: md5 of the whole text
    assert(one[String](TextOps.fingerprint(col("text")), "short") ==
      java.security.MessageDigest.getInstance("MD5")
        .digest("short".getBytes("UTF-8")).map("%02x".format(_)).mkString)
  }

  test("qualityScore stays in [0,1] on varied inputs") {
    for (t <- Seq("", "a", "the and of in to is", "!!!!....;;;;", "x" * 1000)) {
      val q = one[Double](TextOps.qualityScore(col("text")), t)
      assert(q >= 0.0 && q <= 1.0, s"score $q out of range for '$t'")
    }
  }

  test("ngrams: space-joined windows; empty below n tokens; whitespace-safe") {
    assert(one[Seq[String]](TextOps.ngrams(col("text"), 2), "a b c") == Seq("a b", "b c"))
    assert(one[Seq[String]](TextOps.ngrams(col("text"), 3), "  a   b  c ") == Seq("a b c"))
    assert(one[Seq[String]](TextOps.ngrams(col("text"), 2), "solo") == Seq())
    assert(one[Seq[String]](TextOps.ngrams(col("text"), 2), "") == Seq())
    assert(one[Seq[String]](TextOps.ngrams(col("text"), 1), "x y") == Seq("x", "y"))
  }

  test("repetitionScores: hand-checked fractions and the Gopher gate") {
    // "x y x y x y": 2-grams = [x y, y x, x y, y x, x y] -> top "x y"
    // cnt 3 * len 3 = 9 chars over 11 doc chars; no duplicated 5-gram.
    // long all-unique doc: top 2-gram covers only its own chars, so the
    // fraction shrinks with length (a 6-token doc would trip the 0.20
    // gate on its longest 2-gram alone — the gate presumes real docs)
    val unique = (0 until 40).map(i => s"w$i").mkString(" ")
    val df = Seq((1L, "x y x y x y"), (2L, unique)).toDF("doc_id", "text")
    val r = TextOps.repetitionScores(df, "text", "doc_id")
      .orderBy("doc_id")
      .collect()
    assert(r.length == 2)
    assert(r(0).getDouble(1) == 9.0 / 11.0)
    assert(r(0).getDouble(2) == 0.0)
    assert(r(0).getInt(3) == 1) // 0.818 > 0.20
    assert(r(1).getDouble(1) < 0.20)
    assert(r(1).getDouble(2) == 0.0)
    assert(r(1).getInt(3) == 0)
  }

  test("repetitionScores excludes docs the filter cannot measure") {
    val df = Seq((1L, ""), (2L, "   "), (3L, "solo"), (4L, "two tokens"))
      .toDF("doc_id", "text")
    val ids = TextOps.repetitionScores(df, "text", "doc_id")
      .select("doc_id").as[Long].collect().toSet
    assert(ids == Set(4L))
  }

  test("repetitionScores matches a brute-force oracle on random corpora") {
    def brute(text: String): Option[(Double, Double, Int)] = {
      if (text.trim.isEmpty) return None
      val toks = text.trim.split("\\s+").toSeq
      if (toks.length < 2) return None
      val nLen = text.length
      def grams(n: Int): Seq[String] =
        if (toks.length < n) Seq()
        else toks.sliding(n).map(_.mkString(" ")).toSeq
      val top = grams(2).groupBy(identity)
        .map { case (g, occ) => occ.size.toLong * g.length }.max
      val dup = grams(5).groupBy(identity)
        .collect { case (g, occ) if occ.size >= 2 => occ.size.toLong * g.length }
        .sum
      val topF = top.toDouble / nLen
      val dupF = dup.toDouble / nLen
      Some((topF, dupF, if (topF > 0.20 || dupF > 0.15) 1 else 0))
    }
    val rnd = new scala.util.Random(42)
    val vocab = Vector("aa", "b", "ccc", "dd", "e")
    val docs = (0L until 60L).map { i =>
      val len = rnd.nextInt(31)
      (i, Seq.fill(len)(vocab(rnd.nextInt(vocab.length))).mkString(" "))
    }
    val expected = docs.flatMap { case (id, t) => brute(t).map(id -> _) }.toMap
    val got = TextOps.repetitionScores(docs.toDF("doc_id", "text"), "text", "doc_id")
      .collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2), r.getInt(3))))
      .toMap
    assert(got.keySet == expected.keySet)
    for ((id, exp) <- expected)
      assert(got(id) == exp, s"doc $id: got ${got(id)}, expected $exp")
  }

  test("bigramLogProb matches a brute-force corpus LM; short docs absent") {
    // small synthetic corpus with repeated and novel transitions
    val docs = Seq(
      (0L, "the cat sat on the mat"),
      (1L, "the cat sat on the hat"),
      (2L, "zx qv"),          // all-novel transitions -> lowest score
      (3L, "the"),            // 1 token: no bigrams, absent from output
      (4L, "   "),            // blank: absent
      (5L, "the cat the cat the cat"))
    val df = docs.toDF("doc_id", "text")

    // brute-force oracle over raw strings (no hashing)
    val tokss = docs.map { case (id, t) => id -> t.trim.split("\\s+").toSeq }
      .filter { case (_, tk) => tk.nonEmpty && tk.head.nonEmpty }
    val vocabSize = tokss.flatMap(_._2).distinct.size
    val allBigrams = tokss.flatMap { case (_, tk) => tk.sliding(2).filter(_.size == 2).map(b => (b(0), b(1))) }
    val c2 = allBigrams.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val c1 = allBigrams.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val expected = tokss
      .filter(_._2.size >= 2)
      .map { case (id, tk) =>
        val bgs = tk.sliding(2).filter(_.size == 2).map(b => (b(0), b(1))).toSeq
        val s = bgs.map(b => math.log((c2(b) + 1.0)) - math.log((c1(b._1) + vocabSize).toDouble)).sum
        id -> ((bgs.size.toLong, math.round(s / bgs.size * 10000) / 10000.0))
      }.toMap

    val got = TextOps.bigramLogProb(df, "text", "doc_id").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got.keySet == expected.keySet,
      s"short/blank docs must be absent: ${got.keySet} vs ${expected.keySet}")
    for ((id, (nb, lp)) <- expected) {
      assert(got(id)._1 == nb, s"doc $id bigram count")
      assert(math.abs(got(id)._2 - lp) < 5e-4, s"doc $id logprob ${got(id)._2} vs $lp")
    }
    // repeated transitions (doc 5) must outscore all-novel ones (doc 2)
    assert(got(5L)._2 > got(2L)._2)
  }

  test("stupidBackoff: seen bigram scores c12/c1; unseen backs off to α·add-one unigram") {
    // history doc "a b a c": bigrams ab/ba/ac (c1: a=2, b=1); unigrams
    // a2 b1 c1 → N=4, V=3. Batch doc "a b z": (a,b) seen → ln(1/2);
    // (b,z) unseen, z OOV → ln(0.4·(0+1)/(4+3)). Hand-computed nanos:
    // -693147181 + -2862200881 = -3555348062.
    val docs = Seq((1L, "a b a c"), (500L, "a b z")).toDF("doc_id", "text")
    val got = TextOps.stupidBackoff(docs, "text", "doc_id",
        col("doc_id") >= 400)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq((500L, 2L, 1L, -3555348062L)))
  }

  test("textrankKeywords: hub outranks leaves on a star graph, integer-exact") {
    // docs "alpha beta" / "alpha gamma" / "alpha delta": a 4-node star.
    // init = 1e12 div 4; 3 integer PR rounds hand-replayed (python
    // cross-check): hub 620812500000, each leaf 126395833333.
    val docs = Seq((1L, "alpha beta"), (2L, "alpha gamma"), (3L, "alpha delta"))
      .toDF("doc_id", "text")
    val got = TextOps.textrankKeywords(docs, "text", minLen = 4,
        rounds = 3, topK = 50)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq == Seq(
      ("alpha", 620812500000L), ("beta", 126395833333L),
      ("delta", 126395833333L), ("gamma", 126395833333L)))
  }

  test("distributionDrift: identical batch ≈ zero KL and zero OOV; alien batch spikes both") {
    import spark.implicits._
    val hist = (0 until 8).map(i => (i.toLong, "en", "alpha beta gamma delta"))
    // batch A (ids 400+): same distribution as history -> near-zero drift
    val same = (0 until 4).map(i => (400L + i, "en", "alpha beta gamma delta"))
    // batch B (lang fr): disjoint vocabulary from its (tiny) history
    val histFr = Seq((20L, "fr", "un deux trois"))
    val alien = Seq((410L, "fr", "xx1 xx2 xx3 xx4"))
    val df = (hist ++ same ++ histFr ++ alien).toDF("doc_id", "lang", "text")
    val out = TextOps.distributionDrift(df, "text", "lang", col("doc_id") >= 400)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4), r.getLong(5)))).toMap
    assert(out.keySet == Set("en", "fr"))
    val (enB, enH, enV, enOov, enKl) = out("en")
    assert(enB == 16 && enH == 32 && enV == 4)
    assert(enOov == 0.0, s"identical batch has OOV $enOov")
    // identical distributions: KL is exactly 0 only when smoothing
    // ratios match; with B != H the smoothed KL is small, not 0
    assert(math.abs(enKl) < 50_000_000L, s"identical batch KL $enKl nano")
    val (frB, frH, frV, frOov, frKl) = out("fr")
    assert(frB == 4 && frH == 3 && frV == 7)
    assert(frOov == 1.0, s"alien batch OOV $frOov")
    assert(frKl > enKl.abs * 5, s"alien KL $frKl not above identical $enKl")
  }

  test("distributionDrift: languages with no batch docs are absent, not divide-by-zero") {
    import spark.implicits._
    val df = Seq((1L, "en", "a b c"), (2L, "de", "x y z"),
        (400L, "en", "a b d")).toDF("doc_id", "lang", "text")
    val out = TextOps.distributionDrift(df, "text", "lang", col("doc_id") >= 400)
      .collect().map(_.getString(0)).toSet
    assert(out == Set("en"), s"history-only lang leaked: $out")
  }

  test("perplexityBuckets: fluent docs head, gibberish tail, per language") {
    import spark.implicits._
    // per lang: every third doc repeats a common bigram (high LM score);
    // the rest are doc-unique gibberish (every bigram count 1 — all land
    // in one bin, carrying 2/3 of each language's mass, so both tercile
    // cutoffs sit on the gibberish bin and the middle bucket is empty)
    val docs = (0 until 60).map { i =>
      val lang = if (i % 2 == 0) "aa" else "bb"
      val text = if (i % 3 == 0) Seq.fill(10)("the cat").mkString(" ")
        else (0 until 10).map(j => s"tok${i}_$j").mkString(" ")
      (i.toLong, lang, text)
    }.toDF("doc_id", "lang", "text")
    val out = TextOps.perplexityBuckets(docs, "text", "lang", "doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3)))
    assert(out.length == 60) // every doc has >= 2 tokens, so all are scored
    for (lang <- Seq("aa", "bb")) {
      val rows = out.filter(_._2 == lang)
      def of(b: String) = rows.filter(_._4 == b)
      assert(of("tail").forall(r => r._1 % 3 != 0), s"$lang: fluent doc in tail")
      assert(of("head").forall(r => r._1 % 3 == 0), s"$lang: gibberish in head")
      assert(of("middle").isEmpty, s"$lang: two score bins can't fill three buckets")
      // bucket boundaries respect bin order
      assert(of("tail").map(_._3).max < of("head").map(_._3).min)
    }
  }

  test("perplexityBuckets and dsirSelect: empty corpus yields empty output") {
    import spark.implicits._
    val empty = Seq.empty[(Long, String, String)].toDF("doc_id", "lang", "text")
    assert(TextOps.perplexityBuckets(empty, "text", "lang", "doc_id").count() == 0)
    assert(TextOps.dsirSelect(empty, "text", "lang", "doc_id",
      col("lang") === "en").count() == 0)
  }

  test("dsirSelect keeps the target-like quarter, exactly ceil(n/4), deterministic ranks") {
    import spark.implicits._
    // 10 target docs share one vocabulary; 30 raw docs are doc-unique —
    // target-bucket log-ratios are the only large positive weights, so
    // the kept quarter is exactly the target slice
    val docs = (0 until 40).map { i =>
      if (i < 10) (i.toLong, "en", "alpha beta gamma delta alpha beta gamma delta")
      else (i.toLong, "xx", (0 until 8).map(j => s"w${i}_$j").mkString(" "))
    }.toDF("doc_id", "lang", "text")
    val out = TextOps.dsirSelect(docs, "text", "lang", "doc_id",
        col("lang") === "en").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.length == 10, s"ceil(40/4) = 10, got ${out.length}")
    assert(out.forall(_._2 == "en"), s"non-target doc selected: $out")
    // identical target texts -> identical weights -> ranks tie by doc_id
    assert(out.sortBy(_._1).map(_._5).toSeq == (1L to 10L))
    assert(out.map(_._4).distinct.length == 1)
  }

  test("tokenEntropy matches the brute-force definition; edge cases") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a a a a"),                 // single type: entropy 0
      (2L, "a b c d"),                 // uniform: ln(4)
      (3L, "a a b"),                   // skewed
      (4L, "  "),                      // no tokens: excluded
      (5L, "x")                        // one token: entropy 0
    ).toDF("doc_id", "text")
    val got = TextOps.tokenEntropy(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    def brute(toks: Seq[String]): Long = {
      val n = toks.length.toDouble
      toks.groupBy(identity).values.map { g =>
        math.round((g.length / n) * math.log(n / g.length) * 1e9)
      }.sum
    }
    assert(!got.contains(4L))
    assert(got(1L) == ((4L, 1L, 0L)))
    assert(got(5L) == ((1L, 1L, 0L)))
    assert(got(2L) == ((4L, 4L, brute(Seq("a", "b", "c", "d")))))
    // uniform over 4 types ≈ ln(4) nats (within 4 half-ulps of per-term rounding)
    assert(math.abs(got(2L)._3 - math.log(4d) * 1e9) <= 2)
    assert(got(3L) == ((3L, 2L, brute(Seq("a", "a", "b")))))
  }

  test("pmiCollocations: hand-computed PMI, count floor, deterministic rank") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b a b"),   // bigrams (a,b) x2, (b,a) x1
      (2L, "a b c"),     // (a,b), (b,c)
      (3L, "c c")        // (c,c)
    ).toDF("doc_id", "text")
    // N_uni = 9 (a=3, b=3, c=3), N_bi = 6; floor 2 keeps only (a,b)=3
    val got = TextOps.pmiCollocations(docs, "text", minCount = 2L, topK = 10)
      .collect().map(r =>
        (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getInt(4)))
    val expNano = math.round((math.log(3) - math.log(6) - math.log(3)
      - math.log(3) + 2 * math.log(9)) * 1e9)
    assert(got.toSeq == Seq(("a", "b", 3L, expNano, 1)))
    // and the floor is real: dropping it admits the count-1 pairs
    val all = TextOps.pmiCollocations(docs, "text", minCount = 1L, topK = 10)
      .collect()
    assert(all.length == 4)
  }

  test("contextChunks: window arithmetic, clipped tail, sub-chunk and empty docs") {
    import spark.implicits._
    val tenToks = (1 to 10).map(i => s"t$i").mkString(" ")
    val docs = Seq(
      (1L, tenToks),    // chunk=4, stride=3: starts 1,4,7 (3 chunks)
      (2L, "x y z"),    // shorter than one chunk: single clipped chunk
      (3L, "   ")       // no tokens: excluded
    ).toDF("doc_id", "text")
    val got = TextOps.contextChunks(docs, "text", "doc_id", chunk = 4, stride = 3)
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
      .sortBy(t => (t._1, t._2))
    def h(s: String): String = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(got.toSeq == Seq(
      (1L, 0L, 1L, 4L, h("t1 t2 t3 t4")),
      (1L, 1L, 4L, 4L, h("t4 t5 t6 t7")),
      (1L, 2L, 7L, 4L, h("t7 t8 t9 t10")),
      (2L, 0L, 1L, 3L, h("x y z"))))
    // boundary: exactly one full window -> exactly one chunk
    val one = TextOps.contextChunks(
      Seq((9L, "a b c d")).toDF("doc_id", "text"), "text", "doc_id",
      chunk = 4, stride = 3).collect()
    assert(one.length == 1)
    // one past the window -> a second, 1-token overlap-clipped chunk
    val two = TextOps.contextChunks(
      Seq((9L, "a b c d e")).toDF("doc_id", "text"), "text", "doc_id",
      chunk = 4, stride = 3).collect().map(r => (r.getLong(1), r.getLong(3)))
    assert(two.toSeq.sorted == Seq((0L, 4L), (1L, 2L)))
  }

  test("featureHash: dense zero-filled rows, portable md5 bucket, count-preserving") {
    import spark.implicits._
    val docs = Seq((1L, "a b a"), (2L, "c"), (3L, " ")).toDF("doc_id", "text")
    val got = TextOps.featureHash(docs, "text", "doc_id", dims = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    def bucket(tok: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(tok.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(8)
      java.lang.Long.parseLong(hex, 16) % 4
    }
    // doc 3 has no tokens -> absent entirely; docs 1/2 emit ALL 4 dims
    assert(got.keys.map(_._1).toSet == Set(1L, 2L))
    assert(got.size == 8)
    assert(got((1L, bucket("a"))) >= 2L) // 'a' twice (+'b' if it collides)
    assert((0L to 3L).map(d => got((1L, d))).sum == 3L)
    assert(got((2L, bucket("c"))) == 1L)
    assert((0L to 3L).map(d => got((2L, d))).sum == 1L)
  }

  test("hashLogReg: first GD round reproduces the hand trace; training separates") {
    import spark.implicits._
    def bucket(tok: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(tok.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(8)
      java.lang.Long.parseLong(hex, 16) % 4
    }
    val (ba, bb) = (bucket("a"), bucket("b"))
    assert(ba != bb, "fixture tokens must hash to distinct buckets")
    val docs = Seq((1L, "en", "a a"), (2L, "fr", "b")).toDF("doc_id", "lang", "text")
    val w1 = TextOps.hashLogReg(docs, "text", "doc_id",
        col("lang") === "en", dims = 4, rounds = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // round 1 from w = 0: every logit 0, p = 0.5, d = 10 * 2 docs = 20
    //   grad(a-bucket) = (1 - 0.5) * 2 * 1e6 = 1e6   -> +50000
    //   grad(b-bucket) = (0 - 0.5) * 1 * 1e6 = -5e5  -> floor(-5e5/20) = -25000
    //   grad(bias)     = 0.5 + (-0.5) = 0            -> 0
    assert(w1.keys.toSet == (-1L to 3L).toSet)
    assert(w1(ba) == 50000L)
    assert(w1(bb) == -25000L)
    assert(w1(-1L) == 0L)
    assert((-1L to 3L).filterNot(Set(ba, bb)).forall(d => w1(d) == 0L))
    // more rounds keep pushing the separating signs outward
    val w3 = TextOps.hashLogReg(docs, "text", "doc_id",
        col("lang") === "en", dims = 4, rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(w3(ba) > w1(ba) && w3(bb) < w1(bb))
  }

  test("rakeKeyphrases: hand-scored phrases, exact two-step division") {
    import spark.implicits._
    val docs = Seq(
      // islands: [deep learning] x2 -> deg(deep)=deg(learning)=4, freq=2
      (1L, "deep learning of deep learning"),
      // islands: [alpha beta], [alpha beta gamma] ->
      //   alpha/beta: freq 2, deg 5 -> (5 div 2)e6 + (1e6 div 2) = 2500000
      //   gamma: freq 1, deg 3 -> 3000000
      (2L, "alpha beta and alpha beta gamma"),
      (3L, "systems")).toDF("doc_id", "text")
    val got = TextOps.rakeKeyphrases(docs, "text", "doc_id", topK = 10)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4)))
      .toMap
    assert(got("alpha beta gamma") == ((3L, 1L, 8000000L, 1)))
    assert(got("alpha beta") == ((2L, 1L, 5000000L, 2)))
    assert(got("deep learning") == ((2L, 2L, 4000000L, 3)))
    assert(got("systems") == ((1L, 1L, 1000000L, 4)))
    assert(got.size == 4)
  }
}
