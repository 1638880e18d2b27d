package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Trainable BPE: merge learning on the classic word-histogram
  * fixture, rank-order encode semantics, distributed/driver parity,
  * and the sequential-replay property the CORRECTNESS oracle leans
  * on. */
class BpeSpec extends SparkSpec {

  import spark.implicits._

  test("trainMerges learns the textbook merge sequence on the classic " +
      "low/lower/newest/widest histogram") {
    // hand-computed: pair counts weighted by word frequency —
    // (e,s)=9 and (s,t)=9 tie, lexicographic picks (e,s); then
    // (es,t)=9; then (l,o)=7 ties (o,w)=7, lex picks (l,o); then
    // (lo,w)=7.
    val hist = Array(("low", 5L), ("lower", 2L), ("newest", 6L),
      ("widest", 3L))
    val merges = Bpe.trainMerges(hist, numMerges = 4)
    assert(merges == Seq(("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w")),
      s"got $merges")
  }

  test("trainMerges stops early when the best pair falls below minCount") {
    val hist = Array(("ab", 1L), ("cd", 1L))
    assert(Bpe.trainMerges(hist, numMerges = 10, minCount = 2L).isEmpty)
    assert(Bpe.trainMerges(hist, numMerges = 10, minCount = 1L).size == 2)
  }

  test("encodeWord merges the LOWEST-RANK pair first, not the leftmost") {
    // ranks [(a,b),(b,c)] on "abc": (a,b) wins -> [ab, c];
    // flipped ranks: (b,c) wins -> [a, bc]
    assert(Bpe.encodeWord("abc",
      Map(("a", "b") -> 0, ("b", "c") -> 1)).toSeq == Seq("ab", "c"))
    assert(Bpe.encodeWord("abc",
      Map(("b", "c") -> 0, ("a", "b") -> 1)).toSeq == Seq("a", "bc"))
  }

  test("encodeWord merges all occurrences and chains onto merged tokens") {
    val ranks = Map(("a", "b") -> 0, ("ab", "ab") -> 1)
    assert(Bpe.encodeWord("abab", ranks).toSeq == Seq("abab"))
    assert(Bpe.encodeWord("ababa", ranks).toSeq == Seq("abab", "a"))
    // unknown characters pass through untouched
    assert(Bpe.encodeWord("xyz", ranks).toSeq == Seq("x", "y", "z"))
    assert(Bpe.encodeWord("", ranks).isEmpty)
  }

  test("withBpeTokens equals a driver-side replay over real documents, " +
      "and more merges never increase the token count") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .limit(50).select("doc_id", "text").cache()
    val merges = Bpe.train(docs, "text", numMerges = 12, maxVocab = 1000)
    assert(merges.size == 12)
    val ranks = merges.zipWithIndex.toMap
    val got = Bpe.withBpeTokens(docs, "text", merges)
      .select("doc_id", "n_tokens", "encoded").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    val few = Bpe.withBpeTokens(docs, "text", merges.take(3))
      .select("doc_id", "n_tokens").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    docs.collect().foreach { r =>
      val id = r.getLong(0)
      val words = Bpe.preTokenize(r.getString(1))
      val toks = words.map(w => Bpe.encodeWord(w, ranks))
      val wantN = toks.map(_.length.toLong).sum
      val wantEnc = toks.map(_.map(_ + ";").mkString("")).mkString(" ")
      assert(got(id)._1 == wantN, s"doc $id token count")
      assert(got(id)._2 == wantEnc, s"doc $id canonical form")
      assert(few(id) >= wantN, s"doc $id: more merges grew the count")
    }
    docs.unpersist()
  }

  test("the fixed oracle merge list replays as SEQUENTIAL replaces: " +
      "iterative lowest-rank encode == one replace pass per merge") {
    // the CORRECTNESS entry's oracle applies each merge as one global
    // string replace over the ;-terminated form, in rank order. That
    // equals real BPE iff no merge's left part is a proper suffix of
    // any other token (no false boundary match) and each merge only
    // builds on earlier ranks — properties this list was chosen for
    // and this test pins against the engine encoder.
    val merges = Queries_bpeFixedMerges
    val ranks = merges.zipWithIndex.toMap
    val vocab = Seq("query", "scan", "join", "batch", "key", "table",
      "value", "qu", "scanscan", "joins", "subquery", "batches",
      "quasar", "jo", "ba", "squash")
    vocab.foreach { w =>
      val iterative = Bpe.encodeWord(w, ranks).map(_ + ";").mkString("")
      var seq = w.map(c => s"$c;").mkString("")
      merges.foreach { case (l, r) =>
        seq = seq.replace(s"$l;$r;", s"$l$r;")
      }
      assert(iterative == seq, s"word '$w': iterative=$iterative seq=$seq")
    }
  }

  private def Queries_bpeFixedMerges: Seq[(String, String)] =
    graft.Queries.bpeFixedMerges

  test("preTokenize is Unicode-aware: accented Latin, Cyrillic, CJK and " +
      "astral-plane letters survive; punctuation still splits") {
    // the former [a-z0-9] split tokenized ALL of these to nothing —
    // the first real-corpus defect a multilingual user hits
    assert(Bpe.preTokenize("Café au lait, s'il vous plaît!").toSeq ==
      Seq("café", "au", "lait", "s", "il", "vous", "plaît"))
    assert(Bpe.preTokenize("Привет, МИР-42").toSeq ==
      Seq("привет", "мир", "42"))
    assert(Bpe.preTokenize("数据湖,很大。GPT-4モデル").toSeq ==
      Seq("数据湖", "很大", "gpt", "4モデル"))
    assert(Bpe.preTokenize("ΣΟΦΊΑ und Straße").toSeq ==
      Seq("σοφία", "und", "straße"))
    // Gothic 𐌰 (U+10330) is an astral LETTER: must stay one token and
    // one SYMBOL (a UTF-16 split would shear it into surrogate halves)
    val got = Bpe.preTokenize("ahab 𐌰𐌿 ahab")
    assert(got.toSeq == Seq("ahab", "𐌰𐌿", "ahab"))
    assert(Bpe.symbols("𐌰𐌿").toSeq ==
      Seq("𐌰", "𐌿"))
    // the delimiter invariant holds in every script: ; and space are
    // punctuation, never inside a token
    assert(Bpe.preTokenize("a;b c;d").forall(w => !w.contains(';') &&
      !w.contains(' ')))
  }

  test("train + encode work end-to-end on a NON-ASCII corpus: merges " +
      "learn multi-script pairs and the canonical form round-trips") {
    val docs = Seq.tabulate(40) { i =>
      (i.toLong, s"Привет мир ${i % 3} — café плюс 数据 café мир")
    }.toDF("doc_id", "text")
    val merges = Bpe.train(docs, "text", numMerges = 6, maxVocab = 100)
    assert(merges.nonEmpty, "no merges learned on the non-ASCII corpus")
    // the highest-frequency words are Cyrillic/accented — at least one
    // learned merge must involve a non-ASCII symbol
    assert(merges.exists { case (l, r) => (l + r).exists(_ > 127) },
      s"all merges ASCII: $merges")
    val ranks = merges.zipWithIndex.toMap
    val out = Bpe.withBpeTokens(docs, "text", merges)
      .select("doc_id", "n_tokens", "encoded").collect()
    out.foreach { r =>
      assert(r.getLong(1) > 0, s"doc ${r.getLong(0)} tokenized to zero")
    }
    // parity with the driver-side replay, token boundaries included
    val byId = out.map(r => r.getLong(0) -> r.getString(2)).toMap
    docs.collect().foreach { r =>
      val want = Bpe.preTokenize(r.getString(1))
        .map(w => Bpe.encodeWord(w, ranks).map(_ + ";").mkString(""))
        .mkString(" ")
      assert(byId(r.getLong(0)) == want, s"doc ${r.getLong(0)}")
    }
  }

  test("property: BPE encoding is LOSSLESS — tokens concatenate back to " +
      "the word, for random words under random trained merges") {
    val rnd = new scala.util.Random(97)
    for (trial <- 0 until 50) {
      val alpha = "abcdef01"
      val vocabWords = (0 until 30).map(_ =>
        (0 until (1 + rnd.nextInt(8))).map(_ =>
          alpha(rnd.nextInt(alpha.length))).mkString)
      val hist = vocabWords.groupBy(identity)
        .map { case (w, g) => (w, g.size.toLong * (1 + rnd.nextInt(5))) }
        .toArray
      val merges = Bpe.trainMerges(hist, numMerges = 1 + rnd.nextInt(12),
        minCount = 1L)
      val ranks = merges.zipWithIndex.toMap
      for (w <- vocabWords ++ Seq("zzz", "a", "")) {
        val toks = Bpe.encodeWord(w, ranks)
        assert(toks.mkString == w,
          s"trial=$trial lossy encode of '$w': ${toks.toSeq}")
        // every token is either a single char or a learned merge product
        val learned = merges.map { case (l, r) => l + r }.toSet
        toks.foreach(t => assert(t.length == 1 || learned(t),
          s"trial=$trial token '$t' is neither a char nor a learned merge"))
      }
    }
  }
}
