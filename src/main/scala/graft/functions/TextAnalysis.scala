package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale training-data pipelines:
  * normalization, token counting, quality scoring, language ID,
  * fingerprinting. Everything is built from codegen'd
  * `org.apache.spark.sql.functions` column algebra — no UDFs — so the
  * whole feature set stays inside whole-stage codegen and scales as a
  * pure map over the corpus (no shuffle, no driver involvement).
  *
  * These extend the reference's capability surface (its validation ops
  * are the same shape: column-algebra predicates, SURVEY.md §2.9) toward
  * the document/LLM-pipeline operators the engine is expected to own.
  */
object TextAnalysis {

  /** Canonical form: lowercase, trim, whitespace runs collapsed to one
    * space. The shared base for dedup hashing (fingerprints, char-gram
    * winnowing). Tokenization no longer builds on it — see [[tokens]]. */
  def normalize(text: Column): Column =
    regexp_replace(lower(trim(text)), "\\s+", " ")

  /** The Unicode letter/digit RUN-SPLIT class shared by [[tokens]] and
    * [[graft.operators.Bpe]]'s pre-tokenizer: a token is a maximal run
    * of `\p{L}\p{N}` codepoints, everything else is a delimiter. Kept
    * inside the Java∩RE2 regex subset so a DuckDB oracle replays it;
    * Java vs RE2 class membership diverges only on post-Unicode-13
    * codepoints (verified per-codepoint over U+0020..U+2FFFF). */
  val TokenRunSplitRe = "[^\\p{L}\\p{N}]+"

  /** Body (bracket-less) of the Han-ideograph class, so it can embed
    * both as its own class ([[CjkCharRe]]) and inside the negated
    * letters-minus-CJK class of [[TokenExtractRe]]. */
  private val CjkRangesBody =
    "\\x{3400}-\\x{4DBF}\\x{4E00}-\\x{9FFF}\\x{F900}-\\x{FAFF}\\x{20000}-\\x{2FA1F}"

  /** Han ideographs (URO + Ext-A + compatibility + the supplementary
    * blocks) — the scripts with no word delimiters where a run split
    * still yields whole-clause "tokens". Matches BERT's CJK heuristic:
    * each ideograph becomes its own token. Kana and Hangul are NOT
    * split (kana words are multi-character; Hangul syllables compose
    * alphabetically), and neither are Thai/Lao/Khmer — space-free
    * scripts where per-character splitting is wrong and proper
    * segmentation is dictionary work out of this engine's scope.
    * (Thai/Lao/Khmer runs do still break at their combining vowel /
    * tone marks — category Mn, outside `\p{L}\p{N}` — so a clause
    * yields consonant-cluster fragments, not one whole-clause token;
    * WebTextSpec pins that residual behavior.)
    * `\x{...}` escapes parse identically in Java regex and RE2. */
  val CjkCharRe = s"[$CjkRangesBody]"

  /** The ONE-PASS token extraction pattern: a token is either a single
    * Han ideograph or a maximal run of non-CJK letters/digits. The two
    * branches have disjoint start sets (the run element class excludes
    * the CJK ranges), so leftmost-first vs leftmost-longest alternation
    * semantics cannot diverge between engines. `[^\P{L}…]` = "letter
    * AND not CJK" — class intersection spelled as a negated union,
    * because RE2 has no `&&` intersection and no lookahead; everything
    * here stays in the Java∩RE2 subset (verified per-codepoint parity
    * in r15, fused-vs-two-pass equality re-verified in r17 on CJK /
    * Cyrillic / Thai / supplementary-plane fixtures in BOTH engines).
    *
    * Known residual vs the r16 two-pass form: the CJK branch matches
    * by RANGE, so unassigned/non-letter codepoints inside the CJK
    * blocks (e.g. U+2A6F5 in the Ext-B gap, U+FADA past the last
    * compat ideograph) extract as single-char tokens here where the
    * two-pass form (whose run split required `\p{L}\p{N}`) dropped
    * them. Engine and oracle share this constant, so parity holds
    * either way; real corpora don't contain unassigned codepoints. */
  val TokenExtractRe =
    s"$CjkCharRe|(?:\\p{N}|[^\\P{L}$CjkRangesBody])+"

  /** Tokens: lowercase Unicode letter/digit runs, with Han ideographs
    * one-per-character. The former whitespace split scored a whole CJK
    * sentence as ONE token and glued punctuation onto words
    * ("end." ≠ "end"); the run semantics match what [[Bpe]]'s trainer
    * does, so the quality / perplexity / dedup features and the
    * tokenizer see the same word stream. Lowercasing is Spark's
    * `lower()` (= `UTF8String.toLowerCase`), which matches DuckDB
    * `lower()` everywhere but 4 unreachable codepoints. ONE regex
    * extraction pass ([[TokenExtractRe]]) — the r16 two-pass form
    * (CJK spacer `regexp_replace`, then run `split`, then an empties
    * filter) scanned and rebuilt every document twice and cost the
    * tokenization-family bench entries ~2.5 s; same results, pure
    * codegen'd column algebra, no UDF, shuffle-free. */
  def tokens(text: Column): Column =
    regexp_extract_all(lower(text), lit(TokenExtractRe), lit(0))

  /** Token count under [[tokens]]. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** md5 hashes of word-level n-gram shingles from a MATERIALIZED
    * tokens column — the decontamination unit: sharing one n-token
    * sequence with an eval document marks contamination (the long-gram
    * overlap rule GPT-3/Llama-style dataset papers use). Shorter docs
    * hash as one whole-document shingle; a NULL tokens column yields
    * NULL (not the md5 of an empty string — `concat_ws` swallows null
    * arrays, which would silently conflate null-text documents with
    * empty-text ones and diverge from a relational replay where NULL
    * never equals anything). */
  def tokenNgramHashes(toks: Column, n: Int): Column = {
    val count = size(toks) - (n - 1)
    when(toks.isNull, lit(null).cast("array<string>"))
      .when(count >= 1,
        transform(sequence(lit(0), count - 1),
          i => md5(concat_ws(" ", slice(toks, i + 1, lit(n))))))
      .otherwise(array(md5(concat_ws(" ", toks))))
  }

  /** BPE-ish subword-boundary token count: words, digit runs, and
    * individual punctuation marks each count as one token (a regex
    * approximation of a byte-pair tokenizer's pre-tokenization). */
  def regexTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))

  /** Main-content text extraction from HTML — the first stage of a
    * web-scrape pipeline (script/style/comment blocks dropped whole,
    * tags stripped, the six ubiquitous character entities decoded,
    * whitespace collapsed). Pure regexp column algebra: codegen'd,
    * shuffle-free, and every pattern stays inside the regex subset
    * Java regex and RE2 share (inline (?is) flags, non-greedy spans,
    * no backreferences) so a relational oracle replays it exactly.
    * `&amp;` decodes LAST — decoding it first would double-decode
    * `&amp;lt;` into a live `<`. */
  def htmlExtract(html: Column): Column = {
    val noScript = regexp_replace(html,
      "(?is)<script\\b.*?</script\\s*>", " ")
    val noStyle = regexp_replace(noScript,
      "(?is)<style\\b.*?</style\\s*>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComment, "<[^>]*>", " ")
    val entities = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
    val decoded = entities.foldLeft(noTags) { case (c, (e, v)) =>
      regexp_replace(c, e, v)
    }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** URL canonicalization — the crawl-dedup prep stage (two fetches
    * of one page must collapse to one key): fragment dropped,
    * scheme+host lowercased (path case is significant and stays),
    * default ports stripped, tracking parameters (utm_*, fbclid,
    * gclid) removed with the query separator repaired, a dangling
    * `?` dropped. Deterministic regexp column algebra in the
    * Java∩RE2 subset (replay-exact relationally); the sequential
    * global passes handle runs of tracking params without loops. */
  def urlCanonicalize(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*", "")
    val prefix = "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*"
    val lowered = concat(
      lower(regexp_extract(noFrag, prefix, 0)),
      regexp_replace(noFrag, prefix, ""))
    val noPort = regexp_replace(
      regexp_replace(lowered, "^(http://[^/:?#]+):80([/?]|$)", "$1$2"),
      "^(https://[^/:?#]+):443([/?]|$)", "$1$2")
    // tracker params must be LEFT-ANCHORED on a separator — an
    // unanchored pass would match inside unrelated names ("xgclid")
    // and values ("?q=gclid=..."). Stripping the LEADING separator
    // keeps runs removable in one global pass (consuming the trailing
    // '&' would swallow the next run member's anchor); when the '?'
    // itself was consumed, the repair pass promotes the first '&'.
    val trackers = "(utm_[a-z]+|fbclid|gclid)"
    val cleaned = regexp_replace(noPort, "[?&]" + trackers + "=[^&#]*", "")
    val repaired = regexp_replace(cleaned, "^([^?&]*)&", "$1?")
    regexp_replace(repaired, "\\?$", "")
  }

  /** Fraction of characters that are sentence punctuation. */
  def punctRatio(text: Column): Column = {
    val n = length(text).cast("double")
    val p = length(regexp_replace(text, "[^.,!?;:]", "")).cast("double")
    when(n > 0, p / n).otherwise(lit(0.0))
  }

  /** Fraction of tokens found in `words` (a small in-plan literal array —
    * broadcast-free; it folds into the generated code). */
  def wordSetRatio(text: Column, words: Seq[String]): Column =
    wordSetRatioOfTokens(tokens(text), words)

  /** Same, from a MATERIALIZED tokens column. Prefer this whenever more
    * than one ratio is computed over the same text: an inline `tokens`
    * expression re-normalizes and re-splits once per ratio (the
    * languageId heuristic alone would tokenize 8+ times per row). */
  def wordSetRatioOfTokens(toks: Column, words: Seq[String]): Column = {
    val hits = size(filter(toks, t => array_contains(lit(words.toArray), t)))
    val n = size(toks)
    when(n > 0, hits.cast("double") / n.cast("double")).otherwise(lit(0.0))
  }

  /** Public, conventional stopword samples per language (tiny on purpose:
    * the heuristic needs discrimination, not coverage). */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "and", "of", "to", "in", "is", "that", "it", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "auf"),
    "fr" -> Seq("le", "la", "les", "et", "un", "une", "est", "pour", "dans", "que"),
    "es" -> Seq("el", "los", "las", "y", "un", "una", "es", "en", "por", "como"))

  /** n-gram-free language ID heuristic: highest stopword-hit ratio wins,
    * ties broken in fixed en>de>fr>es order; high non-ASCII ratio
    * short-circuits to "cjk"; no hits at all → "unknown". */
  def languageId(text: Column): Column =
    languageIdOfTokens(tokens(text), text)

  /** languageId from a MATERIALIZED tokens column (see
    * [[wordSetRatioOfTokens]] for why callers should pre-project it). */
  def languageIdOfTokens(toks: Column, text: Column): Column = {
    val ratios = Seq("en", "de", "fr", "es").map(l => l -> wordSetRatioOfTokens(toks, stopwords(l)))
    val maxR = greatest(ratios.map(_._2): _*)
    val nonAscii = {
      val n = length(text).cast("double")
      val na = length(regexp_replace(text, "[\\x00-\\x7F]", "")).cast("double")
      when(n > 0, na / n).otherwise(lit(0.0))
    }
    // en>de>fr>es tie-break: the innermost when is built first (es), the
    // outermost (en) tested first
    val pickOrdered = ratios.reverse.foldLeft(lit("unknown")) { case (rest, (l, r)) =>
      when(r === maxR && r > 0, lit(l)).otherwise(rest)
    }
    when(nonAscii > 0.3, lit("cjk")).otherwise(pickOrdered)
  }

  /** Composite quality score in [0,1]: length adequacy + low punctuation
    * noise + stopword presence (a cheap fluency proxy). Fixed evaluation
    * order keeps the double arithmetic reproducible across engines. */
  def qualityScore(text: Column): Column =
    qualityScoreOfTokens(tokens(text), text)

  /** qualityScore from a MATERIALIZED tokens column. */
  def qualityScoreOfTokens(toks: Column, text: Column): Column = {
    val lenTerm = least(size(toks).cast("double") / lit(100.0), lit(1.0))
    val punctTerm = lit(1.0) - punctRatio(text)
    val stopTerm = least(wordSetRatioOfTokens(toks, stopwords("en")) * lit(5.0), lit(1.0))
    round(lenTerm * lit(0.4) + punctTerm * lit(0.3) + stopTerm * lit(0.3), 6)
  }

  /** Repetition / boilerplate signals (Gopher-style corpus quality):
    * all from a MATERIALIZED tokens column, all narrow column algebra.
    * Degenerate or machine-repeated text scores high; use as filter
    * inputs alongside [[qualityScore]]. */

  /** 1 − distinct/total tokens: overall token repetition. */
  def dupTokenFrac(toks: Column): Column = {
    val n = size(toks)
    when(n > 0, round(lit(1.0) -
      size(array_distinct(toks)).cast("double") / n.cast("double"), 6))
      .otherwise(lit(0.0))
  }

  /** Frequency of the single most common token over total tokens — the
    * classic "most common word fraction" signal. One O(n) pass over the
    * SORTED tokens tracking the longest equal run (sorting groups equal
    * tokens, so max run = max frequency); no per-token rescan. */
  def topTokenFrac(toks: Column): Column = {
    val n = size(toks)
    val best = aggregate(
      sort_array(toks),
      struct(lit("").as("prev"), lit(0).as("run"), lit(0).as("best")),
      (acc, x) => {
        val run = when(x === acc.getField("prev"), acc.getField("run") + 1)
          .otherwise(lit(1))
        struct(x.as("prev"), run.as("run"),
          greatest(acc.getField("best"), run).as("best"))
      },
      acc => acc.getField("best"))
    when(n > 0, round(best.cast("double") / n.cast("double"), 6))
      .otherwise(lit(0.0))
  }

  /** Word bigrams (NOT deduplicated — repetition needs raw counts),
    * built by zipping the token array against itself shifted by one:
    * both slices are row-level (evaluated once), the lambda touches
    * only its own pair. n−1 bigrams for n ≥ 2 tokens, else empty. */
  def tokenBigrams(toks: Column): Column = {
    val n = size(toks)
    when(n >= 2,
      zip_with(slice(toks, lit(1), n - 1), slice(toks, lit(2), n - 1),
        (a, b) => concat(a, lit(" "), b)))
      .otherwise(array().cast("array<string>"))
  }

  /** 1 − distinct/total bigrams: phrase-level repetition (catches
    * looped phrases that token-level stats miss). */
  def dupBigramFrac(toks: Column): Column = {
    val bg = tokenBigrams(toks)
    val nb = size(bg)
    when(nb > 0, round(lit(1.0) -
      size(array_distinct(bg)).cast("double") / nb.cast("double"), 6))
      .otherwise(lit(0.0))
  }

  /** Document fingerprint: md5 of the normalized text — the exact-dedup
    * key. (md5 rather than xxhash so external engines can reproduce it.) */
  def fingerprint(text: Column): Column = md5(normalize(text))

  /** Rolling char k-gram hashes of the normalized text — stage 1 of
    * winnowing. MATERIALIZE this column before winnowing: referencing it
    * inline inside the window transform would re-hash every gram once
    * per window (O(n²)). md5 keeps it reproducible outside Spark; a
    * production 100 TB run would swap in xxhash64 (same shape, 10×
    * cheaper). */
  def charGramHashes(text: Column, k: Int = 8): Column =
    charGramHashesOfNorm(normalize(text), k)

  /** Gram hashes from a MATERIALIZED normalized-text column — an inline
    * `normalize` here sits inside the per-gram lambda and re-runs the
    * regex once per character position (O(n²) per doc; measured 20×
    * slower on the corpus). */
  def charGramHashesOfNorm(norm: Column, k: Int = 8): Column = {
    val n = length(norm)
    when(n >= k,
      transform(sequence(lit(1), n - k + 1), i => md5(norm.substr(i, lit(k)))))
      .otherwise(array(md5(norm)))
  }

  /** The whole winnowing fingerprint set (normalize → char-gram md5s →
    * window minima → distinct → sorted) as ONE fused codegen
    * expression over the normalized text — bit-identical to
    * `sort_array(array_distinct(winnowFingerprints(
    * charGramHashesOfNorm(norm, k), w)))` (WinnowFingerprintsSpec pins
    * the parity on the real corpus plus edge shapes). The composable
    * pair below stays as the readable reference implementation; this
    * is the hot path — it hashes gram bytes directly (no O(n) hex
    * array per document) and hex-encodes only surviving minima. */
  def winnowFingerprintsFusedOfNorm(norm: Column, k: Int = 8,
                                    w: Int = 4): Column = {
    import org.apache.spark.sql.graftext.GraftBridge
    GraftBridge.column(graft.functions.expressions.WinnowMd5Fingerprints(
      GraftBridge.expression(norm), k, w))
  }

  /** Winnowing (stage 2): the minimum hash of each sliding window of
    * `w` consecutive gram hashes, deduplicated and sorted — the standard
    * robust fingerprint set (local document edits perturb only nearby
    * windows). `grams` must be a stored column from [[charGramHashes]]. */
  def winnowFingerprints(grams: Column, w: Int = 4): Column = {
    val m = size(grams)
    sort_array(array_distinct(
      when(m >= w,
        transform(sequence(lit(0), m - w),
          j => array_min(slice(grams, j + 1, lit(w)))))
        .otherwise(array(array_min(grams)))))
  }
}
