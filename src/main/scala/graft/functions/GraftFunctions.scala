package graft.functions

import org.apache.spark.sql.{Column, GraftBridge => ExpressionUtils}
import org.apache.spark.sql.catalyst.expressions.{ShiftLeft, ShiftRight, XxHash64}
import org.apache.spark.sql.functions._

/** Column-level building blocks shared by the text / dedup / similarity
  * operators. Everything here composes built-in (codegen'd) expressions —
  * no Scala UDFs — so operators stay inside whole-stage codegen.
  *
  * ANSI note: Spark 4 runs with spark.sql.ansi.enabled=true, where integer
  * overflow THROWS. All hash mixing therefore chains seeded [[XxHash64]]
  * (which wraps internally) instead of the classic `a*h+b` arithmetic.
  */
object GraftFunctions {

  private def ex(c: Column) = ExpressionUtils.expression(c)
  private def co(e: org.apache.spark.sql.catalyst.expressions.Expression) = ExpressionUtils.column(e)

  /** xxhash64 with an explicit seed (the `functions.xxhash64` builtin pins seed=42). */
  def xxhash64Seeded(seed: Long, cols: Column*): Column = co(XxHash64(cols.map(ex), seed))

  /** Bit shifts with Column shift amounts (builtins only take Int literals). */
  def shiftRightC(e: Column, n: Column): Column = co(ShiftRight(ex(e), ex(n)))
  def shiftLeftC(e: Column, n: Column): Column = co(ShiftLeft(ex(e), ex(n)))

  // ---------- tokenization ----------

  /** Whitespace tokens; empty string → empty array.
    *
    * r13-opt adjudication: a fused native tokenizer ([[wsTokensFused]]) was
    * A/B'd against this composition per family at 3-pass isolated minima.
    * The LM/DSIR corpus passes win with the native form (q202 0.94×,
    * q198 0.93×, q206 1.24× vs baseline) and use it explicitly; the
    * BM25/ngram paths measured FASTER with the regex composition
    * (q178 regex 4.62 s vs native 6.27, q180 7.97 vs 9.86, q15 4.65 vs
    * 5.17 — same-session A/B), so the default stays composed. Both forms
    * are bit-identical (WsTokensSpec). */
  def wsTokens(text: Column): Column =
    when(length(trim(text)) === 0, array().cast("array<string>"))
      .otherwise(split(trim(text), "\\s+"))

  /** Fused single-pass native whitespace tokenizer — bit-identical to
    * [[wsTokens]] (WsTokensSpec); used by the LM/DSIR tokenize passes where
    * it measured faster (see the [[wsTokens]] adjudication). */
  def wsTokensFused(text: Column): Column = WsTokens(text)

  def tokenCountWs(text: Column): Column = size(wsTokens(text))

  /** BPE-ish subword count: letter runs capped at 4 chars, single digits,
    * single non-alnum glyphs — a deterministic proxy for a trained BPE
    * vocabulary (same regex is expressible in the DuckDB oracle). */
  val BpeishPattern = "[A-Za-z]{1,4}|[0-9]|[^A-Za-z0-9\\s]"
  def tokenCountBpeish(text: Column): Column = regexp_count(text, lit(BpeishPattern))

  /** Word k-shingles: ["a b c", "b c d", ...]; fewer than k tokens → 1 shingle of all.
    * CORPUS WARNING: `text` is referenced once per output shingle (Catalyst
    * does no CSE), so pass a cheap column here — or tokenize into its own
    * column first and use [[wordShinglesFromTokens]]. */
  def wordShingles(text: Column, k: Int): Column =
    wordShinglesFromTokens(wsTokens(text), k)

  /** [[wordShingles]] over an already-materialized token-array column: the
    * per-shingle slice then touches an attribute, not a re-evaluated
    * tokenization (the no-CSE trap — splitting the text once per shingle
    * made shingling quadratic in document length). */
  def wordShinglesFromTokens(toks: Column, k: Int): Column =
    when(size(toks) <= k, array(concat_ws(" ", toks)))
      .otherwise(transform(
        sequence(lit(0), size(toks) - k),
        i => concat_ws(" ", slice(toks, i + 1, lit(k)))))

  /** Character n-grams of the raw string. */
  def charNgrams(text: Column, n: Int): Column =
    when(length(text) <= n, array(text))
      .otherwise(transform(
        sequence(lit(0), length(text) - n),
        i => text.substr(i + 1, lit(n))))

  /** Z-ORDER (Morton) interleave of the low `bits` bits of two integer
    * columns — multi-dimensional file clustering for the offline store (the
    * Delta OPTIMIZE ZORDER BY semantic, as a pure Column expression): range-
    * partitioning and sorting by the z-value groups rows that are close in
    * BOTH dimensions into the same files, so min/max row-group stats prune
    * 2-dim predicates that a single-column sort can only prune on its
    * leading column. Pure bit algebra (shift/and/or), so it runs inside
    * whole-stage codegen AND an ANSI oracle evaluates it bit-for-bit.
    * Locality property (bounding-box shrink under range partitioning) is
    * asserted in FunctionsSpec. Quantize inputs to `bits` (e.g. by ranking
    * or fixed-width bucketing) before interleaving — values above the mask
    * wrap, which destroys locality but not correctness. */
  def zOrder2(a: Column, b: Column, bits: Int = 16): Column = zOrderN(Seq(a, b), bits)

  /** N-dimensional Morton interleave (the general OPTIMIZE ZORDER BY shape
    * — real Delta tables z-order 3+ columns routinely): bit i of column j
    * lands at position n·i + j, which for n = 2 reproduces [[zOrder2]]'s
    * layout bit-for-bit (a→even, b→odd positions), so the q82 oracle and
    * the FunctionsSpec locality property carry over unchanged. Still pure
    * shift/and/or algebra — whole-stage codegen'd, ANSI-oracle-replayable.
    * n·bits must fit a signed long (≤ 63 interleaved bits). */
  def zOrderN(cols: Seq[Column], bits: Int): Column = {
    val n = cols.size
    require(n >= 2, s"zOrderN needs >= 2 columns, got $n")
    require(bits >= 1 && n * bits <= 63,
      s"need 1 <= bits and n*bits <= 63, got n=$n bits=$bits")
    val mask = (1L << bits) - 1
    val masked = cols.map(_.cast("long").bitwiseAND(lit(mask)))
    (0 until bits).flatMap { i =>
      masked.zipWithIndex.map { case (c, j) =>
        shiftLeftC(shiftright(c, i).bitwiseAND(lit(1L)), lit(n * i + j))
      }
    }.reduce(_.bitwiseOR(_))
  }

  /** Training-data cleaning: mask emails and URLs (the cheap PII pass every
    * LLM pipeline runs before tokenization). Patterns stay in the common
    * subset of Java regex and RE2 so the DuckDB oracle evaluates identically. */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val UrlPattern = "https?://[^\\s]+"
  def scrubPii(text: Column): Column =
    regexp_replace(regexp_replace(text, lit(EmailPattern), lit("<EMAIL>")),
      lit(UrlPattern), lit("<URL>"))

  /** Collapse runs of whitespace to single spaces and trim. */
  def normalizeWs(text: Column): Column = trim(regexp_replace(text, lit("\\s+"), lit(" ")))

  /** Deterministic, ENGINE-PORTABLE bucket assignment for reproducible
    * train/test/holdout splits: bucket = first 8 hex chars of md5(key) mod n.
    * md5 (not xxhash64) on purpose — any system (DuckDB, Python, SQL) can
    * re-derive the exact same split, which is what makes a training-data
    * split auditable. A row's bucket never changes as the corpus grows
    * (content-addressed, not positional like randomSplit). */
  def hashSplitBucket(key: Column, nBuckets: Int): Column =
    (conv(substring(md5(key.cast("string")), 1, 8), 16, 10).cast("long")
      % nBuckets).cast("long")

  /** Deterministic weighted Bernoulli keep-predicate: row kept with
    * probability weight/maxWeight, decided by the row's own content hash —
    * importance sampling for corpus selection (sample long/high-quality
    * documents preferentially) that is reproducible row-for-row on any
    * engine, map-only, and join-free. The u32 draw u = md5₃₂(key) is
    * compared as `u · maxWeight < weight · 2³²` in exact integer algebra
    * (no fp rounding at the boundary). Requires 0 ≤ weight ≤ maxWeight and
    * maxWeight · 2³² within long range (maxWeight < 2³¹). */
  def weightedKeep(key: Column, weight: Column, maxWeight: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 8), 16, 10).cast("long") * maxWeight <
      weight.cast("long") * lit(4294967296L)

  // ---------- MinHash / SimHash / fingerprinting ----------

  /** MinHash signature (k independent seeded hashes) over a set column.
    * One pass per seed; all inside codegen. For corpora prefer
    * [[minhashSignatureFromHashes]] over a once-hashed long set — hashing the
    * raw strings k times re-reads every string's bytes k× (measured: the
    * string re-hashing dominated the whole minhash pipeline). */
  def minhashSignature(set: Column, k: Int): Column =
    array((0 until k).map { i =>
      array_min(transform(set, x => xxhash64Seeded(i.toLong, x)))
    }: _*)

  /** MinHash signature derived from PRE-HASHED set elements (longs): the k
    * "independent" hash functions are seeded re-hashes of the 64-bit element
    * hash — one string pass total instead of k. Distribution-equivalent for
    * LSH purposes (hash of a uniform hash is uniform per seed). */
  def minhashSignatureFromHashes(hashes: Column, k: Int): Column =
    array((0 until k).map { i =>
      array_min(transform(hashes, h => xxhash64Seeded(i.toLong, h)))
    }: _*)

  /** LSH band keys for a minhash signature: `bands` hashes, each over
    * `rowsPerBand` consecutive signature slots. */
  def lshBandKeys(sig: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map { b =>
      xxhash64Seeded(9000L + b,
        (0 until rowsPerBand).map(j => element_at(sig, b * rowsPerBand + j + 1)): _*)
    }: _*)

  /** Token hashes for simhash — materialize as a column before
    * [[simhash64FromHashes]] (same no-CSE rationale as [[winnowingHashes]]:
    * referencing the hash inside the 64-slot vote lambda recomputes the
    * string hash once PER BIT). */
  def simhashTokenHashes(tokens: Column): Column =
    transform(tokens, t => xxhash64Seeded(7L, t))

  /** 64-bit SimHash from MATERIALIZED token hashes: per-bit +1/-1 votes,
    * sign → bit. Single aggregate pass (zip_with over a 64-slot
    * accumulator), entirely built-in expressions. */
  def simhash64FromHashes(hashes: Column): Column = {
    val bitIdx = sequence(lit(0), lit(63))
    aggregate(
      hashes,
      array_repeat(lit(0L), 64),
      (acc, h) =>
        zip_with(acc, bitIdx, (a, i) =>
          a + when(shiftRightC(h, i).bitwiseAND(lit(1L)) === 1L, 1L).otherwise(-1L)),
      acc => aggregate(
        zip_with(acc, bitIdx, (c, i) =>
          when(c > 0L, shiftLeftC(lit(1L), i)).otherwise(lit(0L))),
        lit(0L), (s, x) => s.bitwiseOR(x)))
  }

  /** One-shot convenience for short inputs; for corpora materialize
    * [[simhashTokenHashes]] first. */
  def simhash64(tokens: Column): Column = simhash64FromHashes(simhashTokenHashes(tokens))

  /** Hamming distance between two 64-bit simhashes. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Split a 64-bit simhash into `bands` equal bit-bands (LSH for hamming
    * distance: near-dups within radius < bands share ≥1 exact band). */
  def simhashBands(h: Column, bands: Int): Column = {
    val width = 64 / bands
    val mask = lit((1L << width) - 1)
    array((0 until bands).map { b =>
      struct(lit(b).as("band"), shiftRightC(h, lit(b * width)).bitwiseAND(mask).as("key"))
    }: _*)
  }

  /** N-gram hash array for winnowing — materialize this as its own column
    * BEFORE calling [[winnowingFromHashes]]: Catalyst does no common-subexpr
    * elimination across an expression tree, so referencing this HOF result k
    * times would recompute the whole n-gram hashing k times (O(n²·w) per doc
    * — observed minutes per 500 docs). */
  def winnowingHashes(text: Column, n: Int): Column =
    HashedShingles.hashedCharNgrams(lower(text), n,
      HashedShingles.KindXx64, 11L, distinct = false, sorted = false)

  /** Sliding-window min over a MATERIALIZED hash-array column (`least` over w
    * O(1) element_at lookups), sorted distinct — the winnowing fingerprint
    * selection (Schleimer et al., SIGMOD'03), robust to local edits. */
  def winnowingFromHashes(hs: Column, w: Int): Column = {
    val mins = when(size(hs) <= w, array(array_min(hs)))
      .otherwise(transform(sequence(lit(0), size(hs) - w),
        j => least((1 to w).map(k => element_at(hs, j + k)): _*)))
    array_sort(array_distinct(mins))
  }

  /** One-shot convenience for SHORT texts; for real corpora materialize
    * [[winnowingHashes]] first (see its scaladoc). */
  def winnowingFingerprint(text: Column, n: Int, w: Int): Column =
    winnowingFromHashes(winnowingHashes(text, n), w)

  /** ENGINE-PORTABLE variant of [[winnowingHashes]]: 60-bit ints from the
    * first 15 hex chars of md5 (same idea as [[hashSplitBucket]]) instead of
    * xxhash64, so any engine — the DuckDB oracle included — re-derives the
    * exact same fingerprint. Portability is what makes a corpus fingerprint
    * auditable across systems; xxhash64 stays the cheap default when the
    * fingerprint never leaves Spark. Materialize before
    * [[winnowingFromHashes]] (same no-CSE rationale). */
  def winnowingHashesPortable(text: Column, n: Int): Column =
    HashedShingles.hashedCharNgrams(text, n,
      HashedShingles.KindMd5Prefix60, 0L, distinct = false, sorted = false)

  /** ENGINE-PORTABLE 60-bit hash of any string — first 15 hex chars of md5
    * as a long (the [[hashSplitBucket]] / [[winnowingHashesPortable]] rule,
    * factored): any engine re-derives the exact value, so ids built from it
    * can cross an oracle boundary. 60 bits keeps the value positive and the
    * collision rate (~n²/2⁶¹ per corpus) below any realistic noise floor. */
  def portableHash60(s: Column): Column =
    PortableHashRows.md5Prefix60(s) // fused conv∘substring∘md5, bit-identical

  /** Order-sensitive whole-document fingerprint: left-fold hash chaining
    * (ANSI-safe: xxhash64 of (acc, token-hash) instead of overflow arithmetic). */
  def docFingerprint(tokens: Column): Column =
    aggregate(tokens, lit(0L), (acc, t) => xxhash64Seeded(13L, acc, t))

  // ---------- vectors ----------

  /** Dot product via higher-order functions (codegen'd); see
    * [[CosineSimilarity]] for the native-Expression fast path. */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")), lit(0.0), (s, v) => s + v)

  def l2Norm(a: Column): Column = sqrt(dotHof(a, a))

  def cosineHof(a: Column, b: Column): Column = {
    val d = dotHof(a, b); val na = l2Norm(a); val nb = l2Norm(b)
    when(na === 0.0 || nb === 0.0, 0.0).otherwise(d / (na * nb))
  }

  /** Random-hyperplane LSH signature for cosine similarity: `bits` sign bits
    * of dot products with deterministic pseudo-random hyperplanes (hash-derived,
    * seed-stable across executors — no RNG state to ship).
    *
    * The hyperplane matrix (`bits × maxDim` doubles) is precomputed ONCE on
    * the driver and embedded as array literals — component j is the same
    * centered hash in [-0.5, 0.5) as the per-row form round 2 shipped, but
    * evaluated `bits × maxDim` times total instead of per row × bit × element
    * (measured at sf0.1: the per-row hashing dwarfed the dot products ~4:1).
    * Bucket values are bit-identical to the old form for vectors up to
    * `maxDim`; longer vectors are truncated to their first `maxDim`
    * components (sign bits from 256 coordinates are already past diminishing
    * returns for bucketing — raise `maxDim` for very-high-dim corpora; the
    * generated-code size, and with it fixed JIT cost, grows with it).
    * Vectors SHORTER than maxDim contribute only
    * their own elements: zip_with pads the short side with nulls and the
    * lambda maps a null product to 0. Null/empty vectors are the caller's
    * problem — filter them before bucketing. */
  def hyperplaneLshKey(vec: Column, bits: Int, seedBase: Long = 100L, maxDim: Int = 256): Column = {
    import org.apache.spark.sql.catalyst.expressions.XxHash64Function
    import org.apache.spark.sql.types.IntegerType
    (0 until bits).map { b =>
      val plane: Seq[Double] = (0 until maxDim).map { j =>
        val h = XxHash64Function.hash(j, IntegerType, seedBase + b)
        (((h % 1000003L) + 1000003L) % 1000003L).toDouble / 1000003.0 - 0.5
      }
      // zip_with extends to the longer side, so a 64-dim vector zipped with
      // the maxDim-slot literal iterates the padded tail too — but the pad
      // is MEASURED faster than slicing the literal to size(vec) first (the
      // per-row slice more than doubled q16/q47; the padded zip stays in
      // one tight codegen loop over constant-length data). Keep the pad.
      val dot = aggregate(
        zip_with(vec, typedlit(plane), (x, h) => coalesce(x.cast("double") * h, lit(0.0))),
        lit(0.0), (s, v) => s + v)
      when(dot >= 0.0, shiftLeftC(lit(1L), lit(b))).otherwise(lit(0L))
    }.reduce((x, y) => x.bitwiseOR(y))
  }
}
