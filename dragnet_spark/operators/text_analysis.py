"""Text-analysis operators for large-scale training-data pipelines.

Token counting, quality scoring, n-gram-heuristic language ID,
rolling-hash document fingerprinting.  Each has a DuckDB oracle in
``__spark_entry__.py``; regex patterns are restricted to dialect-safe
ASCII / explicit-codepoint classes (Java vs RE2 vs python ``\\W``
unicode semantics differ).

r06: the per-document COUNTING moved from JVM expressions into one
Arrow python stage per operator (``_counts_stage``) after a pure-JVM
microbenchmark showed java.util.regex on the measurement hardware is
~30x slower than CPython's engine per split AND hard-ceilinged per JVM
across threads; every ratio / CASE / rounding stays in the JVM over the
same integers, so outputs (and the frozen DuckDB oracles) are
bit-identical.  The repetition gates remain all-JVM -- their
interpreted HOF chains interleave with the split, the ceiling binds
only partially there, and the python form A/B-measured slower.
"""

from __future__ import annotations

import pyspark.sql.functions as F

TOKEN_PATTERN = '[^a-zA-Z0-9]+'
_ALNUM_SPACE = ('abcdefghijklmnopqrstuvwxyz'
                'ABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789 ')
CJK_PATTERN = '[\\x{4e00}-\\x{9fff}]'

STOPWORDS = {
    'en': ['the', 'and', 'of', 'to', 'in', 'is', 'was', 'that', 'for', 'with'],
    'de': ['der', 'die', 'das', 'und', 'ist', 'nicht', 'mit', 'ein', 'eine', 'zu'],
    'fr': ['le', 'les', 'et', 'des', 'une', 'est', 'dans', 'pour', 'qui', 'au'],
    'es': ['el', 'los', 'las', 'que', 'por', 'una', 'es', 'para', 'como', 'su'],
}


def tokens_col(col, lower=False):
    c = F.lower(col) if lower else col
    return F.array_remove(F.split(c, TOKEN_PATTERN), '')


def tokens_barrier(df, text_col='text', id_col='doc_id', out_id='_id',
                   lower=False, toks_col='_toks'):
    """``(out_id, toks_col)`` with the token array MATERIALIZED behind
    an ``explode(array(1))`` collapse barrier.

    The canonical prelude for any operator that maps a lambda over the
    token array (n-grams, chunk windows): lambda bodies are opaque to
    Catalyst subexpression elimination, so an inline tokenizer
    expression is re-evaluated once PER ELEMENT (measured ~10-20x on
    passage mining); behind the Generate barrier the tokens are a bound
    attribute, computed once per row.  One shared definition keeps the
    tokenizer in lockstep with :func:`tokens_col` and the DuckDB
    oracles that re-derive it.
    """
    return (df.select(F.col(id_col).alias(out_id),
                      tokens_col(F.col(text_col), lower=lower)
                      .alias(toks_col),
                      F.explode(F.array(F.lit(1))).alias('_b'))
            .drop('_b'))


def token_counts(df, text_col='text'):
    """Whitespace/punct token counts + distinct counts per document.

    r06: counts come from the Arrow counts stage (see
    :func:`_counts_stage` -- the JVM regex engine is both slow and
    thread-ceilinged on the measurement hardware); same integers, same
    output schema."""
    c = _counts_stage(df, text_col, raw=True)
    return c.select(
        'doc_id',
        F.col('_n_tokens').alias('n_tokens'),
        F.col('_n_distinct').alias('n_distinct_tokens'),
        F.col('_n_chars').alias('n_chars_text'),
    )


def quality_scores(df, text_col='text'):
    """Length / punctuation / stopword-ratio quality features.

    The classic pre-training quality filters (C4-style) as pure column
    expressions; ratios are per-row int/int divisions so the DuckDB
    oracle reproduces them bit-exactly.
    """
    # r06: the counts come from the Arrow stage (JVM regex ceiling, see
    # _counts_stage); the ratio arithmetic below is the UNCHANGED
    # expression tree over the same integers, so every double is
    # bit-identical and the oracle hashes are untouched.
    c = _counts_stage(df, text_col, lower=True, hits=('en',), alnum=True)
    n_chars = F.col('_n_chars')
    alnum_sp = F.col('_n_alnum_sp')
    n_tokens = F.col('_n_tokens_lower')
    stop_hits = F.col('_h_en')
    mean_tok = (n_chars.cast('double')
                / F.greatest(n_tokens, F.lit(1)).cast('double'))
    return c.select(
        'doc_id',
        n_chars.cast('long').alias('n_chars_text'),
        n_tokens.cast('long').alias('n_tokens'),
        ((n_chars - alnum_sp).cast('double')
         / F.greatest(n_chars, F.lit(1)).cast('double')).alias('punct_ratio'),
        stop_hits.cast('long').alias('en_stopword_hits'),
        mean_tok.alias('mean_token_len'),
        ((n_tokens >= 10) & (mean_tok < 12.0)).cast('long').alias('quality_ok'),
    )


GOPHER_STOPWORDS = ['the', 'be', 'to', 'of', 'and', 'that', 'have', 'with']
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_WORD_LEN = 3.0
GOPHER_MAX_MEAN_WORD_LEN = 10.0
GOPHER_MAX_SYMBOL_RATIO = 0.1
GOPHER_MIN_ALPHA_WORD_FRAC = 0.8
GOPHER_MIN_STOPWORD_HITS = 2


def gopher_quality_flags(df, text_col='text', keep_cols=()):
    """Gopher-rule document filter (Rae et al. 2021, arXiv:2112.11446
    Appendix A1.1 -- the canonical pre-training quality gate), as pure
    column expressions:

    * word count in [50, 100k], mean word length in [3, 10]
    * symbol-to-word ratio (``#`` / ``...``) <= 0.1
    * >= 80% of words contain an alphabetic character
    * >= 2 distinct Gopher stop words present

    Words here are whitespace-split (Gopher's definition), unlike the
    punctuation-split ``tokens_col`` the other analyzers use.  Every
    ratio is an int/int division, so the DuckDB oracle reproduces the
    doubles bit-exactly; ``passes`` is the conjunction, computed
    identically both sides.  At 10^12 docs this is one narrow Arrow
    stage plus one projection -- no shuffle, no join.
    """
    # r06 (2nd pass): the word-split counts come from the Arrow counts
    # stage (JVM regex ceiling, see _counts_stage; the python \s+ is
    # pinned to Java's ASCII dialect with re.ASCII); the ratio
    # arithmetic below is the unchanged expression tree over the same
    # integers, so the gate doubles and oracle hashes are bit-identical.
    # ``keep_cols`` ride through the Arrow batch so callers get flags +
    # payload without a corpus-wide re-join, and the python stage is a
    # natural pushdown barrier (the old explode-barrier role).
    df = _counts_stage(df, text_col, words=True, keep_cols=keep_cols)
    n_words = F.col('_n_words')
    sum_word_len = F.col('_sum_word_len')
    mean_word_len = (sum_word_len.cast('double')
                     / F.greatest(n_words, F.lit(1)).cast('double'))
    n_hash = F.col('_n_hash')
    n_ellipsis = F.col('_ell_lendiff') / 3
    symbol_ratio = ((n_hash + n_ellipsis).cast('double')
                    / F.greatest(n_words, F.lit(1)).cast('double'))
    alpha_words = F.col('_alpha_words')
    alpha_frac = (alpha_words.cast('double')
                  / F.greatest(n_words, F.lit(1)).cast('double'))
    stop_hits = F.col('_stop_hits')
    passes = ((n_words >= GOPHER_MIN_WORDS)
              & (n_words <= GOPHER_MAX_WORDS)
              & (mean_word_len >= GOPHER_MIN_MEAN_WORD_LEN)
              & (mean_word_len <= GOPHER_MAX_MEAN_WORD_LEN)
              & (symbol_ratio <= GOPHER_MAX_SYMBOL_RATIO)
              & (alpha_frac >= GOPHER_MIN_ALPHA_WORD_FRAC)
              & (stop_hits >= GOPHER_MIN_STOPWORD_HITS))
    return df.select(
        'doc_id',
        *keep_cols,
        n_words.cast('long').alias('n_words'),
        F.round(mean_word_len, 6).alias('mean_word_len'),
        F.round(symbol_ratio, 6).alias('symbol_ratio'),
        F.round(alpha_frac, 6).alias('alpha_word_frac'),
        stop_hits.cast('long').alias('stopword_hits'),
        # 0/1 rather than boolean so the oracle hash is dtype-stable
        passes.cast('long').alias('passes'),
    )


GOPHER_MAX_TOP2GRAM_FRAC = 0.20
GOPHER_MAX_DUP10GRAM_FRAC = 0.10


def gopher_repetition_flags(df, text_col='text',
                            max_top2=GOPHER_MAX_TOP2GRAM_FRAC,
                            max_dup10=GOPHER_MAX_DUP10GRAM_FRAC):
    """Gopher repetition rules (Rae et al. 2021 A1.1, the other half of
    the quality gate): documents dominated by a repeated phrase are
    SEO/boilerplate spam.

    * ``top_2gram_char_frac`` -- token characters of the most frequent
      2-gram (token chars x occurrences) over the document's total
      token characters; gate <= ``max_top2`` (0.20).
    * ``dup_10gram_char_frac`` -- POSITIONAL coverage: token characters
      at positions covered by at least one occurrence of a 10-gram
      that appears more than once, over total token characters --
      each position counts once no matter how many duplicated grams
      overlap it (the paper's definition; an occurrence-weighted sum
      overshoots past 1.0 on overlapping repeats and voids the
      threshold); gate <= ``max_dup10`` (0.10).

    Tokens are lowercased punctuation-split (``tokens_col``); the
    character base is the sum of token lengths (no separators),
    identically in the DuckDB oracle, so both fractions hash-match
    bit-exactly.

    Plan: n-gram projections + explodes, (doc_id, gram) partial-
    aggregated groupBys, a distinct over covered positions, per-doc
    sums -- all doc_id-keyed shuffles of O(total tokens) rows, no
    Python; the same shuffle class as passage mining.
    """
    raw = "array_remove(split(lower(%s), '[^a-z0-9]+'), '')" % text_col
    # grams never exist as STRINGS: each n-gram is xxhash64 of its
    # token-array slice (Spark hashes arrays structurally), so neither
    # the projection nor any shuffle ever builds/moves n-gram text --
    # the wide ops carry 8-byte keys.  Token char lengths ride
    # alongside for the numerators.  A hash collision would need ~2^32
    # distinct grams within ONE document to matter (hashes are
    # compared per doc_id only).
    #
    # The explode(array(1)) Generate node is a COLLAPSE BARRIER:
    # lambda bodies are opaque to Catalyst's subexpression elimination,
    # so without it the tokenizer expression inlines into every lambda
    # below (measured: 29 split() occurrences in the optimized plan --
    # the corpus tokenized ~29x per row); behind the barrier `_toks`
    # is a materialized attribute, tokenized once per row per branch.
    tk = (df.select('doc_id', F.expr(raw).alias('_tk'),
                    F.explode(F.array(F.lit(1))).alias('_b'))
          .drop('_b'))
    t = '_tk'
    base = tk.select(
        'doc_id',
        F.expr('aggregate(transform(%s, x -> length(x)), 0, '
               '(a, x) -> a + x)' % t).alias('_chars'),
        F.expr(t).alias('_toks'),
        F.expr("CASE WHEN size({t}) >= 2 THEN transform("
               "sequence(0, size({t}) - 2), "
               "i -> xxhash64(slice({t}, i + 1, 2))) "
               "ELSE array() END".format(t=t)).alias('_g2h'),
        F.expr("CASE WHEN size({t}) >= 2 THEN transform("
               "sequence(0, size({t}) - 2), "
               "i -> length(element_at({t}, i + 1)) "
               "   + length(element_at({t}, i + 2))) "
               "ELSE array() END".format(t=t)).alias('_g2len'),
        F.expr("CASE WHEN size({t}) >= 10 THEN transform("
               "sequence(0, size({t}) - 10), "
               "i -> xxhash64(slice({t}, i + 1, 10))) "
               "ELSE array() END".format(t=t)).alias('_g10h'))

    # most frequent 2-gram, numerator = token chars (gram minus space)
    g2 = (base.select('doc_id',
                      F.explode(F.arrays_zip('_g2h', '_g2len'))
                      .alias('z'))
          .select('doc_id', F.col('z._g2h').alias('gh'),
                  F.col('z._g2len').alias('glen'))
          .groupBy('doc_id', 'gh')
          .agg(F.count('*').alias('n'), F.max('glen').alias('glen'))
          .groupBy('doc_id')
          .agg(F.max(F.col('glen') * F.col('n')).alias('_top2')))

    # duplicated 10-grams -> their start positions -> covered indices
    starts = (base.select('doc_id',
                          F.posexplode('_g10h').alias('i', 'gh')))
    dup_grams = (starts.groupBy('doc_id', 'gh')
                 .agg(F.count('*').alias('n'))
                 .where(F.col('n') > 1)
                 .select('doc_id', 'gh'))
    covered = (starts.join(dup_grams, ['doc_id', 'gh'])
               .select('doc_id',
                       F.explode(F.expr('sequence(i, i + 9)'))
                       .alias('idx'))
               .distinct())
    tok_pos = base.select('doc_id',
                          F.posexplode('_toks').alias('idx', 'tok'))
    dup10 = (covered.join(tok_pos, ['doc_id', 'idx'])
             .groupBy('doc_id')
             .agg(F.sum(F.length('tok')).alias('_dup10')))

    out = (base.select('doc_id', '_chars')
           .join(g2, 'doc_id', 'left')
           .join(dup10, 'doc_id', 'left'))
    top2 = (F.coalesce('_top2', F.lit(0)).cast('double')
            / F.greatest('_chars', F.lit(1)).cast('double'))
    dup = (F.coalesce('_dup10', F.lit(0)).cast('double')
           / F.greatest('_chars', F.lit(1)).cast('double'))
    passes = (top2 <= max_top2) & (dup <= max_dup10)
    return out.select(
        'doc_id',
        F.round(top2, 6).alias('top_2gram_char_frac'),
        F.round(dup, 6).alias('dup_10gram_char_frac'),
        passes.cast('long').alias('passes_repetition'))


def gopher_repetition_flags_rowwise(df, text_col='text',
                                    max_top2=GOPHER_MAX_TOP2GRAM_FRAC,
                                    max_dup10=GOPHER_MAX_DUP10GRAM_FRAC,
                                    keep_cols=()):
    """The Gopher repetition gate as ONE stateless projection -- no
    groupBy, no join, no shuffle -- bit-identical to
    :func:`gopher_repetition_flags` (asserted in tests).

    Being stateless makes it legal in a Structured Streaming pipeline
    (the shuffle form's blocking aggregations are not, short of
    watermark gymnastics on a per-doc key) and removes the gate's four
    shuffles in batch.  The trick: per-gram COUNTS come from run
    lengths in the doc's SORTED gram-hash array (equal hashes are
    adjacent after ``array_sort``; a single ``aggregate`` pass with a
    (prev, run, best) accumulator finds the max), and the duplicated-
    10-gram POSITIONAL coverage comes from the start positions of
    duplicated grams (any element of a >=2 run in the sorted
    (hash, start) struct array), interval-merged in one ``aggregate``
    pass so each covered position's token length is summed exactly
    once.

    Cost: O(n log n) per document in the two ``array_sort``s, linear
    everywhere else -- the r05 form's coverage step was
    O(starts x duplicated-gram-set) (an ``array_contains`` per
    position) with an ``array_append`` accumulator (quadratic on
    mostly-repeat spam); both are gone, so this form is now the batch
    default as well (``__spark_entry__.q_gopher_repetition``,
    ``curation.gate_funnel`` / ``curate_corpus``), replacing four
    token-exploded shuffles and five re-computations of the corpus
    scan+tokenize projection (the shuffle form's plan re-reads the
    base five times) with one zero-shuffle projection.  The shuffle
    form remains exported as the cross-check twin (bit-equality
    asserted in tests).
    """
    # (r06 2nd pass: an Arrow python tokenizer stage was A/B-measured
    # here and REVERTED -- 1.15 s vs 1.25-1.45 s at the 50 k corpus.
    # Unlike the pure-counting operators, this gate's interpreted HOF
    # chain interleaves with the split so the JVM regex ceiling binds
    # only partially, and shipping list<string> token arrays across
    # Arrow costs more than the split saves.)
    raw = "array_remove(split(lower(%s), '[^a-z0-9]+'), '')" % text_col
    keep = [F.col(c) for c in keep_cols]
    tk = (df.select('doc_id', *keep, F.expr(raw).alias('_tk'),
                    F.explode(F.array(F.lit(1))).alias('_b'))
          .drop('_b'))
    # r06: hash every token ONCE into a long array behind a second
    # barrier, then build gram hashes from longs.  Projections holding
    # higher-order functions never enter whole-stage codegen (no
    # doGenCode on HigherOrderFunction), so this operator runs in the
    # INTERPRETED evaluator -- the r06 form hashed each token's string
    # ~12x (once per overlapping 2-gram and 10-gram slice); hashing 8-
    # byte longs instead cuts the dominant interpreted work.  Gram
    # equality via equal hash values is unchanged in kind (the shuffle
    # twin groups on 8-byte gram hashes too); only the internal hash
    # VALUES differ, which the output fractions never see.
    hk = (tk.select('doc_id', *keep, '_tk',
                    F.expr('transform(_tk, x -> xxhash64(x))').alias('_th'),
                    F.explode(F.array(F.lit(1))).alias('_b'))
          .drop('_b'))
    base = hk.select(
        'doc_id', *keep,
        F.expr('aggregate(_tk, 0, (a, x) -> a + length(x))')
        .alias('_chars'),
        F.expr('_tk').alias('_toks'),
        # (hash, char-len) structs for 2-grams; sorted so equal hashes
        # are adjacent (struct sort orders by first field)
        F.expr("CASE WHEN size(_tk) >= 2 THEN sort_array(transform("
               "sequence(0, size(_tk) - 2), "
               "i -> struct(xxhash64(element_at(_th, i + 1), "
               "            element_at(_th, i + 2)) AS gh, "
               "length(element_at(_tk, i + 1)) "
               "  + length(element_at(_tk, i + 2)) AS glen))) "
               "ELSE array() END").alias('_g2'),
        F.expr("CASE WHEN size(_tk) >= 10 THEN sort_array(transform("
               "sequence(0, size(_tk) - 10), "
               "i -> struct(xxhash64(slice(_th, i + 1, 10)) AS gh, "
               "i AS i))) ELSE array() END").alias('_g10s'))

    # max over distinct 2-grams of (count x gram char len): single
    # aggregate pass over the sorted (gh, glen) structs
    top2 = F.expr(
        "aggregate(_g2, "
        "named_struct('prev', CAST(NULL AS BIGINT), 'glen', 0, "
        "             'run', 0L, 'best', 0L), "
        "(a, s) -> IF(a.prev IS NOT NULL AND s.gh = a.prev, "
        "  named_struct('prev', a.prev, 'glen', a.glen, "
        "               'run', a.run + 1L, 'best', a.best), "
        "  named_struct('prev', s.gh, 'glen', s.glen, 'run', 1L, "
        "    'best', greatest(a.best, a.run * CAST(a.glen AS BIGINT)))), "
        "a -> greatest(a.best, a.run * CAST(a.glen AS BIGINT)))")

    # duplicated-10-gram START positions: in the (gh, i) structs sorted
    # by hash, a start belongs to a duplicated gram iff its hash equals
    # a neighbor's -- one O(n) pass of O(1) element_at probes, no
    # per-position membership scan, no array_append accumulator
    dup_starts = F.expr(
        "CASE WHEN size(_g10s) = 0 THEN CAST(array() AS ARRAY<INT>) "
        "ELSE sort_array(transform(filter(sequence(1, size(_g10s)), "
        "j -> (j > 1 AND element_at(_g10s, j).gh = "
        "      element_at(_g10s, j - 1).gh) "
        "  OR (j < size(_g10s) AND element_at(_g10s, j).gh = "
        "      element_at(_g10s, j + 1).gh)), "
        "j -> element_at(_g10s, j).i)) END")
    # two-step select so the start-positions array is a bound attribute
    # before the summing lambda (opaque to CSE otherwise)
    staged = base.select('doc_id', *keep, '_chars', '_toks',
                         top2.alias('_top2'), dup_starts.alias('_dupS'))
    # positional coverage = union of [s, s+9] windows over the SORTED
    # duplicated starts, interval-merged in one pass: each start adds
    # only its not-yet-covered suffix [max(s, prev_end + 1), s + 9]
    # (never empty: consecutive starts differ by >= 1, so
    # prev_end + 1 = prev_s + 10 <= s + 9), so every covered position's
    # token length is summed exactly once -- equal to the distinct-
    # position sum by construction
    dup10 = F.expr(
        "aggregate(_dupS, named_struct('pe', -1, 'acc', 0L), "
        "(a, s) -> named_struct('pe', s + 9, "
        "  'acc', a.acc + aggregate(sequence(greatest(s, a.pe + 1), s + 9), "
        "    0L, (x, k) -> x + length(element_at(_toks, k + 1)))), "
        "a -> a.acc)")
    out = staged.select('doc_id', *keep, '_chars', '_top2',
                        dup10.alias('_dup10'))
    top2f = (F.coalesce('_top2', F.lit(0)).cast('double')
             / F.greatest('_chars', F.lit(1)).cast('double'))
    dupf = (F.coalesce('_dup10', F.lit(0)).cast('double')
            / F.greatest('_chars', F.lit(1)).cast('double'))
    passes = (top2f <= max_top2) & (dupf <= max_dup10)
    # r06: the output rides through a STRUCT-EXPLODE barrier.  The
    # explode(array(1)) barriers above stop projection collapse but NOT
    # predicate pushdown: a downstream ``.where(passes_repetition = 1)``
    # (curate_corpus, the streaming pipeline) was alias-substituted
    # through every projection and Generate down the chain, inlining the
    # whole tokenize+hash+sort pipeline into an interpreted Filter whose
    # lambda-nested re-evaluation went O(n^2) per document (measured
    # 3.15 s -> 133 s at sf0.01 for gate + where).  Filters on a
    # GENERATOR OUTPUT cannot push below the Generate, so emitting the
    # final columns as exploded struct fields pins them as attributes:
    # any downstream predicate stops here and costs one struct-field
    # probe per row.
    out_struct = F.struct(
        F.col('doc_id'), *keep,
        F.round(top2f, 6).alias('top_2gram_char_frac'),
        F.round(dupf, 6).alias('dup_10gram_char_frac'),
        passes.cast('long').alias('passes_repetition'))
    return (out.select(F.explode(F.array(out_struct)).alias('_r'))
            .select('_r.*'))


def language_id(df, text_col='text'):
    """Stopword + CJK-ratio language heuristic over (en, de, fr, es, zh).

    Deterministic tie-break: cjk beats all, then en > de > fr > es in
    fixed priority with >= comparisons.

    The per-language hit counts and the cjk ratio are materialized
    behind a collapse barrier before the ``pred_lang`` CASE chain
    (same reason as :func:`text_profile`: conditional branches defeat
    codegen subexpression elimination, so the inline form re-ran the
    tokenize+distinct+intersect chain once per branch).
    """
    # r06: hit/CJK counts from the Arrow stage (JVM regex ceiling, see
    # _counts_stage); ratio + CASE arithmetic unchanged over the same
    # integers, so the oracle hashes are untouched.
    base = _counts_stage(df, text_col, hits=True, cjk=True)
    h = {lang: F.col('_h_' + lang) for lang in STOPWORDS}
    cjk_ratio = (F.col('_n_cjk').cast('double')
                 / F.greatest(F.col('_n_chars'), F.lit(1)).cast('double'))
    pred = (
        F.when(cjk_ratio > 0.2, 'zh')
        .when((h['en'] >= h['de']) & (h['en'] >= h['fr'])
              & (h['en'] >= h['es']), 'en')
        .when((h['de'] >= h['fr']) & (h['de'] >= h['es']), 'de')
        .when(h['fr'] >= h['es'], 'fr')
        .otherwise('es'))
    cols = [F.col('doc_id')]
    cols += [h[lang].cast('long').alias('%s_hits' % lang)
             for lang in STOPWORDS]
    cols += [F.round(cjk_ratio, 6).alias('cjk_ratio'),
             pred.alias('pred_lang')]
    return base.select(*cols)


def fingerprints(df, text_col='text'):
    """Document fingerprints: md5 content signature + a sorted-token-set
    signature (whitespace/case-insensitive near-exact dedup key).

    r06: both digests from the Arrow counts stage (hashlib md5 over the
    same UTF-8 bytes; python ``sorted`` and Spark ``sort_array`` agree
    because UTF-8 byte order is code-point order)."""
    c = _counts_stage(df, text_col, sigs=True)
    return c.select(
        'doc_id',
        F.col('_content_sig').alias('content_sig'),
        F.col('_tokenset_sig').alias('tokenset_sig'),
    )


def text_profile(df, text_col='text'):
    """The full per-document analysis profile -- token counts, C4-style
    quality features, language-ID heuristics, fingerprints -- in ONE
    whole-stage-codegen projection.

    Column-for-column identical to joining :func:`token_counts`,
    :func:`quality_scores` (its token count as ``n_tokens_lower``),
    :func:`language_id` and :func:`fingerprints` on doc_id, but with no
    joins: at corpus scale the join form shuffles the corpus three
    times for what is a narrow per-row computation.

    r06 (2nd pass): every count comes from the Arrow counts stage
    (JVM regex ceiling -- see ``_counts_stage``); the ratio / CASE /
    rounding arithmetic below is the unchanged expression tree over
    the same integers, so every double and the oracle hashes are
    bit-identical.  One python stage, no shuffle, no join.
    """
    b3 = _counts_stage(df, text_col, raw=True, lower=True, hits=True,
                       cjk=True, alnum=True, sigs=True)
    h = {lang: F.col('_h_' + lang) for lang in STOPWORDS}
    n_chars = F.col('_n_chars')
    cjk_ratio = (F.col('_n_cjk').cast('double')
                 / F.greatest(n_chars, F.lit(1)).cast('double'))
    pred = (
        F.when(cjk_ratio > 0.2, 'zh')
        .when((h['en'] >= h['de']) & (h['en'] >= h['fr'])
              & (h['en'] >= h['es']), 'en')
        .when((h['de'] >= h['fr']) & (h['de'] >= h['es']),
              'de')
        .when(h['fr'] >= h['es'], 'fr')
        .otherwise('es'))
    alnum_sp = F.col('_n_alnum_sp')
    n_tokens_l = F.col('_n_tokens_lower')
    mean_tok = (n_chars.cast('double')
                / F.greatest(n_tokens_l, F.lit(1)).cast('double'))
    return b3.select(
        'doc_id',
        F.col('_n_tokens').alias('n_tokens'),
        F.col('_n_distinct').alias('n_distinct_tokens'),
        n_chars.alias('n_chars_text'),
        n_tokens_l.alias('n_tokens_lower'),
        ((n_chars - alnum_sp).cast('double')
         / F.greatest(n_chars, F.lit(1)).cast('double'))
        .alias('punct_ratio'),
        h['en'].cast('long').alias('en_stopword_hits'),
        mean_tok.alias('mean_token_len'),
        ((n_tokens_l >= 10) & (mean_tok < 12.0)).cast('long')
        .alias('quality_ok'),
        *[h[lang].cast('long').alias('%s_hits' % lang)
          for lang in STOPWORDS],
        F.round(cjk_ratio, 6).alias('cjk_ratio'),
        pred.alias('pred_lang'),
        F.col('_content_sig').alias('content_sig'),
        F.col('_tokenset_sig').alias('tokenset_sig'),
    )


# -- deterministic sampling (reproducible corpus splits) --------------------


def _md5_bucket(key_col, digits=4):
    """Lexicographic md5-prefix bucket: stable across engines, runs and
    partitionings (unlike sample(), which is seed- and split-dependent).
    ``digits`` hex chars give 16^digits buckets."""
    return F.substring(F.md5(key_col.cast('string').cast('binary')),
                       1, digits)


def _frac_threshold(frac, digits=4):
    space = 16 ** digits
    n = int(frac * space)
    if n >= space:
        # every hex char sorts below 'g': frac >= 1 keeps all rows
        # (a 5-digit '10000' would compare lexicographically BELOW
        # most 4-char buckets and silently keep ~6%)
        return 'g'
    return format(max(n, 0), '0%dx' % digits)


def deterministic_sample(df, frac, key_col='doc_id'):
    """Keep ~``frac`` of rows, chosen by md5(key) prefix comparison --
    the same documents are selected on every engine, run, cluster size
    and partitioning (sample() is none of these), which is what a
    reproducible held-out split or decontamination subsample needs.
    One narrow filter, no shuffle."""
    return df.where(_md5_bucket(F.col(key_col))
                    < F.lit(_frac_threshold(frac)))


def stratified_sample(df, fracs, strata_col='lang', key_col='doc_id'):
    """Per-stratum deterministic sampling: ``fracs`` maps stratum value
    -> fraction (strata absent from the map are dropped).  The same
    md5-prefix rule per stratum, so rebalancing a multilingual corpus
    (downsample the head language, keep the tail) is reproducible and
    shuffle-free."""
    bucket = _md5_bucket(F.col(key_col))
    cond = None
    for value, frac in sorted(fracs.items()):
        branch = ((F.col(strata_col) == value)
                  & (bucket < F.lit(_frac_threshold(frac))))
        cond = branch if cond is None else (cond | branch)
    return df.where(cond if cond is not None else F.lit(False))


# -- Arrow counts stage (r06: off the JVM regex engine) ---------------------
#
# java.util.regex on the measurement hardware is pathological: a pure-JVM
# microbenchmark (32 threads, shared precompiled Pattern, OPTIMIZATION_r06
# "JVM regex ceiling" section) measured ~28 us per 320-char split AND a
# hard ~26k splits/s PER JVM ceiling that does not move with thread count
# (1 thread = 36k/s, 32 threads = 26k/s TOTAL), while char loops,
# allocation and megamorphic dispatch in the same harness scale 16-20x.
# CPython's re engine does not share the pathology (110k splits/s single
# process, 1.8M/s across 32 worker processes), and Spark python workers
# are processes.  So for split-dominated per-document COUNTING, the
# "eliminate the Python boundary" default (guide section 4) inverts here,
# measured per guide section 1: one Arrow stage that ships only
# (doc_id, text) in and small integers out beats any JVM expression
# formulation by the ceiling ratio.  All ratio / CASE / rounding
# arithmetic stays in the JVM on those integers, bit-identically to the
# old expression trees (the same pattern as synthesize_extract_gold_counts,
# whose python/JVM tokenizer agreement is already test-pinned).

_PY_TOKEN_RE = None


def _py_regexes():
    global _PY_TOKEN_RE
    if _PY_TOKEN_RE is None:
        import re
        _PY_TOKEN_RE = (
            re.compile(TOKEN_PATTERN),
            # Java \s is ASCII-only [ \t\n\x0B\f\r]; re.ASCII pins the
            # python dialect to the same set
            re.compile(r'\s+', re.ASCII),
            re.compile('[一-鿿]'),
            re.compile('[A-Za-z]'),
        )
    return _PY_TOKEN_RE


def _counts_stage(df, text_col='text', raw=False, lower=False, hits=False,
                  cjk=False, alnum=False, sigs=False, words=False,
                  keep_cols=()):
    """(doc_id, <keep_cols>, _n_chars, <requested count cols>) via ONE
    mapInArrow stage; exactly one output row per input row, in order.

    Null text propagates as null counts, so downstream JVM arithmetic
    null-propagates exactly as the old all-JVM expression trees did.
    """
    import pyarrow as pa

    # hits: True = all STOPWORDS languages, or an iterable subset --
    # the per-row python loop then intersects only what the caller
    # consumes
    hit_langs = (tuple(STOPWORDS) if hits is True
                 else tuple(hits) if hits else ())
    fields = [('_n_chars', pa.int64())]
    if raw:
        fields += [('_n_tokens', pa.int64()), ('_n_distinct', pa.int64())]
    if lower:
        fields += [('_n_tokens_lower', pa.int64())]
    if hit_langs:
        fields += [('_h_' + lang, pa.int64()) for lang in hit_langs]
    if cjk:
        fields += [('_n_cjk', pa.int64())]
    if alnum:
        fields += [('_n_alnum_sp', pa.int64())]
    if sigs:
        fields += [('_content_sig', pa.string()),
                   ('_tokenset_sig', pa.string())]
    if words:
        fields += [('_n_words', pa.int64()), ('_sum_word_len', pa.int64()),
                   ('_n_hash', pa.int64()), ('_ell_lendiff', pa.int64()),
                   ('_alpha_words', pa.int64()), ('_stop_hits', pa.int64())]

    in_fields = ['doc_id', *keep_cols, text_col]
    src = df.select(*dict.fromkeys(in_fields))  # dedup, keep order
    ddl_types = {f.name: f.dataType.simpleString() for f in src.schema}
    pass_cols = ['doc_id', *[c for c in keep_cols if c != 'doc_id']]
    out_ddl = ', '.join(
        ['%s %s' % (c, ddl_types[c]) for c in pass_cols]
        + ['%s %s' % (name, 'string' if typ == pa.string() else 'bigint')
           for name, typ in fields])
    stop_sets = {lang: frozenset(STOPWORDS[lang]) for lang in hit_langs}
    gopher_stop = frozenset(GOPHER_STOPWORDS)
    alnum_sp_set = frozenset(_ALNUM_SPACE)

    def gen(batches):
        import hashlib
        tok_re, ws_re, cjk_re, alpha_re = _py_regexes()
        tok_split = tok_re.split
        ws_split = ws_re.split
        for rb in batches:
            cols = {name: rb.column(i)
                    for i, name in enumerate(rb.schema.names)}
            texts = cols[text_col].to_pylist()
            out = {name: [] for name, _ in fields}
            for t in texts:
                if t is None:
                    for name, _ in fields:
                        out[name].append(None)
                    continue
                out['_n_chars'].append(len(t))
                if raw:
                    toks = [x for x in tok_split(t) if x]
                    out['_n_tokens'].append(len(toks))
                    out['_n_distinct'].append(len(set(toks)))
                if lower or hit_langs or sigs:
                    toksl = [x for x in tok_split(t.lower()) if x]
                    dt = set(toksl)
                if lower:
                    out['_n_tokens_lower'].append(len(toksl))
                for lang in hit_langs:
                    out['_h_' + lang].append(len(dt & stop_sets[lang]))
                if cjk:
                    out['_n_cjk'].append(len(cjk_re.findall(t)))
                if alnum:
                    out['_n_alnum_sp'].append(
                        sum(1 for ch in t if ch in alnum_sp_set))
                if sigs:
                    out['_content_sig'].append(
                        hashlib.md5(t.encode('utf-8')).hexdigest())
                    out['_tokenset_sig'].append(hashlib.md5(
                        ' '.join(sorted(dt)).encode('utf-8')).hexdigest())
                if words:
                    ws = [w for w in ws_split(t.strip(' ')) if w]
                    out['_n_words'].append(len(ws))
                    out['_sum_word_len'].append(sum(map(len, ws)))
                    out['_n_hash'].append(t.count('#'))
                    out['_ell_lendiff'].append(3 * t.count('...'))
                    out['_alpha_words'].append(
                        sum(1 for w in ws if alpha_re.search(w)))
                    out['_stop_hits'].append(
                        len({w.lower() for w in ws} & gopher_stop))
            arrays = [cols[c] for c in pass_cols]
            arrays += [pa.array(out[name], type=typ)
                       for name, typ in fields]
            yield pa.RecordBatch.from_arrays(
                arrays, names=pass_cols + [name for name, _ in fields])

    return src.mapInArrow(gen, out_ddl)
