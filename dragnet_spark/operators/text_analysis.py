"""Text-analysis operators for large-scale training-data pipelines.

All JVM-side (built-in ``pyspark.sql.functions`` only -- no Python in the
hot path): token counting, quality scoring, n-gram-heuristic language ID,
rolling-hash document fingerprinting.  Each has a DuckDB oracle in
``__spark_entry__.py``; regex patterns are restricted to dialect-safe
ASCII / explicit-codepoint classes (Java vs RE2 ``\\W`` unicode semantics
differ).
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
    """Whitespace/punct token counts + distinct counts per document."""
    toks = tokens_col(F.col(text_col))
    return df.select(
        'doc_id',
        F.size(toks).cast('long').alias('n_tokens'),
        F.size(F.array_distinct(toks)).cast('long').alias('n_distinct_tokens'),
        F.length(text_col).cast('long').alias('n_chars_text'),
    )


def quality_scores(df, text_col='text'):
    """Length / punctuation / stopword-ratio quality features.

    The classic pre-training quality filters (C4-style) as pure column
    expressions; ratios are per-row int/int divisions so the DuckDB
    oracle reproduces them bit-exactly.
    """
    text = F.col(text_col)
    n_chars = F.length(text)
    # r06: count non-alnum chars via translate (one table lookup per
    # char) instead of materializing a regex-stripped copy of the
    # text; alnum_sp = n_chars - len(text minus [a-zA-Z0-9 ]) is the
    # same integer, so the oracle's regexp form hashes identically.
    alnum_sp = (F.length(text)
                - F.length(F.translate(text, _ALNUM_SPACE, '')))
    toks = tokens_col(text, lower=True)
    n_tokens = F.size(toks)
    stop_hits = F.size(F.array_intersect(
        F.array_distinct(toks),
        F.array(*[F.lit(w) for w in STOPWORDS['en']])))
    mean_tok = (n_chars.cast('double')
                / F.greatest(n_tokens, F.lit(1)).cast('double'))
    return df.select(
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
    identically both sides.  At 10^12 docs this is one narrow
    whole-stage-codegen projection -- no shuffle, no Python.
    """
    # Generate collapse barrier (see gopher_repetition_flags): without
    # it the whitespace-split expression inlines into every lambda and
    # aggregate below (17 split() occurrences in the optimized plan).
    # ``keep_cols`` ride through so callers get flags + payload in ONE
    # projection instead of a corpus-wide re-join (the gate is a pure
    # narrow op; forcing a join to recover the text would shuffle).
    df = (df.select('doc_id', F.col(text_col).alias('_text'),
                    *[F.col(c) for c in keep_cols],
                    F.array_remove(F.split(F.trim(text_col), '\\s+'), '')
                    .alias('_words'),
                    F.explode(F.array(F.lit(1))).alias('_b'))
          .drop('_b'))
    text = F.col('_text')
    words = F.col('_words')
    n_words = F.size(words)
    sum_word_len = F.aggregate(
        F.transform(words, F.length), F.lit(0), lambda a, x: a + x)
    mean_word_len = (sum_word_len.cast('double')
                     / F.greatest(n_words, F.lit(1)).cast('double'))
    n_hash = F.length(text) - F.length(F.replace(text, F.lit('#')))
    n_ellipsis = (F.length(text)
                  - F.length(F.replace(text, F.lit('...')))) / 3
    symbol_ratio = ((n_hash + n_ellipsis).cast('double')
                    / F.greatest(n_words, F.lit(1)).cast('double'))
    alpha_words = F.size(F.filter(
        words, lambda w: w.rlike('[A-Za-z]')))
    alpha_frac = (alpha_words.cast('double')
                  / F.greatest(n_words, F.lit(1)).cast('double'))
    lower_words = F.array_distinct(F.transform(words, F.lower))
    stop_hits = F.size(F.array_intersect(
        lower_words, F.array(*[F.lit(w) for w in GOPHER_STOPWORDS])))
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
    text = F.col(text_col)
    toks = F.array_distinct(tokens_col(text, lower=True))
    hits = {
        lang: F.size(F.array_intersect(
            toks, F.array(*[F.lit(w) for w in words])))
        for lang, words in STOPWORDS.items()
    }
    # r06: count the CJK chars (each match is exactly one char) instead
    # of materializing a CJK-stripped copy of the text -- on the ASCII-
    # dominant corpus regexp_count allocates nothing, regexp_replace
    # copied every document; same integer, oracle hashes unchanged.
    n_cjk = F.regexp_count(text, F.lit(CJK_PATTERN))
    cjk_ratio = (n_cjk.cast('double')
                 / F.greatest(F.length(text), F.lit(1)).cast('double'))
    base = (df.select(
        'doc_id',
        *[hits[lang].alias('_h_' + lang) for lang in STOPWORDS],
        cjk_ratio.alias('_cjkr'),
        F.explode(F.array(F.lit(1))).alias('_b')).drop('_b'))
    h = {lang: F.col('_h_' + lang) for lang in STOPWORDS}
    cjk_ratio = F.col('_cjkr')
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
    signature (whitespace/case-insensitive near-exact dedup key)."""
    toks = F.sort_array(F.array_distinct(tokens_col(F.col(text_col),
                                                    lower=True)))
    return df.select(
        'doc_id',
        F.md5(F.col(text_col)).alias('content_sig'),
        F.md5(F.array_join(toks, ' ')).alias('tokenset_sig'),
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

    r06: the two tokenizers, the distinct token set and the per-language
    stopword hits are materialized behind collapse barriers before the
    ``pred_lang`` CASE chain -- expressions that appear only inside
    conditional branches are excluded from codegen subexpression
    elimination, so the single-Project form re-evaluated the de/fr/es
    intersections (each over the full tokenize+distinct chain) once per
    CASE branch (22 ``split()`` occurrences in the r05 optimized plan;
    7.5 s -> 5.6 s at sf1.0 from staging).  Still one narrow
    zero-shuffle codegen pipeline -- barriers are Generate nodes, not
    exchanges.
    """
    text = F.col(text_col)
    base = (df.select(
        'doc_id', text.alias('_text'),
        tokens_col(text).alias('_toks'),
        tokens_col(text, lower=True).alias('_toksl'),
        F.explode(F.array(F.lit(1))).alias('_b')).drop('_b'))
    b2 = (base.select(
        'doc_id', '_text', '_toks', '_toksl',
        F.array_distinct('_toksl').alias('_dt'),
        F.explode(F.array(F.lit(1))).alias('_b')).drop('_b'))
    text = F.col('_text')
    n_chars = F.length(text)
    hits = {
        lang: F.size(F.array_intersect(
            '_dt', F.array(*[F.lit(w) for w in words])))
        for lang, words in STOPWORDS.items()
    }
    n_cjk = F.regexp_count(text, F.lit(CJK_PATTERN))  # see language_id
    cjk_ratio = (n_cjk.cast('double')
                 / F.greatest(n_chars, F.lit(1)).cast('double'))
    b3 = (b2.select(
        'doc_id', '_text', '_toks', '_toksl', '_dt',
        *[hits[lang].alias('_h_' + lang) for lang in STOPWORDS],
        cjk_ratio.alias('_cjkr'),
        F.explode(F.array(F.lit(1))).alias('_b')).drop('_b'))
    h = {lang: F.col('_h_' + lang) for lang in STOPWORDS}
    cjk_ratio = F.col('_cjkr')
    pred = (
        F.when(cjk_ratio > 0.2, 'zh')
        .when((h['en'] >= h['de']) & (h['en'] >= h['fr'])
              & (h['en'] >= h['es']), 'en')
        .when((h['de'] >= h['fr']) & (h['de'] >= h['es']),
              'de')
        .when(h['fr'] >= h['es'], 'fr')
        .otherwise('es'))
    # r06: count non-alnum chars via translate (one table lookup per
    # char) instead of materializing a regex-stripped copy of the
    # text; alnum_sp = n_chars - len(text minus [a-zA-Z0-9 ]) is the
    # same integer, so the oracle's regexp form hashes identically.
    alnum_sp = (F.length(text)
                - F.length(F.translate(text, _ALNUM_SPACE, '')))
    n_tokens_l = F.size('_toksl')
    mean_tok = (n_chars.cast('double')
                / F.greatest(n_tokens_l, F.lit(1)).cast('double'))
    return b3.select(
        'doc_id',
        F.size('_toks').cast('long').alias('n_tokens'),
        F.size(F.array_distinct('_toks')).cast('long')
        .alias('n_distinct_tokens'),
        n_chars.cast('long').alias('n_chars_text'),
        n_tokens_l.cast('long').alias('n_tokens_lower'),
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
        F.md5(text).alias('content_sig'),
        F.md5(F.array_join(F.sort_array('_dt'), ' ')).alias('tokenset_sig'),
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
