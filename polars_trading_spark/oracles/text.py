"""Auto-split oracle module (from the former monolithic registry.py).

Part of polars_trading_spark.oracles: each module registers its domain's
(Spark, DuckDB-oracle) query pairs into the shared QUERIES dict at import
time.  Import ORDER (see registry.py) plus the rotation front pins the
driver gate window; tests/test_registry_order.py asserts the manifest.
"""


from __future__ import annotations
from polars_trading_spark.functions import text as text_ops
from polars_trading_spark.functions.dedup import MERSENNE31
from polars_trading_spark.functions.pii import PII_PATTERNS
from polars_trading_spark.functions.pii import PII_TOKENS
from polars_trading_spark.functions.text import CODE_INDENT_PATTERN
from polars_trading_spark.functions.text import CODE_SEMI_EOL_PATTERN
from polars_trading_spark.functions.text import CODE_SYMBOL_PATTERN
from polars_trading_spark.functions.text import STOPWORDS
from polars_trading_spark.sources.tables import TRADES_CTE
from polars_trading_spark.sources.tables import read_table
from polars_trading_spark.sources.tables import trades_from_events
from pyspark.sql import DataFrame
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from polars_trading_spark.oracles._shared import (  # noqa: F401
    _trades_config,
    register,
)


# Shared DuckDB fragments — the exact SQL twins of functions/text.py.
def _docs_tok_cte(where: str = "") -> str:
    """The docs+tok CTE pair, optionally filtered (e.g. the salted-hash
    document sample the dedup_recall harness uses)."""
    return f"""
docs AS (
  SELECT doc_id, text, lang, source, n_chars,
         trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
                             ' +', ' ', 'g')) AS norm
  FROM documents
  {where}
),
tok AS (
  SELECT *, list_filter(string_split(norm, ' '), x -> x != '') AS toks FROM docs
)
"""


_DOCS_TOK_CTE = _docs_tok_cte()



def _sql_hash60(expr: str) -> str:
    return f"CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT)"



def _sql_shingle_sh_cte(n: int) -> str:
    """DuckDB twin of ``dedup.shingle_hashes``: per-token 31-bit hashes
    combined arithmetically over each n-token window (list named
    ``sh`` keyed by doc_id; expects the ``tok`` CTE in scope).  The
    fold order and modulus match the Spark zip_with chain exactly, and
    every intermediate stays below 2^36 (DuckDB BIGINTs trap on
    overflow rather than wrapping)."""
    combined = "hs[i+1]"
    for j in range(2, n + 1):
        combined = f"(({combined}) * 31 + hs[i+{j}]) % {MERSENNE31}"
    return f"""hs AS (
  SELECT doc_id, [{_sql_hash60("t")} % {MERSENNE31} for t in toks] AS hs FROM tok
),
sh AS (
  SELECT doc_id, list_distinct([{combined} for i in range(0, len(hs) - {n - 1})]) AS sh
  FROM hs
)"""



def _sql_stopword_hits(lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    return f"len(list_filter(toks, t -> list_contains([{words}], t)))"



# --------------------------------------------------------------------------
# text_analysis: token counting, fingerprinting, language-ID, quality.
# --------------------------------------------------------------------------

_CJK_SQL = (
    "CASE WHEN length(text) > 0 THEN "
    "(length(text) - length(regexp_replace(text, '[\\x{4E00}-\\x{9FFF}]', '', 'g')))"
    " / length(text) ELSE 0.0 END"
)


_LANG_CASE = (
    f"CASE WHEN {_CJK_SQL} >= 0.3 THEN 'zh' WHEN greatest("
    + ", ".join(f"c_{lang}" for lang in STOPWORDS)
    + ") = 0 THEN 'unknown' "
    + " ".join(
        f"WHEN c_{lang} = greatest(" + ", ".join(f"c_{l2}" for l2 in STOPWORDS) + f") THEN '{lang}'"
        for lang in STOPWORDS
    )
    + " END"
)



# Text feature CTEs + the quality formula, shared by text_analysis and
# corpus_filter (expects the docs/tok CTEs in scope).
_TEXT_FEAT_CTES = f"""hits AS (
  SELECT *,
         {", ".join(f"{_sql_stopword_hits(lang)} AS c_{lang}" for lang in STOPWORDS)}
  FROM tok
),
feat AS (
  SELECT doc_id, lang, toks, c_en, c_de, c_fr, c_es, text,
         CAST(len(toks) AS INTEGER) AS n_tokens,
         md5(norm) AS fingerprint,
         {_LANG_CASE} AS lang_guess,
         CASE WHEN len(toks) > 0 THEN c_en / len(toks) ELSE 0.0 END AS sw_ratio,
         CASE WHEN len(toks) > 0
              THEN list_sum([length(t) for t in toks]) / len(toks) ELSE 0.0 END AS mean_len,
         CASE WHEN length(text) > 0
              THEN (length(text) - length(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g')))
                    / length(text)
              ELSE 0.0 END AS punct_ratio
  FROM hits
)"""


_QUALITY_SQL = """0.3 * least(n_tokens / 100.0, 1.0)
           + 0.3 * greatest(0.0, 1 - abs(mean_len - 5.0) / 5.0)
           + 0.3 * least(sw_ratio / 0.4, 1.0)
           + 0.1 * (1 - least(punct_ratio / 0.2, 1.0))"""



@register(
    "text_analysis",
    f"""
WITH
{_DOCS_TOK_CTE},
{_TEXT_FEAT_CTES}
SELECT doc_id, lang, n_tokens, fingerprint, lang_guess,
       round(sw_ratio, 6) AS stopword_ratio,
       round({_QUALITY_SQL}, 6) AS quality_score
FROM feat
""",
    "Token counts, content fingerprint, stopword language-ID, heuristic "
    "quality score — one codegen-only pass over documents",
)
def q_text_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    out = text_ops.text_profile(docs, text_col="text", keep=("doc_id", "lang"))
    return out.select(
        "doc_id",
        "lang",
        "n_tokens",
        "fingerprint",
        "lang_guess",
        F.round("stopword_ratio", 6).alias("stopword_ratio"),
        F.round("quality_score", 6).alias("quality_score"),
    )



# --------------------------------------------------------------------------
# repetition_profile — Gopher-style within-doc repetition quality rules
# (duplicate n-gram / sentence fractions).  Pure HOF array math: zero
# shuffles, so the oracle is list-comprehension arithmetic per row.
# --------------------------------------------------------------------------


def _rep_gram_sql(n: int) -> str:
    gram = " || ' ' || ".join(f"toks[i+{j + 1}]" for j in range(n))
    seq = f"[{gram} for i in range(0, len(toks) - {n - 1})]"
    return (
        f"CASE WHEN len(toks) >= {n} THEN "
        f"1.0 - len(list_distinct({seq})) / (len(toks) - {n - 1}) "
        f"ELSE 0.0 END"
    )



@register(
    "repetition_profile",
    f"""
WITH
{_DOCS_TOK_CTE},
sent AS (
  SELECT *, list_filter(list_transform(regexp_split_to_array(text, '[.!?]+'),
                                       x -> trim(x)), x -> x != '') AS sents
  FROM tok
)
SELECT doc_id, lang,
  round({_rep_gram_sql(2)}, 6) AS rep_2gram_frac,
  round({_rep_gram_sql(3)}, 6) AS rep_3gram_frac,
  round({_rep_gram_sql(4)}, 6) AS rep_4gram_frac,
  round(CASE WHEN len(sents) > 0
        THEN 1.0 - len(list_distinct(sents)) / len(sents) ELSE 0.0 END, 6) AS dup_sentence_frac
FROM sent
""",
    "Within-doc duplicate n-gram / sentence fractions (Gopher repetition "
    "rules) — zero-shuffle higher-order-function array math",
)
def q_repetition_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.functions.text import repetition_profile

    docs = read_table(spark, sf_dir, "documents")
    out = repetition_profile(docs, text_col="text", keep=("doc_id", "lang"))
    return out.select(
        "doc_id",
        "lang",
        *[
            F.round(c, 6).alias(c)
            for c in (
                "rep_2gram_frac",
                "rep_3gram_frac",
                "rep_4gram_frac",
                "dup_sentence_frac",
            )
        ],
    )



# --------------------------------------------------------------------------
# C-ext. Kontoyiannis LZ entropy (operators/entropy.py::lz_entropy, AFML 18.4)
# --------------------------------------------------------------------------

_LZ_WINDOW = 50

_LZ_LOG2W = 5.643856189774724  # math.log2(_LZ_WINDOW), pinned literal



@register(
    "lz_entropy",
    f"""
WITH trades AS ({TRADES_CTE}),
rets AS (
  SELECT symbol, ts_event, seq,
    CASE WHEN price > lag(price) OVER w THEN '1' ELSE '0' END AS b,
    row_number() OVER w AS rn
  FROM trades
  WINDOW w AS (PARTITION BY symbol ORDER BY ts_event, seq)
),
bits AS (
  SELECT symbol, ts_event, seq, b, rn - 1 AS i
  FROM rets WHERE rn > 1
),
strs AS (
  SELECT symbol, string_agg(b, '' ORDER BY i) AS s FROM bits GROUP BY symbol
),
cand AS (
  SELECT bi.symbol, bi.i,
    CASE WHEN substr(st.s, CAST(bi.i AS INT), m.m)
            = substr(st.s, CAST(bi.i - g.j AS INT), m.m)
         THEN m.m END AS hit
  FROM bits bi
  JOIN strs st USING (symbol)
  CROSS JOIN generate_series(1, {_LZ_WINDOW}) AS g(j)
  JOIN generate_series(1, {_LZ_WINDOW}) AS m(m) ON m.m <= g.j
  WHERE bi.i > {_LZ_WINDOW}
),
lmax AS (
  SELECT symbol, i, 1 + coalesce(max(hit), 0) AS L
  FROM cand GROUP BY symbol, i
),
run AS (
  SELECT b.symbol, b.ts_event, b.i, l.L,
    count(l.L) OVER r AS cnt,
    sum(l.L) OVER r AS sl
  FROM bits b LEFT JOIN lmax l USING (symbol, i)
  WINDOW r AS (PARTITION BY b.symbol ORDER BY b.i
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT symbol, ts_event,
  CAST(L AS INTEGER) AS lz_match_len,
  round(CASE WHEN cnt > 0 THEN {_LZ_LOG2W!r} * cnt / sl END, 6) AS lz_entropy
FROM run
""",
    f"Kontoyiannis sliding-window ({_LZ_WINDOW}-bit) match-length entropy "
    "rate of the binary return-sign sequence (AFML 18.4)",
)
def q_lz_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.operators.entropy import lz_entropy

    with _trades_config():
        out = lz_entropy(trades_from_events(spark, sf_dir), window=_LZ_WINDOW)
    return out.select(
        "symbol",
        "ts_event",
        "lz_match_len",
        F.round("lz_entropy", 6).alias("lz_entropy"),
    )



def _pii_oracle() -> str:
    t = "text"
    count_cols = []
    for name, pat in PII_PATTERNS.items():
        esc = pat.replace("'", "''")
        count_cols.append(
            f"CAST(len(regexp_extract_all({t}, '{esc}')) AS INTEGER) AS n_{name}"
        )
        t = f"regexp_replace({t}, '{esc}', '{PII_TOKENS[name]}', 'g')"
    total = " + ".join(f"n_{name}" for name in PII_PATTERNS)
    return f"""
WITH scrub AS (
  SELECT doc_id,
    {", ".join(count_cols)},
    md5({t}) AS scrub_md5
  FROM documents
)
SELECT doc_id, {", ".join(f"n_{n}" for n in PII_PATTERNS)},
  CAST({total} AS INTEGER) AS n_pii_total,
  ({total}) > 0 AS has_pii,
  scrub_md5
FROM scrub
"""



@register(
    "pii_scrub",
    _pii_oracle(),
    "Disjoint sequential regex PII counts (email/SSN/credit-card/IPv4/"
    "phone) and the scrubbed-text fingerprint per document",
)
def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.functions.pii import pii_profile

    docs = read_table(spark, sf_dir, "documents")
    out = pii_profile(docs)
    return out.select(
        "doc_id",
        *[F.col(f"n_{n}").cast("int").alias(f"n_{n}") for n in PII_PATTERNS],
        F.col("n_pii_total").cast("int").alias("n_pii_total"),
        "has_pii",
        F.md5("text_scrubbed").alias("scrub_md5"),
    )



# --------------------------------------------------------------------------
# C-ext. C4/Gopher boilerplate flags (functions/text.py::boilerplate_profile)
# --------------------------------------------------------------------------


@register(
    "boilerplate",
    r"""
WITH lined AS (
  SELECT doc_id, text,
    list_filter(string_split(text, chr(10)), x -> trim(x) != '') AS lines,
    list_filter(regexp_split_to_array(text, '[.!?]+'), s -> trim(s) != '') AS sents,
    len(list_filter(string_split(trim(regexp_replace(regexp_replace(lower(text),
        '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), ' '), x -> x != '')) AS n_tok
  FROM documents
)
SELECT doc_id,
  CAST(len(lines) AS INTEGER) AS n_lines,
  round(CASE WHEN len(lines) > 0 THEN
    len(list_filter(lines, x -> right(trim(x), 1) IN ('.', '!', '?', '"')))
      / CAST(len(lines) AS DOUBLE) END, 6) AS end_punct_frac,
  round(CASE WHEN len(lines) > 0 THEN
    len(list_filter(lines, x -> left(ltrim(x), 1) IN ('-', '*', '•')))
      / CAST(len(lines) AS DOUBLE) END, 6) AS bullet_frac,
  round(CASE WHEN len(lines) > 0 THEN n_tok / CAST(len(lines) AS DOUBLE) END, 6)
    AS mean_words_per_line,
  CAST(len(sents) AS INTEGER) AS n_sentences,
  contains(lower(text), 'lorem ipsum') AS has_lorem,
  contains(text, '{') AS has_curly,
  contains(lower(text), 'javascript') AS has_javascript,
  (len(sents) >= 3 AND NOT contains(lower(text), 'lorem ipsum')
   AND NOT contains(text, '{') AND NOT contains(lower(text), 'javascript'))
    AS c4_keep
FROM lined
""",
    "C4/Gopher boilerplate flags: line punctuation/bullet fractions, "
    "sentence count, lorem/brace/javascript artifacts, document keep gate",
)
def q_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.functions.text import boilerplate_profile

    docs = read_table(spark, sf_dir, "documents")
    out = boilerplate_profile(docs, min_sentences=3)
    return out.select(
        "doc_id",
        F.col("n_lines").cast("int").alias("n_lines"),
        F.round("end_punct_frac", 6).alias("end_punct_frac"),
        F.round("bullet_frac", 6).alias("bullet_frac"),
        F.round("mean_words_per_line", 6).alias("mean_words_per_line"),
        F.col("n_sentences").cast("int").alias("n_sentences"),
        "has_lorem",
        "has_curly",
        "has_javascript",
        "c4_keep",
    )



# --------------------------------------------------------------------------
# C-ext. Document chunking (functions/corpus.py::chunk_documents) — the
# cleaning -> chunking -> packing middle step; integer-exact sliding
# windows replayed verbatim by the oracle.
# --------------------------------------------------------------------------

_CH_C, _CH_S = 48, 40  # chunk_tokens, stride (overlap 8)



@register(
    "chunk_documents",
    f"""
WITH
{_DOCS_TOK_CTE},
t AS (
  SELECT doc_id, toks, len(toks) AS n,
    CASE WHEN len(toks) <= {_CH_C} THEN 1
         ELSE CAST((len(toks) - {_CH_C} + {_CH_S} - 1) // {_CH_S} AS INTEGER) + 1
    END AS n_chunks
  FROM tok WHERE len(toks) >= 1
),
ex AS (
  SELECT doc_id, toks, n_chunks, CAST(unnest(generate_series(0, n_chunks - 1)) AS INTEGER) AS chunk_idx
  FROM t
)
SELECT doc_id, chunk_idx, CAST(n_chunks AS INTEGER) AS n_chunks,
  CAST(chunk_idx * {_CH_S} AS INTEGER) AS start_token,
  CAST(len(list_slice(toks, chunk_idx * {_CH_S} + 1, chunk_idx * {_CH_S} + {_CH_C}))
       AS INTEGER) AS chunk_n_tokens,
  array_to_string(list_slice(toks, chunk_idx * {_CH_S} + 1, chunk_idx * {_CH_S} + {_CH_C}), ' ')
    AS chunk_text
FROM ex
""",
    f"Sliding-window document chunking ({_CH_C} tokens, overlap "
    f"{_CH_C - _CH_S}) — cleaning -> chunking -> packing middle step; "
    "zero shuffles, bounded explode fan-out",
)
def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.functions.corpus import chunk_documents

    docs = read_table(spark, sf_dir, "documents")
    return chunk_documents(docs, chunk_tokens=_CH_C, overlap=_CH_C - _CH_S)



# --------------------------------------------------------------------------
# C-ext. Character-entropy quality signal (functions/text.py::
# char_entropy) — sorted-alphabet sequential fold, bit-identical replay.
# --------------------------------------------------------------------------


@register(
    "char_entropy",
    """
WITH docs AS (
  SELECT doc_id,
         trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
                             ' +', ' ', 'g')) AS norm
  FROM documents
),
ch AS (
  SELECT doc_id, list_filter(string_split(norm, ''), c -> c != '') AS chars
  FROM docs
),
terms AS (
  SELECT doc_id, len(chars) AS n,
    list_transform(
      list_sort(list_distinct(chars)),
      a -> (len(list_filter(chars, x -> x = a)) / CAST(len(chars) AS DOUBLE))
           * ln(len(list_filter(chars, x -> x = a)) / CAST(len(chars) AS DOUBLE))
    ) AS t
  FROM ch
)
SELECT doc_id, CAST(n AS INTEGER) AS n_chars_norm,
  round(CASE WHEN n > 0
             THEN -list_reduce(list_prepend(CAST(0.0 AS DOUBLE), t), (a, b) -> a + b)
        END, 6) + 0 AS char_entropy
FROM terms
""",
    "Shannon character entropy of normalized text per document (nats) — "
    "cheap gibberish/repetition quality signal; pure HOF Columns, zero "
    "shuffles, sorted-alphabet fold replayed bit-identically",
)
def q_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.functions.text import char_entropy, normalize_text

    docs = read_table(spark, sf_dir, "documents")
    staged = docs.withColumn(
        "__chars",
        F.filter(F.split(normalize_text(F.col("text")), ""), lambda c: c != ""),
    )
    z0 = F.lit(0.0)
    return staged.select(
        "doc_id",
        F.size("__chars").cast("int").alias("n_chars_norm"),
        (F.round(char_entropy(F.col("__chars")), 6) + z0).alias("char_entropy"),
    )



# --------------------------------------------------------------------------
# C-ext. Flesch reading ease (functions/text.py::reading_ease) — integer
# word/sentence/syllable counts, engine-exact score.
# --------------------------------------------------------------------------


@register(
    "reading_ease",
    f"""
WITH
{_DOCS_TOK_CTE},
fe AS (
  SELECT doc_id, toks,
    greatest(1, len(list_filter(regexp_split_to_array(text, '[.!?]+'),
                                s -> trim(s) != ''))) AS n_sents
  FROM tok
),
fs AS (
  SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_words,
    CAST(n_sents AS BIGINT) AS n_sentences,
    CAST(coalesce(list_sum(list_transform(toks, t -> greatest(1,
        len(regexp_extract_all(t, '[aeiouy]+'))
        - CASE WHEN t LIKE '%e' AND length(t) > 2
               AND len(regexp_extract_all(t, '[aeiouy]+')) > 1
          THEN 1 ELSE 0 END))), 0) AS BIGINT) AS n_syllables
  FROM fe
)
SELECT doc_id, n_words, n_sentences, n_syllables,
  round(CASE WHEN n_words > 0
        THEN 206.835
             - 1.015 * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE))
             - 84.6 * (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE))
        END, 6) + 0 AS flesch
FROM fs
""",
    "Flesch reading ease per document (vowel-group syllables with "
    "silent-e rule, sentence floor 1) — staged-array HOFs, integer "
    "counts, zero shuffles, zero Python",
)
def q_reading_ease(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.functions.text import reading_ease

    docs = read_table(spark, sf_dir, "documents")
    out = reading_ease(docs)
    return out.select(
        "doc_id",
        "n_words",
        "n_sentences",
        "n_syllables",
        (F.round("flesch", 6) + F.lit(0.0)).alias("flesch"),
    )



# --------------------------------------------------------------------------
# C-ext. Lexical diversity (functions/text.py::lexical_diversity) — TTR /
# hapax ratio / Yule's K per document; pure integer hash aggregates, floats
# are final single divisions.
# --------------------------------------------------------------------------


@register(
    "lexical_diversity",
    f"""
WITH
{_DOCS_TOK_CTE},
ltk AS (SELECT doc_id, unnest(toks) AS token FROM tok),
lpt AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS c
        FROM ltk GROUP BY doc_id, token),
ldv AS (
  SELECT doc_id,
    CAST(sum(c) AS BIGINT) AS n_tokens,
    CAST(count(*) AS BIGINT) AS n_types,
    CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
    CAST(sum(c * c) AS BIGINT) AS s2
  FROM lpt GROUP BY doc_id
)
SELECT d.doc_id,
  COALESCE(a.n_tokens, 0) AS n_tokens,
  COALESCE(a.n_types, 0) AS n_types,
  COALESCE(a.n_hapax, 0) AS n_hapax,
  CASE WHEN a.n_tokens > 0
       THEN round(CAST(a.n_types AS DOUBLE) / CAST(a.n_tokens AS DOUBLE), 6) + 0
  END AS ttr,
  CASE WHEN a.n_types > 0
       THEN round(CAST(a.n_hapax AS DOUBLE) / CAST(a.n_types AS DOUBLE), 6) + 0
  END AS hapax_ratio,
  CASE WHEN a.n_tokens > 0
       THEN round(1e4 * CAST(a.s2 - a.n_tokens AS DOUBLE)
                  / (CAST(a.n_tokens AS DOUBLE) * CAST(a.n_tokens AS DOUBLE)), 6) + 0
  END AS yule_k
FROM docs d LEFT JOIN ldv a ON d.doc_id = a.doc_id
""",
    "Per-document vocabulary richness: type-token ratio, hapax ratio, "
    "Yule's K (template-spam / keyboard-mash gate); integer hash "
    "aggregates only, floats are final single divisions",
)
def q_lexical_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.functions.text import lexical_diversity

    docs = read_table(spark, sf_dir, "documents")
    out = lexical_diversity(docs)
    z0 = F.lit(0.0)
    return out.select(
        "doc_id",
        "n_tokens",
        "n_types",
        "n_hapax",
        (F.round("ttr", 6) + z0).alias("ttr"),
        (F.round("hapax_ratio", 6) + z0).alias("hapax_ratio"),
        (F.round("yule_k", 6) + z0).alias("yule_k"),
    )



# --------------------------------------------------------------------------
# C-ext. Encoding quality (functions/text.py::encoding_quality) — U+FFFD /
# control-char / mojibake / printable-ASCII profile.  Zero shuffles; the
# regexes stay in the subset Java regex and RE2 evaluate identically, and
# the SAME pattern strings are interpolated into both engines.
# --------------------------------------------------------------------------

_EQ_CTRL = r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]"

_EQ_ASCII = r"[^ -~\t\n\r]"

_EQ_MOJI = "[ÃÂâï]"



@register(
    "encoding_quality",
    f"""
WITH eq AS (
  SELECT doc_id,
    CAST(COALESCE(length(text), 0) AS BIGINT) AS n_chars,
    CAST(COALESCE(length(text) - length(regexp_replace(text, '�', '', 'g')), 0)
         AS BIGINT) AS n_replacement,
    CAST(COALESCE(length(text) - length(regexp_replace(text, '{_EQ_CTRL}', '', 'g')), 0)
         AS BIGINT) AS n_control,
    CAST(COALESCE(length(text) - length(regexp_replace(text, '{_EQ_MOJI}', '', 'g')), 0)
         AS BIGINT) AS mojibake_leads,
    CAST(COALESCE(length(regexp_replace(text, '{_EQ_ASCII}', '', 'g')), 0)
         AS BIGINT) AS ascii_n
  FROM documents
)
SELECT doc_id, n_chars, n_replacement, n_control, mojibake_leads,
  CASE WHEN n_chars > 0
       THEN round(CAST(ascii_n AS DOUBLE) / CAST(n_chars AS DOUBLE), 6) + 0
  END AS ascii_ratio,
  CAST(CASE WHEN n_replacement > 0 OR n_control > 0
              OR (n_chars > 0
                  AND CAST(mojibake_leads AS DOUBLE)
                      > 0.005 * CAST(n_chars AS DOUBLE))
       THEN 1 ELSE 0 END AS INTEGER) AS flagged
FROM eq
""",
    "Byte-sanity gate: U+FFFD replacement chars, C0 control chars, "
    "UTF-8-as-Latin-1 mojibake lead density, printable-ASCII ratio — "
    "zero-shuffle codegen pass with engine-portable regexes",
)
def q_encoding_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.functions.text import encoding_quality

    docs = read_table(spark, sf_dir, "documents")
    out = encoding_quality(docs, control_pattern=_EQ_CTRL)
    z0 = F.lit(0.0)
    return out.select(
        "doc_id",
        "n_chars",
        "n_replacement",
        "n_control",
        "mojibake_leads",
        (F.round("ascii_ratio", 6) + z0).alias("ascii_ratio"),
        F.col("flagged").cast("int").alias("flagged"),
    )


# The testdata corpus is pure prose (zero code punctuation), so the query
# splices a deterministic code snippet into 2/3 of the docs IDENTICALLY in
# both engines — the structural counters then separate three real classes
# (heavy code, light code, prose) instead of emitting all-zero rows.
_CD_SNIP = "\ndef f(x):\n    return x + 1;\n    y = (x + 2);"

_CD_SNIP_SQL = "e'" + _CD_SNIP.replace("\n", "\\n") + "'"



@register(
    "code_detection",
    """
WITH cds AS (
  SELECT doc_id,
    text || CASE WHEN doc_id % 3 = 0 THEN repeat({snip}, 4)
                 WHEN doc_id % 3 = 2 THEN {snip}
                 ELSE '' END AS text
  FROM documents
),
cdq AS (
  SELECT doc_id,
    CAST(COALESCE(length(text), 0) AS BIGINT) AS n_chars,
    CAST(CASE WHEN COALESCE(length(text), 0) > 0
         THEN length(text) - length(regexp_replace(text, '\\n', '', 'g')) + 1
         ELSE 0 END AS BIGINT) AS n_lines,
    CAST(COALESCE(length(text)
         - length(regexp_replace(text, '{sym}', '', 'g')), 0) AS BIGINT)
      AS symbol_chars,
    CAST(COALESCE(len(regexp_extract_all(text, '{ind}')), 0) AS BIGINT)
      AS indent_lines,
    CAST(COALESCE(len(regexp_extract_all(text, '{semi}')), 0) AS BIGINT)
      AS semi_lines
  FROM cds
)
SELECT doc_id, n_chars, n_lines, symbol_chars, indent_lines, semi_lines,
  CASE WHEN n_chars > 0
       THEN round(CAST(symbol_chars AS DOUBLE) / CAST(n_chars AS DOUBLE), 6) + 0
  END AS symbol_ratio,
  CASE WHEN n_lines > 0
       THEN round(CAST(indent_lines AS DOUBLE) / CAST(n_lines AS DOUBLE), 6) + 0
  END AS indent_ratio,
  CASE WHEN n_lines > 0
       THEN round(CAST(semi_lines AS DOUBLE) / CAST(n_lines AS DOUBLE), 6) + 0
  END AS semi_ratio,
  CAST(CASE WHEN n_chars > 0
         AND CAST(symbol_chars AS DOUBLE) / CAST(n_chars AS DOUBLE) > 0.03
         AND (CASE WHEN n_lines > 0
                THEN CAST(indent_lines AS DOUBLE) / CAST(n_lines AS DOUBLE)
                ELSE 0 END > 0.15
           OR CASE WHEN n_lines > 0
                THEN CAST(semi_lines AS DOUBLE) / CAST(n_lines AS DOUBLE)
                ELSE 0 END > 0.10)
       THEN 1 ELSE 0 END AS INTEGER) AS is_code
FROM cdq
""".format(
        sym=CODE_SYMBOL_PATTERN,
        ind=CODE_INDENT_PATTERN,
        semi=CODE_SEMI_EOL_PATTERN,
        snip=_CD_SNIP_SQL,
    ),
    "Structural code-likeness gate: code-punctuation density, indented-"
    "line and semicolon-EOL fractions (routes source code away from the "
    "prose filters) over deterministically code-spliced docs; "
    "zero-shuffle codegen pass, portable regexes",
)
def q_code_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.functions.text import code_detection

    snip = F.lit(_CD_SNIP)
    docs = read_table(spark, sf_dir, "documents").withColumn(
        "text",
        F.concat(
            F.col("text"),
            F.when(F.col("doc_id") % 3 == 0, F.repeat(snip, 4))
            .when(F.col("doc_id") % 3 == 2, snip)
            .otherwise(F.lit("")),
        ),
    )
    out = code_detection(docs)
    z0 = F.lit(0.0)
    return out.select(
        "doc_id",
        "n_chars",
        "n_lines",
        "symbol_chars",
        "indent_lines",
        "semi_lines",
        (F.round("symbol_ratio", 6) + z0).alias("symbol_ratio"),
        (F.round("indent_ratio", 6) + z0).alias("indent_ratio"),
        (F.round("semi_ratio", 6) + z0).alias("semi_ratio"),
        F.col("is_code").cast("int").alias("is_code"),
    )



# --------------------------------------------------------------------------
# C-ext. Language-mix profile (functions/corpus.py::lang_mix) — per-source
# cross-lingual contamination gate.  The entropy fold runs in lang order
# via a running window read at the last row (SCALING rule 24); the majority
# pick is a total ordering (count desc, lang asc).
# --------------------------------------------------------------------------


@register(
    "lang_mix",
    """
WITH lmc AS (SELECT source, lang, CAST(count(*) AS BIGINT) AS c
             FROM documents GROUP BY source, lang),
lmw AS (
  SELECT source, lang, c,
    CAST(sum(c) OVER f AS BIGINT) AS tot,
    CAST(count(*) OVER f AS BIGINT) AS k,
    row_number() OVER (PARTITION BY source ORDER BY lang) AS rn,
    row_number() OVER (PARTITION BY source ORDER BY c DESC, lang ASC) AS toprn
  FROM lmc
  WINDOW f AS (PARTITION BY source)
),
lm2 AS (
  SELECT source, lang, c, tot, k, rn,
    -((CAST(c AS DOUBLE) / CAST(tot AS DOUBLE))
      * ln(CAST(c AS DOUBLE) / CAST(tot AS DOUBLE))) AS term,
    CASE WHEN toprn = 1 THEN lang END AS tl,
    CASE WHEN toprn = 1 THEN c END AS tc
  FROM lmw
),
lm3 AS (
  SELECT source, tot, k, rn,
    sum(term) OVER (PARTITION BY source ORDER BY lang
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ent,
    max(tl) OVER (PARTITION BY source) AS top_lang,
    max(tc) OVER (PARTITION BY source) AS topc
  FROM lm2
)
SELECT source, tot AS n_docs, k AS n_langs, top_lang,
  round(CAST(topc AS DOUBLE) / CAST(tot AS DOUBLE), 6) + 0 AS top_share,
  round(ent, 6) + 0 AS lang_entropy
FROM lm3 WHERE rn = k
""",
    "Per-source language mix: doc counts, majority language + share, "
    "Shannon entropy of the language distribution (mislabeled / "
    "machine-mixed source gate); lang-ordered entropy fold",
)
def q_lang_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.functions.corpus import lang_mix

    docs = read_table(spark, sf_dir, "documents")
    out = lang_mix(docs)
    z0 = F.lit(0.0)
    return out.select(
        "source",
        "n_docs",
        "n_langs",
        "top_lang",
        (F.round("top_share", 6) + z0).alias("top_share"),
        (F.round("lang_entropy", 6) + z0).alias("lang_entropy"),
    )


@register(
    "lang_confusion",
    f"""
WITH
{_DOCS_TOK_CTE},
lch AS (
  SELECT lang, text,
         {", ".join(f"{_sql_stopword_hits(lang)} AS c_{lang}" for lang in STOPWORDS)}
  FROM tok
),
lcg AS (SELECT lang, {_LANG_CASE} AS lang_guess FROM lch),
lcc AS (
  SELECT lang, lang_guess, CAST(count(*) AS BIGINT) AS n_docs
  FROM lcg GROUP BY lang, lang_guess
)
SELECT lang, lang_guess, n_docs,
  round(n_docs / CAST(sum(n_docs) OVER (PARTITION BY lang) AS DOUBLE), 6) + 0
    AS share_of_lang,
  CAST(CASE WHEN lang = lang_guess THEN 1 ELSE 0 END AS INTEGER) AS is_correct
FROM lcc
""",
    "Confusion matrix of the stopword/CJK language-ID heuristic vs the "
    "corpus labels: one (label, guess) hash aggregate + a "
    "languages^2-bounded share window — the gate-evaluation report",
)
def q_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from polars_trading_spark.functions.text import lang_confusion

    docs = read_table(spark, sf_dir, "documents")
    out = lang_confusion(docs)
    z0 = F.lit(0.0)
    return out.select(
        "lang",
        "lang_guess",
        "n_docs",
        (F.round("share_of_lang", 6) + z0).alias("share_of_lang"),
        "is_correct",
    )
