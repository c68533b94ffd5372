"""Text-analysis operators over the `documents` table (training-data
pipeline surface; BASELINE.json north star).

All four operators are pure per-row expression trees built from
``pyspark.sql.functions`` — no Python UDFs — so they run inside whole-stage
codegen and scale linearly with the scan: at 100 TB these are map-only
stages with zero shuffle.

Cross-engine hash parity: document hashes are derived from md5 hex strings
(identical in Spark and DuckDB); hex → int uses Spark ``conv(...,16,10)``
vs DuckDB ``list_reduce`` over hex digits — same value, so the DuckDB
oracle checks real equality, not just shape.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession

from apache_iceberg_spark.registry import register
from apache_iceberg_spark.tables import load_table, load_table_parallel

# 60-bit integer from the first 15 hex chars of md5 — fits in a BIGINT on
# both engines.
SPARK_HEX2INT = "CAST(CONV(SUBSTRING(MD5({s}), 1, 15), 16, 10) AS BIGINT)"
DUCK_HEX2INT = (
    "list_reduce([strpos('0123456789abcdef', c) - 1 "
    "for c in regexp_extract_all(substr(md5({s}), 1, 15), '.')], "
    "(a, b) -> a * 16 + b)"
)


def hash60(col_sql: str) -> Column:
    """Spark-side 60-bit md5 hash of a SQL expression string."""
    return F.expr(SPARK_HEX2INT.format(s=col_sql))


STOPWORDS = {
    "en": ["the", "a", "and", "of", "to", "in", "is", "on", "for", "with"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "los", "se", "del"],
    "de": ["der", "die", "das", "und", "ist", "von", "mit", "ein", "zu", "den"],
    "fr": ["le", "la", "les", "de", "et", "un", "une", "est", "pour", "dans"],
}

_TOKEN_SPLIT = r"\s+"
# BPE-ish segmentation: alpha runs, single digits, single punctuation marks.
_BPE_RE = "[a-z]+|[0-9]|[^a-z0-9 ]"


def _tokens(col: str = "text") -> Column:
    return F.split(F.lower(F.trim(F.col(col))), _TOKEN_SPLIT)


@register(
    "tx1_token_stats",
    oracle=f"""
        SELECT doc_id,
               len(string_split_regex(lower(trim(text)), '{_TOKEN_SPLIT}')) AS n_tokens,
               len(regexp_extract_all(lower(text), '{_BPE_RE}')) AS n_bpeish,
               length(text) AS n_chars_computed
        FROM documents
    """,
    doc="Token counting: whitespace tokens plus a BPE-ish segment count "
    "(alpha runs / digits / punctuation marks) — the standard cheap "
    "token-budget estimator for LLM data work.",
    tags=("text", "llm"),
)
def tx1_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(_tokens()).alias("n_tokens"),
        F.size(F.regexp_extract_all(F.lower(F.col("text")), F.lit(_BPE_RE), 0)).alias(
            "n_bpeish"
        ),
        F.length("text").alias("n_chars_computed"),
    )


@register(
    "tx2_quality_score",
    oracle=f"""
        WITH t AS (
            SELECT doc_id,
                   length(text) AS n_chars,
                   len(string_split_regex(lower(trim(text)), '{_TOKEN_SPLIT}')) AS n_tokens,
                   len(list_filter(string_split_regex(lower(trim(text)), '{_TOKEN_SPLIT}'),
                       tok -> list_contains({STOPWORDS['en']!r}, tok))) AS n_stop,
                   len(regexp_extract_all(text, '[.,;:!?]')) AS n_punct
            FROM documents
        )
        SELECT doc_id, n_chars, n_tokens,
               CAST(n_stop AS DOUBLE) / n_tokens AS stop_ratio,
               CAST(n_punct AS DOUBLE) / n_chars AS punct_ratio,
               CAST(n_chars AS DOUBLE) / n_tokens AS avg_token_len,
               (CAST(n_stop AS DOUBLE) / n_tokens) * 0.5
                 + (CASE WHEN n_tokens >= 20 AND n_tokens <= 1000 THEN 0.3 ELSE 0.0 END)
                 + (CASE WHEN CAST(n_punct AS DOUBLE) / n_chars < 0.1 THEN 0.2 ELSE 0.0 END)
                 AS quality
        FROM t
    """,
    doc="Heuristic document quality: stopword ratio + length band + "
    "punctuation ratio (the classic Gopher/C4-style cheap filters). "
    "Weighted sum uses only IEEE +,*,/ on identical operand order, so "
    "the oracle matches bitwise.",
    tags=("text", "llm"),
)
def tx2_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = _tokens()
    stop_arr = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
    t = d.select(
        "doc_id",
        F.length("text").alias("n_chars"),
        F.size(toks).alias("n_tokens"),
        F.size(F.filter(toks, lambda tok: F.array_contains(stop_arr, tok))).alias(
            "n_stop"
        ),
        F.size(F.regexp_extract_all(F.col("text"), F.lit("[.,;:!?]"), 0)).alias(
            "n_punct"
        ),
    )
    stop_ratio = F.col("n_stop").cast("double") / F.col("n_tokens")
    punct_ratio = F.col("n_punct").cast("double") / F.col("n_chars")
    return t.select(
        "doc_id",
        "n_chars",
        "n_tokens",
        stop_ratio.alias("stop_ratio"),
        punct_ratio.alias("punct_ratio"),
        (F.col("n_chars").cast("double") / F.col("n_tokens")).alias("avg_token_len"),
        (
            stop_ratio * 0.5
            + F.when(
                (F.col("n_tokens") >= 20) & (F.col("n_tokens") <= 1000), 0.3
            ).otherwise(0.0)
            + F.when(punct_ratio < 0.1, 0.2).otherwise(0.0)
        ).alias("quality"),
    )


def _duck_stop_count(lang: str) -> str:
    return (
        f"len(list_filter(string_split_regex(lower(trim(text)), '{_TOKEN_SPLIT}'), "
        f"tok -> list_contains({STOPWORDS[lang]!r}, tok)))"
    )


@register(
    "tx3_langid",
    oracle=f"""
        WITH scores AS (
            SELECT doc_id, lang AS lang_label,
                   {_duck_stop_count('en')} AS s_en,
                   {_duck_stop_count('es')} AS s_es,
                   {_duck_stop_count('de')} AS s_de,
                   {_duck_stop_count('fr')} AS s_fr
            FROM documents
        )
        SELECT doc_id, lang_label,
               CASE
                 WHEN s_de > s_en AND s_de > s_es AND s_de > s_fr THEN 'de'
                 WHEN s_en >= s_de AND s_en > s_es AND s_en > s_fr THEN 'en'
                 WHEN s_es >= s_de AND s_es >= s_en AND s_es > s_fr THEN 'es'
                 ELSE 'fr'
               END AS lang_pred,
               s_en, s_es, s_de, s_fr
        FROM scores
    """,
    doc="Language identification via function-word (stopword) hit counts — "
    "the classic n-gram/dictionary heuristic. Deterministic argmax with "
    "alphabetical tiebreak (de < en < es < fr).",
    tags=("text", "llm"),
)
def tx3_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = _tokens()
    def stop_count(lang: str) -> Column:
        stop_arr = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
        return F.size(
            F.filter(toks, lambda tok: F.array_contains(stop_arr, tok))
        ).alias(f"s_{lang}")

    scores = d.select(
        "doc_id",
        F.col("lang").alias("lang_label"),
        *[stop_count(lang) for lang in ("en", "es", "de", "fr")],
    )
    s_en, s_es, s_de, s_fr = (F.col(c) for c in ("s_en", "s_es", "s_de", "s_fr"))
    pred = (
        F.when((s_de > s_en) & (s_de > s_es) & (s_de > s_fr), "de")
        .when((s_en >= s_de) & (s_en > s_es) & (s_en > s_fr), "en")
        .when((s_es >= s_de) & (s_es >= s_en) & (s_es > s_fr), "es")
        .otherwise("fr")
    )
    return scores.select(
        "doc_id", "lang_label", pred.alias("lang_pred"), "s_en", "s_es", "s_de", "s_fr"
    )


@register(
    "tx4_fingerprint",
    oracle=f"""
        SELECT doc_id,
               {DUCK_HEX2INT.format(s="text")} AS doc_hash,
               list_min([
                   {DUCK_HEX2INT.format(s="substr(text, i, 8)")}
                   for i in generate_series(1, greatest(length(text) - 7, 1))
               ]) AS min_shingle_hash
        FROM documents
    """,
    doc="Document fingerprinting: a whole-document 60-bit hash plus a "
    "rolling min-hash over 8-char shingles (winnowing-style robust "
    "fingerprint that survives small edits). Pure expression tree — no "
    "shuffle, no UDF.",
    tags=("text", "llm", "dedup"),
)
def tx4_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    min_shingle = F.expr(
        "array_min(transform(sequence(1, greatest(length(text) - 7, 1)), "
        f"i -> {SPARK_HEX2INT.format(s='substr(text, i, 8)')}))"
    )
    return d.select(
        "doc_id",
        hash60("text").alias("doc_hash"),
        min_shingle.alias("min_shingle_hash"),
    )


@register(
    "tx5_repetition",
    oracle=f"""
        WITH t AS (
            SELECT doc_id, {{duck_tokens}} AS toks FROM documents
        ),
        g AS (
            SELECT doc_id,
                   greatest(len(toks) - 1, 1) AS total_bigrams,
                   len(list_distinct([toks[i] || ' ' || toks[i + 1]
                        for i in generate_series(1, greatest(len(toks) - 1, 1))]))
                       AS distinct_bigrams
            FROM t
        )
        SELECT doc_id, total_bigrams, distinct_bigrams,
               1.0 - CAST(distinct_bigrams AS DOUBLE) / total_bigrams
                   AS repetition_ratio
        FROM g
    """.format(duck_tokens=r"string_split_regex(lower(trim(text)), '\s+')"),
    doc="N-gram repetition scoring: fraction of duplicated word bigrams "
    "(1 - distinct/total) — the standard boilerplate/looping-text "
    "signal for LLM training-data filtering. Map-only expression tree; "
    "codegen subexpression elimination evaluates the tokenizer once per "
    "row even though the alias is inlined into every reference.",
    tags=("text", "llm", "quality"),
)
def tx5_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table_parallel(spark, sf_dir, "documents")
    toks_df = d.select(
        "doc_id", F.split(F.lower(F.trim(F.col("text"))), _TOKEN_SPLIT).alias("toks")
    )
    bigrams = F.expr(
        "transform(sequence(1, greatest(size(toks) - 1, 1)), "
        "i -> concat_ws(' ', element_at(toks, i), element_at(toks, i + 1)))"
    )
    out = toks_df.select(
        "doc_id",
        F.greatest(F.size("toks") - 1, F.lit(1)).alias("total_bigrams"),
        F.size(F.array_distinct(bigrams)).alias("distinct_bigrams"),
    )
    return out.select(
        "doc_id",
        "total_bigrams",
        "distinct_bigrams",
        (
            1.0
            - F.col("distinct_bigrams").cast("double") / F.col("total_bigrams")
        ).alias("repetition_ratio"),
    )


TX6_PREFIX = 80
TX6_MAX_DIST = 20


@register(
    "tx6_edit_distance",
    oracle=f"""
        WITH p AS (
            SELECT doc_id, lang, source,
                   substr(lower(text), 1, {TX6_PREFIX}) AS prefix
            FROM documents
        )
        SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
               levenshtein(a.prefix, b.prefix) AS edit_dist
        FROM p a JOIN p b
          ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
        WHERE levenshtein(a.prefix, b.prefix) <= {TX6_MAX_DIST}
    """,
    doc=f"Edit-distance near-match within (lang, source) blocks: classic "
    f"Levenshtein DP over {TX6_PREFIX}-char prefixes (bounding the O(L²) "
    "DP cost per pair), pairs at distance ≤ "
    f"{TX6_MAX_DIST}. Both engines implement the standard DP → exact "
    "integer parity. Block key bounds the pair space exactly like dd4; "
    "at scale, prefix-bucket the block key.",
    tags=("text", "llm", "dedup"),
)
def tx6_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table_parallel(spark, sf_dir, "documents")
    p = d.select(
        "doc_id",
        "lang",
        "source",
        F.substring(F.lower(F.col("text")), 1, TX6_PREFIX).alias("prefix"),
    )
    a = p.alias("a")
    b = p.alias("b")
    dist = F.levenshtein(F.col("a.prefix"), F.col("b.prefix"))
    return (
        a.join(
            b,
            (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.source") == F.col("b.source"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .filter(dist <= TX6_MAX_DIST)
        .select(
            F.col("a.doc_id").alias("doc_id_a"),
            F.col("b.doc_id").alias("doc_id_b"),
            dist.alias("edit_dist"),
        )
    )


TX7_TERMS = "customer|key"


@register(
    "tx7_term_masking",
    oracle=f"""
        SELECT doc_id,
               regexp_replace(text, '\\b({TX7_TERMS})\\b', '[MASKED]', 'g')
                   AS masked,
               len(regexp_extract_all(text, '\\b({TX7_TERMS})\\b')) AS n_masked
        FROM documents
    """,
    doc="Sensitive-term masking — the PII-redaction shape for training-data "
    "pipelines (this corpus has no emails/SSNs, so a term list stands in; "
    "with real PII the pattern set swaps in unchanged). Word-boundary "
    "regexp_replace + match count, map-only, stays in codegen; the "
    "pattern syntax is the Java/RE2-compatible subset so both engines "
    "compute identical masks.",
    tags=("text", "llm", "privacy"),
)
def tx7_term_masking(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    pat = rf"\b({TX7_TERMS})\b"
    return d.select(
        "doc_id",
        F.regexp_replace(F.col("text"), pat, "[MASKED]").alias("masked"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(pat), 0)).alias(
            "n_masked"
        ),
    )


# PII class patterns — the Java/RE2-compatible subset so both engines
# compute identical masks. Phone anchors on a leading '+' and allows only
# digits/dashes inside, so the three classes are mutually disjoint (an IP
# can't be counted as a phone) and redaction order cannot matter.
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IP_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_PHONE_RE = r"\+\d[\d-]{7,}\d"

# The fixture corpus carries no PII, so a deterministic contact block is
# synthesized from existing columns (dd7's URL-synthesis precedent) and
# the *redaction* below is the operator under test. Built with identical
# expressions on both engines.
_PII_SRC_SPARK = (
    "concat(text, ' contact ', source, lang, CAST(doc_id % 97 AS STRING), "
    "'@', source, '.example.com phone +1-555-', "
    "lpad(CAST(doc_id % 10000 AS STRING), 4, '0'), '-', "
    "lpad(CAST(doc_id % 997 AS STRING), 3, '0'), "
    "' ip 10.', CAST(doc_id % 256 AS STRING), '.', "
    "CAST((doc_id * 7) % 256 AS STRING), '.', "
    "CAST((doc_id * 13) % 256 AS STRING))"
)
_PII_SRC_DUCK = _PII_SRC_SPARK.replace("AS STRING", "AS VARCHAR")


@register(
    "tx11_pii_redaction",
    oracle=f"""
        WITH src AS (
            SELECT doc_id, {_PII_SRC_DUCK} AS raw FROM documents
        )
        SELECT doc_id,
               len(regexp_extract_all(raw, '{PII_EMAIL_RE}')) AS n_emails,
               len(regexp_extract_all(raw, '{PII_IP_RE}')) AS n_ips,
               len(regexp_extract_all(raw, '{PII_PHONE_RE}')) AS n_phones,
               regexp_replace(regexp_replace(regexp_replace(raw,
                   '{PII_EMAIL_RE}', '<EMAIL>', 'g'),
                   '{PII_IP_RE}', '<IP>', 'g'),
                   '{PII_PHONE_RE}', '<PHONE>', 'g') AS redacted
        FROM src
    """,
    doc="PII redaction — standard pretraining hygiene: mask emails, IPv4 "
    "addresses and phone numbers with typed placeholders and report "
    "per-class hit counts. Pure regexp_replace / regexp_extract_all "
    "expression chains (map-only, whole-stage codegen, no Python); the "
    "class patterns are mutually disjoint by construction so the "
    "replace order is immaterial and counts are exact. The corpus "
    "carries no PII, so a deterministic contact block is synthesized "
    "from fixture columns first (see module source) — with real data "
    "the synthesis drops out and the pattern set swaps in unchanged.",
    tags=("text", "llm", "privacy"),
)
def tx11_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    raw = d.select("doc_id", F.expr(_PII_SRC_SPARK).alias("raw"))
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("raw"), PII_EMAIL_RE, "<EMAIL>"),
            PII_IP_RE,
            "<IP>",
        ),
        PII_PHONE_RE,
        "<PHONE>",
    )
    return raw.select(
        "doc_id",
        F.size(
            F.regexp_extract_all(F.col("raw"), F.lit(PII_EMAIL_RE), 0)
        ).alias("n_emails"),
        F.size(F.regexp_extract_all(F.col("raw"), F.lit(PII_IP_RE), 0)).alias(
            "n_ips"
        ),
        F.size(
            F.regexp_extract_all(F.col("raw"), F.lit(PII_PHONE_RE), 0)
        ).alias("n_phones"),
        redacted.alias("redacted"),
    )


# Gopher-style rule bounds (Rae et al. 2021, table A1 — the published
# values, not fixture-tuned): word count, mean word length, fraction of
# alphabetic words, and minimum distinct-stopword hits.
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_LEN = 3.0
GOPHER_MAX_MEAN_LEN = 10.0
GOPHER_MIN_ALPHA_FRAC = 0.8
GOPHER_MIN_STOP_HITS = 2
_GOPHER_STOPS = ["the", "a", "and", "of", "to", "in", "be", "that"]


@register(
    "tx12_gopher_rules",
    oracle=f"""
        WITH t AS (
            SELECT doc_id,
                   string_split_regex(lower(trim(text)), '\\s+') AS toks
            FROM documents
        ),
        m AS (
            SELECT doc_id,
                   len(toks) AS n_words,
                   CAST(COALESCE(list_sum(list_transform(toks, w -> length(w))), 0)
                        AS DOUBLE) / greatest(len(toks), 1) AS mean_word_len,
                   CAST(len(list_filter(toks, w -> regexp_matches(w, '[a-z]')))
                        AS DOUBLE) / greatest(len(toks), 1) AS alpha_frac,
                   len(list_intersect(list_distinct(toks),
                       {_GOPHER_STOPS!r})) AS stop_hits
            FROM t
        )
        SELECT doc_id, n_words, mean_word_len, alpha_frac, stop_hits,
               n_words BETWEEN {GOPHER_MIN_WORDS} AND {GOPHER_MAX_WORDS}
                   AS r_word_count,
               mean_word_len BETWEEN {GOPHER_MIN_MEAN_LEN} AND {GOPHER_MAX_MEAN_LEN}
                   AS r_mean_len,
               alpha_frac >= {GOPHER_MIN_ALPHA_FRAC} AS r_alpha,
               stop_hits >= {GOPHER_MIN_STOP_HITS} AS r_stop,
               (n_words BETWEEN {GOPHER_MIN_WORDS} AND {GOPHER_MAX_WORDS})
                   AND (mean_word_len BETWEEN {GOPHER_MIN_MEAN_LEN}
                        AND {GOPHER_MAX_MEAN_LEN})
                   AND alpha_frac >= {GOPHER_MIN_ALPHA_FRAC}
                   AND stop_hits >= {GOPHER_MIN_STOP_HITS} AS keep
        FROM m
    """,
    doc="Gopher quality rules (Rae et al. 2021): per-document boolean "
    "flags for the published repetition-independent gates — word-count "
    "band, mean-word-length band, alphabetic-word fraction, and "
    "distinct-stopword presence — plus the conjunctive keep decision. "
    "Complements tx2's weighted score with the rule-flag shape real "
    "curation pipelines log per gate (so downstream analysis can ask "
    "'which rule rejected most documents?'). Pure expression tree over "
    "one higher-order-function pass per rule, map-only, no shuffle; at "
    "100 TB this is scan-bound like tx1/tx2.",
    tags=("text", "llm", "quality"),
)
def tx12_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    t = d.select("doc_id", _tokens().alias("toks"))
    n_words = F.size("toks")
    denom = F.greatest(n_words, F.lit(1))
    mean_len = (
        F.expr("aggregate(toks, 0, (acc, w) -> acc + length(w))").cast("double")
        / denom
    )
    alpha_frac = (
        F.expr("size(filter(toks, w -> w rlike '[a-z]'))").cast("double") / denom
    )
    stops = F.array(*[F.lit(w) for w in _GOPHER_STOPS])
    stop_hits = F.size(F.array_intersect(F.array_distinct(F.col("toks")), stops))
    m = t.select(
        "doc_id",
        n_words.alias("n_words"),
        mean_len.alias("mean_word_len"),
        alpha_frac.alias("alpha_frac"),
        stop_hits.alias("stop_hits"),
    )
    r_word_count = F.col("n_words").between(GOPHER_MIN_WORDS, GOPHER_MAX_WORDS)
    r_mean_len = F.col("mean_word_len").between(
        GOPHER_MIN_MEAN_LEN, GOPHER_MAX_MEAN_LEN
    )
    r_alpha = F.col("alpha_frac") >= GOPHER_MIN_ALPHA_FRAC
    r_stop = F.col("stop_hits") >= GOPHER_MIN_STOP_HITS
    return m.select(
        "doc_id",
        "n_words",
        "mean_word_len",
        "alpha_frac",
        "stop_hits",
        r_word_count.alias("r_word_count"),
        r_mean_len.alias("r_mean_len"),
        r_alpha.alias("r_alpha"),
        r_stop.alias("r_stop"),
        (r_word_count & r_mean_len & r_alpha & r_stop).alias("keep"),
    )


# tx13 pseudo-lines match dd10's convention (tokens per line); a real
# crawl corpus swaps the splitter for split(text, '\n') unchanged.
TX13_LINE_TOKENS = 10


@register(
    "tx13_within_doc_line_dedup",
    oracle=f"""
        WITH t AS (
            SELECT doc_id,
                   string_split_regex(lower(trim(text)), '\\s+') AS toks
            FROM documents
        ),
        l AS (
            SELECT doc_id,
                   [array_to_string(
                        toks[(i - 1) * {TX13_LINE_TOKENS} + 1
                             : i * {TX13_LINE_TOKENS}], ' ')
                    for i in generate_series(1,
                        CAST(ceil(len(toks) / {TX13_LINE_TOKENS}.0) AS INT))]
                       AS lines
            FROM t
        ),
        k AS (
            SELECT doc_id, lines,
                   [lines[i] for i in generate_series(1, len(lines))
                    if list_position(lines[1:i-1], lines[i]) = 0]
                       AS kept
            FROM l
        )
        SELECT doc_id,
               CAST(len(lines) AS INT) AS n_lines,
               CAST(len(kept) AS INT) AS n_kept,
               array_to_string(kept, ' ') AS cleaned_text,
               1.0 - CAST(len(kept) AS DOUBLE) / len(lines) AS removed_frac
        FROM k
        WHERE len(lines) > 0
    """,
    doc="Within-document repeated-line REMOVAL — the transform behind "
    "tx5's repetition score and the Gopher/C4 boilerplate cleanup: "
    "each document's pseudo-lines (dd10's 10-token windows; swap in "
    "split-by-newline on a real crawl) are deduplicated preserving "
    "first-occurrence order, and the cleaned text is reassembled. "
    "Order-preserving dedup is an expression fold (keep line i iff it "
    "does not appear in lines[1..i-1]) — O(lines²) per document but "
    "entirely map-side: zero shuffle, zero UDF, scales with the scan "
    "like every tx operator.",
    tags=("text", "llm", "dedup", "quality"),
)
def tx13_within_doc_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    lines_expr = F.expr(
        f"transform(sequence(1, CAST(ceil(size(toks) / {TX13_LINE_TOKENS}.0) "
        f"AS INT)), i -> concat_ws(' ', "
        f"slice(toks, (i - 1) * {TX13_LINE_TOKENS} + 1, {TX13_LINE_TOKENS})))"
    )
    kept_expr = F.expr(
        "transform(filter(transform(sequence(1, size(lines)), "
        "i -> struct(i AS i, element_at(lines, i) AS line)), "
        "s -> array_position(slice(lines, 1, s.i - 1), s.line) = 0), "
        "s -> s.line)"
    )
    return (
        d.select("doc_id", _tokens().alias("toks"))
        .select("doc_id", lines_expr.alias("lines"))
        .filter(F.size("lines") > 0)
        .select(
            "doc_id",
            F.size("lines").alias("n_lines"),
            kept_expr.alias("kept"),
        )
        .select(
            "doc_id",
            "n_lines",
            F.size("kept").alias("n_kept"),
            F.concat_ws(" ", F.col("kept")).alias("cleaned_text"),
            (
                1.0 - F.size("kept").cast("double") / F.col("n_lines")
            ).alias("removed_frac"),
        )
    )


TX14_TOP_K = 3
# A term is "content" (not stopword-like) when it appears in at most
# 1/TX14_DF_DIV of all documents: df * TX14_DF_DIV <= n_docs, an exact
# integer comparison on both engines.
TX14_DF_DIV = 5


@register(
    "tx14_tfidf_keywords",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id,
                   unnest(string_split_regex(lower(trim(text)),
                          '{_TOKEN_SPLIT}')) AS tok
            FROM documents
        ),
        tf AS (
            SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf
            FROM toks GROUP BY doc_id, tok
        ),
        df AS (
            SELECT tok, CAST(COUNT(*) AS BIGINT) AS df
            FROM tf GROUP BY tok
        ),
        n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
        ranked AS (
            SELECT tf.doc_id, tf.tok, tf.tf, df.df,
                   ROW_NUMBER() OVER (
                       PARTITION BY tf.doc_id
                       ORDER BY tf.tf DESC, tf.tok
                   ) AS rank
            FROM tf
            JOIN df USING (tok)
            CROSS JOIN n
            WHERE df.df * {TX14_DF_DIV} <= n.n_docs
        )
        SELECT doc_id, tok AS term, tf, df, rank
        FROM ranked WHERE rank <= {TX14_TOP_K}
    """,
    doc=f"Keyword extraction, the TF-IDF shape in exact integers: terms "
    f"whose document frequency is at most 1/{TX14_DF_DIV} of the corpus "
    "(the df gate that drops stopwords without a hand-made list — "
    f"df * {TX14_DF_DIV} <= n_docs, integer-exact where a float idf "
    f"log would not hash-match), then the top-{TX14_TOP_K} surviving "
    "terms per document by term frequency (ties by term). One shuffle "
    "for tf on (doc_id, tok), one aggregate of tf for df on tok, the "
    "corpus size broadcast as a single row, and a per-document window "
    "— every step partitioned, nothing global. At 100 TB the df frame "
    "is vocabulary-sized: broadcast under AQE, like tx8's frequency "
    "join.",
    tags=("text", "llm", "keywords"),
)
def tx14_tfidf_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = load_table_parallel(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.explode(
            F.split(F.lower(F.trim(F.col("text"))), _TOKEN_SPLIT)
        ).alias("tok"),
    )
    tf = toks.groupBy("doc_id", "tok").agg(F.count("*").alias("tf"))
    df = tf.groupBy("tok").agg(F.count("*").alias("df"))
    n = d.agg(F.count("*").alias("n_docs"))
    w = Window.partitionBy("doc_id").orderBy(F.desc("tf"), F.asc("tok"))
    return (
        tf.join(df, "tok")
        .join(F.broadcast(n))
        .filter(F.col("df") * TX14_DF_DIV <= F.col("n_docs"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TX14_TOP_K)
        .select("doc_id", F.col("tok").alias("term"), "tf", "df", "rank")
    )


# --- tx15: BPE tokenizer training (first K merges) --------------------------
#
# The canonical tokenizer-training loop, distributed the way production BPE
# trainers actually shard it: ONE corpus-scale pass builds the (word, freq)
# vocabulary (Heaps' law keeps it tiny relative to the corpus — tx10's
# observation), then every merge round runs on the VOCAB ONLY. Round 8
# promoted the family from demonstration to production shape (VERDICT r7
# ask #1): the alphabet is BYTE-LEVEL (every word becomes its UTF-8 byte
# sequence — any script tokenizes, no ^[a-z]+$ assumption), the merge count
# is a real vocabulary-building budget (64), and the merge loop itself is
# size-gated the way production trainers run it — the corpus pass is always
# distributed, while the loop over the Heaps-law vocab runs the incremental
# pair-count algorithm on the driver below TX15_DRIVER_VOCAB and the
# per-round distributed dataflow (argmax + fold rewrite) above it.

TX15_MERGES = 64

#: Driver-mode gate for the merge loop (the corpus-scale counting pass is
#: ALWAYS distributed; this only gates where the vocab-scale loop runs).
#: Below this many distinct words the loop is the incremental pair-count
#: algorithm (HF-tokenizers' shape: only words containing the merged pair
#: are touched per round — O(touched), not O(vocab)); above it, each round
#: is a distributed argmax + expression-fold rewrite. Sizing: 2M words
#: x ~80 B ≈ 160 MB driver heap, same class as dedup's _CC_DRIVER_EDGES;
#: merge-round cost for both branches is measured in SCALE_NOTES §BPE.
TX15_DRIVER_VOCAB = 2_000_000

# Byte-level symbol alphabet: one 2-hex-char symbol per UTF-8 byte
# ('68', 'E2', ...); merges concatenate, re-joining multi-byte sequences
# exactly as GPT-2-style byte-level BPE does. Hex symbols are [0-9A-F]+,
# so embedding merge pairs as SQL literals needs no quoting rules, and
# both engines derive them from the same uppercase hex(encode(word)).
_TX15_SPARK_SYMS = (
    "transform(sequence(1, length(h) DIV 2), i -> substring(h, 2*i - 1, 2))"
)
_TX15_DUCK_SYMS = (
    "[substring(h, 2*i - 1, 2) for i in generate_series(1, len(h) // 2)]"
)

# Canonical whitespace tokenizer expressions (dedup.py imports these; text
# cannot import dedup back without a cycle, so they live here).
_SPARK_TOKENS = r"split(lower(trim(text)), '\\s+')"
_DUCK_TOKENS = r"string_split_regex(lower(trim(text)), '\s+')"


def _tx15_spark_rewrite(a: str, b: str) -> str:
    """Greedy non-overlapping left-to-right merge of adjacent (a, b) into
    one symbol, as an expression fold over the symbol array."""
    return (
        "aggregate(syms, CAST(array() AS ARRAY<STRING>), (acc, s) -> "
        f"CASE WHEN size(acc) > 0 AND element_at(acc, -1) = {a} AND s = {b} "
        f"THEN concat(slice(acc, 1, size(acc) - 1), array({a} || {b})) "
        "ELSE concat(acc, array(s)) END)"
    )


def _tx15_duck_rewrite(a: str, b: str) -> str:
    """DuckDB twin: list_reduce needs acc type == element type, so the fold
    runs over singleton lists ([[s] for s in syms])."""
    return (
        "list_reduce(list_prepend(CAST([] AS VARCHAR[]), "
        "[[s] for s in syms]), (acc, x) -> "
        f"CASE WHEN len(acc) > 0 AND acc[-1] = {a} AND x[1] = {b} "
        f"THEN acc[:len(acc) - 1] || [{a} || {b}] "
        "ELSE acc || x END)"
    )


def _tx15_oracle() -> str:
    return f"""
        WITH {_tx15_train_ctes()}
        {" UNION ALL ".join(
            f"SELECT {r} AS merge_rank, a AS left_sym, b AS right_sym, "
            f"a || b AS merged, cnt AS pair_count FROM m{r}"
            for r in range(1, TX15_MERGES + 1)
        )}
    """


def _tx15_train_ctes() -> str:
    """The WITH-body computing tx15's merge table (terminal CTEs m1..mK)
    — shared by tx15's oracle (which SELECTs the table) and tx17's
    (which APPLIES the merges to every document's token stream)."""
    rounds = []
    for r in range(1, TX15_MERGES + 1):
        prev = f"v{r - 1}"
        rewrite = _tx15_duck_rewrite(f"m{r}.a", f"m{r}.b")
        rounds.append(f"""p{r} AS MATERIALIZED (
            SELECT struct_extract(p, 'a') AS a, struct_extract(p, 'b') AS b,
                   CAST(SUM(freq) AS BIGINT) AS cnt
            FROM (
                SELECT unnest([{{'a': syms[i], 'b': syms[i + 1]}}
                               for i in generate_series(1, len(syms) - 1)])
                           AS p,
                       freq
                FROM {prev}
            )
            GROUP BY 1, 2
        ),
        m{r} AS MATERIALIZED (
            SELECT a, b, cnt FROM p{r}
            ORDER BY cnt DESC, a, b LIMIT 1
        ),
        v{r} AS MATERIALIZED (
            SELECT {rewrite} AS syms, freq
            FROM {prev} CROSS JOIN m{r}
        )""")
    return f"""words AS MATERIALIZED (
            SELECT hex(encode(tok)) AS h, CAST(COUNT(*) AS BIGINT) AS freq
            FROM (SELECT unnest({_DUCK_TOKENS}) AS tok FROM documents)
            WHERE tok <> ''
            GROUP BY tok
        ),
        v0 AS MATERIALIZED (
            SELECT {_TX15_DUCK_SYMS} AS syms, freq
            FROM words
        ),
        {",".join(rounds)}"""


@register(
    "tx15_bpe_merges",
    oracle=_tx15_oracle(),
    doc=f"BYTE-LEVEL BPE tokenizer training, first {TX15_MERGES} merges "
    "— production-shaped (VERDICT r7 ask #1): every whitespace token "
    "becomes its UTF-8 byte sequence (2-hex-char symbols — any script "
    "tokenizes; multi-byte sequences re-join through merges exactly as "
    "GPT-2-style byte-level BPE), ONE corpus-scale aggregate builds the "
    "(word, freq) vocab (the only pass that touches the corpus — "
    "Heaps' law keeps the vocab tiny, which is exactly how production "
    "BPE trainers shard: count distributed, merge loop on the vocab), "
    "then each round counts adjacent symbol pairs weighted by word "
    "frequency, takes the arg-max pair (count desc, lexicographic "
    "tiebreak — deterministic), and rewrites each affected word's "
    "symbol sequence greedily left-to-right. The merge loop is "
    f"SIZE-GATED (TX15_DRIVER_VOCAB={TX15_DRIVER_VOCAB}): below the "
    "gate it runs the incremental pair-count algorithm on the driver "
    "(HF-tokenizers' shape — only words containing the merged pair are "
    "touched per round), above it the per-round distributed dataflow "
    "(one-row arg-max collect + expression-fold rewrite, at most two "
    "vocab-scale frames cached, zero after — persist-lifecycle "
    "convention). Emits the merge table (rank, pair, merged symbol, "
    "weighted count) — the artifact a tokenizer ships; the oracle "
    "recomputes all rounds as a chained-CTE full recount, so the "
    "incremental and recount algorithms cross-check each other.",
    tags=("text", "llm", "tokenizer", "iterative"),
)
def tx15_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    merges, _ = _tx15_train(spark, sf_dir)
    return spark.createDataFrame(
        merges,
        "merge_rank INT, left_sym STRING, right_sym STRING, "
        "merged STRING, pair_count BIGINT",
    )


def _tx15_driver_merges(
    words: list[tuple[list[str], int]], n_merges: int
) -> list[tuple]:
    """Incremental-pair-count BPE merge loop on the collected vocabulary
    (the HF-tokenizers algorithm): pair counts update only for words that
    contained the merged pair — O(touched words) per round, not
    O(vocab) — with the argmax (count desc, pair lexicographic asc) and
    the greedy left-to-right non-overlapping rewrite IDENTICAL to the
    distributed fold and to the oracle's full-recount CTE chain, so all
    three algorithms produce the same merge table."""
    from collections import Counter, defaultdict

    syms = [list(s) for s, _ in words]
    freqs = [f for _, f in words]
    counts: Counter = Counter()
    members: defaultdict = defaultdict(set)
    for wi, s in enumerate(syms):
        f = freqs[wi]
        for a, b in zip(s, s[1:]):
            counts[(a, b)] += f
            members[(a, b)].add(wi)
    out: list[tuple] = []
    for r in range(1, n_merges + 1):
        best = None
        for p, c in counts.items():
            if c > 0 and (best is None or (-c, p) < best):
                best = (-c, p)
        if best is None:
            break  # vocab fully merged — oracle's m{r} is empty too
        a, b = best[1]
        out.append((r, a, b, a + b, -best[0]))
        # Only words that (ever) held the pair are touched; stale members
        # fold to themselves (net-zero count updates). The merged symbol
        # a+b is strictly longer than a, so no new (a, b) pair can appear
        # during this rewrite — popping the membership set is safe.
        for wi in members.pop((a, b), ()):
            s = syms[wi]
            f = freqs[wi]
            for x, y in zip(s, s[1:]):
                counts[(x, y)] -= f
            ns: list[str] = []
            for t in s:
                if ns and ns[-1] == a and t == b:
                    ns[-1] = a + b
                else:
                    ns.append(t)
            syms[wi] = ns
            for x, y in zip(ns, ns[1:]):
                counts[(x, y)] += f
                members[(x, y)].add(wi)
    return out


def _tx15_train(
    spark: SparkSession, sf_dir: str, n_merges: int = TX15_MERGES
) -> tuple[list[tuple], int]:
    """tx15's size-gated BPE trainer, factored so tx17 can APPLY the
    learned merges (the tokenizer's inference half). Returns
    (merges, n_vocab): merges = [(rank, a, b, merged, count)] over
    byte-level hex symbols; n_vocab = distinct-word count (tx17 picks
    its join strategy with it). The corpus is scanned exactly once;
    persist lifecycle: zero cached frames after return."""
    d = load_table_parallel(spark, sf_dir, "documents")
    words = (
        d.select(F.explode(F.expr(_SPARK_TOKENS)).alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count("*").alias("freq"))
        .select(F.expr("hex(encode(tok, 'utf-8'))").alias("h"), "freq")
        .persist()
    )
    try:
        n_vocab = words.count()
        if n_vocab <= TX15_DRIVER_VOCAB:
            collected = [(r["h"], r["freq"]) for r in words.collect()]
            words_list = [
                ([h[i : i + 2] for i in range(0, len(h), 2)], f)
                for h, f in collected
            ]
            return _tx15_driver_merges(words_list, n_merges), n_vocab
        vocab = words.select(
            F.expr(_TX15_SPARK_SYMS).alias("syms"), "freq"
        ).persist()
        vocab.count()  # materialize from the cached words frame
    finally:
        words.unpersist()
    # Distributed per-round loop — the vocab outgrew the driver gate.
    # DELTA pair-count maintenance (VERDICT r8 ask #7, the distributed
    # port of _tx15_driver_merges' incremental algorithm): the pair-count
    # table is built ONCE from the full vocab, then each round only the
    # words containing the merged pair are exploded, rewritten, and
    # re-counted — their old pairs subtract, their new pairs add, and the
    # maintained counts frame (bounded by the distinct-pair support,
    # tx20's Zipf measurements) serves the next arg-max. Per-round cost
    # drops from O(total vocab symbols) to O(touched-word symbols) plus
    # one counts-table shuffle; the untouched-vocab filter is a map-only
    # scan of the cached frame. Probe: SCALE_NOTES §BPE-delta.

    def _pair_counts(df: DataFrame, sign: int) -> DataFrame:
        return (
            df.select(
                F.posexplode(
                    F.expr("slice(syms, 1, size(syms) - 1)")
                ).alias("i0", "a"),
                F.col("syms"),
                F.col("freq"),
            )
            .select(
                "a",
                F.expr("element_at(syms, CAST(i0 + 2 AS INT))").alias("b"),
                (F.col("freq") * sign).alias("freq"),
            )
            .groupBy("a", "b")
            .agg(F.sum("freq").alias("cnt"))
        )

    # Lineage discipline: the vocab update is ONE self-referencing
    # projection (CASE-guarded rewrite), so its plan stays linear in
    # rounds like the r8 loop — a two-branch union (touched ∪ untouched)
    # would double the tree every round. The expensive fold only
    # executes on rows whose guard fires, which IS the "filter before
    # rewrite" of the ask at row granularity; the counts shuffle — the
    # dominant per-round cost of the old full-recount loop (O(total
    # symbols) explode + exchange every round) — now moves only the
    # touched words' pair deltas plus the maintained counts table.
    # localCheckpoint (not persist) on the two carried frames: each round's
    # guard+rewrite CASE references `syms` several times, and across rounds
    # Catalyst's projection collapse multiplies the inlined fold expression
    # — 20 rounds of persist-only lineage OOM'd the driver just BUILDING
    # the plan string. Checkpointing truncates the logical plan to a leaf
    # each round, so plan size is constant in rounds (the dd6/g3 lineage-
    # cut convention for iterative operators).
    rows: list[tuple] = []
    counts = _pair_counts(vocab, 1).localCheckpoint()
    vocab, _cached = vocab.localCheckpoint(), vocab
    _cached.unpersist()
    for r in range(1, n_merges + 1):
        top = (
            counts.orderBy(F.desc("cnt"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not top:
            break  # vocab fully merged — oracle's m{r} is empty too
        a, b, cnt = top[0]["a"], top[0]["b"], top[0]["cnt"]
        rows.append((r, a, b, a + b, cnt))
        if r < n_merges:
            # Words holding the merged pair ADJACENTLY are the only
            # ones whose symbols (and pair contributions) change.
            # The adjacency guard is a flat STRING search over the
            # space-joined symbol array (symbols are hex, no spaces)
            # — measured 2-3x cheaper per row than the equivalent
            # zip_with/exists higher-order fold.
            has_pair = (
                "contains(concat(' ', array_join(syms, ' '), ' '), "
                f"' {a} {b} ')"
            )
            rewrite = _tx15_spark_rewrite(f"'{a}'", f"'{b}'")
            touched = vocab.filter(F.expr(has_pair)).persist()
            new_t = touched.select(F.expr(rewrite).alias("syms"), "freq")
            counts = (
                counts.unionByName(_pair_counts(touched, -1))
                .unionByName(_pair_counts(new_t, 1))
                .groupBy("a", "b")
                .agg(F.sum("cnt").alias("cnt"))
                .filter(F.col("cnt") > 0)
                .localCheckpoint()
            )
            vocab = vocab.select(
                F.expr(
                    f"CASE WHEN {has_pair} THEN {rewrite} ELSE syms END"
                ).alias("syms"),
                "freq",
            ).localCheckpoint()
            touched.unpersist()
    return rows, n_vocab


# --- tx16: rarity filter — the log-free unigram-LM quality gate -------------

#: Rarity quantization: token rarity = (corpus_tokens * MICRO) // cnt.
#: At ~1e13 corpus tokens the product approaches int64; drop MICRO to 1e3
#: there (the comparison only needs the ratio).
TX16_MICRO = 1_000_000
#: Band cut factors vs the corpus mean rarity: a doc is 'rare' (likely
#: gibberish / OCR noise) above 2x the corpus mean per-token rarity, and
#: 'common' (likely boilerplate) below 1/2 of it — CCNet's keep-the-middle
#: perplexity bucketing, re-expressed log-free.
TX16_HI_NUM, TX16_HI_DEN = 2, 1
TX16_LO_NUM, TX16_LO_DEN = 1, 2


@register(
    "tx16_rarity_filter",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, tok
            FROM (SELECT doc_id, unnest({_DUCK_TOKENS}) AS tok
                  FROM documents)
            WHERE tok <> ''
        ),
        uni AS (
            SELECT tok, CAST(COUNT(*) AS BIGINT) AS cnt
            FROM toks GROUP BY tok
        ),
        tot AS (
            SELECT CAST(SUM(cnt) AS BIGINT) AS n_total FROM uni
        ),
        rar AS (
            SELECT tok, (t.n_total * {TX16_MICRO}) // cnt AS rarity_micro
            FROM uni CROSS JOIN tot t
        ),
        per_doc AS (
            SELECT d.doc_id,
                   CAST(COUNT(*) AS BIGINT) AS n_toks,
                   CAST(SUM(r.rarity_micro) AS BIGINT) AS rarity_sum
            FROM toks d JOIN rar r USING (tok)
            GROUP BY d.doc_id
        ),
        corpus AS (
            SELECT CAST(SUM(rarity_sum) AS BIGINT)
                       // CAST(SUM(n_toks) AS BIGINT) AS mean_micro
            FROM per_doc
        )
        SELECT p.doc_id, p.n_toks,
               p.rarity_sum // p.n_toks AS mean_rarity_micro,
               CASE
                   WHEN (p.rarity_sum // p.n_toks) * {TX16_HI_DEN}
                        > c.mean_micro * {TX16_HI_NUM} THEN 'rare'
                   WHEN (p.rarity_sum // p.n_toks) * {TX16_LO_DEN}
                        < c.mean_micro * {TX16_LO_NUM} THEN 'common'
                   ELSE 'mid'
               END AS band
        FROM per_doc p CROSS JOIN corpus c
    """,
    doc="RARITY quality filter — the unigram-LM gate of a CCNet-style "
    "curation cascade, made LOG-FREE for bitwise engine parity "
    "(the repo's determinism rules ban libm transcendentals in "
    "oracle-checked paths: ln differs in the last ulp across engines): "
    "token surprisal -log p is replaced by the order-equivalent-in-"
    "spirit inverse unigram frequency, quantized to exact BIGINT "
    "micro-units (corpus_tokens * 1e6 // cnt), so every cross-row sum "
    "is integer-exact. Pass 1 builds the unigram table (Heaps-law "
    "small); pass 2 joins tokens to rarities and folds per-doc sums; "
    "docs are banded keep-the-middle against the corpus mean "
    "(>2x mean = 'rare' → gibberish/OCR noise, <1/2x = 'common' → "
    "boilerplate) via pure BIGINT cross-multiplication. Scale: the "
    "token→rarity join keys on the token (Zipf-skewed — AQE skew "
    "handling or a broadcast of the Heaps-law vocab both work; the "
    "corpus never collects), the per-doc fold keys on doc_id "
    "(unskewed), and the corpus mean is one scalar.",
    tags=("text", "llm", "quality", "filter"),
)
def tx16_rarity_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table_parallel(spark, sf_dir, "documents")
    toks = (
        d.select("doc_id", F.explode(F.expr(_SPARK_TOKENS)).alias("tok"))
        .filter(F.col("tok") != "")
    )
    uni = toks.groupBy("tok").agg(F.count("*").alias("cnt"))
    tot = uni.agg(F.sum("cnt").alias("n_total"))
    rar = uni.crossJoin(F.broadcast(tot)).select(
        "tok",
        F.expr(f"(n_total * {TX16_MICRO}) DIV cnt").alias("rarity_micro"),
    )
    per_doc = (
        toks.join(rar, "tok")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_toks"),
            F.sum("rarity_micro").alias("rarity_sum"),
        )
    )
    corpus = per_doc.agg(
        F.expr("SUM(rarity_sum) DIV SUM(n_toks)").alias("mean_micro")
    )
    mean = F.expr("rarity_sum DIV n_toks")
    return per_doc.crossJoin(F.broadcast(corpus)).select(
        "doc_id",
        "n_toks",
        mean.alias("mean_rarity_micro"),
        F.when(
            mean * TX16_HI_DEN > F.col("mean_micro") * TX16_HI_NUM,
            F.lit("rare"),
        )
        .when(
            mean * TX16_LO_DEN < F.col("mean_micro") * TX16_LO_NUM,
            F.lit("common"),
        )
        .otherwise(F.lit("mid"))
        .alias("band"),
    )


# --- tx17: BPE encode — applying the learned merges -------------------------


def _tx17_oracle() -> str:
    # The encode stages run over the DISTINCT-word table (e0..eK), not the
    # corpus token stream — the word-cache trick production tokenizers
    # use — and the per-doc accounting joins the stream back to the
    # encoded vocab. Mirrors the Spark plan's shape exactly.
    stages = []
    for r in range(1, TX15_MERGES + 1):
        rewrite = _tx15_duck_rewrite(f"m{r}.a", f"m{r}.b")
        stages.append(f"""e{r} AS (
            SELECT tok, n0, {rewrite} AS syms
            FROM e{r - 1} CROSS JOIN m{r}
        )""")
    return f"""
        WITH {_tx15_train_ctes()},
        toks AS (
            SELECT doc_id, tok
            FROM (SELECT doc_id, unnest({_DUCK_TOKENS}) AS tok
                  FROM documents)
            WHERE tok <> ''
        ),
        e0 AS (
            SELECT tok, CAST(len(h) // 2 AS BIGINT) AS n0,
                   {_TX15_DUCK_SYMS} AS syms
            FROM (SELECT tok, hex(encode(tok)) AS h
                  FROM (SELECT DISTINCT tok FROM toks))
        ),
        {",".join(stages)}
        SELECT t.doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
               CAST(SUM(e.n0) AS BIGINT) AS n_sym_before,
               CAST(SUM(len(e.syms)) AS BIGINT) AS n_sym_after,
               CAST(SUM(e.n0) - SUM(len(e.syms)) AS BIGINT) AS n_merged
        FROM toks t JOIN e{TX15_MERGES} e USING (tok)
        GROUP BY t.doc_id
    """


@register(
    "tx17_bpe_encode",
    oracle=_tx17_oracle(),
    doc=f"BYTE-LEVEL BPE ENCODING — the tokenizer's inference half, "
    "completing tx15's training half: the learned merge table "
    "(collected to the driver — it is the tokenizer artifact, "
    "vocab-scale by design) is applied as a chain of "
    f"{TX15_MERGES} greedy left-to-right rewrite folds in merge-rank "
    "order over the DISTINCT-word table, not the raw token stream — "
    "the word-cache trick production tokenizers use (encode each "
    "distinct word once; Heaps' law bounds that table at any corpus "
    "size), then the corpus stream joins to the encoded vocab "
    "(broadcast under the TX15_DRIVER_VOCAB gate, shuffle-hash with "
    "AQE skew handling above it) for the per-doc accounting a data "
    "pipeline bills by: word count, UTF-8 byte count before, symbol "
    "count after, and symbols saved by the merges — the compression "
    "the trained vocabulary buys on this corpus. The merges are "
    "literals in the expression tree — no Python in the fold chain. "
    "The oracle recomputes the same merges in its CTE chain and "
    "applies identical folds over the same distinct-word table, so "
    "train AND encode are cross-checked end-to-end in one hash. "
    f"Requires the corpus to yield the full {TX15_MERGES}-merge "
    "table and raises RuntimeError otherwise (ADVICE r7: a degenerate "
    "corpus would silently diverge — the oracle's CROSS JOIN over an "
    "empty merge round empties the result while this side would skip "
    "missing rounds).",
    tags=("text", "llm", "tokenizer"),
)
def tx17_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    merges, n_vocab = _tx15_train(spark, sf_dir)
    if len(merges) < TX15_MERGES:
        raise RuntimeError(
            f"tx17: corpus yielded only {len(merges)} of {TX15_MERGES} "
            "merges — the trained-tokenizer precondition is unmet; "
            "encoding requires the full merge table (train on a larger "
            "corpus or lower TX15_MERGES)"
        )
    d = load_table_parallel(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(F.expr(_SPARK_TOKENS)).alias("tok")
    ).filter(F.col("tok") != "")
    enc = (
        toks.select("tok")
        .distinct()
        .select("tok", F.expr("hex(encode(tok, 'utf-8'))").alias("h"))
        .select(
            "tok",
            F.expr("length(h) DIV 2").alias("n0"),
            F.expr(_TX15_SPARK_SYMS).alias("syms"),
        )
    )
    for _r, a, b, _merged, _cnt in merges:
        enc = enc.select(
            "tok",
            "n0",
            F.expr(_tx15_spark_rewrite(f"'{a}'", f"'{b}'")).alias("syms"),
        )
    enc = enc.select("tok", "n0", F.size("syms").cast("long").alias("n1"))
    if n_vocab <= TX15_DRIVER_VOCAB:
        enc = F.broadcast(enc)
    return toks.join(enc, "tok").groupBy("doc_id").agg(
        F.count("*").alias("n_words"),
        F.sum("n0").alias("n_sym_before"),
        F.sum("n1").alias("n_sym_after"),
        (F.sum("n0") - F.sum("n1")).alias("n_merged"),
    )


# --- tx19: model-based quality classifier -----------------------------------
#
# The third pillar of the published curation recipes (CCNet/Gopher →
# heuristic gates → LM rarity → CLASSIFIER): a tiny logistic regression
# over the same cheap features tx2/tx12 already compute, trained against
# tx12's deterministic rule cascade as pseudo-label (the standard
# bootstrap when no human labels exist — c4/RefinedWeb train against
# "looks like Wikipedia/curated corpora" proxies the same way).
#
# Training (``tx19_train_coefficients``) uses Spark ML LogisticRegression
# — a distributed LBFGS over treeAggregated gradients, so it scales to
# any corpus — but INFERENCE is a pure expression fold over the pinned
# coefficients: no MLlib, no UDF, no vector assembly at scoring time.
# The registered query scores with TX19_COEF (trained once at sf0.01,
# regenerated by tests/test_round8_ops.py which asserts retraining
# reproduces them); the oracle uses the identical literals, and the
# margin is a left-assoc +/* chain in identical operand order, so the
# hash compare is bitwise.  The sigmoid is deliberately NOT applied:
# exp() is a libm transcendental (banned by the repo determinism rules);
# the margin is monotone in the probability, so the decision
# (margin > 0 ⟺ p > 0.5) and any ranking are unchanged.
#
# Scale: scoring is map-only (plan-asserted: no Exchange/Join/Python in
# tests/test_plans.py) — at 100 TB it fuses into the scan stage like
# tx1/tx2. Training cost is one treeAggregate pass per LBFGS iteration
# over a 4-feature design matrix: bandwidth-bound on the same scan.

# Pinned round-8 fit (sf0.01, maxIter=200, regParam=0.01, L2,
# standardization=True, tol=1e-10; train accuracy 0.994 vs the tx12
# pseudo-label). Features in order: n_words/100, mean_word_len,
# stop_ratio, distinct_stop_hits.
TX19_COEF = {
    "intercept": -11.609730775063296,
    "f_words": 10.381174279211947,
    "mean_word_len": -0.1878284667996912,
    "stop_ratio": 1.6917237948149628,
    "stop_hits": 3.6090222675995065,
}

_TX19_DUCK_FEATURES = f"""
        WITH t AS (
            SELECT doc_id,
                   string_split_regex(lower(trim(text)), '\\s+') AS toks
            FROM documents
        ),
        m AS (
            SELECT doc_id,
                   CAST(len(toks) AS DOUBLE) / 100.0 AS f_words,
                   CAST(COALESCE(list_sum(list_transform(toks, w -> length(w))), 0)
                        AS DOUBLE) / greatest(len(toks), 1) AS mean_word_len,
                   CAST(len(list_filter(toks,
                        tok -> list_contains({STOPWORDS['en']!r}, tok)))
                        AS DOUBLE) / greatest(len(toks), 1) AS stop_ratio,
                   CAST(len(list_intersect(list_distinct(toks),
                        {_GOPHER_STOPS!r})) AS DOUBLE) AS stop_hits
            FROM t
        )
"""


def _tx19_features(d: DataFrame) -> DataFrame:
    """Shared feature tree: trainer and scorer use the same expressions
    so the pinned coefficients apply to exactly the distribution they
    were fit on."""
    t = d.select("doc_id", _tokens().alias("toks"))
    n_words = F.size("toks")
    denom = F.greatest(n_words, F.lit(1))
    stop_arr = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
    g_stops = F.array(*[F.lit(w) for w in _GOPHER_STOPS])
    return t.select(
        "doc_id",
        (n_words.cast("double") / F.lit(100.0)).alias("f_words"),
        (
            F.expr("aggregate(toks, 0, (acc, w) -> acc + length(w))").cast(
                "double"
            )
            / denom
        ).alias("mean_word_len"),
        (
            F.size(
                F.filter(F.col("toks"), lambda tok: F.array_contains(stop_arr, tok))
            ).cast("double")
            / denom
        ).alias("stop_ratio"),
        F.size(F.array_intersect(F.array_distinct(F.col("toks")), g_stops))
        .cast("double")
        .alias("stop_hits"),
    )


def tx19_train_coefficients(
    spark: SparkSession, sf_dir: str
) -> dict[str, float]:
    """Fit the quality LR with Spark ML against the tx12 pseudo-label and
    return {intercept, f_words, mean_word_len, stop_ratio, stop_hits}.

    Distributed LBFGS (one treeAggregate per iteration); deterministic up
    to float aggregation order — tests assert the refit matches TX19_COEF
    to rtol 5e-2 and agrees with it on ≥99% of decisions."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import VectorAssembler

    from apache_iceberg_spark.tables import load_table as _load

    feats = _tx19_features(_load(spark, sf_dir, "documents"))
    # tx12's keep, re-derived on the feature frame (f_words = n_words/100,
    # so the word-count band rescales; alpha_frac is constant 1.0 on the
    # fixtures and is deliberately not a feature).
    d = _load(spark, sf_dir, "documents")
    t = d.select("doc_id", _tokens().alias("toks"))
    n_words = F.size("toks")
    denom = F.greatest(n_words, F.lit(1))
    label_src = t.select(
        "doc_id",
        (
            n_words.between(GOPHER_MIN_WORDS, GOPHER_MAX_WORDS)
            & (
                F.expr("aggregate(toks, 0, (acc, w) -> acc + length(w))").cast(
                    "double"
                )
                / denom
            ).between(GOPHER_MIN_MEAN_LEN, GOPHER_MAX_MEAN_LEN)
            & (
                F.expr("size(filter(toks, w -> w rlike '[a-z]'))").cast("double")
                / denom
                >= GOPHER_MIN_ALPHA_FRAC
            )
            & (
                F.size(
                    F.array_intersect(
                        F.array_distinct(F.col("toks")),
                        F.array(*[F.lit(w) for w in _GOPHER_STOPS]),
                    )
                )
                >= GOPHER_MIN_STOP_HITS
            )
        )
        .cast("double")
        .alias("label"),
    )
    cols = ["f_words", "mean_word_len", "stop_ratio", "stop_hits"]
    train = feats.join(label_src, "doc_id").select(*cols, "label")
    va = VectorAssembler(inputCols=cols, outputCol="features")
    lr = LogisticRegression(
        maxIter=200,
        regParam=0.01,
        elasticNetParam=0.0,
        standardization=True,
        tol=1e-10,
    )
    model = lr.fit(va.transform(train))
    out = {"intercept": float(model.intercept)}
    for name, c in zip(cols, model.coefficients):
        out[name] = float(c)
    return out


def _tx19_margin_sql(pfx: str = "") -> str:
    """Left-assoc +/* chain in pinned operand order (bitwise identical on
    both engines)."""
    c = TX19_COEF
    return (
        f"(((({c['intercept']!r} + {c['f_words']!r} * {pfx}f_words) "
        f"+ {c['mean_word_len']!r} * {pfx}mean_word_len) "
        f"+ {c['stop_ratio']!r} * {pfx}stop_ratio) "
        f"+ {c['stop_hits']!r} * {pfx}stop_hits)"
    )


@register(
    "tx19_quality_classifier",
    oracle=f"""
        {_TX19_DUCK_FEATURES}
        SELECT doc_id, f_words, mean_word_len, stop_ratio, stop_hits,
               {_tx19_margin_sql()} AS margin,
               {_tx19_margin_sql()} > 0.0 AS pred_keep
        FROM m
    """,
    doc="Model-based quality filter (VERDICT r7 ask #4) — the classifier "
    "stage of the CCNet/Gopher curation cascade: logistic-regression "
    "margin over cheap per-doc features (word count, mean word length, "
    "stopword ratio, distinct-stopword hits), coefficients trained by "
    "Spark ML against tx12's rule cascade as pseudo-label and PINNED as "
    "literals (TX19_COEF) so inference is a pure expression fold — "
    "map-only, no MLlib, no UDF, no shuffle (plan-asserted). Margin "
    "not sigmoid: exp() is banned libm; margin>0 is the same decision.",
    tags=("text", "llm", "quality", "filter", "ml"),
)
def tx19_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    feats = _tx19_features(load_table(spark, sf_dir, "documents"))
    margin = F.expr(_tx19_margin_sql())
    return feats.select(
        "doc_id",
        "f_words",
        "mean_word_len",
        "stop_ratio",
        "stop_hits",
        margin.alias("margin"),
        (margin > F.lit(0.0)).alias("pred_keep"),
    )


# --- tx20: pruned bigram-LM surprisal with stupid backoff --------------------
#
# tx16 is the unigram gate of the CCNet cascade; real CCNet scores with a
# KenLM n-gram model. tx20 is that shape, log-free: a PRUNED bigram table
# (singleton bigrams dropped, exactly KenLM's default pruning) scores each
# document's bigrams by inverse conditional frequency in exact BIGINT
# micro-units — rarity(w1,w2) = c(w1·)·1e6 // c(w1,w2) ∝ 1/p(w2|w1) — and
# bigrams missing from the pruned table BACK OFF to penalized inverse
# unigram frequency (Stupid Backoff, Brants et al. 2007: score = α·p_uni
# with α = 0.4, i.e. rarity × 5/2 — exact in integers).

TX20_MICRO = 1_000_000
TX20_MIN_COUNT = 2  # prune singleton bigrams (KenLM's default)
TX20_BO_NUM, TX20_BO_DEN = 5, 2  # backoff penalty 1/α = 1/0.4 = 5/2
TX20_HI_NUM, TX20_HI_DEN = 2, 1  # 'rare' above 2× corpus mean
TX20_LO_NUM, TX20_LO_DEN = 1, 2  # 'common' below ½ corpus mean

_TX20_SPARK_BIGRAMS = (
    "CASE WHEN size(toks) >= 2 THEN transform("
    "sequence(1, size(toks) - 1), "
    "i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1))) "
    "ELSE array() END"
)
_TX20_DUCK_BIGRAMS = (
    "CASE WHEN len(toks) >= 2 THEN "
    "[toks[i] || ' ' || toks[i + 1] for i in generate_series(1, len(toks) - 1)]"
    " ELSE [] END"
)


@register(
    "tx20_bigram_surprisal",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, {_DUCK_TOKENS} AS toks FROM documents
        ),
        uni AS (
            SELECT tok, CAST(COUNT(*) AS BIGINT) AS cnt
            FROM (SELECT unnest(toks) AS tok FROM toks) WHERE tok <> ''
            GROUP BY tok
        ),
        n AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n_total FROM uni),
        bg AS (
            SELECT doc_id, unnest({_TX20_DUCK_BIGRAMS}) AS b FROM toks
        ),
        ctx AS (
            SELECT split_part(b, ' ', 1) AS w1,
                   CAST(COUNT(*) AS BIGINT) AS c_ctx
            FROM bg GROUP BY 1
        ),
        big AS (
            SELECT b, CAST(COUNT(*) AS BIGINT) AS c_big
            FROM bg GROUP BY b HAVING COUNT(*) >= {TX20_MIN_COUNT}
        ),
        lm AS (
            SELECT big.b, (ctx.c_ctx * {TX20_MICRO}) // big.c_big AS rar
            FROM big JOIN ctx ON ctx.w1 = split_part(big.b, ' ', 1)
        ),
        bo AS (
            SELECT uni.tok,
                   (((n.n_total * {TX20_MICRO}) // uni.cnt) * {TX20_BO_NUM})
                       // {TX20_BO_DEN} AS rar_bo
            FROM uni CROSS JOIN n
        ),
        scored AS (
            SELECT bg.doc_id,
                   COALESCE(lm.rar, bo.rar_bo) AS rar,
                   CASE WHEN lm.rar IS NULL THEN 1 ELSE 0 END AS is_bo
            FROM bg
            LEFT JOIN lm ON lm.b = bg.b
            JOIN bo ON bo.tok = split_part(bg.b, ' ', 2)
        ),
        per_doc AS (
            SELECT doc_id,
                   CAST(COUNT(*) AS BIGINT) AS n_bigrams,
                   CAST(SUM(rar) AS BIGINT) AS rar_sum,
                   CAST(SUM(is_bo) AS BIGINT) AS n_backoff
            FROM scored GROUP BY doc_id
        ),
        corpus AS (
            SELECT CAST(SUM(rar_sum) AS BIGINT)
                       // CAST(SUM(n_bigrams) AS BIGINT) AS mean_micro
            FROM per_doc
        )
        SELECT p.doc_id, p.n_bigrams, p.n_backoff,
               p.rar_sum // p.n_bigrams AS mean_bigram_rarity_micro,
               CASE
                   WHEN (p.rar_sum // p.n_bigrams) * {TX20_HI_DEN}
                        > c.mean_micro * {TX20_HI_NUM} THEN 'rare'
                   WHEN (p.rar_sum // p.n_bigrams) * {TX20_LO_DEN}
                        < c.mean_micro * {TX20_LO_NUM} THEN 'common'
                   ELSE 'mid'
               END AS band
        FROM per_doc p CROSS JOIN corpus c
    """,
    doc="Bigram-LM surprisal gate with pruned table + Stupid Backoff — "
    "the KenLM stage of CCNet re-expressed log-free in exact BIGINT "
    "micro-units (see module constants): conditional inverse frequency "
    "c(w1·)·1e6//c(w1,w2) for bigrams surviving singleton pruning, "
    "α=0.4 penalized inverse unigram frequency otherwise; per-doc mean "
    "banded keep-the-middle against the corpus mean exactly like tx16. "
    "Scale: the pruned bigram and unigram tables are Heaps-law bounded "
    "(the prune is WHY — singletons are ~half of all distinct bigrams); "
    "the doc-bigram stream takes two joins against those tables "
    "(Zipf-skewed keys → AQE skew handling; both tables pre-fold their "
    "numerators so the stream-side math is one integer divide), the "
    "per-doc fold keys on doc_id, and the corpus mean is one scalar. "
    "Docs with < 2 tokens have no bigrams and are excluded by "
    "construction (same convention as dd2's short-doc rule).",
    tags=("text", "llm", "quality", "filter"),
)
def tx20_bigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table_parallel(spark, sf_dir, "documents")
    toks_df = d.select("doc_id", F.expr(_SPARK_TOKENS).alias("toks"))
    uni = (
        toks_df.select(F.explode("toks").alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    n_tot = uni.agg(F.sum("cnt").cast("long").alias("n_total"))
    bg = toks_df.select(
        "doc_id", F.explode(F.expr(_TX20_SPARK_BIGRAMS)).alias("b")
    )
    w2 = F.expr("split_part(b, ' ', 2)")
    # One corpus-scale count, persisted at vocab scale (Heaps-bounded):
    # ctx totals derive from the UNPRUNED bigram table — c(w1·) = Σ_b
    # c(w1,b) — so the context pass re-aggregates distinct bigrams, not
    # corpus rows (the naive per-source groupBy re-explodes the corpus).
    big_all = (
        bg.groupBy("b")
        .agg(F.count("*").cast("long").alias("c_big"))
        .persist()  # plan-cache: ctx + pruned-table branches share it
    )
    ctx = big_all.groupBy(
        F.expr("split_part(b, ' ', 1)").alias("w1")
    ).agg(F.sum("c_big").cast("long").alias("c_ctx"))
    big = big_all.filter(F.col("c_big") >= TX20_MIN_COUNT)
    lm = big.join(
        ctx, F.expr("split_part(b, ' ', 1)") == ctx["w1"]
    ).select("b", F.expr(f"(c_ctx * {TX20_MICRO}) DIV c_big").alias("rar"))
    bo = uni.crossJoin(F.broadcast(n_tot)).select(
        "tok",
        F.expr(
            f"(((n_total * {TX20_MICRO}) DIV cnt) * {TX20_BO_NUM}) "
            f"DIV {TX20_BO_DEN}"
        ).alias("rar_bo"),
    )
    scored = (
        bg.join(lm, "b", "left")
        .join(bo, w2 == bo["tok"])
        .select(
            "doc_id",
            F.coalesce(F.col("rar"), F.col("rar_bo")).alias("r"),
            F.when(F.col("rar").isNull(), 1).otherwise(0).alias("is_bo"),
        )
    )
    per_doc = scored.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_bigrams"),
        F.sum("r").cast("long").alias("rar_sum"),
        F.sum("is_bo").cast("long").alias("n_backoff"),
    )
    corpus = per_doc.agg(
        F.expr("SUM(rar_sum) DIV SUM(n_bigrams)").alias("mean_micro")
    )
    mean = F.expr("rar_sum DIV n_bigrams")
    return per_doc.crossJoin(F.broadcast(corpus)).select(
        "doc_id",
        "n_bigrams",
        "n_backoff",
        mean.alias("mean_bigram_rarity_micro"),
        F.when(
            mean * TX20_HI_DEN > F.col("mean_micro") * TX20_HI_NUM,
            F.lit("rare"),
        )
        .when(
            mean * TX20_LO_DEN < F.col("mean_micro") * TX20_LO_NUM,
            F.lit("common"),
        )
        .otherwise(F.lit("mid"))
        .alias("band"),
    )


# ---------------------------------------------------------------------------
# tx21: domain blocklist filtering (suffix semantics)
# ---------------------------------------------------------------------------

#: Blocklist rules at three hierarchy levels (a TLD zone, a registrable
#: subtree, one exact host) — "a rule blocks the domain AND every
#: subdomain", the UT1/DNS-RPZ semantics every crawl pipeline applies.
TX21_BLOCKLIST = ("example.io", "fr.example.com", "src5.zh.example.net")

#: Deterministic host synthesis from fixture columns (dd7's pattern —
#: the fixture has no URL column; the OPERATOR is the suffix matcher).
_TX21_HOST = (
    "concat(source, '.', lang, '.example.', "
    "CASE CAST(doc_id % 4 AS INT) WHEN 0 THEN 'com' WHEN 1 THEN 'net' "
    "WHEN 2 THEN 'org' ELSE 'io' END)"
)


def _tx21_suffixes(labels: str, n: str) -> str:
    """All dot-suffixes of a label array (Spark SQL)."""
    return (
        f"transform(sequence(1, {n}), "
        f"i -> concat_ws('.', slice({labels}, i, {n} - i + 1)))"
    )


@register(
    "tx21_domain_blocklist",
    oracle=f"""
        WITH h AS (
            SELECT doc_id, {_TX21_HOST} AS host FROM documents
        ),
        sx AS (
            SELECT doc_id, host,
                   unnest([array_to_string(labels[i:], '.')
                           for i in generate_series(1, len(labels))]) AS sfx
            FROM (SELECT doc_id, host, string_split(host, '.') AS labels
                  FROM h)
        ),
        hits AS (
            SELECT doc_id, host, sfx AS rule
            FROM sx
            WHERE sfx IN ({", ".join(f"'{r}'" for r in TX21_BLOCKLIST)})
        )
        SELECT doc_id, host, rule
        FROM (
            SELECT doc_id, host, rule,
                   ROW_NUMBER() OVER (
                       PARTITION BY doc_id ORDER BY len(rule) DESC, rule
                   ) AS rn
            FROM hits
        ) WHERE rn = 1
    """,
    doc="Domain-blocklist filtering with SUFFIX semantics (a rule blocks "
    "the domain and every subdomain — the UT1/adult-blocklist stage of "
    "C4/RefinedWeb): each host explodes into its O(#labels) dot-"
    "suffixes and an exact equi-join against the broadcast rule table "
    "flags matches, longest (most-specific) rule wins. This is the "
    "scale-correct shape: exact hash join on the suffix key — never a "
    "LIKE/regex scan per rule, never a prefix-range join — so cost is "
    "rows × ~4 suffixes regardless of blocklist size (UT1's millions "
    "of rules broadcast in MBs; beyond that the same join shuffles). "
    "Map-only until the one tiny window over hits. Hosts synthesized "
    "deterministically from fixture columns (dd7 precedent); the "
    "three rules hit a TLD zone, a registrable subtree, and one exact "
    "host, so all hierarchy levels are exercised.",
    tags=("text", "llm", "filter", "url"),
)
def tx21_domain_blocklist(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    h = d.select("doc_id", F.expr(_TX21_HOST).alias("host")).withColumn(
        "labels", F.split("host", r"\.")
    )
    sx = h.select(
        "doc_id",
        "host",
        F.explode(
            F.expr(_tx21_suffixes("labels", "size(labels)"))
        ).alias("sfx"),
    )
    rules = F.broadcast(
        spark.createDataFrame(
            [(r,) for r in TX21_BLOCKLIST], "rule string"
        )
    )
    hits = sx.join(rules, sx["sfx"] == rules["rule"]).select(
        "doc_id", "host", "rule"
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.length("rule").desc(), F.asc("rule")
    )
    return (
        hits.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "host", "rule")
    )


# ---------------------------------------------------------------------------
# tx22: language-ID evaluation (confusion matrix)
# ---------------------------------------------------------------------------


def _tx22_oracle() -> str:
    from apache_iceberg_spark.registry import REGISTRY as _REG

    # tx3's oracle verbatim as the scored stream — classifier and eval
    # cannot drift.
    return f"""
        WITH scored AS ({_REG["tx3_langid"].oracle}),
        cells AS (
            SELECT lang_label, lang_pred, COUNT(*) AS n
            FROM scored
            GROUP BY 1, 2
        )
        SELECT lang_label, lang_pred, CAST(n AS BIGINT) AS n,
               CAST(SUM(n) OVER (PARTITION BY lang_label) AS BIGINT)
                   AS label_total,
               CAST(n * 1000000 // SUM(n) OVER (PARTITION BY lang_label)
                    AS BIGINT) AS cell_rate_micro
        FROM cells
    """


@register(
    "tx22_langid_confusion",
    oracle=_tx22_oracle(),
    doc="Language-ID EVALUATION — the confusion matrix of tx3's stopword "
    "classifier against the fixture's lang labels (diagonal cells carry "
    "per-language recall in exact micro-units: n·1e6 DIV label_total). "
    "The measurement half every classifier stage needs before it gates "
    "a corpus (tx19's pseudo-label protocol, applied to langid): which "
    "languages leak into which predictions, at what rate. Spark shape: "
    "tx3's map-only scoring tree feeds one partial+final (label, pred) "
    "count — ≤ |langs|² cells — and the per-label normalization windows "
    "over those cells, not rows. Composes tx3's oracle verbatim so "
    "classifier and eval cannot drift.",
    tags=("text", "llm", "eval"),
)
def tx22_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    scored = tx3_langid(spark, sf_dir)
    cells = scored.groupBy("lang_label", "lang_pred").agg(
        F.count("*").alias("n")
    )
    w = Window.partitionBy("lang_label")
    return cells.select(
        "lang_label",
        "lang_pred",
        "n",
        F.sum("n").over(w).alias("label_total"),
        F.expr("n * 1000000 DIV SUM(n) OVER (PARTITION BY lang_label)").alias(
            "cell_rate_micro"
        ),
    )


# ---------------------------------------------------------------------------
# tx23: Flesch-Kincaid readability — exact counts, one shared formula
# ---------------------------------------------------------------------------

# The FK grade formula on exact integer counts (shared textually; the
# syllable proxy is vowel-GROUP count floored at the word count — every
# word carries at least one syllable — a documented deterministic
# simplification of dictionary syllabification).
_TX23_FK = (
    "0.39 * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE)) "
    "+ 11.8 * (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE)) "
    "- 15.59"
)


@register(
    "tx23_readability",
    oracle=f"""
        WITH c AS (
            SELECT doc_id,
                   CAST(len(regexp_extract_all(trim(text), '[^ \t\n]+'))
                        AS BIGINT) AS n_words,
                   CAST(GREATEST(len(regexp_extract_all(text, '[.!?]+')),
                                 1) AS BIGINT) AS n_sentences,
                   CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
                        AS BIGINT) AS raw_groups
            FROM documents
        ),
        k AS (
            SELECT doc_id, n_words, n_sentences,
                   GREATEST(raw_groups, n_words) AS n_syllables
            FROM c
            WHERE n_words > 0
        )
        SELECT doc_id, n_words, n_sentences, n_syllables,
               {_TX23_FK} AS fk_grade
        FROM k
    """,
    doc="FLESCH-KINCAID grade level per document — the readability axis "
    "tx2's quality score (length/punct/stopword ratios) lacks, and a "
    "standard curation gate (too-low = fragment soup, too-high = "
    "OCR/boilerplate artifacts): 0.39·(words/sentences) + "
    "11.8·(syllables/words) − 15.59 from EXACT integer counts — words "
    "by whitespace tokens, sentences by terminal-punctuation runs "
    "(floored at 1), syllables by the vowel-group proxy floored at "
    "the word count (every word has one; a dictionary syllabifier is "
    "neither available nor deterministic across engines, so the proxy "
    "is the documented contract). The one float formula runs per row "
    "on exact inputs with shared text. Scale shape: map-only — three "
    "regexp counts per document, zero shuffles, zero joins; composes "
    "into pp-family gates as a pushed-down filter.",
    tags=("text", "quality", "llm"),
)
def tx23_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table_parallel(spark, sf_dir, "documents")
    c = d.select(
        "doc_id",
        F.size(
            F.expr(r"regexp_extract_all(trim(text), '[^ \t\n]+', 0)")
        ).cast("long").alias("n_words"),
        F.greatest(
            F.size(F.expr("regexp_extract_all(text, '[.!?]+', 0)")),
            F.lit(1),
        ).cast("long").alias("n_sentences"),
        F.size(
            F.expr("regexp_extract_all(lower(text), '[aeiouy]+', 0)")
        ).cast("long").alias("raw_groups"),
    )
    k = c.filter(F.col("n_words") > 0).select(
        "doc_id",
        "n_words",
        "n_sentences",
        F.greatest(F.col("raw_groups"), F.col("n_words")).alias(
            "n_syllables"
        ),
    )
    return k.select(
        "doc_id",
        "n_words",
        "n_sentences",
        "n_syllables",
        F.expr(_TX23_FK).alias("fk_grade"),
    )


# --- tx25: charset composition profile (round 12) ----------------------------

TX25_MICRO = 1_000_000


@register(
    "tx25_charset_profile",
    oracle=f"""
        WITH per_doc AS (
            SELECT lang,
                   CAST(length(text) AS BIGINT) AS n_chars,
                   CAST(length(regexp_replace(text, '[^ -~]', '', 'g'))
                        AS BIGINT) AS n_ascii,
                   CAST(length(regexp_replace(text, '[^0-9]', '', 'g'))
                        AS BIGINT) AS n_digit,
                   CAST(length(regexp_replace(text, '[^ ]', '', 'g'))
                        AS BIGINT) AS n_space
            FROM documents
        )
        SELECT lang,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars,
               CAST(SUM(n_ascii) * {TX25_MICRO} // SUM(n_chars) AS BIGINT)
                   AS ascii_ratio_micro,
               CAST(SUM(n_digit) * {TX25_MICRO} // SUM(n_chars) AS BIGINT)
                   AS digit_ratio_micro,
               CAST(SUM(n_space) * {TX25_MICRO} // SUM(n_chars) AS BIGINT)
                   AS space_ratio_micro,
               CAST((SUM(n_chars) - SUM(n_ascii)) * {TX25_MICRO}
                    // SUM(n_chars) AS BIGINT) AS nonascii_ratio_micro
        FROM per_doc
        GROUP BY lang
        ORDER BY lang
    """,
    doc="Charset composition profile per language: printable-ASCII, "
    "digit, space, and non-ASCII character ratios over each lang "
    "slice's total characters — the corpus-quality primitive tx2/tx12 "
    "do not cover (their stopword/length/punct gates assume the text "
    "is prose at all; this one catches mojibake, binary spill, "
    "base64/hex blobs via digit density, and script mixtures that "
    "contradict the declared lang — each a standard pre-training "
    "filter axis). ENTIRELY exact integers: per-doc counts are "
    "lengths after character-class regexp_replace deletion — the "
    "range [ -~] (printable ASCII), [0-9], and the literal space are "
    "Java-regex/RE2 dialect-neutral by construction — summed per lang "
    "as BIGINTs (exact to ~9e18 chars, past any 100 TB slice) and "
    "emitted as micro-unit integer DIV ratios. One map-side-combined "
    "groupBy over the corpus; the lang regroup is |langs| rows. At "
    "100 TB the scan prunes to (lang, text) and nothing else moves.",
    tags=("text", "llm", "quality"),
)
def tx25_charset_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    per_doc = d.select(
        "lang",
        F.length("text").cast("long").alias("n_chars"),
        F.length(F.regexp_replace(F.col("text"), "[^ -~]", ""))
        .cast("long")
        .alias("n_ascii"),
        F.length(F.regexp_replace(F.col("text"), "[^0-9]", ""))
        .cast("long")
        .alias("n_digit"),
        F.length(F.regexp_replace(F.col("text"), "[^ ]", ""))
        .cast("long")
        .alias("n_space"),
    )
    agg = per_doc.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.sum("n_ascii").alias("sa"),
        F.sum("n_digit").alias("sd"),
        F.sum("n_space").alias("ss"),
    )
    return agg.select(
        "lang",
        "n_docs",
        "total_chars",
        F.expr(f"CAST(sa * {TX25_MICRO} DIV total_chars AS BIGINT)").alias(
            "ascii_ratio_micro"
        ),
        F.expr(f"CAST(sd * {TX25_MICRO} DIV total_chars AS BIGINT)").alias(
            "digit_ratio_micro"
        ),
        F.expr(f"CAST(ss * {TX25_MICRO} DIV total_chars AS BIGINT)").alias(
            "space_ratio_micro"
        ),
        F.expr(
            f"CAST((total_chars - sa) * {TX25_MICRO} DIV total_chars "
            "AS BIGINT)"
        ).alias("nonascii_ratio_micro"),
    ).orderBy("lang")


# ---------------------------------------------------------------------------
# tx28: held-out bigram cross-entropy (round 14)
# ---------------------------------------------------------------------------

TX28_MICRO = 1_000_000
_TX28_LN = f"CAST(ROUND(ln({{k}}) * {TX28_MICRO}) AS BIGINT)"


@register(
    "tx28_heldout_perplexity",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, source, {_DUCK_TOKENS} AS toks FROM documents
        ),
        train_bg AS (
            SELECT unnest({_TX20_DUCK_BIGRAMS}) AS b
            FROM toks WHERE doc_id % 2 = 0
        ),
        big AS (
            SELECT b, CAST(COUNT(*) AS BIGINT) AS c12
            FROM train_bg GROUP BY b
        ),
        ctx AS (
            SELECT split_part(b, ' ', 1) AS w1,
                   CAST(COUNT(*) AS BIGINT) AS c1
            FROM train_bg GROUP BY 1
        ),
        vocab AS (
            SELECT CAST(COUNT(DISTINCT tok) AS BIGINT) AS v
            FROM (
                SELECT unnest(toks) AS tok
                FROM toks WHERE doc_id % 2 = 0
            ) WHERE tok <> ''
        ),
        eval_bg AS (
            SELECT source, unnest({_TX20_DUCK_BIGRAMS}) AS b
            FROM toks WHERE doc_id % 2 = 1
        ),
        scored AS (
            SELECT e.source,
                   {_TX28_LN.format(k='COALESCE(ctx.c1, 0) + vocab.v')}
                   - {_TX28_LN.format(k='COALESCE(big.c12, 0) + 1')}
                       AS ce_micro,
                   CASE WHEN big.c12 IS NULL THEN 1 ELSE 0 END AS oov
            FROM eval_bg e
            LEFT JOIN big ON big.b = e.b
            LEFT JOIN ctx ON ctx.w1 = split_part(e.b, ' ', 1)
            CROSS JOIN vocab
        )
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_eval_bigrams,
               CAST(SUM(CAST(ce_micro AS HUGEINT))
                    // COUNT(*) AS BIGINT) AS cross_entropy_micro_nats,
               CAST(SUM(oov) * 1000000 // COUNT(*) AS BIGINT)
                   AS oov_bigram_ppm
        FROM scored GROUP BY source ORDER BY source
    """,
    doc="Held-out bigram cross-entropy per source — the TRAIN/EVAL "
    "twin of tx20's within-corpus surprisal and the perplexity-"
    "filtering signal of the CCNet recipe: an add-1-smoothed bigram "
    "LM trains on the even-doc_id half, the odd half scores against "
    "it, and each source's mean cross-entropy (exact integer "
    "micro-nats: CE per bigram = ln(c(w1)+V) - ln(c(w1,w2)+1), both "
    "logs taking INTEGER arguments via the quantized-ln recipe, "
    "HUGEINT/DECIMAL cross-row sums, one integer DIV per source) "
    "says how surprising that domain is to a model trained on the "
    "rest — the number a curation loop thresholds to drop "
    "machine-garbage and flag drift. Unseen bigrams fall back to the "
    "smoothing floor exactly (c12=0 -> ln 1 = 0 subtracted) and are "
    "counted as oov_bigram_ppm alongside. Scale: train tables are "
    "Heaps-bounded; the eval stream takes two hash joins against "
    "them (Zipf keys -> AQE skew), the vocab scalar broadcasts, and "
    "the finish is |sources| rows.",
    tags=("text", "llm", "quality", "statistics"),
)
def tx28_heldout_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table_parallel(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", "source", F.expr(_SPARK_TOKENS).alias("toks")
    )
    train = toks.filter(F.col("doc_id") % 2 == 0)
    train_bg = train.select(
        F.explode(F.expr(_TX20_SPARK_BIGRAMS)).alias("b")
    ).persist()  # plan-cache: big + ctx tables both fold it
    big = train_bg.groupBy("b").agg(F.count(F.lit(1)).alias("c12"))
    ctx = train_bg.select(
        F.expr("split_part(b, ' ', 1)").alias("w1")
    ).groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    vocab = (
        train.select(F.explode("toks").alias("tok"))
        .filter(F.col("tok") != "")
        .agg(F.countDistinct("tok").alias("v"))
    )
    eval_bg = toks.filter(F.col("doc_id") % 2 == 1).select(
        "source", F.explode(F.expr(_TX20_SPARK_BIGRAMS)).alias("b")
    )
    ln = _TX28_LN
    scored = (
        eval_bg.join(big, "b", "left")
        .withColumn("w1", F.expr("split_part(b, ' ', 1)"))
        .join(ctx, "w1", "left")
        .crossJoin(F.broadcast(vocab))
        .select(
            "source",
            F.expr(
                f"{ln.format(k='COALESCE(c1, CAST(0 AS BIGINT)) + v')}"
                f" - {ln.format(k='COALESCE(c12, CAST(0 AS BIGINT)) + 1')}"
            ).alias("ce_micro"),
            F.when(F.col("c12").isNull(), 1).otherwise(0).alias("oov"),
        )
    )
    return (
        scored.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_eval_bigrams"),
            F.expr(
                "CAST(SUM(CAST(ce_micro AS DECIMAL(38,0)))"
                " DIV COUNT(*) AS BIGINT)"
            ).alias("cross_entropy_micro_nats"),
            F.expr(
                "CAST(SUM(oov) * 1000000 DIV COUNT(*) AS BIGINT)"
            ).alias("oov_bigram_ppm"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# tx29: Zipf / hapax vocabulary profile (round 15)
# ---------------------------------------------------------------------------

TX29_TOP_K = 10


@register(
    "tx29_zipf_hapax",
    oracle=f"""
        WITH toks AS (
            SELECT unnest(string_split_regex(lower(trim(text)),
                          '{_TOKEN_SPLIT}')) AS tok
            FROM documents
        ),
        freq AS (
            SELECT tok, CAST(COUNT(*) AS BIGINT) AS f
            FROM toks GROUP BY tok
        ),
        topk AS (
            SELECT f FROM freq
            ORDER BY f DESC, tok LIMIT {TX29_TOP_K}
        )
        SELECT CAST(SUM(f) AS BIGINT) AS n_tokens,
               CAST(COUNT(*) AS BIGINT) AS vocab,
               CAST(SUM(CASE WHEN f = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS hapax,
               CAST(SUM(CASE WHEN f = 2 THEN 1 ELSE 0 END) AS BIGINT)
                   AS dis_legomena,
               CAST(MAX(f) AS BIGINT) AS f_rank1,
               CAST((SELECT SUM(f) FROM topk) AS BIGINT) AS top10_mass,
               CAST(COUNT(*) * 1000000 // SUM(f) AS BIGINT)
                   AS ttr_micro,
               CAST(SUM(CASE WHEN f = 1 THEN 1 ELSE 0 END) * 1000000
                    // COUNT(*) AS BIGINT) AS hapax_ratio_micro
        FROM freq
    """,
    doc="Corpus vocabulary profile — the Zipf/Heaps health gauges a "
    "pretraining-data pipeline watches per shard: total tokens, "
    "vocabulary size, HAPAX and dis-legomena counts (once/twice "
    "words — the hapax RATIO is the classic OCR-noise / boilerplate "
    "detector: clean natural text runs ~40-60% hapax of vocab, "
    "garbage runs higher, template spam lower), the top-frequency "
    f"mass (top-{TX29_TOP_K} tokens' share — Zipf head weight), and "
    "exact integer-micro type-token + hapax ratios. One tokenize + "
    "ONE shuffle to the frequency table; every statistic is an "
    "aggregate of it (the top-k head via a support-sized sorted "
    "limit with total tie order). All integer-exact — no float "
    "log-log fit; the head-mass + hapax pair IS the actionable "
    "Zipf summary (slope fitting adds noise, not signal, at shard "
    "granularity). At 100 TB the frequency table is vocabulary-"
    "sized — millions of rows, one reducer-friendly groupBy — and "
    "the profile runs per shard for drift comparison (pp14's "
    "report consumes exactly these gauges).",
    tags=("text", "statistics"),
)
def tx29_zipf_hapax(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table_parallel(spark, sf_dir, "documents")
    freq = (
        d.select(
            F.explode(
                F.split(F.lower(F.trim(F.col("text"))), _TOKEN_SPLIT)
            ).alias("tok")
        )
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("f"))
        .persist()  # plan-cache: two consumers (the profile agg + the
        # top-k head) — released by the caller via release_plan_caches
    )
    topk = (
        freq.orderBy(F.desc("f"), F.asc("tok"))
        .limit(TX29_TOP_K)
        .agg(F.sum("f").alias("m"))
    )
    return (
        freq.agg(
            F.sum("f").cast("long").alias("n_tokens"),
            F.count(F.lit(1)).cast("long").alias("vocab"),
            F.sum(F.when(F.col("f") == 1, 1).otherwise(0))
            .cast("long")
            .alias("hapax"),
            F.sum(F.when(F.col("f") == 2, 1).otherwise(0))
            .cast("long")
            .alias("dis_legomena"),
            F.max("f").cast("long").alias("f_rank1"),
        )
        .crossJoin(F.broadcast(topk))
        .select(
            "n_tokens",
            "vocab",
            "hapax",
            "dis_legomena",
            "f_rank1",
            F.col("m").cast("long").alias("top10_mass"),
            F.expr("vocab * 1000000 DIV n_tokens").alias("ttr_micro"),
            F.expr("hapax * 1000000 DIV vocab").alias("hapax_ratio_micro"),
        )
    )
