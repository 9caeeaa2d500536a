"""Text-analysis operators for LLM training-data pipelines.

All pure built-in-function column expressions (JVM-side, whole-stage
codegen) — no Python UDFs. Each operator is deliberately expressed with
engine-portable primitives (regex, md5, arithmetic) so the DuckDB
oracle can compute byte-identical results (see __spark_entry__.py).

Operators:
* tokenization / token counts (whitespace + BPE-ish regex),
* language ID (stopword-hit heuristic + CJK script detection),
* quality scoring (length / alpha / digit / punct / stopword ratios),
* document fingerprinting (normalized-text md5 + per-band min-shingle
  signatures — the building block dedup.py reuses).

Scale: everything is a narrow projection over the scan — no shuffle at
all until a downstream groupBy; at 100 TB these run at I/O speed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Stopword hit-lists for the language-ID heuristic. Tiny on purpose:
# the heuristic is a deterministic scoring function, not a model.
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "in", "is"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein"],
    "es": ["el", "la", "de", "que", "y", "los", "una"],
    "fr": ["le", "la", "les", "et", "des", "une", "est"],
}
# Order decides ties: first language with the max score wins.
LANG_ORDER = ["en", "de", "es", "fr"]

CJK_PATTERN = r"[\x{4e00}-\x{9fff}]"

# BPE-ish pre-tokenizer: letter runs, single digits, punctuation marks.
BPE_TOKEN_PATTERN = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"


def tokens(text: Column) -> Column:
    """Whitespace tokens of trimmed text ('' → single empty token —
    callers guard with token_count)."""
    return F.split(F.trim(text), r"\s+")


def token_count(text: Column) -> Column:
    """Whitespace token count; 0 for blank text."""
    return F.when(F.trim(text) == "", F.lit(0)).otherwise(
        F.size(tokens(text))
    )


def bpe_token_count(text: Column) -> Column:
    """Count of BPE-style pre-tokens (letter runs / digits / punct)."""
    return F.regexp_count(text, F.lit(BPE_TOKEN_PATTERN))


def stopword_hits(text: Column, lang: str) -> Column:
    """How many stopword occurrences of ``lang`` appear in ``text``."""
    pat = r"\b(" + "|".join(LANG_STOPWORDS[lang]) + r")\b"
    return F.regexp_count(F.lower(text), F.lit(pat))


def lang_id(text: Column) -> Column:
    """Heuristic language ID.

    CJK characters → 'zh'; otherwise the language with the most
    stopword hits (ties resolved by LANG_ORDER); no hits at all →
    'unknown'.
    """
    scores = {lang: stopword_hits(text, lang) for lang in LANG_ORDER}
    best = F.greatest(*scores.values())
    out = F.when(F.regexp_count(text, F.lit(CJK_PATTERN)) > 0, F.lit("zh"))
    cond = F.when(best == 0, F.lit("unknown"))
    for lang in LANG_ORDER:
        cond = cond.when(scores[lang] == best, F.lit(lang))
    return out.otherwise(cond)


def _ratio(n: Column, d: Column) -> Column:
    return F.round(
        F.when(d == 0, F.lit(0.0)).otherwise(
            n.cast("double") / d.cast("double")
        ),
        6,
    )


def quality_features(text: Column) -> dict[str, Column]:
    """Per-document quality signals (each a scalar column):

    n_chars, n_tokens, alpha_ratio, digit_ratio, punct_ratio,
    upper_ratio, stopword_ratio, mean_token_len — the classic cheap
    filters (C4/Gopher-style) for corpus quality scoring.
    """
    n_chars = F.length(text)
    n_alpha = F.length(F.regexp_replace(text, r"[^A-Za-z]", ""))
    n_digit = F.length(F.regexp_replace(text, r"[^0-9]", ""))
    n_punct = F.length(F.regexp_replace(text, r"[A-Za-z0-9\s]", ""))
    n_upper = F.length(F.regexp_replace(text, r"[^A-Z]", ""))
    n_tok = token_count(text)
    n_stop = stopword_hits(text, "en")
    n_ws = F.length(F.regexp_replace(text, r"[^\s]", ""))
    return {
        "n_chars": n_chars,
        "n_tokens": n_tok,
        "alpha_ratio": _ratio(n_alpha, n_chars),
        "digit_ratio": _ratio(n_digit, n_chars),
        "punct_ratio": _ratio(n_punct, n_chars),
        "upper_ratio": _ratio(n_upper, n_alpha),
        "stopword_ratio": _ratio(n_stop, n_tok),
        "mean_token_len": _ratio(n_chars - n_ws, n_tok),
    }


def quality_score(text: Column) -> Column:
    """Composite 0..1 quality score: weighted blend of the signals a
    pipeline would threshold on.

    The blend runs in DECIMAL over the published (rounded-to-6) ratios:
    exact, order-independent arithmetic, so the score is identical on
    any engine. A double blend of raw ratios can land exactly on a
    round(,6) half-boundary and flip in the last digit per engine —
    observed at sf0.1 (5 docs in 5000)."""
    q = quality_features(text)

    def d6(c: Column) -> Column:
        return F.round(c, 6).cast("decimal(18,6)")

    one = F.lit(1).cast("decimal(18,6)")
    zero = F.lit(0).cast("decimal(18,6)")
    in_range = (
        F.when((q["n_tokens"] >= 10) & (q["n_tokens"] <= 100000), one)
        .otherwise(zero)
    )
    w = lambda x: F.lit(x).cast("decimal(2,1)")  # noqa: E731
    return F.round(
        w(0.4) * d6(q["alpha_ratio"])
        + w(0.3) * F.least(d6(q["stopword_ratio"]) * 5, one)
        + w(0.2) * in_range
        + w(0.1) * (one - F.least(d6(q["punct_ratio"]) * 10, one)),
        6,
    ).cast("double")


# PII patterns, deliberately restricted to syntax shared by Java regex
# (Spark) and RE2 (DuckDB): classes, bounded repeats, \b. Replacement
# order matters: emails first (they contain digits), then IPs, then
# bare long digit runs (account-number-style).
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
    ("number", r"[0-9]{6,}", "<NUM>"),
]


def pii_counts(text: Column) -> dict[str, Column]:
    """Match counts per PII category, honoring replacement order (an
    email's digits are not double-counted as numbers)."""
    out: dict[str, Column] = {}
    cur = text
    for name, pat, token in PII_PATTERNS:
        out[f"n_{name}"] = F.regexp_count(cur, F.lit(pat))
        cur = F.regexp_replace(cur, pat, token)
    return out


def redact_pii(text: Column) -> Column:
    """Replace emails, IPv4 addresses, and ≥6-digit runs with typed
    placeholder tokens — the cheap regex tier of a PII scrub."""
    cur = text
    for _name, pat, token in PII_PATTERNS:
        cur = F.regexp_replace(cur, pat, token)
    return cur


def fingerprint(text: Column) -> Column:
    """Exact-duplicate fingerprint: md5 of whitespace-normalized,
    lowercased text. Portable: md5 hex is identical everywhere."""
    return F.md5(F.lower(F.regexp_replace(F.trim(text), r"\s+", " ")))


def word_shingles(text: Column, n: int = 3) -> Column:
    """Word n-gram shingles (array<string>); short texts fall back to
    one whole-text shingle so every document has ≥1 shingle."""
    toks = tokens(text)
    return F.when(
        F.size(toks) < n, F.array(F.concat_ws(" ", toks))
    ).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        )
    )


def text_profile(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach the full per-document text-analysis profile."""
    t = F.col(text_col)
    out = df
    for name, col in quality_features(t).items():
        out = out.withColumn(name, col)
    return (
        out.withColumn("lang_pred", lang_id(t))
        .withColumn("quality", quality_score(t))
        .withColumn("fingerprint", fingerprint(t))
        .withColumn("bpe_tokens", bpe_token_count(t))
    )


def gopher_rules(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 20,
    max_tokens: int = 100_000,
    min_mean_token_len: float = 3.0,
    max_mean_token_len: float = 10.0,
    max_punct_ratio: float = 0.1,
    min_alpha_token_frac: float = 0.8,
    min_stopword_hits: int = 2,
) -> DataFrame:
    """The Gopher rule battery (Rae et al. 2021 §A1.1, as also used by
    RefinedWeb/Dolma): a document passes iff it clears EVERY cheap
    structural check — token-count band, mean token length band,
    symbol-to-character ceiling, minimum fraction of alphabetic
    tokens, minimum stopword evidence. Returns one row per document
    with each rule's verdict (1 pass / 0 fail) and the composite
    ``pass_all`` — keep the per-rule columns, because at corpus scale
    you tune thresholds by looking at marginal failure counts, not a
    single opaque bit.

    All signals are exact integer counts and round(,6) rationals over
    them (engine-portable); one narrow projection, no shuffle — at
    100 TB this runs at scan speed.
    """
    t = F.col(text_col)
    q = quality_features(t)
    toks = F.filter(F.split(F.trim(t), r"\s+"), lambda x: x != "")
    alpha_tok_frac = F.when(
        F.size(toks) > 0,
        F.round(
            F.size(F.filter(toks, lambda x: x.rlike("[A-Za-z]")))
            / F.size(toks),
            6,
        ),
    )
    rules = {
        "r_token_count": (q["n_tokens"] >= min_tokens)
        & (q["n_tokens"] <= max_tokens),
        "r_mean_token_len": (q["mean_token_len"] >= min_mean_token_len)
        & (q["mean_token_len"] <= max_mean_token_len),
        "r_punct": q["punct_ratio"] <= max_punct_ratio,
        "r_alpha_tokens": alpha_tok_frac >= min_alpha_token_frac,
        "r_stopwords": stopword_hits(t, "en") >= min_stopword_hits,
    }
    cols = [
        F.coalesce(cond, F.lit(False)).cast("int").alias(name)
        for name, cond in rules.items()
    ]
    out = df.select(F.col(id_col), *cols)
    pass_all = F.lit(1)
    for name in rules:
        pass_all = pass_all * F.col(name)
    return out.withColumn("pass_all", pass_all)


def hash_embedding(
    df: DataFrame,
    dim: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
    out_col: str = "embedding",
) -> DataFrame:
    """Cheap deterministic text embeddings via the hashing trick
    (HashingTF + L2 norm, built from column algebra): lowercase alpha
    tokens hash into ``dim`` buckets (md5-derived — engine-portable,
    not seed-dependent), bucket counts become the vector, L2
    normalized so dot products ARE cosine similarities.

    This is the glue between the text corpus and every embedding
    operator in the engine (cosine top-k, LSH/IVF/PQ ANN,
    SemDeDup/embedding near-dup): no external model needed to run the
    full similarity stack on raw documents. Lexical, not semantic —
    but deterministic, reproducible, and good enough for near-dup
    blocking and topic-ish clustering.

    Shape: one explode + one aggregation per document; the vector is
    assembled with ``map_from_entries`` + a fixed-order ``transform``
    over bucket indices, and the norm is computed in that same fixed
    order — no float-order nondeterminism anywhere.
    """
    toks = F.filter(
        F.split(
            F.regexp_replace(F.lower(F.col(text_col)), "[^a-z]+", " "), " "
        ),
        lambda x: x != "",
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("__tok")), 1, 8), 16, 10)
        .cast("long")
        % dim
    ).cast("int")
    counts = (
        df.select(F.col(id_col), F.explode(toks).alias("__tok"))
        .select(id_col, bucket.alias("__b"))
        .groupBy(id_col, "__b")
        .agg(F.count(F.lit(1)).alias("__n"))
        .groupBy(id_col)
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct(F.col("__b"), F.col("__n")))
            ).alias("__m")
        )
    )
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: F.coalesce(
            F.element_at(F.col("__m"), i.cast("int")), F.lit(0)
        ).cast("double"),
    )
    norm = F.sqrt(
        F.aggregate(
            vec, F.lit(0.0), lambda acc, x: acc + x * x
        )
    )
    unit = F.transform(
        vec, lambda x: (x / F.col("__norm")).cast("float")
    )
    out = (
        counts.withColumn("__vec", vec)
        .withColumn("__norm", norm)
        .where(F.col("__norm") > 0)
        .withColumn(out_col, unit)
        .select(id_col, out_col)
    )
    # docs with zero alpha tokens get no row (no direction to embed)
    return out


#: C0/C1-ish control characters a clean corpus must not contain
#: (tab/newline/CR are whitespace, handled by the collapse step, and
#: are listed here anyway since they fold to the same single space).
CONTROL_CHAR_RE = r"[\x00-\x1F\x7F]"


def normalize_text(
    df: DataFrame,
    text_col: str = "text",
    form: str = "NFC",
) -> DataFrame:
    """Unicode-normalize a corpus in place: ``form`` (NFC/NFKC/NFD/
    NFKD) canonicalization, control characters → space, whitespace
    runs collapsed to one space, edges trimmed — the C4/CCNet-style
    cleanup pass that makes byte-level dedup meaningful (the SAME
    visual text can otherwise carry different codepoint sequences:
    composed vs combining accents, fullwidth forms, stray C0 bytes
    from bad decoders).

    Execution: the normalization itself has no JVM builtin, so it runs
    as ONE Arrow-batched pandas UDF (`pandas.Series.str.normalize`,
    CPython's Unicode Character Database tables — the certified
    corpus hash-matches DuckDB's ICU ``nfc_normalize``, so the two
    table implementations agree on these forms) — the documented
    slow-path exception; the control-strip and collapse stay in
    codegen regexps around it. Per-row, scan-bound, zero shuffle.

    Returns the input with ``text_col`` replaced and a
    ``chars_delta`` column (codepoints removed by the whole pass;
    non-negative under NFC/NFKC, which only compose or preserve —
    the decomposing forms NFD/NFKD can make it negative). NULL text
    passes through as NULL."""
    import pandas as pd  # noqa: F401 — signature type for the UDF
    from pyspark.sql.functions import pandas_udf

    if form not in ("NFC", "NFKC", "NFD", "NFKD"):
        raise ValueError(f"Unknown normalization form {form!r}")

    @pandas_udf("string")
    def _norm(s):  # type: ignore[no-untyped-def]
        return s.str.normalize(form)

    t = F.col(text_col)
    cleaned = F.trim(
        F.regexp_replace(
            F.regexp_replace(_norm(t), CONTROL_CHAR_RE, " "),
            r"\s+",
            " ",
        )
    )
    return df.withColumn("__clean", cleaned).select(
        *[c for c in df.columns if c != text_col],
        F.col("__clean").alias(text_col),
        (F.length(t) - F.length("__clean")).alias("chars_delta"),
    )
