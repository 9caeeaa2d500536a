"""Training-corpus preparation operators.

The steps between "raw deduplicated documents" and "tokens in a
trainer": benchmark decontamination, context-window chunking, tf-idf
term scoring, and robust outlier filtering. Like operators/text.py,
everything is built-in-function column algebra (JVM-side, codegen) —
no Python UDFs — and deliberately engine-portable so the DuckDB
oracles can pin results byte-for-byte.

Scale notes (100 TB corpus, 1000 executors):

* ``decontaminate`` — the benchmark side of the join is tiny by nature
  (eval sets are MBs, corpora are TBs), so its distinct shingle set is
  **broadcast**: the corpus is scanned once, shingles are checked
  against a hashed relation executor-side, and no corpus shuffle ever
  happens. This is the same contains-any-ngram shape GPT-3/PaLM-style
  decontamination describes (n-gram collision against eval sets).
* ``chunk_documents`` — a narrow projection + explode; output rows ≈
  tokens/stride. No shuffle.
* ``tfidf_terms`` — two aggregations (term frequencies per doc,
  document frequencies per term) over one explode; df per term is a
  broadcast-back join since vocabularies (≤ millions of terms) are
  dwarfed by corpora.
* ``mad_outliers`` — median/MAD per group via exact percentiles; on
  integer-valued columns the MAD threshold is exactly representable in
  doubles, so the flag is deterministic across engines (no stddev
  summation-order noise).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from blackroad_feature_store_spark.operators.text import word_shingles
from blackroad_feature_store_spark.operators.util import spread


def decontaminate(
    train: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    n: int = 5,
    id_col: str | None = None,
) -> DataFrame:
    """Flag training documents sharing any word ``n``-gram with the
    benchmark set (eval-set contamination, GPT-3 appendix-C style).

    Returns ``train`` plus a boolean ``contaminated`` column. The
    benchmark's distinct shingles are broadcast — the training corpus
    is never shuffled, so this runs at scan speed on any corpus size.

    ``id_col`` names the UNIQUE document-id column used to join the
    hit set back onto ``train`` (defaults to the first column for
    backward compatibility); a non-unique id would duplicate rows in
    the left join, so it must identify rows one-to-one.

    Why the match stays on shingle STRINGS: an md5-hashed variant
    (56-bit ints, the minhash-family construction) shrinks the
    broadcast ~5-10×, but was measured ~10% slower end-to-end at the
    10× probe — the per-shingle hash on the UNBOUNDED train side
    costs more than it saves on the bench side, which is eval-set
    sized (MBs → a few-10s-of-MB string broadcast) by this operator's
    contract. If a deployment ever broadcasts a multi-GB benchmark
    shingle set, hashing both sides is the right switch to flip.
    """
    if id_col is None:
        id_col = train.columns[0]
    if id_col not in train.columns:
        raise ValueError(
            f"id_col {id_col!r} not in train columns {train.columns}"
        )
    bench_shingles = (
        benchmark.select(
            F.explode(word_shingles(F.col(text_col), n)).alias("__shingle")
        ).distinct()
    )
    # The shingle pass carries ONLY (id, shingle): exploding with the
    # full row ("*") would duplicate the entire document text onto
    # every shingle row — O(len^2) bytes materialized per document —
    # and the dedup of survivors would then shuffle full text instead
    # of ids. Projecting to the id before the distinct keeps the only
    # exchange in the plan at id width. (id_col is unique by contract,
    # so distinct-on-id == distinct-on-full-row here.)
    hit_ids = (
        train.select(
            F.col(id_col),
            F.explode(word_shingles(F.col(text_col), n)).alias("__shingle"),
        )
        .join(F.broadcast(bench_shingles), "__shingle", "left_semi")
        .select(id_col)
        .distinct()
    )
    # A doc is contaminated iff it survived the semi join at least
    # once. The hit set (contaminated ids) is benchmark-overlap-sized —
    # tiny next to the corpus — so it broadcasts too: neither pass over
    # the training corpus ever shuffles it.
    return train.join(
        F.broadcast(hit_ids.withColumn("contaminated", F.lit(True))),
        id_col,
        "left",
    ).withColumn("contaminated", F.coalesce("contaminated", F.lit(False)))


def decontaminate_winnow(
    train: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str | None = None,
    k: int = 8,
    window: int = 4,
    min_shared: int = 1,
) -> DataFrame:
    """Eval-set decontamination by WINNOWING fingerprints
    (`dedup.py::winnow_fingerprints`) — the character-level companion
    to the word-shingle :func:`decontaminate`: flags training
    documents sharing >= ``min_shared`` rolling-hash fingerprints with
    any benchmark document. The winnowing coverage guarantee makes
    the contract precise where token shingles can't be: any verbatim
    overlap of >= ``k + window - 1`` NORMALIZED CHARACTERS is
    guaranteed to share a fingerprint, independent of tokenization,
    punctuation boundaries, or word-count thresholds — the
    whitespace-mangled and mid-word-spliced contamination a word
    5-gram pass walks right past.

    Same scale discipline as :func:`decontaminate`: the benchmark's
    fingerprint set is eval-set-bounded and BROADCAST (56-bit longs,
    ~1/window the gram density — smaller than the shingle-string
    broadcast); the training corpus is never shuffled — one
    fingerprint projection + a broadcast semi join per pass, hit ids
    broadcast back. Returns ``train`` + boolean ``contaminated``.
    ``min_shared > 1`` trades recall for precision on corpora where
    short boilerplate substrings are legitimately everywhere.
    """
    from blackroad_feature_store_spark.operators.dedup import (
        winnow_fingerprints,
    )

    if id_col is None:
        id_col = train.columns[0]
    if id_col not in train.columns:
        raise ValueError(
            f"id_col {id_col!r} not in train columns {train.columns}"
        )
    bench_fps = (
        winnow_fingerprints(
            benchmark.select(
                F.lit(0).alias("__bid"), F.col(text_col)
            ),
            id_col="__bid", text_col=text_col, k=k, window=window,
        )
        .select("fingerprint")
        .distinct()
    )
    train_fps = winnow_fingerprints(
        train.select(F.col(id_col), F.col(text_col)),
        id_col=id_col, text_col=text_col, k=k, window=window,
    )
    matched = train_fps.join(
        F.broadcast(bench_fps), "fingerprint", "left_semi"
    )
    if min_shared > 1:
        hit_ids = (
            matched.groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("__n"))  # fps are distinct/doc
            .where(F.col("__n") >= min_shared)
            .select(id_col)
        )
    else:
        hit_ids = matched.select(id_col).distinct()
    return train.join(
        F.broadcast(hit_ids.withColumn("contaminated", F.lit(True))),
        id_col,
        "left",
    ).withColumn("contaminated", F.coalesce("contaminated", F.lit(False)))


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_size: int = 32,
    stride: int = 24,
) -> DataFrame:
    """Split each document into overlapping fixed-size token windows —
    the context-window prep step before packing sequences for training.

    Chunk ``k`` covers tokens ``[k*stride+1, k*stride+chunk_size]``
    (1-based); the chunk count is ``1 + ceil(max(n-chunk_size,0) /
    stride)`` so the final window always reaches the last token.
    Output: one row per (doc, chunk) with the window's token count and
    an md5 fingerprint of its text (callers wanting the text itself
    re-slice; fingerprints keep result sets small).
    """
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    n = F.size(toks)
    n_chunks = F.lit(1) + (
        (F.greatest(n - chunk_size, F.lit(0)) + (stride - 1))
        .cast("long")
        / F.lit(stride)
    ).cast("long")
    chunk = F.col("chunk_id") * stride + 1
    return (
        df.select(
            id_col,
            toks.alias("__toks"),
            F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_id"),
        )
        .select(
            id_col,
            "chunk_id",
            F.size(
                F.slice(F.col("__toks"), chunk, chunk_size)
            ).alias("chunk_tokens"),
            F.md5(
                F.concat_ws(" ", F.slice(F.col("__toks"), chunk, chunk_size))
            ).alias("chunk_md5"),
        )
    )


#: One sentence-ish run: non-terminator chars followed by a run of
#: terminators, or a trailing terminator-less fragment. No lookaround
#: and first-alternative-preferred in both Java regex (Spark) and RE2
#: (DuckDB oracles), so the match sets agree across engines.
SENTENCE_RE = r"[^.!?]+[.!?]+|[^.!?]+"


def split_sentences(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Segment each document into sentences — one output row per
    (doc, sentence) with the ordinal position and whitespace-trimmed
    text.

    Regexp segmentation (``SENTENCE_RE``): a sentence is a maximal run
    of non-``[.!?]`` characters plus its trailing terminator run;
    text after the last terminator becomes a final terminator-less
    sentence. Deliberately engine-portable (no lookbehind — RE2 has
    none) so DuckDB oracles reproduce the segmentation exactly.

    ``sentence_id`` is the 0-based position in the RAW match array;
    entries that trim to empty (whitespace between terminators) are
    filtered AFTER numbering, so ids are stable but not necessarily
    contiguous — downstream ordering only needs monotonicity.

    Scale: narrow projection + explode, no shuffle; output rows ≈
    sentences. The regexp runs once per document in codegen.
    """
    return (
        df.select(
            id_col,
            F.posexplode(
                F.regexp_extract_all(
                    F.col(text_col), F.lit(SENTENCE_RE), F.lit(0)
                )
            ).alias("sentence_id", "__raw"),
        )
        .select(
            id_col,
            "sentence_id",
            F.trim(F.col("__raw")).alias("sentence"),
        )
        .where(F.length("sentence") > 0)
    )


def sentence_chunks(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_tokens: int = 64,
) -> DataFrame:
    """Sentence-aware context-window chunking — the RAG/training prep
    that :func:`chunk_documents` (fixed token offsets) can't serve:
    chunk boundaries NEVER split a sentence.

    Semantics: sentences are streamed in order and a sentence goes to
    chunk ``floor(tokens_before_it / max_tokens)`` — the same
    no-lookahead streaming packing as :func:`pack_sequences`, with the
    boundary-straddling sentence spilling wholly into the chunk where
    it starts. Chunks therefore hold ≥ ``max_tokens`` tokens once a
    sentence crosses the boundary (over-full by at most one sentence),
    and only the final chunk can be short — the packing-efficient
    contract for trainer batches. Tokens are whitespace runs, matching
    the rest of the token-counting stack.

    Output: (id, chunk_id, n_sentences, chunk_tokens, chunk_md5) where
    the fingerprint is md5 of the chunk's sentences joined by a single
    space (fingerprints keep result sets bounded, as in
    :func:`chunk_documents`).

    Scale: one explode + ONE hash-shuffle on ``id_col`` that both the
    cumulative-sum window and the per-(doc, chunk) aggregation reuse —
    no global sort, packing parallelizes across documents. The ordered
    reassembly uses ``array_sort(collect_list(struct(...)))`` so chunk
    text is deterministic under any partitioning.
    """
    sents = split_sentences(df, text_col=text_col, id_col=id_col)
    toks = sents.withColumn(
        "__tok", F.size(F.split(F.col("sentence"), r"\s+"))
    )
    packed = pack_sequences(
        toks,
        partition_col=id_col,
        order_cols=["sentence_id"],
        token_col="__tok",
        budget=max_tokens,
    ).withColumnRenamed("bin_id", "chunk_id")
    return (
        packed.groupBy(id_col, "chunk_id")
        .agg(
            F.count(F.lit(1)).alias("n_sentences"),
            F.sum("__tok").alias("chunk_tokens"),
            F.md5(
                F.concat_ws(
                    " ",
                    F.transform(
                        F.array_sort(
                            F.collect_list(
                                F.struct("sentence_id", "sentence")
                            )
                        ),
                        lambda x: x["sentence"],
                    ),
                )
            ).alias("chunk_md5"),
        )
    )


def sentence_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_docs: int = 2,
) -> DataFrame:
    """Sentence-level boilerplate removal (the CCNet/RefinedWeb pass):
    drop every sentence that occurs in ``min_docs`` or more DISTINCT
    documents — cookie banners, nav text, license blurbs — and
    reassemble each document from its surviving sentences in order.

    Unlike :func:`paragraph_dedup` (keep-first, exact-paragraph), this
    drops ALL copies of a repeated sentence: a sentence shared by many
    pages is boilerplate, not content, and keeping one arbitrary copy
    would leave one page with a cookie banner. Documents whose every
    sentence is boilerplate vanish from the output (same contract as
    dropping empty docs after cleaning).

    Returns ``id_col`` + ``text`` (reassembled, single-space-joined)
    + ``kept_sentences`` + ``dropped_sentences``.

    Scale shape: explode sentences (narrow, no shuffle), then
    * the DISTINCT-doc count keyed on a 64-bit ``xxhash64(sentence)``
      — count-distinct plans as two narrow exchanges of (hash,
      doc_id) pairs pre-combined per partition; the full sentence
      text never shuffles in this pass;
    * the boilerplate key set joins back to the sentence stream on the
      hash (left join + flag; AQE broadcasts it when small — the
      common case, since boilerplate is by definition the repeated
      minority — and falls back to a shuffle join when a pathological
      corpus makes it huge, instead of OOMing a forced broadcast);
    * shuffle 2 — reassembly groupBy(``id_col``), ordered via
      ``array_sort(collect_list(struct(...)))`` so the rebuilt text is
      deterministic under any partitioning.
    Hash collisions (64-bit) would drop an innocent sentence; at 1e9
    distinct sentences p(any collision) ≈ 2.7e-2 corpus-wide and a
    collision costs one sentence of one page — acceptable for a
    boilerplate FILTER. The count is distinct-DOC, not occurrences, so
    a sentence repeated inside ONE document is content, not
    boilerplate.
    """
    sents = split_sentences(df, text_col=text_col, id_col=id_col)
    keyed = sents.withColumn("__k", F.xxhash64("sentence"))
    boiler = (
        keyed.groupBy("__k")
        .agg(F.countDistinct(id_col).alias("__nd"))
        .where(F.col("__nd") >= min_docs)
        .select("__k", F.lit(True).alias("__boiler"))
    )
    flagged = keyed.join(boiler, "__k", "left")
    return (
        flagged.groupBy(id_col)
        .agg(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("__boiler").isNull(),
                                F.struct("sentence_id", "sentence"),
                            )
                        )
                    ),
                    lambda x: x["sentence"],
                ),
            ).alias("text"),
            F.sum(
                F.when(F.col("__boiler").isNull(), 1).otherwise(0)
            ).alias("kept_sentences"),
            F.sum(
                F.when(F.col("__boiler").isNotNull(), 1).otherwise(0)
            ).alias("dropped_sentences"),
        )
        .where(F.col("kept_sentences") > 0)
    )


def sentence_windows(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window_sentences: int = 4,
    stride: int = 2,
) -> DataFrame:
    """Overlapping sentence windows — RAG retrieval chunks with
    context overlap, the sliding-window complement of
    :func:`sentence_chunks` (which partitions; retrieval wants
    overlap so a fact straddling a boundary is wholly inside SOME
    chunk).

    A window starts at every ``stride``-th sentence (positions 0,
    stride, 2·stride, … in each document's surviving-sentence order)
    and spans ``window_sentences`` consecutive sentences; the last
    window of a document may be short. With stride < window_sentences
    adjacent windows share ``window_sentences - stride`` sentences.

    Returns (id, window_id, n_sentences, window_tokens, window_md5)
    where ``window_id`` is the 0-based window ordinal and the md5
    fingerprints the single-space-joined window text (bounded result
    sets, as in :func:`sentence_chunks`).

    Scale shape: ONE hash-shuffle on ``id_col`` — a row_number window
    re-ranks the (possibly gappy) sentence ids densely, then each
    sentence replicates into the ≤ ``ceil(window/stride)`` windows
    that cover it via an inline ``sequence()`` explode (narrow), and
    the per-(doc, window) aggregation reuses the same partitioning.
    No global sort; windows parallelize across documents.
    """
    if stride <= 0:
        raise ValueError(f"stride must be positive, got {stride}")
    if window_sentences <= 0:
        raise ValueError(
            f"window_sentences must be positive, got {window_sentences}"
        )
    sents = split_sentences(df, text_col=text_col, id_col=id_col)
    w = Window.partitionBy(id_col).orderBy("sentence_id")
    dense = sents.withColumn(
        "__pos", F.row_number().over(w) - 1
    ).withColumn("__tok", F.size(F.split(F.col("sentence"), r"\s+")))
    # Window w_i covers positions [i*stride, i*stride + window).
    # Sentence at __pos p belongs to windows i in
    # [ceil((p - window + 1)/stride), floor(p/stride)] ∩ [0, ∞).
    lo = F.greatest(
        F.lit(0),
        F.ceil(
            (F.col("__pos") - F.lit(window_sentences - 1))
            / F.lit(stride)
        ).cast("int"),
    )
    hi = F.floor(F.col("__pos") / F.lit(stride)).cast("int")
    # stride > window leaves positions covered by NO window; sequence()
    # DESCENDS when lo > hi, so guard with an empty array instead.
    covering = F.when(lo <= hi, F.sequence(lo, hi)).otherwise(
        F.array().cast("array<int>")
    )
    win = dense.select(
        id_col,
        "__pos",
        "sentence",
        "__tok",
        F.explode(covering).alias("window_id"),
    )
    return (
        win.groupBy(id_col, "window_id")
        .agg(
            F.count(F.lit(1)).alias("n_sentences"),
            F.sum("__tok").alias("window_tokens"),
            F.md5(
                F.concat_ws(
                    " ",
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("__pos", "sentence"))
                        ),
                        lambda x: x["sentence"],
                    ),
                )
            ).alias("window_md5"),
        )
    )


def tfidf_terms(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_term_len: int = 3,
) -> DataFrame:
    """Per-(doc, term) tf-idf: ``tf * ln(N / df)`` over lowercase
    alphabetic terms of length ≥ ``min_term_len``.

    Two aggregations over one explode; the per-term document-frequency
    relation is vocabulary-sized and joined back broadcast. Returns
    (id, term, tf, df, tfidf rounded to 6).
    """
    terms = (
        df.select(
            id_col,
            F.explode(
                F.split(
                    F.trim(
                        F.regexp_replace(F.lower(F.col(text_col)), "[^a-z]+", " ")
                    ),
                    " ",
                )
            ).alias("term"),
        )
        .where(F.length("term") >= min_term_len)
    )
    tf = terms.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = (
        terms.select(id_col, "term")
        .distinct()
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    n_docs = df.select(id_col).distinct().count()
    return tf.join(F.broadcast(dfreq), "term").select(
        id_col,
        "term",
        "tf",
        "df",
        F.round(
            F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 6
        ).alias("tfidf"),
    )


def mad_outliers(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: float = 3.0,
) -> DataFrame:
    """Robust per-group outlier flag: ``|x - median| > k * MAD``
    (median absolute deviation).

    Exact interpolated percentiles, not stddev — on integer-valued
    columns every quantity here is exactly representable, so the flag
    never depends on float summation order (deterministic across
    engines and partitionings, unlike z-scores). Two grouped
    aggregations (median, then MAD of residuals), both map-side
    combinable; group stats are broadcast back.
    """
    med = df.groupBy(group_col).agg(
        F.percentile(value_col, F.lit(0.5)).alias("__med")
    )
    with_med = df.join(F.broadcast(med), group_col)
    mad = (
        with_med.groupBy(group_col)
        .agg(
            F.percentile(
                F.abs(F.col(value_col) - F.col("__med")), F.lit(0.5)
            ).alias("__mad")
        )
    )
    return (
        with_med.join(F.broadcast(mad), group_col)
        .withColumn(
            "is_outlier",
            F.abs(F.col(value_col) - F.col("__med")) > F.lit(k) * F.col("__mad"),
        )
        .withColumnRenamed("__med", "group_median")
        .withColumnRenamed("__mad", "group_mad")
    )


def pack_sequences(
    df: DataFrame,
    partition_col: str,
    order_cols: list[str],
    token_col: str,
    budget: int,
) -> DataFrame:
    """Assign items to fixed-token-budget bins — the sequence-packing
    step that turns variable-length documents into trainer batches.

    An item's bin is ``floor(start_offset / budget)`` where
    ``start_offset`` is the running token total before it in the
    deterministic ``order_cols`` order: the concatenated stream is cut
    at budget boundaries, with the boundary item spilling into the next
    bin (streaming packing, no lookahead). Exactly expressible as one
    cumulative-sum window — and the window is PARTITIONED by
    ``partition_col``, so packing parallelizes across sources instead
    of serializing the corpus through a single global sort (a global
    ORDER BY window is a one-partition bottleneck at 100 TB).
    """
    w = (
        Window.partitionBy(partition_col)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = (F.sum(token_col).over(w) - F.col(token_col)).alias("__start")
    return df.withColumn("__start", start).withColumn(
        "bin_id", F.expr(f"__start div {int(budget)}")
    ).drop("__start")


def paragraph_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n\n",
) -> DataFrame:
    """Paragraph-level exact deduplication with document reassembly —
    the C4/RefinedWeb-style pass that strips boilerplate repeated
    across pages (nav bars, footers, license blurbs) while keeping its
    first occurrence.

    Split each document on ``sep``, keep exactly one copy of every
    distinct paragraph corpus-wide (the survivor is the earliest
    ``(id, position)`` — deterministic), and rebuild each document from
    its surviving paragraphs in their original order. Documents whose
    every paragraph already appeared elsewhere vanish entirely (same
    contract as dropping empty docs after cleaning).

    Returns ``id_col`` + ``text`` (reassembled) + ``kept_paras`` +
    ``total_paras``.

    Scale shape: one explode (narrow), one shuffle on paragraph
    content for the survivor window, one shuffle back on the doc id
    for reassembly. The window key leads with a 64-bit hash of the
    paragraph so key comparison in the sort is one long, not a string
    compare — the full text tags along only to break hash collisions
    exactly. No driver materialization, no n² pairs, and hot
    paragraphs (the same footer a billion times) cost one group each,
    skew-splittable by AQE.
    """
    import re as _re

    pos, para = "__para_pos", "__para"
    # F.split takes a Java regex; sep is a LITERAL separator (the
    # reassembly side joins it literally) — escape it, or a sep like
    # "||" would split into single characters.
    paras = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), _re.escape(sep))).alias(
            pos, para
        ),
    )
    w = Window.partitionBy(F.xxhash64(para), F.col(para)).orderBy(
        id_col, pos
    )
    kept = (
        paras.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )
    totals = paras.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("total_paras")
    )
    rebuilt = kept.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("kept_paras"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col(pos), F.col(para)))
                ),
                lambda s: s[para],
            ),
            sep,
        ).alias("text"),
    )
    return rebuilt.join(totals, id_col).select(
        id_col, "text", "kept_paras", "total_paras"
    )


def duplicated_ngram_spans(
    df: DataFrame,
    n: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Cross-document duplicated-substring coverage (the span-level
    dedup signal of Lee et al. 2021, "Deduplicating Training Data
    Makes Language Models Better", and the ``dup_ngram`` quality
    filters of Gopher/RefinedWeb): for every document, the fraction of
    its tokens covered by some word ``n``-gram that also occurs in at
    least one OTHER document. Exact-duplicate detection finds whole
    copied documents; THIS finds boilerplate and quotation spans
    pasted across documents — the usual next filter in a 100 TB
    corpus pipeline (drop or trim docs with high ``dup_frac``).

    Returns one row per input document: ``(id_col, n_tokens,
    dup_tokens, dup_frac)`` with ``dup_frac = round(dup_tokens /
    n_tokens, 6)`` (NULL when the document has no tokens).

    Scale shape (deliberate, in order):

    1. n-grams are materialized INSIDE the token array
       (``transform`` + ``posexplode``), so the generate emits narrow
       ``(id, start, gram)`` rows — the full token array is never
       exploded per window.
    2. "gram appears in ≥2 distinct docs" is a window
       ``min(id) != max(id)`` over ``partitionBy(gram)`` — ONE
       shuffle, no groupBy+join back. (Production corpora can cut
       shuffle width further by keying on ``xxhash64(gram)``; the
       string key keeps the operator engine-portable for the oracle.)
    3. Covered-token counting merges overlapping windows per document
       with a gaps-and-islands pass (running max of span end, ordered
       by start) instead of exploding ``n`` positions per duplicated
       window — no row inflation, one sort inside the per-document
       partition.
    """
    toks = F.filter(
        F.split(F.trim(F.lower(F.col(text_col))), r"\s+"),
        lambda x: x != "",
    )
    base = spread(df, id_col).select(
        F.col(id_col), toks.alias("__t")
    ).withColumn("__nt", F.size("__t"))
    grams = (
        base.where(F.col("__nt") >= n)
        .select(
            id_col,
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(1), F.col("__nt") - (n - 1)),
                    lambda i: F.concat_ws(" ", F.slice(F.col("__t"), i, n)),
                )
            ).alias("__pos", "__gram"),
        )
        .select(
            id_col,
            (F.col("__pos") + 1).alias("__start"),
            (F.col("__pos") + n).alias("__end"),
            "__gram",
        )
    )
    wg = Window.partitionBy("__gram")
    dup_windows = grams.withColumn(
        "__dup",
        F.min(id_col).over(wg) != F.max(id_col).over(wg),
    ).where(F.col("__dup"))
    # gaps-and-islands: merge overlapping [start, end] spans per doc
    wd = Window.partitionBy(id_col).orderBy("__start")
    prev_end = F.max("__end").over(
        wd.rowsBetween(Window.unboundedPreceding, -1)
    )
    spans = dup_windows.withColumn(
        "__new_island",
        F.when(
            prev_end.isNull() | (F.col("__start") > prev_end), 1
        ).otherwise(0),
    ).withColumn("__island", F.sum("__new_island").over(wd))
    islands = spans.groupBy(id_col, "__island").agg(
        (F.max("__end") - F.min("__start") + 1).alias("__covered")
    )
    cov = islands.groupBy(id_col).agg(
        F.sum("__covered").alias("dup_tokens")
    )
    return base.join(cov, id_col, "left").select(
        id_col,
        F.col("__nt").alias("n_tokens"),
        F.coalesce(F.col("dup_tokens"), F.lit(0))
        .cast("bigint")
        .alias("dup_tokens"),
        F.when(
            F.col("__nt") > 0,
            F.round(
                F.coalesce(F.col("dup_tokens"), F.lit(0))
                / F.col("__nt"),
                6,
            ),
        ).alias("dup_frac"),
    )


def remove_duplicated_spans(
    df: DataFrame,
    n: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The rewrite half of span-level dedup (Lee et al. 2021 §4:
    remove all but ONE occurrence of every duplicated token span,
    rather than dropping whole documents): for each word ``n``-gram
    occurring more than once in the corpus (cross- OR within-document),
    the first occurrence by (doc, position) survives; every token
    covered ONLY by non-surviving duplicated windows (i.e. not also
    inside any surviving keeper window of the same document) is
    deleted and each document's text is reassembled from its
    remaining tokens.

    Returns ``(id_col, text, n_tokens, n_removed)`` — one row per
    input document (``text`` may become empty for pure-boilerplate
    docs; whitespace is normalized to single spaces by reassembly, and
    matching is case-insensitive while reassembly preserves original
    token casing).

    Scale shape: same single gram shuffle as
    :func:`duplicated_ngram_spans` (window count + first-occurrence
    over ``partitionBy(gram)``), then the drop set explodes only the
    REMOVED windows' positions and the rebuild is one
    sort-within-group aggregation per document. No all-pairs step
    anywhere.
    """
    toks = F.filter(
        F.split(F.trim(F.col(text_col)), r"\s+"), lambda x: x != ""
    )
    base = spread(df, id_col).select(
        F.col(id_col), toks.alias("__t")
    ).withColumn("__nt", F.size("__t"))
    low = F.transform(F.col("__t"), lambda x: F.lower(x))
    grams = (
        base.where(F.col("__nt") >= n)
        .select(
            id_col,
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(1), F.col("__nt") - (n - 1)),
                    lambda i: F.concat_ws(" ", F.slice(low, i, n)),
                )
            ).alias("__pos", "__gram"),
        )
        .select(
            id_col,
            (F.col("__pos") + 1).alias("__start"),
            (F.col("__pos") + n).alias("__end"),
            "__gram",
        )
    )
    wg = Window.partitionBy("__gram")
    marked = grams.select(
        id_col,
        "__start",
        "__end",
        (F.count(F.lit(1)).over(wg) >= 2).alias("__dup"),
        (
            F.min(F.struct(F.col(id_col), F.col("__start"))).over(wg)
            == F.struct(F.col(id_col), F.col("__start"))
        ).alias("__keeper"),
    )
    # Positions covered by the surviving (keeper) window of ANY gram
    # stay — only tokens covered EXCLUSIVELY by non-surviving windows
    # are deleted (Lee et al. keep one full occurrence: in
    # 'a a a a a a' with n=5 the keeper [1,5] protects positions 2-5
    # from the removed window [2,6], leaving the 5-token kept span).
    keep_cov = (
        marked.where(F.col("__dup") & F.col("__keeper"))
        .select(
            id_col,
            F.explode(
                F.sequence(F.col("__start"), F.col("__end"))
            ).alias("__p"),
        )
        .distinct()
    )
    drop_pos = (
        marked.where(F.col("__dup") & ~F.col("__keeper"))
        .select(
            id_col,
            F.explode(
                F.sequence(F.col("__start"), F.col("__end"))
            ).alias("__p"),
        )
        .distinct()
        .join(keep_cov, [id_col, "__p"], "left_anti")
    )
    exploded = base.select(
        id_col,
        "__nt",
        F.posexplode("__t").alias("__pos0", "__tok"),
    ).select(
        id_col, "__nt", (F.col("__pos0") + 1).alias("__p"), "__tok"
    )
    kept = exploded.join(drop_pos, [id_col, "__p"], "left_anti")
    rebuilt = kept.groupBy(id_col, "__nt").agg(
        F.count(F.lit(1)).alias("__kept"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("__p"), F.col("__tok")))
                ),
                lambda s: s["__tok"],
            ),
            " ",
        ).alias("text"),
    )
    return (
        base.select(id_col, "__nt")
        .join(rebuilt.drop("__nt"), id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("text"), F.lit("")).alias("text"),
            F.col("__nt").alias("n_tokens"),
            (F.col("__nt") - F.coalesce(F.col("__kept"), F.lit(0)))
            .cast("bigint")
            .alias("n_removed"),
        )
    )


def bigram_logprob(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus-trained bigram language-model scoring — the
    perplexity-proxy quality filter (CCNet/Gopher filter documents
    whose LM score says "not like the reference corpus"; here the
    corpus itself is the model, so the score reads as typicality:
    boilerplate scores high, gibberish low).

    Model: add-one-smoothed bigram MLE over lowercase alpha tokens,
    ``p(w2|w1) = (c(w1,w2) + 1) / (c(w1) + V)`` with ``V`` = number of
    distinct first-tokens. Per document: ``n_bigrams`` and
    ``avg_logprob`` (mean natural log probability; higher = more
    typical of the corpus).

    Cross-engine determinism: each bigram's log-prob is rounded to 6
    decimals FIRST and the per-document mean then accumulates in exact
    DECIMAL, so partial-aggregation order cannot move the result (a
    raw double sum of logs would hash-differ between engines).

    Scale shape: two count aggregations (bigram and unigram tables,
    both map-side combinable, vocabulary-sized results), V as a window
    over the already-aggregated unigram frame, one join of the bigram
    stream against each count table (vocab tables broadcast when small,
    sort-merge at web scale — the standard LM-counting topology), one
    final per-document aggregation.
    """
    toks = F.filter(
        F.split(F.regexp_replace(F.lower(F.col(text_col)), "[^a-z]+", " "), " "),
        lambda x: x != "",
    )
    # spread BEFORE tokenization: the regex tokenize + bigram explode
    # is re-evaluated by each consumer of `bi` (both count models and
    # the scoring join) and otherwise inherits single-task parallelism
    # from a single-row-group scan (r16; no-op on a wide scan).
    base = spread(df, id_col).select(
        F.col(id_col), toks.alias("__t")
    ).withColumn("__nt", F.size("__t"))
    bi = base.where(F.col("__nt") >= 2).select(
        id_col,
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.col("__nt") - 1),
                lambda i: F.struct(
                    F.element_at(F.col("__t"), i).alias("w1"),
                    F.element_at(F.col("__t"), i + 1).alias("w2"),
                ),
            )
        ).alias("__bg"),
    ).select(id_col, F.col("__bg.w1").alias("w1"), F.col("__bg.w2").alias("w2"))
    # r16 note — measured and deliberately left alone: materializing
    # c12 and deriving c1 from it (c(w1) = Σ_w2 c(w1,w2)) read 1.16
    # in interleaved A/B here — this operator has no eager action, so
    # its three token-stream passes run concurrently inside one job
    # and a checkpoint only serializes them. The same derivation DOES
    # pay in dsir_select, whose per-model v = c1.count() is eager.
    c12 = bi.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("__c12"))
    c1 = bi.groupBy("w1").agg(F.count(F.lit(1)).alias("__c1"))
    c1 = c1.withColumn(
        "__v", F.count(F.lit(1)).over(Window.partitionBy())
    )
    # ln() is the one transcendental in the engine's oracle surface:
    # libm implementations differ in the last ulp, so a 6dp rounding
    # can flip on a boundary (observed: 2/5000 docs at sf0.1).
    # Quantizing at 4dp shrinks the flip window 100x while keeping
    # far more resolution than a quality threshold needs; the per-doc
    # mean then accumulates exactly in DECIMAL.
    lp = F.round(
        F.log(
            (F.col("__c12") + 1)
            / (F.col("__c1") + F.col("__v")).cast("double")
        ),
        4,
    ).cast("decimal(18,4)")
    scored = (
        bi.join(c12, ["w1", "w2"])
        .join(c1, "w1")
        .select(id_col, lp.alias("__lp"))
    )
    per_doc = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        # exact decimal sum -> double -> divide: decimal DIVISION
        # scales differ across engines, double division does not
        F.round(
            F.sum("__lp").cast("double") / F.count(F.lit(1)), 6
        ).alias("avg_logprob"),
    )
    return base.select(id_col).join(per_doc, id_col, "left").select(
        id_col,
        F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
        "avg_logprob",
    )


def _bigram_stream(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """(id, w1, w2) bigram stream over lowercase alpha tokens — the
    shared tokenization of bigram_logprob and dsir_select. ``spread``
    fans the tokenize + explode out of a single-row-group scan (r16):
    dsir_select re-evaluates this stream once per count model and once
    for scoring, so single-task tokenization multiplies."""
    toks = F.filter(
        F.split(
            F.regexp_replace(F.lower(F.col(text_col)), "[^a-z]+", " "), " "
        ),
        lambda x: x != "",
    )
    base = spread(df, id_col).select(
        F.col(id_col), toks.alias("__t")
    ).withColumn("__nt", F.size("__t"))
    return base.where(F.col("__nt") >= 2).select(
        id_col,
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.col("__nt") - 1),
                lambda i: F.struct(
                    F.element_at(F.col("__t"), i).alias("w1"),
                    F.element_at(F.col("__t"), i + 1).alias("w2"),
                ),
            )
        ).alias("__bg"),
    ).select(
        id_col, F.col("__bg.w1").alias("w1"), F.col("__bg.w2").alias("w2")
    )


def dsir_select(
    corpus: DataFrame,
    target: DataFrame,
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """DSIR-style data selection (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling", arXiv:2302.03169):
    pick the ``k`` corpus documents whose n-gram distribution looks
    most like a small high-quality ``target`` set. Importance weight =
    mean bigram log-likelihood under the TARGET model minus under the
    CORPUS model (length-normalized log ratio; DSIR's hashed-n-gram
    features specialized to bigrams); selection is deterministic
    top-k (weight desc, id) rather than Gumbel resampling, so the
    result is reproducible and oracle-checkable.

    Both models are add-one-smoothed bigram MLEs (see
    :func:`bigram_logprob`); bigrams/first-tokens unseen by a model
    fall back to its smoothing floor ``1/(0+V)``. Per-bigram log-probs
    are quantized at 4dp before exact DECIMAL accumulation (the ln
    libm-ulp discipline), and the final top-k lowers to Spark's
    distributed TakeOrdered — per-partition top-k then a single merge,
    never a global sort of the corpus.

    Vocabulary sizes are driver-side scalars (one map-side-combined
    count over each model's vocab frame — hyperparameter-sized, not a
    data-path collect).
    """
    corpus_bi = _bigram_stream(corpus, id_col, text_col)
    target_bi = _bigram_stream(target, id_col, text_col)

    def model(bi):
        # One tokenize pass per model (r16): the bigram table is
        # materialized (vocab-sized) and the unigram table derived
        # from it exactly (c(w1) = Σ_w2 c(w1,w2)); the vocabulary
        # scalar then counts cached rows instead of re-tokenizing.
        c12 = bi.groupBy("w1", "w2").agg(
            F.count(F.lit(1)).alias("c12")
        ).localCheckpoint()
        c1 = c12.groupBy("w1").agg(F.sum("c12").alias("c1"))
        v = c1.count()
        return c12, c1, v

    t12, t1, tv = model(target_bi)
    s12, s1, sv = model(corpus_bi)

    def lp(c12_col, c1_col, v):
        return F.round(
            F.log(
                (F.coalesce(c12_col, F.lit(0)) + 1)
                / (F.coalesce(c1_col, F.lit(0)) + F.lit(v)).cast("double")
            ),
            4,
        ).cast("decimal(18,4)")

    scored = (
        corpus_bi.join(
            t12.select(
                F.col("w1"), F.col("w2"), F.col("c12").alias("__t12")
            ),
            ["w1", "w2"],
            "left",
        )
        .join(t1.select(F.col("w1"), F.col("c1").alias("__t1")), "w1", "left")
        .join(
            s12.select(
                F.col("w1"), F.col("w2"), F.col("c12").alias("__s12")
            ),
            ["w1", "w2"],
        )
        .join(s1.select(F.col("w1"), F.col("c1").alias("__s1")), "w1")
        .select(
            id_col,
            lp(F.col("__t12"), F.col("__t1"), tv).alias("__lp_t"),
            lp(F.col("__s12"), F.col("__s1"), sv).alias("__lp_s"),
        )
    )
    weights = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.round(
            F.sum("__lp_t").cast("double") / F.count(F.lit(1))
            - F.sum("__lp_s").cast("double") / F.count(F.lit(1)),
            6,
        ).alias("weight"),
    )
    return (
        weights.orderBy(F.desc("weight"), F.col(id_col))
        .limit(k)
        .select(id_col, "n_bigrams", "weight")
    )


def blocklist_filter(
    df: DataFrame,
    blocklist: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    term_col: str = "term",
) -> DataFrame:
    """Flag documents containing any blocklisted token (the
    keyword-filter stage of corpus cleaning — profanity/adult/spam
    term lists a la C4's badwords filter). Matching is on lowercase
    alpha TOKENS, not substrings, so 'class' never trips an 'ass'
    entry — the false-positive class that plagues substring filters.

    Returns ``df`` + ``blocked`` (bool) + ``n_blocked_terms`` (distinct
    blocklisted tokens present). The blocklist is broadcast (term
    lists are KBs, corpora are TBs): the corpus is scanned once and
    never shuffled, same shape as :func:`decontaminate`.
    """
    terms = F.broadcast(
        blocklist.select(
            F.lower(F.col(term_col)).alias("__term")
        ).distinct()
    )
    toks = df.select(
        F.col(id_col),
        F.explode(
            F.array_distinct(
                F.filter(
                    F.split(
                        F.regexp_replace(
                            F.lower(F.col(text_col)), "[^a-z]+", " "
                        ),
                        " ",
                    ),
                    lambda x: x != "",
                )
            )
        ).alias("__term"),
    )
    hits = (
        toks.join(terms, "__term", "left_semi")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_blocked_terms"))
    )
    return df.join(F.broadcast(hits), id_col, "left").select(
        *df.columns,
        F.coalesce(F.col("n_blocked_terms") > 0, F.lit(False)).alias(
            "blocked"
        ),
        F.coalesce(F.col("n_blocked_terms"), F.lit(0)).alias(
            "n_blocked_terms"
        ),
    )


def bm25_search(
    df: DataFrame,
    query: str,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Okapi BM25 ranked search over the corpus — the curation-side
    "find documents about X" primitive (inspect near-dups, audit a
    topic's coverage, build seed sets for :func:`dsir_select`).

    Standard BM25 with the +1 idf smoothing
    (``idf = ln(1 + (N - df + 0.5)/(df + 0.5))``), lowercase alpha
    tokens, query terms deduplicated. Returns the deterministic top-k
    ``(id, score, n_hit_terms)`` (ties by id).

    Scale shape: tf/df/doclen are the same two counting aggregations
    every search index build runs (map-side combinable, vocabulary- or
    corpus-×-terms-sized); the QUERY's term rows are broadcast, so
    scoring touches only postings of query terms — never the full
    term table; final top-k lowers to distributed TakeOrdered.
    Determinism: idf (the one transcendental) is quantized at 6dp,
    each term's score contribution at 6dp DECIMAL, so the per-doc sum
    is exact and engine-portable.
    """
    import re as _re

    q_terms = sorted(
        {t for t in _re.split(r"[^a-z]+", query.lower()) if t}
    )
    if not q_terms:
        raise ValueError("bm25_search: query has no alpha tokens")
    toks = F.filter(
        F.split(
            F.regexp_replace(F.lower(F.col(text_col)), "[^a-z]+", " "), " "
        ),
        lambda x: x != "",
    )
    base = df.select(F.col(id_col), toks.alias("__t")).withColumn(
        "__dl", F.size("__t")
    )
    stats = base.agg(
        F.count(F.lit(1)).alias("n"), F.sum("__dl").alias("sdl")
    ).collect()[0]
    n_docs, avgdl = stats["n"], stats["sdl"] / max(stats["n"], 1)
    # filter INSIDE the token array before exploding: the generate
    # emits only query-term occurrences, not the whole corpus's tokens
    terms = base.select(
        id_col,
        "__dl",
        F.explode(
            F.filter(F.col("__t"), lambda x: x.isin(*q_terms))
        ).alias("__term"),
    )
    tf = terms.groupBy(id_col, "__dl", "__term").agg(
        F.count(F.lit(1)).alias("__tf")
    )
    dfreq = tf.groupBy("__term").agg(F.count(F.lit(1)).alias("__df"))
    idf = F.round(
        F.log(
            1
            + (F.lit(float(n_docs)) - F.col("__df") + 0.5)
            / (F.col("__df") + 0.5)
        ),
        6,
    )
    contrib = F.round(
        idf
        * (F.col("__tf") * (k1 + 1))
        / (
            F.col("__tf")
            + k1 * (1 - b + b * F.col("__dl") / F.lit(float(avgdl)))
        ),
        6,
    ).cast("decimal(18,6)")
    scored = tf.join(F.broadcast(dfreq), "__term").select(
        id_col, contrib.alias("__c")
    )
    return (
        scored.groupBy(id_col)
        .agg(
            F.sum("__c").cast("double").alias("score"),
            F.count(F.lit(1)).alias("n_hit_terms"),
        )
        .orderBy(F.desc("score"), F.col(id_col))
        .limit(k)
    )


def cluster_aware_split(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    train_pct: int = 90,
    num_bands: int = 8,
    shingle_size: int = 3,
    pairs: DataFrame | None = None,
) -> DataFrame:
    """Leakage-free train/holdout assignment: split by NEAR-DUP
    CLUSTER, not by document. Per-document hash splitting (the
    standard md5-bucket rule) lets near-duplicate pairs straddle the
    boundary — the eval-inflation leak a split-leakage audit measures.
    Here every document inherits its LSH-connected-component's id
    (singletons are their own cluster) and the md5 bucket is computed
    on the CLUSTER id, so an entire near-dup family lands on one side
    by construction: cross-split candidate pairs are IMPOSSIBLE, not
    merely rare.

    Returns ``(id_col, cluster_id, split)``. Cost over plain splitting
    is the dedup pipeline the corpus runs anyway (LSH candidates +
    iterative components); the split itself stays a narrow projection.
    Pass ``pairs=`` to reuse an already-computed candidate frame (the
    corpus pipeline usually has one) instead of regenerating it.
    """
    from blackroad_feature_store_spark.operators.dedup import (
        duplicate_clusters,
        minhash_candidate_pairs,
    )

    if pairs is None:
        pairs = minhash_candidate_pairs(
            df, num_bands=num_bands, shingle_size=shingle_size
        )
    clusters = duplicate_clusters(pairs).select(
        F.col("doc_id").alias(id_col), "cluster_id"
    )
    assigned = df.select(id_col).join(clusters, id_col, "left").select(
        id_col,
        F.coalesce(F.col("cluster_id"), F.col(id_col)).alias("cluster_id"),
    )
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.col("cluster_id").cast("string")), 1, 4
            ),
            16,
            10,
        ).cast("int")
        % 100
    )
    return assigned.withColumn(
        "split",
        F.when(bucket < train_pct, F.lit("train")).otherwise(
            F.lit("holdout")
        ),
    )


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    k: int,
    id_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Weighted sampling WITHOUT replacement, deterministic:
    Efraimidis–Spirakis (2006) — each row gets key ``u^(1/w)`` for a
    uniform ``u``, and the k largest keys are the sample, giving
    inclusion probability proportional to weight. ``u`` is not
    ``rand()`` but an md5-derived uniform of ``(id, seed)``, so the
    sample is a pure function of the data — re-runs, retries, and
    engines all draw the SAME sample (the reproducibility every
    training-data pipeline needs), and a new ``seed`` is a fresh
    draw. Quality-weighted corpus subsetting is the canonical use:
    ``weight = quality_score`` keeps good documents preferentially
    without hard thresholds.

    Rows with weight <= 0 or NULL are excluded (zero mass). Keys are
    quantized at 12dp with an id tiebreak, so the top-k boundary
    cannot flip on last-ulp pow() differences. Selection lowers to
    distributed TakeOrdered — per-partition top-k, no global sort.
    """
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        ":", F.col(id_col).cast("string"), F.lit(str(seed))
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("double")
        + 1.0
    ) / 4294967297.0  # (0, 1]: (x+1) / (2^32 + 1)
    key = F.round(
        F.pow(u, 1.0 / F.col(weight_col)), 12
    )
    return (
        df.where(F.col(weight_col).isNotNull() & (F.col(weight_col) > 0))
        .withColumn("sample_key", key)
        .orderBy(F.desc("sample_key"), F.col(id_col))
        .limit(k)
    )


def nb_classify(
    train: DataFrame,
    score: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    label_col: str = "label",
    token_mode: str = "word",
) -> DataFrame:
    """Multinomial Naive Bayes text classification — the model-based
    filtering stage of CCNet/fastText-style pipelines (score documents
    by "which reference class does this look like": quality tiers,
    domains, languages). Unlike iterative classifiers, NB's training
    IS a pair of count aggregations, so the whole train-and-score
    pipeline stays declarative, exactly reproducible, and
    oracle-certifiable.

    Model: add-one-smoothed multinomial NB over lowercase alpha
    tokens. ``log p(w|c) = ln((count(c,w)+1) / (count(c)+V))`` with V
    = global distinct training vocabulary; prior ``ln(docs_c /
    docs_total)``. A scored token absent from class c's counts gets
    the smoothed floor ``ln(1/(count(c)+V))``; a document with no
    tokens is classified by priors alone. Prediction = argmax over
    classes, ties to the lexicographically smallest label.

    Cross-engine determinism (the `bigram_logprob` pattern): every
    per-token log weight and each prior is quantized to 4 decimals
    FIRST, and per-(doc, class) scores then accumulate in exact
    DECIMAL — aggregation order cannot move a score, so argmax and
    margin replay bit-for-bit in any engine.

    Scale shape: the training corpus is tokenized ONCE — class totals
    and the vocabulary size both derive from the aggregated
    (class, word) count table (vocab-sized, map-side-combined), not
    from re-scans of the token stream; the scored side pre-aggregates
    to (doc, word, tf) before the #classes fan-out, so the weight join
    runs on term-frequency rows instead of raw token occurrences
    (``sum(tf · weight)`` over exact DECIMALs equals the token-wise
    sum exactly). The per-class dimension (priors + floors) is a
    #classes-row broadcast; the weight join is an equi-join —
    broadcast when the vocabulary is small, sort-merge at web scale;
    one final per-doc aggregation + window argmax. Nothing is ever
    driver-side.

    ``token_mode`` selects the feature extractor, everything
    downstream is shared: ``"word"`` (default — lowercase alpha
    tokens, the source/domain-classifier shape) or ``"charN"`` for an
    N (e.g. ``"char3"``) — overlapping character N-grams of the
    normalized text (lowercased, non-alpha runs collapsed to one
    space, trimmed), the CCNet/fastText LANGUAGE-ID feature: character
    n-grams capture orthography and function-morphology without any
    language-specific tokenizer. Both are single codegen expressions
    (no UDF); both replay exactly in the SQL oracle.

    When the training set is a predicate-defined SUBSET of the scored
    corpus (the lang-ID shape: train on the labeled slice, score
    everything), use :func:`nb_classify_self` — it tokenizes the
    corpus ONCE and derives both count tables from the shared gram
    scan, instead of paying the (expensive) feature extraction twice.
    """
    toks = _nb_tokens(text_col, token_mode)
    tr_tok = train.select(
        F.col(label_col).alias("__cls"), F.explode(toks).alias("__w")
    )
    cls_word = tr_tok.groupBy("__cls", "__w").agg(
        F.count(F.lit(1)).alias("__cw")
    )
    docs = train.groupBy(F.col(label_col).alias("__cls")).agg(
        F.count(F.lit(1)).alias("__dc")
    )
    total_docs = train.agg(F.count(F.lit(1)).alias("__dt"))
    # (doc, word, tf) before the #classes fan-out: the weight join and
    # class replication run on term-frequency rows, not raw tokens.
    sc_cnt = (
        score.select(F.col(id_col), F.explode(toks).alias("__w"))
        .groupBy(id_col, "__w")
        .agg(F.count(F.lit(1)).alias("__tf"))
    )
    return _nb_train_score(
        cls_word, docs, total_docs, sc_cnt, score.select(id_col), id_col
    )


def nb_classify_self(
    docs: DataFrame,
    train_pred,
    id_col: str = "doc_id",
    text_col: str = "text",
    label_col: str = "label",
    token_mode: str = "word",
) -> DataFrame:
    """:func:`nb_classify` for the self-training shape — train on
    ``docs.where(train_pred)`` with ``label_col`` labels, score EVERY
    row of ``docs`` — with the corpus tokenized ONCE (VERDICT r10
    item 3): the feature extraction (the dominant cost in ``charN``
    mode — |chars| gram rows per doc) runs a single time and both the
    per-(doc, word) term frequencies AND the training (class, word)
    counts derive from that one aggregated gram scan; the train-side
    counts are a vocab-bounded re-aggregation of tf rows, not a second
    tokenization pass. Per-class document counts for the priors come
    from a column-pruned scan of ``docs`` (token-less documents must
    still count toward priors, and they never reach the gram rows).
    Scores are identical to ``nb_classify(docs.where(train_pred),
    docs, ...)`` — exact-DECIMAL, same quantization — just one corpus
    scan cheaper."""
    toks = _nb_tokens(text_col, token_mode)
    # The aggregated gram table is MATERIALIZED (localCheckpoint, the
    # same lineage-cut idiom as dedup.py's connected components):
    # both downstream consumers (train-side class counts, score-side
    # term frequencies) read the one computed table. Relying on
    # exchange reuse instead is brittle — per-consumer output-list
    # pruning makes the two aggregate subtrees canonically unequal,
    # and Spark then tokenizes the corpus once PER CONSUMER BRANCH
    # (measured: 8 tokenization expressions in the un-checkpointed
    # plan; this is the difference between "declared shared" and
    # "actually computed once"). The table is |distinct grams per
    # doc| rows — the same order as the shuffle the score already
    # pays, and exactly what a production pipeline would persist.
    doc_tf = (
        docs.select(
            F.col(id_col),
            F.col(label_col).alias("__cls"),
            train_pred.alias("__is_train"),
            F.explode(toks).alias("__w"),
        )
        .groupBy(id_col, "__cls", "__is_train", "__w")
        .agg(F.count(F.lit(1)).alias("__tf"))
        .localCheckpoint(eager=False)
    )
    # Train-side counts keep ``__is_train`` as an aggregated value
    # (groups with no train contribution fold to NULL and drop) —
    # equivalent to filtering train rows first, over the shared table.
    cls_word = (
        doc_tf.groupBy("__cls", "__w")
        .agg(
            F.sum(
                F.when(F.col("__is_train"), F.col("__tf"))
            ).alias("__cw")
        )
        .where(F.col("__cw").isNotNull())
    )
    sc_cnt = doc_tf.select(id_col, "__w", "__tf")
    train_docs = docs.where(train_pred)
    doc_counts = train_docs.groupBy(F.col(label_col).alias("__cls")).agg(
        F.count(F.lit(1)).alias("__dc")
    )
    total_docs = train_docs.agg(F.count(F.lit(1)).alias("__dt"))
    return _nb_train_score(
        cls_word, doc_counts, total_docs, sc_cnt,
        docs.select(id_col), id_col,
    )


def _nb_tokens(text_col: str, token_mode: str):
    """The shared NB feature extractor: a single codegen expression
    producing the token/gram array for one row (see
    :func:`nb_classify` for the two modes)."""
    norm = F.trim(
        F.regexp_replace(F.lower(F.col(text_col)), "[^a-z]+", " ")
    )
    if token_mode == "word":
        return F.filter(F.split(norm, " "), lambda x: x != "")
    if token_mode.startswith("char"):
        n = int(token_mode[4:])
        if n < 1:
            raise ValueError(f"char n-gram size must be >= 1: {token_mode}")
        # Packed-integer grams (r17, guide §2.3 "narrower types" —
        # VERDICT r16 ask #5): ``norm``'s alphabet is exactly
        # {space, a-z} (27 symbols — lower() + "[^a-z]+" → " "
        # guarantee it), so an N-gram packs INJECTIVELY into one
        # BIGINT as a base-27 number (space→0, a→1 … z→26). An
        # injective recode preserves every per-(class, gram) count
        # and the distinct-gram vocabulary size exactly, so the NB
        # weights, scores and argmax are bit-identical (measured:
        # interleaved min-ratio 0.79 on text_lang_id, output
        # row-identical) — while the gram rows aggregate, shuffle and
        # join as 8-byte longs instead of per-position substring
        # allocations hashed as strings. The per-row char-code array
        # is bound ONCE via a 1-element-array transform so the split
        # is not re-evaluated per position. Sizes whose code space
        # exceeds BIGINT (27^N, N > 12) keep the substring form.
        if 27 ** n <= (1 << 62):
            codes = F.transform(
                F.split(norm, ""),
                lambda c: F.greatest(
                    F.ascii(c) - 96, F.lit(0)
                ).cast("long"),
            )
            mults = [27 ** (n - 1 - j) for j in range(n)]

            def _gram(codes_b, i):
                out = None
                for j, m in enumerate(mults):
                    term = F.element_at(codes_b, i + j) * F.lit(m)
                    out = term if out is None else out + term
                return out

            # guard: sequence(1, 0) DESCENDS in Spark — short texts
            # must yield an empty gram array, not garbage indexes
            return F.when(
                F.length(norm) >= n,
                F.transform(
                    F.array(codes),
                    lambda cb: F.transform(
                        F.sequence(
                            F.lit(1), F.length(norm) - F.lit(n - 1)
                        ),
                        lambda i: _gram(cb, i),
                    ),
                )[0],
            ).otherwise(F.array().cast("array<long>"))
        return F.when(
            F.length(norm) >= n,
            F.transform(
                F.sequence(
                    F.lit(1), F.length(norm) - F.lit(n - 1)
                ),
                lambda i: F.substring(norm, i, F.lit(n)),
            ),
        ).otherwise(F.array().cast("array<string>"))
    raise ValueError(f"Unknown token_mode {token_mode!r}")


def _nb_train_score(
    cls_word: DataFrame,
    docs: DataFrame,
    total_docs: DataFrame,
    sc_cnt: DataFrame,
    score_ids: DataFrame,
    id_col: str,
) -> DataFrame:
    """The shared NB train-and-score tail: smoothed log-weight model
    from the (class, word) count table, per-word class→weight map
    join over (doc, word, tf) rows, exact-DECIMAL accumulation,
    window argmax. Inputs: ``cls_word`` (__cls, __w, __cw), ``docs``
    (__cls, __dc per-class doc counts), ``total_docs`` (__dt),
    ``sc_cnt`` (id, __w, __tf), ``score_ids`` (one id per scored
    document, including token-less ones)."""
    # one tokenized pass: totals + vocabulary come from cls_word
    cls_tot = cls_word.groupBy("__cls").agg(F.sum("__cw").alias("__ct"))
    vocab = cls_word.agg(F.countDistinct("__w").alias("__v"))
    q4 = lambda c: F.round(c, 4).cast("decimal(18,4)")  # noqa: E731
    classes = (
        cls_tot.crossJoin(vocab)
        .join(docs, "__cls")
        .crossJoin(total_docs)
        .select(
            "__cls",
            q4(F.log(F.col("__dc") / F.col("__dt").cast("double"))).alias(
                "__prior"
            ),
            q4(
                F.log(1.0 / (F.col("__ct") + F.col("__v")).cast("double"))
            ).alias("__floor"),
            "__ct",
            "__v",
        )
    )
    weights = (
        cls_word.join(cls_tot, "__cls")
        .crossJoin(vocab)
        .select(
            "__cls",
            "__w",
            q4(
                F.log(
                    (F.col("__cw") + 1)
                    / (F.col("__ct") + F.col("__v")).cast("double")
                )
            ).alias("__lw"),
        )
    )

    # The weight join runs ONCE per (doc, word) against a per-word
    # class→weight MAP (vocab-bounded, broadcastable) — replicating by
    # class BEFORE the join would push #classes× the rows through it;
    # instead the class fan-out is a narrow post-join crossJoin with
    # the tiny class dimension, and each cell reads its weight from
    # the map (floor when the class never saw the word).
    weights_by_word = weights.groupBy("__w").agg(
        F.map_from_entries(
            F.collect_list(F.struct("__cls", "__lw"))
        ).alias("__m")
    )
    tok_scores = (
        sc_cnt.join(weights_by_word, "__w", "left")
        .join(F.broadcast(classes.select("__cls", "__floor")))
        .groupBy(id_col, "__cls")
        .agg(
            F.sum(
                F.col("__tf")
                * F.coalesce(
                    F.element_at("__m", F.col("__cls")), F.col("__floor")
                )
            ).alias("__tok_sum"),
            F.sum("__tf").alias("__n_tok"),
        )
    )
    # every (doc, class) cell exists even for token-less docs: priors
    # alone then decide (cross join with the tiny class dimension)
    base = (
        score_ids
        .crossJoin(F.broadcast(classes.select("__cls", "__prior")))
        .join(tok_scores, [id_col, "__cls"], "left")
        .select(
            id_col,
            "__cls",
            (
                F.col("__prior")
                + F.coalesce(
                    F.col("__tok_sum"), F.lit(0).cast("decimal(18,4)")
                )
            ).alias("__score"),
            F.coalesce("__n_tok", F.lit(0)).alias("__n_tok"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("__score").desc(), F.col("__cls").asc()
    )
    ranked = base.select(
        id_col,
        "__cls",
        "__score",
        "__n_tok",
        F.row_number().over(w).alias("__rn"),
        F.lead("__score").over(w).alias("__second"),
    )
    return ranked.where(F.col("__rn") == 1).select(
        id_col,
        F.col("__cls").alias("pred_label"),
        F.col("__score").cast("double").alias("score_top"),
        F.round(
            (F.col("__score") - F.col("__second")).cast("double"), 6
        ).alias("margin"),
        F.col("__n_tok").alias("n_tokens"),
    )
