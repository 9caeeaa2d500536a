"""Entity resolution / record linkage: blocking -> pair scoring ->
transitive closure -> survivorship.

The reference engine (BlackRoad-Labs/blackroad-feature-store) has no
linkage surface; this module extends the engine for the entity-merge
step a large-scale curation pipeline runs BEFORE feature computation
(the same role `operators/dedup.py` plays for documents, specialised
to short entity records and edit-distance similarity).

Scale design
------------
* **Blocking bounds the candidate set.** A naive similarity join is
  O(N^2); multi-pass blocking (head-k + tail-k substring keys) makes
  it O(sum of block^2) with block sizes controlled by ``key_len``.
  Two passes guarantee a record corrupted by ONE character drop still
  shares at least one key with its source whenever
  ``len(name) >= 2*key_len`` (the drop position cannot invalidate
  both the head and the tail key at once).
* **Skew cap.** Degenerate blocks (the entity-record analogue of
  stop-words) are capped deterministically: rank by record id inside
  the block, keep the first ``max_block``. The cap trades bounded
  recall loss inside pathological blocks for a hard O(max_block^2)
  per-block ceiling — same contract as ``dedup.minhash_candidate_
  pairs(max_bucket=...)``.
* **Names ride the pair stream.** Candidate generation carries the
  (short, bounded) name columns through the self-join instead of
  re-joining the full record table twice at scoring time — two fewer
  shuffles of the wide table.
* **Everything is JVM-side**: substring keys, ``levenshtein`` and the
  normalised similarity are built-in codegen expressions; transitive
  closure reuses :func:`dedup.duplicate_clusters` (pointer-jumping
  min-label propagation, O(log diameter) rounds).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from blackroad_feature_store_spark.operators.dedup import duplicate_clusters

__all__ = [
    "blocking_keys",
    "candidate_pairs",
    "score_pairs",
    "link_records",
    "resolve_entities",
]


def blocking_keys(
    records: DataFrame,
    *,
    id_col: str = "rec_id",
    name_col: str = "name",
    key_len: int = 12,
    sorted_tokens: bool = False,
) -> DataFrame:
    """Multi-pass blocking keys: one row per (record, pass) with a
    prefixed key so the passes never collide with each other.
    Output: (id_col, name_col, ``bkey``).

    ``sorted_tokens=True`` adds a third family — the first
    ``key_len`` chars of the whitespace-tokenized, lexicographically
    sorted, space-rejoined name ("s:" prefix) — so word-order
    transpositions ("ACME Corp" / "Corp ACME") land in one block,
    which neither the head nor the tail substring key can do (both
    are invalidated at once by a transposition)."""
    name = F.col(name_col)
    head = F.concat(F.lit("h:"), F.substring(name, 1, key_len))
    tail = F.concat(
        F.lit("t:"),
        F.substring(
            name,
            F.greatest(F.length(name) - F.lit(key_len - 1), F.lit(1)),
            F.lit(key_len),
        ),
    )
    base = records.select(id_col, name_col)
    out = base.select(id_col, name_col, head.alias("bkey")).unionByName(
        base.select(id_col, name_col, tail.alias("bkey"))
    )
    if sorted_tokens:
        skey = F.concat(
            F.lit("s:"),
            F.substring(
                F.array_join(
                    F.array_sort(
                        F.filter(
                            F.split(name, r"\s+"), lambda x: x != ""
                        )
                    ),
                    " ",
                ),
                1,
                key_len,
            ),
        )
        out = out.unionByName(base.select(id_col, name_col, skey.alias("bkey")))
    return out


def candidate_pairs(
    records: DataFrame,
    *,
    id_col: str = "rec_id",
    name_col: str = "name",
    key_len: int = 12,
    max_block: int | None = 1024,
    sorted_tokens: bool = False,
) -> DataFrame:
    """Distinct candidate pairs (id_a < id_b) sharing at least one
    blocking key, names carried along: (id_a, id_b, name_a, name_b).

    ``max_block`` caps each block deterministically (keep the
    ``max_block`` smallest ids) before pairing — bounded recall loss,
    hard quadratic ceiling per block. The cap is ON BY DEFAULT
    (1024): a short ``key_len`` or a skewed name distribution (every
    record starting "The ") otherwise degenerates to unbounded
    quadratic pair generation inside the hot block — the exact
    failure mode ``dedup.minhash_candidate_pairs(max_bucket=...)``
    defends against. Pass ``max_block=None`` to opt out explicitly
    when the key design provably bounds blocks."""
    keys = blocking_keys(
        records,
        id_col=id_col,
        name_col=name_col,
        key_len=key_len,
        sorted_tokens=sorted_tokens,
    )
    if max_block is not None:
        w = Window.partitionBy("bkey").orderBy(F.col(id_col))
        keys = (
            keys.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") <= max_block)
            .drop("__rn")
        )
    left = keys.select(
        F.col("bkey"),
        F.col(id_col).alias("id_a"),
        F.col(name_col).alias("name_a"),
    )
    right = keys.select(
        F.col("bkey"),
        F.col(id_col).alias("id_b"),
        F.col(name_col).alias("name_b"),
    )
    return (
        left.join(right, "bkey")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "name_a", "name_b")
        .distinct()
    )


def score_pairs(
    pairs: DataFrame,
    *,
    name_a: str = "name_a",
    name_b: str = "name_b",
    sim_col: str = "sim",
) -> DataFrame:
    """Normalised edit similarity per candidate pair:
    ``1 - levenshtein/max(len)`` rounded to 6dp (the catalog's shared
    float convention). Keeps (id_a, id_b, sim)."""
    sim = F.round(
        F.lit(1.0)
        - F.levenshtein(F.col(name_a), F.col(name_b)).cast("double")
        / F.greatest(
            F.length(name_a), F.length(name_b), F.lit(1)
        ).cast("double"),
        6,
    )
    return pairs.select("id_a", "id_b", sim.alias(sim_col))


def link_records(
    records: DataFrame,
    *,
    id_col: str = "rec_id",
    name_col: str = "name",
    key_len: int = 12,
    max_block: int | None = 1024,
    sorted_tokens: bool = False,
    threshold: float = 0.9,
) -> DataFrame:
    """End-to-end match-pair generation: blocking -> scoring ->
    threshold. Output: (id_a, id_b, sim) with sim >= threshold.
    ``max_block`` defaults to the 1024 skew cap (see
    :func:`candidate_pairs`); pass None to opt out explicitly."""
    cand = candidate_pairs(
        records,
        id_col=id_col,
        name_col=name_col,
        key_len=key_len,
        max_block=max_block,
        sorted_tokens=sorted_tokens,
    )
    return score_pairs(cand).where(F.col("sim") >= threshold)


def resolve_entities(
    records: DataFrame,
    matches: DataFrame,
    *,
    id_col: str = "rec_id",
    name_col: str = "name",
) -> DataFrame:
    """Entities from match pairs: transitive closure (connected
    components, entity_id = min record id in the component; unmatched
    records form singleton entities) plus survivorship — the
    canonical record per entity is the longest name, ties to the
    smallest record id (the most complete record wins, as in classic
    master-data survivorship rules).

    Output: (entity_id, n_records, canonical_rec_id, canonical_name).
    """
    comp = duplicate_clusters(matches).select(
        F.col("doc_id").alias(id_col),
        F.col("cluster_id").alias("entity_id"),
    )
    assigned = (
        records.select(id_col, name_col)
        .join(comp, id_col, "left")
        .select(
            F.col(id_col),
            F.col(name_col),
            F.coalesce("entity_id", F.col(id_col)).alias("entity_id"),
        )
    )
    w = Window.partitionBy("entity_id").orderBy(
        F.length(name_col).desc(), F.col(id_col)
    )
    ranked = assigned.withColumn("__rn", F.row_number().over(w))
    return ranked.groupBy("entity_id").agg(
        F.count(F.lit(1)).alias("n_records"),
        F.max(F.when(F.col("__rn") == 1, F.col(id_col))).alias(
            "canonical_rec_id"
        ),
        F.max(F.when(F.col("__rn") == 1, F.col(name_col))).alias(
            "canonical_name"
        ),
    )
