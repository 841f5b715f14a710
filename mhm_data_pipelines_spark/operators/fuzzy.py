"""Edit-distance (fuzzy) self-join — deletion-neighborhood blocking.

Record linkage over dirty text keys (near-identical names, typo'd
identifiers, OCR noise) needs "all pairs within Levenshtein distance
k" WITHOUT the O(n²) cross product. The FastSS / SymSpell family
observation (public, Bocek et al. 2007 "Fast Similarity Search in
Large Dictionaries"): if ``ed(a, b) <= k`` then deleting at most ``k``
characters from each side reaches a COMMON string — an edit script of
length ≤ k aligns all but ≤ k characters of ``a`` with all but ≤ k
characters of ``b``, and dropping the unaligned characters from both
sides leaves equal subsequences. Candidates are therefore an
equi-join on the deletion-variant string — the same
bucketed-candidates-then-exact-verify shape as every LSH emitter in
``operators.dedup``, and like them it is EXACT (full recall), not a
heuristic: the final ``levenshtein() <= k`` filter restores precision.

Variant generation is pure Column expressions (sequence + transform +
substring concat) — no Python in the hot path. Fan-out per string is
``1 + L`` at ``k=1`` and ``O(L²/2)`` at ``k=2`` (L = string length):
right-sized for keys (names, ids, titles ≤ ~64 chars), NOT for
documents — near-dup text at document scale is MinHash/SimHash
territory (``operators.dedup``).

Scale notes: the variant join shuffles on the variant string —
co-partitioned equi-join, never all-pairs. Very common variants
(shared prefixes of sequential ids) fatten buckets; the equal-length
pre-filter inside the join condition cuts most of the quadratic
bucket fan-out before the distinct, and ``max_bucket_size`` (same
star-edge cap as the LSH emitters via ``_split_hot_buckets``) bounds
adversarial buckets.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def deletion_variants(col: Column | str, k: int = 1) -> Column:
    """All strings reachable by deleting UP TO ``k`` characters
    (including the string itself), as a deduplicated array.

    Pure expressions: depth-``d`` variants are built by deleting one
    character from each depth-``d-1`` variant via
    ``sequence(1, len) -> transform -> concat(left, right)``.
    """
    if k < 0:
        raise ValueError(f"k must be >= 0, got {k}")
    c = F.col(col) if isinstance(col, str) else col
    frontier = F.array(c)
    out = frontier
    for _ in range(k):
        # One deletion applied to every string in the frontier.
        frontier = F.array_distinct(
            F.flatten(
                F.transform(
                    frontier,
                    lambda s: F.when(
                        F.length(s) > 0,
                        F.transform(
                            F.sequence(F.lit(1), F.length(s)),
                            lambda i: F.concat(
                                F.substring(s, F.lit(1), i - 1),
                                F.substring(
                                    s, i + 1, F.length(s) - i
                                ),
                            ),
                        ),
                    ).otherwise(F.array().cast("array<string>")),
                )
            )
        )
        out = F.array_distinct(F.concat(out, frontier))
    return out


def edit_distance_join(
    df: DataFrame,
    text_col: str = "name",
    id_col: str = "id",
    k: int = 1,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """All pairs with ``levenshtein(a, b) <= k`` — exact, via
    deletion-neighborhood candidate generation.

    Returns ``(id_a, id_b, dist)`` with ``id_a < id_b``. ``k`` is the
    maximum edit distance (1 or 2 are the practical values; fan-out
    grows O(L^k)). ``max_bucket_size``: cap pathological variant
    buckets into star edges (recall for capped buckets is via the
    min-id representative + connected components downstream, as in
    ``minhash_lsh_candidates``); star pairs still pass the exact
    distance filter, so precision is never affected.
    """
    from mhm_data_pipelines_spark.operators.dedup import _split_hot_buckets

    base = df.select(F.col(id_col), F.col(text_col).alias("_txt"))
    ex = base.select(
        id_col,
        F.length("_txt").alias("_len"),
        F.explode(deletion_variants(F.col("_txt"), k)).alias("_var"),
    )
    # |len(a) - len(b)| <= k is implied by ed <= k; folding it into the
    # join condition prunes fat variant buckets before the distinct
    # (the variant row carries only (id, len, variant) — the full text
    # re-attaches after dedup, so the shuffle payload stays narrow).
    pair_cond = (
        (F.col("a._var") == F.col("b._var"))
        & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        & (F.abs(F.col("a._len") - F.col("b._len")) <= k)
    )
    if max_bucket_size is None:
        a, b = ex.alias("a"), ex.alias("b")
        cands = (
            a.join(b, pair_cond)
            .select(
                F.col(f"a.{id_col}").alias("id_a"),
                F.col(f"b.{id_col}").alias("id_b"),
            )
            .distinct()
        )
    else:
        # The exploded variant frame feeds the cap's count/anti/semi
        # subtrees and both self-join sides — materialize once.
        ex = ex.localCheckpoint(eager=False)
        cold, star = _split_hot_buckets(ex, ["_var"], id_col, max_bucket_size)
        a, b = cold.alias("a"), cold.alias("b")
        cands = (
            a.join(b, pair_cond)
            .select(
                F.col(f"a.{id_col}").alias("id_a"),
                F.col(f"b.{id_col}").alias("id_b"),
            )
            .unionByName(star.select("id_a", "id_b"))
            .distinct()
        )
    ta = base.select(
        F.col(id_col).alias("id_a"), F.col("_txt").alias("_ta")
    )
    tb = base.select(
        F.col(id_col).alias("id_b"), F.col("_txt").alias("_tb")
    )
    dist = F.levenshtein("_ta", "_tb")
    return (
        cands.join(ta, "id_a")
        .join(tb, "id_b")
        .filter(dist <= k)
        .select("id_a", "id_b", dist.cast("int").alias("dist"))
    )
