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

Scale notes: candidates shuffle ONCE on the variant string into a
per-bucket member-array aggregate (pairs explode locally from the
sorted array — never all-pairs, and no second self-join shuffle).
Very common variants (shared prefixes of sequential ids) fatten
buckets; the equal-length pre-filter cuts most of the quadratic
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
    # Candidate pairs per variant bucket WITHOUT a self-join: ONE
    # collect_list hash aggregate per variant builds the sorted
    # (id, len) member array and C(m,2) pairs explode locally — the
    # former two-sided self-equi-join on the variant string paid a
    # second shuffle of the exploded frame for the identical pair
    # multiset. |len(a) - len(b)| <= k (implied by ed <= k) prunes
    # fat-bucket pairs before the distinct, as before. The member
    # array carries only (id, len) — narrow — and its length is the
    # bucket size the cap already governs.
    def _bucket_pairs(frame: DataFrame) -> DataFrame:
        return (
            frame.groupBy("_var")
            .agg(
                F.sort_array(
                    F.collect_list(F.struct(F.col(id_col), F.col("_len")))
                ).alias("ms")
            )
            .select("ms", F.posexplode("ms").alias("_i", "x"))
            .select(
                "x",
                F.explode(
                    F.expr("slice(ms, _i + 2, size(ms))")
                ).alias("y"),
            )
            .filter(F.abs(F.col("x._len") - F.col("y._len")) <= k)
            # Duplicate-id inputs put the same id in a bucket twice and
            # the sorted member array would pair it with itself (dist 0
            # passes the verify) — the old self-join's `a.id < b.id`
            # excluded that structurally; the sort guarantees x <= y,
            # so one != filter restores the id_a < id_b contract.
            .filter(F.col(f"x.{id_col}") != F.col(f"y.{id_col}"))
            .select(
                F.col(f"x.{id_col}").alias("id_a"),
                F.col(f"y.{id_col}").alias("id_b"),
            )
        )

    if max_bucket_size is None:
        cands = _bucket_pairs(ex).distinct()
    else:
        # The exploded variant frame feeds the cap's count/anti/semi
        # subtrees and the pair aggregate — materialize once.
        ex = ex.localCheckpoint(eager=False)
        cold, star = _split_hot_buckets(ex, ["_var"], id_col, max_bucket_size)
        cands = (
            _bucket_pairs(cold)
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
