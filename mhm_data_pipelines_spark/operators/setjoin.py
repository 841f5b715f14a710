"""Exact set-similarity joins with candidate pruning — the AllPairs /
PPJoin family (Bayardo et al., WWW'07; Xiao et al., WWW'08).

No reference counterpart (north-star extension per BASELINE.json):
these are the exact-verification companions to the MinHash/SimHash
probabilistic path in :mod:`..operators.dedup` — same (id, token-set)
inputs, but a LOSSLESS candidate filter, so the output equals the
brute-force all-pairs join at a fraction of its cost.

Scale shape (the whole point at 100 TB):
- the naive all-pairs join is |D|² verifications; blocking by a
  metadata column (the ``unigram_jaccard_pairs`` shape) only divides
  by the block count;
- prefix filtering orders every token set by GLOBAL document
  frequency (rarest first) and joins only on each set's short prefix
  — two docs can reach Jaccard ≥ t only if their prefixes intersect,
  so the candidate join runs on rare-token postings (short lists)
  instead of the full corpus;
- everything is builtin Column expressions: one explode + hash-agg
  for document frequencies, one per-id sort agg, one equi-join on
  prefix tokens with the length filter folded into the join
  condition, one verify join. No Python in the row loop, no window
  over a global ordering.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "prefix_jaccard_pairs",
    "containment_pairs",
    "sorted_neighborhood_pairs",
]


def _freq_ordered(df: DataFrame, id_col: str, tokens_col: str) -> DataFrame:
    """(id, toks) → (id, toks ordered rarest-first, set_len).

    The global order is (document-frequency asc, token asc) — total and
    deterministic, so both sides of the self-join agree on every
    prefix. One explode + one hash agg + one join + one per-id agg;
    the frequency table is vocabulary-sized (≪ corpus at scale) and
    flows through an ordinary shuffle join (broadcast if small, SMJ
    co-partitioned on ``tok`` otherwise — AQE's call)."""
    tok = df.select(
        id_col, F.explode(F.array_distinct(F.col(tokens_col))).alias("tok")
    )
    dfreq = tok.groupBy("tok").agg(F.count("*").alias("df"))
    return (
        tok.join(dfreq, "tok")
        .groupBy(id_col)
        .agg(F.array_sort(F.collect_list(F.struct("df", "tok"))).alias("st"))
        .select(
            id_col,
            F.transform("st", lambda s: s["tok"]).alias("toks"),
            F.size("st").alias("set_len"),
        )
    )


def _int_threshold_ge(
    inter: Column, denom: Column, threshold_pct: int
) -> Column:
    """inter / denom >= threshold_pct/100, in exact integer arithmetic —
    no float-boundary disagreement between engines."""
    return inter * 100 >= threshold_pct * denom


def prefix_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    tokens_col: str = "toks",
    threshold_pct: int = 80,
) -> DataFrame:
    """All pairs (id_a < id_b) with token-set Jaccard ≥ threshold, found
    via prefix filtering — EXACT: equals the brute-force all-pairs
    self-join, proven by the DuckDB brute-force oracle on the
    ``prefix_jaccard_pairs`` gate query.

    Prefix length for Jaccard t is ``|x| - ceil(t·|x|) + 1``: if two
    sets share NO token in either prefix (under one global token
    order), their overlap is < the minimum that Jaccard ≥ t requires,
    so joining on prefix tokens alone loses nothing. The length filter
    ``t·|a| ≤ |b| ∧ t·|b| ≤ |a]`` rides inside the join condition.

    ``threshold_pct`` is an integer percentage so the final verify
    compares ``100·|∩| ≥ pct·|∪|`` in exact integer arithmetic.

    Returns (id_a, id_b, inter_len, union_len, jaccard rounded 4)."""
    t = threshold_pct
    ordered = _freq_ordered(df, id_col, tokens_col)
    # ceil(t% · n) = (t·n + 99) div 100 in integers.
    plen = F.col("set_len") - F.floor(
        (F.lit(t) * F.col("set_len") + 99) / 100
    ).cast("int") + 1
    pref = ordered.select(
        F.col(id_col),
        "toks",
        "set_len",
        F.explode(F.slice("toks", F.lit(1), plen)).alias("ptok"),
    )
    a, b = pref.alias("a"), pref.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.ptok") == F.col("b.ptok"))
            & (F.col("a." + id_col) < F.col("b." + id_col))
            # length filter: t·|a| ≤ 100·|b| and t·|b| ≤ 100·|a|
            & (F.lit(t) * F.col("a.set_len") <= 100 * F.col("b.set_len"))
            & (F.lit(t) * F.col("b.set_len") <= 100 * F.col("a.set_len")),
        )
        .select(
            F.col("a." + id_col).alias("id_a"),
            F.col("b." + id_col).alias("id_b"),
        )
        .distinct()
    )
    # Verify: re-attach the ordered arrays (narrow — candidates only).
    oa = ordered.select(
        F.col(id_col).alias("id_a"), F.col("toks").alias("toks_a")
    )
    ob = ordered.select(
        F.col(id_col).alias("id_b"), F.col("toks").alias("toks_b")
    )
    inter = F.size(F.array_intersect("toks_a", "toks_b"))
    union = F.size(F.array_union("toks_a", "toks_b"))
    return (
        cand.join(oa, "id_a")
        .join(ob, "id_b")
        .select(
            "id_a",
            "id_b",
            inter.cast("long").alias("inter_len"),
            union.cast("long").alias("union_len"),
        )
        .filter(
            _int_threshold_ge(F.col("inter_len"), F.col("union_len"), t)
        )
        .withColumn(
            "jaccard",
            F.round(F.col("inter_len") / F.col("union_len"), 4),
        )
    )


def containment_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    tokens_col: str = "toks",
    threshold_pct: int = 90,
) -> DataFrame:
    """Directed token-set containment: pairs (id_a, id_b), a ≠ b, with
    ``|Ta ∩ Tb| / |Ta| ≥ threshold`` — "a is (mostly) contained in b",
    the quote/subset-detection primitive MinHash's symmetric Jaccard
    misses (a 50-word quote inside a 5000-word page has Jaccard ≈ 0.01
    but containment = 1.0).

    Candidate generation is the asymmetric prefix filter: the PROBE
    side (a) explodes only its prefix of length
    ``|a| - ceil(t·|a|) + 1`` (rarest-first global order — containment
    ≥ t forces ≥1 prefix token into the intersection); the INDEX side
    (b) explodes all tokens. The join therefore runs rare-probe-token
    × full-posting, never full × full; the verify join touches
    candidates only. Length filter: |b| ≥ t·|a| rides in the join.

    Exact — equals brute force (the gate oracle proves it).
    Returns (id_a, id_b, inter_len, len_a, containment rounded 4)."""
    t = threshold_pct
    ordered = _freq_ordered(df, id_col, tokens_col)
    plen = F.col("set_len") - F.floor(
        (F.lit(t) * F.col("set_len") + 99) / 100
    ).cast("int") + 1
    probe = ordered.select(
        F.col(id_col).alias("id_a"),
        F.col("set_len").alias("len_a"),
        F.explode(F.slice("toks", F.lit(1), plen)).alias("tok"),
    )
    index = ordered.select(
        F.col(id_col).alias("id_b"),
        F.col("set_len").alias("len_b"),
        F.explode("toks").alias("tok"),
    )
    cand = (
        probe.join(
            index,
            (probe["tok"] == index["tok"])
            & (probe["id_a"] != index["id_b"])
            # |b| ≥ t·|a| (the intersection can't exceed |b|)
            & (100 * index["len_b"] >= F.lit(t) * probe["len_a"]),
        )
        .select("id_a", "id_b")
        .distinct()
    )
    oa = ordered.select(
        F.col(id_col).alias("id_a"),
        F.col("toks").alias("toks_a"),
        F.col("set_len").alias("len_a"),
    )
    ob = ordered.select(
        F.col(id_col).alias("id_b"), F.col("toks").alias("toks_b")
    )
    inter = F.size(F.array_intersect("toks_a", "toks_b")).cast("long")
    return (
        cand.join(oa, "id_a")
        .join(ob, "id_b")
        .select("id_a", "id_b", inter.alias("inter_len"), "len_a")
        .filter(_int_threshold_ge(F.col("inter_len"), F.col("len_a"), t))
        .withColumn(
            "containment", F.round(F.col("inter_len") / F.col("len_a"), 4)
        )
    )


def sorted_neighborhood_pairs(
    df: DataFrame,
    id_col: str,
    order_by: list,
    window: int = 5,
) -> DataFrame:
    """Sorted-neighborhood blocking (Hernandez & Stolfo, SIGMOD'95):
    sort the corpus by a blocking key and emit every record pair whose
    ranks are within ``window`` of each other — the classic entity-
    resolution candidate generator when records lack clean join keys.

    ``order_by`` must be a TOTAL order (include a unique tiebreaker
    like the id) with non-null keys — ties would otherwise make the
    neighborhood engine-dependent.

    Scale shape: the global rank comes from
    :func:`..budget.running_total`'s two-phase distributed prefix sum
    (literal range boundaries + per-bucket offsets — NO single-task
    window over the corpus). Neighborhoods then join as an EQUI-join:
    each row is tagged with its rank block ``⌊rank/window⌋`` and probes
    its own and the next block (a 2× explode, not a theta-join), and
    the exact ``0 < rank_b − rank_a < window`` predicate rides inside
    the join condition. Output is ≤ N·(window−1) pairs by construction.

    Returns ``(id_a, id_b, rank_a, rank_b)`` with rank_a < rank_b
    (1-based ranks in the blocking order).
    """
    if window < 2:
        raise ValueError(f"window must be >= 2, got {window}")
    from mhm_data_pipelines_spark.operators.budget import running_total

    ranked = running_total(
        df.withColumn("_one", F.lit(1)),
        order_by=order_by,
        value_col="_one",
        out_col="_rank",
    ).select(F.col(id_col), F.col("_rank").alias("rank"))
    blk = F.floor((F.col("rank") - 1) / window)
    probe = ranked.select(
        F.col(id_col).alias("id_a"),
        F.col("rank").alias("rank_a"),
        F.explode(F.array(blk, blk + 1)).alias("_blk"),
    )
    index = ranked.select(
        F.col(id_col).alias("id_b"),
        F.col("rank").alias("rank_b"),
        blk.alias("_blk"),
    )
    return probe.join(
        index,
        (probe["_blk"] == index["_blk"])
        & (index["rank_b"] > probe["rank_a"])
        & (index["rank_b"] < probe["rank_a"] + window),
    ).select("id_a", "id_b", "rank_a", "rank_b")
