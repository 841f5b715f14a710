"""Fellegi-Sunter probabilistic record-linkage scoring.

Completes the entity-resolution stack: ``setjoin``/``fuzzy`` generate
candidate pairs (token/edit-distance blocking), ``components`` merges
accepted matches — this supplies the principled SCORE between the two
(Fellegi & Sunter 1969; Splink and RecordLinkage implement the same
model): per-field agreement weights ``log2(m/u)`` and disagreement
weights ``log2((1−m)/(1−u))``, summed over compare fields.

* ``u`` (chance-agreement probability of two RANDOM records) is
  estimated exactly from the data: ``u_f = Σ_v (n_v/n)²`` over the
  field's non-null value frequencies — one tiny aggregate per field,
  no pair sampling.
* ``m`` (agreement probability among TRUE matches) requires labeled
  pairs or EM to estimate; it is a caller parameter (default 0.9, the
  conventional prior) — documented, deliberate: an unsupervised EM
  fit on synthetic candidates would manufacture precision the data
  cannot support.
* Missing values contribute NO evidence (weight 0) — the standard
  three-state treatment (agree / disagree / missing).

Scale design: candidates come from a BLOCKED self-equi-join (never
all-pairs — the ``setjoin`` discipline); the u-probability row is a
1-row broadcast; the per-pair score is a pure projection; the pattern
summary collapses to ≤ 3^k rows (k = #fields) via one hash aggregate,
so the output never scales with the pair count.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def u_probabilities(df: DataFrame, fields: Sequence[str]) -> DataFrame:
    """One-row frame of chance-agreement probabilities ``u_<field>``
    (6dp): for each field, the probability two random records agree —
    ``Σ_v (n_v / n)²`` over non-null value frequencies.

    One value-count aggregate + one single-row re-aggregate per field,
    unioned column-wise via a 1-row cross (all sides tiny).
    """
    if not fields:
        raise ValueError("fields must be non-empty")
    out = None
    for f in fields:
        counts = (
            df.filter(F.col(f).isNotNull())
            .groupBy(f)
            .agg(F.count(F.lit(1)).alias("c"))
        )
        u = counts.agg(
            F.round(
                F.sum(F.col("c") * F.col("c"))
                / (F.sum("c") * F.sum("c")),
                6,
            ).alias(f"u_{f}")
        )
        out = u if out is None else out.crossJoin(F.broadcast(u))
    return out


def _fs_state(av, bv):
    """Three-state agreement column: 1 agree, −1 disagree, 0 when
    either side is missing (no evidence)."""
    return (
        F.when(av.isNull() | bv.isNull(), F.lit(0))
        .when(av == bv, F.lit(1))
        .otherwise(F.lit(-1))
    )


def _fs_score(fields: Sequence[str], m: float, state_of) -> "F.Column":
    """Shared Fellegi-Sunter score fold — THE one place the weight
    expressions live, so the record-pair and profile-lifted paths
    (and any future caller) stay provably identical.

    Numeric discipline: ``u6`` (the 6dp-rounded u) is clamped at 1e-6
    on BOTH sides — a near-unique field rounds u6 to 0.0 (agree-side
    divide-by-zero) exactly as a near-constant field rounds it to 1.0
    (disagree-side); a bare division would give NULL in Spark vs IEEE
    ±inf in an oracle engine. ``1−m`` is a 9dp-rounded literal floored
    at 1e-9 (0.1 not 0.09999999999999998; and m within 5e-10 of 1
    must not round the numerator to an invalid 0.0).
    """
    one_minus_m = max(round(1.0 - float(m), 9), 1e-9)
    score = F.lit(0.0)
    for f in fields:
        u6 = F.greatest(F.lit(1e-6), F.col(f"u_{f}"))
        w_agree = F.round(F.log2(F.lit(float(m)) / u6), 6)
        w_disagree = F.round(
            F.log2(
                F.lit(one_minus_m)
                / F.greatest(F.lit(1e-6), F.lit(1.0) - F.col(f"u_{f}"))
            ),
            6,
        )
        state = state_of(f)
        score = score + (
            F.when(state == 1, w_agree)
            .when(state == -1, w_disagree)
            .otherwise(F.lit(0.0))
        )
    return F.round(score, 6)


def fs_pair_scores(
    df: DataFrame,
    id_col: str,
    block_cols: Sequence[str],
    fields: Sequence[str],
    m: float = 0.9,
) -> DataFrame:
    """Per-candidate-pair Fellegi-Sunter match score over blocked
    pairs: a self-equi-join on ``block_cols`` (``id_a < id_b`` halves
    the space), one three-state column per compare field
    (``s_<field>``: 1 agree, −1 disagree, 0 either-side-missing), and
    ``score`` = Σ per-field weights from the data-estimated ``u`` and
    the supplied ``m``:
    agree → ``log2(m/u)``, disagree → ``log2((1−m)/(1−u))``,
    missing → 0. Weights derive from the ROUNDED u (6dp) and are
    rounded 6dp before summing (cross-engine round-before-derive).

    Blocking keys with NULLs don't pair (SQL equi-join semantics) —
    exactly what a blocking pass should do with an unknown key.
    """
    if not 0.0 < m < 1.0:
        raise ValueError("m must be in (0, 1)")
    u_row = u_probabilities(df, fields)
    a = df.select(
        F.col(id_col).alias("id_a"),
        *[F.col(c).alias(f"bk_{c}") for c in block_cols],
        *[F.col(f).alias(f"a_{f}") for f in fields],
    )
    b = df.select(
        F.col(id_col).alias("id_b"),
        *[F.col(c).alias(f"bk_{c}") for c in block_cols],
        *[F.col(f).alias(f"b_{f}") for f in fields],
    )
    pairs = a.join(b, [f"bk_{c}" for c in block_cols]).filter(
        F.col("id_a") < F.col("id_b")
    )
    pairs = pairs.crossJoin(F.broadcast(u_row))
    states = [
        _fs_state(F.col(f"a_{f}"), F.col(f"b_{f}")).alias(f"s_{f}")
        for f in fields
    ]
    score = _fs_score(
        fields, m, state_of=lambda f: _fs_state(
            F.col(f"a_{f}"), F.col(f"b_{f}")
        )
    )
    return pairs.select(
        "id_a",
        "id_b",
        *states,
        score.alias("score"),
        *[F.col(f"u_{f}") for f in fields],
    )


def fs_pattern_summary(
    df: DataFrame,
    id_col: str,
    block_cols: Sequence[str],
    fields: Sequence[str],
    m: float = 0.9,
) -> DataFrame:
    """Agreement-pattern roll-up: one row per distinct (s_field…)
    pattern with its pair count and score — ≤ 3^k rows regardless of
    pair volume, the form a linkage reviewer thresholds on (and the
    form that stays oracle-hashable when the pair table runs to
    millions).

    The summary needs no record ids, so it NEVER materializes record
    pairs: records collapse to value PROFILES (block + field tuple)
    with multiplicities, and the blocked self-join runs over profiles
    — ``n_a·n_b`` pairs per cross-profile row, ``C(n,2)`` per
    same-profile diagonal row. Candidate volume drops from
    O(N²/block) to O(P²/block) where P is bounded by the value-combo
    space however large the corpus grows (the algebraic lift that
    keeps this runnable at 100 TB; :func:`fs_pair_scores` remains the
    per-pair path when ids are needed). Identical output to rolling
    up :func:`fs_pair_scores` — tested, and the gate oracle scores
    record pairs directly.

    ``id_col`` is unused by the lifted plan (kept for signature
    parity with :func:`fs_pair_scores`).
    """
    if not 0.0 < m < 1.0:
        raise ValueError("m must be in (0, 1)")
    from pyspark.sql import Window

    u_row = u_probabilities(df, fields)
    bks = [f"bk_{c}" for c in block_cols]
    # NULL blocking keys never pair in the record-pair path (equi-join
    # semantics) — drop them BEFORE profiling, or the diagonal would
    # count same-profile pairs inside NULL blocks that
    # fs_pair_scores never generates. (u_probabilities still sees the
    # whole frame, exactly like the record-pair path.)
    blocked = df
    for c in block_cols:
        blocked = blocked.filter(F.col(c).isNotNull())
    prof = (
        blocked.groupBy(
            *[F.col(c).alias(f"bk_{c}") for c in block_cols],
            *[F.col(f) for f in fields],
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # Deterministic within-block profile id so each unordered profile
    # pair is emitted once (a P-row window, never the corpus).
    wpid = Window.partitionBy(*bks).orderBy(
        *[F.col(f).asc_nulls_first() for f in fields]
    )
    prof = prof.withColumn(
        "pid", F.row_number().over(wpid)
    ).localCheckpoint(eager=False)
    a = prof.select(
        *bks,
        F.col("pid").alias("pid_a"),
        F.col("n").alias("n_a"),
        *[F.col(f).alias(f"a_{f}") for f in fields],
    )
    b = prof.select(
        *bks,
        F.col("pid").alias("pid_b"),
        F.col("n").alias("n_b"),
        *[F.col(f).alias(f"b_{f}") for f in fields],
    )
    cross = (
        a.join(b, bks)
        .filter(F.col("pid_a") < F.col("pid_b"))
        .select(
            (F.col("n_a") * F.col("n_b")).alias("n_pairs"),
            *[
                _fs_state(
                    F.col(f"a_{f}"), F.col(f"b_{f}")
                ).alias(f"s_{f}")
                for f in fields
            ],
        )
    )
    # Same-profile diagonal: C(n,2) pairs; identical values agree,
    # NULL = NULL is still MISSING (no evidence), exactly as in the
    # record-pair path.
    diag = prof.filter(F.col("n") >= 2).select(
        (F.col("n") * (F.col("n") - 1) / 2).cast("long").alias(
            "n_pairs"
        ),
        *[
            F.when(F.col(f).isNull(), F.lit(0))
            .otherwise(F.lit(1))
            .alias(f"s_{f}")
            for f in fields
        ],
    )
    pairs = cross.unionByName(diag).crossJoin(F.broadcast(u_row))
    score = _fs_score(fields, m, state_of=lambda f: F.col(f"s_{f}"))
    state_cols = [f"s_{f}" for f in fields]
    return (
        pairs.withColumn("score", score)
        .groupBy(*state_cols, "score")
        .agg(F.sum("n_pairs").cast("long").alias("n_pairs"))
        .select(*state_cols, "n_pairs", "score")
    )


def blocked_pair_sample(
    df: DataFrame,
    block_cols: Sequence[str],
    id_col: str = "doc_id",
    k: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Bounded, deterministic candidate-pair sample per block — the
    budgeted pair generator for review/labeling workflows (the labeled
    pairs Fellegi-Sunter's ``m`` estimation and clerical review need;
    Splink's ``estimate_m_from_pairwise_labels`` consumes exactly this
    shape).

    Why it exists: emit-all-pairs candidate generation is OUTPUT-bound
    when blocks hold genuine duplicate mass — a 2.5k-member block
    yields ~3M pairs (measured: the sf1 probes of embedding_neardup /
    image_phash_neardup are 88-112x wall on 10x data purely from pair
    materialization). This operator bounds emission at
    ``C(k,2)`` pairs per block while still reporting the TRUE mass:
    each row carries ``n_block`` (members) and ``pairs_total``
    (n·(n−1)/2), so downstream knows the sampling fraction exactly.

    Determinism: the k members kept per block are the k smallest by
    ``md5(id || ':' || seed)`` HEX-string order (lexicographic —
    replayable in any engine with md5, no float rank), ties broken by
    id; pairs are all C(≤k, 2) combinations among them.

    Scale shape: ONE shuffle by block (two window functions over the
    same partitioning: block size + md5 rank), then a self-equi-join
    of the ≤k-member sample with Exchange reuse on both sides —
    output is blocks x C(k,2) regardless of block sizes. Nothing
    ever materializes the full pair set.

    NULL block keys: rows whose block key is NULL never pair (the
    self-equi-join drops them — NULL ≠ NULL), matching SQL blocking
    semantics; coalesce to a sentinel upstream if NULL should be a
    real block.
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    from pyspark.sql import Window

    bc = [F.col(c) for c in block_cols]
    h = F.md5(
        F.concat(F.col(id_col).cast("string"), F.lit(f":{seed}"))
    )
    wn = Window.partitionBy(*bc)
    wr = Window.partitionBy(*bc).orderBy("h", id_col)
    kept = (
        df.select(*block_cols, id_col)
        .filter(F.col(id_col).isNotNull())
        .withColumn("h", h)
        .withColumn("n_block", F.count(F.lit(1)).over(wn))
        .withColumn("rn", F.row_number().over(wr))
        .filter((F.col("n_block") >= 2) & (F.col("rn") <= k))
    )
    a = kept.select(
        *block_cols,
        F.col(id_col).alias("id_a"),
        "n_block",
    )
    b = kept.select(*block_cols, F.col(id_col).alias("id_b"))
    return (
        a.join(b, list(block_cols))
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            *block_cols,
            "id_a",
            "id_b",
            "n_block",
            (F.col("n_block") * (F.col("n_block") - 1) / 2)
            .cast("long")
            .alias("pairs_total"),
        )
    )
