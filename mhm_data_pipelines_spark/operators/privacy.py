"""Privacy / governance operators: k-anonymity (+ l-diversity) risk
reporting and differentially-private noisy counts.

Domain extension of the reference's subject-level data handling (the
GDPR right-to-erasure path in ``operators.upsert.erase_subjects``
covers deletion; these cover DISCLOSURE review): before a table
derived from per-participant events is shared outside the enclave, a
release board asks (a) how re-identifiable is it — the k-anonymity /
l-diversity report (Sweeney 2002; Machanavajjhala et al. 2007), and
(b) can we publish aggregate counts at all — the ε-DP Laplace
mechanism (Dwork et al. 2006), seeded here so releases are replayable.

Scale design:
* ``k_anonymity_report`` is ONE hash aggregate over the
  quasi-identifier key (map-side partials, no sort) followed by a
  single-row re-aggregate of the class table — the class table is
  never collected and never joined back to the corpus.
* ``dp_noisy_counts`` is one hash aggregate plus a pure-projection
  noise column: the Laplace draw derives from
  ``sampling.md5_unit_draw`` (60 bits of md5 over "<key>:<seed>"), so
  the release is bit-reproducible in any engine with md5 and adds
  ZERO shuffles beyond the count itself. True counts are withheld
  unless ``include_true=True`` (debugging/verification only — keeping
  them would defeat the mechanism).

Determinism caveat (documented, deliberate): a seeded draw is a
replayable SIMULATION of the Laplace mechanism — replaying with the
same seed yields the same noise, so the formal ε guarantee holds only
per-seed-release. Rotate seeds across releases; never re-release the
same groups under multiple seeds (sequential composition applies).
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from mhm_data_pipelines_spark.operators.sampling import md5_unit_draw


def k_anonymity_classes(
    df: DataFrame,
    quasi_cols: Sequence[str],
    sensitive_col: str | None = None,
) -> DataFrame:
    """Equivalence-class table over the quasi-identifier columns:
    one row per distinct quasi-identifier combination with its row
    count ``n`` and (when ``sensitive_col`` is given) the number of
    distinct sensitive values ``n_sensitive`` inside the class.

    NULL is a quasi-identifier value like any other (a published NULL
    cell narrows identity exactly as a real value does), so the
    grouping keeps NULL groups — matching SQL ``GROUP BY`` semantics
    in every engine.

    One hash aggregate; partial (map-side) combine applies to both
    ``count`` and the distinct-count (Spark plans countDistinct as a
    two-phase expand-agg) — no row sorts, no joins.
    """
    if not quasi_cols:
        raise ValueError("quasi_cols must be non-empty")
    aggs = [F.count(F.lit(1)).alias("n")]
    if sensitive_col is not None:
        aggs.append(
            F.countDistinct(F.col(sensitive_col)).alias("n_sensitive")
        )
    return df.groupBy(*[F.col(c) for c in quasi_cols]).agg(*aggs)


def k_anonymity_report(
    df: DataFrame,
    quasi_cols: Sequence[str],
    sensitive_col: str | None = None,
    k: int = 5,
    l: int = 2,  # noqa: E741 - l is the literature's name (l-diversity)
) -> DataFrame:
    """One-row k-anonymity / l-diversity release-risk report.

    Columns: ``n_rows``, ``n_classes``, ``k_anonymity`` (the minimum
    equivalence-class size — the table is k-anonymous for exactly this
    k), ``rows_below_k`` / ``classes_below_k`` (re-identification
    exposure at the requested ``k``), ``pct_below_k`` (share of rows
    at risk, 6dp), and — when ``sensitive_col`` is given —
    ``l_diversity`` (minimum distinct sensitive values per class) and
    ``classes_below_l`` (homogeneity-attack exposure: classes where
    every row shares ≤ l−1 sensitive values).

    Scale shape: the class table from :func:`k_anonymity_classes`
    (already one aggregate) re-aggregates to a single row; the report
    never touches the corpus a second time.
    """
    classes = k_anonymity_classes(df, quasi_cols, sensitive_col)
    below = F.col("n") < F.lit(int(k))
    aggs = [
        F.sum("n").cast("long").alias("n_rows"),
        F.count(F.lit(1)).alias("n_classes"),
        F.min("n").cast("long").alias("k_anonymity"),
        F.sum(F.when(below, F.col("n")).otherwise(F.lit(0)))
        .cast("long")
        .alias("rows_below_k"),
        F.count(F.when(below, F.lit(1))).alias("classes_below_k"),
    ]
    if sensitive_col is not None:
        aggs.extend(
            [
                F.min("n_sensitive").cast("long").alias("l_diversity"),
                F.count(
                    F.when(F.col("n_sensitive") < F.lit(int(l)), F.lit(1))
                ).alias("classes_below_l"),
            ]
        )
    rep = classes.agg(*aggs)
    return rep.withColumn(
        "pct_below_k",
        F.round(
            F.col("rows_below_k") / F.col("n_rows"), 6
        ),
    )


def laplace_noise(
    key: Column, scale: float, seed: int = 42
) -> Column:
    """Deterministic Laplace(0, ``scale``) draw keyed by ``key``:
    inverse-CDF transform of the unit draw
    ``u = md5_unit_draw(key, seed)`` —
    ``x = -scale * sign(u - 0.5) * ln(1 - 2|u - 0.5|)``.

    The ``greatest(1e-18, ·)`` clamp guards the measure-zero u=0 edge
    (ln 0) without disturbing any representable draw above it. Pure
    projection: no shuffle, engine-portable (the same expression runs
    verbatim in any SQL engine with md5/ln).
    """
    u = md5_unit_draw(key, seed)
    t = u - F.lit(0.5)
    mag = F.greatest(
        F.lit(1e-18), F.lit(1.0) - F.lit(2.0) * F.abs(t)
    )
    return F.lit(-float(scale)) * F.signum(t) * F.log(mag)


def dp_noisy_counts(
    df: DataFrame,
    group_cols: Sequence[str],
    epsilon: float = 1.0,
    seed: int = 42,
    include_true: bool = False,
) -> DataFrame:
    """Laplace-mechanism noisy group counts (sensitivity 1 for a
    count ⇒ scale 1/ε), with the noise draw seeded by the group key
    so a run is replayable and oracle-verifiable.

    **Privacy caveat — seeded mode is a SIMULATION, not a DP
    release.** The draw is a deterministic public function of the
    group key and ``seed``: anyone who knows (or can guess) the seed
    recomputes the noise and subtracts it, recovering the true counts
    exactly — zero differential privacy. The ε guarantee holds ONLY
    if the seed is secret, high-entropy, and used for a single
    release (treat it like key material). For any real release draw
    the seed from a CSPRNG (e.g. ``secrets.randbits(64)``), never the
    default, and never publish it; the default ``seed=42`` exists so
    verification harnesses and the DuckDB oracle can replay the run.
    Returns ``group_cols + (noisy_n,)`` (6dp); ``include_true=True``
    additionally emits the raw ``n`` — for verification harnesses
    only, never for release.

    NULL group values hash as the sentinel ``␀`` (U+2400; an explicit
    coalesce — ``concat_ws`` would otherwise SKIP nulls and give two
    distinct groups the same draw).

    Scale shape: one hash aggregate (map-side combine) + a pure
    projection for the noise — exactly the cost of the non-private
    count.
    """
    if not group_cols:
        raise ValueError("group_cols must be non-empty")
    if epsilon <= 0:
        raise ValueError("epsilon must be positive")
    counts = df.groupBy(*[F.col(c) for c in group_cols]).agg(
        F.count(F.lit(1)).alias("n")
    )
    key = F.concat_ws(
        "|",
        *[
            F.coalesce(F.col(c).cast("string"), F.lit("␀"))
            for c in group_cols
        ],
    )
    noisy = counts.withColumn(
        "noisy_n",
        F.round(F.col("n") + laplace_noise(key, 1.0 / float(epsilon), seed), 6),
    )
    if include_true:
        return noisy.select(*group_cols, "n", "noisy_n")
    return noisy.select(*group_cols, "noisy_n")


def entropy_l_diversity_classes(
    df: DataFrame,
    quasi_cols: Sequence[str],
    sensitive_col: str,
    l: float = 2.0,  # noqa: E741 - the literature's name
) -> DataFrame:
    """Entropy l-diversity per equivalence class (Machanavajjhala et
    al. 2007): distinct-count l-diversity (see
    :func:`k_anonymity_report`) is fooled by a class that is 99% one
    diagnosis plus a token second value — the ENTROPY criterion
    ``H(sensitive | class) ≥ ln(l)`` is not. Returns one row per
    quasi-identifier class: ``n``, ``n_sensitive``, ``entropy``
    (Shannon, nats, 6dp), ``effective_l`` (``exp(entropy)`` — the
    number of equally-likely values the class behaves as, 6dp) and
    ``meets_l``.

    NULL is a category of its own in BOTH the quasi-identifiers and
    the sensitive column (a published NULL narrows identity / reveals
    absence exactly like a value; note this differs from
    ``k_anonymity_classes``' ``countDistinct``, which skips NULL).

    Scale shape: two hash aggregates — corpus → (class, sensitive
    value) counts → class rows; the entropy sum folds in the second
    aggregate. No joins, no windows, nothing collected.
    """
    if not quasi_cols:
        raise ValueError("quasi_cols must be non-empty")
    if l <= 1.0:
        raise ValueError(f"l must be > 1, got {l}")
    cells = df.groupBy(
        *[F.col(c) for c in quasi_cols], F.col(sensitive_col)
    ).agg(F.count(F.lit(1)).alias("_c"))
    w_n = F.sum("_c")
    # -sum(p ln p) assembled from sums computable in ONE aggregate:
    # H = ln(n) - sum(c ln c)/n  (exact algebra, no per-row p column)
    ent = F.log(w_n) - F.sum(F.col("_c") * F.log("_c")) / w_n
    out = cells.groupBy(*[F.col(c) for c in quasi_cols]).agg(
        w_n.cast("long").alias("n"),
        F.count(F.lit(1)).alias("n_sensitive"),
        F.round(ent, 6).alias("entropy"),
        F.round(F.exp(ent), 6).alias("effective_l"),
    )
    # Compared on the same 6dp grid the entropy is reported on — the
    # raw float H of an exactly-uniform class sits one ulp under ln(l)
    # and would fail the unrounded comparison spuriously.
    return out.withColumn(
        "meets_l", F.col("entropy") >= F.lit(round(math.log(l), 6))
    )


def t_closeness_report(
    df: DataFrame,
    quasi_cols: Sequence[str],
    bucket_col: str,
    n_buckets: int,
    t: float = 0.2,
) -> DataFrame:
    """t-closeness per equivalence class (Li, Li & Venkatasubramanian,
    ICDE 2007) for an ORDERED sensitive attribute: l-diversity
    (:func:`entropy_l_diversity_classes`) counts values but ignores
    their ORDER — a salary class spread over {1k, 2k, 3k} and one over
    {1k, 50k, 100k} look identical to it. t-closeness bounds the Earth
    Mover's Distance between each class's sensitive distribution P and
    the GLOBAL distribution Q on the ordered axis:

        ``EMD(P, Q) = Σ_i |Σ_{j≤i} (p_j − q_j)| / (m − 1)``

    (the equal-ground-distance form of the paper's ordered-attribute
    metric, m = number of buckets).

    Contract: the sensitive attribute arrives PRE-BUCKETED as an
    integer in ``[0, n_buckets)`` (the caller owns the binning — same
    division of labor as ``histogram_counts``). Rows with a NULL or
    out-of-range bucket are excluded from BOTH distributions (they
    have no position on the ordered axis); class totals are taken
    over in-range rows so each P still sums to 1.

    Scale shape: two hash aggregates build (class, bucket) and global
    bucket counts; each class's bucket grid is densified by exploding
    a LITERAL ``sequence(0, n_buckets−1)`` per class row — no
    class×bucket cross join, no data-sized window (the cumulative sum
    partitions by class over exactly ``n_buckets`` rows). The global
    bucket table (≤ n_buckets rows) attaches via broadcast equi-join.

    Returns one row per class: quasi cols, ``n``, ``emd`` (6dp),
    ``meets_t`` (compared on the same 6dp grid, as in
    :func:`entropy_l_diversity_classes`).
    """
    if not quasi_cols:
        raise ValueError("quasi_cols must be non-empty")
    if n_buckets < 2:
        raise ValueError(f"n_buckets must be >= 2, got {n_buckets}")
    if not 0.0 < t <= 1.0:
        raise ValueError(f"t must be in (0, 1], got {t}")
    q = [F.col(c) for c in quasi_cols]
    bkt = F.col(bucket_col).cast("long")
    base = df.filter(
        bkt.isNotNull() & (bkt >= 0) & (bkt < n_buckets)
    ).select(*q, bkt.alias("_b"))
    cls_bkt = base.groupBy(*q, F.col("_b")).agg(
        F.count(F.lit(1)).alias("_c")
    )
    cls = cls_bkt.groupBy(*q).agg(F.sum("_c").alias("_n"))
    glob = base.groupBy("_b").agg(F.count(F.lit(1)).alias("_g"))
    glob_tot = F.sum("_g").over(Window.partitionBy())
    glob_p = glob.select(
        "_b", (F.col("_g").cast("double") / glob_tot).alias("_q")
    )
    grid = cls.select(
        *q,
        "_n",
        F.explode(
            F.sequence(F.lit(0), F.lit(int(n_buckets) - 1))
        ).alias("_b0"),
    ).select(*q, "_n", F.col("_b0").cast("long").alias("_b"))
    # null-safe equality on the quasi keys: a class keyed by a NULL
    # QI value is a REAL equivalence class (same stance as
    # entropy_l_diversity_classes); a plain equality join would never
    # match its own bucket counts and report the EMD of an empty
    # distribution.
    g_al = grid.alias("_g")
    c_al = cls_bkt.alias("_cb")
    cond = F.col("_g._b") == F.col("_cb._b")
    for c in quasi_cols:
        cond = cond & F.col(f"_g.{c}").eqNullSafe(F.col(f"_cb.{c}"))
    filled = (
        g_al.join(c_al, cond, "left")
        .select(
            *[F.col(f"_g.{c}") for c in quasi_cols],
            F.col("_g._n").alias("_n"),
            F.col("_g._b").alias("_b"),
            F.col("_cb._c").alias("_c"),
        )
        .join(F.broadcast(glob_p), "_b", "left")
        .select(
            *q,
            "_n",
            "_b",
            (
                F.coalesce(F.col("_c"), F.lit(0)).cast("double")
                / F.col("_n")
                - F.coalesce(F.col("_q"), F.lit(0.0))
            ).alias("_diff"),
        )
    )
    w = (
        Window.partitionBy(*q)
        .orderBy("_b")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    emd = (
        filled.withColumn("_cum", F.sum("_diff").over(w))
        .groupBy(*q)
        .agg(
            F.max("_n").cast("long").alias("n"),
            F.round(
                F.sum(F.abs(F.col("_cum"))) / (int(n_buckets) - 1), 6
            ).alias("emd"),
        )
    )
    return emd.withColumn("meets_t", F.col("emd") <= F.lit(round(t, 6)))
