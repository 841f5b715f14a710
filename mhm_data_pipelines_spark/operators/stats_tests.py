"""Exact two-sample / independence test statistics — KS, Mann-Whitney
U, chi-square.

No reference counterpart (north-star LLM-pipeline extension): the
question behind every data refresh is "did the distribution move?" —
new crawl vs old (lengths, quality scores), source A vs source B,
pre- vs post-filter. These are the standard answers: Kolmogorov-
Smirnov (any distributional difference), Mann-Whitney (location
shift, rank-based — heavy-tail-proof), chi-square (categorical
independence, e.g. source × language).

All three are EXACT over the full data, not sampled, and built so an
external SQL engine reproduces them value-for-value:

* KS: the ECDF gap needs cumulative counts over the VALUE order — the
  per-distinct-value count table goes through the two-phase
  distributed prefix sum (:func:`..budget.running_total`), so the raw
  rows are never globally sorted and no single-task window exists.
  ``D = max |cum_a/n_a − cum_b/n_b|`` evaluated at every distinct
  value (ECDFs only change there).
* Mann-Whitney: fractional (tie-averaged) ranks from the same
  prefix-sum machinery (shared with ``correlation.spearman_rho``);
  ``U = R_a − n_a(n_a+1)/2`` with the standard tie-corrected normal
  approximation — every sum is integers-or-halves, exact in doubles.
* chi-square: one contingency hash aggregate + margin aggregates
  joined back; ``Σ (o−e)²/e`` with ``e = row·col/N``.

Scale shape: everything reduces to per-value / per-category count
tables before any join — the data streams through hash aggregates
once; only metadata-sized tables shuffle afterwards.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "ks_test",
    "mann_whitney_u",
    "chi2_independence",
    "two_proportion_ztest",
    "poisson_bootstrap_ci",
    "POISSON1_CDF",
]


def ks_test(
    df: DataFrame,
    value_col: str,
    group_col: str,
    group_a,
    group_b,
    round_to: int = 6,
) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov D between ``group_a`` and
    ``group_b`` rows of ``value_col``.

    Returns one row ``(n_a, n_b, d_stat, ks_lambda)`` where
    ``ks_lambda = D · sqrt(n_a·n_b / (n_a+n_b))`` — the scaled
    statistic usually compared against 1.36 (α=0.05) / 1.63 (α=0.01);
    emitting λ instead of a p-value keeps the output free of
    transcendental-series evaluation differences across engines.
    NULL values are dropped; rows in neither group are ignored.
    """
    from mhm_data_pipelines_spark.operators.budget import running_total

    g = F.col(group_col)
    base = df.filter(
        F.col(value_col).isNotNull() & g.isin([group_a, group_b])
    ).select(
        F.col(value_col).cast("double").alias("v"),
        F.when(g == F.lit(group_a), 1).otherwise(0).alias("ia"),
        F.when(g == F.lit(group_b), 1).otherwise(0).alias("ib"),
    )
    per_val = base.groupBy("v").agg(
        F.sum("ia").alias("ca"), F.sum("ib").alias("cb")
    )
    cum_a = running_total(
        per_val, order_by=[("v", True)], value_col="ca", out_col="cum_a"
    ).select("v", "cum_a")
    cum_b = running_total(
        per_val, order_by=[("v", True)], value_col="cb", out_col="cum_b"
    ).select("v", "cum_b")
    totals = per_val.agg(
        F.sum("ca").cast("double").alias("n_a"),
        F.sum("cb").cast("double").alias("n_b"),
    )
    gap = F.abs(
        F.col("cum_a") / F.col("n_a") - F.col("cum_b") / F.col("n_b")
    )
    d = (
        cum_a.join(cum_b, "v")
        .crossJoin(F.broadcast(totals))  # single-row sample sizes
        .agg(
            F.max(gap).alias("d"),
            F.first("n_a").alias("n_a"),
            F.first("n_b").alias("n_b"),
        )
    )
    lam = F.col("d") * F.sqrt(
        F.col("n_a") * F.col("n_b") / (F.col("n_a") + F.col("n_b"))
    )
    return d.select(
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.round("d", round_to).alias("d_stat"),
        F.round(lam, round_to).alias("ks_lambda"),
    )


def mann_whitney_u(
    df: DataFrame,
    value_col: str,
    group_col: str,
    group_a,
    group_b,
    round_to: int = 6,
) -> DataFrame:
    """Exact Mann-Whitney U (Wilcoxon rank-sum) between two groups,
    fractional ranks with the standard tie-corrected normal z:

        ``U_a = R_a − n_a(n_a+1)/2``
        ``z = (U_a − n_a·n_b/2) / sqrt(n_a·n_b/12 · ((n+1) − T))``
        ``T = Σ(t³−t) / (n(n−1))``  over tie-group sizes t.

    Returns one row ``(n_a, n_b, u_a, u_b, z)``; z is NULL when the
    variance is zero (all values tied). Every intermediate sum is
    integers-or-halves — exact in doubles, order-independent.
    """
    g = F.col(group_col)
    base = df.filter(
        F.col(value_col).isNotNull() & g.isin([group_a, group_b])
    ).select(
        F.col(value_col).cast("double").alias("v"),
        F.when(g == F.lit(group_a), 1).otherwise(0).alias("ia"),
    )
    per_val = base.groupBy("v").agg(
        F.count("*").alias("t"), F.sum("ia").alias("ca")
    )
    from mhm_data_pipelines_spark.operators.budget import running_total

    cum = running_total(
        per_val, order_by=[("v", True)], value_col="t", out_col="cum"
    )
    # tie-averaged rank of every row with value v:
    # positions (cum−t+1)..cum → avg = cum − t/2 + 0.5
    ranked = cum.select(
        "v",
        "t",
        "ca",
        (
            F.col("cum").cast("double")
            - F.col("t").cast("double") / 2
            + F.lit(0.5)
        ).alias("r"),
    )
    agg = ranked.agg(
        F.sum("ca").cast("double").alias("n_a"),
        F.sum(F.col("t") - F.col("ca")).cast("double").alias("n_b"),
        F.sum(F.col("ca") * F.col("r")).alias("ra"),
        F.sum(
            F.col("t").cast("double") * F.col("t") * F.col("t")
            - F.col("t")
        ).alias("ties"),
    )
    n = F.col("n_a") + F.col("n_b")
    u_a = F.col("ra") - F.col("n_a") * (F.col("n_a") + 1) / 2
    u_b = F.col("n_a") * F.col("n_b") - u_a
    var = (
        F.col("n_a") * F.col("n_b") / 12.0
        * ((n + 1) - F.col("ties") / (n * (n - 1)))
    )
    z = F.when(var > 0, (u_a - F.col("n_a") * F.col("n_b") / 2) / F.sqrt(var))
    return agg.select(
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.round(u_a, round_to).alias("u_a"),
        F.round(u_b, round_to).alias("u_b"),
        F.round(z, round_to).alias("z"),
    )


def chi2_independence(
    df: DataFrame,
    x_col: str,
    y_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Pearson chi-square test of independence between two categorical
    columns: ``chi2 = Σ (o_xy − e_xy)² / e_xy`` with
    ``e_xy = row_x · col_y / N`` summed over OBSERVED cells plus the
    expected mass of empty cells (algebraically:
    ``chi2 = Σ_cells o²/e − N``, which needs no empty-cell
    enumeration — an r×c grid join would materialize cells the data
    never had). NULL categories are dropped.

    Returns one row ``(n, dof, chi2)`` with
    ``dof = (r−1)(c−1)``.
    """
    base = df.filter(
        F.col(x_col).isNotNull() & F.col(y_col).isNotNull()
    ).select(F.col(x_col).alias("x"), F.col(y_col).alias("y"))
    cells = base.groupBy("x", "y").agg(F.count("*").alias("o"))
    rows = cells.groupBy("x").agg(F.sum("o").alias("rx"))
    cols = cells.groupBy("y").agg(F.sum("o").alias("cy"))
    tot = cells.agg(
        F.sum("o").cast("double").alias("n"),
        F.count_distinct("x").alias("r"),
        F.count_distinct("y").alias("c"),
    )
    # Σ o²/e = N · Σ o²/(rx·cy); chi2 = that − N.
    term = (
        F.col("o").cast("double") * F.col("o")
        / (F.col("rx").cast("double") * F.col("cy"))
    )
    s = (
        cells.join(rows, "x")
        .join(cols, "y")
        .agg(F.sum(term).alias("s"))
    )
    return (
        s.crossJoin(F.broadcast(tot))  # single-row totals
        .select(
            F.col("n").cast("long").alias("n"),
            ((F.col("r") - 1) * (F.col("c") - 1)).cast("long").alias(
                "dof"
            ),
            F.round(F.col("n") * F.col("s") - F.col("n"), round_to).alias(
                "chi2"
            ),
        )
    )


def two_proportion_ztest(
    df: DataFrame,
    group_col: str,
    group_a,
    group_b,
    success_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Two-proportion z-test (pooled): did variant A convert at a
    different rate than variant B? — the A/B-readout companion to the
    distributional tests above.

        ``z = (p_a − p_b) / sqrt(p̂(1−p̂)(1/n_a + 1/n_b))``

    with ``p̂`` the pooled success rate. ``success_col`` is boolean (or
    0/1); NULL successes are dropped (an unresolved outcome is not a
    failure). Returns one row ``(n_a, n_b, p_a, p_b, risk_ratio, z)``
    — risk_ratio = p_a/p_b (NULL when p_b = 0); z NULL when the pooled
    variance is zero (all successes or all failures).

    One hash aggregate into two groups; every input to the final
    divisions is an integer count — bit-identical doubles everywhere.
    """
    g = F.col(group_col)
    base = df.filter(
        F.col(success_col).isNotNull() & g.isin([group_a, group_b])
    ).select(
        F.when(g == F.lit(group_a), 1).otherwise(0).alias("ia"),
        F.col(success_col).cast("int").alias("s"),
    )
    agg = base.agg(
        F.sum("ia").cast("double").alias("n_a"),
        F.sum(1 - F.col("ia")).cast("double").alias("n_b"),
        F.sum(F.col("ia") * F.col("s")).cast("double").alias("s_a"),
        F.sum((1 - F.col("ia")) * F.col("s")).cast("double").alias("s_b"),
    )
    p_a = F.col("s_a") / F.col("n_a")
    p_b = F.col("s_b") / F.col("n_b")
    pooled = (F.col("s_a") + F.col("s_b")) / (F.col("n_a") + F.col("n_b"))
    var = pooled * (1.0 - pooled) * (
        1.0 / F.col("n_a") + 1.0 / F.col("n_b")
    )
    z = F.when(var > 0, (p_a - p_b) / F.sqrt(var))
    return agg.select(
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.round(p_a, round_to).alias("p_a"),
        F.round(p_b, round_to).alias("p_b"),
        F.round(F.when(p_b > 0, p_a / p_b), round_to).alias("risk_ratio"),
        F.round(z, round_to).alias("z"),
    )


#: Poisson(λ=1) CDF F(k) for k = 0..8 as exact double literals — the
#: inverse-CDF thresholds for the Poisson bootstrap. P(X > 8) ≈ 1.1e-7;
#: draws past the table clamp to 9. The SAME literals are embedded in
#: every oracle twin (f-string), so the weight is an identical CASE
#: chain in both engines.
import math as _math

POISSON1_CDF: tuple[float, ...] = tuple(
    _math.exp(-1.0) * sum(1.0 / _math.factorial(i) for i in range(k + 1))
    for k in range(9)
)


def poisson_bootstrap_weight(u) -> F.Column:
    """Poisson(1) inverse CDF over a unit draw ``u`` — the per-(row,
    replicate) resampling weight of the Poisson bootstrap (the
    distributed approximation to multinomial resampling: at corpus
    scale n the multinomial's row coupling is unobtainable, Poisson(1)
    weights are independent per row and converge to the same law)."""
    w = F.when(u < F.lit(POISSON1_CDF[0]), F.lit(0))
    for k in range(1, len(POISSON1_CDF)):
        w = w.when(u < F.lit(POISSON1_CDF[k]), F.lit(k))
    return w.otherwise(F.lit(len(POISSON1_CDF)))


def poisson_bootstrap_ci(
    df: DataFrame,
    value_col: str,
    id_col: str,
    keys: list | None = None,
    n_boot: int = 200,
    seed: int = 42,
    alpha: float = 0.05,
    round_sums: int = 6,
) -> DataFrame:
    """Per-group bootstrap confidence interval for the MEAN of
    ``value_col`` — the Poisson bootstrap (the industry-standard
    distributed bootstrap: no global resampling pass, no row coupling):

    * every (row, replicate) pair draws a deterministic Poisson(1)
      weight from ``md5(id '#' replicate ':' seed)`` — the repo's one
      unit-draw construction (sampling.md5_unit_draw), so any engine
      with md5 replays the exact resample;
    * replicate means are ONE hash aggregate over the exploded frame
      (codegen explode feeds the aggregate — the ``n_boot``× row
      stream is never materialized);
    * the CI is the exact interpolated [α/2, 1−α/2] percentile of the
      ``n_boot`` replicate means (percentile = quantile_cont parity).

    Float discipline: per-replicate weighted sums round to
    ``round_sums`` digits before the division, so both engines derive
    replicate means from bit-identical doubles (the ivm_rollup/
    ols_trend convention). Replicates whose weights all landed 0 (only
    possible for tiny groups) yield NULL means, which the percentile
    ignores. Returns keys + (n, mean, ci_lo, ci_hi).

    Scale: work is ``n_boot × |rows|`` weight draws inside one
    projection + two hash aggregates — embarrassingly parallel, zero
    corpus shuffles beyond the group-by; tune ``n_boot`` to budget.
    """
    from mhm_data_pipelines_spark.operators.sampling import md5_unit_draw

    if not 0.0 < alpha < 1.0:
        raise ValueError(f"alpha must be in (0, 1), got {alpha}")
    if n_boot < 2:
        raise ValueError(f"n_boot must be >= 2, got {n_boot}")
    keys = list(keys or [])
    y = F.col(value_col).cast("double")
    base = df.filter(y.isNotNull()).select(
        *keys, F.col(id_col).alias("_id"), y.alias("_y")
    )
    reps = base.withColumn(
        "_b", F.explode(F.sequence(F.lit(0), F.lit(n_boot - 1)))
    )
    u = md5_unit_draw(
        F.concat(
            F.col("_id").cast("string"),
            F.lit("#"),
            F.col("_b").cast("string"),
        ),
        seed,
    )
    w = poisson_bootstrap_weight(u).cast("double")
    boot = (
        reps.groupBy(*keys, "_b")
        .agg(
            F.round(F.sum(w * F.col("_y")), round_sums).alias("_sw"),
            F.sum(w).alias("_ww"),
        )
        .withColumn(
            "_mean_b",
            F.when(F.col("_ww") > 0, F.col("_sw") / F.col("_ww")),
        )
    )
    gb = boot.groupBy(*keys) if keys else boot.groupBy()
    ci = gb.agg(
        F.percentile(F.col("_mean_b"), F.lit(alpha / 2)).alias("ci_lo"),
        F.percentile(F.col("_mean_b"), F.lit(1 - alpha / 2)).alias(
            "ci_hi"
        ),
    )
    pgb = base.groupBy(*keys) if keys else base.groupBy()
    point = pgb.agg(
        F.count("_y").alias("n"),
        (F.round(F.sum("_y"), round_sums) / F.count("_y")).alias("mean"),
    )
    joined = (
        point.join(F.broadcast(ci), on=keys)
        if keys
        else point.crossJoin(F.broadcast(ci))
    )
    return joined.select(*keys, "n", "mean", "ci_lo", "ci_hi")
