"""Population-stability-index (PSI) / Jensen-Shannon drift over
reference-quantile bins.

Completes the drift-monitoring triad: ``profile.profile_drift`` flags
schema/range movement, ``decontam.source_divergence`` scores VOCABULARY
shift (KL over unigrams); this scores a NUMERIC feature's
distributional shift the way scorecard/monitoring practice does it —
bin the feature on the REFERENCE distribution's quantile edges, then
PSI = Σ (q_i − p_i)·ln(q_i/p_i) and JS divergence over the same bins
(PSI ≥ 0.25 is the classic "investigate" threshold).

Scale design:
* Reference quantile edges come from ONE exact-percentile aggregate
  (Spark ``percentile`` ↔ DuckDB ``quantile_cont``, both linear
  interpolation) — a single row that broadcasts; edges are rounded to
  6dp BEFORE binning so both engines bin against bit-identical
  boundaries (raw interpolated edges can differ in the last ulp).
* Bin assignment is a pure array-fold projection
  (``aggregate(edges, 0, acc + (value > e))``) — no join, no UDF.
* Counting is one hash aggregate per side; the (group × bin) grid is
  a cross of two tiny aggregates (dims-grid pattern, cf.
  ``overview.missing_data_report``) so empty bins report q=0 instead
  of vanishing.
* Proportions are rounded to 6dp before the PSI/JS terms are computed
  from the ROUNDED values (round-before-derive discipline), with an
  ``eps`` floor inside the logs so empty bins contribute the standard
  clamped penalty instead of ±inf.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: Proportion floor inside the PSI/JS logarithms (industry-standard
#: zero-bin clamp; 1e-6 keeps a fully-emptied decile's penalty finite
#: and identical across engines).
EPS = 1e-6


def _quantile_edges(ref: DataFrame, value_col: str, n_bins: int) -> DataFrame:
    """Single-row frame holding the reference's interior quantile edges
    (n_bins − 1 doubles, rounded to 6dp) as an array column ``edges``."""
    if n_bins < 2:
        raise ValueError("n_bins must be >= 2")
    probs = [i / n_bins for i in range(1, n_bins)]
    arr = "array({})".format(", ".join(repr(p) for p in probs))
    return ref.agg(
        F.expr(
            f"transform(percentile({value_col}, {arr}), e -> round(e, 6))"
        ).alias("edges")
    )


def _bin_expr(value_col: str) -> Column:
    """0-based bin index: how many edges the value strictly exceeds."""
    return F.expr(
        f"aggregate(edges, 0, (acc, e) -> acc + CASE WHEN {value_col} > e "
        "THEN 1 ELSE 0 END)"
    )


def _psi_terms(
    ref_binned: DataFrame, cur_binned: DataFrame, n_bins: int
) -> DataFrame:
    """Shared tail: per-(group, bin) PSI/JS terms + per-group totals
    from the two binned projections (``ref_binned``: column ``bin``;
    ``cur_binned``: columns ``group, bin``).

    The (group × bin) grid crosses the group aggregate with the FULL
    ``0..n_bins−1`` range (not just ref-occupied bins — duplicated
    edge values can leave a reference bin empty while current rows
    land in it; dropping those rows would silently understate the
    drift), so emptied bins on EITHER side surface with p or q = 0.
    All grid inputs are tiny aggregates; the per-group totals ride a
    window over the ≤ n_groups·n_bins-row frame.
    """
    # Callers localCheckpoint the binned projections (lazily), so the
    # four sibling aggregates below — which Spark cannot merge — share
    # ONE scan+fold instead of re-deriving the binning 4×.
    ref_bins = ref_binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n_ref")
    )
    cur_bins = cur_binned.groupBy("group", "bin").agg(
        F.count(F.lit(1)).alias("n_cur")
    )
    groups = cur_binned.groupBy("group").agg(
        F.count(F.lit(1)).alias("n_group")
    )
    total = ref_binned.agg(F.count(F.lit(1)).alias("n_total"))
    bins = total.select(
        F.explode(F.sequence(F.lit(0), F.lit(n_bins - 1))).alias("bin"),
        "n_total",
    )
    grid = (
        groups.crossJoin(F.broadcast(bins))
        .join(F.broadcast(ref_bins), ["bin"], "left")
    )
    j = grid.join(cur_bins, ["group", "bin"], "left").select(
        "group",
        "bin",
        F.coalesce(F.col("n_ref"), F.lit(0)).cast("long").alias("n_ref"),
        F.coalesce(F.col("n_cur"), F.lit(0)).cast("long").alias("n_cur"),
        F.round(
            F.coalesce(F.col("n_ref"), F.lit(0)) / F.col("n_total"), 6
        ).alias("p_ref"),
        F.round(
            F.coalesce(F.col("n_cur"), F.lit(0)) / F.col("n_group"), 6
        ).alias("p_cur"),
    )
    p = F.greatest(F.lit(EPS), F.col("p_ref"))
    q = F.greatest(F.lit(EPS), F.col("p_cur"))
    m = (p + q) / F.lit(2.0)
    w = Window.partitionBy("group")
    return j.select(
        "group",
        "bin",
        "n_ref",
        "n_cur",
        "p_ref",
        "p_cur",
        F.round((q - p) * F.log(q / p), 6).alias("psi_term"),
        F.round(
            F.lit(0.5) * p * F.log(p / m) + F.lit(0.5) * q * F.log(q / m),
            6,
        ).alias("js_term"),
    ).select(
        "*",
        F.round(F.sum("psi_term").over(w), 6).alias("psi_total"),
        F.round(F.sum("js_term").over(w), 6).alias("js_total"),
    )


def psi_by_group(
    df: DataFrame,
    value_col: str,
    group_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Per-group PSI/JS drift of ``value_col`` against the WHOLE
    table as the reference (each group = a "current" snapshot, the
    corpus = the scorecard's development sample). NULL values are
    dropped on both sides (a NULL carries no position in the
    distribution; nullity drift is ``profile_drift``'s job). NULL
    GROUP values are dropped explicitly — left in, they would survive
    the group aggregate but never equi-join their own bin counts,
    fabricating a maximal-drift block for a "group" that is really
    just missingness; pre-coalesce NULL groups to a sentinel if they
    matter.

    Returns one row per (group, bin): ``(group, bin, n_ref, n_cur,
    p_ref, p_cur, psi_term, js_term, psi_total, js_total)`` — the
    totals repeat per group (window sum over the ≤ n_bins rows) so a
    consumer can filter to ``bin = 0`` for the headline numbers or
    keep the full per-bin attribution.
    """
    vals = df.filter(F.col(value_col).isNotNull())
    edges = _quantile_edges(vals, value_col, n_bins)
    binned = (
        vals.crossJoin(F.broadcast(edges))
        .select(
            F.col(group_col).alias("group"),
            _bin_expr(value_col).alias("bin"),
        )
        .localCheckpoint(eager=False)
    )
    # The corpus REFERENCE keeps NULL-group rows (they are corpus
    # mass); only the per-group "current" side drops them.
    return _psi_terms(
        binned.select("bin"),
        binned.filter(F.col("group").isNotNull()),
        n_bins,
    )


def psi_report(
    ref: DataFrame,
    cur: DataFrame,
    value_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Two-snapshot PSI/JS: bin ``cur`` on ``ref``'s quantile edges —
    the old-export vs new-export monitoring call. Same output shape as
    :func:`psi_by_group` minus the group column (one snapshot).
    """
    r = ref.filter(F.col(value_col).isNotNull())
    c = cur.filter(F.col(value_col).isNotNull())
    edges = _quantile_edges(r, value_col, n_bins)
    ref_binned = (
        r.crossJoin(F.broadcast(edges))
        .select(_bin_expr(value_col).alias("bin"))
        .localCheckpoint(eager=False)
    )
    cur_binned = (
        c.crossJoin(F.broadcast(edges))
        .select(
            F.lit("cur").alias("group"),
            _bin_expr(value_col).alias("bin"),
        )
        .localCheckpoint(eager=False)
    )
    return _psi_terms(ref_binned, cur_binned, n_bins).drop("group")


def woe_iv(
    df: DataFrame,
    value_col: str,
    label_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Weight-of-Evidence / Information-Value feature screening
    (scorecard practice; Siddiqi 2006): bin the numeric feature on its
    own quantile edges (same machinery as :func:`psi_by_group`), then
    per bin WoE = ln(p_pos/p_neg) over the label-conditional bin
    distributions and IV = Σ (p_pos − p_neg)·WoE — the standard
    "does this feature separate the classes, monotonically where?"
    readout run before training a selection classifier.

    ``label_col`` is boolean/0-1 (NULL labels and NULL values drop).
    Returns one row per bin: ``(bin, n_pos, n_neg, p_pos, p_neg, woe,
    iv_term, iv_total)`` — proportions rounded 6dp before the
    log/product terms (round-before-derive), ``EPS``-clamped so an
    empty class-bin contributes the standard finite penalty. Empty
    bins surface with zeros (full 0..n_bins−1 grid). A SINGLE-CLASS
    input (zero positives or zero negatives overall) yields NULL
    proportions/WoE/IV by contract — WoE is undefined without both
    classes, and an explicit NULL beats the engine-dependent
    divide-by-zero (Spark NULL vs IEEE inf) a bare division would
    leak.

    Scale shape: one exact-percentile aggregate (1-row broadcast),
    bin assignment as the array-fold projection, ONE (bin) hash
    aggregate carrying both class counts as conditional sums, and a
    bins-sized finalization — two passes over the corpus total.
    """
    vals = df.filter(
        F.col(value_col).isNotNull() & F.col(label_col).isNotNull()
    )
    edges = _quantile_edges(vals, value_col, n_bins)
    lab = F.col(label_col).cast("int")
    binned = vals.crossJoin(F.broadcast(edges)).select(
        _bin_expr(value_col).alias("bin"), lab.alias("y")
    )
    per_bin = binned.groupBy("bin").agg(
        F.sum("y").cast("long").alias("n_pos"),
        (F.count(F.lit(1)) - F.sum("y")).cast("long").alias("n_neg"),
    )
    totals = binned.agg(
        F.sum("y").cast("long").alias("t_pos"),
        (F.count(F.lit(1)) - F.sum("y")).cast("long").alias("t_neg"),
    )
    bins = totals.select(
        F.explode(F.sequence(F.lit(0), F.lit(n_bins - 1))).alias("bin"),
        "t_pos",
        "t_neg",
    )
    g = bins.join(per_bin, "bin", "left").select(
        "bin",
        F.coalesce("n_pos", F.lit(0)).cast("long").alias("n_pos"),
        F.coalesce("n_neg", F.lit(0)).cast("long").alias("n_neg"),
        F.when(
            F.col("t_pos") > 0,
            F.round(F.coalesce("n_pos", F.lit(0)) / F.col("t_pos"), 6),
        ).alias("p_pos"),
        F.when(
            F.col("t_neg") > 0,
            F.round(F.coalesce("n_neg", F.lit(0)) / F.col("t_neg"), 6),
        ).alias("p_neg"),
    )
    pp = F.greatest(F.lit(EPS), F.col("p_pos"))
    pn = F.greatest(F.lit(EPS), F.col("p_neg"))
    both = F.col("p_pos").isNotNull() & F.col("p_neg").isNotNull()
    woe = F.when(both, F.round(F.log(pp / pn), 6))
    out = g.select(
        "bin",
        "n_pos",
        "n_neg",
        "p_pos",
        "p_neg",
        woe.alias("woe"),
        F.when(
            both,
            F.round((F.col("p_pos") - F.col("p_neg")) * woe, 6),
        ).alias("iv_term"),
    )
    w = Window.partitionBy()
    return out.select(
        "*", F.round(F.sum("iv_term").over(w), 6).alias("iv_total")
    )
