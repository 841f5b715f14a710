"""URL/domain filtering and canonicalization for web-corpus prep —
the CCNet / RefinedWeb front gate (host extraction, public-suffix
eTLD+1 grouping, domain blocklist, per-domain document caps).

No reference counterpart (north-star LLM-pipeline extension per
BASELINE.json). Scale shape:

* parsing and suffix grouping are pure Column expressions (codegen'd,
  pushdown-friendly — no UDF, no shuffle);
* the blocklist is joined as a BROADCAST left join (real blocklists are
  ~10⁵-10⁷ registrable domains — megabytes, always the small side);
* the per-domain cap is ONE window over the registrable domain — the
  same shuffle any per-domain aggregate needs; a pathological domain
  (millions of pages) costs an in-task sort, not a cross product. Rank
  is a deterministic value-hash of the id (layout-independent, same
  rows win on any execution), never ``monotonically_increasing_id``.

RE2-compatible regexes only, so a SQL engine (the DuckDB oracle, or a
downstream warehouse) can reproduce every step byte-for-byte.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Minimal public-suffix set for eTLD+1 grouping, LONGEST-match-first
#: (deterministic, engine-owned — swap for the real PSL in production;
#: the multi-label entries exercise the longest-match logic).
DEFAULT_SUFFIXES: tuple[str, ...] = (
    "co.uk",
    "ac.uk",
    "com.au",
    "com",
    "org",
    "net",
    "io",
    "de",
    "info",
    "edu",
    "gov",
)

#: Capture groups for ``parse_url`` — RE2-safe (no lookaround).
_HOST_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#]+)"
_SCHEME_RE = r"^([a-zA-Z][a-zA-Z0-9+.-]*)://"
_PATH_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)"
_QUERY_RE = r"\?([^#]*)"


def parse_url(url: Column | str) -> Column:
    """``struct(scheme, host, path, query)`` from a URL string — pure
    regexp_extract expressions (host lowercased, port stripped). A
    non-URL yields empty strings, never an error — web crawls are
    dirty and a parse failure must not kill a 100 TB job."""
    c = F.col(url) if isinstance(url, str) else url
    return F.struct(
        F.lower(F.regexp_extract(c, _SCHEME_RE, 1)).alias("scheme"),
        F.lower(F.regexp_extract(c, _HOST_RE, 1)).alias("host"),
        F.regexp_extract(c, _PATH_RE, 1).alias("path"),
        F.regexp_extract(c, _QUERY_RE, 1).alias("query"),
    )


def registrable_domain(
    host: Column | str,
    suffixes: tuple[str, ...] = DEFAULT_SUFFIXES,
) -> Column:
    """eTLD+1: the registered label plus its public suffix, longest
    suffix winning (``shop.example.co.uk`` → ``example.co.uk``, not
    ``co.uk``). Hosts matching no listed suffix fall back to their
    last two labels. Emitted as a CASE chain over the (small) suffix
    set — one codegen'd expression, reproducible verbatim in SQL."""
    c = F.col(host) if isinstance(host, str) else host
    import re as _re

    expr: Column | None = None
    for sfx in sorted(suffixes, key=len, reverse=True):
        esc = _re.escape(sfx)
        cond = c.rlike(rf"\.{esc}$")
        take = F.regexp_extract(c, rf"([^.]+\.{esc})$", 1)
        expr = F.when(cond, take) if expr is None else expr.when(cond, take)
    fallback = F.regexp_extract(c, r"([^.]+\.[^.]+)$", 1)
    return expr.otherwise(fallback) if expr is not None else fallback


def url_filter(
    df: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
    blocklist: DataFrame | None = None,
    per_domain_cap: int | None = None,
    suffixes: tuple[str, ...] = DEFAULT_SUFFIXES,
) -> DataFrame:
    """Annotate every row with its parsed ``host``, ``reg_domain``
    (eTLD+1), ``blocked`` (registrable domain present in ``blocklist``,
    a 1-column ``domain`` frame) and ``kept`` (not blocked AND within
    the per-domain cap). Rows are flagged, not dropped — the caller
    chooses ``filter(kept)`` or keeps the audit trail.

    The cap admits the ``per_domain_cap`` docs with the smallest
    (md5-rank, id) per registrable domain — a deterministic value-hash
    rank, so the SAME docs win on any partitioning/execution (the
    md5 convention shared with ``operators.sampling``)."""
    parsed = parse_url(url_col)
    out = df.withColumn("host", parsed["host"]).withColumn(
        "reg_domain", registrable_domain(F.col("host"), suffixes)
    )
    if blocklist is not None:
        marker = blocklist.select(
            F.col("domain").alias("reg_domain"),
            F.lit(True).alias("_blocked"),
        ).distinct()
        out = out.join(F.broadcast(marker), "reg_domain", "left")
        out = out.withColumn(
            "blocked", F.coalesce(F.col("_blocked"), F.lit(False))
        ).drop("_blocked")
    else:
        out = out.withColumn("blocked", F.lit(False))
    if per_domain_cap is not None:
        from pyspark.sql import Window

        rank_h = F.conv(
            F.substring(F.md5(F.col(id_col).cast("string")), 1, 15), 16, 10
        ).cast("long")
        # Blocked rows rank in their own partition so they never
        # consume cap slots from admissible docs.
        w = Window.partitionBy("reg_domain", "blocked").orderBy(
            rank_h.asc(), F.col(id_col).asc()
        )
        out = out.withColumn("_rn", F.row_number().over(w)).withColumn(
            "kept",
            ~F.col("blocked") & (F.col("_rn") <= per_domain_cap),
        ).drop("_rn")
    else:
        out = out.withColumn("kept", ~F.col("blocked"))
    return out
