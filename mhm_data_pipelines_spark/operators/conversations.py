"""SFT / chat-data preparation: parse JSON conversations, validate
turn structure, count per-role tokens, render chat templates.

No reference counterpart (north-star LLM-pipeline extension):
instruction-tuning corpora arrive as JSONL rows holding a
``[{role, content}, ...]`` array, and the standard prep stages are
(1) schema-checked parsing, (2) structural validation (roles known,
user/assistant alternation, non-empty turns), (3) per-role token
accounting for loss masking / budget math, (4) flattening through a
chat template into the single training string.

Scale shape: EVERYTHING here is a row-local expression — ``from_json``
+ higher-order array functions (transform/filter/exists/aggregate) stay
inside whole-stage codegen, so the operators add zero shuffles and no
Python. A malformed JSON row parses to NULL and is flagged, never
dropped silently and never job-fatal (same quarantine philosophy as
``sources.io.split_quarantine``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "CONV_SCHEMA",
    "parse_conversations",
    "conversation_stats",
    "render_chat",
    "window_conversations",
]

#: Spark-side schema for one conversation.
CONV_SCHEMA = "array<struct<role:string,content:string>>"

#: element type of CONV_SCHEMA (fold accumulator casts need it).
_TURN_TYPE = "struct<role:string,content:string>"

_TOKEN_SPLIT = r"\s+"


def _n_tokens(content: Column) -> Column:
    """Whitespace token count of one turn — 0 for empty, blank, or
    NULL content (``size(NULL)`` is -1 under the default
    ``spark.sql.legacy.sizeOfNull``, which would silently corrupt any
    sum or greedy budget fold consuming this count)."""
    n = F.size(
        F.filter(
            F.split(F.trim(content), _TOKEN_SPLIT), lambda t: t != ""
        )
    )
    return F.when(content.isNull(), F.lit(0)).otherwise(n)


def parse_conversations(
    df: DataFrame, json_col: str = "conversation", out_col: str = "conv"
) -> DataFrame:
    """Parse the JSON turn array into ``out_col`` (typed) plus a
    ``parse_ok`` flag. ``from_json`` yields NULL on malformed input —
    flagged here so a quarantine split is one filter away."""
    parsed = F.from_json(F.col(json_col), CONV_SCHEMA)
    return df.withColumn(out_col, parsed).withColumn(
        "parse_ok", parsed.isNotNull()
    )


def conversation_stats(
    df: DataFrame,
    json_col: str = "conversation",
    roles: tuple[str, str] = ("user", "assistant"),
) -> DataFrame:
    """Structural validation + token accounting, all row-local:

    * ``n_turns`` — turn count (0 for unparseable rows);
    * ``roles_ok`` — every role ∈ ``roles`` and the first turn is
      ``roles[0]`` (user-first convention);
    * ``alternation_ok`` — no two consecutive turns share a role;
    * ``turns_nonempty`` — every content has ≥1 token;
    * ``n_user_tokens`` / ``n_assistant_tokens`` — whitespace tokens
      per role (the loss-mask denominator/numerator);
    * ``valid`` — conjunction of the above (and parseability).

    The consecutive-role check compares the role array against itself
    shifted by one (``zip_with`` of two slices) — no explode, no
    window, no shuffle.
    """
    user, assistant = roles
    out = parse_conversations(df, json_col)
    conv = F.col("conv")
    rs = F.transform(conv, lambda t: t["role"])
    n = F.size(conv)
    repeats = F.exists(
        F.zip_with(
            F.slice(rs, 1, F.greatest(n - 1, F.lit(0))),
            F.slice(rs, 2, F.greatest(n - 1, F.lit(0))),
            lambda a, b: a == b,
        ),
        lambda x: x,
    )
    role_tokens = {
        r: F.aggregate(
            F.filter(conv, lambda t: t["role"] == r),
            F.lit(0),
            lambda acc, t: acc + _n_tokens(t["content"]),
        )
        for r in (user, assistant)
    }
    roles_ok = F.forall(
        rs, lambda r: r.isin([user, assistant])
    ) & (F.element_at(rs, 1) == user)
    turns_nonempty = F.forall(conv, lambda t: _n_tokens(t["content"]) > 0)
    out = (
        # size(NULL) is -1 under spark.sql.legacy.sizeOfNull — branch on
        # the null conversation itself, never on size()'s null-behavior.
        out.withColumn(
            "n_turns", F.when(conv.isNull(), F.lit(0)).otherwise(n)
        )
        .withColumn("roles_ok", F.coalesce(roles_ok, F.lit(False)))
        .withColumn(
            "alternation_ok", F.coalesce(~repeats, F.lit(False))
        )
        .withColumn(
            "turns_nonempty", F.coalesce(turns_nonempty, F.lit(False))
        )
        .withColumn(
            "n_user_tokens", F.coalesce(role_tokens[user], F.lit(0))
        )
        .withColumn(
            "n_assistant_tokens",
            F.coalesce(role_tokens[assistant], F.lit(0)),
        )
    )
    return out.withColumn(
        "valid",
        F.col("parse_ok")
        & (F.col("n_turns") >= 2)
        & F.col("roles_ok")
        & F.col("alternation_ok")
        & F.col("turns_nonempty"),
    ).drop("conv")


def render_chat(
    df: DataFrame,
    json_col: str = "conversation",
    out_col: str = "text_rendered",
    turn_sep: str = "\n",
) -> DataFrame:
    """Flatten a conversation into the single training string with the
    minimal engine-portable template ``"<role>: <content>"`` joined by
    ``turn_sep`` (tokenizer-specific templates are a rendering detail
    on top of this same flatten). NULL (unparseable) renders NULL."""
    conv = F.from_json(F.col(json_col), CONV_SCHEMA)
    rendered = F.array_join(
        F.transform(
            conv,
            lambda t: F.concat(t["role"], F.lit(": "), t["content"]),
        ),
        turn_sep,
    )
    return df.withColumn(out_col, rendered)


def window_conversations(
    df: DataFrame,
    json_col: str = "conversation",
    max_tokens: int = 2048,
    id_col: str = "doc_id",
) -> DataFrame:
    """Split long conversations into training windows at TURN
    boundaries — the long-context SFT prep step: a transcript over the
    context budget becomes several windows, each a run of consecutive
    whole turns whose whitespace-token total fits ``max_tokens``
    (greedy: a turn that would overflow a non-empty window starts the
    next one; a single turn bigger than the budget gets a window to
    itself — truncation is the trainer's call, splitting mid-turn is
    never correct).

    Returns one row per window: ``(id, window_idx, n_turns, n_tokens,
    window)`` with ``window`` the turn sub-array. Unparseable rows are
    dropped (flag them upstream via :func:`parse_conversations`).

    Scale shape: the greedy assignment is a row-local ``aggregate``
    fold over the turn array (conversations are bounded-length by
    contract — this is an array op, not a corpus shuffle); the only
    Exchange after the explode is whatever the caller does next.
    """
    if max_tokens <= 0:
        raise ValueError("max_tokens must be positive")
    parsed = parse_conversations(df, json_col).filter(F.col("parse_ok"))
    # ONE fold produces (turn, n, widx) triples directly: higher-order
    # functions are interpreted with no CSE, so every expression that
    # references the conv column re-runs from_json (and whatever fed
    # it) per row — a separate counts/fold/zip trio evaluated the
    # parse three times (measured 3.5 s -> this shape on the bench
    # corpus). acc = (widx, cum, out[]); a turn that would overflow a
    # non-empty window opens the next.
    init = F.struct(
        F.lit(0).alias("widx"),
        F.lit(0).alias("cum"),
        F.array()
        .cast(f"array<struct<turn:{_TURN_TYPE},n:int,widx:int>>")
        .alias("out"),
    )

    def step(acc, turn):
        n = _n_tokens(turn["content"]).cast("int")
        brk = (acc["cum"] > 0) & (acc["cum"] + n > max_tokens)
        widx = F.when(brk, acc["widx"] + 1).otherwise(acc["widx"])
        return F.struct(
            widx.alias("widx"),
            F.when(brk, n).otherwise(acc["cum"] + n).alias("cum"),
            F.concat(
                acc["out"],
                F.array(
                    F.struct(
                        turn.alias("turn"),
                        n.alias("n"),
                        widx.alias("widx"),
                    )
                ),
            ).alias("out"),
        )

    fold = F.aggregate(
        F.col("conv"), init, step, lambda acc: acc["out"]
    )
    ex = parsed.select(
        F.col(id_col), F.posexplode(fold).alias("pos", "e")
    ).select(
        F.col(id_col),
        "pos",
        F.col("e.turn").alias("turn"),
        F.col("e.n").alias("n"),
        F.col("e.widx").alias("widx"),
    )
    return (
        ex.groupBy(id_col, "widx")
        .agg(
            F.count("*").cast("long").alias("n_turns"),
            F.sum("n").cast("long").alias("n_tokens"),
            # array_sort on (pos, turn) structs keeps turn order —
            # collect_list alone is partition-order-dependent.
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("pos", "turn"))
                ),
                lambda s: s["turn"],
            ).alias("window"),
        )
        .withColumnRenamed("widx", "window_idx")
    )
