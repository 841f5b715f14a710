"""SFT conversation prep: parse/validate/count/render on hand-built
transcripts, malformed-JSON quarantine semantics, zero-shuffle plan."""

from __future__ import annotations

import json

import pytest

from mhm_data_pipelines_spark.operators.conversations import (
    conversation_stats,
    parse_conversations,
    render_chat,
)


def _conv(*turns):
    return json.dumps(
        [{"role": r, "content": c} for r, c in turns]
    )


ROWS = [
    # id, conversation, expected (n_turns, roles_ok, alt_ok, nonempty,
    #                             u_toks, a_toks, valid)
    (1, _conv(("user", "hi there"), ("assistant", "hello friend ok")),
     (2, True, True, True, 2, 3, True)),
    (2, _conv(("assistant", "i go first"), ("user", "wrong order")),
     (2, False, True, True, 2, 3, False)),
    (3, _conv(("user", "a"), ("user", "b"), ("assistant", "c")),
     (3, True, False, True, 2, 1, False)),
    (4, _conv(("user", "question"), ("assistant", "   ")),
     (2, True, True, False, 1, 0, False)),
    (5, "this is { not json", (0, False, False, False, 0, 0, False)),
    (6, _conv(("user", "one turn only")), (1, True, True, True, 3, 0, False)),
    (7, _conv(("user", "x"), ("system", "y")),
     (2, False, True, True, 1, 0, False)),
]


@pytest.fixture(scope="module")
def convs(spark):
    return spark.createDataFrame(
        [(i, c) for i, c, _ in ROWS], "id long, conversation string"
    )


def test_parse_flags_malformed(spark, convs):
    got = {
        r.id: r.parse_ok for r in parse_conversations(convs).collect()
    }
    assert got == {i: (i != 5) for i, _, _ in ROWS}


def test_conversation_stats_hand_checked(spark, convs):
    rows = conversation_stats(convs).collect()
    got = {
        r.id: (
            r.n_turns, r.roles_ok, r.alternation_ok, r.turns_nonempty,
            r.n_user_tokens, r.n_assistant_tokens, r.valid,
        )
        for r in rows
    }
    want = {i: exp for i, _, exp in ROWS}
    assert got == want


def test_render_chat(spark, convs):
    got = {
        r.id: r.text_rendered for r in render_chat(convs).collect()
    }
    assert got[1] == "user: hi there\nassistant: hello friend ok"
    assert got[5] is None
    # custom separator
    got2 = render_chat(convs, turn_sep=" | ").collect()
    by_id = {r.id: r.text_rendered for r in got2}
    assert by_id[1] == "user: hi there | assistant: hello friend ok"


def test_stats_plan_is_shuffle_free(spark, convs):
    plan = (
        conversation_stats(convs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_window_conversations_greedy_turn_boundaries(spark):
    import json

    from mhm_data_pipelines_spark.operators.conversations import (
        window_conversations,
    )

    conv = [
        {"role": "user", "content": "a b c"},          # 3 tokens
        {"role": "assistant", "content": "d e"},       # 2
        {"role": "user", "content": "f g h i"},        # 4 -> new window
        {"role": "assistant", "content": "j"},         # 1
        {"role": "user", "content": " ".join("x" * 1 for _ in range(9))},  # 9 > max -> own window
    ]
    df = spark.createDataFrame(
        [(1, json.dumps(conv))], "doc_id long, conversation string"
    )
    got = sorted(
        window_conversations(df, max_tokens=6).collect(),
        key=lambda r: r.window_idx,
    )
    assert [(r.window_idx, r.n_turns, r.n_tokens) for r in got] == [
        (0, 2, 5), (1, 2, 5), (2, 1, 9)
    ]
    # turn order preserved inside each window
    assert [t["content"] for t in got[0].window] == ["a b c", "d e"]
    assert [t["content"] for t in got[1].window] == ["f g h i", "j"]


def test_window_conversations_drops_unparseable_and_validates(spark):
    import pytest as _pytest

    from mhm_data_pipelines_spark.operators.conversations import (
        window_conversations,
    )

    df = spark.createDataFrame(
        [(1, "not json")], "doc_id long, conversation string"
    )
    assert window_conversations(df, max_tokens=10).count() == 0
    with _pytest.raises(ValueError, match="max_tokens"):
        window_conversations(df, max_tokens=0)


def test_window_conversations_null_content_counts_zero(spark):
    import json

    from mhm_data_pipelines_spark.operators.conversations import (
        window_conversations,
    )

    # a parseable turn MISSING content must count 0 tokens, never the
    # size(NULL) = -1 that would corrupt the greedy budget fold
    conv = [
        {"role": "user", "content": "a b c"},
        {"role": "assistant"},
        {"role": "user", "content": "d e f"},
    ]
    df = spark.createDataFrame(
        [(1, json.dumps(conv))], "doc_id long, conversation string"
    )
    got = sorted(
        window_conversations(df, max_tokens=5).collect(),
        key=lambda r: r.window_idx,
    )
    # tokens: 3, 0, 3 -> windows [3+0], [3]
    assert [(r.n_turns, r.n_tokens) for r in got] == [(2, 3), (1, 3)]
