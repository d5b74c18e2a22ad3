"""Unit tests for the pure CEP rule engine (no Spark needed) —
SURVEY.md §7 step 5: rules isolated as pure functions."""

import pandas as pd

from gush_spark.streaming.cep import apply_rules


def _pdf(rows):
    return pd.DataFrame(
        rows, columns=["host", "event_id", "url", "warc_ts_us", "event_type"]
    )


def test_crawl_then_recrawl_enriches_with_prior_ts():
    state = {}
    out = apply_rules(
        _pdf([
            ("h", 1, "u1", 1000, "crawl"),
            ("h", 2, "u1", 2000, "recrawl"),
        ]),
        state,
    )
    assert out.prior_ts_us.tolist()[0] is None or pd.isna(out.prior_ts_us[0])
    assert out.prior_ts_us[1] == 1000
    assert out.crawl_count.tolist() == [1, 2]
    assert state["u1"] == (2000, 2, 1)


def test_event_time_ordering_within_batch():
    # arrival order reversed; rules must apply in event-time order
    state = {}
    out = apply_rules(
        _pdf([
            ("h", 2, "u1", 2000, "recrawl"),
            ("h", 1, "u1", 1000, "crawl"),
        ]),
        state,
    )
    assert out.event_id.tolist() == [1, 2]
    assert out.prior_ts_us[1] == 1000


def test_drop_evicts_state():
    state = {"u1": (500, 1, 1)}
    out = apply_rules(_pdf([("h", 3, "u1", 1000, "drop")]), state)
    assert "u1" not in state
    assert out.prior_ts_us[0] == 500
    assert out.crawl_count[0] == 1


def test_state_survives_across_batches():
    state = {}
    apply_rules(_pdf([("h", 1, "u1", 1000, "crawl")]), state)
    out = apply_rules(_pdf([("h", 2, "u1", 9000, "recrawl")]), state)
    assert out.prior_ts_us[0] == 1000


def test_unknown_kind_passes_through_without_state_change():
    state = {"u1": (500, 1, 1)}
    out = apply_rules(_pdf([("h", 4, "u1", 1000, "purge")]), state)
    assert state["u1"] == (500, 1, 1)
    assert out.event_type[0] == "purge"


def test_tie_break_on_event_id():
    state = {}
    out = apply_rules(
        _pdf([
            ("h", 2, "u1", 1000, "recrawl"),
            ("h", 1, "u1", 1000, "crawl"),
        ]),
        state,
    )
    assert out.event_id.tolist() == [1, 2]


def test_session_split_on_gap():
    """Gap > session_gap_us of event time starts a new per-url session
    (the session_window merge inside the state machine)."""
    state = {}
    out = apply_rules(
        _pdf([
            ("h", 1, "u1", 0, "crawl"),
            ("h", 2, "u1", 1_000_000, "recrawl"),        # 1s later: same session
            ("h", 3, "u1", 5_000_000_000, "recrawl"),    # 83min later: new session
        ]),
        state,
    )
    assert out.session_id.tolist() == [1, 1, 2]
    assert state["u1"] == (5_000_000_000, 3, 2)


def test_session_custom_gap():
    state = {}
    out = apply_rules(
        _pdf([("h", 1, "u1", 0, "crawl"), ("h", 2, "u1", 10, "recrawl")]),
        state, session_gap_us=5,
    )
    assert out.session_id.tolist() == [1, 2]
