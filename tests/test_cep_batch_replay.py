"""The SQL ⇄ stateful consistency triangle: the window-function batch
replay (queries.q_cep_replay_batch) must agree row-for-row with the
streaming state machine (apply_rules_fast, itself pinned to the
apply_rules spec) replayed over the same events."""

from __future__ import annotations

import pandas as pd

from gush_spark.queries import q_cep_replay_batch
from gush_spark.streaming.cep import apply_rules_fast

SF_DIR = "/root/testdata/sf0.001"

KIND = {"view": "crawl", "click": "recrawl", "purchase": "drop"}


def test_window_replay_equals_state_machine(spark):
    got = q_cep_replay_batch(spark, SF_DIR).toPandas()

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").toPandas()
    pdf = pd.DataFrame(
        {
            "host": "all",
            "event_id": ev["event_id"].astype("int64"),
            # the machine sessionizes per url; the batch replay keys the
            # same logic by user — so user IS the url here
            "url": ev["user_id"].astype(str),
            "warc_ts_us": (
                ev["ts"].astype("datetime64[us]").astype("int64")
            ),
            "event_type": ev["event_type"].map(KIND).fillna("unknown"),
        }
    )
    state: dict = {}
    machine = apply_rules_fast(pdf, state)

    m = machine.set_index("event_id")
    g = got.set_index("event_id")
    assert len(m) == len(g)
    joined = g.join(m, rsuffix="_m")
    assert (joined["page_event_type"] == joined["event_type"]).all()
    assert (joined["ts_us"] == joined["warc_ts_us"]).all()
    assert (joined["crawl_count"] == joined["crawl_count_m"]).all()
    assert (joined["session_id"] == joined["session_id_m"]).all()
    a = joined["prior_ts_us"].astype("Int64")
    b = joined["prior_ts_us_m"].astype("Int64")
    assert ((a == b) | (a.isna() & b.isna())).all()
