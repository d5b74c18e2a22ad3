"""Event-sequence fixtures through the real streaming pipeline — the
port of the reference's stream-level tests (BinlogToAkkaTest.scala:25-79;
SURVEY.md §5.1.3): fixed input stream + watermark ⇒ exact output rows.
"""

import pandas as pd
import pytest

from gush_spark.config import GushSparkConfig
from gush_spark.sources.fixtures import EPOCH0, canonical_event_sequences, generate_page_events
from gush_spark.streaming.pipeline import cep_pipeline


def _us(ts_s: int) -> int:
    import calendar

    return (calendar.timegm(EPOCH0.timetuple()) + ts_s) * 1_000_000


CFG = GushSparkConfig(ignored_hosts=("ignored.example",), watermark_delay="10 minutes")


@pytest.fixture()
def events_dir(tmp_path):
    d = tmp_path / "events"
    # 5 chunks → 5 ordered microbatches under maxFilesPerTrigger=1
    generate_page_events(d, canonical_event_sequences(), n_chunks=5)
    return str(d)


def test_canonical_sequences_exact_rows(spark, events_dir, tmp_dirs):
    query, sink = cep_pipeline(
        spark, events_dir, tmp_dirs["sink"], tmp_dirs["checkpoint"],
        config=CFG, available_now=True, max_files_per_trigger=1,
        lineage_path=tmp_dirs["lineage"],
    )
    query.awaitTermination(120)
    out = sink.read_all_appends(spark).toPandas()
    got = {
        int(r.event_id): (r.url, r.event_type, None if pd.isna(r.prior_ts_us) else int(r.prior_ts_us),
                          int(r.crawl_count))
        for r in out.itertuples()
    }

    # event 4 (ignored.example) filtered by config blacklist (F3 analog,
    # port of BinlogToAkkaTest.scala:57-79)
    assert 4 not in got
    # event 8 is late beyond the watermark → dropped (north_rule late-data)
    assert 8 not in got
    assert set(got) == {1, 2, 3, 5, 6, 7, 9, 10}

    # u1: crawl → recrawl (same batch? chunks: [1,2],[3,4],[5,6],[7,8],[9,10])
    assert got[1] == ("https://hostA.example/u1", "crawl", None, 1)
    assert got[2] == ("https://hostA.example/u1", "recrawl", _us(5), 2)
    # recrawl in a LATER microbatch still sees prior state (stateful join)
    assert got[5] == ("https://hostA.example/u1", "recrawl", _us(20), 3)
    # u2: crawl then drop across batches; drop enriched then evicted
    assert got[3] == ("https://hostB.example/u2", "crawl", None, 1)
    assert got[7] == ("https://hostB.example/u2", "drop", _us(10), 1)
    # u3 single crawl
    assert got[6] == ("https://hostC.example/u3", "crawl", None, 1)
    # u5 two crawls far apart: second sees first (state survives)
    assert got[9] == ("https://hostE.example/u5", "crawl", None, 1)
    assert got[10] == ("https://hostE.example/u5", "crawl", _us(200), 2)


def test_lineage_written_per_batch(spark, events_dir, tmp_dirs):
    import json
    from pathlib import Path

    query, sink = cep_pipeline(
        spark, events_dir, tmp_dirs["sink"], tmp_dirs["checkpoint"],
        config=CFG, available_now=True, max_files_per_trigger=1,
        lineage_path=tmp_dirs["lineage"],
    )
    query.awaitTermination(120)
    recs = [json.loads(line) for line in Path(tmp_dirs["lineage"]).read_text().splitlines()]
    assert all(r["kind"] == "partition_lineage" for r in recs)
    total = sum(r["total_rows"] for r in recs)
    assert total == sink.read_all_appends(spark).count()
    assert len(recs) >= 5  # one per microbatch
