"""job.py CLI contract: curation-only flags are validated, not
silently ignored (spark-submit misconfigurations should fail fast at
parse time, before a cluster is provisioned)."""

from __future__ import annotations

import pytest

from gush_spark.job import main

BASE = ["--input", "in", "--sink", "out", "--checkpoint", "ckpt"]


def test_max_pii_requires_scrub():
    with pytest.raises(SystemExit):
        main(["--pipeline", "curation", *BASE, "--max-pii", "3"])


@pytest.mark.parametrize(
    "flags",
    [
        ["--scrub"],
        ["--scrub", "--max-pii", "2"],
        ["--bench-keys", "k.parquet"],
        ["--bench-bloom", "b.parquet"],
        ["--quality-threshold", "0.7"],
        ["--lang", "de"],
        ["--fix-encoding"],
        ["--lm-ref", "ref.parquet"],
        ["--lm-ref", "ref.parquet", "--lm-min-logp", "-6.5"],
        ["--gopher-gate"],
    ],
)
def test_curation_flags_rejected_on_other_pipelines(flags):
    with pytest.raises(SystemExit):
        main(["--pipeline", "featurize", *BASE, *flags])


def test_lm_min_logp_requires_lm_ref():
    with pytest.raises(SystemExit):
        main(["--pipeline", "curation", *BASE, "--lm-min-logp", "-6.5"])


def test_bench_keys_and_bloom_mutually_exclusive():
    with pytest.raises(SystemExit):
        main(["--pipeline", "curation", *BASE,
              "--bench-keys", "k.parquet", "--bench-bloom", "b.parquet"])


def test_unknown_pipeline_rejected():
    with pytest.raises(SystemExit):
        main(["--pipeline", "nope", *BASE])


def test_politeness_quota_rejected_off_cep():
    with pytest.raises(SystemExit):
        main(["--pipeline", "pages", *BASE, "--politeness-quota", "3"])


def test_anomaly_k_rejected_off_pages_featurize():
    with pytest.raises(SystemExit):
        main(["--pipeline", "cep", *BASE, "--anomaly-k", "3"])


def test_anomaly_k_rejected_with_continuous():
    with pytest.raises(SystemExit):
        main(["--pipeline", "pages", *BASE, "--anomaly-k", "3", "--continuous"])


def test_recrawl_topk_rejected_off_cep():
    with pytest.raises(SystemExit):
        main(["--pipeline", "pages", *BASE, "--recrawl-topk", "5"])


def test_recrawl_topk_rejected_with_continuous():
    with pytest.raises(SystemExit):
        main(["--pipeline", "cep", *BASE, "--recrawl-topk", "5", "--continuous"])
