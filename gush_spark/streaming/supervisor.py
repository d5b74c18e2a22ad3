"""Query supervision — restart-on-failure around StreamingQuery.

The reference supervises its pipeline with Akka: the reader actor
reconnects after a crash (BinlogRemoteReaderActor.scala:49-52
postRestart → reconnect()) and the example app's supervision decider
resumes on parse errors (gush_example/gush.scala:13-18). Spark's
analogs: bad-input resume is the error-channel extraction (rows carry
errors instead of raising — functions/extract.py), and reconnect is
checkpoint resume. This module closes the remaining gap: an automatic
bounded-retry loop that restarts a failed query FROM ITS CHECKPOINT, so
a transient microbatch failure (sink hiccup, executor loss in local
mode) self-heals with exactly-once intact — the sink's idempotence
makes the replayed batch a no-op if it had committed.

At cluster scale the same loop runs in the driver process under
spark-submit; cluster-manager restarts of the whole driver re-enter it
with attempts reset, which is correct — the checkpoint is the only
durable truth.
"""

from __future__ import annotations

import json
import time
from collections.abc import Callable
from typing import Any

from pyspark.errors.exceptions.captured import StreamingQueryException


def run_supervised(
    start_fn: Callable[[], tuple[Any, Any]],
    max_restarts: int = 3,
    lineage_path: str | None = None,
    backoff_s: float = 0.0,
) -> tuple[Any, Any, int]:
    """Run a streaming query to termination, restarting it from its own
    checkpoint on failure.

    ``start_fn`` builds and STARTS the query (returning (query, sink));
    it must use the same checkpointLocation on every call — that is what
    makes a restart a resume, not a replay-from-scratch. Failures beyond
    ``max_restarts`` re-raise the last StreamingQueryException. Each
    restart appends a lineage record (JSONL) when ``lineage_path`` is
    given — the per-partition row-count lineage and this restart log
    together are the pipeline's operational audit trail.

    Returns (last query, sink, n_restarts) after a clean termination.
    """
    attempts = 0
    while True:
        query, sink = start_fn()
        try:
            query.awaitTermination()
            return query, sink, attempts
        except StreamingQueryException as exc:
            attempts += 1
            if lineage_path:
                with open(lineage_path, "a") as fh:
                    fh.write(
                        json.dumps(
                            {
                                "kind": "query_restart",
                                "attempt": attempts,
                                "run_id": str(query.runId),
                                "error": str(exc).splitlines()[0][:400],
                            }
                        )
                        + "\n"
                    )
            if attempts > max_restarts:
                raise
            if backoff_s:
                time.sleep(backoff_s)
