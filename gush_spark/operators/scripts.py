"""Script/charset profiling — per-document counts and fractions of
Latin, Cyrillic, CJK and digit characters. Web-scale curation uses the
script mix to catch mislabeled languages, mojibake and mixed-script
spam (e.g. Cyrillic homoglyphs inside "English" pages) BEFORE the more
expensive n-gram language model runs; it is the character-level
complement to the stopword-profile lang-ID
(functions/text_analysis.lang_scores).

Scale design: pure JVM ``regexp_extract_all`` counts — zero shuffles,
whole-stage codegen. Character classes are written as EXPLICIT
codepoint ranges (``[\\u4e00-\\u9fff]`` etc.), not ``\\p{script=...}``,
because Java regex and RE2 spell script properties differently
(``\\p{IsHan}`` vs ``\\p{Han}``) while literal ranges are identical in
both engines — the same portability rule as operators/scrub.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# (name, character-class) — explicit ranges, portable Java/RE2
SCRIPT_RANGES: tuple[tuple[str, str], ...] = (
    ("latin", "[A-Za-zÀ-ɏ]"),  # ASCII letters + Latin-1/Extended
    ("cyrillic", "[Ѐ-ӿ]"),
    ("cjk", "[一-鿿぀-ヿ가-힯]"),  # Han+Kana+Hangul
    ("digit", "[0-9]"),
)


def script_profile(text: Column) -> dict[str, Column]:
    """Per-row script counts (``n_<script>``), total character count
    (``n_chars``) and the dominant-script fraction columns
    (``<script>_frac``). Null text profiles to zero counts."""
    n_chars = F.coalesce(F.length(text), F.lit(0)).cast("long")
    out: dict[str, Column] = {"n_chars": n_chars}
    for name, cls in SCRIPT_RANGES:
        c = (
            F.coalesce(
                F.size(F.regexp_extract_all(text, F.lit(cls), F.lit(0))), F.lit(0)
            )
            .cast("long")
        )
        out[f"n_{name}"] = c
        out[f"{name}_frac"] = F.when(n_chars > 0, c.cast("double") / n_chars).otherwise(
            F.lit(0.0)
        )
    return out


def mixed_script_flag(
    profile: dict[str, Column], primary: str = "latin", max_foreign: float = 0.05
) -> Column:
    """True when a doc whose primary script dominates still carries
    more than ``max_foreign`` of another alphabet — the homoglyph-spam
    / mislabeled-language signal."""
    others = [n for n, _ in SCRIPT_RANGES if n not in (primary, "digit")]
    foreign = sum(
        (profile[f"{n}_frac"] for n in others[1:]), profile[f"{others[0]}_frac"]
    )
    return (profile[f"{primary}_frac"] > 0.5) & (foreign > max_foreign)
