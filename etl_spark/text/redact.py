"""PII / secret scrubbing — regex redaction as native column ops.

Training corpora are scrubbed of emails, IPs, long digit runs (phone
/ account / card numbers) and credential-looking tokens before use.
All patterns run as JVM ``regexp_replace`` / ``regexp_extract_all``
under whole-stage codegen — one scan, no Python. Patterns are written
in the common subset of Java regex (Spark) and RE2 (DuckDB) so the
scrub is oracle-verifiable cross-engine: no backreferences, no
lookaround, character classes and bounded repetition only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# ordered: more specific first (an email would otherwise lose its
# digits to the digit-run rule before the email rule sees it)
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
    "secret": r"\b(?:sk|pk|key|token)-[A-Za-z0-9]{8,}\b",
    "digits": r"\b[0-9]{6,}\b",
}


def redact(
    df: DataFrame,
    text_col: str,
    patterns: dict[str, str] | None = None,
    token: str = "[{name}]",
) -> DataFrame:
    """Replace every pattern match in ``text_col`` with its redaction
    token and add one ``n_<name>`` match-count column per pattern.

    Counts are taken BEFORE any replacement (so a later pattern can't
    hide matches from an earlier count); replacements run in dict
    order, most-specific first."""
    pats = patterns if patterns is not None else PII_PATTERNS
    out = df
    for name, pat in pats.items():
        out = out.withColumn(
            f"n_{name}", F.size(F.regexp_extract_all(F.col(text_col), F.lit(pat), F.lit(0)))
        )
    red = F.col(text_col)
    for name, pat in pats.items():
        red = F.regexp_replace(red, pat, token.format(name=name))
    return out.withColumn(text_col, red)
