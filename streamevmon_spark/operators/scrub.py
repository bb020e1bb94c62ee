"""PII scrubbing for training-data curation: redact well-formed
identifiers (emails, IPv4s, SSN-shaped ids, card-shaped numbers,
E.164-ish phone numbers) from document text and report per-class hit
counts — the standard compliance pass before a corpus ships to
training.

Spark-first: a chain of built-in ``regexp_replace``/``regexp_count``
expressions — map-only, whole-stage codegen, zero shuffles; at 100 TB
this runs at scan speed and the filter/projection still push down.

Cross-engine determinism (docs_oracles.pii_scrub_oracle): the pattern
set is restricted to the dialect intersection of Java regex (Spark)
and RE2 (DuckDB) — ASCII character classes, bounded repetition,
no lookaround, no backreferences; literal dots are written as [.] so
no escaping differences exist; both engines use Perl leftmost-first
matching for these constructs, so replacements and counts agree
byte-for-byte. Classes are applied in a fixed order (email, card, ssn,
ipv4, phone) on the progressively scrubbed text; each count is taken
on the text state the class actually saw.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: (class, pattern, replacement) applied in order; patterns restricted
#: to the Java-regex / RE2 dialect intersection (see module docstring)
PII_RULES: tuple[tuple[str, str, str], ...] = (
    (
        "email",
        "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z][A-Za-z]+",
        "<EMAIL>",
    ),
    (
        "card",
        "[0-9]{4}[ -][0-9]{4}[ -][0-9]{4}[ -][0-9]{4}",
        "<CARD>",
    ),
    ("ssn", "[0-9]{3}-[0-9]{2}-[0-9]{4}", "<SSN>"),
    (
        "ipv4",
        "[0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}",
        "<IP>",
    ),
    ("phone", "[+][0-9]{7,15}", "<PHONE>"),
)


def pii_scrub(docs: DataFrame) -> DataFrame:
    """Redact each PII class in PII_RULES order; return doc_id, the
    scrubbed text, and one ``n_<class>`` count column per class."""
    out = docs.select("doc_id", F.col("text").alias("scrubbed"))
    counts = []
    for name, pat, repl in PII_RULES:
        out = out.withColumn(
            f"n_{name}",
            F.expr(f"regexp_count(scrubbed, '{pat}')").cast("long"),
        ).withColumn(
            "scrubbed",
            F.regexp_replace("scrubbed", pat, repl),
        )
        counts.append(f"n_{name}")
    return out.select("doc_id", "scrubbed", *counts)
