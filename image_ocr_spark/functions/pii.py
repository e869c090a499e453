"""PII redaction columns for training-data pipelines: emails, IPv4
addresses, card-shaped digit runs, phone numbers — the scrub pass every
web-corpus pipeline runs before training (cf. the email/IP/phone filters
in C4 and the Dolma toolkit's PII taggers).

All patterns use explicit ASCII classes with NO backreferences or
lookaround, so Java regex (Spark), RE2 (DuckDB), and Python `re` agree —
the established tri-engine parity rule.  Replacement placeholders are
fixed tokens, and redaction applies in a FIXED order (email, ip, card,
phone) on both engines, so outputs are byte-identical.

Per-row expressions only: the scrub runs in the scan stage with zero
shuffle at any corpus size.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ordered (name, pattern, placeholder): order MATTERS (an IPv4 inside a
# URL must be gone before the phone pattern could nibble its digit runs,
# and a card digit-run must be gone before the domestic phone alternation
# could match inside it)
PII_RULES = [
    (
        "email",
        r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+",
        "<EMAIL>",
    ),
    (
        "ip",
        r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}",
        "<IP>",
    ),
    (
        "card",
        r"[0-9]{4}[ -][0-9]{4}[ -][0-9]{4}[ -][0-9]{4}",
        "<CARD>",
    ),
    # phone (r05, VERDICT r04 item 8): three alternatives, leftmost-first
    # order identical in Java/RE2/Python —
    #   +CC-XXX(X)-XXXX(-XXXX)?   international, 3 or 4 segments
    #   (NNN) NNN-NNNN            parenthesized area code (US / JP style)
    #   NN(NN)-NN(NN)-NNNN        domestic hyphenated (03-1234-5678);
    #                             final {4} keeps ISO dates (…-02) out
    (
        "phone",
        r"\+[0-9]{1,3}[- ][0-9]{2,4}[- ][0-9]{3,4}(?:[- ][0-9]{3,4})?"
        r"|\([0-9]{2,4}\)[ ]?[0-9]{2,4}[- ][0-9]{3,4}"
        r"|[0-9]{2,4}-[0-9]{2,4}-[0-9]{4}",
        "<PHONE>",
    ),
]


def pii_counts(text: Column) -> list:
    """[n_email, n_ip, n_card, n_phone] as long columns, counted in the
    SAME fixed order as redaction: each rule counts on the text with the
    prior rules' placeholders already applied, so a card digit-run is
    never double-counted as a phone (counts == number of placeholders
    redact_pii emits per rule)."""
    cols = []
    cur = text
    for name, pat, placeholder in PII_RULES:
        cols.append(
            F.regexp_count(cur, F.lit(pat)).cast("long").alias(f"n_{name}")
        )
        cur = F.regexp_replace(cur, pat, placeholder)
    return cols


def redact_pii(text: Column) -> Column:
    """Text with every PII match replaced by its placeholder, rules applied
    in PII_RULES order (regexp_replace is global in Spark; the DuckDB
    oracle passes the 'g' flag)."""
    out = text
    for _, pat, placeholder in PII_RULES:
        out = F.regexp_replace(out, pat, placeholder)
    return out
