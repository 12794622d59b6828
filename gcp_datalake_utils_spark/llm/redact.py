"""PII redaction battery for training-data scrubbing.

Before a corpus ships to training, identifier-like spans are masked:
emails, IPv4 addresses, long digit runs (account / phone / national-id
shaped). This operator is the JVM-side formulation: a chain of
``regexp_replace`` projections plus ``regexp_count`` tallies — pure
whole-stage-codegen, no Python in the hot path, linear scan at 100 TB
with zero shuffles (the tally rollup is a map-side partial agg).

Pattern order matters and is part of the contract: emails first (their
local parts contain digit runs), then IPv4 (dotted digit groups), then
bare digit runs of >= 6 — each later pattern sees the earlier ones'
placeholder tokens, never their raw text, so counts are disjoint.

The synthetic corpus carries no organic emails, so the operator builds
each customer's contact line deterministically (name + derived mailbox)
— the redaction path itself is what's under test, and the DuckDB oracle
must agree byte-for-byte on the masked text. DuckDB's
``regexp_replace`` is single-match by default ('g' flag required to
match Spark's replace-all), and its string literals keep backslashes
literal — both encoded in the oracle below.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gcp_datalake_utils_spark.sources import load_table

# RE2 (DuckDB) and java.util.regex (Spark) agree on these constructs:
# character classes, bounded repeats, \b word boundaries.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
DIGITS_RE = r"\d{6,}"


def pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[Q] masked contact lines + per-pattern redaction tallies.

    Returns (custkey, contact, clean, n_emails, n_ips, n_ids): the
    deterministic contact line, its fully masked form, and how many
    spans each pattern consumed.
    """
    c = load_table(spark, sf_dir, "customer")
    contact = F.concat(
        F.col("c_name"), F.lit(" <user"),
        F.col("c_custkey").cast("string"), F.lit("@example.com> ip "),
        F.lit("10.0."), (F.col("c_custkey") % 256).cast("string"),
        F.lit(".7"))
    base = c.select(F.col("c_custkey").alias("custkey"),
                    contact.alias("contact"))
    no_email = F.regexp_replace("contact", EMAIL_RE, "[EMAIL]")
    no_ip = F.regexp_replace(no_email, F.lit(IPV4_RE), F.lit("[IP]"))
    clean = F.regexp_replace(no_ip, F.lit(DIGITS_RE), F.lit("[ID]"))
    return base.select(
        "custkey", "contact", clean.alias("clean"),
        F.regexp_count("contact", F.lit(EMAIL_RE)).cast("int")
         .alias("n_emails"),
        F.regexp_count(no_email, F.lit(IPV4_RE)).cast("int")
         .alias("n_ips"),
        F.regexp_count(no_ip, F.lit(DIGITS_RE)).cast("int")
         .alias("n_ids"),
    )


# NB: single backslashes (DuckDB literals are not escape-processed) and
# the 'g' flag (DuckDB regexp_replace is first-match-only without it).
PII_REDACTION_ORACLE = f"""
WITH base AS (
  SELECT c_custkey AS custkey,
         c_name || ' <user' || CAST(c_custkey AS VARCHAR)
           || '@example.com> ip 10.0.'
           || CAST(c_custkey % 256 AS VARCHAR) || '.7' AS contact
  FROM customer
),
step AS (
  SELECT custkey, contact,
         regexp_replace(contact, '{EMAIL_RE}', '[EMAIL]', 'g')
           AS no_email
  FROM base
),
step2 AS (
  SELECT *, regexp_replace(no_email, '{IPV4_RE}', '[IP]', 'g') AS no_ip
  FROM step
)
SELECT custkey, contact,
       regexp_replace(no_ip, '{DIGITS_RE}', '[ID]', 'g') AS clean,
       CAST(len(regexp_extract_all(contact, '{EMAIL_RE}')) AS INTEGER)
         AS n_emails,
       CAST(len(regexp_extract_all(no_email, '{IPV4_RE}')) AS INTEGER)
         AS n_ips,
       CAST(len(regexp_extract_all(no_ip, '{DIGITS_RE}')) AS INTEGER)
         AS n_ids
FROM step2
"""
