"""Record validation & repair (reference operators A5–A8).

The reference validates/repairs employee contact data in-flight:
- email: RFC-5322 parse check, invalid/empty replaced with a generated
  address (/root/reference/internal/services/employees/employees.go:160-241)
- phone: strip ``[ -]`` then E.164 regex ``^\\+?[0-9]\\d{1,14}$``
  (employees.go:234-241)

Re-expressed as vectorized column expressions (no UDFs — these run
inside whole-stage codegen). The reference's random replacement email
(employees.go:172,181) is replaced by the deterministic
``invalid+<id>@example.invalid`` per SURVEY.md §7 M2 so results are
testable and idempotent across retries — a property the random version
lacks that matters for exactly-once sinks.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Pragmatic RFC-5322 subset; identical semantics under Java regex (Spark)
# and RE2 (DuckDB) for the character classes used.
EMAIL_RE = r"^[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}$"
# E.164 after stripping spaces/hyphens (employees.go:236-240).
PHONE_RE = r"^\+?[0-9]\d{1,14}$"


def email_valid(email: Column) -> Column:
    """A6: RFC-5322-subset validity check."""
    return email.isNotNull() & email.rlike(EMAIL_RE)


def phone_stripped(phone: Column) -> Column:
    """A7 step 1: strip spaces and hyphens."""
    return F.regexp_replace(phone, "[ -]", "")


def phone_valid(phone: Column) -> Column:
    """A7: E.164 validity after stripping."""
    return phone.isNotNull() & phone_stripped(phone).rlike(PHONE_RE)


def repaired_email(id_col: Column, email: Column) -> Column:
    """A5: deterministic replacement for empty/invalid emails."""
    return F.when(email_valid(email), email).otherwise(
        F.concat(F.lit("invalid+"), id_col.cast("string"), F.lit("@example.invalid"))
    )


def cleaned_phone(phone: Column) -> Column:
    """A7 applied: normalized phone, NULL when invalid."""
    return F.when(phone_valid(phone), phone_stripped(phone))


def contact_disposition(email: Column, phone: Column) -> Column:
    """Routing decision for a contact record (the production
    data-quality split a sync pipeline makes BEFORE merging):

    - ``clean``       both channels valid as-is;
    - ``repaired``    exactly one channel invalid — the engine's repair
                      rules (generated email / NULLed phone) leave a
                      usable record;
    - ``quarantined`` BOTH channels invalid: no usable contact at all;
                      merging would manufacture a record whose every
                      contact field is synthetic, so it routes to a
                      quarantine sink for human review instead.
    """
    ev, pv = email_valid(email), phone_valid(phone)
    return (
        F.when(ev & pv, F.lit("clean"))
        .when(~ev & ~pv, F.lit("quarantined"))
        .otherwise(F.lit("repaired"))
    )


def disposition_reason(email: Column, phone: Column) -> Column:
    """Machine-readable reason code accompanying the disposition."""
    ev, pv = email_valid(email), phone_valid(phone)
    return (
        F.when(ev & pv, F.lit("ok"))
        .when(~ev & ~pv, F.lit("no_valid_contact"))
        .when(~ev, F.lit("email_invalid"))
        .otherwise(F.lit("phone_invalid"))
    )
