"""Declarative data-quality expectations (the Deequ/Great-Expectations
shape): a check suite over a table compiles to ONE wide aggregate —
violations are counted in the same single scan however many checks run
— and the report is a DataFrame (``check, n_rows, violations, passed``)
a pipeline can gate on, store, or diff between loads. Referential
checks (foreign-key containment) are the one shape that can't live in
the wide aggregate; they compile to a LEFT ANTI join each and union
into the same report schema.

Scale shape: in-table checks cost one pass with map-side partials (the
exact-uniqueness count plans as the same single-scan Expand the column
profiler uses); each FK check is one anti-join that broadcasts the
parent's key set when small and shuffle-joins otherwise — never a
collect. The report itself is |checks| rows.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Check:
    """One named expectation: ``violations`` counts offending rows
    inside the suite's single aggregate pass; ``row_violation`` is the
    per-row boolean behind that count (never NULL by construction) for
    checks with row semantics — None for set-level checks like
    uniqueness, which no single row can be blamed for."""

    name: str
    violations: Column
    row_violation: Column | None = None


def _q(name: str) -> Column:
    # backtick-quote so arbitrary column names never hit a raw
    # identifier position (same rule as operators/profile.py)
    return F.col("`" + name.replace("`", "``") + "`")


def _row_check(name: str, cond: Column) -> Check:
    """A row-semantic check: the aggregate count is the SUM of the
    (null-proof) per-row violation flag."""
    return Check(name, F.sum(cond.cast("bigint")), cond)


def not_null(col: str) -> Check:
    return _row_check(f"not_null({col})", _q(col).isNull())


def unique(col: str) -> Check:
    """Exact duplicate count: rows minus distinct non-null values minus
    nulls (a NULL key is not a duplicate of another NULL here — flag
    nulls with not_null separately). Set-level: no row_violation."""
    return Check(
        f"unique({col})",
        F.count(_q(col)) - F.count_distinct(_q(col)),
    )


def accepted_values(col: str, values: list) -> Check:
    return _row_check(
        f"accepted_values({col})",
        ~_q(col).isin(values) | _q(col).isNull(),
    )


def in_range(col: str, lo=None, hi=None) -> Check:
    cond = F.lit(False)
    if lo is not None:
        cond = cond | (_q(col) < lo)
    if hi is not None:
        cond = cond | (_q(col) > hi)
    cond = cond | _q(col).isNull()
    return _row_check(f"in_range({col})", cond)


def satisfies(name: str, predicate: Column) -> Check:
    """Escape hatch: count rows where ``predicate`` is NOT true (NULL
    counts as a violation — expectations are three-valued-logic-proof)."""
    return _row_check(name, ~predicate | predicate.isNull())


def split_by_expectations(
    df: DataFrame, checks: list[Check]
) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantined): route each row by the OR of the suite's
    row violations — the dead-letter alternative to refusing a whole
    batch (sinks/versioned.py::commit(expectations=…) is the refuse
    path). Every check must have row semantics; a set-level check
    (unique) raises — no single row can be blamed for a duplicate pair,
    quarantining 'the second one' would silently depend on row order.
    Both returned frames are pure filters over ``df`` (no shuffle; at
    scale this is one scan if both sides are consumed in one action,
    two narrow scans otherwise)."""
    setlevel = [c.name for c in checks if c.row_violation is None]
    if setlevel:
        raise ValueError(
            f"split_by_expectations: set-level checks {setlevel} have "
            "no per-row blame — gate with run_checks/commit instead"
        )
    bad = checks[0].row_violation
    for c in checks[1:]:
        bad = bad | c.row_violation
    return df.where(~bad), df.where(bad)


def run_checks(df: DataFrame, checks: list[Check]) -> DataFrame:
    """Compile the suite to one aggregate scan and melt the 1-row wide
    result to the report schema executor-side (no collect)."""
    aggs = [F.count(F.lit(1)).alias("__n")] + [
        F.coalesce(c.violations, F.lit(0)).cast("bigint").alias(f"__v{i}")
        for i, c in enumerate(checks)
    ]
    wide = df.agg(*aggs)
    structs = F.array(
        *[
            F.struct(
                F.lit(c.name).alias("check"),
                F.col(f"__v{i}").alias("violations"),
            )
            for i, c in enumerate(checks)
        ]
    )
    return (
        wide.select(F.col("__n").alias("n_rows"), F.explode(structs).alias("s"))
        .select(
            F.col("s.check").alias("check"),
            "n_rows",
            F.col("s.violations").alias("violations"),
            (F.col("s.violations") == 0).alias("passed"),
        )
    )


def fk_check(
    child: DataFrame,
    child_key: str,
    parent: DataFrame,
    parent_key: str,
    name: str | None = None,
) -> DataFrame:
    """Referential containment: child keys with no parent row, as a
    one-row report in run_checks' schema. NULL child keys never match a
    parent (SQL join semantics) and so count as violations — intended:
    an orphan is an orphan whether the key is wrong or missing."""
    name = name or f"fk({child_key} -> {parent_key})"
    n_rows = child.agg(F.count(F.lit(1)).alias("n_rows"))
    orphans = (
        child.select(_q(child_key))
        .join(
            parent.select(_q(parent_key).alias("__pk")).distinct(),
            _q(child_key) == F.col("__pk"),
            "left_anti",
        )
        .agg(F.count(F.lit(1)).alias("violations"))
    )
    # two 1-row frames, broadcast crossJoin — stays a single lazy plan,
    # nothing touches the driver
    return n_rows.crossJoin(F.broadcast(orphans)).select(
        F.lit(name).alias("check"),
        "n_rows",
        "violations",
        (F.col("violations") == 0).alias("passed"),
    )


def expectation_report(
    suites: list[tuple[DataFrame, list[Check]]],
    fk_reports: list[DataFrame] = (),
) -> DataFrame:
    """Union per-table suites (one scan each) and FK reports into one
    gate-able frame."""
    parts = [run_checks(df, checks) for df, checks in suites]
    parts.extend(fk_reports)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
