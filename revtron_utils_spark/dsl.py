"""where-DSL compiler: the reference's conjunctive predicate mini-language
compiled to a single :class:`pyspark.sql.Column`.

Reference semantics (``/root/reference/revtron/database/main.py:191-216``):
the DSL input is a ``dict`` or ``list[dict]``; each ``{col: value}`` term is
an equality, each ``{col: {'operator': op, 'value': v}}`` term is an operator
predicate, and **all terms are AND-ed** — no OR, no grouping. Operators F1-F10
from SURVEY.md §2.3.

The compiled predicate is a plain Column expression, so Catalyst pushes it
into the Parquet scan (PushedFilters) — at 100 TB this is the difference
between reading every row group and pruning most of them.
"""

from __future__ import annotations

from typing import Any, Mapping, Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

# F10 theta passthrough: the reference accepts any dialect operator string
# via SQLAlchemy's ``.op()`` (main.py:212-213). We map the standard
# comparison set to Column operators (JVM-side, codegen'd) and reject
# unknown operators rather than string-splicing SQL.
_THETA_OPS = {
    ">": lambda c, v: c > F.lit(v),
    "<": lambda c, v: c < F.lit(v),
    ">=": lambda c, v: c >= F.lit(v),
    "<=": lambda c, v: c <= F.lit(v),
    "=": lambda c, v: c == F.lit(v),
    "==": lambda c, v: c == F.lit(v),
    "!=": lambda c, v: c != F.lit(v),
    "<>": lambda c, v: c != F.lit(v),
    "ilike": lambda c, v: c.ilike(v),
    "not ilike": lambda c, v: ~c.ilike(v),
    "rlike": lambda c, v: c.rlike(v),
    "~": lambda c, v: c.rlike(v),
}

WhereTerm = Mapping[str, Any]
Where = WhereTerm | Sequence[WhereTerm] | None


class WhereDSLError(ValueError):
    """Raised for malformed DSL terms (unknown operator, bad value shape)."""


def _compile_term(name: str, spec: Any) -> Column:
    col = F.col(name)
    if not isinstance(spec, Mapping):
        # F1: implicit equality (main.py:214-215)
        return col == F.lit(spec)

    if "operator" not in spec:
        raise WhereDSLError(f"operator-dict for column {name!r} missing 'operator': {spec!r}")
    op = str(spec["operator"]).strip().lower()
    value = spec.get("value")

    if op == "in":  # F2 (main.py:196-197)
        return col.isin(list(value))
    if op == "not in":  # F3 (main.py:198-199)
        return ~col.isin(list(value))
    if op == "like":  # F4 (main.py:200-201)
        return col.like(value)
    if op == "not like":  # F5 (main.py:202-203)
        return ~col.like(value)
    if op == "is null":  # F6 (main.py:204-205)
        return col.isNull()
    if op == "is not null":  # F7 (main.py:206-207)
        return col.isNotNull()
    if op == "between":  # F8 (main.py:208-209), inclusive both ends
        lo, hi = value
        return col.between(F.lit(lo), F.lit(hi))
    if op == "not between":  # F9 (main.py:210-211)
        lo, hi = value
        return ~col.between(F.lit(lo), F.lit(hi))
    if op in _THETA_OPS:  # F10 theta passthrough (main.py:212-213)
        return _THETA_OPS[op](col, value)
    raise WhereDSLError(f"unsupported operator {op!r} for column {name!r}")


def compile_where(where: Where) -> Column | None:
    """Compile a DSL ``dict | list[dict] | None`` to one AND-ed Column.

    Returns ``None`` when the DSL is empty (no WHERE clause), matching the
    reference's no-op path.

    **Extension beyond the reference** (which is AND-only,
    main.py:193-215): a term of the form ``{"or": [<where>, ...]}``
    compiles each element with the full DSL recursively and ORs them —
    nestable, so arbitrary and/or trees are expressible while every
    plain term keeps its reference semantics. Catalyst still pushes the
    disjunction into the scan when each branch is pushable."""
    if where is None:
        return None
    terms: list[WhereTerm] = [where] if isinstance(where, Mapping) else list(where)
    pred: Column | None = None
    for term in terms:
        if not isinstance(term, Mapping):
            raise WhereDSLError(f"where term must be a mapping, got {term!r}")
        for name, spec in term.items():
            if name == "or":
                if not isinstance(spec, Sequence) or isinstance(spec, (str, bytes)):
                    raise WhereDSLError(f"'or' expects a list of where-groups, got {spec!r}")
                branches = [compile_where(b) for b in spec]
                if any(b is None for b in branches) or not branches:
                    raise WhereDSLError("'or' branches must be non-empty where-groups")
                piece = branches[0]
                for b in branches[1:]:
                    piece = piece | b
            else:
                piece = _compile_term(name, spec)
            pred = piece if pred is None else (pred & piece)
    return pred


def kwargs_filters(**filters: Any) -> Column | None:
    """F12: the Salesforce-client kwargs filter convention
    (``/root/reference/revtron/salesforce/main.py:130-137``) — a list value
    means IN, a scalar means equality; all AND-ed.
    """
    pred: Column | None = None
    for name, value in filters.items():
        piece = (
            F.col(name).isin(list(value))
            if isinstance(value, (list, tuple, set))
            else F.col(name) == F.lit(value)
        )
        pred = piece if pred is None else (pred & piece)
    return pred
