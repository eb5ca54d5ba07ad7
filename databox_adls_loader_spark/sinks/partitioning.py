"""Hidden partitioning (partition transforms) for the versioned table.

The Iceberg partition-transform idea (public: the Iceberg spec's
`identity/year/month/day/bucket/truncate` transform family): the table
declares TRANSFORMS of source columns — `month(o_orderdate)`,
`bucket(16, o_custkey)` — the WRITER derives the partition tuple for
every row (users never see or maintain a partition column), each data
file lands wholly inside one partition tuple, and the READER converts
predicates on the SOURCE column into predicates on the transform value
to prune whole files before Spark ever lists them.

Why this exists next to min/max stats skipping: stats prune by value
RANGE and depend on how writes happened to cluster; a declared
transform is a layout GUARANTEE — an equality on a `bucket(16, k)`
column always touches 1/16 of the files no matter how inserts arrived,
and a month-partitioned table never co-mingles months in one file, so
time-range queries prune exactly.  At 100 TB this is the difference
between "pruning usually works" and "pruning is a contract".

Scope boundary with the reference: the reference's loader has no
partitioned table concept (its unit of parallelism is the directory
split in `processDirectoryIntoUnits`, cf.
/root/reference/generate-file-list.py); this module is part of the
lakehouse layer the Spark re-expression adds on top.

Transform-space semantics used for pruning (all superset-safe):

  * identity/year/month/day/truncate are MONOTONIC in the source
    value, so `c <  v` implies `t(c) <= t(v)`, `c >= v` implies
    `t(c) >= t(v)`, and `c = v` implies `t(c) = t(v)`;
  * bucket is not ordered — only equality prunes (`c = v` implies
    `bucket(c) = bucket(v)`); the bucket hash is the same md5 family
    the manifest Bloom filters use (`versioned._bloom_positions`),
    computed identically JVM-side (write) and in Python (prune);
  * a file whose partition value is NULL-marker/unknown is never
    pruned by that transform (the all-NULL case is already handled by
    the stats path's null_count rule).
"""

from __future__ import annotations

import dataclasses
import datetime
import hashlib
import re
import urllib.parse

from pyspark.sql import functions as F

_EPOCH = datetime.date(1970, 1, 1)
_HIVE_NULL = "__HIVE_DEFAULT_PARTITION__"

_SPEC_RE = re.compile(
    r"^\s*(identity|year|month|day|bucket|truncate)\s*\(\s*"
    r"(?:(\d+)\s*,\s*)?([A-Za-z_][A-Za-z0-9_]*)\s*\)\s*$")

# source dtypes each transform accepts (typeName()).  Timestamps are
# excluded from identity (their partition-dir encoding is not
# round-trippable portably).  TZ-AWARE `timestamp` binds for the
# calendar transforms (tables declared before the tz audit keep
# appending — no migration break) but NEVER PRUNES: the write
# expression (F.year/datediff) evaluates in the SESSION timezone
# while apply_literal uses the literal's naive calendar fields, so a
# session-tz change between write and read could shift a boundary and
# false-prune a file.  apply_literal therefore returns None for a
# tz-aware-bound calendar transform — placement only, every file
# read.  `timestamp_ntz` both binds AND prunes: its calendar fields
# are stored, not session-derived.  Cast tz-aware columns to
# date/timestamp_ntz (choosing the zone explicitly) to get pruning.
_INTEGRAL = ("byte", "short", "integer", "long")
_ALLOWED = {
    "identity": _INTEGRAL + ("string", "date", "boolean"),
    "year": ("date", "timestamp_ntz", "timestamp"),
    "month": ("date", "timestamp_ntz", "timestamp"),
    "day": ("date", "timestamp_ntz", "timestamp"),
    "bucket": _INTEGRAL + ("string",),
    "truncate": _INTEGRAL + ("string",),
}


class PartitionSpecError(ValueError):
    pass


@dataclasses.dataclass(frozen=True)
class Transform:
    kind: str                   # identity|year|month|day|bucket|truncate
    col: str                    # LOGICAL source column name
    n: int | None = None        # bucket count / truncate width
    dtype: str | None = None    # source column typeName(), bound at write

    @property
    def spec(self) -> str:
        if self.kind in ("bucket", "truncate"):
            return f"{self.kind}({self.n},{self.col})"
        return f"{self.kind}({self.col})"

    def bind(self, schema) -> "Transform":
        """Validate against the writer's schema and capture the source
        dtype (needed to parse partition-dir strings back to values)."""
        by_name = {f.name: f.dataType.typeName() for f in schema.fields}
        dt = by_name.get(self.col)
        if dt is None:
            raise PartitionSpecError(
                f"partition column {self.col!r} not in batch schema")
        if dt not in _ALLOWED[self.kind]:
            raise PartitionSpecError(
                f"{self.spec}: transform {self.kind!r} does not support "
                f"column type {dt!r}")
        return dataclasses.replace(self, dtype=dt)

    # -- write side: the derived partition value as a JVM expression --
    def expr(self):
        c = F.col(self.col)
        if self.kind == "identity":
            return c
        if self.kind == "year":
            return F.year(c) - F.lit(1970)
        if self.kind == "month":
            return (F.year(c) - F.lit(1970)) * F.lit(12) \
                + F.month(c) - F.lit(1)
        if self.kind == "day":
            return F.datediff(c.cast("date"), F.lit("1970-01-01"))
        if self.kind == "bucket":
            # same md5 family as the manifest Blooms: bit-identical in
            # the JVM and in Python's hashlib, so write-side placement
            # and driver-side pruning can never disagree
            h = F.conv(F.substring(
                F.md5(F.concat(F.lit("pb|"), c.cast("string"))),
                1, 15), 16, 10).cast("long")
            return F.when(c.isNotNull(), F.pmod(h, F.lit(self.n)))
        # truncate
        if self.dtype == "string":
            return F.substring(c, 1, self.n)
        return (c - F.pmod(c, F.lit(self.n))).cast("long")

    # -- prune side: the same transform applied to a predicate literal --
    def apply_literal(self, v):
        if self.kind == "identity":
            return _canon_part(v)
        if self.kind in ("year", "month", "day"):
            if self.dtype == "timestamp":
                # tz-aware source: partition values are session-tz
                # derived at write — no literal is safe to prune on
                return None
            d = _as_date(v)
            if d is None:
                return None
            if self.kind == "year":
                return d.year - 1970
            if self.kind == "month":
                return (d.year - 1970) * 12 + d.month - 1
            return (d - _EPOCH).days
        if self.kind == "bucket":
            if isinstance(v, bool) or not isinstance(v, (int, str)):
                return None
            h = int(hashlib.md5(
                f"pb|{v}".encode()).hexdigest()[:15], 16)
            return h % self.n
        # truncate
        if isinstance(v, str):
            return v[: self.n]
        if isinstance(v, bool) or not isinstance(v, int):
            return None
        return v - (v % self.n)

    def prune_pred(self, op: str, value):
        """(op', value') in transform space, or None when this
        transform cannot prune the predicate.  Monotonic transforms
        widen range bounds to their floor (`<`/`<=` -> `<=`,
        `>`/`>=` -> `>=`); bucket answers equality only."""
        t = self.apply_literal(value)
        if t is None:
            return None
        if self.kind == "bucket":
            return ("=", t) if op == "=" else None
        if op == "=":
            return ("=", t)
        if op in ("<", "<="):
            return ("<=", t)
        if op in (">", ">="):
            return (">=", t)
        return None

    # -- listing side: partition-dir string -> manifest value --
    def parse_dir(self, raw: str):
        if raw == _HIVE_NULL:
            return None
        raw = urllib.parse.unquote(raw)
        if self.kind in ("year", "month", "day", "bucket"):
            return int(raw)
        if self.kind == "truncate":
            return raw if self.dtype == "string" else int(raw)
        # identity: parse with the bound source dtype
        if self.dtype in _INTEGRAL:
            return int(raw)
        if self.dtype == "boolean":
            return raw == "true"
        return raw                      # string / date (ISO, ordered)


def _comparable(a, b) -> bool:
    """Same comparison domain?  Python's `5 != "5"` is True (no
    TypeError), so an untyped-literal equality could FALSE-prune a file
    — cross-type predicates fall back to the stats path instead."""
    if isinstance(a, bool) or isinstance(b, bool):
        return isinstance(a, bool) and isinstance(b, bool)
    if isinstance(a, int) and isinstance(b, int):
        return True
    return isinstance(a, str) and isinstance(b, str)


def _canon_part(v):
    if isinstance(v, (datetime.datetime,)):
        return None                     # identity excludes timestamps
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (int, str, bool)):
        return v
    return None


def _as_date(v) -> datetime.date | None:
    if isinstance(v, datetime.datetime):
        if v.tzinfo is not None:
            return None     # tz-aware literal: no prune (stay safe)
        return v.date()
    if isinstance(v, datetime.date):
        return v
    if isinstance(v, str):
        try:
            return datetime.date.fromisoformat(v[:10])
        except ValueError:
            return None
    return None


import functools


@functools.lru_cache(maxsize=512)
def parse_spec(spec: str) -> Transform:
    m = _SPEC_RE.match(spec)
    if not m:
        raise PartitionSpecError(
            f"bad partition transform {spec!r} (expected "
            "identity(col)|year(col)|month(col)|day(col)|"
            "bucket(N,col)|truncate(N,col))")
    kind, n, col = m.group(1), m.group(2), m.group(3)
    if kind in ("bucket", "truncate"):
        if n is None:
            raise PartitionSpecError(f"{spec!r}: {kind} needs (N, col)")
        n = int(n)
        if n < 1:
            raise PartitionSpecError(f"{spec!r}: N must be >= 1")
        return Transform(kind, col, n)
    if n is not None:
        raise PartitionSpecError(f"{spec!r}: {kind} takes (col) only")
    return Transform(kind, col)


def canon_spec(specs: list[str]) -> list[str]:
    """Whitespace-normalized spec strings (order PRESERVED — it is the
    directory nesting order)."""
    return [parse_spec(s).spec for s in specs]


def file_matches(specs: list[str], values: list | None,
                 predicates) -> bool:
    """May a file whose partition tuple is ``values`` contain a row
    satisfying ALL predicates?  Missing/short tuples answer True
    (files written before the spec existed, or by rewrite paths that
    do not re-partition, are simply never partition-pruned)."""
    if not specs or not values:
        return True
    ts = [parse_spec(s) for s in specs]
    for col, op, value in predicates:
        for i, t in enumerate(ts):
            if t.col != col or i >= len(values):
                continue
            fv = values[i]
            if fv is None:
                continue                # unknown/null dir: keep
            mapped = t.prune_pred(op, value)
            if mapped is None:
                continue
            op2, v2 = mapped
            if not _comparable(fv, v2):
                continue                # cross-type literal: keep
            try:
                if op2 == "=" and fv != v2:
                    return False
                if op2 == "<=" and not (fv <= v2):
                    return False
                if op2 == ">=" and not (fv >= v2):
                    return False
            except TypeError:
                continue                # incomparable: keep
    return True
