"""ksqlDB-dialect front-end: run the reference's own SQL on this engine.

The reference ships no engine — its users talk to it through ksqlDB SQL
(README.md:139-172, AllUdafIT.java:562-663). This module accepts exactly
those statement shapes so a reference user can paste their queries
unchanged:

- ``CREATE STREAM name (col TYPE, ...) WITH (kafka_topic='t',
  value_format='json' [, partitions=N] [, timestamp='col'])``
  (AllUdafIT.java:562-567, README.md:142-143). The Kafka topic is
  substituted by a JSON-lines directory (documented engine substitution —
  swapping in ``readStream.format("kafka")`` changes one reader line);
  ``value_format='json'`` is honored literally: inserts are serialized to
  JSON and the stream is decoded with ``from_json`` against the declared
  schema, preserving the NaN<->null wire convention
  (AllUdafIT.java:675-680).
- ``CREATE TABLE name [WITH (...)] AS SELECT ... FROM stream
  [WINDOW TUMBLING (SIZE n UNIT) | HOPPING (SIZE n UNIT, ADVANCE BY m
  UNIT) | SESSION (n UNIT)] GROUP BY key EMIT CHANGES``
  (AllUdafIT.java:593-600, README.md:146-172) — a continuously
  maintainable materialized table backed by Structured Streaming with the
  exactly-once foreachBatch sink; ``WINDOWSTART`` is supported in the
  select list (README.md:166).
- ``INSERT INTO name (cols) VALUES (...);`` — multiple statements per
  call, as the IT sends them (AllUdafIT.java:623-630).
- pull queries ``SELECT cols|* FROM table [WHERE pred] [LIMIT n]``
  (AllUdafIT.java:655) against the materialized state, NaN returned as
  None per the JSON convention.
- ``SHOW FUNCTIONS`` — the registered UDAF surface.

Beyond the reference's own statements, the dialect covers the host
capabilities a ksqlDB user reaches next (r3/r4 additions):

- scalar arithmetic + WHERE on CTAS streams; HAVING with hidden
  aggregate columns, evaluated at READ time against current aggregate
  values (table-membership semantics — non-monotone predicates drop
  groups that later fail, like ksqlDB's tombstones);
- stream-table joins ``FROM s [LEFT] JOIN t ON s.k = t.k`` — each stream
  record enriched against the table's state at processing time (the
  ksqlDB join model), compiled to a stream-static broadcast join;
- ``WINDOW ... (..., GRACE PERIOD n UNIT)`` + ``EMIT FINAL`` — append
  output mode with the grace period as the event-time watermark: each
  window emits exactly once, when it closes;
- ``CREATE STREAM name AS SELECT ...`` (CSAS) — continuous stateless
  transforms and stream-stream ``JOIN ... WITHIN n UNIT`` interval
  joins, materialized append-only (parquet + file-sink manifest =
  exactly-once downstream) and registered as streams for further
  CSAS/CTAS chaining;
- ``PARTITION BY col`` on CSAS (r5) — re-keys the derived stream: each
  micro-batch hash-partitions on the new key before the file sink (the
  Spark analogue of producing to a re-keyed topic), and the key is
  recorded for downstream grouping;
- table-table joins (r5): ``CREATE TABLE t3 AS SELECT ... FROM t1
  [LEFT|FULL [OUTER]] JOIN t2 ON ... [WHERE ...]`` — ksqlDB's changelog
  join, served as a read-time join of the two materialized tables
  (parents refresh first, so both sides' updates flow through every
  read; INNER/LEFT/FULL OUTER, the three kinds ksqlDB supports);
- scalar functions + searched CASE WHEN (r5): ABS/ROUND/SQRT/EXP/LN/LOG10/FLOOR/CEIL/SIGN/
  POWER/UPPER/LOWER/TRIM/LEN/SUBSTRING/CONCAT/COALESCE/IFNULL/GREATEST/
  LEAST anywhere an expression is accepted (select items, WHERE/HAVING,
  UDAF arguments) — each compiles to the Spark builtin, JVM-side.

UDAF dispatch matches the reference's SQL names and init-args:
``SKEWNESS(col[, true])`` / ``KURTOSIS(col[, true])`` (isSample
constructor arg, SkewnessUdaf.java:81, KurtosisUdaf.java:84) and
``STDDEV_WEIGHTED/SKEWNESS_WEIGHTED/KURTOSIS_WEIGHTED(val, weight)``
(README.md:29-37) — resolved to this engine's sum-decomposed Column
aggregates, never to Spark's same-named builtins (whose conventions
differ).
"""

from __future__ import annotations

import json
import math
import os
import re
import uuid
from dataclasses import dataclass, field
from typing import Any, Optional

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from ..stats import spark_agg as SA
from ..streaming.sink import ExactlyOnceParquetSink, run_streaming_stats

_TYPES = {
    "DOUBLE": DoubleType(),
    "BIGINT": LongType(),
    "INTEGER": IntegerType(),
    "INT": IntegerType(),
    "VARCHAR": StringType(),
    "STRING": StringType(),
    "BOOLEAN": BooleanType(),
    "TIMESTAMP": TimestampType(),
}

_WINDOW_UNITS = {
    "MILLISECOND": "milliseconds", "MILLISECONDS": "milliseconds",
    "SECOND": "seconds", "SECONDS": "seconds",
    "MINUTE": "minutes", "MINUTES": "minutes",
    "HOUR": "hours", "HOURS": "hours",
    "DAY": "days", "DAYS": "days",
}


@dataclass
class StreamSpec:
    name: str
    schema: StructType
    path: str
    ts_col: Optional[str]  # WITH (timestamp='col'); None -> synthetic ROWTIME
    # physical encoding of the stream directory: source streams are JSON
    # lines (the Kafka value_format='json' contract); DERIVED streams
    # (CREATE STREAM ... AS SELECT) are parquet written by a file sink
    # whose _spark_metadata manifest gives downstream readers exactly-once
    fmt: str = "json"
    # the stream's key column (ksqlDB record key): set by CSAS
    # PARTITION BY — rows in the materialized directory are hash-
    # partitioned on it, so a downstream CTAS grouping on the key reads
    # co-located input
    key_col: Optional[str] = None
    # INSERT INTO <this stream> SELECT ... feeders: names of hidden
    # derived streams whose rows union into this stream at read time
    # (ksqlDB's stream-merge persistent query)
    feeders: list = field(default_factory=list)
    # the declared WITH (kafka_topic=...) name; None -> the stream name.
    # SHOW TOPICS / PRINT address streams by topic, ksqlDB-style.
    topic: Optional[str] = None


@dataclass
class CsasSpec:
    """CREATE STREAM ... AS SELECT — a continuous stateless transform
    (projection/filter) or stream-stream interval join, materialized
    append-only so downstream CTAS/joins consume it like any stream."""

    name: str
    source: str
    select: list
    where: Optional[str]
    # {"stream": name, "kind": "inner"|"left_outer", "left_col": ...,
    #  "right_col": ..., "within": duration}
    join: Optional[dict]
    checkpoint: str
    # ksqlDB PARTITION BY col — re-keys the derived stream: rows are
    # physically co-located by the new key (the Spark analogue of
    # writing to a re-keyed topic), and the key is recorded on the
    # registered stream for downstream grouping/joins
    partition_by: Optional[str] = None


@dataclass
class TableSpec:
    name: str
    source: str
    select: list
    group_by: list
    window: Optional[dict]
    sink: ExactlyOnceParquetSink
    checkpoint: str
    with_opts: dict = field(default_factory=dict)
    where: Optional[str] = None
    having: Optional[str] = None
    # HAVING compiled once at CREATE time: rewritten predicate text and the
    # hidden aggregate columns it references. The predicate is evaluated at
    # READ time (ksqlDB-table membership semantics), never per micro-batch.
    having_text: Optional[str] = None
    having_hidden: list = field(default_factory=list)
    # stream-table join: {"table": name, "kind": "inner"|"left",
    # "left_col": stream key, "right_col": table key}
    join: Optional[dict] = None
    # EMIT CHANGES (update mode, default) vs EMIT FINAL (append mode:
    # windows emit once, on close — requires a window + watermark/grace)
    emit: str = "changes"


@dataclass
class TableViewSpec:
    """CTAS over materialized TABLE(s): ksqlDB's table-table join (and
    plain table projection/filter). ksqlDB maintains the result as a
    changelog join of the two tables; since every pull query serves each
    key's CURRENT value, the changelog join is servable as a READ-TIME
    join of the two materialized tables — both parents refresh first
    (dependency order), then the join runs over their current state, so
    updates on either side flow through on the next read exactly as
    ksqlDB's continuously-maintained result would."""

    name: str
    left: str
    right: Optional[str]  # None -> plain projection/filter view
    kind: str  # "inner" | "left" | "full"
    left_col: Optional[str]
    right_col: Optional[str]
    select: list
    where: Optional[str]


class KsqlParseError(ValueError):
    pass


# -- scalar / predicate expression parsing ----------------------------------
#
# The reference's own SQL only ever projects bare columns and string
# literals (AllUdafIT.java:562-663), but the first query a real user writes
# past the README is `SKEWNESS(val * 2) ... WHERE val > 0` — so the
# front-end accepts arithmetic over columns/literals and simple boolean
# predicates, compiled straight to Column expressions (Catalyst folds the
# constants; nothing here is interpreted per row).

_TOKEN_RE = re.compile(
    r"\s*(?:(?P<num>\d+\.\d*(?:[eE][+-]?\d+)?|\.\d+(?:[eE][+-]?\d+)?|\d+(?:[eE][+-]?\d+)?)"
    r"|(?P<str>'[^']*')"
    r"|(?P<ident>[A-Za-z_]\w*(?:\.\w+)?)"
    r"|(?P<op><>|!=|<=|>=|[-+*/()<>=,]))"
)

# ksqlDB scalar functions a user reaches right after arithmetic — each
# compiles to the Spark builtin (JVM codegen; nothing interpreted).
# Entries: arity check (-1 = variadic >=1) + builder over parsed Columns.
_SCALAR_FUNCS: dict = {
    "ABS": (1, lambda c: F.abs(c[0])),
    "SQRT": (1, lambda c: F.sqrt(c[0])),
    "EXP": (1, lambda c: F.exp(c[0])),
    "LN": (1, lambda c: F.log(c[0])),
    "LOG10": (1, lambda c: F.log10(c[0])),
    "FLOOR": (1, lambda c: F.floor(c[0])),
    "CEIL": (1, lambda c: F.ceil(c[0])),
    "SIGN": (1, lambda c: F.signum(c[0])),
    "POWER": (2, lambda c: F.pow(c[0], c[1])),
    "UPPER": (1, lambda c: F.upper(c[0])),
    "LOWER": (1, lambda c: F.lower(c[0])),
    "TRIM": (1, lambda c: F.trim(c[0])),
    "LEN": (1, lambda c: F.length(c[0])),
    "CONCAT": (-1, lambda c: F.concat(*c)),
    "COALESCE": (-1, lambda c: F.coalesce(*c)),
    "IFNULL": (2, lambda c: F.coalesce(c[0], c[1])),
    "GREATEST": (-1, lambda c: F.greatest(*c)),
    "LEAST": (-1, lambda c: F.least(*c)),
}


def _tokenize(s: str) -> list[str]:
    out, pos = [], 0
    while pos < len(s):
        m = _TOKEN_RE.match(s, pos)
        if not m or m.end() == pos:
            if s[pos:].strip():
                raise KsqlParseError(f"cannot tokenize expression at {s[pos:][:30]!r}")
            break
        out.append(m.group("num") or m.group("str") or m.group("ident") or m.group("op"))
        pos = m.end()
    return out


class _ExprParser:
    """Tiny recursive-descent parser: arithmetic (+ - * / parens) over
    columns and numeric/string/bool literals; predicates with comparison
    operators and AND/OR/NOT."""

    def __init__(self, text: str):
        self.toks = _tokenize(text)
        self.i = 0

    def _peek(self) -> Optional[str]:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def _next(self) -> str:
        t = self._peek()
        if t is None:
            raise KsqlParseError("unexpected end of expression")
        self.i += 1
        return t

    # arithmetic -------------------------------------------------------------

    def expr(self) -> Column:
        left = self.term()
        while self._peek() in ("+", "-"):
            op = self._next()
            right = self.term()
            left = left + right if op == "+" else left - right
        return left

    def term(self) -> Column:
        left = self.factor()
        while self._peek() in ("*", "/"):
            op = self._next()
            right = self.factor()
            left = left * right if op == "*" else left / right
        return left

    def factor(self) -> Column:
        t = self._next()
        if t == "-":
            return -self.factor()
        if t == "(":
            e = self.expr()
            if self._next() != ")":
                raise KsqlParseError("expected ')'")
            return e
        if t.startswith("'"):
            return F.lit(t[1:-1])
        if re.fullmatch(r"\d.*|\.\d.*", t):
            return F.lit(float(t) if ("." in t or "e" in t.lower()) else int(t))
        if t.upper() in ("TRUE", "FALSE"):
            return F.lit(t.upper() == "TRUE")
        if t.upper() == "CASE":
            return self._case()
        if re.fullmatch(r"[A-Za-z_]\w*(?:\.\w+)?", t):
            if self._peek() == "(":
                return self._call(t)
            # alias-qualified names (s.val) resolve by base name: after the
            # stream-table join both sides' columns are present unqualified
            # (the duplicate join key is dropped), so the suffix is unique
            return F.col(t.split(".")[-1].lower())
        raise KsqlParseError(f"unexpected token {t!r}")

    def _case(self) -> Column:
        """``CASE WHEN pred THEN expr [WHEN ...] [ELSE expr] END`` —
        compiles to chained ``F.when`` (searched CASE, the form ksqlDB
        supports; the classic ``SUM(CASE WHEN ... THEN 1 ELSE 0 END)``
        conditional aggregation works anywhere an expression does)."""
        branches: list[tuple[Column, Column]] = []
        while (self._peek() or "").upper() == "WHEN":
            self._next()
            cond = self.predicate()
            if self._next().upper() != "THEN":
                raise KsqlParseError("expected THEN in CASE expression")
            branches.append((cond, self.expr()))
        if not branches:
            raise KsqlParseError("CASE requires at least one WHEN branch")
        default = None
        if (self._peek() or "").upper() == "ELSE":
            self._next()
            default = self.expr()
        if self._next().upper() != "END":
            raise KsqlParseError("expected END closing CASE expression")
        col = F.when(branches[0][0], branches[0][1])
        for cond, val in branches[1:]:
            col = col.when(cond, val)
        return col.otherwise(default) if default is not None else col

    def _call(self, fname: str) -> Column:
        """Scalar function call ``f(arg, ...)`` — args are full
        expressions; literal-int args are additionally remembered raw for
        functions whose Spark builtin takes a Python int (ROUND scale,
        SUBSTRING bounds)."""
        self._next()  # consume '('
        cols: list[Column] = []
        raw_ints: list[Optional[int]] = []
        if self._peek() != ")":
            while True:
                start = self.i
                tok = self._peek()
                cols.append(self.expr())
                raw_ints.append(
                    int(tok)
                    if self.i == start + 1 and re.fullmatch(r"\d+", tok or "")
                    else None
                )
                if self._peek() == ",":
                    self._next()
                    continue
                break
        if self._next() != ")":
            raise KsqlParseError(f"expected ')' closing {fname}(...)")
        u = fname.upper()
        if u == "ROUND":
            if len(cols) not in (1, 2):
                raise KsqlParseError("ROUND takes 1 or 2 arguments")
            if len(cols) == 2 and raw_ints[1] is None:
                raise KsqlParseError("ROUND scale must be an integer literal")
            return F.round(cols[0], raw_ints[1] if len(cols) == 2 else 0)
        if u == "SUBSTRING":
            if len(cols) != 3 or raw_ints[1] is None or raw_ints[2] is None:
                raise KsqlParseError(
                    "SUBSTRING takes (expr, start_int, len_int)"
                )
            return F.substring(cols[0], raw_ints[1], raw_ints[2])
        if u in _SCALAR_FUNCS:
            arity, fn = _SCALAR_FUNCS[u]
            if arity == -1:
                if not cols:
                    raise KsqlParseError(f"{u} needs at least one argument")
            elif len(cols) != arity:
                raise KsqlParseError(f"{u} takes {arity} argument(s)")
            return fn(cols)
        raise KsqlParseError(f"unknown scalar function {fname!r}")

    # predicates --------------------------------------------------------------

    def predicate(self) -> Column:
        left = self.pred_term()
        while (self._peek() or "").upper() == "OR":
            self._next()
            left = left | self.pred_term()
        return left

    def pred_term(self) -> Column:
        left = self.pred_factor()
        while (self._peek() or "").upper() == "AND":
            self._next()
            left = left & self.pred_factor()
        return left

    def pred_factor(self) -> Column:
        if (self._peek() or "").upper() == "NOT":
            self._next()
            return ~self.pred_factor()
        if self._peek() == "(":
            # could be a parenthesized predicate OR arithmetic group: try
            # the predicate reading first, backtrack to comparison on failure
            save = self.i
            try:
                self._next()
                p = self.predicate()
                if self._next() != ")":
                    raise KsqlParseError("expected ')'")
                return p
            except KsqlParseError:
                self.i = save
        return self.comparison()

    def comparison(self) -> Column:
        left = self.expr()
        nxt = (self._peek() or "").upper()
        if nxt == "IS":
            # IS [NOT] NULL
            self._next()
            neg = (self._peek() or "").upper() == "NOT"
            if neg:
                self._next()
            if (self._next() or "").upper() != "NULL":
                raise KsqlParseError("expected NULL after IS [NOT]")
            return left.isNotNull() if neg else left.isNull()
        neg = False
        if nxt == "NOT":
            save = self.i
            self._next()
            peek2 = (self._peek() or "").upper()
            if peek2 in ("IN", "LIKE", "BETWEEN"):
                neg, nxt = True, peek2
            else:
                self.i = save
        if nxt == "IN":
            self._next()
            if self._next() != "(":
                raise KsqlParseError("expected '(' after IN")
            vals: list = []
            while True:
                t = self._next()
                if t.startswith("'"):
                    vals.append(t[1:-1])
                elif re.fullmatch(r"\d+\.?\d*|\.\d+", t):
                    vals.append(float(t) if "." in t else int(t))
                else:
                    raise KsqlParseError(
                        f"IN list takes literals only, got {t!r}"
                    )
                sep = self._next()
                if sep == ")":
                    break
                if sep != ",":
                    raise KsqlParseError("expected ',' or ')' in IN list")
            col = left.isin(vals)
            return ~col if neg else col
        if nxt == "LIKE":
            self._next()
            t = self._next()
            if not t.startswith("'"):
                raise KsqlParseError("LIKE takes a string-literal pattern")
            col = left.like(t[1:-1])
            return ~col if neg else col
        if nxt == "BETWEEN":
            # bounds parse as arithmetic expr() (never predicates), so the
            # mandatory AND separator is unambiguous with predicate AND
            self._next()
            low = self.expr()
            if (self._next() or "").upper() != "AND":
                raise KsqlParseError("expected AND in BETWEEN")
            high = self.expr()
            col = (left >= low) & (left <= high)
            return ~col if neg else col
        op = self._peek()
        if op not in ("=", "<>", "!=", "<", "<=", ">", ">="):
            raise KsqlParseError(f"expected comparison operator, got {op!r}")
        self._next()
        right = self.expr()
        return {
            "=": left == right,
            "<>": left != right,
            "!=": left != right,
            "<": left < right,
            "<=": left <= right,
            ">": left > right,
            ">=": left >= right,
        }[op]

    def _done(self) -> bool:
        return self.i >= len(self.toks)


def parse_scalar(text: str) -> Column:
    p = _ExprParser(text)
    c = p.expr()
    if not p._done():
        raise KsqlParseError(f"trailing tokens in expression {text!r}")
    return c


def parse_predicate(text: str) -> Column:
    p = _ExprParser(text)
    c = p.predicate()
    if not p._done():
        raise KsqlParseError(f"trailing tokens in predicate {text!r}")
    return c


def _parse_with(clause: str) -> dict:
    opts = {}
    for m in re.finditer(r"(\w+)\s*=\s*(?:'([^']*)'|(\d+))", clause):
        opts[m.group(1).lower()] = m.group(2) if m.group(2) is not None else int(m.group(3))
    return opts


def _duration(n: str, unit: str) -> str:
    u = _WINDOW_UNITS.get(unit.upper())
    if u is None:
        raise KsqlParseError(f"unknown window unit {unit!r}")
    return f"{n} {u}"


class KsqlEngine:
    """Minimal ksqlDB-statement executor over the PySpark engine."""

    def __init__(self, spark: SparkSession, workdir: str):
        self.spark = spark
        self.workdir = workdir
        self.streams: dict[str, StreamSpec] = {}
        self.tables: dict[str, TableSpec] = {}
        self.derived: dict[str, CsasSpec] = {}  # CSAS streams by name
        # TERMINATEd persistent-query ids ("ctas_<table>"/"csas_<stream>"):
        # the object survives, its maintenance query stops — pull queries
        # serve the last materialized state (ksqlDB TERMINATE semantics)
        self.terminated: set[str] = set()
        os.makedirs(workdir, exist_ok=True)

    # -- public API ----------------------------------------------------------

    def execute(self, sql: str):
        """Execute one or more ';'-separated ksqlDB statements; returns the
        last statement's result (rows for pull queries / SHOW, else None)."""
        result = None
        for stmt in self._split(sql):
            result = self._execute_one(stmt)
        return result

    # -- statement dispatch --------------------------------------------------

    def _split(self, sql: str) -> list[str]:
        parts, buf, in_str = [], [], False
        for ch in sql:
            if ch == "'":
                in_str = not in_str
            if ch == ";" and not in_str:
                s = "".join(buf).strip()
                if s:
                    parts.append(s)
                buf = []
            else:
                buf.append(ch)
        s = "".join(buf).strip()
        if s:
            parts.append(s)
        return parts

    def _execute_one(self, stmt: str):
        head = stmt.lstrip().upper()
        if head.startswith("CREATE STREAM"):
            if re.match(r"CREATE\s+STREAM\s+\w+\s+(?:WITH\s*\(.*?\)\s*)?AS\s+SELECT",
                        stmt, re.IGNORECASE | re.DOTALL):
                return self._create_stream_as(stmt)
            return self._create_stream(stmt)
        if head.startswith("CREATE TABLE"):
            return self._create_table(stmt)
        if head.startswith("INSERT INTO"):
            return self._insert(stmt)
        if head.startswith("SELECT"):
            return self._pull_query(stmt)
        if head.startswith("SHOW FUNCTIONS"):
            return sorted(_AGG_FUNCS) + ["COUNT", "SUM", "MIN", "MAX", "AVG"]
        if head.startswith("DROP STREAM") or head.startswith("DROP TABLE"):
            return self._drop(stmt)
        if head.startswith("SHOW STREAMS"):
            # hidden INSERT..SELECT feeder streams are internal
            return sorted(n for n in self.streams if not n.startswith("_ins_"))
        if head.startswith("SHOW TABLES"):
            return sorted(self.tables)
        if head.startswith("SHOW QUERIES"):
            # the persistent queries maintaining tables + derived streams;
            # TERMINATEd queries no longer run, so they no longer list
            return sorted(
                [f"CTAS_{n}" for n in self.tables
                 if f"ctas_{n}" not in self.terminated]
                + [f"CSAS_{n}" for n in self.derived
                   if f"csas_{n}" not in self.terminated]
            )
        if head.startswith("SHOW TOPICS"):
            # every registered backing "topic" (stream directory): source
            # streams' declared kafka_topic, derived streams' own name,
            # and CTAS output topics from WITH (KAFKA_TOPIC=...)
            topics = {
                sp.topic or n for n, sp in self.streams.items()
                if not n.startswith("_ins_")
            }
            topics |= {
                str(sp.with_opts.get("kafka_topic", n)).lower()
                for n, sp in self.tables.items()
                if not isinstance(sp, TableViewSpec)
            }
            return sorted(topics)
        if head.startswith("TERMINATE"):
            return self._terminate(stmt)
        if head.startswith("PRINT"):
            return self._print_topic(stmt)
        if head.startswith("DESCRIBE"):
            return self._describe(stmt)
        if head.startswith("EXPLAIN"):
            return self._explain(stmt)
        raise KsqlParseError(f"unsupported statement: {stmt[:60]!r}")

    def _terminate(self, stmt: str) -> None:
        """``TERMINATE <query_id>|ALL`` — stop a persistent query without
        dropping its object (ksqlDB CLI teardown order: TERMINATE, then
        DROP). The table/derived stream keeps serving its last
        materialized state; SHOW QUERIES drops the id; DROP of the object
        clears the marker so a re-created same-named object runs fresh."""
        m = re.match(r"TERMINATE\s+(\w+)\s*$", stmt, re.IGNORECASE)
        if not m:
            raise KsqlParseError(f"cannot parse TERMINATE: {stmt[:60]!r}")
        qid = m.group(1).lower()
        if qid == "all":
            self.terminated |= {f"ctas_{n}" for n in self.tables}
            self.terminated |= {f"csas_{n}" for n in self.derived}
            return
        known = (
            qid.startswith("ctas_") and qid[5:] in self.tables
        ) or (qid.startswith("csas_") and qid[5:] in self.derived)
        if not known:
            raise KsqlParseError(
                f"unknown query id {qid.upper()!r} — SHOW QUERIES lists "
                f"the running ids"
            )
        if qid in self.terminated:
            raise KsqlParseError(f"query {qid.upper()!r} is already terminated")
        self.terminated.add(qid)

    def _print_topic(self, stmt: str) -> list[str]:
        """``PRINT <topic> [FROM BEGINNING] [LIMIT n]`` — tail a topic's
        records as wire-format JSON strings (rowtime included). The
        file-backed engine has no live tail, so records are always served
        from the beginning of the directory in event-time order — the
        availableNow analogue of ksqlDB's console tail."""
        m = re.match(
            r"PRINT\s+'?([\w.-]+)'?(\s+FROM\s+BEGINNING)?"
            r"(?:\s+LIMIT\s+(\d+))?\s*$",
            stmt, re.IGNORECASE,
        )
        if not m:
            raise KsqlParseError(f"cannot parse PRINT: {stmt[:60]!r}")
        topic = m.group(1).lower()
        spec = next(
            (sp for n, sp in self.streams.items()
             if (sp.topic or n) == topic or n == topic),
            None,
        )
        if spec is None:
            # CTAS output topics are printable too (ksqlDB can PRINT any
            # topic SHOW TOPICS lists, including table changelogs)
            tname, tspec = next(
                ((n, sp) for n, sp in self.tables.items()
                 if not isinstance(sp, TableViewSpec)
                 and str(sp.with_opts.get("kafka_topic", n)).lower()
                 == topic),
                (None, None),
            )
            if tspec is None:
                raise KsqlParseError(
                    f"unknown topic {topic!r} — SHOW TOPICS lists them"
                )
            self.refresh(tname)
            df = self._read_table(tspec)
            # a table topic is a changelog keyed by group — order by all
            # columns for a deterministic console tail
            df = df.orderBy(*df.columns)
            if m.group(3):
                df = df.limit(int(m.group(3)))
            return [
                r["v"]
                for r in df.select(
                    F.to_json(F.struct(*df.columns)).alias("v")
                ).collect()
            ]
        # bring the stream fully up to date first: its own CSAS transform
        # AND any INSERT INTO feeders (refreshing only the CSAS served a
        # stale merged view when feeders had undrained rows)
        self._refresh_upstreams(spec.name)
        df = self._stream_df(spec, streaming=False)
        if spec.ts_col in df.columns:
            df = df.orderBy(spec.ts_col)
        if m.group(3):
            df = df.limit(int(m.group(3)))
        return [
            r["v"]
            for r in df.select(
                F.to_json(F.struct(*df.columns)).alias("v")
            ).collect()
        ]

    def _explain(self, stmt: str) -> str:
        """``EXPLAIN <table|stream>`` — the Spark physical plan of the
        object's maintenance query (ksqlDB's EXPLAIN shows the Streams
        topology; here the topology IS the Catalyst plan, so surfacing
        it lets users audit pushdown/broadcast/aggregation shape)."""
        m = re.match(r"EXPLAIN\s+(\w+)\s*$", stmt, re.IGNORECASE)
        if not m:
            raise KsqlParseError(f"cannot parse EXPLAIN: {stmt[:60]!r}")
        name = m.group(1).lower()
        if name in self.tables:
            spec = self.tables[name]
            if isinstance(spec, TableViewSpec):
                df = self._read_table_view(spec)
            else:
                df = self._build_agg(
                    spec,
                    self._stream_df(self.streams[spec.source], streaming=False),
                )
        elif name in self.derived:
            df = self._csas_transform(self.derived[name], streaming=False)
        else:
            raise KsqlParseError(f"unknown table or derived stream {name!r}")
        return df._jdf.queryExecution().executedPlan().toString()

    def _describe(self, stmt: str) -> list[dict]:
        m = re.match(r"DESCRIBE\s+(?:EXTENDED\s+)?(\w+)\s*$", stmt,
                     re.IGNORECASE)
        if not m:
            raise KsqlParseError(f"cannot parse DESCRIBE: {stmt[:60]!r}")
        name = m.group(1).lower()
        if name in self.streams:
            spec = self.streams[name]
            return [
                {"column": f.name, "type": f.dataType.simpleString().upper(),
                 "key": f.name == spec.key_col,
                 "timestamp": f.name == spec.ts_col}
                for f in spec.schema.fields
            ]
        if name in self.tables:
            tspec = self.tables[name]
            self.refresh(name)
            df = self._read_table(tspec)
            keys = (
                [] if isinstance(tspec, TableViewSpec)
                else tspec.sink.key_cols
            )
            return [
                {"column": f.name, "type": f.dataType.simpleString().upper(),
                 "key": f.name in keys, "timestamp": False}
                for f in df.schema.fields
            ]
        raise KsqlParseError(f"unknown stream or table {name!r}")

    def _drop(self, stmt: str) -> None:
        # DROP STREAM|TABLE [IF EXISTS] name [DELETE TOPIC]
        # (AllUdafIT.java:466-497 drops between parameterized cases)
        m = re.match(
            r"DROP\s+(STREAM|TABLE)\s+(?:IF\s+EXISTS\s+)?(\w+)"
            r"(\s+DELETE\s+TOPIC)?\s*$",
            stmt, re.IGNORECASE,
        )
        if not m:
            raise KsqlParseError(f"cannot parse DROP: {stmt[:80]!r}")
        kind, name = m.group(1).upper(), m.group(2).lower()
        delete_data = m.group(3) is not None
        import shutil

        if kind == "STREAM":
            if name in self.streams:
                # ksqlDB parity: a source with downstream readers cannot
                # be dropped ("Cannot drop X: the following queries read
                # from this source"). Visible derived streams block the
                # drop; hidden INSERT INTO ... SELECT feeders (_ins_*)
                # are engine-managed and cascade-removed instead — a
                # dangling feeder would KeyError the target's next
                # refresh.
                deps = [
                    d for d, sp in self.derived.items()
                    if sp.source == name
                    or (sp.join and sp.join.get("stream") == name)
                ]
                visible = [d for d in deps if not d.startswith("_ins_")]
                if visible:
                    raise KsqlParseError(
                        f"cannot drop stream {name!r}: derived streams "
                        f"{sorted(visible)} read from it — drop them first"
                    )
                tbl_readers = sorted(
                    t for t, ts in self.tables.items()
                    if getattr(ts, "source", None) == name
                )
                if tbl_readers:
                    raise KsqlParseError(
                        f"cannot drop stream {name!r}: tables "
                        f"{tbl_readers} read from it — drop them first"
                    )
                for d in deps:
                    dcsas = self.derived.pop(d, None)
                    self.terminated.discard(f"csas_{d}")
                    if dcsas is not None:
                        shutil.rmtree(dcsas.checkpoint, ignore_errors=True)
                    dspec = self.streams.get(d)
                    # materialized = the directory has CONTENT (part files
                    # / _spark_metadata from a drain) — a bare isdir test
                    # is always true because CSAS pre-creates the dir
                    try:
                        materialized = dspec is not None and any(
                            os.scandir(dspec.path)
                        )
                    except FileNotFoundError:
                        materialized = False
                    if materialized:
                        # ksqlDB parity: rows the feeder already produced
                        # into its target's topic PERSIST after the
                        # feeder's source is dropped (they are physically
                        # on the topic). Keep the materialized directory
                        # registered as a data-only feeder — it just never
                        # refreshes again (its source is gone; the derived
                        # entry above is removed, and the refresh paths
                        # skip feeders with no derived entry).
                        continue
                    # never materialized: nothing merged, remove entirely;
                    # targets that lose a feeder change their source set,
                    # so their downstream checkpoints must rebase
                    self.streams.pop(d, None)
                    for tname, sp in self.streams.items():
                        if d in sp.feeders:
                            sp.feeders.remove(d)
                            self._rebase_downstream(tname)
            spec = self.streams.pop(name, None)
            csas = self.derived.pop(name, None)
            self.terminated.discard(f"csas_{name}")
            if spec is None:
                if "IF EXISTS" in stmt.upper():
                    return
                raise KsqlParseError(f"unknown stream {name!r}")
            # the dropped stream's OWN hidden INSERT feeders are
            # engine-managed too — remove them with their target or they
            # linger as orphaned registrations
            for f in list(spec.feeders):
                fcsas = self.derived.pop(f, None)
                fspec = self.streams.pop(f, None)
                # a TERMINATEd marker must not survive to freeze a
                # recreated same-named feeder (names are deterministic:
                # _ins_<target>_<index>)
                self.terminated.discard(f"csas_{f}")
                if fspec is not None:
                    shutil.rmtree(fspec.path, ignore_errors=True)
                if fcsas is not None:
                    shutil.rmtree(fcsas.checkpoint, ignore_errors=True)
            if csas is not None:
                # derived (CSAS) stream: the parquet directory (incl. the
                # file-sink _spark_metadata manifest) and the CSAS
                # checkpoint are ENGINE-MANAGED state, not a user topic —
                # always remove both, or a re-created same-named CSAS
                # silently inherits stale data and sink/checkpoint state
                shutil.rmtree(spec.path, ignore_errors=True)
                shutil.rmtree(csas.checkpoint, ignore_errors=True)
            elif delete_data:
                shutil.rmtree(spec.path, ignore_errors=True)
        else:
            tspec = self.tables.pop(name, None)
            self.terminated.discard(f"ctas_{name}")
            if tspec is None:
                if "IF EXISTS" in stmt.upper():
                    return
                raise KsqlParseError(f"unknown table {name!r}")
            if not isinstance(tspec, TableViewSpec):
                # the sink materialization and checkpoint are ENGINE-
                # MANAGED state (same rationale as the CSAS branch above):
                # a re-created same-named table must start fresh, not
                # resume a checkpoint whose recorded source count may no
                # longer match (feeders added while this table was
                # TERMINATEd were deliberately not rebased) and not serve
                # stale keys from the old sink. Views have no
                # materialization of their own to delete.
                shutil.rmtree(tspec.sink.path, ignore_errors=True)
                shutil.rmtree(tspec.checkpoint, ignore_errors=True)

    # -- CREATE STREAM -------------------------------------------------------

    def _create_stream(self, stmt: str) -> None:
        m = re.match(
            r"CREATE\s+STREAM\s+(\w+)\s*\((.*?)\)\s*WITH\s*\((.*?)\)\s*$",
            stmt, re.IGNORECASE | re.DOTALL,
        )
        if not m:
            raise KsqlParseError(f"cannot parse CREATE STREAM: {stmt[:80]!r}")
        name, cols, with_clause = m.group(1).lower(), m.group(2), m.group(3)
        opts = _parse_with(with_clause)
        vfmt = str(opts.get("value_format", "json")).lower()
        if vfmt not in ("json", "delimited"):
            raise KsqlParseError(
                "value_format must be 'json' (the reference's format) or "
                "'delimited' (CSV wire)"
            )
        fields = []
        for part in cols.split(","):
            toks = part.strip().split()
            if len(toks) != 2:
                raise KsqlParseError(f"bad column declaration {part!r}")
            cname, ctype = toks[0].lower(), toks[1].upper()
            if ctype not in _TYPES:
                raise KsqlParseError(f"unsupported type {ctype}")
            fields.append(StructField(cname, _TYPES[ctype]))
        ts_col = opts.get("timestamp")
        schema_fields = list(fields)
        if ts_col is None:
            # ksqlDB semantics: every record carries ROWTIME (the Kafka
            # record timestamp); our inserts stamp it at append time
            schema_fields.append(StructField("rowtime", TimestampType()))
            ts_col = "rowtime"
        path = os.path.join(self.workdir, "streams", name)
        os.makedirs(path, exist_ok=True)
        self.streams[name] = StreamSpec(
            name, StructType(schema_fields), path, ts_col,
            fmt="csv" if vfmt == "delimited" else "json",
            topic=str(opts.get("kafka_topic", name)).lower(),
        )

    # -- CREATE STREAM AS (CSAS) ---------------------------------------------

    def _create_stream_as(self, stmt: str) -> None:
        """``CREATE STREAM name AS SELECT items FROM src [alias]
        [[LEFT] JOIN other [alias] WITHIN n UNIT ON a.k = b.k]
        [WHERE pred] [EMIT CHANGES]`` — ksqlDB's continuous stateless
        transform (CSAS). A projection/filter compiles to a streaming
        map; ``JOIN ... WITHIN`` compiles to the engine's stateful
        stream-stream interval join (streaming/join.py) with the WITHIN
        bound as both the time constraint and the state-eviction
        watermark. The result materializes append-only (parquet +
        file-sink manifest = exactly-once for downstream readers) and
        registers as a stream usable by further CSAS/CTAS/joins."""
        m = re.match(
            r"CREATE\s+STREAM\s+(\w+)\s*(?:WITH\s*\((.*?)\)\s*)?AS\s+(SELECT\s+.*)$",
            stmt, re.IGNORECASE | re.DOTALL,
        )
        if not m:
            raise KsqlParseError(f"cannot parse CSAS: {stmt[:80]!r}")
        name = m.group(1).lower()
        sel = m.group(3)
        _KW = r"JOIN|LEFT|WHERE|EMIT|ON|WITHIN|PARTITION|GRACE"
        q = re.match(
            r"SELECT\s+(.*?)\s+FROM\s+(\w+)"
            rf"(?:\s+(?:AS\s+)?(?!(?:{_KW})\b)(\w+))?\s*"
            r"(?:(LEFT\s+(?:OUTER\s+)?)?JOIN\s+(\w+)"
            rf"(?:\s+(?:AS\s+)?(?!(?:{_KW})\b)(\w+))?"
            r"\s+WITHIN\s+(\d+)\s+(\w+)"
            r"(?:\s+GRACE\s+PERIOD\s+(\d+)\s+(\w+))?"
            r"\s+ON\s+(.*?)\s*?)?"
            r"(?:\s*WHERE\s+(.*?)\s*)?"
            r"(?:PARTITION\s+BY\s+(\w+(?:\.\w+)?)\s*)?"
            r"(?:EMIT\s+CHANGES)?\s*$",
            sel, re.IGNORECASE | re.DOTALL,
        )
        if not q:
            raise KsqlParseError(f"cannot parse CSAS SELECT: {sel[:80]!r}")
        select_list = self._split_csv(q.group(1))
        source = q.group(2).lower()
        if source not in self.streams:
            raise KsqlParseError(f"unknown stream {source!r}")
        join = None
        if q.group(5):
            other = q.group(5).lower()
            if other not in self.streams:
                raise KsqlParseError(
                    f"JOIN right side {other!r} is not a known stream "
                    f"(CSAS joins are stream-stream; use CTAS for "
                    f"stream-table joins)"
                )
            cols = self._join_on_sides(
                (q.group(3) or source).lower(),
                (q.group(6) or other).lower(),
                q.group(11),
            )
            join = {
                "stream": other,
                "kind": "left_outer" if q.group(4) else "inner",
                "left_col": cols[0], "right_col": cols[1],
                "within": _duration(q.group(7), q.group(8)),
                # ksqlDB GRACE PERIOD on a windowed join: extra lateness
                # allowed on BOTH sides before join state evicts — the
                # watermark delay becomes within + grace while the match
                # bound stays within
                "grace": _duration(q.group(9), q.group(10))
                if q.group(9) else None,
            }
        where = q.group(12)
        if where:
            parse_predicate(where)
        partition_by = q.group(13).lower().split(".")[-1] if q.group(13) else None
        spec = CsasSpec(
            name=name, source=source, select=select_list, where=where,
            join=join,
            checkpoint=os.path.join(self.workdir, "ckpt_csas", name),
            partition_by=partition_by,
        )
        # batch prototype fixes the output schema (needed by the parquet
        # stream reader) and validates every expression at CREATE time
        proto = self._csas_transform(spec, streaming=False)
        if partition_by is not None and partition_by not in proto.schema.names:
            raise KsqlParseError(
                f"PARTITION BY column {partition_by!r} is not in the "
                f"select list (output columns: {proto.schema.names})"
            )
        path = os.path.join(self.workdir, "streams", name)
        os.makedirs(path, exist_ok=True)
        src_ts = self.streams[source].ts_col
        ts_col = src_ts if src_ts in proto.schema.names else None
        # honor WITH (kafka_topic=...) on the CSAS so SHOW TOPICS / PRINT
        # address the derived stream by its declared topic name (parsed by
        # the same helper CREATE STREAM uses)
        topic = None
        if m.group(2):
            t = _parse_with(m.group(2)).get("kafka_topic")
            topic = str(t).lower() if t is not None else None
        self.derived[name] = spec
        self.streams[name] = StreamSpec(
            name, proto.schema, path, ts_col, fmt="parquet",
            key_col=partition_by, topic=topic,
        )

    def _join_on_sides(self, left_alias: str, right_alias: str,
                       on: str) -> tuple[str, str]:
        """Resolve ``a.k = b.k`` / ``k1 = k2`` to (left_col, right_col)."""
        m = re.match(r"\s*(\w+(?:\.\w+)?)\s*=\s*(\w+(?:\.\w+)?)\s*$", on)
        if not m:
            raise KsqlParseError(f"cannot parse JOIN ON condition {on!r}")
        sides: dict[str, str] = {}
        for raw in (m.group(1), m.group(2)):
            parts = raw.lower().split(".")
            if len(parts) == 2:
                qual, col = parts
                if qual == left_alias:
                    sides["left"] = col
                elif qual == right_alias:
                    sides["right"] = col
                else:
                    raise KsqlParseError(
                        f"unknown qualifier {qual!r} in JOIN ON {on!r}"
                    )
            else:
                sides["left" if "left" not in sides else "right"] = parts[0]
        if "left" not in sides or "right" not in sides:
            raise KsqlParseError(f"JOIN ON must reference both sides: {on!r}")
        return sides["left"], sides["right"]

    def _csas_transform(self, spec: CsasSpec, streaming: bool) -> DataFrame:
        df = self._stream_df(self.streams[spec.source], streaming)
        if spec.join is not None:
            from ..streaming.join import interval_join

            right = self._stream_df(self.streams[spec.join["stream"]], streaming)
            l_ts = self.streams[spec.source].ts_col
            r_ts = self.streams[spec.join["stream"]].ts_col
            if l_ts == r_ts:
                raise KsqlParseError(
                    "CSAS stream-stream join requires DISTINCT timestamp "
                    f"column names on the two sides (both are {l_ts!r}); "
                    "declare WITH (timestamp='...') with different names"
                )
            lcol, rcol = spec.join["left_col"], spec.join["right_col"]
            if rcol != lcol:
                right = right.withColumnRenamed(rcol, lcol)
            w = spec.join["within"]
            wm = w
            if spec.join.get("grace"):
                from ..streaming.neardup import duration_to_ms

                wm_ms = duration_to_ms(w) + duration_to_ms(spec.join["grace"])
                wm = f"{wm_ms} milliseconds"
            df = interval_join(
                df, right, on=lcol, left_ts=l_ts, right_ts=r_ts,
                watermark_left=wm, watermark_right=wm,
                lower=w, upper=w, how=spec.join["kind"],
            )
        if spec.where:
            df = df.filter(parse_predicate(spec.where))
        items = [s.strip() for s in spec.select]
        if items == ["*"]:
            return df
        return df.select(
            *[
                self._scalar_expr(self._expr_of(i)).alias(self._alias_of(i))
                for i in items
            ]
        )

    def refresh_stream(self, name: str, _chain: tuple = ()) -> None:
        """Drain currently-available upstream records through the CSAS
        transform into the derived stream directory (availableNow on the
        CSAS's own checkpoint — incremental, append-only). Upstream
        derived streams refresh first, so chains propagate.

        ``_chain`` guards against feeder cycles (INSERT INTO a SELECT
        FROM b; INSERT INTO b SELECT FROM a): a revisit raises a named
        error instead of recursing unboundedly. Cycles are also rejected
        at INSERT time (``_insert_select``); this is the backstop for
        graphs assembled through paths that bypass that check."""
        if name in _chain:
            raise KsqlParseError(
                "feeder cycle detected during refresh: "
                + " -> ".join((*_chain, name))
            )
        if f"csas_{name}" in self.terminated:
            # TERMINATEd CSAS: the derived directory stays at its last
            # drained state; downstream readers consume that snapshot
            return
        chain = (*_chain, name)
        spec = self.derived[name]
        ups = [spec.source] + ([spec.join["stream"]] if spec.join else [])
        for up in ups:
            if up in self.derived:
                self.refresh_stream(up, chain)
            if up not in self.streams:
                raise KsqlParseError(
                    f"stream {name!r} reads from {up!r}, which no longer "
                    f"exists (dropped source)"
                )
            for f in self.streams[up].feeders:
                # data-only feeders (source dropped after rows were
                # merged) have no derived entry and never refresh
                if f in self.derived:
                    self.refresh_stream(f, chain)
        out = self.streams[name]
        df = self._csas_transform(spec, streaming=True)
        if spec.partition_by is not None:
            # PARTITION BY re-key: hash-partition the micro-batch on the
            # new key before the file sink, so each written file holds
            # only one key-partition's rows — the Spark analogue of
            # producing to a re-keyed topic (co-located downstream reads)
            df = df.repartition(F.col(spec.partition_by))
        q = (
            df.writeStream.format("parquet")
            .option("path", out.path)
            .option("checkpointLocation", spec.checkpoint)
            .outputMode("append")
            .queryName(f"csas_{name}")
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(300):
            # a timed-out drain means the derived stream directory is
            # still being written — returning would let the downstream
            # CTAS read a partial stream; fail loudly instead
            q.stop()
            raise RuntimeError(
                f"CSAS refresh of stream {name!r} did not finish within "
                f"300s; downstream reads would see a partial stream"
            )

    # -- INSERT INTO ---------------------------------------------------------

    def _insert(self, stmt: str) -> None:
        m = re.match(
            r"INSERT\s+INTO\s+(\w+)\s*\((.*?)\)\s*VALUES\s*\((.*)\)\s*$",
            stmt, re.IGNORECASE | re.DOTALL,
        )
        if not m:
            ms = re.match(r"INSERT\s+INTO\s+(\w+)\s+(SELECT\s+.*)$",
                          stmt, re.IGNORECASE | re.DOTALL)
            if ms:
                return self._insert_select(ms.group(1).lower(), ms.group(2))
            raise KsqlParseError(f"cannot parse INSERT: {stmt[:80]!r}")
        name = m.group(1).lower()
        spec = self.streams.get(name)
        if spec is None:
            raise KsqlParseError(f"unknown stream {name!r}")
        if name in self.derived:
            raise KsqlParseError(
                f"cannot INSERT INTO {name!r}: it is a derived (CSAS) "
                f"stream maintained by its query — insert into its source"
            )
        cols = [c.strip().lower() for c in m.group(2).split(",")]
        vals = [self._literal(v) for v in self._split_csv(m.group(3))]
        if len(cols) != len(vals):
            raise KsqlParseError("INSERT column/value arity mismatch")
        row = dict(zip(cols, vals))
        if spec.ts_col == "rowtime" and "rowtime" not in row:
            import datetime

            row["rowtime"] = datetime.datetime.now(
                datetime.timezone.utc
            ).strftime("%Y-%m-%d %H:%M:%S.%f")
        if spec.fmt == "csv":
            # value_format='delimited': positional CSV in declared-column
            # order; null -> empty field, NaN -> the parser's nanValue
            import csv as _csv
            import io as _io

            ordered = []
            for fld in spec.schema.fields:
                v = row.get(fld.name)
                if v is None:
                    ordered.append("")
                elif isinstance(v, float) and math.isnan(v):
                    ordered.append("NaN")
                elif isinstance(v, bool):
                    ordered.append("true" if v else "false")
                else:
                    ordered.append(str(v))
            buf = _io.StringIO()
            _csv.writer(buf, lineterminator="").writerow(ordered)
            fname = os.path.join(spec.path, f"{uuid.uuid4().hex}.csv")
            with open(fname, "w") as f:
                f.write(buf.getvalue() + "\n")
            return
        # value_format='json': one JSON document per record, decoded on
        # read against the declared schema — NaN is not valid JSON, so it
        # rides as null exactly like ksqlDB's wire format
        fname = os.path.join(spec.path, f"{uuid.uuid4().hex}.json")
        with open(fname, "w") as f:
            f.write(json.dumps(
                {k: (None if isinstance(v, float) and math.isnan(v) else v)
                 for k, v in row.items()}) + "\n")

    def _insert_select(self, tgt: str, sel: str) -> None:
        """``INSERT INTO tgt SELECT ... FROM src [WHERE ...] [EMIT
        CHANGES]`` — ksqlDB's stream-MERGE persistent query: another
        stream's (transformed) rows flow into ``tgt`` alongside its own.
        Compiled as a hidden CSAS whose output unions into ``tgt`` at
        read time (``_stream_df``), refreshed with tgt's other
        upstreams, so every reader of tgt sees both row sources
        exactly-once."""
        if tgt not in self.streams:
            raise KsqlParseError(f"unknown stream {tgt!r}")
        if tgt in self.derived:
            raise KsqlParseError(
                f"cannot INSERT INTO derived stream {tgt!r} — it is "
                f"maintained by its own query"
            )
        tgt_spec = self.streams[tgt]
        hidden = f"_ins_{tgt}_{len(tgt_spec.feeders)}"
        self._create_stream_as(f"CREATE STREAM {hidden} AS {sel}")

        # Reject feeder cycles AT INSERT TIME (ksqlDB rejects circular
        # reads too): if the new feeder's transitive upstream graph —
        # CSAS sources, join streams, and other INSERT feeders — reaches
        # the target, refreshing the target would recurse forever.
        def _reaches(node: str, goal: str, seen: set) -> bool:
            if node == goal:
                return True
            if node in seen:
                return False
            seen.add(node)
            nxt: list[str] = []
            dsp = self.derived.get(node)
            if dsp is not None:
                nxt.append(dsp.source)
                if dsp.join:
                    nxt.append(dsp.join["stream"])
            ssp = self.streams.get(node)
            if ssp is not None:
                nxt.extend(ssp.feeders)
            return any(_reaches(x, goal, seen) for x in nxt)

        # walk from the hidden feeder ITSELF so BOTH its CSAS source and
        # its JOIN side are covered (starting from .source alone missed
        # INSERT INTO a SELECT ... FROM b JOIN a WITHIN ... — the cycle
        # through the join stream registered fine and then every refresh
        # of the target tripped the backstop forever)
        if _reaches(hidden, tgt, set()):
            bad = self.derived.pop(hidden)
            bad_spec = self.streams.pop(hidden)
            import shutil

            shutil.rmtree(bad_spec.path, ignore_errors=True)
            shutil.rmtree(bad.checkpoint, ignore_errors=True)
            raise KsqlParseError(
                f"INSERT INTO {tgt!r} would create a feeder cycle: its "
                f"SELECT reads (transitively) from {tgt!r} itself"
            )
        feeder = self.streams[hidden]
        tgt_cols = set(tgt_spec.schema.names)
        extra = [c for c in feeder.schema.names if c not in tgt_cols]
        if extra:
            raise KsqlParseError(
                f"INSERT INTO {tgt!r}: select columns {extra} are not in "
                f"the target schema {sorted(tgt_cols)}"
            )
        if tgt_spec.ts_col not in (None, "rowtime") and \
                tgt_spec.ts_col not in feeder.schema.names:
            raise KsqlParseError(
                f"INSERT INTO {tgt!r}: the target's timestamp column "
                f"{tgt_spec.ts_col!r} must be in the select list (windowed "
                f"readers group on it)"
            )
        tgt_spec.feeders.append(hidden)
        # downstream checkpoints were pinned to the target's previous
        # source set — rebase them so the next refresh recomputes with
        # the new feeder unioned in instead of failing the source-count
        # assertion
        self._rebase_downstream(tgt)

    @staticmethod
    def _split_csv(s: str) -> list[str]:
        # comma split that respects quotes AND parens — select-list items
        # like STDDEV_WEIGHTED(val, weight) AS stddev carry inner commas
        out, buf, in_str, depth = [], [], False, 0
        for ch in s:
            if ch == "'":
                in_str = not in_str
            elif not in_str and ch == "(":
                depth += 1
            elif not in_str and ch == ")":
                depth -= 1
            if ch == "," and not in_str and depth == 0:
                out.append("".join(buf))
                buf = []
            else:
                buf.append(ch)
        out.append("".join(buf))
        return out

    @staticmethod
    def _literal(tok: str) -> Any:
        t = tok.strip()
        if t.startswith("'") and t.endswith("'"):
            return t[1:-1]
        if t.upper() in ("TRUE", "FALSE"):
            return t.upper() == "TRUE"
        if t.upper() == "NULL":
            return None
        if re.fullmatch(r"-?\d+", t):
            return int(t)
        return float(t)

    # -- CREATE TABLE AS -----------------------------------------------------

    def _create_table(self, stmt: str) -> None:
        m = re.match(
            r"CREATE\s+TABLE\s+(\w+)\s*(?:WITH\s*\((.*?)\)\s*)?AS\s+(SELECT\s+.*)$",
            stmt, re.IGNORECASE | re.DOTALL,
        )
        if not m:
            raise KsqlParseError(f"cannot parse CREATE TABLE: {stmt[:80]!r}")
        name = m.group(1).lower()
        with_opts = _parse_with(m.group(2) or "")
        sel = m.group(3)
        from_m = re.search(r"\bFROM\s+(\w+)", sel, re.IGNORECASE)
        if from_m and from_m.group(1).lower() in self.tables:
            # FROM names a materialized table -> table-table join /
            # table projection view (no GROUP BY; served at read time)
            return self._create_table_view(name, sel)
        _KW = r"JOIN|LEFT|WHERE|WINDOW|GROUP|EMIT|HAVING|ON"
        q = re.match(
            r"SELECT\s+(.*?)\s+FROM\s+(\w+)"
            rf"(?:\s+(?:AS\s+)?(?!(?:{_KW})\b)(\w+))?\s*"
            r"(?:(LEFT\s+(?:OUTER\s+)?)?JOIN\s+(\w+)"
            rf"(?:\s+(?:AS\s+)?(?!(?:{_KW})\b)(\w+))?"
            r"\s+ON\s+(.*?)\s+)?"
            r"(?:WHERE\s+(.*?)\s*)?"
            r"(?:WINDOW\s+(TUMBLING|HOPPING|SESSION)\s*\((.*?)\)\s*)?"
            r"GROUP\s+BY\s+(.*?)\s*"
            r"(?:HAVING\s+(.*?)\s*)?"
            r"(?:EMIT\s+(CHANGES|FINAL))?\s*$",
            sel, re.IGNORECASE | re.DOTALL,
        )
        if not q:
            raise KsqlParseError(f"cannot parse CTAS SELECT: {sel[:80]!r}")
        select_list = self._split_csv(q.group(1))
        source = q.group(2).lower()
        if source not in self.streams:
            raise KsqlParseError(f"unknown stream {source!r}")
        join = None
        if q.group(5):
            join = self._parse_join(
                source_alias=(q.group(3) or source).lower(),
                kind="left" if q.group(4) else "inner",
                table=q.group(5).lower(),
                table_alias=(q.group(6) or q.group(5)).lower(),
                on=q.group(7),
            )
        where = q.group(8)
        if where:
            parse_predicate(where)  # fail at CREATE time, not first refresh
        window = None
        if q.group(9):
            window = self._parse_window(q.group(9).upper(), q.group(10))
            if self.streams[source].ts_col is None:
                # a CSAS that dropped the source timestamp registers with
                # ts_col=None; failing here (CREATE time) beats an opaque
                # Py4J error at first refresh
                raise KsqlParseError(
                    f"stream {source!r} has no timestamp column, so it "
                    f"cannot drive a WINDOW/EMIT FINAL query — re-create "
                    f"it keeping the source timestamp in the select list, "
                    f"or declare WITH (timestamp='col') on a source stream"
                )
        group_by = [g.strip() for g in self._split_csv(q.group(11))]
        having = q.group(12)
        emit = (q.group(13) or "changes").lower()
        if emit == "final" and window is None:
            raise KsqlParseError(
                "EMIT FINAL requires a WINDOW clause (per-window emission "
                "on close); non-windowed tables are continuous — use EMIT "
                "CHANGES"
            )
        having_text, having_hidden = (None, [])
        if having:
            having_text, having_hidden = self._having_parts(having)
        sink = ExactlyOnceParquetSink(
            os.path.join(self.workdir, "tables", name),
            key_cols=self._key_cols(select_list, group_by, window),
        )
        self.tables[name] = TableSpec(
            name=name, source=source, select=select_list, group_by=group_by,
            window=window, sink=sink,
            checkpoint=os.path.join(self.workdir, "ckpt", name),
            with_opts=with_opts, where=where, having=having,
            having_text=having_text, having_hidden=having_hidden,
            join=join, emit=emit,
        )

    def _create_table_view(self, name: str, sel: str) -> None:
        """``CREATE TABLE t3 AS SELECT items FROM t1 [a] [LEFT|FULL
        [OUTER]] JOIN t2 [b] ON a.k = b.k [WHERE pred] [EMIT CHANGES]``
        — the ksqlDB table-table join (INNER / LEFT / FULL OUTER, the
        three kinds ksqlDB supports), plus the degenerate no-join table
        projection. See TableViewSpec for the changelog-join-as-read-
        time-join argument."""
        _KW = r"JOIN|LEFT|FULL|WHERE|EMIT|ON"
        q = re.match(
            r"SELECT\s+(.*?)\s+FROM\s+(\w+)"
            rf"(?:\s+(?:AS\s+)?(?!(?:{_KW})\b)(\w+))?\s*"
            r"(?:(LEFT\s+(?:OUTER\s+)?|FULL\s+(?:OUTER\s+)?)?JOIN\s+(\w+)"
            rf"(?:\s+(?:AS\s+)?(?!(?:{_KW})\b)(\w+))?"
            r"\s+ON\s+(.*?)\s*)?"
            r"(?:WHERE\s+(.*?)\s*)?"
            r"(?:EMIT\s+CHANGES)?\s*$",
            sel, re.IGNORECASE | re.DOTALL,
        )
        if not q:
            raise KsqlParseError(f"cannot parse table-CTAS SELECT: {sel[:80]!r}")
        select_list = self._split_csv(q.group(1))
        left = q.group(2).lower()
        right = q.group(5).lower() if q.group(5) else None
        kind, lcol, rcol = "inner", None, None
        if right is not None:
            if right not in self.tables:
                raise KsqlParseError(
                    f"JOIN right side {right!r} is not a known table "
                    f"(table-table joins take two materialized tables)"
                )
            raw_kind = (q.group(4) or "").strip().upper()
            kind = ("left" if raw_kind.startswith("LEFT")
                    else "full" if raw_kind.startswith("FULL") else "inner")
            lcol, rcol = self._join_on_sides(
                (q.group(3) or left).lower(),
                (q.group(6) or right).lower(),
                q.group(7),
            )
        where = q.group(8)
        if where:
            parse_predicate(where)
        self.tables[name] = TableViewSpec(
            name=name, left=left, right=right, kind=kind,
            left_col=lcol, right_col=rcol, select=select_list, where=where,
        )

    def _parse_join(self, source_alias: str, kind: str, table: str,
                    table_alias: str, on: str) -> dict:
        """Stream-table join clause: ``[LEFT] JOIN t [alias] ON a.k = b.k``.

        ksqlDB's core enrichment shape (stream rows joined against the
        TABLE'S STATE at processing time). The right side must be a
        ksql table materialized by this engine; the equi-join key is
        resolved by alias when qualified, else by first = stream side.
        """
        if table not in self.tables:
            raise KsqlParseError(
                f"JOIN right side {table!r} is not a known table — "
                f"stream-stream joins need a windowed join (not yet in the "
                f"dialect; use the interval_join operator directly)"
            )
        m = re.match(
            r"\s*(\w+(?:\.\w+)?)\s*=\s*(\w+(?:\.\w+)?)\s*$", on
        )
        if not m:
            raise KsqlParseError(f"cannot parse JOIN ON condition {on!r}")
        sides = {}
        for raw in (m.group(1), m.group(2)):
            parts = raw.lower().split(".")
            if len(parts) == 2:
                qual, col = parts
                if qual == source_alias:
                    sides["left"] = col
                elif qual == table_alias:
                    sides["right"] = col
                else:
                    raise KsqlParseError(
                        f"unknown qualifier {qual!r} in JOIN ON {on!r}"
                    )
            else:
                # unqualified: first name is the stream side, second the table
                sides["left" if "left" not in sides else "right"] = parts[0]
        if "left" not in sides or "right" not in sides:
            raise KsqlParseError(f"JOIN ON must reference both sides: {on!r}")
        return {"table": table, "kind": kind,
                "left_col": sides["left"], "right_col": sides["right"]}

    _AGG_CALL_RE = re.compile(r"\b(\w+)\s*\(", re.IGNORECASE)

    def _having_parts(self, having: str) -> tuple[str, list[tuple[str, str]]]:
        """Split a HAVING clause into (rewritten predicate text, hidden
        aggregate columns). Each aggregate call in the clause is computed
        as a hidden agg column ``_hav<i>`` and its text replaced by that
        column reference; the rewritten text is then an ordinary scalar
        predicate over (aliased + hidden) aggregate output.

        String literals are copied verbatim (the same in-string discipline
        as ``_split_csv``): a clause like ``HAVING label = 'SUM(x)'`` must
        not have its literal rewritten into a hidden column reference."""
        known = set(_AGG_FUNCS) | {"COUNT", "SUM", "MIN", "MAX", "AVG"}
        out, hidden = [], []
        i, n = 0, len(having)
        while i < n:
            if having[i] == "'":
                j = having.find("'", i + 1)
                j = n if j == -1 else j + 1
                out.append(having[i:j])
                i = j
                continue
            m = self._AGG_CALL_RE.match(having, i)
            if m and m.group(1).upper() in known:
                depth, j = 1, m.end()
                while depth and j < n:
                    if having[j] == "(":
                        depth += 1
                    elif having[j] == ")":
                        depth -= 1
                    j += 1
                if depth:
                    raise KsqlParseError(
                        f"unbalanced parens in HAVING: {having!r}"
                    )
                call = having[m.start():j]
                name = f"_hav{len(hidden)}"
                self._agg_expr(call)  # validate now
                hidden.append((name, call))
                out.append(name)
                i = j
                continue
            out.append(having[i])
            i += 1
        text = "".join(out)
        parse_predicate(text)  # syntax check (idents may be _hav<i>)
        return text, hidden

    @staticmethod
    def _parse_window(kind: str, args: str) -> dict:
        # optional trailing ksqlDB grace clause on any window kind: the
        # lateness bound that becomes the Structured Streaming watermark
        # (EMIT FINAL emits a window once the watermark passes end+grace)
        grace = None
        g = re.search(r",\s*GRACE\s+PERIOD\s+(\d+)\s+(\w+)\s*$", args,
                      re.IGNORECASE)
        if g:
            grace = _duration(g.group(1), g.group(2))
            args = args[:g.start()]
        out: dict
        if kind == "TUMBLING":
            m = re.match(r"\s*SIZE\s+(\d+)\s+(\w+)\s*$", args, re.IGNORECASE)
            if not m:
                raise KsqlParseError(f"bad TUMBLING args {args!r}")
            out = {"kind": "tumbling", "size": _duration(m.group(1), m.group(2))}
        elif kind == "HOPPING":
            m = re.match(
                r"\s*SIZE\s+(\d+)\s+(\w+)\s*,\s*ADVANCE\s+BY\s+(\d+)\s+(\w+)\s*$",
                args, re.IGNORECASE,
            )
            if not m:
                raise KsqlParseError(f"bad HOPPING args {args!r}")
            out = {"kind": "hopping",
                   "size": _duration(m.group(1), m.group(2)),
                   "advance": _duration(m.group(3), m.group(4))}
        else:
            m = re.match(r"\s*(\d+)\s+(\w+)\s*$", args, re.IGNORECASE)
            if not m:
                raise KsqlParseError(f"bad SESSION args {args!r}")
            out = {"kind": "session", "gap": _duration(m.group(1), m.group(2))}
        if grace is not None:
            out["grace"] = grace
        return out

    def _key_cols(self, select_list, group_by, window) -> list[str]:
        keys = []
        if window is not None:
            keys.append("window_start")
        for item in select_list:
            alias = self._alias_of(item)
            expr = self._expr_of(item).strip()
            if self._is_group_key(expr, group_by) or expr.upper() == "WINDOWSTART":
                if alias not in keys:
                    keys.append(alias)
        return keys or ["id"]

    @staticmethod
    def _alias_of(item: str) -> str:
        m = re.match(r"(.*)\s+AS\s+(\w+)\s*$", item.strip(), re.IGNORECASE | re.DOTALL)
        if m:
            return m.group(2).lower()
        e = item.strip().lower()
        if re.fullmatch(r"\w+\.\w+", e):
            # qualified item without AS (SELECT o.oid ...): default the
            # alias to the base name after the qualifier, matching the
            # expression parser's resolution rule — a dotted output
            # column would be unreadable by F.col / pull queries
            return e.split(".")[-1]
        return e

    @staticmethod
    def _expr_of(item: str) -> str:
        m = re.match(r"(.*)\s+AS\s+(\w+)\s*$", item.strip(), re.IGNORECASE | re.DOTALL)
        return (m.group(1) if m else item).strip()

    @staticmethod
    def _is_group_key(expr: str, group_by: list[str]) -> bool:
        return any(expr.strip().lower() == g.strip().lower() for g in group_by)

    # -- query building ------------------------------------------------------

    def _stream_df(self, spec: StreamSpec, streaming: bool) -> DataFrame:
        reader = self.spark.readStream if streaming else self.spark.read
        if spec.fmt == "parquet":
            # derived (CSAS) stream: parquet files written by the file
            # sink, whose _spark_metadata manifest makes downstream reads
            # exactly-once; schema was fixed at CREATE time
            df = reader.schema(spec.schema).parquet(spec.path)
        elif spec.fmt == "csv":
            # value_format='delimited': one CSV line per record, decoded
            # against the declared schema (same raw-bytes->parse chain as
            # the JSON wire; NaN rides as the literal 'NaN', null as the
            # empty field)
            ddl = ", ".join(
                f"{f.name} {f.dataType.simpleString()}"
                for f in spec.schema.fields
            )
            raw = reader.format("text").load(spec.path)
            df = (
                raw.select(F.from_csv(F.col("value"), ddl).alias("r"))
                .select("r.*")
            )
        else:
            # the Kafka-parity decode chain: raw bytes -> string -> from_json
            raw = reader.format("text").load(spec.path)
            df = (
                raw.select(F.from_json(F.col("value").cast("string"),
                                       spec.schema).alias("r"))
                .select("r.*")
            )
        for fname in spec.feeders:
            # INSERT INTO ... SELECT rows union in (missing columns —
            # e.g. the synthetic rowtime — fill with null)
            df = df.unionByName(
                self._stream_df(self.streams[fname], streaming),
                allowMissingColumns=True,
            )
        return df

    def _rebase_downstream(self, stream_name: str,
                           _seen: Optional[set] = None) -> None:
        """Reset the maintenance state of every CTAS/CSAS reading
        ``stream_name``. Called when the stream's SOURCE SET changes (an
        INSERT INTO feeder registered, or a never-materialized feeder
        cascade-removed): Structured Streaming pins a checkpoint to its
        exact source list and refuses to resume when the unioned feeder
        count changes ("There are [N] sources in the checkpoint offsets
        and now there are [M]"). Sources are replayable files, so a fresh
        checkpoint + empty sink recomputes the identical table from
        offset 0 — correctness by recomputation instead of resume.
        TERMINATEd consumers keep their frozen state untouched."""
        import shutil

        seen = _seen if _seen is not None else set()
        if stream_name in seen:
            return
        seen.add(stream_name)
        for t, ts in self.tables.items():
            if isinstance(ts, TableViewSpec):
                continue  # read-time join: parents rebase themselves
            if ts.source == stream_name and f"ctas_{t}" not in self.terminated:
                shutil.rmtree(ts.checkpoint, ignore_errors=True)
                shutil.rmtree(ts.sink.path, ignore_errors=True)
        for d, dsp in self.derived.items():
            if (dsp.source == stream_name
                    or (dsp.join and dsp.join.get("stream") == stream_name)) \
                    and f"csas_{d}" not in self.terminated:
                shutil.rmtree(dsp.checkpoint, ignore_errors=True)
                out = self.streams[d]
                shutil.rmtree(out.path, ignore_errors=True)
                os.makedirs(out.path, exist_ok=True)
                self._rebase_downstream(d, seen)
        # a stream that CONSUMES stream_name as an INSERT feeder reads it
        # through StreamSpec.feeders, not a derived source edge — when the
        # feeder's output is wiped and recomputed (new file names), the
        # target's readers would re-ingest the rewritten files on top of
        # their old checkpoints and double-count, so rebase them too
        for tname, sp in self.streams.items():
            if stream_name in sp.feeders:
                self._rebase_downstream(tname, seen)

    def _refresh_upstreams(self, name: str) -> None:
        """Bring a stream's inputs up to date: its own CSAS transform (if
        derived) and any INSERT INTO ... SELECT feeders."""
        if name in self.derived:
            self.refresh_stream(name)
        for f in self.streams[name].feeders:
            if f in self.derived:  # data-only feeders never refresh
                self.refresh_stream(f)

    def _build_agg(self, spec: TableSpec, df: DataFrame) -> DataFrame:
        stream_spec = self.streams[spec.source]
        ts = stream_spec.ts_col
        if spec.join is not None:
            # ksqlDB stream-table join semantics: each stream record joins
            # against the table's state AT PROCESSING TIME (later table
            # updates do not retro-update already-processed records —
            # exactly what the checkpointed incremental refresh gives us).
            # The right side is the materialized aggregate: tiny, so it is
            # broadcast — a stream-static broadcast join, no state store.
            right = self._read_table(self.tables[spec.join["table"]])
            lcol, rcol = spec.join["left_col"], spec.join["right_col"]
            if lcol == rcol:
                df = df.join(F.broadcast(right), on=lcol,
                             how=spec.join["kind"])
            else:
                right = right.withColumnRenamed(rcol, lcol)
                df = df.join(F.broadcast(right), on=lcol,
                             how=spec.join["kind"])
        if spec.where:
            # the predicate over the (joined) stream row — pushed below the
            # aggregation, and below the join where only left columns are
            # referenced, by Catalyst
            df = df.filter(parse_predicate(spec.where))
        if spec.emit == "final":
            # EMIT FINAL: append output mode requires a watermark; the
            # window's GRACE PERIOD is the lateness bound (default 0 —
            # windows close as soon as event time passes them)
            df = df.withWatermark(ts, spec.window.get("grace", "0 seconds"))
        group_cols: list[Column] = []
        key_aliases: list[tuple[str, Column]] = []
        window_col = None
        if spec.window is not None:
            w = spec.window
            if w["kind"] == "tumbling":
                window_col = F.window(F.col(ts), w["size"])
            elif w["kind"] == "hopping":
                window_col = F.window(F.col(ts), w["size"], w["advance"])
            else:
                window_col = F.session_window(F.col(ts), w["gap"])
            group_cols.append(window_col.alias("window"))
        for g in spec.group_by:
            group_cols.append(self._scalar_expr(g))

        aggs: list[Column] = []
        selects: list[Column] = []
        for item in spec.select:
            alias = self._alias_of(item)
            expr = self._expr_of(item)
            if expr.upper() == "WINDOWSTART":
                selects.append(F.col("window.start").alias(alias))
            elif expr.upper() == "WINDOWEND":
                selects.append(F.col("window.end").alias(alias))
            elif self._is_group_key(expr, spec.group_by):
                selects.append(self._scalar_expr(expr).alias(alias))
            else:
                aggs.append(self._agg_expr(expr).alias(alias))
                selects.append(F.col(alias))
        if spec.having_hidden:
            # HAVING is NOT applied here. A per-micro-batch filter in update
            # output mode loses non-monotone predicates: a group that passed
            # in an earlier batch (row already in the sink) and later fails
            # is merely absent from later emissions, so the sink keeps
            # serving the stale passing row (ksqlDB tombstones such groups).
            # Instead the UNFILTERED aggregate — including the hidden _hav
            # columns — flows to the sink, and _read_table evaluates the
            # predicate against each key's CURRENT aggregate values.
            aggs.extend(
                self._agg_expr(call).alias(nm)
                for nm, call in spec.having_hidden
            )
            selects.extend(F.col(nm) for nm, _ in spec.having_hidden)
        agg = df.groupBy(*group_cols).agg(*aggs) if aggs else df.groupBy(*group_cols).count()
        if spec.window is not None and not any(
            self._alias_of(i) == "window_start" for i in spec.select
        ):
            selects.insert(0, F.col("window.start").alias("window_start"))
        return agg.select(*selects)

    def _scalar_expr(self, expr: str) -> Column:
        e = expr.strip()
        if e.startswith("'") and e.endswith("'"):
            return F.lit(e[1:-1])
        if re.fullmatch(r"\d+\.?\d*|\.\d+", e):
            # bare numeric literal (e.g. a constant UDAF weight arg) —
            # must not fall into the column branch (\w+ matches digits)
            return F.lit(float(e) if "." in e else int(e))
        if re.fullmatch(r"\w+", e):
            return F.col(e.lower())
        # arithmetic over columns/literals: val * 2, (a + b) / 2, ...
        return parse_scalar(e)

    def _agg_expr(self, expr: str) -> Column:
        m = re.match(r"(\w+)\s*\((.*)\)\s*$", expr.strip(), re.DOTALL)
        if not m:
            raise KsqlParseError(f"unsupported aggregate expression {expr!r}")
        fname = m.group(1).upper()
        raw_args = [a.strip() for a in self._split_csv(m.group(2))] if m.group(2).strip() else []
        # value args may be arbitrary arithmetic (SKEWNESS(val * 2));
        # trailing TRUE/FALSE literals are UDAF init-args, not columns
        cols = [
            self._scalar_expr(a) for a in raw_args
            if a.upper() not in ("TRUE", "FALSE") and a != "*"
        ]
        if fname in _AGG_FUNCS:
            return _AGG_FUNCS[fname](cols, raw_args)
        simple = {"COUNT": F.count, "SUM": F.sum, "MIN": F.min,
                  "MAX": F.max, "AVG": F.avg}
        if fname in simple:
            if not raw_args or raw_args[0] == "*":
                return simple[fname](F.lit(1))
            return simple[fname](cols[0])
        raise KsqlParseError(f"unknown function {fname}")

    # -- materialization / pull queries --------------------------------------

    def refresh(self, table: str) -> None:
        """Drain currently-available stream records into the materialized
        table (availableNow trigger on the shared checkpoint — the bounded
        analogue of ksqlDB's continuous EMIT CHANGES query; each call
        resumes incrementally, reprocessing nothing)."""
        if f"ctas_{table}" in self.terminated:
            # the maintenance query was TERMINATEd: serve the last
            # materialized state, drain nothing (ksqlDB semantics)
            return
        spec = self.tables[table]
        if isinstance(spec, TableViewSpec):
            # table view / table-table join: refresh the parents; the
            # join itself runs at read time over their current state
            self.refresh(spec.left)
            if spec.right is not None:
                self.refresh(spec.right)
            return
        if spec.join is not None:
            # bring the join table up to date first, so this refresh joins
            # against its current state (ksqlDB keeps both continuously
            # maintained; availableNow refreshes in dependency order)
            self.refresh(spec.join["table"])
        # propagate upstream CSAS transforms and INSERT..SELECT feeders
        # before draining the source
        self._refresh_upstreams(spec.source)
        if self._needs_batch_materialization(spec):
            # Session windows grouped ONLY by literals constant-fold to a
            # "global session aggregation", which Structured Streaming
            # rejects outright. Recompute the full aggregate from the
            # stream directory as a batch and overwrite the materialized
            # table — correct for any input (sessions that merge or extend
            # across refreshes replace their old rows wholesale).
            df = self._build_agg(
                spec, self._stream_df(self.streams[spec.source], streaming=False)
            )
            df.coalesce(1).write.mode("overwrite").parquet(
                os.path.join(spec.sink.path, "batch_full")
            )
            return
        stream = self._stream_df(self.streams[spec.source], streaming=True)
        # session windows can merge previously-emitted windows, so Spark
        # forbids update mode for them; complete mode re-emits the whole
        # (small, windows x keys) aggregate each batch and the sink's
        # latest-per-key read keeps pull queries consistent. EMIT FINAL
        # uses append: a window's single row is emitted only when the
        # watermark closes it.
        if spec.emit == "final":
            mode = "append"
        elif spec.window and spec.window["kind"] == "session":
            mode = "complete"
        else:
            mode = "update"
        q = run_streaming_stats(
            stream, spec.sink, spec.checkpoint,
            lambda df: self._build_agg(spec, df),
            output_mode=mode, query_name=f"ksql_{table}",
        )
        if not q.awaitTermination(300):
            q.stop()
            raise RuntimeError(
                f"refresh of table {table!r} did not finish within 300s; "
                f"the materialized state is incomplete"
            )

    def _needs_batch_materialization(self, spec: TableSpec) -> bool:
        all_literal_keys = all(
            g.strip().startswith("'") for g in spec.group_by
        )
        return (spec.window is not None
                and spec.window["kind"] == "session"
                and all_literal_keys)

    def _read_table(self, spec) -> DataFrame:
        if isinstance(spec, TableViewSpec):
            return self._read_table_view(spec)
        if self._needs_batch_materialization(spec):
            df = self.spark.read.parquet(
                os.path.join(spec.sink.path, "batch_full")
            )
        elif spec.window and spec.window["kind"] == "session":
            # complete output mode: every batch re-emits the whole
            # aggregate — the latest batch IS the table. latest-per-key
            # across batches would resurrect sessions merged away by a
            # later batch (r2 ADVICE finding).
            df = spec.sink.read_latest_batch(self.spark)
        else:
            df = spec.sink.read_current(self.spark)
        if spec.having_text is not None:
            # table membership = the predicate over each key's CURRENT
            # aggregate values (after latest-per-key resolution), so a
            # group transitioning pass -> fail disappears — the read-side
            # equivalent of ksqlDB's tombstone for groups leaving the
            # result set. Hidden _hav columns are internal and dropped.
            df = df.filter(parse_predicate(spec.having_text))
            df = df.drop(*[nm for nm, _ in spec.having_hidden])
        return df

    def _read_table_view(self, spec: TableViewSpec) -> DataFrame:
        left = self._read_table(self.tables[spec.left])
        if spec.right is not None:
            right = self._read_table(self.tables[spec.right])
            lcol, rcol = spec.left_col, spec.right_col
            if rcol != lcol:
                right = right.withColumnRenamed(rcol, lcol)
            how = {"inner": "inner", "left": "left",
                   "full": "full_outer"}[spec.kind]
            # join-by-name: one key column in the output (coalesced for
            # FULL OUTER, ksqlDB's table-key semantics). Both sides are
            # materialized aggregates — small relative to their source
            # streams — so Catalyst/AQE picks broadcast when one fits.
            df = left.join(right, on=lcol, how=how)
        else:
            df = left
        if spec.where:
            df = df.filter(parse_predicate(spec.where))
        items = [s.strip() for s in spec.select]
        if items == ["*"]:
            return df
        return df.select(
            *[
                self._scalar_expr(self._expr_of(i)).alias(self._alias_of(i))
                for i in items
            ]
        )

    def _pull_query(self, stmt: str) -> list[dict]:
        m = re.match(
            r"SELECT\s+(\*|[\w\s,]+?)\s+FROM\s+(\w+)\s*"
            r"(?:WHERE\s+(.+?))?\s*"
            r"(?:LIMIT\s+(\d+))?\s*$",
            stmt, re.IGNORECASE | re.DOTALL,
        )
        if not m:
            raise KsqlParseError(f"cannot parse pull query: {stmt[:80]!r}")
        name = m.group(2).lower()
        spec = self.tables.get(name)
        if spec is None:
            raise KsqlParseError(f"unknown table {name!r}")
        self.refresh(name)
        df = self._read_table(spec)
        if m.group(3):
            df = df.filter(parse_predicate(m.group(3)))
        if m.group(1).strip() != "*":
            df = df.select(*[c.strip().lower() for c in m.group(1).split(",")])
        if m.group(4):
            # ksqlDB pull-query LIMIT: cap the rows returned (compiles to a
            # Spark limit — CollectLimit, no full materialization)
            df = df.limit(int(m.group(4)))
        rows = []
        for r in df.collect():
            d = r.asDict()
            # JSON wire convention: NaN serializes as null
            rows.append({k: (None if isinstance(v, float) and math.isnan(v) else v)
                         for k, v in d.items()})
        return rows


def _bool_arg(raw_args: list[str], idx: int) -> bool:
    return len(raw_args) > idx and raw_args[idx].upper() == "TRUE"


_AGG_FUNCS = {
    # reference names and init-arg dispatch (UdafMetadata scan surface):
    # c = parsed Column args (arithmetic allowed), a = raw token strings
    # (for the literal TRUE/FALSE isSample init-arg)
    "SKEWNESS": lambda c, a: SA.skewness(c[0], sample=_bool_arg(a, 1)),
    "KURTOSIS": lambda c, a: SA.kurtosis(c[0], sample=_bool_arg(a, 1)),
    "STDDEV_WEIGHTED": lambda c, a: SA.stddev_weighted(c[0], c[1]),
    "SKEWNESS_WEIGHTED": lambda c, a: SA.skewness_weighted(c[0], c[1]),
    "KURTOSIS_WEIGHTED": lambda c, a: SA.kurtosis_weighted(c[0], c[1]),
}
