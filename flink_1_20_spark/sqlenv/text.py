"""Shared text/type helpers and the TableMeta model of the
executeSql surface — the module prelude of sql_ddl.py, split out in r10
(pure move).  Everything here is dependency-free of TableEnvironment.
"""


from __future__ import annotations

import os
import re
import shutil
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

# ------------------------------------------------------------------ types

_SIMPLE_TYPES = {
    "STRING": "string",
    "BYTES": "binary",
    "VARBINARY": "binary",
    "BINARY": "binary",
    "INT": "int",
    "INTEGER": "int",
    "BIGINT": "bigint",
    "SMALLINT": "smallint",
    "TINYINT": "tinyint",
    "DOUBLE": "double",
    "DOUBLE PRECISION": "double",
    "FLOAT": "float",
    "REAL": "float",
    "BOOLEAN": "boolean",
    "DATE": "date",
}


def flink_type_to_spark(t: str) -> str:
    """Map a Flink SQL type name to the Spark DDL type string."""
    s = t.strip()
    u = s.upper()
    u = re.sub(r"\s+NOT\s+NULL$", "", u)
    s = s[: len(u)]  # keep original casing for nested payloads
    if u in _SIMPLE_TYPES:
        return _SIMPLE_TYPES[u]
    m = re.match(r"(?:TIMESTAMP|TIMESTAMP_LTZ)\s*(?:\(\d+\))?(?:\s+WITH(?:OUT)?\s+(?:LOCAL\s+)?TIME\s+ZONE)?$", u)
    if m:
        return "timestamp"
    m = re.match(r"TIME\s*(?:\(\d+\))?$", u)
    if m:  # no TimeType in Spark — nanos-of-day emulation (functions/compat.py)
        return "bigint"
    m = re.match(r"(?:DECIMAL|NUMERIC|DEC)\s*\((\d+)\s*,\s*(\d+)\)$", u)
    if m:
        return f"decimal({m.group(1)},{m.group(2)})"
    m = re.match(r"(?:CHAR|VARCHAR)\s*(?:\(\d+\))?$", u)
    if m:
        return "string"
    m = re.match(r"ARRAY\s*<(.*)>$", u, re.S)
    if m:
        return f"array<{flink_type_to_spark(m.group(1))}>"
    m = re.match(r"MAP\s*<(.*)>$", u, re.S)
    if m:
        k, v = _split_top(m.group(1), ",")
        return f"map<{flink_type_to_spark(k)},{flink_type_to_spark(v)}>"
    m = re.match(r"ROW\s*<(.*)>$", u, re.S)
    if m:
        fields = []
        for f in _split_top_all(m.group(1), ","):
            name, typ = f.strip().split(None, 1)
            fields.append(f"{name.lower()}:{flink_type_to_spark(typ)}")
        return "struct<" + ",".join(fields) + ">"
    raise ValueError(f"unsupported Flink type: {t!r}")


_GENERIC_HEADS = ("ARRAY", "MAP", "ROW", "MULTISET")
# Spark-side TYPE strings additionally use STRUCT<...>. STRUCT is NOT in
# the default head set: _split_top_all also splits DDL column lists,
# where a COLUMN named `struct` compared with `<` in a computed-column
# expression must stay a comparison (third-review finding — adding
# STRUCT globally merged column defs).  Only the type-string call sites
# pass this extended set.
_GENERIC_HEADS_TYPES = _GENERIC_HEADS + ("STRUCT",)


def _split_top_all(s: str, sep: str, heads=_GENERIC_HEADS) -> list[str]:
    """Split on `sep` at paren/angle-bracket depth 0, quote-aware.

    `<` opens a bracket only when it directly follows a generic type
    head (`heads`, default ARRAY/MAP/ROW/MULTISET) — comparison
    operators in computed column expressions (`a >= b`, `a < b`) stay
    literal; `>` closes only while a generic is open."""
    out, pdepth, adepth, cur, i, q = [], 0, 0, [], 0, None
    while i < len(s):
        ch = s[i]
        if q:
            cur.append(ch)
            if ch == q:
                q = None
        elif ch in "'\"`":
            q = ch
            cur.append(ch)
        elif ch == "(":
            pdepth += 1
            cur.append(ch)
        elif ch == ")":
            pdepth -= 1
            cur.append(ch)
        elif ch == "<":
            head = re.search(r"(\w+)\s*$", "".join(cur))
            if head and head.group(1).upper() in heads or adepth > 0:
                adepth += 1
            cur.append(ch)
        elif ch == ">":
            if adepth > 0:
                adepth -= 1
            cur.append(ch)
        elif ch == sep and pdepth == 0 and adepth == 0:
            out.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
        i += 1
    if cur:
        out.append("".join(cur))
    return out


def _split_top(s: str, sep: str, heads=_GENERIC_HEADS) -> tuple[str, str]:
    parts = _split_top_all(s, sep, heads)
    return parts[0], sep.join(parts[1:])


def spark_type_to_flink(t: str) -> str:
    """Inverse of flink_type_to_spark for SHOW CREATE TABLE emission.

    TableMeta stores column types as SPARK DDL strings; uppercasing is
    valid Flink DDL for every scalar/array/map type, but a struct must
    come back as ``ROW<name TYPE, ...>`` — found by the r10 DDL
    round-trip property test: SHOW CREATE emitted ``STRUCT<X:INT>``,
    which neither Flink nor this module's own parser re-executes
    (Flink's SHOW CREATE prints re-executable DDL,
    ShowCreateUtil.buildShowCreateTableRow).  Documented fidelity
    losses (not retained in TableMeta): TIMESTAMP / CHAR / VARCHAR
    length-precision re-emit unparameterized; a declared TIME column
    (stored as BIGINT nanos-of-day, the module's documented emulation)
    re-emits as BIGINT — the emulation IS the engine's type for it.
    `binary` re-emits as BYTES: in real Flink DDL a bare BINARY means
    BINARY(1), which would truncate on re-execution (third-review
    finding)."""
    s = t.strip()
    if s.lower() == "binary":
        return "BYTES"
    m = re.match(r"array\s*<(.*)>$", s, re.I | re.S)
    if m:
        return f"ARRAY<{spark_type_to_flink(m.group(1))}>"
    m = re.match(r"map\s*<(.*)>$", s, re.I | re.S)
    if m:
        k, v = _split_top(m.group(1), ",", _GENERIC_HEADS_TYPES)
        return f"MAP<{spark_type_to_flink(k)}, {spark_type_to_flink(v)}>"
    m = re.match(r"struct\s*<(.*)>$", s, re.I | re.S)
    if m:
        fields = []
        for f in _split_top_all(m.group(1), ",", _GENERIC_HEADS_TYPES):
            nm, typ = f.strip().split(":", 1)
            fields.append(f"{nm} {spark_type_to_flink(typ)}")
        return "ROW<" + ", ".join(fields) + ">"
    return s.upper()


def _split_on_where(text: str) -> tuple[str, str | None]:
    """Split at the first WHERE keyword OUTSIDE string literals AND at
    paren depth 0 — `SET note = 'a WHERE b'` must not split inside the
    literal, and `SET a = (SELECT x FROM u WHERE u.k = t.k)` must not
    split at the subquery's inner WHERE.  Double-quoted literals and
    backticked identifiers are excluded from BOTH the WHERE scan and
    the paren count (an unbalanced '(' inside "a(b" must not wedge the
    depth)."""
    parts = re.split(r"('(?:[^']|'')*'|\"[^\"]*\"|`[^`]*`)", text)
    depth = 0
    consumed = 0  # characters of `text` before the current part
    for i, part in enumerate(parts):
        if i % 2:  # string literal: parens inside are text
            consumed += len(part)
            continue
        for m in re.finditer(r"[()]|\sWHERE\s", part, re.I):
            tok = m.group(0)
            if tok == "(":
                depth += 1
            elif tok == ")":
                depth -= 1
            elif depth == 0:
                before = text[: consumed + m.start()]
                after = text[consumed + m.end() :]
                return before, after
        consumed += len(part)
    return text, None


def _leading_cte_names(query: str) -> tuple[list[str], bool]:
    """(names, complete) for a leading WITH clause: `names` are the
    declared CTE names (backtick-quoted supported; column-list CTEs
    `name (a,b) AS` too), `complete` is True when parsing consumed the
    whole prologue (the remainder starts the main query).  Callers must
    treat complete=False as "unknown CTEs exist" and fail safe — a
    truncated list would silently disarm scope guards for the CTEs it
    missed.  ([], True) when the statement does not start with WITH."""
    m = re.match(r"\s*WITH\s+(?:RECURSIVE\s+)?", query, re.I)
    if not m:
        return [], True
    names, i = [], m.end()
    while True:
        nm = re.match(
            r"\s*(?:([A-Za-z_]\w*)|`([^`]+)`)\s*(?:\([^)]*\)\s*)?AS\s*\(",
            query[i:],
            re.I,
        )
        if not nm:
            break
        names.append((nm.group(1) or nm.group(2)).lower())
        # skip the balanced CTE body
        depth, j, q = 0, i + nm.end() - 1, None
        while j < len(query):
            ch = query[j]
            if q:
                if ch == q:
                    q = None
            elif ch in "'\"`":
                q = ch
            elif ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0:
                    break
            j += 1
        i = j + 1
        c = re.match(r"\s*,", query[i:])
        if not c:
            break
        i += c.end()
    complete = bool(
        names and re.match(r"\s*(SELECT|VALUES|\()", query[i:], re.I)
    )
    return names, complete


_FROM_LIST_STOP = re.compile(
    r"(?i)\b(WHERE|GROUP|HAVING|ORDER|LIMIT|WINDOW|QUALIFY|UNION|"
    r"EXCEPT|INTERSECT|JOIN|INNER|LEFT|RIGHT|FULL|CROSS|NATURAL|ON|"
    r"USING|MATCH_RECOGNIZE)\b"
)


def _mask_quoted(s: str) -> str:
    """Same-length copy of `s` with every quoted region Spark SQL
    recognizes (single-/double-quoted literals with backslash escapes,
    backticked identifiers) blanked to spaces.  Length-preserving so
    positions found in the mask index straight into the original."""
    parts = re.split(
        r"('(?:[^'\\]|\\.|'')*'|\"(?:[^\"\\]|\\.|\"\")*\"|`[^`]*`)", s
    )
    return "".join(p if i % 2 == 0 else " " * len(p) for i, p in enumerate(parts))


def _mask_string_literals(s: str) -> str:
    """Same-length copy with only the STRING-literal forms blanked
    (single-/double-quoted; backslash escapes honored).  Backticked
    identifiers survive: they are table references, and blanking them
    would under-match — the direction the CTE scope guard must never
    take.  A literal, by contrast, can never be a table reference."""
    parts = re.split(r"('(?:[^'\\]|\\.|'')*'|\"(?:[^\"\\]|\\.|\"\")*\")", s)
    return "".join(p if i % 2 == 0 else " " * len(p) for i, p in enumerate(parts))


def _blank_comments(s: str) -> str:
    """Same-length copy of `s` with SQL comments blanked to spaces —
    both `-- ...` line comments (newlines kept, so `\\s+` regexes cross
    the former comment) and `/* ... */` bracketed comments, which Spark
    parses NESTED (SPARK-28880), so depth is tracked.

    SINGLE-PASS lexer (r10 review finding): quotes and comments
    interact both ways — a comment marker inside a string literal is
    content, AND a quote inside a comment (the apostrophe in
    `/* it's */`) must not open a string.  The earlier mask-quotes-
    then-scan form got the second direction wrong: the apostrophe
    paired with a later real literal, the masked region swallowed the
    comment terminator, and real SQL was blanked to end-of-string —
    silently disarming the CTE scope guard.  An unterminated bracketed
    comment blanks to end-of-string (the parser would reject the
    statement anyway; the guard must still not see its text)."""
    out = list(s)
    i, n = 0, len(s)
    while i < n:
        ch = s[i]
        if ch in ("'", '"'):
            # string literal: honor backslash escapes and doubled quotes
            j = i + 1
            while j < n:
                if s[j] == "\\":
                    j += 2
                    continue
                if s[j] == ch:
                    if j + 1 < n and s[j + 1] == ch:
                        j += 2
                        continue
                    break
                j += 1
            i = min(j + 1, n)
        elif ch == "`":
            j = s.find("`", i + 1)
            i = n if j < 0 else j + 1
        elif ch == "-" and s[i : i + 2] == "--":
            j = s.find("\n", i)
            j = n if j < 0 else j
            out[i:j] = " " * (j - i)
            i = j
        elif ch == "/" and s[i : i + 2] == "/*":
            depth, j = 1, i + 2
            while j < n and depth:
                if s[j : j + 2] == "/*":
                    depth += 1
                    j += 2
                elif s[j : j + 2] == "*/":
                    depth -= 1
                    j += 2
                else:
                    j += 1
            out[i:j] = " " * (j - i)
            i = j
        else:
            i += 1
    return "".join(out)




def _from_comma_tables(text: str) -> set[str]:
    """Lowercased head identifiers of every TOP-LEVEL FROM-list item
    (``FROM a, b`` → {a, b}) anywhere in `text`, with line comments
    stripped.  Complements the ``FROM/JOIN <name>`` regex in the set-op
    CTE scope guard — a comma-joined CTE reference (``... FROM x,
    cte``) or a comment-separated head (``FROM -- x\\n cte``) would
    otherwise slip past it and silently bind to a same-named registered
    table.  Paren-depth aware (subquery commas don't split items);
    scanning a FROM list stops at the first depth-0 clause keyword.
    Over-matching is acceptable here — the guard fails SAFE by raising
    a clear unsupported-scope error — under-matching is not.  FROM
    anchors are located on a comment-blanked, quote-masked copy (r10):
    a literal containing 'FROM <cte-name>' must not add a phantom head
    (that direction falsely REJECTS valid queries), and a FROM inside a
    line comment is not a FROM list.  Segments are scanned on the
    comment-blanked original so backticked/quoted names survive."""
    out: set[str] = set()
    scan = _blank_comments(text)
    for m in re.finditer(r"\bFROM\b", _mask_quoted(scan), re.I):
        seg = scan[m.end():]
        depth, i = 0, 0
        items: list[list[str]] = [[]]
        while i < len(seg):
            ch = seg[i]
            if ch == "(":
                depth += 1
            elif ch == ")":
                if depth == 0:
                    break
                depth -= 1
            elif ch in "'\"`":
                # copy the whole quoted token verbatim: skipping it
                # would DROP a backticked table name from its item —
                # the under-match this guard must never have. Commas
                # and parens inside are never scanned, so they can't
                # split items or shift depth. The string forms honor
                # backslash escapes (Spark's default parser does): a
                # naive find() would end the token at \' and a phantom
                # quoted region could then swallow a real comma + name.
                j = i + 1
                while j < len(seg):
                    if ch != "`" and seg[j] == "\\":
                        j += 2
                        continue
                    if seg[j] == ch:
                        break
                    j += 1
                j = min(j, len(seg) - 1)
                items[-1].extend(seg[i : j + 1])
                i = j + 1
                continue
            # (no comment branch: `scan` is already comment-blanked —
            # both -- and /* */ forms — by _blank_comments above)
            elif depth == 0:
                if ch == ",":
                    items.append([])
                    i += 1
                    continue
                k = _FROM_LIST_STOP.match(seg, i)
                if k and not (i > 0 and (seg[i - 1].isalnum() or seg[i - 1] == "_")):
                    break
            items[-1].append(ch)
            i += 1
        # items[0] (directly after FROM) is included too: the FROM/JOIN
        # regex fallback cannot cross a line comment (`FROM -- x\n cte`),
        # and this scan strips comments — over-reporting a head name is
        # harmless (the guard fails safe), missing one is not
        for item in items:
            t = re.match(r"\s*`?([A-Za-z_][\w$]*)`?", "".join(item).strip())
            if t:
                out.add(t.group(1).lower())
    return out


def parse_watermark_delay(col: str, delay: str) -> str:
    """WATERMARK FOR <col> AS <expr> → the Spark withWatermark delay
    string.  A bounded-delay expression (``<col> - INTERVAL '<n>'
    <unit>``) maps to the interval; SOURCE_WATERMARK()
    (connector-provided — the monitored-dir source has none of its own)
    and the strictly-ascending form (``AS <col>``) map to ``0
    seconds``.  Any OTHER expression raises: silently tightening an
    unrecognized strategy (a UDF, arithmetic the INTERVAL regex misses)
    to 0 seconds would drop late rows the declared strategy accepts.  A
    redundant outer-paren form ``(<col> - INTERVAL '<n>' <unit>)`` is
    accepted (r10): the parens change nothing semantically, and DDL
    written that way used to register before the r9 fail-safe
    tightening.  Shared by _apply_watermark and every consumer that
    needs a declared delay as a STRING (the streaming temporal join's
    per-input watermarks) — a loose INTERVAL-token search there would
    silently miss the two zero-delay forms (r11 review find)."""
    d = delay.strip().rstrip(";").strip()
    # strip BALANCED redundant outer parens only: "(a) - (b)" must not
    # lose its first "(" — require the opening paren to close at the end
    while d.startswith("(") and d.endswith(")"):
        depth = 0
        for i, ch in enumerate(d):
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0 and i < len(d) - 1:
                    break
        else:
            d = d[1:-1].strip()
            continue
        break
    # the bounded-delay form is matched EXACTLY (`<col> - INTERVAL '<n>'
    # <unit>`), never by searching for an INTERVAL token: a chained
    # `ts - INTERVAL '10' MINUTE - INTERVAL '30' SECOND` or a delay
    # anchored on a DIFFERENT column would otherwise silently apply the
    # first interval to `col` — a tighter/wrong watermark that drops
    # late rows the declared strategy accepts
    wm = re.fullmatch(
        rf"`?{re.escape(col)}`?\s*-\s*INTERVAL\s+'([^']+)'\s+(\w+)", d, re.I
    )
    if wm:
        return f"{wm.group(1)} {wm.group(2).lower()}"
    if re.fullmatch(r"SOURCE_WATERMARK\s*\(\s*\)", d, re.I) or re.fullmatch(
        rf"`?{re.escape(col)}`?", d, re.I
    ):
        return "0 seconds"
    raise ValueError(
        f"unsupported watermark strategy {delay!r} for column {col!r} — "
        "supported: '<col> - INTERVAL '<n>' <unit>' (bounded delay), "
        "SOURCE_WATERMARK(), or the strictly-ascending '<col>' form; "
        "other expressions cannot be mapped onto a Spark watermark "
        "without changing which late rows are accepted"
    )


def _apply_watermark(df, col: str, delay: str):
    """WATERMARK FOR <col> AS <expr> → Spark withWatermark (see
    parse_watermark_delay for the accepted strategy forms)."""
    return df.withWatermark(col, parse_watermark_delay(col, delay))


def _scan_streaming_setops(query: str) -> list[tuple[int, int, str, bool]]:
    """Every paren-depth-0 set operator in `query`, in order:
    (start, end, 'INTERSECT'|'EXCEPT', is_all).  A SET OPERATOR is
    followed by a query — `SELECT * EXCEPT(col)` projections, comment
    text, and quoted identifiers never match."""
    found = []
    depth, q, i = 0, None, 0
    while i < len(query):
        ch = query[i]
        if q:
            if ch == q:
                q = None
        elif ch in "'\"`":
            q = ch
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif depth == 0 and ch in "IiEe":
            m = re.match(
                r"(INTERSECT|EXCEPT)\b(\s+(?:ALL|DISTINCT)\b)?"
                r"(?=\s*\(?\s*SELECT\b)",
                query[i:],
                re.I,
            )
            if m and (i == 0 or not (query[i - 1].isalnum() or query[i - 1] == "_")):
                found.append(
                    (
                        i,
                        i + m.end(),
                        m.group(1).upper(),
                        (m.group(2) or "").strip().upper() == "ALL",
                    )
                )
                i += m.end()
                continue
        i += 1
    return found


# ------------------------------------------------------------------ model


@dataclass
class TableMeta:
    name: str
    connector: str
    options: dict[str, str]
    columns: list[tuple[str, str]] = field(default_factory=list)  # (name, spark type)
    computed: list[tuple[str, str]] = field(default_factory=list)  # (name, sql expr)
    watermark: tuple[str, str] | None = None  # (col, delay expr sql)
    primary_key: list[str] = field(default_factory=list)
    partitioned_by: list[str] = field(default_factory=list)
    # ANALYZE TABLE results (CatalogTableStatistics parity): row_count,
    # size_bytes, and per-column stats; None until analyzed, reset on
    # writes so a grown table can never keep a stale broadcast verdict
    stats: dict | None = None
    # ALTER TABLE RENAME COLUMN bookkeeping: current name -> name in the
    # underlying files (existing data keeps its physical column names;
    # the registered view reads by the original name then renames)
    renames: dict[str, str] = field(default_factory=dict)
    # DISTRIBUTED BY (FLIP-376 bucketed tables, SqlDistribution.java):
    # (kind 'HASH'|'RANGE', bucket columns, bucket count or None) —
    # writes cluster by the key into the bucket count
    distribution: tuple[str, list[str], int | None] | None = None

    def proctime_col(self) -> str | None:
        """Name of the computed column declared `AS PROCTIME()` (the
        processing-time attribute, SqlProctimeFunction in the Flink
        parser), or None. Routes `JOIN d FOR SYSTEM_TIME AS OF f.<col>`
        to the processing-time lookup join."""
        for c, e in self.computed:
            if re.fullmatch(r"PROCTIME\s*\(\s*\)", e.strip(), re.I):
                return c
        return None


def _computed_col_expr(expr: str) -> str:
    """Computed-column expression → Spark SQL.  PROCTIME() maps to
    CURRENT_TIMESTAMP: Flink stamps processing time per record
    (ProcTimeAttribute); a micro-batch engine stamps per batch — the
    batch-consistent wall clock is the Spark-idiomatic analog."""
    return _sub_outside_literals(
        expr, r"(?i)\bPROCTIME\s*\(\s*\)", "CURRENT_TIMESTAMP"
    )


def _sub_outside_literals(s: str, pattern: str, repl: str) -> str:
    """re.sub that never touches single-quoted SQL string literals —
    a path like '/tmp/x.csv' must not be rewritten even when a table
    `csv` exists in a database `x`."""
    parts = re.split(r"('(?:[^']|'')*')", s)
    return "".join(
        p if i % 2 else re.sub(pattern, repl, p) for i, p in enumerate(parts)
    )


def _sub_outside_quotes(s: str, pattern: str, repl: str) -> str:
    """re.sub protected from ALL quoted regions Spark SQL recognizes:
    single-quoted literals, double-quoted literals (Spark's default,
    non-ANSI mode treats \"...\" as a string), and backticked
    identifiers — with backslash escapes honored inside the string
    forms. Used where the substitution target can legitimately appear
    inside literal text (e.g. alias-qualifier stripping: a literal
    'd.name tag' must survive `d.` removal)."""
    parts = re.split(
        r"('(?:[^'\\]|\\.|'')*'|\"(?:[^\"\\]|\\.|\"\")*\"|`[^`]*`)", s
    )
    return "".join(
        p if i % 2 else re.sub(pattern, repl, p) for i, p in enumerate(parts)
    )


def _db_view_name(db: str, table: str) -> str:
    """Flat temp-view alias for a qualified `db.table` reference."""
    return f"__cat_{db}__{table}"


def _ctl_view_name(cat: str, db: str, table: str) -> str:
    """Flat temp-view alias for a fully-qualified `catalog.db.table`."""
    return f"__ctl_{cat}__{db}__{table}"




__all__ = [
    "_SIMPLE_TYPES",
    "flink_type_to_spark",
    "spark_type_to_flink",
    "_GENERIC_HEADS",
    "_split_top_all",
    "_split_top",
    "_split_on_where",
    "_leading_cte_names",
    "_FROM_LIST_STOP",
    "_mask_quoted",
    "_mask_string_literals",
    "_blank_comments",
    "_from_comma_tables",
    "_apply_watermark",
    "parse_watermark_delay",
    "_scan_streaming_setops",
    "TableMeta",
    "_computed_col_expr",
    "_sub_outside_literals",
    "_sub_outside_quotes",
    "_db_view_name",
    "_ctl_view_name",
]
