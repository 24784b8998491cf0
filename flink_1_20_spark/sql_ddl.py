"""Flink-SQL DDL surface: `CREATE TABLE ... WITH ('connector'=...)`.

Reference parity: TableEnvironment.executeSql
(flink-table/flink-table-api-java/.../internal/TableEnvironmentImpl.java:727)
with the WITH-options connector contract resolved by factory discovery
(flink-table/flink-table-common/.../factories/FactoryUtil.java:52). This
module is the §3.1 "DDL/catalog glue we author" — a user's Flink DDL
scripts (filesystem/datagen/print/blackhole connectors, Flink type
names, computed columns, watermark clauses) run against Spark: tables
register as temp views over the mapped connector, queries and DML go
through `spark.sql` (Catalyst does the rest).

Scope: CREATE [TEMPORARY] TABLE [IF NOT EXISTS] ... WITH (...),
DROP TABLE [IF EXISTS], INSERT INTO <table> <query>, and passthrough of
every other statement to `spark.sql`. PRIMARY KEY ... NOT ENFORCED is
accepted and recorded (Flink also never enforces it). Unsupported
connectors raise with the factory-style message rather than guessing.
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


def _split_top_all(s: str, sep: str) -> list[str]:
    """Split on `sep` at paren/angle-bracket depth 0, quote-aware.

    `<` opens a bracket only when it directly follows a generic type
    head (ARRAY/MAP/ROW/MULTISET) — comparison operators in computed
    column expressions (`a >= b`, `a < b`) stay literal; `>` closes
    only while a generic is open."""
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
            if head and head.group(1).upper() in _GENERIC_HEADS or adepth > 0:
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


def _split_top(s: str, sep: str) -> tuple[str, str]:
    parts = _split_top_all(s, sep)
    return parts[0], sep.join(parts[1:])


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


def _blank_line_comments(s: str) -> str:
    """Same-length copy of `s` with `-- ...` line comments blanked to
    spaces (newlines kept, so `\\s+` regexes cross the former comment).
    Comment starts are located on the quote-masked copy: a `--` inside
    a string literal is content, not a comment."""
    masked = _mask_quoted(s)
    out = list(s)
    for m in re.finditer(r"--[^\n]*", masked):
        out[m.start() : m.end()] = " " * (m.end() - m.start())
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
    scan = _blank_line_comments(text)
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
            elif ch == "-" and seg[i : i + 2] == "--":
                # line comment: drop it (its text must not become an
                # item's leading token)
                j = seg.find("\n", i)
                i = len(seg) if j < 0 else j
                continue
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


def _apply_watermark(df, col: str, delay: str):
    """WATERMARK FOR <col> AS <expr> → Spark withWatermark.  A
    bounded-delay expression (``<col> - INTERVAL '<n>' <unit>``) maps
    to the interval; SOURCE_WATERMARK() (connector-provided — the
    monitored-dir source has none of its own) and the strictly-
    ascending form (``AS <col>``) map to a zero-delay watermark.  Any
    OTHER expression raises: silently tightening an unrecognized
    strategy (a UDF, arithmetic the INTERVAL regex misses) to 0 seconds
    would drop late rows the declared strategy accepts.  A redundant
    outer-paren form ``(<col> - INTERVAL '<n>' <unit>)`` is accepted
    (r10): the parens change nothing semantically, and DDL written that
    way used to register before the r9 fail-safe tightening."""
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
        return df.withWatermark(col, f"{wm.group(1)} {wm.group(2).lower()}")
    if re.fullmatch(r"SOURCE_WATERMARK\s*\(\s*\)", d, re.I) or re.fullmatch(
        rf"`?{re.escape(col)}`?", d, re.I
    ):
        return df.withWatermark(col, "0 seconds")
    raise ValueError(
        f"unsupported watermark strategy {delay!r} for column {col!r} — "
        "supported: '<col> - INTERVAL '<n>' <unit>' (bounded delay), "
        "SOURCE_WATERMARK(), or the strictly-ascending '<col>' form; "
        "other expressions cannot be mapped onto a Spark watermark "
        "without changing which late rows are accepted"
    )


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


class TableEnvironment:
    """Minimal executeSql host: DDL → connector mapping, DQL/DML → Catalyst.

    SESSION-GLOBAL SIDE EFFECT: constructing a TableEnvironment sets
    ``spark.sql.mapKeyDedupPolicy=LAST_WIN`` on the shared SparkSession
    for its whole lifetime — Flink's map semantics keep the last value
    on duplicate keys (MapUnionFunction), Spark's default throws.  This
    cannot be scoped to dialect statements: execute_sql returns LAZY
    DataFrames (the caller may collect after any restore) and streaming
    queries evaluate on micro-batch threads long after lowering, so a
    set/restore would flip map semantics mid-query.  Non-dialect Spark
    code sharing the session therefore also gets last-wins duplicate
    map keys; set the conf back explicitly if that code needs the
    EXCEPTION policy (and do not run it concurrently with dialect
    streams that rely on LAST_WIN)."""

    DEFAULT_DB = "default_database"  # Flink's default database name
    DEFAULT_CATALOG = "default_catalog"  # Flink's default catalog name
    # Flink's table.optimizer.join.broadcast-threshold default (bytes)
    BROADCAST_THRESHOLD_DEFAULT = 1024 * 1024

    def __init__(self, spark: SparkSession):
        self.spark = spark
        # catalogs (CatalogManager.java:80, GenericInMemoryCatalog.java:52):
        # catalog -> {type/comment/options, dbs: {db: {table: meta}},
        # current_db}; self._dbs aliases the CURRENT catalog's dbs and
        # self.tables the CURRENT database's dict so unqualified
        # statements keep operating on them directly
        self._dbs: dict[str, dict[str, TableMeta]] = {self.DEFAULT_DB: {}}
        self._catalogs: dict[str, dict] = {
            self.DEFAULT_CATALOG: {
                "type": "generic_in_memory",
                "comment": "",
                "options": {},
                "dbs": self._dbs,
                "current_db": self.DEFAULT_DB,
            }
        }
        self.current_catalog = self.DEFAULT_CATALOG
        self.current_db = self.DEFAULT_DB
        self.tables: dict[str, TableMeta] = self._dbs[self.DEFAULT_DB]
        self.functions: dict[str, str] = {}  # name -> python path
        # database comments/properties (CREATE/ALTER/DESCRIBE DATABASE),
        # view definition SQL (SHOW CREATE VIEW), keyed per catalog.db
        self._db_meta: dict[str, dict[str, str | dict]] = {}
        self._view_sql: dict[str, str] = {}
        self.session_options: dict[str, str] = {}  # SET 'k' = 'v' store
        # Spark-conf values as they were before our SET mutated them,
        # keyed by the Spark key — RESET restores these (Flink's RESET
        # returns a key to its default, so a reset session must not keep
        # running with the mutated runtime state)
        self._conf_saved: dict[str, str | None] = {}
        self._jars: list[str] = []  # ADD JAR paths (SHOW JARS surface)
        # streaming queries this environment started (SHOW JOBS keeps
        # terminated ones visible with status FINISHED, as Flink does;
        # Spark's manager only lists active queries); start instants by
        # query id feed DESCRIBE JOB's start_time column
        self._started_jobs: list = []
        self._job_started_at: dict = {}
        # filesystem sink tables whose registered view needs a re-read:
        # sink-first tables register as an EMPTY relation (no files at
        # registration), and a streaming job writing a table freezes /
        # (for upserts) invalidates any static file index — both are
        # re-registered at statement entry by _refresh_sink_views so
        # reads observe the current snapshot, as Flink reads the
        # catalog table rather than a cached scan. Keyed by id(meta).
        self._stale_sink_views: dict[int, tuple] = {}
        self._live_sink_views: dict[int, tuple] = {}
        # materialized tables (FLIP-435, CatalogMaterializedTable.java):
        # name -> {meta, definition, freshness_sec, mode, status,
        # query/stop_event handles, last_error} — the backing TableMeta
        # is ALSO in self.tables so reads/DESCRIBE resolve normally
        self._materialized: dict[str, dict] = {}
        # serializes statement lowering against the FULL-mode refresh
        # timer: _batch_source_views swaps global temp views, and a user
        # statement lowered mid-swap would see streaming sources as
        # batch. RLock — execute_sql recurses (views, MT definitions)
        import threading

        self._ddl_lock = threading.RLock()
        # Flink's map semantics keep the LAST value on duplicate keys
        # (MAP_UNION, map literals — MapUnionFunction); Spark's default
        # dedup policy throws instead
        try:
            spark.conf.set("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
        except Exception:
            pass  # conf locked down (e.g. a connect session) — map
            # duplicate keys then raise, which is at least loud

    # -- statement router ------------------------------------------------
    def execute_sql(self, stmt: str) -> DataFrame | None:
        with self._ddl_lock:
            return self._execute_sql_locked(stmt)

    def _execute_sql_locked(self, stmt: str) -> DataFrame | None:
        s = stmt.strip().rstrip(";")
        u = s.upper()
        self._refresh_sink_views()
        # -- catalog statements (SqlCreateCatalogConverter.java,
        # SqlAlterCatalogOptionsConverter.java,
        # SqlDescribeCatalogConverter.java surface) ----------------------
        m = re.match(
            r"CREATE\s+CATALOG\s+(IF\s+NOT\s+EXISTS\s+)?(\S+)"
            r"(?:\s+COMMENT\s+'([^']*)')?"
            r"(?:\s+WITH\s*\((.*)\))?\s*$",
            s,
            re.S | re.I,
        )
        if m:
            return self._create_catalog(
                m.group(2).strip("`"),
                m.group(3) or "",
                m.group(4) or "",
                if_not_exists=bool(m.group(1)),
            )
        m = re.match(r"DROP\s+CATALOG\s+(?:IF\s+EXISTS\s+)?(\S+)$", s, re.I)
        if m:
            cat = m.group(1).strip("`")
            if cat == self.current_catalog:
                raise ValueError("cannot drop the current catalog")
            if cat not in self._catalogs and "IF EXISTS" not in u:
                raise ValueError(f"catalog does not exist: {cat}")
            self._catalogs.pop(cat, None)
            return None
        m = re.match(r"USE\s+CATALOG\s+(\S+)$", s, re.I)
        if m:
            return self._use_catalog(m.group(1).strip("`"))
        m = re.match(
            r"SHOW\s+CATALOGS(?:\s+(NOT\s+)?LIKE\s+'([^']*)')?$", s, re.I
        )
        if m:
            names = self._like_filter(
                sorted(self._catalogs), m.group(2), bool(m.group(1))
            )
            return self.spark.createDataFrame(
                [(c,) for c in names], "catalog_name string"
            )
        if re.match(r"SHOW\s+CURRENT\s+CATALOG$", u):
            return self.spark.createDataFrame(
                [(self.current_catalog,)], "current_catalog_name string"
            )
        m = re.match(r"DESCRIBE\s+CATALOG\s+(EXTENDED\s+)?(\S+)$", s, re.I)
        if m:
            return self._describe_catalog(m.group(2).strip("`"), bool(m.group(1)))
        # SHOW CREATE CATALOG (SqlShowCreateCatalog.java): reconstruct
        # the DDL from the recorded type/comment/options
        m = re.match(r"SHOW\s+CREATE\s+CATALOG\s+(\S+)$", s, re.I)
        if m:
            cname = m.group(1).strip("`")
            entry = self._catalogs.get(cname)
            if entry is None:
                raise ValueError(f"catalog does not exist: {cname}")
            opts = {"type": entry["type"], **entry["options"]}
            declared_db = entry.get("default_db", self.DEFAULT_DB)
            if declared_db != self.DEFAULT_DB:
                opts["default-database"] = declared_db
            comment = (
                f"\nCOMMENT '{entry['comment']}'" if entry["comment"] else ""
            )
            body = ",\n".join(f"  '{k}' = '{v}'" for k, v in opts.items())
            ddl = f"CREATE CATALOG `{cname}`{comment} WITH (\n{body}\n)"
            return self.spark.createDataFrame([(ddl,)], "result string")
        m = re.match(r"ALTER\s+CATALOG\s+(\S+)\s+(.*)$", s, re.S | re.I)
        if m and m.group(1).strip("`") in self._catalogs:
            return self._alter_catalog(m.group(1).strip("`"), m.group(2).strip())
        # -- database statements (CatalogManager.java:80 surface) --------
        m = re.match(
            r"CREATE\s+DATABASE\s+(?:IF\s+NOT\s+EXISTS\s+)?(\S+)"
            r"(?:\s+COMMENT\s+'([^']*)')?"
            r"(?:\s+WITH\s*\((.*)\))?\s*$",
            s,
            re.S | re.I,
        )
        if m:
            db = m.group(1).strip("`")
            existed = db in self._dbs
            self._dbs.setdefault(db, {})
            if not existed:
                # an IF NOT EXISTS re-run (or duplicate CREATE) must not
                # wipe the comment/properties recorded at first creation
                self._db_meta[f"{self.current_catalog}.{db}"] = {
                    "comment": m.group(2) or "",
                    "properties": dict(
                        re.findall(r"'([^']+)'\s*=\s*'([^']*)'", m.group(3) or "")
                    ),
                }
            return None
        m = re.match(r"DESCRIBE\s+DATABASE\s+(EXTENDED\s+)?(\S+)$", s, re.I)
        if m:
            db = m.group(2).strip("`")
            if db not in self._dbs:
                raise ValueError(f"database does not exist: {db}")
            meta = self._db_meta.get(f"{self.current_catalog}.{db}", {})
            rows = [
                ("name", db),
                ("comment", str(meta.get("comment", ""))),
            ]
            if m.group(1):
                rows += [
                    (f"property:{k}", v)
                    for k, v in sorted(dict(meta.get("properties", {})).items())
                ]
            return self.spark.createDataFrame(
                rows, "info_name string, info_value string"
            )
        m = re.match(r"ALTER\s+DATABASE\s+(\S+)\s+SET\s*\((.*)\)\s*$", s, re.S | re.I)
        if m:
            db = m.group(1).strip("`")
            if db not in self._dbs:
                raise ValueError(f"database does not exist: {db}")
            meta = self._db_meta.setdefault(
                f"{self.current_catalog}.{db}", {"comment": "", "properties": {}}
            )
            props = dict(meta.setdefault("properties", {}))
            props.update(re.findall(r"'([^']+)'\s*=\s*'([^']*)'", m.group(2)))
            meta["properties"] = props
            return None
        m = re.match(
            r"DROP\s+DATABASE\s+(?:IF\s+EXISTS\s+)?(\S+?)"
            r"\s*(CASCADE|RESTRICT)?$",
            s,
            re.I,
        )
        if m:
            db = m.group(1).strip("`")
            if db == self.current_db:
                raise ValueError("cannot drop the current database")
            held = self._dbs.get(db, {})
            if held and (m.group(2) or "RESTRICT").upper() == "RESTRICT":
                raise ValueError(f"database {db} is not empty (use CASCADE)")
            for t in held:
                self.spark.catalog.dropTempView(_db_view_name(db, t))
            self._dbs.pop(db, None)
            return None
        m = re.match(r"USE\s+(\S+)$", s, re.I)
        if m and m.group(1).strip("`") in self._dbs:
            return self._use_database(m.group(1).strip("`"))
        m = re.match(
            r"SHOW\s+DATABASES(?:\s+(NOT\s+)?LIKE\s+'([^']*)')?$", s, re.I
        )
        if m:
            names = self._like_filter(
                sorted(self._dbs), m.group(2), bool(m.group(1))
            )
            return self.spark.createDataFrame(
                [(d,) for d in names], "database_name string"
            )
        if re.match(r"SHOW\s+CURRENT\s+DATABASE$", u):
            return self.spark.createDataFrame(
                [(self.current_db,)], "current_database_name string"
            )
        # -- session clauses (SqlClient SET/RESET/ADD JAR surface,
        # SqlNodeToOperationConversion SqlSet/SqlReset/SqlAddJar paths) --
        m = re.match(r"SET\s+'([^']+)'\s*=\s*'([^']*)'$", s, re.I)
        if m:
            return self._set_option(m.group(1), m.group(2))
        if re.match(r"SET$", u):
            return self.spark.createDataFrame(
                sorted(self.session_options.items()) or [],
                "key string, value string",
            )
        m = re.match(r"RESET\s+'([^']+)'$", s, re.I)
        if m:
            self._reset_option(m.group(1))
            return None
        if re.match(r"RESET$", u):
            for key in list(self.session_options):
                self._reset_option(key)
            return None
        m = re.match(r"ADD\s+JAR\s+'([^']+)'$", s, re.I)
        if m:
            # Spark has a native ADD JAR; route through it so the jar
            # actually lands on the session classpath. Record only after
            # the load succeeds, once per path — SHOW JARS must never
            # list a jar that is not actually on the classpath.
            self.spark.sql(f"ADD JAR '{m.group(1)}'")
            if m.group(1) not in self._jars:
                self._jars.append(m.group(1))
            return None
        m = re.match(r"REMOVE\s+JAR\s+'([^']+)'$", s, re.I)
        if m:
            # Flink unregisters the jar from the session; Spark cannot
            # unload a loaded jar, so this only drops it from SHOW JARS
            # (matching Flink's session-listing semantics best-effort)
            if m.group(1) in self._jars:
                self._jars.remove(m.group(1))
            return None
        if re.match(r"SHOW\s+JARS$", u):
            return self.spark.createDataFrame(
                [(j,) for j in self._jars] or [], "jar string"
            )
        # SHOW JOBS / STOP JOB (FLIP-291 SQL-gateway job lifecycle,
        # SqlShowJobs/SqlStopJob): Flink lists cluster jobs; the Spark
        # analogue is the session's active streaming queries.
        if re.match(r"SHOW\s+JOBS$", u):
            listed: dict[str, tuple] = {}
            for q in self.spark.streams.active:
                listed[q.id] = (q.id, q.name or "", "RUNNING")
            for q in self._started_jobs:  # terminated env jobs stay visible
                if q.id not in listed:
                    listed[q.id] = (q.id, q.name or "", "FINISHED")
            return self.spark.createDataFrame(
                list(listed.values()) or [],
                "job_id string, job_name string, status string",
            )
        # DESCRIBE JOB '<id>' (SqlDescribeJob.java,
        # OperationExecutor.callDescribeJobOperation: one row of
        # job id / name / status / start time; a missing id is an error,
        # not an empty result). Visibility contract matches SHOW JOBS:
        # active session queries plus terminated env-started ones.
        m = re.match(r"(?:DESCRIBE|DESC)\s+JOB\s+'([^']+)'$", s, re.I)
        if m:
            jid = m.group(1)
            target = next(
                (q for q in self.spark.streams.active if q.id == jid), None
            )
            status = "RUNNING"
            if target is None:
                target = next(
                    (q for q in self._started_jobs if q.id == jid), None
                )
                status = "FINISHED"
            if target is None:
                raise ValueError(f"Described job {jid} does not exist")
            started = self._job_started_at.get(jid)
            if started is None:
                # active query this env did not start (e.g. a direct
                # writeStream.start() on the shared session): Flink's
                # JobStatusMessage always carries a start time, so
                # best-effort one — the earliest progress-event
                # timestamp, else the observation instant — and pin it
                # so repeated DESCRIBEs stay stable.
                import datetime as _dt

                for p in target.recentProgress or []:
                    ts = p.get("timestamp")
                    if ts:
                        started = _dt.datetime.fromisoformat(
                            ts.replace("Z", "+00:00")
                        ).replace(tzinfo=None)
                        break
                started = started or _dt.datetime.now()
                self._job_started_at[jid] = started
            return self.spark.createDataFrame(
                [(jid, target.name or "", status, started)],
                "job_id string, job_name string, status string, "
                "start_time timestamp",
            )
        m = re.match(
            r"STOP\s+JOB\s+'([^']+)'(\s+WITH\s+SAVEPOINT)?(\s+WITH\s+DRAIN)?$",
            s,
            re.I,
        )
        if m:
            if m.group(2):
                raise ValueError(
                    "STOP JOB WITH SAVEPOINT is a non-goal here (savepoint "
                    "manipulation — SURVEY §7); use plain STOP JOB"
                )
            target = next(
                (q for q in self.spark.streams.active if q.id == m.group(1)),
                None,
            )
            if target is None:
                raise ValueError(f"no such job: {m.group(1)}")
            if m.group(3):
                # WITH DRAIN: process currently-available input, then
                # stop. processAllAvailable() never returns while a
                # source keeps producing (Spark documents this), so the
                # drain is BOUNDED: wait up to the configured timeout,
                # then stop regardless — Flink's drain terminates even
                # on unbounded sources (watermark → +inf); a hung
                # execute_sql would not.
                import threading

                timeout = float(
                    self.session_options.get("stop-job.drain-timeout-sec", "30")
                )
                waiter = threading.Thread(
                    target=target.processAllAvailable, daemon=True
                )
                waiter.start()
                waiter.join(timeout)
            target.stop()
            return None
        # SHOW [FULL] MODULES: the module system is a documented non-goal
        # (SURVEY §7 — Spark's function registry is session-fixed), but
        # the listing surface reports the resolved state truthfully:
        # exactly the core module, enabled.
        # SHOW PROCEDURES (SqlShowProcedures.java): the generic
        # in-memory catalog exposes no procedures — an empty listing is
        # the truthful answer (Flink's GenericInMemoryCatalog returns
        # the same); CALL therefore always fails to resolve.
        if re.match(r"SHOW\s+PROCEDURES(\s+.*)?$", u):
            return self.spark.createDataFrame([], "procedure_name string")
        m = re.match(r"CALL\s+(\S+)", s, re.I)
        if m:
            raise ValueError(
                f"procedure not found: {m.group(1)} (the generic in-memory "
                "catalog defines no procedures — SqlShowProcedures.java "
                "surface; see SURVEY §7)"
            )
        # COMPILE/EXECUTE PLAN (SqlCompilePlan.java): Flink's JSON
        # compiled plans are version-upgrade machinery for its own
        # ExecNode graph — there is no Spark analog to persist
        # (Catalyst plans are not a stable serialization format).
        if re.match(r"(COMPILE|EXECUTE)\s+PLAN\b", u):
            raise ValueError(
                "COMPILE/EXECUTE PLAN is a documented non-goal: Flink's "
                "JSON compiled plans pin its ExecNode graph across version "
                "upgrades; Catalyst has no stable plan serialization to "
                "target (SURVEY §7)"
            )
        # EXECUTE STATEMENT SET BEGIN <insert>; ... END (SqlStatementSet
        # .java) — textual form of the programmatic statement set: shared
        # scans persisted for the set's duration, every INSERT runs
        m = re.match(
            r"EXECUTE\s+STATEMENT\s+SET\s+BEGIN\s+(.*?)\s*;?\s*END$",
            s,
            re.S | re.I,
        )
        if m:
            stmts = [x.strip() for x in _split_top_all(m.group(1), ";") if x.strip()]
            if not stmts:
                raise ValueError("empty STATEMENT SET")
            return self.execute_statement_set(stmts)
        # EXECUTE <statement> (SqlExecute.java): a transparent wrapper —
        # unwrap and re-dispatch (PLAN / STATEMENT SET matched above)
        m = re.match(r"EXECUTE\s+(.+)$", s, re.S | re.I)
        if m:
            return self._execute_sql_locked(m.group(1))
        if (
            re.match(r"CREATE\s+(TEMPORARY\s+)?MODEL\s+\S", u)
            or re.match(r"(DROP|ALTER)\s+MODEL\s+\S", u)
            or re.match(r"(DESCRIBE|DESC)\s+MODEL\s+\S", u)
            or re.match(r"SHOW\s+CREATE\s+MODEL\s+\S", u)
            or re.match(r"SHOW\s+MODELS\b", u)
        ):
            # \s+\S: a model STATEMENT names a model — `DESC model`
            # against a TABLE named model must reach the generic
            # DESCRIBE handler, not this trap
            # the whole family (SqlCreateModel/SqlAlterModel/SqlDropModel/
            # SqlRichDescribeModel/SqlShowCreateModel/SqlShowModels) fails
            # with ONE documented message instead of a raw ParseException
            raise ValueError(
                "model DDL is a documented non-goal: Flink's model "
                "statements (SqlCreateModel.java and siblings) front "
                "external model providers the generic in-memory catalog "
                "does not have (SURVEY §7)"
            )
        if re.match(r"SHOW\s+FULL\s+MODULES$", u):
            return self.spark.createDataFrame(
                [("core", True)], "module_name string, used boolean"
            )
        if re.match(r"SHOW\s+MODULES$", u):
            return self.spark.createDataFrame([("core",)], "module_name string")
        # USE MODULES m1[, m2...] (SqlUseModules.java): re-orders the
        # enabled set among LOADED modules — only core is ever loaded
        # here (LOAD MODULE is the documented non-goal), so the only
        # valid ordering is ['core']; anything else is the reference's
        # "module ... is not loaded" validation error
        m = re.match(r"USE\s+MODULES\s+(.+)$", s, re.I)
        if m:
            mods = [x.strip().strip("`") for x in m.group(1).split(",")]
            bad = [x for x in mods if x.lower() != "core"]
            if bad:
                raise ValueError(
                    f"No module with name '{bad[0]}' exists (only the "
                    "core module is loaded; LOAD MODULE is a documented "
                    "non-goal — SURVEY §7)"
                )
            return None
        # qualified-name rewrites, ONE regex pass each (not a loop over
        # every registered table): extract dotted candidates, rewrite
        # only those that resolve to a registered table. 3-part
        # `catalog.db.table` first so the 2-part pass never partially
        # rewrites its tail (the lookbehind also blocks matching right
        # after a dot); literals are never touched.
        if "." in s:

            def _repl3(mm: re.Match) -> str:
                centry = self._catalogs.get(mm.group(1))
                if centry and mm.group(3) in centry["dbs"].get(mm.group(2), {}):
                    return _ctl_view_name(mm.group(1), mm.group(2), mm.group(3))
                return mm.group(0)

            def _repl2(mm: re.Match) -> str:
                if mm.group(2) in self._dbs.get(mm.group(1), {}):
                    return _db_view_name(mm.group(1), mm.group(2))
                return mm.group(0)

            s = _sub_outside_literals(
                s, r"(?<![\w.])(\w+)\.(\w+)\.(\w+)\b", _repl3
            )
            s = _sub_outside_literals(s, r"(?<![\w.])(\w+)\.(\w+)\b", _repl2)
        u = s.upper()
        # TRUNCATE TABLE (SqlTruncateTable, Flink 1.18+): filesystem
        # tables overwrite their path with an empty relation of the
        # declared schema. Sits AFTER the qualified-name rewrite so
        # `TRUNCATE TABLE db.t` resolves via the mangled form, and
        # refreshes BOTH registered views through _register (the bare
        # name and the __cat_<db>__<table> alias) so qualified reads
        # never dangle on the deleted files.
        m = re.match(r"TRUNCATE\s+TABLE\s+(\S+)$", s, re.I)
        if m:
            name = m.group(1).strip("`")
            meta = self._resolve_meta(name)
            if meta is None:
                raise ValueError(f"unknown table: {name}")
            if meta.connector != "filesystem":
                raise ValueError(
                    f"TRUNCATE TABLE: connector {meta.connector!r} has no data to truncate"
                )
            from flink_1_20_spark.sources.connectors import write_file

            schema = ", ".join(f"{c} {t}" for c, t in meta.columns)
            empty = self.spark.createDataFrame([], schema=schema)
            write_file(
                empty,
                meta.options["path"],
                fmt=meta.options.get("format", "parquet"),
                mode="overwrite",
            )
            owner = next(
                (d for d, ts in self._dbs.items() if ts.get(meta.name) is meta),
                self.current_db,
            )
            self._register(meta, db=owner)
            return None
        # DELETE FROM t [WHERE cond] / UPDATE t SET ... [WHERE cond]
        # (FLIP-282 batch row-level modifications, Flink 1.17+:
        # DeletePushDownUtils + SupportsRowLevelDelete/Update,
        # DeleteTableITCase/UpdateTableITCase semantics — one
        # rows-affected row back, streaming mode rejected)
        m = re.match(r"DELETE\s+FROM\s+(\S+)(?:\s+WHERE\s+(.*))?$", s, re.S | re.I)
        if m:
            return self._delete_from(m.group(1).strip("`"), m.group(2))
        m = re.match(r"UPDATE\s+(\S+)\s+SET\s+(.*)$", s, re.S | re.I)
        if m:
            # WHERE split must ignore literals ('a WHERE b' in a SET
            # value is data, not a clause boundary)
            set_clause, cond = _split_on_where(m.group(2))
            return self._update_table(m.group(1).strip("`"), set_clause, cond)
        # ANALYZE TABLE t [PARTITION(...)] COMPUTE STATISTICS
        # [FOR COLUMNS c1, ... | FOR ALL COLUMNS]
        # (SqlNodeToOperationConversion.java:1112 convertAnalyzeTable) —
        # the collected stats feed the broadcast-join decision exactly as
        # Flink's planner consumes CatalogTableStatistics against
        # table.optimizer.join.broadcast-threshold.
        m = re.match(
            r"ANALYZE\s+TABLE\s+(\S+?)(?:\s+PARTITION\s*\(([^)]*)\))?"
            r"\s+COMPUTE\s+STATISTICS"
            r"(?:\s+FOR\s+(?:(ALL)\s+COLUMNS|COLUMNS\s+(.+)))?$",
            s,
            re.S | re.I,
        )
        if m:
            return self._analyze_table(
                m.group(1).strip("`"),
                m.group(2),
                all_columns=bool(m.group(3)),
                columns=m.group(4),
            )
        # -- materialized tables (FLIP-435: SqlCreateMaterializedTable.java:47,
        # SqlAlterMaterializedTable{Suspend,Resume,Refresh,Freshness,
        # RefreshMode,AsQuery}.java, SqlDropMaterializedTable.java,
        # CatalogMaterializedTable.java, IntervalFreshness.java) ---------
        if re.match(r"CREATE\s+MATERIALIZED\s+TABLE\b", u):
            return self._create_materialized_table(s)
        m = re.match(
            r"DROP\s+MATERIALIZED\s+TABLE\s+(?:(IF\s+EXISTS)\s+)?(\S+)$", s, re.I
        )
        if m:
            return self._drop_materialized_table(
                m.group(2).strip("`"), bool(m.group(1))
            )
        m = re.match(r"ALTER\s+MATERIALIZED\s+TABLE\s+(\S+)\s+(.*)$", s, re.S | re.I)
        if m:
            return self._alter_materialized_table(
                m.group(1).strip("`"), m.group(2).strip()
            )
        # CTAS / RTAS (SqlCreateTableAs.java:69, SqlReplaceTableAs.java):
        # schema inferred from the query, WITH options optional (a
        # managed warehouse path is derived when absent). Matched before
        # the plain CREATE TABLE branch; a column body right after the
        # table name keeps this regex from matching.
        # a real token break (\s+) is required before WITH/AS so a table
        # name merely ENDING in "as" (atlas, deltas) can never donate its
        # tail to the AS keyword via backtracking
        m = re.match(
            r"CREATE\s+(?:(OR\s+REPLACE)\s+)?TABLE\s+(?:(IF\s+NOT\s+EXISTS)\s+)?"
            r"(`?[\w.]+`?)(?:\s+WITH\s*\((.*?)\))?\s+AS\s+(.+)$",
            s,
            re.S | re.I,
        )
        if m:
            return self._create_table_as(
                m.group(3).strip("`"),
                bool(m.group(1)),
                bool(m.group(2)),
                m.group(4) or "",
                m.group(5).strip(),
            )
        if re.match(r"CREATE\s+(TEMPORARY\s+)?TABLE\b", u):
            # LIKE form first, guarded hard (base must be a KNOWN table
            # and the trailing parens must hold only feature clauses) so
            # a LIKE inside a computed-column expression can't match
            m = re.match(
                r"CREATE\s+(?:TEMPORARY\s+)?TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?"
                r"(\S+)\s*(?:\((.*?)\)\s*)?(?:WITH\s*\((.*?)\)\s*)?"
                r"LIKE\s+(\S+)\s*(?:\((.*)\))?\s*$",
                s,
                re.S | re.I,
            )
            _feats_ok = m and re.fullmatch(
                r"\s*(?:(?:INCLUDING|EXCLUDING|OVERWRITING)\s+\w+\s*,?\s*)*",
                m.group(5) or "",
                re.I,
            )
            if m and m.group(4).strip("`") in self.tables and _feats_ok:
                return self._create_table_like(
                    m.group(1).strip("`"),
                    m.group(2) or "",
                    m.group(3) or "",
                    m.group(4).strip("`"),
                    m.group(5) or "",
                )
            return self._create_table(s)
        if re.match(r"DROP\s+TABLE\b", u):
            return self._drop_table(s)
        # CREATE [TEMPORARY] VIEW → Spark temp view (Flink views are
        # catalog-scoped; session-scoped is the right mapping here)
        m = re.match(
            r"CREATE\s+(?:TEMPORARY\s+)?VIEW\s+(?:IF\s+NOT\s+EXISTS\s+)?(\S+)\s+AS\s+(.*)$",
            s,
            re.S | re.I,
        )
        if m:
            body = self.execute_sql(m.group(2))
            vname = m.group(1).strip("`")
            body.createOrReplaceTempView(vname)
            self._view_sql[vname] = m.group(2).strip()  # SHOW CREATE VIEW
            return None
        if re.match(r"DROP\s+(?:TEMPORARY\s+)?VIEW\b", u):
            name = s.split()[-1].strip("`")
            self.spark.catalog.dropTempView(name)
            self._view_sql.pop(name, None)
            return None
        m = re.match(r"SHOW\s+CREATE\s+VIEW\s+(\S+)$", s, re.I)
        if m:
            vname = m.group(1).strip("`")
            sql_body = self._view_sql.get(vname)
            if sql_body is None:
                raise ValueError(f"view not found: {vname}")
            return self.spark.createDataFrame(
                [(f"CREATE VIEW `{vname}` AS {sql_body}",)], "result string"
            )
        # CREATE [TEMPORARY] [SYSTEM] FUNCTION name AS 'target' — Flink
        # registers a class by fully-qualified name
        # (SqlNodeToOperationConversion CREATE FUNCTION path,
        # flink-table-common/.../functions/); here the target is a
        # Python path `module.attr` resolving to a pyspark UDF/UDTF, a
        # Flink-style class with .eval, or a plain callable.
        m = re.match(
            r"CREATE\s+(?:TEMPORARY\s+)?(?:SYSTEM\s+)?FUNCTION\s+"
            r"(?:IF\s+NOT\s+EXISTS\s+)?(\S+)\s+AS\s+'([^']+)'"
            r"(?:\s+LANGUAGE\s+(\w+))?$",
            s,
            re.I,
        )
        if m:
            return self._create_function(
                m.group(1).strip("`"), m.group(2), (m.group(3) or "PYTHON")
            )
        m = re.match(
            r"DROP\s+(?:TEMPORARY\s+)?(?:SYSTEM\s+)?FUNCTION\s+"
            r"(?:IF\s+EXISTS\s+)?(\S+)$",
            s,
            re.I,
        )
        if m:
            self.functions.pop(m.group(1).strip("`"), None)
            return None
        # SHOW TABLES/VIEWS/FUNCTIONS [(FROM|IN) [catalog.]db]
        # [[NOT] LIKE '<sql pattern>'] (SqlShowTables.java:52 — Flink
        # 1.20 added the scoping/filter clauses to all three listings)
        m = re.match(
            r"SHOW\s+TABLES"
            r"(?:\s+(?:FROM|IN)\s+(\S+))?"
            r"(?:\s+(NOT\s+)?LIKE\s+'([^']*)')?$",
            s,
            re.I,
        )
        if m:
            if m.group(1):
                scope = m.group(1).strip("`")
                cat, _, db = scope.rpartition(".")
                if cat and cat not in self._catalogs:
                    raise ValueError(f"catalog does not exist: {cat}")
                dbs = self._catalogs[cat]["dbs"] if cat else self._dbs
                if db not in dbs:
                    raise ValueError(f"database does not exist: {scope}")
                names = set(dbs[db])
            else:
                names = set(self.tables) | {
                    t.name for t in self.spark.catalog.listTables()
                }
            names = sorted(n for n in names if not n.startswith("__"))
            names = self._like_filter(names, m.group(3), bool(m.group(2)))
            return self.spark.createDataFrame(
                [(n,) for n in names], "table_name string"
            )
        m = re.match(
            r"SHOW\s+VIEWS(?:\s+(NOT\s+)?LIKE\s+'([^']*)')?$", s, re.I
        )
        if m:
            names = sorted(
                t.name
                for t in self.spark.catalog.listTables()
                if t.tableType == "TEMPORARY"
                and t.name not in self.tables
                and not t.name.startswith("__")  # internal helper views
            )
            names = self._like_filter(names, m.group(2), bool(m.group(1)))
            return self.spark.createDataFrame(
                [(n,) for n in names], "view_name string"
            )
        m = re.match(
            r"SHOW\s+(?:USER\s+)?FUNCTIONS(?:\s+(NOT\s+)?LIKE\s+'([^']*)')?$",
            s,
            re.I,
        )
        if m:
            names = self._like_filter(
                sorted(self.functions), m.group(2), bool(m.group(1))
            )
            return self.spark.createDataFrame(
                [(n,) for n in names], "function_name string"
            )
        # ALTER VIEW v RENAME TO v2 / ALTER VIEW v AS <query>
        # (SqlAlterViewRenameConverter.java, SqlAlterViewAsConverter.java)
        m = re.match(
            r"ALTER\s+VIEW\s+(\S+)\s+(?:RENAME\s+TO\s+(\S+)|AS\s+(.*))$",
            s,
            re.S | re.I,
        )
        if m:
            vname = m.group(1).strip("`")
            if vname not in self._view_sql:
                raise ValueError(f"view not found: {vname}")
            if m.group(2):
                new = m.group(2).strip("`")
                if new in self._view_sql or new in self.tables:
                    raise ValueError(f"object already exists: {new}")
                body = self._view_sql[vname]
                # re-derive under the NEW name first — a failing body
                # must leave the old view fully intact (and only then
                # mutate the bookkeeping)
                self.execute_sql(body).createOrReplaceTempView(new)
                self._view_sql[new] = body
                self._view_sql.pop(vname)
                self.spark.catalog.dropTempView(vname)
            else:
                body = m.group(3).strip()
                self.execute_sql(body).createOrReplaceTempView(vname)
                self._view_sql[vname] = body
            return None
        # ALTER FUNCTION f AS 'new.target' (SqlAlterFunction.java)
        m = re.match(
            r"ALTER\s+(?:TEMPORARY\s+)?(?:SYSTEM\s+)?FUNCTION\s+"
            r"(?:IF\s+EXISTS\s+)?(\S+)\s+AS\s+'([^']+)'"
            r"(?:\s+LANGUAGE\s+\w+)?$",
            s,
            re.I,
        )
        if m:
            fname = m.group(1).strip("`")
            if fname not in self.functions and "IF EXISTS" not in u:
                raise ValueError(f"function not found: {fname}")
            if fname in self.functions:
                # spark.udf.register overwrites in place — re-resolving
                # the new target IS the replace
                self._create_function(fname, m.group(2), "PYTHON")
            return None
        m = re.match(r"(?:DESCRIBE|DESC)\s+(?:TABLE\s+)?(\S+)$", s, re.I)
        if m and not re.match(r"(?:DESCRIBE|DESC)\s+(?:SELECT|WITH|VALUES)\b", s, re.I):
            return self._describe(m.group(1).strip("`"))
        # SHOW COLUMNS (FROM|IN) t [[NOT] LIKE '<sql pattern>'] — the
        # DESCRIBE shape filtered by column name (SqlShowColumns)
        m = re.match(
            r"SHOW\s+COLUMNS\s+(?:FROM|IN)\s+(\S+?)"
            r"(?:\s+(NOT\s+)?LIKE\s+'([^']*)')?$",
            s,
            re.I,
        )
        if m:
            from pyspark.sql import functions as F

            out = self._describe(m.group(1).strip("`"))
            if m.group(3) is not None:
                like = F.col("name").like(m.group(3))
                out = out.filter(~like if m.group(2) else like)
            return out
        m = re.match(r"SHOW\s+CREATE\s+TABLE\s+(\S+)$", s, re.I)
        if m:
            return self._show_create_table(m.group(1).strip("`"))
        # SHOW PARTITIONS t [PARTITION (k=v[, ...])]
        # (SqlShowPartitionsConverter.java — Flink lists the catalog
        # partitions of a partitioned table, optionally filtered by a
        # partial spec; here partitions ARE the filesystem directories)
        m = re.match(
            r"SHOW\s+PARTITIONS\s+(\S+?)(?:\s+PARTITION\s*\(([^)]*)\))?$",
            s,
            re.I,
        )
        if m:
            return self._show_partitions(m.group(1).strip("`"), m.group(2))
        m = re.match(r"ALTER\s+TABLE\s+(\S+)\s+(.*)$", s, re.S | re.I)
        if m and m.group(1).strip("`") in self.tables:
            return self._alter_table(m.group(1).strip("`"), m.group(2).strip())
        # INSERT [INTO|OVERWRITE] t [PARTITION (k=v, ...)] [(col, ...)]
        # <query> — static partition spec (SqlNodeToOperationConversion
        # convertSqlInsert: staticPartitions) and partial-column inserts
        # (Flink 1.14+ column lists; missing columns fill NULL). One
        # parser shared with EXECUTE STATEMENT SET.
        parsed = self._parse_insert(s)
        if parsed is not None:
            return self._insert_into(*parsed[:2], **parsed[2])
        m = re.match(r"INSERT\s+(INTO|OVERWRITE)\s+(\S+)\s+(.*)$", s, re.S | re.I)
        if m:
            return self._insert_into(
                m.group(2).strip("`"),
                m.group(3),
                overwrite=m.group(1).upper() == "OVERWRITE",
            )
        # EXPLAIN [PLAN FOR | <details>] <stmt> — Flink's EXPLAIN surface
        # (SqlRichExplain + ExplainDetail): ESTIMATED_COST maps to
        # Spark's cost mode, JSON_EXECUTION_PLAN to the formatted plan
        # (the structured rendering Spark offers); CHANGELOG_MODE has no
        # Spark analog (Catalyst plans carry no RowKind annotation) and
        # says so. EXPLAIN over an INSERT explains the SOURCE pipeline —
        # the sink side is a connector write with no Catalyst plan.
        m = re.match(
            r"EXPLAIN\s+(?:PLAN\s+FOR\s+)?"
            r"(?:(ESTIMATED_COST|JSON_EXECUTION_PLAN|CHANGELOG_MODE|PLAN_ADVICE)\s+)?(.*)$",
            s,
            re.S | re.I,
        )
        if m and not re.match(r"EXPLAIN\s+(FORMATTED|EXTENDED|CODEGEN|COST)\b", s, re.I):
            detail = (m.group(1) or "").upper()
            if detail == "CHANGELOG_MODE":
                raise ValueError(
                    "EXPLAIN CHANGELOG_MODE is Flink-planner-specific "
                    "(+I/-U/+U/-D annotations on every ExecNode); Catalyst "
                    "plans carry no RowKind — use plain EXPLAIN, and the "
                    "streaming sink's output mode (append/update) for the "
                    "changelog contract"
                )
            mode = {"ESTIMATED_COST": "COST ", "JSON_EXECUTION_PLAN": "FORMATTED "}.get(
                detail, ""
            )
            body = m.group(2)
            im = re.match(
                r"INSERT\s+(?:INTO|OVERWRITE)\s+\S+"
                r"(?:\s+PARTITION\s*\([^)]*\))?\s*(?:\([\w\s,`]+\)\s*)?"
                r"\s+(.*)$",
                body,
                re.S | re.I,
            )
            if im:
                body = im.group(1)  # explain the source pipeline
            from flink_1_20_spark.sql_flink import (
                rewrite_flink_builtins,
                rewrite_legacy_group_windows,
                rewrite_unnest,
                rewrite_window_tvfs,
            )

            rewritten = rewrite_flink_builtins(
                rewrite_unnest(
                    rewrite_legacy_group_windows(rewrite_window_tvfs(body))
                )
            )
            if detail == "PLAN_ADVICE":
                return self._explain_plan_advice(rewritten)
            return self.spark.sql("EXPLAIN " + mode + rewritten)
        if re.search(r"FOR\s+SYSTEM_TIME\s+AS\s+OF", s, re.I):
            return self._temporal_join(s)
        # Flink dialect → Spark SQL (window TVFs, legacy group windows,
        # MATCH_RECOGNIZE); plain statements pass through to Catalyst.
        from flink_1_20_spark.sql_flink import (
            rewrite_flink_builtins,
            rewrite_legacy_group_windows,
            rewrite_unnest,
            rewrite_window_tvfs,
            run_match_recognize,
        )

        # Flink-only hints: OPTIONS('k'='v') dynamic table options and
        # LOOKUP(...) tuning have no Spark analog (the lookup path
        # broadcasts already) and their quoted-key syntax breaks Spark's
        # hint parser — strip them. BROADCAST / SHUFFLE_HASH /
        # SHUFFLE_MERGE hints share Spark's names and pass through.
        s = re.sub(
            r"/\*\+\s*(?:OPTIONS|LOOKUP)\s*\(\s*'[^)]*\)\s*\*/", "", s, flags=re.I
        )
        from flink_1_20_spark.sql_flink import rewrite_streaming_session_tvf

        dedup = self._try_streaming_dedup(s)
        if dedup is not None:
            return dedup
        over = self._try_streaming_over(s)
        if over is not None:
            return over
        s = rewrite_streaming_session_tvf(s, self._is_streaming_table)
        s = rewrite_unnest(rewrite_legacy_group_windows(rewrite_window_tvfs(s)))
        s = rewrite_flink_builtins(s)
        if re.search(r"\bMATCH_RECOGNIZE\b", u):
            return run_match_recognize(self.spark, s)
        return self._sql_streaming_lowered(s)

    # -- session options -------------------------------------------------
    # Flink config keys with a direct Spark runtime analog; everything
    # else is recorded in the session store (visible via bare SET) so
    # scripts that tune Flink-only knobs run unchanged.
    _OPTION_MAP = {
        "table.exec.resource.default-parallelism": "spark.sql.shuffle.partitions",
        "parallelism.default": "spark.sql.shuffle.partitions",
        "table.local-time-zone": "spark.sql.session.timeZone",
    }

    def _spark_key(self, key: str) -> str | None:
        target = self._OPTION_MAP.get(key)
        if target is None and key.startswith("spark."):
            # direct Spark conf passthrough for hybrid scripts
            target = key
        return target

    def _set_option(self, key: str, value: str) -> None:
        self.session_options[key] = value
        target = self._spark_key(key)
        if target is not None:
            if target not in self._conf_saved:
                self._conf_saved[target] = self.spark.conf.get(target, None)
            self.spark.conf.set(target, value)
        if key == "table.optimizer.join.broadcast-threshold":
            self._reapply_broadcast_verdicts()
        return None

    def _reapply_broadcast_verdicts(self) -> None:
        """The broadcast hint is baked into a table's registered view, so
        a threshold change must re-register every analyzed table — in
        EVERY catalog, not just the current one (Flink reads the
        threshold at plan time; this is the registration-time
        equivalent). Each table re-registers under its owning
        catalog/db so foreign namespaces never clobber the current
        database's bare views."""
        for cat, centry in self._catalogs.items():
            for db, tbls in centry["dbs"].items():
                for meta in tbls.values():
                    if meta.stats is not None and "size_bytes" in meta.stats:
                        self._register(meta, db=db, catalog=cat)

    def _track_job(self, q) -> None:
        """Record an env-started streaming query for the job-lifecycle
        surface: SHOW JOBS keeps it visible after termination, DESCRIBE
        JOB reports its start instant (Flink's JobStatusMessage carries
        the cluster-side start time; the env's observation of .start()
        returning is the Spark-session equivalent)."""
        import datetime as _dt

        self._started_jobs.append(q)
        self._job_started_at[q.id] = _dt.datetime.now()

    def _explain_plan_advice(self, query: str) -> DataFrame:
        """EXPLAIN PLAN_ADVICE (SqlRichExplain.java + ExplainDetail;
        rendered like the reference's '== Optimized Physical Plan With
        Advice ==' section with numbered advice lines, PlanAdvice.java).
        Flink ships two PlanAnalyzers — GroupAggregationAnalyzer
        (two-phase agg tuning) and NonDeterministicUpdateAnalyzer (NDU
        correctness risk, FlinkStreamPlanAnalyzers.java); Catalyst
        already plans two-phase aggregation unconditionally, so the
        Spark-side analyzers target the plan risks that actually matter
        here: quadratic joins, broadcast opportunities the ANALYZE
        machinery can unlock, row-at-a-time Python, filters that never
        reached the scan, and nondeterminism in streaming plans."""
        df = self.spark.sql(query)
        jqe = df._jdf.queryExecution()
        try:
            mode = self.spark._jvm.org.apache.spark.sql.execution.ExplainMode
            plan = jqe.explainString(mode.fromString("formatted"))
        except Exception:
            plan = jqe.toString()
        advice: list[tuple[str, str]] = []
        if re.search(r"CartesianProduct|BroadcastNestedLoopJoin", plan):
            advice.append((
                "WARNING",
                "join without a usable equi-condition (CartesianProduct/"
                "BroadcastNestedLoopJoin): O(|build| x |probe|) work at "
                "scale — add an equality predicate, or quantize range/"
                "interval conditions onto band keys so the join becomes "
                "an equi-join",
            ))
        if "SortMergeJoin" in plan:
            advice.append((
                "ADVICE",
                "sort-merge join in the plan: if one side is small, run "
                "ANALYZE TABLE <t> COMPUTE STATISTICS so the measured "
                "size drives a broadcast join under "
                "'table.optimizer.join.broadcast-threshold' and the "
                "shuffle+sort disappears",
            ))
        if "BatchEvalPython" in plan:
            advice.append((
                "WARNING",
                "row-at-a-time Python UDF (BatchEvalPython): each row "
                "crosses the JVM/Python boundary pickled — a pandas UDF "
                "(ArrowEvalPython, vectorized over Arrow batches) is "
                "typically 10-100x faster",
            ))
        # a pushed-filter list that is empty or carries only the
        # IsNotNull guards means the real predicate stayed in a Filter
        # node above the scan (Spark always pushes IsNotNull for
        # non-null comparisons, so its presence alone is not pushdown).
        # Only claimed for single-scan plans: with several scans the
        # empty list and the Filter node can belong to DIFFERENT scans
        # (e.g. a join whose other side pushed its predicate fine), and
        # pairing them textually would fabricate advice.
        if plan.count("PushedFilters:") == 1 and re.search(
            r"PushedFilters:\s*\[(?:\s*IsNotNull\([^)]*\)\s*,?)*\]", plan
        ) and re.search(r"\(\d+\)\s+Filter\b|\*\s+Filter\b", plan):
            advice.append((
                "ADVICE",
                "a Filter sits above a scan whose PushedFilters is empty: "
                "predicates on raw source columns push into the parquet "
                "reader; predicates on computed expressions do not — "
                "filter on the stored column (or store the derived "
                "column) so row groups can be skipped",
            ))
        # string literals and back-quoted identifiers are stripped
        # before the scan (a '%now(%' LIKE pattern is not a call);
        # ANSI niladic forms (current_timestamp without parens) match
        # as bare words, and unix_timestamp only in its zero-arg form
        # (with arguments it is a deterministic parse)
        scrubbed = re.sub(
            r"`[^`]*`", "``", re.sub(r"'(?:[^']|'')*'", "''", query)
        )
        if df.isStreaming and re.search(
            r"\b(?:rand|randn|uuid|shuffle|monotonically_increasing_id"
            r")\s*\(|\bunix_timestamp\s*\(\s*\)|"
            r"\b(?:current_timestamp|current_date|localtimestamp|"
            r"now\s*\(\s*\))",
            scrubbed,
            re.I,
        ):
            advice.append((
                "WARNING",
                "non-deterministic function in a streaming query: "
                "micro-batch retries and changelog updates can recompute "
                "it to a DIFFERENT value (the reference's "
                "NonDeterministicUpdateAnalyzer raises the same NDU "
                "warning) — materialize the value at ingestion time "
                "instead of computing it in the pipeline",
            ))
        lines = "\n".join(
            f"advice[{i}]: [{kind}] {content}"
            for i, (kind, content) in enumerate(advice, start=1)
        ) or "No available advice..."
        return self.spark.createDataFrame(
            [(f"== Physical Plan With Advice ==\n{plan}\n\n{lines}\n",)],
            "plan string",
        )

    def _reset_option(self, key: str) -> None:
        self.session_options.pop(key, None)
        target = self._spark_key(key)
        if target is not None and target in self._conf_saved:
            prev = self._conf_saved.pop(target)
            if prev is None:
                self.spark.conf.unset(target)
            else:
                self.spark.conf.set(target, prev)
            # aliasing Flink keys (e.g. parallelism.default AND
            # table.exec.resource.default-parallelism both map to
            # spark.sql.shuffle.partitions): if another session option
            # still targets this conf, it must keep applying — re-set it
            # and keep the ORIGINAL restore point for its own reset
            for k, v in self.session_options.items():
                if self._spark_key(k) == target:
                    self._conf_saved[target] = prev
                    self.spark.conf.set(target, v)
                    break
        if key == "table.optimizer.join.broadcast-threshold":
            self._reapply_broadcast_verdicts()

    # -- programmatic Table API entry points ------------------------------
    # TableEnvironment.from(path) / fromValues / sqlQuery /
    # createStatementSet (TableEnvironment.java surface) — return the
    # fluent Table facade so DDL-registered tables compose with the
    # Table API without re-reading sources.
    def from_path(self, path: str):
        from flink_1_20_spark.table_api import Table

        # each path segment may be quoted independently (`db`.`tbl`)
        segs = [p.strip().strip("`") for p in path.split(".")]
        if len(segs) == 2:
            db, tbl = segs
            if db in self._dbs and tbl in self._dbs[db]:
                return Table(self.spark.table(_db_view_name(db, tbl)))
        return Table(self.spark.table(".".join(segs)))

    def from_elements(self, elements, schema=None):
        from flink_1_20_spark.table_api import Table

        return Table(self.spark.createDataFrame(elements, schema))

    def sql_query(self, sql: str):
        from flink_1_20_spark.table_api import Table

        # reject non-queries by SHAPE before executing: Flink's sqlQuery
        # validates without side effects, so a CREATE/INSERT passed here
        # must fail WITHOUT creating the database / writing the data
        if not re.match(
            r"\s*(SELECT|WITH|VALUES|TABLE|SHOW|DESCRIBE|DESC|EXPLAIN)\b",
            sql,
            re.I,
        ):
            raise ValueError(
                "sql_query expects a query (SELECT/WITH/VALUES/...), "
                "not a DDL/DML statement — use execute_sql for those"
            )
        df = self.execute_sql(sql)
        if df is None:
            raise ValueError("sql_query expects a query, not a DDL statement")
        return Table(df)

    def create_statement_set(self) -> "StatementSet":
        return StatementSet(self)

    # -- temporal (versioned) join ---------------------------------------
    def _proctime_lookup_join(
        self, sel, fact, fa, left_kw, dim, da, where, fact_keys, dim_keys
    ):
        """`JOIN dim FOR SYSTEM_TIME AS OF f.<proctime> AS d ON ...` —
        the processing-time LOOKUP join (CommonExecLookupJoin.java:141,
        TemporalProcessTimeJoinOperator.java:48): each fact row enriches
        against the dimension's CURRENT snapshot, not a versioned
        history.  Spark-first: the reference's per-row point lookup
        becomes a broadcast hash join of the snapshot
        (operators/lookup.lookup_join — what Flink's FULL-caching lookup
        mode converges to).  For a STREAMING fact this is a
        stream-static join: Spark re-resolves the static subtree every
        micro-batch, so each batch joins the freshest snapshot — the
        micro-batch analog of Flink's per-record lookup; TTL-bounded
        reload and async partial caching stay on the library surface
        (operators/lookup.RefreshingDim / async_lookup_join)."""
        from flink_1_20_spark.operators.lookup import lookup_join

        fact_df = self.spark.table(fact.strip("`"))
        dim_df = self.spark.table(dim)
        if dim_df.isStreaming:
            raise ValueError(
                f"processing-time lookup join reads the CURRENT snapshot "
                f"of {dim!r}, which must be a bounded (batch) table; a "
                "streaming versioned table takes the event-time form "
                "(FOR SYSTEM_TIME AS OF <rowtime>)"
            )
        for dk, fk in zip(dim_keys, fact_keys):
            if dk != fk:
                dim_df = dim_df.withColumnRenamed(dk, fk)
        clash = (set(fact_df.columns) & set(dim_df.columns)) - set(fact_keys)
        if clash:
            raise ValueError(
                f"lookup join: column name(s) {sorted(clash)} appear on "
                "both sides — alias them apart in the table schemas"
            )
        joined = lookup_join(
            fact_df, dim_df, on=fact_keys, how="left" if left_kw else "inner"
        )
        view = "__lookup_join_out"
        joined.createOrReplaceTempView(view)
        # strip alias qualifiers — the joined view is flat
        body = _sub_outside_quotes(sel, rf"\b(?:{fa}|{da})\.", "")
        tail = _sub_outside_quotes(where or "", rf"\b(?:{fa}|{da})\.", "")
        return self.spark.sql(f"SELECT {body} FROM {view}{tail}")

    def _temporal_join(self, s: str):
        """`JOIN dim FOR SYSTEM_TIME AS OF f.ts AS d ON ...` — the SQL
        spelling of the temporal/as-of join (StreamExecTemporalJoin.java,
        SqlSnapshot in the Calcite parser), lowered onto
        operators/asof.asof_join. The versioned side's event-time column
        is its DECLARED watermark column (Flink requires a rowtime +
        primary key on the versioned table; here the watermark in the
        CREATE TABLE metadata plays that role)."""
        m = re.match(
            r"SELECT\s+(.*?)\s+FROM\s+(\S+)(?:\s+AS)?\s+(\w+)\s+"
            r"(LEFT\s+)?JOIN\s+(\S+)\s+FOR\s+SYSTEM_TIME\s+AS\s+OF\s+"
            r"(\w+)\.`?(\w+)`?(?:\s+AS)?\s+(\w+)\s+ON\s+(.+?)"
            r"(\s+WHERE\s+.+)?$",
            s,
            re.S | re.I,
        )
        if not m:
            raise ValueError(f"cannot parse temporal join: {s[:120]!r}")
        sel, fact, fa, left_kw, dim, ts_ref, ts_col, da, on, where = m.groups()
        dim = dim.strip("`")
        if ts_ref != fa:
            raise ValueError("AS OF must reference the fact side's time column")
        # equi keys from the ON conjunction, either side order
        fact_keys, dim_keys = [], []
        for clause in re.split(r"\bAND\b", on, flags=re.I):
            em = re.match(
                r"\s*(\w+)\.`?(\w+)`?\s*=\s*(\w+)\.`?(\w+)`?\s*$", clause
            )
            if not em:
                raise ValueError(f"temporal join ON must be equi: {clause!r}")
            a_al, a_c, b_al, b_c = em.groups()
            if a_al == fa and b_al == da:
                fact_keys.append(a_c)
                dim_keys.append(b_c)
            elif a_al == da and b_al == fa:
                fact_keys.append(b_c)
                dim_keys.append(a_c)
            else:
                raise ValueError(f"ON clause references unknown alias: {clause!r}")
        # AS OF the fact's PROCTIME() attribute → processing-time
        # LOOKUP join (current dim snapshot), not a versioned join
        fmeta_pt = self._resolve_meta(fact.strip("`"))
        if fmeta_pt is not None and fmeta_pt.proctime_col() == ts_col:
            return self._proctime_lookup_join(
                sel, fact, fa, left_kw, dim, da, where, fact_keys, dim_keys
            )
        meta = self.tables.get(dim)
        if meta is None or meta.watermark is None:
            raise ValueError(
                f"versioned table {dim!r} needs a declared WATERMARK "
                "(its rowtime) in CREATE TABLE — or, for a lookup join "
                "against the current snapshot, make the AS OF column a "
                "PROCTIME() attribute of the fact table"
            )
        dim_ts = meta.watermark[0]
        from pyspark.sql import functions as F

        from flink_1_20_spark.operators.asof import asof_join

        fact_df = self.spark.table(fact.strip("`"))
        dim_df = self.spark.table(dim)
        for dk, fk in zip(dim_keys, fact_keys):
            if dk != fk:
                dim_df = dim_df.withColumnRenamed(dk, fk)
        if fact_df.isStreaming:
            # STREAMING temporal join (StreamExecTemporalJoin.java:70):
            # both sides keyed into one state scope, events matched to
            # the latest dim version at-or-before their rowtime
            # (streaming/temporal_stream.temporal_join_stream).
            if not dim_df.isStreaming:
                raise ValueError(
                    "streaming FOR SYSTEM_TIME AS OF needs a STREAMING "
                    "versioned table (its updates are the version "
                    "stream); for a static dimension use the lookup "
                    "join (operators/lookup.py) instead"
                )
            if left_kw is None:
                raise ValueError(
                    "streaming FOR SYSTEM_TIME AS OF supports LEFT JOIN "
                    "here (events with no version yet emit NULL dim "
                    "columns; INNER would have to retract them when a "
                    "late version arrives)"
                )
            if len(fact_keys) != 1:
                raise ValueError(
                    "streaming temporal join supports a single equi key"
                )
            from flink_1_20_spark.streaming.temporal_stream import (
                temporal_join_stream,
            )

            # the registered views carry their DECLARED watermarks; the
            # operator defines ITS OWN on the tagged union's time column
            # and Spark forbids redefinition — rebuild both sides as
            # unwatermarked streams from their table metadata
            fmeta2 = self._resolve_meta(fact.strip("`"))
            dmeta2 = self._resolve_meta(dim)
            if fmeta2 is not None:
                fact_df = self._unwatermarked_stream(fmeta2)
            if dmeta2 is not None:
                dim_df = self._unwatermarked_stream(dmeta2)
                for dk, fk in zip(dim_keys, fact_keys):
                    if dk != fk:
                        dim_df = dim_df.withColumnRenamed(dk, fk)

            key = fact_keys[0]
            f_types = dict(fact_df.dtypes)
            d_types = dict(dim_df.dtypes)
            ev_payload = [
                c for c in fact_df.columns if c not in (key, ts_col)
            ]
            dim_payload = [
                c for c in dim_df.columns if c not in (key, dim_ts)
            ]
            clash = (set(ev_payload) & set(dim_payload)) | (
                {"ts"} & (set(ev_payload) | set(dim_payload))
            )
            if clash:
                # the flattened join output has one namespace; a shared
                # payload name would produce duplicate columns
                raise ValueError(
                    f"streaming temporal join: column name(s) {sorted(clash)} "
                    "appear on both sides (or collide with the reserved "
                    "'ts' output) — alias them apart in the table schemas"
                )
            out_schema = ", ".join(
                [
                    f"{key} {f_types[key]}",
                    "ts timestamp",
                    *(f"{c} {f_types[c]}" for c in ev_payload),
                    *(f"{c} {d_types[c]}" for c in dim_payload),
                ]
            )
            # the fact's declared watermark delay bounds how long events
            # wait for late dim versions
            delay = None
            if fmeta2 is not None and fmeta2.watermark is not None:
                dm = re.search(
                    r"INTERVAL\s+'([^']+)'\s+(\w+)", fmeta2.watermark[1], re.I
                )
                if dm:
                    delay = f"{dm.group(1)} {dm.group(2).lower()}"
            joined = temporal_join_stream(
                fact_df,
                dim_df,
                key=key,
                event_ts=ts_col,
                dim_ts=dim_ts,
                event_payload=ev_payload,
                dim_payload=dim_payload,
                output_schema=out_schema,
                watermark_delay=delay,
            )
            if ts_col != "ts":
                joined = joined.withColumnRenamed("ts", ts_col)
            view = "__temporal_join_stream_out"
            joined.createOrReplaceTempView(view)
            body = _sub_outside_quotes(sel, rf"\b(?:{fa}|{da})\.", "")
            tail = _sub_outside_quotes(where or "", rf"\b(?:{fa}|{da})\.", "")
            return self.spark.sql(f"SELECT {body} FROM {view}{tail}")
        dim_df = dim_df.withColumn("__version_ts", F.col(dim_ts))
        payload = [
            c
            for c in dim_df.columns
            if c not in fact_keys and c not in (dim_ts, "__version_ts")
        ]
        joined = asof_join(
            fact_df,
            dim_df,
            on=fact_keys,
            left_ts=ts_col,
            right_ts=dim_ts,
            right_cols=[*payload, "__version_ts"],
        )
        if not left_kw:  # plain JOIN = INNER: drop rows with no version
            joined = joined.filter(F.col("__version_ts").isNotNull())
        joined = joined.drop("__version_ts")
        view = "__temporal_join_out"
        joined.createOrReplaceTempView(view)
        # strip alias qualifiers — the joined view is flat
        body = _sub_outside_quotes(sel, rf"\b(?:{fa}|{da})\.", "")
        tail = _sub_outside_quotes(where or "", rf"\b(?:{fa}|{da})\.", "")
        return self.spark.sql(f"SELECT {body} FROM {view}{tail}")


    _INSERT_STMT = re.compile(
        r"INSERT\s+(INTO|OVERWRITE)\s+(\S+)"
        r"(?:\s+PARTITION\s*\(([^)]*)\))?"
        r"\s*(?:\(([\w\s,`]+)\)\s*)?"
        r"\s+((?:SELECT|WITH|VALUES|TABLE|FROM|\().*)$",
        re.S | re.I,
    )

    def _parse_insert(self, stmt: str):
        """Parse an INSERT statement into (name, query, kwargs) — shared
        by the executeSql dispatch and EXECUTE STATEMENT SET so both
        surfaces accept the same PARTITION / column-list syntax."""
        m = self._INSERT_STMT.match(stmt.strip().rstrip(";"))
        if m is None:
            return None
        cols = (
            [c.strip().strip("`") for c in m.group(4).split(",")]
            if m.group(4)
            else None
        )
        return (
            m.group(2).strip("`"),
            m.group(5),
            {
                "overwrite": m.group(1).upper() == "OVERWRITE",
                "static_partition": m.group(3),
                "columns": cols,
            },
        )

    def _align_insert_columns(
        self,
        meta: TableMeta,
        df: DataFrame,
        static_partition: str | None,
        columns: list[str] | None,
    ) -> DataFrame:
        """INSERT ... PARTITION (k=v) [(col, ...)]: the query's output
        binds POSITIONALLY to the declared column list (or to every
        non-static column in declared order when no list is given);
        static-partition keys become literals cast to their declared
        type; unmentioned columns fill NULL (Flink's partial-insert
        semantics)."""
        from pyspark.sql import functions as F

        declared = [c for c, _ in meta.columns]
        types = dict(meta.columns)
        spec = (
            self._parse_partition_spec(static_partition)
            if static_partition
            else {}
        )
        unknown = set(spec) - set(declared)
        if unknown:
            raise ValueError(f"not columns of {meta.name}: {sorted(unknown)}")
        targets = columns or [c for c in declared if c not in spec]
        bad = [c for c in targets if c not in declared or c in spec]
        if bad:
            raise ValueError(
                f"INSERT column list names unknown/static columns: {bad}"
            )
        if len(df.columns) != len(targets):
            raise ValueError(
                f"INSERT query produces {len(df.columns)} columns for "
                f"{len(targets)} target columns"
            )
        bound = df.select(
            *[F.col(src).alias(tgt) for src, tgt in zip(df.columns, targets)]
        )
        out = []
        for c in declared:
            if c in spec:
                out.append(F.lit(spec[c]).cast(types[c]).alias(c))
            elif c in targets:
                out.append(F.col(c))
            else:
                out.append(F.lit(None).cast(types[c]).alias(c))
        return bound.select(*out)

    def _unwatermarked_stream(self, meta: TableMeta) -> DataFrame:
        """The streaming source exactly as _register builds it, MINUS the
        declared watermark — for operators that define their own (Spark
        forbids watermark redefinition downstream)."""
        schema = ", ".join(
            f"{meta.renames.get(c, c)} {t}" for c, t in meta.columns
        )
        if (
            meta.connector == "filesystem"
            and meta.options.get("format") in self._CDC_FORMATS
        ):
            import flink_1_20_spark.sources.cdc as cdc

            raw = self.spark.readStream.text(meta.options["path"])
            fn = getattr(cdc, self._CDC_FORMATS[meta.options["format"]])
            df = fn(raw, "value", schema)
        elif (
            meta.connector == "filesystem"
            and meta.options.get("scan.streaming") == "true"
        ):
            from flink_1_20_spark.streaming.sources import file_source

            df = file_source(
                self.spark,
                meta.options["path"],
                schema,
                fmt=meta.options.get("format", "parquet"),
            )
        else:
            raise ValueError(
                f"table {meta.name!r} is not a streaming source"
            )
        if meta.renames:
            from pyspark.sql import functions as F

            rev = {orig: cur for cur, orig in meta.renames.items()}
            df = df.select([F.col(c).alias(rev.get(c, c)) for c in df.columns])
        for cname, expr in meta.computed:
            df = df.selectExpr("*", f"({_computed_col_expr(expr)}) AS {cname}")
        return df

    def _resolve_meta(self, name: str):
        """Look up TableMeta by bare name (current database) or by the
        mangled `__cat_<db>__<table>` form qualified references rewrite
        to — so INSERT INTO / DESCRIBE / SHOW CREATE TABLE work across
        databases, not just views."""
        meta = self.tables.get(name)
        if meta is not None:
            return meta
        # reconstruct-and-compare instead of regex-splitting the mangled
        # form: a non-greedy '__' split mis-parses catalog/db names that
        # themselves contain double underscores
        if name.startswith("__ctl_"):
            for cat, centry in self._catalogs.items():
                for db, tbls in centry["dbs"].items():
                    for t, meta in tbls.items():
                        if name == _ctl_view_name(cat, db, t):
                            return meta
            return None
        if name.startswith("__cat_"):
            for db, tbls in self._dbs.items():
                for t, meta in tbls.items():
                    if name == _db_view_name(db, t):
                        return meta
        return None

    # -- CREATE FUNCTION / SHOW / DESCRIBE -------------------------------
    @staticmethod
    def _like_filter(names: list[str], pattern: str | None, negate: bool) -> list[str]:
        """SQL LIKE over a name listing (% = any run, _ = one char).
        Deliberately NOT shared with functions/compat.similar_to: LIKE
        treats every other character literally (hence re.escape), while
        SIMILAR TO passes the SQL-regex subset (classes, alternation,
        quantifiers) through unescaped."""
        if pattern is None:
            return list(names)
        rx = re.compile(
            "^" + re.escape(pattern).replace("%", ".*").replace("_", ".") + "$"
        )
        return [n for n in names if bool(rx.match(n)) != negate]

    def _create_function(self, name: str, path: str, language: str):
        """Resolve `module.attr` and register it under `name`.

        Accepted targets, mirroring Flink's ScalarFunction/TableFunction
        registration surface onto Spark's:
          * a pyspark UDF object (`@udf` / `@pandas_udf` result),
          * a pyspark UDTF object (`@udtf` result) — registered as a
            table function usable in LATERAL / TABLE(...),
          * a Flink-style class exposing ``eval`` (instantiated; the
            optional ``result_type`` attribute pins the return type),
          * a plain callable (optional ``result_type``, default string).
        """
        import importlib

        if language.upper() not in ("PYTHON", "SQL"):
            raise ValueError(f"unsupported function language: {language}")
        mod_path, _, attr = path.rpartition(".")
        if not mod_path:
            raise ValueError(f"function target must be module.attr: {path!r}")
        obj = getattr(importlib.import_module(mod_path), attr)
        # a @udf/@pandas_udf product (pyspark's own register() detects
        # wrapped UDFs the same way)
        if hasattr(obj, "asNondeterministic"):
            self.spark.udf.register(name, obj)
        elif type(obj).__name__ == "UserDefinedTableFunction":
            self.spark.udtf.register(name, obj)
        elif isinstance(obj, type) and hasattr(obj, "eval"):
            inst = obj()
            rt = getattr(obj, "result_type", "string")
            self.spark.udf.register(name, inst.eval, rt)
        elif callable(obj):
            rt = getattr(obj, "result_type", "string")
            self.spark.udf.register(name, obj, rt)
        else:
            raise ValueError(f"cannot register {path!r} as a function")
        self.functions[name] = path
        return None

    def _describe(self, name: str) -> DataFrame:
        """Flink DESCRIBE: (name, type, null, key, extras, watermark)."""
        meta = self._resolve_meta(name)
        rows = []
        if meta is not None:
            pk = set(meta.primary_key)
            wm_col = meta.watermark[0] if meta.watermark else None
            for col, typ in meta.columns:
                rows.append(
                    (
                        col,
                        typ,
                        True,
                        "PRI(NOT ENFORCED)" if col in pk else None,
                        None,
                        meta.watermark[1] if col == wm_col else None,
                    )
                )
            for col, expr in meta.computed:
                rows.append((col, "COMPUTED", True, None, f"AS {expr}", None))
        else:
            df = self.spark.table(name)
            for f_ in df.schema.fields:
                rows.append(
                    (f_.name, f_.dataType.simpleString(), f_.nullable,
                     None, None, None)
                )
        return self.spark.createDataFrame(
            rows,
            "name string, type string, `null` boolean, key string, "
            "extras string, watermark string",
        )

    # -- CREATE TABLE ... LIKE -------------------------------------------
    def _create_table_like(
        self, name: str, extra_cols: str, with_body: str, base: str, feats: str
    ) -> None:
        """CREATE TABLE new (extra...) WITH (...) LIKE base (feature
        clauses) — Flink's table-inheritance DDL (SqlCreateTableLike):
        the new table copies the base's schema/watermark/constraints/
        options, with INCLUDING/EXCLUDING/OVERWRITING feature clauses
        and local additions merged on top."""
        import copy

        src = self.tables.get(base)
        if src is None:
            raise ValueError(f"LIKE base table not found: {base}")
        meta = copy.deepcopy(src)
        meta.name = name
        fu = feats.upper()
        if "EXCLUDING ALL" in fu:
            meta.options = {}
            meta.watermark = None
            meta.primary_key = []
            meta.computed = []
        if "EXCLUDING OPTIONS" in fu:
            meta.options = {}
        if "EXCLUDING WATERMARKS" in fu:
            meta.watermark = None
        if "EXCLUDING CONSTRAINTS" in fu:
            meta.primary_key = []
        if "EXCLUDING GENERATED" in fu:
            meta.computed = []
        new_opts = dict(re.findall(r"'([^']+)'\s*=\s*'([^']*)'", with_body))
        if "connector" in new_opts:
            meta.connector = new_opts.pop("connector")
        if "OVERWRITING OPTIONS" in fu or new_opts:
            meta.options.update(new_opts)
        for raw in _split_top_all(extra_cols, ","):
            col = raw.strip()
            if not col:
                continue
            if re.match(r"WATERMARK\b", col, re.I):
                wm = re.match(
                    r"WATERMARK\s+FOR\s+(\S+)\s+AS\s+(.*)$", col, re.S | re.I
                )
                meta.watermark = (wm.group(1).strip("`"), wm.group(2).strip())
                continue
            ac = re.match(r"`?(\w+)`?\s+AS\s+(.*)$", col, re.S | re.I)
            if ac and not re.match(r"`?\w+`?\s+(ARRAY|MAP|ROW)\b", col, re.I):
                meta.computed.append((ac.group(1), ac.group(2).strip()))
                continue
            cname, ctype = col.split(None, 1)
            meta.columns.append((cname.strip("`"), flink_type_to_spark(ctype)))
        self._register(meta)
        self.tables[name] = meta

    # -- SHOW CREATE TABLE / ALTER TABLE ---------------------------------
    def _show_create_table(self, name: str) -> DataFrame:
        """Reconstruct the CREATE TABLE DDL from the stored TableMeta
        (Flink's SHOW CREATE TABLE surface)."""
        meta = self._resolve_meta(name)
        if meta is None:
            raise ValueError(f"table not found: {name}")
        lines = [f"  `{c}` {t.upper()}" for c, t in meta.columns]
        lines += [f"  `{c}` AS {e}" for c, e in meta.computed]
        if meta.watermark:
            lines.append(
                f"  WATERMARK FOR `{meta.watermark[0]}` AS {meta.watermark[1]}"
            )
        if meta.primary_key:
            cols = ", ".join(f"`{c}`" for c in meta.primary_key)
            lines.append(f"  PRIMARY KEY ({cols}) NOT ENFORCED")
        opts = {"connector": meta.connector, **meta.options}
        with_clause = ",\n".join(f"  '{k}' = '{v}'" for k, v in opts.items())
        dist = ""
        if meta.distribution is not None:
            kind, dcols, buckets = meta.distribution
            into = f" INTO {buckets} BUCKETS" if buckets else ""
            dist = (
                f"DISTRIBUTED INTO {buckets} BUCKETS\n"
                if not dcols
                else "DISTRIBUTED BY "
                + kind
                + "("
                + ", ".join(f"`{c}`" for c in dcols)
                + f"){into}\n"
            )
        part = (
            "PARTITIONED BY ("
            + ", ".join(f"`{c}`" for c in meta.partitioned_by)
            + ")\n"
            if meta.partitioned_by
            else ""
        )
        ddl = (
            f"CREATE TABLE `{name}` (\n"
            + ",\n".join(lines)
            + f"\n) {dist}{part}WITH (\n{with_clause}\n)"
        )
        return self.spark.createDataFrame([(ddl,)], "result string")

    def _alter_table(self, name: str, action: str):
        """ALTER TABLE: RENAME TO / SET (options) / ADD col / DROP col /
        ADD|DROP PARTITION — the mutations Flink's AlterTableOperation
        family supports; the table is re-registered so subsequent reads
        see the change."""
        meta = self.tables[name]
        # partition mutations first: the generic ADD/DROP column regexes
        # below would otherwise swallow `ADD PARTITION (...)`
        if re.match(
            r"(?:ADD|DROP)\s+(?:IF\s+(?:NOT\s+)?EXISTS\s+)?PARTITION\b",
            action,
            re.I,
        ):
            return self._alter_partitions(meta, action)
        m = re.match(r"RENAME\s+TO\s+(\S+)$", action, re.I)
        if m:
            new = m.group(1).strip("`")
            self.spark.catalog.dropTempView(name)
            self.spark.catalog.dropTempView(_db_view_name(self.current_db, name))
            meta.name = new
            self.tables[new] = self.tables.pop(name)
            self._register(meta)
            return None
        # RENAME <old> TO <new> (SqlAlterTableRenameColumn.java): the
        # catalog schema renames; existing files keep the physical name,
        # so the registered view reads by the original and renames
        m = re.match(r"RENAME\s+`?(\w+)`?\s+TO\s+`?(\w+)`?$", action, re.I)
        if m:
            old, new = m.group(1), m.group(2)
            if old not in [c for c, _ in meta.columns]:
                raise ValueError(f"column not found: {old}")
            if new in [c for c, _ in meta.columns] or new in [
                c for c, _ in meta.computed
            ]:
                raise ValueError(f"column already exists: {new}")
            # reject up front (as Flink does) when a computed column
            # reads the renamed column — mutating first would wedge the
            # table: _register's selectExpr fails AFTER meta changed
            referencing = [
                c
                for c, expr in meta.computed
                if re.search(rf"\b{re.escape(old)}\b", expr)
            ]
            if referencing:
                raise ValueError(
                    f"cannot rename {old}: computed column(s) "
                    f"{referencing} reference it — drop/redefine them first"
                )
            if meta.watermark and re.search(
                rf"\b{re.escape(old)}\b", meta.watermark[1]
            ):
                # the watermark delay expr is our own recorded text —
                # rewrite references in place
                meta.watermark = (
                    meta.watermark[0],
                    re.sub(rf"\b{re.escape(old)}\b", new, meta.watermark[1]),
                )
            meta.columns = [
                (new if c == old else c, t) for c, t in meta.columns
            ]
            # track back to the PHYSICAL name (renaming twice keeps the
            # original file name as the read target)
            meta.renames[new] = meta.renames.pop(old, old)
            meta.primary_key = [new if c == old else c for c in meta.primary_key]
            meta.partitioned_by = [
                new if c == old else c for c in meta.partitioned_by
            ]
            if meta.distribution is not None:
                kind, dcols, buckets = meta.distribution
                meta.distribution = (
                    kind, [new if c == old else c for c in dcols], buckets
                )
            if meta.watermark and meta.watermark[0] == old:
                meta.watermark = (new, meta.watermark[1])
            meta.stats = None  # per-column stats are keyed by old names
            self._register(meta)
            return None
        # MODIFY WATERMARK FOR ts AS expr (SqlAlterTableModify watermark
        # form) and MODIFY (<col> <type>[, ...]) / MODIFY <col> <type>
        m = re.match(
            r"MODIFY\s+WATERMARK\s+FOR\s+`?(\w+)`?\s+AS\s+(.*)$", action, re.S | re.I
        )
        if m:
            meta.watermark = (m.group(1), m.group(2).strip())
            self._register(meta)
            return None
        m = re.match(r"MODIFY\s*\(?\s*(.*?)\)?$", action, re.S | re.I)
        if m and m.group(1):
            declared = {c for c, _ in meta.columns}
            # parse + validate the WHOLE list before touching the live
            # meta — a failure on the Nth entry must not leave entries
            # 1..N-1 (or a type change whose position spec then fails)
            # half-applied on the shared registry object
            entries: list[tuple[str, str, tuple | None]] = []
            for coldef in _split_top_all(m.group(1), ","):
                coldef, pos = self._strip_position(coldef)
                cm = re.match(r"\s*`?(\w+)`?\s+(.+?)\s*$", coldef, re.S)
                if not cm or cm.group(1) not in declared:
                    raise ValueError(
                        f"MODIFY: unknown column in {coldef.strip()!r}"
                    )
                if pos is not None:
                    self._validate_position(meta, pos, declared)
                entries.append(
                    (cm.group(1), flink_type_to_spark(cm.group(2)), pos)
                )
            for name_, new_t, pos in entries:
                meta.columns = [
                    (c, new_t if c == name_ else t) for c, t in meta.columns
                ]
                if pos is not None:
                    self._place_column(meta, name_, pos)
            self._register(meta)
            return None
        # ADD CONSTRAINT <name> PRIMARY KEY (...) NOT ENFORCED
        # (SqlAlterTableAddConstraint.java) / DROP CONSTRAINT | DROP
        # PRIMARY KEY (SqlAlterTableDropConstraint.java)
        m = re.match(
            r"ADD\s+CONSTRAINT\s+\S+\s+PRIMARY\s+KEY\s*\(([^)]*)\)"
            r"(?:\s+NOT\s+ENFORCED)?$",
            action,
            re.I,
        )
        if m:
            meta.primary_key = [
                c.strip().strip("`") for c in m.group(1).split(",") if c.strip()
            ]
            return None  # recorded, never enforced (as in Flink)
        if re.match(r"DROP\s+(?:CONSTRAINT\s+\S+|PRIMARY\s+KEY)$", action, re.I):
            meta.primary_key = []
            return None
        # DROP WATERMARK (SqlAlterTableDropWatermark.java)
        if re.match(r"DROP\s+WATERMARK$", action, re.I):
            if meta.watermark is None:
                raise ValueError(f"table {name} has no watermark to drop")
            meta.watermark = None
            self._register(meta)
            return None
        m = re.match(r"SET\s*\((.*)\)$", action, re.S | re.I)
        if m:
            for kv in _split_top_all(m.group(1), ","):
                km = re.match(r"\s*'([^']*)'\s*=\s*'([^']*)'\s*$", kv)
                if not km:
                    raise ValueError(f"cannot parse option: {kv!r}")
                meta.options[km.group(1)] = km.group(2)
            self._register(meta)
            return None
        # RESET ('k' [, ...]) (SqlAlterTableReset.java): drop options
        # back to their defaults; the connector identity is not an
        # option that can be reset
        m = re.match(r"RESET\s*\((.*)\)$", action, re.S | re.I)
        if m:
            keys = [
                k.strip().strip("'")
                for k in _split_top_all(m.group(1), ",")
                if k.strip()
            ]
            if not keys:
                raise ValueError("ALTER TABLE RESET requires at least one key")
            if "connector" in keys:
                raise ValueError("ALTER TABLE RESET does not support changing 'connector'")
            # options the factory REQUIRES have no default to reset to —
            # Flink's factory revalidation rejects; popping them here
            # would wedge the table (a mutated meta _register cannot read)
            required = (
                {"path", "format"} if meta.connector == "filesystem" else set()
            )
            bad = sorted(required & set(keys))
            if bad:
                raise ValueError(
                    f"ALTER TABLE RESET cannot remove required option(s) "
                    f"{bad} of the {meta.connector!r} connector"
                )
            for k in keys:
                meta.options.pop(k, None)
            self._register(meta)
            return None
        # DROP DISTRIBUTION (SqlAlterTableDropDistribution.java,
        # FLIP-376): subsequent writes stop clustering by the bucket key
        if re.match(r"DROP\s+DISTRIBUTION$", action, re.I):
            if meta.distribution is None:
                raise ValueError(f"table {name} has no distribution to drop")
            meta.distribution = None
            return None
        # COMPACT (SqlAlterTableCompact.java → the filesystem
        # connector's small-file compaction): rewrite the table's (or
        # one partition's) files into the target layout
        m = re.match(r"PARTITION\s*\((.*?)\)\s+COMPACT$", action, re.S | re.I)
        if m:
            return self._compact_table(meta, m.group(1))
        if re.match(r"COMPACT$", action, re.I):
            return self._compact_table(meta, None)
        m = re.match(r"ADD\s*\(?\s*(.*?)\)?$", action, re.S | re.I)
        if m and m.group(1) and not action.upper().startswith("ADD CONSTRAINT"):
            # parse + validate everything BEFORE mutating the live meta
            # (a failing position spec must not leave a phantom column)
            entries = []
            for coldef in _split_top_all(m.group(1), ","):
                coldef, pos = self._strip_position(coldef)
                cm = re.match(r"\s*`?(\w+)`?\s+(.+?)\s*$", coldef, re.S)
                if not cm:
                    raise ValueError(f"cannot parse column: {coldef!r}")
                entries.append(
                    (cm.group(1), flink_type_to_spark(cm.group(2)), pos)
                )
            # AFTER may anchor on an existing column or one added
            # EARLIER in this same statement (placement is sequential)
            available = {c for c, _ in meta.columns}
            for name_, _, pos in entries:
                if pos is not None:
                    self._validate_position(meta, pos, available)
                available.add(name_)
            for name_, t, pos in entries:
                meta.columns.append((name_, t))
                if pos is not None:
                    self._place_column(meta, name_, pos)
            self._register(meta)
            return None
        # DROP (c1[, c2 ...]) / DROP c (SqlAlterTableDropColumn.java
        # takes a column LIST)
        m = re.match(r"DROP\s*\(?\s*([\w`\s,]+?)\s*\)?$", action, re.I)
        if m:
            cols = [c.strip().strip("`") for c in m.group(1).split(",")]
            bad = [c for c in cols if not re.fullmatch(r"\w+", c)]
            if bad:
                raise ValueError(
                    f"cannot parse DROP column list near {bad[0]!r}"
                )
            known = {c for c, _ in meta.columns} | {c for c, _ in meta.computed}
            bad = [c for c in cols if c not in known]
            if bad:
                raise ValueError(f"DROP: unknown column(s) {bad}")
            # structural members (Flink's schema validation): dropping a
            # partition key orphans the directory layout, a PK member
            # invalidates the constraint, the watermark column breaks
            # event-time, a bucket key dangles the distribution, and a
            # column a computed column reads wedges re-registration
            bad = [c for c in cols if c in meta.partitioned_by]
            if bad:
                raise ValueError(f"cannot drop partition key column(s) {bad}")
            bad = [c for c in cols if c in meta.primary_key]
            if bad:
                raise ValueError(
                    f"cannot drop primary key column(s) {bad} — DROP "
                    "PRIMARY KEY first"
                )
            if meta.watermark and meta.watermark[0] in cols:
                raise ValueError(
                    f"cannot drop watermark column {meta.watermark[0]!r} "
                    "— DROP WATERMARK first"
                )
            if meta.distribution is not None:
                bad = [c for c in cols if c in meta.distribution[1]]
                if bad:
                    raise ValueError(
                        f"cannot drop distribution bucket column(s) {bad} "
                        "— DROP DISTRIBUTION first"
                    )
            dropped = set(cols)
            for cname, expr in meta.computed:
                if cname in dropped:
                    continue
                refs = [
                    c for c in dropped
                    if re.search(rf"\b{re.escape(c)}\b", expr)
                ]
                if refs:
                    raise ValueError(
                        f"cannot drop column(s) {refs}: computed column "
                        f"{cname!r} reads them — drop it first"
                    )
            if meta.options.get("format") == "csv":
                # csv files bind columns by POSITION: only a strict
                # SUFFIX of the declared order can go without shifting
                # every later column onto the wrong file data
                remaining = [c for c, _ in meta.columns if c not in dropped]
                if remaining != [c for c, _ in meta.columns][: len(remaining)]:
                    raise ValueError(
                        "csv tables can only drop TRAILING columns — "
                        "files bind columns by position, and removing "
                        "an interior column would mis-read existing data"
                    )
            for col in cols:
                meta.columns = [(c, t) for c, t in meta.columns if c != col]
                meta.computed = [(c, e) for c, e in meta.computed if c != col]
            self._register(meta)
            return None
        raise ValueError(f"unsupported ALTER TABLE action: {action!r}")

    # -- catalogs (SqlCreateCatalogConverter.java and siblings) ----------
    def _create_catalog(
        self, name: str, comment: str, with_body: str, if_not_exists: bool = False
    ):
        if name in self._catalogs:
            if if_not_exists:
                return None
            raise ValueError(f"catalog already exists: {name}")
        options = dict(re.findall(r"'([^']+)'\s*=\s*'([^']*)'", with_body))
        ctype = options.pop("type", "generic_in_memory")
        if ctype != "generic_in_memory":
            raise ValueError(
                f"Could not find any factory for catalog type {ctype!r} "
                "(supported here: generic_in_memory)"
            )
        default_db = options.pop("default-database", self.DEFAULT_DB)
        self._catalogs[name] = {
            "type": ctype,
            "comment": comment,
            "options": options,
            # the DECLARED default database (current_db drifts with USE;
            # SHOW CREATE CATALOG must replay the original declaration)
            "default_db": default_db,
            "dbs": {default_db: {}},
            "current_db": default_db,
        }
        return None

    def _use_catalog(self, name: str):
        """USE CATALOG <c>: unqualified names now resolve in <c>'s
        current database (CatalogManager.setCurrentCatalog). The bare
        temp views of the outgoing database are swapped for the incoming
        one's; catalog- and db-qualified mangled views stay put so every
        qualified reference keeps resolving."""
        if name not in self._catalogs:
            raise ValueError(f"catalog does not exist: {name}")
        if name == self.current_catalog:
            return None
        self._catalogs[self.current_catalog]["current_db"] = self.current_db
        for t in self.tables:
            self.spark.catalog.dropTempView(t)
        entry = self._catalogs[name]
        self.current_catalog = name
        self._dbs = entry["dbs"]
        self.current_db = entry["current_db"]
        self.tables = self._dbs[self.current_db]
        for meta in self.tables.values():
            self._register(meta)
        return None

    def _describe_catalog(self, name: str, extended: bool) -> DataFrame:
        entry = self._catalogs.get(name)
        if entry is None:
            raise ValueError(f"catalog does not exist: {name}")
        rows = [
            ("name", name),
            ("type", entry["type"]),
            ("comment", entry["comment"]),
        ]
        if extended:
            rows += [
                (f"option:{k}", v) for k, v in sorted(entry["options"].items())
            ]
        return self.spark.createDataFrame(rows, "info_name string, info_value string")

    def _alter_catalog(self, name: str, action: str):
        """ALTER CATALOG SET (...) / RESET (...) / COMMENT '...' —
        Flink 1.20's SqlAlterCatalogOptions/Reset/Comment converters."""
        entry = self._catalogs[name]
        m = re.match(r"SET\s*\((.*)\)$", action, re.S | re.I)
        if m:
            for k, v in re.findall(r"'([^']+)'\s*=\s*'([^']*)'", m.group(1)):
                if k == "type":
                    raise ValueError("ALTER CATALOG cannot change 'type'")
                entry["options"][k] = v
            return None
        m = re.match(r"RESET\s*\((.*)\)$", action, re.S | re.I)
        if m:
            for k in re.findall(r"'([^']+)'", m.group(1)):
                if k == "type":
                    raise ValueError("ALTER CATALOG cannot reset 'type'")
                entry["options"].pop(k, None)
            return None
        m = re.match(r"COMMENT\s+'([^']*)'$", action, re.I)
        if m:
            entry["comment"] = m.group(1)
            return None
        raise ValueError(f"unsupported ALTER CATALOG action: {action!r}")

    # -- ANALYZE TABLE ---------------------------------------------------
    def _analyze_table(
        self,
        name: str,
        part_body: str | None,
        all_columns: bool = False,
        columns: str | None = None,
    ):
        """COMPUTE STATISTICS: row count + on-disk size (+ per-column
        ndv/null/min/max for FOR [ALL] COLUMNS) stored on the TableMeta —
        the CatalogTableStatistics the reference's planner reads. The
        table is re-registered so the broadcast decision (Flink's
        table.optimizer.join.broadcast-threshold) takes effect at once."""
        from pyspark.sql import functions as F

        meta = self._resolve_meta(name)
        if meta is None:
            raise ValueError(f"table not found: {name}")
        df = self.spark.table(name)
        root = meta.options.get("path")
        if part_body:
            spec = self._parse_partition_spec(part_body)
            unknown = set(spec) - set(meta.partitioned_by)
            if unknown:
                raise ValueError(
                    f"not partition keys of {meta.name}: {sorted(unknown)}"
                )
            for k, v in spec.items():
                df = df.filter(F.col(k).cast("string") == v)

        aggs = [F.count(F.lit(1)).alias("__n")]
        col_names: list[str] = []
        if all_columns:
            col_names = [c for c, _ in meta.columns] or df.columns
        elif columns:
            col_names = [c.strip().strip("`") for c in columns.split(",")]
        for c in col_names:
            aggs += [
                F.approx_count_distinct(c).alias(f"__ndv_{c}"),
                F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"__nul_{c}"),
                F.min(c).alias(f"__min_{c}"),
                F.max(c).alias(f"__max_{c}"),
            ]
        row = df.agg(*aggs).collect()[0]  # one job, one row — driver-safe

        # None = "not measured" (non-filesystem connectors have no on-disk
        # footprint to walk); the broadcast verdict treats unknown size as
        # unknown, never as zero
        size_bytes = None
        if meta.connector == "filesystem" and root and os.path.exists(root):
            size_bytes = 0
            walk_root = root
            if part_body and meta.partitioned_by and set(spec) == set(
                meta.partitioned_by
            ):
                walk_root = os.path.join(
                    root, *[f"{k}={spec[k]}" for k in meta.partitioned_by]
                )
            for dirpath, _dirs, files in os.walk(walk_root):
                size_bytes += sum(
                    os.path.getsize(os.path.join(dirpath, f))
                    for f in files
                    if not f.startswith(("_", "."))
                )
        col_stats = {
            c: {
                "ndv": row[f"__ndv_{c}"],
                "null_count": row[f"__nul_{c}"],
                "min": row[f"__min_{c}"],
                "max": row[f"__max_{c}"],
            }
            for c in col_names
        }
        if part_body:
            # partition-scoped stats stay PARTITION-scoped (Flink's
            # CatalogPartitionStatistics): they must never feed the
            # table-level broadcast decision — one small partition of a
            # huge table would otherwise broadcast the whole table
            stats = meta.stats if meta.stats is not None else {}
            key = "/".join(f"{k}={spec[k]}" for k in meta.partitioned_by if k in spec)
            stats.setdefault("partitions", {})[key] = {
                "row_count": row["__n"],
                "size_bytes": size_bytes,
                "columns": col_stats,
            }
            meta.stats = stats
        else:
            meta.stats = {
                **(meta.stats or {}),
                "row_count": row["__n"],
                "size_bytes": size_bytes,
                "columns": col_stats,
            }
        owner = next(
            (d for d, ts in self._dbs.items() if ts.get(meta.name) is meta),
            self.current_db,
        )
        self._register(meta, db=owner)
        return None

    # -- materialized tables (FLIP-435) ----------------------------------
    # Reference: flink-sql-parser/.../ddl/SqlCreateMaterializedTable.java:47,
    # SqlAlterMaterializedTable*.java, flink-table-common/.../catalog/
    # CatalogMaterializedTable.java, IntervalFreshness.java. Flink derives
    # the refresh mode from FRESHNESS vs
    # materialized-table.refresh-mode.freshness-threshold (default 30 min):
    # at/under the threshold → CONTINUOUS (a background streaming job kept
    # fresh at the freshness cadence), over it → FULL (a periodically
    # scheduled batch overwrite). The Spark mapping: CONTINUOUS = a
    # Structured Streaming query with trigger(processingTime=freshness)
    # writing epochs into the backing filesystem table via foreachBatch
    # (batch appends — so manual batch REFRESH can share the directory,
    # which a native file-stream sink's _spark_metadata log would hide);
    # FULL = a daemon timer re-running the definition as INSERT OVERWRITE
    # every freshness interval (Flink delegates this to its workflow
    # scheduler; an in-process timer is the embedded-scheduler analog).
    # SUSPEND/RESUME stop/restart the job on its checkpoint; REFRESH runs
    # one batch backfill with the source tables swapped to bounded reads.

    _FRESHNESS_UNIT_SEC = {"SECOND": 1, "MINUTE": 60, "HOUR": 3600, "DAY": 86400}

    _CREATE_MT = re.compile(
        r"CREATE\s+MATERIALIZED\s+TABLE\s+(?:(IF\s+NOT\s+EXISTS)\s+)?(\S+)\s*"
        r"(?:\(\s*PRIMARY\s+KEY\s*\(([^)]*)\)\s*(?:NOT\s+ENFORCED)?\s*\)\s*)?"
        r"(?:COMMENT\s+'([^']*)'\s*)?"
        r"(?:PARTITIONED\s+BY\s*\(([^)]*)\)\s*)?"
        r"(?:WITH\s*\((.*?)\)\s*)?"
        r"FRESHNESS\s*=\s*INTERVAL\s+'(\d+)'\s+(SECOND|MINUTE|HOUR|DAY)S?\s*"
        r"(?:REFRESH_MODE\s*=\s*(FULL|CONTINUOUS)\s*)?"
        r"AS\s+(.*)$",
        re.S | re.I,
    )

    def _managed_mt_path(self, name: str) -> str:
        root = self.session_options.get("materialized-table.storage.dir")
        if root is None:
            wh = self.spark.conf.get(
                "spark.sql.warehouse.dir", "spark-warehouse"
            )
            root = os.path.join(re.sub(r"^file:/*", "/", wh), "_materialized")
        return os.path.join(root, name)

    def _batch_source_views(self):
        """Context manager: temporarily re-register every monitored-dir
        streaming table of the current catalog as a bounded read of the
        same path, restoring the streaming registration on exit —
        Flink's manual/scheduled refresh runs the definition in BATCH
        execution mode over the same connectors."""
        from contextlib import contextmanager
        from dataclasses import replace

        @contextmanager
        def cm():
            swapped: list[tuple[TableMeta, str]] = []
            for db, tbls in self._dbs.items():
                for meta in tbls.values():
                    if meta.connector != "filesystem":
                        continue
                    if meta.options.get("scan.streaming") == "true":
                        batch = replace(
                            meta,
                            options={
                                k: v
                                for k, v in meta.options.items()
                                if k != "scan.streaming"
                            },
                        )
                        self._register(batch, db=db)
                        swapped.append((meta, db))
                    elif meta.name not in self._materialized:
                        # plain batch source: re-register so the view's
                        # cached file listing (InMemoryFileIndex pinned at
                        # registration) sees files added since — a refresh
                        # over a stale listing would silently miss them
                        self._register(meta, db=db)
            try:
                yield
            finally:
                for meta, db in swapped:
                    self._register(meta, db=db)

        return cm()

    def _create_materialized_table(self, s: str):
        m = self._CREATE_MT.match(s)
        if not m:
            raise ValueError(
                f"cannot parse CREATE MATERIALIZED TABLE (FRESHNESS = "
                f"INTERVAL '<n>' <unit> and AS <query> are required): {s[:120]!r}"
            )
        name = m.group(2).strip("`")
        if name in self._materialized:
            if m.group(1):
                return None
            raise ValueError(f"materialized table already exists: {name}")
        if name in self.tables:
            raise ValueError(f"a table named {name!r} already exists")
        pk = [c.strip().strip("`") for c in (m.group(3) or "").split(",") if c.strip()]
        part_by = [
            c.strip().strip("`") for c in (m.group(5) or "").split(",") if c.strip()
        ]
        options = dict(re.findall(r"'([^']+)'\s*=\s*'([^']*)'", m.group(6) or ""))
        freshness_sec = int(m.group(7)) * self._FRESHNESS_UNIT_SEC[
            m.group(8).upper()
        ]
        mode = (m.group(9) or "").upper()
        definition = m.group(10).strip()
        if not mode:
            thr = float(
                self.session_options.get(
                    "materialized-table.refresh-mode.freshness-threshold-sec",
                    "1800",
                )
            )
            mode = "CONTINUOUS" if freshness_sec <= thr else "FULL"
        fmt = options.pop("format", "parquet")
        path = options.pop("path", None) or self._managed_mt_path(name)
        # schema comes from the BATCH form of the definition (identical
        # to the streaming form's schema; Flink derives it the same way)
        with self._batch_source_views():
            batch_df = self.execute_sql(definition)
        if mode == "CONTINUOUS" and not self.execute_sql(definition).isStreaming:
            # validate BEFORE any state mutation — a half-created MT
            # would block the retry with "already exists"
            raise ValueError(
                f"materialized table {name!r}: REFRESH_MODE = CONTINUOUS "
                "requires streaming-capable sources (monitored-dir tables "
                "with 'scan.streaming'='true'); declare REFRESH_MODE = FULL "
                "for bounded sources"
            )
        meta = TableMeta(
            name=name,
            connector="filesystem",
            options={"path": path, "format": fmt, **options},
            columns=[
                (f.name, f.dataType.simpleString()) for f in batch_df.schema.fields
            ],
            primary_key=pk,
            partitioned_by=part_by,
        )
        entry = {
            "meta": meta,
            "db": self.current_db,
            "root": path,  # declared path; snapshots live in _v<N> under it
            "version": 0,
            "definition": definition,
            "freshness_sec": freshness_sec,
            "mode": mode,
            "status": "RUNNING",
            "query": None,
            "stop_event": None,
            "last_error": None,
        }
        self.tables[name] = meta
        self._materialized[name] = entry
        if mode == "FULL":
            # initial full refresh now, then the scheduled cadence
            self._materialized_refresh(entry)
            self._start_full_timer(entry)
        else:
            # bootstrap an empty snapshot so the path exists with the
            # declared schema, then let the monitored-dir stream ingest
            # existing + new source files at the freshness cadence
            self._mt_new_version(entry, batch_df.limit(0))
            self._start_continuous(entry)
        return None

    def _mt_writer(self, entry: dict, df):
        meta = entry["meta"]
        writer = df.write.format(meta.options.get("format", "parquet"))
        if meta.partitioned_by:
            writer = writer.partitionBy(*meta.partitioned_by)
        return writer

    def _mt_new_version(self, entry: dict, df) -> None:
        """Full-refresh write, safe under concurrent readers: the new
        snapshot lands in a fresh `_v<N>` directory under the declared
        path, the views re-point to it, and only versions older than the
        PREVIOUS one are garbage-collected — an in-place overwrite would
        delete files out from under any in-flight scan (the same reason
        Flink's full refresh swaps table snapshots atomically rather than
        truncating)."""
        meta = entry["meta"]
        entry["version"] += 1
        cur = os.path.join(entry["root"], f"_v{entry['version']:06d}")
        self._mt_writer(entry, df).mode("overwrite").save(cur)
        meta.options["path"] = cur
        meta.stats = None
        self._register(meta, db=entry["db"])
        if os.path.isdir(entry["root"]):
            for d in os.listdir(entry["root"]):
                if d.startswith("_v") and d < f"_v{entry['version'] - 1:06d}":
                    shutil.rmtree(os.path.join(entry["root"], d), ignore_errors=True)

    def _mt_append_epoch(self, entry: dict, df) -> None:
        meta = entry["meta"]
        self._mt_writer(entry, df).mode("append").save(meta.options["path"])
        meta.stats = None  # the table grew — any broadcast verdict is stale
        self._register(meta, db=entry["db"])

    def _start_continuous(self, entry: dict) -> None:
        meta, name = entry["meta"], entry["meta"].name
        df = self.execute_sql(entry["definition"])
        if not df.isStreaming:
            raise ValueError(
                f"materialized table {name!r}: REFRESH_MODE = CONTINUOUS "
                "requires streaming-capable sources (monitored-dir tables "
                "with 'scan.streaming'='true'); declare REFRESH_MODE = FULL "
                "for bounded sources"
            )
        def write_epoch(bdf, _epoch_id):
            self._mt_append_epoch(entry, bdf)

        q = (
            df.writeStream.queryName(f"mt:{name}")
            .foreachBatch(write_epoch)
            .option("checkpointLocation", entry["root"] + "_checkpoint")
            .trigger(processingTime=f"{int(entry['freshness_sec'])} seconds")
            .start()
        )
        entry["query"] = q
        entry["status"] = "RUNNING"
        self._track_job(q)

    def _start_full_timer(self, entry: dict) -> None:
        import threading

        stop = threading.Event()
        entry["stop_event"] = stop
        entry["status"] = "RUNNING"

        def loop():
            while not stop.wait(entry["freshness_sec"]):
                try:
                    self._materialized_refresh(entry, from_timer=stop)
                except Exception as ex:  # recorded, cadence continues
                    entry["last_error"] = repr(ex)

        t = threading.Thread(
            target=loop, daemon=True, name=f"mt-refresh-{entry['meta'].name}"
        )
        t.start()

    def _materialized_refresh(
        self,
        entry: dict,
        part_body: str | None = None,
        from_timer=None,
    ):
        # the timer thread enters here directly (not through execute_sql)
        # — take the same lock so the batch-view swap can never interleave
        # with a user statement's lowering
        with self._ddl_lock:
            if from_timer is not None and (
                from_timer.is_set()
                or self._materialized.get(entry["meta"].name) is not entry
                or entry.get("stop_event") is not from_timer
            ):
                # stale tick: it fired, then blocked here while DROP /
                # SUSPEND / SET REFRESH_MODE / SET FRESHNESS held the
                # lock. Running it now would resurrect a dropped
                # table's snapshot dir and temp views (or duplicate a
                # re-cadenced refresh) — discard it instead
                return None
            return self._materialized_refresh_locked(entry, part_body)

    def _materialized_refresh_locked(
        self, entry: dict, part_body: str | None = None
    ):
        meta = entry["meta"]
        q = entry.get("query")
        if q is not None and q.isActive:
            raise ValueError(
                f"materialized table {meta.name!r} is RUNNING in continuous "
                "mode — ALTER MATERIALIZED TABLE ... SUSPEND before a manual "
                "REFRESH (concurrent batch overwrite and streaming appends "
                "would race)"
            )
        from pyspark.sql import functions as F

        with self._batch_source_views():
            df = self.execute_sql(entry["definition"])
        if part_body:
            # partition-scoped backfill: dynamic overwrite replaces only
            # the refreshed partitions IN PLACE on the current snapshot
            # (a fresh version would drop the untouched partitions)
            spec = self._parse_partition_spec(part_body)
            unknown = set(spec) - set(meta.partitioned_by)
            if unknown:
                raise ValueError(
                    f"not partition keys of {meta.name}: {sorted(unknown)}"
                )
            for k, v in spec.items():
                df = df.filter(F.col(k).cast("string") == v)
            prev = self.spark.conf.get("spark.sql.sources.partitionOverwriteMode")
            self.spark.conf.set(
                "spark.sql.sources.partitionOverwriteMode", "dynamic"
            )
            try:
                self._mt_writer(entry, df).mode("overwrite").save(
                    meta.options["path"]
                )
            finally:
                self.spark.conf.set(
                    "spark.sql.sources.partitionOverwriteMode", prev
                )
            meta.stats = None
            self._register(meta, db=entry["db"])
        else:
            self._mt_new_version(entry, df)
        return None

    def _suspend_materialized(self, entry: dict) -> None:
        q = entry.get("query")
        if q is not None and q.isActive:
            # finish the in-flight epoch so SUSPEND/RESUME is exactly-once
            # (stop() mid-batch would replay the epoch's append on resume);
            # bounded like STOP JOB WITH DRAIN — a monitored dir with no
            # new files returns immediately
            import threading

            timeout = float(
                self.session_options.get("stop-job.drain-timeout-sec", "30")
            )
            waiter = threading.Thread(target=q.processAllAvailable, daemon=True)
            waiter.start()
            waiter.join(timeout)
            q.stop()
        ev = entry.get("stop_event")
        if ev is not None:
            ev.set()
        entry["status"] = "SUSPENDED"

    def _alter_materialized_table(self, name: str, action: str):
        entry = self._materialized.get(name)
        if entry is None:
            raise ValueError(f"materialized table not found: {name}")
        au = action.upper()
        if au == "SUSPEND":
            self._suspend_materialized(entry)
            return None
        m = re.match(r"RESUME(?:\s+WITH\s*\((.*)\))?$", action, re.S | re.I)
        if m:
            if entry["status"] == "RUNNING":
                return None
            if m.group(1):
                entry["meta"].options.update(
                    re.findall(r"'([^']+)'\s*=\s*'([^']*)'", m.group(1))
                )
            if entry["mode"] == "CONTINUOUS":
                # restarts from the retained checkpoint: only source files
                # unseen before the suspension are ingested
                self._start_continuous(entry)
            else:
                self._start_full_timer(entry)
            return None
        m = re.match(r"REFRESH(?:\s+PARTITION\s*\(([^)]*)\))?$", action, re.S | re.I)
        if m:
            return self._materialized_refresh(entry, m.group(1))
        m = re.match(
            r"SET\s+FRESHNESS\s*=\s*INTERVAL\s+'(\d+)'\s+"
            r"(SECOND|MINUTE|HOUR|DAY)S?$",
            action,
            re.I,
        )
        if m:
            entry["freshness_sec"] = int(m.group(1)) * self._FRESHNESS_UNIT_SEC[
                m.group(2).upper()
            ]
            if entry["status"] == "RUNNING":  # re-apply the cadence
                self._suspend_materialized(entry)
                if entry["mode"] == "CONTINUOUS":
                    self._start_continuous(entry)
                else:
                    self._start_full_timer(entry)
            return None
        m = re.match(r"SET\s+REFRESH_MODE\s*=\s*(FULL|CONTINUOUS)$", action, re.I)
        if m:
            new_mode = m.group(1).upper()
            if new_mode == entry["mode"]:
                return None
            was_running = entry["status"] == "RUNNING"
            self._suspend_materialized(entry)
            entry["mode"] = new_mode
            entry["query"] = None
            if new_mode == "CONTINUOUS":
                # the stream has no checkpoint yet and will re-ingest
                # every source file — the existing full snapshot would
                # duplicate all of it. Rebuild from empty (same reason
                # the AS-query branch wipes): the stream IS the content.
                meta = entry["meta"]
                shutil.rmtree(entry["root"], ignore_errors=True)
                shutil.rmtree(entry["root"] + "_checkpoint", ignore_errors=True)
                entry["version"] = 0
                with self._batch_source_views():
                    batch_df = self.execute_sql(entry["definition"])
                self._mt_new_version(entry, batch_df.limit(0))
                if was_running:
                    self._start_continuous(entry)
            elif was_running:
                self._materialized_refresh(entry)
                self._start_full_timer(entry)
            return None
        m = re.match(r"AS\s+(.*)$", action, re.S | re.I)
        if m:
            # SqlAlterMaterializedTableAsQuery: swap the definition. The
            # backing data and (continuous) checkpoint are wiped so the
            # stream reprocesses every source file under the NEW query —
            # the only state that is consistent with the new definition.
            was_running = entry["status"] == "RUNNING"
            self._suspend_materialized(entry)
            entry["definition"] = m.group(1).strip()
            with self._batch_source_views():
                batch_df = self.execute_sql(entry["definition"])
            meta = entry["meta"]
            meta.columns = [
                (f.name, f.dataType.simpleString()) for f in batch_df.schema.fields
            ]
            shutil.rmtree(entry["root"], ignore_errors=True)
            shutil.rmtree(entry["root"] + "_checkpoint", ignore_errors=True)
            entry["query"] = None
            entry["version"] = 0
            if entry["mode"] == "CONTINUOUS":
                self._mt_new_version(entry, batch_df.limit(0))
                if was_running:
                    self._start_continuous(entry)
            else:
                self._materialized_refresh(entry)
                if was_running:
                    self._start_full_timer(entry)
            return None
        # SET ('k'='v') / RESET ('k') (SqlAlterMaterializedTableOptions
        # .java, SqlAlterMaterializedTableReset.java): table options on
        # the backing catalog object; the managed identity (connector,
        # path) is not an option
        m = re.match(r"SET\s*\((.*)\)$", action, re.S | re.I)
        if m:
            kvs = re.findall(r"'([^']+)'\s*=\s*'([^']*)'", m.group(1))
            if any(k in ("connector", "path") for k, _ in kvs):
                raise ValueError(
                    "ALTER MATERIALIZED TABLE SET cannot change the "
                    "managed 'connector'/'path'"
                )
            entry["meta"].options.update(kvs)
            return None
        m = re.match(r"RESET\s*\((.*)\)$", action, re.S | re.I)
        if m:
            keys = [
                k.strip().strip("'")
                for k in _split_top_all(m.group(1), ",")
                if k.strip()
            ]
            if not keys:
                raise ValueError(
                    "ALTER MATERIALIZED TABLE RESET requires at least one key"
                )
            if any(k in ("connector", "path") for k in keys):
                raise ValueError(
                    "ALTER MATERIALIZED TABLE RESET cannot remove the "
                    "managed 'connector'/'path'"
                )
            for k in keys:
                entry["meta"].options.pop(k, None)
            return None
        raise ValueError(f"unsupported ALTER MATERIALIZED TABLE action: {action!r}")

    def _drop_materialized_table(self, name: str, if_exists: bool):
        entry = self._materialized.get(name)
        if entry is None:
            if if_exists:
                return None
            raise ValueError(f"materialized table not found: {name}")
        self._suspend_materialized(entry)
        meta = entry["meta"]
        self._materialized.pop(name, None)
        for db, tbls in self._dbs.items():
            if tbls.get(name) is meta:
                tbls.pop(name, None)
                self.spark.catalog.dropTempView(_db_view_name(db, name))
                self.spark.catalog.dropTempView(
                    _ctl_view_name(self.current_catalog, db, name)
                )
        if entry["db"] == self.current_db:
            # the bare name belongs to the MT's own database — dropping
            # it from another db would clobber a same-named table there
            self.spark.catalog.dropTempView(name)
        shutil.rmtree(entry["root"], ignore_errors=True)
        shutil.rmtree(entry["root"] + "_checkpoint", ignore_errors=True)
        return None

    # -- streaming OVER aggregation (StreamExecOverAggregate.java:74) ----
    _OVER_ITEM = re.compile(
        r"(SUM|COUNT|AVG)\s*\(\s*(\*|`?\w+`?)\s*\)\s*OVER\s+"
        r"(\w+|\([^)]*\))\s+AS\s+`?(\w+)`?$",
        re.S | re.I,
    )
    _OVER_STMT = re.compile(
        r"SELECT\s+(.*?)\s+FROM\s+`?(\w+)`?\s*"
        r"(?:WINDOW\s+(\w+)\s+AS\s*\(([^)]*)\))?\s*$",
        re.S | re.I,
    )
    _OVER_SPEC = re.compile(
        r"PARTITION\s+BY\s+(.+?)\s+ORDER\s+BY\s+`?(\w+)`?\s+"
        r"(ROWS|RANGE)\s+BETWEEN\s+(.*?)\s+PRECEDING\s+AND\s+CURRENT\s+ROW$",
        re.S | re.I,
    )

    def _try_streaming_over(self, stmt: str) -> DataFrame | None:
        """Streaming over-aggregation — `SUM/COUNT/AVG(v) OVER
        (PARTITION BY k ORDER BY rowtime ROWS n PRECEDING | RANGE
        INTERVAL PRECEDING)` on a streaming table (Spark rejects window
        functions on streams): lowered onto the keyed-state facades
        streaming_over_rows / streaming_over_range
        (RowTimeRowsBoundedPrecedingFunction.java:57 /
        RowTimeRangeBoundedPrecedingFunction.java:64 — one emission per
        input row, update mode). Recognized strictly: one streaming
        table, one shared window spec (inline or a WINDOW clause) over
        the declared rowtime, all aggregates over one value column
        (COUNT(*) allowed), select items limited to keys/rowtime/value
        plus the aggregates. Anything else returns None → Catalyst's
        own error."""
        m = self._OVER_STMT.match(stmt.strip())
        if not m or "OVER" not in stmt.upper():
            return None
        tbl = m.group(2)
        if not self._is_streaming_table(tbl):
            return None
        named = {m.group(3): m.group(4).strip()} if m.group(3) else {}
        # items in SELECT-LIST ORDER — the output projection must
        # preserve it (positional consumers: INSERT sinks, SELECT *)
        items: list[tuple[str, tuple]] = []  # ("plain", (col, alias)) |
        # ("agg", (fn, col, alias))
        aggs: list[tuple[str, str, str]] = []
        spec_texts: set[str] = set()
        for item in _split_top_all(m.group(1), ","):
            item = item.strip()
            om = self._OVER_ITEM.match(item)
            if om:
                spec = om.group(3)
                if spec.startswith("("):
                    spec_texts.add(spec[1:-1].strip())
                elif spec in named:
                    spec_texts.add(named[spec])
                else:
                    return None
                fn_, col = om.group(1).upper(), om.group(2).strip("`")
                if fn_ == "COUNT" and col != "*":
                    return None  # COUNT(col) ≠ COUNT(*) under NULLs
                entry = (fn_, col, om.group(4))
                aggs.append(entry)
                items.append(("agg", entry))
                continue
            cm = re.match(r"`?(\w+)`?(?:\s+AS\s+`?(\w+)`?)?$", item, re.I)
            if not cm:
                return None
            items.append(("plain", (cm.group(1), cm.group(2) or cm.group(1))))
        if not aggs or len(spec_texts) != 1:
            return None
        plain = [p for kind, p in items if kind == "plain"]
        sm = self._OVER_SPEC.match(spec_texts.pop())
        if not sm:
            return None
        keys = [k.strip().strip("`") for k in sm.group(1).split(",")]
        ts = sm.group(2)
        meta = self._resolve_meta(tbl)
        if not (meta and meta.watermark and meta.watermark[0] == ts):
            return None  # rowtime ordering only (proc-time → Catalyst)
        vcols = {c for f, c, _ in aggs if not (f == "COUNT" and c == "*")}
        if len(vcols) > 1:
            return None
        v = vcols.pop() if vcols else None
        for name, _alias in plain:
            if name not in keys and name != ts and name != v:
                return None  # facade carries keys/rowtime/value only
        if v is None:
            return None  # COUNT-only shape still needs the value column
        from flink_1_20_spark.streaming.process import (
            streaming_over_range,
            streaming_over_rows,
        )

        df = self.spark.table(tbl)
        types = dict(df.dtypes)
        if any(k not in types for k in keys) or ts not in types or v not in types:
            return None  # expression keys etc. → Catalyst's own error
        # facade contract: the value and its aggregates are DOUBLE
        # (Flink types SUM(BIGINT) as BIGINT; the keyed-state facade
        # computes in float — documented divergence), and the value
        # column must be non-null numeric
        out_schema = ", ".join(
            [
                *(f"{k} {types[k]}" for k in keys),
                f"ts {types[ts]}",
                "value double",
                "win_sum double",
                "win_cnt bigint",
                "win_avg double",
            ]
        )
        bound = sm.group(4).strip()
        if sm.group(3).upper() == "ROWS":
            if not re.fullmatch(r"\d+", bound):
                return None
            out = streaming_over_rows(df, keys, ts, v, int(bound), out_schema)
        else:
            from flink_1_20_spark.sql_flink import _parse_interval

            try:
                secs = _parse_interval(bound)[2]
            except Exception:
                return None
            out = streaming_over_range(df, keys, ts, v, int(secs), out_schema)
        from pyspark.sql import functions as F

        facade = {"SUM": "win_sum", "COUNT": "win_cnt", "AVG": "win_avg"}
        sel = []
        for kind, payload in items:  # SELECT-LIST order preserved
            if kind == "plain":
                name, alias = payload
                src = "ts" if name == ts else ("value" if name == v else name)
                sel.append(F.col(src).alias(alias))
            else:
                fn_, _c, alias = payload
                sel.append(F.col(facade[fn_]).alias(alias))
        return out.select(*sel)

    _DEDUP_RANK = re.compile(
        r"^\s*SELECT\s+(?P<outer>.+?)\s+FROM\s*\(\s*"
        r"SELECT\s+\*\s*,\s*ROW_NUMBER\s*\(\s*\)\s*OVER\s*\(\s*"
        r"PARTITION\s+BY\s+(?P<keys>[^)]+?)\s+"
        r"ORDER\s+BY\s+`?(?P<ts>\w+)`?\s*(?P<dir>ASC|DESC)?\s*\)\s+"
        r"AS\s+(?P<rn>\w+)\s+FROM\s+`?(?P<tbl>\w+)`?\s*\)\s*"
        r"(?:AS\s+)?\w*\s*WHERE\s+(?P=rn)\s*(?P<cmp><=|=)\s*(?P<topn>\d+)\s*$",
        re.S | re.I,
    )

    def _try_streaming_dedup(self, stmt: str) -> DataFrame | None:
        """Flink's streaming rank shapes — dedup AND Top-N — recognized
        on `ROW_NUMBER() OVER (PARTITION BY k ORDER BY c [ASC|DESC])
        ... WHERE rn <= N` (or `= 1`) over a streaming table (Spark
        cannot run row_number on a stream):

        - N = 1 on the declared WATERMARK rowtime → deduplication
          (StreamExecDeduplicate.java:89): stateful min_by/max_by per
          key — event-time keep-first/keep-last including out-of-order
          rows, an updating result like Flink's dedup changelog. Rows
          with EQUAL timestamps: min_by/max_by picks an arbitrary one,
          where Flink's RowTimeDeduplicateFunction keeps the first/last
          ARRIVED — arrival order isn't observable to a Spark stateful
          aggregate, so ties are nondeterministic here (Flink's own
          pick is arrival-dependent and not reproducible across runs
          either). SELECT * drops the constant-1 rank column; an
          outer projection reading it falls through.
        - anything else (N > 1, or N = 1 ordered by a non-rowtime
          column) → streaming Top-N (StreamExecRank.java:70) via
          streaming/rank.streaming_topn: per-key state bounded by N,
          the rank column emitted under the user's alias, update-mode
          changelog keyed on (keys, rank).

        Returns None (→ Catalyst) for batch sources, `rn = N` with
        N ≠ 1, or unmatched shapes."""
        m = self._DEDUP_RANK.match(stmt)
        if not m:
            return None
        tbl = m.group("tbl")
        if not self._is_streaming_table(tbl):
            return None
        n = int(m.group("topn"))
        if m.group("cmp") == "=" and n != 1:
            return None  # `rn = 3` selects one exact rank — not dedup/Top-N
        if n < 1:
            return None  # `rn <= 0` is a degenerate empty query — Catalyst
        meta = self._resolve_meta(tbl)
        ts = m.group("ts")
        outer = m.group("outer").strip()
        keys = [k.strip().strip("`") for k in m.group("keys").split(",")]
        if ts in keys:
            return None  # ordering by a partition key — degenerate rank
        df = self.spark.table(tbl)
        ascending = (m.group("dir") or "ASC").upper() == "ASC"
        rowtime = meta is not None and meta.watermark and meta.watermark[0] == ts
        outer_reads_rank = bool(
            re.search(rf"\b{re.escape(m.group('rn'))}\b", outer)
        )
        if n == 1 and rowtime and not outer_reads_rank:
            # pure dedup (rank dropped): event-time keep-first/last;
            # equal-timestamp ties are arbitrary (see docstring)
            from pyspark.sql import functions as F

            pick = F.min_by if ascending else F.max_by
            rest = [c for c in df.columns if c not in keys]
            picked = df.groupBy(*keys).agg(
                pick(F.struct(*rest), F.col(ts)).alias("__r")
            )
            # source column order preserved (keys stay in declared position)
            out = picked.select(
                *[
                    F.col(c) if c in keys else F.col(f"__r.{c}").alias(c)
                    for c in df.columns
                ]
            )
        else:
            # general Top-N (StreamExecRank): bounded per-key state, the
            # rank column IS part of the output (named as the user's
            # alias) so outer projections may read it — including the
            # rowtime-ordered rn<=1 case when the outer SELECT wants rn
            from flink_1_20_spark.streaming.rank import streaming_topn

            out = streaming_topn(
                df, keys, ts, n, ascending=ascending, rank_col=m.group("rn")
            )
        if outer == "*":
            return out
        view = f"__dedup_{abs(hash(stmt)) % 10**8}"
        out.createOrReplaceTempView(view)
        return self.spark.sql(f"SELECT {outer} FROM {view}")

    def _sql_streaming_lowered(self, query: str) -> DataFrame:
        """spark.sql with the streaming window-TVF compatibility pass:
        streaming CUMULATE gets the documented facade pointer, and a
        streaming __w aggregation is re-lowered with the window STRUCT
        in the GROUP BY (Spark's append-mode watermark check requires
        it; functionally dependent on start+end so results are
        identical). The lookahead admits only identifier-list characters
        between GROUP BY and window_start, so GROUP BYs of unrelated
        subqueries (crossing parentheses) are never touched. Shared by
        the SELECT fallthrough and the INSERT body path."""
        df = self.spark.sql(query)
        if df.isStreaming and "__cum" in query:
            # streaming CUMULATE: expose the hidden max-window struct and
            # group by it — (__wm, window_end) keys each slice, and the
            # struct satisfies the append-mode watermark check. Emission
            # note (documented parity gap): every slice of a bucket emits
            # when the bucket's MAX window passes the watermark, where
            # Flink's SliceAssigners emit each slice at its own end — the
            # emitted rows are identical, later.
            from flink_1_20_spark.sql_flink import CUMULATE_HIDDEN_PROJ

            fixed = query.replace(CUMULATE_HIDDEN_PROJ, "SELECT * EXCEPT(__we),")
            fixed, n = re.subn(
                r"(GROUP\s+BY\s+)(?=[\w\s,.`]*\bwindow_start\b)",
                r"\1__wm, ",
                fixed,
                flags=re.I,
            )
            if not n:
                raise ValueError(
                    "streaming CUMULATE window TVF requires the aggregate "
                    "GROUP BY window_start, window_end shape — use "
                    "flink_1_20_spark.streaming.windows.cumulate_window_agg "
                    "on the DataFrame API for other shapes"
                )
            return self.spark.sql(fixed)
        if df.isStreaming and query.count("EXCEPT(__w)") >= 2 and re.search(
            r"\bJOIN\b", query, re.I
        ):
            # streaming window JOIN (StreamExecWindowJoin.java): two
            # TVF-windowed streams joined on window_start AND window_end.
            # Joining on the PROJECTED timestamps runs, but Spark derives
            # NO state-cleanup watermark from them — join state grows
            # forever (probed: 0 rows ever removed). Joining on the
            # window STRUCT itself is the documented stream-stream
            # window-join shape and evicts closed windows, so the
            # lowering keeps __w on both sides and adds the struct
            # equality to the ON condition (the start/end equalities it
            # implies stay — they are harmless conjuncts).
            upgraded = self._upgrade_streaming_window_join(query)
            if upgraded is not None:
                return upgraded
        if df.isStreaming:
            # set ops FIRST: each side gets its own full lowering
            # recursively (incl. the GROUP-BY-__w pass below, which
            # must never run across a set-op boundary)
            lowered = self._maybe_streaming_setop(query)
            if lowered is not None:
                return lowered
        if df.isStreaming and "__w" in query:
            fixed, n = re.subn(
                r"(GROUP\s+BY\s+)(?=[\w\s,.`]*\bwindow_start\b)",
                r"\1__w, ",
                query,
                flags=re.I,
            )
            if n:
                fixed = fixed.replace("SELECT * EXCEPT(__w),", "SELECT *,")
                df = self.spark.sql(fixed)
        return df

    def _upgrade_streaming_window_join(self, query: str) -> DataFrame | None:
        """Rewrite a lowered streaming window join to keep the window
        STRUCT and join on it (state-eviction contract — see caller).
        Applies only to the canonical single-join shape whose OUTERMOST
        select list is star-free; anything else returns None and the
        caller keeps the already-planned form (correct rows, unbounded
        state). Only the outermost list decides the output schema — a
        star there (SELECT *, SELECT L.*) would leak the kept struct
        into the sink; wrapper stars INSIDE subqueries (the idiomatic
        `SELECT * FROM TABLE(TUMBLE(...))`) merely forward columns and
        must not disqualify the upgrade (a prior guard rejected on any
        star anywhere, silently disabling it for every canonical TVF
        query). Over-rejecting unknown shapes (WITH, COUNT(*)) only
        forgoes state eviction, never correctness."""
        if self._outer_select_has_star(query):
            return None
        mw = re.search(
            r"\bON\b(.*?)(?=\bWHERE\b|\bGROUP\s+BY\b|\bORDER\s+BY\b|\bLIMIT\b|$)",
            query,
            re.S | re.I,
        )
        if not mw:
            return None
        cond = mw.group(1)
        ms = re.search(r"(\w+)\.window_start\s*=\s*(\w+)\.window_start", cond, re.I)
        me = re.search(r"(\w+)\.window_end\s*=\s*(\w+)\.window_end", cond, re.I)
        if not (ms and me) or set(ms.groups()) != set(me.groups()):
            return None
        la, ra = ms.group(1), ms.group(2)
        fixed = query.replace(
            "SELECT * EXCEPT(__w), __w.start AS window_start",
            "SELECT *, __w.start AS window_start",
        )
        fixed = re.sub(
            r"\bON\b",
            f"ON {la}.__w = {ra}.__w AND ",
            fixed,
            count=1,
            flags=re.I,
        )
        try:
            df = self.spark.sql(fixed)
            return df if df.isStreaming else None
        except Exception:
            return None

    @staticmethod
    def _guard_setop_cte_scope(query: str, right_text: str) -> None:
        """The streaming set-op lowering splits the TEXT at the
        operator, so a leading WITH scope is invisible to the right
        side.  Reject when the right side uses a declared CTE name in a
        TABLE position (after FROM/JOIN — a column merely named like a
        CTE must not misfire) — resolution-failure classification is
        not enough: a same-named REGISTERED table would silently bind
        instead of the CTE (wrong results, no error), and an unrelated
        missing-table typo must keep its own error.  A WITH whose CTEs
        only the left side uses keeps working (the left split retains
        the full prefix).  An unparseable WITH prologue fails safe:
        unknown CTEs must not silently disarm the guard."""
        names, complete = _leading_cte_names(query)
        if re.match(r"\s*WITH\b", query, re.I) and not complete:
            raise ValueError(
                "cannot establish the WITH/CTE scope of this streaming "
                "set operation (unparseable CTE prologue) — the lowering "
                "splits the text at the operator, losing the scope; "
                "inline the CTEs or stage them through a table"
            )
        # comments blanked first (r10): `JOIN -- note\n cte` slipped the
        # FROM/JOIN regex (\s+ cannot cross the comment TEXT) and the
        # comma scanner (which stops at the JOIN stop-keyword), letting
        # the CTE name silently bind to a same-named registered table.
        # String literals blanked too: 'pulled FROM c' is content, and
        # matching it falsely REJECTS a valid query. Backticks survive —
        # `FROM \`c\`` is a real reference and must keep firing.
        scope_text = _mask_string_literals(_blank_line_comments(right_text))
        comma_tables = _from_comma_tables(scope_text) if names else set()
        for name in names:
            if name.lower() in comma_tables or re.search(
                rf"\b(?:FROM|JOIN)\s+`?{re.escape(name)}`?\b",
                scope_text,
                re.I,
            ):
                raise ValueError(
                    f"streaming set operations whose right side references "
                    f"the WITH/CTE name {name!r} are not supported (the "
                    "lowering splits the text at the operator, losing the "
                    "CTE scope) — inline the CTE or stage it through a "
                    "table"
                )

    def _maybe_streaming_setop(self, query: str):
        """Streaming INTERSECT / EXCEPT (StreamExecIntersect/Minus —
        Flink computes both over the retraction changelog). Spark's
        checker rejects Intersect/Except on streams outright (and semi
        joins demand watermarked keys), but INTERSECT DISTINCT lowers
        to supported pieces: dropDuplicates each side (append-mode
        streaming dedup), then a plain stream-stream INNER join on
        null-safe key equality — both sides unique, so each common row
        emits exactly once when both have arrived. EXCEPT [ALL] and
        INTERSECT ALL need retraction state (their result UPDATES as
        right-side rows arrive), which no append DataFrame can carry —
        they reject here with a pointer to INSERT INTO a filesystem
        sink, where _try_streaming_setop_insert materializes the
        signed-count composition (streaming/setops.py), or to the
        changelog facade (operators/changelog_join.py) for direct
        DataFrame use."""
        found = _scan_streaming_setops(query)
        if not found:
            return None
        start, end, op, is_all = found[0]
        if op == "EXCEPT" or is_all:
            what = "EXCEPT" if op == "EXCEPT" else "INTERSECT ALL"
            raise ValueError(
                f"streaming {what} needs retraction state (Flink's "
                "StreamExecMinus/Intersect keep per-row multiset "
                "counts) — an updating result cannot be returned as an "
                "append DataFrame; INSERT INTO a filesystem sink to "
                "materialize it (the signed-count state of "
                "operators/changelog_join.py, managed per epoch), or "
                "use the changelog facade directly"
            )
        # each side takes the FULL streaming lowering recursively —
        # windowed-aggregate sides get their GROUP-BY-__w pass, and a
        # chained `A INTERSECT B INTERSECT C` right side lowers itself
        # (INTERSECT is commutative/associative, so first-keyword
        # splitting is order-safe; EXCEPT anywhere raises above)
        self._guard_setop_cte_scope(query, query[end:])
        left = self._sql_streaming_lowered(query[:start]).dropDuplicates()
        right = self._sql_streaming_lowered(query[end:]).dropDuplicates()
        if len(left.columns) != len(right.columns):
            raise ValueError("INTERSECT sides must have equal column counts")
        cond = None
        for lc, rc in zip(left.columns, right.columns):
            c = left[lc].eqNullSafe(right[rc])
            cond = c if cond is None else cond & c
        return left.join(right, on=cond, how="inner").select(
            *[left[c] for c in left.columns]
        )

    @staticmethod
    def _outer_select_has_star(query: str) -> bool:
        """True when the OUTERMOST select list (leading SELECT up to its
        paren-depth-0 FROM) contains a PROJECTION star — `*` or `L.*` at
        list position (start of list, after a comma, or after a dot),
        at depth 0. Multiplication (`a * 2`) and stars inside calls
        (COUNT(*)) are not projection stars. Non-SELECT-leading shapes
        (WITH, ...) read as True, conservatively — the caller then
        forgoes the struct upgrade, which for OUTER window joins means
        the query fails Spark's outer-join watermark check at start
        (documented cost of the unknown shape, not a correctness risk
        for anything that runs)."""
        s = query.lstrip()
        m = re.match(r"SELECT\s", s, re.I)
        if not m:
            return True
        depth, q, i = 0, None, m.end()
        # skip a set quantifier so SELECT DISTINCT * / SELECT ALL *
        # still classify the star as the first list item
        sq = re.match(r"\s*(DISTINCT|ALL)\b", s[i:], re.I)
        if sq:
            i += sq.end()
        # last significant depth-0 char, for star-position classification
        prev = ","  # list start behaves like 'after a comma'
        while i < len(s):
            ch = s[i]
            if q:
                if ch == q:
                    q = None
            elif ch in "'\"`":
                q = ch
                if depth == 0:
                    prev = "x"  # a literal/identifier, not a list break
            elif ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0:
                    prev = "x"
            elif depth == 0:
                if ch in "Ff" and re.match(r"FROM\b", s[i:], re.I) and not (
                    s[i - 1].isalnum() or s[i - 1] == "_"
                ):
                    return False
                if ch == "*" and prev in (",", "."):
                    return True
                if not ch.isspace():
                    prev = ch if ch in ",." else "x"
            i += 1
        return False

    def _is_streaming_table(self, name: str) -> bool:
        """True when `name` resolves to a streaming temp view — the
        window-TVF lowering uses this to pick streaming-compatible forms
        (SESSION → native session_window struct)."""
        try:
            return bool(self.spark.table(name.strip("`")).isStreaming)
        except Exception:
            return False

    def _broadcast_threshold(self) -> int:
        raw = self.session_options.get(
            "table.optimizer.join.broadcast-threshold",
            str(self.BROADCAST_THRESHOLD_DEFAULT),
        )
        try:
            return int(raw)
        except ValueError:
            return self.BROADCAST_THRESHOLD_DEFAULT

    # -- partitions (SqlShowPartitionsConverter.java,
    # SqlAlterTableAddPartitionConverter.java,
    # SqlAlterTableDropPartitionConverter.java) --------------------------
    @staticmethod
    def _parse_partition_spec(body: str) -> dict[str, str]:
        """`dt = '2024-01-01', hr = 0` → {'dt': '2024-01-01', 'hr': '0'}"""
        spec: dict[str, str] = {}
        for kv in _split_top_all(body, ","):
            m = re.match(r"\s*`?(\w+)`?\s*=\s*(.+?)\s*$", kv)
            if not m:
                raise ValueError(f"cannot parse partition spec entry: {kv!r}")
            spec[m.group(1)] = m.group(2).strip().strip("'\"")
        return spec

    def _partitioned_meta(self, name: str) -> TableMeta:
        meta = self._resolve_meta(name)
        if meta is None:
            raise ValueError(f"table not found: {name}")
        if meta.connector != "filesystem" or not meta.partitioned_by:
            raise ValueError(f"table {meta.name} is not partitioned")
        return meta

    def _show_partitions(self, name: str, spec_body: str | None) -> DataFrame:
        """List the partition directories of a partitioned filesystem
        table as Flink-style `k=v[/k2=v2]` spec strings (partition
        pruning on read works directly against this layout — the scan's
        PartitionFilters prune whole listed directories)."""
        meta = self._partitioned_meta(name)
        root = meta.options["path"]
        parts: list[str] = []

        def walk(d: str, depth: int, prefix: list[str]) -> None:
            if depth == len(meta.partitioned_by):
                parts.append("/".join(prefix))
                return
            key = meta.partitioned_by[depth] + "="
            if not os.path.isdir(d):
                return
            for entry in sorted(os.listdir(d)):
                if entry.startswith(key) and os.path.isdir(os.path.join(d, entry)):
                    walk(os.path.join(d, entry), depth + 1, prefix + [entry])

        walk(root, 0, [])
        if spec_body:
            want = self._parse_partition_spec(spec_body)
            unknown = set(want) - set(meta.partitioned_by)
            if unknown:
                raise ValueError(f"not partition keys of {meta.name}: {sorted(unknown)}")

            def keep(p: str) -> bool:
                kv = dict(seg.split("=", 1) for seg in p.split("/"))
                return all(kv.get(k) == v for k, v in want.items())

            parts = [p for p in parts if keep(p)]
        return self.spark.createDataFrame(
            [(p,) for p in parts] or [], "partition string"
        )

    def _alter_partitions(self, meta: TableMeta, action: str):
        """ADD creates the partition directories (Flink's filesystem
        catalog add-partition registers an empty location); DROP removes
        them and their data. Multiple `PARTITION (...)` specs per
        statement, per the reference grammar."""
        m = re.match(
            r"(ADD|DROP)\s+(IF\s+(?:NOT\s+)?EXISTS\s+)?(.+)$", action, re.S | re.I
        )
        op, guarded = m.group(1).upper(), bool(m.group(2))
        if meta.connector != "filesystem" or not meta.partitioned_by:
            raise ValueError(f"table {meta.name} is not partitioned")
        specs = re.findall(r"PARTITION\s*\(([^)]*)\)", m.group(3), re.I)
        if not specs:
            raise ValueError(f"no PARTITION spec in: {action!r}")
        root = meta.options["path"]
        for body in specs:
            spec = self._parse_partition_spec(body)
            if set(spec) != set(meta.partitioned_by):
                raise ValueError(
                    f"partition spec {sorted(spec)} must name exactly the "
                    f"partition keys {meta.partitioned_by}"
                )
            d = os.path.join(root, *[f"{k}={spec[k]}" for k in meta.partitioned_by])
            if op == "ADD":
                if os.path.exists(d):
                    if not guarded:
                        raise ValueError(f"partition already exists: {d}")
                    continue
                os.makedirs(d)
            else:
                if not os.path.exists(d):
                    if not guarded:
                        raise ValueError(f"partition does not exist: {d}")
                    continue
                shutil.rmtree(d)
        owner = next(
            (db for db, ts in self._dbs.items() if ts.get(meta.name) is meta),
            self.current_db,
        )
        self._register(meta, db=owner)  # refresh the view over the new layout
        return None

    # -- CREATE TABLE ----------------------------------------------------
    def _create_table_as(
        self,
        name: str,
        or_replace: bool,
        if_not_exists: bool,
        options_body: str,
        query: str,
    ):
        """CTAS (SqlCreateTableAs.java:69) / RTAS (SqlReplaceTableAs.java):
        derive the schema from the query, create the backing table, then
        run the query through the normal INSERT path (so streaming
        definitions start a continuous insert job exactly as
        `CREATE TABLE ...; INSERT INTO ...` would). OR REPLACE drops the
        existing table first — definition AND data are replaced."""
        if name in self._materialized:
            raise ValueError(
                f"{name} is a materialized table — use ALTER MATERIALIZED "
                "TABLE ... AS to change its definition"
            )
        if name in self.tables:
            if if_not_exists:
                return None
            if not or_replace:
                raise ValueError(
                    f"table already exists: {name} (use CREATE OR REPLACE "
                    "TABLE to replace it)"
                )
            self._drop_table(f"DROP TABLE {name}")
        options = dict(re.findall(r"'([^']+)'\s*=\s*'([^']*)'", options_body))
        connector = options.pop("connector", "filesystem")
        if connector != "filesystem":
            raise ValueError(
                f"CREATE TABLE AS: connector {connector!r} cannot persist "
                "a derived schema here (supported: filesystem)"
            )
        fmt = options.pop("format", "parquet")
        path = options.pop("path", None)
        if path is None:
            wh = self.spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
            path = os.path.join(
                re.sub(r"^file:/*", "/", wh), "_tables", self.current_db, name
            )
        df = self.execute_sql(query)
        meta = TableMeta(
            name=name,
            connector="filesystem",
            options={"path": path, "format": fmt, **options},
            columns=[
                (f.name, f.dataType.simpleString()) for f in df.schema.fields
            ],
        )
        self.tables[name] = meta
        self._register(meta)  # lazy-empty until the insert lands
        # OVERWRITE for the batch fill (RTAS must replace old data at a
        # reused path); streaming queries go through the continuous path
        return self._insert_into(name, query, overwrite=not df.isStreaming)

    def _create_table(self, s: str) -> None:
        # DISTRIBUTED BY [HASH|RANGE] (cols) [INTO n BUCKETS] /
        # DISTRIBUTED INTO n BUCKETS (FLIP-376, SqlDistribution.java) —
        # extracted before the main patterns (it sits between the column
        # body and PARTITIONED BY/WITH)
        distribution = None
        # scan only OUTSIDE string literals — a path option like
        # '/data/DISTRIBUTED INTO 3 BUCKETS' is data, not the clause
        parts = re.split(r"('(?:[^']|'')*')", s)
        for i in range(0, len(parts), 2):
            dm = re.search(
                r"\bDISTRIBUTED\s+(?:BY\s+(?:(HASH|RANGE)\s*)?\(([^)]*)\)\s*"
                r"(?:INTO\s+(\d+)\s+BUCKETS)?|INTO\s+(\d+)\s+BUCKETS)",
                parts[i],
                re.I,
            )
            if not dm:
                continue
            kind = (dm.group(1) or "HASH").upper()
            cols = [
                c.strip().strip("`")
                for c in (dm.group(2) or "").split(",")
                if c.strip()
            ]
            raw_buckets = dm.group(3) or dm.group(4)
            buckets = int(raw_buckets) if raw_buckets is not None else None
            if buckets is not None and buckets < 1:
                raise ValueError("bucket count must be at least 1")
            if not cols and buckets is None:
                raise ValueError(
                    "DISTRIBUTED requires bucket columns or a bucket count"
                )
            distribution = (kind, cols, buckets)
            parts[i] = parts[i][: dm.start()] + parts[i][dm.end():]
            s = "".join(parts)
            break
        # PARTITIONED BY is matched by a dedicated pattern FIRST: in the
        # combined pattern the greedy column-body group would swallow the
        # optional clause (regex backtracking prefers the longer body
        # over matching an optional group)
        m = re.match(
            r"CREATE\s+(?:TEMPORARY\s+)?TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?"
            r"(\S+)\s*\((.*)\)\s*(?:COMMENT\s+'[^']*'\s*)?"
            r"PARTITIONED\s+BY\s*\(([^)]*)\)\s*"
            r"WITH\s*\((.*)\)\s*$",
            s,
            re.S | re.I,
        ) or re.match(
            r"CREATE\s+(?:TEMPORARY\s+)?TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?"
            r"(\S+)\s*\((.*)\)\s*(?:COMMENT\s+'[^']*'\s*)?"
            r"()WITH\s*\((.*)\)\s*$",
            s,
            re.S | re.I,
        )
        if not m:
            raise ValueError(f"cannot parse CREATE TABLE: {s[:120]!r}")
        name = m.group(1).strip("`")
        body, part_by, with_body = m.group(2), m.group(3), m.group(4)
        options = dict(
            re.findall(r"'([^']+)'\s*=\s*'([^']*)'", with_body)
        )
        connector = options.pop("connector", None)
        if connector is None:
            raise ValueError("WITH options must include 'connector'")

        meta = TableMeta(name=name, connector=connector, options=options)
        if part_by:
            meta.partitioned_by = [c.strip().strip("`") for c in part_by.split(",")]

        for raw in _split_top_all(body, ","):
            col = raw.strip()
            if not col:
                continue
            cu = col.upper()
            if cu.startswith("PRIMARY KEY"):
                pk = re.search(r"\(([^)]*)\)", col)
                meta.primary_key = [
                    c.strip().strip("`") for c in pk.group(1).split(",")
                ] if pk else []
                continue  # NOT ENFORCED — recorded, never enforced (as in Flink)
            if cu.startswith("WATERMARK"):
                wm = re.match(
                    r"WATERMARK\s+FOR\s+(\S+)\s+AS\s+(.*)$", col, re.S | re.I
                )
                meta.watermark = (wm.group(1).strip("`"), wm.group(2).strip())
                continue
            ac = re.match(r"`?(\w+)`?\s+AS\s+(.*)$", col, re.S | re.I)
            if ac and not re.match(r"`?\w+`?\s+(ARRAY|MAP|ROW)\b", col, re.I):
                meta.computed.append((ac.group(1), ac.group(2).strip()))
                continue
            cname, ctype = col.split(None, 1)
            meta.columns.append((cname.strip("`"), flink_type_to_spark(ctype)))

        if distribution is not None:
            declared = {c for c, _ in meta.columns}
            bad = [c for c in distribution[1] if c not in declared]
            if bad:
                raise ValueError(
                    f"invalid bucket key {bad}: distribution keys must "
                    "be physical columns of the table"
                )
            meta.distribution = distribution
        self._register(meta)
        self.tables[name] = meta

    _CDC_FORMATS = {
        "debezium-json": "parse_debezium",
        "canal-json": "parse_canal",
        "maxwell-json": "parse_maxwell",
        "ogg-json": "parse_ogg",
    }

    def _refresh_sink_views(self) -> None:
        """Re-read filesystem sink views whose static file index cannot
        be trusted: tables registered EMPTY before any file existed
        (`_stale_sink_views`, refreshed once data appears) and tables a
        streaming job is actively writing (`_live_sink_views`, refreshed
        every statement while the job lives — an upsert epoch swaps the
        whole directory, so a frozen index would read deleted files).
        Runs at statement entry; no-op when both maps are empty."""
        from flink_1_20_spark.sources.connectors import has_data_files

        def has_data(meta: TableMeta) -> bool:
            return has_data_files(meta.options.get("path"))

        def is_current(meta: TableMeta, db: str, cat: str) -> bool:
            return (
                self._catalogs.get(cat, {}).get("dbs", {}).get(db, {}).get(
                    meta.name
                )
                is meta
            )

        for key, (meta, db, cat) in list(self._stale_sink_views.items()):
            if not is_current(meta, db, cat):
                del self._stale_sink_views[key]  # dropped / replaced
                continue
            if has_data(meta):
                try:
                    self._register(meta, db=db, catalog=cat)
                    del self._stale_sink_views[key]
                except Exception:
                    pass  # mid-write; retry at the next statement
        for key, (meta, db, cat, q) in list(self._live_sink_views.items()):
            if not is_current(meta, db, cat):
                del self._live_sink_views[key]
                continue
            if has_data(meta):
                try:
                    self._register(meta, db=db, catalog=cat)
                except Exception:
                    pass  # mid-swap; the previous view stands
            if not q.isActive:
                del self._live_sink_views[key]

    def _register(
        self, meta: TableMeta, db: str | None = None, catalog: str | None = None
    ) -> None:
        # read by the PHYSICAL column names (pre-rename); the view layer
        # renames back to the declared names below
        schema = ", ".join(
            f"{meta.renames.get(c, c)} {t}" for c, t in meta.columns
        )
        if (
            meta.connector == "filesystem"
            and meta.options.get("format") in self._CDC_FORMATS
        ):
            # CDC-JSON table formats (flink-formats/flink-json Debezium/
            # Canal/Maxwell/Ogg factories): the declared columns are the
            # PAYLOAD schema; the decoded changelog adds row_kind (+I/
            # -U/+U/-D) and the envelope timestamp — exactly what the
            # Deserialization schemas emit into Flink's RowData.
            import flink_1_20_spark.sources.cdc as cdc

            streaming = meta.options.get("scan.streaming", "false") == "true"
            if streaming:  # monitored directory → unbounded changelog
                raw = self.spark.readStream.text(meta.options["path"])
            else:
                raw = self.spark.read.text(meta.options["path"])
            fn = getattr(cdc, self._CDC_FORMATS[meta.options["format"]])
            df = fn(raw, "value", schema)
            if meta.renames:
                # one simultaneous projection (a sequential rename chain
                # breaks on column swaps — two columns transiently share
                # a name)
                rev = {orig: cur for cur, orig in meta.renames.items()}
                from pyspark.sql import functions as F

                df = df.select(
                    [F.col(c).alias(rev.get(c, c)) for c in df.columns]
                )
            for cname, expr in meta.computed:
                df = df.selectExpr("*", f"({_computed_col_expr(expr)}) AS {cname}")
            if meta.watermark and df.isStreaming:
                # zero-delay fallback is gated on the two recognized
                # non-INTERVAL strategies; anything else raises (see
                # _apply_watermark)
                df = _apply_watermark(df, *meta.watermark)
            # same namespace rules as the common tail below: the bare
            # name belongs to the CURRENT db/catalog only
            cat = catalog or self.current_catalog
            tgt_db = db or self.current_db
            df.createOrReplaceTempView(_ctl_view_name(cat, tgt_db, meta.name))
            if cat == self.current_catalog:
                df.createOrReplaceTempView(_db_view_name(tgt_db, meta.name))
                if tgt_db == self.current_db:
                    df.createOrReplaceTempView(meta.name)
            return
        if (
            meta.connector == "filesystem"
            and meta.options.get("scan.streaming", "false") == "true"
        ):
            # continuous directory monitoring for regular formats
            # (FileSource.forRecordStreamFormat().monitorContinuously());
            # streaming reads require the DECLARED schema
            from flink_1_20_spark.streaming.sources import file_source

            if not schema:
                raise ValueError(
                    "'scan.streaming'='true' requires declared columns"
                )
            fmt = meta.options.get("format", "parquet")
            df = file_source(self.spark, meta.options["path"], schema, fmt=fmt)
        elif meta.connector == "filesystem":
            from flink_1_20_spark.sources.connectors import read_file

            fmt = meta.options.get("format", "parquet")
            path = meta.options["path"]
            try:
                df = read_file(self.spark, path, fmt=fmt, schema=schema or None)
            except Exception as ex:
                # sink-only table: path not yet populated — register an
                # empty relation now and let _refresh_sink_views re-read
                # it once files appear
                if "PATH_NOT_FOUND" in str(ex) or "Path does not exist" in str(ex):
                    df = self.spark.createDataFrame([], schema=schema)
                    self._stale_sink_views[id(meta)] = (
                        meta,
                        db or self.current_db,
                        catalog or self.current_catalog,
                    )
                else:
                    raise
        elif meta.connector == "datagen":
            from flink_1_20_spark.streaming.sources import rate_source

            rps = int(meta.options.get("rows-per-second", "10"))
            df = rate_source(self.spark, rows_per_second=rps)
        elif meta.connector in ("print", "blackhole"):
            # pure sinks: no readable side; register an empty relation so
            # SELECTs fail loudly at the semantic level, not with a KeyError
            df = self.spark.createDataFrame([], schema=schema or "dummy string")
        else:
            raise ValueError(
                f"Could not find any factory for connector '{meta.connector}' "
                "(supported here: filesystem, datagen, print, blackhole)"
            )
        if meta.renames:
            # one simultaneous projection — a sequential rename chain
            # breaks on column swaps (two columns transiently share a name)
            rev = {orig: cur for cur, orig in meta.renames.items()}
            from pyspark.sql import functions as F

            df = df.select([F.col(c).alias(rev.get(c, c)) for c in df.columns])
        for cname, expr in meta.computed:
            df = df.selectExpr("*", f"({_computed_col_expr(expr)}) AS {cname}")
        if meta.watermark and df.isStreaming:
            # zero-delay fallback gated on SOURCE_WATERMARK() / the
            # strictly-ascending `AS ts` form — see _apply_watermark
            df = _apply_watermark(df, *meta.watermark)
        # statistics-informed broadcast (Flink planner: CatalogTableStatistics
        # vs table.optimizer.join.broadcast-threshold): an ANALYZEd table
        # whose measured size fits under the threshold joins as the
        # broadcast side even where Spark's own file-size estimate would
        # not have chosen it
        measured = meta.stats.get("size_bytes") if meta.stats is not None else None
        if (
            measured is not None
            and not df.isStreaming
            and 0 <= measured <= self._broadcast_threshold()
        ):
            df = df.hint("broadcast")
        # mangled aliases so `db.table` / `catalog.db.table` references
        # resolve from anywhere (see the qualified-name rewrites); the
        # bare name is the CURRENT database's namespace only — a table
        # from another db/catalog must never clobber it
        cat = catalog or self.current_catalog
        tgt_db = db or self.current_db
        df.createOrReplaceTempView(_ctl_view_name(cat, tgt_db, meta.name))
        if cat == self.current_catalog:
            df.createOrReplaceTempView(_db_view_name(tgt_db, meta.name))
            if tgt_db == self.current_db:
                df.createOrReplaceTempView(meta.name)

    def _use_database(self, db: str) -> None:
        """USE <db>: unqualified names now resolve in <db> — the previous
        database's flat temp views are dropped and the target's tables
        re-registered under their bare names (the mangled per-db views
        stay, so qualified references keep working everywhere)."""
        if db == self.current_db:
            return None
        for name in self.tables:
            self.spark.catalog.dropTempView(name)
        self.current_db = db
        self.tables = self._dbs[db]
        for meta in self.tables.values():
            self._register(meta)
        return None

    # -- STATEMENT SET ---------------------------------------------------
    def execute_statement_set(self, statements: list[str]) -> None:
        """EXECUTE STATEMENT SET parity (multi-sink pipelines,
        TableEnvironmentImpl.createStatementSetOperation): run several
        INSERT INTO statements as one logical job, materializing each
        SOURCE table referenced more than once so its scan (and any
        computed columns) is evaluated one time, not per sink —
        Flink's CommonSubGraphBasedOptimizer shared-scan behavior,
        expressed as `.persist()` for the set's duration."""
        inserts = []
        for stmt in statements:
            parsed = self._parse_insert(stmt)
            if parsed is None:
                m = re.match(
                    r"\s*INSERT\s+INTO\s+(\S+)\s+(.*?);?\s*$", stmt, re.S | re.I
                )
                if not m:
                    raise ValueError(
                        f"statement set accepts only INSERT INTO: {stmt[:80]!r}"
                    )
                parsed = (m.group(1).strip("`"), m.group(2), {})
            inserts.append(parsed)

        refs: dict[str, int] = {}
        for _, query, _kw in inserts:
            for tbl in re.findall(r"\b(?:FROM|JOIN)\s+`?(\w+)`?", query, re.I):
                if tbl in self.tables:
                    refs[tbl] = refs.get(tbl, 0) + 1
        shared = [t for t, n in refs.items() if n > 1]
        cached = []
        for t in shared:
            df = self.spark.table(t)
            if not df.isStreaming:
                df.persist()
                cached.append(df)
        try:
            for name, query, kw in inserts:
                self._insert_into(name, query, **kw)
        finally:
            for df in cached:
                df.unpersist()

    # -- DROP / INSERT ---------------------------------------------------
    def _drop_table(self, s: str) -> None:
        m = re.match(r"DROP\s+TABLE\s+(?:IF\s+EXISTS\s+)?(\S+)\s*$", s, re.I)
        name = m.group(1).strip("`")
        if name in self._materialized:
            # SqlDropMaterializedTable is its own statement in Flink
            raise ValueError(
                f"{name} is a materialized table — use DROP MATERIALIZED TABLE"
            )
        existed = self.tables.pop(name, None)
        if existed or not re.search(r"IF\s+EXISTS", s, re.I):
            self.spark.catalog.dropTempView(name)
            self.spark.catalog.dropTempView(
                _db_view_name(self.current_db, name)
            )

    def _upsert_materialized_insert(self, name: str, meta, df, fmt: str):
        """Streaming INSERT whose plan emits an UPDATING changelog (a
        non-windowed GROUP BY — StreamExecGroupAggregate — is the
        canonical case): an append-only file sink cannot consume it, and
        Flink rejects exactly this with "Table sink ... doesn't support
        consuming update changes" unless the sink declares a PRIMARY KEY
        and the planner inserts SinkUpsertMaterializer
        (SinkUpsertMaterializer.java). Same contract here: the sink
        table's PRIMARY KEY drives a per-epoch keyed parquet merge in
        update output mode — each epoch carries only changed keys, and
        the merge's per-key idempotence keeps restarts exactly-once at
        the table level. The PK must be the update key (Flink raises
        when the upsert key and primary key disagree); here that means
        the GROUP BY columns."""
        if not meta.primary_key:
            raise ValueError(
                f"Table sink {name!r} doesn't support consuming update "
                "changes produced by this query (an unbounded "
                "aggregation emits an updating changelog — "
                "StreamExecGroupAggregate); declare PRIMARY KEY (...) "
                "NOT ENFORCED on the sink table to materialize upserts "
                "the way Flink's upsert sinks do"
            )
        if fmt != "parquet":
            raise ValueError(
                "upsert materialization rewrites the sink by parquet "
                f"merge; format {fmt!r} is not supported for updating "
                "streaming inserts"
            )
        missing = [c for c in meta.primary_key if c not in df.columns]
        if missing:
            raise ValueError(
                f"sink primary key columns {missing} are absent from "
                "the inserted query's output — the upsert key must be "
                "the primary key"
            )
        from flink_1_20_spark.streaming.sinks import upsert_foreach_batch

        path = meta.options["path"]
        return upsert_foreach_batch(
            df,
            keys=list(meta.primary_key),
            path=path,
            output_mode="update",
            checkpoint=meta.options.get("checkpoint", path + ".__ckpt__"),
        )

    # -- row-level modifications (FLIP-282) ---------------------------

    def _row_level_target(self, op: str, name: str) -> TableMeta:
        """Resolve and validate the target of DELETE/UPDATE: a batch
        filesystem table (Flink: TableException for streaming mode —
        DeleteTableITCase.testDeleteInStreamingMode; connectors without
        SupportsRowLevelDelete/Update reject at planning)."""
        meta = self._resolve_meta(name)
        if meta is None:
            raise ValueError(f"unknown table {name!r}")
        # identity check, not name check — a qualified/mangled reference
        # (db.mt → __cat_db__mt) must not bypass the guard
        if any(e.get("meta") is meta for e in self._materialized.values()):
            raise ValueError(
                f"{name} is a materialized table — its content is "
                "managed by the refresh pipeline"
            )
        if meta.connector != "filesystem":
            raise ValueError(
                f"{op} statement requires a table whose connector "
                f"supports row-level modification; {meta.connector!r} "
                "does not"
            )
        if meta.options.get("scan.streaming", "false") == "true":
            raise ValueError(
                f"{op} statement is not supported for streaming mode now"
            )
        return meta

    def _declared_frame(self, meta: TableMeta) -> DataFrame | None:
        """Physical files → declared-name DataFrame (rename projection +
        computed columns — the same mapping _register applies). None
        when the path holds no data yet. A crashed staging swap is
        rolled back first so the parked previous table is never read
        as empty."""
        from flink_1_20_spark.sources.connectors import (
            has_data_files,
            read_file,
            recover_swap,
        )

        path = meta.options.get("path")
        if path:
            recover_swap(path)
        if not has_data_files(path):
            return None
        schema = ", ".join(
            f"{meta.renames.get(c, c)} {t}" for c, t in meta.columns
        )
        df = read_file(
            self.spark, path, fmt=meta.options.get("format", "parquet"),
            schema=schema or None,
        )
        if meta.renames:
            from pyspark.sql import functions as F

            rev = {orig: cur for cur, orig in meta.renames.items()}
            df = df.select([F.col(c).alias(rev.get(c, c)) for c in df.columns])
        for cname, expr in meta.computed:
            df = df.selectExpr("*", f"({_computed_col_expr(expr)}) AS {cname}")
        return df

    def _rewrite_table_files(self, meta: TableMeta, df: DataFrame) -> None:
        """Replace a filesystem table's data with `df` (declared-name
        frame): project back to physical names, drop computed columns,
        write to a staging dir and swap — the write is fully distributed
        and the live path is never deleted before its replacement is
        committed (same crash-safe swap as the upsert materializer)."""
        import os
        import shutil

        from pyspark.sql import functions as F

        keep = [c for c, _ in meta.columns]
        out = df.select([F.col(c).alias(meta.renames.get(c, c)) for c in keep])
        path = meta.options["path"]
        fmt = meta.options.get("format", "parquet")
        tmp, old = path + ".__staging__", path + ".__old__"
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        writer = out.write.format(fmt).mode("overwrite")
        if fmt == "csv":
            writer = writer.option("header", "true")
        if meta.partitioned_by:
            writer = writer.partitionBy(
                *[meta.renames.get(c, c) for c in meta.partitioned_by]
            )
        writer.save(tmp)
        if os.path.exists(old):
            shutil.rmtree(old)
        os.rename(path, old)
        os.rename(tmp, path)
        shutil.rmtree(old)
        meta.stats = None  # data changed; never keep a broadcast verdict
        self._register(meta, db=self._owner_db(meta))

    def _apply_distribution(self, df: DataFrame, meta: TableMeta) -> DataFrame:
        """DISTRIBUTED BY (FLIP-376 bucketed tables): cluster rows by
        the bucket key into the declared bucket count before a write —
        HASH keeps same-key rows in one file (co-located reads,
        join/agg locality at scale), RANGE keeps sort affinity; a
        bare bucket count just sizes the file count."""
        kind, dcols, buckets = meta.distribution
        if not dcols:
            return df.repartition(buckets)
        if kind == "RANGE":
            return (
                df.repartitionByRange(buckets, *dcols)
                if buckets
                else df.repartitionByRange(*dcols)
            )
        return df.repartition(buckets, *dcols) if buckets else df.repartition(*dcols)

    def _compact_table(self, meta: TableMeta, partition_spec: str | None):
        """ALTER TABLE [PARTITION (...)] COMPACT (SqlAlterTableCompact
        .java → the filesystem connector's batch compaction): rewrite
        the target's files into the bucketed layout when the table is
        DISTRIBUTED, else into a size-targeted file count (128 MiB per
        file, the connector's compaction.file-size default) — through
        the crash-safe staging swap, so concurrent readers never see a
        half-compacted table."""
        import math
        import os
        import shutil

        if meta.connector != "filesystem":
            raise ValueError(
                f"ALTER TABLE COMPACT: connector {meta.connector!r} has "
                "no files to compact"
            )
        if meta.options.get("scan.streaming", "false") == "true":
            raise ValueError(
                "ALTER TABLE COMPACT runs in batch mode; a streaming "
                "sink compacts through its rolling policy"
            )

        def dir_bytes(p: str) -> int:
            total = 0
            for root, _dirs, files in os.walk(p):
                total += sum(
                    os.path.getsize(os.path.join(root, f))
                    for f in files
                    if not f.startswith((".", "_"))
                )
            return total

        # Flink's compaction.file-size is a MemorySize ('64mb', '1 gb',
        # plain bytes); unparseable or non-positive values are ERRORS,
        # not a silent fall-through to the 128 MiB default
        raw = meta.options.get("compaction.file-size")
        if raw is None:
            target = 128 * 1024 * 1024
        else:
            sm = re.match(
                r"\s*(\d+)\s*(b|kb|mb|gb|tb)?\s*$", raw, re.I
            )
            if not sm:
                raise ValueError(
                    f"cannot parse compaction.file-size {raw!r} "
                    "(expected a MemorySize like '128mb')"
                )
            target = int(sm.group(1)) * {
                "b": 1, "kb": 1024, "mb": 1024**2,
                "gb": 1024**3, "tb": 1024**4,
            }[(sm.group(2) or "b").lower()]
            if target <= 0:
                raise ValueError("compaction.file-size must be positive")
        fmt = meta.options.get("format", "parquet")
        if partition_spec is not None:
            from flink_1_20_spark.sources.connectors import (
                COMPACT_OLD_PREFIX,
                COMPACT_STAGING_PREFIX,
                read_file,
            )

            spec = self._parse_partition_spec(partition_spec)
            if set(spec) != set(meta.partitioned_by):
                raise ValueError(
                    f"partition spec {sorted(spec)} must name exactly "
                    f"the partition keys {meta.partitioned_by}"
                )
            root = meta.options["path"]
            rel = os.path.join(
                *[
                    f"{meta.renames.get(k, k)}={spec[k]}"
                    for k in meta.partitioned_by
                ]
            )
            d = os.path.join(root, rel)
            if not os.path.isdir(d):
                raise ValueError(f"partition does not exist: {d}")
            part_df = read_file(self.spark, d, fmt=fmt)
            if meta.distribution is not None:
                # the bucketed layout holds WITHIN each partition
                part_df = self._apply_distribution(part_df, meta)
            else:
                n = max(1, math.ceil(dir_bytes(d) / target))
                part_df = part_df.coalesce(n)
            # staging/old park INSIDE the root under dot-prefixed names
            # (outside names shaped key=value would be scanned as bogus
            # partitions); recover_swap restores a parked partition
            # whose live dir went missing mid-swap
            enc = rel.replace(os.sep, "%2F")
            tmp = os.path.join(root, COMPACT_STAGING_PREFIX + enc)
            old = os.path.join(root, COMPACT_OLD_PREFIX + enc)
            if os.path.exists(tmp):
                shutil.rmtree(tmp)
            writer = part_df.write.format(fmt).mode("overwrite")
            if fmt == "csv":
                writer = writer.option("header", "true")
            writer.save(tmp)
            if os.path.exists(old):
                shutil.rmtree(old)
            os.rename(d, old)
            os.rename(tmp, d)
            shutil.rmtree(old)
            self._register(meta, db=self._owner_db(meta))
            return None
        df = self._declared_frame(meta)
        if df is None:
            return None  # nothing to compact
        if meta.distribution is not None:
            df = self._apply_distribution(df, meta)
        else:
            n = max(1, math.ceil(dir_bytes(meta.options["path"]) / target))
            df = df.coalesce(n)
        self._rewrite_table_files(meta, df)
        return None

    @staticmethod
    def _strip_position(coldef: str) -> tuple[str, tuple[str, str | None] | None]:
        """Trailing `FIRST` / `AFTER <col>` (SqlColumnPosSpec.java on
        ADD/MODIFY schema changes) → (definition without the spec,
        ('FIRST', None) | ('AFTER', anchor) | None)."""
        m = re.match(r"(.*?)\s+FIRST\s*$", coldef, re.S | re.I)
        if m:
            return m.group(1), ("FIRST", None)
        m = re.match(r"(.*?)\s+AFTER\s+`?(\w+)`?\s*$", coldef, re.S | re.I)
        if m:
            return m.group(1), ("AFTER", m.group(2))
        return coldef, None

    def _validate_position(
        self, meta: TableMeta, pos: tuple[str, str | None], available: set
    ) -> None:
        """Reject a FIRST/AFTER spec BEFORE any meta mutation: csv
        tables bind file columns positionally (a catalog reorder would
        silently mis-read existing data), an AFTER anchor must exist,
        and computed columns cannot anchor (they always render at the
        end of the schema in this model, after the physical columns)."""
        if meta.options.get("format") == "csv":
            raise ValueError(
                "FIRST/AFTER column positions are not supported on csv "
                "tables — csv files bind columns by position, and a "
                "catalog reorder would mis-read existing data"
            )
        if pos[0] == "AFTER" and pos[1] not in available:
            if pos[1] in {c for c, _ in meta.computed}:
                raise ValueError(
                    f"AFTER {pos[1]}: computed columns render at the "
                    "end of the schema here — anchor on a physical "
                    "column"
                )
            raise ValueError(f"AFTER column not found: {pos[1]}")

    def _place_column(
        self, meta: TableMeta, name: str, pos: tuple[str, str | None]
    ) -> None:
        """Reorder `name` in meta.columns per a VALIDATED FIRST/AFTER
        spec (see _validate_position)."""
        entry = next((c, t) for c, t in meta.columns if c == name)
        cols = [(c, t) for c, t in meta.columns if c != name]
        if pos[0] == "FIRST":
            idx = 0
        else:
            names = [c for c, _ in cols]
            if pos[1] not in names:
                raise ValueError(f"AFTER column not found: {pos[1]}")
            idx = names.index(pos[1]) + 1
        cols.insert(idx, entry)
        meta.columns = cols

    def _owner_db(self, meta: TableMeta) -> str:
        """The current catalog's db holding exactly this meta (falls
        back to the current db — e.g. a meta resolved via a qualified
        reference into the current catalog)."""
        return next(
            (d for d, ts in self._dbs.items() if ts.get(meta.name) is meta),
            self.current_db,
        )

    def _rows_affected(self, n: int) -> DataFrame:
        return self.spark.createDataFrame([(n,)], "rows_affected bigint")

    def _partition_eq_spec(self, cond: str, meta: TableMeta) -> dict | None:
        """`k1 = lit AND k2 = lit` over partition keys only → spec dict
        (the SupportsDeletePushDown analog: such a DELETE drops whole
        partition directories without scanning or rewriting data).
        Anything else → None (row-level path)."""
        if not meta.partitioned_by:
            return None
        spec: dict[str, str] = {}
        for part in re.split(r"\s+AND\s+", cond.strip(), flags=re.I):
            m = re.match(
                r"`?(\w+)`?\s*=\s*('(?:[^']|'')*'|[\w.+-]+)\s*$", part.strip()
            )
            if not m:
                return None
            col, lit = m.group(1), m.group(2)
            if lit.startswith("'"):
                lit = lit[1:-1].replace("''", "'")  # SQL quote unescape
            if col not in meta.partitioned_by or col in spec:
                return None
            spec[col] = lit
        return spec

    def _delete_from(self, name: str, cond: str | None) -> DataFrame:
        """DELETE FROM t [WHERE cond]: rows where cond is TRUE are
        removed (NULL keeps the row, per SQL semantics). Partition-key
        equality conditions take the pushdown path — matching partition
        directories are dropped with no data rewrite; everything else
        rewrites the remaining rows through the staging swap. Returns
        one rows_affected row (Flink's DELETE TableResult)."""
        import os
        import shutil

        meta = self._row_level_target("DELETE", name)
        if cond is not None:
            spec = self._partition_eq_spec(cond, meta)
            if spec is not None:
                root = meta.options["path"]
                import glob as _glob

                from flink_1_20_spark.sources.connectors import recover_swap

                recover_swap(root)
                # directory names carry PHYSICAL column names (a renamed
                # partition key keeps its on-disk name) and literal
                # values must not act as glob metacharacters
                pattern = os.path.join(
                    root,
                    *[
                        _glob.escape(f"{meta.renames.get(k, k)}={spec[k]}")
                        if k in spec
                        else "*"
                        for k in meta.partitioned_by
                    ],
                )
                dirs = [d for d in _glob.glob(pattern) if os.path.isdir(d)]
                if not dirs:
                    return self._rows_affected(0)
                fmt = meta.options.get("format", "parquet")
                reader = self.spark.read.format(fmt).option("basePath", root)
                if fmt == "csv":
                    reader = reader.option("header", "true")
                n = reader.load(dirs).count()
                for d in dirs:
                    shutil.rmtree(d)
                meta.stats = None
                self._register(meta, db=self._owner_db(meta))
                return self._rows_affected(n)
        df = self._declared_frame(meta)
        if df is None:
            return self._rows_affected(0)
        total = df.count()
        if cond is None:
            remaining = df.limit(0)
        else:
            remaining = df.filter(f"NOT ({cond}) OR ({cond}) IS NULL")
        kept = remaining.count()
        self._rewrite_table_files(meta, remaining)
        return self._rows_affected(total - kept)

    def _update_table(
        self, name: str, set_clause: str, cond: str | None
    ) -> DataFrame:
        """UPDATE t SET c = expr[, ...] [WHERE cond]: every assignment
        RHS sees the OLD row (standard SQL), results cast back to the
        declared column types; partition keys and computed columns are
        not assignable (moving a row across partition directories /
        overriding a derived value — Flink rejects both at planning).
        Returns one rows_affected row."""
        meta = self._row_level_target("UPDATE", name)
        declared = dict(meta.columns)
        computed = {c for c, _ in meta.computed}
        assignments: list[tuple[str, str]] = []
        for part in _split_top_all(set_clause, ","):
            am = re.match(r"\s*`?(\w+)`?\s*=\s*(.+)\s*$", part, re.S)
            if not am:
                raise ValueError(f"cannot parse SET assignment: {part!r}")
            col, expr = am.group(1), am.group(2).strip()
            if col in computed:
                raise ValueError(
                    f"UPDATE cannot assign computed column {col!r}"
                )
            if col in meta.partitioned_by:
                raise ValueError(
                    f"UPDATE cannot assign partition key {col!r}"
                )
            if col not in declared:
                raise ValueError(f"unknown column {col!r} in SET clause")
            assignments.append((col, expr))
        df = self._declared_frame(meta)
        if df is None:
            return self._rows_affected(0)
        guard = (
            f"coalesce(CAST(({cond}) AS BOOLEAN), false)"
            if cond is not None
            else "true"
        )
        affected = df.filter(guard).count()
        assigned = dict(assignments)
        select = [
            (
                f"CAST(CASE WHEN {guard} THEN ({assigned[c]}) "
                f"ELSE `{c}` END AS {declared[c]}) AS `{c}`"
                if c in assigned
                else f"`{c}`"
            )
            for c, _ in meta.columns
        ]
        self._rewrite_table_files(meta, df.selectExpr(*select))
        return self._rows_affected(affected)

    def _try_streaming_setop_insert(
        self,
        name: str,
        meta,
        query: str,
        static_partition: str | None,
        columns: list[str] | None,
        overwrite: bool = False,
    ):
        """Streaming EXCEPT [ALL] / INTERSECT ALL materialized into a
        filesystem sink (StreamExecMinus / StreamExecIntersect with
        retraction — Flink keeps per-row multiset counts on both sides
        and emits an updating changelog as multiplicities change).
        Spark cannot return that as a DataFrame, so the INSERT runs the
        signed-count composition of streaming/setops.py: one tagged
        union stream, per-epoch count-state fold, affected-key sink
        merge — the sink table always holds the current result, with
        retraction (a right arrival removing an EXCEPT row) applied in
        place.  Returns the StreamingQuery, or None when the query has
        no retraction-requiring set op (the INTERSECT DISTINCT lowering
        and the batch path handle everything else)."""
        ops = _scan_streaming_setops(query)
        if not any(o[2] == "EXCEPT" or o[3] for o in ops):
            return None
        if not self.spark.sql(query).isStreaming:
            return None  # bounded: Spark's native exceptAll/intersectAll
        if len(ops) > 1:
            raise ValueError(
                "chained streaming set operations are not supported — "
                "materialize one EXCEPT / INTERSECT ALL per INSERT "
                "(stage intermediate results through a table)"
            )
        if static_partition or columns:
            raise ValueError(
                "PARTITION / explicit column lists are not supported "
                "for streaming set-op materialization"
            )
        if meta.connector != "filesystem" or (
            meta.options.get("format", "parquet") != "parquet"
        ):
            raise ValueError(
                "streaming set-op materialization rewrites the sink by "
                "parquet merge; only filesystem parquet sinks are "
                "supported"
            )
        start, end, op, is_all = ops[0]
        self._guard_setop_cte_scope(query, query[end:])
        left = self._sql_streaming_lowered(query[:start])
        right = self._sql_streaming_lowered(query[end:])
        if not (left.isStreaming and right.isStreaming):
            raise ValueError(
                "streaming EXCEPT / INTERSECT ALL requires both sides "
                "streaming; stage a bounded side through a monitored "
                "directory table"
            )
        if len(left.columns) != len(right.columns):
            raise ValueError("set-op sides must have equal column counts")
        from pyspark.sql import functions as F

        from flink_1_20_spark.streaming.setops import (
            SIDE_COL,
            setop_foreach_batch,
        )

        if SIDE_COL in left.columns or SIDE_COL in right.columns:
            # withColumn would silently REPLACE a user column named
            # __side before the materializer's reserved-name guard can
            # see it — reject at the source instead
            raise ValueError(
                f"column name {SIDE_COL!r} is reserved by the set-op "
                "materializer — alias it in the query"
            )
        right = right.select(
            [right[c].alias(lc) for c, lc in zip(right.columns, left.columns)]
        )
        combined = left.withColumn(SIDE_COL, F.lit(1)).unionByName(
            right.withColumn(SIDE_COL, F.lit(0))
        )
        sink_types = None
        if meta.columns:
            if len(left.columns) != len(meta.columns):
                raise ValueError(
                    f"INSERT query produces {len(left.columns)} columns "
                    f"for {len(meta.columns)} declared columns of "
                    f"{meta.name}"
                )
            # positional bind + physical names, like the main INSERT
            # path — but RENAME-ONLY here: Flink evaluates the set op
            # on the query's values and applies the implicit sink cast
            # afterwards, so the cast travels to the materializer and
            # lands on the exploded output rows, never on the values
            # the multiset counts fold over
            combined = combined.select(
                [
                    combined[src].alias(meta.renames.get(c, c))
                    for src, (c, _t) in zip(left.columns, meta.columns)
                ]
                + [combined[SIDE_COL]]
            )
            sink_types = [t for _c, t in meta.columns]
        value_cols = [c for c in combined.columns if c != SIDE_COL]
        path = meta.options["path"]
        q = setop_foreach_batch(
            combined,
            value_cols,
            op,
            is_all,
            path,
            checkpoint=meta.options.get("checkpoint", path + ".__ckpt__"),
            sink_types=sink_types,
            overwrite=overwrite,
        )
        self._register_streaming_sink(meta, q)
        return q

    def _register_streaming_sink(self, meta, q):
        """Shared bookkeeping for every streaming INSERT that keeps
        writing a registered table: stats invalidated (a continuously-
        growing table must not keep a small-table broadcast verdict),
        views re-registered, batch-read sinks put on the per-statement
        refresh list while the job lives, job tracked for SHOW JOBS."""
        meta.stats = None
        owner = next(
            (d for d, ts in self._dbs.items() if ts.get(meta.name) is meta),
            self.current_db,
        )
        self._register(meta, db=owner)
        if meta.options.get("scan.streaming", "false") != "true":
            self._live_sink_views[id(meta)] = (
                meta, owner, self.current_catalog, q
            )
        self._track_job(q)

    def _insert_into(
        self,
        name: str,
        query: str,
        overwrite: bool = False,
        static_partition: str | None = None,
        columns: list[str] | None = None,
    ):
        if name in self._materialized:
            # Flink: materialized tables are refresh-managed; direct DML
            # is rejected at validation
            raise ValueError(
                f"{name} is a materialized table — its content is managed "
                "by the refresh pipeline (ALTER MATERIALIZED TABLE ... "
                "REFRESH for a manual backfill)"
            )
        meta = self._resolve_meta(name)
        if meta is None:
            raise ValueError(f"unknown table {name!r}")
        # INSERT bodies get the same dialect treatment as top-level
        # SELECTs (window TVFs, legacy group windows, MATCH_RECOGNIZE)
        from flink_1_20_spark.sql_flink import (
            rewrite_flink_builtins,
            rewrite_legacy_group_windows,
            rewrite_unnest,
            rewrite_window_tvfs,
            run_match_recognize,
        )

        from flink_1_20_spark.sql_flink import rewrite_streaming_session_tvf

        dedup = self._try_streaming_dedup(query)
        over = self._try_streaming_over(query) if dedup is None else None
        query = rewrite_streaming_session_tvf(query, self._is_streaming_table)
        query = rewrite_unnest(
            rewrite_legacy_group_windows(rewrite_window_tvfs(query))
        )
        query = rewrite_flink_builtins(query)
        setop_job = self._try_streaming_setop_insert(
            name, meta, query, static_partition, columns, overwrite
        )
        if setop_job is not None:
            return setop_job
        if dedup is not None:
            df = dedup
        elif over is not None:
            df = over
        elif re.search(r"\bMATCH_RECOGNIZE\b", query, re.I):
            df = run_match_recognize(self.spark, query)
        else:
            df = self._sql_streaming_lowered(query)
        if (static_partition or columns) and meta.columns:
            df = self._align_insert_columns(meta, df, static_partition, columns)
        elif meta.columns:
            # Flink binds INSERT output to the sink POSITIONALLY with
            # implicit casts (DynamicSinkUtils.validateSchemaAndApplyImplicitCast)
            # — without this, `INSERT INTO t VALUES (...)` writes col1/
            # col2/... into the files and by-name reads see NULLs
            if len(df.columns) != len(meta.columns):
                raise ValueError(
                    f"INSERT query produces {len(df.columns)} columns "
                    f"for {len(meta.columns)} declared columns of "
                    f"{meta.name}"
                )
            # df[src], not F.col(src): a source alias like `sum(v)`
            # must resolve as a NAME, never parse as an expression
            df = df.select(
                [
                    df[src].cast(t).alias(c)
                    for src, (c, t) in zip(df.columns, meta.columns)
                ]
            )
        if meta.distribution is not None:
            df = self._apply_distribution(df, meta)
        if meta.renames and meta.columns:
            # files keep their PHYSICAL column names across RENAME
            # COLUMN — writing the declared name would orphan the
            # column for every read through the rename mapping
            df = df.select(
                [df[c].alias(meta.renames.get(c, c)) for c in df.columns]
            )
        if df.isStreaming:
            # streaming INSERT: start a continuous query into the sink
            # (TableEnvironment.executeSql returns a TableResult whose
            # job keeps running — here, the StreamingQuery handle).
            # Debug sinks run in update mode: Flink's unbounded
            # aggregations emit an updating changelog (+I/-U/+U) to
            # print sinks, which is Spark's update output mode; append
            # there would additionally demand watermarked window
            # grouping. Filesystem stays append (as in Flink, where
            # file sinks require append-only input).
            mode = "update" if meta.connector in ("print", "blackhole") else "append"
            if meta.connector == "print":
                q = df.writeStream.format("console").outputMode(mode).start()
            elif meta.connector == "blackhole":
                q = df.writeStream.format("noop").outputMode(mode).start()
            elif meta.connector == "filesystem":
                fmt = meta.options.get("format", "parquet")
                try:
                    q = (
                        df.writeStream.format(fmt)
                        .option("path", meta.options["path"])
                        .option(
                            "checkpointLocation",
                            meta.options.get(
                                "checkpoint", meta.options["path"] + "/_checkpoint"
                            ),
                        )
                        .start()
                    )
                except Exception as ex:
                    if "STREAMING_OUTPUT_MODE" not in str(ex) and (
                        "not supported" not in str(ex)
                        or "streaming aggregations" not in str(ex)
                    ):
                        raise
                    q = self._upsert_materialized_insert(name, meta, df, fmt)
                self._register_streaming_sink(meta, q)
                return q
            else:
                raise ValueError(
                    f"connector {meta.connector!r} is not stream-writable"
                )
            self._track_job(q)  # SHOW JOBS lifecycle visibility
            return q
        if meta.connector == "filesystem":
            from flink_1_20_spark.sources.connectors import write_file, write_partitioned

            fmt = meta.options.get("format", "parquet")
            mode = "overwrite" if overwrite else "append"
            phys_parts = [meta.renames.get(c, c) for c in meta.partitioned_by]
            if meta.partitioned_by:
                if overwrite and static_partition:
                    # INSERT OVERWRITE t PARTITION (k=v): Flink replaces
                    # ONLY the named partition; Spark's static overwrite
                    # mode would truncate the whole table
                    prev = self.spark.conf.get(
                        "spark.sql.sources.partitionOverwriteMode"
                    )
                    self.spark.conf.set(
                        "spark.sql.sources.partitionOverwriteMode", "dynamic"
                    )
                    try:
                        write_partitioned(
                            df,
                            meta.options["path"],
                            phys_parts,
                            fmt=fmt,
                            mode=mode,
                        )
                    finally:
                        self.spark.conf.set(
                            "spark.sql.sources.partitionOverwriteMode", prev
                        )
                else:
                    write_partitioned(
                        df, meta.options["path"], phys_parts, fmt=fmt, mode=mode
                    )
            else:
                write_file(df, meta.options["path"], fmt=fmt, mode=mode)
            # the write changed the data: ANALYZE stats are stale now, and
            # a grown table must never keep a broadcast verdict it earned
            # when it was small — drop them until the next ANALYZE
            meta.stats = None
            owner = next(
                (d for d, ts in self._dbs.items()
                 if ts.get(meta.name) is meta),
                self.current_db,
            )
            self._register(meta, db=owner)  # refresh the readable view
        elif meta.connector == "print":
            for row in df.collect():
                print(f"+I[{', '.join(str(v) for v in row)}]")
        elif meta.connector == "blackhole":
            df.foreachPartition(lambda _: None)
        else:
            raise ValueError(f"connector {meta.connector!r} is not writable here")


class StatementSet:
    """Programmatic STATEMENT SET (StatementSetImpl.java): buffer INSERT
    statements, run them as one multi-sink submission on execute()."""

    def __init__(self, env: TableEnvironment):
        self._env = env
        self._stmts: list[str] = []

    def add_insert_sql(self, stmt: str) -> "StatementSet":
        self._stmts.append(stmt)
        return self

    def execute(self) -> None:
        stmts, self._stmts = self._stmts, []
        self._env.execute_statement_set(stmts)
