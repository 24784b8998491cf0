#!/usr/bin/env python3
"""Lineage-aware ROUND(SUM(double)) order-sensitivity audit (round 8).

Why this exists: the driver hash-compares Spark output against DuckDB
per serialized value. A floating-point SUM over doubles is order-
dependent (partial-agg order varies per engine AND per run), so any
output derived from one can differ in the last ULP.  ROUND(.., n)
masks that — unless the TRUE value sits exactly on a half-10^-n
boundary, which happens with probability ~1e-3 per row when the
summand carries more decimal digits than n (TPC-H money: price 2
digits, price*(1-disc) 4, *(1+tax) 6).  Round 6 hit this on tpch_q9;
the round-7 textual `round(sum(` sweep converted direct sites but
missed sums routed through a CTE alias (tpcds_q1 went driver-red in
r7; q58/q14/q24 were latent).  This audit is lineage-aware: it
resolves every ROUND's argument through SELECT-list aliases and CTE
columns before classifying.

Classification per resolved `round(expr, n)`:
  * every `sum(`/`avg(` inside expr is EXACT if its summand uses the
    integer-units idiom `sum(CAST(round(x * 10^d) AS BIGINT))`, or if
    the summand references no 2-decimal money column (integer /
    integral-double sums are exact in IEEE double up to 2^53);
  * otherwise the sum is ORDER-DEPENDENT with grid d = 2 * (count of
    money-column references in the summand) decimal digits;
  * a round at scale n over an order-dependent sum is flagged when
    d > n (the true value can sit exactly on a half-boundary), and
    when the path from sum to round passes through a division that is
    not a power of ten (ratio/avg — the true value leaves any decimal
    grid, so every boundary is reachable).

Findings are returned as (query, round_site, reason).  The test
wrapper (tests/test_round_sum_lineage.py) asserts the list is empty.
Run standalone for a report:  python scripts/audit_round_lineage.py
"""

from __future__ import annotations

import re
import sys

# Fixture columns carrying exactly 2 decimal digits (probed on
# sf0.01: max |x*100 - round(x*100)| < 1e-8 for these; l_quantity and
# p_retailprice are integral-valued and sum exactly in double).
MONEY_COLS = {
    "l_extendedprice",
    "l_discount",
    "l_tax",
    "o_totalprice",
    "c_acctbal",
    "s_acctbal",
}


_POW10_RE = re.compile(r"^(?:1e(\d+)|10+(?:\.0*)?|1(?:\.0*)?)$")
_WORD_RE = re.compile(r"[a-z_][a-z0-9_]*", re.I)


def _strip_strings(sql: str) -> str:
    """Replace single-quoted literals with spaces (keep offsets stable)."""
    out = []
    i, n = 0, len(sql)
    while i < n:
        c = sql[i]
        if c == "'":
            j = i + 1
            while j < n:
                if sql[j] == "'" and j + 1 < n and sql[j + 1] == "'":
                    j += 2
                elif sql[j] == "'":
                    break
                else:
                    j += 1
            out.append(" " * (min(j, n - 1) - i + 1))
            i = min(j, n - 1) + 1
        else:
            out.append(c)
            i += 1
    return "".join(out)


def _match_paren(s: str, open_idx: int) -> int:
    """Index of the ')' matching s[open_idx] == '(' (or len(s))."""
    depth = 0
    for i in range(open_idx, len(s)):
        if s[i] == "(":
            depth += 1
        elif s[i] == ")":
            depth -= 1
            if depth == 0:
                return i
    return len(s)


def _split_top(s: str, sep: str = ",") -> list[str]:
    """Split on sep at paren depth 0."""
    parts, depth, start = [], 0, 0
    for i, c in enumerate(s):
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif c == sep and depth == 0:
            parts.append(s[start:i])
            start = i + 1
    parts.append(s[start:])
    return parts


def _find_keyword(s: str, kw: str, start: int = 0) -> int:
    """First depth-0 occurrence of word kw in s at/after start, else -1."""
    depth = 0
    pat = re.compile(rf"\b{kw}\b")
    i = start
    while i < len(s):
        c = s[i]
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif depth == 0:
            m = pat.match(s, i)
            if m:
                return i
        i += 1
    return -1


def _select_lists(sql: str) -> list[str]:
    """Every SELECT list in the statement (any nesting depth)."""
    lists = []
    for m in re.finditer(r"\bselect\b", sql):
        start = m.end()
        # skip DISTINCT / ALL set quantifiers
        rest = sql[start:]
        q = re.match(r"\s+(distinct|all)\b", rest)
        if q:
            start += q.end()
        end = _find_keyword(sql[start:], "from")
        if end < 0:
            continue
        lists.append(sql[start : start + end])
    return lists


def _alias_map(sql: str) -> dict[str, str]:
    """alias -> defining expression, over every SELECT list.

    Heuristic global map (duplicate aliases keep the first definition —
    in this registry duplicate aliases across CTEs define the same
    shape, e.g. q58's y1/y2/y3).  Identifier items (`a.b AS c` where
    the body is itself an identifier) still map so chains resolve.
    """
    amap: dict[str, str] = {}
    for sel in _select_lists(sql):
        for item in _split_top(sel):
            m = re.match(r"^(.*?)\s+as\s+([a-z_][a-z0-9_]*)\s*$", item.strip(), re.I | re.S)
            if not m:
                continue
            expr, alias = m.group(1).strip(), m.group(2).lower()
            if alias not in amap and expr.lower() != alias:
                amap.setdefault(alias, expr)
    return amap


def _resolve(expr: str, amap: dict[str, str], rounds: int = 6) -> str:
    """Substitute (qualified) identifiers defined as SELECT aliases."""

    def sub(m: re.Match) -> str:
        word = m.group(2).lower()
        if word in amap:
            return "(" + amap[word] + ")"
        return m.group(0)

    ident = re.compile(r"\b([a-z_][a-z0-9_]*\.)?([a-z_][a-z0-9_]*)\b(?!\s*\()", re.I)
    seen = {expr}
    for _ in range(rounds):
        new = ident.sub(sub, expr)
        if new in seen or len(new) > 20000:
            break
        seen.add(new)
        expr = new
    return expr


def _agg_spans(expr: str, fn: str) -> list[str]:
    """Argument text of every fn( ... ) call inside expr."""
    out = []
    for m in re.finditer(rf"\b{fn}\s*\(", expr, re.I):
        close = _match_paren(expr, m.end() - 1)
        out.append(expr[m.end() : close])
    return out


def _money_count(summand: str) -> int:
    # counts REPEATED references on purpose: each money factor adds 2
    # decimal digits to the product's grid
    return sum(1 for w in _WORD_RE.findall(summand.lower()) if w in MONEY_COLS)


def _strip_exact_idioms(expr: str) -> str:
    """Remove every cast(round(...) as bigint) span, paren-aware (alias
    resolution nests arbitrarily deep inside the idiom's round)."""
    out = []
    i = 0
    while i < len(expr):
        m = re.compile(r"cast\s*\(", re.I).match(expr, i)
        if m:
            close = _match_paren(expr, m.end() - 1)
            inner = expr[m.end() : close]
            tail = inner.strip()
            exact_bigint = re.match(r"\s*round\s*\(", inner, re.I) and re.search(
                r"as\s+bigint\s*$", tail, re.I
            )
            # cast(x AS DECIMAL(p,s)) summands are also exact: both
            # engines accumulate decimals exactly, so the sum is
            # order-independent (tpcds_q64's idiom)
            exact_decimal = re.search(r"as\s+decimal\s*\([^)]*\)\s*$", tail, re.I)
            if exact_bigint or exact_decimal:
                out.append(" ")
                i = close + 1
                continue
        out.append(expr[i])
        i += 1
    return "".join(out)


def _order_dependent_digits(expr: str) -> int | None:
    """Max decimal-digit grid of any order-dependent agg in expr.

    Returns None if every sum/avg is exact (or absent).  avg over money
    returns a sentinel 99 (ratio class: value leaves any decimal grid).
    Division by a non-power-of-ten anywhere in expr also forces 99 when
    an order-dependent sum is present.
    """
    worst: int | None = None
    for summand in _agg_spans(expr, "sum"):
        # money columns INSIDE a cast(round(...) as bigint) idiom are
        # exact integer units; only ones outside make the sum
        # order-dependent
        mc = _money_count(_strip_exact_idioms(summand))
        if mc == 0:
            continue
        d = 2 * mc
        worst = d if worst is None else max(worst, d)
    for summand in _agg_spans(expr, "avg"):
        # avg over exact integer units (bigint) accumulates exactly in
        # IEEE double below 2^53 — deterministic; avg over raw money
        # doubles is the reachable-boundary class (S/(100N) can sit
        # exactly on a half-10^-n boundary whenever N | 200k)
        if _money_count(_strip_exact_idioms(summand)) > 0:
            worst = 99
    if worst is not None and worst != 99:
        # a division by anything that is not a power of ten drops the
        # value off every decimal grid -> all boundaries reachable
        for m in re.finditer(r"/\s*", expr):
            tail = expr[m.end() :].lstrip()
            tok = re.match(r"[0-9][0-9.e]*|\(|[a-z_][a-z0-9_.]*", tail, re.I)
            if not tok:
                continue
            t = tok.group(0)
            if t == "(" or not _POW10_RE.match(t):
                worst = 99
                break
    return worst


def find_offenders(oracles: dict[str, str]) -> list[tuple[str, str, str]]:
    """(query, round_site, reason) for every risky round over an
    order-dependent money aggregate, lineage-resolved."""
    findings = []
    for name, sql in oracles.items():
        # identifiers/keywords are case-insensitive; analysis never
        # needs literal text (strings are stripped), so lowercase once
        s = _strip_strings(sql).lower()
        amap = _alias_map(s)
        for m in re.finditer(r"\bround\s*\(", s, re.I):
            close = _match_paren(s, m.end() - 1)
            args = _split_top(s[m.end() : close])
            arg0 = args[0]
            scale = 0
            if len(args) > 1:
                sm = re.match(r"^\s*(-?\d+)\s*$", args[1])
                if not sm:
                    continue
                scale = int(sm.group(1))
            resolved = _resolve(arg0, amap)
            d = _order_dependent_digits(resolved)
            if d is None:
                continue
            if d > scale:
                site = re.sub(r"\s+", " ", s[m.start() : close + 1]).strip()[:90]
                reason = (
                    f"order-dependent money aggregate on a 1e-{d} grid "
                    f"rounded at scale {scale}"
                    if d != 99
                    else "order-dependent money aggregate feeding a "
                    "ratio/avg (off-grid: every rounding boundary reachable)"
                )
                findings.append((name, site, reason))
    return findings


def main() -> int:
    import os

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    from flink_1_20_spark.registry import get_oracles

    import flink_1_20_spark.queries  # noqa: F401 - registers everything

    findings = find_offenders(get_oracles())
    for name, site, reason in findings:
        print(f"FLAG {name}: {site}\n     {reason}")
    print(f"\n{len(findings)} flagged of {len(get_oracles())} oracles")
    return 1 if findings else 0


if __name__ == "__main__":
    sys.exit(main())
