#!/usr/bin/env python3
"""Audit SQL-text sum()->DOUBLE conversions for the correctly-rounded rule.

Why: DuckDB's HUGEINT->DOUBLE (and DECIMAL->DOUBLE) composes
upper*2^64 + lower and is NOT correctly rounded (verified 1 ulp off at
10^23+3); Spark's BigDecimal path IS. An integer moment that crosses
2^53 therefore diverges between the legs unless the DuckDB conversion
routes through a string cast (VARCHAR->DOUBLE uses fast_float, the only
correctly-rounded conversion DuckDB has). Shared Spark/DuckDB texts must
spell it `AS STRING` (Spark rejects bare VARCHAR); oracle-only text may
use `::VARCHAR::DOUBLE`.

This script finds every conversion of a `sum(...)` aggregate to DOUBLE
inside the .scala query files' SQL strings and fails loudly on any site
that (a) is not string-routed and (b) is not in the ALLOW list below.
Every ALLOW entry must state why the sum stays under 2^53 at any
plausible SF (bounded window frame, row-count magnitude, or the sum is
already DOUBLE-typed so the cast is a no-op). New unsafe sites fail the
close gate until routed or adjudicated here.

Usage: python3 scripts/detcast.py src/main/scala/graft/queries/*.scala
Exit 0 = every site routed or allowlisted; exit 1 lists violations.
"""
import re
import sys

# (file suffix, substring that identifies the site, boundedness reason)
ALLOW = [
    ("GoldQueries.scala", "AS BIGINT)) OVER w AS DOUBLE",
     "7-row window frame: <= 7 rows of cents, ~1e7 max"),
    ("GoldQueries.scala", "(sum(xi) OVER w)::DOUBLE",
     "7-row window frame over 1e6-scaled daily means, ~1e9 max"),
    ("GoldQueries.scala", "sum(di)::DOUBLE",
     "grouped by day-of-week over the dataset's date span; di ~1e8, "
     "ceiling ~1e5 years of days"),
    ("EventQueries.scala", "sum(cents)::DOUBLE",
     "per-group mean of ~1e4-magnitude cents: 2^53 needs ~1e12 rows "
     "per group (~sf1e7)"),
    ("StatsQueries.scala", "sum(np)::DOUBLE",
     "np/nt are per-decile row counts: < total rows << 2^53"),
    ("StatsQueries.scala", "sum(term)::DOUBLE",
     "term is DOUBLE-typed (log2/chi2 contribution); cast is a no-op"),
    ("StatsQueries.scala", "sum((greatest(c_ref::DOUBLE",
     "summand is DOUBLE-typed (PSI contribution); sum is DOUBLE"),
    ("HygieneQueries.scala", "sum(n_docs)::DOUBLE",
     "corpus document count << 2^53 at any SF"),
    ("TextQueries.scala", "(sum(w*w))::DOUBLE",
     "w is a DOUBLE tf-idf weight; sum is DOUBLE already"),
    ("VectorQueries.scala", "list_sum([CASE WHEN list_sum([v[j+1]*",
     "64-element list_sum of DOUBLE components; DOUBLE already"),
    ("ExtQueries.scala", "list_sum([ascii(text[i]",
     "per-row byte sum, bounded by document length"),
]

SUM = re.compile(r'(?<![\w.])sum\s*\(', re.IGNORECASE)


def match_paren(text, open_idx):
    """Index just past the ')' matching the '(' at open_idx."""
    depth, k = 1, open_idx + 1
    while k < len(text) and depth > 0:
        if text[k] == '(':
            depth += 1
        elif text[k] == ')':
            depth -= 1
        k += 1
    return k


def double_conversions(text):
    """Yield (start, end, expr) for each CAST(expr AS DOUBLE) or
    (expr)::DOUBLE / ident::DOUBLE whose expr contains a sum()."""
    for m in re.finditer(r'(?<![\w.])CAST\s*\(', text, re.IGNORECASE):
        end = match_paren(text, m.end() - 1)
        inner = text[m.end():end - 1]
        t = re.search(r'\bAS\s+DOUBLE\s*$', inner.strip(), re.IGNORECASE)
        if t:
            yield m.start(), end, inner
    for m in re.finditer(r'::\s*DOUBLE', text, re.IGNORECASE):
        j = m.start() - 1
        while j >= 0 and text[j] in ' \t\n|':
            j -= 1
        if j >= 0 and text[j] == ')':
            # walk back to the matching '('
            depth, k = 1, j - 1
            while k >= 0 and depth > 0:
                if text[k] == ')':
                    depth += 1
                elif text[k] == '(':
                    depth -= 1
                k -= 1
            start = k + 1
            # include a leading function name (e.g. sum(...)::DOUBLE)
            while start - 1 >= 0 and (text[start - 1].isalnum()
                                      or text[start - 1] in '_.'):
                start -= 1
            yield start, m.end(), text[start:j + 1]
        else:
            k = j
            while k >= 0 and (text[k].isalnum() or text[k] in '_.'):
                k -= 1
            yield k + 1, m.end(), text[k + 1:j + 1]


def audit(path, text):
    violations = []
    for start, end, expr in double_conversions(text):
        if not SUM.search(expr):
            continue  # not an aggregate conversion
        if re.search(r'AS\s+(STRING|VARCHAR)|::\s*(VARCHAR|STRING)',
                     expr, re.IGNORECASE):
            continue  # string-routed: correctly rounded on both engines
        snippet = ' '.join(text[start:end].split())
        if any(path.endswith(f) and key in snippet for f, key, _ in ALLOW):
            continue
        line = text.count('\n', 0, start) + 1
        violations.append((line, snippet[:160]))
    return violations


if __name__ == '__main__':
    bad = 0
    for path in sys.argv[1:]:
        with open(path) as f:
            src = f.read()
        for line, snippet in audit(path, src):
            print(f"UNROUTED {path}:{line}: {snippet}", file=sys.stderr)
            bad += 1
    if bad:
        print(f"{bad} sum()->DOUBLE conversions neither string-routed nor "
              "adjudicated in ALLOW - route via AS STRING (shared text) / "
              "::VARCHAR::DOUBLE (oracle-only) or add an ALLOW entry with "
              "a boundedness reason", file=sys.stderr)
        sys.exit(1)
    print("detcast: every sum()->DOUBLE conversion is string-routed or "
          "adjudicated bounded")
