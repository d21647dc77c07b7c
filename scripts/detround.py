#!/usr/bin/env python3
"""Rewrite 2-arg round(expr, n) -> (floor((expr) * 1e{n} + 0.5) / 1e{n}).

Why: Spark's Round on DOUBLE rounds the *shortest decimal representation*
(BigDecimal.valueOf) with HALF_UP, DuckDB rounds the binary value - a
double whose shortest repr sits exactly on the half-way grid splits 1 ulp
apart between the engines (the gold_sharpe_ratio sf0.1 divergence). The
floor form is plain IEEE arithmetic, bit-deterministic on identical
inputs, and is written identically into BOTH the Spark leg and the DuckDB
oracle leg, so there is no decimal-vs-binary tie surface left.

Applies to .scala query files: rewrites both Scala `round($"x", 6)` calls
and round( inside the SQL oracle strings. 1-arg round() is left alone
(used on grid-valued cents where it is never near a tie) BUT its argument
is recursed into, so 2-arg sites nested inside survive no sweep unseen.
Every 2-arg site that is KEPT (comment line, non-literal scale) is
reported to stderr - a skip is a decision for a human, never silent
(round 10 silently missed the bm25 SQL leg exactly this way).
Paren-matched, multi-line safe (margin pipes stay inside the parens and
survive stripMargin).
"""
import re
import sys

TOKEN = re.compile(r'(?<![\w.])round\(')


def rewrite(text: str, path: str = '?', skips=None):
    if skips is None:
        skips = []
    out, i, count = [], 0, 0
    while True:
        m = TOKEN.search(text, i)
        if not m:
            out.append(text[i:])
            break
        out.append(text[i:m.start()])
        # leave doc/line comments alone - they describe patterns, not code
        line_start = text.rfind('\n', 0, m.start()) + 1
        lead = text[line_start:m.start()].lstrip()
        in_comment = lead.startswith('*') or lead.startswith('//') \
            or '// ' in lead
        j = m.end()  # position after '('
        depth, k = 1, j
        top_comma = None
        while k < len(text) and depth > 0:
            c = text[k]
            if c == '(':
                depth += 1
            elif c == ')':
                depth -= 1
            elif c == ',' and depth == 1 and top_comma is None:
                top_comma = k
            k += 1
        close = k - 1  # index of matching ')'
        line_no = text.count('\n', 0, m.start()) + 1

        def keep_recursed(reason=None):
            # keep this round() call but still rewrite anything nested
            # inside its argument list; report kept 2-arg sites loudly
            nonlocal count
            if reason is not None and top_comma is not None:
                skips.append((path, line_no, reason,
                              text[m.start():close + 1].split('\n')[0]))
            inner, n_inner = rewrite(text[j:close], path, skips)
            count += n_inner
            out.append(text[m.start():j] + inner + ')')

        if in_comment:
            if top_comma is not None:
                skips.append((path, line_no, 'comment line',
                              text[m.start():close + 1].split('\n')[0]))
            out.append(text[m.start():close + 1])  # comments: verbatim
        elif top_comma is None:
            keep_recursed()  # 1-arg: keep, recurse into the argument
        else:
            scale = text[top_comma + 1:close].strip()
            if re.fullmatch(r'\d+', scale):
                inner, n_inner = rewrite(text[j:top_comma], path, skips)
                out.append(
                    f"(floor(({inner}) * 1e{scale} + 0.5) / 1e{scale})")
                count += 1 + n_inner
            else:
                keep_recursed('non-literal scale')
        i = close + 1
    return ''.join(out), count


if __name__ == '__main__':
    all_skips = []
    for path in sys.argv[1:]:
        with open(path) as f:
            src = f.read()
        new, n = rewrite(src, path, all_skips)
        if n:
            with open(path, 'w') as f:
                f.write(new)
        print(f"{path}: rewrote {n} two-arg round() sites")
    for path, line, reason, snippet in all_skips:
        print(f"SKIPPED {path}:{line} ({reason}): {snippet}",
              file=sys.stderr)
    if all_skips:
        print(f"{len(all_skips)} two-arg round() sites KEPT - "
              "review each before trusting determinism", file=sys.stderr)
