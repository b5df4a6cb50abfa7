#!/usr/bin/env python3
"""Regenerate BENCH_TREND.md: one row per round from the driver's
round-snapshot commits (the only totals measured under comparable
conditions), plus the current working-tree BENCH_FULL.json as the
in-progress row. Run after each bench refresh; idempotent."""
import json, re, subprocess

def total(ref):
    try:
        raw = subprocess.run(["git", "show", f"{ref}:BENCH_FULL.json"],
                             capture_output=True, text=True, check=True).stdout
        d = json.loads(raw)
        return d["value"], len(d["queries"])
    except Exception:
        return None

log = subprocess.run(
    ["git", "log", "--reverse", "--format=%H %s"],
    capture_output=True, text=True, check=True).stdout
rows = []
for line in log.splitlines():
    m = re.match(r"(\S+) round (\d+): verdict", line)
    if m and (t := total(m.group(1))):
        rows.append((int(m.group(2)), t[0], t[1]))
try:
    d = json.load(open("BENCH_FULL.json"))
    rows.append((rows[-1][0] + 1 if rows else 1, d["value"], len(d["queries"])))
except Exception:
    pass

with open("BENCH_TREND.md", "w") as f:
    f.write("# BENCH trend — sf0.1 local[32] total per round\n\n")
    f.write("Regenerate with `python3 tools/bench_trend.py`. Rows come from each\n")
    f.write("`round N:` snapshot commit's BENCH_FULL.json (driver-measured); the\n")
    f.write("last row is the CURRENT working-tree artifact (this round, in\n")
    f.write("progress). Totals are comparable only at equal query counts — read\n")
    f.write("the per-query ratio analysis in VERDICT.md for regressions.\n")
    f.write("Totals also carry HOST-SPEED variance across rounds: the r12\n")
    f.write("working-tree refresh measured a UNIFORM ~1.65x median per-query\n")
    f.write("ratio vs the r11-era artifact on identical code+data (verified by\n")
    f.write("isolated single-query re-runs, e.g. q01 0.35->1.33 s; load/clock\n")
    f.write("nominal) — read cross-round totals as (machine x board), and only\n")
    f.write("same-session isolated A/B runs as regressions.\n\n")
    f.write("| round | total_s | n_queries | s/query |\n|---|---|---|---|\n")
    for r, v, n in rows:
        flag = " (broken artifact)" if n <= 1 else ""
        sq = f"{v / n:.2f}" if n > 1 else "—"
        f.write(f"| r{r}{flag} | {v:.1f} | {n} | {sq} |\n")
print(f"wrote BENCH_TREND.md ({len(rows)} rows)")
