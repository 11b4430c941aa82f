#!/usr/bin/env python3
"""SURVEY.md hygiene gate: section-2 operator-row ids must be UNIQUE.

The r08 verdict's duplicate-id cleanup was re-broken by r09 additions (A4f,
N14b, N38j, N38k each appeared twice); this check makes the recurrence
impossible to miss. Run at round close alongside tools/check.py and
tools/bench_gate.py (the verify skill's recipe).

Exit 0 = all ids unique; exit 1 = duplicates listed on stderr.
"""
import re
import sys

SURVEY = sys.argv[1] if len(sys.argv) > 1 else "SURVEY.md"

text = open(SURVEY).read()
# section 2 = between the '## 2.' and '## 3.' headings
m = re.search(r"^## 2\..*?(?=^## 3\.)", text, re.S | re.M)
if not m:
    sys.stderr.write("survey_check: could not locate section 2\n")
    sys.exit(2)
rows = re.findall(r"^\| ([A-Z]+\d+[a-z0-9]*) \|", m.group(0), re.M)
if not rows:
    sys.stderr.write("survey_check: no operator rows found in section 2\n")
    sys.exit(2)

seen, dups = {}, []
for rid in rows:
    seen[rid] = seen.get(rid, 0) + 1
for rid, n in seen.items():
    if n > 1:
        dups.append((rid, n))

if dups:
    for rid, n in sorted(dups):
        sys.stderr.write(f"survey_check: DUPLICATE row id {rid} x{n}\n")
    sys.exit(1)
print(f"survey_check: {len(rows)} rows, {len(seen)} unique ids, 0 duplicates")
