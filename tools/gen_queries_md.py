#!/usr/bin/env python3
"""Regenerate QUERIES.md, the registry index: one row per registered
query with its source location, oracle kind, and the first sentence of
its registry comment."""
import re

files = ["CoreQueries.scala", "StoreQueries.scala", "PipelineQueries.scala"]
rows = []
for f in files:
    p = f"/root/repo/src/main/scala/graft/queries/{f}"
    lines = open(p).read().split("\n")
    qidx = [i for i, ln in enumerate(lines) if re.match(r'\s*Q\("([a-z0-9_]+)"', ln)]
    for n, i in enumerate(qidx):
        name = re.match(r'\s*Q\("([a-z0-9_]+)"', lines[i]).group(1)
        desc = []
        j = i - 1
        while j >= 0 and lines[j].strip().startswith("//"):
            desc.append(lines[j].strip().lstrip("/ ").strip())
            j -= 1
        desc = " ".join(reversed(desc))
        first = re.split(r'(?<=[.;]) ', desc)[0] if desc else ""
        first = first.rstrip('.;,')
        if len(first) > 160:
            first = first[:157] + "..."
        end = qidx[n + 1] if n + 1 < len(qidx) else len(lines)
        seg = "\n".join(lines[i:end])
        oracle = "yes" if re.search(r'Some\s*[({]', seg) else "rows-only"
        rows.append((name, f, i + 1, oracle, first))

out = ["# QUERIES — the oracle-checked registry index",
       "",
       f"{len(rows)} registered queries (generated from the `queries/` sources by",
       "`tools/gen_queries_md.py`). \"oracle\" = DuckDB SQL hash-compare;",
       "\"rows-only\" = declared rows-only check.",
       "",
       "| query | source | oracle | what it proves |",
       "|---|---|---|---|"]
for name, f, line, oracle, first in rows:
    first = first.replace("|", "\\|")
    out.append(f"| {name} | `{f}:{line}` | {oracle} | {first} |")
open("/root/repo/QUERIES.md", "w").write("\n".join(out) + "\n")
print("queries:", len(rows), "rows-only:", [r[0] for r in rows if r[3] == "rows-only"])
