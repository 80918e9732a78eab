#!/usr/bin/env python3
"""Extract per-query formatted-plan sections from a PLANS.md into
plans/<dir>/<query>_<suffix>.txt (optimization-round evidence files)."""
import re, sys, os
src, outdir, suffix = sys.argv[1], sys.argv[2], sys.argv[3]
names = sys.argv[4].split(',')
text = open(src).read()
os.makedirs(outdir, exist_ok=True)
for n in names:
    m = re.search(rf"^## {re.escape(n)}\n\n```\n(.*?)\n```\n", text, re.S | re.M)
    if not m:
        print(f"MISSING {n}"); continue
    open(f"{outdir}/{n}_{suffix}.txt", "w").write(m.group(1) + "\n")
    print(f"wrote {outdir}/{n}_{suffix}.txt")
