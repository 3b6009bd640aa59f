"""Regenerate SURVEY.md §2.6's beyond-reference query table (stdout).

One row per registered query that is NOT already cited in the §2.6
reference-parity table: name | tags | entry point (module:line) | first
round whose committed CORRECTNESS_r*.json hash-verified it | the first
sentence of the query function's docstring. Run from the repo root and
paste the output over the existing table; never hand-edit rows (they
drift from the registry).

    python tools/survey_table.py > /tmp/table.md
"""

from __future__ import annotations

import glob
import inspect
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gpu_mapreduce_spark.registry import load_all

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def first_green_rounds() -> dict[str, int]:
    green: dict[str, int] = {}
    def _round(p: str) -> int:
        return int(re.search(r"r0*(\d+)", os.path.basename(p)).group(1))

    # numeric sort: lexical order would visit r10 before r2 and misattribute
    # "first green" once double-digit rounds exist
    for path in sorted(
        glob.glob(os.path.join(_ROOT, "CORRECTNESS_r*.json")), key=_round
    ):
        rnd = _round(path)
        d = json.load(open(path))
        results = d.get("results", d)  # r06+ nests; earlier rounds are flat
        for name, r in results.items():
            if not isinstance(r, dict):
                continue
            ok = (
                r.get("rows_match")
                and r.get("schema_match")
                and (r.get("hash_match") in (True, None))
                and not r.get("err")
            )
            if ok and name not in green:
                green[name] = rnd
    return green


def reference_table_names(qs) -> set[str]:
    """Query names already cited in §2.6's reference-parity table."""
    survey = open(os.path.join(_ROOT, "SURVEY.md")).read()
    sec = survey.split("### 2.6")[1].split("Beyond-reference additions")[0]
    return {m.group(1) for m in re.finditer(r"`([a-z0-9_]+)`", sec) if m.group(1) in qs}


def summary(fn) -> str:
    flat = " ".join((inspect.getdoc(fn) or "").split())
    m = re.match(r"(.+?[a-z)\]`'\"])\.(?:\s|$)", flat)
    s = m.group(1) if m else flat
    if len(s) > 150:
        s = s[:147] + "..."
    return s.replace("|", "\\|")


def main() -> None:
    qs = load_all()
    green = first_green_rounds()
    ref = reference_table_names(qs)
    print("| query | axis (tags) | entry point | first green | what it is |")
    print("|---|---|---|---|---|")
    for name, q in qs.items():  # registration order
        if name in ref:
            continue
        mod = inspect.getmodule(q.fn).__name__.split(".")[-1]
        line = inspect.getsourcelines(q.fn)[1]
        g = green.get(name)
        fg = f"r{g}" if g else "pending"
        print(
            f"| `{name}` | {','.join(q.tags)} | `queries/{mod}.py:{line}` "
            f"| {fg} | {summary(q.fn)} |"
        )


if __name__ == "__main__":
    main()
