"""Dump .explain("formatted") for queries into plans/r12/<name>_<tag>.txt.

Usage: python tools/dump_plans_r12.py <before|after> [--sf DIR] [query ...]
Defaults to bench.py's HEADLINE list at sf0.1 (the bench SF — join
strategies are size-dependent, so perf claims are made at the SF they
were measured at; tools/plans/ keeps the sf0.01 archives the plan guard
pins).
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

sys.path.insert(0, "/root/repo")

from imagingdb_spark import registry
from imagingdb_spark.session import get_spark


def headline() -> list[str]:
    src = Path("/root/repo/bench.py").read_text()
    body = re.search(r"HEADLINE = \[(.*?)\]", src, re.S).group(1)
    return re.findall(r'"([^"]+)"', body)


def main() -> None:
    tag = sys.argv[1]
    args = sys.argv[2:]
    sf = "/root/testdata/sf0.1"
    if args and args[0] == "--sf":
        sf = args[1]
        args = args[2:]
    names = args or headline()
    registry.load_all()
    spark = get_spark("plans_r12")
    out_dir = Path("/root/repo/plans/r12")
    out_dir.mkdir(parents=True, exist_ok=True)
    for name in names:
        df = registry.QUERIES[name](spark, sf)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        (out_dir / f"{name}_{tag}.txt").write_text(plan)
        spark.catalog.clearCache()
        print(f"wrote {name}_{tag}.txt", file=sys.stderr)


if __name__ == "__main__":
    main()
