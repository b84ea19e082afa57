"""Fit per-family scaling exponents from tools/FAMILY_SCALING.json.

For each query, least-squares fit log(wall) = a + b·log(sf) over the
measured SFs and print b (the exponent in wall ~ n^b) plus the
sf1→sf10 wall ratio — the numbers SCALING.md's scaling table quotes.
Anything with b > 1.2 is flagged (the superlinear alarm threshold).

Usage: python tools/fit_exponents.py [path-to-FAMILY_SCALING.json]
"""

from __future__ import annotations

import json
import math
import sys
from pathlib import Path

ALARM = 1.2


def fit(points: dict[str, float]) -> float:
    xs = [math.log(float(sf)) for sf in points]
    ys = [math.log(w) for w in points.values()]
    n = len(xs)
    mx, my = sum(xs) / n, sum(ys) / n
    return sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / sum(
        (x - mx) ** 2 for x in xs
    )


def main() -> None:
    path = Path(sys.argv[1] if len(sys.argv) > 1 else
                Path(__file__).parent / "FAMILY_SCALING.json")
    data = json.loads(path.read_text())
    flagged = []
    print(f"{'query':24} {'exponent':>8} {'sf1→sf10':>9}")
    for name, walls in sorted(data["wall_s"].items()):
        b = fit(walls)
        ratio = walls["10.0"] / walls["1.0"] if "1.0" in walls and "10.0" in walls else float("nan")
        mark = "  <-- SUPERLINEAR" if b > ALARM else ""
        print(f"{name:24} n^{b:0.2f}  {ratio:8.2f}x{mark}")
        if b > ALARM:
            flagged.append(name)
    if flagged:
        print(f"\n{len(flagged)} famil{'y' if len(flagged)==1 else 'ies'} above n^{ALARM}: {flagged}")
        sys.exit(1)
    print(f"\nall families below the n^{ALARM} alarm threshold")


if __name__ == "__main__":
    main()
