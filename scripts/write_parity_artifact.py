#!/usr/bin/env python
"""Write PARITY_r{N}.md — the full-registry oracle-parity sweep artifact.

The driver's CORRECTNESS_r{N}.json grades only the 50-query window; this
artifact is the same comparison run over EVERY oracle-backed registration
(the analogue of CORRECTNESS for the non-window set), refreshed each round.

Usage: python scripts/write_parity_artifact.py <round> [sf_dir]
"""

from __future__ import annotations

import datetime
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from distributed_graph_database_system_spark.session import get_spark  # noqa: E402
from tests.parity import run_parity  # noqa: E402


def main() -> int:
    rnd = int(sys.argv[1])
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    spark = get_spark(cpus=8)
    results = run_parity(spark, sf_dir, None)
    bad = {n: p for n, p in results.items() if p}
    today = datetime.date.today().isoformat()
    lines = [
        f"# PARITY — round {rnd} full-registry sweep ({today})",
        "",
        f"`scripts/check_parity.py {sf_dir}` over every oracle-backed",
        "registration: Spark result vs DuckDB oracle, columns sorted by name,",
        "values canonicalized, row multisets compared EXACTLY (the same",
        "comparison the driver's CORRECTNESS check hashes).",
        "",
        f"**{len(results) - len(bad)}/{len(results)} oracle-backed queries match.**",
        "",
    ]
    if bad:
        lines.append("## Failures")
        lines.append("")
        for name in sorted(bad):
            lines.append(f"- `{name}`")
            for p in bad[name]:
                lines.append(f"  - {p}")
        lines.append("")
    lines.append("## Matched queries")
    lines.append("")
    ok = sorted(n for n, p in results.items() if not p)
    for i in range(0, len(ok), 4):
        lines.append("  " + "  ".join(f"`{n}`" for n in ok[i : i + 4]))
    with open(f"PARITY_r{rnd}.md", "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print(f"wrote PARITY_r{rnd}.md: {len(results) - len(bad)}/{len(results)}")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
