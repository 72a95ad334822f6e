#!/usr/bin/env python
"""Ad-hoc oracle-gate sweep at a chosen SF, archived as JSON.

    python scripts/oracle_mirror.py --sf /root/testdata/sf0.01 \
        --out bench_results/oracle_sf001_r03.json [--names a,b,c]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--sf", default="/root/testdata/sf0.01")
    p.add_argument("--out", required=True)
    p.add_argument("--names", default=None, help="comma list (default all)")
    p.add_argument("--cpus", default="8")
    args = p.parse_args()

    from pushkind_crawlers_spark.gatecheck import run_gate
    from pushkind_crawlers_spark.session import get_spark

    spark = get_spark(app="oracle-mirror", master=f"local[{args.cpus}]",
                      shuffle_partitions=int(args.cpus) * 2)
    names = args.names.split(",") if args.names else None
    t0 = time.time()
    rows = run_gate(spark, args.sf, names)
    wall = time.time() - t0
    n_green = sum(1 for r in rows.values()
                  if r["rows_match"] and r["schema_match"] and r["hash_match"])
    payload = {"sf_dir": args.sf, "wall_s": round(wall, 1),
               "green": n_green, "total": len(rows), "rows": rows}
    with open(args.out, "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps({"green": n_green, "total": len(rows),
                      "wall_s": round(wall, 1), "out": args.out}))
    spark.stop()
    return 0 if n_green == len(rows) else 1


if __name__ == "__main__":
    raise SystemExit(main())
