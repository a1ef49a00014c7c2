"""Dump `.explain("formatted")` for registry queries to files.

Usage: python tools/dump_plans.py <out_dir> <tag> [query ...]
       (no query names = every registered query)
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)

Writes <out_dir>/<query>_<tag>.txt — the optimization-round evidence
files (plans/r09/<query>_before.txt / _after.txt).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_evm_chain_spark.plans.registry import all_specs  # noqa: E402
from etl_evm_chain_spark.session import get_spark  # noqa: E402
from tools.explain_audit import _plan_text  # noqa: E402


def main() -> int:
    if len(sys.argv) < 3:
        sys.exit("usage: dump_plans.py <out_dir> <tag> [query ...]")
    out_dir, tag = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("dump_plans")
    for spec in all_specs():
        if only and spec.name not in only:
            continue
        try:
            plan = _plan_text(spec.fn(spark, sf_dir))
        except Exception as e:  # noqa: BLE001
            plan = f"PLAN RENDER FAILED: {e}\n"
        path = os.path.join(out_dir, f"{spec.name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
