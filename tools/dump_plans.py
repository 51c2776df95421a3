"""Dump .explain("formatted") for registry queries to plans/<tag>/.

Usage: python tools/dump_plans.py <sf_dir> <out_dir> [query ...]

Writes one file per query: <out_dir>/<name>_<suffix>.txt (suffix from
$PLAN_SUFFIX, default "before"). Build-side artifact work (trainers,
ingests) runs as usual — plans reflect exactly what the bench executes.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def explain_str(df) -> str:
    jdf = df._jdf  # noqa: SLF001
    sc = df.sparkSession.sparkContext
    jvm = sc._jvm  # noqa: SLF001
    return jvm.PythonSQLUtils.explainString(jdf.queryExecution(), "formatted")


def main() -> int:
    sf_dir = sys.argv[1]
    out_dir = sys.argv[2]
    only = set(sys.argv[3:])
    suffix = os.environ.get("PLAN_SUFFIX", "before")
    os.makedirs(out_dir, exist_ok=True)

    from monday_etl_automation_spark.plans import registry
    from monday_etl_automation_spark.session import get_spark

    spark = get_spark("dump_plans")
    qs = registry.queries()
    for name in sorted(qs):
        if only and name not in only:
            continue
        try:
            df = qs[name](spark, sf_dir)
            text = explain_str(df)
        except Exception as ex:  # noqa: BLE001
            text = f"ERROR building plan: {type(ex).__name__}: {ex}"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(text)
        print(f"wrote {path} ({len(text)} bytes)", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
