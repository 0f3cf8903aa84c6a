"""Per-query profiling harness for optimization rounds (guide §1).

Times a subset of the registry with the bench's own methodology (noop
sink, warm-up pass, interleaved repeats, unpin between runs) so a
change's before/after can be measured without paying for the whole
94-query bench, and dumps ``explain("formatted")`` per query for the
plan record the judge checks (plans/r<N>/).

Usage:
    python -m eventsgateway_spark.tools.qprof q60 q93 q94 \
        [--runs 5] [--explain plans/r15 --suffix before]

Query names are matched by qNN prefix. Timings print per query as
all samples + min/median. The same $SPARK_GRAFT_SF_DIR /
$SPARK_GRAFT_CPUS contract as bench.py.
"""

from __future__ import annotations

import argparse
import gc
import os
import statistics
import sys
import time

REPO = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("prefixes", nargs="+", help="qNN prefixes to profile")
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--explain", default=None, help="dir for plan dumps")
    ap.add_argument(
        "--suffix", default="before", help="plan file suffix (before/after)"
    )
    args = ap.parse_args()

    from eventsgateway_spark.queries import QUERIES
    from eventsgateway_spark.queries._util import unpin_all
    from eventsgateway_spark.session import get_spark

    names = []
    for p in args.prefixes:
        hits = [n for n in sorted(QUERIES) if n.split("_", 1)[0] == p or n == p]
        if not hits:
            raise SystemExit(f"no query matches {p!r}")
        names.extend(hits)

    spark = get_spark("qprof")

    def run_once(name: str) -> float:
        spark.sparkContext.setJobDescription(f"qprof:{name}")
        t0 = time.perf_counter()
        QUERIES[name](spark, SF_DIR).write.format("noop").mode(
            "overwrite"
        ).save()
        dt = time.perf_counter() - t0
        unpin_all()
        gc.collect()
        spark.sparkContext._jvm.System.gc()
        return dt

    if args.explain:
        os.makedirs(args.explain, exist_ok=True)
        for name in names:
            df = QUERIES[name](spark, SF_DIR)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            unpin_all()
            path = os.path.join(
                args.explain, f"{name.split('_', 1)[0]}_{args.suffix}.txt"
            )
            with open(path, "w") as fh:
                fh.write(txt)
            print(f"explain -> {path}", flush=True)

    if args.runs > 0:
        samples: dict[str, list[float]] = {n: [] for n in names}
        for n in names:  # warm-up
            run_once(n)
        for _ in range(args.runs):
            for n in names:
                samples[n].append(run_once(n))
        for n in names:
            xs = samples[n]
            print(
                f"{n}: min={min(xs):.3f} med={statistics.median(xs):.3f} "
                f"samples={[round(x, 3) for x in xs]}",
                flush=True,
            )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
