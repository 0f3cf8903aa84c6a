#!/usr/bin/env python
"""Benchmark the declared query surface.

Runs every registered query at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]: one warm-up pass
over the whole registry, then N INTERLEAVED timed passes (per-query
median over passes — see the inline note on why interleaving beats
consecutive samples on drift-prone hosts), and prints ONE JSON line:

    {"metric": "declared_queries_total", "value": <sum of medians>,
     "unit": "sec", "queries": {name: sec, ...}, "sf": 0.1}

Execution is forced with a cheap ``count()``-style action
(``df.write.format("noop")``) so the timing covers scan→compute without
driver-side collect overhead dominating.

The stdout JSON uses the short ``qNN`` prefix of each registry name as the
per-query key (``q53`` for ``q53_decontaminate``): the driver records only
the last ~2000 characters of stdout, and the full-name mapping for 79
queries produced a ~2900-char line that was front-truncated past parsing
(every BENCH_r{1..9}.json has ``parsed: null`` for exactly this reason).
The ``qNN`` prefixes are unique across the registry (pinned by
``tests/test_registry.py``); the full-name timing map is emitted on stderr
for humans.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))


def _sf_from_dir(d: str) -> float:
    base = os.path.basename(d.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def main() -> None:
    import gc

    from eventsgateway_spark.queries import QUERIES
    from eventsgateway_spark.session import get_spark

    from eventsgateway_spark.queries._util import unpin_all

    spark = get_spark("bench")

    def run_once(fn) -> float:
        t0 = time.perf_counter()
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        # release leftover pinned/persisted frames, localCheckpoint
        # blocks, and broadcasts between queries — 70+ queries share one
        # session and accumulated blocks otherwise distort later
        # measurements (persisted frames survive GC until unpersist)
        unpin_all()
        gc.collect()
        spark.sparkContext._jvm.System.gc()
        return dt

    names = sorted(QUERIES)
    # INTERLEAVED passes (round 10): one warm-up pass over the whole
    # registry (plan + JIT + file listing caches), then RUNS full
    # passes, so each query's samples land minutes apart instead of
    # back-to-back. This box suffers host-level interference windows
    # (BASELINE.md rounds 8-10: identical code swings 2-6x for minutes
    # at a time with near-zero in-guest load); consecutive samples all
    # fall inside one window, so a per-query median over consecutive
    # runs inherits the full swing, while interleaved samples straddle
    # windows and the median sheds them. Same total work either way —
    # only the ordering changes. Session-age inflation (round-5/8
    # late-query wobble) also spreads evenly instead of always taxing
    # the alphabetically-last queries' every sample.
    for name in names:
        run_once(QUERIES[name])
    samples: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(RUNS):
        for name in names:
            samples[name].append(run_once(QUERIES[name]))
    timings = {
        n: round(statistics.median(samples[n]), 4) for n in names
    }

    # full-name map to stderr for humans; compact qNN keys on stdout so the
    # one JSON line survives the driver's 2000-char stdout tail (see module
    # docstring)
    print(json.dumps({"queries_by_name": timings}), file=sys.stderr)
    short = {name.split("_", 1)[0]: sec for name, sec in timings.items()}
    assert len(short) == len(timings), "qNN prefixes must be unique"
    print(
        json.dumps(
            {
                "metric": "declared_queries_total",
                "value": round(sum(timings.values()), 4),
                "unit": "sec",
                "queries": short,
                "sf": _sf_from_dir(SF_DIR),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
