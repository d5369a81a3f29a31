#!/usr/bin/env python
"""Round-7 optimization harness (bench.py is FROZEN for measurement — this
file exists so the round's iteration loop and plan capture never touch it).

Usage:
    python bench_extra.py [--sf-dir DIR] [--tries N] [--explain-tag TAG]
                          [--queries a,b,c]

Per query: noop-sink isolated timing (guide §1.4), min-of-N with the cache
cleared between tries, steal fraction sampled around each try; with
--explain-tag TAG also writes plans/r07/<query>_<TAG>.txt with the
``.explain("formatted")`` output. Prints one JSON line.
"""

from __future__ import annotations

import contextlib
import io
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from bench import HEADLINE, _spin_probe, _stop_accumulation_daemon, _time_query


def main() -> None:
    from ai_knowledge_graph_builder_spark.bench_scaling import _steal_snapshot
    from ai_knowledge_graph_builder_spark.driver_queries import QUERIES
    from ai_knowledge_graph_builder_spark.session import get_spark

    args = sys.argv[1:]

    def _opt(flag: str, default: str | None = None) -> str | None:
        if flag in args:
            i = args.index(flag) + 1
            if i >= len(args):
                sys.exit(f"{flag} requires a value")
            return args[i]
        return default

    sf_dir = _opt("--sf-dir", os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    tries = max(1, int(_opt("--tries", "2")))
    tag = _opt("--explain-tag")
    names = (_opt("--queries") or ",".join(HEADLINE)).split(",")

    _stop_accumulation_daemon()
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("kg-bench-extra", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    # same warmup as bench.py: scan path + Python/Arrow worker pool
    spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .limit(64).repartition(int(cpus))
        .mapInPandas(lambda it: (pdf.head(1) for pdf in it),
                     spark.read.parquet(f"{sf_dir}/documents.parquet").schema)
        .write.format("noop").mode("overwrite").save()
    )

    plans_dir = Path(__file__).resolve().parent / "plans" / "r07"
    timings: dict[str, float] = {}
    steals: dict[str, float] = {}
    probe = _spin_probe()
    for name in names:
        fn = QUERIES[name]
        spark.sparkContext.setJobDescription(f"bench_extra: {name}")
        best, worst_steal = None, 0.0
        for _ in range(tries):
            spark.catalog.clearCache()
            s0, t0 = _steal_snapshot()
            sec = _time_query(spark, fn, sf_dir)
            s1, t1 = _steal_snapshot()
            worst_steal = max(worst_steal, (s1 - s0) / max(t1 - t0, 1))
            best = sec if best is None or sec < best else best
        timings[name] = round(best, 3)
        steals[name] = round(worst_steal, 4)
        if tag:
            plans_dir.mkdir(parents=True, exist_ok=True)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                fn(spark, sf_dir).explain("formatted")
            (plans_dir / f"{name}_{tag}.txt").write_text(buf.getvalue())
        spark.sparkContext.setJobDescription(None)

    print(json.dumps({
        "metric": "bench_extra_sec",
        "sf_dir": sf_dir,
        "tries": tries,
        "queries": timings,
        "steal_frac": steals,
        "spin_probe_s": round(probe, 3),
        "cpus": int(cpus),
    }))


if __name__ == "__main__":
    main()
