"""Per-query optimization profiler (r12): for each named query, in a
FRESH subprocess/JVM, capture `.explain("formatted")` to a plans file
and time cold/warm noop-sink runs — the measure-first loop of the
optimization guide (§1.4/§7.2) without dragging the whole bench along.

Usage:
    python tools/profile_query.py name1 [name2 ...] [--sf 0.1]
        [--out plans/r12] [--suffix before] [--runs 2]

Writes <out>/<name>_<suffix>.txt and prints one timing line per query.
"""

from __future__ import annotations

import os
import subprocess
import sys
from pathlib import Path

_REPO_ROOT = str(Path(__file__).resolve().parent.parent)


def profile_one(name: str, sf_dir: str, out_path: str, runs: int, cpus: str) -> str:
    code = f"""
import sys, time, os
sys.path.insert(0, {_REPO_ROOT!r})
os.environ["SPARK_GRAFT_CPUS"] = {cpus!r}
from datatransformertools_spark import get_spark, registry
from datatransformertools_spark.caching import release_caches
spark = get_spark("dtt-profile")
spark.sparkContext.setLogLevel("ERROR")
q = registry.queries()[{name!r}]
# pay session/scan init with a trivial plan (same as bench --isolate)
spark.read.parquet({sf_dir!r} + "/nation.parquet").write.format("noop").mode("overwrite").save()
df = q(spark, {sf_dir!r})
import io, contextlib
buf = io.StringIO()
with contextlib.redirect_stdout(buf):
    df.explain("formatted")
open({out_path!r}, "w").write(buf.getvalue())
release_caches()
tags = ["cold", "warm", "warm2", "warm3", "warm4"][:{runs}]
for tag in tags:
    t0 = time.perf_counter()
    q(spark, {sf_dir!r}).write.format("noop").mode("overwrite").save()
    print("SEC_" + tag, round(time.perf_counter() - t0, 3))
    release_caches()
"""
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=1800
    )
    times = [
        line.split()[0].removeprefix("SEC_") + "=" + line.split()[1]
        for line in out.stdout.splitlines()
        if line.startswith("SEC_")
    ]
    if not times:
        return f"{name}: FAILED\n{out.stderr[-1500:]}"
    return f"{name}: " + " ".join(times)


def main() -> None:
    argv = sys.argv[1:]

    def opt(flag: str, default: str) -> str:
        if flag in argv:
            i = argv.index(flag)
            val = argv[i + 1]
            del argv[i : i + 2]
            return val
        return default

    sf = opt("--sf", "0.1")
    out_dir = opt("--out", "plans/r12")
    suffix = opt("--suffix", "before")
    runs = int(opt("--runs", "2"))
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf_dir = f"/root/testdata/sf{sf}"
    Path(out_dir).mkdir(parents=True, exist_ok=True)
    for name in argv:
        out_path = str(Path(out_dir) / f"{name}_{suffix}.txt")
        print(profile_one(name, sf_dir, out_path, runs, cpus), flush=True)


if __name__ == "__main__":
    main()
