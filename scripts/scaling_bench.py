"""Scaling-efficiency evidence: the identical extraction job at two local
parallelism levels (the sandbox stand-in for N vs 4N executors, per
BASELINE.md protocol).

Runs scripts/run_pipeline.py via ``spark-submit --py-files`` (the
north_rule packaging path) at local[N] and local[4N] over the same
synthetic corpus, reports docs/sec at both and
efficiency = R_4N / (4 * R_N); writes BENCH/BASELINE.md.

Usage: python scripts/scaling_bench.py [--n 8] [--pages 40000]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build_pyfiles() -> str:
    zpath = os.path.join(tempfile.mkdtemp(prefix="pyfiles_"), "otspark.zip")
    with zipfile.ZipFile(zpath, "w") as zf:
        pkg = os.path.join(REPO, "ocr_translate_spark")
        for root, _dirs, files in os.walk(pkg):
            for fn in files:
                if fn.endswith(".py"):
                    full = os.path.join(root, fn)
                    zf.write(full, os.path.relpath(full, REPO))
    return zpath


def run_once(cpus: int, pages: int, pyfiles: str) -> dict:
    wh = tempfile.mkdtemp(prefix=f"scale_wh_{cpus}_")
    cmd = [
        "spark-submit",
        "--master", f"local[{cpus}]",
        "--conf", "spark.ui.enabled=false",
        "--conf", f"spark.sql.shuffle.partitions={cpus}",
        "--conf", "spark.sql.execution.arrow.maxRecordsPerBatch=256",
        "--driver-memory", "32g",
        "--py-files", pyfiles,
        os.path.join(REPO, "scripts", "run_pipeline.py"),
        "--pages", f"synthetic:{pages}",
        "--warehouse", wh,
        "--repartition", str(cpus * 4),
        "--cpus", str(cpus),
    ]
    out = subprocess.run(cmd, capture_output=True, text=True, check=True)
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8)
    ap.add_argument("--pages", type=int, default=40000)
    args = ap.parse_args()

    pyfiles = build_pyfiles()
    lo = run_once(args.n, args.pages, pyfiles)
    hi = run_once(args.n * 4, args.pages, pyfiles)
    r_lo = lo["docs_per_sec"]
    r_hi = hi["docs_per_sec"]
    eff = r_hi / (4 * r_lo)

    result = {
        "pages": args.pages,
        "n_cores": args.n,
        "docs_per_sec_N": r_lo,
        "docs_per_sec_4N": r_hi,
        "wall_sec_N": lo["wall_sec"],
        "wall_sec_4N": hi["wall_sec"],
        "scaling_efficiency": round(eff, 3),
        "target": 0.8,
        "pass": eff >= 0.8,
    }
    print(json.dumps(result))

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w", encoding="utf-8") as fh:
        fh.write(f"""# BENCH/BASELINE — scaling evidence

Protocol (BASELINE.md): identical extraction job, identical input
({args.pages} synthetic Common-Crawl-style pages, all 11 page classes,
giant-page skew, salted url-hash repartition at 4x cores), launched via
`spark-submit --py-files` at two local parallelism levels.

| parallelism | wall (s) | docs/sec |
|---|---|---|
| local[{args.n}] (N) | {lo['wall_sec']} | {r_lo} |
| local[{args.n * 4}] (4N) | {hi['wall_sec']} | {r_hi} |

**Scaling efficiency** = R_4N / (4 * R_N) = {r_hi} / (4 x {r_lo}) =
**{eff:.3f}** (target >= 0.8: {"PASS" if eff >= 0.8 else "FAIL"}).

Reproduce: `python scripts/scaling_bench.py --n {args.n} --pages {args.pages}`
""")
    return 0 if eff >= 0.8 else 1


if __name__ == "__main__":
    sys.exit(main())
