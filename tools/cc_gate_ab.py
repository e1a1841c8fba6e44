"""Paired same-process A/B of dedup_clusters' two CC arms at a given
documents-only upscale — the VERDICT-r09 items 4 + 8 protocol: arms run
INTERLEAVED (A B A B ...) inside ONE session so host-band drift hits
both arms equally and the within-session ratio is self-adjudicating.

Usage: python tools/cc_gate_ab.py SF_DIR [N_PAIRS]

Prints one JSON line with per-run walls, per-arm medians, rows (must
match across arms), and the ratio.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession


def main() -> int:
    sf_dir = sys.argv[1]
    n_pairs = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "80g"))
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.files.maxPartitionBytes", str(64 * 1024 * 1024))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    from gdalos_spark.operators import dedup

    runs: list[dict] = []

    def run(arm: str) -> None:
        # force the arm through the gate constant; restore after
        orig = dedup.TWO_PHASE_MIN_DOCS
        dedup.TWO_PHASE_MIN_DOCS = 0 if arm == "two_phase" else 1 << 60
        try:
            t0 = time.time()
            n = dedup.dedup_clusters(spark, sf_dir).count()
            runs.append({"arm": arm, "wall_s": round(time.time() - t0, 1), "rows": n})
            dedup.release_collapse_caches()
            from gdalos_spark.datamodel import release_query_caches

            release_query_caches()
            spark.catalog.clearCache()
        finally:
            dedup.TWO_PHASE_MIN_DOCS = orig

    # one discarded warmup (JIT/codegen/scan-cache transients hit the
    # first run of a session hardest), then interleaved pairs
    run("warmup_single")
    runs.clear()
    for _ in range(n_pairs):
        run("single")
        run("two_phase")

    med = lambda xs: sorted(xs)[(len(xs) - 1) // 2]  # noqa: E731
    singles = [r["wall_s"] for r in runs if r["arm"] == "single"]
    twos = [r["wall_s"] for r in runs if r["arm"] == "two_phase"]
    rows = {r["rows"] for r in runs}
    pair_ratios = [round(t / s, 3) for s, t in zip(singles, twos)]
    out = {
        "sf_dir": sf_dir,
        "runs": runs,
        "single_min_s": min(singles),
        "two_phase_min_s": min(twos),
        "pair_ratios_two_over_single": pair_ratios,
        "ratio_med_of_pairs": med(pair_ratios),
        "rows_consistent": len(rows) == 1,
        "rows": sorted(rows),
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
