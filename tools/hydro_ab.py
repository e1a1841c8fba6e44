"""A/B the hydrology fixpoint arms on a long-flow-path drainage.

The level-synchronous arm schedules one Spark job per flow-path CELL;
the condensed arm contracts unary chains (pointer doubling) and runs
the fixpoint at junction depth. This tool builds a comb drainage whose
longest path is `width + trib_len` cells (default 319 — the regime
where today's naive loops would run 300+ scheduled jobs) and times both
arms of both operators, printing one JSON line per (op, arm) for
BASELINE.md.

Usage: python tools/hydro_ab.py [--width 256] [--trib-every 16] [--trib-len 64]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession


def comb(width: int, trib_every: int, trib_len: int) -> list[tuple[int, int, int]]:
    cells = [(x, 0, 1) for x in range(width)]
    for x in range(0, width, trib_every):
        cells += [(x, y, 64) for y in range(1, trib_len + 1)]
    return cells


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=256)
    ap.add_argument("--trib-every", type=int, default=16)
    ap.add_argument("--trib-len", type=int, default=64)
    args = ap.parse_args()

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from gdalos_spark.operators import raster

    cells = comb(args.width, args.trib_every, args.trib_len)
    longest = args.width + args.trib_len
    # the naive arm legitimately blows the production fail-loud round
    # caps at this path length (that is the point of the A/B) — lift
    # them here so it can finish and be timed
    raster._FLOW_ACC_MAX_ROUNDS = max(raster._FLOW_ACC_MAX_ROUNDS, longest + 8)
    raster._STRAHLER_ROUNDS = max(raster._STRAHLER_ROUNDS, longest + 8)
    fd = spark.createDataFrame(cells, "px int, py int, flow_dir int").localCheckpoint()
    edges = raster._flow_parent_edges(fd)

    for op, fn, label in (
        ("flow_acc", raster._flow_acc_on, "flow_acc"),
        ("strahler", raster._strahler_on, "strahler"),
    ):
        for arm in ("levelsync", "condensed"):
            os.environ["SPARK_GRAFT_HYDRO_ARM"] = arm
            t0 = time.time()
            n = fn(fd, edges).count()
            wall = round(time.time() - t0, 2)
            rounds = raster._HYDRO_LAST_ROUNDS[f"{label} {arm}"]
            contract = raster._HYDRO_LAST_ROUNDS.get("contract") if arm == "condensed" else None
            print(json.dumps({
                "op": op, "arm": arm, "cells": len(cells),
                "longest_path": longest, "fixpoint_rounds": rounds,
                "contract_rounds": contract, "wall_s": wall, "rows": n,
            }))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
