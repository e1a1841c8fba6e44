"""Paired interleaved A/B of the two rasterize burn plans at a given
grid height — the VERDICT-r09 item 5 + 8 protocol. Arms alternate
(bbox, scanline, bbox, scanline, ...) inside one session so host drift
hits both equally; result counts must match across every run.

Usage: python tools/rasterize_ab.py H [W] [N_SUPPLIERS] [N_PAIRS]

Prints one JSON line: per-run walls, per-arm medians, ratio, and the
burned-cell total (identical across arms or the run is void).
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> int:
    H = int(sys.argv[1])
    W = int(sys.argv[2]) if len(sys.argv) > 2 else H
    n_sup = int(sys.argv[3]) if len(sys.argv) > 3 else 100_000
    n_pairs = int(sys.argv[4]) if len(sys.argv) > 4 else 2
    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "32g"))
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    from gdalos_spark.sources import vector as V

    sup = spark.range(n_sup).select(
        F.col("id").alias("s_suppkey"),
        (F.col("id") % 25).cast("int").alias("s_nationkey"),
    )
    edges, fbbox = V._ring_edges_bbox(sup, W, H)
    edges = edges.persist()
    fbbox = fbbox.persist()
    edges.count(), fbbox.count()
    cells = spark.range(H * W).select(
        (F.col("id") % W).cast("int").alias("px"),
        (F.col("id") / W).cast("int").alias("py"),
        ((F.col("id") % W).cast("double") + 0.5).alias("cx"),
        ((F.col("id") / W).cast("int").cast("double") + 0.5).alias("cy"),
    )

    runs: list[dict] = []

    def run(arm: str) -> None:
        t0 = time.time()
        out = V._burn_report(
            V._burn_crossings(cells, edges, fbbox, scanline=(arm == "scanline"))
        )
        total = out.agg(
            F.sum("n_cells").alias("s"), F.count(F.lit(1)).alias("f")
        ).first()
        runs.append(
            {
                "arm": arm,
                "wall_s": round(time.time() - t0, 2),
                "cells": int(total.s or 0),
                "features": int(total.f),
            }
        )

    for _ in range(n_pairs):
        run("bbox")
        run("scanline")

    med = lambda xs: sorted(xs)[len(xs) // 2]  # noqa: E731
    bbox = [r["wall_s"] for r in runs if r["arm"] == "bbox"]
    scan = [r["wall_s"] for r in runs if r["arm"] == "scanline"]
    cells_seen = {(r["cells"], r["features"]) for r in runs}
    print(
        json.dumps(
            {
                "grid": [H, W],
                "n_suppliers": n_sup,
                "runs": runs,
                "bbox_med_s": med(bbox),
                "scanline_med_s": med(scan),
                "ratio_scanline_over_bbox": round(med(scan) / med(bbox), 3),
                "results_identical": len(cells_seen) == 1,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
