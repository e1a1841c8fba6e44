"""Result-identity pinning for the two hydrology fixpoint arms.

The condensed arm (chain contraction by pointer doubling + the fixpoint
on the junction/head graph — see operators/raster.py) must be
result-identical to the level-synchronous arm on:

  * a junction-rich "comb" drainage (main channel + periodic
    tributaries — the shape where the condensed fixpoint's round count
    is junction depth, far below the path's cell count),
  * a zero-junction serpentine (one maximal unary chain — the pure
    chain-contraction edge case: the condensed graph is a single head),
  * the real DEM-derived flow field (both public keys, both arms).

Both synthetic fixtures are also checked against an independent
pure-Python D8 walker, so the two Spark arms can't be identically wrong.
"""

from __future__ import annotations

from collections import defaultdict

import pytest

from gdalos_spark.operators import raster

from conftest import SF_DIR

_STEP = {1: (1, 0), 2: (1, 1), 4: (0, 1), 8: (-1, 1),
         16: (-1, 0), 32: (-1, -1), 64: (0, -1), 128: (1, -1)}


def _ref_hydro(cells: dict) -> tuple[dict, dict]:
    """Independent single-node reference: walk every cell's path for
    accumulation landings; iterate the Strahler update to fixpoint."""
    children, parents = {}, defaultdict(list)
    for (x, y), d in cells.items():
        if d == 0:
            continue
        dx, dy = _STEP[d]
        nxt = (x + dx, y + dy)
        if nxt in cells:
            children[(x, y)] = nxt
            parents[nxt].append((x, y))
    acc = {c: 0 for c in cells}
    for c in cells:
        cur = c
        while cur in children:
            cur = children[cur]
            acc[cur] += 1
    ordv = {c: 1 for c in cells}
    changed = True
    while changed:
        changed = False
        for c in cells:
            ps = parents.get(c, [])
            if not ps:
                o = 1
            else:
                mx = max(ordv[p] for p in ps)
                k = sum(1 for p in ps if ordv[p] == mx)
                o = mx + 1 if k >= 2 else mx
            if o != ordv[c]:
                ordv[c] = o
                changed = True
    return acc, ordv


def _comb(width: int = 32, trib_every: int = 8, trib_len: int = 6) -> dict:
    """Main channel along y=0 flowing east; tributaries of trib_len
    cells flowing north into the channel every trib_every columns."""
    cells = {(x, 0): 1 for x in range(width)}
    for x in range(0, width, trib_every):
        for y in range(1, trib_len + 1):
            cells[(x, y)] = 64  # north
    return cells


def _serpentine(width: int = 8, rows: int = 4) -> dict:
    """One boustrophedon path covering rows*width cells — every cell
    has exactly one parent, so the condensed graph is a single head."""
    cells = {}
    for y in range(rows):
        for x in range(width):
            at_turn = x == (width - 1 if y % 2 == 0 else 0)
            cells[(x, y)] = 4 if at_turn else (1 if y % 2 == 0 else 16)
    return cells


def _run_arms(spark, monkeypatch, cells):
    fd = spark.createDataFrame(
        [(x, y, d) for (x, y), d in sorted(cells.items())],
        "px int, py int, flow_dir int",
    ).localCheckpoint()
    edges = raster._flow_parent_edges(fd)
    out = {}
    for arm in ("condensed", "levelsync"):
        monkeypatch.setenv("SPARK_GRAFT_HYDRO_ARM", arm)
        acc = {(r.px, r.py): r.acc for r in raster._flow_acc_on(fd, edges).collect()}
        acc_rounds = raster._HYDRO_LAST_ROUNDS[f"flow_acc {arm}"]
        ordv = {(r.px, r.py): r.ord for r in raster._strahler_on(fd, edges).collect()}
        ord_rounds = raster._HYDRO_LAST_ROUNDS[f"strahler {arm}"]
        out[arm] = (acc, ordv, acc_rounds, ord_rounds)
    return out


@pytest.mark.slow
def test_comb_arms_identical_and_exact(spark, monkeypatch):
    cells = _comb()
    res = _run_arms(spark, monkeypatch, cells)
    ref_acc, ref_ord = _ref_hydro(cells)
    assert res["condensed"][0] == ref_acc
    assert res["levelsync"][0] == ref_acc
    assert res["condensed"][1] == ref_ord
    assert res["levelsync"][1] == ref_ord
    # the condensation's point: rounds = junction depth (4 junctions +
    # convergence), not the 38-cell longest path
    assert res["condensed"][2] < res["levelsync"][2]
    assert res["condensed"][3] < res["levelsync"][3]
    assert res["condensed"][2] <= 8
    assert res["levelsync"][2] >= 30


@pytest.mark.slow
def test_serpentine_arms_identical_and_exact(spark, monkeypatch):
    cells = _serpentine()
    res = _run_arms(spark, monkeypatch, cells)
    ref_acc, ref_ord = _ref_hydro(cells)
    assert res["condensed"][0] == ref_acc
    assert res["levelsync"][0] == ref_acc
    assert res["condensed"][1] == ref_ord
    assert res["levelsync"][1] == ref_ord
    # a 32-cell unary chain: the condensed fixpoint sees one head node
    assert res["condensed"][2] <= 2
    assert res["levelsync"][2] >= 30
    assert max(ref_ord.values()) == 1  # no junctions -> all order 1


@pytest.mark.parametrize("key", ["raster_flow_accumulation", "raster_stream_order"])
def test_real_dem_arms_identical(spark, monkeypatch, key):
    import __spark_entry__ as entrymod

    fn = entrymod.queries()[key]
    monkeypatch.setenv("SPARK_GRAFT_HYDRO_ARM", "condensed")
    a = {tuple(r)[:2]: tuple(r)[2:] for r in fn(spark, SF_DIR).collect()}
    monkeypatch.setenv("SPARK_GRAFT_HYDRO_ARM", "levelsync")
    b = {tuple(r)[:2]: tuple(r)[2:] for r in fn(spark, SF_DIR).collect()}
    assert a == b
    assert len(a) > 0
