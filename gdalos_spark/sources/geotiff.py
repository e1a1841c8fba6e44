"""GeoTIFF ingest — the reference's daily-bread input format, pure stdlib.

The reference opens GeoTIFF/COG datasets for every job
(/root/reference/src/gdalos/gdalos_util.py open_ds,
/root/reference/src/gdalos/gdalos_trans.py:91 and :328 — the COG
two-step write with tiled layout + overviews). This module closes that
surface gap for the Spark engine: a real little-endian TIFF 6.0 /
GeoTIFF 1.1 codec built on struct + zlib + numpy only (no GDAL/PIL in
the container), wired into the engine the Spark-first way:

- ENCODE: one GeoTIFF per scene via ``applyInPandas`` over the scene
  key — each group becomes a tiled (16x16), deflate-compressed, int32
  single-band GeoTIFF with ModelPixelScaleTag / ModelTiepointTag /
  GeoKeyDirectoryTag (EPSG:4326), nodata-filled where the grid has
  holes. The payload never shuffles again after the one groupBy.
- DECODE: ``mapInPandas`` walks the IFD (both TILED and STRIPPED
  layouts, compression none/deflate), inflates, and reconstructs
  GLOBAL pixel coordinates purely from the embedded geotransform —
  nothing rides out-of-band, exactly like opening a foreign COG.
- The round trip is LOSSLESS (int32 cents through int32 samples), so
  ``raster_ingest_tiff`` is fully oracle-gated: DuckDB recomputes the
  same pixels + geo math straight from lineitem.

Scale shape: scenes are the unit of parallelism (a 100-TB archive is
millions of scenes — one binary row each, partitioned by scene id);
pixel rows only exist AFTER the Arrow-batched decode, already spread
across executors, and feed ``sources/tiled.write_tiled`` for the
tile-pruned layout every raster operator reads.
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gdalos_spark.datamodel import DEM_GRID_SQL, GRID_W, dem_grid

# scene / geo layout: 2x2 quadrant scenes over the 64x64 DEM grid,
# 0.5-degree pixels anchored at (-180, 60) north-up — every lon/lat is
# an exact binary double, so geo math is bit-identical across engines
SCENE = 32
TILE_W = 16
TILE_H = 16
LON0, LAT0 = -180.0, 60.0
PIX = 0.5
NODATA = -(2**31)

# TIFF tag ids
_T_WIDTH, _T_HEIGHT, _T_BPS, _T_COMPRESSION, _T_PHOTOMETRIC = 256, 257, 258, 259, 262
_T_STRIP_OFFSETS, _T_SPP, _T_ROWS_PER_STRIP, _T_STRIP_COUNTS = 273, 277, 278, 279
_T_TILE_W, _T_TILE_H, _T_TILE_OFFSETS, _T_TILE_COUNTS = 322, 323, 324, 325
_T_SAMPLE_FORMAT = 339
_T_MODEL_SCALE, _T_MODEL_TIEPOINT, _T_GEOKEYS = 33550, 33922, 34735
_COMP_NONE, _COMP_DEFLATE = 1, 8


_GEOKEYS_4326 = struct.pack(
    "<16H",
    1, 1, 0, 3,          # version, rev 1.0, 3 keys follow
    1024, 0, 1, 2,       # GTModelTypeGeoKey = 2 (geographic)
    1025, 0, 1, 1,       # GTRasterTypeGeoKey = 1 (PixelIsArea)
    2048, 0, 1, 4326,    # GeographicTypeGeoKey
)


def _geo_externs(origin_lon: float, origin_lat: float) -> dict[int, bytes]:
    return {
        _T_MODEL_SCALE: struct.pack("<3d", PIX, PIX, 0.0),
        _T_MODEL_TIEPOINT: struct.pack(
            "<6d", 0.0, 0.0, 0.0, origin_lon, origin_lat, 0.0
        ),
        _T_GEOKEYS: _GEOKEYS_4326,
    }


def _assemble_tiff(entries, extern_vals, blocks, offsets_tag, counts_tag) -> bytes:
    """Shared TIFF assembly for BOTH writers (tiled and stripped):
    header + IFD + out-of-line values + data blocks, with the
    offsets/counts arrays patched in. `entries` rows are
    (tag, type, count, inline-value-or-None); None values resolve to
    the extern slot of that tag or the block offset/count arrays.
    One implementation means an alignment or offset-patching fix can
    never diverge between the two layouts."""
    n = len(entries)
    ifd_off = 8
    ext_off = ifd_off + 2 + n * 12 + 4  # out-of-line values start here
    ext = bytearray()

    def extern(data: bytes) -> int:
        off = ext_off + len(ext)
        ext.extend(data)
        if len(ext) % 2:  # TIFF values are word-aligned
            ext.append(0)
        return off

    nb = len(blocks)
    off_slot = extern(b"\0" * (4 * nb)) if nb > 1 else None
    cnt_slot = extern(b"\0" * (4 * nb)) if nb > 1 else None
    slots = {tag: extern(v) for tag, v in extern_vals.items()}

    data_off = ext_off + len(ext)
    offsets, counts, body = [], [], bytearray()
    for p in blocks:
        offsets.append(data_off + len(body))
        counts.append(len(p))
        body.extend(p)
        if len(body) % 2:
            body.append(0)
    if nb > 1:
        ext[off_slot - ext_off : off_slot - ext_off + 4 * nb] = struct.pack(
            f"<{nb}I", *offsets
        )
        ext[cnt_slot - ext_off : cnt_slot - ext_off + 4 * nb] = struct.pack(
            f"<{nb}I", *counts
        )
    inline = dict(slots)
    inline[offsets_tag] = offsets[0] if nb == 1 else off_slot
    inline[counts_tag] = counts[0] if nb == 1 else cnt_slot

    out = bytearray(struct.pack("<2sHI", b"II", 42, ifd_off))
    out.extend(struct.pack("<H", n))
    for tag, typ, count, val in entries:
        if val is None:
            val = inline[tag]
        out.extend(struct.pack("<HHII", tag, typ, count, val))
    out.extend(struct.pack("<I", 0))  # no next IFD
    out.extend(ext)
    out.extend(body)
    return bytes(out)


def _encode_geotiff(grid, origin_lon: float, origin_lat: float) -> bytes:
    """Encode an int32 numpy grid (h, w) as a tiled deflate GeoTIFF.

    Layout mirrors the reference's COG profile (gdalos_trans.py:328
    'COG' driver: tiled + compressed): 16x16 tiles, DEFLATE, one
    int32 band, geotransform via pixel-scale + tiepoint. Raises on
    values outside int32 (or colliding with the NODATA sentinel) —
    silent numpy wrapping would corrupt pixels undetectably.
    """
    import numpy as np

    h, w = grid.shape
    g64 = np.asarray(grid, dtype="int64")
    if ((g64 != NODATA) & ((g64 <= NODATA) | (g64 > 2**31 - 1))).any():
        raise OverflowError(
            "pixel value outside int32 (or equal to the NODATA sentinel); "
            "use a wider sample format for this band"
        )
    tiles_x = -(-w // TILE_W)
    tiles_y = -(-h // TILE_H)
    payloads = []
    for ty in range(tiles_y):
        for tx in range(tiles_x):
            tile = np.full((TILE_H, TILE_W), NODATA, dtype="<i4")
            block = grid[ty * TILE_H : (ty + 1) * TILE_H, tx * TILE_W : (tx + 1) * TILE_W]
            tile[: block.shape[0], : block.shape[1]] = block
            payloads.append(zlib.compress(tile.tobytes(), 6))

    entries = [
        (_T_WIDTH, 3, 1, w),
        (_T_HEIGHT, 3, 1, h),
        (_T_BPS, 3, 1, 32),
        (_T_COMPRESSION, 3, 1, _COMP_DEFLATE),
        (_T_PHOTOMETRIC, 3, 1, 1),  # BlackIsZero
        (_T_SPP, 3, 1, 1),
        (_T_TILE_W, 3, 1, TILE_W),
        (_T_TILE_H, 3, 1, TILE_H),
        (_T_TILE_OFFSETS, 4, len(payloads), None),
        (_T_TILE_COUNTS, 4, len(payloads), None),
        (_T_SAMPLE_FORMAT, 3, 1, 2),  # signed integer
        (_T_MODEL_SCALE, 12, 3, None),
        (_T_MODEL_TIEPOINT, 12, 6, None),
        (_T_GEOKEYS, 3, len(_GEOKEYS_4326) // 2, None),
    ]
    return _assemble_tiff(
        entries, _geo_externs(origin_lon, origin_lat), payloads,
        _T_TILE_OFFSETS, _T_TILE_COUNTS,
    )


_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 12: 8}
_TYPE_FMT = {1: "B", 3: "H", 4: "I", 12: "d"}


def _read_ifd(buf: bytes) -> dict[int, tuple]:
    """Walk the first IFD of a little-endian TIFF; returns tag -> values
    tuple. Supports BYTE/SHORT/LONG/DOUBLE — the types a GeoTIFF raster
    directory uses."""
    magic, version, ifd_off = struct.unpack_from("<2sHI", buf, 0)
    if magic != b"II" or version != 42:
        raise ValueError("not a little-endian TIFF 6.0 stream")
    (n,) = struct.unpack_from("<H", buf, ifd_off)
    tags: dict[int, tuple] = {}
    for i in range(n):
        tag, typ, count, raw = struct.unpack_from("<HHII", buf, ifd_off + 2 + i * 12)
        if typ not in _TYPE_SIZE:
            continue
        size = _TYPE_SIZE[typ] * count
        off = ifd_off + 2 + i * 12 + 8 if size <= 4 else raw
        if typ == 2:
            tags[tag] = (buf[off : off + count].split(b"\0")[0].decode("ascii"),)
        else:
            tags[tag] = struct.unpack_from(f"<{count}{_TYPE_FMT[typ]}", buf, off)
    return tags


def _decode_geotiff(payload: bytes):
    """Parse one single-band int32 GeoTIFF (tiled OR stripped,
    compression none/deflate) into (pixel array (h, w) int32,
    (origin_lon, origin_lat, pix_x, pix_y), epsg)."""
    import numpy as np

    tags = _read_ifd(payload)
    w, h = tags[_T_WIDTH][0], tags[_T_HEIGHT][0]
    comp = tags.get(_T_COMPRESSION, (_COMP_NONE,))[0]
    bps = tags.get(_T_BPS, (32,))[0]
    fmt = tags.get(_T_SAMPLE_FORMAT, (1,))[0]
    if bps != 32 or fmt != 2:
        raise ValueError(f"unsupported sample layout bits={bps} fmt={fmt}")
    if comp not in (_COMP_NONE, _COMP_DEFLATE):
        raise ValueError(f"unsupported compression {comp}")

    def blocks(offsets, counts):
        for off, cnt in zip(offsets, counts):
            raw = payload[off : off + cnt]
            yield zlib.decompress(raw) if comp == _COMP_DEFLATE else raw

    grid = np.full((h, w), NODATA, dtype="<i4")
    if _T_TILE_OFFSETS in tags:
        tw, th = tags[_T_TILE_W][0], tags[_T_TILE_H][0]
        tiles_x = -(-w // tw)
        for i, raw in enumerate(blocks(tags[_T_TILE_OFFSETS], tags[_T_TILE_COUNTS])):
            ty, tx = divmod(i, tiles_x)
            tile = np.frombuffer(raw, dtype="<i4").reshape(th, tw)
            oy, ox = ty * th, tx * tw
            grid[oy : oy + th, ox : ox + tw] = tile[
                : max(0, min(th, h - oy)), : max(0, min(tw, w - ox))
            ]
    elif _T_STRIP_OFFSETS in tags:
        rps = tags.get(_T_ROWS_PER_STRIP, (h,))[0]
        row = 0
        for raw in blocks(tags[_T_STRIP_OFFSETS], tags[_T_STRIP_COUNTS]):
            rows = min(rps, h - row)
            grid[row : row + rows] = np.frombuffer(raw, dtype="<i4").reshape(rows, w)
            row += rows
    else:
        raise ValueError("TIFF has neither tile nor strip offsets")

    sx, sy = tags[_T_MODEL_SCALE][0], tags[_T_MODEL_SCALE][1]
    tie = tags[_T_MODEL_TIEPOINT]
    # tiepoint maps raster (i, j) -> model (x, y); origin = model coords
    # of raster (0, 0)
    origin_lon = tie[3] - tie[0] * sx
    origin_lat = tie[4] + tie[1] * sy
    geokeys = tags.get(_T_GEOKEYS, ())
    epsg = 0
    for k in range(4, len(geokeys), 4):
        if geokeys[k] == 2048:
            epsg = geokeys[k + 3]
    return grid, (origin_lon, origin_lat, sx, sy), epsg


def _encode_strip_geotiff(grid, origin_lon: float, origin_lat: float) -> bytes:
    """Uncompressed STRIPPED variant (RowsPerStrip = 8) — the layout a
    plain `gdal_translate` (non-COG) writes; exercises the decoder's
    strip path in tests. Shares _assemble_tiff with the tiled writer."""
    h, w = grid.shape
    rps = 8
    strips = [grid[r : r + rps].astype("<i4").tobytes() for r in range(0, h, rps)]
    entries = [
        (_T_WIDTH, 3, 1, w),
        (_T_HEIGHT, 3, 1, h),
        (_T_BPS, 3, 1, 32),
        (_T_COMPRESSION, 3, 1, _COMP_NONE),
        (_T_PHOTOMETRIC, 3, 1, 1),
        (_T_STRIP_OFFSETS, 4, len(strips), None),
        (_T_SPP, 3, 1, 1),
        (_T_ROWS_PER_STRIP, 3, 1, rps),
        (_T_STRIP_COUNTS, 4, len(strips), None),
        (_T_SAMPLE_FORMAT, 3, 1, 2),
        (_T_MODEL_SCALE, 12, 3, None),
        (_T_MODEL_TIEPOINT, 12, 6, None),
        (_T_GEOKEYS, 3, len(_GEOKEYS_4326) // 2, None),
    ]
    return _assemble_tiff(
        entries, _geo_externs(origin_lon, origin_lat), strips,
        _T_STRIP_OFFSETS, _T_STRIP_COUNTS,
    )


def scene_tiffs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(scene_id, payload) — the DEM grid's four 32x32 quadrant scenes,
    each a real tiled/deflate GeoTIFF byte stream. One groupBy shuffle;
    at archive scale this is the parquet scene manifest itself."""
    g = dem_grid(spark, sf_dir).select(
        "px",
        "py",
        (F.col("elev") * 100).cast("long").alias("elev_cents"),
        ((F.col("py") / SCENE).cast("int") * (GRID_W // SCENE)
         + (F.col("px") / SCENE).cast("int")).alias("scene_id"),
    )

    def encode(pdf):
        import numpy as np
        import pandas as pd

        sid = int(pdf["scene_id"].iloc[0])
        sy, sx = divmod(sid, GRID_W // SCENE)
        ox, oy = sx * SCENE, sy * SCENE
        # int64 until _encode_geotiff's range check has run — a direct
        # int32 assignment would wrap silently on overflow
        grid = np.full((SCENE, SCENE), NODATA, dtype="int64")
        grid[pdf["py"].to_numpy() - oy, pdf["px"].to_numpy() - ox] = pdf[
            "elev_cents"
        ].to_numpy()
        payload = _encode_geotiff(grid, LON0 + ox * PIX, LAT0 - oy * PIX)
        return pd.DataFrame({"scene_id": [sid], "payload": [payload]})

    return g.groupBy("scene_id").applyInPandas(
        encode, schema="scene_id int, payload binary"
    )


def raster_ingest_tiff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Open GeoTIFF scenes the way the reference opens datasets
    (gdalos_util.py open_ds -> gdal block reads): parse the IFD, inflate
    the tiles, and reconstruct GLOBAL pixel+geo coordinates from the
    embedded ModelPixelScale/ModelTiepoint alone. The encode side runs
    first in the same plan (real bytes in, real bytes out), and because
    int32 cents survive the trip losslessly the whole operator is
    oracle-gated — DuckDB recomputes every output row from lineitem.

    Output: (scene_id, px, py, lon, lat, elev_cents, epsg)."""
    scenes = scene_tiffs(spark, sf_dir)

    def decode(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            frames = []
            for sid, payload in zip(pdf["scene_id"], pdf["payload"]):
                grid, (olon, olat, sx, sy), epsg = _decode_geotiff(bytes(payload))
                gx0 = round((olon - LON0) / PIX)
                gy0 = round((LAT0 - olat) / PIX)
                ys, xs = np.nonzero(grid != NODATA)
                frames.append(
                    pd.DataFrame(
                        {
                            "scene_id": np.full(len(xs), sid, dtype="int32"),
                            "px": (gx0 + xs).astype("int32"),
                            "py": (gy0 + ys).astype("int32"),
                            "lon": olon + xs * sx,
                            "lat": olat - ys * sy,
                            "elev_cents": grid[ys, xs].astype("int64"),
                            "epsg": np.full(len(xs), epsg, dtype="int32"),
                        }
                    )
                )
            if frames:
                yield pd.concat(frames, ignore_index=True)

    return scenes.mapInPandas(
        decode,
        schema="scene_id int, px int, py int, lon double, lat double, "
        "elev_cents bigint, epsg int",
    )


def ingest_tiff_to_tiled(spark: SparkSession, sf_dir: str, path: str) -> None:
    """End of the ingest pipeline: decoded GeoTIFF pixels land in the
    tile-partitioned parquet layout every raster operator scans
    (sources/tiled.py; reference two-step COG write at
    gdalos_trans.py:328)."""
    from gdalos_spark.sources import tiled

    px = raster_ingest_tiff(spark, sf_dir).withColumnRenamed("elev_cents", "elev")
    tiled.write_tiled(px.select("px", "py", "elev"), path)


RASTER_INGEST_TIFF_SQL = f"""
WITH dem AS ({DEM_GRID_SQL})
SELECT CAST((py // {SCENE}) * {GRID_W // SCENE} + (px // {SCENE}) AS INTEGER) AS scene_id,
       px, py,
       CAST({LON0} + px * {PIX} AS DOUBLE) AS lon,
       CAST({LAT0} - py * {PIX} AS DOUBLE) AS lat,
       CAST(elev * 100 AS BIGINT) AS elev_cents,
       4326 AS epsg
FROM dem
"""
