"""gdalos_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of talos-gis/gdalos (raster batch processing:
translate/warp/crop, overviews, raster algebra, combine, scale, color
relief, viewshed/LOS, rasterize, xyz export, mosaic), re-expressed as
declarative DataFrame plans, plus LLM-training-data operators (dedup,
similarity search, multimodal columns, text analysis).

Reference parity citations are in each operator's docstring
(e.g. ``/root/reference/src/gdalos/calc/gdalos_combine.py:31``).
"""

from gdalos_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
