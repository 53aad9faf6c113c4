"""Image -> H3 tile conversion (the raster_to_dataframe operator on Spark).

Each image row is one work unit inside mapInPandas (the reference tiles a
single raster across a rayon thread pool, h3ronpy/src/raster.rs:126-130;
here parallelism is across *rows/partitions*, which is what scales to
10^12 images on a cluster).  Output: one row per H3 cell whose centroid
falls in a non-nodata pixel: (image_id, cell, px_value, caption).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from ..sources.images import decode_image, georef_of_phash

TILES_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("cell", T.LongType(), False),
        T.StructField("px_value", T.IntegerType(), False),
        T.StructField("caption", T.StringType(), False),
    ]
)


def tile_images(images: DataFrame, res: int, nodata: int | None = 0) -> DataFrame:
    """images (input_hint schema) -> tiles at H3 `res`."""

    from ..sources.images import PIXEL_DEG

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..h3core.rasterh3 import rasters_to_cells_batch

        for b in batches:
            lat, lng = georef_of_phash(b["phash"].to_numpy(np.int64))
            blobs = b["bytes"].tolist()
            wcol = b["w"].to_numpy(np.int64)
            hcol = b["h"].to_numpy(np.int64)
            fmts = b["fmt"].tolist()
            bands = [
                decode_image(blobs[i], int(wcol[i]), int(hcol[i]), fmts[i])
                for i in range(len(b))
            ]
            tfs = np.zeros((len(b), 6))
            tfs[:, 0] = PIXEL_DEG
            tfs[:, 2] = lng
            tfs[:, 4] = -PIXEL_DEG
            tfs[:, 5] = lat
            img_idx, vals, cells = rasters_to_cells_batch(
                bands, tfs, res, nodata_value=nodata
            )
            ids = b["image_id"].to_numpy(dtype=object)
            caps = b["caption"].to_numpy(dtype=object)
            yield pd.DataFrame(
                {
                    "image_id": ids[img_idx],
                    "cell": cells,
                    "px_value": vals.astype(np.int32),
                    "caption": caps[img_idx],
                }
            )

    return images.mapInPandas(run, TILES_SCHEMA)
