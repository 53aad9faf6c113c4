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

from ..sources.images import decode_image, georef_of_phash, transform_of

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

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..h3core.rasterh3 import raster_to_cells

        for b in batches:
            out_img, out_cell, out_val, out_cap = [], [], [], []
            lat, lng = georef_of_phash(b["phash"].to_numpy(np.int64))
            for idx in range(len(b)):
                row = b.iloc[idx]
                band = decode_image(row["bytes"], row["w"], row["h"], row["fmt"])
                tf = transform_of(float(lat[idx]), float(lng[idx]))
                vals, cells = raster_to_cells(
                    band, tf, res, nodata_value=nodata
                )
                if cells.size:
                    out_img.append(
                        np.repeat(np.array([row["image_id"]], dtype=object), cells.size)
                    )
                    out_cell.append(cells)
                    out_val.append(vals.astype(np.int32))
                    out_cap.append(
                        np.repeat(np.array([row["caption"]], dtype=object), cells.size)
                    )
            if out_img:
                yield pd.DataFrame(
                    {
                        "image_id": np.concatenate(out_img),
                        "cell": np.concatenate(out_cell),
                        "px_value": np.concatenate(out_val),
                        "caption": np.concatenate(out_cap),
                    }
                )

    return images.mapInPandas(run, TILES_SCHEMA)
