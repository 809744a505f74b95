"""The ``pages`` source (shape fixed by BASELINE.json input_hint).

Analogue of the reference's image load (stbi::Image,
test/deps/stb_image_library.cpp:12-30): raw external bytes → the
engine's native block format (Arrow).
"""

from __future__ import annotations

import pyarrow as pa
import ray.data

PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("ms")),
        ("html", pa.binary()),
        ("text", pa.large_string()),
        ("lang", pa.string()),
    ]
)

EDGES_SCHEMA = pa.schema([("src_url", pa.string()), ("dst_url", pa.string())])


def read_pages(paths, columns=None) -> "ray.data.Dataset":
    """Read a pages Parquet table, pruning to the requested columns at the
    read (row-group/column pushdown; never load ``html`` for a stage that
    only needs ``url``)."""
    return ray.data.read_parquet(paths, columns=columns)
