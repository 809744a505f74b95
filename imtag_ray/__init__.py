"""imtag_ray — a Ray-Data-native link-graph analytics engine.

From-scratch re-expression of the capabilities of Steve132/imtag
(single-node C++ connected-components labeling over binary images,
see /root/reference) as a distributed engine over web-scale link
graphs: pages → link extraction → edge table → connected components /
PageRank / label propagation / triangle counting — all as
``ray.data.Dataset`` pipelines of ``map_batches`` over zero-copy
Arrow batches.

The mapping from the reference's abstractions (SURVEY.md §1.4):

- binary image (dense ``uint8*``)            → Parquet ``pages`` table
- run extraction (``compress_scanlines``,
  src/SegmentImageImpl_Scanline.cpp:40-96)   → HTML link/text extraction
  (stateful actor pools over Arrow batches)
- run table ``Segment{row,begin,end,label}`` → ``edges(src,dst)`` +
  ``vertices(vid,url)`` tables
- ``disjoint_set`` union-find
  (src/disjoint_set.hpp:30-138)              → hash-min label propagation
  (shuffle rounds / broadcast rounds)
- ``compressed_freeze`` canonical relabel
  (src/disjoint_set.hpp:73-96)               → canonical min-url dense
  relabeling
"""

__version__ = "0.1.0"
