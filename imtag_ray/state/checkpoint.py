"""Per-iteration checkpointing with lineage manifests (SURVEY.md §4.1).

The reference has no checkpointing (single-process, in-RAM); the
closest analogue is ``freeze()`` snapshotting the union-find state
(src/disjoint_set.hpp:66-71). Here every iteration of an iterative
algorithm can persist its full vertex state as partitioned Parquet:

    <root>/<algorithm>/iter=K/part-000.parquet ... part-(P-1).parquet
    <root>/<algorithm>/iter=K/_manifest.json

Writes are atomic at iteration granularity: parts land in a temp dir
that is renamed into place, and ``_manifest.json`` is written LAST —
a directory without a manifest is incomplete and ignored on resume.
The manifest records lineage: iteration, partition count, the input
fingerprint (so a checkpoint is never resumed onto different data),
the parent iteration path, engine version, and convergence metrics.
"""

from __future__ import annotations

import json
import os
import re
import shutil
import uuid

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .. import __version__

MANIFEST = "_manifest.json"
_ITER_DIR_RE = re.compile(r"^iter=\d{5}$")


def graph_fingerprint(graph) -> str:
    """Cheap order-insensitive fingerprint of a Graph: vertex/edge counts
    plus column checksums (one tiny aggregate pass, no driver data)."""
    from ray.data.aggregate import Sum

    agg = graph.edges.aggregate(
        Sum("src", alias_name="s"), Sum("dst", alias_name="d")
    )
    return f"v{graph.num_vertices}-e{graph.num_edges}-s{agg['s']}-d{agg['d']}"


class CheckpointManager:
    def __init__(self, root: str, algorithm: str, input_fingerprint: str,
                 num_partitions: int = 8):
        self.dir = os.path.join(root, algorithm)
        self.fingerprint = input_fingerprint
        self.num_partitions = num_partitions
        os.makedirs(self.dir, exist_ok=True)
        # GC orphaned temp dirs from a crash between part/manifest write
        # and the atomic rename — they may contain a manifest and must
        # never be picked up by latest().
        for name in os.listdir(self.dir):
            if ".tmp-" in name:
                shutil.rmtree(os.path.join(self.dir, name), ignore_errors=True)

    def _iter_dir(self, iteration: int) -> str:
        return os.path.join(self.dir, f"iter={iteration:05d}")

    # -- write --------------------------------------------------------------

    def write_arrays(self, iteration: int, arrays: dict[str, np.ndarray],
                     metrics: dict | None = None) -> str:
        """Checkpoint broadcast-mode vertex state (equal-length arrays
        indexed by vid). Split into num_partitions row ranges — at
        cluster scale each partition is written by its owning task; the
        manifest-last protocol is what makes that safe."""
        final = self._iter_dir(iteration)
        tmp = final + f".tmp-{uuid.uuid4().hex[:8]}"
        os.makedirs(tmp, exist_ok=True)
        n = len(next(iter(arrays.values())))
        bounds = np.linspace(0, n, self.num_partitions + 1).astype(np.int64)
        for p in range(self.num_partitions):
            lo, hi = int(bounds[p]), int(bounds[p + 1])
            cols = {"vid": np.arange(lo, hi, dtype=np.int64)}
            cols.update({k: v[lo:hi] for k, v in arrays.items()})
            pq.write_table(
                pa.table(cols), os.path.join(tmp, f"part-{p:03d}.parquet")
            )
        parent = self._iter_dir(iteration - 1)
        manifest = {
            "algorithm": os.path.basename(self.dir),
            "iteration": iteration,
            "n_partitions": self.num_partitions,
            "n_rows": int(n),
            "input_fingerprint": self.fingerprint,
            "parent": parent if os.path.isdir(parent) else None,
            "engine_version": __version__,
            "metrics": metrics or {},
        }
        with open(os.path.join(tmp, MANIFEST), "w") as f:
            json.dump(manifest, f)
        if os.path.isdir(final):
            shutil.rmtree(final)
        os.rename(tmp, final)  # atomic publish; manifest already inside
        return final

    def write_dataset(self, iteration: int, ds, metrics: dict | None = None) -> str:
        """Checkpoint shuffle-mode vertex state (a Dataset)."""
        final = self._iter_dir(iteration)
        tmp = final + f".tmp-{uuid.uuid4().hex[:8]}"
        ds.write_parquet(tmp)
        n = sum(
            pq.read_metadata(os.path.join(tmp, f)).num_rows
            for f in os.listdir(tmp)
            if f.endswith(".parquet")
        )
        parent = self._iter_dir(iteration - 1)
        manifest = {
            "algorithm": os.path.basename(self.dir),
            "iteration": iteration,
            "n_partitions": self.num_partitions,
            "n_rows": int(n),
            "input_fingerprint": self.fingerprint,
            "parent": parent if os.path.isdir(parent) else None,
            "engine_version": __version__,
            "metrics": metrics or {},
        }
        with open(os.path.join(tmp, MANIFEST), "w") as f:
            json.dump(manifest, f)
        if os.path.isdir(final):
            shutil.rmtree(final)
        os.rename(tmp, final)
        return final

    # -- read ---------------------------------------------------------------

    def latest(self) -> dict | None:
        """Newest COMPLETE checkpoint manifest matching the input
        fingerprint, or None. Incomplete dirs (no manifest — crashed
        mid-write) and stale fingerprints are skipped."""
        if not os.path.isdir(self.dir):
            return None
        best = None
        for name in sorted(os.listdir(self.dir), reverse=True):
            # full-match iter=NNNNN only: a crashed 'iter=NNNNN.tmp-xxxx'
            # dir sorts AFTER the real dir and may contain a manifest
            if not _ITER_DIR_RE.match(name):
                continue
            mpath = os.path.join(self.dir, name, MANIFEST)
            if not os.path.isfile(mpath):
                continue
            with open(mpath) as f:
                m = json.load(f)
            if m.get("input_fingerprint") != self.fingerprint:
                continue
            m["path"] = os.path.join(self.dir, name)
            best = m
            break
        return best

    def load_arrays(self, manifest: dict, *names: str) -> dict[str, np.ndarray]:
        tbl = pq.read_table(manifest["path"], columns=["vid", *names])
        vid = tbl.column("vid").to_numpy()
        order = np.argsort(vid)
        return {n: tbl.column(n).to_numpy()[order] for n in names}
