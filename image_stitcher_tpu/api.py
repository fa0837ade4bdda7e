"""High-level convenience API: stitched-output access and inspection.

Gives reference users a first-class way to reopen results (they used
zarr.open / napari by hand; stitcher.py:1302-1306).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Dict, List

import numpy as np

from .io.zarr_store import open_zarr_array, read_attrs


@dataclass
class StitchedImage:
    """Handle on a stitched multiscale OME-Zarr image."""
    path: str
    attrs: Dict

    @property
    def num_levels(self) -> int:
        return len(self.attrs["multiscales"][0]["datasets"])

    @property
    def channel_names(self) -> List[str]:
        omero = self.attrs.get("omero", {})
        return [c["label"] for c in omero.get("channels", [])]

    @property
    def pixel_size_um(self) -> float:
        ds = self.attrs["multiscales"][0]["datasets"][0]
        return ds["coordinateTransformations"][0]["scale"][-1]

    def level(self, n: int = 0):
        """Open pyramid level n as a lazily-read tensorstore array."""
        return open_zarr_array(os.path.join(self.path, str(n)))

    def read(self, n: int = 0) -> np.ndarray:
        return np.asarray(self.level(n).read().result())


def open_stitched(path: str) -> StitchedImage:
    """Open a {region}_stitched.ome.zarr (or merge output) by path.

    Handles both output generations: NGFF 0.4 (zarr v2, attrs at the
    group root) and NGFF 0.5 (zarr v3, attrs nested under 'ome')."""
    attrs = read_attrs(path)
    if "multiscales" not in attrs and "ome" in attrs:
        attrs = attrs["ome"]
    return StitchedImage(path=path, attrs=attrs)


def list_outputs(stitched_folder: str) -> Dict[str, List[str]]:
    """Enumerate the outputs of a stitched run folder.

    Returns {"regions": [paths...], "time_series": [...], "hcs": [...]}.
    """
    out: Dict[str, List[str]] = {"regions": [], "time_series": [], "hcs": []}
    if not os.path.isdir(stitched_folder):
        return out
    for entry in sorted(os.listdir(stitched_folder)):
        full = os.path.join(stitched_folder, entry)
        if entry.endswith("_stitched") and os.path.isdir(full):
            out["regions"].extend(
                os.path.join(full, f) for f in sorted(os.listdir(full))
                if f.endswith((".ome.zarr", ".ome.tiff")))
        elif entry == "region_time_series":
            out["time_series"].extend(
                os.path.join(full, f) for f in sorted(os.listdir(full)))
        elif entry == "hcs_timepoints":
            out["hcs"].extend(
                os.path.join(full, f) for f in sorted(os.listdir(full)))
    return out
