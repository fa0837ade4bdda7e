"""Run manifest: checkpoint/resume for stitching runs.

The reference has no resume story (SURVEY.md §5) — a crashed run keeps
its completed per-(t,region) outputs only by accident. Here every run
writes ``.stitch_manifest.json`` into its output folder: parameters,
measured registration shifts, fitted flatfields (sidecar .npz), and the
set of completed (timepoint, region) units, updated atomically after
each save. ``find_resumable()`` locates the newest compatible manifest
so an interrupted run continues in place, skipping finished units and
reusing the measured calibrations.
"""

from __future__ import annotations

import glob
import json
import os
import tempfile
from typing import Dict, Optional, Tuple

import numpy as np

MANIFEST_NAME = ".stitch_manifest.json"
FLATFIELD_NAME = "flatfields.npz"


class RunManifest:
    def __init__(self, output_folder: str, suffix: str = ""):
        # ``suffix`` separates cooperating shards' manifests in a shared
        # output folder (work-sharded multi-process runs)
        self.path = os.path.join(output_folder, MANIFEST_NAME + suffix)
        self.output_folder = output_folder
        self.data: Dict = {
            "version": 1,
            "params": None,
            "shifts": None,
            "completed": [],
            "merges_done": False,
            "finished": False,
            "global_positions": None,
        }

    # ------------------------------------------------------------------ io

    def save(self) -> None:
        os.makedirs(self.output_folder, exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=self.output_folder, suffix=".tmp")
        with os.fdopen(fd, "w") as f:
            json.dump(self.data, f, indent=2)
        os.replace(tmp, self.path)  # atomic

    @classmethod
    def load(cls, output_folder: str,
             suffix: str = "") -> Optional["RunManifest"]:
        m = cls(output_folder, suffix=suffix)
        try:
            with open(m.path) as f:
                m.data = json.load(f)
            return m
        except Exception:
            return None

    # ------------------------------------------------------------- content

    def set_params(self, params_dict: Dict,
                   options_fingerprint: Optional[Dict] = None) -> None:
        self.data["params"] = params_dict
        if options_fingerprint is not None:
            self.data["engine_options"] = options_fingerprint

    def compatible_with(self, params_dict: Dict,
                        options_fingerprint: Optional[Dict] = None) -> bool:
        saved = dict(self.data.get("params") or {})
        if saved != dict(params_dict):
            return False
        if options_fingerprint is not None:
            saved_opts = self.data.get("engine_options")
            # legacy manifests without a fingerprint stay resumable
            if saved_opts is not None and saved_opts != options_fingerprint:
                return False
        return True

    def set_shifts(self, shifts) -> None:
        self.data["shifts"] = {
            "h_shift": list(shifts.h_shift),
            "v_shift": list(shifts.v_shift),
            "h_shift_rev": list(shifts.h_shift_rev),
            "h_shift_rev_odd": shifts.h_shift_rev_odd,
            "scan_pattern": shifts.scan_pattern,
        }

    def get_shifts(self):
        from ..core.geometry import RegistrationShifts
        s = self.data.get("shifts")
        if not s:
            return None
        return RegistrationShifts(
            h_shift=tuple(s["h_shift"]), v_shift=tuple(s["v_shift"]),
            h_shift_rev=tuple(s["h_shift_rev"]),
            h_shift_rev_odd=s["h_shift_rev_odd"],
            scan_pattern=s["scan_pattern"])

    def save_flatfields(self, flatfields: Dict[int, np.ndarray]) -> None:
        if not flatfields:
            return
        os.makedirs(self.output_folder, exist_ok=True)
        path = os.path.join(self.output_folder, FLATFIELD_NAME)
        # write-to-temp + atomic rename: cooperating shards all save the
        # (identical, deterministically sampled) fields to one shared
        # path — interleaved in-place writes would corrupt the zip
        fd, tmp = tempfile.mkstemp(dir=self.output_folder, suffix=".npz.tmp")
        try:
            with os.fdopen(fd, "wb") as f:
                # uncompressed: deflating ~50 MB of smooth f32 fields
                # costs seconds of the e2e run on a starved core (19 s
                # observed in a storm) for disk space nobody misses;
                # np.load reads both formats so old sidecars still load
                np.savez(f, **{str(k): v for k, v in flatfields.items()})
            os.replace(tmp, path)
        except BaseException:
            try:
                os.unlink(tmp)
            except OSError:
                pass
            raise

    def load_flatfields(self) -> Dict[int, np.ndarray]:
        path = os.path.join(self.output_folder, FLATFIELD_NAME)
        if not os.path.exists(path):
            return {}
        with np.load(path) as z:
            return {int(k): z[k] for k in z.files}

    def set_global_positions(self, positions: Dict,
                             positions_float: Optional[Dict] = None) -> None:
        """positions: {region: {(row, col): (y, x)}} -> JSON-safe lists.
        Float positions (subpixel mode) persist alongside the ints."""
        self.data["global_positions"] = {
            region: [[r, c, y, x] for (r, c), (y, x) in per.items()]
            for region, per in positions.items()}
        if positions_float:
            self.data["global_positions_float"] = {
                region: [[r, c, y, x] for (r, c), (y, x) in per.items()]
                for region, per in positions_float.items()}

    def get_global_positions(self) -> Tuple[Dict, Dict]:
        """Returns (int positions, float positions) keyed by region."""
        def parse(raw, cast):
            if not raw:
                return {}
            return {region: {(int(r), int(c)): (cast(y), cast(x))
                             for r, c, y, x in entries}
                    for region, entries in raw.items()}

        return (parse(self.data.get("global_positions"), int),
                parse(self.data.get("global_positions_float"), float))

    def mark_finished(self) -> None:
        self.data["finished"] = True
        self.save()

    def mark_completed(self, t, region: str) -> None:
        key = f"{t}/{region}"
        if key not in self.data["completed"]:
            self.data["completed"].append(key)
        self.save()

    def is_completed(self, t, region: str) -> bool:
        return f"{t}/{region}" in self.data["completed"]


def find_resumable(input_folder: str, params_dict: Dict,
                   options_fingerprint: Optional[Dict] = None) -> Optional[str]:
    """Newest output folder of this acquisition with a compatible,
    UNFINISHED manifest; None if a fresh run is needed (finished runs are
    never resumed — rerunning without --resume makes a new folder)."""
    candidates = sorted(glob.glob(input_folder + "_stitched_*"), reverse=True)
    for folder in candidates:
        m = RunManifest.load(folder)
        if (m is not None
                and m.compatible_with(params_dict, options_fingerprint)
                and not m.data.get("finished")):
            return folder
    return None
