"""Output inspection helpers.

Counterparts of the reference's debug tooling: the zarr tree dump
(print_zarr_structure, stitcher.py:1302-1306) and the RGB debug slice
(_save_debug_slice, stitcher.py:861-885) — built on tensorstore/JSON
instead of zarr-python.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional

import numpy as np


def zarr_tree(path: str) -> Dict:
    """Recursive description of a zarr hierarchy (v2 or v3): groups,
    arrays, attrs."""
    node: Dict = {"path": path}
    attrs_file = os.path.join(path, ".zattrs")
    if os.path.exists(attrs_file):
        with open(attrs_file) as f:
            node["attrs"] = json.load(f)
    array_file = os.path.join(path, ".zarray")
    if os.path.exists(array_file):
        with open(array_file) as f:
            meta = json.load(f)
        node["array"] = {"shape": meta["shape"], "chunks": meta["chunks"],
                         "dtype": meta["dtype"],
                         "compressor": (meta.get("compressor") or {}).get("id")}
        return node
    v3_file = os.path.join(path, "zarr.json")
    if os.path.exists(v3_file) and "attrs" not in node:
        with open(v3_file) as f:
            meta = json.load(f)
        if meta.get("attributes"):
            node["attrs"] = meta["attributes"]
        if meta.get("node_type") == "array":
            # report the READ chunk: the inner chunk_shape for
            # sharding_indexed arrays, the grid chunk otherwise
            chunks = meta["chunk_grid"]["configuration"]["chunk_shape"]
            comp = None
            for codec in meta.get("codecs", []):
                if codec.get("name") == "sharding_indexed":
                    cfg = codec.get("configuration", {})
                    chunks = cfg.get("chunk_shape", chunks)
                    inner = [c.get("name") for c in cfg.get("codecs", [])]
                    comp = next((n for n in inner if n != "bytes"), None)
                elif codec.get("name") != "bytes" and comp is None:
                    comp = codec.get("name")
            node["array"] = {"shape": meta["shape"], "chunks": chunks,
                             "dtype": meta["data_type"], "compressor": comp}
            return node
    children = {}
    try:
        for name in sorted(os.listdir(path)):
            sub = os.path.join(path, name)
            if os.path.isdir(sub) and (
                    os.path.exists(os.path.join(sub, ".zarray"))
                    or os.path.exists(os.path.join(sub, ".zgroup"))
                    or os.path.exists(os.path.join(sub, "zarr.json"))):
                children[name] = zarr_tree(sub)
    except FileNotFoundError:
        pass
    if children:
        node["children"] = children
    return node


def format_zarr_tree(path: str) -> str:
    """Human-readable tree (the reference printed root.tree() + attrs)."""
    lines: List[str] = [f"Zarr tree for: {path}"]

    def walk(node: Dict, name: str, depth: int):
        indent = "  " * depth
        if "array" in node:
            a = node["array"]
            lines.append(f"{indent}{name} {a['dtype']} {tuple(a['shape'])} "
                         f"chunks={tuple(a['chunks'])} [{a['compressor']}]")
        else:
            lines.append(f"{indent}{name}/")
        for cname, child in node.get("children", {}).items():
            walk(child, cname, depth + 1)

    tree = zarr_tree(path)
    walk(tree, os.path.basename(path.rstrip('/')), 0)
    if "attrs" in tree:
        lines.append(json.dumps(tree["attrs"], indent=2)[:2000])
    return "\n".join(lines)


def print_zarr_structure(path: str) -> None:
    print(format_zarr_tree(path))


def save_debug_slice(canvas: np.ndarray, out_path: str) -> Optional[str]:
    """Write an 8-bit RGB overview of the first <=3 channels, z=0.

    Per-channel min-max normalized like the reference debug dump
    (stitcher.py:861-885). ``canvas`` is (C, Z, Y, X) or (T, C, Z, Y, X).
    """
    try:
        import cv2
        if canvas.ndim == 5:
            canvas = canvas[0]
        channels = np.asarray(canvas[:3, 0]).astype(np.float32)  # (c,y,x)
        c = channels.shape[0]
        rgb = np.zeros((channels.shape[1], channels.shape[2], 3), np.uint8)
        for i in range(c):
            lo, hi = channels[i].min(), channels[i].max()
            if hi > lo:
                rgb[..., i] = ((channels[i] - lo) * 255.0 / (hi - lo)
                               ).astype(np.uint8)
        cv2.imwrite(out_path, rgb[..., ::-1])  # RGB -> BGR for cv2
        return out_path
    except Exception as e:
        print(f"Warning: Could not save debug image: {e}")
        return None


def main(argv=None) -> int:
    """``python -m image_stitcher_tpu.utils.inspect PATH`` — dump the
    zarr tree (v2 or v3) of a stitched output."""
    import argparse
    parser = argparse.ArgumentParser(description=main.__doc__)
    parser.add_argument('path', help='zarr group/array directory')
    parser.add_argument('--json', action='store_true',
                        help='machine-readable tree instead of text')
    args = parser.parse_args(argv)
    if args.json:
        print(json.dumps(zarr_tree(args.path), indent=2))
    else:
        print(format_zarr_tree(args.path))
    return 0


if __name__ == '__main__':
    import sys
    sys.exit(main())
