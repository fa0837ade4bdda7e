"""On-chip kernel burn-in: randomized pallas-vs-XLA parity on a REAL TPU.

The pytest suite runs on the CPU backend (pallas in interpret mode);
this tool validates the Mosaic-compiled kernels on actual hardware —
randomized overlapping batches, random crops and invalid entries, mixed
tile sizes — asserting byte-equality (overwrite) and <=1 LSB (feather,
f32 accumulation order) against the XLA scan. Run after any kernel or
toolchain change:

    python -m image_stitcher_tpu.tools.tpu_kernel_check
"""

import numpy as np
import jax.numpy as jnp
from image_stitcher_tpu.ops.fuse import (fuse_overwrite, fuse_feather,
                                         finalize_feather,
                                         padded_canvas_shape)
from image_stitcher_tpu.ops.pallas_fuse import (fuse_overwrite_pallas,
                                                fuse_feather_pallas,
                                                pallas_padded_canvas_shape)

def main() -> None:
    rng = np.random.default_rng(42)
    fails = 0
    for trial in range(6):
        T = int(rng.choice([512, 1024, 2048]))
        n = int(rng.integers(3, 12))
        H = int(rng.integers(2 * T, 4 * T))
        W = int(rng.integers(2 * T, 4 * T))
        C, Z = int(rng.integers(1, 3)), 1
        tiles = rng.integers(0, 65535, (n, T, T), np.uint16)
        # heavy overlap: positions clustered so later-tile-wins matters
        info = np.stack([rng.integers(0, C, n), np.zeros(n, int),
                         rng.integers(0, H - T // 2, n),
                         rng.integers(0, W - T // 2, n)], 1).astype(np.int32)
        crops = rng.integers(0, T // 4, (n, 4)).astype(np.int32)
        valid = rng.random(n) > 0.15

        cx = jnp.zeros(padded_canvas_shape(C, Z, H, W, T, T), jnp.uint16)
        ref = np.asarray(fuse_overwrite(cx, jnp.asarray(tiles), jnp.asarray(info),
                                        jnp.asarray(crops),
                                        jnp.asarray(valid)))[:, :, :H, :W]
        cp = jnp.zeros(pallas_padded_canvas_shape(C, Z, H, W, T, T, np.uint16),
                       jnp.uint16)
        got = np.asarray(fuse_overwrite_pallas(
            cp, jnp.asarray(tiles), jnp.asarray(info), jnp.asarray(crops),
            jnp.asarray(valid)))[:, :, :H, :W]
        ok = np.array_equal(ref, got)

        # fused flatfield: pallas(ff_recip) vs apply_flatfield -> pallas
        from image_stitcher_tpu.ops.fuse import apply_flatfield
        ff = (rng.random((C, T, T)) * 0.8 + 0.6).astype(np.float32)
        corrected = apply_flatfield(jnp.asarray(tiles), jnp.asarray(ff),
                                    jnp.asarray(info[:, 0]), jnp.uint16)
        c1 = jnp.zeros(pallas_padded_canvas_shape(C, Z, H, W, T, T,
                                                  np.uint16), jnp.uint16)
        ff_ref = np.asarray(fuse_overwrite_pallas(
            c1, corrected, jnp.asarray(info), jnp.asarray(crops),
            jnp.asarray(valid)))[:, :, :H, :W]
        c2 = jnp.zeros(pallas_padded_canvas_shape(C, Z, H, W, T, T,
                                                  np.uint16), jnp.uint16)
        ff_got = np.asarray(fuse_overwrite_pallas(
            c2, jnp.asarray(tiles), jnp.asarray(info), jnp.asarray(crops),
            jnp.asarray(valid), ff_recip=jnp.asarray(ff)))[:, :, :H, :W]
        ok_ff = np.array_equal(ff_ref, ff_got)

        shp = padded_canvas_shape(C, Z, H, W, T, T)
        fa, fw = fuse_feather(jnp.zeros(shp, jnp.float32),
                              jnp.zeros(shp, jnp.float32),
                              jnp.asarray(tiles), jnp.asarray(info),
                              jnp.asarray(crops), jnp.asarray(valid), blend_px=48)
        fref = np.asarray(finalize_feather(fa, fw, jnp.uint16))[:, :, :H, :W]
        pshp = pallas_padded_canvas_shape(C, Z, H, W, T, T, np.uint16)
        pa, pw = fuse_feather_pallas(jnp.zeros(pshp, jnp.float32),
                                     jnp.zeros(pshp, jnp.float32),
                                     jnp.asarray(tiles), jnp.asarray(info),
                                     jnp.asarray(crops), jnp.asarray(valid),
                                     blend_px=48)
        fgot = np.asarray(finalize_feather(pa, pw, jnp.uint16))[:, :, :H, :W]
        fdiff = int(np.abs(fref.astype(int) - fgot.astype(int)).max())
        ok_f = fdiff <= 1

        # fused-ff feather: pallas(ff_recip) vs apply_flatfield -> pallas
        fa2, fw2 = fuse_feather_pallas(
            jnp.zeros(pshp, jnp.float32), jnp.zeros(pshp, jnp.float32),
            corrected, jnp.asarray(info), jnp.asarray(crops),
            jnp.asarray(valid), blend_px=48)
        ffr = np.asarray(finalize_feather(fa2, fw2, jnp.uint16))[:, :, :H, :W]
        fa3, fw3 = fuse_feather_pallas(
            jnp.zeros(pshp, jnp.float32), jnp.zeros(pshp, jnp.float32),
            jnp.asarray(tiles), jnp.asarray(info), jnp.asarray(crops),
            jnp.asarray(valid), ff_recip=jnp.asarray(ff), blend_px=48)
        ffg = np.asarray(finalize_feather(fa3, fw3, jnp.uint16))[:, :, :H, :W]
        ok_fff = np.array_equal(ffr, ffg)
        print(f"trial {trial}: T={T} n={n} canvas={H}x{W} C={C} "
              f"overwrite={'OK' if ok else 'FAIL'} "
              f"fused_ff={'OK' if ok_ff else 'FAIL'} "
              f"feather_maxdiff={fdiff} "
              f"feather_fused_ff={'OK' if ok_fff else 'FAIL'}", flush=True)
        fails += (not ok) + (not ok_f) + (not ok_ff) + (not ok_fff)
    print("FAILS:", fails)
    assert fails == 0


if __name__ == '__main__':
    main()
