import numpy as np
import cv2
import pytest

from image_stitcher_tpu.io.fast_tiff import read_tiff_fast
from image_stitcher_tpu.io.acquisition import read_image


UNCOMP = [int(cv2.IMWRITE_TIFF_COMPRESSION), 1]


@pytest.mark.parametrize("dtype", [np.uint8, np.uint16])
def test_fast_matches_cv2(tmp_path, dtype):
    rng = np.random.default_rng(0)
    img = rng.integers(0, np.iinfo(dtype).max, (300, 401), dtype=dtype)
    p = str(tmp_path / "x.tiff")
    assert cv2.imwrite(p, img, UNCOMP)
    fast = read_tiff_fast(p)
    assert fast is not None, "uncompressed tiff should hit the fast path"
    np.testing.assert_array_equal(fast, img)
    np.testing.assert_array_equal(read_image(p), img)


def test_fast_rgb(tmp_path):
    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, (64, 80, 3), dtype=np.uint8)
    p = str(tmp_path / "c.tiff")
    assert cv2.imwrite(p, img[:, :, ::-1], UNCOMP)  # cv2 wants BGR
    out = read_image(p)
    np.testing.assert_array_equal(out, img)


def test_fast_rejects_compressed(tmp_path):
    rng = np.random.default_rng(2)
    img = rng.integers(0, 65535, (64, 64), dtype=np.uint16)
    p = str(tmp_path / "z.tiff")
    # cv2 default .tiff compression is LZW -> must decline + fall back
    assert cv2.imwrite(p, img)
    assert read_tiff_fast(p) is None
    np.testing.assert_array_equal(read_image(p), img)


def test_fast_rejects_garbage(tmp_path):
    p = str(tmp_path / "g.tiff")
    with open(p, "wb") as f:
        f.write(b"II*\x00garbagegarbage")
    assert read_tiff_fast(p) is None


def test_fast_bigtiff_from_our_writer(tmp_path):
    from image_stitcher_tpu.io.tiffwriter import BigTiffWriter
    img = (np.arange(128 * 130) % 65535).astype(np.uint16).reshape(128, 130)
    p = str(tmp_path / "b.tiff")
    w = BigTiffWriter(p, compression='none', tile_size=256)
    w.add_plane([img])
    w.close()
    # our writer emits tiled bigtiff (no strips) -> fast path declines
    assert read_tiff_fast(p) is None


def test_fast_multistrip(tmp_path):
    """Synthesize a classic multi-strip TIFF by hand."""
    import struct
    img = np.arange(16 * 8, dtype=np.uint16).reshape(16, 8)
    rows_per_strip = 4
    strips = [img[i:i + rows_per_strip].tobytes()
              for i in range(0, 16, rows_per_strip)]
    header = struct.pack('<2sHI', b'II', 42, 8)
    # place strip data after the IFD; IFD at offset 8
    entries = []
    n = 10
    ifd_size = 2 + n * 12 + 4
    data_start = 8 + ifd_size + 2 * len(strips) * 4  # after offset arrays
    off_array_pos = 8 + ifd_size
    cnt_array_pos = off_array_pos + len(strips) * 4
    strip_offsets = []
    pos = data_start
    for s in strips:
        strip_offsets.append(pos)
        pos += len(s)

    def entry(tag, ty, count, value):
        return struct.pack('<HHI4s', tag, ty, count, value)

    def inline_short(v):
        return struct.pack('<HH', v, 0)

    def inline_long(v):
        return struct.pack('<I', v)

    entries = [
        entry(256, 3, 1, inline_short(8)),     # width
        entry(257, 3, 1, inline_short(16)),    # length
        entry(258, 3, 1, inline_short(16)),    # bits
        entry(259, 3, 1, inline_short(1)),     # compression none
        entry(262, 3, 1, inline_short(1)),     # photometric
        entry(273, 4, len(strips), inline_long(off_array_pos)),
        entry(277, 3, 1, inline_short(1)),     # spp
        entry(278, 3, 1, inline_short(rows_per_strip)),
        entry(279, 4, len(strips), inline_long(cnt_array_pos)),
        entry(339, 3, 1, inline_short(1)),     # sample format uint
    ]
    blob = header + struct.pack('<H', n) + b''.join(entries) + struct.pack('<I', 0)
    blob += b''.join(struct.pack('<I', o) for o in strip_offsets)
    blob += b''.join(struct.pack('<I', len(s)) for s in strips)
    blob += b''.join(strips)
    p = str(tmp_path / "ms.tiff")
    with open(p, 'wb') as f:
        f.write(blob)
    out = read_tiff_fast(p)
    assert out is not None
    np.testing.assert_array_equal(out, img)


def _synth_strip_tiff(path, img, rows_per_strip=4, gap=0, last_count_delta=0):
    """Hand-rolled classic multi-strip TIFF; ``gap`` bytes between strips
    (non-contiguous layout), ``last_count_delta`` lies in the final
    StripByteCounts entry (a truncated writer)."""
    import struct
    h, w = img.shape
    strips = [img[i:i + rows_per_strip].tobytes()
              for i in range(0, h, rows_per_strip)]
    header = struct.pack('<2sHI', b'II', 42, 8)
    n = 10
    ifd_size = 2 + n * 12 + 4
    off_array_pos = 8 + ifd_size
    cnt_array_pos = off_array_pos + len(strips) * 4
    data_start = cnt_array_pos + len(strips) * 4
    strip_offsets = []
    pos = data_start
    for s in strips:
        strip_offsets.append(pos)
        pos += len(s) + gap
    counts = [len(s) for s in strips]
    counts[-1] += last_count_delta

    def entry(tag, ty, count, value):
        return struct.pack('<HHI4s', tag, ty, count, value)

    def inline_short(v):
        return struct.pack('<HH', v, 0)

    def inline_long(v):
        return struct.pack('<I', v)

    entries = [
        entry(256, 3, 1, inline_short(w)),
        entry(257, 3, 1, inline_short(h)),
        entry(258, 3, 1, inline_short(16)),
        entry(259, 3, 1, inline_short(1)),
        entry(262, 3, 1, inline_short(1)),
        entry(273, 4, len(strips), inline_long(off_array_pos)),
        entry(277, 3, 1, inline_short(1)),
        entry(278, 3, 1, inline_short(rows_per_strip)),
        entry(279, 4, len(strips), inline_long(cnt_array_pos)),
        entry(339, 3, 1, inline_short(1)),
    ]
    blob = (header + struct.pack('<H', n) + b''.join(entries)
            + struct.pack('<I', 0))
    blob += b''.join(struct.pack('<I', o) for o in strip_offsets)
    blob += b''.join(struct.pack('<I', c) for c in counts)
    for s in strips:
        blob += s + b'\0' * gap
    with open(path, 'wb') as f:
        f.write(blob)


def test_fast_noncontiguous_strips(tmp_path):
    """Gapped strip layout: the parser must take the per-strip gather
    path and still reconstruct exactly."""
    img = np.arange(16 * 8, dtype=np.uint16).reshape(16, 8)
    p = str(tmp_path / "gap.tiff")
    _synth_strip_tiff(p, img, gap=6)
    out = read_tiff_fast(p)
    assert out is not None
    np.testing.assert_array_equal(out, img)


def test_fast_rejects_short_strips(tmp_path):
    """StripByteCounts that don't cover ImageLength rows (truncated
    writer): reading on would interpret adjacent file bytes as pixels —
    the fast path must decline."""
    img = np.arange(16 * 8, dtype=np.uint16).reshape(16, 8)
    p = str(tmp_path / "short.tiff")
    _synth_strip_tiff(p, img, last_count_delta=-10)
    assert read_tiff_fast(p) is None
