import os

import numpy as np
import pytest

from image_stitcher_tpu.io.tiffwriter import write_ome_tiff_pyramid, ome_xml


def make_stack(c=2, z=2, h=300, w=400, dtype=np.uint16):
    rng = np.random.default_rng(0)
    return rng.integers(0, np.iinfo(dtype).max, (c, z, h, w), dtype=dtype)


def test_round_trip_via_pil(tmp_path):
    """PIL (libtiff-backed) must read back every page bit-for-bit."""
    from PIL import Image
    data = make_stack()
    levels = [data, data[..., ::2, ::2]]
    path = str(tmp_path / "x.ome.tiff")
    write_ome_tiff_pyramid(path, levels, "img", ["ch0", "ch1"],
                           [0xFF0000, 0x00FF00], 0.5, 1.5)
    img = Image.open(path)
    n = 0
    for ci in range(2):
        for zi in range(2):
            img.seek(n)
            arr = np.asarray(img)
            np.testing.assert_array_equal(arr, data[ci, zi])
            n += 1
    assert n == 4


def test_ome_xml_in_description(tmp_path):
    from PIL import Image
    data = make_stack(c=1, z=1, h=64, w=64)
    path = str(tmp_path / "y.ome.tiff")
    write_ome_tiff_pyramid(path, [data], "myimage", ["DAPI"], [0x0000FF],
                           0.75, 2.0)
    img = Image.open(path)
    desc = img.tag_v2[270]
    assert 'OME' in desc and 'myimage' in desc
    assert 'SizeX="64"' in desc and 'Type="uint16"' in desc
    assert 'PhysicalSizeX="0.75"' in desc


def test_subifd_pyramid_levels_readable(tmp_path):
    """imagecodecs-free check: parse SubIFDs offsets manually and verify
    the reduced level decodes."""
    import struct, zlib
    data = make_stack(c=1, z=1, h=256, w=256)
    lv1 = data[..., ::2, ::2]
    path = str(tmp_path / "z.ome.tiff")
    write_ome_tiff_pyramid(path, [data, lv1], "img", ["c"], [0xFFFFFF], 1.0, 1.0)
    raw = open(path, 'rb').read()
    # BigTIFF header
    assert raw[:4] == b'II+\x00'
    first_ifd = struct.unpack('<Q', raw[8:16])[0]
    ntags = struct.unpack('<Q', raw[first_ifd:first_ifd + 8])[0]
    tags = {}
    for i in range(ntags):
        off = first_ifd + 8 + 20 * i
        tag, ty, cnt = struct.unpack('<HHQ', raw[off:off + 12])
        tags[tag] = (ty, cnt, raw[off + 12:off + 20])
    assert 330 in tags  # SubIFDs present
    ty, cnt, val = tags[330]
    assert cnt == 1
    sub_off = struct.unpack('<Q', val)[0]
    # parse sub IFD: width should be 128
    nsub = struct.unpack('<Q', raw[sub_off:sub_off + 8])[0]
    sub_tags = {}
    for i in range(nsub):
        off = sub_off + 8 + 20 * i
        tag, ty, cnt = struct.unpack('<HHQ', raw[off:off + 12])
        sub_tags[tag] = struct.unpack('<Q', raw[off + 12:off + 20])[0]
    assert sub_tags[256] == 128 and sub_tags[257] == 128
    assert sub_tags[254] == 1  # reduced-resolution flag
    # decode its single 256-tile? 128<256 -> one tile; offsets inline
    toff, tcnt = sub_tags[324], sub_tags[325]
    tile = np.frombuffer(zlib.decompress(raw[toff:toff + tcnt]),
                         np.uint16).reshape(256, 256)[:128, :128]
    np.testing.assert_array_equal(tile, lv1[0, 0])


def test_pipeline_tiff_output(tmp_path):
    from fixtures import write_synthetic_acquisition
    from image_stitcher_tpu import stitch
    from PIL import Image
    import glob
    acq_dir = str(tmp_path / "acq")
    desc = write_synthetic_acquisition(acq_dir, grid_cols=2, grid_rows=2,
                                       tile_w=128, tile_h=128, overlap=32)
    stitch(acq_dir, output_format='.ome.tiff')
    out = sorted(glob.glob(acq_dir + "_stitched_*"))[-1]
    tiff_path = os.path.join(out, "0_stitched", "A1_stitched.ome.tiff")
    assert os.path.isfile(tiff_path)
    img = Image.open(tiff_path)
    arr = np.asarray(img)
    y0, x0 = desc.tile_origins[("A1", 0, 0, 0)]
    gt = desc.ground_truth[y0:y0 + arr.shape[0], x0:x0 + arr.shape[1]]
    np.testing.assert_array_equal(arr, gt)


def test_rgb_pages_and_planes(tmp_path):
    """RGB mode writes SamplesPerPixel=3 interleaved pages and OME-XML
    Plane elements with stage positions (reference's production RGB
    path + plane metadata, stitcher_process.py:1344-1549)."""
    from PIL import Image
    rng = np.random.default_rng(1)
    data = rng.integers(0, 255, (3, 2, 96, 128), dtype=np.uint8)
    levels = [data, data[..., ::2, ::2]]
    path = str(tmp_path / "rgb.ome.tiff")
    write_ome_tiff_pyramid(path, levels, "brightfield",
                           ["BF_R", "BF_G", "BF_B"], [0xFF0000, 0x00FF00,
                                                      0x0000FF],
                           0.5, 1.5, rgb=True, position_um=(1234.5, 678.9))
    img = Image.open(path)
    # 2 z-planes (RGB) + thumbnail
    for zi in range(2):
        img.seek(zi)
        arr = np.asarray(img)
        assert arr.shape == (96, 128, 3)
        np.testing.assert_array_equal(arr, np.moveaxis(data[:, zi], 0, -1))
    img.seek(0)
    desc = img.tag_v2[270]
    assert 'SamplesPerPixel="3"' in desc
    assert 'SizeC="3"' in desc and 'Interleaved="true"' in desc
    assert 'PositionX="1234.5"' in desc and 'PositionY="678.9"' in desc
    assert desc.count('<Plane ') == 2  # one per z page
    assert 'TheZ="1"' in desc and 'PositionZ="1.5"' in desc


def test_plane_elements_monochrome(tmp_path):
    from PIL import Image
    data = make_stack(c=2, z=2, h=64, w=64)
    path = str(tmp_path / "p.ome.tiff")
    write_ome_tiff_pyramid(path, [data], "img", ["a", "b"], [1, 2],
                           1.0, 3.0, position_um=(10.0, 20.0))
    img = Image.open(path)
    desc = img.tag_v2[270]
    assert desc.count('<Plane ') == 4
    assert 'TheC="1"' in desc and 'TheZ="1"' in desc
    assert 'PositionZ="3.0"' in desc and 'PositionX="10.0"' in desc


def test_rgb_pipeline_tiff_output(tmp_path):
    """An RGB acquisition stitched to .ome.tiff produces RGB pages."""
    import glob
    from test_rgb_e2e import write_rgb_acquisition
    from image_stitcher_tpu import stitch
    from PIL import Image
    acq_dir = str(tmp_path / "acq")
    gt = write_rgb_acquisition(acq_dir)
    stitch(acq_dir, output_format='.ome.tiff')
    out = sorted(glob.glob(acq_dir + "_stitched_*"))[-1]
    tiff_path = os.path.join(out, "0_stitched", "A1_stitched.ome.tiff")
    img = Image.open(tiff_path)
    arr = np.asarray(img)
    assert arr.ndim == 3 and arr.shape[2] == 3
    np.testing.assert_array_equal(arr, gt[:arr.shape[0], :arr.shape[1]])
    desc = img.tag_v2[270]
    assert 'SamplesPerPixel="3"' in desc and desc.count('<Plane ') == 1


def test_thumbnail_page(tmp_path):
    from PIL import Image
    data = make_stack(c=2, z=1, h=1200, w=1600)
    path = str(tmp_path / "t.ome.tiff")
    write_ome_tiff_pyramid(path, [data, data[..., ::2, ::2]], "img",
                           ["a", "b"], [1, 2], 1.0, 1.0)
    img = Image.open(path)
    pages = []
    i = 0
    while True:
        try:
            img.seek(i)
            pages.append(img.size)
            i += 1
        except EOFError:
            break
    assert len(pages) == 3  # 2 planes + thumbnail
    tw, thh = pages[-1]
    assert max(tw, thh) <= 512


def _read_all_pages(path):
    from PIL import Image
    img = Image.open(path)
    pages = []
    i = 0
    while True:
        try:
            img.seek(i)
        except EOFError:
            break
        pages.append(np.asarray(img).copy())
        i += 1
    return pages, img


def test_streaming_tiff_matches_inram(tmp_path):
    """VERDICT r2 #3: the band-streamed BigTIFF writer produces
    pixel-identical pages (every level 0 page read via PIL; pyramid +
    thumbnail content via manual SubIFD decode covered below) and the
    same OME-XML as the in-RAM writer, while never buffering more than
    a few band strips."""
    import glob
    from fixtures import write_synthetic_acquisition
    from image_stitcher_tpu import EngineOptions, stitch
    from PIL import Image

    results = {}
    for mode in ("off", "on"):
        acq_dir = str(tmp_path / f"acq_{mode}")
        write_synthetic_acquisition(acq_dir, grid_cols=3, grid_rows=3,
                                    tile_w=200, tile_h=200, overlap=40,
                                    channels=["Fluorescence 405 nm Ex",
                                              "Fluorescence 488 nm Ex"],
                                    seed=5)
        stitch(acq_dir, output_format='.ome.tiff',
               options=EngineOptions(streaming=mode))
        out = sorted(glob.glob(acq_dir + "_stitched_*"))[-1]
        results[mode] = os.path.join(out, "0_stitched",
                                     "A1_stitched.ome.tiff")

    pages_ram, img_ram = _read_all_pages(results["off"])
    pages_str, img_str = _read_all_pages(results["on"])
    assert len(pages_ram) == len(pages_str)
    for a, b in zip(pages_ram, pages_str):
        np.testing.assert_array_equal(a, b)
    img_ram.seek(0)
    img_str.seek(0)
    assert img_ram.tag_v2[270] == img_str.tag_v2[270]  # identical OME-XML


def test_streaming_tiff_writer_bounded_and_out_of_order(tmp_path):
    """Feed bands out of order; close() must still assemble every page,
    and the peak buffered bytes stay far below one canvas plane."""
    from image_stitcher_tpu.io.tiffwriter import StreamingTiffWriter
    from image_stitcher_tpu.ops.host_fuse import host_downsample

    rng = np.random.default_rng(7)
    h, w, band = 1024, 700, 256
    data = rng.integers(0, 65535, (1, 1, h, w), dtype=np.uint16)
    path = str(tmp_path / "s.ome.tiff")
    wr = StreamingTiffWriter(path, (1, 1, 1, h, w), 2, np.uint16,
                             "img", 1.0, 0.5, ["c0"], [0xFFFFFF])
    order = [2, 0, 3, 1]  # out-of-order band arrival
    for b in order:
        band0 = b * band
        buf = data[0, 0, band0:band0 + band]
        wr.write_level(0, buf[None, None, None],
                       sel=(slice(0, 1), slice(0, 1), slice(0, 1),
                            slice(band0, band0 + band), slice(0, w)))
        lv1 = host_downsample(buf, 'nearest')
        wr.write_level(1, lv1[None, None, None],
                       sel=(slice(0, 1), slice(0, 1), slice(0, 1),
                            slice(band0 >> 1, (band0 >> 1) + lv1.shape[0]),
                            slice(0, lv1.shape[1])))
    peak = wr.peak_buffer_bytes
    wr.close()
    # out-of-order parking holds at most ~2 bands per level
    assert peak < 3 * band * w * 2 * 2
    assert peak < h * w * 2  # far below one canvas plane

    pages, img = _read_all_pages(path)
    np.testing.assert_array_equal(pages[0], data[0, 0])
    # thumbnail page (last chained IFD, reduced-resolution)
    img.seek(1)
    assert np.asarray(img).shape[0] <= 512

    # SubIFD pyramid content: decode level 1 manually (PIL skips SubIFDs)
    import struct
    import zlib
    raw = open(path, 'rb').read()
    first_ifd = struct.unpack('<Q', raw[8:16])[0]
    ntags = struct.unpack('<Q', raw[first_ifd:first_ifd + 8])[0]
    tags = {}
    for i in range(ntags):
        off = first_ifd + 8 + 20 * i
        tag, ty, cnt = struct.unpack('<HHQ', raw[off:off + 12])
        tags[tag] = (ty, cnt, raw[off + 12:off + 20])
    sub_off = struct.unpack('<Q', tags[330][2])[0]
    nsub = struct.unpack('<Q', raw[sub_off:sub_off + 8])[0]
    sub = {}
    for i in range(nsub):
        off = sub_off + 8 + 20 * i
        tag, ty, cnt = struct.unpack('<HHQ', raw[off:off + 12])
        sub[tag] = (ty, cnt, raw[off + 12:off + 20])
    lv1_full = host_downsample(data[0, 0], 'nearest')
    h1, w1 = lv1_full.shape
    assert struct.unpack('<Q', sub[256][2])[0] == w1
    assert struct.unpack('<Q', sub[257][2])[0] == h1
    # tile offsets/counts arrays (out of line: count > 1)
    n_tiles = (-(-h1 // 256)) * (-(-w1 // 256))
    toff_ptr = struct.unpack('<Q', sub[324][2])[0]
    tcnt_ptr = struct.unpack('<Q', sub[325][2])[0]
    offs = struct.unpack(f'<{n_tiles}Q', raw[toff_ptr:toff_ptr + 8 * n_tiles])
    cnts = struct.unpack(f'<{n_tiles}Q', raw[tcnt_ptr:tcnt_ptr + 8 * n_tiles])
    tiles_x = -(-w1 // 256)
    recon = np.zeros((tiles_x * 0 + (-(-h1 // 256)) * 256,
                      tiles_x * 256), np.uint16)
    for ti, (o, c) in enumerate(zip(offs, cnts)):
        ty_, tx_ = divmod(ti, tiles_x)
        tile = np.frombuffer(zlib.decompress(raw[o:o + c]),
                             np.uint16).reshape(256, 256)
        recon[ty_ * 256:(ty_ + 1) * 256, tx_ * 256:(tx_ + 1) * 256] = tile
    np.testing.assert_array_equal(recon[:h1, :w1], lv1_full)


def test_streaming_rgb_tiff_matches_inram(tmp_path):
    """VERDICT r3 #4: RGB (SamplesPerPixel=3) TIFF output streams
    band-wise — pixel-identical pages and identical OME-XML vs the
    in-RAM writer, with peak buffering far below one canvas plane."""
    import glob
    from test_rgb_e2e import write_rgb_acquisition
    from image_stitcher_tpu import EngineOptions, stitch

    results = {}
    for mode in ("off", "on"):
        acq_dir = str(tmp_path / f"acq_{mode}")
        write_rgb_acquisition(acq_dir, grid=3, tile=128, overlap=32)
        stitch(acq_dir, output_format='.ome.tiff',
               options=EngineOptions(streaming=mode,
                                     chunks=(1, 1, 1, 64, 64)))
        out = sorted(glob.glob(acq_dir + "_stitched_*"))[-1]
        results[mode] = os.path.join(out, "0_stitched",
                                     "A1_stitched.ome.tiff")

    pages_ram, img_ram = _read_all_pages(results["off"])
    pages_str, img_str = _read_all_pages(results["on"])
    assert len(pages_ram) == len(pages_str)
    assert pages_ram[0].ndim == 3 and pages_ram[0].shape[2] == 3
    for a, b in zip(pages_ram, pages_str):
        np.testing.assert_array_equal(a, b)
    img_ram.seek(0)
    img_str.seek(0)
    assert img_ram.tag_v2[270] == img_str.tag_v2[270]
    assert 'SamplesPerPixel="3"' in img_str.tag_v2[270]


def test_streaming_rgb_writer_bounded_and_out_of_order(tmp_path):
    """RGB strips flush only when all three channel bands have their
    rows — fed out of order and channel-interleaved, close() must still
    assemble interleaved pages with bounded buffering."""
    from image_stitcher_tpu.io.tiffwriter import StreamingTiffWriter
    from image_stitcher_tpu.ops.host_fuse import host_downsample

    rng = np.random.default_rng(9)
    h, w, band = 768, 520, 256
    data = rng.integers(0, 255, (3, 1, h, w)).astype(np.uint8)
    path = str(tmp_path / "rgb_stream.ome.tiff")
    wr = StreamingTiffWriter(path, (1, 3, 1, h, w), 2, np.uint8,
                             "img", 1.0, 0.5,
                             ["BF_R", "BF_G", "BF_B"],
                             [0xFF0000, 0x00FF00, 0x0000FF], rgb=True)
    # interleave channels per band but out of band order, with one
    # channel lagging a full band
    feeds = []
    for b in range(h // band):
        for ci in range(3):
            feeds.append((ci, b))
    feeds = [feeds[i] for i in (1, 0, 4, 2, 3, 7, 5, 8, 6)]
    for ci, b in feeds:
        band0 = b * band
        buf = data[ci, 0, band0:band0 + band]
        wr.write_level(0, buf[None, None, None],
                       sel=(slice(0, 1), slice(ci, ci + 1), slice(0, 1),
                            slice(band0, band0 + band), slice(0, w)))
        lv1 = host_downsample(buf, 'nearest')
        wr.write_level(1, lv1[None, None, None],
                       sel=(slice(0, 1), slice(ci, ci + 1), slice(0, 1),
                            slice(band0 >> 1, (band0 >> 1) + lv1.shape[0]),
                            slice(0, lv1.shape[1])))
    peak = wr.peak_buffer_bytes
    wr.close()
    # parking holds a few bands x 3 channels, never a canvas plane x 3
    assert peak < 3 * h * w  # one full RGB plane would be 3*h*w bytes
    pages, img = _read_all_pages(path)
    np.testing.assert_array_equal(pages[0],
                                  np.moveaxis(data[:, 0], 0, -1))
    # thumbnail is RGB too
    img.seek(1)
    th = np.asarray(img)
    assert th.ndim == 3 and th.shape[2] == 3
    lv1_full = np.stack([host_downsample(data[ci, 0], 'nearest')
                         for ci in range(3)], axis=-1)
    np.testing.assert_array_equal(th, lv1_full[::1, ::1])


# ------------------------------------------------------------------ jpeg

def test_jpeg_grayscale_round_trip_via_pil(tmp_path):
    """JPEG-compressed pages (Compression=7) decode in a standard
    libtiff-backed viewer and match the source within lossy tolerance."""
    from PIL import Image
    rng = np.random.default_rng(1)
    # smooth content: JPEG error stays small and the PSNR bound is
    # meaningful (pure noise would be dominated by codec error)
    yy, xx = np.mgrid[0:300, 0:400]
    base = (120 + 60 * np.sin(yy / 17.0) + 50 * np.cos(xx / 23.0))
    data = np.clip(base + rng.normal(0, 3, base.shape), 0, 255)[None, None]
    data = data.astype(np.uint8)
    levels = [data, np.ascontiguousarray(data[..., ::2, ::2])]
    path = str(tmp_path / "j.ome.tiff")
    write_ome_tiff_pyramid(path, levels, "img", ["ch0"], [0xFF0000],
                           0.5, 1.5, compression='jpeg', jpeg_quality=90)
    img = Image.open(path)
    img.seek(0)
    assert img.tag_v2[259] == 7  # new-style JPEG
    arr = np.asarray(img)
    assert arr.shape == data[0, 0].shape and arr.dtype == np.uint8
    err = arr.astype(np.float64) - data[0, 0]
    psnr = 10 * np.log10(255.0 ** 2 / max((err ** 2).mean(), 1e-12))
    assert psnr > 35.0, psnr


def test_jpeg_rgb_round_trip_via_pil(tmp_path):
    from PIL import Image
    yy, xx = np.mgrid[0:280, 0:260]
    planes = [np.clip(100 + a * np.sin(yy / s) + b * np.cos(xx / t), 0, 255)
              for a, b, s, t in ((70, 40, 19.0, 31.0), (50, 60, 23.0, 13.0),
                                 (30, 80, 29.0, 17.0))]
    data = np.stack(planes).astype(np.uint8)[:, None]  # (3, 1, h, w)
    path = str(tmp_path / "jr.ome.tiff")
    write_ome_tiff_pyramid(path, [data], "img", ["x_R", "x_G", "x_B"],
                           [0xFF0000, 0x00FF00, 0x0000FF], 0.5, 1.5,
                           compression='jpeg', rgb=True, thumbnail=False)
    img = Image.open(path)
    img.seek(0)
    assert img.tag_v2[259] == 7
    assert img.tag_v2[262] == 6  # PhotometricInterpretation = YCbCr
    arr = np.asarray(img.convert('RGB'))
    ref = np.moveaxis(data[:, 0], 0, -1)
    assert arr.shape == ref.shape
    err = arr.astype(np.float64) - ref
    psnr = 10 * np.log10(255.0 ** 2 / max((err ** 2).mean(), 1e-12))
    assert psnr > 30.0, psnr  # 4:2:0 chroma subsampling is lossier


def test_jpeg_rejects_uint16(tmp_path):
    data = make_stack(c=1, z=1, h=64, w=64)  # uint16
    with pytest.raises(ValueError, match="uint8 only"):
        write_ome_tiff_pyramid(str(tmp_path / "b.ome.tiff"), [data], "img",
                               ["c"], [0xFFFFFF], 1.0, 1.0,
                               compression='jpeg')


def test_jpeg_streaming_writer_matches_in_ram(tmp_path):
    """The band-streamed writer's JPEG pages must decode identically to
    the in-RAM writer's for the same input (same codec, same tiles)."""
    from PIL import Image
    from image_stitcher_tpu.io.tiffwriter import StreamingTiffWriter
    yy, xx = np.mgrid[0:520, 0:470]
    img2d = np.clip(128 + 90 * np.sin(yy / 41.0) * np.cos(xx / 37.0),
                    0, 255).astype(np.uint8)
    data = img2d[None, None]                       # (c, z, h, w)
    lv1 = np.ascontiguousarray(data[..., ::2, ::2])
    p_ram = str(tmp_path / "ram.ome.tiff")
    write_ome_tiff_pyramid(p_ram, [data, lv1], "img", ["c"], [0xFFFFFF],
                           1.0, 1.0, compression='jpeg', thumbnail=False)
    p_st = str(tmp_path / "st.ome.tiff")
    w = StreamingTiffWriter(p_st, (1, 1, 1, 520, 470), 2, np.uint8,
                            "img", 1.0, 1.0, ["c"], [0xFFFFFF],
                            compression='jpeg', thumbnail=False)
    # feed level 0 in two out-of-order bands, level 1 whole
    sel = lambda y0, y1, wd: (slice(0, 1), slice(0, 1), slice(0, 1),
                              slice(y0, y1), slice(0, wd))
    slab = lambda rows: rows[None, None, None]     # (1,1,1,rows,w)
    w.write_level(0, slab(img2d[300:520]), sel=sel(300, 520, 470))
    w.write_level(0, slab(img2d[0:300]), sel=sel(0, 300, 470))
    w.write_level(1, slab(img2d[::2, ::2]), sel=sel(0, 260, 235))
    w.close()
    a, b = Image.open(p_ram), Image.open(p_st)
    a.seek(0); b.seek(0)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_jpeg_streaming_rejects_uint16(tmp_path):
    from image_stitcher_tpu.io.tiffwriter import StreamingTiffWriter
    with pytest.raises(ValueError, match="uint8 only"):
        StreamingTiffWriter(str(tmp_path / "x.ome.tiff"),
                            (1, 1, 1, 64, 64), 1, np.uint16, "img",
                            1.0, 1.0, ["c"], [0xFFFFFF],
                            compression='jpeg')


def test_jpeg_pipeline_e2e(tmp_path):
    """CLI-surface e2e: uint8 acquisition -> .ome.tiff with
    tiff_compression='jpeg' opens in PIL and matches the lossless
    deflate output within JPEG tolerance (reference production default:
    pyvips tiffsave(compression='jpeg'), stitcher_process.py:1502-1549)."""
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from PIL import Image
    from fixtures import write_synthetic_acquisition
    from image_stitcher_tpu import EngineOptions, StitchingParameters
    from image_stitcher_tpu.models.pipeline import StitchPipeline

    acq_dir = str(tmp_path / "acq")
    write_synthetic_acquisition(acq_dir, grid_cols=2, grid_rows=2,
                                tile_w=96, tile_h=96, overlap=16,
                                dtype=np.uint8)
    outs = {}
    for comp in ('jpeg', 'deflate'):
        p = StitchingParameters(input_folder=acq_dir,
                                output_format='.ome.tiff')
        pipe = StitchPipeline(p, EngineOptions(tiff_compression=comp))
        path = pipe.run()
        img = Image.open(path)
        img.seek(0)
        outs[comp] = np.asarray(img).copy()
        assert img.tag_v2[259] == (7 if comp == 'jpeg' else 8)
    assert outs['jpeg'].shape == outs['deflate'].shape
    err = outs['jpeg'].astype(np.float64) - outs['deflate']
    psnr = 10 * np.log10(255.0 ** 2 / max((err ** 2).mean(), 1e-12))
    assert psnr > 30.0, psnr
