import math

import pytest

from image_stitcher_tpu.core.geometry import (
    RegistrationShifts, output_dimensions_coordinate, output_dimensions_registered,
    num_pyramid_levels, overlap_estimate, tile_position_registered,
    tile_position_coordinate, tile_crops, clamp_tile_extent,
    grid_center_pair_indices)


def test_output_dimensions_coordinate():
    # 2x2 grid, 512 tiles, step 448 px at 1 um/px
    xs = [0.0, 0.448]
    ys = [0.0, 0.448]
    w, h = output_dimensions_coordinate(xs, ys, 512, 512, 1.0)
    assert (w, h) == (960, 960)


def test_output_dimensions_coordinate_non_unit_pixel():
    xs = [10.0, 10.1]
    ys = [5.0, 5.2]
    w, h = output_dimensions_coordinate(xs, ys, 2048, 2048, 0.9)
    assert w == math.ceil((0.1 + 2048 * 0.9 / 1000) * 1000 / 0.9)
    assert h == math.ceil((0.2 + 2048 * 0.9 / 1000) * 1000 / 0.9)


def test_output_dimensions_registered_simple():
    s = RegistrationShifts(h_shift=(0, -64), v_shift=(-64, 0))
    w, h = output_dimensions_registered(3, 2, 512, 512, s)
    # width subtracts |h dx|; height subtracts the SIGNED v dy (reference
    # asymmetry, stitcher.py:331-334: negative v_shift over-allocates height)
    assert (w, h) == (512 + 2 * 448, 512 + (512 + 64))


def test_output_dimensions_registered_cross_terms():
    s = RegistrationShifts(h_shift=(5, -64), v_shift=(-64, -3))
    w, h = output_dimensions_registered(3, 2, 512, 512, s)
    assert w == 512 + 2 * 448 + abs(1 * -3)
    assert h == 512 + (512 + 64) + abs(2 * 5)


def test_output_dimensions_registered_s_pattern_envelope():
    s = RegistrationShifts(h_shift=(2, -60), h_shift_rev=(-7, -70),
                           scan_pattern='S-Pattern')
    assert s.max_h_shift() == (7, 70)


def test_num_pyramid_levels():
    assert num_pyramid_levels(960, 960, 1) == 1
    assert num_pyramid_levels(4096, 4096, 1) == 2
    assert num_pyramid_levels(20000, 20000, 1) == math.ceil(math.log2(20000 / 1024))
    assert num_pyramid_levels(2048, 2048, 8) == 4


def test_overlap_estimate():
    # |512 - 448|*1.05 = 67.2 -> round 67 -> //2 = 33
    assert overlap_estimate(512, 448.0, 1) == 33
    assert overlap_estimate(512, 448.0, 2) == 66
    # banker's rounding parity: round(2.5)=2
    assert overlap_estimate(10, 7.5, 1, fudge=1.0) == round(2.5) // 2


def test_tile_position_registered_negative_h_dy():
    s = RegistrationShifts(h_shift=(-4, -64), v_shift=(-64, 0))
    # col 0 of 3: y gains (3-1-0)*4 = 8
    x, y = tile_position_registered(0, 0, 3, 2, 512, 512, s)
    assert (x, y) == (0, 8)
    x, y = tile_position_registered(2, 0, 3, 2, 512, 512, s)
    assert (x, y) == (2 * (512 - 64), 0)


def test_tile_position_registered_positive_h_dy():
    s = RegistrationShifts(h_shift=(4, -64), v_shift=(-64, 0))
    x, y = tile_position_registered(2, 1, 3, 2, 512, 512, s)
    assert x == 2 * 448
    assert y == (512 - 64) + 2 * 4


def test_tile_position_registered_v_dx_negative():
    s = RegistrationShifts(h_shift=(0, -64), v_shift=(-64, -6))
    x, y = tile_position_registered(0, 0, 2, 3, 512, 512, s)
    assert x == (3 - 1 - 0) * 6


def test_tile_position_registered_s_pattern_row_shift():
    s = RegistrationShifts(h_shift=(0, -64), h_shift_rev=(0, -32),
                           v_shift=(-64, 0), h_shift_rev_odd=1,
                           scan_pattern='S-Pattern')
    # even row uses h_shift, odd row uses h_shift_rev
    x0, _ = tile_position_registered(1, 0, 2, 2, 512, 512, s)
    x1, _ = tile_position_registered(1, 1, 2, 2, 512, 512, s)
    assert x0 == 448 and x1 == 480


def test_tile_position_coordinate():
    assert tile_position_coordinate(0.448, 0.0, 0.0, 0.0, 1.0) == (448, 0)
    assert tile_position_coordinate(1.0, 2.0, 0.5, 0.5, 0.5) == (1000, 3000)


def test_tile_crops_interior_vs_edges():
    s = RegistrationShifts(h_shift=(0, -64), v_shift=(-64, 0))
    # interior tile crops 32 on all sides
    assert tile_crops(1, 1, 3, 3, s) == (32, 32, 32, 32)
    # corner tile crops only inner edges
    assert tile_crops(0, 0, 3, 3, s) == (0, 32, 0, 32)
    assert tile_crops(2, 2, 3, 3, s) == (32, 0, 32, 0)


def test_tile_crops_mixed_shifts():
    s = RegistrationShifts(h_shift=(10, -64), v_shift=(-64, -8))
    # y trim = (64//2) - 10//2 = 32-5 = 27 ; x trim = (64//2) - 8//2 = 28
    assert tile_crops(1, 1, 3, 3, s) == (27, 27, 28, 28)


def test_tile_crops_no_registration_overlap():
    s = RegistrationShifts(h_shift=(0, 10), v_shift=(5, 0))  # positive = gap
    assert tile_crops(1, 1, 3, 3, s) == (0, 0, 0, 0)


def test_clamp_tile_extent():
    assert clamp_tile_extent(900, 900, 512, 512, 960, 960) == (960, 960)
    assert clamp_tile_extent(0, 0, 512, 512, 960, 960) == (512, 512)


def test_grid_center_pair_indices():
    assert grid_center_pair_indices(2) == 0
    assert grid_center_pair_indices(3) == 1
    assert grid_center_pair_indices(4) == 1
    assert grid_center_pair_indices(5) == 2
