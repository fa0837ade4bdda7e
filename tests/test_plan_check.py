import numpy as np

from image_stitcher_tpu.io.readers import TileJob
from image_stitcher_tpu.utils.plan_check import (find_overlaps,
                                                 summarize_plan)


def J(c, z, y, x, crops=(0, 0, 0, 0)):
    return TileJob("f", -1, c, z, y, x, crops)


def test_disjoint_plan():
    jobs = [J(0, 0, 0, 0), J(0, 0, 0, 20), J(0, 0, 20, 0)]
    assert find_overlaps(jobs, 16, 16) == []
    assert "disjoint" in summarize_plan(jobs, 16, 16)


def test_overlap_detected_same_plane_only():
    jobs = [J(0, 0, 0, 0), J(0, 0, 8, 8), J(1, 0, 8, 8)]
    ov = find_overlaps(jobs, 16, 16)
    assert len(ov) == 1
    assert ov[0].plane == (0, 0)
    assert ov[0].rect == (8, 16, 8, 16)
    assert ov[0].area == 64
    assert "1 overlapping pair" in summarize_plan(jobs, 16, 16)


def test_crops_remove_overlap():
    # tiles abut after symmetric 4px crops: 16-wide at step 8 overlap 8,
    # each sheds 4 -> disjoint
    jobs = [J(0, 0, 0, 0, (0, 0, 0, 4)), J(0, 0, 0, 8, (0, 0, 4, 0))]
    assert find_overlaps(jobs, 16, 16) == []


def test_pipeline_reports_plan(tmp_path):
    import sys
    sys.path.insert(0, "tests")
    from fixtures import write_synthetic_acquisition
    from image_stitcher_tpu import EngineOptions, StitchingParameters
    from image_stitcher_tpu.models.pipeline import StitchPipeline
    from image_stitcher_tpu.utils.progress import ProgressReporter
    acq_dir = str(tmp_path / "acq")
    write_synthetic_acquisition(acq_dir, grid_cols=2, grid_rows=1,
                                tile_w=32, tile_h=32, overlap=8)
    msgs = []
    rep = ProgressReporter(status=lambda m, s=False: msgs.append(m))
    StitchPipeline(StitchingParameters(input_folder=acq_dir),
                   EngineOptions(validate_plan=True), rep).run()
    plan_msgs = [m for m in msgs if m.startswith("write plan")]
    assert plan_msgs and "overlapping" in plan_msgs[0]  # coordinate mode overlaps
