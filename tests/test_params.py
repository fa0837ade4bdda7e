import json
import os

import pytest

from image_stitcher_tpu.params import StitchingParameters, EngineOptions


def test_defaults_match_reference_schema(tmp_path):
    p = StitchingParameters(input_folder=str(tmp_path))
    assert p.output_format == '.ome.zarr'
    assert p.apply_flatfield is False
    assert p.use_registration is False
    assert p.registration_channel == ''
    assert p.registration_z_level == 0
    assert p.dynamic_registration is False
    assert p.scan_pattern == 'Unidirectional'
    assert p.merge_timepoints is False
    assert p.merge_hcs_regions is False


def test_input_folder_becomes_absolute(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    p = StitchingParameters(input_folder="rel")
    assert os.path.isabs(p.input_folder)


def test_validate_rejects_bad_values(tmp_path):
    p = StitchingParameters(input_folder=str(tmp_path), output_format=".zarr")
    with pytest.raises(ValueError):
        p.validate()
    p = StitchingParameters(input_folder=str(tmp_path), scan_pattern="Snake")
    with pytest.raises(ValueError):
        p.validate()
    p = StitchingParameters(input_folder=str(tmp_path / "nope"))
    with pytest.raises(ValueError):
        p.validate()
    p = StitchingParameters(input_folder=str(tmp_path), use_registration=True,
                            registration_z_level=-1)
    with pytest.raises(ValueError):
        p.validate()
    StitchingParameters(input_folder=str(tmp_path)).validate()


def test_json_round_trip(tmp_path):
    p = StitchingParameters(input_folder=str(tmp_path), use_registration=True,
                            registration_channel="488", merge_timepoints=True)
    jp = str(tmp_path / "params.json")
    p.to_json(jp)
    q = StitchingParameters.from_json(jp)
    assert q.to_dict() == p.to_dict()


def test_from_dict_ignores_unknown_keys(tmp_path):
    q = StitchingParameters.from_dict(
        {"input_folder": str(tmp_path), "bogus_key": 1, "apply_flatfield": True})
    assert q.apply_flatfield is True


def test_stitched_folder_shape(tmp_path):
    p = StitchingParameters(input_folder=str(tmp_path))
    sf = p.stitched_folder
    assert sf.startswith(str(tmp_path) + "_stitched_")


def test_engine_options_validate():
    EngineOptions().validate()
    with pytest.raises(ValueError):
        EngineOptions(blend_method="alpha").validate()
    with pytest.raises(ValueError):
        EngineOptions(pyramid_downsample="bicubic").validate()
