"""Reference INI config loader tests (config_reader() parity)."""

import pytest

from tpupose.config_io import load_reference_config

REFERENCE_STYLE_INI = """
[param]
use_gpu = 1
GPUdeviceNumber = 0
modelID = 1
octave = 3
starting_range = 0.8
ending_range = 2
scale_search = [0.5, 1, 1.5, 2]
thre1 = 0.1
thre2 = 0.05
thre3 = 0.5
min_num = 4
mid_num = 10
crop_ratio = 2.5
bbox_ratio = 0.25

[model1]
caffemodel = ./model/coco/pose_iter_440000.caffemodel
deployFile = ./model/coco/pose_deploy.prototxt
description = COCO Pose56 Two-level Linevec
boxsize = 368
padValue = 128
np = 12
stride = 8
"""


def test_load_reference_ini(tmp_path):
    p = tmp_path / "config"
    p.write_text(REFERENCE_STYLE_INI)
    cfg = load_reference_config(str(p))
    assert cfg.inference.scale_search == (0.5, 1.0, 1.5, 2.0)
    assert cfg.inference.thre1 == 0.1
    assert cfg.inference.thre2 == 0.05
    assert cfg.inference.mid_num == 10
    assert cfg.model.boxsize == 368
    assert cfg.model.stride == 8
    assert cfg.model.pad_value == 128


def test_load_partial_and_missing(tmp_path):
    p = tmp_path / "config"
    p.write_text("[param]\nscale_search = 1\n")
    cfg = load_reference_config(str(p))
    assert cfg.inference.scale_search == (1.0,)
    assert cfg.inference.thre1 == 0.1  # default retained
    with pytest.raises(FileNotFoundError):
        load_reference_config(str(tmp_path / "nope"))
