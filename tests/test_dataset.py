"""Semantic-mask loader variants (Cotton threshold vs FruitDataset dispatch).

Reference semantics pinned here:
  * cotton_dataset.py:34-39 — grayscale, cv2.threshold(.., 3, 255, BINARY)
  * data/fruit_dataset.py:48-53 — .jpg labels binarise at 125, other
    formats are exact {0, 255} maps (semantics / 255)
"""
import numpy as np
import pytest
from PIL import Image

from cropnerf_tpu.data.dataset import (SEMANTIC_THRESHOLD, load_semantic_mask,
                                       resolve_semantic_threshold)


def _write(tmp_path, name, arr):
    p = tmp_path / name
    Image.fromarray(arr).save(p)
    return p


def test_cotton_threshold_is_3(tmp_path):
    arr = np.array([[0, 3, 4, 255]], dtype=np.uint8)
    p = _write(tmp_path, "label.png", arr)
    mask = load_semantic_mask(p)
    assert SEMANTIC_THRESHOLD == 3
    np.testing.assert_array_equal(mask, [[0, 0, 1, 1]])


def test_fruit_dispatch_png_any_nonzero(tmp_path):
    arr = np.array([[0, 1, 124, 255]], dtype=np.uint8)
    p = _write(tmp_path, "label.png", arr)
    mask = load_semantic_mask(p, threshold="fruit")
    np.testing.assert_array_equal(mask, [[0, 1, 1, 1]])


def test_fruit_dispatch_jpg_125(tmp_path):
    # constant-valued blocks survive JPEG compression exactly enough for a
    # deterministic check: all-240 image → all 1, all-100 → all 0
    hi = _write(tmp_path, "hi.jpg", np.full((16, 16), 240, np.uint8))
    lo = _write(tmp_path, "lo.jpg", np.full((16, 16), 100, np.uint8))
    assert load_semantic_mask(hi, threshold="fruit").all()
    assert not load_semantic_mask(lo, threshold="fruit").any()


def test_resolve_threshold():
    assert resolve_semantic_threshold("a/x.JPG", "fruit") == 125
    assert resolve_semantic_threshold("a/x.jpeg", "fruit") == 125
    assert resolve_semantic_threshold("a/x.png", "fruit") == 0
    assert resolve_semantic_threshold("a/x.png", 42) == 42


def test_missing_file_zero_mask(tmp_path):
    mask = load_semantic_mask(tmp_path / "nope.png", shape=(4, 5))
    assert mask.shape == (4, 5) and not mask.any()


def test_trainer_persists_threshold(tmp_path):
    """run_config.json round-trips the threshold so export/project stages
    rebuild the same masks (load_trainer_from_run)."""
    import json

    from test_trainer import write_synthetic_dataset

    from cropnerf_tpu.data.dataparser import DataparserConfig
    from cropnerf_tpu.models.config import PRESETS
    from cropnerf_tpu.train.trainer import Trainer

    data_dir = write_synthetic_dataset(tmp_path / "data", n=4, size=24)
    tr = Trainer(PRESETS["cropnerf-tiny"],
                 DataparserConfig(data_dir=data_dir,
                                  train_split_fraction=0.75),
                 tmp_path / "run", semantic_threshold="fruit")
    meta = json.loads((tmp_path / "run" / "run_config.json").read_text())
    assert meta["semantic_threshold"] == "fruit"
    del tr
