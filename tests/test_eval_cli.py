"""Eval CLI integration: shift-window TTA on the two-frame family
(VERDICT item 6; ref test.py:93-115) + per-sample artifact export."""
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

YAML = """\
USER_NAME: test
DATASET_NAME: synthetic
BACKBONE: swin_tiny_v2
DECODER: decoder_v2
MODEL_SCALE: 32
MAX_DEPTH: 10.0
CROP_HEIGHT: 32
CROP_WIDTH: 48
BATCH_SIZE: 1
SWIN:
  DEPTHS: [1, 1, 1, 1]
  WINDOW_SIZE: [4, 4, 4, 2]
  PRETRAIN_WINDOW_SIZE: [4, 4, 4, 2]
  USE_SHIFT: [true, true, false, false]
  DROP_PATH_RATE: 0.0
"""


@pytest.mark.parametrize("tta_flags", [["--shift-window-tta"]])
def test_eval_cli_two_frame_shift_window(tmp_path, tta_flags):
    cfg = tmp_path / "cfg.yaml"
    cfg.write_text(YAML)
    pngs = tmp_path / "pngs"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "eval.py"),
         "--config", str(cfg), "--synthetic", "--platform", "cpu",
         "--max-batches", "2", "--save-pngs", str(pngs)] + tta_flags,
        env=env, cwd=REPO, capture_output=True, text=True, timeout=1500)
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "shift-window" in proc.stdout
    assert "rmse" in proc.stdout
    # per-frame depth PNGs + pose txt exported for each sample
    names = sorted(os.listdir(pngs))
    assert "00000_d1.png" in names and "00000_d2.png" in names
    assert any(n.startswith("pose_00000") for n in names)
