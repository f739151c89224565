"""Arg-surface check for the 4D rollout driver (``tools/sample_temporal.py``).

A full subprocess smoke (reduced resolution AND --model-channels 32) was
measured at >15 min on this 1-core environment — the compile cost is
graph-size-, not width-, dominated (two UNet stacks + two chunked rollout
programs), so the CLI body is exercised through its building blocks instead:
the rollout path incl. streaming chunks in tests/test_rollout_pipeline.py and
the config plumbing here.
"""

import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def test_cli_exposes_serving_flags():
    env = dict(os.environ, LCT_PLATFORM="cpu")
    r = subprocess.run(
        [sys.executable, "tools/sample_temporal.py", "--help"],
        cwd=REPO, capture_output=True, text=True, timeout=120, env=env,
    )
    assert r.returncode == 0, r.stderr[-1000:]
    for flag in ("--stream-chunks", "--resolution", "--model-channels",
                 "--mode", "--num-steps"):
        assert flag in r.stdout, flag
    assert "dpmpp_2m" in r.stdout


def test_model_channel_override_keeps_widths_consistent():
    """The --model-channels shrink must propagate to the UNet widths AND the
    layout encoder's xf_proj output (added onto the 4x-channels time
    embedding) — the mismatch JAX would otherwise raise is a broadcast error
    deep in layout_unet."""
    from lidarcrafter_tpu.configs import get_config

    cfg = get_config("nuscenes-box-layout-v6")
    mc = 32
    for key in ("model_channels", "encoder_channels", "num_head_channels"):
        if key in cfg.model.params:
            cfg.model.params[key] = mc
    if "output_dim" in cfg.condition_model.params:
        cfg.condition_model.params["output_dim"] = 4 * mc
    assert cfg.model.params["model_channels"] == mc
    assert cfg.condition_model.params["output_dim"] == 4 * mc
