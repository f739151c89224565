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
    """The CLI's shrink helper (``configs.apply_reduced_topology``) must
    propagate to the BUILT modules: UNet widths AND the layout encoder's
    xf_proj output (added onto the 4x-channels time embedding) — an
    inconsistent pair raises a broadcast error deep in layout_unet."""
    from lidarcrafter_tpu.configs import apply_reduced_topology, get_config
    from lidarcrafter_tpu.training import build_diffusion_training

    cfg = apply_reduced_topology(
        get_config("nuscenes-box-layout-v6"),
        resolution=(32, 64), model_channels=32,
    )
    models, _, lidar_utils = build_diffusion_training(cfg)
    assert models["model"].model_channels == 32
    assert models["model"].encoder_channels == 32
    assert models["model"].num_head_channels == 32
    assert models["cond"].output_dim == 4 * 32
    assert tuple(models["cond"].feature_map_size) == (32, 64)
    assert tuple(lidar_utils.resolution) == (32, 64)
