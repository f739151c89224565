"""Browser viewer (tools/viewer.py): server round-trip smokes at tiny
resolution — the headless replacement for the reference's PyQt5 vis tool."""

import json
import sys
import threading
import urllib.request
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))

import viewer  # noqa: E402


@pytest.fixture(scope="module")
def server():
    httpd = viewer.serve(port=0, resolution=(32, 64))
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{httpd.server_address[1]}"
    httpd.shutdown()


def _post(url, payload):
    req = urllib.request.Request(
        url + "/api/sample", data=json.dumps(payload).encode(), method="POST"
    )
    with urllib.request.urlopen(req, timeout=600) as r:
        return json.loads(r.read())


def test_index_page(server):
    with urllib.request.urlopen(server + "/", timeout=30) as r:
        html = r.read().decode()
    assert "lidarcrafter-tpu viewer" in html
    for name in viewer.CONFIGS:
        assert name in html


def test_uncond_sample_roundtrip(server):
    out = _post(server, {"config": "nuscenes-unet-uncond", "steps": 2,
                         "mode": "ddim", "seed": 1})
    assert len(out["depth"]) == 32 and len(out["depth"][0]) == 64
    assert len(out["reflectance"]) == 32
    assert out["restored_checkpoint"] is False
    assert all(len(p) == 3 for p in out["points"][:5])


def test_layout_cond_sample_with_boxes(server):
    boxes = [[10, 3, -0.5, 4.5, 2, 1.7, 0.3, 1],
             [18, -6, -0.4, 4.2, 1.9, 1.6, -1.2, 2]]
    out = _post(server, {"config": "nuscenes-box-layout-v6", "steps": 2,
                         "mode": "ddim", "seed": 0, "boxes": boxes})
    assert len(out["depth"]) == 32 and len(out["depth"][0]) == 64


def test_autoreg_sample_roundtrip(server):
    out = _post(server, {"config": "nuscenes-auto-reg-v2", "steps": 2,
                         "mode": "ddim", "seed": 0})
    assert len(out["depth"]) == 32 and len(out["depth"][0]) == 64


def test_unknown_config_is_client_error(server):
    req = urllib.request.Request(
        server + "/api/sample",
        data=json.dumps({"config": "nope"}).encode(), method="POST",
    )
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req, timeout=30)
    assert e.value.code == 500
