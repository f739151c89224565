"""RangeNet kNN post-processing parity vs the executed reference module."""

import sys
import types

import numpy as np
import torch

import jax.numpy as jnp

from lidarcrafter_tpu.metrics.extractor.knn_postproc import (
    inv_gaussian_window,
    knn_postprocess,
)
from tests.reference_loader import REF


def _load_ref_knn():
    sys.modules.setdefault("__init__", types.ModuleType("__init__"))  # booger
    src = (REF / "lidargen/metrics/models/rangenet/postproc/KNN.py").read_text()
    mod = types.ModuleType("ref_knn")
    mod.__dict__["__name__"] = "ref_knn"
    exec(compile(src, "KNN.py", "exec"), mod.__dict__)
    return mod


def test_inv_gaussian_window_matches_reference():
    ref = _load_ref_knn()
    for s, sig in ((5, 1.0), (7, 2.0), (3, 0.8)):
        want = (1 - ref.get_gaussian_kernel(s, sig)).numpy().reshape(-1)
        got = inv_gaussian_window(s, sig)
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)


def test_knn_postprocess_parity():
    ref = _load_ref_knn()
    H, W, P, ncls = 16, 64, 500, 9
    r = np.random.RandomState(0)
    proj_range = (r.rand(H, W) * 50).astype(np.float32)
    proj_range[r.rand(H, W) < 0.1] = -1.0  # invalid pixels
    proj_argmax = r.randint(0, ncls, (H, W)).astype(np.int64)
    px = r.randint(0, W, (P,)).astype(np.int64)
    py = r.randint(0, H, (P,)).astype(np.int64)
    unproj_range = (r.rand(P) * 50).astype(np.float32)

    params = {"knn": 5, "search": 5, "sigma": 1.0, "cutoff": 1.0}
    tknn = ref.KNN(params, ncls)
    with torch.no_grad():
        want = tknn(
            torch.from_numpy(proj_range), torch.from_numpy(unproj_range),
            torch.from_numpy(proj_argmax), torch.from_numpy(px),
            torch.from_numpy(py),
        ).numpy().reshape(-1)

    got = np.asarray(knn_postprocess(
        jnp.asarray(proj_range), jnp.asarray(unproj_range),
        jnp.asarray(proj_argmax.astype(np.int32)),
        jnp.asarray(px.astype(np.int32)), jnp.asarray(py.astype(np.int32)),
        knn=5, search=5, sigma=1.0, cutoff=1.0, nclasses=ncls,
    ))
    assert (got == want).mean() > 0.999  # exact up to fp ties in the top-k
    # and with cutoff disabled
    with torch.no_grad():
        tknn2 = ref.KNN({**params, "cutoff": 0}, ncls)
        want2 = tknn2(
            torch.from_numpy(proj_range), torch.from_numpy(unproj_range),
            torch.from_numpy(proj_argmax), torch.from_numpy(px),
            torch.from_numpy(py),
        ).numpy().reshape(-1)
    got2 = np.asarray(knn_postprocess(
        jnp.asarray(proj_range), jnp.asarray(unproj_range),
        jnp.asarray(proj_argmax.astype(np.int32)),
        jnp.asarray(px.astype(np.int32)), jnp.asarray(py.astype(np.int32)),
        knn=5, search=5, sigma=1.0, cutoff=0.0, nclasses=ncls,
    ))
    assert (got2 == want2).mean() > 0.999
