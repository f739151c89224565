"""Point-cloud ops: semantics tests vs numpy brute force (CUDA refs can't run on CPU;
conventions extracted from the reference kernels — see docstrings in ops/points.py)."""

import numpy as np

import jax
import jax.numpy as jnp

from lidarcrafter_tpu.ops.bev import point_cloud_to_histogram
from lidarcrafter_tpu.ops.chamfer import chamfer_distance, chamfer_metric
from lidarcrafter_tpu.ops.points import (
    ball_query,
    farthest_point_sampling,
    gather_points,
    group_points,
    interpolation_weights,
    knn,
    points_in_boxes,
    three_interpolate,
    three_nn,
)


def _np_points_in_box(pts, box):
    """Brute force mirroring check_pt_in_box3d (roiaware_pool3d_kernel.cu:16-36)."""
    cx, cy, cz, dx, dy, dz, rz = box[:7]
    x, y, z = pts[:, 0] - cx, pts[:, 1] - cy, pts[:, 2] - cz
    if_z = np.abs(z) <= dz / 2.0
    cosa, sina = np.cos(-rz), np.sin(-rz)
    lx = x * cosa - y * sina
    ly = x * sina + y * cosa
    return if_z & (np.abs(lx) < dx / 2 + 1e-5) & (np.abs(ly) < dy / 2 + 1e-5)


def test_points_in_boxes_vs_bruteforce():
    rng = np.random.RandomState(0)
    pts = rng.uniform(-20, 20, (500, 3)).astype(np.float32)
    boxes = np.zeros((4, 7), np.float32)
    boxes[:, :3] = rng.uniform(-10, 10, (4, 3))
    boxes[:, 3:6] = rng.uniform(1, 8, (4, 3))
    boxes[:, 6] = rng.uniform(-np.pi, np.pi, 4)
    got = np.asarray(points_in_boxes(jnp.asarray(pts), jnp.asarray(boxes)))
    for i in range(4):
        want = _np_points_in_box(pts, boxes[i])
        np.testing.assert_array_equal(got[i], want)
    assert got.sum() > 0  # some points actually inside


def test_fps_matches_bruteforce():
    rng = np.random.RandomState(1)
    xyz = rng.randn(1, 64, 3).astype(np.float32)
    S = 8
    got = np.asarray(farthest_point_sampling(jnp.asarray(xyz), S))[0]

    # brute force (sampling_gpu.cu semantics)
    pts = xyz[0]
    idxs = [0]
    min_d = np.full(64, 1e10)
    for _ in range(S - 1):
        d = np.sum((pts - pts[idxs[-1]]) ** 2, axis=1)
        min_d = np.minimum(min_d, d)
        idxs.append(int(np.argmax(min_d)))
    np.testing.assert_array_equal(got, idxs)


def test_fps_respects_mask():
    rng = np.random.RandomState(2)
    xyz = rng.randn(1, 32, 3).astype(np.float32)
    mask = np.ones((1, 32), bool)
    mask[0, 16:] = False
    got = np.asarray(farthest_point_sampling(jnp.asarray(xyz), 8, jnp.asarray(mask)))
    assert (got < 16).all()


def test_ball_query_semantics():
    """First nsample in-radius in index order; empties filled with first hit."""
    xyz = np.zeros((1, 6, 3), np.float32)
    xyz[0, :, 0] = [0.0, 0.1, 0.2, 5.0, 0.15, 0.05]
    q = np.zeros((1, 1, 3), np.float32)
    idx = np.asarray(ball_query(jnp.asarray(q), jnp.asarray(xyz), 0.3, 3))[0, 0]
    # in-radius in index order: 0, 1, 2, 4, 5 → first 3 = [0, 1, 2]
    np.testing.assert_array_equal(idx, [0, 1, 2])

    idx = np.asarray(ball_query(jnp.asarray(q), jnp.asarray(xyz), 0.12, 4))[0, 0]
    # in-radius: 0, 1, 4(0.15? no >0.12), 5 → order: 0, 1, 5; slot 3 filled w/ first (0)
    np.testing.assert_array_equal(idx, [0, 1, 5, 0])

    # no points in radius → zeros
    far_q = np.full((1, 1, 3), 100.0, np.float32)
    idx = np.asarray(ball_query(jnp.asarray(far_q), jnp.asarray(xyz), 0.1, 2))[0, 0]
    np.testing.assert_array_equal(idx, [0, 0])


def test_knn_three_nn_interpolate():
    rng = np.random.RandomState(3)
    xyz = rng.randn(2, 32, 3).astype(np.float32)
    q = rng.randn(2, 5, 3).astype(np.float32)
    d2, idx = knn(jnp.asarray(q), jnp.asarray(xyz), 4)
    # brute-force check batch 0, query 0
    bd = np.sum((q[0, 0] - xyz[0]) ** 2, axis=1)
    order = np.argsort(bd)[:4]
    np.testing.assert_allclose(np.asarray(d2)[0, 0], np.sort(bd)[:4], rtol=1e-4)
    assert set(np.asarray(idx)[0, 0].tolist()) == set(order.tolist())

    dist, idx3 = three_nn(jnp.asarray(q), jnp.asarray(xyz))
    w = interpolation_weights(dist)
    feats = rng.randn(2, 8, 32).astype(np.float32)
    out = three_interpolate(jnp.asarray(feats), idx3, w)
    assert out.shape == (2, 8, 5)
    # weights sum to 1 → interpolation of constant features is constant
    const = np.ones((2, 1, 32), np.float32)
    out_c = three_interpolate(jnp.asarray(const), idx3, w)
    np.testing.assert_allclose(np.asarray(out_c), 1.0, rtol=1e-5)


def test_gather_group():
    feats = jnp.arange(2 * 3 * 10).reshape(2, 3, 10).astype(jnp.float32)
    idx = jnp.asarray([[0, 5], [9, 1]], dtype=jnp.int32)
    out = gather_points(feats, idx)
    np.testing.assert_allclose(np.asarray(out)[0, :, 0], np.asarray(feats)[0, :, 0])
    np.testing.assert_allclose(np.asarray(out)[1, :, 1], np.asarray(feats)[1, :, 1])
    gidx = jnp.asarray([[[0, 1], [2, 3]], [[4, 5], [6, 7]]], dtype=jnp.int32)
    out = group_points(feats, gidx)
    assert out.shape == (2, 3, 2, 2)


def test_chamfer_vs_bruteforce():
    rng = np.random.RandomState(4)
    x = rng.randn(2, 50, 3).astype(np.float32)
    y = rng.randn(2, 70, 3).astype(np.float32)
    d1, d2, i1, i2 = chamfer_distance(jnp.asarray(x), jnp.asarray(y), chunk=16)
    D = np.sum((x[0][:, None] - y[0][None]) ** 2, axis=-1)
    np.testing.assert_allclose(np.asarray(d1)[0], D.min(1), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(d2)[0], D.min(0), rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(i1)[0], D.argmin(1))
    np.testing.assert_array_equal(np.asarray(i2)[0], D.argmin(0))
    cd = float(chamfer_metric(jnp.asarray(x), jnp.asarray(y)))
    want = 0.0
    for b in range(2):
        Db = np.sum((x[b][:, None] - y[b][None]) ** 2, axis=-1)
        want += (Db.min(1).mean() + Db.min(0).mean()) / 2
    np.testing.assert_allclose(cd, want / 2, rtol=1e-4)


def test_chamfer_masked():
    rng = np.random.RandomState(5)
    x_full = rng.randn(1, 30, 3).astype(np.float32)
    y = rng.randn(1, 40, 3).astype(np.float32)
    x_pad = np.concatenate([x_full, np.full((1, 10, 3), 1e3, np.float32)], axis=1)
    xm = np.concatenate([np.ones((1, 30), bool), np.zeros((1, 10), bool)], axis=1)
    got = float(chamfer_metric(jnp.asarray(x_pad), jnp.asarray(y), jnp.asarray(xm), None))
    want = float(chamfer_metric(jnp.asarray(x_full), jnp.asarray(y)))
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_bev_histogram_parity():
    import torch
    from tests.reference_loader import _load, REF

    ref_bev = _load(REF / "lidargen/metrics/bev.py", "ref_bev")
    rng = np.random.RandomState(6)
    pts = rng.uniform(-85, 85, (20_000, 3)).astype(np.float32)
    want = ref_bev.point_cloud_to_histogram(torch.from_numpy(pts)).numpy()
    got = np.asarray(point_cloud_to_histogram(jnp.asarray(pts)))
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_roiaware_pool3d():
    from lidarcrafter_tpu.ops.roiaware import roiaware_pool3d

    # one axis-aligned box at origin, 2x2x2 grid
    rois = jnp.asarray([[0.0, 0, 0, 2, 2, 2, 0]])
    pts = jnp.asarray([
        [-0.5, -0.5, -0.5],   # voxel (0,0,0)
        [0.5, 0.5, 0.5],      # voxel (1,1,1)
        [0.6, 0.6, 0.6],      # voxel (1,1,1)
        [10.0, 0, 0],         # outside
    ])
    feats = jnp.asarray([[1.0], [2.0], [4.0], [100.0]])
    out = roiaware_pool3d(rois, pts, feats, out_size=2, pool_method="max")
    assert out.shape == (1, 2, 2, 2, 1)
    assert float(out[0, 0, 0, 0, 0]) == 1.0
    assert float(out[0, 1, 1, 1, 0]) == 4.0
    assert float(out[0, 0, 1, 0, 0]) == 0.0  # empty voxel
    out_avg = roiaware_pool3d(rois, pts, feats, out_size=2, pool_method="avg")
    assert float(out_avg[0, 1, 1, 1, 0]) == 3.0

    # rotated box: local frame binning
    rois_rot = jnp.asarray([[0.0, 0, 0, 4, 2, 2, np.pi / 2]])
    pts2 = jnp.asarray([[0.0, 1.5, 0.0]])  # along +y = local +x after -90° derot
    out2 = roiaware_pool3d(rois_rot, pts2, jnp.asarray([[7.0]]), out_size=(2, 1, 1))
    assert float(out2[0, 1, 0, 0, 0]) == 7.0


def test_stacked_ops_roundtrip():
    from lidarcrafter_tpu.ops.stack import (
        padded_to_stack,
        stack_ball_query,
        stack_farthest_point_sampling,
        stack_three_nn,
        stack_to_padded,
    )

    rng = np.random.RandomState(0)
    cnt = np.array([5, 3])
    flat = rng.randn(8, 3).astype(np.float32)
    padded, mask = stack_to_padded(jnp.asarray(flat), jnp.asarray(cnt), max_count=6)
    assert padded.shape == (2, 6, 3)
    assert int(mask.sum()) == 8
    back = np.asarray(padded_to_stack(padded, mask, 8))
    np.testing.assert_allclose(back, flat, atol=1e-6)

    # FPS: flat indices land inside each batch segment
    idx = np.asarray(
        stack_farthest_point_sampling(jnp.asarray(flat), jnp.asarray(cnt), 2, max_count=6)
    )
    assert idx.shape == (4,)
    assert (idx[:2] < 5).all() and (idx[2:] >= 5).all() and (idx[2:] < 8).all()

    # ball query: neighbors of each query stay within its own segment
    q = flat[[0, 5]]
    qcnt = np.array([1, 1])
    nidx = np.asarray(
        stack_ball_query(jnp.asarray(q), jnp.asarray(qcnt), jnp.asarray(flat),
                         jnp.asarray(cnt), radius=100.0, nsample=3, max_count=6)
    )
    assert nidx.shape == (2, 3)
    assert (nidx[0] < 5).all() and (nidx[1] >= 5).all()

    dist, tidx = stack_three_nn(
        jnp.asarray(q), jnp.asarray(qcnt), jnp.asarray(flat), jnp.asarray(cnt),
        max_count=6,
    )
    assert np.asarray(dist).shape == (2, 3)
    # nearest of q==flat[0] within segment 0 is itself (distance 0)
    assert float(np.asarray(dist)[0, 0]) < 1e-6
    assert int(np.asarray(tidx)[0, 0]) == 0


def test_voxel_indices_grid_and_query():
    """voxel_query semantics vs a numpy replay of the CUDA kernel loop."""
    from lidarcrafter_tpu.ops.stack import voxel_indices_grid, voxel_query

    rng = np.random.RandomState(11)
    N, B, Z, Y, X = 40, 2, 4, 5, 6
    coords = np.stack(
        [
            rng.randint(0, B, N),
            rng.randint(0, Z, N),
            rng.randint(0, Y, N),
            rng.randint(0, X, N),
        ],
        1,
    ).astype(np.int32)
    # dedupe voxels (grid stores one row per cell)
    _, keep = np.unique(
        coords[:, 0] * 1000 + coords[:, 1] * 100 + coords[:, 2] * 10 + coords[:, 3],
        return_index=True,
    )
    coords = coords[np.sort(keep)]
    N = len(coords)
    xyz = coords[:, [3, 2, 1]].astype(np.float32) + rng.rand(N, 3).astype(np.float32) * 0.3

    grid = np.asarray(voxel_indices_grid(jnp.asarray(coords), (B, Z, Y, X)))
    for i, c in enumerate(coords):
        assert grid[c[0], c[1], c[2], c[3]] == i

    M, S, R = 10, 4, 1.6
    qsel = rng.choice(N, M, replace=False)
    new_coords = coords[qsel]
    new_xyz = xyz[qsel] + 0.1
    idx, empty = voxel_query(
        jnp.asarray(new_coords), jnp.asarray(new_xyz), jnp.asarray(xyz),
        jnp.asarray(grid), query_range=(1, 1, 1), radius=R, nsample=S,
    )
    idx, empty = np.asarray(idx), np.asarray(empty)

    for m in range(M):
        found = []
        for dz in range(-1, 2):
            for dy in range(-1, 2):
                for dx in range(-1, 2):
                    z, y, x = new_coords[m, 1] + dz, new_coords[m, 2] + dy, new_coords[m, 3] + dx
                    if not (0 <= z < Z and 0 <= y < Y and 0 <= x < X):
                        continue
                    j = grid[new_coords[m, 0], z, y, x]
                    if j < 0:
                        continue
                    if np.sum((xyz[j] - new_xyz[m]) ** 2) <= R * R:
                        found.append(j)
        if not found:
            assert empty[m]
        else:
            assert not empty[m]
            want = (found + [found[0]] * S)[:S]
            np.testing.assert_array_equal(idx[m], want)


def test_neighbor_voxel_sa_pool_shapes():
    from lidarcrafter_tpu.models.voxel_pool import NeighborVoxelSAPool
    from lidarcrafter_tpu.ops.stack import voxel_indices_grid

    rng = np.random.RandomState(12)
    N, B, Z, Y, X, C = 30, 1, 4, 4, 4, 8
    coords = np.unique(
        np.stack([np.zeros(N, np.int32), rng.randint(0, Z, N),
                  rng.randint(0, Y, N), rng.randint(0, X, N)], 1),
        axis=0,
    )
    N = len(coords)
    xyz = coords[:, [3, 2, 1]].astype(np.float32)
    feats = rng.randn(N, C).astype(np.float32)
    grid = voxel_indices_grid(jnp.asarray(coords), (B, Z, Y, X))
    new_coords = coords[:, [0, 3, 2, 1]][:5]  # module reorders back to bzyx
    model = NeighborVoxelSAPool(
        query_ranges=[[1, 1, 1], [2, 2, 2]], radii=[2.0, 4.0],
        nsamples=[4, 8], mlps=[[C, 16, 12], [C, 16, 20]],
    )
    args = (jnp.asarray(xyz), jnp.asarray(xyz[:5]), jnp.asarray(new_coords),
            jnp.asarray(feats), grid)
    params = model.init(jax.random.PRNGKey(0), *args)
    out = model.apply(params, *args)
    assert out.shape == (5, 32)
    assert np.isfinite(np.asarray(out)).all()


def test_vector_pool_matches_numpy_replay():
    """vector_pool vs a numpy replay of vector_pool_kernel_stack."""
    from lidarcrafter_tpu.ops.stack import vector_pool

    rng = np.random.RandomState(13)
    N, M, C, Ce = 50, 7, 6, 3
    gx = gy = gz = 2
    G, d = gx * gy * gz, 1.5
    xyz = rng.uniform(-4, 4, (N, 3)).astype(np.float32)
    feats = rng.randn(N, C).astype(np.float32)
    smask = np.arange(N) < 45
    centers = rng.uniform(-3, 3, (M, 3)).astype(np.float32)
    nmask = np.arange(M) < 6

    nf, nl, cnt = vector_pool(
        jnp.asarray(xyz), jnp.asarray(feats), jnp.asarray(smask),
        jnp.asarray(centers), jnp.asarray(nmask),
        num_grid=(gx, gy, gz), max_neighbour_distance=d, num_c_each=Ce,
        chunk=4,
    )
    nf, nl, cnt = np.asarray(nf), np.asarray(nl), np.asarray(cnt)

    folded = feats.reshape(N, C // Ce, Ce).sum(1)
    for m in range(M):
        want_f = np.zeros((G, Ce)); want_x = np.zeros((G, 3)); want_c = np.zeros(G)
        if nmask[m]:
            for k in range(N):
                if not smask[k]:
                    continue
                loc = xyz[k] - centers[m]
                if np.any(np.abs(loc) > d):
                    continue
                gi = (int((loc[0] + d) // (2 * d / gx)) * gy * gz
                      + int((loc[1] + d) // (2 * d / gy)) * gz
                      + int((loc[2] + d) // (2 * d / gz)))
                gi = min(max(gi, 0), G - 1)
                want_f[gi] += folded[k]; want_x[gi] += loc; want_c[gi] += 1
        norm = np.maximum(want_c, 1e-6)[:, None]
        np.testing.assert_allclose(nf[m], (want_f / norm).reshape(-1), rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(nl[m], (want_x / norm).reshape(-1), rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(cnt[m], want_c)
