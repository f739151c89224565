#!/usr/bin/env python
"""Score R2DM-style baseline dumps; mirrors
``tools/evaluation/evaluate_r2dm.py`` (:24-215): a directory of (5, H, W)
``.pth`` range-image tensors [depth, x, y, z, reflectance] is masked to the
LiDARGen depth window (0.5, 63), scored with RangeNet 'lidargen' image
features (FRD), PointNet features over the flattened ``xyz · mask / 80``
clouds (FPD) and BEV histograms (JSD/MMD vs a ``random.Random(0)``-shuffled
10k subsample of the real arm), and written as the reference's nested JSON
``{img, pts, bev, info}``.

The real arm comes from ``--real-dir``: either real ``.pth`` dumps or point
files (.txt/.npy/.bin, projected to the model resolution); its features are
cached to ``real_set_{H}x{W}.pkl`` like the reference (:99-133).

Usage:
  python tools/evaluate_r2dm.py --sample-dir generated_results/r2dm \
      --real-dir data/real_clouds --pretrained-root pretrained_models/evaluation
"""

import argparse
import hashlib
import json
import pickle
import random
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from lidarcrafter_tpu.utils.progress import Bar  # noqa: E402

# LiDARGen depth window lives in sample_io (one authoritative copy);
# cf. evaluate_r2dm.py:24-26
from lidarcrafter_tpu.utils.sample_io import MAX_DEPTH, MIN_DEPTH  # noqa: E402

DATASET_MAX_DEPTH = 80.0


def _gen_image(path, H, W):
    """One gen dump → masked (5, H, W) image + (H, W) mask
    (``Samples.__getitem__``, :38-44)."""
    from lidarcrafter_tpu.utils.sample_io import _nearest_exact_chw, load_pth_image

    img = load_pth_image(path)
    if img.shape[0] < 5:
        img = np.concatenate(
            [img, np.zeros((5 - img.shape[0], *img.shape[1:]), np.float32)]
        )
    if img.shape[1:] != (H, W):
        img = _nearest_exact_chw(img, (H, W))
    mask = ((img[0] > MIN_DEPTH) & (img[0] < MAX_DEPTH)).astype(np.float32)
    return img[:5] * mask[None], mask


def _real_image(path, H, W, min_depth, max_depth):
    """One real sample → masked (5, H, W) image + mask (the reference's real
    loop, :108-113: resize to model resolution, then AND the depth window)."""
    from lidarcrafter_tpu.ops.projection import points_to_range_image
    from lidarcrafter_tpu.utils.sample_io import load_point_file

    if Path(path).suffix == ".pth":
        return _gen_image(path, H, W)
    pts = load_point_file(path)
    if pts.shape[1] < 4:
        pts = np.concatenate([pts, np.zeros((len(pts), 1), np.float32)], 1)
    rimg = np.asarray(
        points_to_range_image(
            pts[:, :4], H=H, W=W, min_depth=min_depth, max_depth=max_depth
        )
    )  # (H, W, 6): x, y, z, remission, depth, valid
    depth, valid = rimg[..., 4], rimg[..., 5]
    mask = (valid > 0) & (depth > MIN_DEPTH) & (depth < MAX_DEPTH)
    img = np.stack([depth, rimg[..., 0], rimg[..., 1], rimg[..., 2], rimg[..., 3]])
    return (img * mask[None]).astype(np.float32), mask.astype(np.float32)


def _extract(images, rangenet_apply, pointnet_apply, batch_size, with_img):
    """Feature loop over an iterable of masked (5, H, W) images (the
    depth-window mask is already multiplied in by the loaders); returns dict
    of stacked numpy features (:106-133 / :146-166)."""
    import jax.numpy as jnp

    from lidarcrafter_tpu.ops.bev import point_cloud_to_histogram

    out = {"img_feats": [], "pts_feats": [], "bev_hists": []}
    batch = []

    def flush():
        if not batch:
            return
        imgs = np.stack(batch)  # (B, 5, H, W)
        n = len(imgs)
        if n < batch_size:  # pad to the jitted batch shape, slice after
            imgs = np.concatenate(
                [imgs, np.zeros((batch_size - n, *imgs.shape[1:]), np.float32)]
            )
        nhwc = jnp.asarray(np.transpose(imgs, (0, 2, 3, 1)))
        if with_img and rangenet_apply is not None:
            out["img_feats"].append(np.asarray(rangenet_apply(nhwc))[:n])
        # xyz · mask flattened — zeros kept, like the reference (:120,:158)
        clouds = np.transpose(imgs[:, 1:4], (0, 2, 3, 1)).reshape(len(imgs), -1, 3)
        for cloud in clouds[:n]:
            out["bev_hists"].append(
                np.asarray(point_cloud_to_histogram(jnp.asarray(cloud)))
            )
        if pointnet_apply is not None:
            out["pts_feats"].append(
                np.asarray(pointnet_apply(jnp.asarray(clouds) / DATASET_MAX_DEPTH))[:n]
            )
        batch.clear()

    for img in images:
        batch.append(img)
        if len(batch) == batch_size:
            flush()
    flush()
    return {
        k: (np.concatenate(v) if k != "bev_hists" else np.stack(v)) if v else None
        for k, v in out.items()
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--sample-dir", required=True, help="dir of gen .pth dumps")
    p.add_argument("--real-dir", required=True,
                   help="real arm: .pth dumps or point files")
    p.add_argument("--pretrained-root", default=None,
                   help="eval-backbone checkpoints ({root}/{dataset}/rangenet, "
                        "pointnet*.pth)")
    p.add_argument("--dataset", default="32", help="rangenet weights tag")
    p.add_argument("--resolution", type=int, nargs=2, default=(32, 1024))
    p.add_argument("--min-depth", type=float, default=1.45)
    p.add_argument("--max-depth", type=float, default=80.0)
    p.add_argument("--no-reflectance", action="store_true",
                   help="skip the img branch (cfg.data.train_reflectance=False)")
    p.add_argument("--random-extractors", action="store_true",
                   help="random-init extractors (pipeline smoke)")
    p.add_argument("--cache-dir", default=None,
                   help="real-set feature cache dir (default: sample dir parent)")
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--limit", type=int, default=10_000,
                   help="cap per arm (reference caps gen at 10k, :35)")
    p.add_argument("--num-sample", type=int, default=10_000,
                   help="real BEV-hist subsample for jsd/mmd (:195-197)")
    p.add_argument("-o", "--output", default=None)
    args = p.parse_args()

    import jax.numpy as jnp

    from lidarcrafter_tpu.metrics.bev import compute_jsd_2d, compute_mmd_2d
    from lidarcrafter_tpu.metrics.distribution import (
        compute_frechet_distance,
        compute_squared_mmd,
    )
    from lidarcrafter_tpu.utils.sample_io import list_sample_files

    H, W = args.resolution
    with_img = not args.no_reflectance

    rangenet_apply = pointnet_apply = None
    if args.random_extractors:
        from lidarcrafter_tpu.metrics import pretrained

        rangenet_apply = pretrained.random_rangenet_lidargen() if with_img else None
        pointnet_apply = pretrained.random_pointnet()
    elif args.pretrained_root:
        from lidarcrafter_tpu.metrics import pretrained

        if with_img:
            rangenet_apply = pretrained.load_rangenet_lidargen(
                args.pretrained_root, args.dataset
            )
        pointnet_apply = pretrained.load_pointnet(args.pretrained_root)

    results = {"img": {}, "pts": {}, "bev": {}, "info": {}}
    results["info"]["directory"] = args.sample_dir

    # real arm, cached like the reference (:99-133) — but keyed on everything
    # the features depend on (extractors, real dir, limit, depth window), so
    # a smoke run with --random-extractors can never poison a pretrained run
    cache_dir = Path(args.cache_dir or Path(args.sample_dir).parent)
    cache_dir.mkdir(parents=True, exist_ok=True)
    key = hashlib.sha1("|".join([
        str(Path(args.real_dir).resolve()), str(args.limit),
        "rand" if args.random_extractors else (args.pretrained_root or "none"),
        args.dataset, "img" if with_img else "noimg",
        f"{args.min_depth}-{args.max_depth}",
    ]).encode()).hexdigest()[:10]
    cache = cache_dir / f"real_set_{H}x{W}_{key}.pkl"
    if cache.exists():
        print(f"found cached {cache}")
        real_set = pickle.load(open(cache, "rb"))
    else:
        real_files = list_sample_files(args.real_dir, args.limit)
        if not real_files:
            raise SystemExit(f"no real samples in {args.real_dir}")
        real_set = _extract(
            Bar.wrap(
                (_real_image(f, H, W, args.min_depth, args.max_depth)[0]
                 for f in real_files),
                desc="real", total=len(real_files),
            ),
            rangenet_apply, pointnet_apply, args.batch_size, with_img,
        )
        pickle.dump(real_set, open(cache, "wb"))
    results["info"]["#real"] = len(real_set["bev_hists"])

    # gen arm (:141-173)
    gen_files = sorted(Path(args.sample_dir).glob("*.pth"))[: args.limit]
    if not gen_files:
        raise SystemExit(f"no .pth dumps in {args.sample_dir}")
    gen_set = _extract(
        Bar.wrap((_gen_image(f, H, W)[0] for f in gen_files),
                 desc="gen", total=len(gen_files)),
        rangenet_apply, pointnet_apply, args.batch_size, with_img,
    )
    results["info"]["#fake"] = len(gen_set["bev_hists"])

    # metrics (:180-207)
    if with_img and real_set["img_feats"] is not None and gen_set["img_feats"] is not None:
        results["img"]["frechet_distance"] = float(
            compute_frechet_distance(real_set["img_feats"], gen_set["img_feats"])
        )
        results["img"]["squared_mmd"] = float(
            compute_squared_mmd(real_set["img_feats"], gen_set["img_feats"])
        )
    if real_set["pts_feats"] is not None and gen_set["pts_feats"] is not None:
        results["pts"]["frechet_distance"] = float(
            compute_frechet_distance(real_set["pts_feats"], gen_set["pts_feats"])
        )
        results["pts"]["squared_mmd"] = float(
            compute_squared_mmd(real_set["pts_feats"], gen_set["pts_feats"])
        )

    perm = list(range(len(real_set["bev_hists"])))
    random.Random(0).shuffle(perm)
    perm = perm[: args.num_sample]
    real_hists = jnp.asarray(real_set["bev_hists"][perm], jnp.float32)
    gen_hists = jnp.asarray(gen_set["bev_hists"], jnp.float32)
    results["bev"]["jsd"] = float(compute_jsd_2d(real_hists, gen_hists))
    results["bev"]["mmd"] = float(compute_mmd_2d(real_hists, gen_hists))

    print(json.dumps(results, indent=2))
    out = args.output or (str(Path(args.sample_dir)) + "_results.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=4)
    print(f"saved {out}")


if __name__ == "__main__":
    main()
