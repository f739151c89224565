#!/usr/bin/env python
"""One-command evaluation driver; mirrors ``tools/evaluation/evaluate_our.py``
(:322-443): scene distribution metrics (frd/fpd/jsd/mmd + cd/emd +
frid/fsvd/fpvd), object metrics (dcf/cgf/rgf + per-class object
Fréchet/MMD/JSD), feature caching, and the ``ori`` control arm — one
invocation emits the reference's nested JSON
(``{dataset}_{method}_results.json``).

Filesystem contract (mirrors ``../generated_results`` in the reference):
  {sample_dir}/{method}/*.txt|*.npy|*.bin                  generated clouds
  {sample_dir}/{method}/inference_results/                 caches + fg info
  {sample_dir}/{method}/inference_results/foreground_samples_info.pkl
      (written by tools/extract_foreground.py; the 'ori' arm uses
       {sample_dir}/ori/... extracted from real clouds with GT boxes)

Usage:
  python tools/evaluate_our.py --method our --sample-dir generated_results \
      --real-dir data/real_clouds -m frd fpd jsd mmd dcf cgf rgf obj \
      --pretrained-root pretrained_models/evaluation -o results.json
"""

import argparse
import json
import pickle
import sys
from collections import defaultdict
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

CLASS_NAMES = ("car", "truck", "bus", "pedestrian")


def _load_dir(d, limit=None):
    from lidarcrafter_tpu.utils.progress import Bar
    from lidarcrafter_tpu.utils.sample_io import list_sample_files, load_point_file

    out = []
    for f in Bar.wrap(list_sample_files(d, limit), desc=f"load {Path(d).name}"):
        arr = load_point_file(f)
        if arr.shape[1] < 4:
            arr = np.concatenate([arr, np.zeros((len(arr), 1))], 1)
        out.append(arr[:, :4].astype(np.float32))
    if not out:
        raise SystemExit(f"no .txt/.npy/.bin/.pth point files found in {d}")
    return out


def _load_fg_info(path):
    with open(path, "rb") as f:
        return pickle.load(f)


def _fg_crops(info, num_points=1024, seed=0):
    """foreground_samples_info.pkl → (clouds (M,N,4), labels, num_points,
    keys); crops are loaded from their .bin paths and resampled to a fixed
    point count (cf. ``NuscObject`` val partition)."""
    from lidarcrafter_tpu.datasets import transforms as T

    r = np.random.RandomState(seed)
    clouds, labels, npts, keys = [], [], [], []
    for cls, recs in info.items():
        if cls not in CLASS_NAMES:
            continue
        for i, rec in enumerate(recs):
            pts = np.fromfile(rec["path"], np.float32).reshape(-1, 4)
            pts = T.sample_points(pts, num_points, rng=r)
            clouds.append(pts)
            labels.append(CLASS_NAMES.index(cls))
            npts.append(rec["num_points_in_gt"])
            keys.append(f"{cls}_{i}")
    if not clouds:
        raise SystemExit("no foreground crops found in the info pkl")
    return np.stack(clouds), np.asarray(labels), np.asarray(npts), keys


def _build_pointmlp(args):
    """PointMLP classifier (CGF + per-class obj features); reference loads
    ``checkpoints/.../pointmlp.pth`` (``fg_object.py:246-252``)."""
    import jax
    import jax.numpy as jnp

    from lidarcrafter_tpu.metrics.extractor.pointmlp import point_mlp

    model = point_mlp(num_classes=4, points=args.num_obj_points)
    dummy = jnp.zeros((1, args.num_obj_points, 3))
    if args.pointmlp_ckpt:
        # native variables pkl from tools/train_pointmlp.py
        with open(args.pointmlp_ckpt, "rb") as f:
            variables = pickle.load(f)
    elif args.random_extractors:
        variables = model.init(jax.random.PRNGKey(0), dummy)
    else:
        return None, None

    @jax.jit
    def logits(x):
        return model.apply(variables, x)

    @jax.jit
    def feats(x):
        return model.apply(variables, x, return_features=True)

    return logits, feats


def _rgf_metric(args, info):
    """RGF at reference semantics (``fg_object.py:346-500``): 10-fold
    KFold(shuffle, seed 42) over the ['car','truck','bus'] crops, 30 MC
    prior passes per fold via GLENet, per-pass decoded pred-vs-GT 3D IoU as
    overlap, ``limit_period(yaw − gt_yaw) → sin`` before the 7-param
    variance.  Fold checkpoints come from ``tools/train_glenet.py``
    (``--glenet-fold-dir``); a single ``--glenet-ckpt`` (torch) is applied to
    every fold; ``--random-extractors`` runs the pipeline on a random init."""
    import jax
    import jax.numpy as jnp

    from lidarcrafter_tpu.datasets.object_uncertainty import CLASS_NAMES as RGF_CLASSES
    from lidarcrafter_tpu.metrics.fg_object import compute_rgf_folds
    from lidarcrafter_tpu.metrics.models.glenet import (
        EXP20_KWARGS,
        GLENet,
        load_glenet_fold,
        load_glenet_from_torch,
    )

    table = {c: np.zeros((1, 512), np.float32) for c in RGF_CLASSES}
    if args.clip_cache and Path(args.clip_cache).exists():
        with open(args.clip_cache, "rb") as f:
            loaded = pickle.load(f)
        for c in RGF_CLASSES:
            if c in loaded:
                table[c] = np.asarray(loaded[c], np.float32).reshape(1, -1)

    shared = None
    if not args.glenet_fold_dir:
        if args.glenet_ckpt:
            shared = load_glenet_from_torch(args.glenet_ckpt, **EXP20_KWARGS)
        elif args.random_extractors:
            model = GLENet(**EXP20_KWARGS)
            batch0 = {
                "points": jnp.zeros((1, 512, 3)),
                "text_feat": jnp.zeros((1, 512)),
                "gt_boxes_input": jnp.zeros((1, 8)),
                "gt_boxes": jnp.zeros((1, 7)),
            }
            shared = model, model.init(
                {"params": jax.random.PRNGKey(0)}, batch0,
                rng=jax.random.PRNGKey(1), train=True,
            )
        else:
            return None

    def build_fold_apply(fold_idx):
        if args.glenet_fold_dir:
            model, variables = load_glenet_fold(
                Path(args.glenet_fold_dir) / f"fold_{fold_idx}.pkl"
            )
        else:
            model, variables = shared
        return jax.jit(lambda bd, rng: model.apply(variables, bd, rng=rng))

    return compute_rgf_folds(
        info, build_fold_apply, jax.random.PRNGKey(7),
        num_passes=args.mc_passes, num_folds=args.rgf_folds,
        batch_size=args.batch_size, text_feat=table,
    )


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--method", default="ori")
    p.add_argument("--sample-dir", default="generated_results")
    p.add_argument("--real-dir", default=None,
                   help="directory of real clouds (needed unless cached)")
    p.add_argument("-m", "--metrics", nargs="+",
                   default=["frd", "fpd", "jsd", "mmd", "dcf", "cgf", "rgf", "obj"])
    p.add_argument("--num-sample", type=int, default=10000)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--dataset", default="nuscenes")
    p.add_argument("--pretrained-root", default=None,
                   help="evaluation checkpoints root "
                        "({root}/{dataset}/rangenet/, pointnet.pth, ...)")
    p.add_argument("--pointmlp-ckpt", default=None)
    p.add_argument("--glenet-ckpt", default=None,
                   help="single torch GLENet ckpt applied to every fold")
    p.add_argument("--glenet-fold-dir", default=None,
                   help="dir of fold_{i}.pkl from tools/train_glenet.py")
    p.add_argument("--rgf-folds", type=int, default=10)
    p.add_argument("--clip-cache", default=None,
                   help="pickle {class_name: (512,) text feature} for GLENet")
    p.add_argument("--random-extractors", action="store_true",
                   help="random-init PointMLP/GLENet (pipeline smoke runs)")
    p.add_argument("--num-obj-points", type=int, default=1024)
    p.add_argument("--mc-passes", type=int, default=30)
    p.add_argument("--real-fg-info", default=None)
    p.add_argument("--gen-fg-info", default=None)
    p.add_argument("-o", "--output", default=None)
    args = p.parse_args()

    import jax.numpy as jnp

    from lidarcrafter_tpu.metrics import fg_object
    from lidarcrafter_tpu.metrics.bev import compute_jsd_2d, compute_mmd_2d
    from lidarcrafter_tpu.metrics.distribution import (
        compute_frechet_distance,
        compute_squared_mmd,
    )
    from lidarcrafter_tpu.metrics.engine import EvaluationEngine
    from lidarcrafter_tpu.metrics.eval_suite import compute_cd, compute_emd
    from lidarcrafter_tpu.ops.bev import point_cloud_to_histogram

    method = args.method
    sample_dir = Path(args.sample_dir)
    ori_cache = sample_dir / "ori" / "inference_results"
    gen_cache = sample_dir / method / "inference_results"
    gen_cache.mkdir(parents=True, exist_ok=True)
    ori_cache.mkdir(parents=True, exist_ok=True)
    results = defaultdict(dict)

    # --------------------------------------------------------- scene metrics
    scene_metrics = {"frd", "fpd", "jsd", "mmd", "cd", "emd",
                     "frid", "fsvd", "fpvd"} & set(args.metrics)
    if scene_metrics and method != "ori":
        rangenet_apply = pointnet_apply = None
        if args.pretrained_root and "frd" in scene_metrics:
            rangenet_apply = _rangenet_lidargen(args)
        if args.pretrained_root and "fpd" in scene_metrics:
            pointnet_apply = _pointnet_apply(args)

        engine = EvaluationEngine(
            rangenet_apply=rangenet_apply, pointnet_apply=pointnet_apply,
            cache_dir=str(ori_cache),
        )
        real_clouds = (
            _load_dir(args.real_dir, args.num_sample) if args.real_dir else []
        )
        real = engine.extract_features(real_clouds, f"real_set_{args.dataset}")
        engine.cache_dir = gen_cache
        gen_clouds = _load_dir(sample_dir / method, args.num_sample)
        gen = engine.extract_features(gen_clouds, f"gen_set_{args.dataset}")

        if "frd" in scene_metrics and real["rangenet"] is not None:
            results["img"]["frechet_distance"] = float(
                compute_frechet_distance(real["rangenet"], gen["rangenet"])
            )
            results["img"]["squared_mmd"] = float(
                compute_squared_mmd(real["rangenet"], gen["rangenet"])
            )
        if "fpd" in scene_metrics and real["pointnet"] is not None:
            results["pts"]["frechet_distance"] = float(
                compute_frechet_distance(real["pointnet"], gen["pointnet"])
            )
            results["pts"]["squared_mmd"] = float(
                compute_squared_mmd(real["pointnet"], gen["pointnet"])
            )
        if "jsd" in scene_metrics:
            results["bev"]["jsd"] = float(compute_jsd_2d(
                jnp.asarray(real["bev_hist"]), jnp.asarray(gen["bev_hist"])
            ))
        if "mmd" in scene_metrics:
            results["bev"]["mmd"] = float(compute_mmd_2d(
                jnp.asarray(real["bev_hist"]), jnp.asarray(gen["bev_hist"])
            ))
        if "cd" in scene_metrics:
            results["scene"]["cd"] = float(compute_cd(real_clouds, gen_clouds))
        if "emd" in scene_metrics:
            results["scene"]["emd"] = float(compute_emd(real_clouds, gen_clouds))
        for name in ("frid", "fsvd", "fpvd"):
            if name in scene_metrics and args.pretrained_root:
                from lidarcrafter_tpu.metrics import evaluate as suite_eval

                results["scene"].update({
                    k: float(v) for k, v in suite_eval(
                        real_clouds, gen_clouds, metrics=[name],
                        pretrained_root=args.pretrained_root,
                    ).items()
                })

    # -------------------------------------------------------- object metrics
    fg_info_path = Path(
        (args.gen_fg_info if method != "ori" else args.real_fg_info)
        or (gen_cache if method != "ori" else ori_cache)
        / "foreground_samples_info.pkl"
    )
    obj_metrics = {"dcf", "cgf", "rgf", "obj"} & set(args.metrics)
    if obj_metrics:
        if not fg_info_path.exists():
            raise SystemExit(
                f"{fg_info_path} not found — run tools/extract_foreground.py first"
            )
        info = _load_fg_info(fg_info_path)

        if "dcf" in obj_metrics and method != "ori":
            results["object"]["dcf"] = fg_object.compute_dcf(info)

        if {"cgf", "rgf", "obj"} & obj_metrics:
            crops, labels, npts, keys = _fg_crops(info, args.num_obj_points)
            logits_fn, feats_fn = _build_pointmlp(args)

            if "cgf" in obj_metrics and logits_fn is not None:
                results["object"]["cgf"] = fg_object.compute_cgf(
                    logits_fn, list(crops), labels, npts, CLASS_NAMES,
                    batch_size=args.batch_size,
                )
            if "rgf" in obj_metrics:
                rgf = _rgf_metric(args, info)
                if rgf is not None:
                    results["object"]["rgf"] = rgf

            if "obj" in obj_metrics and method != "ori" and feats_fn is not None:
                real_info_path = Path(
                    args.real_fg_info or ori_cache / "foreground_samples_info.pkl"
                )
                if real_info_path.exists():
                    rcrops, rlabels, _, _ = _fg_crops(
                        _load_fg_info(real_info_path), args.num_obj_points
                    )
                    cls_idx = CLASS_NAMES.index("car")

                    def feats_hists(cr, lb):
                        sel = cr[lb == cls_idx]
                        f = np.asarray(feats_fn(jnp.asarray(sel[..., :3])))
                        h = np.stack([
                            np.asarray(point_cloud_to_histogram(
                                jnp.asarray(c[:, :3]), min_depth=1e-6,
                                max_depth=1e3, field_size=2.0,
                            ))
                            for c in sel
                        ])
                        return f, h
                    rf, rh = feats_hists(rcrops, rlabels)
                    gf, gh = feats_hists(crops, labels)
                    results["obj"]["frechet_distance"] = float(
                        compute_frechet_distance(rf, gf)
                    )
                    results["obj"]["squared_mmd"] = float(
                        compute_squared_mmd(rf, gf)
                    )
                    results["obj"]["jsd"] = float(
                        compute_jsd_2d(jnp.asarray(rh), jnp.asarray(gh))
                    )
                    results["obj"]["mmd"] = float(
                        compute_mmd_2d(jnp.asarray(rh), jnp.asarray(gh))
                    )

    out_path = args.output or str(
        sample_dir / f"{args.dataset}_{method}_results.json"
    )
    with open(out_path, "w") as f:
        json.dump(results, f, indent=4)
    print(json.dumps(results, indent=2))


def _rangenet_lidargen(args):
    """Pretrained RangeNet → ``feature='lidargen'`` extractor; shared loader
    in :mod:`lidarcrafter_tpu.metrics.pretrained`."""
    from lidarcrafter_tpu.metrics.pretrained import load_rangenet_lidargen

    return load_rangenet_lidargen(args.pretrained_root, args.dataset)


def _pointnet_apply(args):
    """Pretrained shapenet PointNet feature extractor (FPD)."""
    from lidarcrafter_tpu.metrics.pretrained import load_pointnet

    return load_pointnet(args.pretrained_root)


if __name__ == "__main__":
    main()
