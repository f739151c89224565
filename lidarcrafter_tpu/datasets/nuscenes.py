"""nuScenes range-image dataset (host input pipeline).

Re-designs ``lidargen/dataset/nuscenes_dataset.py`` (669 LoC) and
``base_dataset.py`` without torch DataLoaders: a plain iterable producing
fixed-shape numpy samples, collated by stacking.  Tasks mirror the reference's
``pre_process`` dispatch (``nuscenes_dataset.py:375-421``):

- ``None``                       → plain single frames (depth/reflectance)
- ``layout_generation``          → + scaled boxes, 2D boxes, condition masks
- ``layout_cond``                → + 13-slot padded box conditioning
- ``autoregressive_generation``  → + prev-frame warped condition image
- ``object_generation``          → handled by :class:`NuscObjectDataset`

CLIP features for scene graphs are read from the reference's on-disk cache
format (``CLIP_%07d.pkl``; cf. ``scene_graph/scene_graph.py:92-95``) —
never computed in the hot input path.
"""

from __future__ import annotations

import os
import pickle
import random
from typing import Any

import numpy as np

from ..native import native_enabled, project_range_image_native
from ..ops.projection import convert_boxes_to_2d, points_to_range_image
from . import transforms as T
from .rollout import compute_inter_frame_transforms  # noqa: F401  (re-export)


class NuscDataset:
    def __init__(self, cfg, infos: list[dict] | None = None):
        self.cfg = cfg
        self.task = getattr(cfg.data, "task", None) if hasattr(cfg, "data") else getattr(cfg, "task", None)
        data_cfg = cfg.data if hasattr(cfg, "data") else cfg
        self.data_cfg = data_cfg
        self.data_root = data_cfg.data_root
        self.split = getattr(data_cfg, "split", "train")
        self.class_names = list(getattr(data_cfg, "class_names", ()))
        self.resolution = tuple(data_cfg.resolution)
        self.points_range = list(T.POINTS_RANGE)

        if infos is not None:
            self.data = [di for di in infos if di.get("scene_graph", {}).get("valid", True)]
        else:
            self.data = self._load_infos(data_cfg)

        if self.task == "autoregressive_generation":
            self.data_dict = {info["token"]: info for info in self.data}
            self.data = [
                di
                for di in self.data
                if di.get("prev_info", {}).get("valid")
                and di["prev_info"]["token"] in self.data_dict
            ]

        if self.task == "layout_generation":
            # cf. ``nuscenes_dataset.py:24-31,488-492``: the layout task runs
            # the scene-graph assigner per sample.  CLIP features come from
            # the reference-format cache under ``clip_cache_dir`` or a
            # ``text_encode_fn`` plugged in afterwards (e.g. the native CLIP
            # tower, ``models/clip_text.py``).
            from .scene_graph import SceneGraphAssigner

            self.scene_graph_assigner = SceneGraphAssigner(
                output_path=getattr(data_cfg, "clip_cache_dir", None),
                split=self.split,
            )

    # ------------------------------------------------------------------ io

    def _load_infos(self, data_cfg) -> list[dict]:
        pkl_path = getattr(data_cfg, "pkl_path", None)
        if pkl_path is None:
            return []
        if self.split != "train" and "train" in pkl_path:
            pkl_path = pkl_path.replace("train", "val")
        paths = (
            [pkl_path.replace("train", s) for s in ("train", "val")]
            if self.split == "all"
            else [pkl_path]
        )
        data = []
        for p in paths:
            with open(p, "rb") as f:
                infos = pickle.load(f)
            data += [di for di in infos if di["scene_graph"]["valid"]]
        if self.split == "all":
            random.shuffle(data)
        return data

    def __len__(self):
        return len(self.data)

    def _load_points(self, info) -> np.ndarray:
        return np.fromfile(
            os.path.join(self.data_root, info["lidar_path"]), dtype=np.float32
        ).reshape(-1, 5)[:, :4]

    # ------------------------------------------------------------ transforms

    def project(self, points: np.ndarray) -> dict:
        """Point cloud → range-image channels; cf. ``nuscenes_dataset.py:476-487``.

        Output arrays are HWC.  Prefers the native C++ kernel
        (``native/src/range_projection.cpp``): same winner semantics, runs on
        the host for ANY point count (the jitted jnp path recompiles per
        distinct N, and would round-trip a remote-TPU default backend per
        sample) and releases the GIL for the threaded ``PrefetchLoader``.
        ``LCT_NATIVE=0`` forces the JAX path.
        """
        H, W = self.resolution
        img = None
        if native_enabled():
            img = project_range_image_native(
                points,
                H=H,
                W=W,
                min_depth=self.data_cfg.min_depth,
                max_depth=self.data_cfg.max_depth,
                fov_up=self.data_cfg.fov_up,
                fov_down=self.data_cfg.fov_down,
            )
        if img is None:
            img = np.asarray(
                points_to_range_image(
                    points,
                    H=H,
                    W=W,
                    min_depth=self.data_cfg.min_depth,
                    max_depth=self.data_cfg.max_depth,
                    fov_up=self.data_cfg.fov_up,
                    fov_down=self.data_cfg.fov_down,
                )
            )
        img = img * img[..., 5:6]
        return {
            "xyz": img[..., :3],
            "reflectance": img[..., 3:4] / 255.0,
            "depth": img[..., 4:5],
            "mask": img[..., 5:6],
        }

    def pre_process(self, data_dict: dict) -> dict:
        """Task dispatch; cf. ``nuscenes_dataset.py:375-421``."""
        if self.task is None:
            data_dict.pop("points", None)
            return data_dict

        gt_boxes = data_dict["gt_boxes"]
        gt_names = data_dict["gt_names"]
        fg_encoding = np.stack(
            [T.encoding_boxes_3d(b[:7], unique_mode=False) for b in gt_boxes[1:]]
        ) if len(gt_boxes) > 1 else np.zeros((0, 8), np.float32)
        class_names = ["ego"] + self.class_names
        gt_classes = np.array([class_names.index(n) for n in gt_names], np.float32)
        gt_boxes = np.concatenate([gt_boxes[:, :7], gt_classes[:, None]], axis=1)
        data_dict["gt_boxes"] = gt_boxes

        H, W = self.resolution
        boxes_2d, condition_mask, loss_weight = (
            np.asarray(a)
            for a in convert_boxes_to_2d(
                gt_boxes.astype(np.float32),
                H=H,
                W=W,
                fov_up=self.data_cfg.fov_up,
                fov_down=self.data_cfg.fov_down,
            )
        )
        scaled = T.scale_boxes_3d(gt_boxes.copy()).astype(np.float32)

        if self.task == "layout_generation":
            data_dict.update(
                gt_boxes_2d=boxes_2d,
                scaled_gt_boxes=scaled,
                condition_mask=condition_mask,
                scene_loss_weight_map=loss_weight,
            )
        elif self.task in ("layout_cond", "autoregressive_generation"):
            b3, b2, fe, valid = T.align_box_num(scaled[1:], boxes_2d[1:], fg_encoding)
            data_dict.update(
                scaled_gt_boxes=b3.astype(np.float32),
                gt_boxes_2d=b2.astype(np.float32),
                fg_encoding_box=fe.astype(np.float32),
                is_valid_obj=valid.astype(np.float32),
                condition_mask=condition_mask,
                scene_loss_weight_map=loss_weight,
            )
        data_dict.pop("points", None)
        return data_dict

    # ------------------------------------------------------- autoregressive

    def get_prev_frame_condition(self, curr_token: str, prev_info: dict, prev_num: int = 1):
        """Warp the previous frame into the current lidar frame; cf.
        ``nuscenes_dataset.py:278-373``: fg/bg split, per-object align-replay
        at current boxes (matched by instance id), ego-motion transform of bg."""
        prev = self.data_dict[prev_info["token"]]
        for _ in range(prev_num - 1):
            pi = prev.get("prev_info", {})
            if pi.get("valid") and pi["token"] in self.data_dict:
                prev = self.data_dict[pi["token"]]
            else:
                break

        prev_points = T.remove_ego_points(self._load_points(prev), center_radius=2.0)
        prev_boxes = prev["scene_graph"]["keep_box"][1:, :7]
        prev_ids = list(prev["scene_graph"]["keep_agent_instance_inds"][1:])
        curr = self.data_dict[curr_token]
        curr_ids = list(curr["scene_graph"]["keep_agent_instance_inds"][1:])
        curr_boxes = curr["scene_graph"]["keep_box"][1:, :7]

        from ..ops.points import points_in_boxes as pib
        import jax.numpy as jnp

        aligned_to = []
        keep_mask = np.zeros(len(prev_ids), bool)
        for i, gid in enumerate(prev_ids):
            if gid in curr_ids:
                aligned_to.append(curr_boxes[curr_ids.index(gid)])
                keep_mask[i] = True

        bg = prev_points
        fg_aligned, fg_intensity = [], []
        if keep_mask.sum() > 0:
            kept = prev_boxes[keep_mask]
            member = np.asarray(
                pib(jnp.asarray(prev_points[:, :3]), jnp.asarray(kept.astype(np.float32)))
            )
            bg = prev_points[member.sum(axis=0) == 0]
            for k, box in enumerate(kept):
                pts = prev_points[member[k] > 0]
                fg_intensity.append(pts[:, 3])
                centered = pts[:, :3] - box[:3]
                fg_aligned.append(
                    T.rotate_points_along_z(centered[None], -np.array([box[6]]))[0]
                )

        # ego transform of the background (cf. :331-363)
        from ..metrics.temporal import relative_gt_transform

        R, trans = relative_gt_transform(prev, curr)
        rot = R
        bg = bg.copy()
        bg[:, :3] = bg[:, :3] @ rot.T
        bg[:, :3] -= -(rot.T @ np.asarray(trans).reshape(3, 1)).ravel()

        if keep_mask.sum() == 0:
            return bg
        fg = []
        for pts, inten, box in zip(fg_aligned, fg_intensity, aligned_to):
            rotated = T.rotate_points_along_z(pts[None], np.array([box[6]]))[0]
            placed = rotated + np.asarray(box[:3])[None]
            fg.append(np.concatenate([placed, inten[:, None]], axis=1))
        return np.concatenate([bg] + fg, axis=0)

    # ------------------------------------------------------------- getitem

    def __getitem__(self, idx: int) -> dict:
        info = self.data[idx]
        out: dict[str, Any] = {"token": info["token"]}

        if self.task == "autoregressive_generation":
            prev_num = random.randint(1, 5) if self.split in ("train", "all") else 1
            cond_points = self.get_prev_frame_condition(
                info["token"], info["prev_info"], prev_num
            )
            proj = self.project(cond_points)
            depth = proj["depth"].copy()
            if self.split in ("train", "all"):  # train-time depth noise (:441-444)
                depth += np.random.normal(0, 3, depth.shape)
                depth[depth < 0] = 0
            out["autoregressive_cond"] = np.concatenate(
                [depth, proj["reflectance"]], axis=-1
            ).astype(np.float32)

        points = self._load_points(info)
        if getattr(self.data_cfg, "delete_ground", False):
            seg = np.fromfile(
                os.path.join(self.data_root, info["gt_segment_path"]), dtype=np.uint8
            )
            points = T.delete_ground_points(points, seg)

        out.update(
            points=points,
            gt_names=info["scene_graph"]["keep_box_names"],
            gt_boxes=info["scene_graph"]["keep_box"][:, :7],
            gt_box_relationships=info["scene_graph"]["keep_box_relationships"],
            gt_fut_trajs=info["scene_graph"]["keep_agent_fut_trajs"],
            gt_fut_masks=info["scene_graph"]["keep_agent_fut_masks"],
            gt_fut_states=info["scene_graph"]["keep_agent_fut_states"],
        )
        out.update(self.project(points))
        out = self.pre_process(out)
        if self.task == "layout_generation" and hasattr(self, "scene_graph_assigner"):
            # merged flat so ``collate_scene_graphs`` sees encoder/decoder/
            # manipulate directly (cf. ``nuscenes_dataset.py:488-492``)
            out.update(self.scene_graph_assigner.assign_item(idx, out))
        return out

    # -------------------------------------------------------------- collate

    NON_STACK_KEYS = (
        "points", "gt_names", "gt_boxes", "gt_box_relationships", "gt_fut_trajs",
        "gt_fut_masks", "gt_fut_states", "token", "custom_tokens",
    )

    def collate_fn(self, batch: list[dict]) -> dict:
        """Stack fixed-shape fields; list-carry ragged ones; cf.
        ``base_dataset.py:38-71``."""
        out: dict[str, Any] = {}
        keys = batch[0].keys()
        for key in keys:
            vals = [b[key] for b in batch]
            if key in self.NON_STACK_KEYS:
                out[key] = vals
            else:
                out[key] = np.stack(vals).astype(np.float32)
        out["batch_size"] = len(batch)
        return out
