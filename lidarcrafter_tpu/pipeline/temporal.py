"""Autoregressive 4D sequence rollout — the flagship pipeline.

Re-designs ``tools/evaluation/sample_and_save_temporal.py:27-335`` (§3.4 of
SURVEY.md): layout-conditioned first frame, then 15 autoregressive steps where
the previous generation is warped by ego motion, foreground objects are
replayed at their future boxes, and the result conditions the next frame.

The reference round-trips device↔host every step
(``sample_and_save_temporal.py:236,321``); here each step is composed of
jitted fixed-shape ops (warp → fg replay → projection → conditioning →
``lax.scan`` sampling), so only the final sequence leaves the device.

Trajectory/box precomputation (tiny, host-side numpy) mirrors
``pipe_related.get_temporal_boxes_3d`` (:28-95).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any

import numpy as np

import jax
import jax.numpy as jnp

from ..datasets import rollout as R
from ..ops.projection import convert_boxes_to_2d, points_to_range_image
from ..training.preprocess import (
    postprocess_sample,
    preprocess_autoregressive_cond,
    preprocess_condition_mask,
)
from ..utils.lidar import LiDARUtility


@dataclasses.dataclass
class TemporalRollout:
    """Drives layout-cond frame-0 + autoregressive continuation.

    ``cond_engine`` / ``cond_params``: the layout-conditioned frame generator
    (nuscenes-box-layout-*); ``autoreg_engine`` / ``autoreg_params``: the
    autoregressive generator (nuscenes-auto-reg-v2).
    """

    cond_engine: Any
    cond_params: Any
    autoreg_engine: Any
    autoreg_params: Any
    lidar_utils: LiDARUtility
    num_classes: int = 8
    max_points: int = 32 * 1024
    max_points_per_obj: int = 512
    num_sampling_steps: int = 256
    sampling_mode: str = "ddpm"

    # ----------------------------------------------------------- per-frame ops

    def _project(self, points: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
        H, W = self.lidar_utils.resolution
        return points_to_range_image(
            points,
            mask,
            H=H,
            W=W,
            min_depth=self.lidar_utils.min_depth,
            max_depth=self.lidar_utils.max_depth,
        )

    def generate_first_frame(self, batch: dict, rng: jax.Array) -> jnp.ndarray:
        """Layout-conditioned frame 0; cf. ``sample_and_save_temporal.py:222-230``."""
        return self.cond_engine.sample(
            self.cond_params,
            rng,
            batch,
            batch_size=batch["concat_cond"].shape[0],
            num_steps=self.num_sampling_steps,
            mode=self.sampling_mode,
        )

    def generate_next_frame(
        self, autoregressive_cond: jnp.ndarray, layout_batch: dict, rng: jax.Array
    ) -> jnp.ndarray:
        """One autoregressive step; cf. ``:179-193``."""
        batch = dict(layout_batch)
        batch["autoregressive_cond"] = autoregressive_cond
        return self.autoreg_engine.sample(
            self.autoreg_params,
            rng,
            batch,
            batch_size=autoregressive_cond.shape[0],
            num_steps=self.num_sampling_steps,
            mode=self.sampling_mode,
        )

    def image_to_points(self, sample: jnp.ndarray):
        """Generated images (S, H, W, C) → padded (S, N, 4) clouds + masks."""
        post = postprocess_sample(sample, self.lidar_utils)
        S = sample.shape[0]
        xyz = post["xyz"].reshape(S, -1, 3)
        refl = post.get("reflectance")
        inten = (
            (refl.reshape(S, -1, 1) * 255.0)
            if refl is not None
            else jnp.zeros((S, xyz.shape[1], 1))
        )
        pts = jnp.concatenate([xyz, inten], axis=2)
        mask = jnp.linalg.norm(xyz, axis=2) > 1e-2
        # drop ego-radius points (cf. pipe_related.remove_ego_points)
        mask &= ~((jnp.abs(pts[..., 0]) < 2.0) & (jnp.abs(pts[..., 1]) < 2.0))
        return pts, mask

    # --------------------------------------------------------------- rollout

    def rollout(
        self,
        first_frame_batch: dict,
        gt_fut_trajs: np.ndarray,
        boxes0: np.ndarray,
        box_names_classes: np.ndarray,
        rng: jax.Array,
        num_frames: int = 15,
        interp_M: int | None = 16,
    ) -> list[np.ndarray]:
        """Full sequence, BATCHED over scenes;
        cf. ``sample_and_save_temporal.py:203-335``.

        Per scene: ``gt_fut_trajs`` (K+1, 6, 2) per-agent future deltas (row 0
        = ego), ``boxes0`` (K, 7) current object boxes, ``box_names_classes``
        (K,) float class values.  A leading scene dim S batches all three (the
        values of ``first_frame_batch`` must then carry the same S); single-
        scene inputs are auto-promoted to S=1.  Returns the list of generated
        frame arrays (S, H, W, C), host-side.
        """
        gt_fut_trajs = np.asarray(gt_fut_trajs, np.float32)
        boxes0 = np.asarray(boxes0, np.float32)
        box_names_classes = np.asarray(box_names_classes, np.float32)
        if gt_fut_trajs.ndim == 3:  # single scene → S=1
            gt_fut_trajs, boxes0 = gt_fut_trajs[None], boxes0[None]
            box_names_classes = box_names_classes[None]
        S, K = boxes0.shape[0], boxes0.shape[1]

        # --- host precompute (tiny): trajectories, future boxes, transforms
        fut_boxes, Ts = [], []
        for s in range(S):
            ego_traj, obj_traj = R.expand_future_trajs(gt_fut_trajs[s], M=interp_M)
            fut_boxes.append(np.asarray(
                R.warp_boxes_future(
                    jnp.asarray(boxes0[s]),
                    jnp.asarray(obj_traj, jnp.float32),
                    jnp.asarray(ego_traj, jnp.float32),
                )
            ))  # (K, T, 7)
            Ts.append(R.compute_inter_frame_transforms(ego_traj))  # (T, 4, 4)
        fut_boxes = np.stack(fut_boxes)  # (S, K, T, 7)
        Ts = np.stack(Ts)  # (S, T, 4, 4)
        Tsteps = min(num_frames, fut_boxes.shape[2])
        box_mask = jnp.ones((S, K), bool)
        classes_col = jnp.asarray(box_names_classes)[..., None]

        # scene-vmapped geometry ops (per-scene fns stay single-cloud)
        H, W = self.lidar_utils.resolution
        v_split = jax.vmap(
            partial(R.split_foreground_background,
                    max_points_per_obj=self.max_points_per_obj)
        )
        v_warp = jax.vmap(R.transform_points_homogeneous)
        v_refine = jax.vmap(
            partial(R.refine_points_via_condition_mask, H=H, W=W,
                    min_depth=self.lidar_utils.min_depth,
                    max_depth=self.lidar_utils.max_depth)
        )
        v_replay = jax.vmap(R.replay_objects)
        v_project = jax.vmap(self._project)
        v_boxes2d = jax.vmap(
            partial(convert_boxes_to_2d, H=H, W=W)
        )

        # --- frame 0
        rng, r0 = jax.random.split(rng)
        sample = self.generate_first_frame(first_frame_batch, r0)
        frames = [sample]
        pts, mask = self.image_to_points(sample)

        for t_id in range(Tsteps):
            # fg/bg split on the current generation
            boxes_t = jnp.asarray(
                boxes0 if t_id == 0 else fut_boxes[:, :, t_id - 1]
            )
            bg_mask, obj_pts, obj_mask = v_split(pts, mask, boxes_t, box_mask)
            # warp background into the next frame
            bg_next = v_warp(pts, jnp.asarray(Ts[:, t_id]))
            next_boxes = jnp.asarray(fut_boxes[:, :, t_id])
            next_boxes_cls = jnp.concatenate([next_boxes, classes_col], axis=2)
            # hidden-surface + next-frame-box-interior removal through the
            # range image (pipe_related.refine_next_frame_points semantics)
            bg_next, bg_next_mask = v_refine(bg_next, bg_mask, next_boxes_cls, box_mask)
            # replay foreground at the future boxes
            fg_pts, fg_mask = v_replay(obj_pts, obj_mask, next_boxes, box_mask)
            all_pts = jnp.concatenate(
                [bg_next, fg_pts.reshape(S, -1, 4)], axis=1
            )
            all_mask = jnp.concatenate(
                [bg_next_mask, fg_mask.reshape(S, -1)], axis=1
            )

            # condition image for the next frame
            img = v_project(all_pts, all_mask)
            depth = img[..., 4:5] * img[..., 5:6]
            refl = img[..., 3:4] / 255.0 * img[..., 5:6]
            cond = jnp.concatenate([depth, refl], axis=-1)
            autoreg_cond = preprocess_autoregressive_cond(cond, self.lidar_utils)

            _, condition_mask, _ = v_boxes2d(next_boxes_cls, box_mask)
            layout_batch = dict(first_frame_batch)
            layout_batch["concat_cond"] = preprocess_condition_mask(
                {"condition_mask": condition_mask}, self.lidar_utils,
                self.num_classes,
            )

            rng, rt = jax.random.split(rng)
            sample = self.generate_next_frame(autoreg_cond, layout_batch, rt)
            frames.append(sample)
            pts, mask = self.image_to_points(sample)

        return [np.asarray(f) for f in frames]
