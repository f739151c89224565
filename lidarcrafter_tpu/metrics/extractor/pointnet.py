"""Frozen ShapeNet PointNet feature extractor (FPD backbone), flax.

Re-designs ``lidargen/metrics/extractor/pointnet.py`` (98 LoC): STN3d input
transform + PointNet trunk + FC head; the FPD feature is the concat
(x1, x2, x3, x4) of trunk global feature and head activations
(``pointnet.py:74-80``).  Inference-only: BatchNorms run on imported running
stats.  ``convert_pointnet_state_dict`` ingests the reference torch weights
(``cls_model_39.pth``).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp
from flax import linen as nn


class FrozenBN(nn.Module):
    """BatchNorm in eval mode over the channel (last) axis."""

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (C,))
        bias = self.param("bias", nn.initializers.zeros, (C,))
        mean = self.param("mean", nn.initializers.zeros, (C,))
        var = self.param("var", nn.initializers.ones, (C,))
        return (x - mean) / jnp.sqrt(var + self.epsilon) * scale + bias


class MLPBlock(nn.Module):
    features: int
    relu: bool = True

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.features, name="dense")(x)
        x = FrozenBN(name="bn")(x)
        return nn.relu(x) if self.relu else x


class STN3d(nn.Module):
    """Input-transform net; cf. ``pointnet.py:7-31``.  x: (B, N, 3)."""

    @nn.compact
    def __call__(self, x):
        B = x.shape[0]
        h = MLPBlock(64, name="conv1")(x)
        h = MLPBlock(128, name="conv2")(h)
        h = MLPBlock(1024, name="conv3")(h)
        h = jnp.max(h, axis=1)
        h = MLPBlock(512, name="fc1")(h)
        h = MLPBlock(256, name="fc2")(h)
        h = nn.Dense(9, name="fc3")(h).reshape(B, 3, 3)
        return h + jnp.eye(3)


class PointNetFeatureExtractor(nn.Module):
    """cf. ``PointNet1`` (``pointnet.py:64-80``); x (B, N, 3) → (B, 1808)."""

    k: int = 16

    @nn.compact
    def __call__(self, x):
        trans = STN3d(name="stn")(x)
        x = jnp.einsum("bnc,bcd->bnd", x, trans)
        h = MLPBlock(64, name="feat_conv1")(x)
        h = MLPBlock(128, name="feat_conv2")(h)
        h = MLPBlock(1024, relu=False, name="feat_conv3")(h)
        x1 = jnp.max(h, axis=1)  # (B, 1024)
        x2 = MLPBlock(512, name="fc1")(x1)
        x3 = MLPBlock(256, name="fc2")(x2)
        x4 = nn.Dense(self.k, name="fc3")(x3)
        return jnp.concatenate([x1, x2, x3, x4], axis=1)


def convert_pointnet_state_dict(sd) -> dict:
    """torch PointNet1 state_dict → flax params."""
    sd = {k: np.asarray(v) for k, v in sd.items()}

    def block(prefix_w, prefix_bn, conv=True):
        w = sd[f"{prefix_w}.weight"]
        if conv:  # Conv1d (O, I, 1) → (I, O)
            w = np.transpose(w[..., 0], (1, 0))
        else:
            w = np.transpose(w, (1, 0))
        return {
            "dense": {"kernel": w, "bias": sd[f"{prefix_w}.bias"]},
            "bn": {
                "scale": sd[f"{prefix_bn}.weight"],
                "bias": sd[f"{prefix_bn}.bias"],
                "mean": sd[f"{prefix_bn}.running_mean"],
                "var": sd[f"{prefix_bn}.running_var"],
            },
        }

    def dense(prefix):
        return {
            "kernel": np.transpose(sd[f"{prefix}.weight"], (1, 0)),
            "bias": sd[f"{prefix}.bias"],
        }

    params = {
        "stn": {
            "conv1": block("feat.stn.conv1", "feat.stn.bn1"),
            "conv2": block("feat.stn.conv2", "feat.stn.bn2"),
            "conv3": block("feat.stn.conv3", "feat.stn.bn3"),
            "fc1": block("feat.stn.fc1", "feat.stn.bn4", conv=False),
            "fc2": block("feat.stn.fc2", "feat.stn.bn5", conv=False),
            "fc3": dense("feat.stn.fc3"),
        },
        "feat_conv1": block("feat.conv1", "feat.bn1"),
        "feat_conv2": block("feat.conv2", "feat.bn2"),
        "feat_conv3": block("feat.conv3", "feat.bn3"),
        "fc1": block("fc1", "bn1", conv=False),
        "fc2": block("fc2", "bn2", conv=False),
        "fc3": dense("fc3"),
    }
    return {"params": params}
