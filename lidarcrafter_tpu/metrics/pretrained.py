"""Pretrained eval-backbone loaders shared by the metric CLIs.

The reference builds its frame-level extractors inline in each eval driver
(``tools/evaluation/evaluate_our.py`` and ``evaluate_r2dm.py`` both call
``rangenet.rangenet53(weights=...)`` / ``pointnet.pretrained_pointnet(...)``);
here the checkpoint-ingestion + jit plumbing lives once and the CLIs bind it.

Layout under ``pretrained_root`` (mirrors the reference's
``pretrained_models/evaluation`` tree):
  {root}/{dataset}/rangenet/{backbone,segmentation_decoder}   torch pickles
  {root}/**/pointnet*.pth                                     shapenet PointNet
"""

from __future__ import annotations

from pathlib import Path


def load_rangenet_lidargen(pretrained_root, dataset: str = "32"):
    """Pretrained RangeNet → jitted ``feature='lidargen'`` (B, 4096)
    extractor over (B, H, W, 5) [depth, x, y, z, remission] inputs; cf.
    ``rangenet.rangenet53(...)`` + ``extract_img_feats`` in the reference.
    Returns None when no checkpoint folder exists."""
    import torch

    import jax

    from .extractor.rangenet import (
        RangeNet,
        convert_rangenet_folder,
        preprocess_range_input,
    )

    folder = Path(pretrained_root) / dataset / "rangenet"
    if not folder.exists():
        return None
    backbone = torch.load(folder / "backbone", map_location="cpu",
                          weights_only=False)
    decoder = torch.load(folder / "segmentation_decoder", map_location="cpu",
                         weights_only=False)
    params = convert_rangenet_folder(backbone, decoder)
    nrb8 = any(k.startswith("enc3.residual_7") for k in backbone)
    model = RangeNet(num_classes=17, backbone=53 if nrb8 else 21)

    @jax.jit
    def apply(img):
        return model.apply(params, preprocess_range_input(img), "lidargen")

    return apply


def load_pointnet(pretrained_root):
    """Pretrained shapenet PointNet feature extractor (FPD); (B, N, 3) →
    (B, F).  Returns None when no ``pointnet*.pth`` is found."""
    import torch

    import jax

    from .extractor.pointnet import (
        PointNetFeatureExtractor,
        convert_pointnet_state_dict,
    )

    cands = list(Path(pretrained_root).rglob("pointnet*.pth"))
    if not cands:
        return None
    sd = torch.load(cands[0], map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    variables = convert_pointnet_state_dict(
        {k: v.numpy() for k, v in sd.items()}
    )
    model = PointNetFeatureExtractor()

    @jax.jit
    def apply(pts):
        return model.apply(variables, pts)

    return apply


def random_rangenet_lidargen(seed: int = 0, backbone: int = 21):
    """Random-init RangeNet extractor (pipeline smokes / tests)."""
    import jax
    import jax.numpy as jnp

    from .extractor.rangenet import RangeNet, preprocess_range_input

    model = RangeNet(num_classes=17, backbone=backbone)
    params = model.init(jax.random.PRNGKey(seed), jnp.zeros((1, 32, 64, 5)),
                        "lidargen")

    @jax.jit
    def apply(img):
        return model.apply(params, preprocess_range_input(img), "lidargen")

    return apply


def random_pointnet(seed: int = 0):
    """Random-init PointNet extractor (pipeline smokes / tests)."""
    import jax
    import jax.numpy as jnp

    from .extractor.pointnet import PointNetFeatureExtractor

    model = PointNetFeatureExtractor()
    variables = model.init(jax.random.PRNGKey(seed), jnp.zeros((1, 128, 3)))

    @jax.jit
    def apply(pts):
        return model.apply(variables, pts)

    return apply
