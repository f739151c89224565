"""lidarcrafter_tpu — a TPU-native (JAX / XLA / Pallas / pjit) 4D LiDAR world-modeling
framework with the capabilities of LiDARCrafter (worldbench/lidarcrafter).

Layer map (mirrors SURVEY.md §1, re-designed TPU-first):

- ``lidarcrafter_tpu.ops``       irregular point-cloud kernels (projection scatter, FPS,
                                 ball query / kNN, points-in-box, chamfer, EMD, IoU/NMS)
                                 as fixed-shape jitted lax code and Pallas kernels.
- ``lidarcrafter_tpu.utils``     geometry & LiDAR utilities (depth codecs, ray angles,
                                 range→xyz, box math).
- ``lidarcrafter_tpu.models``    flax denoisers + condition encoders (EfficientUNet family,
                                 layout UNet, UNet1D, scene-graph GCN, point UNet, HDiT).
- ``lidarcrafter_tpu.diffusion`` continuous/discrete-time Gaussian diffusion and MeanFlow
                                 engines as pure functions; samplers are ``lax.scan`` loops.
- ``lidarcrafter_tpu.datasets``  nuScenes range-image datasets and conditioning pipeline.
- ``lidarcrafter_tpu.metrics``   scene/object/sequence evaluation suite.
- ``lidarcrafter_tpu.training``  optax train steps, EMA, orbax checkpointing.
- ``lidarcrafter_tpu.parallel``  device meshes and sharding rules (dp over batch, sp over
                                 the periodic azimuth axis).
- ``lidarcrafter_tpu.configs``   named config registry mirroring the reference's
                                 ``lidargen/utils/configs/__init__.py`` keys.
"""

__version__ = "0.1.0"
