"""gpcr_tpu — TPU-native learned point-cloud Gaussian-splat renderer.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the
reference "Low Latency Point Cloud Rendering with Learned Splatting"
pipeline (huzi96/gaussian-pcloud-render): a sparse-conv U-Net predicts
per-point 3D-Gaussian splat parameters which a tile-based differentiable
rasterizer alpha-composites into RGB / normal / world-xyz / hit images.

Layer map (mirrors SURVEY.md §1; all TPU-first, none of it a port):

- ``gpcr_tpu.ops``        splat math, differentiable rasterizer (jnp + Pallas),
                          voxel-hash sparse convolution        (ref L0/L1)
- ``gpcr_tpu.models``     SparseUNet / PCEncoder in JAX        (ref L2)
- ``gpcr_tpu.structures`` Camera / PointCloud / Mesh / ...     (ref L3)
- ``gpcr_tpu.utils``      SH, rigid motion, projection         (ref L4)
- ``gpcr_tpu.render``     PCMLRender / SimpleRender            (ref L5)
- ``gpcr_tpu.cli``        benchmark / sampling / metrics CLIs  (ref L6)
- ``gpcr_tpu.metrics``    PSNR / SSIM / MS-SSIM / LPIPS in JAX
- ``gpcr_tpu.parallel``   jax.sharding meshes, multi-chip render/train
- ``gpcr_tpu.train``      training step + losses (reference ships config only)
"""

__version__ = "0.1.0"
