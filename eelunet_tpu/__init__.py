"""eelunet_tpu — a TPU-native (JAX/XLA/Pallas/pjit) edge-enhanced segmentation framework.

A from-scratch rebuild of the capabilities of the DiWu17/EEL-Unet reference
(binary medical-image segmentation with an auxiliary edge-decoder branch and
deep supervision) designed TPU-first:

- NHWC layouts everywhere, bf16-compute/f32-accumulate, XLA-fused conv graphs.
- A functional model registry (unet / eelunet / unet++ / egeunet / unext /
  unext_s / malunet) with a uniform ``ModelOutput`` contract replacing the
  reference's ``model.name`` if-chains (reference train.py:62-84).
- Differentiable Canny/Sobel edge toolbox as batched device ops with a fused
  Pallas kernel for the hot path (reference utils/tools.py:126-419).
- On-device metrics incl. boundary-F1 (reference evaluate.py:25-124).
- Data/tensor parallel scaling via ``jax.sharding.Mesh`` + NamedSharding and
  an optional spatially-sharded (halo-exchange) mode for large resolutions.
"""

__version__ = "0.1.0"

from eelunet_tpu.registry import ModelOutput, create_model, MODEL_REGISTRY

__all__ = ["ModelOutput", "create_model", "MODEL_REGISTRY", "__version__"]
