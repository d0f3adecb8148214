"""rep_yolo_tpu — a TPU-native (JAX/XLA/Pallas/pjit) object-detection framework.

A from-scratch rebuild of the capabilities of the Rep-YOLO reference
(a YOLOv7-lineage single-stage anchor-based detector with reparameterizable
convolution blocks), designed TPU-first:

- NHWC layout, bf16 compute / fp32 params, static shapes everywhere.
- Functional core: params are pytrees, the model is a pure ``apply`` fn.
- Reparameterization ("fuse") is a pure ``train_params -> deploy_params``
  pytree transform, property-tested against the multi-branch forward.
- Postprocessing (anchor decode + class-aware batched NMS) stays on device.
- Scaling via ``jax.sharding.Mesh`` + jit sharding annotations (data
  parallel with implicitly-global BatchNorm statistics), not NCCL calls.
"""

__version__ = "0.1.0"
