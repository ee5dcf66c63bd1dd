"""drn_wsod_tpu: a TPU-native weakly-supervised object detection framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
shenyunhang/DRN-WSOD-pytorch (a Detectron2 fork implementing DRN-WSOD, ECCV
2020): training object detectors from image-level labels only, with
precomputed proposals, a WSDDN two-stream MIL head and OICR/PCL/CSC online
instance refinement, evaluated by VOC mAP / CorLoc and COCO AP.

Design stance (not a port):
  * fixed static shapes everywhere: proposals padded to a fixed count with a
    validity mask, images padded to size buckets — one XLA compilation per
    bucket, everything jit-able;
  * functional core: models are pytrees of params + pure apply functions;
  * data parallelism via ``jax.sharding.Mesh`` + jit shardings (the reference
    uses torch DDP/NCCL, see /root/reference/detectron2/engine/launch.py);
  * hot per-proposal ops (RoI pooling, NMS) are masked tensor ops / Pallas
    kernels instead of per-image Python loops over ``Instances``.
"""

__version__ = "0.1.0"
