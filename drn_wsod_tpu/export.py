"""Model export.

TPU-native equivalent of the reference export layer
(detectron2/export/api.py: Caffe2 tracing / TorchScript): the deployment
artifact here is a serialized StableHLO program via ``jax.export`` — the
portable, runtime-loadable form of an XLA model (loadable from JAX, TF
(tf.XlaCallModule) or IFRT serving stacks).
"""

from __future__ import annotations

import logging
import os
from typing import Optional

import jax

logger = logging.getLogger(__name__)


_SERIALIZATION_REGISTERED = False


def _ensure_batch_serialization():
    """Register WSODBatch (a chex dataclass pytree) with jax.export's
    pytree serializer so the exported calling convention round-trips. The
    auxdata is the sorted field-name tuple — serialized as JSON (no pickle
    in the artifact)."""
    global _SERIALIZATION_REGISTERED
    if _SERIALIZATION_REGISTERED:
        return
    import json

    from jax import export as jax_export

    from .structures import WSODBatch

    jax_export.register_pytree_node_serialization(
        WSODBatch,
        serialized_name="drn_wsod_tpu.WSODBatch",
        serialize_auxdata=lambda aux: json.dumps(list(aux)).encode(),
        deserialize_auxdata=lambda data: tuple(json.loads(data.decode())),
    )
    _SERIALIZATION_REGISTERED = True


def export_inference(model, variables, batch, path: Optional[str] = None):
    """Serialize the inference forward (scores + boxes) for the given
    example batch shapes. Returns the serialized bytes (and writes them to
    ``path`` if given)."""
    from jax import export as jax_export

    _ensure_batch_serialization()

    def forward(variables, batch):
        return model.apply(variables, batch, method="inference_scores")

    exported = jax_export.export(jax.jit(forward))(variables, batch)
    data = exported.serialize()
    if path:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "wb") as f:
            f.write(data)
        logger.info(f"Exported inference program ({len(data)} bytes) "
                    f"to {path}")
    return data


def load_exported(path_or_bytes):
    """Deserialize an exported program; returns an object whose ``.call``
    runs it."""
    from jax import export as jax_export

    _ensure_batch_serialization()
    data = path_or_bytes
    if isinstance(path_or_bytes, str):
        with open(path_or_bytes, "rb") as f:
            data = f.read()
    return jax_export.deserialize(bytearray(data))
