"""Native checkpointing via orbax.

Equivalent of the reference DetectionCheckpointer
(detectron2/checkpoint/detection_checkpoint.py:11-60 + engine/defaults.py:
304-320): periodic saves of {train state, iteration}, resume-or-load, and
ingestion of reference-format ``.pkl``/``.pth`` weights through
:mod:`.torch_import`.
"""

from __future__ import annotations

import logging
import os
from typing import Optional

import jax
import orbax.checkpoint as ocp

logger = logging.getLogger(__name__)


class Checkpointer:
    def __init__(self, directory: str, max_to_keep: int = 5):
        self._dir = os.path.abspath(directory)
        os.makedirs(self._dir, exist_ok=True)
        self._mngr = ocp.CheckpointManager(
            self._dir,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True),
        )

    def save(self, state, step: int):
        # Multi-host: EVERY process must call save — orbax coordinates the
        # write internally (each process persists its addressable shards;
        # the primary host commits the metadata). This is the jax-native
        # equivalent of the reference's rank-0-only save
        # (detection_checkpoint.py:17-24), where rank 0 holds the full
        # replicated state; exercised for real by the 2-process harness
        # (tests/mh_worker_script.py).
        self._mngr.save(step, args=ocp.args.StandardSave(state))
        self._mngr.wait_until_finished()
        logger.info(f"Saved checkpoint at step {step} to {self._dir}")

    def latest_step(self) -> Optional[int]:
        return self._mngr.latest_step()

    def load(self, state_template, step: Optional[int] = None):
        step = step if step is not None else self.latest_step()
        if step is None:
            raise FileNotFoundError(f"No checkpoint in {self._dir}")
        abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, state_template)
        restored = self._mngr.restore(
            step, args=ocp.args.StandardRestore(abstract))
        logger.info(f"Restored checkpoint step {step} from {self._dir}")
        return restored

    def resume_or_load(self, state_template, weights_path: str = "",
                       resume: bool = True):
        """Resume from the latest native checkpoint if present; otherwise
        load initial weights (reference/torch or native) into the params only.

        Returns (state, start_iter).
        """
        if resume and self.latest_step() is not None:
            state = self.load(state_template)
            return state, int(state.step)
        if weights_path:
            from .torch_import import load_reference_weights
            params = load_reference_weights(weights_path,
                                            state_template.params)
            state = state_template.replace(params=params)
            return state, 0
        return state_template, 0
