"""Degenerate-input robustness (reference tests/modeling/test_model_e2e.py:
test_empty_data / test_roiheads_inf_nan_data): masked static-shape models
must produce finite losses when slots are empty or poisoned."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))
from test_modeling import tiny_batch, tiny_cfg  # noqa: E402

from drn_wsod_tpu.models import build_model  # noqa: E402


def _losses(cfg, batch):
    model = build_model(cfg)
    params = model.init({"params": jax.random.PRNGKey(0),
                         "dropout": jax.random.PRNGKey(1)}, batch, train=True)
    return model.apply(params, batch, train=True,
                       rngs={"dropout": jax.random.PRNGKey(2)})


@pytest.mark.slow
def test_all_proposals_invalid():
    batch = tiny_batch()
    batch = batch.replace(
        proposal_mask=jnp.zeros_like(batch.proposal_mask))
    losses = _losses(tiny_cfg("OICRROIHeads"), batch)
    for k, v in losses.items():
        assert np.isfinite(float(v)), k


@pytest.mark.slow
def test_no_image_labels():
    batch = tiny_batch()
    batch = batch.replace(labels=jnp.zeros_like(batch.labels))
    losses = _losses(tiny_cfg("OICRROIHeads"), batch)
    for k, v in losses.items():
        assert np.isfinite(float(v)), k


@pytest.mark.slow
def test_nan_in_invalid_slots():
    """Poisoned padding slots must not leak through the masks (the
    reference's inf/nan GT-box test, adapted to the padded design)."""
    batch = tiny_batch()
    prop = np.asarray(batch.proposals).copy()
    obj = np.asarray(batch.objectness).copy()
    mask = np.asarray(batch.proposal_mask)
    prop[~mask] = np.nan
    obj[~mask] = np.inf
    batch = batch.replace(proposals=jnp.asarray(prop),
                          objectness=jnp.asarray(obj))
    losses = _losses(tiny_cfg("OICRROIHeads"), batch)
    for k, v in losses.items():
        assert np.isfinite(float(v)), k


@pytest.mark.slow
def test_fast_rcnn_empty_gt():
    batch = tiny_batch()
    batch = batch.replace(gt_valid=jnp.zeros_like(batch.gt_valid))
    losses = _losses(tiny_cfg("StandardROIHeads"), batch)
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
