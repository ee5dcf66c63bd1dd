"""Reference-checkpoint importer: name mapping + layout conversion against a
synthetic Detectron2-style state dict."""

import pickle

import jax
import numpy as np

from drn_wsod_tpu.checkpoint.torch_import import (_convert_array,
                                                  _d2_name_to_flax,
                                                  load_reference_weights)


def test_name_mapping():
    cases = {
        "backbone.stem.conv1.weight": "backbone.stem.conv1.kernel",
        # norm affine weights keep the torch leaf name (FrozenBatchNorm
        # stores weight/bias/running_mean/running_var)
        "backbone.stem.conv1.norm.weight": "backbone.stem.conv1_norm.weight",
        "backbone.res2.0.conv1.weight": "backbone.res2_0.conv1.kernel",
        "backbone.res2.0.conv1.norm.running_mean":
            "backbone.res2_0.conv1_norm.running_mean",
        "backbone.res5.2.shortcut.norm.bias":
            "backbone.res5_2.shortcut_norm.bias",
        "roi_heads.box_head.fc1.weight": "box_head.fc1.kernel",
        "roi_heads.box_predictor.cls.bias": "box_predictor.cls.bias",
        "roi_heads.box_refinery.0.cls_score.weight":
            "box_refinery_0.cls_score.kernel",
        "backbone.plain1.0.conv1.weight": "backbone.plain1.conv1.kernel",
    }
    for src, want in cases.items():
        assert _d2_name_to_flax(src) == want, src


def test_conv_layout_conversion():
    torch_w = np.arange(2 * 3 * 5 * 5).reshape(2, 3, 5, 5).astype(np.float32)
    target = np.zeros((5, 5, 3, 2))
    out = _convert_array(torch_w, target, "backbone.stem.conv1.kernel")
    assert out.shape == (5, 5, 3, 2)
    # spot-check an element: torch [o, i, kh, kw] -> flax [kh, kw, i, o]
    np.testing.assert_allclose(out[1, 2, 0, 1], torch_w[1, 0, 1, 2])


def test_dense_and_fc1_permutation():
    # dense
    tw = np.arange(6).reshape(2, 3).astype(np.float32)
    out = _convert_array(tw, np.zeros((3, 2)), "box_predictor.cls.kernel")
    np.testing.assert_allclose(out, tw.T)

    # DAN fc1: torch flattens (C, 7, 7); we flatten (7, 7, C)
    C, O = 2, 4
    tw = np.random.RandomState(0).randn(O, C * 49).astype(np.float32)
    out = _convert_array(tw, np.zeros((49 * C, O)), "box_head.fc1.kernel")
    # element check: torch input index (c, kh, kw) -> flax (kh, kw, c)
    c, kh, kw = 1, 3, 5
    t_idx = c * 49 + kh * 7 + kw
    f_idx = kh * 7 * C + kw * C + c
    np.testing.assert_allclose(out[f_idx, 0], tw[0, t_idx])


def test_load_reference_weights_pkl_roundtrip(tmp_path):
    # build a tiny model, export its params as a d2-style pkl, reload
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from test_modeling import tiny_batch, tiny_cfg

    from drn_wsod_tpu.models import build_model

    cfg = tiny_cfg("WSDDNROIHeads", depth=18)
    model = build_model(cfg)
    batch = tiny_batch()
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)},
                           batch, train=True)

    # fabricate a d2 checkpoint containing one conv + one dense
    flax_stem = np.asarray(
        variables["params"]["backbone"]["stem"]["conv1"]["kernel"])
    new_stem_torch = np.random.RandomState(1).randn(
        *flax_stem.transpose(3, 2, 0, 1).shape).astype(np.float32)
    cls_kernel = np.asarray(
        variables["params"]["box_predictor"]["cls"]["kernel"])
    new_cls_torch = np.random.RandomState(2).randn(
        *cls_kernel.T.shape).astype(np.float32)
    ckpt = {"model": {
        "backbone.stem.conv1.weight": new_stem_torch,
        "roi_heads.box_predictor.cls.weight": new_cls_torch,
    }}
    path = str(tmp_path / "ref.pkl")
    with open(path, "wb") as f:
        pickle.dump(ckpt, f)

    out = load_reference_weights(path, variables)
    got_stem = np.asarray(out["params"]["backbone"]["stem"]["conv1"]["kernel"])
    np.testing.assert_allclose(got_stem, new_stem_torch.transpose(2, 3, 1, 0))
    got_cls = np.asarray(out["params"]["box_predictor"]["cls"]["kernel"])
    np.testing.assert_allclose(got_cls, new_cls_torch.T)
    # untouched params keep their init
    same = np.asarray(out["params"]["box_predictor"]["det"]["kernel"])
    np.testing.assert_allclose(
        same, np.asarray(variables["params"]["box_predictor"]["det"]["kernel"]))
