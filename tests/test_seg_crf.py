import jax
import jax.numpy as jnp
import numpy as np

from drn_wsod_tpu.models.heads.seg import (ASPPSegHead, MaskRCNNHead,
                                           mask_loss, seg_loss_from_cpg)
from drn_wsod_tpu.ops.crf import crf_forward, crf_inference


def _mean_field_oracle(probs, image, max_iter=10, size_std=500.0,
                       pos_w=3.0, pos_xy_std=3.0, bi_w=10.0,
                       bi_xy_std=80.0, bi_rgb_std=13.0):
    """EXACT dense-kernel mean-field oracle with the reference's LIVE CRF
    semantics (``dense_crf``, seg_heads/crf.py:6-85 + the pydensecrf
    library's update rule; the native crf_cpu.cpp op is dead code there):

      * unary energies U = -log(clip(p, 1e-5)) (unary_from_softmax),
        Q0 = softmax(-U);
      * stds divided by scale_factor = size_std / max(H, W)
        (seg_heads/crf.py:51);
      * per iteration Q <- softmax(-U + pos_w*(Kg x Q) + bi_w*(Kb x Q)),
        both kernels exp(-||f_i - f_j||^2 / 2) over their feature spaces,
        symmetrically normalized (NORMALIZE_SYMMETRIC, the library default:
        msg_i = n_i * sum_j k_ij n_j q_j with n = 1/sqrt(K @ 1)); the self
        term is included, as permutohedral filtering includes it;
      * Q returned directly (no output clamp, seg_heads/crf.py:78-85).

    Dense N^2 kernels — host-side test oracle only, fixtures <= ~56x56."""
    H, W, L = probs.shape
    N = H * W
    scale = size_std / max(H, W)
    yy, xx = np.mgrid[0:H, 0:W]
    pos = np.stack([xx.ravel(), yy.ravel()], 1).astype(np.float64)

    def kernel(feat):
        d2 = ((feat[:, None, :] - feat[None, :, :]) ** 2).sum(-1)
        K = np.exp(-0.5 * d2)
        n = 1.0 / np.sqrt(K.sum(1))
        return K, n

    Kg, ng = kernel(pos / (pos_xy_std / scale))
    rgb = image.reshape(N, -1).astype(np.float64) / bi_rgb_std
    Kb, nb = kernel(np.concatenate([pos / (bi_xy_std / scale), rgb], 1))

    def softmax(z):
        z = z - z.max(1, keepdims=True)
        e = np.exp(z)
        return e / e.sum(1, keepdims=True)

    log_p = np.log(np.maximum(probs.reshape(N, L).astype(np.float64), 1e-5))
    q = softmax(log_p)
    for _ in range(max_iter):
        mg = ng[:, None] * (Kg @ (ng[:, None] * q))
        mb = nb[:, None] * (Kb @ (nb[:, None] * q))
        q = softmax(log_p + pos_w * mg + bi_w * mb)
    return q.reshape(H, W, L)


def _two_region_fixture(H=48, W=48, noise=0.2, seed=0):
    """Structured fixture: two color regions, noisy unaries favoring the
    true partition."""
    rng = np.random.RandomState(seed)
    img = np.zeros((H, W, 3), dtype=np.float32)
    img[:, :W // 2] = (200.0, 60.0, 40.0)
    img[:, W // 2:] = (40.0, 80.0, 210.0)
    img += rng.randn(H, W, 3).astype(np.float32) * 5.0
    true = np.zeros((H, W), dtype=np.int64)
    true[:, W // 2:] = 1
    conf = np.where(true == 0, 0.75, 0.25).astype(np.float32)
    unary = np.stack([conf, 1.0 - conf], -1)
    flip = rng.rand(H, W) < noise
    unary[flip] = unary[flip][:, ::-1]
    return unary, img, true


def test_crf_forward_matches_mean_field_oracle():
    """Quantifies the shipped dilated-window approximation against the
    EXACT dense-kernel mean-field with the reference's live semantics
    (VERDICT r4 item 5 — the last 'partial' on the component board).

    Two regimes, deliberately:
      * STRUCTURED fixture at the full 10 iterations — the product regime
        (confident-somewhere seg probabilities): the fixed point is stable,
        so fixed-point-vs-fixed-point is meaningful. Measured with the
        dilated full-res bilateral: label-flip rate 0.0000, mean
        KL(oracle||approx) 6.8e-07, max KL 2.0e-04. (The earlier
        guidance-downsample design measured flip 0.0061 / KL 1.5e-02, and
        0.13 mean per-channel MESSAGE error on noise guidance — that is
        why it was replaced.)
      * RANDOM near-uniform q + white-noise guidance, SINGLE bilateral
        message application — the worst case for any sub-dense sampling
        scheme, measured at the message level because fixed-point
        comparison is meaningless there (coupling >> a ~0 unary signal
        makes the iteration multistable; oracle and approximation land in
        different, equally-valid consensus basins). Measured mean
        |msg error| per channel at sigma_bi=7.68: 6.2e-2 dilated
        81 taps (shipped), vs 1.4e-1 for guidance-downsampling (the
        rejected design) and 3.7e-3 for a dense 961-tap window (the error
        is dilation's color subsampling, which only full density removes —
        sweep in PERF.md round-5). On natural (locally-coherent) guidance
        the dilated window is what makes the structured fixed point above
        machine-exact.
    Asserted bounds are ~2-5x measured to absorb platform jitter without
    letting a real regression (an unscaled sigma or broken normalization
    flips > 5% on the structured fixture) pass."""
    # --- structured fixture, full 10-iteration fixed point
    unary, img, true = _two_region_fixture()
    want = _mean_field_oracle(unary, img)
    got = np.asarray(crf_forward(jnp.asarray(unary), jnp.asarray(img)))

    flip = (want.argmax(-1) != got.argmax(-1)).mean()
    kl = (want * (np.log(want) - np.log(np.maximum(got, 1e-8)))).sum(-1)
    assert flip <= 0.005, flip
    assert kl.mean() <= 1e-4, kl.mean()

    # the refinement must also DO something: agreement with the true
    # partition should improve over the noisy unary argmax
    before = (unary.argmax(-1) == true).mean()
    after = (got.argmax(-1) == true).mean()
    assert after > before
    assert after > 0.97


def test_crf_bilateral_message_matches_dense_kernel():
    """Single-application bilateral-message fidelity on the worst case for
    a windowed scheme: iid random beliefs and white-noise guidance (no
    local color coherence to hide behind). See the oracle-test docstring
    for why this regime is checked per-message, not at the fixed point."""
    from drn_wsod_tpu.ops.crf import _bilateral_message

    rng = np.random.RandomState(1)
    H = W = 48
    L = 3
    img = (rng.rand(H, W, 3) * 255.0).astype(np.float32)
    q = rng.dirichlet(np.ones(L), size=(H, W))

    size_std, bi_xy_std, bi_rgb_std = 500.0, 80.0, 13.0
    sigma_bi = bi_xy_std / (size_std / max(H, W))

    yy, xx = np.mgrid[0:H, 0:W]
    pos = np.stack([xx.ravel(), yy.ravel()], 1).astype(np.float64)
    feat = np.concatenate([pos / sigma_bi,
                           img.reshape(-1, 3) / bi_rgb_std], 1)
    K = np.exp(-0.5 * ((feat[:, None, :] - feat[None, :, :]) ** 2).sum(-1))
    n = 1.0 / np.sqrt(K.sum(1))
    exact = (n[:, None] * (K @ (n[:, None] * q.reshape(-1, L)))
             ).reshape(H, W, L)

    stride = max(1, int(round(sigma_bi / 2.0)))
    approx = np.asarray(_bilateral_message(
        jnp.asarray(q, jnp.float32), jnp.asarray(img), sigma_bi,
        bi_rgb_std, 4, normalize="sym", stride=stride))

    err = np.abs(approx - exact)
    assert err.mean() <= 1e-1, err.mean()       # measured 6.2e-2 (shipped
    assert err.max() <= 6e-1, err.max()         # 81-tap dilation; see
    # docstring above for the 1.4e-1 downsample / 3.7e-3 dense ladder)


def test_aspp_seg_head_shapes():
    head = ASPPSegHead(num_classes=4)
    x = jnp.zeros((2, 16, 16, 32))
    params = head.init(jax.random.PRNGKey(0), x)
    out = head.apply(params, x)
    assert out.shape == (2, 16, 16, 5)


def test_mask_head_shapes():
    head = MaskRCNNHead(num_classes=4, num_conv=2, conv_dim=16)
    x = jnp.zeros((6, 14, 14, 32))
    params = head.init(jax.random.PRNGKey(0), x)
    out = head.apply(params, x)
    assert out.shape == (6, 28, 28, 4)


def test_seg_loss_from_cpg_supervision():
    B, Hf, Wf, C = 1, 8, 8, 2
    cpg = np.zeros((B, C, 32, 32), dtype=np.float32)
    cpg[0, 0, :16, :16] = 1.0   # class 0 activates top-left quadrant
    labels = jnp.asarray([[1.0, 0.0]])
    hw = jnp.asarray([[32, 32]])

    # logits perfectly matching the pseudo labels -> small loss
    good = np.full((B, Hf, Wf, C + 1), -5.0, dtype=np.float32)
    good[0, :4, :4, 1] = 5.0
    good[0, :, :, 0] = np.where(good[0, :, :, 1] > 0, -5.0, 5.0)
    bad = -np.asarray(good)

    l_good = float(seg_loss_from_cpg(jnp.asarray(good), jnp.asarray(cpg),
                                     labels, hw))
    l_bad = float(seg_loss_from_cpg(jnp.asarray(bad), jnp.asarray(cpg),
                                    labels, hw))
    assert l_good < 0.01
    assert l_bad > 1.0


def test_mask_loss():
    N, m, C = 4, 8, 3
    logits = jnp.full((N, m, m, C), -8.0)
    logits = logits.at[0, :, :, 1].set(8.0)
    targets = jnp.zeros((N, m, m)).at[0].set(1.0)
    fg = jnp.asarray([True, False, False, False])
    l = float(mask_loss(logits, jnp.asarray([1, 0, 0, 0]), targets, fg))
    assert l < 1e-3


def test_crf_sharpens_noisy_unary():
    # Clean two-region image; noisy unaries. CRF should increase agreement
    # with the true partition.
    rng = np.random.RandomState(0)
    H = W = 32
    img = np.zeros((H, W, 3), dtype=np.float32)
    img[:, :16] = 220.0
    img[:, 16:] = 30.0
    true = np.zeros((H, W), dtype=np.int32)
    true[:, 16:] = 1

    unary = np.zeros((H, W, 2), dtype=np.float32)
    conf = np.where(true == 0, 0.7, 0.3)
    unary[..., 0] = conf
    unary[..., 1] = 1 - conf
    noise = rng.rand(H, W) < 0.15          # flip 15% of pixels
    unary[noise] = unary[noise][:, ::-1]

    before = (unary.argmax(-1) == true).mean()
    q = np.asarray(crf_inference(jnp.asarray(unary), jnp.asarray(img),
                                 num_iters=3, downsample=1))
    after = (q.argmax(-1) == true).mean()
    assert after >= before
    assert after > 0.95
