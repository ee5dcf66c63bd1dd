"""Native eval core: availability + bit-parity with the numpy paths."""

import numpy as np
import pytest

from drn_wsod_tpu import native
from drn_wsod_tpu.evaluation import voc_eval as V

pytestmark = [pytest.mark.core,
              pytest.mark.skipif(not native.available(),
                                 reason="native core not built")]


def random_dataset(seed, n_images=12, n_classes=3):
    rng = np.random.RandomState(seed)
    gt = {}
    for i in range(n_images):
        annos = []
        for _ in range(rng.randint(0, 5)):
            x1, y1 = rng.uniform(0, 80, 2)
            w, h = rng.uniform(10, 60, 2)
            annos.append({"category_id": int(rng.randint(n_classes)),
                          "bbox": [x1, y1, x1 + w, y1 + h],
                          "difficult": int(rng.rand() < 0.2)})
        gt[f"im{i}"] = annos
    dets = []
    for i in range(n_images):
        for _ in range(rng.randint(0, 10)):
            x1, y1 = rng.uniform(0, 80, 2)
            w, h = rng.uniform(10, 60, 2)
            dets.append((f"im{i}", float(rng.rand()),
                         x1, y1, x1 + w, y1 + h))
    return gt, dets


def _python_ap(dets, gt, cls, thr, use07):
    """Run the pure-python path by bypassing the native branch."""
    class_recs, npos, _ = V._gather_class_gt(gt, cls)
    if not dets:
        return 0.0
    image_ids = [d[0] for d in dets]
    confidence = np.array([d[1] for d in dets])
    BB = np.array([d[2:] for d in dets], dtype=np.float64).reshape(-1, 4)
    order = np.argsort(-confidence, kind="stable")
    BB = BB[order]
    image_ids = [image_ids[i] for i in order]
    tp = np.zeros(len(image_ids)); fp = np.zeros(len(image_ids))
    for d in range(len(image_ids)):
        R = class_recs.get(image_ids[d])
        ovmax, jmax = -np.inf, -1
        if R is not None and R.bbox.size > 0:
            overlaps = V._voc_overlaps(R.bbox, BB[d])
            ovmax = overlaps.max(); jmax = int(overlaps.argmax())
        if ovmax > thr:
            if not R.difficult[jmax]:
                if not R.det[jmax]:
                    tp[d] = 1.0; R.det[jmax] = True
                else:
                    fp[d] = 1.0
        else:
            fp[d] = 1.0
    fp = np.cumsum(fp); tp = np.cumsum(tp)
    rec = tp / float(max(npos, 1))
    prec = tp / np.maximum(tp + fp, np.finfo(np.float64).eps)
    return V.voc_ap(rec, prec, use07)


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("thr", [0.5, 0.75])
def test_native_vs_python_ap(seed, thr):
    gt, dets = random_dataset(seed)
    for cls in range(3):
        cls_dets = dets  # voc_eval_class filters by nothing; same list for both
        native_ap = V.voc_eval_class(cls_dets, gt, cls, thr, True)
        python_ap = _python_ap(cls_dets, gt, cls, thr, True)
        np.testing.assert_allclose(native_ap, python_ap, atol=1e-10,
                                   err_msg=f"cls={cls}")


def test_native_coco_match_parity():
    from drn_wsod_tpu.evaluation.coco_eval import IOU_THRS, _match_image

    rng = np.random.RandomState(3)
    det = rng.uniform(0, 80, (6, 4)); det[:, 2:] += det[:, :2]
    gt = rng.uniform(0, 80, (4, 4)); gt[:, 2:] += gt[:, :2]
    scores = rng.rand(6)
    gt_ignore = np.array([False, True, False, False])
    tp_py, ign_py, s = _match_image(det, scores, gt, gt_ignore, IOU_THRS, 100)
    order = np.argsort(-scores, kind="stable")
    tp_c, ign_c = native.coco_match(det[order], gt,
                                    gt_ignore.astype(np.uint8), IOU_THRS)
    np.testing.assert_array_equal(tp_py, tp_c.astype(bool))
    np.testing.assert_array_equal(ign_py, ign_c.astype(bool))


def test_jpeg_decode_bit_exact_vs_pil(tmp_path):
    """Native libjpeg decoder (native/jpeg_decode.cpp) matches PIL exactly
    and the mapper's read_image uses it transparently."""
    import io

    import numpy as np
    from PIL import Image

    from drn_wsod_tpu.native import jpeg_available, jpeg_decode
    from drn_wsod_tpu.data.mapper import read_image

    if not jpeg_available():
        import pytest
        pytest.skip("native jpeg decoder unavailable")

    rng = np.random.RandomState(0)
    img = (rng.rand(37, 53, 3) * 255).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, "JPEG", quality=92)
    data = buf.getvalue()

    ref = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    got = jpeg_decode(data)
    np.testing.assert_array_equal(got, ref)

    # DCT-domain half-scale decode
    half = jpeg_decode(data, scale_num=4)
    assert half.shape == ((37 + 1) // 2, (53 + 1) // 2, 3)

    p = tmp_path / "img.jpg"
    p.write_bytes(data)
    arr = read_image(str(p), "RGB")
    np.testing.assert_array_equal(arr, ref)
    arr_bgr = read_image(str(p), "BGR")
    np.testing.assert_array_equal(arr_bgr, ref[:, :, ::-1])
