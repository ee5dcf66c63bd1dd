"""Measure the SHIPPED CLI trainer's hardware throughput at the bench config.

bench.py times a hand-rolled lax.scan over the flagship train step; the
Trainer ships the same K-steps-per-dispatch execution (engine/trainer.py,
SOLVER.STEPS_PER_DISPATCH). This probe closes the loop: it runs the actual
``tools/train_net.py`` entry point — loader threads, hooks, writers, chunked
dispatch and all — on a flagship-scale synthetic VOC (square 500px JPEGs so
MIN_SIZE_TRAIN 688 lands every image in the bench's 704 bucket; 4096
proposals/image) and reports img/s/chip from the fenced per-chunk times the
IterationTimer publishes, excluding the compile-bearing first chunk.

Usage: python tools/cli_throughput.py [--iters 80] [--images 48]
Prints ONE JSON line. Run with a healthy tunnel (see bench.py's probe).
"""

import argparse
import json
import os
import pickle
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CLASSES = ("aeroplane", "bicycle", "bird", "boat", "bottle")


def make_dataset(root: str, n_images: int, size: int, n_prop: int) -> str:
    from PIL import Image

    rng = np.random.RandomState(0)
    d = os.path.join(root, "VOC2007")
    for sub in ("JPEGImages", "Annotations", os.path.join("ImageSets", "Main")):
        os.makedirs(os.path.join(d, sub), exist_ok=True)

    ids, boxes_all, logits_all = [], [], []
    for i in range(n_images):
        name = f"im{i:04d}"
        ids.append(name)
        img = rng.randint(0, 255, (size, size, 3), dtype=np.uint8)
        Image.fromarray(img).save(
            os.path.join(d, "JPEGImages", name + ".jpg"), quality=90)
        cls = CLASSES[i % len(CLASSES)]
        x1, y1 = rng.randint(5, size // 3, 2)
        x2 = x1 + rng.randint(40, size // 2)
        y2 = y1 + rng.randint(40, size // 2)
        xml = (f"<annotation><size><width>{size}</width>"
               f"<height>{size}</height><depth>3</depth></size>"
               f"<object><name>{cls}</name><difficult>0</difficult>"
               f"<bndbox><xmin>{x1}</xmin><ymin>{y1}</ymin>"
               f"<xmax>{x2}</xmax><ymax>{y2}</ymax></bndbox>"
               f"</object></annotation>")
        with open(os.path.join(d, "Annotations", name + ".xml"), "w") as f:
            f.write(xml)
        # VOC-like proposal mix (MCG spans tiny superpixels to whole-image)
        px1 = rng.uniform(0, size * 0.8, n_prop)
        py1 = rng.uniform(0, size * 0.8, n_prop)
        pw = rng.uniform(8, size * 0.6, n_prop)
        ph = rng.uniform(8, size * 0.6, n_prop)
        pb = np.stack([px1, py1,
                       np.minimum(px1 + pw, size - 1),
                       np.minimum(py1 + ph, size - 1)], 1).astype(np.float32)
        boxes_all.append(pb)
        logits_all.append(rng.uniform(0, 1, n_prop).astype(np.float32))

    for split in ("train", "test"):
        with open(os.path.join(d, "ImageSets", "Main", split + ".txt"),
                  "w") as f:
            f.write("\n".join(ids) + "\n")
    prop_file = os.path.join(root, "props.pkl")
    with open(prop_file, "wb") as f:
        pickle.dump({"ids": ids, "boxes": boxes_all,
                     "objectness_logits": logits_all, "bbox_mode": 0}, f)
    return prop_file


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=80)
    ap.add_argument("--images", type=int, default=48)
    ap.add_argument("--root", default="/tmp/cli_tp_voc")
    args = ap.parse_args()

    prop_file = make_dataset(args.root, args.images, size=500, n_prop=4096)
    out_dir = os.path.join(args.root, "out")
    cfg_path = os.path.join(args.root, "probe.yaml")
    with open(cfg_path, "w") as f:
        f.write(f"""_BASE_: "{REPO}/configs/PascalVOC-Detection/oicr_WSR_50_DC5_1x.yaml"
MODEL:
  WEIGHTS: ""
DATASETS:
  TRAIN: ('voc_2007_train',)
  PROPOSAL_FILES_TRAIN: ('{prop_file}',)
  TEST: ()
INPUT:
  MIN_SIZE_TRAIN: (688,)
  CROP:
    ENABLED: False
SOLVER:
  IMS_PER_BATCH: 2
  MAX_ITER: {args.iters}
  STEPS: ({args.iters - 1},)
  CHECKPOINT_PERIOD: {args.iters}
TEST:
  EVAL_PERIOD: 0
  EVAL_TRAIN: False
  AUG:
    ENABLED: False
VIS_PERIOD: 0
OUTPUT_DIR: "{out_dir}"
""")
    # fresh metrics: JSONWriter APPENDS, and stale rows from a previous
    # probe run would silently pollute the stats below (bit round 5)
    metrics_path = os.path.join(out_dir, "metrics.json")
    if os.path.exists(metrics_path):
        os.remove(metrics_path)
    env = dict(os.environ)
    env["DETECTRON2_DATASETS"] = args.root
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "train_net.py"),
         "--config-file", cfg_path],
        text=True, timeout=3600, env=env, cwd=REPO,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
    sys.stderr.write(r.stdout[-4000:])
    if r.returncode != 0:
        sys.exit(r.returncode)

    # fenced chunk-time scalars ("time") from metrics.json; drop the
    # compile-bearing first chunk (iteration < K)
    import jax  # only for device_count; after the subprocess to avoid 2 TPU clients

    times = []
    with open(metrics_path) as f:
        for line in f:
            rec = json.loads(line)
            if "time" in rec and rec.get("iteration", 0) >= 20:
                times.append(float(rec["time"]))
    assert times, "no post-compile time scalars recorded"
    sec_it = float(np.mean(times))
    img_s = 2.0 / sec_it / jax.device_count()
    # median isolates the steady state from tunnel-stall windows (the
    # axon link oscillates; a single stalled fence window should be
    # visible in the per-window list, not silently averaged in)
    sec_med = float(np.median(times))
    print(json.dumps({
        "metric": "cli_trainer_images_per_sec_per_chip",
        "value": round(2.0 / sec_med / jax.device_count(), 3),
        "unit": "img/s/chip",
        "sec_per_iter_median": round(sec_med, 5),
        "sec_per_iter_mean": round(sec_it, 5),
        "sec_per_iter_windows": [round(t, 4) for t in times],
        "mean_img_s": round(img_s, 3),
        "vs_baseline": round(2.0 / sec_med / jax.device_count() / (42.1 / 8),
                             3),
    }), flush=True)


if __name__ == "__main__":
    main()
