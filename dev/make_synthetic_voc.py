"""Build the synthetic VOC2007 fixture used by dev/run_inference_tests.sh
when no real dataset is present (this container has zero egress). Reuses the
same generator the pytest e2e suite uses (tests/test_e2e_train.py) so the
dev harness and the test suite exercise identical data.

Usage: python dev/make_synthetic_voc.py <root-dir>
Prints the proposal pickle path on stdout.
"""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def main():
    root = sys.argv[1]
    os.makedirs(root, exist_ok=True)
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    from test_e2e_train import make_voc_dataset

    _, prop_file = make_voc_dataset(root, n_images=5, hw=64)
    print(prop_file)


if __name__ == "__main__":
    main()
