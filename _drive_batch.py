"""Drive the tuned batched CLI on a synthetic 1024x2048 dataset (real chip).

Generates 24 videos x 6 frames of structured PNGs, then runs
cli.test_eval_vpq --tuned --batch_videos 8.  The per-group prints give the
steady-state device throughput (groups 2-3; group 1 includes compile).
"""

import json
import os

import cv2
import numpy as np

ROOT = "/tmp/drive_batch16"
NV, NF = 16, 6


def gen():
    os.makedirs(ROOT + "/img", exist_ok=True)
    images = []
    rng = np.random.default_rng(0)
    for v in range(1, NV + 1):
        base = np.zeros((1024, 2048, 3), np.uint8)
        base[:400] = (200, 150, 100)
        base[400:] = (60, 80, 90)
        for _ in range(6):
            x, y = int(rng.integers(0, 1800)), int(rng.integers(0, 900))
            w, h = int(rng.integers(60, 260)), int(rng.integers(60, 160))
            col = tuple(int(c) for c in rng.integers(0, 255, 3))
            cv2.rectangle(base, (x, y), (x + w, y + h), col, -1)
        for f in range(1, NF + 1):
            img = np.roll(base, 16 * f, axis=1)
            name = f"{v:04d}_{f:04d}_img.png"
            cv2.imwrite(f"{ROOT}/img/{name}", img)
            images.append({"id": v * 10000 + f, "file_name": name,
                           "height": 1024, "width": 2048})
    with open(ROOT + "/ann.json", "w") as fh:
        json.dump({"images": images, "categories": [],
                   "annotations": []}, fh)


if __name__ == "__main__":
    if not os.path.exists(ROOT + "/ann.json"):
        gen()
        print("dataset generated", flush=True)
    import dataclasses
    import time

    import slotvps_tpu.cli.test_eval_vpq as cli

    real = cli.named_config
    cli.named_config = lambda name: (lambda c: dataclasses.replace(
        c, data=dataclasses.replace(c.data, nframes_span_test=NF)))(
            real(name))
    main = cli.main

    t0 = time.time()
    main(["--ann_file", ROOT + "/ann.json", "--img_prefix", ROOT + "/img",
          "--out", ROOT + "/out.pkl", "--tuned", "--batch_videos", "8"])
    print(f"total wall (incl. compile + fusion + artifacts): "
          f"{time.time() - t0:.1f}s for {NV * NF} frames")
