"""Host input-pipeline benchmark: python (numpy/PIL) protocol vs the native
C++ feeder, on synthetic 128px 5-frame stories packed to 512px batches (the
FlintstonesSV configuration).

    python tools/bench_feeder.py [--batches 8] [--batch-size 8] [--threads 4]

Prints stories/s for both paths; used for the BASELINE.md input-pipeline
table (the reference's equivalent is torch DataLoader workers,
`train_stage1.py:190-206`)."""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from rcdms_tpu.configs import DatasetConfig
from rcdms_tpu.data import native_feeder
from rcdms_tpu.data.protocol import StoryTokenizer, build_story_example


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, default=8)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--threads", type=int, default=4)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--csize", type=int, default=224)
    args = ap.parse_args()

    cfg = DatasetConfig(image_size=args.size, clip_size=args.csize)
    tok = StoryTokenizer(cfg)
    rng = np.random.RandomState(0)
    stories = [rng.randint(0, 256, (5, 128, 128, 3), np.uint8)
               for _ in range(args.batch_size)]
    kls = [int(rng.randint(0, 5)) for _ in range(args.batch_size)]
    n_stories = args.batches * args.batch_size

    t0 = time.perf_counter()
    for _ in range(args.batches):
        for s, kl in zip(stories, kls):
            build_story_example(list(s), ["c"] * 5, kl, tok, cfg=cfg)
    t_py = time.perf_counter() - t0
    print(f"python protocol: {t_py:.2f}s  {n_stories / t_py:.2f} stories/s")

    if not native_feeder.available():
        print("native feeder: .so not built (make -C native)")
        return
    feeder = native_feeder.NativeFeeder(num_threads=args.threads)
    # warm at full batch size: allocates + pre-faults the output buffer ring
    feeder.pack_batch(stories, kls, args.size, args.csize)
    t0 = time.perf_counter()
    for _ in range(args.batches):
        feeder.pack_batch(stories, kls, args.size, args.csize)
        for _ in range(args.batch_size):
            tok(["c"] * 5)
    t_nat = time.perf_counter() - t0
    feeder.close()
    print(f"native feeder ({args.threads} threads): {t_nat:.2f}s  "
          f"{n_stories / t_nat:.2f} stories/s  ({t_py / t_nat:.2f}x)")


if __name__ == "__main__":
    main()
