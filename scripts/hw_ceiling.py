"""Framework-free hardware-scaling probe: run the headline kernel mix
(synth + PNG encode/decode + pHash) under plain multiprocessing at a given
process count.  Prints ONE JSON line {"procs": N, "images_per_sec": R}.

Used by bench.py --scaling to normalize the engine's measured efficiency
by what this machine's cores actually deliver when all are busy
(frequency scaling / memory contention are hardware effects, not engine
overhead)."""

import json
import multiprocessing as mp
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def work(n):
    sys.path.insert(0, REPO)
    from cqi_ray.images import codec, synth

    px_size = int(os.environ.get("GRAFT_IMAGE_PX", "64"))
    for i in range(n):
        px = synth._pixels_for(i, px_size, px_size)
        blob = codec.png_encode(px)
        out = codec.png_decode(blob)
        codec.phash64(out)


def main(procs: int, per: int = 3000) -> None:
    with mp.Pool(procs) as pool:
        pool.map(work, [50] * procs)  # warm imports per worker
        t0 = time.perf_counter()
        pool.map(work, [per] * procs)
        wall = time.perf_counter() - t0
    print(json.dumps({"procs": procs,
                      "images_per_sec": round(procs * per / wall, 1)}))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 8)
