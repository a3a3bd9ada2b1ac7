"""Pre-render parity datasets (and optionally the reference runs) so
apps/parity.py --reuse only has to run the repo side.

Usage: python tools/prerender_parity.py KIND [KIND...] \
           [--out-dir /tmp/rebvo_parity] [--n-frames 240] [--ref]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rebvo_tpu.apps import parity  # noqa: E402

SEEDS = {"lateral_arc": 7, "dolly": 20, "loop": 33, "loop3": 33}


def seed_for(kind: str) -> int:
    base = kind
    for suf in ("_st", "_dist", "_vi"):
        if base.endswith(suf):
            base = base[: -len(suf)]
    import zlib
    return SEEDS.get(base, zlib.crc32(kind.encode()) % 997)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("kinds", nargs="+")
    ap.add_argument("--out-dir", default="/tmp/rebvo_parity")
    ap.add_argument("--n-frames", type=int, default=240)
    ap.add_argument("--ref", action="store_true",
                    help="also run the reference binary once per dataset")
    args = ap.parse_args()
    for kind in args.kinds:
        seq_dir = os.path.join(args.out_dir, kind)
        os.makedirs(seq_dir, exist_ok=True)
        done = os.path.join(seq_dir, "data.csv")
        if os.path.exists(done) and os.path.exists(
                os.path.join(seq_dir, "gt_pos.txt")):
            print(f"[{kind}] already rendered", flush=True)
        else:
            print(f"[{kind}] rendering {args.n_frames} frames...",
                  flush=True)
            parity.render_dataset(seq_dir, kind, args.n_frames,
                                  seed_for(kind))
            print(f"[{kind}] rendered", flush=True)
        if args.ref and not os.path.exists(
                os.path.join(seq_dir, "rebvo_tray.txt")):
            st = kind.endswith("_st")
            b = kind[:-3] if st else kind
            dist = b.endswith("_dist")
            b = b[:-5] if dist else b
            vi = b.endswith("_vi")
            print(f"[{kind}] running reference...", flush=True)
            pos, info = parity.run_reference(seq_dir, vi=vi, dist=dist,
                                             st=st)
            print(f"[{kind}] reference: "
                  f"{'ok ' + str(len(pos)) if pos is not None else info}",
                  flush=True)


if __name__ == "__main__":
    main()
