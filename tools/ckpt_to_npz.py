#!/usr/bin/env python
"""Export an orbax checkpoint's params as a portable .npz.

The inverse convenience of tools/convert_torch_weights.py: keys are
'/'-joined odtpu param paths, loadable by ``eval.py --model_npz`` /
``odtpu.utils.checkpoint.load_model_npz`` (which casts back to the
model dtype). With --dtype float16 the artifact is half size — the
round-trip is lossy in the f16 mantissa (10 bits, vs the bf16 the model
trained in having 7), measured mAP-neutral on the flagship contract
(BENCH_NOTES round 4).

Why this exists: training runs' orbax dirs live under weights/ (not
tracked; wiped between rounds). The flagship contract's trained
parameters are persisted as a committed artifact so its recorded mAP
is reproducible in one command without a retrain:

  python tools/ckpt_to_npz.py --cfg cfgs/tests/flagship_synth.yml \
      --ckpt weights/tests/flagship_r4/ckpt --out artifacts/x.npz
  python eval.py --cfg cfgs/tests/flagship_synth.yml --model_npz artifacts/x.npz
"""

from __future__ import annotations

import argparse
import os.path as osp
import sys

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, REPO)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--cfg", required=True, help="yaml the run trained with")
    p.add_argument("--ckpt", required=True, help="orbax checkpoint dir")
    p.add_argument("--out", required=True, help="output .npz path")
    p.add_argument("--dtype", default="float16",
                   choices=["float16", "float32"])
    args = p.parse_args(argv)

    import os
    os.environ["JAX_PLATFORMS"] = "cpu"  # host-only job; never touch TPU
    from odtpu.utils.platform import apply_platform_env
    apply_platform_env()
    import flax
    import numpy as np
    from odtpu.models import model_factory
    from odtpu.utils.checkpoint import restore_eval_variables
    from odtpu.utils.config import load_cfg

    cfg = load_cfg(args.cfg)
    model, _, _ = model_factory("eval", cfg)
    variables = restore_eval_variables(model, cfg, args.ckpt)
    flat = flax.traverse_util.flatten_dict(variables["params"])
    out = {"/".join(k): np.asarray(v).astype(args.dtype)
           for k, v in flat.items()}
    if "batch_stats" in variables:
        # BN-heavy families (RFBNet/FSSD/DRN) are not reproducible from
        # params alone — init running stats give garbage eval. Carry
        # them under a reserved key namespace; load_variables_npz
        # restores them, load_model_npz ignores them.
        bs = flax.traverse_util.flatten_dict(variables["batch_stats"])
        out.update({"__batch_stats__/" + "/".join(k):
                    np.asarray(v).astype(args.dtype)
                    for k, v in bs.items()})
        print("carrying {} batch_stats arrays".format(len(bs)))
    os.makedirs(osp.dirname(osp.abspath(args.out)), exist_ok=True)
    np.savez_compressed(args.out, **out)
    nbytes = sum(v.nbytes for v in out.values())
    print("wrote {} ({} tensors, {:.1f} MB raw, {:.1f} MB on disk)".format(
        args.out, len(out), nbytes / 1e6,
        osp.getsize(args.out) / 1e6))


if __name__ == "__main__":
    main()
