"""Flagship Cp-reproduction window study (VERDICT r4 item 5).

The flagship level (881k cells, wall_h=5e-4, bs=16) carries a residual
shock limit cycle: the committed 8x500-step cycle-mean reproduces to
3.7e-3 — above the 1e-3 target the steady levels meet outright.  The
stated path is longer averaging windows.  This script marches 2*W
windows from the committed converged state and reports the
consecutive-window cycle-mean difference

    D(W) = mean_s | mean(cp[0:W]) - cp_ref_mean |   and
    D2(W) = mean_s | mean(cp[0:W]) - mean(cp[W:2W]) |

for W in {8, 16, 32} (stride 500 steps, matching the committed oracle).
If D2 converges below 1e-3 the flagship accuracy contract can assert
the longer window; if it floors, the floor quantifies the cycle's
non-periodicity and BASELINE.md states the contract honestly.

Usage: python scripts/flagship_window_study.py [tag=flagship] [wmax=32]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax                                           # noqa: E402
import jax.numpy as jnp                              # noqa: E402

from ibx.cases import build_rae2822, wall_cp         # noqa: E402
from ibx.cases.rae2822 import force_coefficients     # noqa: E402

DATA = os.path.join(os.path.dirname(__file__), "..", "tests", "data")


def main():
    tag = sys.argv[1].split("=")[-1] if len(sys.argv) > 1 else "flagship"
    wmax = int(sys.argv[2].split("=")[-1]) if len(sys.argv) > 2 else 32
    ref = np.load(os.path.join(DATA, f"rae2822_cp_{tag}.npz"))
    meta = json.loads(str(ref["meta"]))
    t0 = time.time()
    case = build_rae2822(wall_h=meta["wall_h"], feature_h=meta["feature_h"],
                         cfl=meta.get("cfl", 0.7),
                         block_size=meta.get("block_size") or 8)
    print(f"[{tag}] cells={case.dom.ncells} build={time.time()-t0:.0f}s",
          flush=True)
    stride = int(meta.get("phase_stride", 500))
    ref_mean = ref["cp_phases"].mean(axis=0)

    P = case.apply_bcs(jnp.asarray(ref["P"]))
    cps, cls = [], []
    t0 = time.time()
    for i in range(2 * wmax):
        P = case.march(P, stride)
        jax.block_until_ready(P)
        cps.append(wall_cp(case, np.asarray(P)))
        cls.append(force_coefficients(case, np.asarray(P))[0])
        if (i + 1) % 8 == 0:
            print(f"  window {i+1}/{2*wmax} t={time.time()-t0:.0f}s "
                  f"Cl={cls[-1]:.4f}", flush=True)
    cps = np.stack(cps)

    out = {"tag": tag, "stride": stride,
           "cl_band": [float(np.min(cls)), float(np.max(cls))]}
    for W in (8, 16, 32, 64):
        if 2 * W > cps.shape[0]:
            break
        d_ref = np.abs(cps[:W].mean(axis=0) - ref_mean)
        d_cons = np.abs(cps[:W].mean(axis=0) - cps[W:2 * W].mean(axis=0))
        out[f"D_vs_stored_W{W}"] = [round(float(d_ref.mean()), 6),
                                    round(float(d_ref.max()), 6)]
        out[f"D_consecutive_W{W}"] = [round(float(d_cons.mean()), 6),
                                      round(float(d_cons.max()), 6)]
    print(json.dumps(out), flush=True)
    np.savez_compressed(os.path.join(DATA, f"{tag}_window_study.npz"),
                        cps=cps.astype(np.float32),
                        cls=np.asarray(cls, np.float32),
                        stride=stride, meta=json.dumps(out))
    print("saved window study npz", flush=True)


if __name__ == "__main__":
    main()
