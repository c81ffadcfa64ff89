"""Observed-order estimate for the RAE2822 Cl refinement ladder
(VERDICT r3 item 4: clean up the ladder's convergence claim).

Uses CYCLE-AVERAGED Cl (tail of cl_hist) per committed oracle level — the
snapshot Cl of a limit-cycling level carries the cycle amplitude as noise
(coarse +/-0.02, medium +/-0.008). Richardson-fits the observed order p and
the extrapolated Cl_inf from the three STEADY levels (fine/xfine/flagship,
phase-mean |dCp| <= ~1e-3), then checks every level against the fit.

Also reports the bs-confound arm (rae2822_cp_flagship8.npz, same wall_h as
flagship at block_size=8) when present: Cl differences at fixed wall_h
across block size measure octree-layout sensitivity, not scheme order.
"""

import json
import os
import sys

import numpy as np
from scipy.optimize import brentq

DATA = os.path.join(os.path.dirname(__file__), "..", "tests", "data")


def cycle_cl(tag):
    f = np.load(os.path.join(DATA, f"rae2822_cp_{tag}.npz"))
    h = np.asarray(f["cl_hist"])[:, 0]
    meta = json.loads(str(f["meta"]))
    return float(h[-8:].mean()), float(h[-8:].std()), meta


def main():
    rows = {}
    for tag in ("coarse", "medium", "fine", "xfine", "flagship",
                "flagship8"):
        path = os.path.join(DATA, f"rae2822_cp_{tag}.npz")
        if not os.path.exists(path):
            continue
        cl, sd, meta = cycle_cl(tag)
        rows[tag] = (meta["wall_h"], cl, sd, meta.get("block_size") or 8)
        print(f"{tag:10s} wall_h={meta['wall_h']:.1e} bs={rows[tag][3]:2d} "
              f"cycle Cl = {cl:.4f} +/- {sd:.4f}")

    h1, c1 = rows["fine"][0], rows["fine"][1]
    h2, c2 = rows["xfine"][0], rows["xfine"][1]
    h3, c3 = rows["flagship"][0], rows["flagship"][1]
    ratio = (c1 - c2) / (c2 - c3)

    def f(p):
        return (h1**p - h2**p) / (h2**p - h3**p) - ratio

    p = brentq(f, 0.1, 6.0)
    C = (c2 - c3) / (h2**p - h3**p)        # Cl(h) = Cl_inf + C h^p
    c_inf = c3 - C * h3**p
    print(f"\nobserved order p = {p:.2f} (fine/xfine/flagship, "
          f"h = {h1:.0e}/{h2:.0e}/{h3:.0e})")
    print(f"extrapolated Cl_inf = {c_inf:.4f}")
    for tag, (h, cl, sd, bs) in rows.items():
        fit = c_inf + C * h**p
        print(f"  {tag:10s} fit {fit:.4f}  measured {cl:.4f} "
              f"(dev {cl - fit:+.4f}, cycle sd {sd:.4f})")
    if "flagship8" in rows:
        d = rows["flagship8"][1] - rows["flagship"][1]
        print(f"\nbs confound at wall_h=5e-4: Cl(bs=8) - Cl(bs=16) = {d:+.4f}")


if __name__ == "__main__":
    sys.exit(main())
